"""fmlrc-style read error detection/correction on the device index.

The original msbwt's headline application is k-mer-spectrum read
correction (fmlrc / fmlrc2 build exactly this on top of the reference's
``RleBWT``: seed the BWT with short reads, then flag and repair bases
whose covering k-mers are rare). The reference library itself only
provides ``count_kmer``; this module shows the TPU-native shape of the
whole inner loop — every read, every window, and every candidate base is
scored in a handful of batched ``count_kmers`` programs instead of a
per-base host walk (ref hot loop being replaced:
src/rle_bwt.rs:202-287 driven one k-mer at a time).

Algorithm (the classic k-mer spectrum rule):

1. profile: counts of every length-``k`` window of every read (one
   batched program; optionally double-stranded, the convention fmlrc
   uses — reads sample both strands).
2. flag: base ``p`` is suspect iff EVERY window covering ``p`` is weak
   (count < ``tau``). A single error poisons up to ``k`` windows, so
   "all covering windows weak" localizes it far better than "any".
3. correct: for each suspect base try the 4 DNA substitutions; score a
   candidate by the MINIMUM count over the windows covering ``p`` after
   substitution; accept the best candidate iff its min-count reaches
   ``tau``. All (read, position, candidate, window) tuples are scored in
   ONE batched ``count_kmers`` call.
"""

from __future__ import annotations

import numpy as np

from rust_msbwt_tpu.ops.alphabet import VC_LEN

_DNA = np.array([1, 2, 3, 5], dtype=np.uint8)  # A C G T (no $ / N)


def _window_profile(bwt, reads: np.ndarray, k: int,
                    bidirectional: bool) -> np.ndarray:
    """[B, L-k+1] counts of every length-k window (fw or fw+rc)."""
    if bidirectional:
        B, L = reads.shape
        w = L - k + 1
        windows = np.lib.stride_tricks.sliding_window_view(reads, k, axis=1)
        counts = bwt.count_kmers_bidirectional(windows.reshape(B * w, k))
        return counts.reshape(B, w)
    return bwt.kmer_profile(reads, k)


def flag_read_errors(bwt, reads, k: int = 21, tau: int = 2,
                     bidirectional: bool = True) -> np.ndarray:
    """[B, L] bool mask of suspect bases: every covering window is weak.

    ``reads`` is an int-encoded [B, L] batch (no '$'); ``tau`` is the
    weak-count threshold (counts STRICTLY below it are weak).

    >>> import numpy as np
    >>> from rust_msbwt_tpu.models.dynamic import DynamicBWT
    >>> from rust_msbwt_tpu.ops.alphabet import convert_stoi
    >>> bwt = DynamicBWT()
    >>> bwt.insert_strings(["ACGTAACC"] * 30, sorted=True)
    >>> bad = np.array([convert_stoi("ACGTATCC")])     # error at index 5
    >>> flags = flag_read_errors(bwt, bad, k=4, tau=2)
    >>> bool(flags[0, 5]), bool(flags[0, 1])
    (True, False)
    """
    reads = np.asarray(reads, dtype=np.uint8)
    if reads.ndim == 1:
        reads = reads[None, :]
    if not np.all((reads > 0) & (reads < VC_LEN)):
        raise ValueError("reads must be over symbols 1..5 (no '$')")
    B, L = reads.shape
    if not 1 <= k <= L:
        raise ValueError(f"k={k} out of range for read length {L}")
    prof = _window_profile(bwt, reads, k, bidirectional)   # [B, L-k+1]
    weak = prof < tau
    # base p is covered by windows j in [p-k+1, p] clipped to [0, L-k]
    flags = np.empty((B, L), dtype=bool)
    for p in range(L):
        j0, j1 = max(0, p - k + 1), min(p, L - k)
        flags[:, p] = weak[:, j0 : j1 + 1].all(axis=1)
    return flags


def correct_reads(bwt, reads, k: int = 21, tau: int = 2,
                  bidirectional: bool = True,
                  max_corrections_per_read: int | None = None):
    """Returns ``(corrected_reads, n_corrected)``.

    One substitution is chosen per suspect base (the candidate whose
    weakest covering window is strongest, accepted iff it reaches
    ``tau``); bases whose best candidate stays weak are left untouched.
    ``max_corrections_per_read`` caps accepted fixes per read (leftmost
    first), mirroring fmlrc's bounded-edit behavior.

    >>> import numpy as np
    >>> from rust_msbwt_tpu.models.dynamic import DynamicBWT
    >>> from rust_msbwt_tpu.ops.alphabet import convert_stoi, convert_itos
    >>> bwt = DynamicBWT()
    >>> bwt.insert_strings(["ACGTAACC"] * 30, sorted=True)
    >>> bad = np.array([convert_stoi("ACGTATCC")])     # error at index 5
    >>> fixed, n = correct_reads(bwt, bad, k=4, tau=2)
    >>> convert_itos(fixed[0]), n
    ('ACGTAACC', 1)
    """
    reads = np.asarray(reads, dtype=np.uint8)
    if reads.ndim == 1:
        reads = reads[None, :]
    B, L = reads.shape
    flags = flag_read_errors(bwt, reads, k, tau, bidirectional)
    ridx, pidx = np.nonzero(flags)
    if ridx.size == 0:
        return reads.copy(), 0

    # assemble every (suspect, candidate, covering window) k-mer
    kmers, meta = [], []
    for s, (r, p) in enumerate(zip(ridx, pidx)):
        j0, j1 = max(0, p - k + 1), min(p, L - k)
        for c, base in enumerate(_DNA):
            if base == reads[r, p]:
                continue
            patched = reads[r].copy()
            patched[p] = base
            for j in range(j0, j1 + 1):
                kmers.append(patched[j : j + k])
                meta.append((s, c))
    kmers = np.asarray(kmers, dtype=np.uint8)
    counts = (
        bwt.count_kmers_bidirectional(kmers) if bidirectional
        else bwt.count_kmers(kmers)
    )

    # min covering-window count per (suspect, candidate)
    S = ridx.size
    best = np.full((S, len(_DNA)), -1, dtype=np.int64)
    mins = np.full((S, len(_DNA)), np.iinfo(np.int64).max, dtype=np.int64)
    for (s, c), cnt in zip(meta, counts):
        mins[s, c] = min(mins[s, c], int(cnt))
        best[s, c] = 0  # candidate exists
    mins[best < 0] = -1

    out = reads.copy()
    n_fixed = 0
    per_read: dict[int, int] = {}
    for s in range(S):
        c = int(np.argmax(mins[s]))
        if mins[s, c] < tau:
            continue
        r, p = int(ridx[s]), int(pidx[s])
        if max_corrections_per_read is not None:
            if per_read.get(r, 0) >= max_corrections_per_read:
                continue
            per_read[r] = per_read.get(r, 0) + 1
        out[r, p] = _DNA[c]
        n_fixed += 1
    return out, n_fixed
