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


def _score_candidates(bwt, reads, ridx, pidx, k: int,
                      bidirectional: bool) -> np.ndarray:
    """[S, 4] min covering-window count per (suspect, candidate base);
    -1 where the candidate equals the read's current base. Fully
    vectorized assembly (no per-suspect Python loop)."""
    L = reads.shape[1]
    S = ridx.size
    p = pidx.astype(np.int64)
    j0 = np.maximum(0, p - k + 1)                    # first covering window
    j1 = np.minimum(p, L - k)                        # last covering window
    w = np.arange(k, dtype=np.int64)                 # window slot axis
    j = j0[:, None] + w[None, :]                     # [S, k] window starts
    valid_w = j <= j1[:, None]
    jc = np.minimum(j, j1[:, None])                  # clip for safe gathers
    t = np.arange(k, dtype=np.int64)                 # within-window axis
    # window contents straight off the reads: [S, k(win), k(len)]
    base_win = reads[ridx[:, None, None], jc[:, :, None] + t[None, None, :]]
    off = p[:, None] - jc                            # p's slot in each window
    is_sub = t[None, None, :] == off[:, :, None]     # [S, k, k]
    # all four candidate substitutions at once: [S, 4, k, k]
    km = np.where(is_sub[:, None, :, :],
                  _DNA[None, :, None, None], base_win[:, None, :, :])
    cand_ok = _DNA[None, :] != reads[ridx, pidx][:, None]   # [S, 4]
    cell_ok = cand_ok[:, :, None] & valid_w[:, None, :]     # [S, 4, k]
    flat_ok = cell_ok.reshape(-1)
    counts_flat = np.zeros(flat_ok.size, dtype=np.int64)
    kmers = km.reshape(-1, k)[flat_ok]
    counts_flat[flat_ok] = np.asarray(
        bwt.count_kmers_bidirectional(kmers) if bidirectional
        else bwt.count_kmers(kmers)
    )
    counts = counts_flat.reshape(S, len(_DNA), k)
    counts[~cell_ok] = np.iinfo(np.int64).max        # excluded from the min
    mins = counts.min(axis=2)
    mins[~cand_ok] = -1
    return mins


def correct_reads(bwt, reads, k: int = 21, tau: int = 2,
                  bidirectional: bool = True,
                  max_corrections_per_read: int | None = None,
                  suspect_chunk: int = 16384):
    """Returns ``(corrected_reads, n_corrected)``.

    One substitution is chosen per suspect base (the candidate whose
    weakest covering window is strongest, accepted iff it reaches
    ``tau``); bases whose best candidate stays weak are left untouched.
    ``max_corrections_per_read`` caps accepted fixes per read (leftmost
    first), mirroring fmlrc's bounded-edit behavior.

    Candidate fan-out is bounded: suspects are scored in chunks of
    ``suspect_chunk`` (each chunk is one batched device call of at most
    ``suspect_chunk * 4 * k`` k-mers), so a batch where nearly every base
    is flagged — wrong index, contaminant reads, very low coverage —
    degrades to more device calls instead of an unbounded host loop and a
    single enormous device program.

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
    if suspect_chunk < 1:
        raise ValueError(f"suspect_chunk must be >= 1, got {suspect_chunk}")
    flags = flag_read_errors(bwt, reads, k, tau, bidirectional)
    ridx, pidx = np.nonzero(flags)
    S = ridx.size
    if S == 0:
        return reads.copy(), 0

    mins = np.concatenate([
        _score_candidates(bwt, reads, ridx[c0 : c0 + suspect_chunk],
                          pidx[c0 : c0 + suspect_chunk], k, bidirectional)
        for c0 in range(0, S, suspect_chunk)
    ])

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
