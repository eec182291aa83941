"""Holt–McMillan interleave merge as a device program.

The reference carries a host-side pairwise merge used only by tests
(ref: src/bwt_util.rs:21-141). Here the merge is a production op: it is the
cross-shard combiner for distributed construction (SURVEY.md §5
"long-context" analogue) and the engine behind merging externally-built BWTs.

One refinement round (ref semantics: src/bwt_util.rs:21-55) is, in array
form: reconstruct the merged symbol stream from the current interleave, then
stable-counting-sort the interleave bits by symbol. A stable argsort over the
6-symbol alphabet expresses the counting sort as one XLA sort + gather; the
fixpoint loop (ref: src/bwt_util.rs:120-124) becomes ``lax.while_loop`` with
an any-changed flag. Convergence takes at most max-rotation-period rounds.

Ties (equal cyclic rotations across the two inputs) stay in bwt0-before-bwt1
order, matching the reference's stable refinement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n0", "n1", "wide"))
def _merge_impl(bwt0, bwt1, n0, n1, wide=False):
    n = n0 + n1
    # positions go int64 ("wide") once the merged size can pass 2^31 —
    # the reference's counts are u64 throughout (ref: src/msbwt_core.rs:124)
    pos_dtype = jnp.int64 if wide else jnp.int32
    idx = jnp.arange(n, dtype=pos_dtype)

    def gather_syms(interleave):
        c0 = jnp.cumsum(interleave.astype(pos_dtype)) - interleave.astype(pos_dtype)
        pos0 = jnp.clip(c0, 0, n0 - 1)
        pos1 = jnp.clip(idx - c0, 0, n1 - 1)
        return jnp.where(interleave, bwt0[pos0], bwt1[pos1])

    def refine(interleave):
        syms = gather_syms(interleave)
        perm = jnp.argsort(syms, stable=True)
        return interleave[perm]

    init = idx < n0

    def cond(carry):
        cur, nxt = carry
        return jnp.any(cur != nxt)

    def body(carry):
        _, nxt = carry
        return nxt, refine(nxt)

    _, final = jax.lax.while_loop(cond, body, (init, refine(init)))
    return gather_syms(final), final


def _wide(n0: int, n1: int, force_wide: bool) -> bool:
    return force_wide or (n0 + n1) >= 2**31


def pairwise_bwt_merge(bwt0, bwt1, force_wide: bool = False) -> np.ndarray:
    """Merge two decoded BWTs into the BWT of the union (device fixpoint).

    Result-equivalent to the reference's ``pairwise_bwt_merge``
    (ref: src/bwt_util.rs:108-141). Positions switch to int64 automatically
    past 2^31 merged symbols; ``force_wide`` exercises that path on small
    data for tests.

    >>> from rust_msbwt_tpu.ops.alphabet import convert_itos, convert_stoi
    >>> from rust_msbwt_tpu.utils.oracle import naive_bwt
    >>> a = convert_stoi(naive_bwt(["ACGT"]))
    >>> b = convert_stoi(naive_bwt(["TGCA"]))
    >>> convert_itos(pairwise_bwt_merge(a, b)) == naive_bwt(["ACGT", "TGCA"])
    True
    """
    bwt0 = np.asarray(bwt0, dtype=np.uint8)
    bwt1 = np.asarray(bwt1, dtype=np.uint8)
    if bwt0.size == 0:
        return bwt1.copy()
    if bwt1.size == 0:
        return bwt0.copy()
    wide = _wide(bwt0.size, bwt1.size, force_wide)
    with jax.enable_x64(wide):
        merged, _ = _merge_impl(
            jnp.asarray(bwt0), jnp.asarray(bwt1), int(bwt0.size),
            int(bwt1.size), wide=wide,
        )
        return np.asarray(merged)


def merge_interleave(bwt0, bwt1, force_wide: bool = False) -> np.ndarray:
    """The converged interleave vector (True == element from bwt0)."""
    bwt0 = np.asarray(bwt0, dtype=np.uint8)
    bwt1 = np.asarray(bwt1, dtype=np.uint8)
    wide = _wide(bwt0.size, bwt1.size, force_wide)
    with jax.enable_x64(wide):
        _, interleave = _merge_impl(
            jnp.asarray(bwt0), jnp.asarray(bwt1), int(bwt0.size),
            int(bwt1.size), wide=wide,
        )
        return np.asarray(interleave)


def kway_merge(bwts: list[np.ndarray], force_wide: bool = False) -> np.ndarray:
    """Balanced binary tree of pairwise merges — the reduction used to
    combine per-shard partial BWTs after a data-parallel build. Each merge
    independently goes wide once its own size requires it.

    >>> from rust_msbwt_tpu.ops.alphabet import convert_itos, convert_stoi
    >>> from rust_msbwt_tpu.utils.oracle import naive_bwt
    >>> parts = [convert_stoi(naive_bwt([s])) for s in ("AC", "GG", "TA")]
    >>> convert_itos(kway_merge(parts)) == naive_bwt(["AC", "GG", "TA"])
    True
    """
    parts = [np.asarray(b, dtype=np.uint8) for b in bwts if np.asarray(b).size]
    if not parts:
        return np.zeros(0, dtype=np.uint8)
    while len(parts) > 1:
        nxt = []
        for i in range(0, len(parts) - 1, 2):
            nxt.append(
                pairwise_bwt_merge(parts[i], parts[i + 1], force_wide=force_wide)
            )
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    return parts[0]
