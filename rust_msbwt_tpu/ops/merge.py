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


@functools.partial(jax.jit, static_argnames=("n0", "n1"))
def _merge_impl(bwt0, bwt1, n0, n1):
    n = n0 + n1
    idx = jnp.arange(n, dtype=jnp.int32)

    def gather_syms(interleave):
        c0 = jnp.cumsum(interleave.astype(jnp.int32)) - interleave.astype(jnp.int32)
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


def pairwise_bwt_merge(bwt0, bwt1) -> np.ndarray:
    """Merge two decoded BWTs into the BWT of the union (device fixpoint).

    Result-equivalent to the reference's ``pairwise_bwt_merge``
    (ref: src/bwt_util.rs:108-141)."""
    bwt0 = np.asarray(bwt0, dtype=np.uint8)
    bwt1 = np.asarray(bwt1, dtype=np.uint8)
    if bwt0.size == 0:
        return bwt1.copy()
    if bwt1.size == 0:
        return bwt0.copy()
    merged, _ = _merge_impl(
        jnp.asarray(bwt0), jnp.asarray(bwt1), int(bwt0.size), int(bwt1.size)
    )
    return np.asarray(merged)


def merge_interleave(bwt0, bwt1) -> np.ndarray:
    """The converged interleave vector (True == element from bwt0)."""
    bwt0 = np.asarray(bwt0, dtype=np.uint8)
    bwt1 = np.asarray(bwt1, dtype=np.uint8)
    _, interleave = _merge_impl(
        jnp.asarray(bwt0), jnp.asarray(bwt1), int(bwt0.size), int(bwt1.size)
    )
    return np.asarray(interleave)


def kway_merge(bwts: list[np.ndarray]) -> np.ndarray:
    """Balanced binary tree of pairwise merges — the reduction used to
    combine per-shard partial BWTs after a data-parallel build."""
    parts = [np.asarray(b, dtype=np.uint8) for b in bwts if np.asarray(b).size]
    if not parts:
        return np.zeros(0, dtype=np.uint8)
    while len(parts) > 1:
        nxt = []
        for i in range(0, len(parts) - 1, 2):
            nxt.append(pairwise_bwt_merge(parts[i], parts[i + 1]))
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    return parts[0]
