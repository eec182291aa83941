"""Read recovery: the MSBWT is a lossless archive of the read collection.

Read ``i`` (in lexicographic order — the order sorted construction stores
them) is recovered by LF-walking backward from terminator rotation ``i``
(BWT rows 0..n_strings-1 are the ``$`` rotations) until the walk closes the
cycle at ``$``; the symbols visited are the read right-to-left. The
reference keeps this implicit in its tests (the same walk recovers lengths);
here it is a batched device program: all requested reads walk together, one
packed-rank gather per step, masked after each read's terminator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rust_msbwt_tpu.ops.rank import OccIndex


@functools.partial(jax.jit, static_argnames=("l_max",))
def _extract_impl(bwt, table, starts, ids, l_max):
    from rust_msbwt_tpu.ops.packed_rank import rank_packed

    B = ids.shape[0]
    pos = ids.astype(jnp.int32)
    out = jnp.zeros((B, l_max), jnp.uint8)
    done = jnp.zeros(B, bool)

    def step(t, carry):
        pos, out, done = carry
        sym = jnp.take(bwt, pos).astype(jnp.int32)
        hit_end = sym == 0
        keep = jnp.logical_not(done) & jnp.logical_not(hit_end)
        # symbols arrive right-to-left: column l_max-1-t, compacted later.
        # The loop runs one extra step so length-l_max reads still observe
        # their terminator; that step writes nothing (keep is False).
        col = jnp.clip(l_max - 1 - t, 0, l_max - 1)
        out = out.at[:, col].set(
            jnp.where(keep, sym.astype(jnp.uint8), out[:, col])
        )
        s = jnp.where(keep, sym, 0)
        new_pos = starts[s] + rank_packed(table, s, pos)
        pos = jnp.where(keep, new_pos, pos)
        done = done | hit_end
        return pos, out, done

    pos, out, done = jax.lax.fori_loop(0, l_max + 1, step, (pos, out, done))
    return out, done


def extract_reads(index: OccIndex, ids, n_strings: int, l_max: int | None = None):
    """Recover reads by index from a BWT. Returns a list of int-encoded reads
    (uint8 arrays, no terminator), in the order of ``ids``.

    ``ids`` index the terminator rotations (0..n_strings-1) — for a sorted
    build that is the lexicographic read order. ``l_max`` bounds the walk
    (defaults to the longest read, recovered from the BWT itself).
    """
    from rust_msbwt_tpu.ops.bcr import read_lengths_from_bwt
    from rust_msbwt_tpu.ops.packed_rank import pack_index

    ids = np.asarray(ids, dtype=np.int32)
    if ids.size == 0:
        return []
    if not np.all((ids >= 0) & (ids < n_strings)):
        raise ValueError(f"read ids must be in [0, {n_strings})")
    if l_max is None:
        l_max = int(read_lengths_from_bwt(index, n_strings).max())
    pidx = pack_index(index)
    out, done = _extract_impl(
        index.bwt, pidx.table, pidx.starts, jnp.asarray(ids), max(int(l_max), 1)
    )
    if not bool(np.asarray(done).all()):
        raise ValueError(f"l_max={l_max} too small: some reads did not close")
    out = np.asarray(out)
    return [row[row != 0] for row in out]
