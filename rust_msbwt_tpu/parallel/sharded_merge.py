"""Distributed D-way Holt–McMillan merge over a device mesh.

Generalizes the pairwise interleave refinement (ref: src/bwt_util.rs:21-141)
to D partial BWTs merged simultaneously, with the interleave vector sharded
by merged position across the mesh. Each refinement round is one SPMD
program:

  1. every device reconstructs the merged symbol stream for its block —
     cross-shard source offsets come from an ``all_gather`` of the [D, D]
     per-block source-count matrix (device-major exclusive prefix),
  2. the stable counting sort of the interleave by symbol is computed from an
     ``all_gather`` of per-block per-symbol counts ([D, 6]), giving every
     element an exact global target position,
  3. the permutation is applied with a scatter into a full-length zero
     buffer + ``psum`` (an all-to-all in disguise; see "scaling note"),
  4. convergence is a ``psum``-reduced any-changed flag driving one
     ``lax.while_loop`` — at most max-rotation-period rounds
     (ref fixpoint: src/bwt_util.rs:120-124).

The result equals the single-device merge tree (``ops.merge.kway_merge``)
and therefore the sorted single-device build — verified by tests on the
8-virtual-device CPU mesh.

Scaling note: steps 1 and 3 move O(n) bytes per device per round here
(an ``all_gather`` of the source BWTs and a ``psum`` of the routed
interleave). On a real pod both reduce to O(n/D) contiguous-slice exchanges
(each device consumes D *contiguous* runs of each source and produces D
contiguous runs of output), i.e. a ragged ``all_to_all``; this file keeps the
dense collective formulation, which is exact, mesh-shaped, and the form XLA
can lower today — swapping the transport does not change the math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from rust_msbwt_tpu.ops.alphabet import VC_LEN
from rust_msbwt_tpu.parallel.mesh import AXIS, default_mesh

_PAD_SRC = 255  # interleave tail padding — must not collide with a source id
_PAD_SYM = 7    # symbol-stream padding (symbols are 0..5)


@functools.partial(jax.jit, static_argnames=("n", "blk", "d", "bmax", "mesh"))
def _sharded_merge_impl(parts, lens, *, n, blk, d, bmax, mesh):
    """parts: [D, Bmax] u8 per-source BWTs; lens: [D] i32 true lengths.
    Returns merged symbols sharded as [D, blk] u8 (PAD past n)."""
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(lens, dtype=jnp.int32)]
    )

    def program(parts_blk, lens_rep):
        # parts arrive sharded by source id; gather all sources locally
        # (see module docstring's scaling note)
        parts_all = jax.lax.all_gather(parts_blk, AXIS, tiled=True)  # [D, Bmax]
        me = jax.lax.axis_index(AXIS)
        pos0 = me * blk
        gpos = pos0 + jnp.arange(blk, dtype=jnp.int32)
        valid = gpos < n
        srcs = jnp.arange(d, dtype=jnp.int32)

        # initial interleave: position p draws from source j iff
        # offsets[j] <= p < offsets[j+1]
        init = jnp.sum(
            (gpos[:, None] >= offsets[None, 1:]).astype(jnp.int32), axis=1
        ).astype(jnp.uint8)
        init = jnp.where(valid, init, jnp.uint8(_PAD_SRC))

        def reconstruct(inter):
            onehot = inter[:, None] == srcs[None, :].astype(jnp.uint8)  # [blk, D]
            local_counts = jnp.sum(onehot, axis=0, dtype=jnp.int32)     # [D]
            all_counts = jax.lax.all_gather(local_counts, AXIS)         # [D, D]
            start = jnp.cumsum(all_counts, axis=0, dtype=jnp.int32) - all_counts
            my_start = start[me]                                        # [D]
            r_loc = jnp.cumsum(onehot, axis=0, dtype=jnp.int32) - onehot
            src_pos = jnp.sum(jnp.where(onehot, my_start[None, :] + r_loc, 0), axis=1)
            flat = parts_all.reshape(-1)
            g = jnp.clip(
                inter.astype(jnp.int32) * bmax + src_pos, 0, d * bmax - 1
            )
            syms = jnp.take(flat, g)
            return jnp.where(inter == _PAD_SRC, jnp.uint8(_PAD_SYM), syms)

        def refine(inter):
            syms = reconstruct(inter)
            onehot = syms[:, None] == jnp.arange(VC_LEN, dtype=jnp.uint8)[None, :]
            local_counts = jnp.sum(onehot, axis=0, dtype=jnp.int32)       # [6]
            all_counts = jax.lax.all_gather(local_counts, AXIS)          # [D, 6]
            totals = jnp.sum(all_counts, axis=0)
            cvec = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jnp.cumsum(totals, dtype=jnp.int32)[:-1]]
            )
            dev_start = jnp.cumsum(all_counts, axis=0, dtype=jnp.int32) - all_counts
            my_start = dev_start[me]                                     # [6]
            r_loc = jnp.cumsum(onehot, axis=0, dtype=jnp.int32) - onehot
            tgt = jnp.sum(
                jnp.where(onehot, cvec[None, :] + my_start[None, :] + r_loc, 0),
                axis=1,
            )
            tgt = jnp.where(syms == _PAD_SYM, jnp.int32(d * blk), tgt)  # dropped
            routed = (
                jnp.zeros(d * blk, jnp.int32)
                .at[tgt]
                .set(inter.astype(jnp.int32) + 1, mode="drop")
            )
            routed = jax.lax.psum(routed, AXIS)
            mine = jax.lax.dynamic_slice(routed, (pos0,), (blk,))
            return jnp.where(valid, (mine - 1).astype(jnp.uint8), jnp.uint8(_PAD_SRC))

        def cond(carry):
            cur, nxt = carry
            changed = jnp.any(cur != nxt)
            return jax.lax.psum(changed.astype(jnp.int32), AXIS) > 0

        def body(carry):
            _, nxt = carry
            return nxt, refine(nxt)

        _, final = jax.lax.while_loop(cond, body, (init, refine(init)))
        merged = reconstruct(final)
        return merged[None, :]

    return shard_map(
        program,
        mesh=mesh,
        in_specs=(P(AXIS, None), P()),
        out_specs=P(AXIS, None),
    )(parts, lens)


def sharded_hm_merge(parts: list[np.ndarray], mesh: Mesh | None = None) -> np.ndarray:
    """Merge D partial BWTs with the interleave sharded across the mesh.

    Result equals ``ops.merge.kway_merge(parts)``.
    """
    if mesh is None:
        mesh = default_mesh()
    d = mesh.devices.size
    parts = [np.asarray(p, dtype=np.uint8) for p in parts]
    if len(parts) > d:
        raise ValueError(f"at most {d} parts on a {d}-device mesh")
    while len(parts) < d:
        parts.append(np.zeros(0, dtype=np.uint8))
    lens = np.array([p.size for p in parts], dtype=np.int32)
    n = int(lens.sum())
    if n == 0:
        return np.zeros(0, dtype=np.uint8)
    bmax = max(1, int(lens.max()))
    packed = np.full((d, bmax), _PAD_SYM, np.uint8)
    for j, p in enumerate(parts):
        packed[j, : p.size] = p
    blk = -(-n // d)
    out = _sharded_merge_impl(
        jnp.asarray(packed), jnp.asarray(lens),
        n=n, blk=blk, d=d, bmax=bmax, mesh=mesh,
    )
    return np.asarray(out).reshape(-1)[:n]
