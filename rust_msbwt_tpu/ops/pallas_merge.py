"""Pallas TPU merge-insert kernel — the BCR stage rebuild at HBM bandwidth.

Every BCR construction stage rebuilds the BWT buffer by merging N inserted
symbols into an n-element sequence: ``new[p] = v[i] if p == q[i] else
old[p - #{q <= p}]`` (the batched equivalent of the reference's per-symbol
``RLEBPlusTree::insert_and_count``, ref: src/rle_bplus_tree.rs:210-248).
The XLA lowering of that rebuild is a flat computed-index scatter, which
runs at ~15 ns/element on TPU and walls out around 16M elements (ROADMAP.md).

This implementation replaces the scatter with streaming DMA + in-row gathers:

* Host/XLA prep (all fast, MXU/VPU-shaped):
  - ``insmap[p] = v[i] + 1`` at insertion slots, else 0  (one O(N) scatter)
  - ``tmap[p] = #{q <= p}``  (two-level cumsum: within-row inclusive prefix
    as a lower-triangular bf16 matmul on the MXU — row counts <= 128 are
    exact in bf16 — plus an exclusive row-prefix over per-row sums)
  - both ship to the kernel as ONE packed word per position,
    ``(tmap << 3) | insval`` (insval < 8; tmap <= N < 2^28)
* Kernel, gridded over output chunks of ``CHUNK = CS*128`` elements:
  - one dynamic-start, double-buffered DMA pulls the old-buffer window into
    VMEM (``a`` = insertions before the chunk, from the scalar-prefetched
    per-chunk offsets; insertions inside one chunk are <= CHUNK because
    insertion slots are distinct positions, so window sizes are static);
    chunks with < 128*K insertions (K = max(1, CS//64)) — the common case —
    fetch only the CS+8 rows they can touch,
  - the source index ``fw(j) = j - shift(j)`` is monotone with steps in
    {0,1}. Fast path (< 128*K insertions): every output row s reads only
    window rows {s+CS-K, ..., s+CS+1}, so K+2 statically-shifted (CS,128)
    views + K+2 full-tile lane-gathers (``take_along_axis`` on the 128-lane
    axis) reconstruct the whole chunk. K scales with CS so fast-path
    coverage is chunk-size-invariant at a given insertion density. Wide
    path (>= 128*K): per-row reconstruction from a 2-chunk window. No
    data-dependent loop over insertions, no scatter.

Empirical TPU constraints baked in (probed on v5e): DMA row counts must be
multiples of 8 (unaligned counts hard-fault the runtime); gathers exist only
along the 128-lane axis; ``jnp.cumsum`` has no Pallas lowering (hence the
XLA-side tmap); uint8 rolls/slices miscompile, so the buffer is int32 rows
of 128 with CHUNK-element PAD guards managed by ``to_phys``/``from_phys``.
Symbol values use 0..5; PAD is 7 (ops.rank._PAD_SYMBOL).

Levers measured on hardware and REMOVED (round 4 — full decision table in
BASELINE.md):

* int16 phys buffers (halve window-read/output-write bytes): structurally
  refuted — Mosaic's ``tpu.dynamic_gather`` requires data/index bitwidths
  to match, and 16-bit tiles additionally require sublane slice starts to
  be multiples of 8, which the K+2 shifted views and the wide path's
  dynamic row-pair slice both violate. Neither is fixable without
  re-materializing the views (which costs the bytes the lever would save).
* int8 insertion stream with in-kernel MXU shift map (``INS8``): lowered
  fine but measured a LOSS (interleaved A/B median per-round ratio 0.88x
  vs base; 6.13 s vs 5.57 s at 1M x 100bp) — the two extra per-chunk
  matmuls outweigh the 3-bytes/position stream saving.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# chunk geometry: CS sublane rows of 128 lanes per grid step. Must be >= 16
# so the wide path's 8-row pair slice stays inside the 3*CS-row window;
# CS > 128 grows the row-prefix weight plane to CSxCS (see _wtab_np).
# Sweep history: at 16M symbols 64 won (hardware sweep 16/32/64/128, round
# 2); at the 505M flagship the round-5 interleaved A/B (r5_cs.log, BASELINE
# round-5 table) measured CS=128 at a ~1.09x clean-round median vs 64
# (arm medians 29.5 s vs 32.3 s) and CS=256 at ~1.04x (below the 5% bar)
# — so the DEFAULT is 128. Env MSBWT_TPU_MERGE_CS re-sweeps without an
# edit (read once at import; the chunk size shapes bucket alignment and
# phys layouts everywhere).
def _cs_from_env() -> int:
    import os
    import sys

    raw = os.environ.get("MSBWT_TPU_MERGE_CS", "128")
    try:
        cs = int(raw)
    except ValueError:
        cs = -1
    # Power of two in [16, 256]. CS=256 (a 32768-element chunk, ~128 KB of
    # int32 per window buffer) is well inside VMEM.
    if cs < 16 or cs > 256 or cs & (cs - 1):
        if raw != "128":
            # A silently-clamped sweep arm reports CS=128 numbers under a
            # wrong label — reject loudly instead.
            print(f"WARNING: MSBWT_TPU_MERGE_CS={raw!r} invalid "
                  "(need power of two in [16, 256]); using 128",
                  file=sys.stderr, flush=True)
        return 128
    return cs


CS = _cs_from_env()
CHUNK = CS * 128
_PAD = 7
# Fast-path insertion threshold: a chunk with < 128*K insertions is
# reconstructed from K+2 statically-shifted window views (K=1 is the
# original 3-view design). K scales with CS so that the fast-path
# coverage is chunk-size-invariant: at the 505M E. coli config the mean
# insertions/chunk is ~81 at CS=64, so CS=128/256 chunks would otherwise
# all fall off the fast path and the chunk-size sweep would measure the
# per-row wide path instead of the per-chunk overhead it exists to probe.
# K <= 7 keeps the narrow window at CS+8 rows (max view row = CS+K).
K_VIEWS = max(1, CS // 64)
assert K_VIEWS <= 7


def _table_lanes_from_env() -> int:
    """Fused rank-table row width. DEFAULT 64 lanes: the legacy 128-lane
    row uses only lanes 0..5 (occ) and 32..79 (plane qwords); the 64-lane
    layout packs planes at 8+16p+q and halves the kernel's table-write
    bytes (the per-stage rank GATHER is count-bound, not byte-bound, so
    the win is all on the write side). Measured round 4 (1M x 100bp):
    sequential arms 6.82 -> 5.57 s; interleaved per-round ratios vs base
    1.53/1.12/1.79 (median 1.53x, every round a win). Env
    ``MSBWT_TPU_TABLE64=0`` restores the legacy 128-lane row."""
    import os

    return 128 if os.environ.get("MSBWT_TPU_TABLE64") == "0" else 64


TABLE_LANES = _table_lanes_from_env()
# plane-p qword q lives at table lane PLANE_BASE + 16p + q
PLANE_BASE = 8 if TABLE_LANES == 64 else 32


def _dma_depth_from_env() -> int:
    """Window-DMA pipeline depth (buffers in flight). Default 2 = the
    classic double buffer (one outstanding prefetch). At the 505M build
    the merge pass runs ~4 us/chunk vs 640 ns at 16M — if that gap is
    HBM latency on the dynamic-start window reads over a multi-GB buffer,
    more outstanding DMAs hide it. Env ``MSBWT_TPU_DMA_DEPTH`` (2..8),
    A/B on hardware before changing the default."""
    import os
    import sys

    raw = os.environ.get("MSBWT_TPU_DMA_DEPTH", "2")
    try:
        d = int(raw)
    except ValueError:
        d = -1
    if not 2 <= d <= 8:
        if raw != "2":
            print(f"WARNING: MSBWT_TPU_DMA_DEPTH={raw!r} invalid "
                  "(need 2..8); using 2", file=sys.stderr, flush=True)
        return 2
    return d


DMA_DEPTH = _dma_depth_from_env()


def _merge_kernel(ca_ref, old_ref, ti_ref, wtab_ref, out_ref, tab_ref, buf,
                  nbuf, occ_acc, sems):
    """One output chunk. Grid dim 0 walks phys chunks. Chunk 0 (front guard)
    and the last two chunks (back guard; the third back-guard chunk still
    runs the DMA path and lands on old-buffer PAD) are written as PAD without
    DMA, which keeps every window read in-bounds. Window DMAs are pipelined
    DMA_DEPTH deep (default 2 = double-buffered): chunk c issues chunk
    c+DEPTH-1's DMA before waiting on its own, using the scalar-prefetched
    per-chunk insertion offsets ``ca_ref``.

    The kernel ALSO emits the packed rank-table rows for the merged chunk
    (``tab_ref``): lanes 0..5 hold per-symbol occurrences strictly before
    each 128-wide bin, lanes 32+16p+j hold plane-p qword j. TPU grids run
    sequentially, so the global occ prefix is carried across chunks in the
    ``occ_acc`` scratch — the table costs zero extra HBM read passes (the
    merged tile is already in VMEM).
    """
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    first = 1
    last = nc - 3  # last chunk that runs the DMA path

    def narrow(i):
        # < 128*K insertions: every source row lies in window rows
        # [CS-K, CS+K+1] — fetch only those (the common case; ~3x less DMA)
        return ca_ref[i + 1] - ca_ref[i] < 128 * K_VIEWS

    def window_dma_narrow(i):
        # NOTE: DMA row counts must be multiples of 8 — unaligned counts
        # hard-fault the TPU runtime (probed empirically).
        row_lo = (i * CHUNK - ca_ref[i] - CHUNK) // 128  # >= 0: front guard
        return pltpu.make_async_copy(
            old_ref.at[pl.ds(row_lo + (CS - K_VIEWS), CS + 8), :],
            nbuf.at[i % DMA_DEPTH],
            sems.at[i % DMA_DEPTH],
        )

    def window_dma_wide(i):
        # full window: sources may reach back a whole chunk
        row_lo = (i * CHUNK - ca_ref[i] - CHUNK) // 128
        return pltpu.make_async_copy(
            old_ref.at[pl.ds(row_lo, 3 * CS), :],
            buf.at[i % DMA_DEPTH],
            sems.at[i % DMA_DEPTH],
        )

    def start_dma(i):
        @pl.when(narrow(i))
        def _():
            window_dma_narrow(i).start()

        @pl.when(jnp.logical_not(narrow(i)))
        def _():
            window_dma_wide(i).start()

    # DMA pipeline, DMA_DEPTH buffers: chunk `first` fills the initial
    # window(s) [first, first + DEPTH - 2]; every chunk then keeps
    # DEPTH - 1 prefetches outstanding by issuing chunk c + DEPTH - 1.
    @pl.when(c == first)
    def _():
        for j in range(DMA_DEPTH - 1):
            if first + j <= last:  # static: grid size is trace-time known
                start_dma(first + j)

    @pl.when((c >= first) & (c + (DMA_DEPTH - 1) <= last))
    def _():
        start_dma(c + (DMA_DEPTH - 1))

    guard = (c == 0) | (c >= nc - 2)

    @pl.when(guard)
    def _():
        out_ref[:] = jnp.full((CS, 128), _PAD, out_ref.dtype)

    @pl.when(jnp.logical_not(guard))
    def _():
        a = ca_ref[c]  # insertions strictly before the chunk start
        nins = ca_ref[c + 1] - a
        ti = ti_ref[:]  # packed word: (shift-count << 3) | insval
        ins = ti & 7
        is_ins = (ins > 0).astype(jnp.int32)
        tloc = (ti >> 3) - a - is_ins

        src0 = c * CHUNK - a
        row_lo = (src0 - CHUNK) // 128
        lane = jax.lax.broadcasted_iota(jnp.int32, (CS, 128), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (CS, 128), 0)
        win = buf.at[c % DMA_DEPTH]  # wide-path window (full 3*CS rows)
        # source index into the window, monotone with steps in {0, 1}:
        # fw(s, l) = (src0 - window_base) + 128 s + l - shift_local(s, l)
        fw = (src0 - row_lo * 128) + sub * 128 + lane - tloc

        # fast path (any chunk with < 128*K insertions): with tloc < 128*K
        # every output row s reads only window rows {s+CS-K, ..., s+CS+1},
        # so K+2 statically-shifted (CS,128) views + K+2 full-tile
        # lane-gathers reconstruct the whole chunk — no per-row loop.
        @pl.when(nins < 128 * K_VIEWS)
        def _():
            window_dma_narrow(c).wait()
            fwk = fw - 128 * (sub + (CS - K_VIEWS))  # in [0, 128*(K+2))
            m = fwk >> 7                             # source view 0..K+1
            idx = fwk & 127
            shifted = jnp.zeros((CS, 128), out_ref.dtype)
            for mm in range(K_VIEWS + 2):
                v = nbuf[c % DMA_DEPTH, pl.ds(mm, CS), :]
                g = jnp.take_along_axis(v, idx, axis=1)
                shifted = jnp.where(m == mm, g, shifted)
            out_ref[:] = jnp.where(
                ins > 0, (ins - 1).astype(out_ref.dtype), shifted
            )

        # wide path (>= 128*K insertions in one chunk — e.g. many duplicate
        # reads): per-row reconstruction, each row spans <= 2 window rows
        @pl.when(nins >= 128 * K_VIEWS)
        def _():
            window_dma_wide(c).wait()
            rows = []
            for s in range(CS):
                fw_row = fw[s : s + 1, :]  # [1, 128]
                xr0 = fw[s, 0] // 128
                pair = win[pl.ds(xr0, 8), :]  # rows 0..1 hold the span
                off = fw_row - xr0 * 128  # in [0, 256)
                off_b = jnp.broadcast_to(off, (8, 128))
                g_a = jnp.take_along_axis(pair, jnp.clip(off_b, 0, 127), axis=1)
                g_b = jnp.take_along_axis(
                    pair, jnp.clip(off_b - 128, 0, 127), axis=1)
                rows.append(jnp.where(off < 128, g_a[0:1], g_b[1:2]))
            shifted = jnp.concatenate(rows, axis=0)
            out_ref[:] = jnp.where(
                ins > 0, (ins - 1).astype(out_ref.dtype), shifted
            )

    # --- fused rank-table emission (uniform over ALL chunks, guards
    # included: a PAD tile contributes zero counts and all-ones planes) ---
    @pl.when(c == 0)
    def _():
        occ_acc[:, :] = jnp.zeros((8, 128), jnp.int32)

    mt = out_ref[:]  # the merged tile, already resident in VMEM
    lane = jax.lax.broadcasted_iota(jnp.int32, (CS, 128), 1)
    # per-bin (row) symbol histogram, value of lane s = count of symbol s
    cnt = jnp.zeros((CS, 128), jnp.float32)
    for s in range(6):
        row_cnt = jnp.sum((mt == s).astype(jnp.float32), axis=1, keepdims=True)
        cnt = cnt + jnp.where(lane == s, row_cnt, 0.0)
    # within-chunk inclusive row prefix via a small f32 MXU matmul (exact:
    # sums <= CS*128 << 2^24); wtab plane 3 holds the lower-triangular T
    tri = wtab_ref[3, :CS, :CS]
    incl = jnp.dot(tri, cnt, preferred_element_type=jnp.float32)
    occ_rows = (incl - cnt).astype(jnp.int32) + occ_acc[0:1, :]
    occ_acc[0:1, :] = occ_acc[0:1, :] + incl[CS - 1 : CS, :].astype(jnp.int32)
    # plane-p qwords via bf16 MXU matmuls (byte sums <= 255: bf16-exact)
    qw = jnp.zeros((CS, 128), jnp.float32)
    for p in range(3):
        bits = ((mt >> p) & 1).astype(jnp.bfloat16)
        qw = qw + jnp.dot(
            bits, wtab_ref[p, :128, :128].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    tab = jnp.where(lane < 6, occ_rows, qw.astype(jnp.int32))
    tab_ref[:] = tab[:, :TABLE_LANES]


# weight-plane side: 128 for the qword packing matrices, CS for the
# within-chunk row-prefix triangle (CS > 128 grows the table; planes 0..2
# then use only the top-left 128x128 corner)
_W = max(CS, 128)


_N_PLANES = 4


def _wtab_np() -> np.ndarray:
    """[_N_PLANES, _W, _W] f32 kernel weights: planes 0..2 = the qword
    packing matrices in the top-left 128x128 (position i -> lane
    PLANE_BASE + 16p + i//8, weight 2^(i%8)); plane 3 = the
    lower-triangular within-chunk row-prefix matrix (top-left CSxCS)."""
    w = np.zeros((_N_PLANES, _W, _W), np.float32)
    for plane in range(3):
        for i in range(128):
            w[plane, i, PLANE_BASE + 16 * plane + i // 8] = float(1 << (i % 8))
    w[3, :CS, :CS] = np.tril(np.ones((CS, CS), np.float32))
    return w


_WTAB_NP = _wtab_np()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _merge_call(chunk_a, old_phys, ti_phys, *, interpret=False):
    rows = old_phys.shape[0]
    n_chunks = rows // CS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # old buffer, DMA'd manually
            pl.BlockSpec((CS, 128), lambda c, ca: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_N_PLANES, _W, _W), lambda c, ca: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # constant weights
        ],
        out_specs=[
            pl.BlockSpec((CS, 128), lambda c, ca: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CS, TABLE_LANES), lambda c, ca: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((DMA_DEPTH, 3 * CS, 128), old_phys.dtype),
            pltpu.VMEM((DMA_DEPTH, CS + 8, 128), old_phys.dtype),
            pltpu.VMEM((8, 128), jnp.int32),  # running global occ prefix
            pltpu.SemaphoreType.DMA((DMA_DEPTH,)),
        ],
    )
    return pl.pallas_call(
        _merge_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows, 128), old_phys.dtype),
            jax.ShapeDtypeStruct((rows, TABLE_LANES), jnp.int32),
        ],
        interpret=interpret,
    )(chunk_a, old_phys, ti_phys, jnp.asarray(_WTAB_NP))


# ---------------------------------------------------------------------------
# phys-layout helpers (used by ops.bcr)
# ---------------------------------------------------------------------------

def phys_rows(n_cap: int) -> int:
    """Rows of the phys buffer for a logical capacity of ``n_cap`` symbols:
    1 front-guard chunk + logical region + 3 back-guard chunks (window
    overrun + row-alignment spill; the last 2 are never DMA-sourced)."""
    n_chunks_logical = -(-n_cap // CHUNK)
    return (1 + n_chunks_logical + 3) * CS


def to_phys(buf_logical: jax.Array, n_cap: int) -> jax.Array:
    """Embed a logical buffer (flat [n_cap]) into the padded phys layout
    (int32 elements — narrower phys dtypes are measured dead ends: uint8
    dynamic-start DMA miscompiles, int16 tiles hit Mosaic gather-bitwidth
    and sublane-alignment limits; see module docstring)."""
    rows = phys_rows(n_cap)
    flat = jnp.full(rows * 128, _PAD, jnp.int32)
    flat = jax.lax.dynamic_update_slice(
        flat, buf_logical.astype(jnp.int32), (CHUNK,)
    )
    return flat.reshape(rows, 128)


def from_phys(phys: jax.Array, n_cap: int) -> jax.Array:
    """Extract the logical flat [n_cap] i32 view."""
    return phys.reshape(-1)[CHUNK : CHUNK + n_cap]


# inclusive-prefix matrix (ones at k <= j); bf16 is exact for counts <= 256.
# Kept as a host constant: jit embeds it (caching a traced array would leak
# tracers across jit scopes).
_TRI_NP = np.tril(np.ones((128, 128), np.float32)).T


def _tmap_from_delta(delta_rows):
    """Inclusive two-level prefix sum over the flattened [rows, 128] order:
    within-row inclusive cumsum as one MXU matmul (delta in {0,1}, row
    prefix <= 128, exact in bf16) + a cheap cross-row exclusive prefix."""
    tri = jnp.asarray(_TRI_NP, jnp.bfloat16)
    row_cum = jnp.dot(
        delta_rows.astype(jnp.bfloat16), tri, preferred_element_type=jnp.float32
    ).astype(jnp.int32)
    row_tot = row_cum[:, -1]
    row_pref = jnp.cumsum(row_tot, dtype=jnp.int32) - row_tot
    return row_cum + row_pref[:, None]


def merge_insert_phys(old_phys, q, v, active, *, interpret=False):
    """One merge-insert pass in phys layout (call under jit).

    ``q``: [N] i32 distinct new-coordinate slots (logical coords);
    ``v``: [N] i32 values in 0..5; ``active``: [N] bool mask.
    Returns (new_phys, table_phys, m): the merged buffer, the fused packed
    rank table (phys-row-indexed: logical bin b -> row b + CS), and
    m = number of active insertions.
    """
    rows = old_phys.shape[0]
    total = rows * 128
    m = jnp.sum(active.astype(jnp.int32))
    qp = jnp.where(active, q + CHUNK, total)  # phys coords; inactive -> dropped
    # int8 insertion stream: the scatter target, the tmap-delta read and the
    # pack read all shrink 4x vs int32 (values are v+1 <= 6)
    # NOTE: scatter flags (indices_are_sorted/unique_indices) measured a
    # ~14% scatter win at 505M (53.7 -> 46.2 ms, r5_prep.log) but are
    # UNSAFE here: inactive slots all map to the same out-of-range index,
    # violating both promises (undefined behavior). Claiming them requires
    # first compacting/re-encoding the inactive entries — see ROADMAP
    # "round-6 lever" for the design that deletes this scatter entirely.
    ins = (
        jnp.zeros(total, jnp.int8)
        .at[qp]
        .set(v.astype(jnp.int8) + 1, mode="drop")
        .reshape(rows, 128)
    )
    tmap = _tmap_from_delta((ins > 0).astype(jnp.int32))
    # per-chunk exclusive insertion counts straight off tmap chunk boundaries
    # (a strided slice — a second N-element scatter costs ~12 ns/element)
    ends = tmap[CS - 1 :: CS, 127]  # inclusive count at the end of each chunk
    chunk_a = jnp.concatenate([jnp.zeros(1, jnp.int32), ends])
    # one packed stream instead of two: (tmap << 3) | insval — insval < 8,
    # tmap <= N < 2^28. Saves 8n bytes of HBM traffic per stage.
    ti = (tmap << 3) | ins.astype(jnp.int32)
    new_phys, table = _merge_call(chunk_a, old_phys, ti, interpret=interpret)
    return new_phys, table, m
