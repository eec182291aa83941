"""Probe: are i16 dynamic-start DMA + 16-bit lane gathers safe in Mosaic?

The u8 equivalents miscompile on this platform (recorded traps). If i16
passes, an int16 phys buffer halves the merge kernel's old/out HBM bytes.

Tests, in order (each can hard-fault the runtime — run LAST in a session):
 1. i16 [rows,128] HBM -> VMEM dynamic-start DMA (multiple-of-8 rows)
 2. take_along_axis lane gather on an i16 (CS,128) tile
 3. i32 tile -> i16 convert + where() mixing i16 data with i32-derived mask
"""
import sys, time
sys.path.insert(0, "/root/repo")  # runnable as a script
import numpy as np

sys.stdout.reconfigure(line_buffering=True)
import jax

if "--interpret" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices())

CS = 64
ROWS = 512


def kern(off_ref, src_ref, idx_ref, out_ref, buf, sem):
    # 1. dynamic-start DMA of i16 rows
    o = off_ref[0]
    cp = pltpu.make_async_copy(src_ref.at[pl.ds(o, CS), :], buf, sem)
    cp.start()
    cp.wait()
    # 2. lane gather on the i16 tile
    idx = idx_ref[:]
    g = jnp.take_along_axis(buf[:, :], idx, axis=1)
    # 3. mask from an i32-derived compare applied to i16 data
    mask = idx > 64
    out_ref[:] = jnp.where(mask, g, jnp.int16(-1))


@jax.jit
def run(off, src, idx):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((CS, 128), lambda c, o: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CS, 128), lambda c, o: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((CS, 128), jnp.int16),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((CS, 128), jnp.int16),
        interpret="--interpret" in sys.argv,
    )(off, src, idx)


rng = np.random.default_rng(0)
src = jnp.asarray(rng.integers(0, 6, (ROWS, 128), dtype=np.int16))
idx = jnp.asarray(rng.integers(0, 128, (CS, 128), dtype=np.int32))
for off_v in (0, 8, 72, 256):
    off = jnp.asarray([off_v], jnp.int32)
    out = np.asarray(run(off, src, idx))
    want_g = np.take_along_axis(np.asarray(src)[off_v:off_v + CS], np.asarray(idx), axis=1)
    want = np.where(np.asarray(idx) > 64, want_g, -1).astype(np.int16)
    ok = np.array_equal(out, want)
    print(f"offset {off_v}: {'OK' if ok else 'MISMATCH'}")
    if not ok:
        bad = np.argwhere(out != want)
        print("  first bad:", bad[:3], out[tuple(bad[0])], want[tuple(bad[0])])
print("i16 probe complete")
