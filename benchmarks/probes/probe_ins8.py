"""Probe: is an int8 BlockSpec VMEM input tile safe in Mosaic?

uint8 buffers miscompile on this platform (recorded trap); the INS8
merge-stream lever (MSBWT_TPU_INS8=1) feeds the kernel an auto-pipelined
int8 (CS,128) block per grid step and derives the shift map in-kernel
with two MXU matmuls. This probe exercises exactly those primitives
standalone — run it BEFORE flipping INS8 on for a build A/B.

Tests, gridded over 4 chunks:
 1. int8 (CS,128) BlockSpec input tile read + widen to i32
 2. bf16 lane-prefix matmul on the indicator (exactness <= 128)
 3. f32 CSxCS row-prefix matmul (the wtab plane-3 pattern)
"""
import sys
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
NCHUNK = 4


def kern(ins_ref, wtab_ref, out_ref):
    ins = ins_ref[:].astype(jnp.int32)          # 1. int8 tile -> i32
    bits = (ins > 0).astype(jnp.bfloat16)
    rowcum = jnp.dot(                            # 2. lane prefix (bf16 MXU)
        bits, wtab_ref[0].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    rowtot = jnp.broadcast_to(rowcum[:, 127:128], (CS, 128))
    rows_incl = jnp.dot(wtab_ref[1, :CS, :CS], rowtot,  # 3. row prefix (f32)
                        preferred_element_type=jnp.float32)
    w = (rowcum + rows_incl - rowtot).astype(jnp.int32)
    out_ref[:] = w - (ins > 0).astype(jnp.int32)  # tloc per position


@jax.jit
def run(ins, wtab):
    return pl.pallas_call(
        kern,
        grid=(NCHUNK,),
        in_specs=[
            pl.BlockSpec((CS, 128), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128, 128), lambda c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CS, 128), lambda c: (c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NCHUNK * CS, 128), jnp.int32),
        interpret="--interpret" in sys.argv,
    )(ins, wtab)


wtab = np.zeros((2, 128, 128), np.float32)
wtab[0] = np.triu(np.ones((128, 128), np.float32))
wtab[1, :CS, :CS] = np.tril(np.ones((CS, CS), np.float32))

rng = np.random.default_rng(0)
ins = (rng.random((NCHUNK * CS, 128)) < 0.01).astype(np.int8) * (
    rng.integers(1, 7, (NCHUNK * CS, 128), dtype=np.int8))
out = np.asarray(run(jnp.asarray(ins), jnp.asarray(wtab)))

# numpy oracle: within-chunk inclusive prefix of the indicator, minus is_ins
is_ins = (ins > 0).astype(np.int64).reshape(NCHUNK, CS * 128)
want = (np.cumsum(is_ins, axis=1) - is_ins).reshape(NCHUNK * CS, 128)
ok = np.array_equal(out, want)
print("int8 tile + in-kernel shift map:", "OK" if ok else "MISMATCH")
if not ok:
    bad = np.argwhere(out != want)
    print("  first bad:", bad[:3], out[tuple(bad[0])], want[tuple(bad[0])])
    sys.exit(1)
print("ins8 probe complete")
