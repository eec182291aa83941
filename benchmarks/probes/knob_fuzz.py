"""One-off extended fuzz: build_msbwt (pallas interpret) vs naive oracle
under a random env-knob matrix. Child mode builds several random read
collections and exits nonzero on any mismatch."""
import itertools
import os
import subprocess
import sys

if "--child" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache_fuzz")
    import numpy as np
    from rust_msbwt_tpu.ops.bcr import build_msbwt, encode_reads
    from rust_msbwt_tpu.ops.alphabet import convert_itos
    from rust_msbwt_tpu.utils.oracle import naive_bwt

    seed = int(sys.argv[sys.argv.index("--seed") + 1])
    rng = np.random.default_rng(seed)
    for case in range(3):
        style = case % 3
        if style == 0:    # ragged random
            reads_l = [rng.integers(1, 6, int(rng.integers(1, 50))).astype(np.uint8)
                       for _ in range(int(rng.integers(10, 120)))]
        elif style == 1:  # duplicate-heavy (wide-path pressure)
            base = rng.integers(1, 6, 20).astype(np.uint8)
            reads_l = [base.copy() for _ in range(200)]
        else:             # few long reads
            reads_l = [rng.integers(1, 6, int(rng.integers(100, 300))).astype(np.uint8)
                       for _ in range(8)]
        reads, lens = encode_reads(reads_l)
        got = convert_itos(np.asarray(build_msbwt(reads, lens, engine="pallas")))
        want = naive_bwt([convert_itos(r) for r in reads_l])
        if got != want:
            print(f"MISMATCH seed={seed} case={case} env="
                  f"{ {k: v for k, v in os.environ.items() if k.startswith('MSBWT_TPU_')} }")
            sys.exit(1)
    print("OK")
    sys.exit(0)

# round-4 note: the INS8 and int16-phys levers were measured on hardware
# and deleted (BASELINE.md decision table); the surviving knob axes are
# chunk size, DMA pipeline depth, table row width, and the radix pairing.
combos = []
for cs, depth, table in itertools.product(
    ("32", "64", "128", "256"), ("2", "4"), ("0", "1")
):
    combos.append({"MSBWT_TPU_MERGE_CS": cs, "MSBWT_TPU_DMA_DEPTH": depth,
                   "MSBWT_TPU_TABLE64": table})
# radix-2 stage pairing composed with the chunk/table levers
for cs, table in itertools.product(("64", "128"), ("0", "1")):
    combos.append({"MSBWT_TPU_MERGE_CS": cs, "MSBWT_TPU_RADIX": "2",
                   "MSBWT_TPU_TABLE64": table})

fails = 0
for i, env in enumerate(combos):
    child_env = {**os.environ, **env}
    child_env["PYTHONPATH"] = (
        child_env.get("PYTHONPATH", "") + ":/root/repo").lstrip(":")
    r = subprocess.run(
        [sys.executable, __file__, "--child", "--seed", str(1000 + i)],
        env=child_env, capture_output=True, timeout=1200, cwd="/root/repo",
    )
    label = ",".join(f"{k.split('MSBWT_TPU_')[1]}={v}" for k, v in env.items())
    ok = r.returncode == 0 and b"OK" in r.stdout
    print(f"[{i+1}/{len(combos)}] {label}: {'OK' if ok else 'FAIL'}", flush=True)
    if not ok:
        fails += 1
        print(r.stdout.decode()[-500:], r.stderr.decode()[-500:])
print(f"{fails} failures / {len(combos)} combos")
sys.exit(1 if fails else 0)
