"""Auxiliary subsystems: checkpointing, debug checks, profiling helpers."""

import numpy as np
import pytest

from rust_msbwt_tpu.ops.alphabet import convert_stoi
from rust_msbwt_tpu.ops.bcr import build_msbwt, encode_reads
from rust_msbwt_tpu.ops.rank import build_occ_index, count_kmers
from rust_msbwt_tpu.utils import checkpoint, checks
from rust_msbwt_tpu.utils.oracle import naive_bwt
from rust_msbwt_tpu.utils.profiling import build_roofline, query_roofline, timeit


@pytest.fixture(scope="module")
def decoded():
    reads, lengths = encode_reads(
        [convert_stoi(s) for s in ["CCGTACGTA", "GGTACAGTA", "ACGACGACG"] * 7]
    )
    return build_msbwt(reads, lengths)


def test_index_cache_roundtrip(tmp_path, decoded):
    import jax.numpy as jnp

    index = build_occ_index(jnp.asarray(decoded))
    p = tmp_path / "cache.npz"
    checkpoint.save_index_cache(index, str(p))
    loaded = checkpoint.load_index_cache(str(p))
    assert loaded.n == index.n
    kmers = np.array([convert_stoi("ACG")], dtype=np.uint8)
    assert count_kmers(loaded, kmers).tolist() == count_kmers(index, kmers).tolist()


def test_sharded_checkpoint_roundtrip(tmp_path, decoded):
    d = str(tmp_path / "shards")
    checkpoint.save_sharded(decoded, d, 4)
    m = checkpoint.load_manifest(d)
    assert m["n_shards"] == 4
    assert m["total_size"] == decoded.size
    back = checkpoint.load_sharded(d)
    assert back.tolist() == decoded.tolist()
    # each shard file is itself a valid comp_msbwt.npy
    one = checkpoint.load_shard(d, 2)
    lo, hi = m["boundaries"][2], m["boundaries"][3]
    assert one.tolist() == decoded[lo:hi].tolist()


def test_resume_and_extend_from_checkpoint(tmp_path):
    first = ["ACGT", "TGCA"]
    reads, lengths = encode_reads([convert_stoi(s) for s in first])
    base = build_msbwt(reads, lengths)
    d = str(tmp_path / "ck")
    checkpoint.save_sharded(base, d, 2)
    resumed = checkpoint.load_sharded(d)
    reads2, lengths2 = encode_reads([convert_stoi("GATTACA")])
    out = build_msbwt(reads2, lengths2, base=resumed, base_string_count=2)
    from rust_msbwt_tpu.ops.alphabet import convert_itos

    assert convert_itos(out) == naive_bwt(first + ["GATTACA"])


def test_debug_checks_toggle():
    checks.set_debug(True)
    try:
        with pytest.raises(ValueError):
            checks.validate_kmers(np.array([[7]], dtype=np.uint8), None)
        with pytest.raises(ValueError):
            # interior '$'
            checks.validate_reads(
                np.array([[1, 0, 2]], dtype=np.uint8), np.array([3], np.int32)
            )
        # trailing padding zeros are fine
        checks.validate_reads(
            np.array([[1, 2, 0]], dtype=np.uint8), np.array([2], np.int32)
        )
    finally:
        checks.set_debug(False)
    # disabled -> no-op
    checks.validate_kmers(np.array([[7]], dtype=np.uint8), None)


def test_determinism_harness(decoded):
    import jax.numpy as jnp

    index = build_occ_index(jnp.asarray(decoded))
    kmers = np.zeros((16, 3), dtype=np.uint8)
    kmers[:] = convert_stoi("ACG")
    checks.assert_deterministic(lambda: count_kmers(index, kmers))


def test_rooflines_and_timeit():
    r = query_roofline(1_000_000, 21, measured_seconds=0.25)
    assert 0 < r.fraction_of_light < 1
    b = build_roofline(1_000_000, 100, measured_seconds=1.0)
    assert b.bytes_touched == 101 * 1_000_000 * 33
    dt = timeit(lambda: np.arange(10), reps=2, warmup=1)
    assert dt >= 0
