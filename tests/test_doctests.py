"""Doctest layer — the reference uses runnable examples on nearly every
public fn as a second test surface (SURVEY.md §4, e.g. src/msbwt_core.rs:104,
src/lib.rs:20-43); this mirrors that for the host-side API modules."""

import doctest

import pytest

import rust_msbwt_tpu.apps.correct as app_correct
import rust_msbwt_tpu.models.core as core
import rust_msbwt_tpu.models.dynamic as dynamic
import rust_msbwt_tpu.models.rle_bwt as rle_bwt
import rust_msbwt_tpu.ops.alphabet as alphabet
import rust_msbwt_tpu.ops.bcr as bcr
import rust_msbwt_tpu.ops.extract as extract
import rust_msbwt_tpu.ops.merge as merge
import rust_msbwt_tpu.ops.packed_rank as packed_rank
import rust_msbwt_tpu.ops.pair_rank as pair_rank
import rust_msbwt_tpu.ops.rank as rank
import rust_msbwt_tpu.ops.rle as rle
import rust_msbwt_tpu.parallel.doubling_merge as doubling_merge
import rust_msbwt_tpu.parallel.partitioned as partitioned
import rust_msbwt_tpu.parallel.sharded_index as sharded_index
import rust_msbwt_tpu.parallel.sharded_merge as sharded_merge
import rust_msbwt_tpu.utils.checkpoint as checkpoint
import rust_msbwt_tpu.utils.checks as checks
import rust_msbwt_tpu.utils.fastx as fastx
import rust_msbwt_tpu.utils.npy as npy
import rust_msbwt_tpu.utils.oracle as oracle
import rust_msbwt_tpu.utils.profiling as profiling
import rust_msbwt_tpu.utils.streaming as streaming


@pytest.mark.parametrize(
    "mod",
    [alphabet, rle, core, dynamic, rle_bwt, npy, oracle, merge, packed_rank,
     pair_rank, sharded_index, checkpoint, streaming, bcr, rank, partitioned,
     sharded_merge, app_correct, fastx, extract, doubling_merge, checks,
     profiling],
    ids=lambda m: m.__name__,
)
def test_doctests(mod):
    result = doctest.testmod(mod, raise_on_error=False)
    assert result.attempted > 0, f"no doctests collected in {mod.__name__}"
    assert result.failed == 0
