"""Doctest layer — the reference uses runnable examples on nearly every
public fn as a second test surface (SURVEY.md §4, e.g. src/msbwt_core.rs:104,
src/lib.rs:20-43); this mirrors that for the host-side API modules."""

import doctest

import pytest

import rust_msbwt_tpu.ops.alphabet as alphabet
import rust_msbwt_tpu.ops.rle as rle


@pytest.mark.parametrize("mod", [alphabet, rle])
def test_doctests(mod):
    failures, tests = doctest.testmod(mod, raise_on_error=False).failed, \
        doctest.testmod(mod).attempted
    assert tests > 0, f"no doctests collected in {mod.__name__}"
    assert failures == 0
