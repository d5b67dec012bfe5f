"""Executable docstring examples — the parity analogue of the reference's
~30 rustdoc doctests (SURVEY.md §4)."""

import doctest

import pytest

import ibu_tpu.constructs.header
import ibu_tpu.constructs.record
import ibu_tpu.io.compression
import ibu_tpu.io.mmap
import ibu_tpu.io.reader
import ibu_tpu.io.writer
import ibu_tpu.ops.codec
import ibu_tpu.ops.u64
import ibu_tpu.parallel.processor


@pytest.mark.parametrize(
    "module",
    [
        ibu_tpu.constructs.header,
        ibu_tpu.constructs.record,
        ibu_tpu.io.compression,
        ibu_tpu.io.mmap,
        ibu_tpu.io.reader,
        ibu_tpu.io.writer,
        ibu_tpu.ops.codec,
        ibu_tpu.ops.u64,
        ibu_tpu.parallel.processor,
    ],
)
def test_module_doctests(module):
    results = doctest.testmod(module, verbose=False)
    assert results.failed == 0, f"{results.failed} doctest failures in {module}"
    assert results.attempted > 0
