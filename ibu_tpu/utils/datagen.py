"""Deterministic patterned-file generation shared by benchmarks/examples.

Every harness needs "write an n-record file whose field sums have closed
forms" (the reference's checksum-test methodology, ``mmap.rs:454-481``);
this is the single implementation.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from ibu_tpu.constructs.header import Header
from ibu_tpu.constructs.record import make_records
from ibu_tpu.io.writer import Writer

CHUNK = 4 * 1024 * 1024


def parallel_fields(i: np.ndarray):
    """barcode = i mod 1M, umi = 2i, index = i (the parallel-harness pattern:
    index sums to n(n-1)/2)."""
    return i % np.uint64(1_000_000), i * np.uint64(2), i


def roundtrip_fields(i: np.ndarray):
    """barcode = i mod 1M, umi = 31i mod 1M, index = i (the reference
    roundtrip pattern, ``examples/roundtrip.rs:33-39``)."""
    return (
        i % np.uint64(1_000_000),
        (i * np.uint64(31)) % np.uint64(1_000_000),
        i,
    )


def write_patterned_file(
    path: str,
    n: int,
    fields: Callable[[np.ndarray], tuple] = parallel_fields,
    header: Header | None = None,
    sorted_flag: bool = False,
    chunk: int = CHUNK,
) -> None:
    """Write ``n`` records whose fields are ``fields(arange-chunk)``."""
    if header is None:
        header = Header.new(16, 12)
    if sorted_flag:
        header.set_sorted()
    with Writer.from_path(path, header) as w:
        for s in range(0, n, chunk):
            m = min(chunk, n - s)
            i = np.arange(s, s + m, dtype=np.uint64)
            bc, umi, idx = fields(i)
            w.write_batch(make_records(bc, umi, idx))
