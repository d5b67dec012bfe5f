"""High-level pipelines: sequences ↔ sorted IBU files in one call.

The "model layer" of this framework — fused compositions of the codec,
device sort, statistics, and host I/O that cover the common end-to-end
workflows (the reference leaves these compositions to user code; see
``/root/reference/README.md:61-102`` for the manual version).

All pipelines pick the Pallas kernels on TPU backends and the lax codec
elsewhere, so they run (and are tested) everywhere.
"""

from __future__ import annotations

import numpy as np

from ibu_tpu.constructs.header import Header
from ibu_tpu.io.mmap import MmapReader
from ibu_tpu.io.writer import Writer
from ibu_tpu.ops import codec as C
from ibu_tpu.ops.u64 import records_from_soa, soa_from_records


def _use_pallas() -> bool:
    import jax

    return jax.default_backend() == "tpu"


def encode_batch(
    bc_rows: np.ndarray, umi_rows: np.ndarray, index: np.ndarray
) -> np.ndarray:
    """ASCII rows ``(N, bc_len)`` + ``(N, umi_len)`` + ``uint64`` indices →
    structured record array, encoded on device."""
    import jax.numpy as jnp

    bc_planes = jnp.asarray(C.rows_to_planes(bc_rows))
    umi_planes = jnp.asarray(C.rows_to_planes(umi_rows))
    idx_pair = jnp.asarray(C.words_to_pair(np.asarray(index, dtype=np.uint64)))
    if _use_pallas():
        from ibu_tpu.ops.codec_pallas import encode_records

        soa = encode_records(bc_planes, umi_planes, idx_pair)
    else:
        soa = jnp.concatenate(
            [
                C.lax_encode_planes(bc_planes),
                C.lax_encode_planes(umi_planes),
                idx_pair,
            ]
        )
    return records_from_soa(np.asarray(soa))


def decode_batch(
    records: np.ndarray, bc_len: int, umi_len: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Structured records → ASCII rows ``(N, bc_len)``, ``(N, umi_len)``,
    and the ``uint64`` index column, decoded on device."""
    import jax.numpy as jnp

    soa = jnp.asarray(soa_from_records(records))
    if _use_pallas():
        from ibu_tpu.ops.codec_pallas import decode_records

        bc_p, umi_p, idx_pair = decode_records(soa, bc_len, umi_len)
    else:
        bc_p = C.lax_decode_planes(soa[0:2], bc_len)
        umi_p = C.lax_decode_planes(soa[2:4], umi_len)
        idx_pair = soa[4:6]
    return (
        C.planes_to_rows(np.asarray(bc_p)),
        C.planes_to_rows(np.asarray(umi_p)),
        C.pair_to_words(np.asarray(idx_pair)),
    )


def sort_batch(records: np.ndarray) -> np.ndarray:
    """Device lexicographic sort of a structured record array."""
    import jax.numpy as jnp

    from ibu_tpu.ops.stats import sort_records_soa

    soa = jnp.asarray(soa_from_records(records))
    return records_from_soa(np.asarray(sort_records_soa(soa)))


def encode_sorted_file(
    path: str,
    bc_seqs: list[str] | np.ndarray,
    umi_seqs: list[str] | np.ndarray,
    index: np.ndarray | None = None,
    validate: bool = True,
) -> Header:
    """Sequences → device encode → device sort → sorted IBU file.

    ``bc_seqs``/``umi_seqs`` are equal-length string lists or ``(N, L)``
    ASCII arrays. Returns the written header (sorted flag set). This is
    BASELINE config 2 as a single library call.
    """
    bc_rows = bc_seqs if isinstance(bc_seqs, np.ndarray) else C.seqs_to_rows(bc_seqs)
    umi_rows = (
        umi_seqs if isinstance(umi_seqs, np.ndarray) else C.seqs_to_rows(umi_seqs)
    )
    if validate:
        C.np_validate_ascii(bc_rows)
        C.np_validate_ascii(umi_rows)
    n = len(bc_rows)
    if len(umi_rows) != n:
        raise ValueError(f"{n} barcodes but {len(umi_rows)} UMIs")
    if index is None:
        index = np.arange(n, dtype=np.uint64)
    records = sort_batch(encode_batch(bc_rows, umi_rows, index))
    header = Header.new(bc_rows.shape[1], umi_rows.shape[1])
    header.set_sorted()
    with Writer.from_path(path, header) as w:
        w.write_batch(records)
    return header


def decode_file(
    path: str, as_strings: bool = False
) -> tuple[Header, np.ndarray | list[str], np.ndarray | list[str], np.ndarray]:
    """Sorted-or-not IBU file → decoded barcodes, UMIs, indices.

    Returns ``(header, bc, umi, index)`` where ``bc``/``umi`` are ASCII row
    arrays (or string lists with ``as_strings=True``). BASELINE config 3's
    decode step as a single library call.
    """
    reader = MmapReader(path)
    header = reader.header()
    records = np.asarray(reader.records)
    bc_rows, umi_rows, index = decode_batch(
        records, header.bc_len, header.umi_len
    )
    if as_strings:
        return header, C.rows_to_seqs(bc_rows), C.rows_to_seqs(umi_rows), index
    return header, bc_rows, umi_rows, index
