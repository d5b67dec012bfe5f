"""End-to-end pipeline tests (sequences ↔ sorted IBU files)."""

import numpy as np
import pytest

from ibu_tpu import MmapReader, sort_records
from ibu_tpu.ops import codec as C
from ibu_tpu.pipelines import (
    decode_batch,
    decode_file,
    encode_batch,
    encode_sorted_file,
    sort_batch,
)


def random_seqs(n, L, seed=0):
    rng = np.random.default_rng(seed)
    return np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, (n, L))]


class TestBatchPipelines:
    def test_encode_decode_roundtrip(self):
        bc = random_seqs(1000, 16, 1)
        umi = random_seqs(1000, 12, 2)
        idx = np.arange(1000, dtype=np.uint64) * np.uint64(3)
        records = encode_batch(bc, umi, idx)
        assert np.array_equal(records["barcode"], C.np_pack(bc))
        bc2, umi2, idx2 = decode_batch(records, 16, 12)
        assert np.array_equal(bc2, bc)
        assert np.array_equal(umi2, umi)
        assert np.array_equal(idx2, idx)

    def test_sort_batch_matches_host(self):
        bc = random_seqs(500, 8, 3)
        umi = random_seqs(500, 8, 4)
        records = encode_batch(bc, umi, np.arange(500, dtype=np.uint64))
        assert np.array_equal(sort_batch(records), sort_records(records))


class TestFilePipelines:
    def test_encode_sorted_file_roundtrip(self, tmp_path):
        path = str(tmp_path / "p.ibu")
        bc_seqs = ["ACGTACGTACGTACGT", "TTTTGGGGCCCCAAAA", "acgtacgtacgtacgt"]
        umi_seqs = ["AACCGGTTAACC", "TTGGCCAATTGG", "ACACACACACAC"]
        header = encode_sorted_file(path, bc_seqs, umi_seqs)
        assert header.sorted()
        reader = MmapReader(path)
        assert reader.len() == 3
        assert bool(np.all(np.diff(reader.barcodes().astype(np.uint64)) >= 0))

        h2, bc2, umi2, idx2 = decode_file(path, as_strings=True)
        assert (h2.bc_len, h2.umi_len) == (16, 12)
        assert set(bc2) == {s.upper() for s in bc_seqs}
        assert sorted(idx2.tolist()) == [0, 1, 2]

    def test_validation(self, tmp_path):
        with pytest.raises(ValueError, match="invalid nucleotide"):
            encode_sorted_file(str(tmp_path / "x.ibu"), ["ACGN"], ["ACGT"])
        with pytest.raises(ValueError, match="barcodes but"):
            encode_sorted_file(str(tmp_path / "x.ibu"), ["ACGT"], ["AC", "GT"])

    def test_array_input(self, tmp_path):
        path = str(tmp_path / "a.ibu")
        bc = random_seqs(200, 10, 5)
        umi = random_seqs(200, 6, 6)
        encode_sorted_file(path, bc, umi)
        header, bc2, umi2, idx = decode_file(path)
        assert (header.bc_len, header.umi_len) == (10, 6)
        # decoded rows are a permutation of the inputs (sorted by barcode)
        assert sorted(map(bytes, bc2)) == sorted(map(bytes, bc))
