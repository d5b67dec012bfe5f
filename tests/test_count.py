"""Count-matrix pipeline: barcode × index molecule counts vs set oracles.

Anchored on hand-built read sets with known duplicate structure, a random
cross-check against a dict-of-sets oracle, equality with dedup_file →
raw-read counting, and the MatrixMarket output format itself.
"""

import subprocess
import sys

import numpy as np
import pytest

from ibu_tpu import Header, MmapReader, Writer
from ibu_tpu.constructs.record import make_records
from ibu_tpu.pipelines import count_matrix


def _write(path, bc, umi, idx, bc_len=8, umi_len=6):
    recs = make_records(
        np.asarray(bc, np.uint64), np.asarray(umi, np.uint64),
        np.asarray(idx, np.uint64),
    )
    with Writer.from_path(str(path), Header.new(bc_len, umi_len)) as w:
        w.write_batch(recs)
    return str(path), recs


def _oracle(recs, dedup=True):
    """molecules[(bc, idx)] = distinct umis (dedup) or read count."""
    out: dict[tuple[int, int], int] = {}
    seen = set()
    for r in recs:
        key = (int(r["barcode"]), int(r["index"]))
        if dedup:
            triple = (*key, int(r["umi"]))
            if triple in seen:
                continue
            seen.add(triple)
        out[key] = out.get(key, 0) + 1
    return out


def _read_mtx(prefix):
    lines = open(f"{prefix}.mtx").read().splitlines()
    assert lines[0].startswith("%%MatrixMarket")
    body = [l for l in lines if not l.startswith("%")]
    nr, nc, nnz = map(int, body[0].split())
    barcodes = open(f"{prefix}.barcodes.txt").read().split()
    indices = [int(x) for x in open(f"{prefix}.indices.txt").read().split()]
    assert len(barcodes) == nr and len(indices) == nc
    entries = {}
    for l in body[1:]:
        r, c, v = map(int, l.split())
        entries[(barcodes[r - 1], indices[c - 1])] = v
    assert len(entries) == nnz
    return entries


class TestCountMatrix:
    def test_known_duplicate_structure(self, tmp_path):
        # bc=1: idx 10 with umis {1,1,2} -> 2 molecules; idx 11 umi 1 -> 1
        # bc=2: idx 10 umi 9 duplicated 3x -> 1 molecule
        p, recs = _write(
            tmp_path / "a.ibu",
            bc=[1, 1, 1, 1, 2, 2, 2],
            umi=[1, 1, 2, 1, 9, 9, 9],
            idx=[10, 10, 10, 11, 10, 10, 10],
        )
        prefix = str(tmp_path / "out")
        stats = count_matrix(p, prefix)
        assert stats == {
            "barcodes": 2, "indices": 2, "entries": 3, "molecules": 4,
            "records": 7,
        }
        from ibu_tpu.ops import codec as C

        entries = _read_mtx(prefix)
        b1 = C.decode_seqs(np.array([1], np.uint64), 8)[0]
        b2 = C.decode_seqs(np.array([2], np.uint64), 8)[0]
        assert entries == {(b1, 10): 2, (b1, 11): 1, (b2, 10): 1}

    @pytest.mark.parametrize("dedup", [True, False])
    def test_random_vs_oracle(self, tmp_path, dedup):
        rng = np.random.default_rng(5)
        n = 5000
        p, recs = _write(
            tmp_path / "r.ibu",
            bc=rng.integers(0, 40, n),
            umi=rng.integers(0, 8, n),
            idx=rng.integers(0, 25, n),
        )
        prefix = str(tmp_path / "r")
        stats = count_matrix(p, prefix, batch_records=700, dedup=dedup)
        want = _oracle(recs, dedup=dedup)
        assert stats["entries"] == len(want)
        assert stats["molecules"] == sum(want.values())
        from ibu_tpu.ops import codec as C

        entries = _read_mtx(prefix)
        got = {}
        for (bseq, i), v in entries.items():
            b = int(C.np_pack(C.seqs_to_rows([bseq]))[0])
            got[(b, i)] = v
        assert got == want

    def test_dedup_file_then_raw_counts_match_dedup_semantics(self, tmp_path):
        from ibu_tpu.pipelines import dedup_file, sort_file_device

        rng = np.random.default_rng(9)
        n = 3000
        p, recs = _write(
            tmp_path / "x.ibu",
            bc=rng.integers(0, 20, n),
            umi=rng.integers(0, 6, n),
            idx=rng.integers(0, 10, n),
        )
        srt = str(tmp_path / "x.sorted.ibu")
        sort_file_device(p, srt)
        dd = str(tmp_path / "x.dedup.ibu")
        dedup_file(srt, dd)
        a = count_matrix(p, str(tmp_path / "a"))
        # NOTE: dedup_file collapses by (bc, umi) keeping the min index, so
        # raw counting the dedup'd file is NOT generally identical — but
        # triple-dedup counting the raw file must be idempotent:
        b = count_matrix(p, str(tmp_path / "b"))
        assert a == b
        assert _read_mtx(str(tmp_path / "a")) == _read_mtx(str(tmp_path / "b"))

    def test_sorted_fast_path_matches_unsorted(self, tmp_path):
        """The O(n) adjacent-diff path (sorted flag set) must produce the
        byte-identical mtx trio the generic path produces — including
        cross-batch boundary duplicates (batch_records chosen so a
        duplicate run straddles a boundary)."""
        rng = np.random.default_rng(21)
        n = 4000
        bc = rng.integers(0, 15, n).astype(np.uint64)
        umi = rng.integers(0, 4, n).astype(np.uint64)
        idx = rng.integers(0, 6, n).astype(np.uint64)
        recs = make_records(bc, umi, idx)
        recs_sorted = np.sort(recs, order=("barcode", "umi", "index"))
        plain, srt = tmp_path / "u.ibu", tmp_path / "s.ibu"
        with Writer.from_path(str(plain), Header.new(8, 6)) as w:
            w.write_batch(recs)
        h = Header.new(8, 6)
        h.set_sorted()
        with Writer.from_path(str(srt), h) as w:
            w.write_batch(recs_sorted)
        for dedup in (True, False):
            a = count_matrix(str(plain), str(tmp_path / "a"),
                             batch_records=333, dedup=dedup)
            b = count_matrix(str(srt), str(tmp_path / "b"),
                             batch_records=333, dedup=dedup)
            assert a == b
            assert (tmp_path / "a.mtx").read_bytes().split(b"\n", 2)[2] == \
                   (tmp_path / "b.mtx").read_bytes().split(b"\n", 2)[2]

    def test_lying_sorted_flag_raises(self, tmp_path):
        recs = make_records(
            np.array([5, 1], np.uint64),
            np.array([0, 0], np.uint64),
            np.array([0, 0], np.uint64),
        )
        h = Header.new(8, 6)
        h.set_sorted()
        path = tmp_path / "liar.ibu"
        with Writer.from_path(str(path), h) as w:
            w.write_batch(recs)
        with pytest.raises(ValueError, match="out of order"):
            count_matrix(str(path), str(tmp_path / "l"))

    def test_device_engine_matches_host_on_sorted_input(self, tmp_path):
        from ibu_tpu.pipelines import sort_file_device

        rng = np.random.default_rng(11)
        n = 6000
        p, _ = _write(
            tmp_path / "d.ibu",
            bc=rng.integers(0, 30, n),
            umi=rng.integers(0, 7, n),
            idx=rng.integers(0, 15, n),
        )
        srt = str(tmp_path / "d.sorted.ibu")
        sort_file_device(p, srt)
        a = count_matrix(srt, str(tmp_path / "h"), batch_records=700)
        b = count_matrix(srt, str(tmp_path / "d"), batch_records=700,
                         engine="device", max_pairs=1024)
        assert a == b
        assert _read_mtx(str(tmp_path / "h")) == _read_mtx(str(tmp_path / "d"))

    def test_device_engine_capacity_growth(self, tmp_path):
        # > 16384 distinct pairs forces the adaptive capacity to grow
        # past its 1<<14 starting point mid-stream; results must still
        # match the host engine exactly
        rng = np.random.default_rng(29)
        n = 30_000
        p, _ = _write(
            tmp_path / "g.ibu",
            bc=np.sort(rng.integers(0, 220, n)),
            umi=rng.integers(0, 5, n),
            idx=rng.integers(0, 120, n),
        )
        from ibu_tpu.pipelines import sort_file_device

        srt = str(tmp_path / "g.sorted.ibu")
        sort_file_device(p, srt)
        a = count_matrix(srt, str(tmp_path / "gh"))
        b = count_matrix(srt, str(tmp_path / "gd"), engine="device")
        assert a == b
        assert a["entries"] > 16384  # growth actually exercised

    def test_pair_kernel_hints_match_unhinted(self):
        from ibu_tpu.ops.stats import pair_molecule_counts
        from ibu_tpu.ops.u64 import soa_from_records

        rng = np.random.default_rng(17)
        recs = make_records(
            rng.integers(0, 40, 3000).astype(np.uint64),
            rng.integers(0, 8, 3000).astype(np.uint64),
            rng.integers(0, 12, 3000).astype(np.uint64),
        )
        soa = soa_from_records(recs)
        base = pair_molecule_counts(soa, max_pairs=1024)
        for kw in (
            {"bc_len": 16},
            {"umi_len": 12},
            {"index_bits": 32},
            {"bc_len": 16, "umi_len": 12, "index_bits": 32},
        ):
            hinted = pair_molecule_counts(soa, max_pairs=1024, **kw)
            for a, b in zip(base, hinted):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_device_engine_boundary_duplicate_triple(self, tmp_path):
        # a run of identical records straddling the batch edge must count
        # as ONE molecule (the boundary -1 correction)
        p, _ = _write(
            tmp_path / "b.ibu",
            bc=[1, 1, 1, 1, 1, 1],
            umi=[2, 2, 2, 2, 2, 2],
            idx=[3, 3, 3, 3, 3, 3],
        )
        for br in (2, 3, 6):
            out = str(tmp_path / f"b{br}")
            stats = count_matrix(p, out, batch_records=br, engine="device",
                                 max_pairs=64)
            assert stats["entries"] == 1 and stats["molecules"] == 1, br

    def test_device_engine_u64_max_fields(self, tmp_path):
        m = np.uint64(0xFFFFFFFFFFFFFFFF)
        p, _ = _write(
            tmp_path / "m.ibu",
            bc=[5, int(m), int(m)], umi=[1, int(m), int(m)],
            idx=[2, int(m), int(m)], bc_len=32, umi_len=32,
        )
        stats = count_matrix(p, str(tmp_path / "m"), engine="device",
                             max_pairs=64)
        assert stats["entries"] == 2 and stats["molecules"] == 2

    def test_device_engine_rejects_unsorted(self, tmp_path):
        p, _ = _write(tmp_path / "u.ibu", bc=[5, 1], umi=[0, 0], idx=[0, 0])
        with pytest.raises(ValueError, match="sorted input"):
            count_matrix(p, str(tmp_path / "u"), engine="device")

    def test_device_engine_rejects_raw_mode_and_overflow(self, tmp_path):
        p, _ = _write(tmp_path / "x.ibu",
                      bc=list(range(20)), umi=[0] * 20, idx=[0] * 20)
        with pytest.raises(ValueError, match="dedup semantics"):
            count_matrix(p, str(tmp_path / "x"), engine="device", dedup=False)
        with pytest.raises(ValueError, match="max_pairs"):
            count_matrix(p, str(tmp_path / "x"), engine="device", max_pairs=8)

    def test_empty_file(self, tmp_path):
        p, _ = _write(tmp_path / "e.ibu", bc=[], umi=[], idx=[])
        stats = count_matrix(p, str(tmp_path / "e"))
        assert stats == {
            "barcodes": 0, "indices": 0, "entries": 0, "molecules": 0,
            "records": 0,
        }
        assert _read_mtx(str(tmp_path / "e")) == {}

    def test_compressed_input_clear_error(self, tmp_path):
        import gzip as _gz

        recs = make_records(
            np.arange(5, dtype=np.uint64), np.zeros(5, np.uint64),
            np.zeros(5, np.uint64),
        )
        p = str(tmp_path / "z.ibu.gz")
        h = Header.new(8, 6)
        with Writer.from_path(p, h, compression="auto") as w:
            w.write_batch(recs)
        with pytest.raises(ValueError, match="gzip-compressed"):
            count_matrix(p, str(tmp_path / "z"))
        from ibu_tpu.pipelines import correct_file

        with pytest.raises(ValueError, match="gzip-compressed"):
            correct_file(p, str(tmp_path / "z.ibu"), [1])

    def test_cli(self, tmp_path):
        p, _ = _write(tmp_path / "c.ibu", bc=[3, 3], umi=[1, 1], idx=[7, 7])
        r = subprocess.run(
            [sys.executable, "-m", "ibu_tpu", "count", p,
             str(tmp_path / "c")],
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        assert "1 barcodes x 1 indices, 1 nonzero entries, 1 molecules" \
            in r.stdout
