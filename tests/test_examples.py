"""Smoke tests for the example CLIs and bench (subprocess, CPU-pinned)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENV = {
    **os.environ,
    "JAX_PLATFORMS": "cpu",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
}


def run(args, timeout=180):
    return subprocess.run(
        [sys.executable] + args,
        capture_output=True,
        text=True,
        timeout=timeout,
        env=ENV,
        cwd=REPO,
    )


class TestRandomExample:
    def test_generates_file(self, tmp_path):
        out = str(tmp_path / "r.ibu")
        p = run([f"{REPO}/examples/random.py", out, "--records", "0.01",
                 "--seed", "7"])
        assert p.returncode == 0, p.stderr
        assert "Finished generating 10000 records" in p.stderr
        assert os.path.getsize(out) == 32 + 10_000 * 24

    def test_respects_lengths_and_ranges(self, tmp_path):
        out = str(tmp_path / "r.ibu")
        p = run([f"{REPO}/examples/random.py", out, "--records", "0.001",
                 "--bc-len", "8", "--umi-len", "6", "--barcodes", "4",
                 "--max-index", "9", "--seed", "1"])
        assert p.returncode == 0, p.stderr
        from ibu_tpu import load_to_vec

        header, recs = load_to_vec(out)
        assert (header.bc_len, header.umi_len) == (8, 6)
        assert recs["barcode"].max() < 4
        assert recs["index"].max() < 9


class TestRoundtripExample:
    def test_small_roundtrip(self, tmp_path):
        p = run([f"{REPO}/examples/roundtrip.py", "--records", "0.05",
                 "--file", str(tmp_path / "rt.ibu")])
        assert p.returncode == 0, p.stderr + p.stdout
        assert "Record count matches" in p.stdout
        assert "file cleaned up" in p.stdout
        assert not os.path.exists(tmp_path / "rt.ibu")


class TestParallelExample:
    def test_both_engines(self, tmp_path):
        p = run([f"{REPO}/examples/parallel.py", "--records", "0.05",
                 "--engine", "both", "--file", str(tmp_path / "p.ibu")])
        assert p.returncode == 0, p.stderr + p.stdout
        assert p.stdout.count("checksum OK") == 2


class TestFastqIngest:
    def test_synthetic_roundtrip(self, tmp_path):
        p = run([f"{REPO}/examples/fastq_ingest.py", "--reads", "20000",
                 "--out", str(tmp_path / "f.ibu")], timeout=240)
        assert p.returncode == 0, p.stderr + p.stdout
        assert "verified: 20000 records" in p.stdout
        assert "barcodes sorted: True" in p.stdout


class TestWorkflowExample:
    def test_full_chain_recovers_planted_truth(self, tmp_path):
        p = run([f"{REPO}/examples/workflow.py", "--reads", "20000",
                 "--cells", "40", "--genes", "20",
                 "--workdir", str(tmp_path)], timeout=300)
        assert p.returncode == 0, p.stderr + p.stdout
        assert "surviving entries match the planted truth" in p.stdout
        assert "100.0% coverage" in p.stdout
        assert os.path.exists(tmp_path / "counts.mtx")


class TestBench:
    def test_bench_cpu_emits_json_line(self):
        p = run([f"{REPO}/bench.py", "--records", "65536", "--iters", "2"],
                timeout=240)
        assert p.returncode == 0, p.stderr
        line = p.stdout.strip().splitlines()[-1]
        d = json.loads(line)
        assert set(d) >= {"metric", "value", "unit", "vs_baseline"}
        passed, total = d["validate"].split("/")  # on-device matrix ran
        assert passed == total and int(total) >= 23
        assert d["unit"] == "GB/s"
        assert d["value"] > 0


class TestGraftEntry:
    def test_entry_and_dryrun(self):
        p = run([f"{REPO}/__graft_entry__.py"], timeout=240)
        assert p.returncode == 0, p.stderr
        assert "entry OK" in p.stdout
        assert "dryrun_multichip(8) OK" in p.stdout


class TestCli:
    def test_info_stats_sort_decode(self, tmp_path):
        out = str(tmp_path / "c.ibu")
        p = run([f"{REPO}/examples/random.py", out, "--records", "0.005",
                 "--barcodes", "10", "--seed", "2"])
        assert p.returncode == 0, p.stderr
        import json as J

        p = run(["-m", "ibu_tpu", "info", out])
        assert p.returncode == 0, p.stderr
        d = J.loads(p.stdout)
        assert d["records"] == 5000 and not d["sorted"]

        p = run(["-m", "ibu_tpu", "stats", out])
        assert p.returncode == 0, p.stderr
        device_stats = J.loads(p.stdout.strip().splitlines()[-1])
        assert device_stats["count"] == 5000

        # the native host engine must agree exactly with the device engine
        p = run(["-m", "ibu_tpu", "stats", out, "--engine", "native"])
        if "native runtime unavailable" in p.stderr:
            pass  # no native build on this box — the only legitimate skip
        else:
            assert p.returncode == 0, p.stderr
            assert J.loads(p.stdout.strip().splitlines()[-1]) == device_stats

        # compressed inputs stream through the same MapReduce: identical
        # stats; the native engine refuses with a clear message
        import gzip as _gz

        gz = str(tmp_path / "c.ibu.gz")
        with open(out, "rb") as fsrc, _gz.open(gz, "wb") as fdst:
            fdst.write(fsrc.read())
        p = run(["-m", "ibu_tpu", "stats", gz])
        assert p.returncode == 0, p.stderr
        assert J.loads(p.stdout.strip().splitlines()[-1]) == device_stats
        p = run(["-m", "ibu_tpu", "stats", gz, "--engine", "native"])
        assert p.returncode == 1
        assert "gzip-compressed" in p.stderr

        dst = str(tmp_path / "s.ibu")
        p = run(["-m", "ibu_tpu", "sort", out, dst])
        assert p.returncode == 0, p.stderr
        p = run(["-m", "ibu_tpu", "info", dst])
        assert J.loads(p.stdout)["sorted"] is True

        p = run(["-m", "ibu_tpu", "decode", dst, "--limit", "3"])
        assert p.returncode == 0, p.stderr
        lines = p.stdout.strip().splitlines()
        assert len(lines) == 3 and all(len(l.split("\t")) == 3 for l in lines)

    def test_export_fastq(self, tmp_path):
        out = str(tmp_path / "e.ibu")
        p = run([f"{REPO}/examples/random.py", out, "--records", "0.002",
                 "--seed", "3"])
        assert p.returncode == 0, p.stderr
        fq = str(tmp_path / "e.fastq")
        p = run(["-m", "ibu_tpu", "export-fastq", out, fq])
        assert p.returncode == 0, p.stderr
        assert "exported 2000 reads" in p.stderr
        lines = open(fq, "rb").read().splitlines()
        assert len(lines) == 8000
        assert lines[0].startswith(b"@r") and lines[2] == b"+"
        assert set(lines[1]) <= set(b"ACGT")


class TestScalingBenchmark:
    def test_pinned_process_mode(self, tmp_path):
        """The honest CPU-box efficiency mode must produce a sane JSON
        line (full-size runs are recorded in RESULTS.md)."""
        p = run([f"{REPO}/benchmarks/scaling.py", "--records", "0.2",
                 "--reps", "1", "--pinned-processes", "2"], timeout=240)
        assert p.returncode == 0, p.stderr
        d = json.loads(p.stdout.strip().splitlines()[-1])
        assert d["pinned_processes"] == [1, 2]
        assert d["efficiency"][0] == 1.0 and d["efficiency"][1] > 0
        assert all(r > 0 for r in d["records_per_s"])
