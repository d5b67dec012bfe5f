#!/usr/bin/env python
"""End-to-end file→device streaming measurement (VERDICT r1 #2).

The reference's flagship path is file→stats (``/root/reference/src/io/
mmap.rs:286-332``): mmap a file, fan record shards out to workers, merge
statistics. The device engine's equivalent is ``stream_file_stats``:
mmap → zero-copy wire view → (prefetched) device placement → sharded
jitted step → device-side merge. This lab answers, with numbers:

1. **transport** — what does a raw ``device_put`` of a production wire
   batch ``(B, 6) uint32`` actually sustain on this host↔device link?
   That is the speed-of-light for ANY host-fed device pipeline.
2. **engine** — what does ``stream_file_stats`` sustain end-to-end over a
   real multi-GB file, and how far is it from the transport SOL?
3. **breakdown** — where does engine time go when each stage is forced
   synchronous (mmap slice / device_put / step)?
4. **host control** — the native threaded host engine on the same file
   (the "beat the host engine or show the transport bound" comparison).

Each rep streams a DIFFERENT file (same size, different pattern): the
tunneled backend memoizes repeated identical executions (see RESULTS.md
"Backend timing pathology"), and distinct bytes per rep defeat that.

Usage: python tools/stream_lab.py --records 100 [--phases t,e,b,h]
Prints one JSON dict to stdout; progress to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ibu_tpu.utils import apply_platform_env

apply_platform_env()

RECORD_SIZE = 24


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_file(path: str, n: int, salt: int) -> dict:
    """Patterned file with closed-form sums; ``salt`` varies the bytes."""
    from ibu_tpu.utils.datagen import write_patterned_file

    m64 = (1 << 64) - 1
    s = (n * (n - 1) // 2) & m64
    salt_u = np.uint64(salt)

    def fields(i: np.ndarray):
        return (i + salt_u) % np.uint64(1_000_000), i * np.uint64(2), i

    write_patterned_file(path, n, fields)
    # (i+salt) % 1M over any full 1M-cycle sums to 0+..+999999
    full, tail = divmod(n, 1_000_000)
    bc = full * (999_999 * 1_000_000 // 2)
    bc += int(((np.arange(tail, dtype=np.uint64) + salt_u)
               % np.uint64(1_000_000)).sum())
    return {
        "count": n,
        "barcode_sum": bc & m64,
        "umi_sum": (2 * (n * (n - 1) // 2)) & m64,
        "index_sum": s,
    }


def phase_transport(n_batch: int, reps: int) -> dict:
    """Raw device_put bandwidth on production wire shapes."""
    import jax

    from ibu_tpu.parallel.device import make_mesh, shard_batch

    mesh = make_mesh()
    out = {}
    for b in dict.fromkeys((1 << 20, 1 << 22, n_batch)):
        raws = [
            np.random.randint(0, 2**32, size=(b, 6), dtype=np.uint64)
            .astype(np.uint32)
            for _ in range(reps)
        ]
        # warm one placement (allocator, layouts)
        jax.block_until_ready(shard_batch(raws[0], mesh)[0])
        times = []
        for raw in raws:
            t0 = time.perf_counter()
            dev, valid = shard_batch(raw, mesh)
            jax.block_until_ready(dev)
            times.append(time.perf_counter() - t0)
        best = min(times)
        gbps = raw.nbytes / best / 1e9
        out[f"put_{b>>20}Mrec"] = {
            "bytes": int(raw.nbytes),
            "best_s": round(best, 4),
            "GB_s": round(gbps, 3),
            "all_s": [round(t, 4) for t in times],
        }
        log(f"  device_put {b} rec ({raw.nbytes/1e6:.0f} MB): "
            f"{gbps:.2f} GB/s best of {reps}")
    return out


def phase_engine(paths: list[str], oracles: list[dict], n_batch: int) -> dict:
    from ibu_tpu.io.mmap import MmapReader
    from ibu_tpu.parallel.device import make_mesh, stream_file_stats

    mesh = make_mesh()
    # warm compile on a tiny file-alike
    small = paths[0]
    stream_file_stats(MmapReader(small), mesh=mesh, batch_records=n_batch)
    times = []
    for path, want in zip(paths, oracles):
        reader = MmapReader(path)
        t0 = time.perf_counter()
        stats = stream_file_stats(reader, mesh=mesh, batch_records=n_batch)
        dt = time.perf_counter() - t0
        assert stats == want, f"oracle mismatch: {stats} != {want}"
        times.append(dt)
    nbytes = os.path.getsize(paths[0]) - 32
    n = nbytes // RECORD_SIZE
    best = min(times)
    res = {
        "batch_records": n_batch,
        "records": n,
        "bytes": nbytes,
        "best_s": round(best, 3),
        "GB_s": round(nbytes / best / 1e9, 3),
        "Mrec_s": round(n / best / 1e6, 1),
        "all_s": [round(t, 3) for t in times],
    }
    log(f"  stream_file_stats: {res['GB_s']} GB/s, {res['Mrec_s']} Mrec/s "
        f"(best of {len(times)})")
    return res


def phase_breakdown(path: str, n_batch: int) -> dict:
    """Force each stage synchronous to attribute time (one pass)."""
    import jax

    from ibu_tpu.io.mmap import MmapReader
    from ibu_tpu.parallel.device import (
        STATS_MAP_REDUCE,
        finalize_stats,
        make_mesh,
        record_batches_from_mmap,
        shard_batch,
    )

    mesh = make_mesh()
    reader = MmapReader(path)
    step = STATS_MAP_REDUCE.compile_step(mesh)
    states = STATS_MAP_REDUCE.initial_states(mesh)
    t_slice = t_put = t_step = 0.0
    nb = 0
    t_all0 = time.perf_counter()
    for batch in record_batches_from_mmap(reader, n_batch):
        nb += 1
        t0 = time.perf_counter()
        raw = np.ascontiguousarray(batch).view(np.uint32).reshape(-1, 6)
        t1 = time.perf_counter()
        dev_raw, dev_valid = shard_batch(raw, mesh)
        jax.block_until_ready(dev_raw)
        t2 = time.perf_counter()
        states = step(states, dev_raw, dev_valid)
        jax.block_until_ready(states)
        t3 = time.perf_counter()
        t_slice += t1 - t0
        t_put += t2 - t1
        t_step += t3 - t2
    finalize_stats(STATS_MAP_REDUCE.finalize(states))
    total = time.perf_counter() - t_all0
    nbytes = os.path.getsize(path) - 32
    res = {
        "batches": nb,
        "slice_s": round(t_slice, 3),
        "device_put_s": round(t_put, 3),
        "step_s": round(t_step, 3),
        "total_s": round(total, 3),
        "put_GB_s": round(nbytes / t_put / 1e9, 3) if t_put else None,
    }
    log(f"  breakdown over {nb} batches: slice {t_slice:.2f}s, "
        f"put {t_put:.2f}s ({res['put_GB_s']} GB/s), step {t_step:.2f}s")
    return res


def phase_host(path: str, want: dict, reps: int) -> dict:
    from ibu_tpu.native import bindings as nb

    if not nb.available():
        return {"skipped": nb.load_error()}
    nbytes = os.path.getsize(path) - 32
    n = nbytes // RECORD_SIZE
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        bc, umi, idx = nb.checksum_parallel(path, n)
        times.append(time.perf_counter() - t0)
    assert (bc, umi, idx) == (
        want["barcode_sum"], want["umi_sum"], want["index_sum"]
    )
    best = min(times)
    res = {
        "best_s": round(best, 3),
        "GB_s": round(nbytes / best / 1e9, 3),
        "Mrec_s": round(n / best / 1e6, 1),
    }
    log(f"  native host engine: {res['GB_s']} GB/s, {res['Mrec_s']} Mrec/s")
    return res


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--records", type=float, default=100.0,
                    help="file size in millions of records")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch-records", type=int, default=4 << 20)
    ap.add_argument("--phases", default="t,e,b,h",
                    help="comma list of t(ransport) e(ngine) b(reakdown) h(ost)")
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()
    phases = set(args.phases.split(","))

    import jax

    n = int(args.records * 1_000_000)
    workdir = args.workdir or tempfile.mkdtemp(
        prefix="ibu_stream_", dir="/dev/shm"
    )
    log(f"platform: {jax.devices()[0].platform}, file: {n} records "
        f"({n*RECORD_SIZE/1e9:.2f} GB) x{args.reps} in {workdir}")
    paths, oracles = [], []
    for r in range(args.reps):
        p = os.path.join(workdir, f"stream_{r}.ibu")
        t0 = time.perf_counter()
        oracles.append(make_file(p, n, salt=r * 7919))
        log(f"  wrote {p} in {time.perf_counter()-t0:.1f}s")
        paths.append(p)

    out = {"records": n, "bytes": n * RECORD_SIZE,
           "platform": jax.devices()[0].platform}
    try:
        if "t" in phases:
            log("phase: transport SOL")
            out["transport"] = phase_transport(args.batch_records, args.reps)
        if "e" in phases:
            log("phase: engine end-to-end")
            out["engine"] = phase_engine(paths, oracles, args.batch_records)
        if "b" in phases:
            log("phase: synchronous breakdown")
            out["breakdown"] = phase_breakdown(paths[0], args.batch_records)
        if "h" in phases:
            log("phase: native host control")
            out["host"] = phase_host(paths[0], oracles[0], args.reps)
    finally:
        for p in paths:
            try:
                os.remove(p)
            except OSError:
                pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
