#!/usr/bin/env python
"""Does device_put speed depend on the SOURCE host buffer type?

stream_lab measured the engine's mmap-view feed at ~0.03-0.06 GB/s while
put_sweep's fresh-array puts sustained ~4 GB/s at the same shape. The only
difference is the source: a ``np.memmap``-backed structured view vs a heap
numpy array. This lab times device_put of the SAME bytes from:

  fresh   - heap np.ndarray (baseline)
  mmview  - the zero-copy (B, 6) uint32 view of an mmap'd IBU file
  mmcopy  - np.array(view) heap copy made per put (copy time included)
  staged  - np.copyto into a PREALLOCATED heap staging buffer, then put
            (the double-buffer candidate; copy time included)

Each put uses a different file region (distinct bytes; the backend
memoizes identical work). Prints one JSON dict.
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch-records", type=int, default=1 << 20)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax

    from ibu_tpu.io.mmap import MmapReader
    from ibu_tpu.parallel.device import make_mesh, shard_batch
    from ibu_tpu.utils.datagen import parallel_fields, write_patterned_file

    b = args.batch_records
    nbytes = b * 24
    n = b * (args.reps + 1)
    workdir = tempfile.mkdtemp(prefix="ibu_src_", dir="/dev/shm")
    path = os.path.join(workdir, "src.ibu")
    write_patterned_file(path, n, parallel_fields)
    reader = MmapReader(path)
    mesh = make_mesh()
    log(f"platform: {jax.devices()[0].platform}, batch {nbytes/1e6:.0f} MB")

    rng = np.random.default_rng(3)
    jax.block_until_ready(
        shard_batch(
            rng.integers(0, 2**32, (b, 6), dtype=np.uint64).astype(np.uint32),
            mesh,
        )[0]
    )

    def views():
        for r in range(args.reps):
            batch = reader.slice(r * b, (r + 1) * b)
            yield np.ascontiguousarray(batch).view(np.uint32).reshape(-1, 6)

    out = {"MB": round(nbytes / 1e6, 1)}

    def bench(name, put):
        times = []
        for raw in views():
            t0 = time.perf_counter()
            put(raw)
            times.append(time.perf_counter() - t0)
        out[name] = [round(nbytes / t / 1e9, 3) for t in times]
        log(f"  {name}: {out[name]} GB/s")

    bench("mmview", lambda raw: jax.block_until_ready(
        shard_batch(raw, mesh)[0]))
    bench("mmcopy", lambda raw: jax.block_until_ready(
        shard_batch(np.array(raw), mesh)[0]))
    staging = np.empty((b, 6), dtype=np.uint32)

    def staged(raw):
        np.copyto(staging, raw)
        jax.block_until_ready(shard_batch(staging, mesh)[0])

    bench("staged", staged)
    fresh_arrays = [
        rng.integers(0, 2**32, (b, 6), dtype=np.uint64).astype(np.uint32)
        for _ in range(args.reps)
    ]
    times = []
    for raw in fresh_arrays:
        t0 = time.perf_counter()
        jax.block_until_ready(shard_batch(raw, mesh)[0])
        times.append(time.perf_counter() - t0)
    out["fresh"] = [round(nbytes / t / 1e9, 3) for t in times]
    log(f"  fresh: {out['fresh']} GB/s")

    os.remove(path)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
