#!/usr/bin/env python
"""Records/s scaling efficiency across mesh sizes.

Measures the streaming stats engine (count + exact field checksums) over
the same file at mesh sizes 1, 2, 4, ..., all available devices, and
reports records/s and parallel efficiency vs the single-device baseline —
the measurement for BASELINE.md's "≥85% records/s scaling" target.

On a real pod slice, run one process per host (jax.distributed) and this
script measures ICI/DCN-merged scaling; on a single host it measures
chip-level scaling. On a CPU dev box the virtual devices share physical
cores, so efficiencies are lower bounds only.

Prints one JSON line:
    {"devices": [...], "records_per_s": [...], "efficiency": [...]}
"""

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


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--records", type=float, default=8.0,
                    help="records in millions")
    ap.add_argument("--batch-records", type=int, default=1 << 21)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    from ibu_tpu.io.mmap import MmapReader
    from ibu_tpu.parallel.device import AXIS, stream_file_stats
    from ibu_tpu.utils.datagen import parallel_fields, write_patterned_file
    from jax.sharding import Mesh

    n = int(args.records * 1_000_000)
    workdir = tempfile.mkdtemp(prefix="ibu_scaling_")
    path = os.path.join(workdir, "scale.ibu")
    print(f"writing {n} records...", file=sys.stderr, flush=True)
    write_patterned_file(path, n, parallel_fields)

    devices = jax.devices()
    sizes = []
    d = 1
    while d <= len(devices):
        sizes.append(d)
        d *= 2
    if sizes[-1] != len(devices):
        sizes.append(len(devices))

    want_idx = (n * (n - 1) // 2) & 0xFFFFFFFFFFFFFFFF
    rates = []
    for size in sizes:
        mesh = Mesh(np.array(devices[:size]), (AXIS,))
        reader = MmapReader(path)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            stats = stream_file_stats(
                reader, mesh=mesh, batch_records=args.batch_records
            )
            best = min(best, time.perf_counter() - t0)
        assert stats["count"] == n and stats["index_sum"] == want_idx
        rate = n / best
        rates.append(rate)
        print(f"  {size} device(s): {best:.2f}s = {rate/1e6:.1f} M rec/s",
              file=sys.stderr, flush=True)

    eff = [r / (rates[0] * s) for r, s in zip(rates, sizes)]
    os.remove(path)
    print(json.dumps({
        "devices": sizes,
        "records_per_s": [round(r) for r in rates],
        "efficiency": [round(e, 3) for e in eff],
    }))


if __name__ == "__main__":
    main()
