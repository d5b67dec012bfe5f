#!/usr/bin/env python
"""Host→device transfer-size sweep for the tunneled TPU link.

stream_lab showed wildly non-linear device_put bandwidth (25 MB → 1.3 GB/s,
101 MB → 0.22 GB/s). This sweep measures, per batch size:

* sync: one put at a time, block after each (latency view);
* pipelined: enqueue ``depth`` puts of DISTINCT data back-to-back, block
  at the end (the DeviceStream feed pattern — sustained view).

Every put uses distinct bytes (the backend memoizes identical work).
Prints one JSON dict keyed by MB size.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ibu_tpu.utils import apply_platform_env

apply_platform_env()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sizes", default="0.25,0.5,1,2,4,8",
                    help="batch sizes in M records (24 B each on wire)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--budget-mb", type=float, default=256.0,
                    help="max bytes pipelined per sustained measurement")
    args = ap.parse_args()

    import jax

    from ibu_tpu.parallel.device import make_mesh, shard_batch

    mesh = make_mesh()
    log(f"platform: {jax.devices()[0].platform}")
    rng = np.random.default_rng(7)

    def fresh(b):
        return rng.integers(0, 2**32, size=(b, 6), dtype=np.uint64).astype(
            np.uint32
        )

    # global warmup
    jax.block_until_ready(shard_batch(fresh(1 << 18), mesh)[0])

    out = {}
    for spec in args.sizes.split(","):
        b = int(float(spec) * (1 << 20))
        nbytes = b * 24
        res = {"records": b, "MB": round(nbytes / 1e6, 1)}

        sync_t = []
        for _ in range(args.reps):
            raw = fresh(b)
            t0 = time.perf_counter()
            jax.block_until_ready(shard_batch(raw, mesh)[0])
            sync_t.append(time.perf_counter() - t0)
        res["sync_GB_s"] = [round(nbytes / t / 1e9, 3) for t in sync_t]

        depth = max(1, min(args.depth, int(args.budget_mb * 1e6 / nbytes)))
        sus_t = []
        for _ in range(args.reps):
            raws = [fresh(b) for _ in range(depth)]
            t0 = time.perf_counter()
            placed = [shard_batch(r, mesh)[0] for r in raws]
            jax.block_until_ready(placed)
            sus_t.append(time.perf_counter() - t0)
        res["depth"] = depth
        res["sustained_GB_s"] = [
            round(depth * nbytes / t / 1e9, 3) for t in sus_t
        ]
        out[spec] = res
        log(f"  {spec}M rec ({res['MB']} MB): sync {res['sync_GB_s']} "
            f"sustained(d={depth}) {res['sustained_GB_s']} GB/s")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
