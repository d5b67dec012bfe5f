#!/usr/bin/env python
"""Sustained put-train timing: where does tunnel bandwidth collapse?

Short put bursts measure ~1-4 GB/s, but the streaming engine (2.4 GB
continuous) sustains only ~0.05 GB/s. This lab times a long train of
back-to-back device_puts of distinct 24 MB batches, per-put, optionally
interleaving the stats step between puts (the engine pattern), to locate
the collapse: cumulative-volume throttle vs compute-interleave effect.

Prints one JSON dict with per-put seconds.
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
    ap.add_argument("--batch-records", type=int, default=1 << 20)
    ap.add_argument("--train", type=int, default=40)
    ap.add_argument("--mode", choices=["put", "engine"], default="put")
    ap.add_argument("--block-each", action="store_true",
                    help="block after every put (default: block at end)")
    args = ap.parse_args()

    import jax

    from ibu_tpu.parallel.device import (
        STATS_MAP_REDUCE,
        make_mesh,
        shard_batch,
    )

    b = args.batch_records
    nbytes = b * 24
    mesh = make_mesh()
    log(f"platform: {jax.devices()[0].platform}, {args.train} x "
        f"{nbytes/1e6:.0f} MB, mode={args.mode}, block_each={args.block_each}")

    rng = np.random.default_rng(11)
    batches = [
        rng.integers(0, 2**32, (b, 6), dtype=np.uint64).astype(np.uint32)
        for _ in range(args.train)
    ]

    step = STATS_MAP_REDUCE.compile_step(mesh)
    states = STATS_MAP_REDUCE.initial_states(mesh)
    # warm both paths
    w_raw, w_valid = shard_batch(batches[0], mesh)
    states = step(states, w_raw, w_valid)
    jax.block_until_ready(states)
    states = STATS_MAP_REDUCE.initial_states(mesh)

    per_put = []
    placed = []
    t_start = time.perf_counter()
    for raw in batches:
        t0 = time.perf_counter()
        dev_raw, dev_valid = shard_batch(raw, mesh)
        if args.mode == "engine":
            states = step(states, dev_raw, dev_valid)
        else:
            placed.append(dev_raw)
        if args.block_each:
            jax.block_until_ready(dev_raw)
        per_put.append(time.perf_counter() - t0)
    if args.mode == "engine":
        jax.block_until_ready(states)
    else:
        jax.block_until_ready(placed)
    total = time.perf_counter() - t_start
    gbps = args.train * nbytes / total / 1e9
    log(f"  total {total:.2f}s = {gbps:.3f} GB/s sustained")
    log("  per-put ms: " + " ".join(f"{t*1e3:.0f}" for t in per_put))
    print(json.dumps({
        "MB": round(nbytes / 1e6, 1),
        "train": args.train,
        "mode": args.mode,
        "block_each": args.block_each,
        "total_s": round(total, 3),
        "GB_s": round(gbps, 3),
        "per_put_ms": [round(t * 1e3, 1) for t in per_put],
    }))


if __name__ == "__main__":
    main()
