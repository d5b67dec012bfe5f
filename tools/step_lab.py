#!/usr/bin/env python
"""Where does the per-batch stats step's time go, device-side?

The streaming engine's step measured ~3.4 GB/s (sync, per 24 MB batch) on
chip — far under the ~500 GB/s kernel SOL. Candidates: the in-jit
(B, 6)→(6, B) transpose (the wire batch is lane-padded 6→8 on device), or
the limb-sum reduction itself. Chained device-resident iterations with a
salt XOR per iter (bench.py's anti-memoization methodology; timing slope
over k gives per-iter cost without host round-trips).

Prints one JSON dict of GB/s (logical wire bytes = 24 B/record) per stage.
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
    ap.add_argument("--records", type=int, default=1 << 22)
    ap.add_argument("--k", nargs=2, type=int, default=(4, 16),
                    help="two chain lengths for the slope")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ibu_tpu.ops.stats import field_sums_soa

    B = args.records
    nbytes = B * 24
    log(f"platform: {jax.devices()[0].platform}, batch {nbytes/1e6:.0f} MB")

    rng = np.random.default_rng(9)
    raw = jax.device_put(
        rng.integers(0, 2**32, (B, 6), dtype=np.uint64).astype(np.uint32)
    )
    soa = jax.device_put(
        rng.integers(0, 2**32, (6, B), dtype=np.uint64).astype(np.uint32)
    )
    jax.block_until_ready((raw, soa))

    def chain(body, x0, k):
        @jax.jit
        def run(x, salt):
            def it(i, carry):
                acc, s = carry
                out = body(x, s)
                return (acc + out, s + jnp.uint32(1))

            acc, _ = jax.lax.fori_loop(
                0, k, it, (jnp.zeros((3, 4, 2), jnp.uint32), salt)
            )
            return acc
        return run

    def time_slope(body, x0):
        k_lo, k_hi = args.k
        best = {}
        for k in (k_lo, k_hi):
            run = chain(body, x0, k)
            salt = jnp.uint32(1)
            jax.block_until_ready(run(x0, salt))  # compile
            times = []
            for r in range(args.reps):
                salt = jnp.uint32(r * 1013 + 7)
                t0 = time.perf_counter()
                jax.block_until_ready(run(x0, salt))
                times.append(time.perf_counter() - t0)
            best[k] = min(times)
        per_iter = (best[k_hi] - best[k_lo]) / (k_hi - k_lo)
        return per_iter, best

    stages = {}

    def transpose_step(x, s):
        return field_sums_soa((x ^ s).T)

    def sums_only(x, s):
        return field_sums_soa(x ^ s)

    def touch_only(x, s):
        # minimal full-read control: one pass, trivial math
        v = (x ^ s).astype(jnp.uint32)
        t = jnp.sum(v, axis=0, dtype=jnp.uint32)[:2]
        out = jnp.zeros((3, 4, 2), jnp.uint32)
        return out.at[0, 0, 0].set(jnp.sum(t, dtype=jnp.uint32))

    for name, body, x0 in [
        ("step_transpose_sums(B,6)", transpose_step, raw),
        ("sums_only(6,B)", sums_only, soa),
        ("touch_read(B,6)", touch_only, raw),
    ]:
        per_iter, raw_times = time_slope(body, x0)
        gbps = nbytes / per_iter / 1e9 if per_iter > 0 else float("inf")
        stages[name] = {
            "per_iter_ms": round(per_iter * 1e3, 3),
            "GB_s": round(gbps, 1),
            "times": {k: round(v, 4) for k, v in raw_times.items()},
        }
        log(f"  {name}: {per_iter*1e3:.3f} ms/iter = {gbps:.1f} GB/s")

    print(json.dumps({"records": B, "bytes": nbytes, "stages": stages}))


if __name__ == "__main__":
    main()
