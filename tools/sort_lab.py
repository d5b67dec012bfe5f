#!/usr/bin/env python
"""Device sort experiments (ROADMAP #2).

Times lax.sort configurations for the record-sort workload on the live
chip, slope-timed inside one execution (same methodology as bench.py).
Questions: what does the 6-key variadic sort cost vs fewer keys; does
is_stable cost; does a packed-significant-bits key help; how does a
digit-extract + single-key-sort radix pass compare (feasibility probe
for a full LSD radix sort).

Usage: python tools/sort_lab.py [--records 16777216]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ibu_tpu.utils import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_soa(n: int):
    @jax.jit
    def gen():
        def col(mult, mask):
            i = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0)
            return (i * jnp.uint32(mult) + (i >> 7)) & jnp.uint32(mask)

        return jnp.stack(
            [
                col(2654435761, 0xFFFFFFFF),  # bc_lo (full 32 bits)
                jnp.zeros((n,), jnp.uint32),  # bc_hi = 0 (bc_len 16)
                col(40503, 0x00FFFFFF),       # umi_lo (24 bits, umi_len 12)
                jnp.zeros((n,), jnp.uint32),  # umi_hi = 0
                jax.lax.broadcasted_iota(jnp.uint32, (n,), 0),  # idx_lo
                jnp.zeros((n,), jnp.uint32),  # idx_hi = 0
            ]
        )

    soa = gen()
    jax.block_until_ready(soa)
    return soa


def slope(fn, soa, k_lo=2, k_hi=6, reps=3):
    """Per-iteration seconds; iterations chained via a derived carry that
    perturbs one operand so no iteration is dead or memoizable."""

    def runner(k):
        @jax.jit
        def run(soa, c0):
            def body(_, carry):
                out = fn(soa, carry)
                # position-weighted checksum: order-dependent over the FULL
                # sorted array, so XLA's sort simplifier cannot rewrite the
                # sort into min/max reductions (consuming only edge elements
                # turned sorts into 0-ms no-ops in the first run)
                pos = jax.lax.broadcasted_iota(jnp.uint32, out.shape, 1)
                probe = jnp.sum((out * pos).astype(jnp.uint32),
                                dtype=jnp.uint32)
                return (probe + carry + jnp.uint32(1)).astype(jnp.uint32)

            return jax.lax.fori_loop(0, k, body, c0)

        return run

    run_lo, run_hi = runner(k_lo), runner(k_hi)
    seed = [int(time.time()) % 100000]

    def fresh():
        seed[0] += 1
        return jnp.uint32(seed[0])

    jax.block_until_ready((run_lo(soa, fresh()), run_hi(soa, fresh())))

    def best(run):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(run(soa, fresh()))
            b = min(b, time.perf_counter() - t0)
        return b

    t_lo, t_hi = best(run_lo), best(run_hi)
    dt = (t_hi - t_lo) / (k_hi - k_lo)
    return (dt if dt > 0 else t_hi / k_hi), t_lo, t_hi


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", type=int, default=1 << 24)
    args = ap.parse_args()
    n = args.records
    log(f"backend={jax.default_backend()} n={n}")
    soa = make_soa(n)

    def sort6(soa, c):
        ops = jax.lax.sort(
            (soa[1], soa[0] ^ c, soa[3], soa[2], soa[5], soa[4]), num_keys=6
        )
        return jnp.stack([ops[1], ops[0]])

    def sort6_stable(soa, c):
        ops = jax.lax.sort(
            (soa[1], soa[0] ^ c, soa[3], soa[2], soa[5], soa[4]),
            num_keys=6,
            is_stable=True,
        )
        return jnp.stack([ops[1], ops[0]])

    def sort4(soa, c):
        # bc_hi/umi_hi known-zero (bc_len<=16): 4 key words carry 2 payloads
        ops = jax.lax.sort(
            (soa[0] ^ c, soa[2], soa[5], soa[4], soa[1], soa[3]), num_keys=4
        )
        return jnp.stack([ops[0], ops[1]])

    def sort3_stable_payload(soa, c):
        # significant (bc_lo, umi_lo) keys; idx payload, input pre-ordered
        # by idx => stability gives full record order
        ops = jax.lax.sort(
            (soa[0] ^ c, soa[2], soa[4], soa[5]), num_keys=2, is_stable=True
        )
        return jnp.stack([ops[0], ops[2]])

    def sort1(soa, c):
        return jnp.stack(jax.lax.sort((soa[0] ^ c,), num_keys=1))

    def sort1_payload5(soa, c):
        ops = jax.lax.sort(
            (soa[0] ^ c, soa[1], soa[2], soa[3], soa[4], soa[5]), num_keys=1
        )
        return jnp.stack([ops[0], ops[4]])

    def radix_pass(soa, c):
        # one LSD pass feasibility probe: extract 8-bit digit, stable-sort
        # by digit with the whole record as payload
        digit = ((soa[0] ^ c) >> 8) & jnp.uint32(0xFF)
        ops = jax.lax.sort(
            (digit, soa[0], soa[2], soa[4], soa[5]), num_keys=1,
            is_stable=True,
        )
        return jnp.stack([ops[1], ops[3]])

    variants = [
        ("sort6 (production)", sort6),
        ("sort6 stable", sort6_stable),
        ("sort4 keys+2payload", sort4),
        ("sort2 stable +idx payload", sort3_stable_payload),
        ("sort1 single key", sort1),
        ("sort1 +5 payload", sort1_payload5),
        ("radix pass (digit+4 payload)", radix_pass),
    ]
    print(f"{'variant':<30} {'ms/iter':>10} {'Mrec/s':>8}")
    for name, fn in variants:
        try:
            dt, t_lo, t_hi = slope(fn, soa)
            print(f"{name:<30} {dt*1e3:>10.1f} {n/dt/1e6:>8.1f}   "
                  f"[k2={t_lo*1e3:.0f}ms k6={t_hi*1e3:.0f}ms]", flush=True)
        except Exception as e:
            print(f"{name:<30} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
