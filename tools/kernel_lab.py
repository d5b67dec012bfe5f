#!/usr/bin/env python
"""Kernel-layout experiment lab for the fused record codec (ROADMAP #1).

Sweeps layout combinations on the live device and prints a throughput
table; useful-GB/s uses the SAME byte accounting as bench.py
(120 B/record/roundtrip for bc16/umi12), so rows are directly comparable
with the headline number.

Axes:
  enc in   sep   two u8 planes (16,N)+(12,N)      [production]
           comb  one u8 plane (32,N), rows 28-31 'A'-padded
  soa      6     (6,N) u32                        [production]
           8     (8,N) u32, 2 zero rows (+33% soa traffic, native tiling)
  dec out  sep   two u8 planes (16,N)+(12,N)      [production]
           comb  one u8 plane (32,N)

sep/6/sep replicates the production kernels exactly (sanity row).

Timing: identical to bench.py — fori_loop with an SMEM salt carry inside
one XLA execution; per-iter = slope between two loop counts. Immune to
dispatch overhead and backend memoization.

Usage: python tools/kernel_lab.py [--records N] [--tiles 16384]
       [--variants sep6sep,comb8comb,...]
"""

from __future__ import annotations

import argparse
import functools
import itertools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ibu_tpu.utils import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ibu_tpu.ops.codec_pallas import _ascii_to_codes, _decode_tile, _encode_tile

BC, UMI = 16, 12
USEFUL_BYTES = 2 * (BC + UMI + 8 + 24)  # == bench.py accounting


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _spec(rows, tile_n):
    return pl.BlockSpec((rows, tile_n), lambda j: (0, j),
                        memory_space=pltpu.VMEM)


def make_roundtrip(enc_in: str, soa_rows: int, dec_out: str, tile_n: int):
    """Build a jittable (comb, idx, salt) -> (plane-ish, idx) roundtrip."""

    def enc_kernel_sep(salt_ref, bc_ref, umi_ref, idx_ref, out_ref):
        bc = _encode_tile(_ascii_to_codes(bc_ref[:]), BC, 0)
        umi = _encode_tile(_ascii_to_codes(umi_ref[:]), UMI, 0)
        idx = idx_ref[:] ^ salt_ref[0]
        parts = [bc, umi, idx]
        if soa_rows == 8:
            parts.append(jnp.zeros_like(idx))
        out_ref[:] = jnp.concatenate(parts, axis=0)

    def enc_kernel_comb(salt_ref, comb_ref, idx_ref, out_ref):
        codes = _ascii_to_codes(comb_ref[:])
        bc = _encode_tile(codes[:BC], BC, 0)
        umi = _encode_tile(codes[BC : BC + UMI], UMI, 0)
        idx = idx_ref[:] ^ salt_ref[0]
        parts = [bc, umi, idx]
        if soa_rows == 8:
            parts.append(jnp.zeros_like(idx))
        out_ref[:] = jnp.concatenate(parts, axis=0)

    def dec_kernel_sep(soa_ref, bc_out, umi_out, idx_out):
        soa = soa_ref[:]
        bc_out[:] = _decode_tile(soa[0:2], BC)
        umi_out[:] = _decode_tile(soa[2:4], UMI)
        idx_out[:] = soa[4:6]

    def dec_kernel_comb(soa_ref, comb_out, idx_out):
        soa = soa_ref[:]
        bc = _decode_tile(soa[0:2], BC)
        umi = _decode_tile(soa[2:4], UMI)
        pad = jnp.full((32 - BC - UMI,) + bc.shape[1:], 65, jnp.uint8)
        comb_out[:] = jnp.concatenate([bc, umi, pad], axis=0)
        idx_out[:] = soa[4:6]

    cp = pltpu.CompilerParams(dimension_semantics=("parallel",))

    def encode(comb, bc_arr, umi_arr, idx_pair, salt):
        n = comb.shape[1]
        if enc_in == "sep":
            ins = (bc_arr, umi_arr, idx_pair)
            specs = [_spec(BC, tile_n), _spec(UMI, tile_n), _spec(2, tile_n)]
            kern = enc_kernel_sep
        else:
            ins = (comb, idx_pair)
            specs = [_spec(32, tile_n), _spec(2, tile_n)]
            kern = enc_kernel_comb
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((soa_rows, n), jnp.uint32),
            grid=(n // tile_n,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + specs,
            out_specs=_spec(soa_rows, tile_n),
            compiler_params=cp,
        )(salt.reshape((1,)), *ins)

    def decode(soa):
        n = soa.shape[1]
        if dec_out == "sep":
            out_shape = (
                jax.ShapeDtypeStruct((BC, n), jnp.uint8),
                jax.ShapeDtypeStruct((UMI, n), jnp.uint8),
                jax.ShapeDtypeStruct((2, n), jnp.uint32),
            )
            out_specs = (_spec(BC, tile_n), _spec(UMI, tile_n),
                         _spec(2, tile_n))
            kern = dec_kernel_sep
        else:
            out_shape = (
                jax.ShapeDtypeStruct((32, n), jnp.uint8),
                jax.ShapeDtypeStruct((2, n), jnp.uint32),
            )
            out_specs = (_spec(32, tile_n), _spec(2, tile_n))
            kern = dec_kernel_comb
        return pl.pallas_call(
            kern,
            out_shape=out_shape,
            grid=(n // tile_n,),
            in_specs=[_spec(soa_rows, tile_n)],
            out_specs=out_specs,
            compiler_params=cp,
        )(soa)

    def roundtrip(comb, bc_arr, umi_arr, idx_pair, salt):
        soa = encode(comb, bc_arr, umi_arr, idx_pair, salt)
        out = decode(soa)
        if dec_out == "sep":
            bc, umi, idx = out
            return bc, umi, idx  # probe reads bc[0,0] + idx
        plane, idx = out
        return plane, None, idx

    return roundtrip


# -- harness ----------------------------------------------------------------


def make_inputs(n: int):
    @jax.jit
    def gen():
        row = jax.lax.broadcasted_iota(jnp.int32, (32, n), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (32, n), 1)
        code = (row * 7 + col) % 4
        comb = (65 + 2 * code + 2 * (code >> 1) + 11 * (code & (code >> 1))
                ).astype(jnp.uint8)
        idx = jnp.stack(
            [
                jax.lax.broadcasted_iota(jnp.uint32, (2, n), 1)[0],
                jnp.zeros((n,), jnp.uint32),
            ]
        )
        # sep variants get their OWN materialized buffers (a row-slice of
        # comb inside the timed jit could alias with a stride and unfairly
        # penalize them)
        bc = jnp.copy(comb[:BC])
        umi = jnp.copy(comb[BC : BC + UMI])
        return comb, bc, umi, idx

    out = gen()
    jax.block_until_ready(out)
    return out


def check_correct(roundtrip, comb, bc, umi, idx):
    import numpy as np

    bc2, umi2, idx2 = roundtrip(comb, bc, umi, idx, jnp.uint32(0))
    m = 2048
    if umi2 is None:  # combined decode output
        got = np.asarray(bc2[: BC + UMI, :m])
    else:
        got = np.concatenate(
            [np.asarray(bc2[:, :m]), np.asarray(umi2[:, :m])]
        )
    want = np.asarray(comb[: BC + UMI, :m])
    assert np.array_equal(got, want), "ascii roundtrip mismatch"
    assert np.array_equal(np.asarray(idx2[0, :m]),
                          np.arange(m, dtype=np.uint32))


def slope_time(roundtrip, comb, bc, umi, idx, k_lo=5, k_hi=20, reps=3):
    def runner(k):
        @jax.jit
        def run(comb, bc, umi, idx, c0):
            def body(_, carry):
                bc2, _, idx2 = roundtrip(comb, bc, umi, idx, carry)
                return (
                    carry
                    + idx2[0, -1]
                    + bc2[0, 0].astype(jnp.uint32)
                    + jnp.uint32(1)
                ).astype(jnp.uint32)

            return jax.lax.fori_loop(0, k, body, c0)

        return run

    run_lo, run_hi = runner(k_lo), runner(k_hi)
    seed = [int(time.time()) % 100000]

    def fresh():
        seed[0] += 1
        return jnp.uint32(seed[0])

    jax.block_until_ready((run_lo(comb, bc, umi, idx, fresh()),
                           run_hi(comb, bc, umi, idx, fresh())))

    def best_of(run):
        best = float("inf")
        for _ in range(reps):
            c0 = fresh()
            t0 = time.perf_counter()
            jax.block_until_ready(run(comb, bc, umi, idx, c0))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = best_of(run_lo), best_of(run_hi)
    dt = (t_hi - t_lo) / (k_hi - k_lo)
    if dt <= 0:
        dt = t_hi / k_hi
    return dt, t_lo, t_hi


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--records", type=int, default=1 << 24)
    ap.add_argument("--tiles", default="16384")
    ap.add_argument("--variants", default=None,
                    help="comma list like sep6sep,comb8comb (default: all)")
    args = ap.parse_args()
    n = args.records
    tiles = [int(t) for t in args.tiles.split(",")]

    log(f"backend: {jax.default_backend()} n={n}")
    comb, bc, umi, idx = make_inputs(n)

    combos = [
        (e, s, d)
        for e, s, d in itertools.product(["sep", "comb"], [6, 8],
                                         ["sep", "comb"])
    ]
    if args.variants:
        want = set(args.variants.split(","))
        combos = [c for c in combos if f"{c[0]}{c[1]}{c[2]}" in want]

    print(f"{'variant':<18} {'ms/iter':>9} {'GB/s':>8}")
    for tile_n in tiles:
        for e, s, d in combos:
            name = f"{e}{s}{d}/t{tile_n}"
            try:
                rt = make_roundtrip(e, s, d, tile_n)
                check_correct(rt, comb, bc, umi, idx)
                dt, t_lo, t_hi = slope_time(rt, comb, bc, umi, idx)
                gbps = n * USEFUL_BYTES / dt / 1e9
                print(f"{name:<18} {dt*1e3:>9.3f} {gbps:>8.1f}   "
                      f"[k5={t_lo*1e3:.1f}ms k20={t_hi*1e3:.1f}ms]",
                      flush=True)
            except Exception as ex:
                print(f"{name:<18} FAILED: {type(ex).__name__}: {ex}",
                      flush=True)


if __name__ == "__main__":
    main()
