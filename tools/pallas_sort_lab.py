#!/usr/bin/env python
"""Pallas radix-partition sort experiment (VERDICT r3 #8).

Question: can a Pallas 8-bit-digit radix sort beat ``jax.lax.sort`` for
the u32 record-sort workload? A 32-bit LSD radix needs 4 passes; each
pass must (a) compute every element's destination rank and (b) move each
element to a data-dependent position. This lab measures the achievable
throughput of each ingredient as stand-alone Pallas kernels on the live
chip, because the composition can never beat its slowest part:

* K1 ``digit_histogram`` — per-tile 256-bin digit histograms (the
  counting phase shared by every radix formulation): a 256-iteration
  compare-accumulate over the tile. Pure VPU; measures the compute side
  of destination ranks.
* K2 ``rank_cumsum`` — per-element within-tile rank via the one-hot
  cumulative-sum formulation ((TN, 256) i32 cumsum along the record
  axis + one-hot dot): the only Mosaic-expressible exact rank. Its
  traffic amplification (256 lanes of i32 per 4-byte key) is the cost
  of not having per-element gather/scatter.
* K3 ``dynamic_store`` — per (tile, digit) dynamic-offset stores of the
  minimum efficient granularity ((8, 128) i32 rows): the move phase's
  floor. Radix moves ~TN/256 elements per (tile, digit) — far below one
  (8, 128) tile — so real moves pay masked read-modify-write on top of
  whatever this measures.
* Baseline: ``lax.sort`` 1-op and 3-op (the production comparator after
  hint-dropping), distinct inputs + value-fetch timing (fori+salt slope
  reports ~0 for sort bodies on this backend — see tools/sort_lab.py).

Verdict math: a radix pass must run 4x faster than ``lax.sort`` END TO
END just to tie (4 passes), i.e. each pass's slowest ingredient must
beat baseline/4.

Usage: python tools/pallas_sort_lab.py [--records N] [--interpret]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ibu_tpu.utils import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

ROWS, LANES = 64, 128
TILE = ROWS * LANES  # 8192 keys per grid step


def _hist_kernel(keys_ref, hist_ref):
    d = (keys_ref[...].astype(jnp.int32) >> 0) & 0xFF  # (ROWS, LANES)
    # 256-way compare-accumulate: bin c count = sum(d == c)
    counts = []
    for c in range(256):
        counts.append(jnp.sum((d == c).astype(jnp.int32)))
    hist_ref[0, :] = jnp.stack(counts)


def digit_histogram(keys: jax.Array, interpret: bool) -> jax.Array:
    n = keys.shape[0]
    tiles = n // TILE
    return pl.pallas_call(
        _hist_kernel,
        grid=(tiles,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((1, 256), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((tiles, 256), jnp.int32),
        interpret=interpret,
    )(keys.reshape(tiles * ROWS, LANES))


def _rank_kernel(keys_ref, rank_ref):
    d = (keys_ref[...].astype(jnp.int32)) & 0xFF  # (ROWS, LANES)
    # one-hot over 256 digit lanes, record axis flattened row-major:
    # rank_i = (# earlier records with the same digit). The exact
    # Mosaic-expressible formulation: cumsum of the one-hot matrix.
    flat_d = d.reshape(TILE, 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (TILE, 256), 1)
    oh = (flat_d == lanes).astype(jnp.int32)  # (TILE, 256)
    cum = jnp.cumsum(oh, axis=0)  # inclusive
    rank = jnp.sum(oh * cum, axis=1) - 1  # gather via one-hot dot
    rank_ref[...] = rank.reshape(ROWS, LANES)


def rank_cumsum(keys: jax.Array, interpret: bool) -> jax.Array:
    n = keys.shape[0]
    tiles = n // TILE
    return pl.pallas_call(
        _rank_kernel,
        grid=(tiles,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((tiles * ROWS, LANES), jnp.int32),
        interpret=interpret,
    )(keys.reshape(tiles * ROWS, LANES))


def _store_kernel(keys_ref, off_ref, out_ref):
    # 256 dynamic-offset (8, 128) stores per tile — the move phase's
    # granularity floor. Offsets are tile-local (out block = 256 * 8 rows
    # per tile) and row-aligned; real radix offsets are neither.
    tile = keys_ref[...]  # (ROWS, LANES)
    for c in range(256):
        rows = tile[(c % 8) * 8 : (c % 8) * 8 + 8, :]
        start = off_ref[0, c]
        out_ref[pl.ds(start, 8), :] = rows


def dynamic_store(keys: jax.Array, offs: jax.Array, interpret: bool):
    n = keys.shape[0]
    tiles = n // TILE
    return pl.pallas_call(
        _store_kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0)),
            pl.BlockSpec((1, 256), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((256 * 8, LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((tiles * 256 * 8, LANES), jnp.int32),
        interpret=interpret,
    )(keys.reshape(tiles * ROWS, LANES), offs)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", type=int, default=1 << 24)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret-mode smoke test (no timing)")
    args = ap.parse_args()
    n = (args.records // TILE) * TILE
    interp = args.interpret
    print(f"backend={jax.default_backend()} n={n} tile={TILE}",
          file=sys.stderr)

    @jax.jit
    def gen(seed):
        i = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0)
        return (i * jnp.uint32(2654435761)) ^ (i >> 3) ^ seed

    def timed(label, fn, bytes_per_rec, reps=4):
        _ = np.asarray(jax.tree.leaves(fn(gen(jnp.uint32(0))))[0]).ravel()[:4]
        best = float("inf")
        for k in range(reps):
            x = gen(jnp.uint32(100 + k))
            jax.block_until_ready(x)
            t0 = time.perf_counter()
            out = fn(x)
            _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:4]  # force
            best = min(best, time.perf_counter() - t0)
        mrec = n / best / 1e6
        print(f"{label:<28} {best*1e3:9.2f} ms {mrec:8.0f} Mrec/s "
              f"{mrec * bytes_per_rec / 1e3:7.1f} GB/s")
        return best

    # correctness of the kernels vs numpy (tiny slice)
    keys = gen(jnp.uint32(0))
    h = np.asarray(digit_histogram(keys, interp))
    kh = np.asarray(keys).reshape(-1, TILE)
    want_h = np.stack(
        [np.bincount(t & 0xFF, minlength=256) for t in kh[:2]]
    )
    assert np.array_equal(h[:2], want_h), "histogram kernel wrong"
    r = np.asarray(rank_cumsum(keys, interp)).reshape(-1)[:TILE]
    d0 = (np.asarray(keys)[:TILE] & 0xFF).astype(np.int64)
    want_r = np.zeros(TILE, np.int64)
    seen: dict = {}
    for i, dv in enumerate(d0.tolist()):
        want_r[i] = seen.get(dv, 0)
        seen[dv] = seen.get(dv, 0) + 1
    assert np.array_equal(r, want_r), "rank kernel wrong"
    print("kernel oracles OK", file=sys.stderr)
    if interp:
        print("interpret-mode smoke complete (no timing)")
        return

    jit_sort1 = jax.jit(lambda x: jax.lax.sort((x,), num_keys=1)[0])

    def sort3(x):
        umi = (x * jnp.uint32(40503)) & jnp.uint32(0xFFFFFF)
        iota = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0)
        return jax.lax.sort((x, umi, iota), num_keys=3)[0]

    jit_sort3 = jax.jit(sort3)

    print(f"{'kernel':<28} {'best':>12} {'rate':>15} {'traffic':>8}")
    t1 = timed("lax.sort 1-op (baseline)", jit_sort1, 4)
    t3 = timed("lax.sort 3-op (production)", jit_sort3, 12)
    th = timed("K1 digit histogram", functools.partial(
        digit_histogram, interpret=False), 4)
    tr = timed("K2 rank via one-hot cumsum", functools.partial(
        rank_cumsum, interpret=False), 4)

    tiles = n // TILE
    offs = jnp.asarray(
        (np.random.default_rng(0).permutation(tiles * 256) % (256 * 8 - 8))
        .reshape(tiles, 256).astype(np.int32)
    )
    ts = timed("K3 256 dyn stores/tile", functools.partial(
        dynamic_store, offs=offs, interpret=False), 4 + 4 * 8 * 128 * 256 // TILE)

    # verdict: 4 radix passes, each at least max(K1-bound, K2, K3-floor)
    pass_floor = max(tr, ts)
    radix_total = 4 * pass_floor
    print(
        f"\nper-pass floor (max of K2/K3): {pass_floor*1e3:.2f} ms; "
        f"4-pass radix >= {radix_total*1e3:.2f} ms vs lax.sort 1-op "
        f"{t1*1e3:.2f} ms -> radix is "
        f"{radix_total/t1:.1f}x the baseline"
    )


if __name__ == "__main__":
    main()
