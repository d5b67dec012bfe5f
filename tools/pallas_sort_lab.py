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
* K2 ``rank_cumsum`` — per-element within-tile rank via one-hot
  prefix sums. Mosaic has no cumsum primitive, so the prefix runs as
  triangular MATMULS (inclusive (LANES, LANES) per row + strict
  (ROWS, ROWS) across rows) + the one-hot gather dot: the only
  Mosaic-expressible exact rank. Its amplification (256 f32 lanes per
  4-byte key, ~64 KFLOP/key) is the cost of not having per-element
  gather/scatter.
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
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 16, 128
TILE = ROWS * LANES  # 2048 keys per grid step (ROWS kept small: K2
# unrolls one triangular matmul per row and Mosaic compile time scales
# with the unroll)


GROUP = 8  # tiles per grid step — Mosaic needs >=8 sublanes per output block


def _hist_kernel(keys_ref, hist_ref):
    d = (keys_ref[...].astype(jnp.int32) >> 0) & 0xFF  # (GROUP*ROWS, LANES)
    # 256-way compare-accumulate, lane-reduced to a per-row column M[r, c]
    # = #(d[r, :] == c); the per-tile rows are then M folded through an
    # (GROUP, GROUP*ROWS) one-hot tile-selector matmul (exact in f32:
    # counts <= TILE < 2^24).
    cols = []
    for c in range(256):
        cols.append(jnp.sum((d == c).astype(jnp.float32), axis=1))
    # stack along SUBLANES ((256, GROUP*ROWS) — native row inserts; the
    # lane-axis stack materializes every column as a padded (R, 128) tile
    # and blows scoped VMEM), then contract on the MXU with the row axis
    # of the tile selector: hist[s, c] = sum_r sel[s, r] * m_t[c, r].
    m_t = jnp.stack(cols, axis=0)  # (256, GROUP*ROWS)
    rows = jax.lax.broadcasted_iota(jnp.int32, (GROUP, GROUP * ROWS), 1)
    sel = (rows // ROWS == jax.lax.broadcasted_iota(
        jnp.int32, (GROUP, GROUP * ROWS), 0)).astype(jnp.float32)
    hist_ref[...] = jax.lax.dot_general(
        sel, m_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)


def digit_histogram(keys: jax.Array, interpret: bool) -> jax.Array:
    n = keys.shape[0]
    tiles = n // TILE
    assert tiles % GROUP == 0
    return pl.pallas_call(
        _hist_kernel,
        grid=(tiles // GROUP,),
        in_specs=[pl.BlockSpec((GROUP * ROWS, LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((GROUP, 256), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((tiles, 256), jnp.int32),
        # the 256 unrolled lane-reductions keep ~25 MB of intermediates
        # live; that is the cost of the formulation being measured, so
        # raise the scoped-VMEM cap rather than shrink the tile
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(keys.reshape(tiles * ROWS, LANES))


def _rank_kernel(keys_ref, rank_ref):
    # rank_i = (# earlier records in the tile with the same digit),
    # records flattened row-major. Mosaic has no cumsum primitive, so the
    # only exact expressible form is prefix-sums as triangular MATMULS:
    # an inclusive lower-triangular (LANES, LANES) dot per row gives the
    # within-row running count of each digit, and a strictly-lower
    # (ROWS, ROWS) dot over the row totals gives the cross-row prefix.
    # The per-element gather is the one-hot dot as before. This costs
    # ~64 KFLOP per key — the measured price of exact ranks without
    # per-element gather/scatter.
    d = (keys_ref[...].astype(jnp.int32)) & 0xFF  # (ROWS, LANES)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, 256), 1)
    tri = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0) >= \
        jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    l_inc = tri.astype(jnp.float32)  # inclusive within-row prefix
    trs = jax.lax.broadcasted_iota(jnp.int32, (ROWS, ROWS), 0) > \
        jax.lax.broadcasted_iota(jnp.int32, (ROWS, ROWS), 1)
    l_exc = trs.astype(jnp.float32)  # strictly-lower cross-row prefix
    ohs, cums, sums = [], [], []
    for r in range(ROWS):
        oh_r = (d[r][:, None] == c_iota).astype(jnp.float32)  # (128, 256)
        cum_r = jax.lax.dot(l_inc, oh_r,
                            preferred_element_type=jnp.float32)
        ohs.append(oh_r)
        cums.append(cum_r)
        sums.append(cum_r[LANES - 1])
    pre = jax.lax.dot(l_exc, jnp.stack(sums, axis=0),
                      preferred_element_type=jnp.float32)  # (ROWS, 256)
    rows = []
    for r in range(ROWS):
        tot = cums[r] + pre[r][None, :]
        rows.append(jnp.sum(ohs[r] * tot, axis=1) - 1.0)  # (128,)
    rank_ref[...] = jnp.stack(rows, axis=0).astype(jnp.int32)


def rank_cumsum(keys: jax.Array, interpret: bool) -> jax.Array:
    n = keys.shape[0]
    tiles = n // TILE
    return pl.pallas_call(
        _rank_kernel,
        grid=(tiles,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((tiles * ROWS, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(keys.reshape(tiles * ROWS, LANES))


def _store_kernel(keys_ref, off_ref, out_ref):
    # 256 dynamic-offset (8, 128) stores per tile — the move phase's
    # granularity floor. Offsets land inside a TILE-sized out block
    # (overlapping on purpose: the measured quantity is store throughput
    # at radix granularity, and a per-(tile,digit)-slot layout would
    # allocate 256*8 rows per tile — gigabytes of HBM at real n) and are
    # row-aligned; real radix offsets are neither. The 256 offsets for
    # this tile live in the first 2 rows of an (8, 128) pad (Mosaic
    # requires >=8 sublanes per block).
    tile = keys_ref[...]  # (ROWS, LANES)
    off = off_ref[...]   # (8, 128); digit c's offset at [c//128, c%128]
    for c in range(256):
        g = c % (ROWS // 8)
        rows = tile[g * 8 : g * 8 + 8, :]
        start = off[c // LANES, c % LANES]
        out_ref[pl.ds(start, 8), :] = rows


def dynamic_store(keys: jax.Array, offs: jax.Array, interpret: bool):
    """offs: (tiles * 8, 128) i32 — tile i's 256 offsets packed row-major
    into rows [8i, 8i+2), the rest padding; values in [0, ROWS-8]."""
    n = keys.shape[0]
    tiles = n // TILE
    return pl.pallas_call(
        _store_kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0)),
            pl.BlockSpec((8, LANES), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((tiles * ROWS, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
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

    def fetch4(out):
        # force completion with a DEVICE-side slice then a 16-byte pull —
        # np.asarray(out) would drag the whole result (up to GBs for K3)
        # through the host tunnel and time the link, not the kernel
        leaf = jax.tree.leaves(out)[0]
        return np.asarray(leaf.ravel()[:4])

    def timed(label, fn, bytes_per_rec, reps=4):
        _ = fetch4(fn(gen(jnp.uint32(0))))
        best = float("inf")
        for k in range(reps):
            x = gen(jnp.uint32(100 + k))
            jax.block_until_ready(x)
            t0 = time.perf_counter()
            out = fn(x)
            _ = fetch4(out)  # force
            best = min(best, time.perf_counter() - t0)
        mrec = n / best / 1e6
        print(f"{label:<28} {best*1e3:9.2f} ms {mrec:8.0f} Mrec/s "
              f"{mrec * bytes_per_rec / 1e3:7.1f} GB/s")
        return best

    # correctness of the kernels vs numpy (tiny slice)
    keys = gen(jnp.uint32(0))
    h = np.asarray(digit_histogram(keys, interp)[:2])  # device-side slice
    kh = np.asarray(keys).reshape(-1, TILE)
    want_h = np.stack(
        [np.bincount(t & 0xFF, minlength=256) for t in kh[:2]]
    )
    assert np.array_equal(h[:2], want_h), "histogram kernel wrong"
    r = np.asarray(rank_cumsum(keys, interp).reshape(-1)[:TILE])
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
    offs_np = (np.random.default_rng(0).permutation(tiles * 256)
               % (ROWS - 8 + 1)).reshape(tiles, 256).astype(np.int32)
    pad = np.zeros((tiles * 8, LANES), np.int32)
    pad.reshape(tiles, 8 * LANES)[:, :256] = offs_np
    offs = jnp.asarray(pad)
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
