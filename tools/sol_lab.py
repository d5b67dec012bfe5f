#!/usr/bin/env python
"""Speed-of-light lab for the fused record codec (VERDICT r1 #1).

Answers one question: is the ~400 GB/s production roundtrip at the memory
wall, or is the bit-twiddling leaving bandwidth on the table?

Variants (all with bench.py's exact traffic accounting, 120 B/record):

  prod        the r1/r2 VPU shifted-sum encode + nibble decode (the
              pre-MXU baseline; since round 3 the PRODUCTION encode is
              the 'mxu' mode — that one matches bench.py)
  sol_touch   IDENTICAL shapes/blocks/grid, but the kernel body only
              touches one element per input block — the grid pipeline
              still DMAs every block HBM→VMEM→HBM, so this measures the
              pure data-movement ceiling for the production layout.
  sol_reduce  same, but each input block is max-reduced (1 op/element) —
              guards against sol_touch being invalidated by block-fetch
              elision, and bounds the cost of "reading the data at all".
  packed      the codec with ASCII packed 4-bases-per-u32: encode reads
              (4,N)+(3,N) uint32 words instead of (16,N)+(12,N) uint8
              planes, decode writes packed words back. Same bytes, all
              32-bit lanes — tests VERDICT's u8-lane-inefficiency theory.
  packed_sol  touch-only kernel on the packed shapes (its own ceiling).

Timing: identical to bench.py — fori_loop with an SMEM salt carry inside
one XLA execution; per-iter cost = slope between two loop counts; immune
to dispatch overhead and backend memoization.

Usage: python tools/sol_lab.py [--records N] [--tile 16384] [--variants a,b]
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

from ibu_tpu.ops import codec as C
from ibu_tpu.ops.codec_pallas import (
    _ascii_to_codes,
    _decode_tile,
    _encode_tile as _encode_tile_prod,  # MXU since round 3
    _encode_tile_vpu,
)

# "real" modes mean the VPU shifted-sum formulation (the r1/r2 production
# encode) so the mxu-vs-vpu A/B stays meaningful after the MXU form was
# promoted to production _encode_tile; "mxu" is the production kernel.
_encode_tile = _encode_tile_vpu

BC, UMI = 16, 12
BCG, UMIG = BC // 4, UMI // 4  # u32 groups for the packed layout
USEFUL_BYTES = 2 * (BC + UMI + 8 + 24)  # == bench.py accounting


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _spec(rows, tile_n):
    return pl.BlockSpec((rows, tile_n), lambda j: (0, j),
                        memory_space=pltpu.VMEM)


_CP = pltpu.CompilerParams(dimension_semantics=("parallel",))


def _call(kern, ins, in_rows, out_shapes, out_rows, tile_n, n):
    smem = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    single = not isinstance(out_shapes, tuple)
    shapes = (out_shapes,) if single else out_shapes
    rows = (out_rows,) if single else out_rows
    out = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        grid=(n // tile_n,),
        in_specs=smem + [_spec(r, tile_n) for r in in_rows],
        out_specs=_spec(rows[0], tile_n) if single
        else tuple(_spec(r, tile_n) for r in rows),
        compiler_params=_CP,
    )(*ins)
    return out


# -- plane-layout variants: encode/decode modes compose ----------------------
#
# Mosaic limits shape the "no compute" controls: 8-bit scalar extracts,
# unsigned reductions, i8 adds, and (1,1)→2D broadcasts are all unsupported,
# so the touch modes use one ROW per block ((1,N) u32 ops broadcast along
# sublanes only) and the reduce modes cast to int32 first.


def _decode_tile_lut(pair, length, lut_dtype):
    """Decode with the code→ASCII LUT arithmetic in a NARROW dtype:
    int8 lanes are 4× (int16 2×) denser than int32 on the VPU, and codes
    (0..3) / ASCII (65..84) fit comfortably."""
    lo_rows = min(length, 16)
    sh_lo = 2 * jax.lax.broadcasted_iota(jnp.uint32, (lo_rows, 1), 0)
    codes = (pair[0:1] >> sh_lo) & 3
    if length > 16:
        sh_hi = 2 * jax.lax.broadcasted_iota(jnp.uint32, (length - 16, 1), 0)
        codes = jnp.concatenate([codes, (pair[1:2] >> sh_hi) & 3], axis=0)
    c = codes.astype(lut_dtype)
    return (65 + 2 * c + 2 * (c >> 1) + 11 * (c & (c >> 1))).astype(jnp.uint8)


def _decode_tile_nibble(pair, length):
    """Decode with the code→ASCII map as a byte-table variable shift:
    ``(0x54474341 >> (8*code)) & 0xFF`` (bytes A,C,G,T little-endian) —
    ~4 vector ops instead of ~8 arithmetic LUT ops, all in u32 lanes."""
    lo_rows = min(length, 16)
    sh_lo = 2 * jax.lax.broadcasted_iota(jnp.uint32, (lo_rows, 1), 0)
    codes = (pair[0:1] >> sh_lo) & 3
    if length > 16:
        sh_hi = 2 * jax.lax.broadcasted_iota(jnp.uint32, (length - 16, 1), 0)
        codes = jnp.concatenate([codes, (pair[1:2] >> sh_hi) & 3], axis=0)
    table = jnp.uint32(0x54474341)  # 'A','C','G','T' as LE bytes
    return ((table >> (codes << 3)) & 0xFF).astype(jnp.uint8)


def _ascii_to_codes_narrow(planes, dtype):
    """ASCII→code transform in a narrow dtype before the i32 widen."""
    c = planes.astype(dtype)
    t = (c >> 1) & 3
    return (t ^ (t >> 1)).astype(jnp.int32)


def _encode_tile_tree(codes, lo_rows, hi_rows):
    """Encode with an explicit halving tree instead of jnp.sum: each step
    combines row-halves with one relative shift+or, log2(L) sublane-block
    ops total — probing whether Mosaic's generic cross-sublane reduce is
    the cost in the production encode."""

    # Pre-shift every row to its final position, then tree-or halves.
    def pack2(c):
        rows = c.shape[0]
        sh = 2 * jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        terms = c << sh
        while terms.shape[0] > 1:
            r = terms.shape[0]
            h = r // 2
            nxt = terms[:h] | terms[h : 2 * h]
            if r % 2:
                nxt = jnp.concatenate([nxt, terms[2 * h :]], axis=0)
            terms = nxt
        return terms[0]

    lo = pack2(codes[:lo_rows])
    if hi_rows > 0:
        hi = pack2(codes[lo_rows : lo_rows + hi_rows])
    else:
        hi = jnp.zeros_like(lo)
    return jax.lax.bitcast_convert_type(jnp.stack([lo, hi]), jnp.uint32)


#: the MXU dot-product encode — since round 3 this IS the production
#: _encode_tile in codec_pallas (see its docstring for the exactness
#: argument); aliased so the mode table below stays explicit while
#: "real" keeps meaning the VPU shifted-sum baseline.
_encode_tile_mxu = _encode_tile_prod


def make_plane(tile_n, enc_mode: str, dec_mode: str):
    """Roundtrip with independently selectable encode/decode compute:
    ``real`` (production codec), ``real8``/``real16`` (narrow-dtype code
    transform), ``touch`` (1 row), ``reduce`` (block max); decode also has
    ``lut8``/``lut16`` (narrow-dtype LUT). Hybrids isolate which kernel
    pays the compute gap vs the SOL floor."""

    def enc_kernel(salt_ref, bc_ref, umi_ref, idx_ref, out_ref):
        idx = idx_ref[:] ^ salt_ref[0]
        if enc_mode in ("real", "real8", "real16", "tree", "mxu"):
            to_codes = {
                "real": _ascii_to_codes,
                "real8": lambda p: _ascii_to_codes_narrow(p, jnp.int8),
                "real16": lambda p: _ascii_to_codes_narrow(p, jnp.int16),
                "tree": _ascii_to_codes,
                "mxu": _ascii_to_codes,
            }[enc_mode]
            tile = {
                "tree": _encode_tile_tree,
                "mxu": _encode_tile_mxu,
            }.get(enc_mode, _encode_tile)
            bc = tile(to_codes(bc_ref[:]), BC, 0)
            umi = tile(to_codes(umi_ref[:]), UMI, 0)
            out_ref[:] = jnp.concatenate([bc, umi, idx], axis=0)
            return
        if enc_mode == "reduce":
            t = (
                jnp.max(bc_ref[:].astype(jnp.int32), axis=0, keepdims=True)
                + jnp.max(umi_ref[:].astype(jnp.int32), axis=0, keepdims=True)
            ).astype(jnp.uint32)
        else:  # touch
            t = bc_ref[0:1, :].astype(jnp.uint32) + umi_ref[0:1, :].astype(
                jnp.uint32
            )
        out_ref[:] = jnp.concatenate([idx, idx, idx ^ t], axis=0)

    def dec_kernel(salt_ref, soa_ref, bc_out, umi_out, idx_out):
        soa = soa_ref[:]
        idx_out[:] = soa[4:6] ^ salt_ref[0]
        if dec_mode in ("real", "lut8", "lut16", "nib"):
            dec = {
                "real": _decode_tile,
                "lut8": lambda p, L: _decode_tile_lut(p, L, jnp.int8),
                "lut16": lambda p, L: _decode_tile_lut(p, L, jnp.int16),
                "nib": _decode_tile_nibble,
            }[dec_mode]
            bc_out[:] = dec(soa[0:2], BC)
            umi_out[:] = dec(soa[2:4], UMI)
            return
        if dec_mode == "reduce":
            row = jnp.max(soa[0:4].astype(jnp.int32), axis=0, keepdims=True)
            b = (row & 0xFF).astype(jnp.uint8)
        else:  # touch
            b = (soa[0:1] & 0xFF).astype(jnp.uint8)
        bc_out[:] = jnp.broadcast_to(b, bc_out.shape)
        umi_out[:] = jnp.broadcast_to(b, umi_out.shape)

    def roundtrip(inputs, salt):
        bc, umi, idx = inputs
        n = bc.shape[1]
        s = salt.reshape((1,))
        soa = _call(enc_kernel, (s, bc, umi, idx), (BC, UMI, 2),
                    jax.ShapeDtypeStruct((6, n), jnp.uint32), 6, tile_n, n)
        bc2, umi2, idx2 = _call(
            dec_kernel, (s, soa), (6,),
            (jax.ShapeDtypeStruct((BC, n), jnp.uint8),
             jax.ShapeDtypeStruct((UMI, n), jnp.uint8),
             jax.ShapeDtypeStruct((2, n), jnp.uint32)),
            (BC, UMI, 2), tile_n, n)
        return bc2, idx2

    return roundtrip


# -- packed 4-bases-per-u32 codec ---------------------------------------------


def _pack_field(words, groups):
    """(G, N) u32 ASCII words (byte j = base 4g+j) → (1, N) u32 packed lo."""
    lo = None
    for g in range(groups):
        w = words[g : g + 1]
        for j in range(4):
            c = w >> (8 * j)
            t = (c >> 1) & 3
            code = t ^ (t >> 1)
            contrib = code << (8 * g + 2 * j)
            lo = contrib if lo is None else lo | contrib
    return lo


def _unpack_field(lo, groups):
    """(1, N) u32 packed lo → (G, N) u32 ASCII words."""
    rows = []
    for g in range(groups):
        w = None
        for j in range(4):
            code = (lo >> (8 * g + 2 * j)) & 3
            a = 65 + 2 * code + 2 * (code >> 1) + 11 * (code & (code >> 1))
            w = a << (8 * j) if w is None else w | (a << (8 * j))
        rows.append(w)
    return jnp.concatenate(rows, axis=0)


def make_packed(tile_n, sol: bool):
    def enc_kernel(salt_ref, bcp_ref, umip_ref, idx_ref, out_ref):
        idx = idx_ref[:] ^ salt_ref[0]
        if sol:
            t = bcp_ref[0:1, :] + umip_ref[0:1, :]
            out_ref[:] = jnp.concatenate([idx, idx, idx ^ t], axis=0)
            return
        z = jnp.zeros_like(idx[0:1])
        bc_lo = _pack_field(bcp_ref[:], BCG)
        umi_lo = _pack_field(umip_ref[:], UMIG)
        out_ref[:] = jnp.concatenate([bc_lo, z, umi_lo, z, idx], axis=0)

    def dec_kernel(salt_ref, soa_ref, bcp_out, umip_out, idx_out):
        soa = soa_ref[:]
        idx_out[:] = soa[4:6] ^ salt_ref[0]
        if sol:
            bcp_out[:] = jnp.broadcast_to(soa[0:1], bcp_out.shape)
            umip_out[:] = jnp.broadcast_to(soa[1:2], umip_out.shape)
            return
        bcp_out[:] = _unpack_field(soa[0:1], BCG)
        umip_out[:] = _unpack_field(soa[2:3], UMIG)

    def roundtrip(inputs, salt):
        bcp, umip, idx = inputs
        n = bcp.shape[1]
        s = salt.reshape((1,))
        soa = _call(enc_kernel, (s, bcp, umip, idx), (BCG, UMIG, 2),
                    jax.ShapeDtypeStruct((6, n), jnp.uint32), 6, tile_n, n)
        bcp2, umip2, idx2 = _call(
            dec_kernel, (s, soa), (6,),
            (jax.ShapeDtypeStruct((BCG, n), jnp.uint32),
             jax.ShapeDtypeStruct((UMIG, n), jnp.uint32),
             jax.ShapeDtypeStruct((2, n), jnp.uint32)),
            (BCG, UMIG, 2), tile_n, n)
        return bcp2, idx2

    return roundtrip


# -- inputs + oracles ---------------------------------------------------------


def make_inputs(n: int):
    """Plane inputs (rows 0..15 bc, 16..27 umi; code=(row*7+col)%4) plus the
    packed-u32 equivalents, generated on device."""

    @jax.jit
    def gen():
        def ascii_plane(rows, base0):
            r = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 0) + base0
            c = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 1)
            code = (r * 7 + c) % 4
            return (65 + 2 * code + 2 * (code >> 1)
                    + 11 * (code & (code >> 1))).astype(jnp.uint8)

        def packed_plane(groups, base0):
            g = jax.lax.broadcasted_iota(jnp.int32, (groups, n), 0)
            c = jax.lax.broadcasted_iota(jnp.int32, (groups, n), 1)
            w = jnp.zeros((groups, n), jnp.int32)
            for j in range(4):
                code = ((4 * g + j + base0) * 7 + c) % 4
                a = 65 + 2 * code + 2 * (code >> 1) + 11 * (code & (code >> 1))
                w = w | (a << (8 * j))
            return jax.lax.bitcast_convert_type(w, jnp.uint32)

        idx = jnp.stack(
            [
                jax.lax.broadcasted_iota(jnp.uint32, (2, n), 1)[0],
                jnp.zeros((n,), jnp.uint32),
            ]
        )
        return (
            ascii_plane(BC, 0),
            ascii_plane(UMI, BC),
            packed_plane(BCG, 0),
            packed_plane(UMIG, BC),
            idx,
        )

    out = gen()
    jax.block_until_ready(out)
    return out


def host_rows(n_cols, rows, base0):
    r = np.arange(rows)[:, None] + base0
    c = np.arange(n_cols)[None, :]
    code = (r * 7 + c) % 4
    return (65 + 2 * code + 2 * (code >> 1)
            + 11 * (code & (code >> 1))).astype(np.uint8)


def check_prod_like(out_probe, idx2, m=2048):
    got = np.asarray(out_probe[:, :m])
    if got.dtype == np.uint8:  # plane decode output
        want = host_rows(m, BC, 0)
        assert np.array_equal(got, want), "plane roundtrip mismatch"
    else:  # packed u32 decode output
        by = host_rows(m, BC, 0)  # (16, m)
        want = (
            by.reshape(BCG, 4, m).astype(np.uint32)
            * (1 << (8 * np.arange(4)))[None, :, None]
        ).sum(axis=1, dtype=np.uint32)
        assert np.array_equal(got, want), "packed roundtrip mismatch"
    assert np.array_equal(
        np.asarray(idx2[0, :m]), np.arange(m, dtype=np.uint32)
    ), "idx mismatch"


def check_packed_soa(tile_n, bcp, umip, idx, m=2048):
    """Packed encode must produce the SAME soa as the production semantics:
    compare against np_pack of the ascii rows."""
    rt_inputs = (bcp, umip, idx)
    enc_roundtrip = make_packed(tile_n, sol=False)
    # run through the full roundtrip; separately rebuild soa via jit for check
    s = jnp.uint32(0)
    bcp2, idx2 = jax.jit(lambda i, ss: enc_roundtrip(i, ss))(rt_inputs, s)
    check_prod_like(bcp2, idx2, m)
    # cross-check 2-bit packing against the host oracle
    rows_bc = host_rows(m, BC, 0)
    want_words = C.np_pack(rows_bc.T)  # (m,) u64
    got_ascii = np.asarray(bcp2[:, :m])
    by = np.zeros((BC, m), np.uint8)
    for g in range(BCG):
        for j in range(4):
            by[4 * g + j] = (got_ascii[g] >> (8 * j)) & 0xFF
    assert np.array_equal(C.np_pack(by.T), want_words), "2-bit semantic drift"


# -- harness (slope methodology, same as bench.py) ---------------------------


def slope_time(roundtrip, inputs, k_lo=5, k_hi=20, reps=3):
    def runner(k):
        @jax.jit
        def run(inputs, c0):
            def body(_, carry):
                probe, idx2 = roundtrip(inputs, carry)
                return (
                    carry
                    + idx2[0, -1]
                    + probe[0, 0].astype(jnp.uint32)
                    + jnp.uint32(1)
                ).astype(jnp.uint32)

            return jax.lax.fori_loop(0, k, body, c0)

        return run

    run_lo, run_hi = runner(k_lo), runner(k_hi)
    seed = [int(time.time()) % 100000]

    def fresh():
        seed[0] += 1
        return jnp.uint32(seed[0])

    jax.block_until_ready((run_lo(inputs, fresh()), run_hi(inputs, fresh())))

    def best_of(run):
        best = float("inf")
        for _ in range(reps):
            c0 = fresh()
            t0 = time.perf_counter()
            jax.block_until_ready(run(inputs, c0))
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
    ap.add_argument("--tile", type=int, default=16384)
    ap.add_argument("--variants", default=None)
    args = ap.parse_args()
    n = args.records
    tile_n = args.tile

    log(f"backend: {jax.default_backend()} n={n} tile={tile_n}")
    bc, umi, bcp, umip, idx = make_inputs(n)

    plane_inputs = (bc, umi, idx)
    packed_inputs = (bcp, umip, idx)

    variants = {
        "prod": (make_plane(tile_n, "real", "real"), plane_inputs, True),
        "sol_touch": (make_plane(tile_n, "touch", "touch"), plane_inputs,
                      False),
        "sol_reduce": (make_plane(tile_n, "reduce", "reduce"), plane_inputs,
                       False),
        "enc_only": (make_plane(tile_n, "real", "touch"), plane_inputs,
                     False),
        "dec_only": (make_plane(tile_n, "touch", "real"), plane_inputs,
                     False),
        "nib": (make_plane(tile_n, "real", "nib"), plane_inputs, True),
        "tree": (make_plane(tile_n, "tree", "nib"), plane_inputs, True),
        "tree_only": (make_plane(tile_n, "tree", "touch"), plane_inputs,
                      False),
        "nib_only": (make_plane(tile_n, "touch", "nib"), plane_inputs,
                     False),
        "lut8": (make_plane(tile_n, "real", "lut8"), plane_inputs, True),
        "lut16": (make_plane(tile_n, "real", "lut16"), plane_inputs, True),
        "e8": (make_plane(tile_n, "real8", "real"), plane_inputs, True),
        "e16": (make_plane(tile_n, "real16", "real"), plane_inputs, True),
        "e16lut16": (make_plane(tile_n, "real16", "lut16"), plane_inputs,
                     True),
        "e8lut8": (make_plane(tile_n, "real8", "lut8"), plane_inputs, True),
        "mxu": (make_plane(tile_n, "mxu", "real"), plane_inputs, True),
        "mxu_only": (make_plane(tile_n, "mxu", "touch"), plane_inputs,
                     False),
        "packed": (make_packed(tile_n, sol=False), packed_inputs, True),
        "packed_sol": (make_packed(tile_n, sol=True), packed_inputs, False),
    }
    want = args.variants.split(",") if args.variants else list(variants)

    # correctness first (only meaningful for the real-codec variants)
    broken = set()
    for name in want:
        rt, inputs, checkable = variants[name]
        if not checkable:
            continue
        try:
            if name == "packed":
                check_packed_soa(tile_n, bcp, umip, idx)
            else:
                probe, idx2 = jax.jit(lambda i, s: rt(i, s))(
                    inputs, jnp.uint32(0)
                )
                check_prod_like(probe, idx2)
            log(f"{name} codec: oracle-exact")
        except Exception as ex:
            broken.add(name)
            msg = str(ex).split("\n")[0][:120]
            log(f"{name} codec: FAILED ({type(ex).__name__}: {msg})")
    want = [w for w in want if w not in broken]

    print(f"{'variant':<12} {'ms/iter':>9} {'GB/s':>8}")
    for name in want:
        rt, inputs, _ = variants[name]
        try:
            dt, t_lo, t_hi = slope_time(rt, inputs)
            gbps = n * USEFUL_BYTES / dt / 1e9
            print(f"{name:<12} {dt*1e3:>9.3f} {gbps:>8.1f}   "
                  f"[k5={t_lo*1e3:.1f}ms k20={t_hi*1e3:.1f}ms]", flush=True)
        except Exception as ex:
            print(f"{name:<12} FAILED: {type(ex).__name__}: {ex}", flush=True)


if __name__ == "__main__":
    main()
