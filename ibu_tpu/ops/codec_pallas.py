"""Pallas TPU kernels for the 2-bit nucleotide codec.

The reference's per-record hot loop (``/root/reference/src/io/mmap.rs:315-317``)
becomes HBM-bandwidth-bound VMEM tile kernels here. Layout: **base-planes**
``(L, N)`` with the record axis ``N`` on the 128-lane dimension, so every
lane packs/unpacks one record and the per-base shift amounts are constants
along the sublane axis. Packed words are ``(2, N)`` / ``(6, N)`` uint32
(lo/hi pairs — the TPU is 32-bit native; see :mod:`ibu_tpu.ops.u64`).

Kernels are total (no data-dependent control flow) and the grid is 1-D over
record tiles; Mosaic pipelines the HBM→VMEM streams across grid steps
automatically. The fused record kernels read/write each byte exactly once —
barcode + UMI planes and the index pair in, the full ``(6, N)`` column matrix
out — so the roofline is pure HBM bandwidth.

Numerical contract is identical to :mod:`ibu_tpu.ops.codec`'s ``lax_*``
oracles (tested tile-exactly); the codec trick is documented there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Records per grid step. Swept on TPU v5e (bc16/umi12 fused roundtrip,
#: slope-timed): 16384 → 470-476 GB/s with the nibble decode (405-445
#: with the r1 arithmetic LUT); non-power-of-2 tiles collapse to
#: ~232 GB/s (12288/20480) and ≥32768 overflows VMEM. 16384 = 128x128 —
#: the record axis tiles exactly onto (sublane, lane) squares.
DEFAULT_TILE_N = 16384


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pad_lanes(x: jax.Array, tile: int) -> tuple[jax.Array, int]:
    """Pad the trailing (record) axis up to a multiple of ``tile``."""
    n = x.shape[-1]
    padded = _cdiv(n, tile) * tile
    if padded != n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, padded - n)]
        x = jnp.pad(x, pad)
    return x, n


#: Minimum sublane rows for kernel blocks. Very small base counts produce
#: degenerate (1-2 sublane) tiles that stress the Mosaic compiler; padding
#: encode inputs with 'A' rows is free ('A' encodes to 0, contributing
#: nothing to any packed bit), and decode simply over-produces rows that
#: the wrapper slices off.
_MIN_ROWS = 8


def _pad_rows_a(planes: jax.Array) -> jax.Array:
    """Pad base-plane rows up to ``_MIN_ROWS`` with 'A' (encode-neutral)."""
    L = planes.shape[0]
    if L >= _MIN_ROWS:
        return planes
    return jnp.pad(planes, ((0, _MIN_ROWS - L), (0, 0)), constant_values=65)


def _encode_tile_vpu(codes: jax.Array, lo_rows: int, hi_rows: int) -> jax.Array:
    """VPU shifted-sum encode (the r1/r2 production form; kept as the
    reference formulation and for lab comparisons).

    Disjoint 2-bit fields make sum ≡ bitwise-or, and the shift vector is a
    compile-time iota along the sublane axis. Accumulation runs in **int32**
    (Mosaic has no unsigned reductions); two's-complement wraparound keeps
    the sum bit-exact, and the result is bitcast back to uint32.
    """
    sh_lo = 2 * jax.lax.broadcasted_iota(jnp.int32, (lo_rows, 1), 0)
    lo = jnp.sum(codes[:lo_rows] << sh_lo, axis=0, dtype=jnp.int32)
    if hi_rows > 0:
        sh_hi = 2 * jax.lax.broadcasted_iota(jnp.int32, (hi_rows, 1), 0)
        hi = jnp.sum(codes[lo_rows : lo_rows + hi_rows] << sh_hi, axis=0,
                     dtype=jnp.int32)
    else:
        hi = jnp.zeros_like(lo)
    return jax.lax.bitcast_convert_type(jnp.stack([lo, hi]), jnp.uint32)


def _encode_tile(codes: jax.Array, lo_rows: int, hi_rows: int) -> jax.Array:
    """Pack a ``(L, TN)`` int32 code tile into a ``(2, TN)`` uint32 [lo, hi]
    tile — on the MXU.

    ``word = Σ code_i · 4^i`` is a dot product. Splitting it into 16-bit
    halves (bases 0-7 → bits 0-15, bases 8-15 → bits 16-31) keeps every
    partial sum ≤ 65535: 2-bit codes and power-of-4 weights make each
    product exact in f32, and an 8-term sum of disjoint 2-bit fields stays
    within the 24-bit mantissa, so the f32 matmul is bit-exact. The halves
    recombine in int32 (``h0 | h1 << 16``; the ``<< 16`` wraps two's-
    complement, preserved by the final uint32 bitcast).

    Measured on v5e (tools/sol_lab.py, round 3): the cross-sublane
    shifted-sum reduce this replaces cost 0.63 ms/iter over the pure-copy
    floor; the (2, L) × (L, TN) matmul costs 0.24 ms and runs on the
    otherwise-idle MXU — whole-roundtrip headline +5%. The weight matrix
    is built in-kernel from iotas (pallas kernels cannot capture array
    constants): ``w[g, i] = 4^(i - 8g)`` for ``0 ≤ i - 8g < 8`` else 0.
    """

    def pack(c: jax.Array) -> jax.Array:
        rows = c.shape[0]
        g = jax.lax.broadcasted_iota(jnp.int32, (2, rows), 0)
        i = jax.lax.broadcasted_iota(jnp.int32, (2, rows), 1)
        e = i - 8 * g
        w = jnp.where(
            (e >= 0) & (e < 8), jnp.int32(1) << (2 * jnp.clip(e, 0, 7)), 0
        ).astype(jnp.float32)
        h = jnp.dot(w, c.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
        return h[0:1].astype(jnp.int32) | (h[1:2].astype(jnp.int32) << 16)

    lo = pack(codes[:lo_rows])
    if hi_rows > 0:
        hi = pack(codes[lo_rows : lo_rows + hi_rows])
    else:
        hi = jnp.zeros_like(lo)
    return jax.lax.bitcast_convert_type(
        jnp.concatenate([lo, hi], axis=0), jnp.uint32
    )


def _ascii_to_codes(planes: jax.Array) -> jax.Array:
    c = planes.astype(jnp.int32)
    t = (c >> 1) & 3
    return t ^ (t >> 1)


def _decode_tile(pair: jax.Array, length: int) -> jax.Array:
    """Unpack a ``(2, TN)`` [lo, hi] tile into ``(L, TN)`` ASCII uint8.

    The code→ASCII map is a byte-table variable shift —
    ``(0x54474341 >> (8*code)) & 0xFF`` ('A','C','G','T' as LE bytes) —
    measured on v5e against the arithmetic-LUT form
    (``65 + 2c + 2(c>>1) + 11(c & (c>>1))``): the whole-roundtrip headline
    moved 410 → 473 GB/s and the touch-encode hybrid put decode within
    noise of the pure-copy floor (tools/sol_lab.py, RESULTS r2). Narrow
    int8/int16 LUT lanes were also tried and are unsupported by Mosaic.
    """
    lo_rows = min(length, 16)
    sh_lo = 2 * jax.lax.broadcasted_iota(jnp.uint32, (lo_rows, 1), 0)
    codes = (pair[0:1] >> sh_lo) & 3
    if length > 16:
        sh_hi = 2 * jax.lax.broadcasted_iota(jnp.uint32, (length - 16, 1), 0)
        codes = jnp.concatenate([codes, (pair[1:2] >> sh_hi) & 3], axis=0)
    table = jnp.uint32(0x54474341)  # 'A','C','G','T' little-endian bytes
    return ((table >> (codes << 3)) & 0xFF).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# single-field kernels
# ---------------------------------------------------------------------------


def _encode_kernel(planes_ref, out_ref, *, lo_rows: int, hi_rows: int):
    out_ref[:] = _encode_tile(_ascii_to_codes(planes_ref[:]), lo_rows, hi_rows)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def encode_planes(
    planes: jax.Array,
    tile_n: int = DEFAULT_TILE_N,
    interpret: bool = False,
) -> jax.Array:
    """``(L, N)`` ASCII uint8 → ``(2, N)`` uint32 [lo, hi] packed words."""
    L, _ = planes.shape
    if not 1 <= L <= 32:
        raise ValueError(f"base count {L} outside 1..=32")
    planes = _pad_rows_a(planes)
    Lp = planes.shape[0]
    planes, n = _pad_lanes(planes, tile_n)
    npad = planes.shape[1]
    out = pl.pallas_call(
        functools.partial(
            # padded 'A' rows encode to 0, so widening lo_rows is exact
            _encode_kernel, lo_rows=min(Lp, 16), hi_rows=max(L - 16, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((2, npad), jnp.uint32),
        grid=(npad // tile_n,),
        in_specs=[
            pl.BlockSpec((Lp, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (2, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(planes)
    return out[:, :n]


def _decode_kernel(pair_ref, out_ref, *, length: int):
    out_ref[:] = _decode_tile(pair_ref[:], length)


@functools.partial(jax.jit, static_argnames=("length", "tile_n", "interpret"))
def decode_planes(
    pair: jax.Array,
    length: int,
    tile_n: int = DEFAULT_TILE_N,
    interpret: bool = False,
) -> jax.Array:
    """``(2, N)`` uint32 [lo, hi] → ``(L, N)`` uppercase ASCII uint8."""
    if not 1 <= length <= 32:
        raise ValueError(f"base count {length} outside 1..=32")
    Lp = max(length, _MIN_ROWS)  # over-produce rows, slice off below
    pair, n = _pad_lanes(pair, tile_n)
    npad = pair.shape[1]
    out = pl.pallas_call(
        functools.partial(_decode_kernel, length=Lp),
        out_shape=jax.ShapeDtypeStruct((Lp, npad), jnp.uint8),
        grid=(npad // tile_n,),
        in_specs=[
            pl.BlockSpec((2, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (Lp, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(pair)
    return out[:length, :n]


# ---------------------------------------------------------------------------
# fused record kernels: ascii planes + index ↔ (6, N) column matrix
# ---------------------------------------------------------------------------


def _encode_records_kernel(
    salt_ref, bc_ref, umi_ref, idx_ref, out_ref, *, bc_len: int, umi_len: int
):
    bc = _encode_tile(_ascii_to_codes(bc_ref[:]), min(bc_len, 16),
                      max(bc_len - 16, 0))
    umi = _encode_tile(_ascii_to_codes(umi_ref[:]), min(umi_len, 16),
                       max(umi_len - 16, 0))
    idx = idx_ref[:] ^ salt_ref[0]
    out_ref[:] = jnp.concatenate([bc, umi, idx], axis=0)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def encode_records(
    bc_planes: jax.Array,
    umi_planes: jax.Array,
    idx_pair: jax.Array,
    tile_n: int = DEFAULT_TILE_N,
    interpret: bool = False,
    salt: jax.Array | None = None,
) -> jax.Array:
    """Fused record assembly: one pass from ASCII planes + index pair to the
    ``(6, N) uint32`` device column matrix (rows per
    :mod:`ibu_tpu.ops.u64`). This is the device-side equivalent of the
    reference's write path ``Record::new`` + ``write_batch``
    (``writer.rs:315-351``) with the bitnuc codec fused in.

    ``salt`` (scalar uint32, default 0) is XOR-folded into the index stream
    inside the kernel at zero extra HBM traffic. Benchmarks use it to chain
    iterations without perturbing any input buffer; production callers
    leave it unset.
    """
    bc_len, n = bc_planes.shape
    umi_len = umi_planes.shape[0]
    if not 1 <= bc_len <= 32:
        raise ValueError(f"barcode length {bc_len} outside 1..=32")
    if not 1 <= umi_len <= 32:
        raise ValueError(f"UMI length {umi_len} outside 1..=32")
    bc_planes = _pad_rows_a(bc_planes)
    umi_planes = _pad_rows_a(umi_planes)
    bc_lp, umi_lp = bc_planes.shape[0], umi_planes.shape[0]
    bc_planes, _ = _pad_lanes(bc_planes, tile_n)
    umi_planes, _ = _pad_lanes(umi_planes, tile_n)
    idx_pair, _ = _pad_lanes(idx_pair, tile_n)
    npad = bc_planes.shape[1]
    if salt is None:
        salt_arr = jnp.zeros((1,), jnp.uint32)
    else:
        salt_arr = jnp.asarray(salt, jnp.uint32).reshape((1,))
    out = pl.pallas_call(
        functools.partial(
            # 'A'-padded rows encode to 0; widened lo_rows stay exact
            _encode_records_kernel, bc_len=bc_lp, umi_len=umi_lp
        ),
        out_shape=jax.ShapeDtypeStruct((6, npad), jnp.uint32),
        grid=(npad // tile_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bc_lp, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((umi_lp, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (6, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(salt_arr, bc_planes, umi_planes, idx_pair)
    return out[:, :n]


def _decode_records_kernel(
    salt_ref, soa_ref, bc_out, umi_out, idx_out, *, bc_len: int, umi_len: int
):
    soa = soa_ref[:]
    bc_out[:] = _decode_tile(soa[0:2], bc_len)
    umi_out[:] = _decode_tile(soa[2:4], umi_len)
    idx_out[:] = soa[4:6] ^ salt_ref[0]


@functools.partial(
    jax.jit, static_argnames=("bc_len", "umi_len", "tile_n", "interpret")
)
def decode_records(
    soa: jax.Array,
    bc_len: int,
    umi_len: int,
    tile_n: int = DEFAULT_TILE_N,
    interpret: bool = False,
    salt: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused record disassembly: ``(6, N) uint32`` columns → barcode planes,
    UMI planes, and the index [lo, hi] pair — the read-path inverse of
    :func:`encode_records`.

    ``salt`` (scalar uint32, default 0) XORs the decoded index stream
    inside the kernel at zero extra HBM traffic — the symmetric benchmark
    chaining hook to :func:`encode_records`'s; production callers leave it
    unset.
    """
    if not 1 <= bc_len <= 32:
        raise ValueError(f"barcode length {bc_len} outside 1..=32")
    if not 1 <= umi_len <= 32:
        raise ValueError(f"UMI length {umi_len} outside 1..=32")
    bc_lp = max(bc_len, _MIN_ROWS)  # over-produce rows, slice off below
    umi_lp = max(umi_len, _MIN_ROWS)
    soa, n = _pad_lanes(soa, tile_n)
    npad = soa.shape[1]
    if salt is None:
        salt_arr = jnp.zeros((1,), jnp.uint32)
    else:
        salt_arr = jnp.asarray(salt, jnp.uint32).reshape((1,))
    bc, umi, idx = pl.pallas_call(
        functools.partial(
            _decode_records_kernel, bc_len=bc_lp, umi_len=umi_lp
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bc_lp, npad), jnp.uint8),
            jax.ShapeDtypeStruct((umi_lp, npad), jnp.uint8),
            jax.ShapeDtypeStruct((2, npad), jnp.uint32),
        ),
        grid=(npad // tile_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((6, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((bc_lp, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((umi_lp, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(salt_arr, soa)
    return bc[:bc_len, :n], umi[:umi_len, :n], idx[:, :n]
