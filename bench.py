#!/usr/bin/env python
"""Headline benchmark: device-resident 2-bit pack+unpack roundtrip throughput.

Measures the fused Pallas record codec (encode_records + decode_records) on
whatever device jax selects (the TPU chip in production; tests/CI can pin
CPU). Prints exactly ONE JSON line to stdout:

    {"metric": "...", "value": N, "unit": "GB/s", "vs_baseline": N}

``vs_baseline`` is the ratio against the 10 GB/s/chip pack+unpack target
from BASELINE.md (the reference itself publishes no measured numbers; its
prose claims 1-2 GB/s write / 2-4 GB/s read on CPU —
``/root/reference/README.md:171-174``).

Bytes accounted per record per roundtrip (bc16/umi12): encode reads
16+12+8=36 B and writes 24 B; decode reads 24 B and writes 36 B → 120 B.
Diagnostics go to stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from ibu_tpu.utils import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

from ibu_tpu.ops import codec as C
from ibu_tpu.ops.codec_pallas import decode_records, encode_records

BASELINE_GBPS = 10.0  # BASELINE.md north-star target: ≥10 GB/s per chip


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _pattern_codes_np(length: int, n: int, stride: int) -> np.ndarray:
    return (np.arange(length)[:, None] * stride + np.arange(n)[None, :]) % 4


def make_inputs_device(n: int, bc_len: int, umi_len: int):
    """Deterministic patterned planes, generated ON DEVICE.

    The chip here may sit behind a slow host↔device tunnel; shipping
    hundreds of MB of host arrays would dominate (and once wedged the
    transfer for minutes). An iota-based pattern keeps the benchmark purely
    device-resident, with a host oracle for spot checks.
    """

    @jax.jit
    def gen():
        def planes(length, stride):
            row = jax.lax.broadcasted_iota(jnp.int32, (length, n), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (length, n), 1)
            code = (row * stride + col) % 4
            return (
                65 + 2 * code + 2 * (code >> 1) + 11 * (code & (code >> 1))
            ).astype(jnp.uint8)

        idx = jnp.stack(
            [
                jax.lax.broadcasted_iota(jnp.uint32, (2, n), 1)[0],
                jnp.zeros((n,), jnp.uint32),
            ]
        )
        return planes(bc_len, 7), planes(umi_len, 3), idx

    bc, umi, idx = gen()
    jax.block_until_ready((bc, umi, idx))
    return bc, umi, idx


def bench_roundtrip(
    n: int, bc_len: int, umi_len: int, tile_n: int, iters: int, use_pallas: bool
) -> dict:
    bc, umi, idx = make_inputs_device(n, bc_len, umi_len)

    if use_pallas:
        def roundtrip(bc, umi, idx):
            soa = encode_records(bc, umi, idx, tile_n=tile_n)
            return decode_records(soa, bc_len, umi_len, tile_n=tile_n)
    else:
        from ibu_tpu.ops.codec import lax_decode_planes, lax_encode_planes

        def roundtrip(bc, umi, idx):
            soa = jnp.concatenate(
                [lax_encode_planes(bc), lax_encode_planes(umi), idx]
            )
            return (
                lax_decode_planes(soa[0:2], bc_len),
                lax_decode_planes(soa[2:4], umi_len),
                soa[4:6],
            )

    step = jax.jit(roundtrip)

    t0 = time.perf_counter()
    out = step(bc, umi, idx)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    log(f"first call (compile+run): {compile_s:.1f}s")

    # correctness spot-check against the host oracle
    m = min(n, 1024)
    bc_back, umi_back, idx_back = out
    want_codes = _pattern_codes_np(bc_len, m, 7).astype(np.uint8)
    want_ascii = C.np_decode_ascii(want_codes)
    assert np.array_equal(np.asarray(bc_back[:, :m]), want_ascii), (
        "roundtrip mismatch on barcode planes"
    )
    assert np.array_equal(
        np.asarray(idx_back[0, :m]), np.arange(m, dtype=np.uint32)
    )

    # Timing methodology: the iteration loop lives INSIDE a single XLA
    # execution (lax.fori_loop with a data-dependency carry), and the
    # per-iteration cost is the SLOPE between two loop counts. Rationale:
    # remote/experimental backends have been observed to memoize or overlap
    # repeated identical host-side executions, making naive same-input
    # loops report physically impossible throughput (>10 TB/s). Inside one
    # execution the device must run every iteration sequentially (the carry
    # perturbs the index stream, so no iteration is dead code), and the
    # two-point slope cancels dispatch/transfer constants.
    #
    # Scope note: this methodology is sound for the Pallas path (the fused
    # kernels are opaque to XLA and every call depends on the carry). The
    # lax fallback path lets XLA hoist the loop-invariant barcode/UMI
    # encodes, so CPU-mode numbers are smoke-test-only, not a measurement.
    def roundtrip_k(k: int):
        @jax.jit
        def run(bc, umi, idx, c0):
            def body(_, carry):
                if use_pallas:
                    # carry enters as an in-kernel SMEM salt: zero extra
                    # HBM traffic, so reported bytes == actual bytes
                    soa = encode_records(bc, umi, idx, tile_n=tile_n,
                                         salt=carry)
                    bc_out, umi_out, idx_out = decode_records(
                        soa, bc_len, umi_len, tile_n=tile_n
                    )
                else:
                    from ibu_tpu.ops.codec import (
                        lax_decode_planes,
                        lax_encode_planes,
                    )

                    soa = jnp.concatenate(
                        [lax_encode_planes(bc), lax_encode_planes(umi),
                         idx ^ carry]
                    )
                    bc_out = lax_decode_planes(soa[0:2], bc_len)
                    umi_out = lax_decode_planes(soa[2:4], umi_len)
                    idx_out = soa[4:6]
                return (
                    carry
                    + idx_out[0, -1]
                    + bc_out[0, 0].astype(jnp.uint32)
                    + umi_out[0, 0].astype(jnp.uint32)
                    + jnp.uint32(1)
                ).astype(jnp.uint32)

            return jax.lax.fori_loop(0, k, body, c0)

        return run

    k_lo = max(2, iters // 4)
    k_hi = max(iters, k_lo + 2)
    run_lo, run_hi = roundtrip_k(k_lo), roundtrip_k(k_hi)

    # every invocation gets a distinct initial carry: repeated identical
    # (executable, args) calls have been observed to be memoized by the
    # remote backend, which would turn best-of-N into best-of-cache
    _seed = [17]

    def _fresh():
        _seed[0] += 1
        return jnp.uint32(_seed[0])

    jax.block_until_ready(
        (run_lo(bc, umi, idx, _fresh()), run_hi(bc, umi, idx, _fresh()))
    )

    def best_of(run, reps=3):
        best = float("inf")
        for _ in range(reps):
            c0 = _fresh()
            t0 = time.perf_counter()
            jax.block_until_ready(run(bc, umi, idx, c0))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = best_of(run_lo), best_of(run_hi)
    dt = (t_hi - t_lo) / (k_hi - k_lo)
    if dt <= 0:  # timing noise exceeded the slope (tiny smoke-test sizes)
        dt = t_hi / k_hi
    log(
        f"loop timing: k={k_lo} -> {t_lo*1e3:.1f} ms, k={k_hi} -> "
        f"{t_hi*1e3:.1f} ms, slope {dt*1e3:.3f} ms/iter"
    )

    bytes_per_record = 2 * (bc_len + umi_len + 8 + 24)
    gbps = n * bytes_per_record / dt / 1e9
    return {
        "seconds_per_iter": dt,
        "records_per_s": n / dt,
        "gbps": gbps,
        "bytes_per_record": bytes_per_record,
    }


def _stream_bench_file(n: int) -> str:
    import os

    from ibu_tpu.constructs.record import make_records
    from ibu_tpu.io.writer import Writer
    from ibu_tpu.constructs.header import Header

    path = f"/tmp/ibu_bench_stream_{n}.ibu"
    if not os.path.exists(path) or os.path.getsize(path) != 32 + 24 * n:
        rng = np.random.default_rng(7)
        recs = make_records(
            rng.integers(0, 1 << 32, n).astype(np.uint64),
            rng.integers(0, 1 << 24, n).astype(np.uint64),
            np.arange(n, dtype=np.uint64),
        )
        with Writer.from_path(path, Header.new(16, 12)) as w:
            w.write_batch(recs)
        log(f"stream bench file created: {path} ({24 * n / 1e6:.0f} MB)")
    return path


def bench_stream_file_stats(n: int) -> dict:
    """End-to-end streamed file→device stats throughput (VERDICT r3 #4).

    Measures the flagship streaming engine — mmap → prefetched placement →
    sharded per-batch stats → merged result — over a REAL on-disk file, so
    transport and dispatch are in the loop (the codec bench above is
    device-resident only; an engine regression would be invisible to it).
    The result is verified against a host checksum oracle every run.
    """
    from ibu_tpu.io.mmap import MmapReader
    from ibu_tpu.ops.stats import checksum_records_np
    from ibu_tpu.parallel.device import make_mesh, stream_file_stats

    path = _stream_bench_file(n)
    reader = MmapReader(path)
    mesh = make_mesh()
    got = stream_file_stats(reader, mesh=mesh)  # warm-up: compile + run
    want = checksum_records_np(np.asarray(reader.records))
    assert got["count"] == n, (got["count"], n)
    assert (got["barcode_sum"], got["umi_sum"], got["index_sum"]) == want, (
        "stream_file_stats diverged from the host oracle"
    )
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        stream_file_stats(reader, mesh=mesh)
        best = min(best, time.perf_counter() - t0)
    return {
        "records": n,
        "seconds": round(best, 4),
        "mrec_s": round(n / best / 1e6, 1),
        "gbps": round(n * 24 / best / 1e9, 3),
    }


def bench_stream_auto(n: int) -> dict:
    """End-to-end whole-file stats through the PRODUCT path
    (``pipelines.file_stats(engine="auto")``, VERDICT r4 #1): probes the
    transport and the native host engine, routes to the fastest engine on
    this box, and reports what users actually get — a starved device link
    must never drag the shipped number 300× below the best engine here.
    Oracle-verified every run.
    """
    from ibu_tpu.io.mmap import MmapReader
    from ibu_tpu.ops.stats import checksum_records_np
    from ibu_tpu.pipelines import file_stats

    path = _stream_bench_file(n)
    got = file_stats(path, engine="auto")  # warm: probes + compile + run
    engine = got.pop("engine")
    want = checksum_records_np(np.asarray(MmapReader(path).records))
    assert got["count"] == n, (got["count"], n)
    assert (got["barcode_sum"], got["umi_sum"], got["index_sum"]) == want, (
        f"file_stats(engine={engine}) diverged from the host oracle"
    )
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        file_stats(path, engine=engine)  # engine pinned: time the run, not the probe
        best = min(best, time.perf_counter() - t0)
    return {
        "records": n,
        "engine": engine,
        "seconds": round(best, 4),
        "mrec_s": round(n / best / 1e6, 1),
        "gbps": round(n * 24 / best / 1e9, 3),
    }


def bench_histogram_device(batch_records: int = 1 << 20,
                           buffers: int = 4) -> dict:
    """Device-resident DeviceHistogram throughput, unsorted vs the
    sorted-input fast path (VERDICT r4 #4) — transport excluded, slope
    methodology of tools/histogram_capacity_lab.py. Tracked per round so
    a histogram-engine regression is visible in BENCH_r*.json.
    """
    from ibu_tpu.parallel.device import DeviceHistogram, make_mesh, shard_batch

    mesh = make_mesh()
    rng = np.random.default_rng(17)
    out = {"batch_records": batch_records}
    for is_sorted in (False, True):
        hosts = []
        for _ in range(buffers):
            raw = np.zeros((batch_records, 6), dtype=np.uint32)
            raw[:, 0] = rng.integers(0, 4096, batch_records)
            raw[:, 4] = rng.integers(0, 1 << 16, batch_records)
            if is_sorted:
                raw = raw[np.argsort(raw[:, 0], kind="stable")]
            hosts.append(raw)
        placed = [shard_batch(h, mesh) for h in hosts]
        jax.block_until_ready([p[0] for p in placed])

        def fresh():
            return DeviceHistogram(
                mesh=mesh, capacity=1 << 16,
                max_uniques_per_shard=1 << 14,
                merge_every=4, assume_sorted=is_sorted,
            )

        h = fresh()  # compile + warm both stages
        h.update_placed(*placed[0], bc16=True)
        h.finalize()

        def run(k):
            hist = fresh()
            t0 = time.perf_counter()
            for i in range(k):
                hist.update_placed(*placed[i % buffers], bc16=True)
            jax.block_until_ready(hist._state["cnt"])
            return time.perf_counter() - t0

        # k multiples of merge_every so both points amortize the same
        # merges per batch and the slope isolates the per-batch cost
        k_lo, k_hi = 4, 12
        t_lo = min(run(k_lo) for _ in range(3))
        t_hi = min(run(k_hi) for _ in range(3))
        per = max((t_hi - t_lo) / (k_hi - k_lo), 1e-9)
        key = "sorted" if is_sorted else "unsorted"
        out[key + "_mrec_s"] = round(batch_records / per / 1e6, 1)
        log(f"histogram[{key}]: {per*1e3:.2f} ms/batch = "
            f"{out[key + '_mrec_s']} Mrec/s device-side")
    return out


def bench_mesh_sort(total_records: int = 1 << 20) -> dict:
    """Steady-state mesh sample-sort throughput over all local devices
    (VERDICT r4 #5): the jitted shard_map program timed on resident data
    — local sorts + splitter all_gather + all_to_all exchange + merge,
    no file I/O or host transfer in the loop. S=1 on a single chip
    (degenerates to the device sort); S=8 on the CPU test mesh exercises
    the exchange.
    """
    from jax.sharding import PartitionSpec as P

    from ibu_tpu.constructs.record import make_records
    from ibu_tpu.parallel.device import AXIS, make_mesh
    from ibu_tpu.parallel.sort import (
        _build_sort_program,
        _cdiv,
        _deal_to_shards,
    )

    mesh = make_mesh()
    s = mesh.devices.size
    rng = np.random.default_rng(29)
    records = make_records(
        rng.integers(0, 1 << 32, total_records).astype(np.uint64),
        rng.integers(0, 1 << 24, total_records).astype(np.uint64),
        np.arange(total_records, dtype=np.uint64),
    )
    dev_raw, dev_valid, local_n = _deal_to_shards(records, mesh)
    c_send = min(max(64, int(_cdiv(local_n, s) * 2.0)), local_n)
    mesh_key = (mesh.axis_names, tuple(d.id for d in mesh.devices.flat))
    program = _build_sort_program(
        mesh, mesh_key, local_n, c_send, 256, (False, False, False)
    )

    @jax.jit
    def perturb(raw, salt):
        # distinct input per call: the tunnel backend memoizes repeated
        # identical executions; touching one idx-lo word changes nothing
        # structural but defeats the cache
        return raw.at[0, 4].set(raw[0, 4] + salt)

    t0 = time.perf_counter()
    jax.block_until_ready(program(dev_raw, dev_valid))
    compile_s = time.perf_counter() - t0
    log(f"mesh sort first call (compile+run): {compile_s:.1f}s")

    def run(k, base):
        raw = dev_raw
        t0 = time.perf_counter()
        for i in range(k):
            raw = perturb(raw, jnp.uint32(base + i))
            out_raw, out_valid, ovf = program(raw, dev_valid)
        jax.block_until_ready(out_raw)
        return time.perf_counter() - t0

    run(2, 1000)  # warm the perturb jit
    k_lo, k_hi = 2, 6
    t_lo = min(run(k_lo, 100 * r) for r in range(3))
    t_hi = min(run(k_hi, 7000 + 100 * r) for r in range(3))
    per = max((t_hi - t_lo) / (k_hi - k_lo), 1e-9)
    return {
        "records": total_records,
        "shards": s,
        "per_sort_ms": round(per * 1e3, 2),
        "mrec_s": round(total_records / per / 1e6, 1),
    }


def bench_molecule_counts(batch_records: int = 1 << 20) -> dict:
    """Device-resident molecule_counts (UMI dedup kernel) slope
    (methodology of tools/molcount_capacity_lab.py) — the dedup/count
    engines' hot kernel, tracked per round.
    """
    from ibu_tpu.constructs.record import make_records
    from ibu_tpu.ops.stats import molecule_counts
    from ibu_tpu.ops.u64 import soa_from_records

    rng = np.random.default_rng(23)
    recs = make_records(
        rng.integers(0, 2048, batch_records).astype(np.uint64),
        rng.integers(0, 1 << 16, batch_records).astype(np.uint64),
        rng.integers(0, 64, batch_records).astype(np.uint64),
    )
    soa = jax.device_put(jnp.asarray(soa_from_records(recs)))
    jax.block_until_ready(soa)

    def looped(k):
        @jax.jit
        def run(s):
            def body(_, carry):
                s, acc = carry
                u_bc, u_umi, counts, n = molecule_counts(
                    s, max_uniques=1 << 13, bc_len=16, umi_len=16
                )
                tag = jnp.ravel(n)[0].astype(jnp.uint32)
                s = s.at[2, :1].add(tag & 1)
                return s, acc + tag

            s2, acc = jax.lax.fori_loop(0, k, body, (s, jnp.uint32(0)))
            return acc, s2[0, 0]

        return run

    k_lo, k_hi = 2, 6
    fns = {k: looped(k) for k in (k_lo, k_hi)}
    for fn in fns.values():
        jax.block_until_ready(fn(soa))
    best = {}
    for k, fn in fns.items():
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(soa))
            ts.append(time.perf_counter() - t0)
        best[k] = min(ts)
    per = max((best[k_hi] - best[k_lo]) / (k_hi - k_lo), 1e-9)
    return {
        "batch_records": batch_records,
        "per_batch_ms": round(per * 1e3, 2),
        "mrec_s": round(batch_records / per / 1e6, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--records", type=int, default=1 << 24)
    ap.add_argument("--bc-len", type=int, default=16)
    ap.add_argument("--umi-len", type=int, default=12)
    ap.add_argument("--tile-n", type=int, default=None)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--stream-records", type=int, default=None,
                    help="records for the end-to-end stream_file_stats leg "
                         "(default: --records; 0 disables)")
    ap.add_argument("--engine-legs", type=int, default=1 << 20,
                    help="batch records for the per-engine device legs "
                         "(histogram / mesh-sort / molecule-count; "
                         "0 disables)")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a jax.profiler trace into DIR")
    ap.add_argument("--no-validate", action="store_true",
                    help="skip the on-device oracle validation matrix")
    args = ap.parse_args()

    backend = jax.default_backend()
    use_pallas = backend == "tpu"
    log(f"backend: {backend} devices: {jax.devices()} pallas: {use_pallas}")

    # On-device validation first (VERDICT r1 #4): every benchmark record is
    # accompanied by a compiled-kernel pass/fail artifact, so a regression
    # in the Mosaic path can't hide behind a healthy-looking GB/s number.
    validate_summary = "skipped"
    if not args.no_validate:
        from ibu_tpu.validate import run_matrix, write_artifact

        results = run_matrix()
        if backend == "tpu":
            record = write_artifact(
                __file__.rsplit("/", 1)[0] + "/TPU_VALIDATE.json", results
            )
            passed = record["passed"]
        else:
            # never clobber the recorded on-TPU evidence from a CPU run
            # (the CPU bench smoke test used to overwrite it)
            passed = sum(ok for _, ok in results)
        validate_summary = f"{passed}/{len(results)}"
        for name, ok in results:
            if not ok:
                log(f"VALIDATE FAIL: {name}")
        log(f"on-device validation: {validate_summary} pass "
            f"(TPU_VALIDATE.json)")

    from ibu_tpu.ops.codec_pallas import DEFAULT_TILE_N

    tile_n = args.tile_n or DEFAULT_TILE_N
    if args.profile:
        with jax.profiler.trace(args.profile):
            r = bench_roundtrip(
                args.records, args.bc_len, args.umi_len, tile_n,
                args.iters, use_pallas,
            )
        log(f"profiler trace written to {args.profile}")
    else:
        r = bench_roundtrip(
            args.records, args.bc_len, args.umi_len, tile_n, args.iters,
            use_pallas,
        )
    log(
        f"pack+unpack roundtrip: {r['seconds_per_iter']*1e3:.2f} ms/iter, "
        f"{r['records_per_s']/1e9:.3f} G records/s, {r['gbps']:.1f} GB/s "
        f"({r['bytes_per_record']} B/record)"
    )

    # end-to-end streaming engine leg (file → mesh → merged stats): tracked
    # per round alongside the codec number so engine/transport regressions
    # are visible in the bench artifact, not just kernel regressions
    stream_n = (
        args.records if args.stream_records is None else args.stream_records
    )
    stream = stream_device = None
    if stream_n:
        stream = bench_stream_auto(stream_n)
        log(
            f"file_stats auto end-to-end: {stream['records']} records via "
            f"the {stream['engine']} engine in {stream['seconds']} s = "
            f"{stream['mrec_s']} Mrec/s ({stream['gbps']} GB/s of wire "
            "data), oracle-verified"
        )
        stream_device = bench_stream_file_stats(stream_n)
        log(
            f"stream_file_stats (device path): {stream_device['records']} "
            f"records in {stream_device['seconds']} s = "
            f"{stream_device['mrec_s']} Mrec/s "
            f"({stream_device['gbps']} GB/s of wire data), oracle-verified"
        )

    payload = {
        "metric": "pack+unpack roundtrip throughput (device-resident, bc16/umi12)",
        "value": round(r["gbps"], 2),
        "unit": "GB/s",
        "vs_baseline": round(r["gbps"] / BASELINE_GBPS, 3),
        "validate": validate_summary,
    }
    if stream is not None:
        payload["stream"] = stream
    if stream_device is not None:
        payload["stream_device"] = stream_device

    # per-engine device legs (VERDICT r4 #4/#5): regressions in the
    # histogram / mesh-sort / molecule-count engines must be visible in
    # BENCH_r*.json, not just codec ones. Each leg is independent; a
    # failure is reported in its slot without killing the headline.
    if args.engine_legs:
        for name, fn in (
            ("histogram", bench_histogram_device),
            ("mesh_sort", bench_mesh_sort),
            ("molecule_counts", bench_molecule_counts),
        ):
            try:
                payload[name] = fn(args.engine_legs)
                log(f"{name} leg: {json.dumps(payload[name])}")
            except Exception as e:  # noqa: BLE001 — leg-isolated
                payload[name] = {"error": f"{type(e).__name__}: {e}"}
                log(f"{name} leg FAILED: {e}")
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
