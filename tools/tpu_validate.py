#!/usr/bin/env python
"""On-device validation sweep: run the kernel test matrix on the real chip.

Thin CLI over :mod:`ibu_tpu.validate` (the matrix also runs automatically
inside ``bench.py``, so every benchmark artifact carries a compiled-kernel
pass/fail record).

    python tools/tpu_validate.py

Exits nonzero on any mismatch; prints one PASS/FAIL line per check.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ibu_tpu.utils import apply_platform_env

apply_platform_env()

import jax

from ibu_tpu.validate import run_matrix, write_artifact


def main() -> int:
    print(
        f"backend: {jax.default_backend()} devices: {jax.devices()}",
        flush=True,
    )
    results = run_matrix(progress=lambda line: print(line, flush=True))
    passed = sum(ok for _, ok in results)
    failed = sum(not ok for _, ok in results)
    if jax.default_backend() == "tpu":
        # same artifact bench.py writes; never clobbered by CPU runs
        path = __file__.rsplit("/", 2)[0] + "/TPU_VALIDATE.json"
        write_artifact(path, results)
        print(f"artifact: {path}", flush=True)
    print(f"\n{passed} passed, {failed} failed", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
