"""Build the native host runtime (g++ → shared library).

Compiles :mod:`ibu_tpu.native.ibu_native` on first use and caches the
resulting ``libibu_native.so`` next to the source. Rebuilds when the source
is newer than the library.
"""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "ibu_native.cpp")
LIB = os.path.join(_DIR, "libibu_native.so")


class NativeBuildError(RuntimeError):
    pass


def build(force: bool = False) -> str:
    """Compile (if needed) and return the shared-library path."""
    if (
        not force
        and os.path.exists(LIB)
        and os.path.getmtime(LIB) >= os.path.getmtime(SRC)
    ):
        return LIB
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-funroll-loops",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-pthread",
        SRC,
        "-o",
        LIB,
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        raise NativeBuildError(f"failed to run g++: {e}") from e
    if proc.returncode != 0:
        raise NativeBuildError(
            f"native build failed:\n{proc.stderr[-4000:]}"
        )
    return LIB


if __name__ == "__main__":
    print(build(force=True))
