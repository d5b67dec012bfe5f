"""Smoke tests for the driver-config workloads (scaled down, subprocess)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {
    **os.environ,
    "JAX_PLATFORMS": "cpu",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
}


@pytest.mark.parametrize("config", [1, 2, 3, 4, 5])
def test_config_runs(config, tmp_path):
    p = subprocess.run(
        [
            sys.executable,
            f"{REPO}/benchmarks/run_config.py",
            str(config),
            "--workdir",
            str(tmp_path),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=ENV,
        cwd=REPO,
    )
    assert p.returncode == 0, p.stderr + p.stdout
    assert f"config{config}:" in p.stdout
    assert "OK" in p.stdout
