"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so the multi-chip sharding path
(`shard_map` over a Mesh) is exercised without TPU hardware — the strategy
described in SURVEY.md §4 ("How parallelism is tested without a cluster").
Must run before any jax import, hence the env mutation at module top.
"""

import os

# Force CPU: the surrounding environment may pre-set JAX_PLATFORMS to a TPU
# platform (e.g. "axon"), and compiling every test kernel through the TPU
# tunnel is both slow and contended. Tests always run on the virtual CPU
# mesh; bench.py is the TPU path.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The env var alone is not enough here: the environment's TPU plugin
# ("axon") re-selects itself during backend init, so pin the config too.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: most test wall-time is XLA compilation of the
# many (L, tile) kernel variants; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/ibu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest

from ibu_tpu import Header, Writer


@pytest.fixture
def tmp_ibu_file(tmp_path):
    """Factory fixture: write a records array to a temp IBU file, return path."""

    def _make(records: np.ndarray, header: Header | None = None, name="test.ibu"):
        if header is None:
            header = Header.new(16, 12)
        path = str(tmp_path / name)
        with Writer.from_path(path, header) as w:
            w.write_batch(records)
        return path

    return _make


def make_records_arange(n: int) -> np.ndarray:
    """Deterministic records with closed-form field sums (the reference's
    checksum-test methodology, ``mmap.rs:454-481``)."""
    from ibu_tpu import RECORD_DTYPE

    out = np.empty(n, dtype=RECORD_DTYPE)
    idx = np.arange(n, dtype=np.uint64)
    out["barcode"] = idx
    out["umi"] = idx * np.uint64(2)
    out["index"] = idx * np.uint64(3)
    return out
