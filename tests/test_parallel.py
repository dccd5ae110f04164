"""Mesh + multi-host plumbing (single-host semantics; the 8-device CPU mesh
from conftest stands in for ICI, DCN paths are validated as no-ops)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from contouring_uncertainty_tpu.parallel import (
    distributed_initialize,
    make_mesh,
    process_batch_slice,
    shard_batch,
    shard_host_batch,
)
from contouring_uncertainty_tpu.parallel.mesh import DATA_AXIS


def test_distributed_initialize_is_noop_single_host(monkeypatch):
    monkeypatch.delenv("CUTPU_COORDINATOR", raising=False)
    monkeypatch.delenv("SLURM_NTASKS", raising=False)
    assert distributed_initialize() is False  # single host: no sockets opened


def test_process_batch_slice_single_host():
    # single host owns the whole global batch
    assert process_batch_slice(32) == slice(0, 32)
    assert process_batch_slice(7) == slice(0, 7)


def test_shard_host_batch_falls_back_to_device_put():
    mesh = make_mesh(8)
    batch = {
        "img": np.ones((16, 1, 8, 8), np.float32),
        "id": np.array(["a"] * 16),
    }
    out = shard_host_batch(batch, mesh)
    arr = out["img"]
    assert arr.shape == (16, 1, 8, 8)
    # sharded over the data axis
    assert arr.sharding.spec[0] == DATA_AXIS
    np.testing.assert_array_equal(np.asarray(arr), batch["img"])


def test_make_mesh_raises_on_too_few_devices():
    with pytest.raises(ValueError):
        make_mesh(1024)
