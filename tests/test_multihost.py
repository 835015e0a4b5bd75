"""Multi-host (pod) orchestration logic, unit-tested single-process
(SURVEY.md §4 item 3; reference capability: accelerate multi-node DDP,
scripts/README.md:16-26).

The process-sharding and batch-assembly helpers are deterministic pure
functions of (process_index, process_count), so a single process can verify
the exact contract a real `jax.distributed.initialize()` run relies on:
disjoint per-host dataset slices covering every epoch, and global sharded
batches assembled from host-local rows.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ct_clip_tpu.config import MeshConfig
from ct_clip_tpu.parallel import (assemble_global_batch, is_main_process,
                                  local_batch_size, make_mesh,
                                  shard_indices_for_process)


def test_shard_indices_disjoint_cover():
    order = np.random.RandomState(0).permutation(103)
    shards = [shard_indices_for_process(order, i, 4) for i in range(4)]
    flat = np.concatenate(shards)
    assert len(flat) == len(order)
    assert sorted(flat.tolist()) == sorted(order.tolist())
    for i in range(4):
        for j in range(i + 1, 4):
            assert not set(shards[i]) & set(shards[j])


def test_shard_indices_same_order_across_hosts():
    """All hosts must derive their slice from the same shuffle order — the
    strided split preserves order within each shard."""
    order = np.random.RandomState(1).permutation(64)
    s0 = shard_indices_for_process(order, 0, 8)
    np.testing.assert_array_equal(s0, order[0::8])


def test_local_batch_size():
    assert local_batch_size(32, 4) == 8
    assert local_batch_size(8, 1) == 8
    with pytest.raises(AssertionError):
        local_batch_size(10, 4)


def test_defaults_single_process():
    assert is_main_process()
    assert local_batch_size(8) == 8
    np.testing.assert_array_equal(
        shard_indices_for_process(np.arange(5)), np.arange(5))


def test_assemble_global_batch_shards_over_data_axis():
    mesh = make_mesh(MeshConfig(model_parallel_size=2))
    n_data = mesh.devices.shape[0]
    local = {
        "video": np.random.RandomState(0).rand(2 * n_data, 4, 8, 8, 1)
        .astype(np.float32),
        "input_ids": np.arange(2 * n_data * 16, dtype=np.int32)
        .reshape(2 * n_data, 16),
    }
    out = assemble_global_batch(local, mesh)
    for k, v in out.items():
        assert isinstance(v, jax.Array)
        assert v.shape == local[k].shape  # single-process: local == global
        np.testing.assert_array_equal(np.asarray(v), local[k])
        # rows are spread over the data axis of the mesh
        assert len(v.sharding.device_set) >= n_data


def test_assembled_batch_feeds_sharded_step():
    """The assembled arrays must be consumable by a jitted computation with
    data-axis sharding constraints (what the train step does)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(MeshConfig(model_parallel_size=1))
    n = mesh.devices.shape[0]
    local = {"x": np.ones((n * 2, 8), np.float32)}
    batch = assemble_global_batch(local, mesh)

    @jax.jit
    def f(b):
        x = jax.lax.with_sharding_constraint(
            b["x"], NamedSharding(mesh, P("data")))
        return jnp.sum(x)

    assert float(f(batch)) == n * 2 * 8


def test_volume_loader_process_sharding(tmp_path):
    from tests.test_data import _make_dataset
    from ct_clip_tpu.data import CTReportDataset
    from ct_clip_tpu.data.loader import VolumeLoader

    data, reports, meta, _ = _make_dataset(tmp_path, n=4)
    ds = CTReportDataset(data, reports, meta, percent=100)
    seen = []
    for pi in range(2):
        loader = VolumeLoader(ds, num_workers=1, prefetch=2, shuffle=True,
                              seed=7, process_index=pi, process_count=2)
        seen.append([s.meta.accession for s in loader])
    assert len(seen[0]) + len(seen[1]) == len(ds)
    assert not set(seen[0]) & set(seen[1])
