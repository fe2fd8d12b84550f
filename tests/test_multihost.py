"""Multi-host seam (parallel/multihost.py) — single-process degenerate
behavior: init is a no-op, the batch slice covers everything, and the
host-local stitch functions produce the same sharded pytrees the
single-host DP path uses (so the same train-step code runs unchanged)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from s3gaussian_tpu.config import OptimizationParams
from s3gaussian_tpu.data.cameras import stack_cameras
from s3gaussian_tpu.parallel.data_parallel import (make_mesh,
                                                   make_parallel_train_step,
                                                   replicate_state,
                                                   shard_camera_batch)
from s3gaussian_tpu.parallel.multihost import (host_local_camera_batch,
                                               host_local_camera_blocks,
                                               init_multihost, is_primary,
                                               local_batch_slice, sync_hosts)

import test_train_e2e as helpers


def test_init_single_process_noop():
    pid, n = init_multihost()
    assert (pid, n) == (0, 1)
    assert is_primary()
    sync_hosts("test")  # no-op, must not raise


def test_local_batch_slice_covers_all():
    # single process: the local slice IS the global batch
    lo, hi = local_batch_slice(4)
    assert (lo, hi) == (0, 4)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_host_local_batch_matches_shard_camera_batch():
    mesh = make_mesh(2)
    _, camera, _, _, _ = helpers.setup(seed=0)
    batch = stack_cameras([camera, camera])
    a = shard_camera_batch(batch, mesh)
    b = host_local_camera_batch(batch, mesh)
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        assert la.sharding == lb.sharding
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_parallel_step_through_multihost_api():
    n_dev = 2
    mesh = make_mesh(n_dev)
    state, camera, hp, pipe, bg = helpers.setup(seed=1)
    opt = OptimizationParams()
    step = make_parallel_train_step(mesh, "coarse", hp, opt, pipe,
                                    helpers.CFG, 1.0)
    state = replicate_state(state, mesh)
    lo, hi = local_batch_slice(n_dev)
    batch = host_local_camera_batch(
        stack_cameras([camera] * (hi - lo)), mesh)
    losses = []
    for _ in range(6):
        state, aux = step(state, batch, jnp.asarray(0, jnp.int32), bg)
        losses.append(float(aux["metrics"]["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_host_local_blocks_layout():
    mesh = make_mesh(2)
    _, camera, _, _, _ = helpers.setup(seed=2)
    blocks = stack_cameras([stack_cameras([camera, camera])
                            for _ in range(3)])
    g = host_local_camera_blocks(blocks, mesh)
    leaf = jax.tree_util.tree_leaves(g)[0]
    assert leaf.shape[:2] == (3, 2)
