"""Checkpoint round-trips: orbax state, PLY, deformation transplant."""

import numpy as np
import jax
import jax.numpy as jnp

from s3gaussian_tpu.config import ModelHiddenParams
from s3gaussian_tpu.models.deformation import init_deformation
from s3gaussian_tpu.models.pool import create_from_pcd
from s3gaussian_tpu.train.checkpoints import (find_checkpoint,
                                              load_checkpoint, load_ply_pool,
                                              save_checkpoint, save_ply_pool,
                                              transplant_deformation)
from s3gaussian_tpu.train.trainer import init_state
from s3gaussian_tpu.utils.ply import read_ply, write_ply


def small_hp():
    hp = ModelHiddenParams()
    hp.kplanes_config = dict(hp.kplanes_config)
    hp.kplanes_config["resolution"] = [8, 8, 8, 4]
    hp.kplanes_config["output_coordinate_dim"] = 8
    hp.multires = [1]
    hp.net_width = 16
    return hp


def make_state(seed=0):
    rng = np.random.default_rng(seed)
    pool = create_from_pcd(rng.normal(size=(10, 3)).astype(np.float32),
                           rng.random((10, 3)).astype(np.float32), 32)
    deform = init_deformation(jax.random.PRNGKey(seed), small_hp())
    return init_state(pool, deform, jnp.asarray([[5.0] * 3, [-5.0] * 3]))


def test_ply_roundtrip(tmp_path):
    p = str(tmp_path / "a.ply")
    write_ply(p, [("x", np.arange(5.0)), ("y", np.ones(5)),
                  ("opacity", np.linspace(0, 1, 5))])
    d = read_ply(p)
    np.testing.assert_allclose(d["x"], np.arange(5.0))
    np.testing.assert_allclose(d["opacity"], np.linspace(0, 1, 5), atol=1e-7)


def test_pool_ply_roundtrip(tmp_path):
    state = make_state()
    p = str(tmp_path / "point_cloud.ply")
    save_ply_pool(p, state.pool)
    pool2 = load_ply_pool(p, capacity=32)
    alive = np.asarray(state.pool.alive)
    np.testing.assert_allclose(np.asarray(pool2.xyz)[:10],
                               np.asarray(state.pool.xyz)[alive], atol=1e-6)
    np.testing.assert_allclose(np.asarray(pool2.features_rest)[:10],
                               np.asarray(state.pool.features_rest)[alive],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(pool2.rotation)[:10],
                               np.asarray(state.pool.rotation)[alive],
                               atol=1e-6)
    assert int(pool2.n_alive) == 10


def test_orbax_roundtrip_and_transplant(tmp_path):
    state = make_state(0)
    path = save_checkpoint(str(tmp_path), "coarse", 7, state)
    found = find_checkpoint(str(tmp_path))
    assert found is not None and found[1] == "coarse" and found[2] == 7

    other = make_state(1)
    loaded, stage, it = load_checkpoint(path, other)
    assert stage == "coarse" and it == 7
    np.testing.assert_allclose(np.asarray(loaded.pool.xyz),
                               np.asarray(state.pool.xyz))

    # transplant: only deformation moves over
    fresh = make_state(2)
    warm = transplant_deformation(path, fresh)
    w0 = np.asarray(warm.deform["mlp"]["feature_out"][0]["w"])
    np.testing.assert_allclose(
        w0, np.asarray(state.deform["mlp"]["feature_out"][0]["w"]))
    np.testing.assert_allclose(np.asarray(warm.pool.xyz),
                               np.asarray(fresh.pool.xyz))


def test_transplant_across_pool_capacities(tmp_path):
    """--prior_checkpoint must work when the previous clip's pool capacity
    differs from the new clip's (capacity is sized per clip): only the
    deformation subtree is restored."""
    state = make_state(0)           # capacity 32
    path = save_checkpoint(str(tmp_path), "fine", 9, state)

    rng = np.random.default_rng(3)
    pool_big = create_from_pcd(rng.normal(size=(40, 3)).astype(np.float32),
                               rng.random((40, 3)).astype(np.float32), 64)
    deform = init_deformation(jax.random.PRNGKey(3), small_hp())
    fresh = init_state(pool_big, deform, jnp.asarray([[5.0] * 3, [-5.0] * 3]))
    warm = transplant_deformation(path, fresh)
    np.testing.assert_allclose(
        np.asarray(warm.deform["mlp"]["feature_out"][0]["w"]),
        np.asarray(state.deform["mlp"]["feature_out"][0]["w"]))
    assert warm.pool.capacity == 64
    np.testing.assert_allclose(np.asarray(warm.pool.xyz),
                               np.asarray(fresh.pool.xyz))


def test_find_checkpoint_fine_outranks_coarse(tmp_path):
    state = make_state()
    save_checkpoint(str(tmp_path), "coarse", 5000, state, keep_others=True)
    save_checkpoint(str(tmp_path), "fine", 3000, state, keep_others=True)
    found = find_checkpoint(str(tmp_path))
    assert found[1] == "fine" and found[2] == 3000


def test_old_checkpoints_deleted(tmp_path):
    state = make_state()
    save_checkpoint(str(tmp_path), "coarse", 5, state)
    save_checkpoint(str(tmp_path), "coarse", 10, state)
    found = find_checkpoint(str(tmp_path))
    assert found[2] == 10
    import os
    assert not os.path.exists(str(tmp_path / "chkpnt_coarse_5"))


def test_save_ply_split_dynamic_static(tmp_path):
    """|dx|-keyed dynamic/static split export (gaussian_model.py:277-348):
    positions advanced by dx; threshold = mean over alive of max|dx|."""
    import numpy as np
    from s3gaussian_tpu.models.pool import create_from_pcd
    from s3gaussian_tpu.train.checkpoints import save_ply_split
    from s3gaussian_tpu.utils.ply import parse_gaussian_ply, read_ply

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    pool = create_from_pcd(pts, rng.random((20, 3)).astype(np.float32), 32)
    dx = np.zeros((32, 3), np.float32)
    dx[:5] = 2.0  # five clearly-moving gaussians
    dyn_p = str(tmp_path / "dynamic.ply")
    stat_p = str(tmp_path / "static.ply")
    mask = save_ply_split(dyn_p, stat_p, pool, dx)
    assert mask[:5].all() and not mask[5:].any()
    d_xyz = parse_gaussian_ply(read_ply(dyn_p), 3)[0]
    s_xyz = parse_gaussian_ply(read_ply(stat_p), 3)[0]
    assert len(d_xyz) == 5 and len(s_xyz) == 15
    np.testing.assert_allclose(d_xyz, pts[:5] + 2.0, atol=1e-6)
    np.testing.assert_allclose(s_xyz, pts[5:], atol=1e-6)
