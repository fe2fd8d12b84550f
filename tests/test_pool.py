"""Gaussian pool: init parity, masked densify/clone/split/prune."""

import numpy as np
import jax
import jax.numpy as jnp

from s3gaussian_tpu.models.pool import (GaussianPool, PoolStats,
                                        add_densification_stats,
                                        create_from_pcd, densify_and_prune,
                                        inverse_sigmoid, reset_opacity)
from s3gaussian_tpu.ops.knn import mean_knn_dist2


def small_pool(n=20, cap=64, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return create_from_pcd(pts, cols, cap), pts, cols


def zero_opt(pool):
    return {k: (jnp.zeros_like(v), jnp.zeros_like(v))
            for k, v in pool.param_dict().items()}


def test_create_from_pcd_parity():
    pool, pts, cols = small_pool()
    assert int(pool.n_alive) == 20
    # scale = log sqrt(mean 3nn dist^2), clamped (gaussian_model.py:153-154)
    d2 = np.maximum(mean_knn_dist2(pts), 1e-7)
    np.testing.assert_allclose(np.asarray(pool.scaling)[:20, 0],
                               np.log(np.sqrt(d2)), rtol=1e-5)
    # opacity = inverse_sigmoid(0.1)
    np.testing.assert_allclose(np.asarray(pool.get_opacity())[:20, 0], 0.1,
                               atol=1e-6)
    # DC feature = RGB2SH(color)
    np.testing.assert_allclose(np.asarray(pool.features_dc)[:20, 0],
                               (cols - 0.5) / 0.28209479177387814, rtol=1e-5)
    # identity quaternions
    np.testing.assert_allclose(np.asarray(pool.rotation)[:20, 0], 1.0)


def test_clone_small_high_grad():
    pool, *_ = small_pool()
    cap = pool.capacity
    stats = PoolStats.zeros(cap)
    # give gaussian 3 a high grad; make its scale tiny -> clone
    stats = PoolStats(stats.max_radii2d,
                      stats.xyz_grad_accum.at[3].set(1.0),
                      stats.denom.at[3].set(1.0))
    pool = GaussianPool(**{**{f.name: getattr(pool, f.name)
                              for f in pool.__dataclass_fields__.values()},
                           "scaling": pool.scaling.at[3].set(-10.0)})
    new_pool, opt, stats2, info = densify_and_prune(
        pool, zero_opt(pool), stats, jax.random.PRNGKey(0),
        grad_threshold=0.5, opacity_threshold=0.0, scene_extent=1.0,
        percent_dense=0.01, max_screen_size=None, max_points=1000)
    assert int(info["n_cloned"]) == 1
    assert int(info["n_split"]) == 0
    assert int(new_pool.n_alive) == 21
    # the clone is an identical copy of row 3 in the first free slot (20)
    np.testing.assert_array_equal(np.asarray(new_pool.xyz[20]),
                                  np.asarray(pool.xyz[3]))


def test_split_large_high_grad():
    pool, *_ = small_pool()
    stats = PoolStats.zeros(pool.capacity)
    stats = PoolStats(stats.max_radii2d,
                      stats.xyz_grad_accum.at[5].set(1.0),
                      stats.denom.at[5].set(1.0))
    # scale of row 5 is large vs percent_dense*extent
    pool = GaussianPool(**{**{f.name: getattr(pool, f.name)
                              for f in pool.__dataclass_fields__.values()},
                           "scaling": pool.scaling.at[5].set(2.0)})
    old_xyz5 = np.asarray(pool.xyz[5]).copy()
    new_pool, opt, _, info = densify_and_prune(
        pool, zero_opt(pool), stats, jax.random.PRNGKey(0),
        grad_threshold=0.5, opacity_threshold=0.0, scene_extent=1.0,
        percent_dense=0.01, max_screen_size=None, max_points=1000)
    assert int(info["n_split"]) == 1
    assert int(new_pool.n_alive) == 21  # +2 samples, -1 source
    # scale divided by 1.6 in log space
    np.testing.assert_allclose(np.asarray(new_pool.scaling[5]),
                               2.0 - np.log(1.6), rtol=1e-5)
    # source position was resampled
    assert not np.allclose(np.asarray(new_pool.xyz[5]), old_xyz5)


def test_prune_low_opacity_and_state_zeroed():
    pool, *_ = small_pool()
    pool = GaussianPool(**{**{f.name: getattr(pool, f.name)
                              for f in pool.__dataclass_fields__.values()},
                           "opacity": pool.opacity.at[7].set(
                               inverse_sigmoid(jnp.asarray(0.001)))})
    opt = {k: (jnp.ones_like(v), jnp.ones_like(v))
           for k, v in pool.param_dict().items()}
    stats = PoolStats.zeros(pool.capacity)
    new_pool, new_opt, _, info = densify_and_prune(
        pool, opt, stats, jax.random.PRNGKey(0), grad_threshold=10.0,
        opacity_threshold=0.005, scene_extent=1.0, percent_dense=0.01,
        max_screen_size=None, max_points=1000)
    assert int(info["n_pruned"]) == 1
    assert not bool(new_pool.alive[7])
    # pruned row's optimizer state is zeroed
    assert float(new_opt["xyz"][0][7].sum()) == 0.0
    # live untouched rows keep state
    assert float(new_opt["xyz"][0][3].sum()) == 3.0


def test_capacity_overflow_reported():
    pool, *_ = small_pool(n=20, cap=21)
    stats = PoolStats(jnp.zeros(21), jnp.ones(21), jnp.ones(21))
    new_pool, _, _, info = densify_and_prune(
        pool, zero_opt(pool), stats, jax.random.PRNGKey(0),
        grad_threshold=0.0, opacity_threshold=0.0, scene_extent=1.0,
        percent_dense=100.0, max_screen_size=None, max_points=1000)
    # 20 clones wanted, 1 free slot
    assert int(info["overflow"]) == 19
    assert int(new_pool.n_alive) == 21


def test_reset_opacity():
    pool, *_ = small_pool()
    opt = {k: (jnp.ones_like(v), jnp.ones_like(v))
           for k, v in pool.param_dict().items()}
    new_pool, new_opt = reset_opacity(pool, opt)
    op = np.asarray(new_pool.get_opacity())[:20]
    assert (op <= 0.01 + 1e-6).all()
    assert float(new_opt["opacity"][0].sum()) == 0.0
    assert float(new_opt["xyz"][0].sum()) > 0.0


def test_stats_accumulation():
    stats = PoolStats.zeros(8)
    g = jnp.ones((8, 2)) * 3.0
    radii = jnp.arange(8)
    vis = jnp.asarray([True] * 4 + [False] * 4)
    stats = add_densification_stats(stats, g, radii, vis)
    np.testing.assert_allclose(np.asarray(stats.xyz_grad_accum[:4]),
                               np.sqrt(18.0), rtol=1e-6)
    assert float(stats.xyz_grad_accum[5]) == 0.0
    assert float(stats.denom.sum()) == 4.0
    np.testing.assert_array_equal(np.asarray(stats.max_radii2d[:4]),
                                  [0, 1, 2, 3])


def test_prune_reason_histogram():
    """Reason counters: opacity vs screen-size vs world-size prunes."""
    pool, *_ = small_pool()
    pool = GaussianPool(**{**{f.name: getattr(pool, f.name)
                              for f in pool.__dataclass_fields__.values()},
                           "opacity": pool.opacity.at[7].set(
                               inverse_sigmoid(jnp.asarray(0.001))),
                           "scaling": pool.scaling.at[9].set(5.0)})
    stats = PoolStats(jnp.zeros(pool.capacity).at[2].set(30.0),
                      jnp.zeros(pool.capacity), jnp.zeros(pool.capacity))
    new_pool, _, _, info = densify_and_prune(
        pool, zero_opt(pool), stats, jax.random.PRNGKey(0),
        grad_threshold=10.0, opacity_threshold=0.005, scene_extent=100.0,
        percent_dense=0.01, max_screen_size=20.0, max_points=1000)
    assert int(info["n_prune_opacity"]) == 1   # row 7
    assert int(info["n_prune_screen"]) == 1    # row 2 (radius 30 > 20)
    assert int(info["n_prune_world"]) == 1     # row 9 (e^5 > 0.1*100)
    assert int(info["n_pruned"]) == 3
    assert int(info["n_prune_size_capped"]) == 0
    for r in (2, 7, 9):
        assert not bool(new_pool.alive[r])


def test_size_prune_cap_keeps_worst_offenders():
    """With size_prune_cap, only the largest-radius size-prune candidates
    go; opacity prunes are never capped."""
    pool, *_ = small_pool()
    pool = GaussianPool(**{**{f.name: getattr(pool, f.name)
                              for f in pool.__dataclass_fields__.values()},
                           "opacity": pool.opacity.at[7].set(
                               inverse_sigmoid(jnp.asarray(0.001)))})
    radii = jnp.zeros(pool.capacity)
    for i, r in [(1, 25.0), (2, 30.0), (3, 40.0), (4, 22.0)]:
        radii = radii.at[i].set(r)
    stats = PoolStats(radii, jnp.zeros(pool.capacity),
                      jnp.zeros(pool.capacity))
    # cap = 10% of 20 alive -> 2 size prunes max
    new_pool, _, _, info = densify_and_prune(
        pool, zero_opt(pool), stats, jax.random.PRNGKey(0),
        grad_threshold=10.0, opacity_threshold=0.005, scene_extent=100.0,
        percent_dense=0.01, max_screen_size=20.0, max_points=1000,
        size_prune_cap=0.1)
    # worst two (rows 3: r=40 and 2: r=30) pruned, rows 1/4 spared
    assert not bool(new_pool.alive[3]) and not bool(new_pool.alive[2])
    assert bool(new_pool.alive[1]) and bool(new_pool.alive[4])
    # opacity prune (row 7) unaffected by the cap
    assert not bool(new_pool.alive[7])
    assert int(info["n_prune_size_capped"]) == 2
    assert int(info["n_pruned"]) == 3


def test_world_prune_decoupled_from_screen():
    """world_prune=True with max_screen_size=None (the prune-only
    continuation, opt.prune_after_densify): world-size prunes apply,
    screen-size prunes do NOT — the screen prior removes converged
    geometry only active densification replaces (BASELINE.md round 5)."""
    pool, *_ = small_pool()
    pool = GaussianPool(**{**{f.name: getattr(pool, f.name)
                              for f in pool.__dataclass_fields__.values()},
                           "scaling": pool.scaling.at[9].set(5.0)})
    stats = PoolStats(jnp.zeros(pool.capacity).at[2].set(30.0),
                      jnp.zeros(pool.capacity), jnp.zeros(pool.capacity))
    new_pool, _, _, info = densify_and_prune(
        pool, zero_opt(pool), stats, jax.random.PRNGKey(0),
        grad_threshold=1e30, opacity_threshold=0.005, scene_extent=100.0,
        percent_dense=0.01, max_screen_size=None, max_points=1000,
        world_prune=True)
    assert int(info["n_prune_screen"]) == 0    # row 2 survives
    assert int(info["n_prune_world"]) == 1     # row 9 (e^5 > 0.1*100)
    assert bool(new_pool.alive[2])
    assert not bool(new_pool.alive[9])
    # default coupling unchanged: world follows max_screen_size
    _, _, _, info2 = densify_and_prune(
        pool, zero_opt(pool), stats, jax.random.PRNGKey(0),
        grad_threshold=1e30, opacity_threshold=0.005, scene_extent=100.0,
        percent_dense=0.01, max_screen_size=None, max_points=1000)
    assert int(info2["n_prune_world"]) == 0
