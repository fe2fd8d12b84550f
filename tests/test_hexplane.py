"""Hexplane encoder: shapes, init, product-of-planes semantics, regs."""

import numpy as np
import jax
import jax.numpy as jnp

from s3gaussian_tpu.models import hexplane as hx


def small_params(key=0, out_dim=4, reso=(8, 8, 8, 5), multires=(1, 2)):
    return hx.init_hexplane(jax.random.PRNGKey(key), out_dim, reso, multires)


def test_init_shapes_and_values():
    p = small_params()
    # scale 0: spatial reso 8, time 5
    assert p["scale0_plane0"].shape == (4, 8, 8)      # (x,y)
    assert p["scale0_plane2"].shape == (4, 5, 8)      # (x,t): H=time
    assert p["scale1_plane0"].shape == (4, 16, 16)    # spatial x2
    assert p["scale1_plane2"].shape == (4, 5, 16)     # time reso not scaled
    # time planes are ones, spatial in U(0.1, 0.5)
    assert np.allclose(np.asarray(p["scale0_plane2"]), 1.0)
    s = np.asarray(p["scale0_plane0"])
    assert s.min() >= 0.1 and s.max() <= 0.5


def test_query_is_product_of_plane_samples():
    from s3gaussian_tpu.ops.gridsample import grid_sample_2d
    p = small_params()
    aabb = jnp.asarray([[2.0, 2.0, 2.0], [-2.0, -2.0, -2.0]])  # [max; min]
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-1.5, 1.5, (32, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 1, (32, 1)).astype(np.float32))
    out = np.asarray(hx.query_hexplane(p, pts, t, aabb, 2))
    assert out.shape == (32, 8)
    # manual recomputation for scale 0
    x = np.asarray(hx.normalize_aabb(pts, aabb))
    p4 = np.concatenate([x, np.asarray(t)], -1)
    acc = np.ones((32, 4), np.float32)
    for i, comb in enumerate(hx.COO_COMBS):
        v = np.asarray(grid_sample_2d(p[f"scale0_plane{i}"],
                                      jnp.asarray(p4[:, list(comb)])))
        acc = acc * v
    np.testing.assert_allclose(out[:, :4], acc, rtol=1e-5, atol=1e-6)


def test_regularizers():
    p = small_params()
    # time planes are all ones -> zero smoothness, zero l1
    assert float(hx.time_smoothness(p, 2)) == 0.0
    assert float(hx.l1_time(p, 2)) == 0.0
    assert float(hx.plane_tv(p, 2)) > 0.0
    # perturb a time plane; l1 sees it
    p2 = dict(p)
    p2["scale0_plane2"] = p["scale0_plane2"] + 0.5
    assert float(hx.l1_time(p2, 2)) > 0.0
    reg = hx.compute_regulation(p2, 2, 0.01, 0.0001, 0.0001)
    assert float(reg) > 0.0


def test_grid_gradients_flow():
    p = small_params()
    aabb = jnp.asarray([[1.0] * 3, [-1.0] * 3])

    def loss(params):
        pts = jnp.zeros((8, 3))
        t = jnp.full((8, 1), 0.3)
        return jnp.sum(hx.query_hexplane(params, pts, t, aabb, 2) ** 2)

    g = jax.grad(loss)(p)
    total = sum(float(jnp.abs(v).sum()) for v in g.values())
    assert np.isfinite(total) and total > 0


def test_scalar_time_fast_path_matches_broadcast():
    """A scalar t must take the uniform-time fast path
    (ops/gridsample.py:sample_time_plane) and agree with the generic
    [N,1] bilinear path — values AND gradients (the fast path's grid
    gradient is a one-hot matmul instead of a scatter-add)."""
    p = small_params()
    aabb = jnp.asarray([[2.0, 2.0, 2.0], [-2.0, -2.0, -2.0]])
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.uniform(-1.8, 1.8, (64, 3)).astype(np.float32))
    for tval in (0.0, 0.37, 0.5, 1.0):  # interior, cell-boundary, edges
        t_col = jnp.full((64, 1), tval)
        t_s = jnp.asarray(tval, jnp.float32)
        ref = hx.query_hexplane(p, pts, t_col, aabb, 2)
        fast = hx.query_hexplane(p, pts, t_s, aabb, 2)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

        def loss(params, xyz, t):
            return jnp.sum(jnp.sin(hx.query_hexplane(params, xyz, t, aabb, 2)))

        g_ref = jax.grad(loss, argnums=(0, 1))(p, pts, t_col)
        g_fast = jax.grad(loss, argnums=(0, 1))(p, pts, t_s)
        for k in p:
            np.testing.assert_allclose(np.asarray(g_fast[0][k]),
                                       np.asarray(g_ref[0][k]),
                                       rtol=1e-4, atol=1e-5, err_msg=k)
        np.testing.assert_allclose(np.asarray(g_fast[1]),
                                   np.asarray(g_ref[1]),
                                   rtol=1e-4, atol=1e-5)
