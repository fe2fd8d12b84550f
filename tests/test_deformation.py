"""Deformation network: defaults, head gating, shapes."""

import numpy as np
import jax
import jax.numpy as jnp

from s3gaussian_tpu.config import ModelHiddenParams
from s3gaussian_tpu.models.deformation import apply_deformation, init_deformation


def small_hp(**kw):
    hp = ModelHiddenParams()
    hp.kplanes_config = dict(hp.kplanes_config)
    hp.kplanes_config["resolution"] = [8, 8, 8, 5]
    hp.kplanes_config["output_coordinate_dim"] = 8
    hp.multires = [1, 2]
    hp.net_width = 16
    for k, v in kw.items():
        setattr(hp, k, v)
    return hp


def run(hp, n=12, seed=0):
    params = init_deformation(jax.random.PRNGKey(seed), hp)
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    scales = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    rots = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    op = jnp.asarray(rng.normal(size=(n, 1)).astype(np.float32))
    shs = jnp.asarray(rng.normal(size=(n, 16, 3)).astype(np.float32))
    t = jnp.full((n, 1), 0.4)
    aabb = jnp.asarray([[3.0] * 3, [-3.0] * 3])
    return params, apply_deformation(params, hp, aabb, xyz, scales, rots,
                                     op, shs, t), (xyz, scales, rots, op, shs)


def test_default_gating():
    """Defaults deform xyz and shs only (arguments/__init__.py:223-228)."""
    hp = small_hp()
    params, out, (xyz, scales, rots, op, shs) = run(hp)
    assert out.dx is not None and out.dshs is not None and out.feat is not None
    np.testing.assert_array_equal(np.asarray(out.scales), np.asarray(scales))
    np.testing.assert_array_equal(np.asarray(out.rotations), np.asarray(rots))
    np.testing.assert_array_equal(np.asarray(out.opacity), np.asarray(op))
    np.testing.assert_allclose(np.asarray(out.xyz),
                               np.asarray(xyz) + np.asarray(out.dx), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.shs),
                               np.asarray(shs) + np.asarray(out.dshs), atol=1e-6)
    assert out.feat.shape == (12, 3)
    # param groups exist as expected
    assert "pos" in params["mlp"] and "shs" in params["mlp"]
    assert "scales" not in params["mlp"]


def test_static_config_disables_dx():
    hp = small_hp(no_dx=True, no_dshs=True, feat_head=False)
    params, out, (xyz, *_ ) = run(hp)
    assert out.dx is None and out.dshs is None and out.feat is None
    np.testing.assert_array_equal(np.asarray(out.xyz), np.asarray(xyz))


def test_all_heads_enabled():
    hp = small_hp(no_ds=False, no_dr=False, no_do=False)
    params, out, (xyz, scales, rots, op, shs) = run(hp)
    assert not np.allclose(np.asarray(out.scales), np.asarray(scales))
    assert not np.allclose(np.asarray(out.rotations), np.asarray(rots))
    assert not np.allclose(np.asarray(out.opacity), np.asarray(op))


def test_gradients_reach_grid_and_mlp():
    hp = small_hp()
    params = init_deformation(jax.random.PRNGKey(0), hp)
    aabb = jnp.asarray([[3.0] * 3, [-3.0] * 3])

    def loss(p):
        out = apply_deformation(p, hp, aabb, jnp.zeros((4, 3)),
                                jnp.zeros((4, 3)), jnp.zeros((4, 4)),
                                jnp.zeros((4, 1)), jnp.zeros((4, 16, 3)),
                                jnp.full((4, 1), 0.2))
        return jnp.sum(out.xyz ** 2) + jnp.sum(out.shs ** 2)

    g = jax.grad(loss)(params)
    gsum = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), g, 0.0)
    assert np.isfinite(gsum) and gsum > 0


def test_empty_voxel_ones_grid_is_identity_mask():
    """DenseGrid inits to ones (reference grid.py:29), so a fresh
    empty_voxel run must match the default (mask==1) path exactly."""
    hp0 = small_hp()
    hp1 = small_hp(empty_voxel=True)
    _, out0, _ = run(hp0)
    _, out1, _ = run(hp1)
    np.testing.assert_allclose(np.asarray(out1.xyz), np.asarray(out0.xyz),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out1.shs), np.asarray(out0.shs),
                               atol=1e-6)


def test_static_mlp_mask_gates_attributes():
    """static_mlp replaces the identity mask with a learned gate
    (deformation.py:112-117): attr*mask + d_attr."""
    hp = small_hp(static_mlp=True)
    params, out, (xyz, *_rest) = run(hp)
    assert "static_mlp" in params["mlp"]
    # mask != 1 generically, so out.xyz - dx != xyz
    assert not np.allclose(np.asarray(out.xyz - out.dx), np.asarray(xyz))
    # gradient flows into the mask head
    import jax
    aabb = jnp.asarray([[3.0] * 3, [-3.0] * 3])

    def loss(p):
        o = apply_deformation(p, hp, aabb, xyz, _rest[0], _rest[1],
                              _rest[2], _rest[3], jnp.full((12, 1), 0.4))
        return jnp.sum(o.xyz ** 2)

    g = jax.grad(loss)(params)
    gs = sum(float(jnp.abs(v).sum())
             for v in jax.tree_util.tree_leaves(g["mlp"]["static_mlp"]))
    assert gs > 0
