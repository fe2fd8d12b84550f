"""SH evaluation against an independent numpy implementation of the real
spherical harmonics basis (constants from the standard tables)."""

import numpy as np
import jax.numpy as jnp

from s3gaussian_tpu.ops.sh import eval_sh, RGB2SH, SH2RGB


def sh_basis_np(dirs):
    """Rows of the real SH basis (deg ≤ 3) evaluated at unit dirs [N,3],
    in the 3DGS coefficient ordering."""
    x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    one = np.ones_like(x)
    b = [0.28209479177387814 * one,
         -0.4886025119029199 * y,
         0.4886025119029199 * z,
         -0.4886025119029199 * x,
         1.0925484305920792 * x * y,
         -1.0925484305920792 * y * z,
         0.31539156525252005 * (2 * z * z - x * x - y * y),
         -1.0925484305920792 * x * z,
         0.5462742152960396 * (x * x - y * y),
         -0.5900435899266435 * y * (3 * x * x - y * y),
         2.890611442640554 * x * y * z,
         -0.4570457994644658 * y * (4 * z * z - x * x - y * y),
         0.3731763325901154 * z * (2 * z * z - 3 * x * x - 3 * y * y),
         -0.4570457994644658 * x * (4 * z * z - x * x - y * y),
         1.445305721320277 * z * (x * x - y * y),
         -0.5900435899266435 * x * (x * x - 3 * y * y)]
    return np.stack(b, 1)


def test_eval_sh_matches_basis():
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(32, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    sh = rng.normal(size=(32, 3, 16)).astype(np.float32)
    basis = sh_basis_np(dirs)
    for deg in range(4):
        k = (deg + 1) ** 2
        want = np.einsum("nk,nck->nc", basis[:, :k], sh[:, :, :k])
        got = np.asarray(eval_sh(deg, jnp.asarray(sh), jnp.asarray(dirs)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rgb_sh_roundtrip():
    rgb = np.linspace(0, 1, 30).reshape(10, 3)
    np.testing.assert_allclose(np.asarray(SH2RGB(RGB2SH(rgb))), rgb, atol=1e-6)


def test_dc_only():
    # degree 0: color = C0 * sh0; SH2RGB adds 0.5 in the renderer path
    sh = np.zeros((4, 3, 16), np.float32)
    sh[:, :, 0] = 1.0
    out = np.asarray(eval_sh(0, jnp.asarray(sh), jnp.zeros((4, 3))))
    np.testing.assert_allclose(out, 0.28209479177387814, rtol=1e-6)


def test_eval_sh_dynamic_matches_static():
    """Traced-degree band masking == the degree-specialized program."""
    import jax
    import jax.numpy as jnp
    from s3gaussian_tpu.ops.sh import eval_sh, eval_sh_dynamic

    rng = np.random.default_rng(0)
    sh = jnp.asarray(rng.normal(size=(50, 3, 16)), jnp.float32)
    dirs = rng.normal(size=(50, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dirs = jnp.asarray(dirs, jnp.float32)
    f = jax.jit(lambda d: eval_sh_dynamic(d, sh, dirs, max_deg=3))
    for deg in range(4):
        want = eval_sh(deg, sh[..., :(deg + 1) ** 2], dirs)
        np.testing.assert_allclose(np.asarray(f(jnp.int32(deg))),
                                   np.asarray(want), rtol=1e-6, atol=1e-6)


def test_eval_sh_dynamic_grads_masked():
    """Inactive bands receive exactly zero gradient (same as the static
    program that never touches them)."""
    import jax
    import jax.numpy as jnp
    from s3gaussian_tpu.ops.sh import eval_sh_dynamic

    rng = np.random.default_rng(1)
    sh = jnp.asarray(rng.normal(size=(10, 3, 16)), jnp.float32)
    dirs = jnp.asarray([[0.0, 0.0, 1.0]] * 10, jnp.float32)
    g = jax.grad(lambda s: float(0) + jnp.sum(
        eval_sh_dynamic(jnp.int32(1), s, dirs, 3)))(sh)
    g = np.asarray(g)
    assert np.abs(g[..., :4]).sum() > 0      # active bands flow
    np.testing.assert_array_equal(g[..., 4:], 0.0)  # inactive: exact zero
