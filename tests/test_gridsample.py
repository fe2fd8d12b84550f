"""grid_sample_2d vs torch.nn.functional.grid_sample (the reference's
backend, scene/hexplane.py:21-46)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from s3gaussian_tpu.ops.gridsample import grid_sample_2d


def torch_ref(grid, coords):
    g = torch.from_numpy(grid)[None]                    # [1,C,H,W]
    c = torch.from_numpy(coords)[None, None]            # [1,1,N,2]
    out = F.grid_sample(g, c, mode="bilinear", padding_mode="border",
                        align_corners=True)
    return out[0, :, 0, :].T.numpy()                    # [N,C]


def test_matches_torch_interior_and_border():
    rng = np.random.default_rng(0)
    grid = rng.normal(size=(8, 9, 13)).astype(np.float32)
    coords = rng.uniform(-1.4, 1.4, (257, 2)).astype(np.float32)  # incl. oob
    got = np.asarray(grid_sample_2d(jnp.asarray(grid), jnp.asarray(coords)))
    want = torch_ref(grid, coords)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_exact_corners():
    grid = np.arange(12, dtype=np.float32).reshape(1, 3, 4)
    coords = np.array([[-1, -1], [1, -1], [-1, 1], [1, 1]], np.float32)
    got = np.asarray(grid_sample_2d(jnp.asarray(grid), jnp.asarray(coords)))
    np.testing.assert_allclose(got[:, 0], [0, 3, 8, 11], atol=1e-6)


def test_grid_sample_3d_matches_torch():
    """Trilinear DenseGrid sampling parity (reference scene/grid.py:31-42
    wraps F.grid_sample on a 5D input)."""
    from s3gaussian_tpu.ops.gridsample import grid_sample_3d
    rng = np.random.default_rng(2)
    grid = rng.normal(size=(4, 5, 7, 6)).astype(np.float32)   # [C,D,H,W]
    coords = rng.uniform(-1.3, 1.3, (129, 3)).astype(np.float32)
    got = np.asarray(grid_sample_3d(jnp.asarray(grid), jnp.asarray(coords)))
    g = torch.from_numpy(grid)[None]                          # [1,C,D,H,W]
    c = torch.from_numpy(coords)[None, None, None]            # [1,1,1,N,3]
    want = F.grid_sample(g, c, mode="bilinear", padding_mode="border",
                         align_corners=True)[0, :, 0, 0, :].T.numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)
