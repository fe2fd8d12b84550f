"""Bilinear 2D grid sampling (align_corners=True, border padding).

Functional parity with the reference's ``grid_sample_wrapper``
(scene/hexplane.py:21-46), which wraps ``F.grid_sample(mode='bilinear',
padding_mode='border', align_corners=True)``.

TPU note: gathers cost per *index* (~tens of ns each), so the four corner
lookups are packed into a single row gather: the plane is edge-padded and
its 2×2 neighborhoods flattened into [H·W, 4C] rows once per call (cheap,
bandwidth-bound), then each sample is ONE gather + lerp.  This cuts the
hexplane encoder's gather count 4× (24 plane-samples per point per step).
The gradient w.r.t. the grid comes from autodiff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _quad_rows(grid: jnp.ndarray) -> jnp.ndarray:
    """[C,H,W] -> [H*W, 4C] rows of (v00,v01,v10,v11) per cell; border
    clamp == edge padding."""
    c, h, w = grid.shape
    gp = jnp.pad(grid, ((0, 0), (0, 1), (0, 1)), mode="edge")
    v00 = gp[:, :h, :w]
    v01 = gp[:, :h, 1:w + 1]
    v10 = gp[:, 1:h + 1, :w]
    v11 = gp[:, 1:h + 1, 1:w + 1]
    quad = jnp.stack([v00, v01, v10, v11], axis=0)      # [4,C,H,W]
    return quad.transpose(2, 3, 0, 1).reshape(h * w, 4 * c)


def grid_sample_2d(grid: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample a feature plane at normalized coordinates.

    Args:
      grid: [C, H, W] feature plane.
      coords: [N, 2] in [-1, 1]; coords[:, 0] indexes W (x), coords[:, 1]
        indexes H (y) — torch grid_sample convention.

    Returns: [N, C]
    """
    c, h, w = grid.shape
    # align_corners=True mapping, border padding = clamp
    x = (coords[:, 0] + 1.0) * 0.5 * (w - 1)
    y = (coords[:, 1] + 1.0) * 0.5 * (h - 1)
    x = jnp.clip(x, 0.0, w - 1)
    y = jnp.clip(y, 0.0, h - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    rows = _quad_rows(grid)[y0i * w + x0i]              # [N, 4C]
    v00, v01 = rows[:, 0:c], rows[:, c:2 * c]
    v10, v11 = rows[:, 2 * c:3 * c], rows[:, 3 * c:4 * c]
    return ((1 - wy) * ((1 - wx) * v00 + wx * v01)
            + wy * ((1 - wx) * v10 + wx * v11))


def grid_sample_3d(grid: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Trilinear 3D sampling (align_corners=True, border padding) —
    functional parity with ``F.grid_sample`` on a 5D input as the
    reference's DenseGrid uses it (scene/grid.py:31-42).

    Args:
      grid: [C, D, H, W].
      coords: [N, 3] in [-1, 1]; coords[:, 0] indexes W, [:, 1] H, [:, 2] D
        (torch convention).

    Returns: [N, C]
    """
    c, d, h, w = grid.shape

    def axis(v, n):
        u = jnp.clip((v + 1.0) * 0.5 * (n - 1), 0.0, n - 1)
        u0 = jnp.floor(u)
        return u0.astype(jnp.int32), (u - u0)[:, None]

    x0, wx = axis(coords[:, 0], w)
    y0, wy = axis(coords[:, 1], h)
    z0, wz = axis(coords[:, 2], d)
    gp = jnp.pad(grid, ((0, 0), (0, 1), (0, 1), (0, 1)), mode="edge")
    flat = gp.reshape(c, -1).T                      # [(D+1)(H+1)(W+1), C]
    sh, sw = (h + 1) * (w + 1), w + 1

    def corner(dz, dy, dx_):
        idx = (z0 + dz) * sh + (y0 + dy) * sw + (x0 + dx_)
        return flat[idx]

    def lerp(a, b, t):
        return a + (b - a) * t

    c00 = lerp(corner(0, 0, 0), corner(0, 0, 1), wx)
    c01 = lerp(corner(0, 1, 0), corner(0, 1, 1), wx)
    c10 = lerp(corner(1, 0, 0), corner(1, 0, 1), wx)
    c11 = lerp(corner(1, 1, 0), corner(1, 1, 1), wx)
    return lerp(lerp(c00, c01, wy), lerp(c10, c11, wy), wz)


# ---------------------------------------------------------------------------
# scalar-row fast path (hexplane time planes: t is uniform per camera)
# ---------------------------------------------------------------------------

def _pair_rows_1d(sig: jnp.ndarray) -> jnp.ndarray:
    """[C, W] signal -> [W, 2C] rows of (v_x, v_{x+1}); border clamp."""
    c, w = sig.shape
    sp = jnp.pad(sig, ((0, 0), (0, 1)), mode="edge")
    return jnp.concatenate([sp[:, :w].T, sp[:, 1:w + 1].T], axis=1)


@jax.custom_vjp
def _sample_rows_1d(rows2: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation of paired rows: rows2 [W, 2C] (v_x, v_{x+1}),
    x [N] in pixel units already clipped to [0, W-1] -> [N, C].

    The hand-written VJP turns the grid gradient into ONE one-hot matmul
    ([W, N] @ [N, 2C] on the MXU) instead of XLA's sequential scatter-add
    of N row-updates — the time planes' W is at most a few hundred, so the
    matmul is tiny while the scatter costs ~milliseconds per plane."""
    out, _ = _sample_rows_1d_fwd(rows2, x)
    return out


def _sample_rows_1d_fwd(rows2, x):
    c = rows2.shape[1] // 2
    x0 = jnp.floor(x)
    # interpolation weights stay f32 (the lerp promotes bf16 row values to
    # f32 exactly like the generic grid_sample_2d path); only the gathered
    # ROW VALUES ride in the compute dtype — that is where the bytes are
    wx = (x - x0)[:, None]
    r = rows2[x0.astype(jnp.int32)]                     # [N, 2C] one gather
    lo, hi = r[:, :c], r[:, c:]
    out = (1 - wx) * lo + wx * hi
    iota_w = jnp.arange(rows2.shape[0], dtype=jnp.int32)
    return out, (r, x0.astype(jnp.int32), wx, iota_w)


def _sample_rows_1d_bwd(res, g):
    r, x0i, wx, iota_w = res
    rdtype = r.dtype
    c = r.shape[1] // 2
    lo, hi = r[:, :c], r[:, c:]
    d_x = jnp.sum(((hi - lo) * g).astype(jnp.float32), axis=1)
    # weight in f32, then cast the finished products to the grid's compute
    # dtype so the one-hot matmul keeps its bf16 bandwidth win
    d_pairs = jnp.concatenate([(1 - wx) * g, wx * g],
                              axis=1).astype(rdtype)   # [N, 2C]
    onehot = (x0i[None, :] == iota_w[:, None])
    d_rows2 = jax.lax.dot_general(
        onehot.astype(rdtype), d_pairs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(rdtype)
    return d_rows2, d_x.astype(jnp.float32)


_sample_rows_1d.defvjp(_sample_rows_1d_fwd, _sample_rows_1d_bwd)


def sample_time_plane(plane: jnp.ndarray, sx: jnp.ndarray,
                      t_scalar: jnp.ndarray) -> jnp.ndarray:
    """== grid_sample_2d(plane, stack([sx, t], 1)) for a CONSTANT t.

    plane [C, Ht, Ws] (time on the row axis, as the hexplane stores its
    spatiotemporal planes); sx [N] in [-1, 1]; t_scalar a traced scalar in
    [-1, 1].  The constant row coordinate folds the t-lerp into a 2-row
    dynamic slice BEFORE the per-point work, so the gather rows halve
    (2C vs the quad path's 4C) and the grid gradient becomes a one-hot
    matmul over the [W, 2C] pair rows (see _sample_rows_1d)."""
    c, h, w = plane.shape
    if h == 1:
        # degenerate single-row plane: grid_sample_2d would clamp both
        # corners to row 0, so the t-lerp is the identity
        sig = plane[:, 0, :]
    else:
        y = jnp.clip((t_scalar + 1.0) * 0.5 * (h - 1), 0.0, h - 1)
        y0 = jnp.clip(jnp.floor(y), 0.0, h - 2)
        wy = (y - y0).astype(plane.dtype)
        rows_t = jax.lax.dynamic_slice(
            plane, (0, y0.astype(jnp.int32), 0), (c, 2, w))
        sig = (1 - wy) * rows_t[:, 0, :] + wy * rows_t[:, 1, :]   # [C, W]
    x = jnp.clip((sx + 1.0) * 0.5 * (w - 1), 0.0, w - 1)
    return _sample_rows_1d(_pair_rows_1d(sig), x)
