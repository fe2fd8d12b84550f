"""Per-Gaussian screen-space preprocessing (differentiable, pure jnp).

TPU-native replacement for ``preprocessCUDA`` + helpers in the reference
rasterizer (``cuda_rasterizer/forward.cu:74-256``, ``auxiliary.h:40-164``):
frustum cull, EWA projection of the 3D covariance to a 2D conic, screen
radius and tile rectangle, view depth.

The CUDA reference pairs this with ~500 lines of hand-derived backward
(``backward.cu:144-412``).  Here the whole function is jnp, so ``jax.grad``
produces those gradients — including the FOV-clamp masks (via
``jnp.clip``'s subgradient) and the depth-path mean gradient
(``backward.cu:394-403``) — and XLA fuses it into one elementwise program
over the Gaussian pool.

Conventions (identical to the reference):
  * matrices are row-vector transforms: ``p_view = [p,1] @ view``;
  * ``view`` = world_view_transform (W2C^T), ``proj`` = full_proj_transform;
  * NDC->pixel: ``((ndc+1)*S - 1)/2`` (auxiliary.h:40-43);
  * 2D covariance gets the +0.3 px low-pass (forward.cu:110-111);
  * radius = ceil(3·sqrt(max eigenvalue)) (forward.cu:229-232);
  * near-plane cull at z ≤ 0.2 (auxiliary.h:154).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class ProjectedGaussians(NamedTuple):
    """Static-shaped per-Gaussian screen-space quantities (all [N, ...])."""

    xy: jnp.ndarray          # [N,2] pixel-space center
    depth: jnp.ndarray       # [N]   view-space z
    conic: jnp.ndarray       # [N,3] inverse 2D covariance (a, b, c)
    radius: jnp.ndarray      # [N]   int32 screen radius, 0 = culled
    tiles_rect: jnp.ndarray  # [N,4] int32 (x0, y0, x1, y1) tile rect, half-open
    visible: jnp.ndarray     # [N]   bool


def build_cov3d(scales: jnp.ndarray, rotations: jnp.ndarray,
                scale_modifier: float = 1.0) -> jnp.ndarray:
    """World covariance Σ = R S Sᵀ Rᵀ from activated scales and (possibly
    unnormalized) quaternions.  Parity: ``computeCov3D`` (forward.cu:118-152)
    / ``build_scaling_rotation`` (utils/general_utils.py:268-277).

    Returns the 6 unique entries [N, 6] = (xx, xy, xz, yy, yz, zz) — the
    CUDA packing.  Fully scalarized: per-Gaussian 3x3 matmuls would lower
    to batched tiny matmuls that waste the MXU; the closed form is pure
    VPU elementwise work.
    """
    q = rotations / jnp.linalg.norm(rotations, axis=-1, keepdims=True)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # rotation matrix rows (build_rotation, utils/general_utils.py:245-266)
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - r * z)
    r02 = 2 * (x * z + r * y)
    r10 = 2 * (x * y + r * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - r * x)
    r20 = 2 * (x * z - r * y)
    r21 = 2 * (y * z + r * x)
    r22 = 1 - 2 * (x * x + y * y)
    s = scales * scale_modifier
    s0, s1, s2 = s[..., 0] ** 2, s[..., 1] ** 2, s[..., 2] ** 2
    # Σ = R diag(s²) Rᵀ
    xx = s0 * r00 * r00 + s1 * r01 * r01 + s2 * r02 * r02
    xy = s0 * r00 * r10 + s1 * r01 * r11 + s2 * r02 * r12
    xz = s0 * r00 * r20 + s1 * r01 * r21 + s2 * r02 * r22
    yy = s0 * r10 * r10 + s1 * r11 * r11 + s2 * r12 * r12
    yz = s0 * r10 * r20 + s1 * r11 * r21 + s2 * r12 * r22
    zz = s0 * r20 * r20 + s1 * r21 * r21 + s2 * r22 * r22
    return jnp.stack([xx, xy, xz, yy, yz, zz], -1)


def project_gaussians(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    view: jnp.ndarray,
    proj: jnp.ndarray,
    tanfovx: float,
    tanfovy: float,
    width: int,
    height: int,
    tile_x: int = 16,
    tile_y: int = 16,
    mean2d_tap: Optional[jnp.ndarray] = None,
    alive: Optional[jnp.ndarray] = None,
    radius_margin: float = 0.0,
    opacities: Optional[jnp.ndarray] = None,
) -> ProjectedGaussians:
    """Project Gaussians into screen space.

    Args:
      means3d: [N,3] world positions.
      cov3d:   [N,6] packed symmetric world covariance (xx,xy,xz,yy,yz,zz).
      view, proj: [4,4] row-vector transforms.
      mean2d_tap: optional [N,2] zeros whose gradient equals the NDC-space
        screen gradient the reference accumulates for densification stats
        (train.py:435-437, backward.cu:578-580 ddelx_dx scaling).
      alive: optional [N] bool pool-liveness mask; dead slots are culled.
      radius_margin: extra pixels added to the tile-rect radius (used for
        conservative pre-deformation culling).
      opacities: optional [N,1] or [N] ACTIVATED opacities enabling the
        alpha-threshold tight rect (see below).

    Tight rect: both this compositor and the CUDA kernel skip
    contributions with alpha < 1/255 (``_block_alpha``;
    ``forward.cu:346-354``), so any pixel where opac·exp(-q/2) cannot
    reach 1/255 — q the conic quadratic — contributes EXACTLY zero.  The
    tile rectangle therefore becomes the axis-aligned bbox of the cutoff
    ellipse {q ≤ Q}, Q = 2·ln(255·opac): half-extents √(Q·cov2d_xx) /
    √(Q·cov2d_yy).  For translucent splats this is much tighter than the
    reference's circumscribed 3σ_max circle; for anisotropic ones it is
    tighter per-axis; only for opaque near-isotropic splats is it up to
    ~11% wider (Q ≤ 11.08 > 9) — there the reference's circle CROPS real
    ≥1/255 contributions that this rect renders (closer to the uncropped
    compositing integral).  Pairs dropped here are zero-contribution, so
    the output equals brute-force compositing exactly.  ``radius`` itself stays the reference's
    ceil(3·σ_max) (forward.cu:229-232) — it feeds max_radii2D
    densification stats, not pair emission.

    Returns ProjectedGaussians with static shapes.
    """
    focal_x = width / (2.0 * tanfovx)
    focal_y = height / (2.0 * tanfovy)

    ones = jnp.ones_like(means3d[..., :1])
    p_hom4 = jnp.concatenate([means3d, ones], -1)

    p_view = p_hom4 @ view               # [N,4]
    depth = p_view[..., 2]

    p_hom = p_hom4 @ proj                # [N,4]
    p_w = 1.0 / (p_hom[..., 3] + 1e-7)
    p_ndc = p_hom[..., :3] * p_w[..., None]
    ndc_xy = p_ndc[..., :2]
    if mean2d_tap is not None:
        ndc_xy = ndc_xy + mean2d_tap
    # ndc -> pixel (auxiliary.h:40-43)
    sizes = jnp.asarray([width, height], dtype=means3d.dtype)
    xy = ((ndc_xy + 1.0) * sizes - 1.0) * 0.5

    # --- EWA: cov2d = J W Σ Wᵀ Jᵀ (forward.cu:74-113), scalarized ---
    # W2C rotation: with row-vector convention, view[:3,:3] is R_w2c^T.
    Rw2c = view[:3, :3].T                # [3,3] proper w2c rotation
    # FOV-clamped view point (gradients through clip give the reference's
    # x/y grad masks, backward.cu:175-176).  tz is clamped away from zero:
    # culled rows (z ≤ 0.2, incl. dead pool slots at the origin) would
    # otherwise produce inf Jacobians whose 0-cotangent VJPs turn into NaN.
    tz = jnp.where(depth > 0.2, depth, 1.0)
    tx = jnp.clip(p_view[..., 0] / tz, -1.3 * tanfovx, 1.3 * tanfovx) * tz
    ty = jnp.clip(p_view[..., 1] / tz, -1.3 * tanfovy, 1.3 * tanfovy) * tz

    inv_z = 1.0 / tz
    # rows of T = J @ Rw2c as elementwise combinations (J row i only mixes
    # Rw2c rows i and 2) — per-Gaussian 2x3x3 matmuls would waste the MXU
    j00 = focal_x * inv_z
    j02 = -focal_x * tx * inv_z * inv_z
    j11 = focal_y * inv_z
    j12 = -focal_y * ty * inv_z * inv_z
    t0 = [j00 * Rw2c[0, k] + j02 * Rw2c[2, k] for k in range(3)]
    t1 = [j11 * Rw2c[1, k] + j12 * Rw2c[2, k] for k in range(3)]

    # cov2d = T Σ Tᵀ with Σ the packed symmetric [N,6] (xx,xy,xz,yy,yz,zz)
    cxx, cxy, cxz = cov3d[..., 0], cov3d[..., 1], cov3d[..., 2]
    cyy, cyz, czz = cov3d[..., 3], cov3d[..., 4], cov3d[..., 5]

    def quad(u, v):
        return (u[0] * (cxx * v[0] + cxy * v[1] + cxz * v[2])
                + u[1] * (cxy * v[0] + cyy * v[1] + cyz * v[2])
                + u[2] * (cxz * v[0] + cyz * v[1] + czz * v[2]))

    a = quad(t0, t0) + 0.3
    c = quad(t1, t1) + 0.3
    b = quad(t0, t1)

    det = a * c - b * b
    det_safe = jnp.where(det == 0.0, 1.0, det)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], -1)

    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 1e-12)))

    # --- tile rectangle (auxiliary.h:46-56; tight variant above) ---
    grid_x = (width + tile_x - 1) // tile_x
    grid_y = (height + tile_y - 1) // tile_y
    xy_ng = jax.lax.stop_gradient(xy)
    r_ng = jax.lax.stop_gradient(radius_f)
    if opacities is None:
        rx = ry = r_ng
    else:
        op = jax.lax.stop_gradient(opacities.reshape(-1))
        # NO 3σ cap: between the 9-ellipse and this threshold alpha runs
        # up to 0.011·opac, which the compositor renders — capping at 9
        # would crop real contributions (the reference's circle does crop
        # them; covering them fully only matches the brute-force compose
        # more closely).  Q ≤ 2·ln(255) ≈ 11.08 since opac ≤ 1.
        q_cut = jnp.maximum(2.0 * jnp.log(jnp.maximum(op, 1e-9) * 255.0), 0.0)
        a_ng = jax.lax.stop_gradient(a)
        c_ng = jax.lax.stop_gradient(c)
        rx = jnp.ceil(jnp.sqrt(q_cut * jnp.maximum(a_ng, 0.0)))
        ry = jnp.ceil(jnp.sqrt(q_cut * jnp.maximum(c_ng, 0.0)))
    rx = rx + radius_margin
    ry = ry + radius_margin
    def tile_rect(hx, hy):
        x0 = jnp.clip(jnp.floor((xy_ng[..., 0] - hx) / tile_x), 0, grid_x)
        y0 = jnp.clip(jnp.floor((xy_ng[..., 1] - hy) / tile_y), 0, grid_y)
        x1 = jnp.clip(jnp.floor((xy_ng[..., 0] + hx + tile_x - 1) / tile_x),
                      0, grid_x)
        y1 = jnp.clip(jnp.floor((xy_ng[..., 1] + hy + tile_y - 1) / tile_y),
                      0, grid_y)
        return (x0.astype(jnp.int32), y0.astype(jnp.int32),
                x1.astype(jnp.int32), y1.astype(jnp.int32))

    x0, y0, x1, y1 = tile_rect(rx, ry)
    # visibility keeps the reference's circle-rect predicate (it gates the
    # max_radii2D densification stats, not just pair emission): a gaussian
    # whose tight rect is empty but whose 3σ rect is on-screen stays
    # "visible" with zero pairs, exactly like the CUDA path renders it
    # with all-masked alphas
    if opacities is None:
        vx0, vy0, vx1, vy1 = x0, y0, x1, y1
    else:
        r_c = r_ng + radius_margin
        vx0, vy0, vx1, vy1 = tile_rect(r_c, r_c)
    visible = (depth > 0.2) & (det > 0.0) & ((vx1 - vx0) * (vy1 - vy0) > 0)
    if alive is not None:
        visible = visible & alive

    radius = jnp.where(visible, r_ng, 0.0).astype(jnp.int32)
    tiles_rect = jnp.stack([x0, y0, x1, y1], -1)
    return ProjectedGaussians(xy=xy, depth=depth, conic=conic, radius=radius,
                              tiles_rect=tiles_rect, visible=visible)


def sh_to_color(shs: jnp.ndarray, means3d: jnp.ndarray, campos: jnp.ndarray,
                active_degree) -> jnp.ndarray:
    """SH -> clamped RGB along the view direction.

    Parity: the python convert_SHs path (gaussian_renderer/__init__.py:107-119):
    ``clamp_min(eval_sh(deg, sh, dir) + 0.5, 0)``.  ``shs`` is [N, K, 3]
    (coefficient-major like the reference's ``get_features``).

    ``active_degree`` may be a static Python int (degree-specialized XLA
    program) or a traced scalar (band-masked full-degree evaluation — one
    compile across the oneupSHdegree schedule)."""
    from s3gaussian_tpu.ops.sh import eval_sh, eval_sh_dynamic

    dirs = means3d - campos[None, :]
    # clamped norm: dead pool slots can sit exactly at the camera origin,
    # and 0/0 here would poison gradients of every upstream parameter
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True),
                              1e-8)
    sh_view = jnp.swapaxes(shs, -1, -2)  # [N, 3, K]
    if isinstance(active_degree, int):
        rgb = eval_sh(active_degree, sh_view, dirs)
    else:
        rgb = eval_sh_dynamic(active_degree, sh_view, dirs,
                              max_deg=int(np.sqrt(shs.shape[-2])) - 1)
    return jnp.maximum(rgb + 0.5, 0.0)
