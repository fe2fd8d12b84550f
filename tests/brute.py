"""Brute-force numpy renderer used as the test oracle.

Implements the reference CUDA math (forward.cu:74-379) directly: per-Gaussian
EWA projection, depth ordering with the same 20-bit depth-key quantization
and stable tie-break the TPU binner uses, per-pixel front-to-back blending
with the tile-rect membership test, the stateless T>=1e-4 contribution mask
(see ops/composite.py docstring for the semantics note), and background
compositing. Slow, dependency-free, and independent of the jnp code paths.
"""

from __future__ import annotations

import numpy as np

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def project_brute(means, cov3d, view, proj, tanfovx, tanfovy, w, h,
                  tile_x=16, tile_y=16, opacity=None):
    """opacity=None → the reference's circumscribed-circle tile rect
    (auxiliary.h:46-56); opacity given → the alpha-threshold tight rect
    (bbox of {q ≤ 2·ln(255·op)}), recomputed here independently of
    ops/project.py."""
    n = means.shape[0]
    focal_x = w / (2 * tanfovx)
    focal_y = h / (2 * tanfovy)
    ph = np.concatenate([means, np.ones((n, 1))], 1)
    p_view = ph @ view
    depth = p_view[:, 2]
    p_hom = ph @ proj
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    ndc = p_hom[:, :3] * p_w[:, None]
    xy = ((ndc[:, :2] + 1) * np.array([w, h]) - 1) * 0.5

    Rw2c = view[:3, :3].T
    out = []
    for i in range(n):
        tz = depth[i]
        tx = np.clip(p_view[i, 0] / tz, -1.3 * tanfovx, 1.3 * tanfovx) * tz
        ty = np.clip(p_view[i, 1] / tz, -1.3 * tanfovy, 1.3 * tanfovy) * tz
        J = np.array([[focal_x / tz, 0, -focal_x * tx / tz ** 2],
                      [0, focal_y / tz, -focal_y * ty / tz ** 2]])
        T = J @ Rw2c
        c2 = T @ cov3d[i] @ T.T
        a, b, c = c2[0, 0] + 0.3, c2[0, 1], c2[1, 1] + 0.3
        det = a * c - b * b
        if det == 0:
            out.append((0.0, np.zeros(3), 0.0))
            continue
        conic = np.array([c / det, -b / det, a / det])
        mid = 0.5 * (a + c)
        lam = mid + np.sqrt(max(0.1, mid * mid - det))
        radius = np.ceil(3 * np.sqrt(lam))
        out.append((radius, conic, det))
    radius = np.array([o[0] for o in out])
    conic = np.stack([o[1] for o in out])
    det = np.array([o[2] for o in out])

    gx = (w + tile_x - 1) // tile_x
    gy = (h + tile_y - 1) // tile_y
    if opacity is None:
        rx = ry = radius
    else:
        op = np.asarray(opacity).reshape(-1)
        q_cut = np.maximum(2.0 * np.log(np.maximum(op, 1e-9) * 255.0), 0.0)
        # bbox half-extents of {q<=Q}: sqrt(Q*cov2d_xx), sqrt(Q*cov2d_yy);
        # cov2d entries recovered from the conic inverse: a=cc/detA etc.,
        # but we saved a,c directly via conic*det relations
        a_ = conic[:, 2] * det   # = a (cov2d_xx + lowpass)
        c_ = conic[:, 0] * det   # = c
        rx = np.ceil(np.sqrt(q_cut * np.maximum(a_, 0.0)))
        ry = np.ceil(np.sqrt(q_cut * np.maximum(c_, 0.0)))
    x0 = np.clip(np.floor((xy[:, 0] - rx) / tile_x), 0, gx).astype(int)
    y0 = np.clip(np.floor((xy[:, 1] - ry) / tile_y), 0, gy).astype(int)
    x1 = np.clip(np.floor((xy[:, 0] + rx + tile_x - 1) / tile_x), 0, gx).astype(int)
    y1 = np.clip(np.floor((xy[:, 1] + ry + tile_y - 1) / tile_y), 0, gy).astype(int)
    # visibility keeps the circle-rect predicate in both modes (it mirrors
    # the path's reference-semantics visible flag)
    vx0 = np.clip(np.floor((xy[:, 0] - radius) / tile_x), 0, gx).astype(int)
    vy0 = np.clip(np.floor((xy[:, 1] - radius) / tile_y), 0, gy).astype(int)
    vx1 = np.clip(np.floor((xy[:, 0] + radius + tile_x - 1) / tile_x), 0, gx).astype(int)
    vy1 = np.clip(np.floor((xy[:, 1] + radius + tile_y - 1) / tile_y), 0, gy).astype(int)
    visible = (depth > 0.2) & (det > 0) & ((vx1 - vx0) * (vy1 - vy0) > 0)
    return dict(xy=xy, depth=depth, conic=conic, radius=radius,
                rect=np.stack([x0, y0, x1, y1], 1), visible=visible)


def depth_key(depth):
    bits = np.asarray(depth, dtype=np.float32).view(np.uint32)
    return bits >> np.uint32(12)


def render_brute(means, cov3d, colors, opacity, view, proj, tanfovx, tanfovy,
                 w, h, bg, tile_x=16, tile_y=16, tight_rect=False):
    pr = project_brute(means, cov3d, view, proj, tanfovx, tanfovy, w, h,
                       tile_x, tile_y,
                       opacity=opacity if tight_rect else None)
    vis = np.nonzero(pr["visible"])[0]
    # stable sort by quantized depth (matches the binner's 20-bit key)
    order = vis[np.argsort(depth_key(pr["depth"][vis]), kind="stable")]

    img = np.zeros((3, h, w))
    dep = np.zeros((h, w))
    final_T = np.ones((h, w))
    ncontrib = np.zeros((h, w))
    for py in range(h):
        for px in range(w):
            tx, ty = px // tile_x, py // tile_y
            T = 1.0
            for i in order:
                x0, y0, x1, y1 = pr["rect"][i]
                if not (x0 <= tx < x1 and y0 <= ty < y1):
                    continue
                dx = pr["xy"][i, 0] - px
                dy = pr["xy"][i, 1] - py
                a, b, c = pr["conic"][i]
                power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
                if power > 0:
                    continue
                alpha = min(ALPHA_MAX, opacity[i] * np.exp(power))
                if alpha < ALPHA_MIN:
                    continue
                t_new = T * (1 - alpha)
                if t_new < T_EPS:
                    break  # CUDA 'done' flag (forward.cu:349-353)
                wgt = alpha * T
                img[:, py, px] += colors[i] * wgt
                dep[py, px] += pr["depth"][i] * wgt
                ncontrib[py, px] += 1
                T = t_new
            final_T[py, px] = T
            img[:, py, px] += T * bg
    return dict(render=img, depth=dep, final_T=final_T, n_contrib=ncontrib,
                proj=pr)
