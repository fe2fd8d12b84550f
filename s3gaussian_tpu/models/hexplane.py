"""Multi-resolution hexplane (K-Planes) spacetime encoder.

Parity target: ``HexPlaneField`` (scene/hexplane.py:110-183) —
6 planes per scale = C(4,2) coordinate pairs over (x, y, z, t), spatial
planes init U(0.1, 0.5), time planes init to 1, per-scale feature =
*product* over the 6 bilinear plane samples, multi-scale features
concatenated.  Defaults (arguments/__init__.py:216-222): 2D planes, out_dim
32, base reso [64, 64, 64, 25], multires ×{1,2,4,8} on the spatial dims
only ⇒ feat_dim 128.

TPU shape: the whole query is gathers + elementwise products that XLA fuses
into the surrounding deformation MLP; time coordinates are uniform per
frame so the time-plane gathers hit two columns.  The parameters are a
plain pytree {``scale{s}_plane{i}``: [C, H, W]} so optax param-group
labeling by name prefix works like the reference's "grid" group
(gaussian_model.py:178-180).
"""

from __future__ import annotations

import itertools
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from s3gaussian_tpu.ops.gridsample import grid_sample_2d, sample_time_plane

COO_COMBS: Tuple[Tuple[int, int], ...] = tuple(
    itertools.combinations(range(4), 2))
# = ((0,1),(0,2),(0,3),(1,2),(1,3),(2,3)); planes 2,4,5 involve time (idx 3)
SPATIAL_PLANES = (0, 1, 3)
TIME_PLANES = (2, 4, 5)


def init_hexplane(key: jax.Array, out_dim: int = 32,
                  resolution: Sequence[int] = (64, 64, 64, 25),
                  multires: Sequence[int] = (1, 2, 4, 8)
                  ) -> Dict[str, jnp.ndarray]:
    """Parameter pytree. Plane (i, scale s): [out_dim, reso[c1]*m, reso[c0]*m]
    with m applied to spatial dims only (hexplane.py:133-146); time planes
    init to ones, spatial U(0.1, 0.5) (hexplane.py:64-67)."""
    params = {}
    for s, mult in enumerate(multires):
        reso = [r * mult for r in resolution[:3]] + [resolution[3]]
        for i, comb in enumerate(COO_COMBS):
            key, sub = jax.random.split(key)
            shape = (out_dim, reso[comb[1]], reso[comb[0]])
            if 3 in comb:
                p = jnp.ones(shape)
            else:
                p = jax.random.uniform(sub, shape, minval=0.1, maxval=0.5)
            params[f"scale{s}_plane{i}"] = p
    return params


def feat_dim(out_dim: int, multires: Sequence[int]) -> int:
    return out_dim * len(multires)


def normalize_aabb(pts: jnp.ndarray, aabb: jnp.ndarray) -> jnp.ndarray:
    """(pts - aabb[0]) * 2/(aabb[1]-aabb[0]) - 1 (hexplane.py:19-20).
    NOTE: the reference stores aabb as [max; min] and normalizes with
    aabb[0]=max — we replicate that exact behavior (a sign flip that the
    network simply learns around)."""
    return (pts - aabb[0]) * (2.0 / (aabb[1] - aabb[0])) - 1.0


def query_hexplane(params: Dict[str, jnp.ndarray], pts: jnp.ndarray,
                   t: jnp.ndarray, aabb: jnp.ndarray,
                   n_scales: int, compute_dtype=None) -> jnp.ndarray:
    """pts [N,3] world, t [N,1] in [0,1] -> features [N, out_dim*n_scales].

    Per scale: product over the 6 plane samples; concat over scales
    (interpolate_ms_features, hexplane.py:73-106).

    ``compute_dtype`` (e.g. bfloat16) casts the plane VALUES before the
    gathers — coordinates and interpolation weights stay f32 — so the
    forward row-gathers and, crucially, the backward scatter-adds into the
    grids move half the bytes.  Master params stay f32 (the cast's VJP
    returns f32 cotangents).

    ``t`` may be a SCALAR (the per-camera time, uniform over points —
    what training/eval always does): the spatiotemporal planes then take
    the scalar-row fast path (ops/gridsample.py:sample_time_plane), which
    folds the t-lerp before the gather and computes the grid gradient
    with a one-hot matmul instead of a scatter-add.
    """
    t_scalar = jnp.ndim(t) == 0
    x = normalize_aabb(pts, aabb)
    if t_scalar:
        tcol = None
    else:
        tcol = t
    feats = []
    for s in range(n_scales):
        acc = None
        for i, comb in enumerate(COO_COMBS):
            plane = params[f"scale{s}_plane{i}"]
            if compute_dtype is not None:
                plane = plane.astype(compute_dtype)
            if 3 in comb and t_scalar:
                v = sample_time_plane(plane, x[:, comb[0]], t)
            else:
                cols = [x[:, [c]] if c < 3 else tcol for c in comb]
                coords = jnp.concatenate(cols, axis=-1)
                v = grid_sample_2d(plane, coords)
            acc = v if acc is None else acc * v
        feats.append(acc.astype(jnp.float32))
    return jnp.concatenate(feats, axis=-1)


# --- regularizers (gaussian_model.py:710-749, regulation.py:22-28) ---

def _plane_smoothness(p: jnp.ndarray) -> jnp.ndarray:
    """Mean squared second difference along the plane's row axis
    (compute_plane_smoothness; the row axis is the *second* coordinate of
    the pair — time for the spatiotemporal planes)."""
    d1 = p[:, 1:, :] - p[:, :-1, :]
    d2 = d1[:, 1:, :] - d1[:, :-1, :]
    return jnp.mean(jnp.square(d2))


def plane_tv(params: Dict[str, jnp.ndarray], n_scales: int) -> jnp.ndarray:
    """Smoothness over the three spatial planes (_plane_regulation)."""
    total = 0.0
    for s in range(n_scales):
        for i in SPATIAL_PLANES:
            total = total + _plane_smoothness(params[f"scale{s}_plane{i}"])
    return total


def time_smoothness(params: Dict[str, jnp.ndarray], n_scales: int) -> jnp.ndarray:
    """Smoothness over the three spatiotemporal planes (_time_regulation)."""
    total = 0.0
    for s in range(n_scales):
        for i in TIME_PLANES:
            total = total + _plane_smoothness(params[f"scale{s}_plane{i}"])
    return total


def l1_time(params: Dict[str, jnp.ndarray], n_scales: int) -> jnp.ndarray:
    """mean |1 - plane| over spatiotemporal planes (_l1_regulation)."""
    total = 0.0
    for s in range(n_scales):
        for i in TIME_PLANES:
            total = total + jnp.mean(jnp.abs(1.0 - params[f"scale{s}_plane{i}"]))
    return total


def compute_regulation(params: Dict[str, jnp.ndarray], n_scales: int,
                       time_smoothness_weight: float, l1_time_weight: float,
                       plane_tv_weight: float) -> jnp.ndarray:
    """gaussian_model.py:745-749 weighting."""
    return (plane_tv_weight * plane_tv(params, n_scales)
            + time_smoothness_weight * time_smoothness(params, n_scales)
            + l1_time_weight * l1_time(params, n_scales))
