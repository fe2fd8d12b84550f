"""Deformation field: hexplane encoder + multi-head MLP decoder.

Parity target: ``deform_network`` / ``Deformation``
(scene/deformation.py:16-235) with the default S3Gaussian configuration
(arguments/__init__.py:202-236): net_width 64, defor_depth 1 (so
``feature_out`` is a single Linear(128→64)), heads =
ReLU→Linear(W,W)→ReLU→Linear(W,out) for dx(3)/ds(3)/dr(4)/do(1)/dshs(48),
optional dino head 64→64→64→3.  By default only dx and dshs are active
(no_ds/no_dr/no_do = True).

Reference quirks preserved:
  * ``timenet`` exists but is bypassed (deformation.py:217-223 commented) —
    we don't build it;
  * positional encodings (poc_fre) are computed but the default path only
    consumes the raw first 3/4 dims (query_time uses rays_pts_emb[:, :3]),
    so we skip them entirely;
  * weight init is xavier-uniform, biases keep the torch Linear default
    U(±1/√fan_in) (initialize_weights, deformation.py:237-243, xavier-inits
    the weight twice and never the bias).

The whole field (grid gathers + MLP heads) is one fused XLA program over
the pool; the MXU sees [N,128]x[128,64] matmuls.
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from s3gaussian_tpu.config import ModelHiddenParams
from s3gaussian_tpu.models import hexplane as hx
from s3gaussian_tpu.ops.gridsample import grid_sample_3d
from s3gaussian_tpu.ops.transforms import quat_multiply


def _linear_init(key, fan_in: int, fan_out: int, xavier: bool = True):
    kw, kb = jax.random.split(key)
    if xavier:
        a = math.sqrt(6.0 / (fan_in + fan_out))
        w = jax.random.uniform(kw, (fan_in, fan_out), minval=-a, maxval=a)
    else:
        a = 1.0 / math.sqrt(fan_in)
        w = jax.random.uniform(kw, (fan_in, fan_out), minval=-a, maxval=a)
    b = jax.random.uniform(kb, (fan_out,), minval=-1 / math.sqrt(fan_in),
                           maxval=1 / math.sqrt(fan_in))
    return {"w": w, "b": b}


def _linear(p, x):
    return x @ p["w"] + p["b"]


def _head_init(key, width: int, out: int):
    k1, k2 = jax.random.split(key)
    return {"l1": _linear_init(k1, width, width),
            "l2": _linear_init(k2, width, out)}


def _head(p, h):
    """ReLU → Linear(W,W) → ReLU → Linear(W,out) (deformation.py:61-65)."""
    x = jax.nn.relu(h)
    x = _linear(p["l1"], x)
    x = jax.nn.relu(x)
    return _linear(p["l2"], x)


def init_deformation(key: jax.Array, hp: ModelHiddenParams
                     ) -> Dict[str, Any]:
    """Returns {"grid": hexplane pytree, "mlp": decoder pytree}."""
    w = hp.net_width
    out_dim = hp.kplanes_config["output_coordinate_dim"]
    gfeat = hx.feat_dim(out_dim, hp.multires)
    keys = jax.random.split(key, 10)
    grid = hx.init_hexplane(keys[0], out_dim, hp.kplanes_config["resolution"],
                            hp.multires)
    mlp: Dict[str, Any] = {}
    # feature_out: Linear(gfeat, W) + (D-1)x[ReLU, Linear(W,W)]
    fo = [_linear_init(keys[1], gfeat, w)]
    kf = keys[2]
    for _ in range(hp.defor_depth - 1):
        kf, sub = jax.random.split(kf)
        fo.append(_linear_init(sub, w, w))
    mlp["feature_out"] = fo
    if not hp.no_dx:
        mlp["pos"] = _head_init(keys[3], w, 3)
    if not hp.no_ds:
        mlp["scales"] = _head_init(keys[4], w, 3)
    if not hp.no_dr:
        mlp["rotations"] = _head_init(keys[5], w, 4)
    if not hp.no_do:
        mlp["opacity"] = _head_init(keys[6], w, 1)
    if not hp.no_dshs:
        mlp["shs"] = _head_init(keys[7], w, 16 * 3)
    if hp.feat_head:
        k1, k2, k3 = jax.random.split(keys[8], 3)
        mlp["dino"] = {"l1": _linear_init(k1, w, 64),
                       "l2": _linear_init(k2, 64, 64),
                       "l3": _linear_init(k3, 64, 3)}
    if hp.static_mlp:
        # ReLU->Linear(W,W)->ReLU->Linear(W,1) (deformation.py:33) == _head
        mlp["static_mlp"] = _head_init(keys[9], w, 1)
    out = {"grid": grid, "mlp": mlp}
    if hp.empty_voxel:
        # DenseGrid(channels=1, world_size=[64,64,64]) init to ones
        # (grid.py:16,29); lands in the "deformation" LR group like the
        # reference's non-"grid" parameters (deformation.py:169-177)
        out["empty_voxel"] = jnp.ones((1, 64, 64, 64), jnp.float32)
    return out


class DeformOut(NamedTuple):
    xyz: jnp.ndarray
    scales: jnp.ndarray
    rotations: jnp.ndarray
    opacity: jnp.ndarray
    shs: jnp.ndarray
    dx: Optional[jnp.ndarray]
    feat: Optional[jnp.ndarray]
    dshs: Optional[jnp.ndarray]


def apply_deformation_ckpt(params: Dict[str, Any], hp: ModelHiddenParams,
                           aabb: jnp.ndarray, xyz: jnp.ndarray,
                           scales: jnp.ndarray, rotations: jnp.ndarray,
                           opacity: jnp.ndarray, shs: jnp.ndarray,
                           t: jnp.ndarray) -> "DeformOut":
    """``apply_deformation``, rematerialized in the backward pass when
    ``hp.remat_deform`` — the autodiff residuals of the field (24 gathered
    hexplane slices of [N,32] each, the MLP hidden states, the per-head
    outputs) dominate train-step memory at LiDAR-cap point counts; with
    remat the backward recomputes the (gather-bound, MXU-light) forward
    instead of storing them."""
    if not hp.remat_deform:
        return apply_deformation(params, hp, aabb, xyz, scales, rotations,
                                 opacity, shs, t)
    f = jax.checkpoint(apply_deformation, static_argnums=(1,))
    return f(params, hp, aabb, xyz, scales, rotations, opacity, shs, t)


def apply_deformation(params: Dict[str, Any], hp: ModelHiddenParams,
                      aabb: jnp.ndarray, xyz: jnp.ndarray,
                      scales: jnp.ndarray, rotations: jnp.ndarray,
                      opacity: jnp.ndarray, shs: jnp.ndarray,
                      t: jnp.ndarray) -> DeformOut:
    """forward_dynamic (deformation.py:108-166) on raw (pre-activation)
    attributes; t is [N,1] in [0,1], or a scalar (uniform time — engages
    the hexplane's scalar-row fast path)."""
    n_scales = len(hp.multires)
    h = hx.query_hexplane(
        params["grid"], xyz, t, aabb, n_scales,
        compute_dtype=jnp.bfloat16 if hp.grid_compute_bf16 else None)
    mlp = params["mlp"]
    fo = mlp["feature_out"]
    h = _linear(fo[0], h)
    for layer in fo[1:]:
        h = _linear(layer, jax.nn.relu(h))

    # static/dynamic mask (deformation.py:112-117): a learned per-point
    # gate multiplying the *undeformed* attribute before adding the delta
    # (attr*mask + d_attr); identity 1 unless static_mlp / empty_voxel.
    if hp.static_mlp:
        mask = _head(mlp["static_mlp"], h)                       # [N,1]
    elif hp.empty_voxel:
        # DenseGrid query: coords normalized by the aabb ([max; min]
        # layout, see hexplane.normalize_aabb) and FLIPPED to (z,y,x)
        # like the reference's .flip(-1) (grid.py:37)
        norm = (xyz - aabb[1]) / (aabb[0] - aabb[1]) * 2.0 - 1.0
        mask = grid_sample_3d(params["empty_voxel"], norm[:, ::-1])
    else:
        mask = None

    def gated(attr):
        return attr if mask is None else attr * mask

    dx = feat = dshs = None
    out_xyz, out_scales, out_rot, out_op, out_shs = (xyz, scales, rotations,
                                                     opacity, shs)
    if not hp.no_dx:
        dx = _head(mlp["pos"], h)
        out_xyz = gated(xyz) + dx
    if not hp.no_ds:
        out_scales = gated(scales) + _head(mlp["scales"], h)
    if not hp.no_dr:
        # rotations are never masked (deformation.py:135-144)
        dr = _head(mlp["rotations"], h)
        if hp.apply_rotation:
            out_rot = quat_multiply(rotations, dr)
        else:
            out_rot = rotations + dr
    if not hp.no_do:
        out_op = gated(opacity) + _head(mlp["opacity"], h)
    if not hp.no_dshs:
        dshs = _head(mlp["shs"], h).reshape(shs.shape[0], 16, 3)
        shs_gated = shs if mask is None else shs * mask[:, :, None]
        out_shs = shs_gated + dshs
    if hp.feat_head:
        d = mlp["dino"]
        x = _linear(d["l1"], h)
        x = _linear(d["l2"], jax.nn.relu(x))
        feat = _linear(d["l3"], jax.nn.relu(x))
    return DeformOut(out_xyz, out_scales, out_rot, out_op, out_shs,
                     dx, feat, dshs)
