"""Differentiable Gaussian rasterizer — drop-in analog of the reference's
``GaussianRasterizer`` / ``GaussianRasterizationSettings``
(``diff_gaussian_rasterization/__init__.py:44-221``), returning
``(color [3,H,W], radii [N], depth [H,W])`` plus TPU-side diagnostics.

Dataflow (one jittable program; compare the CUDA call stack at
``rasterizer_impl.cu:198-339``):

  project (jnp, autodiff) → bin (sort, static shapes) → gather pool→pairs
  → tile compositor (Pallas custom_vjp on TPU; jnp elsewhere) → unpack.

Only the compositor carries a hand-written VJP; every other gradient —
EWA covariance, SH, projection, quaternion — is autodiff through jnp,
replacing the reference's hand-derived ``backward.cu``.  The pool→pair
gather's backward uses the binner's inverse permutation and a dense
rect-axis reduction instead of scatter-add (see ``binning.py``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from s3gaussian_tpu.config import RasterConfig
from s3gaussian_tpu.ops import composite as comp
from s3gaussian_tpu.ops.binning import bin_gaussians
from s3gaussian_tpu.ops.project import (ProjectedGaussians, build_cov3d,
                                        project_gaussians, sh_to_color)


class RasterSettings(NamedTuple):
    """Mirror of GaussianRasterizationSettings (__init__.py:158-170)."""

    image_height: int
    image_width: int
    tanfovx: float
    tanfovy: float
    bg: jnp.ndarray            # [3]
    scale_modifier: float
    viewmatrix: jnp.ndarray    # [4,4] row-vector W2C^T
    projmatrix: jnp.ndarray    # [4,4] row-vector full projection
    sh_degree: int
    campos: jnp.ndarray        # [3]
    prefiltered: bool = False
    debug: bool = False


def _use_pallas(cfg: RasterConfig) -> bool:
    if cfg.use_pallas is not None:
        return cfg.use_pallas
    return jax.default_backend() == "tpu"


@functools.lru_cache(maxsize=None)
def _make_composite(grid_x: int, grid_y: int, tile_x: int, tile_y: int,
                    chunk: int, max_chunks: int, nr: int, rect_cap: int,
                    use_pallas: bool, use_custom_vjp: bool = True):
    """Build the custom-vjp compositing core for a static configuration."""

    if use_pallas:
        from s3gaussian_tpu.ops import tile_kernels as tk

        def fwd_impl(pair_feat, tile_starts):
            return tk.composite_fwd_pallas(pair_feat, tile_starts, grid_x,
                                           grid_y, tile_x, tile_y, chunk)

        def bwd_impl(pair_feat, tile_starts, out, dout):
            return tk.composite_bwd_pallas(pair_feat, tile_starts, out, dout,
                                           grid_x, grid_y, tile_x, tile_y,
                                           chunk)
    else:
        def fwd_impl(pair_feat, tile_starts):
            return comp.composite_tiles_jnp(pair_feat, tile_starts, grid_x,
                                            grid_y, tile_x, tile_y, chunk,
                                            max_chunks)

        def bwd_impl(pair_feat, tile_starts, out, dout):
            return comp.composite_tiles_bwd_jnp(pair_feat, tile_starts, out,
                                                dout, grid_x, grid_y, tile_x,
                                                tile_y, chunk, max_chunks)

    if not use_custom_vjp:
        # plain autodiff path (test oracle; backward scatters are fine on CPU)
        def plain_core(feat_pool, pair_idx, sorted_gid, n_pairs, tile_starts,
                       visible):
            pair_feat = feat_pool[:, pair_idx]
            return fwd_impl(pair_feat, tile_starts)
        return plain_core

    @jax.custom_vjp
    def composite_core(feat_pool, pair_idx, sorted_gid, n_pairs, tile_starts,
                       visible):
        pair_feat = feat_pool[:, pair_idx]
        return fwd_impl(pair_feat, tile_starts)

    def composite_fwd(feat_pool, pair_idx, sorted_gid, n_pairs, tile_starts,
                      visible):
        pair_feat = feat_pool[:, pair_idx]
        out = fwd_impl(pair_feat, tile_starts)
        # keep the gathered pair stream as a residual: re-gathering in the
        # backward would cost a second multi-M-index gather per step
        return out, (pair_feat, sorted_gid, n_pairs, tile_starts,
                     visible, out)

    def composite_bwd(res, dout):
        pair_feat, sorted_gid, n_pairs, tile_starts, visible, out = res
        pair_grads = bwd_impl(pair_feat, tile_starts, out, dout)  # [16,Bp]
        bp = pair_grads.shape[1]
        # zero pairs beyond the valid range (the sentinel tail)
        pair_grads = jnp.where((jnp.arange(bp) < n_pairs)[None, :],
                               pair_grads, 0.0)
        # per-Gaussian sums (the CUDA backward's atomicAdds): group the
        # valid pairs by render slot with one kv-sort, then take prefix-sum
        # differences at segment boundaries — all B-sized gathers, no
        # scatter and no NR*rect_cap-sized work
        gid2, pos = jax.lax.sort(
            (sorted_gid, jnp.arange(bp, dtype=jnp.int32)), num_keys=1)
        pg = pair_grads[:, pos]
        cum = jnp.concatenate(
            [jnp.zeros((comp.PAIR_FEAT_DIM, 1)), jnp.cumsum(pg, axis=1)],
            axis=1)
        starts = jnp.searchsorted(gid2, jnp.arange(nr + 1, dtype=jnp.int32),
                                  side="left")
        d_compact = cum[:, starts[1:]] - cum[:, starts[:-1]]       # [16,NR]
        # expand render-set grads back to the pool by rank (gather, not
        # scatter: the compaction is stable so sel is increasing)
        rank = jnp.cumsum(visible.astype(jnp.int32)) - 1
        take = jnp.clip(rank, 0, nr - 1)
        d_pool = jnp.where((visible & (rank < nr))[None, :],
                           d_compact[:, take], 0.0)
        f0 = jax.dtypes.float0
        return (d_pool,
                np.zeros(sorted_gid.shape, f0),
                np.zeros(sorted_gid.shape, f0),
                np.zeros(n_pairs.shape, f0),
                np.zeros(tile_starts.shape, f0),
                np.zeros(visible.shape, f0))

    composite_core.defvjp(composite_fwd, composite_bwd)
    return composite_core


def rasterize(
    settings: RasterSettings,
    means3d: jnp.ndarray,
    opacities: jnp.ndarray,
    scales: Optional[jnp.ndarray] = None,
    rotations: Optional[jnp.ndarray] = None,
    shs: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    mean2d_tap: Optional[jnp.ndarray] = None,
    alive: Optional[jnp.ndarray] = None,
    cfg: RasterConfig = RasterConfig(),
    use_custom_vjp: bool = True,
):
    """Render one view. Activated inputs (exp/sigmoid/normalize already
    applied), matching what the reference feeds its rasterizer
    (gaussian_renderer/__init__.py:99-135)."""
    h, w = settings.image_height, settings.image_width
    grid_x = -(-w // cfg.tile_x)
    grid_y = -(-h // cfg.tile_y)

    if cov3d_precomp is None:
        cov3d = build_cov3d(scales, rotations, settings.scale_modifier)
    else:
        cov3d = cov3d_precomp

    proj = project_gaussians(
        means3d, cov3d, settings.viewmatrix, settings.projmatrix,
        settings.tanfovx, settings.tanfovy, w, h,
        tile_x=cfg.tile_x, tile_y=cfg.tile_y,
        mean2d_tap=mean2d_tap, alive=alive)

    if colors_precomp is None:
        colors = sh_to_color(shs, means3d, settings.campos, settings.sh_degree)
    else:
        colors = colors_precomp

    binning = bin_gaussians(
        ProjectedGaussians(*[jax.lax.stop_gradient(x) for x in proj]),
        grid_x, grid_y, cfg.max_visible, cfg.rect_w, cfg.rect_h,
        cfg.tile_x, cfg.tile_y, cfg.pair_budget)

    feat_pool = comp.pack_pool_features(proj.xy, proj.conic, opacities,
                                        colors, proj.depth)

    nr = binning.sel.shape[0]
    pair_idx = binning.sel[binning.sorted_gid]
    # The jnp path scans a static number of chunks per tile (truncating
    # beyond max_pairs_per_tile); the Pallas path while-loops the true count.
    max_chunks = max(1, -(-min(nr * cfg.rect_cap, cfg.max_pairs_per_tile)
                          // cfg.chunk))
    core = _make_composite(grid_x, grid_y, cfg.tile_x, cfg.tile_y, cfg.chunk,
                           max_chunks, nr, cfg.rect_cap, _use_pallas(cfg),
                           use_custom_vjp)
    out = core(feat_pool, pair_idx, binning.sorted_gid, binning.n_pairs,
               binning.tile_starts, proj.visible)

    maps = comp.unpack_tiles(out, h, w, grid_x, grid_y, cfg.tile_x, cfg.tile_y)
    color = maps["rgb"] + maps["final_T"][None] * settings.bg[:, None, None]
    aux = {
        "final_T": maps["final_T"],
        "n_contrib": maps["n_contrib"],
        "n_visible": binning.n_visible,
        "n_pairs": binning.n_pairs,
        "overflow_rect": binning.overflow_rect,
        "overflow_visible": binning.overflow_visible,
        "overflow_pairs": binning.overflow_pairs,
        "visible": proj.visible,
    }
    return color, proj.radius, maps["depth"], aux
