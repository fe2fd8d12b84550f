"""Differentiable Gaussian rasterizer — drop-in analog of the reference's
``GaussianRasterizer`` / ``GaussianRasterizationSettings``
(``diff_gaussian_rasterization/__init__.py:44-221``), returning
``(color [3,H,W], radii [N], depth [H,W])`` plus TPU-side diagnostics.

Dataflow (one jittable program; compare the CUDA call stack at
``rasterizer_impl.cu:198-339``):

  project (jnp, autodiff) → pair-key emission (static shapes) →
  ONE kv-sort carrying the 10 feature rows as payloads →
  tile compositor (Pallas custom_vjp on TPU; jnp elsewhere) → unpack.

The payload-carrying sort is the load-bearing TPU design decision: on TPU
a gather costs ~25 ns *per index* regardless of row width, so building the
sorted pair stream as sort-index-then-gather pays twice (index sort, then
an M-index gather).  ``lax.sort`` streaming the feature rows through the
same comparator network is ~45% cheaper at M = 4M, and the backward uses
the mirror trick: the per-pair gradients are sorted by their flat emission
slot (slot = render_slot·rect_cap + r, carried through the forward sort),
after which per-Gaussian sums are a contiguous rect-axis reshape-reduction
— no scatter (the CUDA backward's atomicAdd analog) and no second gather.

Only the compositor carries a hand-written VJP; every other gradient —
EWA covariance, SH, projection, quaternion — is autodiff through jnp,
replacing the reference's hand-derived ``backward.cu``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from s3gaussian_tpu.config import RasterConfig
from s3gaussian_tpu.ops import composite as comp
from s3gaussian_tpu.ops.binning import (DEPTH_BITS, make_pair_keys,
                                        tile_ranges)
from s3gaussian_tpu.ops.project import (ProjectedGaussians, build_cov3d,
                                        project_gaussians, sh_to_color)

# feature rows that actually vary per pair (rows FONE.. are constants)
N_DATA_ROWS = comp.FD + 1


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


def _const_rows(bp: int, dtype=jnp.float32) -> jnp.ndarray:
    """Rows FONE.. of the pair stream: a ones channel + zero padding."""
    return jnp.concatenate(
        [jnp.ones((1, bp), dtype),
         jnp.zeros((comp.PAIR_FEAT_DIM - N_DATA_ROWS - 1, bp), dtype)], 0)


@functools.lru_cache(maxsize=None)
def _make_composite(grid_x: int, grid_y: int, tile_x: int, tile_y: int,
                    chunk: int, max_chunks: int, nr: int, rect_cap: int,
                    bp: int, use_pallas: bool, use_custom_vjp: bool = True):
    """Build the sort+composite core for a static configuration.

    The core maps (feat_pool [16,N], pair keys, sel, visible) to
    (out [T,8,P], tile_starts, n_pairs, overflow_pairs)."""
    n_tiles = grid_x * grid_y
    m = nr * rect_cap
    two_key = n_tiles >= (1 << (32 - DEPTH_BITS)) - 1

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

    def _sort_stream(feat_pool, keys, tile_u32, depth_u32, sel):
        """One kv-sort: [tile|depth] keys carrying (slot, 10 feature rows)."""
        slot = jnp.arange(m, dtype=jnp.int32)
        exp = jnp.repeat(feat_pool[:N_DATA_ROWS][:, sel], rect_cap, axis=1)
        rows = tuple(exp[i] for i in range(N_DATA_ROWS))
        if two_key:
            out = jax.lax.sort((tile_u32, depth_u32, slot) + rows, num_keys=2)
            sorted_tile, sorted_slot, srows = out[0], out[2], out[3:]
        else:
            out = jax.lax.sort((keys, slot) + rows, num_keys=1)
            sorted_tile = out[0] >> jnp.uint32(DEPTH_BITS)
            sorted_slot, srows = out[1], out[2:]
        stream = jnp.concatenate(
            [jnp.stack([r[:bp] for r in srows], 0), _const_rows(bp)], 0)
        tile_starts, n_pairs, overflow_pairs = tile_ranges(
            sorted_tile, n_tiles, bp)
        return stream, sorted_slot, tile_starts, n_pairs, overflow_pairs

    if not use_custom_vjp:
        # plain autodiff path (test oracle; backward scatters are fine on CPU)
        def plain_core(feat_pool, keys, tile_u32, depth_u32, sel, visible):
            slot = jnp.arange(m, dtype=jnp.int32)
            if two_key:
                s = jax.lax.sort((tile_u32, depth_u32, slot), num_keys=2)
                sorted_tile, sorted_slot = s[0], s[2]
            else:
                s = jax.lax.sort((keys, slot), num_keys=1)
                sorted_tile, sorted_slot = s[0] >> jnp.uint32(DEPTH_BITS), s[1]
            exp = jnp.repeat(feat_pool[:, sel], rect_cap, axis=1)
            stream = exp[:, sorted_slot[:bp]]
            tile_starts, n_pairs, overflow_pairs = tile_ranges(
                sorted_tile, n_tiles, bp)
            return (fwd_impl(stream, tile_starts), tile_starts, n_pairs,
                    overflow_pairs)
        return plain_core

    @jax.custom_vjp
    def composite_core(feat_pool, keys, tile_u32, depth_u32, sel, visible):
        stream, _, tile_starts, n_pairs, overflow_pairs = _sort_stream(
            feat_pool, keys, tile_u32, depth_u32, sel)
        return fwd_impl(stream, tile_starts), tile_starts, n_pairs, \
            overflow_pairs

    def composite_fwd(feat_pool, keys, tile_u32, depth_u32, sel, visible):
        stream, sorted_slot, tile_starts, n_pairs, overflow_pairs = \
            _sort_stream(feat_pool, keys, tile_u32, depth_u32, sel)
        out = fwd_impl(stream, tile_starts)
        # keep the sorted pair stream as a residual: rebuilding it in the
        # backward would cost a second payload sort
        res = (stream, sorted_slot, tile_starts, n_pairs, visible, out)
        return (out, tile_starts, n_pairs, overflow_pairs), res

    def composite_bwd(res, cots):
        stream, sorted_slot, tile_starts, n_pairs, visible, out = res
        dout = cots[0]
        pair_grads = bwd_impl(stream, tile_starts, out, dout)[:, :bp]
        # zero pairs beyond the valid range (the sentinel tail)
        pair_grads = jnp.where((jnp.arange(bp) < n_pairs)[None, :],
                               pair_grads, 0.0)
        if bp < m:
            pair_grads = jnp.pad(pair_grads, ((0, 0), (0, m - bp)))
        # un-sort by emission slot (one payload sort — the mirror of the
        # forward sort), then per-Gaussian sums are a contiguous rect-axis
        # reduction: slot = render_slot * rect_cap + r
        rows = tuple(pair_grads[i] for i in range(N_DATA_ROWS))
        s = jax.lax.sort((sorted_slot,) + rows, num_keys=1)
        d_slot = jnp.stack(s[1:], 0)                      # [10, M] slot order
        d_compact = d_slot.reshape(N_DATA_ROWS, nr, rect_cap).sum(-1)
        # expand render-set grads back to the pool by rank (gather, not
        # scatter: the compaction is stable so sel is increasing)
        n_pool = visible.shape[0]
        rank = jnp.cumsum(visible.astype(jnp.int32)) - 1
        take = jnp.clip(rank, 0, nr - 1)
        d_data = jnp.where((visible & (rank < nr))[None, :],
                           d_compact[:, take], 0.0)       # [10, N]
        d_pool = jnp.concatenate(
            [d_data, jnp.zeros((comp.PAIR_FEAT_DIM - N_DATA_ROWS, n_pool))], 0)
        f0 = jax.dtypes.float0
        return (d_pool, np.zeros((m,), f0), np.zeros((m,), f0),
                np.zeros((m,), f0), np.zeros((nr,), f0),
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

    pk = make_pair_keys(
        ProjectedGaussians(*[jax.lax.stop_gradient(x) for x in proj]),
        grid_x, grid_y, cfg.max_visible, cfg.rect_w, cfg.rect_h,
        cfg.tile_x, cfg.tile_y)

    feat_pool = comp.pack_pool_features(proj.xy, proj.conic, opacities,
                                        colors, proj.depth)

    nr = pk.sel.shape[0]
    m = nr * cfg.rect_cap
    bp = min(m, cfg.pair_budget)
    # The jnp path scans a static number of chunks per tile (truncating
    # beyond max_pairs_per_tile); the Pallas path while-loops the true count.
    max_chunks = max(1, -(-min(m, cfg.max_pairs_per_tile) // cfg.chunk))
    core = _make_composite(grid_x, grid_y, cfg.tile_x, cfg.tile_y, cfg.chunk,
                           max_chunks, nr, cfg.rect_cap, bp, _use_pallas(cfg),
                           use_custom_vjp)
    out, tile_starts, n_pairs, overflow_pairs = core(
        feat_pool, pk.keys, pk.tile_u32, pk.depth_u32, pk.sel, proj.visible)

    maps = comp.unpack_tiles(out, h, w, grid_x, grid_y, cfg.tile_x, cfg.tile_y)
    color = maps["rgb"] + maps["final_T"][None] * settings.bg[:, None, None]
    aux = {
        "final_T": maps["final_T"],
        "n_contrib": maps["n_contrib"],
        "n_visible": pk.n_visible,
        "n_pairs": n_pairs,
        "overflow_rect": pk.overflow_rect,
        "overflow_visible": pk.overflow_visible,
        "overflow_pairs": overflow_pairs,
        "visible": proj.visible,
    }
    return color, proj.radius, maps["depth"], aux
