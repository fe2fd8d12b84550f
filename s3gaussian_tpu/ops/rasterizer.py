"""Differentiable Gaussian rasterizer — drop-in analog of the reference's
``GaussianRasterizer`` / ``GaussianRasterizationSettings``
(``diff_gaussian_rasterization/__init__.py:44-221``), returning
``(color [3,H,W], radii [N], depth [H,W])`` plus TPU-side diagnostics.

Dataflow (one jittable program; compare the CUDA call stack at
``rasterizer_impl.cu:198-339``):

  project (jnp, autodiff) → pair-key emission (static shapes) →
  ONE (key, slot) kv-sort + ONE gather of the 10 feature rows →
  tile compositor (Pallas custom_vjp on TPU; jnp elsewhere) → unpack.

The data-movement design is measured, not assumed
(scripts/microbench_sort.py at M = 3.3M on a v5e): the forward sorts only
(key, slot) and gathers the feature rows once at the sorted positions —
cheaper than streaming the rows through the comparator network, and the
rect_cap pre-expansion of every row disappears.  The backward uses the
mirror trick: the per-pair gradients are sorted by their flat emission
slot (slot = render_slot·rect_cap + r, carried through the forward sort),
riding as bf16-packed payloads — there a payload sort beats
sort-then-gather because the rows are freshly produced per pair and would
otherwise pay both the sort and an M-index gather; per-Gaussian sums are
then a contiguous rect-axis reshape-reduction — no scatter (the CUDA
backward's atomicAdd analog).

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


def _use_pack(cfg: RasterConfig) -> bool:
    if cfg.sort_bf16 is not None:
        return cfg.sort_bf16
    return jax.default_backend() == "tpu"


def _use_hier(cfg: RasterConfig) -> int:
    """chunk_log2 for the hierarchical pair sort; 0 = plain lax.sort.
    Auto policy is measurement-driven (scripts job 021a, BASELINE.md r4):
    off until the TPU microbench blesses a chunk size."""
    if cfg.sort_hier is not None:
        return cfg.sort_hier
    return 0


def _sort_rows(rows, num_keys: int, hier_chunk: int, num_cmp: int = 0):
    """One stable kv-sort of ``rows`` (keys first): lax.sort, or the
    hierarchical bitonic merge when ``hier_chunk`` > 0.  ``num_cmp`` is
    the length of the unique lexicographic prefix (default: keys + the
    slot row that follows them) — uniqueness makes hier_sort bit-identical
    to the stable sort (see ops/sort_hier.py)."""
    if hier_chunk > 0:
        from s3gaussian_tpu.ops.sort_hier import hier_sort
        return hier_sort(rows, num_cmp=num_cmp or (num_keys + 1),
                         chunk_log2=hier_chunk)
    return jax.lax.sort(rows, num_keys=num_keys)


def _pack2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Two f32 rows -> one u32 row of packed bfloat16 pairs."""
    ab = jnp.stack([a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)], axis=-1)
    return jax.lax.bitcast_convert_type(ab, jnp.uint32)


def _unpack2(u: jnp.ndarray):
    """Inverse of _pack2: one u32 row -> two f32 rows."""
    ab = jax.lax.bitcast_convert_type(u, jnp.bfloat16)
    return ab[..., 0].astype(jnp.float32), ab[..., 1].astype(jnp.float32)


def _const_rows(bp: int, dtype=jnp.float32) -> jnp.ndarray:
    """Rows FONE.. of the pair stream: a ones channel + zero padding."""
    return jnp.concatenate(
        [jnp.ones((1, bp), dtype),
         jnp.zeros((comp.PAIR_FEAT_DIM - N_DATA_ROWS - 1, bp), dtype)], 0)


@functools.lru_cache(maxsize=None)
def _make_composite(grid_x: int, grid_y: int, tile_x: int, tile_y: int,
                    chunk: int, max_chunks: int, nr: int, rect_cap: int,
                    bp: int, use_pallas: bool, use_custom_vjp: bool = True,
                    pack_bf16: bool = False, nb: int = 0,
                    hier_chunk: int = 0):
    """Build the sort+composite core for a static configuration.

    The core maps (feat_pool [16,N], pair keys, sel, visible, big...) to
    (out [T,8,P], tile_starts, n_pairs, overflow_pairs).  With nb > 0
    (two-class emission) the pair-slot stream has two sections — cores
    at stride 4 in [0, 4·nr), peripheries at stride rect_cap−4 after —
    and the render set is logically extended by nb big columns."""
    n_tiles = grid_x * grid_y
    peri = rect_cap - 4
    m1 = 4 * nr                    # two-class core section length
    m = (m1 + peri * nb) if nb > 0 else nr * rect_cap
    two_key = n_tiles >= (1 << (32 - DEPTH_BITS)) - 1

    def slot_to_gid(slots):
        """Emission slot -> extended render-set column index."""
        if nb > 0:
            return jnp.where(slots < m1, slots // 4,
                             nr + (slots - m1) // peri)
        return slots // rect_cap

    def extend_data(feat_pool, rows, sel, big_sel):
        """Render-set columns of `rows`, plus the nb big columns."""
        data = (rows if nr >= feat_pool.shape[1] else rows[:, sel])
        if nb > 0:
            data = jnp.concatenate([data, rows[:, big_sel]], 1)
        return data

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

    def _sort_stream(feat_pool, keys, tile_u32, depth_u32, sel, big_sel):
        """One kv-sort of (key, slot), then ONE per-pair gather of the 10
        feature rows at the sorted (and budget-truncated) positions.

        Measured on TPU at M = 3.3M (scripts/microbench_sort.py): carrying
        the 8 payload rows through the comparator network costs more than
        sorting (key, slot) alone and gathering the rows afterwards —
        89 ms vs 111 ms raw — and the rect_cap pre-expansion (jnp.repeat of
        every row to [_, M]) disappears entirely: the gather reads straight
        from the [10, NR] render-set columns at only the bp surviving
        positions.  Tie order is identical (lax.sort is stable), so the
        stream is bit-equal to the payload-carrying variant."""
        slot = jnp.arange(m, dtype=jnp.int32)
        if two_key:
            out = _sort_rows((tile_u32, depth_u32, slot), 2, hier_chunk)
            sorted_tile, sorted_slot = out[0], out[2]
        else:
            out = _sort_rows((keys, slot), 1, hier_chunk)
            sorted_tile = out[0] >> jnp.uint32(DEPTH_BITS)
            sorted_slot = out[1]
        # sel is the identity when the render budget covers the pool
        # (make_pair_keys skips compaction) — skip the gather then
        data = extend_data(feat_pool, feat_pool[:N_DATA_ROWS], sel, big_sel)
        sorted_gid = slot_to_gid(sorted_slot[:bp])       # column per pair
        data_rows = data[:, sorted_gid]                  # [10, bp] one gather
        stream = jnp.concatenate([data_rows, _const_rows(bp)], 0)
        tile_starts, n_pairs, overflow_pairs = tile_ranges(
            sorted_tile, n_tiles, bp)
        return stream, sorted_slot, tile_starts, n_pairs, overflow_pairs

    if not use_custom_vjp:
        # plain autodiff path (test oracle; backward scatters are fine on CPU)
        def plain_core(feat_pool, keys, tile_u32, depth_u32, sel, visible,
                       big_sel, big_granted, big_rank):
            slot = jnp.arange(m, dtype=jnp.int32)
            if two_key:
                s = _sort_rows((tile_u32, depth_u32, slot), 2, hier_chunk)
                sorted_tile, sorted_slot = s[0], s[2]
            else:
                s = _sort_rows((keys, slot), 1, hier_chunk)
                sorted_tile, sorted_slot = s[0] >> jnp.uint32(DEPTH_BITS), s[1]
            data = extend_data(feat_pool, feat_pool, sel, big_sel)
            stream = data[:, slot_to_gid(sorted_slot[:bp])]
            tile_starts, n_pairs, overflow_pairs = tile_ranges(
                sorted_tile, n_tiles, bp)
            return (fwd_impl(stream, tile_starts), tile_starts, n_pairs,
                    overflow_pairs)
        return plain_core

    @jax.custom_vjp
    def composite_core(feat_pool, keys, tile_u32, depth_u32, sel, visible,
                       big_sel, big_granted, big_rank):
        stream, _, tile_starts, n_pairs, overflow_pairs = _sort_stream(
            feat_pool, keys, tile_u32, depth_u32, sel, big_sel)
        return fwd_impl(stream, tile_starts), tile_starts, n_pairs, \
            overflow_pairs

    def composite_fwd(feat_pool, keys, tile_u32, depth_u32, sel, visible,
                      big_sel, big_granted, big_rank):
        stream, sorted_slot, tile_starts, n_pairs, overflow_pairs = \
            _sort_stream(feat_pool, keys, tile_u32, depth_u32, sel, big_sel)
        out = fwd_impl(stream, tile_starts)
        # keep the sorted pair stream as a residual: rebuilding it in the
        # backward would cost a second payload sort
        res = (stream, sorted_slot, tile_starts, n_pairs, visible,
               big_granted, big_rank, out)
        return (out, tile_starts, n_pairs, overflow_pairs), res

    def composite_bwd(res, cots):
        (stream, sorted_slot, tile_starts, n_pairs, visible, big_granted,
         big_rank, out) = res
        dout = cots[0]
        pair_grads = bwd_impl(stream, tile_starts, out, dout)[:, :bp]
        # zero pairs beyond the valid range (the sentinel tail)
        pair_grads = jnp.where((jnp.arange(bp) < n_pairs)[None, :],
                               pair_grads, 0.0)
        if bp < m:
            pair_grads = jnp.pad(pair_grads, ((0, 0), (0, m - bp)))
        # un-sort by emission slot (one payload sort — the mirror of the
        # forward sort), then per-Gaussian sums are a contiguous rect-axis
        # reduction: slot = render_slot * rect_cap + r (single-class), or
        # the two sections' static strides (two-class).  With pack_bf16 the
        # 10 per-pair gradient rows travel as 5 u32 rows of bf16 pairs
        # (per-pair grads get 8-bit mantissas; the rect_cap reduction and
        # everything downstream stay f32).
        if pack_bf16:
            rows = tuple(_pack2(pair_grads[i], pair_grads[i + 1])
                         for i in range(0, N_DATA_ROWS, 2))
            s = _sort_rows((sorted_slot,) + rows, 1, hier_chunk, num_cmp=1)
            unpacked = []
            for u in s[1:]:
                a, b = _unpack2(u)
                unpacked += [a, b]
            d_slot = jnp.stack(unpacked, 0)               # [10, M] slot order
        else:
            rows = tuple(pair_grads[i] for i in range(N_DATA_ROWS))
            s = _sort_rows((sorted_slot,) + rows, 1, hier_chunk, num_cmp=1)
            d_slot = jnp.stack(s[1:], 0)                  # [10, M] slot order
        if nb > 0:
            d_compact = d_slot[:, :m1].reshape(N_DATA_ROWS, nr, 4).sum(-1)
            d_big = d_slot[:, m1:].reshape(N_DATA_ROWS, nb, peri).sum(-1)
            # periphery row i is the i-th granted big in render-slot order,
            # so big_rank indexes it directly for granted slots
            take_b = jnp.clip(big_rank, 0, nb - 1)
            d_compact = d_compact + jnp.where(big_granted[None, :],
                                              d_big[:, take_b], 0.0)
        else:
            d_compact = d_slot.reshape(N_DATA_ROWS, nr, rect_cap).sum(-1)
        # expand render-set grads back to the pool by rank (gather, not
        # scatter: the compaction is stable so sel is increasing).  When the
        # render budget covers the whole pool, make_pair_keys skips the
        # compaction (sel = arange), so render slot j IS pool row j.
        n_pool = visible.shape[0]
        if nr >= n_pool:
            d_data = jnp.where(visible[None, :], d_compact, 0.0)  # [10, N]
        else:
            rank = jnp.cumsum(visible.astype(jnp.int32)) - 1
            take = jnp.clip(rank, 0, nr - 1)
            d_data = jnp.where((visible & (rank < nr))[None, :],
                               d_compact[:, take], 0.0)       # [10, N]
        d_pool = jnp.concatenate(
            [d_data, jnp.zeros((comp.PAIR_FEAT_DIM - N_DATA_ROWS, n_pool))], 0)
        f0 = jax.dtypes.float0
        return (d_pool, np.zeros((m,), f0), np.zeros((m,), f0),
                np.zeros((m,), f0), np.zeros((nr,), f0),
                np.zeros(visible.shape, f0),
                np.zeros((nb,), f0), np.zeros((nr,), f0),
                np.zeros((nr,), f0))

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
        mean2d_tap=mean2d_tap, alive=alive,
        opacities=opacities if cfg.tight_rect else None)

    if colors_precomp is None:
        colors = sh_to_color(shs, means3d, settings.campos, settings.sh_degree)
    else:
        colors = colors_precomp

    nr_budget = min(cfg.max_visible, means3d.shape[0])
    nb = (min(cfg.big_budget, nr_budget)
          if (cfg.big_budget > 0 and cfg.rect_cap > 4
              and cfg.rect_w >= 2 and cfg.rect_h >= 2) else 0)
    pk = make_pair_keys(
        ProjectedGaussians(*[jax.lax.stop_gradient(x) for x in proj]),
        grid_x, grid_y, cfg.max_visible, cfg.rect_w, cfg.rect_h,
        cfg.tile_x, cfg.tile_y,
        opacities=(jax.lax.stop_gradient(opacities) if cfg.tight_rect
                   else None),
        big_budget=nb)

    feat_pool = comp.pack_pool_features(proj.xy, proj.conic, opacities,
                                        colors, proj.depth)

    nr = pk.sel.shape[0]
    m = pk.keys.shape[0]
    bp = min(m, cfg.pair_budget)
    # The jnp path scans a static number of chunks per tile (truncating
    # beyond max_pairs_per_tile); the Pallas path while-loops the true count.
    max_chunks = max(1, -(-min(m, cfg.max_pairs_per_tile) // cfg.chunk))
    core = _make_composite(grid_x, grid_y, cfg.tile_x, cfg.tile_y, cfg.chunk,
                           max_chunks, nr, cfg.rect_cap, bp, _use_pallas(cfg),
                           use_custom_vjp, _use_pack(cfg), nb, _use_hier(cfg))
    if nb > 0:
        big_args = (pk.big_sel, pk.big_granted, pk.big_rank)
    else:
        big_args = (jnp.zeros((0,), jnp.int32),
                    jnp.zeros((nr,), bool),
                    jnp.zeros((nr,), jnp.int32))
    out, tile_starts, n_pairs, overflow_pairs = core(
        feat_pool, pk.keys, pk.tile_u32, pk.depth_u32, pk.sel, proj.visible,
        *big_args)

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
