"""Tile binning: static-shape, sort-based replacement for the CUDA
rasterizer's dynamic pipeline (``rasterizer_impl.cu:198-339``:
``InclusiveSum`` over tiles_touched → ``duplicateWithKeys`` 64-bit
[tile|depth] keys → ``DeviceRadixSort`` → ``identifyTileRanges``).

TPU design (all shapes static, one compiled program):

1. **Visible compaction** — one stable key/value ``lax.sort`` over the pool
   brings visible Gaussians to the front; the first ``NR = max_visible``
   slots form the render set.
2. **Bounded pair expansion** — each render slot emits up to
   ``rect_w × rect_h`` (tile, depth) pairs for the tiles its screen rect
   covers.  Rects larger than the cap are clamped *around the projected
   center* (the reference has no cap; overflow is counted and reported so
   budgets can be tuned).  Each pair packs into a single uint32 key:
   ``tile_id << 20 | top-20-bits-of-float32(depth)`` — positive-float bit
   patterns are order-preserving, so one radix-friendly sort orders pairs
   by tile then front-to-back depth, ties broken stably by pool order
   (the CUDA 64-bit key sort has the same tie behavior).
3. **One kv-sort** of the M = NR·rect_cap keys with the flat slot index
   as payload.  The backward turns per-pair gradients back into
   per-Gaussian sums with a gid-sort + prefix-sum boundary difference
   (see rasterizer.composite_bwd) — scatter-add, the CUDA backward's
   atomicAdd analog, is pathologically slow on TPU (~100ms/M rows).
4. **Tile ranges** via ``searchsorted`` (== ``identifyTileRanges``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from s3gaussian_tpu.ops.project import ProjectedGaussians

# Key layout: tile in the top 12 bits after a 20-bit depth field.
DEPTH_BITS = 20
INVALID_KEY = jnp.uint32(0xFFFFFFFF)


class PairKeys(NamedTuple):
    """Unsorted pair keys + render-set selection (static shapes).

    The sort itself lives with its consumer: the rasterizer's compositing
    core sorts (key, slot) and gathers the feature rows once at the
    sorted, budget-truncated positions (measured cheaper at M = 3.3M than
    streaming the rows through the comparator network — see
    rasterizer.py and scripts/microbench_sort.py); the backward instead
    carries its freshly-produced gradient rows as bf16-packed payloads."""

    sel: jnp.ndarray          # [NR] int32 pool index of each render slot
    sel_visible: jnp.ndarray  # [NR] bool  render slot is a real visible gaussian
    keys: jnp.ndarray         # [M] uint32 packed [tile|depth] keys
    tile_u32: jnp.ndarray     # [M] uint32 tile ids (two-key path; INVALID on pad)
    depth_u32: jnp.ndarray    # [M] uint32 order-preserving depth bits
    two_key: bool             # True when tile ids don't fit the packed key
    n_visible: jnp.ndarray    # [] int32 visible gaussians (pre NR-cap)
    overflow_rect: jnp.ndarray  # [] int32 gaussians whose rect was clamped
    overflow_visible: jnp.ndarray  # [] int32 visible gaussians beyond NR budget
    # two-class emission only (None in single-class mode): slots
    # [0, 4·NR) are the 2×2 cores in render-slot order; slots
    # [4·NR, 4·NR + peri·NB) are the granted bigs' peripheries
    big_sel: Optional[jnp.ndarray] = None      # [NB] int32 pool ids of granted bigs
    big_granted: Optional[jnp.ndarray] = None  # [NR] bool render slot got a periphery
    big_rank: Optional[jnp.ndarray] = None     # [NR] int32 periphery section index


class BinnedPairs(NamedTuple):
    """Sorted pair stream + tile ranges (static shapes)."""

    sel: jnp.ndarray          # [NR] int32 pool index of each render slot
    sel_visible: jnp.ndarray  # [NR] bool  render slot is a real visible gaussian
    sorted_gid: jnp.ndarray   # [M] int32 render-slot index per sorted pair
    tile_starts: jnp.ndarray  # [T+1] int32 pair range per tile (starts[T] = n_pairs)
    n_pairs: jnp.ndarray      # [] int32 number of valid pairs
    n_visible: jnp.ndarray    # [] int32 visible gaussians (pre NR-cap)
    overflow_rect: jnp.ndarray  # [] int32 gaussians whose rect was clamped
    overflow_visible: jnp.ndarray  # [] int32 visible gaussians beyond NR budget
    overflow_pairs: jnp.ndarray  # [] int32 valid pairs beyond the pair budget


def depth_key_bits(depth: jnp.ndarray) -> jnp.ndarray:
    """Top DEPTH_BITS bits of the float32 depth — monotone for depth > 0."""
    bits = jax.lax.bitcast_convert_type(depth.astype(jnp.float32), jnp.uint32)
    return bits >> jnp.uint32(32 - DEPTH_BITS)


def _quad_min_box(ca, cb, cc, bx0, bx1, by0, by1):
    """Exact minimum of q(dx,dy) = ca·dx² + 2·cb·dx·dy + cc·dy² over the
    box [bx0,bx1]×[by0,by1] (all [..,R] arrays; ca,cc > 0).

    If the origin (the gaussian center) lies inside the box the min is 0;
    otherwise it lies on the boundary, where each edge is a 1-D quadratic
    whose unconstrained minimizer clamps to the edge interval."""
    inside = (bx0 <= 0) & (0 <= bx1) & (by0 <= 0) & (0 <= by1)

    def qv(dx, dy):
        return ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy

    def x_edge(dx):
        dy = jnp.clip(-cb * dx / cc, by0, by1)
        return qv(dx, dy)

    def y_edge(dy):
        dx = jnp.clip(-cb * dy / ca, bx0, bx1)
        return qv(dx, dy)

    edge_min = jnp.minimum(jnp.minimum(x_edge(bx0), x_edge(bx1)),
                           jnp.minimum(y_edge(by0), y_edge(by1)))
    return jnp.where(inside, 0.0, edge_min)


def _ellipse_ok(ca, cb, cc, q_cut, xy, tx, ty, tile_x, tile_y):
    """Exact ellipse–tile cut: True where the conic quadratic's minimum
    over the tile's pixel box reaches the alpha cutoff (see
    make_pair_keys docstring).  ca/cb/cc/q_cut: [NS]; xy: [NS,2];
    tx/ty: [NS,P] tile coords."""
    bx0 = (tx * tile_x).astype(jnp.float32) - xy[:, 0:1]
    by0 = (ty * tile_y).astype(jnp.float32) - xy[:, 1:2]
    qmin = _quad_min_box(ca[:, None], cb[:, None], cc[:, None],
                         bx0, bx0 + (tile_x - 1), by0, by0 + (tile_y - 1))
    return qmin <= q_cut[:, None]


@functools.lru_cache(maxsize=None)
def _peri_table(rect_w: int, rect_h: int) -> np.ndarray:
    """Static periphery-offset tables for two-class emission.

    Entry (oy·(rect_w−1)+ox) lists the rect_w×rect_h offsets OUTSIDE the
    2×2 core placed at (ox, oy) — the core is always a sub-rect of the
    center-clamped big rect (nested center-clamps), so (ox, oy) ∈
    [0, rect_w−2]×[0, rect_h−2].  Shape [(rw−1)·(rh−1), rect_cap−4, 2]."""
    rows = []
    for oy in range(rect_h - 1):
        for ox in range(rect_w - 1):
            offs = [(dx, dy) for dy in range(rect_h) for dx in range(rect_w)
                    if not (ox <= dx < ox + 2 and oy <= dy < oy + 2)]
            rows.append(offs)
    return np.asarray(rows, np.int32)


def make_pair_keys(proj: ProjectedGaussians, grid_x: int, grid_y: int,
                   max_visible: int, rect_w: int, rect_h: int,
                   tile_x: int = 16, tile_y: int = 16,
                   opacities=None, big_budget: int = 0) -> PairKeys:
    """Visible compaction + bounded pair-key emission (no sort).

    Replaces ``duplicateWithKeys`` (rasterizer_impl.cu:70-111): each render
    slot emits up to rect_w×rect_h [tile|depth] keys for the tiles its
    screen rect covers; oversized rects are clamped around the projected
    center (counted in ``overflow_rect``).  Tile grids beyond the packed
    12-bit tile field (e.g. full-res 1280×1920 → 9,600 tiles) switch to a
    two-key representation, matching the reference's 64-bit keys
    (rasterizer_impl.cu:290-309).

    With ``opacities`` (activated, [N] or [N,1]) the emission adds an
    EXACT ellipse–tile test on top of the tight-rect bbox: a pair is
    valid only if the minimum of the conic quadratic over the tile's
    pixel box reaches the alpha cutoff Q = 2·ln(255·opac).  Dropped
    pairs have alpha < 1/255 at every pixel, which both this compositor
    and the CUDA kernel mask to zero — output is unchanged, but thin or
    diagonal splats stop paying for the corners of their bbox (the bbox
    covers up to ~2× the tiles of the actual ellipse)."""
    n_tiles = grid_x * grid_y
    two_key = n_tiles >= (1 << (32 - DEPTH_BITS)) - 1
    n_pool = proj.depth.shape[0]
    nr = min(max_visible, n_pool)
    rect_cap = rect_w * rect_h

    visible = proj.visible
    n_visible = jnp.sum(visible.astype(jnp.int32))

    # 1. stable visible-first compaction.  When every pool row fits the
    # render budget the compaction is the identity permutation — skip the
    # pool-sized sort entirely (the invalid-pair masking below already
    # drops non-visible slots).
    if nr >= n_pool:
        sel = jnp.arange(n_pool, dtype=jnp.int32)
        sel_visible = visible
        overflow_visible = jnp.zeros((), jnp.int32)
    else:
        compact_key = jnp.where(visible, jnp.uint32(0), jnp.uint32(1))
        _, order = jax.lax.sort(
            (compact_key, jnp.arange(n_pool, dtype=jnp.int32)), num_keys=1)
        sel = order[:nr]
        sel_visible = visible[sel] & (jnp.arange(nr) < n_visible)
        overflow_visible = jnp.maximum(n_visible - nr, 0)

    # 2. bounded pair expansion on the render set
    rect = proj.tiles_rect[sel]          # [NR,4] x0,y0,x1,y1
    xy = jax.lax.stop_gradient(proj.xy[sel])
    x0, y0, x1, y1 = rect[:, 0], rect[:, 1], rect[:, 2], rect[:, 3]
    w = x1 - x0
    h = y1 - y0
    overflow_rect = jnp.sum(((w > rect_w) | (h > rect_h)) & sel_visible)

    # center-clamp oversized rects (tile of the projected mean stays inside)
    cx = jnp.clip((xy[:, 0] // tile_x).astype(jnp.int32), x0, jnp.maximum(x0, x1 - 1))
    cy = jnp.clip((xy[:, 1] // tile_y).astype(jnp.int32), y0, jnp.maximum(y0, y1 - 1))
    wc = jnp.minimum(w, rect_w)
    hc = jnp.minimum(h, rect_h)
    x0c = jnp.clip(cx - rect_w // 2, x0, jnp.maximum(x0, x1 - wc))
    y0c = jnp.clip(cy - rect_h // 2, y0, jnp.maximum(y0, y1 - hc))

    dfull = jax.lax.bitcast_convert_type(
        proj.depth[sel].astype(jnp.float32), jnp.uint32)

    if opacities is not None:
        # exact ellipse–tile cut (docstring above); pixel centers sit at
        # integer coords, so the tile's box spans [t·16, t·16 + 15]
        op = opacities.reshape(-1)
        op_s = op if nr >= n_pool else op[sel]
        q_cut = jnp.maximum(2.0 * jnp.log(jnp.maximum(op_s, 1e-9) * 255.0),
                            0.0)
        con = proj.conic if nr >= n_pool else proj.conic[sel]
        # guard dead/culled rows (conic may be garbage there; they are
        # already invalid via sel_visible)
        ca = jnp.maximum(con[:, 0], 1e-12)
        cb = con[:, 1]
        cc = jnp.maximum(con[:, 2], 1e-12)

    def finish(tile, valid, depth_u32, extras):
        mm = tile.shape[0]
        tile_u32 = jnp.where(valid, tile.astype(jnp.uint32), INVALID_KEY)
        if two_key:
            keys = tile_u32  # packed key unusable; consumers sort (tile, depth)
        else:
            dbits = depth_u32 >> jnp.uint32(32 - DEPTH_BITS)
            key = (tile.astype(jnp.uint32) << jnp.uint32(DEPTH_BITS)) | dbits
            keys = jnp.where(valid, key, INVALID_KEY)
        return PairKeys(sel=sel, sel_visible=sel_visible, keys=keys,
                        tile_u32=tile_u32, depth_u32=depth_u32,
                        two_key=two_key, n_visible=n_visible,
                        overflow_rect=extras["overflow_rect"],
                        overflow_visible=overflow_visible,
                        big_sel=extras.get("big_sel"),
                        big_granted=extras.get("big_granted"),
                        big_rank=extras.get("big_rank"))

    if big_budget <= 0 or rect_cap <= 4 or rect_w < 2 or rect_h < 2:
        # --- single-class emission: slot r -> rect offsets with the STATIC
        # rect_w stride (a dynamic per-gaussian divisor would put a vector
        # integer division on the VPU's critical path); slots past the
        # gaussian's wc×hc live rect are masked invalid instead of packed
        # out — the emitted pair set is identical.
        r = jnp.arange(rect_cap, dtype=jnp.int32)[None, :]        # [1, R]
        dx = r % rect_w
        dy = r // rect_w
        valid = ((dx < wc[:, None]) & (dy < hc[:, None])) & sel_visible[:, None]
        tx = x0c[:, None] + dx
        ty = y0c[:, None] + dy
        tile = ty * grid_x + tx
        if opacities is not None:
            valid = valid & _ellipse_ok(ca, cb, cc, q_cut, xy, tx, ty,
                                        tile_x, tile_y)
        m = nr * rect_cap
        return finish(tile.reshape(m), valid.reshape(m),
                      jnp.broadcast_to(dfull[:, None],
                                       (nr, rect_cap)).reshape(m),
                      {"overflow_rect": overflow_rect})

    # --- two-class emission: every render slot emits a 2×2 center-clamped
    # CORE; up to big_budget slots whose rect exceeds 2×2 also emit the
    # PERIPHERY (their clamped rect minus the core) from a dedicated slot
    # section.  M = 4·NR + (rect_cap−4)·NB instead of NR·rect_cap — the
    # pair stream the sorts/gathers pay for shrinks, with identical valid
    # pairs while the big budget holds.  Bigs beyond the budget render
    # their core only (a graceful rect clamp, counted in overflow_rect).
    nb = min(big_budget, nr)
    peri = rect_cap - 4
    ws = jnp.minimum(w, 2)
    hs = jnp.minimum(h, 2)
    x0s = jnp.clip(cx - 1, x0, jnp.maximum(x0, x1 - ws))
    y0s = jnp.clip(cy - 1, y0, jnp.maximum(y0, y1 - hs))

    rc = jnp.arange(4, dtype=jnp.int32)[None, :]
    cdx = rc % 2
    cdy = rc // 2
    core_valid = ((cdx < ws[:, None]) & (cdy < hs[:, None])
                  & sel_visible[:, None])
    core_tx = x0s[:, None] + cdx
    core_ty = y0s[:, None] + cdy
    core_tile = core_ty * grid_x + core_tx
    if opacities is not None:
        core_valid = core_valid & _ellipse_ok(ca, cb, cc, q_cut, xy,
                                              core_tx, core_ty,
                                              tile_x, tile_y)

    # grant periphery slots to the first nb bigs (stable in slot order)
    is_big = sel_visible & ((w > 2) | (h > 2))
    brank = jnp.cumsum(is_big.astype(jnp.int32)) - 1
    granted = is_big & (brank < nb)
    n_demoted = jnp.sum((is_big & ~granted).astype(jnp.int32))
    bkey = jnp.where(granted, jnp.uint32(0), jnp.uint32(1))
    _, border = jax.lax.sort(
        (bkey, jnp.arange(nr, dtype=jnp.int32)), num_keys=1)
    bsl = border[:nb]                       # render-slot ids of granted bigs
    bgranted = granted[bsl]                 # masks the tail when < nb bigs

    # periphery offsets via the static table indexed by the core's
    # position inside the big rect (core ⊆ big for nested center-clamps)
    ox = (x0s - x0c)[bsl]
    oy = (y0s - y0c)[bsl]
    table = jnp.asarray(_peri_table(rect_w, rect_h))
    # clip guards the non-granted tail of bsl (junk slots may carry
    # garbage rects); granted rows are in range by the nesting argument
    tidx = jnp.clip(oy * (rect_w - 1) + ox, 0, table.shape[0] - 1)
    dxdy = table[tidx]                      # [nb, peri, 2]
    pdx, pdy = dxdy[..., 0], dxdy[..., 1]
    peri_valid = ((pdx < wc[bsl][:, None]) & (pdy < hc[bsl][:, None])
                  & bgranted[:, None])
    peri_tx = x0c[bsl][:, None] + pdx
    peri_ty = y0c[bsl][:, None] + pdy
    peri_tile = peri_ty * grid_x + peri_tx
    if opacities is not None:
        peri_valid = peri_valid & _ellipse_ok(ca[bsl], cb[bsl], cc[bsl],
                                              q_cut[bsl], xy[bsl],
                                              peri_tx, peri_ty,
                                              tile_x, tile_y)

    tile_all = jnp.concatenate([core_tile.reshape(-1),
                                peri_tile.reshape(-1)])
    valid_all = jnp.concatenate([core_valid.reshape(-1),
                                 peri_valid.reshape(-1)])
    d_all = jnp.concatenate([
        jnp.broadcast_to(dfull[:, None], (nr, 4)).reshape(-1),
        jnp.broadcast_to(dfull[bsl][:, None], (nb, peri)).reshape(-1)])
    return finish(tile_all, valid_all, d_all,
                  {"overflow_rect": overflow_rect + n_demoted,
                   "big_sel": sel[bsl], "big_granted": granted,
                   "big_rank": brank})


def sort_pairs(pk: PairKeys, payloads):
    """One stable kv-sort of the pair stream carrying ``payloads`` (a tuple
    of [M] arrays).  Returns (sorted_tile_u32, sorted_payloads)."""
    if pk.two_key:
        out = jax.lax.sort((pk.tile_u32, pk.depth_u32) + tuple(payloads),
                           num_keys=2)
        return out[0], out[2:]
    out = jax.lax.sort((pk.keys,) + tuple(payloads), num_keys=1)
    return out[0] >> jnp.uint32(DEPTH_BITS), out[1:]


def tile_ranges(sorted_tile: jnp.ndarray, n_tiles: int, bp: int):
    """Per-tile [start, end) ranges (== identifyTileRanges,
    rasterizer_impl.cu:116-138) + budget-truncation accounting."""
    tids = jnp.arange(n_tiles + 1, dtype=jnp.uint32)
    starts = jnp.searchsorted(sorted_tile, tids, side="left").astype(jnp.int32)
    total_pairs = starts[-1]
    overflow_pairs = jnp.maximum(total_pairs - bp, 0)
    starts = jnp.minimum(starts, bp)
    return starts, starts[-1], overflow_pairs


def bin_gaussians(proj: ProjectedGaussians, grid_x: int, grid_y: int,
                  max_visible: int, rect_w: int, rect_h: int,
                  tile_x: int = 16, tile_y: int = 16,
                  pair_budget: int = 1 << 62, opacities=None) -> BinnedPairs:
    """Key emission + index-payload sort + tile ranges (the standalone
    binner; the rasterizer's compositing core sorts (key, slot) and
    gathers features itself — see rasterizer.py)."""
    pk = make_pair_keys(proj, grid_x, grid_y, max_visible, rect_w, rect_h,
                        tile_x, tile_y, opacities=opacities)
    rect_cap = rect_w * rect_h
    m = pk.keys.shape[0]
    slot = jnp.arange(m, dtype=jnp.int32)
    sorted_tile, (sorted_slot,) = sort_pairs(pk, (slot,))
    sorted_gid = sorted_slot // rect_cap

    bp = min(m, pair_budget)
    tile_starts, n_pairs, overflow_pairs = tile_ranges(
        sorted_tile, grid_x * grid_y, bp)
    if bp < m:
        sorted_gid = sorted_gid[:bp]

    return BinnedPairs(sel=pk.sel, sel_visible=pk.sel_visible,
                       sorted_gid=sorted_gid, tile_starts=tile_starts,
                       n_pairs=n_pairs, n_visible=pk.n_visible,
                       overflow_rect=pk.overflow_rect,
                       overflow_visible=pk.overflow_visible,
                       overflow_pairs=overflow_pairs)
