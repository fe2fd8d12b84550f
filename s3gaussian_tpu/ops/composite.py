"""Tile compositing: depth-ordered front-to-back alpha blending with a
depth channel — the TPU equivalent of ``renderCUDA``
(``forward.cu:261-379``) and its backward (``backward.cu:416-590``).

Algorithm (chunk-parallel reformulation of the CUDA per-pixel loop):

For each tile, its depth-sorted pair list is processed in chunks of C
Gaussians.  Within a chunk, alpha for all (gaussian, pixel) combinations is
a [C, P] VPU computation; the sequential transmittance recursion
``T *= (1-α)`` becomes an *inclusive cumulative product* along the chunk
axis, so the per-Gaussian compositing weight ``w_k = α_k·T_k`` is data
parallel, and the color/depth accumulation is a matmul on the MXU.

Early-termination semantics are *exactly* the CUDA ones: a contribution is
masked once the running transmittance would fall below 1e-4
(``forward.cu:346-354``), and because T decays monotonically this stateless
mask is equivalent to the CUDA per-pixel ``done`` flag.  The output
``final_T`` is computed as ``1 - Σ w_k`` which telescopes to the product of
``(1-α)`` over *contributing* Gaussians only — bit-matching the CUDA
"frozen" final_T that multiplies the background.

The backward replays chunks in forward order with a uniform 5-channel
formulation (r, g, b, depth, and a ones-channel whose cotangent is
``-d final_T``): for Gaussian k the suffix sum the CUDA backward builds
back-to-front (``accum_rec``) is ``S_k = total − prefix_k``, with the
prefix maintained as a running state plus a within-chunk cumulative sum.
The ones-channel term ``d5·(T_k − S5_k/(1-α_k))`` is algebraically equal to
the CUDA background term ``−T_final/(1−α_k)·(bg·dL)`` (backward.cu:570-575).
Per-pair gradients are reduced over pixels on the MXU, then (outside the
kernel) un-sorted into the dense [NR, rect_cap] layout and summed over the
rect axis — replacing the CUDA backward's atomicAdds.

This module holds the pure-jnp implementation (runs anywhere, and is the
oracle the Pallas kernels in ``tile_kernels.py`` are tested against) and
the packing / unpacking helpers shared with the kernels.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

PAIR_FEAT_DIM = 16
# feature column layout (column 10 is a constant 1.0: the Σw channel)
FX, FY, FCA, FCB, FCC, FOP, FR, FG, FB, FD = range(10)
FONE = 10
N_OUT_ROWS = 8  # 0-2 rgb, 3 depth, 4 final_T, 5 n_contrib, 6-7 pad

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def pack_pool_features(xy: jnp.ndarray, conic: jnp.ndarray,
                       opacity: jnp.ndarray, color: jnp.ndarray,
                       depth: jnp.ndarray) -> jnp.ndarray:
    """Pack per-Gaussian screen quantities into [16, N] feature ROWS.

    Column-major (feature-major) storage keeps the gaussian axis on TPU
    lanes: [N, 16]-shaped arrays pad their 16-wide minor dim to 128 lanes
    (an 8x memory tax on every touch), while [16, N] is dense.  Row FONE is
    the constant ones channel (the Σw/final_T channel); trailing rows pad
    to 16 for clean DMA blocks."""
    n = xy.shape[0]
    zero = jnp.zeros((n,), xy.dtype)
    rows = [xy[:, 0], xy[:, 1], conic[:, 0], conic[:, 1], conic[:, 2],
            opacity.reshape(n), color[:, 0], color[:, 1], color[:, 2],
            depth.reshape(n), jnp.ones((n,), xy.dtype)]
    rows += [zero] * (PAIR_FEAT_DIM - len(rows))
    return jnp.stack(rows, axis=0)


def tile_pixel_coords(grid_x: int, tile_x: int, tile_y: int,
                      tile_index: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel coordinates [1, P] for a tile index (row-major tiles & pixels)."""
    p = tile_x * tile_y
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    ty = tile_index // grid_x
    tx = tile_index % grid_x
    px = (tx * tile_x + lane % tile_x).astype(jnp.float32)
    py = (ty * tile_y + lane // tile_x).astype(jnp.float32)
    return px, py


def _chunk_alpha(feat: jnp.ndarray, valid: jnp.ndarray,
                 px: jnp.ndarray, py: jnp.ndarray):
    """Shared forward alpha math for one chunk.

    feat: [C,16], valid: [C,1] bool, px/py: [1,P].
    Returns (alpha_masked [C,P], G [C,P], opac [C,1], dx, dy).
    """
    dx = feat[:, FX:FX + 1] - px
    dy = feat[:, FY:FY + 1] - py
    ca, cb, cc = feat[:, FCA:FCA + 1], feat[:, FCB:FCB + 1], feat[:, FCC:FCC + 1]
    opac = feat[:, FOP:FOP + 1]
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    G = jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, opac * G)
    am = jnp.where((power > 0) | (alpha < ALPHA_MIN) | (~valid), 0.0, alpha)
    return am, G, opac, dx, dy


def _chunk_forward(feat, valid, px, py, t_in):
    """Composite one chunk. t_in: [1,P] decayed transmittance state.
    Returns (acc5 [5,P] = rgb+depth+Σw, nc [1,P], t_out [1,P])."""
    am, _, _, _, _ = _chunk_alpha(feat, valid, px, py)
    one_m = 1.0 - am
    cum_incl = t_in * jnp.cumprod(one_m, axis=0)
    cum_excl = cum_incl / one_m
    contrib = (cum_incl >= T_EPS) & (am > 0)
    w = jnp.where(contrib, am * cum_excl, 0.0)
    rgbd1 = feat[:, FR:FONE + 1]                                # [C,5]
    acc = jax.lax.dot_general(rgbd1, w, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)  # [5,P]
    nc = jnp.sum(contrib.astype(jnp.float32), axis=0, keepdims=True)
    t_out = cum_incl[-1:, :]
    return acc, nc, t_out


def _chunk_backward(feat, valid, px, py, t_in, prefix_in, totals5, d5):
    """Backward for one chunk, replayed in forward order.

    prefix_in / totals5: [5,P] accumulated (rgb, depth, Σw) before this
    chunk / overall.  d5: [5,P] cotangents — rows 0-3 are the rgbd output
    cotangent, row 4 is ``-d final_T``.
    Returns (pair_grads [C,16], prefix_out, t_out).
    """
    am, G, opac, dx, dy = _chunk_alpha(feat, valid, px, py)
    one_m = 1.0 - am
    cum_incl = t_in * jnp.cumprod(one_m, axis=0)
    cum_excl = cum_incl / one_m
    contrib = (cum_incl >= T_EPS) & (am > 0)
    w = jnp.where(contrib, am * cum_excl, 0.0)

    rgbd1 = feat[:, FR:FONE + 1]                                # [C,5]
    # d color/depth: dL/dc_k,ch = w_k · dL_ch, summed over pixels
    d_colors = jax.lax.dot_general(w, d5, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)  # [C,5]

    # suffix sums S_k,ch = totals - prefix_in - inclusive-cumsum_k(c·w)
    # (the forward-order version of the CUDA accum_rec recursion)
    contrib_ch = w[:, None, :] * rgbd1[:, :, None]              # [C,5,P]
    cums = jnp.cumsum(contrib_ch, axis=0)                       # [C,5,P]
    suffix = (totals5 - prefix_in)[None] - cums                 # [C,5,P]

    inv_one_m = 1.0 / one_m                                     # bounded: ≤ 100
    d_alpha = jnp.sum(
        d5[None] * (rgbd1[:, :, None] * cum_excl[:, None, :]
                    - suffix * inv_one_m[:, None, :]),
        axis=1)                                                 # [C,P]
    d_alpha = jnp.where(contrib, d_alpha, 0.0)

    d_opac = jnp.sum(G * d_alpha, axis=1)                       # [C]
    d_G = opac * d_alpha
    d_power = d_G * G
    ca, cb, cc = feat[:, FCA:FCA + 1], feat[:, FCB:FCB + 1], feat[:, FCC:FCC + 1]
    d_x = jnp.sum(d_power * (-ca * dx - cb * dy), axis=1)
    d_y = jnp.sum(d_power * (-cc * dy - cb * dx), axis=1)
    d_ca = jnp.sum(d_power * (-0.5 * dx * dx), axis=1)
    d_cb = jnp.sum(d_power * (-dx * dy), axis=1)
    d_cc = jnp.sum(d_power * (-0.5 * dy * dy), axis=1)

    c = feat.shape[0]
    grads = jnp.zeros((c, PAIR_FEAT_DIM), feat.dtype)
    grads = grads.at[:, FX].set(d_x).at[:, FY].set(d_y)
    grads = grads.at[:, FCA].set(d_ca).at[:, FCB].set(d_cb).at[:, FCC].set(d_cc)
    grads = grads.at[:, FOP].set(d_opac)
    grads = grads.at[:, FR:FD + 1].set(d_colors[:, 0:4])

    prefix_out = prefix_in + cums[-1]
    t_out = cum_incl[-1:, :]
    return grads, prefix_out, t_out


# ---------------------------------------------------------------------------
# pure-jnp tile loop (oracle & CPU fallback)
# ---------------------------------------------------------------------------

def composite_tiles_jnp(pair_feat: jnp.ndarray, tile_starts: jnp.ndarray,
                        grid_x: int, grid_y: int, tile_x: int, tile_y: int,
                        chunk: int, max_chunks: int) -> jnp.ndarray:
    """Forward compositing, vmapped over tiles.

    pair_feat: [16, M] feature-major sorted pair stream. Returns [T, 8, P].
    """
    p = tile_x * tile_y
    # pad so dynamic_slice never clamps into valid data
    feat_pad = jnp.concatenate(
        [pair_feat, jnp.zeros((PAIR_FEAT_DIM, chunk), pair_feat.dtype)], 1)

    def tile_fn(tile_index, start, count):
        px, py = tile_pixel_coords(grid_x, tile_x, tile_y, tile_index)

        def body(carry, ci):
            acc, nc, t = carry
            offs = start + ci * chunk
            featc = jax.lax.dynamic_slice(feat_pad, (0, offs),
                                          (PAIR_FEAT_DIM, chunk)).T
            idx = ci * chunk + jnp.arange(chunk)
            valid = (idx < count)[:, None]
            a, n, t2 = _chunk_forward(featc, valid, px, py, t)
            return (acc + a, nc + n, t2), None

        init = (jnp.zeros((5, p)), jnp.zeros((1, p)), jnp.ones((1, p)))
        (acc, nc, _), _ = jax.lax.scan(body, init,
                                       jnp.arange(max_chunks, dtype=jnp.int32))
        final_t = 1.0 - acc[4:5]
        zeros = jnp.zeros((2, p))
        return jnp.concatenate([acc[0:4], final_t, nc, zeros], axis=0)  # [8,P]

    n_tiles = grid_x * grid_y
    starts = tile_starts[:-1]
    counts = tile_starts[1:] - tile_starts[:-1]
    return jax.vmap(tile_fn)(jnp.arange(n_tiles, dtype=jnp.int32), starts, counts)


def composite_tiles_bwd_jnp(pair_feat: jnp.ndarray, tile_starts: jnp.ndarray,
                            out_fwd: jnp.ndarray, d_out: jnp.ndarray,
                            grid_x: int, grid_y: int, tile_x: int, tile_y: int,
                            chunk: int, max_chunks: int) -> jnp.ndarray:
    """Manual backward: per-pair gradients [16, M] in sorted-pair order.

    pair_feat: [16, M] feature-major."""
    m = pair_feat.shape[1]
    feat_pad = jnp.concatenate(
        [pair_feat, jnp.zeros((PAIR_FEAT_DIM, chunk), pair_feat.dtype)], 1)

    def tile_fn(tile_index, start, count, out_t, dout_t):
        px, py = tile_pixel_coords(grid_x, tile_x, tile_y, tile_index)
        totals5 = jnp.concatenate([out_t[0:4], 1.0 - out_t[4:5]], axis=0)
        d5 = jnp.concatenate([dout_t[0:4], -dout_t[4:5]], axis=0)

        def body(carry, ci):
            prefix, t = carry
            offs = start + ci * chunk
            featc = jax.lax.dynamic_slice(feat_pad, (0, offs),
                                          (PAIR_FEAT_DIM, chunk)).T
            idx = ci * chunk + jnp.arange(chunk)
            valid = (idx < count)[:, None]
            g, prefix2, t2 = _chunk_backward(featc, valid, px, py, t, prefix,
                                             totals5, d5)
            return (prefix2, t2), g

        p = tile_x * tile_y
        init = (jnp.zeros((5, p)), jnp.ones((1, p)))
        _, grads = jax.lax.scan(body, init,
                                jnp.arange(max_chunks, dtype=jnp.int32))
        return grads  # [max_chunks, C, 16]

    n_tiles = grid_x * grid_y
    starts = tile_starts[:-1]
    counts = tile_starts[1:] - tile_starts[:-1]
    grads = jax.vmap(tile_fn)(jnp.arange(n_tiles, dtype=jnp.int32),
                              starts, counts, out_fwd, d_out)
    # scatter per-tile chunk grads back into the flat [M,16] sorted order
    # (ranges are disjoint; this scatter is test/CPU-path only — the Pallas
    # backward writes ranges directly)
    flat = jnp.zeros((m + chunk, PAIR_FEAT_DIM), pair_feat.dtype)

    def write_tile(flat, args):
        start, g = args

        def write_chunk(flat, args2):
            ci, gc = args2
            prev = jax.lax.dynamic_slice(flat, (start + ci * chunk, 0),
                                         (chunk, PAIR_FEAT_DIM))
            return jax.lax.dynamic_update_slice(
                flat, prev + gc, (start + ci * chunk, 0)), None

        flat, _ = jax.lax.scan(write_chunk, flat,
                               (jnp.arange(grads.shape[1]), g))
        return flat, None

    flat, _ = jax.lax.scan(write_tile, flat, (starts, grads))
    return flat[:m].T


def unpack_tiles(out: jnp.ndarray, height: int, width: int,
                 grid_x: int, grid_y: int, tile_x: int, tile_y: int):
    """[T, 8, P] tile rows -> dict of image-space arrays."""
    img = out.reshape(grid_y, grid_x, N_OUT_ROWS, tile_y, tile_x)
    img = img.transpose(2, 0, 3, 1, 4).reshape(
        N_OUT_ROWS, grid_y * tile_y, grid_x * tile_x)
    img = img[:, :height, :width]
    return {
        "rgb": img[0:3],        # pre-background color
        "depth": img[3],
        "final_T": img[4],
        "n_contrib": img[5],
    }
