"""Pallas TPU kernels for tile compositing.

TPU counterparts of ``renderCUDA`` forward (``forward.cu:261-379``) and
backward (``backward.cu:416-590``).  The math matches the jnp oracle in
``ops/composite.py`` (same masking / final_T = 1-Σw semantics, which are
exactly the CUDA early-termination semantics); the kernels add:

  * one grid step per tile, with the tile's [start, end) range of the
    depth-sorted pair stream scalar-prefetched from SMEM (the analog of
    the CUDA ``ranges`` array);
  * the pair stream lives in HBM as [NB, 16, 128] blocks — 16 feature rows
    by 128 pairs on the lane axis — because TPU DMA requires 128-aligned
    lane slices; tiles iterate the block range covering [start, end) and
    mask pairs outside it (≤1 wasted block per tile boundary);
  * double-buffered async DMA of blocks while the VPU composites the
    previous one (the analog of the CUDA collaborative shared-memory
    fetch, forward.cu:296-325);
  * a while-loop with whole-tile early exit once every pixel's (decayed)
    transmittance drops below 1e-4 (the analog of the per-block
    ``__syncthreads_count(done)`` vote, forward.cu:312-314);
  * cumulative products along the 128-pair lane axis via a triangular
    [128,128] MXU contraction (Mosaic has no cumsum lowering);
  * the backward read-modify-writes per-block gradient tiles in HBM —
    boundary blocks are shared by two consecutive tiles, and the grid is
    declared sequential ("arbitrary") so the accumulation is race-free —
    replacing the CUDA atomicAdds.

Pixels sit on the sublane axis ([P, 128] alpha arrays) and pairs on the
lane axis; color/gradient accumulation contracts the pair axis on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from s3gaussian_tpu.ops.composite import (ALPHA_MAX, ALPHA_MIN,
                                          N_OUT_ROWS, PAIR_FEAT_DIM, T_EPS,
                                          FX, FY, FCA, FCB, FCC, FOP, FR,
                                          FD, FONE)

BLK = 128  # minimum stream block; chunk must be a positive multiple


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _blk(chunk: int) -> int:
    """Kernel block size: the caller's chunk rounded to a lane multiple.
    Bigger blocks amortize the while-loop and DMA-issue overhead per tile;
    smaller ones give finer early-exit granularity."""
    return max(BLK, (chunk // BLK) * BLK)


def _pixel_cols(tile_index, grid_x: int, tile_x: int, tile_y: int):
    """Pixel coordinates as [P, 1] columns for a tile index."""
    p = tile_x * tile_y
    row = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    ty = tile_index // grid_x
    tx = tile_index % grid_x
    px = (tx * tile_x + row % tile_x).astype(jnp.float32)
    py = (ty * tile_y + row // tile_x).astype(jnp.float32)
    return px, py


def _tri_incl(c: int):
    """[C,C] upper-triangular ones (incl. diagonal): x[P,C] @ tri gives the
    inclusive prefix along lanes. Mosaic has no cumsum lowering; one MXU
    contraction per chunk is effectively free at C=128."""
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    return (row <= col).astype(jnp.float32)


def _cumsum_lane(x):
    """Inclusive lane prefix via 128-wide triangular MXU contractions.

    Blocked so the tri-matmul work stays LINEAR in the chunk width (a
    single [C,C] triangle is quadratic: chunk 256 would double the MXU
    cost per pair); cross-block carries are rank-1 broadcast adds.
    (Mosaic supports only DEFAULT and HIGHEST dot precisions; DEFAULT's
    single bf16 pass is too lossy for the log-space transmittance sums,
    so the contractions stay HIGHEST.)"""
    c = x.shape[1]
    prec = jax.lax.Precision.HIGHEST
    if c <= BLK:
        return jax.lax.dot_general(x, _tri_incl(c), (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=prec)
    tri = _tri_incl(BLK)
    parts = []
    carry = None
    for s in range(0, c, BLK):
        blk_c = jax.lax.dot_general(
            x[:, s:s + BLK], tri, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        if carry is not None:
            blk_c = blk_c + carry
        carry = blk_c[:, BLK - 1:BLK]
        parts.append(blk_c)
    return jnp.concatenate(parts, axis=1)


def _cumprod_lane(x):
    """x ∈ (0, 1]; masked alphas give exactly 1.0, so log is finite."""
    return jnp.exp(_cumsum_lane(jnp.log(x)))


def _block_alpha(feat, valid, px, py):
    """Alpha math for one block. feat: [16, C] feature rows; valid [1, C];
    px/py [P, 1]. Returns [P, C] arrays (+ [1, C] rows)."""
    dx = feat[FX:FX + 1, :] - px        # [P,C] via broadcast
    dy = feat[FY:FY + 1, :] - py
    ca, cb, cc = feat[FCA:FCA + 1, :], feat[FCB:FCB + 1, :], feat[FCC:FCC + 1, :]
    opac = feat[FOP:FOP + 1, :]
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    G = jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, opac * G)
    am = jnp.where((power > 0) | (alpha < ALPHA_MIN) | (~valid), 0.0, alpha)
    return am, G, opac, dx, dy, ca, cb, cc


def pad_stream(pair_feat: jnp.ndarray, blk: int = BLK) -> jnp.ndarray:
    """[16, M] feature-major stream -> [16, M_pad] with M_pad a blk multiple
    (feature-major storage means block DMA slices are 128-lane aligned)."""
    m = pair_feat.shape[1]
    m_pad = -(-m // blk) * blk
    return jnp.concatenate(
        [pair_feat,
         jnp.zeros((PAIR_FEAT_DIM, m_pad - m), pair_feat.dtype)], 1)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(tile_starts, feat_hbm, out_ref, chunkbuf, sems,
                *, grid_x: int, tile_x: int, tile_y: int, blk: int):
    t = pl.program_id(0)
    start = tile_starts[t]
    end = tile_starts[t + 1]
    b0 = start // blk
    b1 = pl.cdiv(end, blk)
    px, py = _pixel_cols(t, grid_x, tile_x, tile_y)
    p = tile_x * tile_y

    def dma(slot, b):
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(b * blk, blk)],
            chunkbuf.at[slot], sems.at[slot])

    @pl.when(b1 > b0)
    def _():
        dma(0, b0).start()

    def cond(state):
        b, t_col, _, _ = state
        return (b < b1) & (jnp.max(t_col) >= T_EPS)

    def body(state):
        b, t_col, acc, nc = state
        slot = (b - b0) % 2

        @pl.when(b + 1 < b1)
        def _():
            dma((slot + 1) % 2, b + 1).start()

        dma(slot, b).wait()
        feat = chunkbuf[slot, :, :]                # [16, C]
        gidx = jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1) + b * blk
        valid = (gidx >= start) & (gidx < end)
        am, _, _, _, _, _, _, _ = _block_alpha(feat, valid, px, py)
        one_m = 1.0 - am                           # [P,C]
        cum_incl = t_col * _cumprod_lane(one_m)
        cum_excl = cum_incl / one_m
        contrib = (cum_incl >= T_EPS) & (am > 0)
        w = jnp.where(contrib, am * cum_excl, 0.0)  # [P,C]
        rgbd1 = feat[FR:FONE + 1, :]                # [5,C]
        acc = acc + jax.lax.dot_general(
            rgbd1, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)     # [5,P]
        ones_row = jnp.ones((1, blk), jnp.float32)
        nc = nc + jax.lax.dot_general(
            ones_row, contrib.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)     # [1,P]
        t_col = cum_incl[:, blk - 1:blk]
        return b + 1, t_col, acc, nc

    init = (b0, jnp.ones((p, 1), jnp.float32), jnp.zeros((5, p), jnp.float32),
            jnp.zeros((1, p), jnp.float32))
    b_final, _, acc, nc = jax.lax.while_loop(cond, body, init)

    # drain the prefetched-but-unconsumed DMA after an early exit
    @pl.when(b_final < b1)
    def _():
        dma((b_final - b0) % 2, b_final).wait()

    out_ref[0, 0:4, :] = acc[0:4, :]
    out_ref[0, 4:5, :] = 1.0 - acc[4:5, :]
    out_ref[0, 5:6, :] = nc
    out_ref[0, 6:8, :] = jnp.zeros((2, p), jnp.float32)


def composite_fwd_pallas(pair_feat: jnp.ndarray, tile_starts: jnp.ndarray,
                         grid_x: int, grid_y: int, tile_x: int, tile_y: int,
                         chunk: int = BLK) -> jnp.ndarray:
    """pair_feat [16, M] (feature-major sorted pair stream),
    tile_starts [T+1] -> [T,8,P]."""
    blk = _blk(chunk)
    n_tiles = grid_x * grid_y
    p = tile_x * tile_y
    blocks = pad_stream(pair_feat, blk)

    kernel = functools.partial(_fwd_kernel, grid_x=grid_x,
                               tile_x=tile_x, tile_y=tile_y, blk=blk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, N_OUT_ROWS, p), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, PAIR_FEAT_DIM, blk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, N_OUT_ROWS, p), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(tile_starts, blocks)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(tile_starts, feat_hbm, outt_ref, doutt_ref, ginit_hbm,
                grads_hbm, gbuf, gprev, chunkbuf, sems, wsem, rsem,
                *, grid_x: int, tile_x: int, tile_y: int, blk: int):
    """gprev is [2, 16, blk]: slot 0 holds the tile's FIRST boundary block,
    slot 1 its LAST — both reads are issued at tile start so their HBM
    latency overlaps the whole tile's compute instead of stalling the
    boundary iterations (the previous tile's writes are already drained
    before this kernel instance runs, so the reads are race-free)."""
    del ginit_hbm  # aliased to grads_hbm; zero-initialized by the caller
    t = pl.program_id(0)
    start = tile_starts[t]
    end = tile_starts[t + 1]
    b0 = start // blk
    b1 = pl.cdiv(end, blk)
    px, py = _pixel_cols(t, grid_x, tile_x, tile_y)
    p = tile_x * tile_y

    # transposed [P, 8] views of forward outputs / cotangents
    totals5 = jnp.concatenate(
        [outt_ref[0, :, 0:4], 1.0 - outt_ref[0, :, 4:5]], axis=1)   # [P,5]
    d5 = jnp.concatenate(
        [doutt_ref[0, :, 0:4], -doutt_ref[0, :, 4:5]], axis=1)      # [P,5]
    # d5 is constant per tile, so the channel contraction commutes with the
    # running prefix sums: the 5 per-channel suffix states collapse to ONE
    # scalar-per-pixel state E = Σ_ch d5_ch·(·), and the per-block work
    # needs a single cumsum of w·e (e = d5·c) instead of five.
    e_total = jnp.sum(d5 * totals5, axis=1, keepdims=True)          # [P,1]

    def dma_in(slot, b):
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(b * blk, blk)],
            chunkbuf.at[slot], sems.at[slot])

    def rdma(slot, b):
        return pltpu.make_async_copy(
            grads_hbm.at[:, pl.ds(b * blk, blk)], gprev.at[slot],
            rsem.at[slot])

    @pl.when(b1 > b0)
    def _():
        dma_in(0, b0).start()
        rdma(0, b0).start()

    @pl.when(b1 - 1 > b0)
    def _():
        rdma(1, b1 - 1).start()

    def wdma(slot, b):
        return pltpu.make_async_copy(
            gbuf.at[slot], grads_hbm.at[:, pl.ds(b * blk, blk)], wsem.at[slot])

    def body(state):
        b, t_col, prefix = state
        slot = (b - b0) % 2

        @pl.when(b + 1 < b1)
        def _():
            dma_in((slot + 1) % 2, b + 1).start()

        dma_in(slot, b).wait()
        feat = chunkbuf[slot, :, :]                 # [16,C]
        gidx = jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1) + b * blk
        valid = (gidx >= start) & (gidx < end)
        am, G, opac, dx, dy, ca, cb, cc = _block_alpha(feat, valid, px, py)
        one_m = 1.0 - am
        cum_incl = t_col * _cumprod_lane(one_m)
        cum_excl = cum_incl / one_m
        contrib = (cum_incl >= T_EPS) & (am > 0)
        w = jnp.where(contrib, am * cum_excl, 0.0)  # [P,C]

        # dL/dc per channel: [5, C] = d5^T-contracted-with-w over pixels
        d_colors = jax.lax.dot_general(
            d5, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)     # [5,C]

        inv_one_m = 1.0 / one_m
        # e_k = Σ_ch d5_ch·c_ch,k  (the ones channel rides along in rgbd1)
        rgbd1 = feat[FR:FONE + 1, :]                         # [5,C]
        e = jax.lax.dot_general(
            d5, rgbd1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)             # [P,C]
        cums_we = _cumsum_lane(w * e)                        # [P,C]
        suffix_e = (e_total - prefix) - cums_we
        d_alpha = e * cum_excl - suffix_e * inv_one_m
        d_alpha = jnp.where(contrib, d_alpha, 0.0)
        prefix = prefix + cums_we[:, blk - 1:blk]

        d_G = opac * d_alpha
        d_power = d_G * G
        ones_p = jnp.ones((1, p), jnp.float32)

        def psum(x):  # [P,C] -> [1,C] pixel reduction on the MXU
            return jax.lax.dot_general(ones_p, x, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)

        # write double-buffering: before reusing this gbuf slot, drain the
        # write issued from it two blocks ago (the write itself is NOT
        # waited on below — it overlaps the next block's compute)
        @pl.when(b - b0 >= 2)
        def _():
            wdma(slot, b - 2).wait()

        gbuf[slot, :, :] = jnp.zeros((PAIR_FEAT_DIM, blk), jnp.float32)
        gbuf[slot, FX:FX + 1, :] = psum(d_power * (-ca * dx - cb * dy))
        gbuf[slot, FY:FY + 1, :] = psum(d_power * (-cc * dy - cb * dx))
        gbuf[slot, FCA:FCA + 1, :] = psum(d_power * (-0.5 * dx * dx))
        gbuf[slot, FCB:FCB + 1, :] = psum(d_power * (-dx * dy))
        gbuf[slot, FCC:FCC + 1, :] = psum(d_power * (-0.5 * dy * dy))
        gbuf[slot, FOP:FOP + 1, :] = psum(G * d_alpha)
        gbuf[slot, FR:FD + 1, :] = d_colors[0:4, :]

        # Only a tile's first/last blocks can be shared with the previous/
        # next tile; interior blocks are exclusively owned and skip the
        # read-modify-write (grid is sequential AND each tile drains its
        # outstanding writes before returning, so boundary RMW is
        # race-free).  The boundary reads were issued at tile start; only
        # the wait lands here.
        @pl.when(b == b0)
        def _():
            rdma(0, b0).wait()
            gbuf[slot, :, :] = gbuf[slot, :, :] + gprev[0, :, :]

        @pl.when((b == b1 - 1) & (b > b0))
        def _():
            rdma(1, b).wait()
            gbuf[slot, :, :] = gbuf[slot, :, :] + gprev[1, :, :]

        wdma(slot, b).start()

        t_col = cum_incl[:, blk - 1:blk]
        return b + 1, t_col, prefix

    def cond(state):
        b, t_col, _ = state
        return (b < b1) & (jnp.max(t_col) >= T_EPS)

    init = (b0, jnp.ones((p, 1), jnp.float32), jnp.zeros((p, 1), jnp.float32))
    b_final, _, _ = jax.lax.while_loop(cond, body, init)

    # drain the prefetched-but-unconsumed DMAs after an early exit: the
    # next input block and the last-boundary-block RMW read
    @pl.when(b_final < b1)
    def _():
        dma_in((b_final - b0) % 2, b_final).wait()

    @pl.when((b_final < b1) & (b1 - 1 > b0))
    def _():
        rdma(1, b1 - 1).wait()

    # drain the (up to two) outstanding gradient writes before the next
    # tile — its first block may alias this tile's last block in HBM
    @pl.when(b_final - b0 >= 1)
    def _():
        wdma((b_final - 1 - b0) % 2, b_final - 1).wait()

    @pl.when(b_final - b0 >= 2)
    def _():
        wdma((b_final - 2 - b0) % 2, b_final - 2).wait()


def composite_bwd_pallas(pair_feat: jnp.ndarray, tile_starts: jnp.ndarray,
                         out_fwd: jnp.ndarray, dout: jnp.ndarray,
                         grid_x: int, grid_y: int, tile_x: int, tile_y: int,
                         chunk: int = BLK) -> jnp.ndarray:
    """Per-pair gradients [16, M] in sorted-pair order (feature-major).

    Early-exited blocks have exactly-zero gradients and are simply never
    accumulated into (the output starts from donated zeros).  Lanes past
    the global valid range are masked by the caller.
    """
    blk = _blk(chunk)
    n_tiles = grid_x * grid_y
    p = tile_x * tile_y
    m = pair_feat.shape[1]
    blocks = pad_stream(pair_feat, blk)
    m_pad = blocks.shape[1]
    out_t = out_fwd.transpose(0, 2, 1)   # [T, P, 8]
    dout_t = dout.transpose(0, 2, 1)
    grads_init = jnp.zeros((PAIR_FEAT_DIM, m_pad), jnp.float32)

    kernel = functools.partial(_bwd_kernel, grid_x=grid_x,
                               tile_x=tile_x, tile_y=tile_y, blk=blk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                 # pair blocks
            pl.BlockSpec((1, p, N_OUT_ROWS), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),             # fwd out^T
            pl.BlockSpec((1, p, N_OUT_ROWS), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),             # dout^T
            pl.BlockSpec(memory_space=pl.ANY),                 # grads init
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, PAIR_FEAT_DIM, blk), jnp.float32),  # grad buf x2
            pltpu.VMEM((2, PAIR_FEAT_DIM, blk), jnp.float32),  # rmw bufs
            pltpu.VMEM((2, PAIR_FEAT_DIM, blk), jnp.float32),  # chunk buf
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),                     # write sems
            pltpu.SemaphoreType.DMA((2,)),                     # rmw read sems
        ],
    )
    grads = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((PAIR_FEAT_DIM, m_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), has_side_effects=True),
        input_output_aliases={4: 0},
        interpret=_interpret(),
    )(tile_starts, blocks, out_t, dout_t, grads_init)
    return grads[:, :m]
