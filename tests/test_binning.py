"""Tile binner invariants."""

import numpy as np
import jax
import jax.numpy as jnp

from s3gaussian_tpu.ops.binning import bin_gaussians, depth_key_bits
from s3gaussian_tpu.ops.project import ProjectedGaussians, build_cov3d, project_gaussians

from scenes import random_scene


def project_scene(sc, w=64, h=64, tile=16):
    cov = build_cov3d(jnp.asarray(sc["scales"]), jnp.asarray(sc["quats"]))
    return project_gaussians(jnp.asarray(sc["means"]), cov,
                             jnp.asarray(sc["view"]), jnp.asarray(sc["proj"]),
                             sc["tanfov"], sc["tanfov"], w, h, tile, tile)


def test_pair_stream_sorted_and_complete():
    sc = random_scene(n=64, seed=0)
    w = h = 64
    tile = 16
    gx = gy = 4
    proj = project_scene(sc, w, h, tile)
    b = bin_gaussians(proj, gx, gy, max_visible=128, rect_w=8, rect_h=8,
                      tile_x=tile, tile_y=tile)

    rect = np.asarray(proj.tiles_rect)
    vis = np.asarray(proj.visible)
    depth = np.asarray(proj.depth)
    # expected pair multiset
    expected = []
    for i in np.nonzero(vis)[0]:
        x0, y0, x1, y1 = rect[i]
        for ty in range(y0, y1):
            for tx in range(x0, x1):
                expected.append((ty * gx + tx, i))
    assert int(b.overflow_rect) == 0
    assert int(b.n_pairs) == len(expected)

    starts = np.asarray(b.tile_starts)
    gid = np.asarray(b.sorted_gid)
    sel = np.asarray(b.sel)
    got = []
    for t in range(gx * gy):
        ids = sel[gid[starts[t]:starts[t + 1]]]
        # front-to-back within tile (by quantized depth key)
        keys = depth_key_bits(jnp.asarray(depth[ids]))
        assert (np.diff(np.asarray(keys)) >= 0).all()
        got += [(t, int(i)) for i in ids]
    assert sorted(got) == sorted(expected)


def test_sorted_gid_consistent_with_tiles():
    sc = random_scene(n=32, seed=1)
    proj = project_scene(sc)
    b = bin_gaussians(proj, 4, 4, max_visible=64, rect_w=4, rect_h=4,
                      tile_x=16, tile_y=16)
    gid = np.asarray(b.sorted_gid)
    n_pairs = int(b.n_pairs)
    # every valid pair references a visible render slot
    vis = np.asarray(b.sel_visible)
    assert vis[gid[:n_pairs]].all()


def test_visible_budget_overflow_reported():
    sc = random_scene(n=64, seed=2)
    proj = project_scene(sc)
    b = bin_gaussians(proj, 4, 4, max_visible=16, rect_w=4, rect_h=4,
                      tile_x=16, tile_y=16)
    n_vis = int(np.asarray(proj.visible).sum())
    assert int(b.overflow_visible) == max(0, n_vis - 16)


def test_rect_clamp_keeps_center():
    sc = random_scene(n=64, seed=3, scale_range=(0.5, 1.0))  # big gaussians
    proj = project_scene(sc)
    b = bin_gaussians(proj, 4, 4, max_visible=128, rect_w=2, rect_h=2,
                      tile_x=16, tile_y=16)
    assert int(b.overflow_rect) > 0  # clamping did occur
    # every visible gaussian still has ≥1 pair, and its center tile is kept
    starts = np.asarray(b.tile_starts)
    gid = np.asarray(b.sorted_gid)
    sel = np.asarray(b.sel)
    xy = np.asarray(proj.xy)
    vis = np.asarray(proj.visible)
    pairs_by_gauss = {}
    for t in range(16):
        for p in range(starts[t], starts[t + 1]):
            pairs_by_gauss.setdefault(int(sel[gid[p]]), []).append(t)
    for i in np.nonzero(vis)[0]:
        assert int(i) in pairs_by_gauss
        cx = min(max(int(xy[i, 0] // 16), 0), 3)
        cy = min(max(int(xy[i, 1] // 16), 0), 3)
        rect = np.asarray(proj.tiles_rect)[i]
        cx = min(max(cx, rect[0]), rect[2] - 1)
        cy = min(max(cy, rect[1]), rect[3] - 1)
        assert cy * 4 + cx in pairs_by_gauss[int(i)]
