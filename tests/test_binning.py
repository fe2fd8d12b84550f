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


def test_quad_min_box_matches_grid_search():
    from s3gaussian_tpu.ops.binning import _quad_min_box
    rng = np.random.default_rng(0)
    for _ in range(50):
        # random PSD conic
        a = rng.uniform(0.01, 2.0)
        c = rng.uniform(0.01, 2.0)
        b = rng.uniform(-1, 1) * np.sqrt(a * c) * 0.95
        bx0 = rng.uniform(-30, 20)
        by0 = rng.uniform(-30, 20)
        bx1, by1 = bx0 + 15, by0 + 15
        got = float(_quad_min_box(jnp.float32(a), jnp.float32(b),
                                  jnp.float32(c), jnp.float32(bx0),
                                  jnp.float32(bx1), jnp.float32(by0),
                                  jnp.float32(by1)))
        xs = np.linspace(bx0, bx1, 121)
        ys = np.linspace(by0, by1, 121)
        X, Y = np.meshgrid(xs, ys)
        want = float((a * X * X + 2 * b * X * Y + c * Y * Y).min())
        # exact min <= grid min; equal when grid hits the minimizer
        assert got <= want + 1e-3
        assert got >= want - 0.35  # grid resolution slack


def test_ellipse_tile_cut_drops_only_zero_contribution_pairs():
    # thin diagonal gaussians: the ellipse cut must drop bbox corners
    sc = random_scene(n=48, seed=7, scale_range=(0.02, 0.6))
    proj = project_scene(sc)
    op = jnp.asarray(sc["opacity"])
    b_box = bin_gaussians(proj, 4, 4, max_visible=128, rect_w=8, rect_h=8,
                          tile_x=16, tile_y=16)
    b_cut = bin_gaussians(proj, 4, 4, max_visible=128, rect_w=8, rect_h=8,
                          tile_x=16, tile_y=16, opacities=op)
    assert int(b_cut.n_pairs) <= int(b_box.n_pairs)
    # every dropped (tile, gaussian) pair has alpha < 1/255 at all pixels
    def pair_set(b):
        starts = np.asarray(b.tile_starts)
        gid = np.asarray(b.sorted_gid)
        sel = np.asarray(b.sel)
        s = set()
        for t in range(16):
            for p in range(starts[t], starts[t + 1]):
                s.add((t, int(sel[gid[p]])))
        return s
    dropped = pair_set(b_box) - pair_set(b_cut)
    xy = np.asarray(proj.xy)
    con = np.asarray(proj.conic)
    opn = np.asarray(op).ravel()
    for (t, i) in dropped:
        tx, ty = t % 4, t // 4
        px, py = np.meshgrid(np.arange(tx * 16, tx * 16 + 16),
                             np.arange(ty * 16, ty * 16 + 16))
        dx = xy[i, 0] - px
        dy = xy[i, 1] - py
        q = con[i, 0] * dx * dx + 2 * con[i, 1] * dx * dy + con[i, 2] * dy * dy
        alpha = opn[i] * np.exp(-0.5 * q)
        assert alpha.max() < 1.0 / 255.0 + 1e-6, (t, i, alpha.max())
