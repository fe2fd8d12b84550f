"""Generator-side invariants of the synthetic mini clip (scripts/mini_clip).

Pure numpy — no rendering. Pins the --density contract the opacity-reset
stability scenario depends on (BASELINE.md): counts scale linearly,
splat σ scales 1/√density (coverage-preserving), and the GT motion boxes
stay aligned with the moving clusters.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from mini_clip import gt_scene, train_args


def _argv_dict(argv):
    d, i = {}, 0
    while i < len(argv):
        if argv[i].startswith("-") and i + 1 < len(argv) \
                and not argv[i + 1].startswith("-"):
            d[argv[i]] = argv[i + 1]
            i += 2
        else:
            d[argv[i]] = True
            i += 1
    return d


def test_train_args_density_scaled_budgets():
    """Density-1 budgets are pinned to the historical values; density 4
    (the opacity-reset stability scenario) scales pool/visible/pair
    budgets and turns on deformation remat, with no manual overrides."""
    from types import SimpleNamespace
    base = dict(out="/tmp/x", coarse=300, fine=5000, stride=0,
                reset_interval=3000, h=640, w=960)
    d1 = _argv_dict(train_args(SimpleNamespace(density=1.0, **base), "/m"))
    assert d1["--num_pts"] == "120000"
    assert d1["--max_points"] == "500000"
    assert d1["--max_visible"] == str(1 << 17)
    assert d1["--pair_budget"] == str(1 << 22)
    assert "--remat_deform" not in d1

    d4 = _argv_dict(train_args(SimpleNamespace(density=4.0, **base), "/m"))
    assert d4["--num_pts"] == "480000"
    # pool cap gives ~2x densify headroom over the init count but stays
    # under the measured single-chip HBM feasibility point (1.5M)
    assert 480000 < int(d4["--max_points"]) == 1_000_000 < 1_500_000
    assert int(d4["--max_visible"]) == 4 * (1 << 17)
    assert int(d4["--pair_budget"]) == 1 << 23   # capped
    assert d4["--remat_deform"] is True
    # densify window and reset cadence pass through unchanged
    assert d4["--opacity_reset_interval"] == "3000"
    assert d4["--densify_until_iter"] == "4700"


def test_density_scales_counts_and_shrinks_splats():
    r1 = gt_scene(np.random.default_rng(0), density=1.0)
    r4 = gt_scene(np.random.default_rng(0), density=4.0)
    assert len(r4["pts"]) == 4 * len(r1["pts"])
    # coverage-preserving: total splat area n·σ² is invariant
    a1 = float(np.sum(r1["scales"][:, 0] ** 2))
    a4 = float(np.sum(r4["scales"][:, 0] ** 2))
    assert abs(a4 / a1 - 1.0) < 0.05
    # σ itself halves
    assert np.allclose(r4["scales"].max(), r1["scales"].max() / 2, rtol=1e-6)


def test_car_knobs_default_identity_and_scaling():
    """--car_mul/--car_speed/--car_size (the flow-transport probe knobs)
    are bit-identical no-ops at 1.0, and scale count/velocity/extent with
    GT boxes tracking the scaled clusters."""
    base = gt_scene(np.random.default_rng(3))
    same = gt_scene(np.random.default_rng(3),
                    car_mul=1.0, car_speed=1.0, car_size=1.0)
    assert np.array_equal(base["pts"], same["pts"])
    assert np.array_equal(base["vel"], same["vel"])
    assert base["gt_boxes"] == same["gt_boxes"]

    probe = gt_scene(np.random.default_rng(3),
                     car_mul=4.0, car_speed=0.1, car_size=2.5)
    moving_b = np.abs(base["vel"]).sum(1) > 0
    moving_p = np.abs(probe["vel"]).sum(1) > 0
    assert moving_p.sum() == 4 * moving_b.sum()
    assert np.isclose(np.abs(probe["vel"][:, 0]).max(),
                      0.1 * np.abs(base["vel"][:, 0]).max())
    # car splats grow with car_size (ground/build stay at 0.16)
    assert np.isclose(float(probe["scales"].max()), 0.12 * 2.5)
    # boxes cover the scaled clusters and carry the scaled velocity
    pts = probe["pts"][moving_p]
    vels = probe["vel"][moving_p]
    covered = np.zeros(len(pts), bool)
    for b in probe["gt_boxes"]:
        c = np.asarray(b["center0"])
        h = np.asarray(b["half"])
        inside = np.all(np.abs(pts - c) <= h + 1e-6, axis=1)
        covered |= inside
        if inside.any():
            assert np.allclose(vels[inside][:, :2],
                               np.asarray(b["vel"])[:2], atol=1e-6)
    assert covered.all()


def test_gt_boxes_cover_moving_points_at_any_density():
    for d in (1.0, 2.0):
        sc = gt_scene(np.random.default_rng(1), density=d)
        moving = np.abs(sc["vel"]).sum(1) > 0
        pts = sc["pts"][moving]
        vels = sc["vel"][moving]
        covered = np.zeros(len(pts), bool)
        for b in sc["gt_boxes"]:
            c = np.asarray(b["center0"])
            h = np.asarray(b["half"])
            inside = np.all(np.abs(pts - c) <= h + 1e-6, axis=1)
            covered |= inside
            # box velocity matches its members' velocity
            if inside.any():
                assert np.allclose(vels[inside][:, :2],
                                   np.asarray(b["vel"])[:2], atol=1e-6)
        assert covered.all()
