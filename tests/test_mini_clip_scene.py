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

from mini_clip import gt_scene


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
