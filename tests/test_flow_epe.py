"""Flow end-point-error machinery (eval/flow.py): exact values on
hand-made flows, and the wiring through a real (untrained) deformation
field on a 2-object toy clip — an untrained field has near-zero flow, so
its dynamic EPE must sit at the ground-truth motion magnitude while its
static EPE sits near zero (the determinate no-training expectations)."""

import numpy as np

from s3gaussian_tpu.eval.flow import (deformation_flow_epe, flow_epe,
                                      gt_flow_from_boxes)

BOXES = [
    {"center0": [10.0, 0.0, 1.0], "vel": [2.0, 0.0, 0.0],
     "half": [1.0, 1.0, 1.0]},
    {"center0": [0.0, 5.0, 1.0], "vel": [0.0, -1.0, 0.0],
     "half": [1.0, 1.0, 1.0]},
]


def test_gt_flow_box_membership_translates_with_time():
    # at t=0 the first box covers x in [9, 11]
    pos = np.array([[10.0, 0.0, 1.0], [13.9, 0.0, 1.0], [0.0, 0.0, 0.0]])
    f0 = gt_flow_from_boxes(pos, BOXES, t_frame=0.0, dt_frames=1.0)
    np.testing.assert_allclose(f0, [[2, 0, 0], [0, 0, 0], [0, 0, 0]])
    # at t=2 the box has moved to x in [13, 15] — membership follows
    f2 = gt_flow_from_boxes(pos, BOXES, t_frame=2.0, dt_frames=3.0)
    np.testing.assert_allclose(f2, [[0, 0, 0], [6, 0, 0], [0, 0, 0]])


def test_flow_epe_exact_values():
    xyz = np.array([[10.0, 0.0, 1.0],     # inside box 1
                    [0.0, 5.0, 1.0],      # inside box 2
                    [50.0, 0.0, 0.0]])    # static
    dx_t = np.zeros((3, 3), np.float32)
    dx_t2 = np.array([[2.0, 0.0, 0.0],    # perfect flow
                      [0.0, 0.0, 0.0],    # missed the motion entirely
                      [0.5, 0.0, 0.0]])   # spurious static motion
    res = flow_epe(xyz, dx_t, dx_t2, BOXES, t_frame=0.0, dt_frames=1.0)
    assert res["n_dynamic"] == 2 and res["n_static"] == 1
    # errors: 0 (perfect) and 1 (gt |[0,-1,0]|) -> mean 0.5
    np.testing.assert_allclose(res["epe_dynamic"], 0.5)
    np.testing.assert_allclose(res["epe_static"], 0.5)
    np.testing.assert_allclose(res["gt_motion_mean"], 1.5)  # (2 + 1)/2
    np.testing.assert_allclose(res["flow_recall"], 0.5)     # 1 of 2 moved


def test_flow_epe_alive_mask_excludes_dead_rows():
    xyz = np.array([[10.0, 0.0, 1.0], [10.0, 0.0, 1.0]])
    dx = np.zeros((2, 3), np.float32)
    res = flow_epe(xyz, dx, dx, BOXES, 0.0, 1.0,
                   alive=np.array([True, False]))
    assert res["n_dynamic"] == 1


def test_untrained_deformation_field_epe_equals_gt_motion():
    import jax
    from s3gaussian_tpu.config import ModelHiddenParams
    from s3gaussian_tpu.models.deformation import init_deformation
    from s3gaussian_tpu.models.pool import create_from_pcd

    rng = np.random.default_rng(0)
    # two moving clusters + static background
    stat = rng.uniform([-20, -20, 0], [20, 20, 5], (300, 3))
    car1 = rng.uniform(-0.8, 0.8, (100, 3)) + [10.0, 0.0, 1.0]
    car2 = rng.uniform(-0.8, 0.8, (100, 3)) + [0.0, 5.0, 1.0]
    pts = np.concatenate([stat, car1, car2]).astype(np.float32)
    pool = create_from_pcd(pts, np.full((500, 3), 0.5, np.float32), 512)

    hp = ModelHiddenParams(
        net_width=16,
        kplanes_config={"grid_dimensions": 2, "input_coordinate_dim": 4,
                        "output_coordinate_dim": 8,
                        "resolution": [8, 8, 8, 4]},
        multires=[1, 2])
    deform = init_deformation(jax.random.PRNGKey(0), hp)
    aabb = np.array([[25.0, 25.0, 8.0], [-25.0, -25.0, -2.0]], np.float32)

    # probe frame 0 only: box membership follows the DEFORMED positions,
    # and an untrained field leaves every gaussian at its t=0 position —
    # by frame 3 the GT boxes have translated away from them
    res = deformation_flow_epe(pool, deform, hp, aabb,
                               {"boxes": BOXES}, n_frames=8,
                               offsets=(1, 3), probe_frames=[0])
    assert set(res) == {"t0_off1", "t0_off3"}
    for key, r in res.items():
        assert r["n_dynamic"] > 50, key
        # untrained flow ~ 0: dynamic EPE ≈ the GT motion magnitude,
        # static EPE ≈ 0
        assert abs(r["epe_dynamic"] - r["gt_motion_mean"]) < 0.35 * \
            r["gt_motion_mean"], (key, r)
        assert r["epe_static"] < 0.5, (key, r)
