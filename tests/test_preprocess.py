"""Preprocessor fidelity: ground-point labeling, 3D-box corner projection,
dynamic-mask geometry, split-list parsing (the pure-numpy parts of the
TFRecord converter — the TF-dependent glue is exercised only where
waymo-open-dataset exists)."""

import numpy as np

from preprocess.boxes import (dynamic_mask_from_boxes, project_vehicle_to_image,
                              upright_box_corners)
from preprocess.lidar_ground import ground_label


def synthetic_sweep(seed=0, n_ground=4000, n_obj=600):
    """Flat ground at z=0 with gaussian noise + elevated structures."""
    rng = np.random.default_rng(seed)
    gx = rng.uniform(-40, 40, n_ground)
    gy = rng.uniform(-40, 40, n_ground)
    gz = rng.normal(0.0, 0.05, n_ground)
    ground = np.stack([gx, gy, gz], 1)
    ox = rng.uniform(-30, 30, n_obj)
    oy = rng.uniform(-30, 30, n_obj)
    oz = rng.uniform(1.0, 4.0, n_obj)
    objects = np.stack([ox, oy, oz], 1)
    pts = np.concatenate([ground, objects], 0)
    labels = np.concatenate([np.ones(n_ground, bool), np.zeros(n_obj, bool)])
    return pts, labels


def test_ground_label_flat_scene():
    pts, want = synthetic_sweep()
    got = ground_label(pts)
    # plane fit should nail the flat ground and exclude elevated points
    assert (got & ~want).sum() == 0          # no object labeled ground
    assert (got & want).mean() > 0.98 * want.mean()  # nearly all ground found


def test_ground_label_tilted_plane():
    pts, want = synthetic_sweep(seed=1)
    # tilt the whole scene 5 degrees about y — the plane fit must follow
    a = np.deg2rad(5)
    rot = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                    [-np.sin(a), 0, np.cos(a)]])
    got = ground_label(pts @ rot.T)
    assert (got & ~want).sum() == 0
    assert got[want].mean() > 0.95


def test_ground_label_tiny_input():
    assert ground_label(np.zeros((3, 3))).sum() == 0


def test_upright_box_corners_axis_aligned():
    c = upright_box_corners(np.array([10.0, 2.0, 1.0]),
                            np.array([4.0, 2.0, 1.5]), 0.0)
    assert c.shape == (8, 3)
    np.testing.assert_allclose(c[:, 0].min(), 8.0)
    np.testing.assert_allclose(c[:, 0].max(), 12.0)
    np.testing.assert_allclose(c[:, 1].min(), 1.0)
    np.testing.assert_allclose(c[:, 1].max(), 3.0)
    np.testing.assert_allclose(c[:, 2].min(), 0.25)
    np.testing.assert_allclose(c[:, 2].max(), 1.75)


def test_upright_box_corners_heading_rotation():
    # 90 degree heading swaps length/width in the xy footprint
    c = upright_box_corners(np.zeros(3), np.array([4.0, 2.0, 1.0]),
                            np.pi / 2)
    np.testing.assert_allclose(c[:, 0].max() - c[:, 0].min(), 2.0, atol=1e-6)
    np.testing.assert_allclose(c[:, 1].max() - c[:, 1].min(), 4.0, atol=1e-6)


def front_cam_calib(w=200, h=100, f=100.0):
    """Identity cam->ego: camera at origin looking down vehicle +x."""
    c2e = np.eye(4)
    intr = [f, f, w / 2, h / 2, 0, 0, 0, 0, 0]
    return c2e, intr, w, h


def test_project_vehicle_pinhole_center():
    c2e, intr, w, h = front_cam_calib()
    # a point straight ahead projects to the principal point
    uvok = project_vehicle_to_image(np.array([[10.0, 0.0, 0.0]]),
                                    c2e, intr, w, h)
    np.testing.assert_allclose(uvok[0, :2], [w / 2, h / 2], atol=1e-6)
    assert uvok[0, 2] == 1.0
    # y-left maps to smaller u, z-up maps to smaller v
    uv_left = project_vehicle_to_image(np.array([[10.0, 1.0, 0.0]]),
                                       c2e, intr, w, h)[0]
    uv_up = project_vehicle_to_image(np.array([[10.0, 0.0, 1.0]]),
                                     c2e, intr, w, h)[0]
    assert uv_left[0] < w / 2
    assert uv_up[1] < h / 2


def test_project_behind_camera_not_ok():
    c2e, intr, w, h = front_cam_calib()
    uvok = project_vehicle_to_image(np.array([[-5.0, 0.0, 0.0]]),
                                    c2e, intr, w, h)
    assert uvok[0, 2] == 0.0


def test_dynamic_mask_geometry_and_speed_threshold():
    c2e, intr, w, h = front_cam_calib()
    fast = {"center": [20.0, 0.0, 0.0], "lwh": [4.0, 2.0, 2.0],
            "heading": 0.0, "speed": 5.0}
    slow = {"center": [20.0, -6.0, 0.0], "lwh": [4.0, 2.0, 2.0],
            "heading": 0.0, "speed": 0.5}
    mask = dynamic_mask_from_boxes([fast, slow], c2e, intr, w, h)
    assert mask.dtype == np.uint8 and mask.shape == (h, w)
    # fast box: x in [18,22], y in [-1,1], z in [-1,1] ->
    # u = 100 - 100*y/x in [~94.5, ~105.5], v symmetric about 50
    assert mask[50, 100] == 255
    ys, xs = np.nonzero(mask)
    assert xs.min() >= 93 and xs.max() <= 106   # near-corner bounds
    assert ys.min() >= 44 and ys.max() <= 56
    # slow box region (u ~ 125..135) stays empty
    assert mask[:, 115:].sum() == 0


def test_dynamic_mask_skips_partially_visible():
    c2e, intr, w, h = front_cam_calib()
    # one corner behind the camera -> strict skip (reference behavior)
    box = {"center": [1.0, 0.0, 0.0], "lwh": [4.0, 2.0, 2.0],
           "heading": 0.0, "speed": 5.0}
    mask = dynamic_mask_from_boxes([box], c2e, intr, w, h)
    assert mask.sum() == 0


def test_split_file_parsing():
    from preprocess.download_waymo import read_split_scene_ids
    ids = read_split_scene_ids("data/waymo_splits/dynamic32.txt")
    assert len(ids) == 32 and ids[0] == 16
    ids = read_split_scene_ids("data/waymo_splits/static32.txt")
    assert len(ids) == 32
    ids = read_split_scene_ids("data/waymo_splits/diverse56.txt")
    assert len(ids) == 56
