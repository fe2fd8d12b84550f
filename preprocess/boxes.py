"""3D box corners + camera projection for dynamic-mask export (pure numpy).

Parity targets in ``/root/reference/waymo_preprocess.py``:
  * ``save_dynamic_mask`` (:1122-1219) — laser labels with speed > 1 m/s,
    upright 3D box corners projected into each camera, axis-aligned hull
    rasterized into a uint8 mask (speed max-pooled, thresholded at 1 m/s);
  * ``project_vehicle_to_image`` (:339-378) — the reference routes through
    the TF ``py_camera_model_ops.world_to_image`` global-shutter model;
    here the equivalent pinhole + radial/tangential distortion projection
    is written out in numpy (Waymo cameras are exported as GLOBAL_SHUTTER
    in this pipeline, so the rolling-shutter terms are identity);
  * ``box_utils.get_upright_3d_box_corners`` — reimplemented below.

Waymo camera frame: +x forward, +y left, +z up.  The OpenCV conversion is
the reader's OPENCV2DATASET flip (scene/dataset_readers.py:605-611).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def upright_box_corners(center: np.ndarray, lwh: np.ndarray,
                        heading: float) -> np.ndarray:
    """[8,3] corners of an upright (z-aligned) 3D box.

    Corner order matches waymo box_utils.get_upright_3d_box_corners:
    bottom face ccw from (+l/2,+w/2) then top face.
    """
    l, w, h = float(lwh[0]), float(lwh[1]), float(lwh[2])
    x = np.array([0.5, -0.5, -0.5, 0.5, 0.5, -0.5, -0.5, 0.5]) * l
    y = np.array([0.5, 0.5, -0.5, -0.5, 0.5, 0.5, -0.5, -0.5]) * w
    z = np.array([-0.5, -0.5, -0.5, -0.5, 0.5, 0.5, 0.5, 0.5]) * h
    c, s = np.cos(heading), np.sin(heading)
    rx = c * x - s * y
    ry = s * x + c * y
    return np.stack([rx, ry, z], 1) + np.asarray(center)[None, :]


def project_vehicle_to_image(points_vehicle: np.ndarray,
                             cam_to_vehicle: np.ndarray,
                             intrinsic: Sequence[float],
                             width: int, height: int) -> np.ndarray:
    """[N,3] vehicle-frame points -> [N,3] (u, v, ok).

    ``cam_to_vehicle`` is the calibration extrinsic (cam -> ego);
    ``intrinsic`` is Waymo's 9-vector (fx fy cx cy k1 k2 p1 p2 k3).
    ok = in front of the camera and inside the image bounds (the same
    validity the TF camera model reports for global shutter).
    """
    pts = np.asarray(points_vehicle, np.float64)
    v2c = np.linalg.inv(np.asarray(cam_to_vehicle, np.float64))
    p_cam = pts @ v2c[:3, :3].T + v2c[:3, 3]
    # waymo cam frame (x fwd, y left, z up) -> opencv (x right, y down, z fwd)
    x_cv, y_cv, z_cv = -p_cam[:, 1], -p_cam[:, 2], p_cam[:, 0]
    in_front = z_cv > 1e-6
    z_safe = np.where(in_front, z_cv, 1.0)
    xn = x_cv / z_safe
    yn = y_cv / z_safe
    fx, fy, cx, cy, k1, k2, p1, p2, k3 = [float(i) for i in intrinsic[:9]]
    r2 = xn * xn + yn * yn
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = xn * radial + 2 * p1 * xn * yn + p2 * (r2 + 2 * xn * xn)
    yd = yn * radial + p1 * (r2 + 2 * yn * yn) + 2 * p2 * xn * yn
    u = fx * xd + cx
    v = fy * yd + cy
    ok = in_front & (u >= 0) & (u < width) & (v >= 0) & (v < height)
    return np.stack([u, v, ok.astype(np.float64)], 1)


def dynamic_mask_from_boxes(boxes, cam_to_vehicle: np.ndarray,
                            intrinsic: Sequence[float],
                            width: int, height: int) -> np.ndarray:
    """uint8 [H,W] mask: 255 where a box moving > 1 m/s projects.

    ``boxes`` is a sequence of dicts with center [3], lwh [3], heading,
    speed.  Per the reference: skip a box if ANY corner projection fails
    (strict — excludes partially visible objects), clip the hull to image
    bounds, max-pool speed into the mask, threshold at 1 m/s.
    """
    speed_map = np.zeros((height, width), np.float32)
    for b in boxes:
        corners = upright_box_corners(np.asarray(b["center"]),
                                      np.asarray(b["lwh"]), b["heading"])
        uvok = project_vehicle_to_image(corners, cam_to_vehicle, intrinsic,
                                        width, height)
        if not uvok[:, 2].astype(bool).all():
            continue
        u = np.clip(uvok[:, 0], 0, width)
        v = np.clip(uvok[:, 1], 0, height)
        if u.max() - u.min() == 0 or v.max() - v.min() == 0:
            continue
        x0, y0 = int(u.min()), int(v.min())
        x1 = int(u.min() + (u.max() - u.min()))
        y1 = int(v.min() + (v.max() - v.min()))
        region = speed_map[y0:y1, x0:x1]
        np.maximum(region, b["speed"], out=region)
    return ((speed_map > 1.0) * 255).astype(np.uint8)
