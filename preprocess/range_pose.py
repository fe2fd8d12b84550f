"""Per-pixel TOP-lidar origins from the range-image pose (pure numpy).

Parity: the reference derives per-point sensor origins through
``compute_range_image_cartesian`` (waymo_preprocess.py:381-488): for the
TOP (spinning) lidar every range-image column was fired at a different
instant, so each pixel carries its own ego pose
(``range_image_top_pose``, a [H, W, 6] tensor of roll/pitch/yaw +
translation).  The origin of pixel (i, j) is the lidar extrinsic
translation taken through that pixel's pose into world, then back into
the frame's vehicle pose:

    origin(i,j) = inv(frame_pose) · pixel_pose(i,j) · extrinsic[:3, 3]

Non-TOP lidars have no pixel pose — their origin is the extrinsic
translation exactly (compute_range_image_cartesian with pixel_pose=None
maps the zero vector through the extrinsic only), which is what the
converter already writes for them.

This module is TF-free so the math is unit-testable in CI; the converter
feeds it arrays decoded from the protos.

Training impact note: the origins column of the Nx10 .bin is FORMAT
parity only — the reference reader turns origins into ray
directions/ranges but never consumes them (dataset_readers.py:888-905:
the lists are built, the concatenations are commented out; only
``points`` feeds the pipeline).
"""

from __future__ import annotations

import numpy as np


def rpy_rotation(roll: np.ndarray, pitch: np.ndarray,
                 yaw: np.ndarray) -> np.ndarray:
    """Rotation matrices R = Rz(yaw) @ Ry(pitch) @ Rx(roll) for elementwise
    angle arrays of any shape -> [..., 3, 3] (the composition
    transform_utils.get_rotation_matrix uses for the range-image pose)."""
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    one = np.ones_like(cr)
    zero = np.zeros_like(cr)
    rx = np.stack([
        np.stack([one, zero, zero], -1),
        np.stack([zero, cr, -sr], -1),
        np.stack([zero, sr, cr], -1)], -2)
    ry = np.stack([
        np.stack([cp, zero, sp], -1),
        np.stack([zero, one, zero], -1),
        np.stack([-sp, zero, cp], -1)], -2)
    rz = np.stack([
        np.stack([cy, -sy, zero], -1),
        np.stack([sy, cy, zero], -1),
        np.stack([zero, zero, one], -1)], -2)
    return rz @ ry @ rx


def top_lidar_pixel_origins(pose_data: np.ndarray, frame_pose: np.ndarray,
                            ext_translation: np.ndarray) -> np.ndarray:
    """Per-pixel sensor origins for the TOP lidar, in the frame's vehicle
    frame.

    Args:
      pose_data: [H, W, 6] range_image_top_pose rows
        (roll, pitch, yaw, tx, ty, tz) — the per-pixel ego-to-world pose.
      frame_pose: [4, 4] the frame's ego-to-world pose.
      ext_translation: [3] TOP lidar extrinsic translation (sensor origin
        in the ego frame).

    Returns: [H, W, 3] origins; the caller gathers the range>0 pixels in
    row-major order to align with the point extraction.
    """
    rot = rpy_rotation(pose_data[..., 0], pose_data[..., 1],
                       pose_data[..., 2])                      # [H,W,3,3]
    trans = pose_data[..., 3:6]
    o_world = np.einsum("hwij,j->hwi", rot,
                        np.asarray(ext_translation, np.float64)) + trans
    w2v = np.linalg.inv(np.asarray(frame_pose, np.float64))
    o_vehicle = o_world @ w2v[:3, :3].T + w2v[:3, 3]
    return o_vehicle.astype(np.float32)
