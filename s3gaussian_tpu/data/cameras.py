"""Camera containers.

Parity target: ``scene/cameras.py`` + ``utils/camera_utils.py`` in the
reference — a camera carries the view/projection transforms the rasterizer
consumes plus the per-view supervision targets (image, sparse lidar depth,
dynamic mask, DINO feature map, sky mask).

TPU-first design notes:
  * ``Camera`` is a registered pytree whose array leaves can be device-put /
    sharded; only the shape-determining fields (H, W) are static aux, so a
    jitted train step specializes on image shape once while per-camera
    scalars (fov, time, ids) stay batchable.
  * ``stack_cameras`` stacks many cameras (all Waymo views share a
    resolution) so a leading batch axis can be sharded over devices — the
    multi-camera data-parallel seam (reference train.py:328-360 pops
    cameras one by one in Python instead).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from s3gaussian_tpu.ops.transforms import (
    camera_center,
    full_projection,
    projection_matrix,
    world_to_view,
)


@jax.tree_util.register_dataclass
@dataclass
class Camera:
    """One view. Array/scalar fields are pytree leaves; H/W are static."""

    # --- dynamic (traced) fields ---
    world_view: jnp.ndarray            # [4,4] row-vector W2C^T
    full_proj: jnp.ndarray             # [4,4] row-vector W2C^T @ P^T
    campos: jnp.ndarray                # [3]
    time: jnp.ndarray                  # scalar in [0,1]
    image: Optional[jnp.ndarray] = None        # [H,W,3] float in [0,1]
    depth_map: Optional[jnp.ndarray] = None    # [H,W] sparse lidar depth (0 = missing)
    dynamic_mask: Optional[jnp.ndarray] = None  # [H,W] bool
    sky_mask: Optional[jnp.ndarray] = None      # [H,W] bool
    feat_map: Optional[jnp.ndarray] = None      # [H,W,3] PCA'd DINO features
    semantic_mask: Optional[jnp.ndarray] = None  # [H,W] int32 waymo class ids
    instance_mask: Optional[jnp.ndarray] = None  # [H,W] int32 instance ids
    sam_mask: Optional[jnp.ndarray] = None       # [H,W] int32 SAM segment ids

    # --- per-camera scalars: data leaves (may be traced / batched) so
    # cameras with different fovs stack into one batch pytree ---
    fovx: float = 1.0
    fovy: float = 1.0
    uid: int = 0
    cam_idx: int = 0
    frame_idx: int = 0

    # --- static fields (shape-determining) ---
    image_height: int = field(default=0, metadata=dict(static=True))
    image_width: int = field(default=0, metadata=dict(static=True))

    @property
    def tanfovx(self):
        return jnp.tan(jnp.asarray(self.fovx) * 0.5)

    @property
    def tanfovy(self):
        return jnp.tan(jnp.asarray(self.fovy) * 0.5)


def make_camera(R: np.ndarray, T: np.ndarray, fovx: float, fovy: float,
                width: int, height: int, time: float = 0.0,
                znear: float = 0.01, zfar: float = 100.0,
                image: Optional[np.ndarray] = None,
                depth_map: Optional[np.ndarray] = None,
                dynamic_mask: Optional[np.ndarray] = None,
                sky_mask: Optional[np.ndarray] = None,
                feat_map: Optional[np.ndarray] = None,
                semantic_mask: Optional[np.ndarray] = None,
                instance_mask: Optional[np.ndarray] = None,
                sam_mask: Optional[np.ndarray] = None,
                uid: int = 0, cam_idx: int = 0, frame_idx: int = 0) -> Camera:
    """Build a Camera from COLMAP-convention R (c2w rotation) and T (w2c
    translation), replicating scene/cameras.py:26-64 of the reference
    (znear=0.01, zfar=100 there)."""
    w2c = world_to_view(R, T)
    world_view = w2c.T  # row-vector convention
    proj = projection_matrix(znear, zfar, fovx, fovy)
    fp = full_projection(world_view.T, proj)  # = w2c^T @ proj^T
    cc = camera_center(w2c)
    return Camera(
        world_view=jnp.asarray(world_view),
        full_proj=jnp.asarray(fp),
        campos=jnp.asarray(cc),
        time=jnp.asarray(time, dtype=jnp.float32),
        image=None if image is None else jnp.asarray(image),
        depth_map=None if depth_map is None else jnp.asarray(depth_map),
        dynamic_mask=None if dynamic_mask is None else jnp.asarray(dynamic_mask),
        sky_mask=None if sky_mask is None else jnp.asarray(sky_mask),
        feat_map=None if feat_map is None else jnp.asarray(feat_map),
        semantic_mask=(None if semantic_mask is None
                       else jnp.asarray(semantic_mask, jnp.int32)),
        instance_mask=(None if instance_mask is None
                       else jnp.asarray(instance_mask, jnp.int32)),
        sam_mask=None if sam_mask is None else jnp.asarray(sam_mask, jnp.int32),
        image_height=height, image_width=width,
        fovx=float(fovx), fovy=float(fovy),
        uid=uid, cam_idx=cam_idx, frame_idx=frame_idx,
    )


def stack_cameras(cams) -> Camera:
    """Stack same-shape cameras into one Camera pytree with a leading batch
    axis (the data-parallel unit)."""
    assert len(cams) > 0
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)


def camera_to_json(uid: int, cam: Camera) -> dict:
    """Reproducibility dump entry (utils/camera_utils.py:102-122 in the
    reference): camera-to-world position/rotation plus focal lengths.
    The reference reconstructs C2W from (R, T); we invert the stored
    row-vector W2C transform instead."""
    w2c = np.asarray(cam.world_view).T
    c2w = np.linalg.inv(w2c)
    h, w = cam.image_height, cam.image_width
    fovx, fovy = float(cam.fovx), float(cam.fovy)
    return {
        "id": uid,
        "img_name": f"{int(cam.frame_idx):03d}_{int(cam.cam_idx)}",
        "width": w,
        "height": h,
        "position": c2w[:3, 3].tolist(),
        "rotation": [row.tolist() for row in c2w[:3, :3]],
        "fy": h / (2.0 * np.tan(fovy * 0.5)),
        "fx": w / (2.0 * np.tan(fovx * 0.5)),
    }


def write_cameras_json(path: str, test_cams, train_cams) -> None:
    """cameras.json in the reference's order: test cameras then train
    cameras (scene/__init__.py:87-96)."""
    import json
    entries = [camera_to_json(i, c)
               for i, c in enumerate(list(test_cams) + list(train_cams))]
    with open(path, "w") as f:
        json.dump(entries, f)


def nerf_norm_radius(cam_centers: np.ndarray) -> float:
    """NeRF++-style scene radius from camera centers
    (reference scene/dataset_readers.py:77-98 getNerfppNorm)."""
    center = cam_centers.mean(axis=0, keepdims=True)
    dist = np.linalg.norm(cam_centers - center, axis=1)
    return float(dist.max() * 1.1)
