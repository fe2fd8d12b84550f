"""Scene assembly + dataset dispatch.

Parity: ``Scene`` (scene/__init__.py:27-174) — dataset-type dispatch by
marker file (``frame_info.json`` → Waymo, ``sparse/`` → COLMAP,
``transforms_train.json`` → Blender), camera stacks, NeRF++ extent, pool
init from the point cloud, and the frustum AABB pushed into the
deformation field (set_aabb(max, min): the hexplane normalizes with
aabb[0]=max — reference quirk preserved).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from s3gaussian_tpu.config import ModelParams
from s3gaussian_tpu.data.waymo import SceneInfo, read_waymo
from s3gaussian_tpu.models.pool import GaussianPool, create_from_pcd


@dataclass
class Scene:
    info: SceneInfo
    pool: GaussianPool
    cameras_extent: float
    aabb: jnp.ndarray            # [2,3] as [max; min] for the hexplane
    model_path: str = ""

    def get_train_cameras(self):
        return self.info.train_cameras

    def get_test_cameras(self):
        return self.info.test_cameras

    def get_full_cameras(self):
        return self.info.full_cameras


def next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def load_scene(args: ModelParams, pool_capacity: Optional[int] = None,
               max_sh_degree: int = 3) -> Scene:
    src = args.source_path
    if os.path.exists(os.path.join(src, "frame_info.json")):
        info = read_waymo(
            src, white_background=args.white_background, eval_=args.eval,
            load_sky_mask=args.load_sky_mask,
            load_dynamic_mask=args.load_dynamic_mask,
            load_panoptic_mask=args.load_panoptic_mask,
            load_sam_mask=args.load_sam_mask,
            load_feat_map=args.load_feat_map, start_time=args.start_time,
            end_time=args.end_time,
            original_start_time=args.original_start_time,
            num_pts=args.num_pts, stride=args.stride,
            save_occ_grid=args.save_occ_grid,
            occ_voxel_size=args.occ_voxel_size,
            recompute_occ_grid=args.recompute_occ_grid,
            load_size=(args.load_h, args.load_w))
    elif os.path.exists(os.path.join(src, "sparse")):
        from s3gaussian_tpu.data.colmap import read_colmap_scene
        info = read_colmap_scene(src, args.images, args.eval)
    elif os.path.exists(os.path.join(src, "transforms_train.json")):
        from s3gaussian_tpu.data.blender import read_blender_scene
        info = read_blender_scene(src, args.white_background, args.eval)
    else:
        raise ValueError(f"Could not recognize scene type for {src}")

    n = len(info.points)
    if pool_capacity is None:
        # headroom for densification growth, capped at the reference's hard
        # 2M limit (train.py:501)
        pool_capacity = min(max(next_pow2(int(n * 1.5)), 1 << 16), 1 << 21)
    pool = create_from_pcd(info.points, info.colors, pool_capacity,
                           max_sh_degree)
    # hexplane aabb: set_aabb(xyz_max, xyz_min) (scene/__init__.py:149-151)
    aabb = jnp.asarray(np.stack([info.aabb[1], info.aabb[0]]),
                       dtype=jnp.float32)
    return Scene(info=info, pool=pool, cameras_extent=info.nerf_radius,
                 aabb=aabb, model_path=args.model_path)
