"""Fabricated mini-Waymo clip (3 frames × 3 cams, synthetic lidar) matching
the preprocessed on-disk layout (reference docs/prepare_data.md:150-163)."""

import json
import os

import numpy as np


def make_fixture(root, n_frames=3, n_lidar=500, seed=0):
    from PIL import Image
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    for d in ("intrinsics", "extrinsics", "ego_pose", "lidar",
              "dynamic_masks", "sky_masks", "semantic_segs",
              "instance_segs"):
        os.makedirs(os.path.join(root, d), exist_ok=True)

    # intrinsics: fx fy cx cy + 5 distortion entries (original 1280x1920)
    for i in range(3):
        intr = np.array([1400.0 + 10 * i, 1400.0, 960.0, 640.0,
                         0, 0, 0, 0, 0])
        np.savetxt(os.path.join(root, "intrinsics", f"{i}.txt"), intr)

    # extrinsics: camera->ego in waymo convention (x front). front camera
    # roughly at the origin looking forward, sides yawed ±45°.
    for i, yaw in enumerate([0.0, 0.785, -0.785]):
        c, s = np.cos(yaw), np.sin(yaw)
        c2e = np.array([[c, -s, 0, 1.5],
                        [s, c, 0, 0.0],
                        [0, 0, 1, 2.0],
                        [0, 0, 0, 1.0]])
        np.savetxt(os.path.join(root, "extrinsics", f"{i}.txt"), c2e)

    for t in range(n_frames):
        # ego drives forward along x
        ego = np.eye(4)
        ego[0, 3] = 2.0 * t
        np.savetxt(os.path.join(root, "ego_pose", f"{t:03d}.txt"), ego)

        for cam in range(3):
            img = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).resize((1920, 1280)).save(
                os.path.join(root, "images", f"{t:03d}_{cam}.jpg"))
            mask = np.zeros((1280, 1920), np.uint8)
            mask[:100, :100] = 255
            Image.fromarray(mask).save(
                os.path.join(root, "dynamic_masks", f"{t:03d}_{cam}.png"))
            # panoptic labels at a reduced resolution (reader NEAREST-resizes)
            sem = np.zeros((160, 240, 1), np.int32)
            sem[:80] = 10 + cam          # top half one class per camera
            inst = np.zeros((160, 240, 1), np.int32)
            inst[:, 120:] = t + 1        # right half one instance per frame
            np.save(os.path.join(root, "semantic_segs", f"{t:03d}_{cam}.npy"),
                    sem)
            np.save(os.path.join(root, "instance_segs", f"{t:03d}_{cam}.npy"),
                    inst)

        # lidar: N x 10 [origins(3), points(3), ground, intensity,
        # elongation, laser_id] in ego frame
        pts = np.zeros((n_lidar, 10), np.float32)
        pts[:, 3] = rng.uniform(1.0, 60.0, n_lidar)      # x forward
        pts[:, 4] = rng.uniform(-20.0, 20.0, n_lidar)    # y left
        pts[:, 5] = rng.uniform(-2.0, 5.0, n_lidar)      # z up
        pts.tofile(os.path.join(root, "lidar", f"{t:03d}.bin"))

    with open(os.path.join(root, "frame_info.json"), "w") as f:
        json.dump({"frames": n_frames}, f)
    return root
