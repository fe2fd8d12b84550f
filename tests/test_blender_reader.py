"""Blender/NeRF-synthetic reader over a fabricated transforms fixture
(readNerfSyntheticInfo, dataset_readers.py:289-365): OpenGL->OpenCV flip,
alpha compositing over the background, train/test splits, random init."""

import json
import os

import numpy as np
import pytest


def make_blender_fixture(root, n_train=3, n_test=2, size=32):
    from PIL import Image

    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    os.makedirs(os.path.join(root, "test"), exist_ok=True)
    rng = np.random.default_rng(0)

    def frames(split, n):
        out = []
        for i in range(n):
            ang = 2 * np.pi * i / max(n, 1)
            # camera on a ring looking at the origin (OpenGL convention:
            # -z forward); just use a valid rigid transform
            c2w = np.eye(4)
            c2w[:3, 3] = [4 * np.cos(ang), 0.0, 4 * np.sin(ang)]
            img = np.zeros((size, size, 4), np.uint8)
            img[8:24, 8:24, :3] = (rng.random(3) * 255).astype(np.uint8)
            img[8:24, 8:24, 3] = 255  # opaque square, transparent border
            Image.fromarray(img).save(
                os.path.join(root, split, f"r_{i}.png"))
            out.append({"file_path": f"./{split}/r_{i}",
                        "transform_matrix": c2w.tolist(),
                        "time": i / max(n - 1, 1)})
        return out

    for split, n in (("train", n_train), ("test", n_test)):
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": 0.7,
                       "frames": frames(split, n)}, f)
    return root


@pytest.fixture(scope="module")
def blender_scene(tmp_path_factory):
    return make_blender_fixture(str(tmp_path_factory.mktemp("blender")))


def test_blender_load_splits_and_images(blender_scene):
    from s3gaussian_tpu.data.blender import read_blender_scene

    info = read_blender_scene(blender_scene, white_background=True,
                              num_pts=500)
    assert len(info.train_cameras) == 3
    assert len(info.test_cameras) == 2
    assert len(info.full_cameras) == 5
    cam = info.train_cameras[0]
    img = np.asarray(cam.image)
    assert img.shape == (32, 32, 3)
    # white background composited through the alpha channel
    np.testing.assert_allclose(img[0, 0], [1, 1, 1], atol=1e-6)
    assert img[16, 16].max() < 1.0  # the opaque square shows its color
    assert info.points.shape == (500, 3)
    assert np.abs(info.points).max() <= 1.3
    assert info.nerf_radius > 0


def test_blender_black_background(blender_scene):
    from s3gaussian_tpu.data.blender import read_blender_scene

    info = read_blender_scene(blender_scene, white_background=False,
                              num_pts=100)
    img = np.asarray(info.train_cameras[0].image)
    np.testing.assert_allclose(img[0, 0], [0, 0, 0], atol=1e-6)


def test_blender_camera_time_and_geometry(blender_scene):
    from s3gaussian_tpu.data.blender import read_blender_scene

    info = read_blender_scene(blender_scene, num_pts=100)
    times = [float(c.time) for c in info.train_cameras]
    assert times == [0.0, 0.5, 1.0]
    # campos must equal the c2w translation (ring of radius 4)
    for c in info.train_cameras:
        np.testing.assert_allclose(np.linalg.norm(np.asarray(c.campos)),
                                   4.0, atol=1e-5)


def test_blender_scene_dispatch(blender_scene):
    """load_scene recognizes transforms_train.json and builds a pool."""
    from s3gaussian_tpu.config import ModelParams
    from s3gaussian_tpu.data.scene import load_scene

    args = ModelParams()
    args.source_path = blender_scene
    args.model_path = ""
    scene = load_scene(args)
    assert scene.pool.capacity >= len(scene.info.points)
    assert len(scene.get_train_cameras()) == 3
