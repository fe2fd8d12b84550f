"""Waymo TFRecord → training layout converter.

Parity: ``waymo_preprocess.py`` + ``preprocess_main.py`` in the reference —
produces the on-disk clip layout the reader consumes
(docs/prepare_data.md:150-163):

  images/{t:03d}_{cam}.jpg          5 cameras
  intrinsics/{cam}.txt              9 values (fx fy cx cy k1 k2 p1 p2 k3)
  extrinsics/{cam}.txt              4x4 cam->ego
  ego_pose/{t:03d}.txt              4x4 ego->world
  lidar/{t:03d}.bin                 Nx10 f32 [origins(3) points(3) ground
                                    intensity elongation laser_id]
  dynamic_masks/{t:03d}_{cam}.png   3D boxes with speed > 1 m/s projected
  sky_masks/                        (external segmenter, optional)
  frame_info.json                   marker + metadata

Requires ``waymo-open-dataset`` + TensorFlow (host-side, device-agnostic —
exactly like the reference).  The import is deferred so the rest of the
framework never depends on TF.
"""

from __future__ import annotations

import json
import os
from typing import List

import numpy as np


def _require_waymo():
    try:
        import tensorflow as tf  # noqa: F401
        from waymo_open_dataset import dataset_pb2  # noqa: F401
        from waymo_open_dataset.utils import (frame_utils,  # noqa: F401
                                              range_image_utils,
                                              transform_utils)
    except ImportError as e:  # pragma: no cover - depends on env
        raise ImportError(
            "waymo-open-dataset + tensorflow are required for preprocessing "
            "(pip install waymo-open-dataset-tf-2-11-0); the training "
            "framework itself does not need them.") from e


def _parse_lidar_tf(frame):  # pragma: no cover - needs TF
    """frame proto -> Nx10 float32 sweep rows (origins, points, ground,
    intensity, elongation, laser_id), or None for camera-only frames
    (waymo_preprocess.py:920-989).  First return only.

    Per-point origins: the TOP lidar gets pose-interpolated origins from
    ``range_image_top_pose`` (preprocess/range_pose.py — the reference's
    compute_range_image_cartesian path); the other lasers carry no pixel
    pose, so their origin is the extrinsic translation exactly as in the
    reference."""
    from waymo_open_dataset import dataset_pb2
    from waymo_open_dataset.utils import frame_utils

    from preprocess.range_pose import top_lidar_pixel_origins

    (range_images, camera_projections, _,
     range_image_top_pose) = frame_utils.parse_range_image_and_camera_projection(frame)
    if range_image_top_pose is None:
        return None  # camera-only split has no lidar

    # per-pixel TOP-lidar pose tensor [H, W, 6] (roll, pitch, yaw, t)
    top_pose = np.reshape(np.array(range_image_top_pose.data, np.float64),
                          tuple(range_image_top_pose.shape.dims))
    frame_pose = np.array(frame.pose.transform, np.float64).reshape(4, 4)

    rows = []
    points, _cp = frame_utils.convert_range_image_to_point_cloud(
        frame, range_images, camera_projections, range_image_top_pose,
        ri_index=0, keep_polar_features=True)
    calibs = sorted(frame.context.laser_calibrations, key=lambda cc: cc.name)
    for pts, cal in zip(points, calibs):
        if pts.shape[0] == 0:
            continue
        pts = np.asarray(pts)
        # keep_polar_features: [range, intensity, elongation, x, y, z]
        xyz = pts[:, 3:6]
        intensity = pts[:, 1:2]
        elongation = pts[:, 2:3]
        ext = np.array(cal.extrinsic.transform).reshape(4, 4)
        if cal.name == dataset_pb2.LaserName.TOP:
            # gather masked pixels row-major — the same order
            # convert_range_image_to_point_cloud emits points in
            ri = range_images[cal.name][0]
            rng = np.reshape(np.array(ri.data, np.float32),
                             tuple(ri.shape.dims))[..., 0]
            per_pixel = top_lidar_pixel_origins(top_pose, frame_pose,
                                                ext[:3, 3])
            origin = per_pixel[rng > 0]
        else:
            origin = np.broadcast_to(ext[:3, 3], xyz.shape)
        lid = np.full((len(xyz), 1), cal.name - 1, np.float32)
        rows.append(np.concatenate(
            [origin, xyz, np.zeros((len(xyz), 1), np.float32),
             intensity, elongation, lid], axis=1).astype(np.float32))
    if not rows:
        return None
    sweep = np.concatenate(rows, 0).astype(np.float32)
    # ground channel (column 6): iterative plane fit over the whole
    # vehicle-frame sweep (waymo_preprocess.py:175-213,959)
    from preprocess.lidar_ground import ground_label
    sweep[:, 6] = ground_label(sweep[:, 3:6]).astype(np.float32)
    return sweep


def convert_frames(frames, out_dir: str, process_keys: List[str],
                   lidar_fn=_parse_lidar_tf, source: str = "") -> int:
    """The converter's frame loop over already-parsed frame protos
    (waymo_preprocess.py:803-837) — separated from the TFRecord iteration
    so calib indexing and file layout are testable with stub protos.

    ``lidar_fn(frame)`` returns the Nx10 sweep rows (or None); the default
    needs TF + waymo-open-dataset.  Returns the number of frames."""
    for sub in ("images", "intrinsics", "extrinsics", "ego_pose", "lidar",
                "dynamic_masks"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    n_frames = 0
    for t, frame in enumerate(frames):
        n_frames += 1

        if t == 0 and "calib" in process_keys:
            # per-camera intrinsics + extrinsics (waymo_preprocess.py:889-918)
            for c in frame.context.camera_calibrations:
                cam = c.name - 1
                intr = np.array(c.intrinsic)  # f_u f_v c_u c_v k1 k2 p1 p2 k3
                np.savetxt(os.path.join(out_dir, "intrinsics", f"{cam}.txt"),
                           intr)
                c2e = np.array(c.extrinsic.transform).reshape(4, 4)
                np.savetxt(os.path.join(out_dir, "extrinsics", f"{cam}.txt"),
                           c2e)

        if "pose" in process_keys:
            pose = np.array(frame.pose.transform).reshape(4, 4)
            np.savetxt(os.path.join(out_dir, "ego_pose", f"{t:03d}.txt"), pose)

        if "images" in process_keys:
            for img in frame.images:
                cam = img.name - 1
                with open(os.path.join(out_dir, "images",
                                       f"{t:03d}_{cam}.jpg"), "wb") as f:
                    f.write(img.image)

        if "lidar" in process_keys:
            sweep = lidar_fn(frame)
            if sweep is not None:
                sweep.astype(np.float32).tofile(
                    os.path.join(out_dir, "lidar", f"{t:03d}.bin"))

        if "dynamic_masks" in process_keys:
            _save_dynamic_masks(frame, out_dir, t)

    with open(os.path.join(out_dir, "frame_info.json"), "w") as f:
        json.dump({"frames": n_frames, "source": source}, f)
    return n_frames


def convert_one(tfrecord_path: str, out_dir: str,
                process_keys: List[str]) -> None:  # pragma: no cover - needs TF
    """Convert one scene TFRecord (waymo_preprocess.py:803-837)."""
    _require_waymo()
    import tensorflow as tf
    from waymo_open_dataset import dataset_pb2

    def frames():
        dataset = tf.data.TFRecordDataset(tfrecord_path, compression_type="")
        for data in dataset:
            frame = dataset_pb2.Frame()
            frame.ParseFromString(bytearray(data.numpy()))
            yield frame

    convert_frames(frames(), out_dir, process_keys,
                   source=os.path.basename(tfrecord_path))

    if "panoptic_segs" in process_keys:
        save_panoptic_segs(tfrecord_path, out_dir)


def _save_dynamic_masks(frame, out_dir: str, t: int) -> None:  # pragma: no cover
    """3D laser-label boxes projected corner-by-corner into each camera,
    speed max-pooled, thresholded at 1 m/s (waymo_preprocess.py:1122-1219)."""
    from PIL import Image

    from preprocess.boxes import dynamic_mask_from_boxes

    # likely-occluded filter (waymo_preprocess.py:1139-1156)
    filter_available = any(l.num_top_lidar_points_in_box > 0
                           for l in frame.laser_labels)
    boxes = []
    for label in frame.laser_labels:
        box = label.box
        if not box.ByteSize():
            continue
        if (filter_available and not label.num_top_lidar_points_in_box) or (
                not filter_available and not label.num_lidar_points_in_box):
            continue
        meta = label.metadata
        boxes.append({
            "center": [box.center_x, box.center_y, box.center_z],
            "lwh": [box.length, box.width, box.height],
            "heading": box.heading,
            "speed": float(np.linalg.norm([meta.speed_x, meta.speed_y])),
        })

    for img_meta in frame.images:
        cam = img_meta.name - 1
        calib = next(c for c in frame.context.camera_calibrations
                     if c.name == img_meta.name)
        c2e = np.array(calib.extrinsic.transform).reshape(4, 4)
        mask = dynamic_mask_from_boxes(boxes, c2e, list(calib.intrinsic),
                                       calib.width, calib.height)
        Image.fromarray(mask, "L").save(
            os.path.join(out_dir, "dynamic_masks", f"{t:03d}_{cam}.png"))


def save_panoptic_segs(tfrecord_path: str, out_dir: str) -> int:  # pragma: no cover
    """Decode and export panoptic segmentation labels for the frames that
    carry them (waymo_preprocess.py:1011-1120): per frame+cam, semantic and
    instance label .npys under ``semantic_segs/`` / ``instance_segs/``
    (the reader's layout, dataset_readers.py:642-649), with instance ids
    remapped to be consistent across cameras and time.
    Returns the number of labeled frames."""
    _require_waymo()
    import tensorflow as tf
    from waymo_open_dataset import dataset_pb2
    from waymo_open_dataset.utils import camera_segmentation_utils

    os.makedirs(os.path.join(out_dir, "semantic_segs"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "instance_segs"), exist_ok=True)
    # cams [1,0,2] = FRONT_LEFT, FRONT, FRONT_RIGHT (reader order)
    cam_order = [2, 1, 3]  # waymo enum names for those cameras

    frames_with_seg = []
    frame_ids = []
    dataset = tf.data.TFRecordDataset(tfrecord_path, compression_type="")
    for t, data in enumerate(dataset):
        frame = dataset_pb2.Frame()
        frame.ParseFromString(bytearray(data.numpy()))
        if frame.images[0].camera_segmentation_label.panoptic_label:
            frames_with_seg.append(frame)
            frame_ids.append(t)
    if not frames_with_seg:
        return 0

    protos = []
    for frame in frames_with_seg:
        by_name = {img.name: img.camera_segmentation_label
                   for img in frame.images}
        protos.extend(by_name[name] for name in cam_order)
    (panoptic_labels, _, _, divisor) = (
        camera_segmentation_utils
        .decode_multi_frame_panoptic_labels_from_segmentation_labels(
            protos, remap_to_global=True))
    ncam = len(cam_order)
    for i, t in enumerate(frame_ids):
        for j in range(ncam):
            sem, inst = (camera_segmentation_utils
                         .decode_semantic_and_instance_labels_from_panoptic_label(
                             panoptic_labels[i * ncam + j], divisor))
            # file cam index matches the reader's [1,0,2] order mapping
            cam_idx = [1, 0, 2][j]
            np.save(os.path.join(out_dir, "semantic_segs",
                                 f"{t:03d}_{cam_idx}.npy"), sem)
            np.save(os.path.join(out_dir, "instance_segs",
                                 f"{t:03d}_{cam_idx}.npy"), inst)
    return len(frame_ids)


def convert(data_root: str, target_dir: str, scene_ids: List[int],
            process_keys: List[str], workers: int = 4) -> None:  # pragma: no cover
    """Multi-scene conversion with a process pool (the reference's
    track_parallel_progress, waymo_preprocess.py:793-801)."""
    import multiprocessing as mp

    records = sorted(os.listdir(data_root))
    jobs = []
    for sid in scene_ids:
        src = os.path.join(data_root, records[sid])
        dst = os.path.join(target_dir, f"{sid:03d}")
        jobs.append((src, dst, process_keys))
    if workers <= 1:
        for j in jobs:
            convert_one(*j)
    else:
        with mp.Pool(workers) as pool:
            pool.starmap(convert_one, jobs)
