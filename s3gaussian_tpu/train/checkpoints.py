"""Checkpointing: full train state, PLY export, cross-clip warm start.

Parity with the reference's three artifact families (SURVEY §5.4):
  (a) full training checkpoint = (capture(), iteration) →
      ``chkpnt_{stage}_{iter}`` with optimizer state and deformation
      params (train.py:524-531; gaussian_model.py:71-111) — here an orbax
      directory of the whole ``TrainState`` + stage, older checkpoints
      deleted on save;
  (b) PLY export of the alive Gaussians in the Inria layout +
      deformation params (Scene.save, scene/__init__.py:176-187);
  (c) ``--prior_checkpoint`` warm start: load a previous clip's fine
      checkpoint and transplant only the deformation field into a fresh
      model (train.py:611-624).
"""

from __future__ import annotations

import os
import shutil
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from s3gaussian_tpu.models.pool import GaussianPool
from s3gaussian_tpu.train.trainer import TrainState
from s3gaussian_tpu.utils.ply import (gaussian_ply_fields, parse_gaussian_ply,
                                      read_ply, write_ply)


def _ckpt_dir(model_path: str, stage: str, iteration: int) -> str:
    return os.path.join(model_path, f"chkpnt_{stage}_{iteration}")


def save_checkpoint(model_path: str, stage: str, iteration: int,
                    state: TrainState, keep_others: bool = False) -> str:
    """Save the full TrainState.

    COLLECTIVE in multi-process runs: orbax's save/wait barriers span
    every process, so ALL processes must call this (each contributes its
    addressable shards; replicated arrays are written by the primary
    replica).  Gating the call on ``is_primary()`` deadlocks — measured
    by scripts/multihost_localhost.py in round 5.  The host-side extras
    (STAGE marker, old-checkpoint cleanup) run on process 0 only, and a
    final barrier keeps any process from reading a half-written
    checkpoint directory."""
    import jax
    import orbax.checkpoint as ocp

    path = _ckpt_dir(model_path, stage, iteration)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        with open(os.path.join(path, "STAGE"), "w") as f:
            f.write(f"{stage} {iteration}")
        # delete older checkpoints only AFTER the new one is fully on disk —
        # a crash/preemption mid-save must never leave zero resumable
        # checkpoints (the reference deletes first, train.py:526-528; that
        # order loses the run on preemptible workers)
        if not keep_others:
            dirs = os.listdir(model_path) if os.path.isdir(model_path) else []
            for d in dirs:
                full = os.path.join(model_path, d)
                if d.startswith("chkpnt_") and full != path:
                    shutil.rmtree(full, ignore_errors=True)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("s3g_ckpt_save")
    return path


def find_checkpoint(model_path: str) -> Optional[Tuple[str, str, int]]:
    """Latest (path, stage, iteration) under model_path.  Stage outranks
    iteration — a fine checkpoint at any iteration is later in training
    than every coarse one (stages run sequentially, so coarse_5000 must
    not shadow fine_3000)."""
    if not os.path.isdir(model_path):
        return None
    stage_rank = {"coarse": 0, "fine": 1}
    best = None
    best_key = None
    for d in os.listdir(model_path):
        if d.startswith("chkpnt_"):
            parts = d.split("_")
            stage, it = parts[1], int(parts[2])
            key = (stage_rank.get(stage, -1), it)
            if best_key is None or key > best_key:
                best, best_key = (os.path.join(model_path, d), stage, it), key
    return best


def load_checkpoint(path: str, template: TrainState) -> Tuple[TrainState, str, int]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.abspath(path), template)
    with open(os.path.join(path, "STAGE")) as f:
        stage, it = f.read().split()
    return state, stage, int(it)


def transplant_deformation(path: str, state: TrainState) -> TrainState:
    """--prior_checkpoint: copy only the deformation (grid+mlp) params from
    a previous clip's checkpoint into a fresh state (train.py:611-624).

    Restores ONLY the ``deform`` subtree: pool capacity is sized per clip
    (data/scene.py), so restoring the whole previous TrainState against
    this clip's template would shape-mismatch whenever the clips' pool
    capacities differ — and nothing but the deformation field is wanted
    anyway."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restore_args = ocp.checkpoint_utils.construct_restore_args(
        {"deform": state.deform})
    prev = ckptr.restore(
        os.path.abspath(path),
        args=ocp.args.PyTreeRestore(
            item={"deform": state.deform},
            restore_args=restore_args,
            transforms={},  # drop every checkpoint key not in the item
        ))
    return TrainState(pool=state.pool, deform=prev["deform"],
                      adam=state.adam, stats=state.stats, step=state.step,
                      aabb=state.aabb, nan_skips=state.nan_skips)


def _np(a) -> np.ndarray:
    """Host value of an array that may be replicated across processes.

    ``np.asarray`` raises on non-fully-addressable (multi-process) arrays;
    for REPLICATED sharding every addressable shard holds the full value,
    so shard 0 of this process is the array."""
    if hasattr(a, "is_fully_addressable") and not a.is_fully_addressable:
        return np.asarray(a.addressable_shards[0].data)
    return np.asarray(a)


def save_ply_pool(path: str, pool: GaussianPool) -> None:
    """Alive rows in the Inria attribute layout."""
    alive = _np(pool.alive)
    xyz = _np(pool.xyz)[alive]
    f_dc = _np(pool.features_dc)[alive]
    f_rest = _np(pool.features_rest)[alive]
    op = _np(pool.opacity)[alive]
    sc = _np(pool.scaling)[alive]
    rot = _np(pool.rotation)[alive]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    write_ply(path, gaussian_ply_fields(xyz, f_dc, f_rest, op, sc, rot))


def save_ply_split(dynamic_path: str, static_path: str, pool: GaussianPool,
                   dx: np.ndarray) -> np.ndarray:
    """Dynamic/static split PLY export keyed on per-Gaussian |dx|
    (gaussian_model.py:277-348): positions are advanced by ``dx`` (the
    deformation at the reference's probe timestep), a Gaussian is dynamic
    when max|dx| exceeds the mean of that statistic over alive rows.
    Returns the dynamic mask over the pool (for callers/tests)."""
    alive = np.asarray(pool.alive)
    dx = np.asarray(dx)
    max_dx = np.abs(dx).max(axis=1)
    thr = max_dx[alive].mean() if alive.any() else 0.0
    dyn = (max_dx > thr) & alive
    stat = (~(max_dx > thr)) & alive

    xyz = np.asarray(pool.xyz) + dx
    f_dc = np.asarray(pool.features_dc)
    f_rest = np.asarray(pool.features_rest)
    op = np.asarray(pool.opacity)
    sc = np.asarray(pool.scaling)
    rot = np.asarray(pool.rotation)
    for path, m in ((dynamic_path, dyn), (static_path, stat)):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        write_ply(path, gaussian_ply_fields(xyz[m], f_dc[m], f_rest[m],
                                            op[m], sc[m], rot[m]))
    return dyn


def load_ply_pool(path: str, capacity: Optional[int] = None,
                  max_sh_degree: int = 3) -> GaussianPool:
    xyz, f_dc, f_rest, op, sc, rot = parse_gaussian_ply(read_ply(path),
                                                        max_sh_degree)
    n = len(xyz)
    cap = capacity or max(1 << max(n - 1, 1).bit_length(), 2048)
    assert n <= cap, (
        f"PLY holds {n} gaussians but the requested pool capacity is "
        f"{cap}; pass capacity >= {n}")

    def pad(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    rot_pad = np.zeros((cap, 4), np.float32)
    rot_pad[:, 0] = 1.0
    rot_pad[:n] = rot
    alive = np.zeros(cap, bool)
    alive[:n] = True
    return GaussianPool(xyz=pad(xyz), features_dc=pad(f_dc),
                        features_rest=pad(f_rest), scaling=pad(sc),
                        rotation=jnp.asarray(rot_pad),
                        opacity=pad(op, fill=-9.21),
                        alive=jnp.asarray(alive))
