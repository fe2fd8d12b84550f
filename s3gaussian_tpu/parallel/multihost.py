"""Multi-host (multi-process) training support.

The reference is strictly single-process/single-GPU (SURVEY §2.1); there
is nothing to port.  This module supplies the TPU-native scaling story
the framework's own BASELINE targets name (v5p-8 and beyond): the
camera-batch data-parallel seam of ``parallel/data_parallel.py`` carried
over a *process-spanning* mesh, with

  * ``init_multihost`` — ``jax.distributed.initialize`` glue (env-driven
    on TPU pods, explicit coordinator otherwise); after it returns,
    ``jax.devices()`` spans every host and ``data_parallel.make_mesh``
    therefore already builds a global mesh — the shard_map collectives
    (psum of gradients, pmax of radii/counters) ride ICI within a slice
    and DCN across slices with no further code changes;
  * ``host_local_camera_batch`` / ``host_local_camera_blocks`` — each
    host loads only its own cameras (its slice of the global batch) and
    the pieces are stitched into one global sharded pytree without any
    cross-host data transfer (jax.make_array_from_process_local_data);
  * ``sync_hosts`` — a named barrier for checkpoint/eval boundaries
    (only process 0 writes; the others wait).

Replicated state (pool + deformation + Adam) stays bitwise consistent
across processes for the same reason it does across devices: every
process applies the identical psum'd gradient.

Deliberate design limit: the Gaussian pool is REPLICATED, not sharded —
at the reference's 2M-point cap the pool + Adam moments are ~950 MB,
far inside one v5p chip's 96 GB HBM, so sharding it would buy nothing
and cost an all-gather of projected splats per render.  The scaling
axis that matters (cameras/timesteps of the batch, SURVEY §5.7) is the
one sharded here.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from s3gaussian_tpu.data.cameras import Camera


def _distributed_active() -> bool:
    """Whether the JAX distributed client is already up, WITHOUT
    initializing the XLA backend (jax.process_count() would)."""
    try:
        from jax._src import distributed
        return distributed.global_state.client is not None
    except Exception:
        return False


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> tuple:
    """Initialize the JAX distributed runtime and return
    ``(process_index, process_count)``.

    On TPU pods every argument auto-detects from the environment
    (``jax.distributed.initialize()`` with no args); elsewhere pass the
    coordinator explicitly or set ``S3G_COORDINATOR`` /
    ``S3G_NUM_PROCESSES`` / ``S3G_PROCESS_ID``.  A single-process call
    (no coordinator anywhere) is a no-op so the same entry point works
    from one chip to a pod.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "S3G_COORDINATOR")
    if num_processes is None and os.environ.get("S3G_NUM_PROCESSES"):
        num_processes = int(os.environ["S3G_NUM_PROCESSES"])
    if process_id is None and os.environ.get("S3G_PROCESS_ID"):
        process_id = int(os.environ["S3G_PROCESS_ID"])

    # N.B. the "already initialized" probe must NOT touch the XLA backend:
    # jax.process_count() initializes it, and jax.distributed.initialize()
    # refuses to run after backend init — a defect only a real multi-process
    # run exposes (the single-process tests never reach initialize()).
    already = _distributed_active()
    want_multi = (coordinator_address is not None
                  or (num_processes or 1) > 1
                  or os.environ.get("S3G_MULTIHOST_AUTO"))
    if want_multi and not already:
        kwargs = {}
        if coordinator_address:
            kwargs.update(coordinator_address=coordinator_address,
                          num_processes=num_processes,
                          process_id=process_id)
        jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def local_batch_slice(global_batch: int) -> tuple:
    """This process's [start, stop) slice of a ``global_batch`` whose rows
    map one-to-one onto ``jax.devices()`` order.  All processes must pop
    cameras from identically-seeded shuffles so row i means the same
    camera everywhere; each host then materializes only its own rows."""
    per = global_batch // jax.process_count()
    assert per * jax.process_count() == global_batch, (
        "global batch must divide evenly across processes")
    start = jax.process_index() * per
    return start, start + per


def host_local_camera_batch(local: Camera, mesh: Mesh) -> Camera:
    """Stitch per-host camera stacks ([local_B, ...] leaves holding only
    THIS host's slice of the global batch) into one global pytree sharded
    P('data') over ``mesh``.  Single-process this equals
    ``data_parallel.shard_camera_batch``."""
    if jax.process_count() == 1:
        sharding = NamedSharding(mesh, P("data"))
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), local)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data")), np.asarray(x)), local)


def host_local_camera_blocks(local: Camera, mesh: Mesh) -> Camera:
    """[n_steps, local_B, ...] per-host camera blocks → global pytree
    sharded P(None, 'data') (the scanned-dispatch input layout)."""
    if jax.process_count() == 1:
        sharding = NamedSharding(mesh, P(None, "data"))
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), local)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(None, "data")), np.asarray(x)), local)


def sync_hosts(name: str = "s3g") -> None:
    """Barrier across processes (checkpoint/eval boundaries)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs/eval."""
    return jax.process_index() == 0
