#!/usr/bin/env python
"""Real 2-process multihost run on localhost CPU devices.

``parallel/multihost.py`` was unit-tested single-process only until round
5; this harness executes the ACTUAL multi-process code paths —
``jax.distributed.initialize`` with an explicit coordinator,
``jax.make_array_from_process_local_data`` stitching per-host camera
slices, the scanned shard_map DP step over a process-spanning mesh,
``sync_hosts`` barriers, and primary-gated checkpoint writes — with 2
OS processes × 2 virtual CPU devices each (global mesh of 4).

    python scripts/multihost_localhost.py            # parent: spawns 2 procs

Parent asserts: both children exit 0, their final state hashes are
bitwise equal (replicated state stays consistent because every process
applies the identical psum'd gradient), losses decrease, and the
checkpoint written by process 0 is visible to process 1 after the
barrier.  Exercised by tests/test_multihost_2proc.py (heavy tier).
"""

from __future__ import annotations

import os
import re
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PROC = 2
DEV_PER_PROC = 2
N_STEPS_PER_BLOCK = 3
N_BLOCKS = 4


def child() -> None:
    # conftest-equivalent CPU forcing happens via env set by the parent;
    # belt-and-braces the config here too (the container's sitecustomize
    # registers an 'axon' TPU backend)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tests"))

    from s3gaussian_tpu.parallel.multihost import (host_local_camera_blocks,
                                                   init_multihost, is_primary,
                                                   local_batch_slice,
                                                   sync_hosts)

    pid, n_proc = init_multihost()
    assert n_proc == N_PROC, f"process_count {n_proc} != {N_PROC}"
    n_dev = jax.device_count()
    assert n_dev == N_PROC * DEV_PER_PROC, f"global devices {n_dev}"
    assert len(jax.local_devices()) == DEV_PER_PROC
    print(f"[child {pid}] {n_proc} processes, {n_dev} global devices",
          flush=True)

    import dataclasses

    import test_train_e2e as helpers
    from s3gaussian_tpu.config import OptimizationParams
    from s3gaussian_tpu.data.cameras import stack_cameras
    from s3gaussian_tpu.parallel.data_parallel import (
        make_mesh, make_parallel_train_steps_scan, replicate_state)
    from s3gaussian_tpu.train import checkpoints as ckpt

    state, camera, hp, pipe, bg = helpers.setup(seed=3)
    opt = OptimizationParams()
    mesh = make_mesh(n_dev)
    state = replicate_state(state, mesh)

    # 4 distinguishable global batch rows (distinct times); every process
    # builds the same global list but materializes ONLY its local slice —
    # the make_array_from_process_local_data path under test
    global_cams = [dataclasses.replace(camera,
                                       time=jnp.asarray(i / 10.0,
                                                        jnp.float32))
                   for i in range(n_dev)]
    lo, hi = local_batch_slice(n_dev)
    local_cams = global_cams[lo:hi]

    par_scan = make_parallel_train_steps_scan(mesh, "coarse", hp, opt, pipe,
                                              helpers.CFG, 1.0)
    losses = []
    for _ in range(N_BLOCKS):
        blocks = host_local_camera_blocks(
            stack_cameras([stack_cameras(local_cams)
                           for _ in range(N_STEPS_PER_BLOCK)]), mesh)
        state, aux = par_scan(state, blocks, jnp.asarray(0, jnp.int32), bg)
        losses.append(float(np.asarray(aux["metrics"]["loss"])[-1]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    print(f"[child {pid}] losses {['%.5f' % l for l in losses]}", flush=True)

    # replicated-state consistency: every process must hold bitwise the
    # same model (each applied the identical psum'd update).  Replicated
    # arrays are not fully addressable across processes; shard 0 of each
    # process holds the full value.
    def local_value(a):
        return np.asarray(a.addressable_shards[0].data)

    digest = sum(float(np.abs(local_value(l)).sum())
                 for l in jax.tree_util.tree_leaves(state.pool.param_dict()))
    digest += float(np.abs(local_value(
        jax.tree_util.tree_leaves(state.deform)[0])).sum())
    print(f"STATE_HASH {digest!r}", flush=True)

    # checkpoint write: COLLECTIVE — every process calls save (orbax's
    # internal barriers span processes; primary-only gating deadlocks,
    # which is exactly what this harness first measured), the STAGE
    # marker and cleanup run on process 0 inside save_checkpoint
    out_dir = os.environ["S3G_TEST_CKPT_DIR"]
    n_iter = N_BLOCKS * N_STEPS_PER_BLOCK
    ckpt.save_checkpoint(out_dir, "coarse", n_iter, state)
    assert is_primary() == (pid == 0)
    sync_hosts("ckpt")
    path = os.path.join(out_dir, f"chkpnt_coarse_{n_iter}")
    assert os.path.isdir(path), f"process {pid} cannot see {path}"
    with open(os.path.join(path, "STAGE")) as f:
        assert f.read().split() == ["coarse", str(n_iter)]
    sync_hosts("done")
    print(f"MULTIHOST_CHILD_OK pid={pid}", flush=True)


def main() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    ckpt_dir = tempfile.mkdtemp(prefix="s3g_mh_")

    procs = []
    for i in range(N_PROC):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=(env.get("XLA_FLAGS", "") +
                       f" --xla_force_host_platform_device_count="
                       f"{DEV_PER_PROC}").strip(),
            S3G_COORDINATOR=f"127.0.0.1:{port}",
            S3G_NUM_PROCESSES=str(N_PROC),
            S3G_PROCESS_ID=str(i),
            S3G_TEST_CKPT_DIR=ckpt_dir,
            S3G_CHILD="1",
        )
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = [p.communicate(timeout=900)[0] for p in procs]
    ok = True
    hashes = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        print(f"----- process {i} (rc {p.returncode}) -----")
        print(out)
        ok &= p.returncode == 0 and f"MULTIHOST_CHILD_OK pid={i}" in out
        m = re.search(r"STATE_HASH (\S+)", out)
        hashes.append(m.group(1) if m else None)
    if hashes[0] is None or len(set(hashes)) != 1:
        print(f"STATE HASH MISMATCH: {hashes}")
        ok = False
    print("MULTIHOST_OK" if ok else "MULTIHOST_FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    if os.environ.get("S3G_CHILD"):
        child()
    else:
        sys.exit(main())
