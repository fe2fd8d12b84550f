"""Pin the DP-scaling projection artifact (scripts/project_scaling.py).

The projection's value rests on two verifiable pieces: (1) the all-reduce
byte count comes from the REAL grad pytree (trainable params only, +
densify stat taps), and (2) the ring-allreduce/core model is monotone and
degenerates correctly at N=1. Hardware constants are public specs and not
re-tested here.
"""
import numpy as np
import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from project_scaling import HW, grad_allreduce_bytes, project

from s3gaussian_tpu.config import ModelHiddenParams
from s3gaussian_tpu.models.deformation import init_deformation
from s3gaussian_tpu.models.pool import create_from_pcd
from s3gaussian_tpu.train.trainer import init_state


def _tiny_state(n=256, cap=512):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    pool = create_from_pcd(pts, cols, cap)
    hp = ModelHiddenParams()
    deform = init_deformation(jax.random.PRNGKey(0), hp)
    aabb = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    return init_state(pool, deform, aabb)


def test_grad_bytes_counts_trainable_params_exactly():
    state = _tiny_state()
    got = grad_allreduce_bytes(state)
    # independent recount: params pytree + cap*2 f32 tap + cap i32 vis
    params = {"pool": state.pool.param_dict(), "deform": state.deform}
    expect = sum(int(np.prod(l.shape)) * l.dtype.itemsize
                 for l in jax.tree_util.tree_leaves(params))
    expect += state.pool.capacity * 2 * 4 + state.pool.capacity * 4
    assert got == expect
    # sanity: the pool contribution scales with capacity, and the grads
    # are a strict subset of the full state (adam moments NOT allreduced)
    full = sum(int(np.prod(l.shape)) * l.dtype.itemsize
               for l in jax.tree_util.tree_leaves(state))
    assert got < full


def test_projection_model_shape():
    gb = 100 * 1024 * 1024
    one = project(100.0, gb, "v5e", 1)
    assert one["allreduce_ms"] == 0.0 and one["step_ms"] == 100.0
    # N=8 all-reduce is 2*(7/8)*bytes/bw and throughput superlinear vs N=1
    eight = project(100.0, gb, "v5e", 8)
    expect_ar = 2.0 * 7 / 8 * gb / (HW["v5e"]["ici_gbps"] * 1e9) * 1e3
    assert abs(eight["allreduce_ms"] - round(expect_ar, 2)) < 1e-6
    assert eight["frames_per_s"] > 7 * one["frames_per_s"]
    # v5p single chip: core scales by the HBM ratio
    v5p = project(100.0, gb, "v5p", 1)
    assert abs(v5p["core_ms"] - 100.0 * 810.0 / 2765.0) < 0.01
    # multicam multiplies cams_per_s only
    mc = project(100.0, gb, "v5e", 8, multicam=3)
    assert mc["cams_per_s"] == round(3 * mc["frames_per_s"], 2) or \
        abs(mc["cams_per_s"] - 3 * mc["frames_per_s"]) < 0.05
