#!/usr/bin/env python
"""Projected multi-chip / v5p throughput from measured single-v5e numbers.

VERDICT r3 weak #2 asked for a measured-or-projected throughput artifact
for the DP path beyond the correctness dryrun.  Multi-chip hardware is
not reachable from this environment, so this script produces the honest
next-best thing: a projection **grounded in measured quantities** —

  * the per-step ALL-REDUCE BYTES are counted from the REAL gradient
    pytree of the flagship workload (the exact leaves
    ``parallel/data_parallel.py`` psums: pool + deformation grads, the
    densify stat tap, vis counts), not estimated;
  * the single-chip step time is the measured bench headline
    (BENCH_r0N / BASELINE.md), and the HBM-bound fraction comes from the
    r3 bytes-roofline analysis (the step is ~bytes-bound, so it scales
    with HBM bandwidth across TPU generations);
  * hardware constants are the public per-chip numbers (HBM bandwidth,
    ICI link bandwidth per direction; ring all-reduce moves
    2·(N−1)/N · bytes per chip).

Projection model (data parallel over N chips, one frame/rig per chip):

  step_N = step_1 · (BW_v5e / BW_target)      # bytes-bound core
           + 2·(N−1)/N · grad_bytes / ICI_bw  # ring all-reduce (unhidden,
                                              # worst case: no overlap)
  frames_per_s = N / step_N

Run: python scripts/project_scaling.py [--step_ms 124.4] [--n 200000]
The byte-counting function is unit-tested (tests/test_project_scaling.py).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Public per-chip constants (jax-ml.github.io/scaling-book, TPU specs).
# ICI numbers are one-direction bandwidth per chip for a 1D ring (2 links
# participating); v5e 2D torus / v5p 3D torus have more links, so ring
# numbers are conservative.
HW = {
    "v5e": {"hbm_gbps": 810.0, "ici_gbps": 90.0},
    "v5p": {"hbm_gbps": 2765.0, "ici_gbps": 180.0},
}


def grad_allreduce_bytes(state) -> int:
    """Bytes each chip contributes to the per-step all-reduce: the grad
    pytree of every trainable param (same structure as the params —
    jax.grad preserves dtypes/shapes) + the densify stat tap [cap, 2]
    + vis_count [cap] + O(1) scalars (loss/metrics, ignored).

    Mirrors parallel/data_parallel.py::_device_step(_multicam): pgrads
    covers state.pool.params AND state.deform params; tap_grad is
    [capacity, 2] f32; vis_count [capacity] i32 (multicam percam path).
    """
    import jax
    import numpy as np

    total = 0
    params = {"pool": state.pool.param_dict(), "deform": state.deform}
    for leaf in jax.tree_util.tree_leaves(params):
        total += int(np.prod(leaf.shape)) * leaf.dtype.itemsize
    cap = state.pool.capacity
    total += cap * 2 * 4      # tap_grad f32
    total += cap * 4          # vis_count
    return total


def project(step_ms: float, grad_bytes: int, target: str, n_chips: int,
            multicam: int = 1) -> dict:
    hw = HW[target]
    core_ms = step_ms * (HW["v5e"]["hbm_gbps"] / hw["hbm_gbps"])
    ar_ms = (2.0 * (n_chips - 1) / max(n_chips, 1)) * grad_bytes \
        / (hw["ici_gbps"] * 1e9) * 1e3 if n_chips > 1 else 0.0
    step_n = core_ms + ar_ms
    return {
        "target": target, "n_chips": n_chips,
        "core_ms": round(core_ms, 2), "allreduce_ms": round(ar_ms, 2),
        "step_ms": round(step_n, 2),
        "frames_per_s": round(n_chips / step_n * 1e3, 2),
        "cams_per_s": round(n_chips * multicam / step_n * 1e3, 2),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--step_ms", type=float, default=124.4,
                   help="measured single-v5e fine step (BENCH r3/r4: "
                        "8.04 it/s -> 124.4 ms)")
    p.add_argument("--n", type=int, default=200_000)
    p.add_argument("--cap", type=int, default=204_800)
    p.add_argument("--multicam", type=int, default=1)
    args = p.parse_args(argv)

    # build the real state (CPU is fine: we only count bytes)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import jax.numpy as jnp

    from s3gaussian_tpu.config import ModelHiddenParams
    from s3gaussian_tpu.models.deformation import init_deformation
    from s3gaussian_tpu.models.pool import create_from_pcd
    from s3gaussian_tpu.train.trainer import init_state

    rng = np.random.default_rng(0)
    pts = rng.uniform(-30, 30, (args.n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (args.n, 3)).astype(np.float32)
    pool = create_from_pcd(pts, cols, args.cap)
    hp = ModelHiddenParams()
    deform = init_deformation(jax.random.PRNGKey(0), hp)
    aabb = jnp.asarray([[-30., -30., -30.], [30., 30., 30.]])
    state = init_state(pool, deform, aabb)

    gb = grad_allreduce_bytes(state)
    print(f"all-reduce bytes/step (measured from the grad pytree): "
          f"{gb/1e6:.1f} MB", flush=True)
    rows = [project(args.step_ms, gb, "v5e", 1, args.multicam)]
    for tgt in ("v5e", "v5p"):
        for n in (1, 4, 8):
            if (tgt, n) == ("v5e", 1):
                continue
            rows.append(project(args.step_ms, gb, tgt, n, args.multicam))
    for r in rows:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
