#!/usr/bin/env python
"""Percam-stats A/B on the PLAIN data-parallel seam (VERDICT r4 next #6).

The r4 multicam bisect proved per-camera densify statistics (leg BP)
heal the batched-rig divergence, and ``data_parallel._device_step``
defaults the same semantics for DP camera batches on the argument that
the mechanism is identical.  But DP batch members are *different
timesteps* (time-spread), not a same-timestep rig — per-view gradient
cancellation statistics differ, and that configuration was never
measured.  This script runs the measurement: the same mini clip trained
through the real CLI with ``--batch_size 4`` over a 2-device CPU mesh (this box exposes ONE core, so each mesh device executes serially — 2 devices keeps the serial multiplier workable),

    leg dpn — batch-summed stats   (--multicam_percam_stats 0, r3 semantics)
    leg dpp — per-camera stats     (--multicam_percam_stats 1, the default)

at a reduced resolution so the CPU mesh can carry the schedule.  Probe =
the fine-stage train-PSNR trajectory (ab_multicam.read_probes) plus the
final logger tail.

    python scripts/ab_dp_percam.py --leg dpp [--coarse 400 --fine 1500]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# CPU mesh BEFORE jax import: the container sitecustomize force-selects
# the axon TPU backend, so both the env and the config update are needed
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

LEGS = {
    "dpn": ["--multicam_percam_stats", "0"],
    "dpp": ["--multicam_percam_stats", "1"],
}

PROBES = (250, 500, 750, 1000)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--leg", required=True, choices=sorted(LEGS))
    p.add_argument("--clip", default="/tmp/dp_clip_t")
    p.add_argument("--coarse", type=int, default=200)
    p.add_argument("--fine", type=int, default=1000)
    p.add_argument("--h", type=int, default=64)
    p.add_argument("--w", type=int, default=96)
    args, extra = p.parse_known_args(argv)

    import mini_clip

    model_path = os.path.join(args.clip, f"recon_{args.leg}")
    mini_clip.main([
        "--out", args.clip, "--frames", "12", "--train",
        "--h", str(args.h), "--w", str(args.w),
        "--coarse", str(args.coarse), "--fine", str(args.fine),
        "--reset_interval", str(10 * (args.coarse + args.fine)),
        "--model_path", model_path,
        # CPU-mesh-sized budgets (override mini_clip's TPU defaults;
        # argparse last-wins) — the first feasibility probe at 160x240 /
        # 40k pts managed ~1 step in 20 CPU-minutes; these sizes measure
        # the same *stats semantics* dynamics at CPU-tractable cost
        "--num_pts", "8000",
        "--max_points", "16384",
        "--max_visible", "8192",
        "--pair_budget", "262144",
        "--rect_w", "3", "--rect_h", "3",
        "--max_pairs_per_tile", "2048", "--chunk", "32",
        "--batch_size", "2",
        # this environment exposes ONE CPU core: the full-size hexplane's
        # XLA CPU compile alone runs >25 min, so the A/B uses the test
        # suite's tiny deformation config — the quantity under test
        # (densify-statistics semantics across batched views) is
        # pool-side, not hexplane-side
        "--configs", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests", "tiny_config.py"),
        # one plain-step program only: the 10-step scan-block program's
        # XLA CPU compile alone exceeded 20 min on this 1-core box, and
        # CPU has no per-dispatch overhead to amortize anyway
        "--steps_per_dispatch", "1",
        "--skip_final_eval",
    ] + LEGS[args.leg] + extra)

    from ab_multicam import read_probes
    probes = read_probes(os.path.join(model_path, "logger.json"),
                         probes=PROBES)
    print("AB_DP_PROBES", args.leg,
          json.dumps({p: v for p, v in sorted(probes.items())}))
    return probes


if __name__ == "__main__":
    main()
