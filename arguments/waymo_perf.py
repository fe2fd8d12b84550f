# TPU perf preset for real street clips (no reference analog — the CUDA
# rasterizer has no pre-deformation cull).  Waymo's 3 forward cameras see
# ~20-40% of the 360-degree LiDAR init cloud, where the measured
# cull_before_deform win is 1.49x (BASELINE.md) PROVIDED the render
# budget is right-sized; max_visible=0 auto-sizes it from the init cloud
# at startup (train.py::auto_max_visible).
RasterConfig = dict(
    cull_before_deform=True,
    max_visible=0,
    # one lax.scan body for the rig's per-camera pipelines instead of a
    # python unroll: cold compile 289.7 -> 245.0 s and 2.87 -> 3.30
    # cams/s at the production-rig workload (BASELINE.md round 5) —
    # the scan also caps peak pair-stream memory at one camera
    multicam_scan=True,
)

# One optimizer step batches the 3-camera rig of a frame against a single
# deformation evaluation (one hexplane backward scatter per step instead
# of three) — same loss/densify semantics as the reference's batch loop
# (PARITY.md 12a; A/B in BASELINE.md r3).
#
# The r3 divergence is root-caused and fixed: batch-SUMMED densify stats
# mis-ranked densify candidates (opposing-view gradient cancellation +
# union-visibility denom).  multicam_percam_stats=1 (the config default)
# restores per-view semantics; the bisect (BASELINE.md "Round 4:
# multicam divergence ROOT-CAUSED") measures mc=3 at reference LRs
# healthy to fine-2400 (34.0 dB vs single-camera 31.1).  The r3
# noise-matched LR correction (0.5774) was measured NOT to heal the
# summed-stats collapse and is unnecessary with the fix — reference LRs
# ship unscaled.
OptimizationParams = dict(
    multicam=3,
    multicam_lr_scale=1.0,
)
