# TPU perf preset for real street clips (no reference analog — the CUDA
# rasterizer has no pre-deformation cull).  Waymo's 3 forward cameras see
# ~20-40% of the 360-degree LiDAR init cloud, where the measured
# cull_before_deform win is 1.49x (BASELINE.md) PROVIDED the render
# budget is right-sized; max_visible=0 auto-sizes it from the init cloud
# at startup (train.py::auto_max_visible).
RasterConfig = dict(
    cull_before_deform=True,
    max_visible=0,
)

# One optimizer step batches the 3-camera rig of a frame against a single
# deformation evaluation (one hexplane backward scatter per step instead
# of three) — same loss/densify semantics as the reference's batch loop
# (PARITY.md 12a; A/B in BASELINE.md r3).
#
# multicam_lr_scale: the reference LRs are tuned for its default
# batch_size=1; at B=3 the batch-mean gradient's lower variance makes
# Adam overshoot and measurably diverge mid-fine-stage (BASELINE.md
# "multicam training divergence").  1/sqrt(3) is the classical
# noise-matched correction.
OptimizationParams = dict(
    multicam=3,
    multicam_lr_scale=0.5774,
)
