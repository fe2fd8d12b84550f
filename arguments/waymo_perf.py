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
