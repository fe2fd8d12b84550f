# Stage-2 clip with NVS holdout (parity with reference arguments/stage2_nvs.py)
ModelParams = dict(
    stride=10,
    original_start_time=0,
    start_time=50,
    end_time=99,
)
OptimizationParams = dict(
    coarse_iterations=5000,
    iterations=50000,
)
