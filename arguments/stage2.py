# Sequential-clip training: frames 50-99 with deformation warm start
# (parity with reference arguments/stage2.py)
ModelParams = dict(
    stride=0,
    original_start_time=0,
    start_time=50,
    end_time=99,
)
OptimizationParams = dict(
    coarse_iterations=5000,
    iterations=50000,
)
