# Novel-view synthesis preset: hold out every 10th timestep
# (parity with reference arguments/nvs.py)
ModelParams = dict(
    stride=10,
)
