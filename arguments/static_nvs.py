# Static scene NVS: deformation disabled (parity with reference
# arguments/static_nvs.py)
ModelHiddenParams = dict(
    no_dx=True,
)
ModelParams = dict(
    stride=10,
)
