# test-only preset: tiny hexplane + narrow MLP for fast CPU compiles
ModelHiddenParams = dict(
    net_width=16,
    kplanes_config={
        "grid_dimensions": 2,
        "input_coordinate_dim": 4,
        "output_coordinate_dim": 8,
        "resolution": [8, 8, 8, 4],
    },
    multires=[1, 2],
)
