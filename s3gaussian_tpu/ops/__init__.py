from s3gaussian_tpu.ops.sh import eval_sh, RGB2SH, SH2RGB  # noqa: F401
from s3gaussian_tpu.ops.transforms import (  # noqa: F401
    quat_to_rotmat,
    quat_multiply,
    world_to_view,
    projection_matrix,
    fov2focal,
    focal2fov,
)
