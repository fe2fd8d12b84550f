from s3gaussian_tpu.render.renderer import render  # noqa: F401
