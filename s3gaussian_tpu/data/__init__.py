from s3gaussian_tpu.data.cameras import Camera  # noqa: F401
