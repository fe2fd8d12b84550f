from s3gaussian_tpu.models.pool import GaussianPool, PoolStats  # noqa: F401
