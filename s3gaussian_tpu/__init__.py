"""s3gaussian_tpu — a TPU-native 4D Gaussian-splatting framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of S3Gaussian
("Self-Supervised Street Gaussians for Autonomous Driving"), designed
TPU-first:

* the differentiable depth-emitting tile rasterizer is a Pallas TPU kernel
  pair (forward / backward) under ``jax.custom_vjp``, fed by a sort-based
  tile binner with fully static shapes;
* per-Gaussian preprocessing (EWA projection, SH evaluation, covariance
  from scale+quaternion) is pure jnp, so XLA autodiff provides the
  gradients the CUDA reference hand-derives;
* the Gaussian set lives in a fixed-capacity pool with an alive-mask so
  adaptive density control (clone / split / prune / opacity-reset) runs
  inside one compiled program;
* the hexplane + deformation-head field is a single fused XLA program;
* multi-device scaling uses ``jax.sharding.Mesh`` + camera-batch data
  parallelism with psum'd gradients (new capability; the reference is
  single-GPU only).
"""

__version__ = "0.1.0"
