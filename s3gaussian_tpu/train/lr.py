"""Learning-rate schedules.

Parity: ``get_expon_lr_func`` (utils/general_utils.py:196-229, the
Plenoxels/JaxNeRF schedule): log-linear interpolation between lr_init and
lr_final over max_steps, with an optional sine-eased delay multiplier.
Pure function of the step (works both as a Python float schedule and
traced inside jit).
"""

from __future__ import annotations

import jax.numpy as jnp


def expon_lr(step, lr_init: float, lr_final: float,
             lr_delay_steps: int = 0, lr_delay_mult: float = 1.0,
             max_steps: int = 1_000_000):
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, jnp.float32))
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    return jnp.where(step < 0, 0.0, delay_rate * log_lerp)
