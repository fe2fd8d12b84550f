"""Per-group Adam optimizer with pool-row masking.

The reference uses one torch Adam with eight named param groups at
different (scheduled) learning rates and eps=1e-15
(gaussian_model.py:170-201), and performs row surgery on its state during
densification.  Here the optimizer is a small explicit Adam so its state
is a plain pytree the density-control functions can edit:

  state.mu / state.nu mirror the param pytree; state.count is global
  (torch Adam's per-tensor step — preserved across surgery in the
  reference, so new rows see the same bias correction).

Learning rates arrive per call as a dict {group name: lr} so the expon
schedules evaluate inside jit (update_learning_rate,
gaussian_model.py:203-218).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp

B1, B2 = 0.9, 0.999
EPS = 1e-15


@jax.tree_util.register_dataclass
@dataclass
class AdamState:
    mu: Any
    nu: Any
    count: jnp.ndarray


def init_adam(params) -> AdamState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(mu=zeros,
                     nu=jax.tree_util.tree_map(jnp.zeros_like, params),
                     count=jnp.zeros((), jnp.int32))


def adam_update(params, grads, state: AdamState,
                lr_for_leaf: Callable[[tuple], jnp.ndarray]):
    """One Adam step.  ``lr_for_leaf(path) -> lr scalar`` assigns each leaf
    its group's (possibly scheduled, traced) learning rate."""
    count = state.count + 1
    c1 = 1 - B1 ** count.astype(jnp.float32)
    c2 = 1 - B2 ** count.astype(jnp.float32)

    mu = jax.tree_util.tree_map(lambda m, g: B1 * m + (1 - B1) * g,
                                state.mu, grads)
    nu = jax.tree_util.tree_map(lambda v, g: B2 * v + (1 - B2) * g * g,
                                state.nu, grads)

    flat_p, treedef = jax.tree_util.tree_flatten_with_path(params)
    flat_mu = jax.tree_util.tree_leaves(mu)
    flat_nu = jax.tree_util.tree_leaves(nu)
    new_leaves = []
    for (path, p), m, v in zip(flat_p, flat_mu, flat_nu):
        lr = lr_for_leaf(path)
        mhat = m / c1
        vhat = v / c2
        new_leaves.append(p - lr * mhat / (jnp.sqrt(vhat) + EPS))
    new_params = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), new_leaves)
    return new_params, AdamState(mu=mu, nu=nu, count=count)


def path_group(path) -> str:
    """Map a pytree path to a reference param-group name.

    Parameter pytree layout used by the trainer:
      {"pool": {"xyz"|"f_dc"|"f_rest"|"opacity"|"scaling"|"rotation": ...},
       "deform": {"grid": {...}, "mlp": {...}}}
    Group names follow gaussian_model.py:176-185: xyz, f_dc, f_rest,
    opacity, scaling, rotation, grid, deformation.
    """
    keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    if keys[0] == "pool":
        return keys[1]
    if keys[0] == "deform":
        return "grid" if keys[1] == "grid" else "deformation"
    raise KeyError(f"unknown param path {keys}")
