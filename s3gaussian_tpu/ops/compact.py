"""Scatter-free compaction gather.

``take_compact`` gathers pool rows at the (stable, increasing) candidate
indices produced by a visible-first sort, with a custom VJP that expands
gradients back to the pool by *rank arithmetic* instead of a scatter:
because the compaction is stable, pool slot i's candidate position is
``rank(i) = cumsum(visible)[i] - 1``, so the backward is a gather too.
(TPU scatters cost ~100 ms/M rows; see binning.py.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.custom_vjp
def take_compact(x: jnp.ndarray, cand: jnp.ndarray, visible: jnp.ndarray):
    """x: [N, ...] pool array; cand: [NR] increasing candidate pool indices
    (visible-first stable compaction); visible: [N] bool mask that produced
    them. Returns x[cand]."""
    return x[cand]


def _fwd(x, cand, visible):
    return x[cand], (cand, visible, x.shape)


def _bwd(res, g):
    cand, visible, shape = res
    nr = cand.shape[0]
    rank = jnp.cumsum(visible.astype(jnp.int32)) - 1
    take = jnp.clip(rank, 0, nr - 1)
    ok = visible & (rank < nr)
    dx = jnp.where(ok.reshape((-1,) + (1,) * (g.ndim - 1)), g[take], 0.0)
    f0 = jax.dtypes.float0
    return (dx, np.zeros(cand.shape, f0), np.zeros(visible.shape, f0))


take_compact.defvjp(_fwd, _bwd)
