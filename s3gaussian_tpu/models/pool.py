"""Fixed-capacity Gaussian pool with masked adaptive density control.

TPU-native redesign of the reference ``GaussianModel``
(``scene/gaussian_model.py``).  The reference reallocates every parameter
tensor and its Adam state on each densify/prune (``:397-469``), which would
force an XLA recompile per densification.  Here the pool has a static
capacity with an ``alive`` mask:

  * clone (``densify_and_clone``, :524-561) writes copies into free slots;
  * split (``densify_and_split``, :496-522) writes N=2 resamples — one
    in-place (the source is pruned anyway) and one into a free slot —
    sampled from N(0, scale) rotated to world, with scale ÷ (0.8·N);
  * prune (:661-672) clears mask bits;
  * the Adam-state surgery semantics (new rows get zeroed moments,
    :397-469) become masked row writes on the optimizer state.

Free slots are found with the stable-argsort compaction trick (dead-first
order + rank arithmetic) — no dynamic shapes anywhere, so the whole train
step stays one compiled program.  Slot exhaustion drops the overflow
(reported), mirroring the reference's hard 2M-point cap (train.py:501).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from s3gaussian_tpu.ops.knn import mean_knn_dist2
from s3gaussian_tpu.ops.sh import RGB2SH
from s3gaussian_tpu.ops.transforms import quat_to_rotmat


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


@jax.tree_util.register_dataclass
@dataclass
class GaussianPool:
    """Raw (pre-activation) parameters, fixed capacity [Nc, ...]."""

    xyz: jnp.ndarray            # [Nc,3]
    features_dc: jnp.ndarray    # [Nc,1,3]
    features_rest: jnp.ndarray  # [Nc,15,3]
    scaling: jnp.ndarray        # [Nc,3] log-scale
    rotation: jnp.ndarray       # [Nc,4] unnormalized quat
    opacity: jnp.ndarray        # [Nc,1] logit
    alive: jnp.ndarray          # [Nc] bool

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def n_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive.astype(jnp.int32))

    # --- activations (gaussian_model.py:32-47) ---
    def get_scaling(self):
        return jnp.exp(self.scaling)

    def get_rotation(self):
        return self.rotation / jnp.linalg.norm(self.rotation, axis=-1,
                                               keepdims=True)

    def get_opacity(self):
        return jax.nn.sigmoid(self.opacity)

    def get_features(self):
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def param_dict(self) -> Dict[str, jnp.ndarray]:
        """The trainable leaves, named like the reference's param groups."""
        return {"xyz": self.xyz, "f_dc": self.features_dc,
                "f_rest": self.features_rest, "scaling": self.scaling,
                "rotation": self.rotation, "opacity": self.opacity}

    def with_params(self, p: Dict[str, jnp.ndarray]) -> "GaussianPool":
        return GaussianPool(xyz=p["xyz"], features_dc=p["f_dc"],
                            features_rest=p["f_rest"], scaling=p["scaling"],
                            rotation=p["rotation"], opacity=p["opacity"],
                            alive=self.alive)


@jax.tree_util.register_dataclass
@dataclass
class PoolStats:
    """Densification bookkeeping (gaussian_model.py:50-69)."""

    max_radii2d: jnp.ndarray      # [Nc] float
    xyz_grad_accum: jnp.ndarray   # [Nc] accumulated ‖grad(mean2D_ndc)‖
    denom: jnp.ndarray            # [Nc]

    @staticmethod
    def zeros(capacity: int) -> "PoolStats":
        return PoolStats(max_radii2d=jnp.zeros(capacity),
                         xyz_grad_accum=jnp.zeros(capacity),
                         denom=jnp.zeros(capacity))


def create_from_pcd(points: np.ndarray, colors: np.ndarray, capacity: int,
                    max_sh_degree: int = 3) -> GaussianPool:
    """Initialize from a (LiDAR) point cloud.

    Parity: ``create_from_pcd`` (gaussian_model.py:142-169): DC features
    from RGB2SH, scale = log sqrt(mean 3-NN dist²) clamped ≥1e-7, identity
    quats, opacity = inv_sigmoid(0.1).
    """
    n = points.shape[0]
    assert n <= capacity, f"{n} points > pool capacity {capacity}"
    k = (max_sh_degree + 1) ** 2

    dist2 = np.maximum(mean_knn_dist2(points), 1e-7)
    scales = np.log(np.sqrt(dist2))[:, None].repeat(3, axis=1)

    def padded(x, shape, fill=0.0):
        out = np.full((capacity,) + shape, fill, dtype=np.float32)
        out[:n] = x
        return jnp.asarray(out)

    fdc = np.asarray(RGB2SH(np.asarray(colors, np.float32)))[:, None, :]
    rots = np.zeros((n, 4), np.float32)
    rots[:, 0] = 1.0
    opac = np.full((n, 1), float(np.log(0.1 / 0.9)), np.float32)

    alive = np.zeros(capacity, bool)
    alive[:n] = True
    dead_rot = np.zeros((capacity, 4), np.float32)
    dead_rot[:, 0] = 1.0  # keep dead-slot quats normalizable
    rot_arr = dead_rot
    rot_arr[:n] = rots

    return GaussianPool(
        xyz=padded(points.astype(np.float32), (3,)),
        features_dc=padded(fdc, (1, 3)),
        features_rest=padded(np.zeros((n, k - 1, 3), np.float32), (k - 1, 3)),
        scaling=padded(scales, (3,)),
        rotation=jnp.asarray(rot_arr),
        opacity=padded(opac, (1,), fill=-9.21),  # sigmoid ≈ 1e-4 for dead
        alive=jnp.asarray(alive),
    )


# ---------------------------------------------------------------------------
# density control (pure functions over (pool, adam-state rows, stats))
# ---------------------------------------------------------------------------

def _free_slot_order(alive: jnp.ndarray) -> jnp.ndarray:
    """Indices of dead slots first (stable), via one small sort."""
    key = alive.astype(jnp.uint32)  # dead=0 first
    _, order = jax.lax.sort((key, jnp.arange(alive.shape[0], dtype=jnp.int32)),
                            num_keys=1)
    return order


def _masked_row_write(arr: jnp.ndarray, dest: jnp.ndarray,
                      src_vals: jnp.ndarray) -> jnp.ndarray:
    """arr[dest[i]] = src_vals[i] for dest[i] < Nc (others dropped).

    No ``unique_indices``: unselected rows all carry the out-of-bounds
    sentinel Nc (dropped by mode="drop"), and promising uniqueness over
    actually-duplicated indices is documented undefined behavior."""
    return arr.at[dest].set(src_vals, mode="drop")


def densify_and_prune(pool: GaussianPool, opt_rows: Dict[str, Tuple],
                      stats: PoolStats, rng: jax.Array,
                      grad_threshold: float, opacity_threshold: float,
                      scene_extent: float, percent_dense: float,
                      max_screen_size: Optional[jnp.ndarray],
                      max_points: int, size_prune_cap: float = 0.0,
                      world_prune: Optional[bool] = None):
    """One densification step: clone + split + prune, fused.

    ``opt_rows`` maps param-group name -> tuple of row-shaped optimizer
    arrays (Adam mu/nu) that get the same row surgery as the parameters
    (zeroed at newly-written slots — cat_tensors_to_optimizer semantics).
    Returns (pool, opt_rows, stats, info dict).
    """
    nc = pool.capacity
    grads = jnp.where(stats.denom > 0, stats.xyz_grad_accum / stats.denom, 0.0)
    scaling = pool.get_scaling()
    max_scale = jnp.max(scaling, axis=1)
    grad_ok = (grads >= grad_threshold) & pool.alive
    under_cap = pool.n_alive < max_points

    clone_sel = grad_ok & (max_scale <= percent_dense * scene_extent) & under_cap
    split_sel = grad_ok & (max_scale > percent_dense * scene_extent) & under_cap

    order = _free_slot_order(pool.alive)
    n_dead = nc - pool.n_alive

    # destination slots: clones first, then the split's second sample
    clone_rank = jnp.cumsum(clone_sel.astype(jnp.int32)) - 1
    n_clone = jnp.sum(clone_sel.astype(jnp.int32))
    split_rank = jnp.cumsum(split_sel.astype(jnp.int32)) - 1 + n_clone

    def dest_for(sel, rank):
        ok = sel & (rank < n_dead) & (rank >= 0)
        return jnp.where(ok, order[jnp.clip(rank, 0, nc - 1)], nc), ok

    clone_dest, clone_ok = dest_for(clone_sel, clone_rank)
    split_dest, split_ok = dest_for(split_sel, split_rank)

    # --- split resamples (gaussian_model.py:496-522) ---
    k1, k2 = jax.random.split(rng)
    rot = quat_to_rotmat(pool.rotation)
    s1 = jax.random.normal(k1, pool.xyz.shape) * scaling
    s2 = jax.random.normal(k2, pool.xyz.shape) * scaling
    off1 = jnp.einsum("nij,nj->ni", rot, s1)
    off2 = jnp.einsum("nij,nj->ni", rot, s2)
    new_scaling = jnp.log(scaling / (0.8 * 2))

    params = pool.param_dict()
    new_params = dict(params)

    def write_rows(name, arr):
        # clone: identical copy into free slot
        arr = _masked_row_write(arr, clone_dest, params[name])
        # split sample 2 into free slot
        if name == "xyz":
            arr = _masked_row_write(arr, split_dest, params["xyz"] + off2)
        elif name == "scaling":
            arr = _masked_row_write(arr, split_dest, new_scaling)
        else:
            arr = _masked_row_write(arr, split_dest, params[name])
        # split sample 1 overwrites the source row (which the reference
        # prunes after splitting)
        if name == "xyz":
            arr = jnp.where(split_ok[:, None], params["xyz"] + off1, arr)
        elif name == "scaling":
            arr = jnp.where(split_ok[:, None], new_scaling, arr)
        return arr

    for name in params:
        arr = write_rows(name, params[name])
        new_params[name] = arr

    alive = pool.alive
    alive = alive | (jnp.zeros(nc, bool).at[clone_dest].set(clone_ok, mode="drop"))
    alive = alive | (jnp.zeros(nc, bool).at[split_dest].set(split_ok, mode="drop"))

    # --- prune (gaussian_model.py:661-672) ---
    opac = jax.nn.sigmoid(new_params["opacity"][:, 0])
    # in-place split rows replaced the source, so no extra prune for split
    # (the reference prunes sources and appends 2 rows; net effect equal)
    newly = (jnp.zeros(nc, bool).at[clone_dest].set(clone_ok, mode="drop")
             | jnp.zeros(nc, bool).at[split_dest].set(split_ok, mode="drop")
             | split_ok)
    eligible = alive & ~newly  # fresh rows aren't pruned this round
    prune_opac = (opac < opacity_threshold) & eligible
    # reference couples screen and world size-prunes to one switch
    # (prune(size_threshold), gaussian_model.py:661-672); world_prune
    # decouples them for the prune-only continuation
    # (opt.prune_after_densify): the screen prune removes converged
    # geometry that only active densification replaces (measured death
    # spiral, BASELINE.md round 5 flagship-016), while the world prune
    # bounds the unregulated scale growth of the fog mechanism.
    world_on = world_prune if world_prune is not None \
        else (max_screen_size is not None)
    if max_screen_size is not None:
        prune_screen = (stats.max_radii2d > max_screen_size) & eligible
    else:
        prune_screen = jnp.zeros(nc, bool)
    if world_on:
        prune_world = (jnp.max(jnp.exp(new_params["scaling"]), axis=1)
                       > 0.1 * scene_extent) & eligible
    else:
        prune_world = jnp.zeros(nc, bool)
    size_prune = prune_screen | prune_world
    n_size_sel = jnp.sum(size_prune.astype(jnp.int32))
    if size_prune_cap and max_screen_size is not None:
        # Per-step cap on *size-based* prunes (TPU-build stability guard,
        # default off = reference semantics).  Once iteration passes
        # opacity_reset_interval the reference's 20-px screen prune
        # (train.py:502-509) activates; on small scenes it can delete
        # camera-proximal splats faster than densify re-splits them and
        # the run collapses.  The cap keeps only the worst offenders
        # (largest screen radius) up to cap·n_alive rows per step.
        # Opacity prunes — the reference's core cleanup — are never capped.
        cap_n = (size_prune_cap
                 * pool.n_alive.astype(jnp.float32)).astype(jnp.int32)
        score = jnp.where(size_prune, stats.max_radii2d, -jnp.inf)
        order = jnp.argsort(-score)
        rank = jnp.zeros(nc, jnp.int32).at[order].set(
            jnp.arange(nc, dtype=jnp.int32))
        size_prune = size_prune & (rank < cap_n)
    prune = prune_opac | size_prune
    alive = alive & ~prune

    # --- optimizer-state surgery: zero moments at touched rows, zero dead ---
    touched = newly
    new_opt = {}
    for name, rows in opt_rows.items():
        zero_mask = (~touched & alive)  # keep state only for old live rows
        expand = (slice(None),) + (None,) * (rows[0].ndim - 1)
        new_opt[name] = tuple(r * zero_mask[expand].astype(r.dtype)
                              for r in rows)

    new_pool = GaussianPool(alive=alive, **{
        {"xyz": "xyz", "f_dc": "features_dc", "f_rest": "features_rest",
         "scaling": "scaling", "rotation": "rotation",
         "opacity": "opacity"}[k]: v for k, v in new_params.items()})

    info = {
        "n_cloned": jnp.sum(clone_ok.astype(jnp.int32)),
        "n_split": jnp.sum(split_ok.astype(jnp.int32)),
        "n_pruned": jnp.sum(prune.astype(jnp.int32)),
        "n_prune_opacity": jnp.sum(prune_opac.astype(jnp.int32)),
        "n_prune_screen": jnp.sum((prune_screen & prune).astype(jnp.int32)),
        "n_prune_world": jnp.sum((prune_world & prune).astype(jnp.int32)),
        "n_prune_size_capped": n_size_sel
        - jnp.sum(size_prune.astype(jnp.int32)),
        "n_alive": new_pool.n_alive,
        "overflow": (jnp.sum(clone_sel.astype(jnp.int32))
                     + jnp.sum(split_sel.astype(jnp.int32))
                     - jnp.sum(clone_ok.astype(jnp.int32))
                     - jnp.sum(split_ok.astype(jnp.int32))),
    }
    return new_pool, new_opt, PoolStats.zeros(nc), info


def reset_opacity(pool: GaussianPool, opt_rows: Dict[str, Tuple]):
    """opacity <- min(opacity, inv_sigmoid(0.01)); zero the opacity Adam
    state (replace_tensor_to_optimizer semantics, gaussian_model.py:350-353)."""
    cap = inverse_sigmoid(jnp.asarray(0.01))
    new_op = jnp.minimum(pool.opacity, cap)
    pool = GaussianPool(xyz=pool.xyz, features_dc=pool.features_dc,
                        features_rest=pool.features_rest, scaling=pool.scaling,
                        rotation=pool.rotation, opacity=new_op,
                        alive=pool.alive)
    new_opt = dict(opt_rows)
    new_opt["opacity"] = tuple(jnp.zeros_like(r) for r in opt_rows["opacity"])
    return pool, new_opt


def add_densification_stats(stats: PoolStats, mean2d_grad: jnp.ndarray,
                            radii: jnp.ndarray,
                            visible: jnp.ndarray,
                            grad_norm: jnp.ndarray = None,
                            denom_inc: jnp.ndarray = None) -> PoolStats:
    """Accumulate ‖grad(mean2D_ndc)‖ and max screen radius over visible
    gaussians (gaussian_model.py:693-695; train.py:489-492).

    ``grad_norm``/``denom_inc`` override the default norm/count when the
    caller aggregates several views per step with per-view semantics (the
    multicam step passes sum_b ‖g_b‖ and the per-point visible-view count
    so the accumulated average matches B single-camera iterations)."""
    vis = visible
    norm = (grad_norm if grad_norm is not None
            else jnp.linalg.norm(mean2d_grad[:, :2], axis=-1))
    inc = (denom_inc if denom_inc is not None
           else vis.astype(jnp.float32))
    return PoolStats(
        max_radii2d=jnp.where(vis, jnp.maximum(stats.max_radii2d,
                                               radii.astype(jnp.float32)),
                              stats.max_radii2d),
        xyz_grad_accum=stats.xyz_grad_accum + jnp.where(vis, norm, 0.0),
        denom=stats.denom + inc,
    )
