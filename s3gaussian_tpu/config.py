"""Configuration system.

Mirrors the four parameter groups of the reference
(``arguments/__init__.py:47-236`` in nnanhuang/S3Gaussian) as frozen-free
dataclasses, with the same field names and defaults so configs and CLI
invocations translate one-to-one.  Python-file overrides (the reference
uses ``mmcv.Config`` + ``merge_hparams``, ``train.py:751-755``) are
supported by exec'ing a config file that defines ``ModelParams = dict(...)``
style dicts.

TPU additions live in :class:`RasterConfig` (static capacities for the
sort-based binner — the XLA analogue of the CUDA rasterizer's dynamically
sized CUB buffers).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


@dataclass
class ModelParams:
    """Data/scene loading options (reference ``ModelParams``)."""

    debug_test: bool = False
    sh_degree: int = 3
    # explicit Gaussian-pool capacity (TPU-build extension; 0 = auto =
    # next_pow2(1.5x init count), data/scene.py).  The auto rule can
    # starve densification on long runs whose init count sits just under
    # a power of two — leg AXDF saturated its 2^18 pool by fine-1200 and
    # decayed into the fog regime while the densifier trickled clones
    # into ~150 freed slots per window (BASELINE.md round 5).
    pool_capacity: int = 0
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    data_device: str = "tpu"
    eval: bool = True
    # test/train split
    stride: int = 0
    # visual
    render_process: bool = True
    # waymo clip time range
    start_time: int = 0
    end_time: int = 49
    original_start_time: int = 0
    num_objs: int = 256
    num_pts: int = 1500000
    # mask loading options
    load_sky_mask: bool = False
    load_panoptic_mask: bool = False
    load_sam_mask: bool = False
    load_dynamic_mask: bool = True
    load_feat_map: bool = True
    # waymo
    n_views: int = 100
    random_init: bool = False
    train_split: bool = False
    num_classes: int = 200
    load_intrinsic: bool = False
    load_c2w: bool = False
    # TPU-build extras: image load size (reference hardcodes 640x960,
    # dataset_readers.py:609)
    load_h: int = 640
    load_w: int = 960
    # occupancy grid
    save_occ_grid: bool = True
    occ_voxel_size: float = 0.4
    recompute_occ_grid: bool = False

    # Fields with a leading underscore in the reference get a one-letter
    # shorthand on the CLI.  We record them here.
    _shorthand = ("source_path", "model_path", "images", "resolution",
                  "white_background")
    __hash__ = object.__hash__


@dataclass
class PipelineParams:
    """Render-pipeline toggles (reference ``PipelineParams``)."""

    convert_SHs_python: bool = True
    compute_cov3D_python: bool = False
    debug: bool = False

    _shorthand = ()
    __hash__ = object.__hash__


@dataclass
class OptimizationParams:
    """Optimizer / schedule / density-control knobs (reference
    ``OptimizationParams``)."""

    vis_step: int = 2000
    batch_size: int = 1
    # TPU-build extension (not in the reference): batch the N same-timestep
    # cameras of a frame rig into one optimizer step with a single shared
    # deformation evaluation (render_multicam).  0/1 = off.  Orthogonal to
    # batch_size (which maps to multi-device data parallelism).
    multicam: int = 0
    # LR multiplier applied (to every param group) by the multicam step
    # only.  Batch-mean gradients have ~1/B the variance of single-camera
    # steps, so Adam's effective step size grows toward the deterministic
    # regime, and each frame is revisited B times as often per optimizer
    # step — at the reference LRs (tuned for batch_size=1; its default,
    # arguments/__init__.py:103) a B=3 rig measurably diverges mid-fine-
    # stage on TPU (BASELINE.md r3 "multicam divergence").  1.0 keeps the
    # reference-faithful batch semantics; ~1/sqrt(B) is the classical
    # noise-matched correction.
    multicam_lr_scale: float = 1.0
    # Per-camera densification statistics for EVERY batched-view seam —
    # the multicam rig step AND the shard_map data-parallel camera batch
    # (int as a CLI-overridable bool; 1 = on).  The naive batch
    # semantics (norm of
    # the SUMMED screen gradient, denom += union-visible — what the
    # reference's batch>1 path computes at train.py:435-437, though its
    # shipping configs run batch_size=1) systematically deflate the
    # per-view average gradient for points seen by a strict subset of the
    # rig: a point visible in 1 of B cameras accumulates |g|/B against a
    # denom of 1, and opposing-view gradients cancel inside the norm.
    # Densification then starves exactly where the side cameras look alone
    # — measured as the r3 multicam divergence (BASELINE.md round-4
    # bisect: clone-cam rigs, which have no such points, train healthy).
    # With 1, each camera gets its own gradient tap and the stats
    # accumulate sum_b |g_b| with denom += per-view visibility count —
    # exactly the per-view semantics of B reference batch_size=1 steps.
    multicam_percam_stats: int = 1

    iterations: int = 50_000
    coarse_iterations: int = 5000

    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000

    deformation_lr_init: float = 0.000016
    deformation_lr_final: float = 0.0000016
    deformation_lr_delay_mult: float = 0.01
    grid_lr_init: float = 0.00016
    grid_lr_final: float = 0.000016

    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    # TPU-build extension (not in the reference): per-densify-step cap on
    # size-based prunes as a fraction of alive points; 0 = off (reference
    # semantics).  See models/pool.py densify_and_prune.
    size_prune_cap: float = 0.0
    # TPU-build extension (not in the reference): keep the PRUNE-ONLY half
    # of density control (opacity/size prunes, no clone/split/reset)
    # running at densification_interval cadence after densify_until_iter.
    # 0 = off = reference semantics (train.py:489-516 stops ALL density
    # control at densify_until_iter).  Round-5 instrumentation (leg AN
    # probes, BASELINE.md) measured the post-densify collapse mechanism:
    # without opacity pruning, a low-opacity reservoir accumulates, Adam's
    # eps=1e-15 normalization random-walks it, and members re-opacify as
    # misplaced fog splats that occlude cameras.  Continuous pruning
    # removes the reservoir before it can re-materialize.
    prune_after_densify: int = 0
    lambda_dssim: float = 0.2
    lambda_depth: float = 0.5
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    pruning_interval: int = 100
    pruning_from_iter: int = 500
    densify_until_iter: int = 25_000
    densify_grad_threshold_coarse: float = 0.0002
    densify_grad_threshold_fine_init: float = 0.0002
    densify_grad_threshold_after: float = 0.0002

    opacity_threshold_coarse: float = 0.005
    opacity_threshold_fine_init: float = 0.005
    opacity_threshold_fine_after: float = 0.005

    random_background: bool = False
    # for waymo
    max_points: int = 500_000
    prune_from_iter: int = 500
    prune_interval: int = 100

    scale_ratio: float = 1.0
    # feat
    include_feature: bool = True
    language_feature_lr: float = 0.0025
    feat_dim: int = 8
    feat_conv_lr: float = 0.0001

    lambda_feat: float = 0.001
    dx_reg: bool = False
    lambda_dx: float = 0.001
    lambda_dshs: float = 0.001

    custom_xyz_scheduler: bool = False

    # deprecated in the reference but kept for config compatibility
    densify_from_iter: int = 500
    position_lr_after_iter: int = 500
    scale_ratio_threshold: float = 5.0
    hard_alpha_composite: bool = True
    alpha_mask_threshold: float = 0.8

    _shorthand = ()
    __hash__ = object.__hash__


@dataclass
class ModelHiddenParams:
    """Deformation-field hyperparameters (reference ``ModelHiddenParams``)."""

    net_width: int = 64
    timebase_pe: int = 4
    defor_depth: int = 1
    posebase_pe: int = 10
    scale_rotation_pe: int = 2
    opacity_pe: int = 2
    timenet_width: int = 64
    timenet_output: int = 32
    bounds: float = 1.6
    plane_tv_weight: float = 0.0001
    time_smoothness_weight: float = 0.01
    l1_time_planes: float = 0.0001
    kplanes_config: Dict[str, Any] = field(default_factory=lambda: {
        "grid_dimensions": 2,
        "input_coordinate_dim": 4,
        "output_coordinate_dim": 32,
        "resolution": [64, 64, 64, 25],
    })
    multires: List[int] = field(default_factory=lambda: [1, 2, 4, 8])
    no_dx: bool = False
    no_grid: bool = False
    no_ds: bool = True
    no_dr: bool = True
    no_do: bool = True
    no_dshs: bool = False
    feat_head: bool = True
    empty_voxel: bool = False
    grid_pe: int = 0
    static_mlp: bool = False
    apply_rotation: bool = False
    # TPU-only: run the hexplane gathers/products in bfloat16 (master grid
    # params stay f32; the gradient scatter-adds — the single most expensive
    # part of the train step — run at half bandwidth).  No reference analog.
    grid_compute_bf16: bool = True
    # TPU-only: rematerialize the deformation field in the backward pass
    # (jax.checkpoint) instead of saving its per-point residuals — the 24
    # gathered hexplane slices alone are ~N·32·24 floats (GBs at the 1.5M
    # LiDAR cap), which OOMs a 16 GB chip; recomputing them costs one
    # extra gather-bound forward.  No reference analog (torch autograd
    # always stores).
    remat_deform: bool = False

    _shorthand = ()
    __hash__ = object.__hash__


@dataclass
class RasterConfig:
    """Static capacities for the TPU rasterizer (new; no reference analog —
    replaces the CUDA path's dynamically-resized CUB buffers,
    ``rasterizer_impl.cu:155-194``)."""

    tile_x: int = 16           # reference config.h BLOCK_X
    tile_y: int = 16           # reference config.h BLOCK_Y
    # render budget NR (gaussians after cull/compact).  0 = auto-size from
    # the scene's init cloud at startup (train.py): 2× the largest
    # per-camera visible count, lane-rounded — the sizing rule the
    # cull_before_deform A/B showed is required for the culled path to win
    # (BASELINE.md: right-sized 1.49×, oversized −4.5%).
    max_visible: int = 1 << 19
    rect_w: int = 4            # per-gaussian tile-rect cap (width, tiles)
    rect_h: int = 4            # per-gaussian tile-rect cap (height, tiles)
    pair_budget: int = 1 << 21  # static cap on sorted pairs fed to kernels
    chunk: int = 128           # gaussians composited per kernel chunk
    # jnp-compositor-only cap on pairs scanned per tile (the Pallas kernels
    # while-loop over the true count and ignore this)
    max_pairs_per_tile: int = 1 << 14
    # fine-stage option: frustum-cull on undeformed positions (with a pixel
    # margin for |dx|) BEFORE the deformation field, so the hexplane/MLP run
    # only on the ~max_visible candidate set instead of the whole pool
    cull_before_deform: bool = False
    cull_margin_px: float = 32.0
    use_pallas: Optional[bool] = None  # None = auto (pallas on TPU backend)
    # pack color/opacity sort payloads (fwd) and per-pair gradient rows
    # (bwd unsort) as bfloat16 pairs in single u32 rows — ~20% fewer bytes
    # through both multi-M sorts.  None = auto (on when on the TPU backend,
    # where the parity budget is checked end-to-end; off for the CPU/jnp
    # oracle paths so finite-difference tests stay exact).
    sort_bf16: Optional[bool] = None
    # alpha-threshold tight tile rects (ops/project.py): emit pairs only
    # for tiles where alpha can reach 1/255 — output-invariant (both this
    # kernel and the CUDA kernel mask alpha < 1/255) but drops ~25-50% of
    # pairs.  Off = the reference's circumscribed 3σ circle rect.
    tight_rect: bool = True
    # two-class pair emission: every render slot emits a 2×2
    # center-clamped CORE; up to ``big_budget`` gaussians whose tile rect
    # exceeds 2×2 additionally emit the PERIPHERY of their rect_w×rect_h
    # rect (rect minus core) from a dedicated slot section.  Cuts the
    # pair-stream length M from NR·rect_cap to 4·NR + (rect_cap−4)·NB —
    # the sort/gather/unsort byte floor.  0 = off (single-class).  Bigs
    # beyond the budget render their core only (graceful clamp, counted
    # in overflow_rect).
    big_budget: int = 0
    # hierarchical pair sort (ops/sort_hier.py): chunked bitonic merge
    # that replaces the two M-sized lax.sorts' O(log² M) HBM comparator
    # passes with VMEM-resident chunk sorts + O(log² (M/chunk)) fused
    # passes.  Value = chunk_log2; 0 = plain lax.sort; None = auto
    # (measured policy — see _use_hier in ops/rasterizer.py).
    sort_hier: Optional[int] = None
    # multicam: force the per-camera rasterization pipelines of a
    # render_multicam batch to execute SEQUENTIALLY (an optimization
    # barrier ties camera b+1's inputs to camera b's output).  Without
    # it XLA may overlap all B pair pipelines, multiplying peak pair-
    # stream memory by B — fine at 200k, fatal at LiDAR-cap NR on a
    # 16 GB chip.  Off = scheduler's choice.
    multicam_serialize: bool = False
    # multicam: run the per-camera rasterization pipelines of a
    # render_multicam TRAINING batch under one ``lax.scan`` body instead
    # of a python-unrolled loop.  The body compiles ONCE, so the XLA
    # program stops growing with rig size — the composed rig program's
    # cold compile was 360.6 s unrolled (BENCH_r04) with B=3 copies of
    # the full sort+Pallas+custom_vjp graph.  Execution is sequential
    # across cameras, which the multicam_serialize A/B measured as free
    # (0.578 vs 0.579 steps/s at rig scale) — XLA already serializes the
    # pair pipelines there.  Also caps peak pair-stream memory at ONE
    # camera (what multicam_serialize did by hand).  0 = unrolled
    # (round-4 behavior); eval decomposition renders stay unrolled.
    multicam_scan: bool = False

    __hash__ = object.__hash__

    @property
    def rect_cap(self) -> int:
        return self.rect_w * self.rect_h

    def n_pair_slots(self, nr: int) -> int:
        """Length M of the pair-slot stream for an NR-slot render set."""
        if self.big_budget <= 0:
            return nr * self.rect_cap
        nb = min(self.big_budget, nr)
        return 4 * nr + (self.rect_cap - 4) * nb

    @property
    def max_pairs(self) -> int:
        return self.max_visible * self.rect_cap


# ---------------------------------------------------------------------------
# argparse reflection (reference arguments/__init__.py:19-45)
# ---------------------------------------------------------------------------

def add_group_args(parser: argparse.ArgumentParser, cls, name: str) -> None:
    """Register a dataclass's fields as CLI flags, replicating the
    reference's ``ParamGroup`` reflection: bools become ``store_true`` and
    shorthand fields also get ``-<first letter>``."""
    group = parser.add_argument_group(name)
    shorthand = getattr(cls, "_shorthand", ())
    for f in dataclasses.fields(cls):
        if f.name.startswith("_"):
            continue
        default = f.default if f.default is not dataclasses.MISSING else None
        if f.default_factory is not dataclasses.MISSING:  # type: ignore
            default = f.default_factory()  # type: ignore
        flags = ["--" + f.name]
        if f.name in shorthand:
            flags.append("-" + f.name[0])
        if f.type in (bool, "bool"):
            group.add_argument(*flags, default=default, action="store_true")
        elif f.type in (int, "int"):
            group.add_argument(*flags, default=default, type=int)
        elif f.type in (float, "float"):
            group.add_argument(*flags, default=default, type=float)
        elif f.type in (str, "str"):
            group.add_argument(*flags, default=default, type=str)
        # dict/list fields are config-file only (same as the reference).


def extract_group(cls, args: argparse.Namespace):
    """Build a dataclass instance from parsed args (unknown fields kept at
    defaults)."""
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name.startswith("_"):
            continue
        if hasattr(args, f.name):
            kwargs[f.name] = getattr(args, f.name)
    inst = cls(**kwargs)
    if isinstance(inst, ModelParams) and inst.source_path:
        inst.source_path = os.path.abspath(inst.source_path)
    return inst


# ---------------------------------------------------------------------------
# python-file config overrides (reference utils/params_utils.py + mmcv)
# ---------------------------------------------------------------------------

def load_config_overrides(path: str) -> Dict[str, Dict[str, Any]]:
    """Exec a reference-style config file (``arguments/nvs.py`` etc.) that
    assigns ``<GroupName> = dict(...)`` and return the override dicts."""
    scope: Dict[str, Any] = {}
    with open(path) as f:
        code = f.read()
    exec(compile(code, path, "exec"), scope)  # noqa: S102 - trusted local file
    out = {}
    for name in ("ModelParams", "PipelineParams", "OptimizationParams",
                 "ModelHiddenParams", "RasterConfig"):
        if name in scope and isinstance(scope[name], dict):
            out[name] = scope[name]
    return out


def merge_hparams(group, overrides: Dict[str, Any]):
    """Apply a config-file override dict onto a dataclass instance
    (reference ``utils/params_utils.py:1-9`` semantics: only known keys)."""
    for k, v in overrides.items():
        if hasattr(group, k):
            setattr(group, k, v)
    return group


def apply_config_file(path: str, model: ModelParams, pipe: PipelineParams,
                      opt: OptimizationParams, hyper: ModelHiddenParams,
                      cfg: Optional[RasterConfig] = None):
    ov = load_config_overrides(path)
    merge_hparams(model, ov.get("ModelParams", {}))
    merge_hparams(pipe, ov.get("PipelineParams", {}))
    merge_hparams(opt, ov.get("OptimizationParams", {}))
    merge_hparams(hyper, ov.get("ModelHiddenParams", {}))
    if cfg is not None:
        merge_hparams(cfg, ov.get("RasterConfig", {}))
    return model, pipe, opt, hyper
