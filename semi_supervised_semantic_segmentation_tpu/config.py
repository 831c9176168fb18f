"""Config system: frozen dataclass tree <- YAML/argparse.

Mirrors the reference's config surface (SURVEY.md §5 "Config / flag system"):
dataset, data_root, split (1_16|1_8|1_4|full), method
(supervised|mean_teacher|fixmatch_cutmix|cps), backbone
(resnet18|resnet50|resnet101|hrnet_w48), decoder (unet|deeplabv3plus),
crop_size, labeled/unlabeled batch sizes, lr, momentum, weight_decay, epochs,
ema_alpha, conf_thresh, consistency weight + ramp-up, seed, resume,
eval_interval.  The five experiment configs from BASELINE.json:7-11 are
checked in under ``configs/``.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import yaml


@dataclass(frozen=True)
class DataConfig:
    dataset: str = "voc"  # voc | cityscapes | synthetic
    data_root: str = "./data"
    split: str = "1_8"  # labeled fraction: 1_16 | 1_8 | 1_4 | full
    num_classes: int = 21
    ignore_index: int = 255
    crop_size: int = 512
    # Weak-aug random scale range (applied on device).
    scale_min: float = 0.5
    scale_max: float = 2.0
    hflip_prob: float = 0.5
    # Normalization (ImageNet stats, matching torchvision defaults).
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    # Strong-aug color jitter strengths (torchvision ColorJitter semantics).
    jitter_brightness: float = 0.5
    jitter_contrast: float = 0.5
    jitter_saturation: float = 0.5
    jitter_hue: float = 0.25
    jitter_prob: float = 0.8
    grayscale_prob: float = 0.2
    blur_prob: float = 0.5
    # On-device aug implementation: 'matmul' (MXU hat-weights) | 'gather'.
    aug_impl: str = "matmul"
    # CutMix+normalize implementation in the fixmatch step: 'xla' (fused by
    # the compiler) | 'pallas' (ops.pallas_aug single-pass kernel with
    # on-chip PRNG; falls back to interpret mode off-TPU).
    cutmix_impl: str = "xla"
    # Host pipeline.
    num_workers: int = 4
    # Synthetic dataset controls (tests / CPU-runnable config 1).
    synthetic_size: int = 64
    # Gapped-blobs SSL fixture: labeled images draw blob appearance from a
    # narrow range of the hue continuum while unlabeled/val span the full
    # range — the distribution gap pseudo-labeling needs to show a gain
    # over supervised-only without real data.
    synthetic_gapped: bool = False
    # Synthetic canvas side in pixels (0 = the 96^2 test default).  Set to
    # >= crop_size for production-crop convergence runs so the random
    # scale-crop sees a real canvas instead of upsampled 96^2 texture.
    synthetic_canvas: int = 0
    # Eval: "whole" images resized to eval_size, or "sliding" window.
    eval_mode: str = "whole"
    eval_size: int = 0  # 0 = use native (padded) size
    eval_stride: int = 0  # sliding-window stride; 0 = crop_size * 2 // 3
    # Test-time augmentation (the reference genre's final-number protocol):
    # average class probabilities over the mirrored view and/or multiple
    # input scales (sizes snap to the encoder stride).
    eval_flip: bool = False
    eval_scales: Tuple[float, ...] = (1.0,)
    # TTA program structure: 'fused' unrolls every window x scale x flip
    # into ONE jitted program (fine at train-loop shapes); 'staged' runs one
    # jitted program PER SCALE with all same-shape windows stacked into one
    # batched forward (flip folded in) and sums probabilities on host —
    # same math, compile time linear in #scales instead of one giant
    # program (the production 1024x2048 protocol).  'auto' picks staged
    # when the program would multiply (sliding+TTA or >2 scales).
    eval_impl: str = "auto"  # auto | fused | staged
    # Staged evaluator: cap on windows per batched forward (0 = all K
    # windows of a scale in one forward; lower it if HBM is tight).
    eval_window_batch: int = 0


@dataclass(frozen=True)
class ModelConfig:
    backbone: str = "resnet50"  # resnet18 | resnet50 | resnet101 | hrnet_w48
    decoder: str = "deeplabv3plus"  # unet | deeplabv3plus | hrnet_head
    output_stride: int = 16  # dilated backbone stride for deeplab (8|16|32)
    pretrained: str = ""  # path to a torch state-dict (.pt/.pth/.safetensors)
    norm: str = "batchnorm"  # batchnorm | groupnorm
    bn_momentum: float = 0.9  # flax momentum convention: ra = m*ra + (1-m)*x
    # Rematerialization: 'none' | 'blocks' (checkpoint every residual block /
    # HR module — trades ~1/3 more FLOPs for O(depth) less activation HBM;
    # required for HRNet-W48 @ 1024^2).
    remat: str = "none"
    # ResNet stem: 'conv' | 's2d' (space-to-depth stem, exact-equivalent)
    stem_impl: str = "conv"
    # HRNet stride-2 fuse-down/transition convs: 'conv' | 's2d'
    fuse_impl: str = "conv"
    # HRNet branch BasicBlock convs: 'xla' | 'pallas' (layout-pinned NCHW
    # kernel for the C<=128 branches, exact same math/params — BASELINE.md)
    branch_conv: str = "xla"
    # HRNetV2 head fuse order: 'conv_first' (per-branch 1x1 at native res,
    # upsample the 720-wide result) | 'up_first' (upsample the branch-width
    # tap, conv at base res) — same math/params, perf A/B (BASELINE.md).
    head_fuse: str = "conv_first"
    compute_dtype: str = "bfloat16"  # activations/conv compute dtype
    aspp_dilations: Tuple[int, ...] = (6, 12, 18)
    decoder_channels: int = 256
    # HRNet sizing (test/dryrun surface): branch-0 width and per-stage module
    # counts.  The production config-5 values are the defaults; miniaturized
    # models (width 8, modules (1,1,1)) exercise the exact same code path.
    hrnet_width: int = 48
    hrnet_modules: Tuple[int, int, int] = (1, 4, 3)


@dataclass(frozen=True)
class MethodConfig:
    name: str = "supervised"  # supervised | mean_teacher | fixmatch_cutmix | cps
    ema_alpha: float = 0.99
    conf_thresh: float = 0.95
    consistency_weight: float = 1.0  # lambda for unsupervised loss
    rampup_iters: int = 0  # 0 = no ramp-up; else sigmoid ramp over N iters
    rampup_kind: str = "sigmoid"  # sigmoid | linear
    cps_weight: float = 1.5
    # CPS dual-net execution: 'stacked' (params on a leading net axis, one
    # vmapped apply -> conv with batch_group_count=2 at doubled batch) |
    # 'separate' (two sequential forwards).  Identical math.
    cps_impl: str = "stacked"
    cutmix_prob: float = 1.0
    # Supervised CE variant: 'ce' | 'ohem' (online hard example mining, the
    # Cityscapes recipe of the CPS/HRNet lineage).
    sup_loss: str = "ce"
    ohem_thresh: float = 0.7
    ohem_min_kept: int = 100000
    # MSE consistency normalization: "mean" over all elements (torch
    # F.mse_loss default) or "classes" (sum over classes / pixels).
    consistency_reduction: str = "mean"


@dataclass(frozen=True)
class OptimConfig:
    optimizer: str = "sgd"
    lr: float = 0.01
    momentum: float = 0.9
    weight_decay: float = 1e-4
    nesterov: bool = False
    poly_power: float = 0.9
    head_lr_mult: float = 10.0  # 10x LR on decoder/head params
    grad_clip_norm: float = 0.0  # 0 = off


@dataclass(frozen=True)
class TrainConfig:
    epochs: int = 80
    # Per-*global*-batch sizes (split across the data mesh axis).
    labeled_batch_size: int = 8
    unlabeled_batch_size: int = 8
    eval_batch_size: int = 8
    iters_per_epoch: int = 0  # 0 = ceil(len(unlabeled)/batch)
    eval_interval: int = 1  # epochs between evals
    log_interval: int = 50  # steps between scalar logs
    seed: int = 0
    resume: str = ""  # checkpoint dir/step to resume from
    # Initialize params/EMA/net2 from a reference-layout torch checkpoint
    # (the BASELINE.json:5 "same checkpoint format" contract; engine.compat).
    init_from_torch: str = ""
    work_dir: str = "./runs/default"
    checkpoint_interval: int = 1  # epochs between checkpoint saves
    keep_checkpoints: int = 3
    async_checkpoint: bool = True
    debug_nans: bool = False
    profile_steps: int = 0  # if >0, trace this many steps to TB profile


@dataclass(frozen=True)
class ParallelConfig:
    # -1 = use all visible devices on the data axis.
    data_parallel: int = -1
    # >1 enables SPATIAL partitioning over the 'model' mesh axis: the HRNet
    # stem's full/half-resolution activations are H-sharded with halo
    # exchange over ICI (parallel/spatial.py; hrnet_w48 only).  There is no
    # tensor parallelism — convnets at these sizes don't need it.
    model_parallel: int = 1
    mesh_axes: Tuple[str, str] = ("data", "model")


@dataclass(frozen=True)
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    method: MethodConfig = field(default_factory=MethodConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    name: str = "experiment"

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


_SECTIONS = {
    "data": DataConfig,
    "model": ModelConfig,
    "method": MethodConfig,
    "optim": OptimConfig,
    "train": TrainConfig,
    "parallel": ParallelConfig,
}

# Flat reference-style key aliases -> (section, field).  Lets a config written
# against the reference's flat argparse surface load unchanged.
_FLAT_ALIASES = {
    "dataset": ("data", "dataset"),
    "data_root": ("data", "data_root"),
    "split": ("data", "split"),
    "num_classes": ("data", "num_classes"),
    "ignore_index": ("data", "ignore_index"),
    "crop_size": ("data", "crop_size"),
    "backbone": ("model", "backbone"),
    "decoder": ("model", "decoder"),
    "output_stride": ("model", "output_stride"),
    "pretrained": ("model", "pretrained"),
    "method": ("method", "name"),
    "ema_alpha": ("method", "ema_alpha"),
    "ema_decay": ("method", "ema_alpha"),
    "conf_thresh": ("method", "conf_thresh"),
    "confidence_threshold": ("method", "conf_thresh"),
    "consistency_weight": ("method", "consistency_weight"),
    "lambda_u": ("method", "consistency_weight"),
    "cps_weight": ("method", "cps_weight"),
    "rampup_iters": ("method", "rampup_iters"),
    "lr": ("optim", "lr"),
    "base_lr": ("optim", "lr"),
    "momentum": ("optim", "momentum"),
    "weight_decay": ("optim", "weight_decay"),
    "poly_power": ("optim", "poly_power"),
    "epochs": ("train", "epochs"),
    "batch_size": ("train", "labeled_batch_size"),
    "labeled_batch_size": ("train", "labeled_batch_size"),
    "unlabeled_batch_size": ("train", "unlabeled_batch_size"),
    "seed": ("train", "seed"),
    "resume": ("train", "resume"),
    "work_dir": ("train", "work_dir"),
    "eval_interval": ("train", "eval_interval"),
}


def _coerce(cls: type, value: Any, fname: str) -> Any:
    """Coerce YAML scalars/lists to the dataclass field's declared type."""
    ftypes = {f.name: f.type for f in dataclasses.fields(cls)}
    t = ftypes[fname]
    if isinstance(value, list):
        return tuple(value)
    if t in ("float", float) and isinstance(value, int):
        return float(value)
    return value


def _build_section(cls: type, d: Dict[str, Any], path: str):
    known = {f.name for f in dataclasses.fields(cls)}
    unknown = set(d) - known
    if unknown:
        raise ValueError(f"Unknown config keys in '{path}': {sorted(unknown)}")
    return cls(**{k: _coerce(cls, v, k) for k, v in d.items()})


def config_from_dict(raw: Dict[str, Any]) -> Config:
    raw = dict(raw or {})
    name = raw.pop("name", "experiment")
    sections: Dict[str, Dict[str, Any]] = {}
    for k in _SECTIONS:
        v = raw.pop(k, {}) or {}
        if not isinstance(v, dict):
            # Scalar under a section name is the reference's flat spelling
            # (e.g. ``method: fixmatch_cutmix``) — route through the aliases.
            raw[k] = v
            v = {}
        sections[k] = dict(v)
    # Remaining top-level keys must be flat aliases.
    for key, value in raw.items():
        if key not in _FLAT_ALIASES:
            raise ValueError(f"Unknown config key: '{key}'")
        section, fname = _FLAT_ALIASES[key]
        sections[section].setdefault(fname, value)
    built = {
        sec: _build_section(cls, sections[sec], sec) for sec, cls in _SECTIONS.items()
    }
    cfg = Config(name=name, **built)
    validate(cfg)
    return cfg


def load_config(path: str, overrides: Optional[Dict[str, Any]] = None) -> Config:
    """Load a YAML config file, optionally applying dotted-key overrides.

    Overrides use dotted paths, e.g. ``{"optim.lr": 0.02, "train.epochs": 1}``.
    """
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    if overrides:
        for dotted, value in overrides.items():
            parts = dotted.split(".")
            node = raw
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = value
    return config_from_dict(raw)


def update_config(cfg: Config, overrides: Dict[str, Any]) -> Config:
    """Return a new Config with dotted-path overrides applied."""
    raw = cfg.to_dict()
    raw["name"] = cfg.name
    for dotted, value in overrides.items():
        parts = dotted.split(".")
        node = raw
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = value
    return config_from_dict(raw)


_VALID = {
    "data.dataset": {"voc", "cityscapes", "synthetic"},
    "data.split": {"1_16", "1_8", "1_4", "full"},
    "data.aug_impl": {"matmul", "gather"},
    "data.cutmix_impl": {"xla", "pallas"},
    "data.eval_mode": {"whole", "sliding"},
    "data.eval_impl": {"auto", "fused", "staged"},
    "model.backbone": {"resnet18", "resnet50", "resnet101", "hrnet_w48"},
    "model.decoder": {"unet", "deeplabv3plus", "hrnet_head"},
    "model.stem_impl": {"conv", "s2d", "pallas"},
    "model.fuse_impl": {"conv", "s2d"},
    "model.head_fuse": {"conv_first", "up_first"},
    "model.branch_conv": {"xla", "pallas"},
    "method.name": {"supervised", "mean_teacher", "fixmatch_cutmix", "cps"},
    "method.sup_loss": {"ce", "ohem"},
    "method.cps_impl": {"stacked", "separate"},
}


def validate(cfg: Config) -> None:
    if not cfg.data.eval_scales or any(
        not isinstance(s, (int, float)) or s <= 0 for s in cfg.data.eval_scales
    ):
        raise ValueError(
            f"data.eval_scales must be positive numbers, got {cfg.data.eval_scales!r}"
        )
    for dotted, allowed in _VALID.items():
        sec, fname = dotted.split(".")
        val = getattr(getattr(cfg, sec), fname)
        if val not in allowed:
            raise ValueError(f"{dotted}={val!r} not in {sorted(allowed)}")
    if cfg.model.output_stride not in (8, 16, 32):
        raise ValueError(f"output_stride must be 8, 16 or 32, got {cfg.model.output_stride}")
    if cfg.parallel.model_parallel < 1:
        raise ValueError("model_parallel must be >= 1")
    if cfg.parallel.model_parallel > 1 and cfg.model.backbone != "hrnet_w48":
        raise ValueError(
            "parallel.model_parallel > 1 (spatial stem sharding) is only "
            "wired for backbone hrnet_w48"
        )
    if cfg.data.crop_size % 32 != 0:
        raise ValueError("crop_size must be a multiple of 32 (encoder stride)")
    if cfg.data.eval_window_batch < 0:
        raise ValueError("data.eval_window_batch must be >= 0 (0 = no chunking)")
    r = cfg.model.remat
    stages_ok = False
    for prefix in ("stages:", "branches:"):
        if r.startswith(prefix):
            tokens = r[len(prefix):].split(",")
            stages_ok = bool(tokens) and all(
                s in {"1", "2", "3", "4"} for s in tokens
            )
    if not (r in ("none", "", "blocks", "branches") or stages_ok):
        raise ValueError(
            f"model.remat={r!r}: expected 'none', 'blocks', 'branches', "
            "'stages:i,j', or 'branches:i,j' with single-digit stages from "
            "1-4 (HRNet: 1 = layer1; 'branches' scope checkpoints only the "
            "residual-block chains, leaving fuse layers stored)"
        )
    # 'branches' / 'stages:' are HRNet-specific plans; ResNet backbones only
    # distinguish remat on/off, so accepting these would silently run full
    # block remat instead of what the user asked for.
    if r in ("branches",) or r.startswith("stages:") or r.startswith("branches:"):
        if cfg.model.backbone != "hrnet_w48":
            raise ValueError(
                f"model.remat={r!r} is an HRNet-only plan; use 'blocks' or "
                f"'none' with backbone={cfg.model.backbone!r}"
            )
    if cfg.model.branch_conv == "pallas" and cfg.model.backbone != "hrnet_w48":
        raise ValueError(
            "model.branch_conv=pallas is the HRNet branch-chain conv path; "
            f"it has no effect with backbone={cfg.model.backbone!r}"
        )
    # Multi-scale TTA + resize-eval degenerate together: whole_logits resizes
    # every scaled view back to eval_size^2 before the forward, so all scales
    # become near-duplicate forwards (only resampling noise differs).
    if tuple(cfg.data.eval_scales) != (1.0,) and cfg.data.eval_size > 0:
        raise ValueError(
            "data.eval_scales with data.eval_size > 0 makes every scale a "
            "near-duplicate forward (views are re-resized to eval_size); "
            "set eval_size: 0 for multi-scale TTA"
        )


def save_config(cfg: Config, path: str) -> None:
    d = cfg.to_dict()
    d["name"] = cfg.name
    with open(path, "w") as f:
        yaml.safe_dump(d, f, sort_keys=False)
