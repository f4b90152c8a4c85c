"""Dataclass config tree + registry + CLI/yaml overrides.

Replaces the reference's three config mechanisms (class hierarchy with
''-defaults, `gen_config` cartesian expansion, `--set k:v` CLI overrides —
tensorflow/config/base.py, config/utils.py:21-146; pytorch/util/config.py
CfgNode + yaml) with one typed tree. The op-string head DSL is preserved via
config/dsl.py; named presets live in a registry keyed like the reference's
`config.s3dis.xxx` paths.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Optional, Tuple

from ..losses.contrast import ContrastConfig
from ..ops.pyramid import PyramidSpec
from .dsl import parse_arch_out


@dataclasses.dataclass
class DataConfig:
    dataset: str = "synthetic"  # synthetic | s3dis
    data_root: str = ""
    test_area: int = 5
    num_classes: int = 13
    fea_dim: int = 3  # rgb
    voxel_size: float = 0.04
    voxel_max: int = 24000
    n_points: int = 16384  # static crop size (device shape)
    loop: int = 30
    ignore_label: int = -1
    crop_mode: str = "count"  # count (PT nearest-N) | radius (TF in_radius sphere)
    in_radius: float = 2.0
    # train crop centers: 'random' (PT stack, util/data_util.py:45-90) |
    # 'potential' (TF spatially-regular sampler, datasets/base.py:352-448 —
    # the ConvNet recipe; see data/pipeline.py::PotentialSampler)
    sampler: str = "random"
    # synthetic-only
    num_rooms: int = 16
    points_per_room: int = 120_000
    ignore_fraction: float = 0.0


@dataclasses.dataclass
class ModelConfig:
    arch: str = "pointtransformer"  # pointtransformer | convnet
    planes: Tuple[int, ...] = (32, 64, 128, 256, 512)
    blocks: Tuple[int, ...] = (2, 3, 4, 6, 3)
    share_planes: int = 8
    base_fdim: int = 32
    strides: Tuple[int, ...] = (1, 4, 4, 4, 4)
    nsample: Tuple[int, ...] = (8, 16, 16, 16, 16)  # backbone knn
    contrast_nsample: Tuple[int, ...] = (36, 24, 24, 24, 24)
    sampler: str = "bucket_fps"
    dtype: str = "float32"  # float32 | bfloat16
    save_memory: bool = False  # remat transformer blocks in backward
    # >0: Morton-tile windowed KNN in the pyramid (4x faster at N=65k,
    # recall ~0.97 at 4); 0 = dense approx (default, exact-recall parity)
    knn_window: int = 0
    # 'sorted': every pyramid level is kept Morton-sorted and the backbone
    # self-attention + CBL neighbor gathers run as tile-local one-hot MXU
    # matmuls (ops/tile_gather.py) — the point-transformer fast path.
    # ConvNet (global shadow-index radius semantics) requires 'natural'.
    layout: str = "natural"  # natural | sorted
    # 'tile': tile-local CBL gathers under the NATURAL layout (sorts the
    # contrast stages on the fly; implied for every stage under 'sorted')
    contrast_mode: str = "dense"  # dense | tile
    # BN semantics: 'batch' = exact nn.BatchNorm (reference parity);
    # 'stale' = normalize with running stats + update from batch stats
    # (fold-friendly fast path; models/blocks.py::StaleBatchNorm)
    bn_mode: str = "batch"
    # tile-window half-widths (sorted layout) and the approx-top-k recall
    # target (0 → exact lax.top_k; cheap within tile windows)
    self_window: int = 1
    contrast_window: int = 1
    knn_recall: float = 0.95
    # --- convnet family (reference config/s3dis/adapt.yaml defaults) ---
    aggregation: str = "adaptive_weight"  # pospool | adaptive_weight | pointwisemlp | pseudo_grid | identity
    agg_kwargs: Tuple[Tuple[str, Any], ...] = ()
    bottleneck_ratio: int = 2
    depth: int = 1
    base_radius: float = 0.1  # first_subsampling_dl * density_parameter / 2
    density_parameter: float = 5.0
    in_features: str = "1-rgb-Z"
    # radius-masked knn caps per level (reference neighborhood_limits)
    neighborhood_limits: Tuple[int, ...] = (26, 31, 38, 41, 39)


@dataclasses.dataclass
class OptimConfig:
    optimizer: str = "sgd"
    base_lr: float = 0.5
    momentum: float = 0.9
    weight_decay: float = 1e-4
    grad_clip_norm: Optional[float] = None
    schedule: str = "multistep"  # multistep | exponential
    milestones: Tuple[float, ...] = (0.6, 0.8)  # fraction of epochs
    multiplier: float = 0.1
    decay_rate: float = 0.9885531  # exponential (ConvNet recipe)
    epochs: int = 200
    batch_size: int = 4


@dataclasses.dataclass
class EvalConfig:
    batch_size: int = 4
    num_votes: float = 2.0
    smooth: float = 0.95
    eval_freq: int = 1


@dataclasses.dataclass
class Config:
    name: str = "default"
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    # head spec in the reference DSL; '' disables a head
    arch_out: str = "multi-Ua-concat-latent|contrast-Ua-softnn-latent-label-l2-w.1"
    seed: int = 7777
    save_path: str = "results"
    log_freq: int = 10
    save_freq: int = 1
    debug_nan: bool = False  # dump reproducer + per-var NaN stats on NaN loss
    runtime_freq: int = 0  # >0: capture a jax.profiler trace every N steps

    @property
    def num_layers(self) -> int:
        return len(self.model.strides)

    @property
    def heads(self) -> dict:
        return parse_arch_out(self.arch_out, self.num_layers) if self.arch_out else {}

    @property
    def contrast(self) -> Optional[ContrastConfig]:
        return self.heads.get("contrast")

    @property
    def use_multihead(self) -> bool:
        return "multi" in self.heads

    @property
    def _needs_subscene(self) -> bool:
        """Sub-scene label KNNs are needed by CBL and by the multi head's
        'lossSub' per-stage soft-label supervision."""
        multi = self.heads.get("multi", {})
        return self.contrast is not None or multi.get("branch_loss") == "lossSub"

    def pyramid_spec(self) -> PyramidSpec:
        m = self.model
        if m.arch == "convnet" and m.layout != "natural":
            raise ValueError(
                "model.layout='sorted' is the point-transformer fast path; "
                "convnet needs global shadow-index neighbors (layout='natural')"
            )
        if m.arch == "convnet":
            nl = len(m.strides)
            radii = tuple(m.base_radius * 2**i for i in range(nl))
            limits = tuple(m.neighborhood_limits[:nl])
            # pooling (level l-1 → l) uses the SOURCE-level radius and cap
            # (reference kr_sample = kr_search[:-1] and neighborhood_limits at
            # the source stage, tensorflow/datasets/base.py:797-799):
            # down_radii[l]/k_down[l] apply to the search at slot l, so shift.
            down_radii = (radii[0],) + radii[:-1]
            k_down = (limits[0],) + limits[:-1]
            return PyramidSpec(
                strides=tuple(m.strides),
                k_self=limits,
                k_down=k_down,
                k_contrast=tuple(m.contrast_nsample) if self.contrast else None,
                with_subscene=self._needs_subscene,
                sampler=m.sampler,
                knn_window=m.knn_window,
                radii=radii,
                down_radii=down_radii,
                voxel_sizes=tuple(
                    self.data.voxel_size * 2**i for i in range(nl)
                ),
            )
        return PyramidSpec(
            strides=tuple(m.strides),
            k_self=tuple(m.nsample),
            k_down=tuple(m.nsample),
            k_contrast=tuple(m.contrast_nsample) if self.contrast else None,
            with_subscene=self._needs_subscene,
            sampler=m.sampler,
            knn_window=m.knn_window,
            layout=m.layout,
            contrast_mode=m.contrast_mode,
            self_window=m.self_window,
            contrast_window=m.contrast_window,
            knn_recall=m.knn_recall if m.knn_recall > 0 else None,
        )

    def build_model(self):
        import jax.numpy as jnp

        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
            self.model.dtype
        ]
        multi = self.heads.get("multi", {})
        mlp = self.heads.get("mlp", {})
        if multi and mlp:
            raise ValueError(
                "arch_out selects both a 'multi' and a plain 'mlp' head; "
                "the model builds exactly one prediction path — pick one"
            )
        head_kw = dict(
            use_multihead=self.use_multihead,
            mlp_depth=mlp.get("depth", 1),
            mlp_drop=mlp.get("drop"),
            bn_mode=self.model.bn_mode,
            multi_combine=multi.get("combine", "concat"),
            multi_stages=multi.get("stages"),
            multi_ftype=multi.get("ftype", "latent"),
            multi_branch_loss=multi.get("branch_loss", ""),
            multi_condition=multi.get("condition", ""),
            multi_sep_head=multi.get("sep_head", False),
            contrast_project=(self.contrast.project if self.contrast else ""),
            contrast_ftype=(self.contrast.ftype if self.contrast else "latent"),
        )
        if self.model.arch == "pointtransformer":
            from ..models import PointTransformerSeg

            return PointTransformerSeg(
                num_classes=self.data.num_classes,
                planes=tuple(self.model.planes),
                blocks=tuple(self.model.blocks),
                share_planes=self.model.share_planes,
                base_fdim=self.model.base_fdim,
                save_memory=self.model.save_memory,
                dtype=dtype,
                **head_kw,
            )
        if self.model.arch == "convnet":
            from ..models.convnet import ConvNetSeg

            return ConvNetSeg(
                num_classes=self.data.num_classes,
                base_fdim=self.model.base_fdim,
                bottleneck_ratio=self.model.bottleneck_ratio,
                depth=self.model.depth,
                base_radius=self.model.base_radius,
                num_layers=len(self.model.strides),
                aggregation=self.model.aggregation,
                agg_kwargs=tuple(self.model.agg_kwargs),
                density_parameter=self.model.density_parameter,
                in_features=self.model.in_features,
                dtype=dtype,
                **head_kw,
            )
        raise ValueError(f"unknown arch {self.model.arch!r}")


def _update_dataclass(obj, updates: Dict[str, Any]):
    for k, v in updates.items():
        if "." in k:
            head, rest = k.split(".", 1)
            _update_dataclass(getattr(obj, head), {rest: v})
        else:
            if not hasattr(obj, k):
                raise KeyError(f"unknown config key {k!r} on {type(obj).__name__}")
            cur = getattr(obj, k)
            if isinstance(cur, (DataConfig, ModelConfig, OptimConfig, EvalConfig)):
                _update_dataclass(cur, v)
            else:
                if isinstance(cur, tuple) and isinstance(v, (list, tuple)):
                    v = tuple(v)
                setattr(obj, k, v)


CONFIGS: Dict[str, Dict[str, Any]] = {}


def register_config(name: str, **overrides):
    CONFIGS[name] = overrides


def gen_configs(base_name: str, base: Dict[str, Any], axes: Dict[str, list]):
    """Cartesian expansion of config axes into named presets — the
    reference's `gen_config` (tensorflow/config/utils.py:21-53), which turns
    `_attr_dict` op-string lists into a registry of named configs.

    axes: {dotted.key: [values]}; each combination is registered as
    `<base_name>_<v1>_<v2>…` (values stringified, '|' and '.' kept — the
    names ARE the reference's public config ids).
    """
    import itertools

    keys = list(axes)
    names = []
    for combo in itertools.product(*(axes[k] for k in keys)):
        suffix = "_".join(str(v) for v in combo if str(v))
        name = f"{base_name}_{suffix}" if suffix else base_name
        overrides = {k: dict(v) if isinstance(v, dict) else v for k, v in base.items()}
        for k, v in zip(keys, combo):
            if "." in k:
                head, sub = k.split(".", 1)
                overrides.setdefault(head, {})
                overrides[head] = dict(overrides[head])
                overrides[head][sub] = v
            else:
                overrides[k] = v
        register_config(name, **overrides)
        names.append(name)
    return names


def load_yaml_config(path: str) -> Dict[str, Any]:
    """Read a YAML update file into an override dict — the reference's
    config-file mechanism (tensorflow/config/utils.py:87-146 merges YAMLs
    like config/s3dis/adapt.yaml over generated configs; the whole PyTorch
    stack is YAML-configured, pytorch/util/config.py CfgNode).

    Keys are this repo's dotted config paths (`data.voxel_size: 0.02`) or
    nested sections (`data: {voxel_size: 0.02}`) — the same namespace as
    `--set`, so a reference YAML translates key-for-key. An optional `_base`
    key names the preset the file extends (default: the CLI `-c` preset)."""
    import yaml

    with open(path) as f:
        d = yaml.safe_load(f) or {}
    if not isinstance(d, dict):
        raise ValueError(f"config file {path!r} must be a YAML mapping")
    return d


def load_config(
    name: str = "default",
    sets: Optional[str] = None,
    cfg_file: Optional[str] = None,
) -> Config:
    """Named preset + optional YAML update file + `--set a.b:v;c:v` overrides
    (reference main.py:42-44 + config/utils.py:87-146). Precedence: preset <
    YAML < --set. `name` may itself be a `.yaml`/`.yml` path — its `_base`
    key (or 'default') picks the preset it extends."""
    from . import s3dis as _s3dis  # noqa: F401  (registers presets)

    yaml_overrides: Dict[str, Any] = {}
    if name.endswith((".yaml", ".yml")):
        import os

        yaml_overrides = load_yaml_config(name)
        base = yaml_overrides.pop("_base", "default")
        cfg = Config(name=os.path.splitext(os.path.basename(name))[0])
        if base not in CONFIGS:
            raise KeyError(f"unknown _base {base!r}; known: {sorted(CONFIGS)}")
        _update_dataclass(cfg, CONFIGS[base])
    else:
        cfg = Config(name=name)
        if name not in CONFIGS:
            raise KeyError(f"unknown config {name!r}; known: {sorted(CONFIGS)}")
        _update_dataclass(cfg, CONFIGS[name])
    if cfg_file:
        upd = load_yaml_config(cfg_file)
        upd.pop("_base", None)  # the -c / path preset already decided
        yaml_overrides.update(upd)
    if yaml_overrides:
        _update_dataclass(cfg, yaml_overrides)
    if sets:
        upd = {}
        for kv in sets.split(";"):
            if not kv:
                continue
            k, v = kv.split(":", 1)
            try:
                v = json.loads(v)
            except json.JSONDecodeError:
                pass
            upd[k.strip()] = v
        _update_dataclass(cfg, upd)
    return cfg
