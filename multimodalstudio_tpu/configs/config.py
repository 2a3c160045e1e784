"""Top-level configuration tree.

TPU-native counterpart of reference src/configs/configs.py: a dataclass tree
(frozen specs, so they double as static jit arguments), a method registry
(configs/methods.py), YAML leaf-value overrides, and a small CLI. The
Config/Impl `setup()` idiom of the reference collapses into specs consumed by
pure factory functions — modules are selected statically by the spec shape.
"""

from __future__ import annotations

import dataclasses
import datetime
import os
from typing import Any, Dict, Optional, Sequence, Tuple

from multimodalstudio_tpu.cameras.camera_optimizer import CameraOptimizerSpec
from multimodalstudio_tpu.engine.losses import LossManagerSpec
from multimodalstudio_tpu.engine.schedules import MultiStepWarmupSpec
from multimodalstudio_tpu.models.model import ModelSpec


@dataclasses.dataclass(frozen=True)
class OptimizerSpec:
    """AdamW group (reference engine/optimizers.py:36-65)."""

    optimizer: str = "adamw"  # adam | adamw | radam
    lr: float = 1e-3
    weight_decay: float = 0.01
    eps: float = 1e-15
    betas: Tuple[float, float] = (0.9, 0.999)
    scheduler: Optional[MultiStepWarmupSpec] = MultiStepWarmupSpec()
    max_norm: float = 2.0  # gradient clipping (reference base_pipeline.py:232-248)


@dataclasses.dataclass(frozen=True)
class DataManagerSpec:
    """Reference DataManagerConfig (data/datamanager.py)."""

    dataset_kind: str = "aligned"  # aligned | unaligned
    raw: bool = False
    num_rays_per_modality: int = 2048
    device_cache: bool = True  # cache frames in HBM, sample pixels in-jit
    quantize_cache: bool = True  # store frames uint16 (halves HBM + bandwidth)
    microbatch_rays: int = 0  # rays/modality per grad-accumulation slice (0 = whole batch)
    eval_image_indices: Tuple[int, ...] = (9, 19, 29, 39, 49)
    eval_indices_per_modality: Optional[Tuple[Tuple[str, Tuple[int, ...]], ...]] = None
    # training views to drop per modality (unbalanced-view experiments,
    # reference confs/grid_raw_rgb_all_views_pol_10_views.yaml)
    skip_indices_per_modality: Optional[Tuple[Tuple[str, Tuple[int, ...]], ...]] = None
    eval_ratio: float = 0.0
    camera_optimizer: CameraOptimizerSpec = CameraOptimizerSpec()


@dataclasses.dataclass(frozen=True)
class EvaluatorSpec:
    """Reference EvaluatorConfig (engine/evaluator.py)."""

    eval_num_rays_per_chunk: int = 1024
    rendering_scale: float = 0.25
    roi_only: bool = True
    accumulation_mask_threshold: float = 0.9
    export_mesh: bool = False
    export_poses: bool = False
    mesh_resolution: int = 256
    marching_cube_threshold: float = 0.0
    gt_scale: bool = False


@dataclasses.dataclass(frozen=True)
class LoggingSpec:
    steps_per_log: int = 100
    steps_per_flush_buffer: int = 100
    max_buffer_size: int = 20
    local_writer: bool = True
    enable_profiler: bool = False
    profiler_steps: Tuple[int, ...] = (12, 17)
    vis: str = "tensorboard"  # tensorboard | wandb | none
    # (reference configs.py:105-112 exposes the same writer choice)


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    """Reference TrainerConfig (configs.py:116-165)."""

    method_name: str = "grid"
    max_num_iterations: int = 100000
    steps_per_eval_batch: int = 100
    steps_per_eval_image: int = 1000
    steps_per_eval_all_images: int = 25000
    steps_per_export_mesh: int = 5000
    steps_per_export_poses: int = 5000
    steps_per_save: int = 5000
    save_only_latest_checkpoint: bool = True
    mixed_precision: bool = False
    matmul_precision: str = "high"  # highest | high | default
    seed: int = 654824  # reference trainer.py:64
    n_devices: int = 0  # 0 = all available

    modalities: Tuple[str, ...] = ("rgb",)
    datamanager: DataManagerSpec = DataManagerSpec()
    model: ModelSpec = ModelSpec()
    loss_manager: LossManagerSpec = LossManagerSpec()
    optimizers: Tuple[Tuple[str, OptimizerSpec], ...] = (
        ("fields", OptimizerSpec(lr=1e-3)),
        ("camera_poses", OptimizerSpec(lr=1e-4)),
    )
    evaluator: EvaluatorSpec = EvaluatorSpec()
    logging: LoggingSpec = LoggingSpec()

    load_dir: Optional[str] = None
    load_step: Optional[int] = None

    def optimizer_spec(self, group: str) -> OptimizerSpec:
        for name, spec in self.optimizers:
            if name == group:
                return spec
        return OptimizerSpec()


def apply_mixed_precision(config: "TrainerConfig") -> "TrainerConfig":
    """Set every MLP's compute dtype to bfloat16 (the reference's 16-mixed
    precision, trainer.py:57-63). Parameters and reductions stay float32."""
    from multimodalstudio_tpu.fields.mlp import MLPSpec

    def walk(obj):
        if isinstance(obj, MLPSpec):
            return dataclasses.replace(obj, dtype="bfloat16")
        if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
            return dataclasses.replace(
                obj, **{f.name: walk(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
            )
        if isinstance(obj, tuple):
            return tuple(walk(v) for v in obj)
        return obj

    return walk(config)


def apply_fused_mlp(config: "TrainerConfig") -> "TrainerConfig":
    """Opt every (eligible) MLP into the fused Pallas chain
    (ops/pallas/fused_mlp) — the TPU counterpart of tcnn FullyFusedMLP.
    Geometry eligibility is re-checked per-MLP at apply time
    (fields/mlp.py::can_fuse); ineligible MLPs fall back to the layer loop."""
    from multimodalstudio_tpu.fields.mlp import MLPSpec

    def walk(obj):
        if isinstance(obj, MLPSpec):
            return dataclasses.replace(obj, fused=True)
        if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
            return dataclasses.replace(
                obj, **{f.name: walk(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
            )
        if isinstance(obj, tuple):
            return tuple(walk(v) for v in obj)
        return obj

    return walk(config)


def _apply_overrides(obj: Any, overrides: Dict[str, Any]) -> Any:
    """Recursively apply YAML leaf overrides onto a frozen dataclass tree.

    Mirrors the reference's update_config (configs.py:244-268): dict values
    recurse into matching dataclass fields; leaves replace values. Modules
    cannot be swapped — only leaf values change.
    """
    if not dataclasses.is_dataclass(obj):
        return overrides

    updates = {}
    for key, value in overrides.items():
        if not hasattr(obj, key):
            raise KeyError(f"unknown config key: {key} on {type(obj).__name__}")
        current = getattr(obj, key)
        if isinstance(value, dict) and dataclasses.is_dataclass(current):
            updates[key] = _apply_overrides(current, value)
        elif isinstance(value, dict):
            # dict-valued leaves map onto tuple-of-pairs spec fields
            updates[key] = tuple(
                (k, tuple(v) if isinstance(v, list) else v) for k, v in value.items()
            )
        elif isinstance(value, list):
            updates[key] = tuple(value) if isinstance(current, tuple) else value
        else:
            updates[key] = value
    return dataclasses.replace(obj, **updates)


def apply_env_grid_overrides(
    config: "TrainerConfig", prefix: str = "BENCH_GRID_"
) -> "TrainerConfig":
    """Slot-grid geometry overrides from env vars, shared by bench/profile.

    FEATS packs 128/(8*feats) hash entries per physical row (the round-4
    gather-FLOP cut), ENTRIES sets the per-level entry budget, DTYPE=bf16
    halves the table-dot MACs, LEVELS/MAXRES the pyramid shape.
    """
    over = {
        k: os.environ[prefix + e]
        for k, e in (
            ("feats", "FEATS"),
            ("rows_per_level", "ENTRIES"),
            ("table_dtype", "DTYPE"),
            ("num_levels", "LEVELS"),
            ("max_res", "MAXRES"),
        )
        if prefix + e in os.environ
    }
    if not over:
        return config
    over = {k: (v if k == "table_dtype" else int(v)) for k, v in over.items()}
    return _apply_overrides(
        config,
        {
            "model": {
                "surface": {
                    "surface_field": {"field": {"grid": {"encoding": over}}}
                }
            }
        },
    )


def load_config(
    conf_path: Optional[str] = None,
    method: Optional[str] = None,
    overrides: Optional[Dict[str, Any]] = None,
) -> TrainerConfig:
    """Build a TrainerConfig: method registry lookup + YAML leaf overrides.

    YAML files use the key `method` to select the registry entry (reference
    configs.py:195-207); remaining keys override leaves.
    """
    from multimodalstudio_tpu.configs.methods import method_configs

    yaml_conf: Dict[str, Any] = {}
    if conf_path is not None:
        import yaml

        with open(conf_path) as f:
            yaml_conf = yaml.safe_load(f) or {}

    method = method or yaml_conf.pop("method", "grid")
    config = method_configs()[method]
    yaml_conf.pop("method", None)
    if yaml_conf:
        config = _apply_overrides(config, yaml_conf)
    if overrides:
        config = _apply_overrides(config, overrides)
    return config


def make_output_dir(
    base: str, scene: str, method: str, conf_name: str, version: Optional[str] = None
) -> str:
    """output/<scene>/<method>/<conf-name>/<version> (reference configs.py:208-222)."""
    version = version or datetime.datetime.now().strftime("%Y-%m-%d_%H%M%S")
    path = os.path.join(base, scene, method, conf_name, version)
    os.makedirs(path, exist_ok=True)
    return path


def config_to_string(config: Any, indent: int = 0) -> str:
    """Pretty-print the config tree (reference PrintableConfig, configs.py:36-53)."""
    pad = "    " * indent
    if dataclasses.is_dataclass(config) and not isinstance(config, type):
        lines = [type(config).__name__ + ":"]
        for f in dataclasses.fields(config):
            val = getattr(config, f.name)
            rendered = config_to_string(val, indent + 1)
            lines.append(f"{pad}    {f.name}: {rendered}")
        return "\n".join(lines)
    return repr(config)
