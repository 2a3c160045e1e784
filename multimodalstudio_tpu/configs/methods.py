"""Method registry: the eight predefined pipelines of the reference.

TPU-native counterpart of reference src/configs/method_configs.py:59-445.
Variants are built with dataclasses.replace instead of deepcopy + mutation.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

from multimodalstudio_tpu.cameras.camera_optimizer import CameraOptimizerSpec
from multimodalstudio_tpu.configs.config import (
    DataManagerSpec,
    EvaluatorSpec,
    OptimizerSpec,
    TrainerConfig,
)
from multimodalstudio_tpu.engine.losses import (
    GeometryLossSpec,
    LossManagerSpec,
    RadianceLossSpec,
)
from multimodalstudio_tpu.engine.schedules import CurvatureWarmupSpec, MultiStepWarmupSpec
from multimodalstudio_tpu.fields.components import FeatureGridSpec
from multimodalstudio_tpu.fields.fields import (
    FieldComponentSpec,
    NeRFEncodingSpec,
    NeRFFieldSpec,
    RadianceFieldSpec,
    SDFFieldSpec,
)
from multimodalstudio_tpu.fields.mlp import MLPSpec
from multimodalstudio_tpu.models.model import (
    BackgroundModelSpec,
    HeadSpec,
    ModelSpec,
    RadianceModelSpec,
    SurfaceModelSpec,
)
from multimodalstudio_tpu.models.samplers import NeuSSamplerSpec, SpacedSamplerSpec
from multimodalstudio_tpu.ops.encodings import HashGridSpec
from multimodalstudio_tpu.ops.pallas.slot_grid import SlotGridSpec

FIVE_MODALITIES = ("rgb", "infrared", "mono", "polarization", "multispectral")

MODALITY_CHANNELS = {
    "rgb": 3,
    "infrared": 1,
    "mono": 1,
    "polarization": 4,
    "multispectral": 9,
}


def _standard_heads():
    """Per-modality heads (reference method_configs.py:145-186): 3x64 sigmoid
    MLPs; polarization uses a 3x256 linear head through Mueller optics."""
    head = HeadSpec(
        mlp=MLPSpec(num_layers=3, hidden_dim=64, out_activation="Sigmoid", weight_norm=True)
    )
    pol = HeadSpec(
        mlp=MLPSpec(num_layers=3, hidden_dim=256, out_activation="None", weight_norm=True),
        polarization=True,
    )
    return (
        ("rgb", head),
        ("infrared", head),
        ("mono", head),
        ("polarization", pol),
        ("multispectral", head),
    )


def _grid_field(max_res: int = 1024, radius: float = 1.0) -> FeatureGridSpec:
    return FeatureGridSpec(
        encoding=HashGridSpec(max_res=max_res),
        coarse_to_fine=True,
        radius=radius,
    )


def _grid_config(modalities=FIVE_MODALITIES) -> TrainerConfig:
    """`grid` (reference method_configs.py:63-300): hash-grid surface and
    radiance fields, numerical gradients + hessian, curvature loss."""
    modality_pairs = tuple((m, MODALITY_CHANNELS[m]) for m in modalities)

    surface = SurfaceModelSpec(
        surface_field=SDFFieldSpec(
            field=FieldComponentSpec(
                mlp=MLPSpec(
                    num_layers=3,
                    hidden_dim=128,
                    activation="Softplus",
                    activation_beta=100.0,
                    out_activation="None",
                    geometric_init=True,
                    weight_norm=True,
                ),
                grid=_grid_field(),
            ),
            use_position_encoding=True,
            position_encoding=NeRFEncodingSpec(6, 0.0, 5.0, True),
        ),
        use_numerical_gradients=True,
        numerical_gradient_taps=4,
        compute_hessian=True,
    )

    radiance = RadianceModelSpec(
        radiance_field=RadianceFieldSpec(
            base_field=FieldComponentSpec(
                mlp=MLPSpec(
                    num_layers=3, hidden_dim=256, out_activation="ReLU", weight_norm=True
                ),
                grid=_grid_field(),
            )
        ),
        use_direction_encoding=True,
        sh_degree=4,
        use_reflection_direction=True,
        use_n_dot_v=True,
        radiance_feature_dim=256,
    )

    background = BackgroundModelSpec(
        field=NeRFFieldSpec(
            base_field=FieldComponentSpec(
                mlp=MLPSpec(
                    num_layers=4,
                    hidden_dim=256,
                    activation="ReLU",
                    out_activation="ReLU",
                    weight_norm=True,
                )
            ),
            base_output_dim=256,
            head_field=MLPSpec(num_layers=4, hidden_dim=128, out_activation="ReLU"),
            use_position_encoding=True,
            position_encoding=NeRFEncodingSpec(6, 0.0, 5.0, True),
            use_direction_encoding=True,
            direction_encoding=NeRFEncodingSpec(4, 0.0, 3.0, True),
        ),
        radiance_feature_dim=128,
        contraction_order=float("inf"),
    )

    model = ModelSpec(
        modalities=modality_pairs,
        heads=_standard_heads(),
        ray_sampler=NeuSSamplerSpec(num_samples=32, num_samples_importance=32),
        background_ray_sampler=SpacedSamplerSpec(num_samples=16, spacing="lin_disparity"),
        surface=surface,
        radiance=radiance,
        background=background,
        use_background=True,
    )

    losses = LossManagerSpec(
        radiance_losses=(
            ("rgb", RadianceLossSpec()),
            ("mono", RadianceLossSpec()),
            ("multispectral", RadianceLossSpec()),
            ("infrared", RadianceLossSpec()),
            ("polarization", RadianceLossSpec(saturation_threshold=0.9980)),
        ),
        geometry=GeometryLossSpec(
            eikonal_loss="MSE",
            eikonal_weight=0.1,
            curvature_loss="L1",
            curvature_weight=5e-4,
            curvature_scheduler=CurvatureWarmupSpec(warm_up_ratio=0.1),
        ),
    )

    return TrainerConfig(
        method_name="grid",
        max_num_iterations=100000,
        steps_per_eval_batch=100,
        steps_per_eval_image=1000,
        steps_per_eval_all_images=25000,
        steps_per_export_mesh=5000,
        steps_per_export_poses=5000,
        steps_per_save=5000,
        mixed_precision=False,
        matmul_precision="high",
        modalities=tuple(modalities),
        datamanager=DataManagerSpec(
            dataset_kind="aligned",
            raw=False,
            # paper training geometry (reference confs/grid_raw.yaml:48-59):
            # 2048 rays/modality, shared SO3xR3 pose optimization for every
            # modality — so method_configs() alone reproduces the published
            # setup (the reference's registry defaults to a toy 32-ray
            # optimizer-off config and relies on the YAML to fix it).
            num_rays_per_modality=2048,
            camera_optimizer=CameraOptimizerSpec(
                mode="SO3xR3", shared_optimization=True
            ),
        ),
        model=model,
        loss_manager=losses,
        optimizers=(
            (
                "fields",
                OptimizerSpec(
                    optimizer="adamw",
                    lr=1e-3,
                    weight_decay=0.01,
                    eps=1e-15,
                    scheduler=MultiStepWarmupSpec(0.1, (0.5, 0.75, 0.9), 0.4),
                ),
            ),
            (
                "camera_poses",
                OptimizerSpec(
                    optimizer="adamw",
                    lr=1e-4,
                    weight_decay=0.01,
                    eps=1e-15,
                    scheduler=MultiStepWarmupSpec(0.1, (0.5, 0.75, 0.9), 0.4),
                ),
            ),
        ),
        evaluator=EvaluatorSpec(eval_num_rays_per_chunk=1024, rendering_scale=0.25),
    )


def _mlp_config() -> TrainerConfig:
    """`mlp` (reference method_configs.py:304-356): 8x256 MLP fields with
    skip connections, autograd gradients, no curvature loss."""
    base = _grid_config()
    surface = SurfaceModelSpec(
        surface_field=SDFFieldSpec(
            field=FieldComponentSpec(
                mlp=MLPSpec(
                    num_layers=8,
                    hidden_dim=256,
                    activation="Softplus",
                    activation_beta=100.0,
                    out_activation="None",
                    skip_connections=(4,),
                    geometric_init=True,
                    weight_norm=True,
                ),
                grid=None,
            ),
            use_position_encoding=True,
            position_encoding=NeRFEncodingSpec(6, 0.0, 5.0, True),
        ),
        use_numerical_gradients=False,
        compute_hessian=False,
    )
    radiance = dataclasses.replace(
        base.model.radiance,
        radiance_field=RadianceFieldSpec(
            base_field=FieldComponentSpec(
                mlp=MLPSpec(
                    num_layers=8,
                    hidden_dim=256,
                    activation="ReLU",
                    out_activation="ReLU",
                    skip_connections=(4,),
                    weight_norm=True,
                ),
                grid=None,
            )
        ),
    )
    model = dataclasses.replace(base.model, surface=surface, radiance=radiance)
    losses = dataclasses.replace(
        base.loss_manager,
        geometry=GeometryLossSpec(eikonal_loss="MSE", eikonal_weight=0.1, curvature_loss=None),
    )
    return dataclasses.replace(base, method_name="mlp", model=model, loss_manager=losses)


def _raw(config: TrainerConfig, name: str) -> TrainerConfig:
    """Raw (mosaicked) pipeline variant (reference method_configs.py:360-400)."""
    return dataclasses.replace(
        config,
        method_name=name,
        datamanager=dataclasses.replace(config.datamanager, raw=True),
    )


def _unbalanced(config: TrainerConfig, name: str) -> TrainerConfig:
    return dataclasses.replace(
        config,
        method_name=name,
        datamanager=dataclasses.replace(config.datamanager, dataset_kind="unaligned"),
    )


def _grid_decimated() -> TrainerConfig:
    """`grid_decimated` (reference method_configs.py:414-424)."""
    base = _grid_config()
    losses = dataclasses.replace(
        base.loss_manager,
        radiance_losses=(
            ("rgb", RadianceLossSpec(per_channel_probability=(0.25, 0.5, 0.25))),
            ("mono", RadianceLossSpec()),
            ("multispectral", RadianceLossSpec(per_channel_probability=(0.1111,) * 9)),
            ("infrared", RadianceLossSpec()),
            (
                "polarization",
                RadianceLossSpec(
                    saturation_threshold=0.9980,
                    per_channel_probability=(0.25, 0.25, 0.25, 0.25),
                ),
            ),
        ),
    )
    return dataclasses.replace(base, method_name="grid_decimated", loss_manager=losses)


def _grid_raw_grid_bg_unbalanced() -> TrainerConfig:
    """Hash-grid background variant (reference method_configs.py:428-445)."""
    base = _unbalanced(_raw(_grid_config(), "grid_raw"), "grid_raw_unbalanced")
    background = BackgroundModelSpec(
        field=NeRFFieldSpec(
            base_field=FieldComponentSpec(
                mlp=MLPSpec(num_layers=3, hidden_dim=128, out_activation="ReLU"),
                grid=_grid_field(radius=2.0),
            ),
            base_output_dim=256,
            head_field=MLPSpec(num_layers=4, hidden_dim=128, out_activation="ReLU"),
            use_position_encoding=False,
            use_direction_encoding=True,
            direction_encoding=NeRFEncodingSpec(4, 0.0, 3.0, True),
        ),
        radiance_feature_dim=256,
        contraction_order=float("inf"),
    )
    model = dataclasses.replace(base.model, background=background)
    return dataclasses.replace(base, method_name="grid_raw_grid_bg_unbalanced", model=model)


def _grid_raw_tpu() -> TrainerConfig:
    """TPU-tuned flagship: grid_raw with analytic forward-mode SDF gradients
    (primal hash gathers CSE with the value computation — replaces the 4
    numerical taps), coarse-level-only sampler queries, bf16 matmuls, and
    microbatched gradient accumulation. Rendering math is unchanged; the
    gradient estimator and sampler-query precision differ from the reference
    recipe (see docs/parity.md perf notes)."""
    import dataclasses as dc

    from multimodalstudio_tpu.configs.config import apply_fused_mlp, apply_mixed_precision

    base = _raw(_grid_config(), "grid_raw_tpu")
    sf = base.model.surface.surface_field
    # VMEM-resident slot-hash grid (ops/pallas/slot_grid.py): the XLA hash
    # grid is HBM-gather-issue-bound at ~1-2K rays/s (docs/performance.md
    # §3); the slot grid's table lives in VMEM where one-hot MXU matmuls
    # gather/scatter at dense-matmul rate. 6 levels x 16 feats/vertex.
    # layout="cell": one row per (cell, level) — 8x fewer scalar copies
    # than exact vertex hashing (the v5e copy-issue roofline, slot_grid.py
    # docstring) AND measured better on the 1500-step harness (cell
    # 41.2/39.5 dB vs vertex 37.5/34.5 rgb/mono, qc_grid_{cell,vertex}_r3).
    # PACKED table (r5 promotion, VERDICT r4 #1): 4096 entries/level at
    # F=2 feats/entry packs P=8 hash entries per 128-lane row, cutting the
    # one-hot gather/scatter MACs 8x per entry; bf16 table dots halve them
    # again (tcnn's fp16-table design point, reference
    # encodings.py:48-67). Promotion gate: the 20K-step capacity ladder on
    # the 512px high-frequency scene (cap_packed6 vs cap_base6, identical
    # 3-view held-out eval) — packed6 wins ALL five modalities (+0.35 to
    # +0.81 dB PSNR, SSIM higher everywhere) at 8x the entry budget AND
    # trains 28% faster (102.3K vs 79.9K rays/s sustained in the arm
    # runs). The r3 512-row optimum was an artifact of the unpacked
    # table's MAC cost scaling with rows; packed rows are nearly free
    # (docs/performance.md §3e-3f).
    grid_ad = dc.replace(
        sf.field.grid,
        encoding=SlotGridSpec(
            num_levels=6, min_res=16, max_res=512, rows_per_level=4096,
            layout="cell", feats=2, table_dtype="bf16",
        ),
    )
    surface = dc.replace(
        base.model.surface,
        use_numerical_gradients=False,
        # curvature regularization ON, like the reference flagship
        # (losses.py:121-150): analytic first-order gradients from the slot
        # kernel's tangent outputs; hessians via the reference's 4-tap
        # numerical estimate (surface_model.py:137-153)
        compute_hessian=True,
        # every 4th sample per ray gets the 4 hessian taps — unbiased
        # depth-stratified estimate of the reference's unweighted curvature
        # mean; quality-neutral on the harness (41.6/39.0 vs 41.2/39.5 dB,
        # qc_grid_cell_stride4_r3) and the taps were the step's largest
        # gather population
        curvature_tap_stride=4,
        # antipodal rotating-pair estimator: same trace(H)/3 expectation as
        # the reference tetrahedron at half the tap queries (the taps were
        # 18% of the r3 step profile, docs/performance.md §3d); the
        # curvature loss averages ~40K strided samples per step so the
        # extra per-sample variance is negligible (model.py
        # curvature_hessian_taps)
        curvature_taps=2,
        sampler_levels=4,
        surface_field=dc.replace(
            sf,
            field=dc.replace(
                sf.field,
                grid=grid_ad,
                # SoftplusQuad: the C^1 piecewise-quadratic softplus stand-in
                # (validated +1.7 dB over f32 softplus on the harness, round
                # 2) — required by the fused Pallas chain
                mlp=dc.replace(sf.field.mlp, activation="SoftplusQuad"),
            ),
        ),
    )
    # radiance rides the surface field's geometric features instead of its
    # own hash-grid lookup at the same positions — halves the step's gather
    # and scatter-add row count (PLAN r1 item 3; the geometric feature
    # already carries the local grid information)
    radiance = dc.replace(
        base.model.radiance,
        radiance_field=dc.replace(
            base.model.radiance.radiance_field,
            base_field=dc.replace(
                base.model.radiance.radiance_field.base_field, grid=None
            ),
        ),
    )
    # field-level remat OFF (same finding as mlp_raw_tpu): the r3 profiler
    # trace (prof_grid_raw_tpu_512_512) shows remat re-running the slot-grid
    # Pallas forwards under the loss grad — encoding.12 + rematted_
    # computation.2 are byte-identical duplicates of encoding.11 / jvp__.2,
    # ~16 ms of a 173 ms step — and the custom-vjp residuals (comp stacks)
    # are designed to be stored, not recomputed. A 512-ray microbatch slice
    # fits HBM without remat (~2 GB residuals incl. the 4-tap population).
    model = dc.replace(base.model, surface=surface, radiance=radiance, remat=False)
    cfg = dc.replace(
        base,
        model=model,
        mixed_precision=True,
        # global bf16 contract precision: geometry-critical matmuls pin f32
        # locally (lie_groups, sampler merge). The global-f32 program
        # ("high") MISCOMPILES on XLA:TPU for the fused-kernel flagships —
        # jit returns NaN while the op-by-op execution of the same program
        # is finite (scripts/nan_jit_probe.py, r3logs/nan_debug.log).
        matmul_precision="default",
        datamanager=dc.replace(base.datamanager, microbatch_rays=512),
    )
    # the grid-less MLPs (radiance trunk, background, heads) run as fused
    # Pallas chains; the hash-grid surface field keeps the XLA gather path
    # (can_fuse gates per-MLP, and sdf_gradients falls back when a grid is
    # present)
    return apply_fused_mlp(apply_mixed_precision(cfg))


def _mlp_raw_tpu() -> TrainerConfig:
    """TPU-tuned mlp_raw: bf16 matmuls + bf16 activations + microbatching.
    Pure-MLP fields are all MXU work — no hash-table gathers — which makes
    this the fastest method on TPU (the inverse of the CUDA reference,
    where tcnn grids win). The SDF activation is SoftplusQuad, the C^1
    piecewise-quadratic softplus(100x)/100 stand-in: the eikonal
    jacfwd-under-grad region (~70% of the step) is VPU-transcendental-bound
    with exact softplus (scripts/act_ab.py)."""
    import dataclasses as dc

    from multimodalstudio_tpu.configs.config import apply_fused_mlp, apply_mixed_precision

    base = _raw(_mlp_config(), "mlp_raw_tpu")
    sf = base.model.surface.surface_field
    surface = dc.replace(
        base.model.surface,
        surface_field=dc.replace(
            sf,
            field=dc.replace(
                sf.field, mlp=dc.replace(sf.field.mlp, activation="SoftplusQuad")
            ),
        ),
    )
    cfg = dc.replace(
        base,
        # field-level remat OFF: with bf16 activations a 512-ray microbatch
        # slice fits HBM without it, and dropping the backward recompute
        # measures +35% (batch_scaling5.log: 26.5K -> 35.7K rays/s)
        model=dc.replace(base.model, surface=surface, remat=False),
        mixed_precision=True,
        # see _grid_raw_tpu: global-f32 contract precision miscompiles the
        # fused-kernel programs on XLA:TPU (NaN under jit, finite op-by-op);
        # geometry matmuls pin f32 locally
        matmul_precision="default",
        datamanager=dc.replace(base.datamanager, microbatch_rays=512),
    )
    # fused Pallas MLP chains (VMEM-resident layer chain + 3-tangent SDF
    # gradients): the answer to tcnn FullyFusedMLP — the XLA jacfwd path
    # is HBM-bound on [N, 3, 256] tangent activations (docs/performance.md)
    return apply_fused_mlp(apply_mixed_precision(cfg))


def method_configs() -> Dict[str, TrainerConfig]:
    grid = _grid_config()
    mlp = _mlp_config()
    return {
        "grid": grid,
        "mlp": mlp,
        "grid_raw": _raw(grid, "grid_raw"),
        "mlp_raw": _raw(mlp, "mlp_raw"),
        "grid_unbalanced": _unbalanced(grid, "grid_unbalanced"),
        "grid_raw_unbalanced": _unbalanced(_raw(grid, "grid_raw"), "grid_raw_unbalanced"),
        "grid_decimated": _grid_decimated(),
        "grid_raw_grid_bg_unbalanced": _grid_raw_grid_bg_unbalanced(),
        "grid_raw_tpu": _grid_raw_tpu(),
        "mlp_raw_tpu": _mlp_raw_tpu(),
    }
