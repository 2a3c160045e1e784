"""MLP field component with weight normalization and geometric (SDF) init.

TPU-native counterpart of reference src/field_components/mlp.py:99-209.
Weight-normalized dense layers store (kernel, g) with w = g * kernel/||kernel||
per output unit; after module init, `finalize_weight_norm` sets g = ||kernel||
so the initial forward equals the raw initialization exactly — the semantics
of torch weight_norm at reference mlp.py:206-209, which gates SDF convergence.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class MLPSpec:
    """Static MLP hyperparameters (reference MLPConfig, mlp.py:32-54)."""

    num_layers: int = 8
    hidden_dim: int = 128
    weight_norm: bool = True
    activation: str = "ReLU"
    activation_beta: float = 100.0  # Softplus beta
    out_activation: Optional[str] = "Sigmoid"
    skip_connections: Tuple[int, ...] = ()
    geometric_init: bool = False
    geometric_init_bias: float = 0.5
    inside_outside: bool = False
    # compute dtype for the matmul chain (params stay float32; the MXU runs
    # bf16 natively — the reference's 16-mixed precision, trainer.py:57-63)
    dtype: str = "float32"  # float32 | bfloat16
    # run the layer chain as one fused Pallas kernel (ops/pallas/fused_mlp):
    # inter-layer activations stay in VMEM instead of round-tripping HBM.
    # The TPU counterpart of tcnn's FullyFusedMLP (reference mlp.py:223-293).
    # Requires bfloat16 dtype, >=2 layers, lane-aligned hidden width.
    fused: bool = False


def make_activation(name: Optional[str], beta: float = 100.0) -> Callable:
    if name is None or name == "None":
        return lambda x: x
    if name == "ReLU":
        return jax.nn.relu
    if name == "Softplus":
        return lambda x: jax.nn.softplus(x * beta) / beta
    if name == "SoftplusQuad":
        # C^1 piecewise-quadratic softplus stand-in for the TPU recipes:
        # 0 below -a, z above +a, (z+a)^2/(4a) between, with a = 2/beta so
        # the curvature at 0 matches softplus(beta z) (f''(0) = beta/4).
        # Matches ReLU exactly outside |z| <= 2/beta; no transcendentals —
        # the eikonal-style jacfwd workload runs ~2x faster than with exp
        # (scripts/act_ab.py: 120ms -> ~60ms per 327K-sample slice).
        a = 2.0 / beta

        def quad(x):
            return jnp.where(
                jnp.abs(x) < a, (x + a) * (x + a) * (0.25 / a), jax.nn.relu(x)
            )

        return quad
    if name == "Sigmoid":
        return jax.nn.sigmoid
    if name == "LeakyReLU":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.01)
    if name == "Tanh":
        return jnp.tanh
    raise ValueError(f"unknown activation {name}")


class WNDense(nn.Module):
    """Dense layer with optional weight normalization.

    Kernel is [in, out]; weight norm normalizes each output column (torch
    weight_norm dim=0 over a [out, in] weight).
    """

    features: int
    use_weight_norm: bool = True
    kernel_init: Callable = nn.initializers.he_uniform()
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray, weights_only: bool = False):
        kernel = self.param("kernel", self.kernel_init, (x.shape[-1], self.features))
        bias = self.param("bias", self.bias_init, (self.features,))
        if self.use_weight_norm:
            g = self.param("g", nn.initializers.ones_init(), (self.features,))
            norm = jnp.linalg.norm(kernel, axis=0, keepdims=True)
            w = g * kernel / jnp.maximum(norm, 1e-12)
        else:
            w = kernel
        if weights_only:
            # for the fused-kernel path: declare params, return effective (w, b)
            return w, bias
        if self.dtype == "bfloat16":
            # bf16 compute AND bf16 activations: the eikonal-style
            # jacfwd-under-grad workload measures 1.6x faster with bf16
            # layer outputs than with f32 outputs (scripts/act_ab.py) —
            # f32 outputs double both the VPU activation work and the
            # activation HBM traffic. Params and the MXU accumulator stay
            # f32; callers cast the network's final output back to f32.
            out = jax.lax.dot_general(
                x.astype(jnp.bfloat16),
                w.astype(jnp.bfloat16),
                dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )
            return out + bias.astype(jnp.bfloat16)
        return x @ w + bias


def can_fuse(spec: "MLPSpec") -> bool:
    """Whether this MLP geometry is served by the fused Pallas chain."""
    return (
        spec.fused
        and spec.dtype == "bfloat16"
        and spec.num_layers >= 2
        and spec.hidden_dim % 128 == 0
        and spec.activation in ("ReLU", "SoftplusQuad", "None")
    )


def effective_mlp_weights(mlp_params: Any, spec: "MLPSpec"):
    """Effective (weight-norm applied) per-layer (w, b) from an MLP param
    subtree ({'layer_0': {kernel, bias[, g]}, ...}) — the same math as
    WNDense, for callers that bypass module application (the fused SDF
    gradient path in models/model.py::sdf_gradients)."""
    ws, bs = [], []
    for l in range(spec.num_layers):
        p = mlp_params[f"layer_{l}"]
        kernel, bias = p["kernel"], p["bias"]
        if spec.weight_norm and "g" in p:
            norm = jnp.linalg.norm(kernel, axis=0, keepdims=True)
            w = p["g"] * kernel / jnp.maximum(norm, 1e-12)
        else:
            w = kernel
        ws.append(w)
        bs.append(bias)
    return ws, bs


def finalize_weight_norm(params: Any) -> Any:
    """Set every weight-norm gain g to ||kernel|| so w_init == kernel_init.

    Run once on the output of `module.init`. Walks the param pytree looking
    for dicts holding both 'kernel' and 'g'.
    """

    def walk(node):
        if isinstance(node, dict):
            new = {k: walk(v) for k, v in node.items()}
            if "kernel" in new and "g" in new and not isinstance(new["kernel"], dict):
                new["g"] = jnp.linalg.norm(new["kernel"], axis=0)
            return new
        return node

    import flax

    unfrozen = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else params
    return walk(unfrozen)


def _geometric_kernel_init(
    layer: int,
    n_layers: int,
    skip_connections: Tuple[int, ...],
    first_in_dim: int,
    bias: float,
    inside_outside: bool,
    additional_input: bool,
) -> Callable:
    """Geometric (unit-sphere SDF) kernel initializer for one layer.

    Mirrors reference mlp.py:173-198 exactly (transposed: ours is [in, out]).
    """

    def init(key, shape, dtype=jnp.float32):
        in_dim, out_dim = shape
        if layer == n_layers - 1:
            mean = np.sqrt(np.pi) / np.sqrt(in_dim)
            if inside_outside:
                mean = -mean
            return mean + 1e-4 * jax.random.normal(key, shape, dtype)
        std = np.sqrt(2.0) / np.sqrt(out_dim)
        w = std * jax.random.normal(key, shape, dtype)
        if additional_input and layer == 0:
            # zero every encoded column beyond raw xyz
            w = w.at[3:, :].set(0.0)
        elif additional_input and layer in skip_connections:
            # zero the columns fed by the encoded part of the skip input
            n_zero = first_in_dim - 3
            if n_zero > 0:
                w = w.at[-n_zero:, :].set(0.0)
        return w

    return init


def _geometric_bias_init(layer: int, n_layers: int, bias: float, inside_outside: bool) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        if layer == n_layers - 1:
            val = bias if inside_outside else -bias
            return jnp.full(shape, val, dtype)
        return jnp.zeros(shape, dtype)

    return init


class MLP(nn.Module):
    """Configurable MLP with skip connections (concat scaled by 1/sqrt(2)).

    Layer-count semantics match the reference: `num_layers` linear layers,
    hidden width `hidden_dim`, with a skip layer's input widened by the
    network input (reference mlp.py:115-171).
    """

    spec: MLPSpec
    output_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        spec = self.spec
        n_layers = spec.num_layers
        in_dim = x.shape[-1]
        geometric = spec.geometric_init
        additional_input = in_dim > 3
        act = make_activation(spec.activation, spec.activation_beta)
        out_act = make_activation(spec.out_activation, spec.activation_beta)

        fused = can_fuse(spec)
        inputs = x
        cur_width = in_dim
        ws, bs = [], []
        for layer in range(n_layers):
            if layer in spec.skip_connections:
                cur_width = cur_width + in_dim
                if not fused:
                    x = jnp.concatenate([x, inputs], axis=-1) / np.sqrt(2.0)
            if layer + 1 in spec.skip_connections:
                out_dim = spec.hidden_dim  # concat happens at the next layer's input
            elif layer == n_layers - 1:
                out_dim = self.output_dim
            else:
                out_dim = spec.hidden_dim
            if geometric:
                kinit = _geometric_kernel_init(
                    layer, n_layers, spec.skip_connections, in_dim,
                    spec.geometric_init_bias, spec.inside_outside, additional_input,
                )
                binit = _geometric_bias_init(
                    layer, n_layers, spec.geometric_init_bias, spec.inside_outside
                )
            else:
                kinit = nn.initializers.he_uniform()
                binit = nn.initializers.zeros_init()
            dense = WNDense(
                features=out_dim,
                use_weight_norm=spec.weight_norm,
                kernel_init=kinit,
                bias_init=binit,
                dtype=spec.dtype,
                name=f"layer_{layer}",
            )
            if fused:
                w, b = dense(jnp.zeros((1, cur_width), jnp.float32), weights_only=True)
                ws.append(w)
                bs.append(b)
            else:
                x = dense(x)
                if layer < n_layers - 1:
                    x = act(x)
            cur_width = out_dim
        if fused:
            from multimodalstudio_tpu.ops.pallas.fused_mlp import fused_chain

            lead = x.shape[:-1]
            y = fused_chain(
                x.reshape(-1, in_dim), ws, bs,
                skip=spec.skip_connections, activation=spec.activation,
                beta=spec.activation_beta,
            )
            x = y.reshape(*lead, self.output_dim)
        # bf16 stays contained in the matmul chain: downstream rendering
        # math (NeuS weights, compositing, losses) runs f32
        return out_act(x).astype(jnp.float32)
