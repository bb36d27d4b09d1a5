"""Functional MLP used throughout the framework.

Semantics mirror the reference ``utils.make_mlp``
(reference: neural_lam/utils.py:538-570): a stack of
``Linear -> SiLU`` pairs with a final ``Linear`` and an optional
``LayerNorm`` on the output (GraphCast style). Parameters live in a plain
pytree so they compose with jit/vmap/scan/pjit without any module system.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp

# A pytree: {"layers": [{"w": (din, dout), "b": (dout,)}, ...],
#            "ln": {"scale": (dout,), "bias": (dout,)} | None}
MLPParams = dict

_LN_EPS = 1e-5  # matches torch.nn.LayerNorm default


def init_mlp(
    rng: jax.Array,
    blueprint: Sequence[int],
    layer_norm: bool = True,
    dtype: Any = jnp.float32,
) -> MLPParams:
    """Initialise MLP parameters for the given layer-width blueprint.

    ``blueprint[0]`` is the input width, ``blueprint[-1]`` the output width.
    Weight/bias init matches torch.nn.Linear defaults (uniform in
    ``+-1/sqrt(fan_in)``) so training dynamics are comparable with the
    reference.
    """
    assert len(blueprint) >= 2, "Invalid MLP blueprint"
    n_linear = len(blueprint) - 1
    keys = jax.random.split(rng, 2 * n_linear)
    layers = []
    for i, (din, dout) in enumerate(zip(blueprint[:-1], blueprint[1:])):
        bound = 1.0 / (din**0.5)
        w = jax.random.uniform(
            keys[2 * i], (din, dout), dtype=dtype, minval=-bound, maxval=bound
        )
        b = jax.random.uniform(
            keys[2 * i + 1], (dout,), dtype=dtype, minval=-bound, maxval=bound
        )
        layers.append({"w": w, "b": b})

    ln: Optional[dict] = None
    if layer_norm:
        ln = {
            "scale": jnp.ones((blueprint[-1],), dtype=dtype),
            "bias": jnp.zeros((blueprint[-1],), dtype=dtype),
        }
    return {"layers": layers, "ln": ln}


def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array) -> jax.Array:
    """LayerNorm over the last axis, matching torch defaults (eps=1e-5)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    centered = x - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    return centered * inv * scale + bias


def apply_mlp(params: MLPParams, x: jax.Array) -> jax.Array:
    """Apply the MLP to ``x`` over its last axis."""
    layers = params["layers"]
    n = len(layers)
    for i, layer in enumerate(layers):
        x = x @ layer["w"] + layer["b"]
        if i != n - 1:
            x = jax.nn.silu(x)
    if params["ln"] is not None:
        x = _layer_norm(x, params["ln"]["scale"], params["ln"]["bias"])
    return x


def apply_mlp_split_first(
    params: MLPParams, parts: Sequence[jax.Array]
) -> jax.Array:
    """Apply the MLP to the (virtual) concatenation of ``parts``.

    ``concat(parts) @ W`` is computed as ``sum_i parts[i] @ W_i`` with
    the first-layer weight sliced by part widths, so the concatenated
    activation — 3x the width of each part on the message-passing hot
    path — is never materialised in HBM. Numerically identical to
    ``apply_mlp(params, concat(parts))`` up to f32 summation order.
    """
    layers = params["layers"]
    w0, b0 = layers[0]["w"], layers[0]["b"]
    x = b0
    start = 0
    for part in parts:
        width = part.shape[-1]
        x = x + part @ w0[start : start + width]
        start += width
    assert start == w0.shape[0], (
        f"parts widths {start} != first-layer input {w0.shape[0]}"
    )
    for layer in layers[1:]:
        x = jax.nn.silu(x)
        x = x @ layer["w"] + layer["b"]
    if params["ln"] is not None:
        x = _layer_norm(x, params["ln"]["scale"], params["ln"]["bias"])
    return x
