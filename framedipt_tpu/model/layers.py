"""Linear layers with the AF2 initializer zoo, as flax.linen modules.

Initializer semantics follow the reference zoo
(framedipt/model/layers.py:246-337): truncated-normal fan-in ("default"
scale 1 / "relu" scale 2), glorot uniform, gating (W=0, b=1), final (W=0),
normal (std = 1/sqrt(fan_in)). The softplus-inverse(1) constant initializes
IPA per-head point weights (:209-213).
"""
from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import truncnorm

IPA_POINT_WEIGHTS_INIT = 0.541324854612918  # softplus^{-1}(1)

# std correction so the *truncated* normal has the requested variance.
_TRUNC_STD_CORRECTION = float(truncnorm.std(a=-2, b=2, loc=0, scale=1))


def trunc_normal_initializer(scale: float = 1.0) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]  # flax kernels are [in, out]
        std = np.sqrt(scale / max(1, fan_in)) / _TRUNC_STD_CORRECTION
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init


def normal_fan_in_initializer() -> Callable:
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        return jax.random.normal(key, shape, dtype) / np.sqrt(fan_in)

    return init


_KERNEL_INITS: dict[str, Callable] = {
    "default": trunc_normal_initializer(1.0),
    "relu": trunc_normal_initializer(2.0),
    "glorot": nn.initializers.xavier_uniform(),
    "gating": nn.initializers.zeros_init(),
    "normal": normal_fan_in_initializer(),
    "final": nn.initializers.zeros_init(),
}


class Linear(nn.Module):
    """Dense layer with a named initializer from the AF2 zoo."""

    features: int
    w_init: str = "default"
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, return_weights: bool = False
    ) -> jnp.ndarray | tuple[jnp.ndarray, jnp.ndarray | None]:
        """Apply the layer, or with ``return_weights`` return the raw
        (kernel, bias) instead — used by fused Pallas paths that consume the
        weights in-kernel while keeping the importer-compatible param tree
        (x then only provides the input feature size)."""
        bias_init = (
            nn.initializers.ones_init()
            if self.w_init == "gating"
            else nn.initializers.zeros_init()
        )
        dense = nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=_KERNEL_INITS[self.w_init],
            bias_init=bias_init,
            dtype=self.dtype,
            name="dense",
        )
        if return_weights:
            # Build params at the right shape without the full matmul.
            _ = dense(jnp.zeros((1, x.shape[-1]), jnp.float32))
            params = dense.variables["params"]
            return params["kernel"], (
                params["bias"] if self.use_bias else None
            )
        return dense(x)


class MLP(nn.Module):
    """Stack of Linear(+activation) layers ending with optional LayerNorm —
    the Embedder's node/edge MLP shape (3x Linear+ReLU then LayerNorm,
    ref framedipt/model/score_network.py:86-105)."""

    features: tuple[int, ...]
    final_layer_norm: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, f in enumerate(self.features):
            x = Linear(f, dtype=self.dtype, name=f"linear_{i}")(x)
            if i < len(self.features) - 1:
                x = jax.nn.relu(x)
        if self.final_layer_norm:
            x = nn.LayerNorm(dtype=self.dtype, name="layer_norm")(x)
        return x
