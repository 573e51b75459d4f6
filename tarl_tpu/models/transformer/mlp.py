"""MLP building block (reference: src/transformer/mlp.py:8-62)."""
from __future__ import annotations

from typing import Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

_ACTS = {
    "relu": nn.relu,
    "gelu": nn.gelu,
    "tanh": nn.tanh,
    "silu": nn.silu,
}


class MLP(nn.Module):
    """``num_hidden_layers`` of Dense+activation(+dropout) then a linear head."""

    output_dim: int
    hidden_dims: Union[int, Sequence[int]] = 128
    num_hidden_layers: int = 1
    dropout: float = 0.0
    act: str = "relu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        dims = self.hidden_dims
        if isinstance(dims, int):
            dims = [dims] * self.num_hidden_layers
        assert len(dims) == self.num_hidden_layers
        act = _ACTS[self.act]
        for i, d in enumerate(dims):
            x = act(nn.Dense(d, name=f"hidden_{i}")(x))
            if self.dropout > 0.0:
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.output_dim, name="out")(x)
