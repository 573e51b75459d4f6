"""Generalized Advantage Estimation as a reverse ``lax.scan``.

Replaces the reference's TorchRL ``GAE(gamma=0.99, lmbda=0.95,
average_gae=True)`` module (rl/ppo_trainer.py:35) with ~20 lines of JAX.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gae(
    rewards: jnp.ndarray,     # [T]
    values: jnp.ndarray,      # [T]
    last_value: jnp.ndarray,  # []
    dones: jnp.ndarray,       # [T] bool — terminal AFTER step t
    gamma: float,
    lam: float,
):
    """Returns (advantages [T], returns [T])."""
    not_done = 1.0 - dones.astype(jnp.float32)
    next_values = jnp.concatenate([values[1:], last_value[None]])

    def body(adv_next, xs):
        r, v, v_next, nd = xs
        delta = r + gamma * v_next * nd - v
        adv = delta + gamma * lam * nd * adv_next
        return adv, adv

    _, advantages = jax.lax.scan(
        body,
        jnp.zeros((), rewards.dtype),
        (rewards, values, next_values, not_done),
        reverse=True,
    )
    return advantages, advantages + values


def normalize(advantages: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Batch-standardize advantages (the reference's ``average_gae`` centering
    plus the usual scale normalization)."""
    return (advantages - advantages.mean()) / (advantages.std() + eps)
