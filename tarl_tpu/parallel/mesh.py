"""Device-mesh construction helpers.

The reference has no distributed execution of any kind (SURVEY.md §2.10);
scale-out here is native ``jax.sharding``: pick a mesh, annotate shardings,
let XLA insert the collectives over ICI.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, *, dp: int | None = None,
              sp: int | None = None, devices=None) -> Mesh:
    """A 2-axis mesh ("dp", "sp").

    * ``dp`` — data parallel over environment replicas (rollout phase);
    * ``sp`` — batch-shard axis for the update phase (the flattened
      rollout minibatch is laid out over dp x sp, so PPO gradient
      all-reduces ride the full mesh).

    Defaults: use all devices, ``sp = 2`` when the device count is even and
    >= 4, else ``sp = 1``.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    devices = devices[:n]
    if sp is None:
        sp = 2 if (n >= 4 and n % 2 == 0) else 1
    if dp is None:
        dp = n // sp
    assert dp * sp == n, f"mesh {dp}x{sp} != {n} devices"
    return Mesh(np.array(devices).reshape(dp, sp), ("dp", "sp"))
