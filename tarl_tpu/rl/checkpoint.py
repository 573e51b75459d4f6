"""Checkpoint / resume via Orbax.

The reference only saves a terminal ``policy.pt`` state_dict after training
(runner.py:107-109, rl/ppo_trainer.py:156-160) and has **no mid-training
resume** (SURVEY.md §5.4).  Here every checkpoint stores params, optimizer
state and the iteration counter, so training resumes exactly.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path: str, params: Any, opt_state: Any, iteration: int) -> None:
    """Write an atomic checkpoint directory at ``path`` (overwrites)."""
    path = os.path.abspath(path)
    ckpt = {
        "params": params,
        "opt_state": opt_state,
        "iteration": np.asarray(iteration),
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, ckpt, force=True)


def restore_checkpoint(path: str, template: Optional[dict] = None) -> dict:
    """Restore a checkpoint; ``template`` (same pytree structure, e.g. a
    freshly initialized state) restores exact array types."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            target = {
                "params": template["params"],
                "opt_state": template["opt_state"],
                "iteration": np.asarray(template.get("iteration", 0)),
            }
            restored = ckptr.restore(
                path, jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
            )
        else:
            restored = ckptr.restore(path)
    return restored


def latest_checkpoint(root: str) -> Optional[str]:
    """Most recent checkpoint directory under ``root`` (named ckpt_<iter>)."""
    if not os.path.isdir(root):
        return None
    cands = [d for d in os.listdir(root) if d.startswith("ckpt_")]
    if not cands:
        return None
    cands.sort(key=lambda d: int(d.split("_")[1]))
    return os.path.join(root, cands[-1])
