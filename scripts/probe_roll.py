"""Probe: does pltpu.roll on the LANE axis handle widths that are not a
multiple of 128?  Decides whether core/fused_winner.py's R % 128 gate can
be dropped (Grid16x16 has R=960).  Run on the TPU, one process."""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(x_ref, o_ref, *, shift):
    o_ref[...] = pltpu.roll(x_ref[...], shift, axis=1)


def main():
    for r in (960, 1024, 16128, 777):
        x = jnp.arange(3 * r, dtype=jnp.int32).reshape(3, r)
        for shift in (1, 37, r - 5, 128, r // 2):
            out = pl.pallas_call(
                functools.partial(kernel, shift=shift),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((3, r), jnp.int32),
            )(x)
            want = jnp.roll(x, shift, axis=1)
            ok = bool(jnp.array_equal(out, want))
            print(f"R={r} shift={shift}: {'OK' if ok else 'MISMATCH'}",
                  flush=True)
            if not ok:
                d = np.argwhere(np.asarray(out) != np.asarray(want))
                print("  first diffs:", d[:4].tolist(), flush=True)


if __name__ == "__main__":
    main()
