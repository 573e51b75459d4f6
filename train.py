"""Deprecated trainer shim (reference: train.py:1-10) — use main.py --mode train."""
import warnings

from tarl_tpu.runner import main

if __name__ == "__main__":
    warnings.warn(
        "train.py is deprecated; use main.py --algo mpnn+ppo --mode train",
        DeprecationWarning,
    )
    main(["--algo", "mpnn+ppo", "--mode", "train"])
