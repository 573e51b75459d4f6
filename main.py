"""Unified entry point for TARL-TPU experiments (reference: main.py:1-38)."""
from tarl_tpu.runner import main

if __name__ == "__main__":
    main()
