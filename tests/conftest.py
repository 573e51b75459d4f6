"""Test fixtures. All tests run on a virtual 8-device CPU mesh so sharding
layouts are exercised without TPU hardware (SURVEY.md §4)."""
import os

# Force actual host CPU: the image pins JAX_PLATFORMS=axon (a tunneled TPU
# whose per-op latency makes eager unit tests pathologically slow).  The env
# var alone is NOT enough: when the axon sitecustomize registration succeeds
# it pins jax_platforms in the CONFIG, which overrides the environment — so
# force the config too and drop any backends initialized during registration.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax as _jax

try:
    _jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
try:
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends

        clear_backends()
except Exception:
    pass

assert _jax.default_backend() == "cpu", (
    "tests must run on host CPU; axon backend still active"
)


