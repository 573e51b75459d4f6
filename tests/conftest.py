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

# Persistent XLA compilation cache (VERDICT r3 #8): the suite is dominated
# by XLA:CPU compiles of episode/train programs (10-100 s each), and most
# tests recompile identical programs run-over-run.  Cache serialized
# executables under .cache/jax so every run after the first skips them
# (pytest --ff makes warm re-runs the common case).  Override the location
# with TARL_TEST_JAX_CACHE_DIR; set it empty to disable.
_cache_dir = os.environ.get(
    "TARL_TEST_JAX_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".cache", "jax"),
)
if _cache_dir:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


