"""Test fixtures. All tests run on a virtual 8-device CPU mesh so sharding
layouts are exercised without TPU hardware (SURVEY.md §4)."""
import os

# Force actual host CPU: the image pins JAX_PLATFORMS=axon (a tunneled TPU
# whose per-op latency makes eager unit tests pathologically slow).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)


