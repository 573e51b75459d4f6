"""Test fixtures. All tests run on a virtual 8-device CPU mesh so sharding
layouts are exercised without TPU hardware (SURVEY.md §4)."""
import os

# Force actual host CPU: the image pins JAX_PLATFORMS=axon (a tunneled TPU
# whose per-op latency makes eager unit tests pathologically slow).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tarl_tpu.network import build_network
from tarl_tpu.state import init_agent_state


@pytest.fixture
def two_road_network():
    """The reference's 2-link test network (tests/conftest.py:94-106):
    A<->B, both 100 m, capacity 10 veh/h, freespeed 10 -> fftt 10 s.
    Roads: 0 = A->B, 1 = B->A. Intersections sorted: A=0, B=1.
    Nodes: SRC(A)=2, DEST(A)=3, SRC(B)=4, DEST(B)=5."""
    return build_network(
        length=np.array([100.0, 100.0]),
        max_flow=np.array([10.0, 10.0]),
        free_speed=np.array([10.0, 10.0]),
        perm_lanes=np.array([1.0, 1.0]),
        from_inter=np.array([0, 1]),
        to_inter=np.array([1, 0]),
        num_intersections=2,
    )


@pytest.fixture
def two_agents():
    """Two agents departing at t=0 from SRC(A)=2 toward DEST(B)=5
    (mirrors reference tests/conftest.py:18-27 in spirit)."""
    return init_agent_state(
        origin=[2, 2], dest=[5, 5], departure=[0.0, 0.0]
    )
