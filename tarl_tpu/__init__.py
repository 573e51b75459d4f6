"""TARL-TPU: a TPU-native agent-based dynamic traffic assignment framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
TARL-simulator (agent-based DTA on a dual road graph with RL route choice):
pure-functional ring-buffer queue dynamics driven by ``lax.scan``, segment-op
message passing over turn edges, on-device all-pairs routing, a fully in-graph
PPO pipeline, and equilibrium validation (MSA, TSTT, Nash gap, PoA).
"""

from .config import (
    MSAConfig,
    PhysicsConfig,
    RLConfig,
    RoutingConfig,
    SimConfig,
)
from .network import Network, build_network, default_selected_road
from .schema import AgentFeatureHelpers, FeatureHelpers, ObservationFeatureHelpers
from .state import AgentState, MetricState, RoadState, SimState, init_agent_state

__version__ = "0.1.0"
