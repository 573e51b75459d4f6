"""Schema compatibility layer tests: packed-view and agent-matrix roundtrips
(the reference's FeatureHelpers column contract, feature_helpers.py:1-93)."""
import jax.numpy as jnp
import numpy as np

from tarl_tpu.schema import (
    AgentFeatureHelpers,
    FeatureHelpers,
    agent_features_matrix,
    agents_from_matrix,
)
from tarl_tpu.state import init_agent_state


def test_feature_helpers_column_map():
    h = FeatureHelpers(Nmax=5)
    assert h.AGENT_POSITION == slice(0, 5)
    assert h.AGENT_TIME_ARRIVAL == slice(5, 10)
    assert h.AGENT_TIME_DEPARTURE == slice(10, 15)
    assert h.MAX_NUMBER_OF_AGENT == 15
    assert h.NUMBER_OF_AGENT == 16
    assert h.FREE_FLOW_TIME_TRAVEL == 17
    assert h.LENGHT_OF_ROAD == 18
    assert h.MAX_FLOW == 19
    assert h.SELECTED_ROAD == 20
    assert h.ROAD_INDEX == 21
    assert h.HEAD_FIFO == 0
    assert h.HEAD_FIFO_ARRIVAL_TIME == 5
    assert h.HEAD_FIFO_DEPARTURE_TIME == 10
    assert h.CONGESTION_FILE == 3
    assert h.width == 22
    assert len(AgentFeatureHelpers()) == 9


def test_agent_matrix_roundtrip():
    agents = init_agent_state(
        origin=[0, 3, 5], dest=[0, 8, 4], departure=[48 * 3600.0, 21600.0, 25200.0],
        age=[20.0, 42.0, 31.0], sex=[0.0, 1.0, 0.0], employed=[0.0, 1.0, 1.0],
    )
    # ON_WAY/DONE are derived views: agent 1 en route (inserted, arrival 0),
    # agent 2 done (arrival stamped), agent 0 never started.
    agents = agents._replace(
        inserted=jnp.array([False, True, True]),
        arrival=jnp.array([0.0, 0.0, 26000.0]),
    )
    np.testing.assert_array_equal(np.asarray(agents.on_way),
                                  [False, True, False])
    np.testing.assert_array_equal(np.asarray(agents.done),
                                  [False, False, True])
    mat = agent_features_matrix(agents)
    assert mat.shape == (3, 9)
    back = agents_from_matrix(mat)
    for field in agents._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(agents, field)), np.asarray(getattr(back, field)),
            err_msg=field,
        )
    # The packed ON_WAY/DONE columns survive the roundtrip too.
    np.testing.assert_array_equal(np.asarray(back.on_way), [False, True, False])
    np.testing.assert_array_equal(np.asarray(back.done), [False, False, True])


def test_distribution_temperature():
    from tarl_tpu.rl.distribution import GraphDistribution

    logits = jnp.array([2.0, 0.0])
    src = jnp.array([0, 0], dtype=jnp.int32)
    sharp = GraphDistribution(logits, src, 2, temperature=0.1)
    flat = GraphDistribution(logits, src, 2, temperature=10.0)
    p_sharp = float(sharp.probs()[0])
    p_flat = float(flat.probs()[0])
    assert p_sharp > 0.99
    assert 0.5 < p_flat < 0.6
