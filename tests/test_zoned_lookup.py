"""Unit tests for the int8 k-table zoned lookup (routing/policies.py).

The zoned (destination-restricted) backend's per-tick lookup is one fused
one-hot pass over a refresh-time table.  r4 compressed that table from f32
road ids [R, D] to int8 out-edge SLOT indices [R, Dp] (4x less HBM traffic
on the bandwidth-bound metro tick — docs/BENCH.md Grid256 rows).  These
tests pin (a) the bitcast pack/unpack roundtrip, (b) bitwise equality of
the compressed one-hot selection against the straightforward f32 road-id
one-hot it replaced, including unreachable (-1) and out-of-zone fallback
columns, at destination counts that exercise the %4 padding.

Reference semantics being preserved: agents/base.py:553-584 (per-head
next-road lookup from the periodic congested refresh).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tarl_tpu.routing.policies import (
    _pack_k,
    _round4,
    _unpack_k,
    _zone_k_tab,
    _zone_onehot_sel,
)


class _FakeNet:
    def __init__(self, inter_out_road, inter_out_ok, road_to):
        self.inter_out_road = jnp.asarray(inter_out_road, jnp.int32)
        self.inter_out_ok = jnp.asarray(inter_out_ok, bool)
        self.road_to = jnp.asarray(road_to, jnp.int32)


def _random_case(rng, i_n, r_n, k_n, d_n):
    # Random out-road table: each intersection has a random valid prefix of
    # distinct road ids; padded slots hold 0 with ok=False (the Network
    # convention).
    out_road = np.zeros((i_n, k_n), np.int32)
    out_ok = np.zeros((i_n, k_n), bool)
    for i in range(i_n):
        deg = rng.integers(1, k_n + 1)
        out_road[i, :deg] = rng.choice(r_n, size=deg, replace=False)
        out_ok[i, :deg] = True
    road_to = rng.integers(0, i_n, size=r_n).astype(np.int32)
    # Refresh-time next-road table [I, D]: for each (i, d) either one of
    # i's valid out roads or -1 (unreachable).
    road_tab = np.full((i_n, d_n), -1.0, np.float32)
    for i in range(i_n):
        deg = int(out_ok[i].sum())
        for d in range(d_n):
            if rng.random() < 0.85:
                road_tab[i, d] = float(out_road[i, rng.integers(0, deg)])
    return _FakeNet(out_road, out_ok, road_to), jnp.asarray(road_tab)


@pytest.mark.parametrize("d_n", [3, 4, 7, 16])
def test_pack_roundtrip_and_sel_matches_f32_onehot(d_n):
    rng = np.random.default_rng(d_n)
    i_n, r_n, k_n = max(9, d_n + 3), 30, 4
    net, road_tab = _random_case(rng, i_n, r_n, k_n, d_n)
    dest_list = jnp.asarray(
        np.sort(rng.choice(i_n, size=d_n, replace=False)).astype(np.int32)
    )

    k_tab = _zone_k_tab(road_tab, net, d_n)
    assert k_tab.dtype == jnp.int8
    assert k_tab.shape == (r_n, _round4(d_n))
    # bitcast roundtrip
    rt = _unpack_k(_pack_k(k_tab).ravel(), r_n, _round4(d_n))
    np.testing.assert_array_equal(np.asarray(rt), np.asarray(k_tab))

    # Head destinations: a mix of in-zone intersections, out-of-zone ones
    # (the dummy-agent case -> column 0), encoded as DEST dual-node ids.
    dest_inter = rng.integers(0, i_n, size=r_n).astype(np.int32)
    dest_nodes = jnp.asarray(r_n + 1 + 2 * dest_inter)

    # The f32 road-id one-hot this replaced (bitwise-identical contract).
    nr_by_road = road_tab[net.road_to]
    dest_i = jnp.clip((dest_nodes - r_n - 1) // 2, 0, i_n - 1)
    hit = dest_i[:, None] == dest_list[None, :]
    no_hit = ~jnp.any(hit, axis=1)
    col0 = jnp.arange(d_n, dtype=jnp.int32)[None, :] == 0
    hit = hit | (no_hit[:, None] & col0)
    want = jnp.sum(jnp.where(hit, nr_by_road, 0.0), axis=1).astype(jnp.int32)

    got = _zone_onehot_sel(k_tab, dest_i, dest_list, net)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
