"""PyG-free torch port of the reference physics for golden-trace validation.

A minimal, dependency-light re-implementation of the reference simulator's
per-tick semantics over the packed ``x[N, 3*Nmax+7]`` state matrix, written
from a close reading of:

* insert  — agents/base.py:244-331 (group admission in agent-id order,
  capacity clip ``cap - CONGESTION_FILE - count``, congestion-law departure
  stamp with the PRE-insert count for the whole group);
* withdraw — agents/base.py:334-403 (consecutive-from-head run of agents
  whose departure passed and whose DEST is adjacent, left-shift pop);
* choice  — DijkstraAgents.choice, agents/base.py:519-584 (every
  ``refresh_rate`` calls: congested edge costs
  ``max(fftt[u], cc[v] / (cap[u] + 10 - n[u]))`` over the FULL edge list,
  networkx all-pairs Dijkstra next hops; every call: SELECTED_ROAD[n] =
  next_hop[n, dest(head agent of n)] for ALL nodes — the dummy agent 0
  drives SRC/DEST rows);
* direction — direction_mpnn.py:44-196 (eligibility + gridlock masks,
  Gumbel-max over ``log(edge_attr * mask + 1e-12)``, FIFO tail push with
  arrival/departure stamps, sentinel agent 0);
* response — response_mpnn.py:42-127 (the tail==head acceptance check and
  one-slot left shift — including the reference's exact formulation that
  double-fires on opposing road pairs; the golden fixtures are DAGs where
  it coincides with the fixed win-pop form);
* tick order + clock — transportation_simulator.py:294-351
  (insert -> withdraw -> choice -> core, then ``time += timestep``).

NOT a copy: the reference builds on PyG ``MessagePassing``/torch_scatter and
vectorized tensor slicing; this port uses plain torch math and explicit
Python control flow (it is a test oracle, not a performance path).  Known
deliberate realizations of reference ambiguity, documented here:

* the reference sorts ready agents with a NON-stable ``torch.argsort``
  (base.py:275), leaving within-road admission order unspecified; this port
  admits in agent-id order — the realization the TPU build implements;
* scatter_max tie-breaks (exact float score ties) resolve to the lowest
  edge id, matching ``jax.ops.segment_max``'s rule — ties have measure
  zero under Gumbel noise anyway;
* Gumbel noise is INJECTED per turn edge (``direction(gumbel_e)``) instead
  of drawn from torch's RNG, so both implementations can be driven with an
  identical stream.
"""
from __future__ import annotations

import numpy as np
import torch

from tarl_tpu.schema import AgentFeatureHelpers, FeatureHelpers

AF = AgentFeatureHelpers


class TorchReferenceSim:
    """Drives the packed reference state through classical ticks."""

    def __init__(
        self,
        x: torch.Tensor,               # [N, 3*Nmax+7] packed state
        agent_features: torch.Tensor,  # [A, 9]
        *,
        routes_src: np.ndarray,        # turn-edge endpoints (roads only)
        routes_dst: np.ndarray,
        routes_attr: np.ndarray,       # [E] capacity-share weights
        full_src: np.ndarray,          # full edge list incl. SRC/DEST edges
        full_dst: np.ndarray,
        adj: np.ndarray,               # bool [N, N] dense adjacency
        congestion_constant: np.ndarray,  # [R] (zero-padded to N internally)
        num_roads: int,
        nmax: int,
        time: float,
        timestep: float,
        refresh_rate: int = 10,
    ):
        self.x = x.clone().float()
        self.af = agent_features.clone().float()
        self.h = FeatureHelpers(Nmax=nmax)
        self.routes_src = np.asarray(routes_src, np.int64)
        self.routes_dst = np.asarray(routes_dst, np.int64)
        self.routes_attr = torch.as_tensor(routes_attr, dtype=torch.float32)
        self.full_src = np.asarray(full_src, np.int64)
        self.full_dst = np.asarray(full_dst, np.int64)
        self.adj = np.asarray(adj, bool)
        n = x.shape[0]
        cc = torch.zeros(n, dtype=torch.float32)
        cc[:num_roads] = torch.as_tensor(congestion_constant, dtype=torch.float32)
        self.cc = cc
        self.num_roads = num_roads
        self.nmax = nmax
        self.time = float(time)
        self.timestep = float(timestep)
        self.refresh_rate = refresh_rate
        self.choice_count = 0
        self.next_hop = None

    # -- insert (base.py:244-331) ------------------------------------------
    def insert(self):
        h, x, af = self.h, self.x, self.af
        ready = (
            (af[:, AF.DEPARTURE_TIME] <= self.time)
            & (af[:, AF.ON_WAY] == 0)
            & (af[:, AF.DONE] == 0)
        )
        ready_ids = torch.nonzero(ready).squeeze(1).tolist()
        n_nodes = x.shape[0]
        per_road: dict[int, list[int]] = {}
        for a in ready_ids:
            r = int(x[int(af[a, AF.ORIGIN]), h.SELECTED_ROAD].item())
            if r < 0:
                r += n_nodes  # torch negative indexing wraps (base.py:259)
            per_road.setdefault(r, []).append(a)
        for r, alist in sorted(per_road.items()):
            n0 = int(x[r, h.NUMBER_OF_AGENT].item())
            rem = int((x[r, h.MAX_NUMBER_OF_AGENT] - h.CONGESTION_FILE
                       - x[r, h.NUMBER_OF_AGENT]).item())
            if rem <= 0:
                continue
            take = alist[:rem]
            # Departure stamp: congestion law with the PRE-insert count for
            # every group member (base.py:313-325), float32 math.
            tc = self.cc[r] / (x[r, h.MAX_NUMBER_OF_AGENT]
                               + 10.0 - float(n0))
            tt = torch.maximum(x[r, h.FREE_FLOW_TIME_TRAVEL], tc)
            dep = self.time + tt
            for off, a in enumerate(take):
                x[r, h.AGENT_POSITION.start + n0 + off] = float(a)
                x[r, h.AGENT_TIME_ARRIVAL.start + n0 + off] = self.time
                x[r, h.AGENT_TIME_DEPARTURE.start + n0 + off] = dep
                af[a, AF.ON_WAY] = 1.0
            x[r, h.NUMBER_OF_AGENT] += float(len(take))

    # -- withdraw (base.py:334-403) ----------------------------------------
    def withdraw(self):
        h, x, af = self.h, self.x, self.af
        for r in range(self.num_roads):
            cnt = int(x[r, h.NUMBER_OF_AGENT].item())
            k = 0
            while k < cnt:
                a = int(x[r, h.AGENT_POSITION.start + k].item())
                dest = int(af[a, AF.DESTINATION].item())
                ok = (
                    self.adj[r, dest]
                    and bool((x[r, h.AGENT_TIME_DEPARTURE.start + k]
                              <= self.time).item())
                )
                if not ok:
                    break
                k += 1
            if k == 0:
                continue
            for kk in range(k):
                a = int(x[r, h.AGENT_POSITION.start + kk].item())
                af[a, AF.DONE] = 1.0
                af[a, AF.ON_WAY] = 0.0
                af[a, AF.ARRIVAL_TIME] = self.time
            for sl in (h.AGENT_POSITION, h.AGENT_TIME_ARRIVAL,
                       h.AGENT_TIME_DEPARTURE):
                seg = x[r, sl].clone()
                seg[: self.nmax - k] = seg[k:].clone()
                seg[self.nmax - k:] = 0.0
                x[r, sl] = seg
            x[r, h.NUMBER_OF_AGENT] -= float(k)

    # -- choice (DijkstraAgents, base.py:519-584) --------------------------
    def choice(self):
        import networkx as nx

        h, x, af = self.h, self.x, self.af
        n = x.shape[0]
        if self.choice_count % self.refresh_rate == 0:
            u, v = self.full_src, self.full_dst
            xu = x[torch.as_tensor(u)]
            tc = self.cc[torch.as_tensor(v)] / (
                xu[:, h.MAX_NUMBER_OF_AGENT] + 10.0
                - xu[:, h.NUMBER_OF_AGENT]
            )
            w = torch.maximum(xu[:, h.FREE_FLOW_TIME_TRAVEL], tc)
            g = nx.DiGraph()
            g.add_nodes_from(range(n))
            for e in range(len(u)):
                g.add_edge(int(u[e]), int(v[e]), w=float(w[e]))
            paths = dict(nx.all_pairs_dijkstra_path(g, weight="w"))
            nh = np.full((n, n), -1, np.int64)
            for src, dd in paths.items():
                for dst, path in dd.items():
                    nh[src, dst] = path[1] if len(path) >= 2 else src
            self.next_hop = nh
        self.choice_count += 1
        heads = x[:, h.HEAD_FIFO].long()
        dests = af[heads, AF.DESTINATION].long().numpy()
        sel = self.next_hop[np.arange(n), dests]
        x[:, h.SELECTED_ROAD] = torch.as_tensor(sel, dtype=torch.float32)

    # -- direction (direction_mpnn.py:44-196) ------------------------------
    def direction(self, gumbel_e: np.ndarray):
        h, x = self.h, self.x
        R = self.num_roads
        xr = x[:R]
        u = torch.as_tensor(self.routes_src)
        v = torch.as_tensor(self.routes_dst)
        xu, xv = xr[u], xr[v]

        dep_u = xu[:, h.HEAD_FIFO_DEPARTURE_TIME]
        id_u = xu[:, h.HEAD_FIFO]
        mask = (dep_u <= self.time) & (
            xv[:, h.NUMBER_OF_AGENT]
            < xv[:, h.MAX_NUMBER_OF_AGENT] - h.CONGESTION_FILE
        )
        mask &= xu[:, h.SELECTED_ROAD] == xv[:, h.ROAD_INDEX]
        mask &= xu[:, h.NUMBER_OF_AGENT] > 0
        sub = (dep_u - self.time < -10.0) & (
            xu[:, h.MAX_NUMBER_OF_AGENT] - h.CONGESTION_FILE
            <= xu[:, h.NUMBER_OF_AGENT]
        )
        sub &= (
            xu[:, h.MAX_NUMBER_OF_AGENT] - xu[:, h.NUMBER_OF_AGENT]
            <= xv[:, h.MAX_NUMBER_OF_AGENT] - xv[:, h.NUMBER_OF_AGENT]
        )
        sub &= xu[:, h.SELECTED_ROAD] == xv[:, h.ROAD_INDEX]
        mask |= sub
        prob = self.routes_attr * mask.float()

        scores = torch.log(prob + 1e-12) + torch.as_tensor(
            gumbel_e, dtype=torch.float32
        )
        chosen = torch.zeros(R, dtype=torch.float32)
        v_np = self.routes_dst
        s_np = scores.numpy()
        p_np = prob.numpy()
        for node in range(R):
            es = np.nonzero(v_np == node)[0]
            if es.size == 0 or p_np[es].sum() <= 0:
                continue
            best = es[int(np.argmax(s_np[es]))]  # first max = lowest edge id
            chosen[node] = float(self.x[int(self.routes_src[best]),
                                        h.HEAD_FIFO].item())

        # update (direction_mpnn.py:148-196): push at end of queue, stamp
        # arrival/departure for EVERY road (garbage in inactive slots is the
        # reference's real behaviour; canonicalized before comparison).
        for r in range(R):
            n0 = int(x[r, h.NUMBER_OF_AGENT].item())
            tc = self.cc[r] / (
                x[r, h.MAX_NUMBER_OF_AGENT] + 10.0 - float(n0)
            )
            tt = torch.maximum(x[r, h.FREE_FLOW_TIME_TRAVEL], tc)
            x[r, h.AGENT_POSITION.start + n0] = chosen[r]
            x[r, h.AGENT_TIME_ARRIVAL.start + n0] = self.time
            x[r, h.AGENT_TIME_DEPARTURE.start + n0] = self.time + tt
            if chosen[r] != 0:  # sentinel guard (direction_mpnn.py:194)
                x[r, h.NUMBER_OF_AGENT] = float(n0 + 1)

    # -- response (response_mpnn.py:42-127) --------------------------------
    def response(self):
        h, x = self.h, self.x
        R = self.num_roads
        pop = np.zeros(R, bool)
        for e in range(len(self.routes_src)):
            u = int(self.routes_src[e])
            v = int(self.routes_dst[e])
            cu = int(x[u, h.NUMBER_OF_AGENT].item())
            cv = int(x[v, h.NUMBER_OF_AGENT].item())
            if cu <= 0 or cv <= 0:
                continue
            head_u = int(x[u, h.HEAD_FIFO].item())
            tail_v = int(x[v, h.AGENT_POSITION.start + cv - 1].item())
            if tail_v == head_u:
                pop[u] = True
        for r in np.nonzero(pop)[0]:
            for sl in (h.AGENT_POSITION, h.AGENT_TIME_ARRIVAL,
                       h.AGENT_TIME_DEPARTURE):
                seg = x[r, sl].clone()
                seg[: self.nmax - 1] = seg[1:].clone()
                # the reference leaves the last slot stale (response_mpnn.py
                # :110-122 shifts a width-(Nmax-1) window); canonicalization
                # zeroes it anyway, but stay faithful:
                x[r, sl] = seg
            x[r, h.NUMBER_OF_AGENT] -= 1.0

    # -- one classical tick (transportation_simulator.py:294-351) ----------
    def tick(self, gumbel_e: np.ndarray):
        self.insert()
        self.withdraw()
        self.choice()
        self.direction(gumbel_e)
        self.response()
        self.time = self.time + self.timestep

    # -- canonical packed view (inactive FIFO slots zeroed) ----------------
    def canonical_x(self) -> np.ndarray:
        h, x = self.h, self.x
        out = x.clone()
        for r in range(self.num_roads):
            cnt = int(x[r, h.NUMBER_OF_AGENT].item())
            for sl in (h.AGENT_POSITION, h.AGENT_TIME_ARRIVAL,
                       h.AGENT_TIME_DEPARTURE):
                out[r, sl.start + cnt: sl.stop] = 0.0
        return out.numpy()
