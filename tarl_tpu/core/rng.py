"""Counter-addressable Gumbel streams for renumbering-invariant sampling.

The slot-major core draws its per-turn-edge Gumbel noise directly in
``[KIN, R]`` layout (core.direction, reference direction_mpnn.py:103-146) —
which keys each PHYSICAL edge's random number to its position under the
current road NUMBERING.  Under the roll-friendly renumbering
(network.roll_friendly_road_order) the same physical simulation would
therefore see different noise, and winner draws between >=2 contending
upstreams flip: equality with the identity-numbered run held in
distribution only (the round-4 `test_renumber_outcome_parity_deterministic`
failure, 472/3001 arrival stamps diverged).

Fix: address the stream by CANONICAL position.  jax's default
``threefry_partitionable`` bit generation is already counter-based — element
``i`` of ``random_bits(key, shape)`` is ``w1 ^ w2`` where ``(w1, w2) =
threefry2x32(key, hi32(i), lo32(i))`` (jax._src.prng.
_threefry_random_bits_partitionable) — so the exact value
``jax.random.gumbel(key, shape)[i]`` can be reproduced at ANY address
``i`` without materializing the whole canonical array.  With the network
build placing each renumbered table column/slot at its canonical rank
(network.build_network sorts within-column slots by canonical id when
renumbering engages), the canonical flat position of slot ``(k, v)`` is
simply ``k * R + road_order[v]``, and the renumbered episode becomes
TRACE-IDENTICAL to the identity-numbered one by construction — while
identity-ordered networks (grids: ``renumbered=False``) keep the plain
``jax.random.gumbel`` call and every existing baseline bit-for-bit.

`gumbel_at_positions` is verified bitwise against ``jax.random.gumbel``
in tests/test_rng.py (identity and permuted addressing, fold_in'd keys).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax._src.prng import threefry2x32_p

__all__ = ["gumbel_at_positions", "direction_gumbel", "choice_gumbel"]

_F32_ONE_BITS = np.uint32(np.float32(1.0).view(np.uint32))
_F32_TINY = np.float32(np.finfo(np.float32).tiny)


def gumbel_at_positions(key: jax.Array, q: jnp.ndarray) -> jnp.ndarray:
    """``gumbel_at_positions(key, q)[i] == jax.random.gumbel(key, (N,),
    float32)[q[i]]`` bit-for-bit, for any flat positions ``q < 2**32``.

    Requires ``jax_threefry_partitionable`` (the jax default): each output
    element's bits are a pure function of ``(key, flat_index)`` — the hi/lo
    32-bit words of the index feed one threefry block
    (jax._src.prng._threefry_random_bits_partitionable), so permuted
    addressing costs only elementwise VPU work, no gathers.  The
    uniform->gumbel transform below replicates jax._src.random._uniform /
    ``_gumbel`` op-for-op (mantissa-fill bitcast, ``minval=tiny``).
    """
    kd = jax.random.key_data(key).astype(jnp.uint32)
    qa = q.astype(jnp.uint32)
    b1, b2 = threefry2x32_p.bind(kd[0], kd[1], jnp.zeros_like(qa), qa)
    bits = b1 ^ b2
    float_bits = (bits >> jnp.uint32(9)) | jnp.uint32(_F32_ONE_BITS)
    floats = jax.lax.bitcast_convert_type(float_bits, jnp.float32) \
        - jnp.float32(1.0)
    tiny = jnp.float32(_F32_TINY)
    u = jnp.maximum(tiny, floats * (jnp.float32(1.0) - tiny) + tiny)
    return -jnp.log(-jnp.log(u))


def direction_gumbel(key: jax.Array, network) -> jnp.ndarray:
    """The direction step's ``[KIN, R]`` slot-major Gumbel matrix.

    Identity-numbered networks (``network.renumbered`` False — all grids)
    take the plain ``jax.random.gumbel`` draw, unchanged from every
    previous round.  Renumbered networks address the SAME stream by
    canonical position ``k * R + road_order[v]`` (valid because the build
    sorts in-table slots by canonical source id, so renumbered slot k IS
    canonical slot k), making winner draws a pure function of the physical
    edge: renumbered episodes equal identity ones trace-for-trace.
    """
    KIN = network.in_src_tab.shape[0]
    R = network.num_roads
    if not network.renumbered:
        return jax.random.gumbel(key, (KIN, R), dtype=jnp.float32)
    q = (
        jnp.arange(KIN, dtype=jnp.uint32)[:, None] * jnp.uint32(R)
        + network.road_order.astype(jnp.uint32)[None, :]
    )
    return gumbel_at_positions(key, q)


def choice_gumbel(key: jax.Array, network) -> jnp.ndarray:
    """The random-choice ``[KC, N]`` node-slot-major Gumbel matrix
    (routing.policies.random_choice), canonical-addressed like
    :func:`direction_gumbel`.  Node columns: roads map through
    ``road_order``; SRC/DEST node indices are numbering-invariant."""
    KC = network.choice_dst_tab.shape[0]
    N = network.num_nodes
    if not network.renumbered:
        return jax.random.gumbel(key, (KC, N), dtype=jnp.float32)
    R = network.num_roads
    canon_node = jnp.concatenate(
        [network.road_order.astype(jnp.uint32),
         jnp.arange(R, N, dtype=jnp.uint32)]
    )
    q = (
        jnp.arange(KC, dtype=jnp.uint32)[:, None] * jnp.uint32(N)
        + canon_node[None, :]
    )
    return gumbel_at_positions(key, q)
