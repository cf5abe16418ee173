"""Superstep stepping engine.

The reference executes iterative algorithms as sequential host loops around
parallel regions (``Do { #pragma omp parallel for ... } While(cond)``,
emitted by ``src/backend_cpp/gm_cpp_gen.cc:1391-1445``); its distributed
GPS backend lowers the same structure to a master state machine over
supersteps (``src/backend_gps/gm_gps_gen_master.cc:27-60``).

Here the whole iteration is a single compiled program: a
``jax.lax.while_loop`` whose body is one superstep (all edge/node maps
fused by XLA) and whose condition is the convergence predicate.  Device
control never returns to the host between supersteps, so multi-chip
execution needs no master — the predicate is computed replicated
(``psum``-style) on every shard.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LoopStats:
    iterations: jax.Array  # int32 scalar


def converge_loop(step: Callable[[Any], Any],
                  not_done: Callable[[Any], jax.Array],
                  state: Any,
                  max_iter: int) -> Tuple[Any, LoopStats]:
    """Run ``state = step(state)`` while ``not_done(state)`` holds, at most
    ``max_iter`` times.  Mirrors Green-Marl's ``Do/While`` with an iteration
    cap (pagerank.gm:8-18) — ``step`` always runs at least once.

    The iteration counter is part of the carry; the returned ``LoopStats``
    reports how many supersteps executed.
    """
    def cond(carry):
        st, it = carry
        return jnp.logical_and(it < max_iter,
                               jnp.logical_or(it == 0, not_done(st)))

    def body(carry):
        st, it = carry
        return step(st), it + 1

    (final, iters) = jax.lax.while_loop(
        cond, body, (state, jnp.zeros((), jnp.int32)))
    return final, LoopStats(iterations=iters)


def while_loop(step: Callable[[Any], Any],
               not_done: Callable[[Any], jax.Array],
               state: Any,
               max_iter: int) -> Tuple[Any, LoopStats]:
    """Pre-test loop (Green-Marl ``While(!fin){...}``, hop_dist.gm:36-50)."""
    def cond(carry):
        st, it = carry
        return jnp.logical_and(it < max_iter, not_done(st))

    def body(carry):
        st, it = carry
        return step(st), it + 1

    (final, iters) = jax.lax.while_loop(
        cond, body, (state, jnp.zeros((), jnp.int32)))
    return final, LoopStats(iterations=iters)
