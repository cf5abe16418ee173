"""Two-limb int32 counters for >2^31 device-side accumulation.

JAX on TPU disables int64 by default (jax_enable_x64 off): an
``jnp.int64`` accumulator silently truncates to int32 with a warning.
Graph-scale counters (traversed edges across thousands of instances,
triangle counts on billion-edge graphs) can exceed 2^31, so device loops
accumulate into a (hi, lo) pair of int32 limbs, lo kept in [0, 2^30):
exact up to 2^61.  Equivalent role to the reference's plain ``int64_t``
counters (e.g. triangle ``cnt`` in the generated OpenMP code).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LO_BITS = 30
_LO_MASK = (1 << _LO_BITS) - 1


def limb_zero():
    return (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))


def limb_add(acc, s):
    """Add a non-negative int32 ``s`` (< 2^30) into the accumulator."""
    hi, lo = acc
    lo = lo + s.astype(jnp.int32)
    hi = hi + (lo >> _LO_BITS)
    return hi, lo & _LO_MASK


def limb_value(acc) -> int:
    """Host-side exact value (Python int)."""
    hi, lo = acc
    return (int(jax.device_get(hi)) << _LO_BITS) + int(jax.device_get(lo))
