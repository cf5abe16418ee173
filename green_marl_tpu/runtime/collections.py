"""Device-friendly collection types (reference ``gm_graph`` collections).

Parity map (``apps/output_cpp/gm_graph/inc``, SURVEY.md §2.8):

=====================  ====================================================
reference              here
=====================  ====================================================
``gm_sized_set``       ``NodeSet`` — bitmap over the padded node space
                       (the reference is also bitmap-backed, gm_set.h:8)
``gm_seq``             ``NodeSeq`` — fixed-capacity ring with count
                       (static shapes: capacity is a trace-time constant)
``gm_order``           ``NodeOrder`` — NodeSeq with uniqueness bitmap
``gm_map_small/...``   ``node_keyed_*`` helpers — maps keyed by node id
                       are dense arrays; the small/medium/large
                       implementation split is an XLA non-issue
``gm_mutatable_priority_map``  no device equivalent — the Dijkstra-class
                       algorithms are reformulated (models.delta_stepping)
=====================  ====================================================

All structures are immutable pytrees; mutating verbs return new values
(functional updates compile to in-place buffer donation under jit).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NodeSet:
    """Bitmap node set (``gm_sized_set``)."""
    bits: jax.Array   # [N_pad] bool

    @staticmethod
    def empty(n_pad: int) -> "NodeSet":
        return NodeSet(bits=jnp.zeros((n_pad,), jnp.bool_))

    def add(self, v) -> "NodeSet":
        return NodeSet(self.bits.at[v].set(True))

    def add_mask(self, mask: jax.Array) -> "NodeSet":
        return NodeSet(self.bits | mask)

    def remove(self, v) -> "NodeSet":
        return NodeSet(self.bits.at[v].set(False))

    def has(self, v) -> jax.Array:
        return self.bits[v]

    def size(self) -> jax.Array:
        return jnp.sum(self.bits.astype(jnp.int32))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NodeSeq:
    """Fixed-capacity sequence (``gm_seq``): supports push front/back.

    Stored as a ring buffer; ``head`` is the index of the front element.
    Overflow beyond capacity is an error the caller must preclude (the
    reference grows dynamically; device shapes are static, so capacity is
    declared up front — typically N).
    """
    buf: jax.Array     # [cap] node ids
    head: jax.Array    # int32
    count: jax.Array   # int32

    @staticmethod
    def empty(cap: int, dtype=jnp.int32) -> "NodeSeq":
        return NodeSeq(buf=jnp.full((cap,), -1, dtype),
                       head=jnp.zeros((), jnp.int32),
                       count=jnp.zeros((), jnp.int32))

    @property
    def capacity(self) -> int:
        return int(self.buf.shape[0])

    def push_back(self, v) -> "NodeSeq":
        pos = (self.head + self.count) % self.capacity
        return NodeSeq(self.buf.at[pos].set(v), self.head, self.count + 1)

    def push_front(self, v) -> "NodeSeq":
        pos = (self.head - 1) % self.capacity
        return NodeSeq(self.buf.at[pos].set(v), pos, self.count + 1)

    def pop_back(self) -> Tuple[jax.Array, "NodeSeq"]:
        """Callers must guard ``Size() > 0`` (reference precondition,
        gm_seq.h); on an empty seq the count clamps at 0 instead of
        corrupting subsequent Size()/items()."""
        pos = (self.head + self.count - 1) % self.capacity
        return self.buf[pos], NodeSeq(self.buf, self.head,
                                      jnp.maximum(self.count - 1, 0))

    def pop_front(self) -> Tuple[jax.Array, "NodeSeq"]:
        """See pop_back: empty-seq pop clamps count at 0."""
        new_head = jnp.where(self.count > 0,
                             (self.head + 1) % self.capacity, self.head)
        return (self.buf[self.head],
                NodeSeq(self.buf, new_head,
                        jnp.maximum(self.count - 1, 0)))

    def items(self) -> jax.Array:
        """[cap] ids in order, -1 beyond ``count``."""
        idx = (self.head + jnp.arange(self.capacity)) % self.capacity
        vals = self.buf[idx]
        return jnp.where(jnp.arange(self.capacity) < self.count, vals, -1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NodeOrder:
    """Sequence with uniqueness (``gm_order``)."""
    seq: NodeSeq
    member: jax.Array  # [N_pad] bool

    @staticmethod
    def empty(cap: int, n_pad: int) -> "NodeOrder":
        # one extra trash slot so duplicate pushes write nowhere visible
        return NodeOrder(NodeSeq.empty(cap + 1),
                         jnp.zeros((n_pad,), jnp.bool_))

    def push_back(self, v) -> "NodeOrder":
        fresh = ~self.member[v]
        cap = self.seq.capacity
        pos = jnp.where(fresh,
                        (self.seq.head + self.seq.count) % cap, cap - 1)
        seq = NodeSeq(self.seq.buf.at[pos].set(v), self.seq.head,
                      self.seq.count + fresh.astype(jnp.int32))
        return NodeOrder(seq, self.member.at[v].set(True))

    def has(self, v) -> jax.Array:
        return self.member[v]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseNodeMap:
    """``Map<Node, V>`` as dense value + presence arrays
    (``gm_map_small/medium/large``, gm_map.h:12-680 — keyed by node id,
    so the dense [N_pad] layout replaces the hash map; the
    small/medium/large split is an XLA non-issue).

    Min/max queries break value ties by smallest key — a deterministic
    valid instance of the reference's unspecified hash iteration order.
    """
    val: jax.Array       # [N_pad] value dtype
    present: jax.Array   # [N_pad] bool

    @staticmethod
    def empty(n_pad: int, dtype=jnp.int32) -> "DenseNodeMap":
        return DenseNodeMap(jnp.zeros((n_pad,), dtype),
                            jnp.zeros((n_pad,), jnp.bool_))

    def set(self, k, v) -> "DenseNodeMap":
        return DenseNodeMap(self.val.at[k].set(v),
                            self.present.at[k].set(True))

    def add(self, k, v) -> "DenseNodeMap":
        """changeValueAtomicAdd: absent key maps to the summand."""
        cur = jnp.where(self.present[k], self.val[k], 0)
        return DenseNodeMap(self.val.at[k].set(cur + v),
                            self.present.at[k].set(True))

    def get(self, k):
        """Reads of absent keys yield the default value (gm_map
        getDefaultValue: V())."""
        return jnp.where(self.present[k], self.val[k],
                         jnp.zeros((), self.val.dtype))

    def remove(self, k) -> "DenseNodeMap":
        return DenseNodeMap(self.val, self.present.at[k].set(False))

    def has_key(self, k):
        return self.present[k]

    def size(self):
        return jnp.sum(self.present.astype(jnp.int32))

    def _masked(self, for_min: bool):
        if jnp.issubdtype(self.val.dtype, jnp.integer):
            big = jnp.iinfo(self.val.dtype).max
            small = jnp.iinfo(self.val.dtype).min
        else:
            big, small = jnp.inf, -jnp.inf
        fill = big if for_min else small
        return jnp.where(self.present, self.val,
                         jnp.asarray(fill, self.val.dtype))

    def min_key(self):
        """Key with minimum value (getMinKey_seq); ties -> smallest key."""
        return jnp.argmin(self._masked(True)).astype(jnp.int32)

    def max_key(self):
        m = self._masked(False)
        return jnp.argmax(m).astype(jnp.int32)

    def min_value(self):
        return jnp.min(self._masked(True))

    def max_value(self):
        return jnp.max(self._masked(False))

    def has_min_value(self, k):
        return self.present[k] & (self.val[k] == self.min_value())

    def has_max_value(self, k):
        return self.present[k] & (self.val[k] == self.max_value())


# -- node-keyed maps are dense property arrays ------------------------------

def node_keyed_counts(keys: jax.Array, n_pad: int) -> jax.Array:
    """``Map<Node, Int>`` histogram: count occurrences of each key."""
    return jax.ops.segment_sum(jnp.ones_like(keys, jnp.int32), keys,
                               num_segments=n_pad)


def map_max_key(values: jax.Array, valid: jax.Array) -> jax.Array:
    """``GetMaxKey()``: smallest key among maximal values (deterministic
    tie-break; the reference's hash-map iteration order is unspecified)."""
    n = values.shape[0]
    neg = jnp.where(valid, values, jnp.iinfo(jnp.int32).min)
    m = jnp.max(neg)
    first = jnp.argmax(neg == m)
    return first.astype(jnp.int32), m
