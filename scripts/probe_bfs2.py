"""Candidate primitive timings for the BFS rework, on the real chip:
- frontier compaction: nonzero vs sort
- level update: unsorted scatter vs sorted-unique scatter vs sort-merge
- pull gather: int32 vs int8
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from green_marl_tpu.ops import scan_reduce

    N_PAD = 4_800_128
    E = 69_000_000
    rng = np.random.default_rng(0)
    fr_np = rng.random(N_PAD) < 0.01
    level_np = rng.integers(-1, 5, N_PAD).astype(np.int32)
    dst_np = rng.integers(0, N_PAD - 128, 1 << 20).astype(np.int32)

    fr = jax.device_put(fr_np)
    level = jax.device_put(level_np)
    dst = jax.device_put(dst_np)
    float(jnp.zeros((), jnp.float32) + 1)
    print("ready", flush=True)

    def sync(x):
        return np.asarray(jax.device_get(jnp.ravel(x)[:1]))

    def t(label, fn, reps=3):
        fn(0)
        ts = []
        for k in range(1, reps + 1):
            t0 = time.time()
            fn(k)
            ts.append(time.time() - t0)
        print(f"{label}: {min(ts)*1000:.1f} ms", flush=True)

    ids = jnp.arange(N_PAD, dtype=jnp.int32)

    @jax.jit
    def compact_nonzero(fr, salt):
        fr = fr ^ (salt > 10**9)
        return jnp.nonzero(fr, size=N_PAD, fill_value=N_PAD)[0]

    @jax.jit
    def compact_sort(fr, salt):
        fr = fr ^ (salt > 10**9)
        keys = jnp.where(fr, ids, jnp.int32(N_PAD))
        return jax.lax.sort(keys)

    t("compact nonzero [n_pad]",
      lambda k: sync(compact_nonzero(fr, jnp.asarray(k))))
    t("compact sort    [n_pad]",
      lambda k: sync(compact_sort(fr, jnp.asarray(k))))

    @jax.jit
    def upd_scatter(level, dst, salt):
        d = dst + (salt & 1)
        return level.at[d].max(7, mode="drop")

    @jax.jit
    def upd_sorted_scatter(level, dst, salt):
        d = jax.lax.sort(dst + (salt & 1))
        first = jnp.concatenate([jnp.ones((1,), bool), d[1:] != d[:-1]])
        du = jnp.where(first, d, jnp.int32(N_PAD))
        return level.at[du].max(7, mode="drop",
                                indices_are_sorted=False,
                                unique_indices=True)

    @jax.jit
    def upd_sortmerge(level, dst, salt):
        d = dst + (salt & 1)
        # [n_pad + K] sort-merge: tag=0 existing rows, tag=1 updates
        allk = jnp.concatenate([ids, d])
        vals = jnp.concatenate([level, jnp.full(d.shape, 7, jnp.int32)])
        sk, sv = jax.lax.sort((allk, vals), num_keys=1)
        seg_start = jnp.concatenate(
            [jnp.ones((1,), bool), sk[1:] != sk[:-1]])
        seg_id = jnp.cumsum(seg_start.astype(jnp.int32)) - 1
        red = jax.ops.segment_max(sv, seg_id, num_segments=N_PAD,
                                  indices_are_sorted=True)
        return red

    t("update scatter-unsorted [1M]",
      lambda k: sync(upd_scatter(level, dst, jnp.asarray(k))))
    t("update sort+unique scatter [1M]",
      lambda k: sync(upd_sorted_scatter(level, dst, jnp.asarray(k))))
    t("update sort-merge rewrite [n_pad+1M]",
      lambda k: sync(upd_sortmerge(level, dst, jnp.asarray(k))))

    # pull gather dtype comparison
    src_np = rng.integers(0, N_PAD - 1, E).astype(np.int32)
    srcs = jax.device_put(src_np)
    begin_np = np.sort(rng.integers(0, E, N_PAD + 1)).astype(np.int32)
    begin_np[0], begin_np[-1] = 0, E
    begin = jax.device_put(begin_np)
    fr8 = jax.device_put(fr_np.astype(np.int8))

    @jax.jit
    def pull32(fr, srcs, begin, salt):
        fr = fr ^ (salt > 10**9)
        vals = fr[srcs].astype(jnp.int32)
        return scan_reduce.segment_sum_by_offsets(vals, begin, N_PAD) > 0

    @jax.jit
    def pull8(fr8, srcs, salt):
        f = fr8 ^ jnp.int8(salt > 10**9)
        return f[srcs]

    t("pull gather int32 + segsum [69M]",
      lambda k: sync(pull32(fr, srcs, begin, jnp.asarray(k))))
    t("pull gather int8 only [69M]",
      lambda k: sync(pull8(fr8, srcs, jnp.asarray(k))))


if __name__ == "__main__":
    main()
