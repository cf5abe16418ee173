"""On-TPU component profile of the hashed triangle kernel.

The round-5 steady state is 11-14 Mwedges/s (~77 ns/wedge) while the
2 independent probe gathers should cost ~19 ns at the measured
9.5 ns/row issue rate — this probe isolates where the other ~58 ns
goes by timing ablated kernel variants on ONE wedge sub-range:

  decode   expansion decode only (no membership probes)
  prim     decode + primary probe
  full     decode + primary + secondary (the production kernel)
  probes   primary + secondary on synthetic (b, c) (no decode)
  gather   one raw [chunk, 16] row gather from the primary table

Env: TRI_CHUNK (default 2^18), TRI_WEDGES (default 2^27).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from functools import partial  # noqa: E402

import green_marl_tpu.models.triangle as T  # noqa: E402
from green_marl_tpu.utils.limbs import limb_add, limb_value, limb_zero  # noqa: E402

d = np.load("/root/repo/data/rmat_lj_tri.npz")
dag_begin = d["dag_begin"]
dag_dst_np = d["dag_dst"]
D = int(d["D"])
prim, sec, seed = d["prim"], d["sec"], int(d["seed"])

deg = np.diff(dag_begin.astype(np.int64))
src_of = np.repeat(np.arange(dag_begin.shape[0] - 1, dtype=np.int64), deg)
row_end = dag_begin.astype(np.int64)[src_of + 1]
pairs = row_end - np.arange(D, dtype=np.int64) - 1
cum = np.zeros(D + 1, np.int64)
cum[1:] = np.cumsum(pairs)
num_w = int(cum[D])
max_deg = int(deg.max(initial=1))

t0 = time.time()
float(jnp.zeros((), jnp.float32) + 1)
print(f"# tunnel init {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
prim_d = jax.device_put(prim)
sec_d = jax.device_put(sec)
dd = jax.device_put(dag_dst_np)
jax.block_until_ready(prim_d)
print(f"# transfer {(prim.nbytes+sec.nbytes+dag_dst_np.nbytes)/1e6:.0f}"
      f"MB in {time.time()-t0:.1f}s", flush=True)

chunks = [int(x) for x in
          os.environ.get("TRI_CHUNK", str(1 << 18)).split(",")]
chunk = chunks[0]
LIMIT = int(os.environ.get("TRI_WEDGES", str(1 << 27)))
DISPATCH_W = T._DISPATCH_W

# first sub-range
s1 = int(np.searchsorted(cum, LIMIT, side="left"))
s1 = max(min(s1 - 1, D), 1)
n_w = int(cum[s1])
pcv = np.clip(cum[: s1 + 2], 0, n_w)
smp, span_bits = T._anchor_samples(pcv, n_w)
qw = T._quantized_windows(smp, n_w, chunk, max_deg,
                          int(dag_dst_np.shape[0]))
s_max, d_win = qw
print(f"# subrange w={n_w} slots={s1} s_max={s_max} d_win={d_win} "
      f"chunk={chunk}", flush=True)

pc = jax.device_put(pcv.astype(np.int32))
smp_d = jax.device_put(smp)
hp = prim.shape[0]
hs = sec.shape[0]

# ---- one-level WIDE table: 64 keys/bucket = 128 int32 = one 512 B row
# (the binned engine's proven gather shape).  Mean occupancy 32 at
# alpha=0.5 -> same 1.1 GB footprint as prim+sec, zero overflow after
# seed retries (Poisson(32) beyond 64 is ~1e-7 per bucket).
WSLOTS = int(os.environ.get("TRI_WSLOTS", "64"))
t0 = time.time()
# the cached prim/sec tables already hold the exact key set (rank
# pairs) — extract rather than re-derive
pk = prim.reshape(-1, 2)
sk = sec.reshape(-1, 2)
allk = np.concatenate([pk[pk[:, 0] != -1], sk[sk[:, 0] != -1]])
bk, ck = allk[:, 0].copy(), allk[:, 1].copy()
print(f"# wide build: {bk.shape[0]} keys (D={D})", flush=True)
hw = max(int(bk.shape[0] / (WSLOTS // 2)) + 1, 8)
wide = None
for wseed in (0x1234ABCD, 0x7F4A7C15, 0x2545F491, 0xDEADBEEF):
    hwv = T._mix_hash(bk, ck, wseed, hw)
    tbl, over = T._fill_table(bk, ck, hwv, hw, slots=WSLOTS)
    print(f"# wide seed {wseed:#x}: overflow {int(over.sum())}",
          flush=True)
    if not over.any():
        wide = tbl
        break
print(f"# wide table [{hw},{2*WSLOTS}] {tbl.nbytes/1e9:.2f}GB "
      f"built {time.time()-t0:.1f}s", flush=True)
wide_d = jax.device_put(wide) if wide is not None else None
if wide_d is not None:
    jax.block_until_ready(wide_d)
# split-plane layout: [b0..b63 | c0..c63] — compares become contiguous
# lane slices instead of stride-2 gathers of the row
wsplit_d = None
if wide is not None:
    wsplit = np.concatenate([wide[:, 0::2], wide[:, 1::2]], axis=1)
    wsplit_d = jax.device_put(np.ascontiguousarray(wsplit))
    jax.block_until_ready(wsplit_d)


@partial(jax.jit, static_argnames=("chunk", "s_max", "d_win", "seed",
                                   "mode"))
def kern(dag_dst, pair_cum, samples, prim, sec, k0, n_limit,
         chunk: int, s_max: int, d_win: int, seed: int, mode: str):
    num_chunks = DISPATCH_W // chunk
    n_marks = samples.shape[0]

    def probe(table, h, b, c):
        rows = table[h]
        kb = rows[:, 0::2]
        kc = rows[:, 1::2]
        return jnp.any((kb == b[:, None]) & (kc == c[:, None]), axis=1)

    def do_chunk(ci, acc):
        k_start = k0 + ci * chunk
        k = k_start + jnp.arange(chunk, dtype=jnp.int32)
        valid = k < n_limit
        if mode in ("decode", "decode_live", "prim", "full", "wide",
                    "split"):
            i0 = samples[jnp.minimum(k_start >> 8, n_marks - 1)]
            i0 = jnp.minimum(i0, pair_cum.shape[0] - s_max)
            pc_win = jax.lax.dynamic_slice_in_dim(
                pair_cum, jnp.maximum(i0, 0), s_max)
            pos = pc_win.astype(jnp.int32) - k_start
            base = jnp.sum((pos <= 0).astype(jnp.int32))
            inb = (pos >= 1) & (pos < chunk)
            marks = jnp.zeros((chunk,), jnp.int32).at[
                jnp.clip(pos, 0, chunk - 1)].add(
                jnp.where(inb, 1, 0), mode="drop")
            inc = jnp.cumsum(marks)
            i = i0 + base - 1 + inc
            il = jnp.clip(i - i0, 0, s_max - 1)
            off = k - pc_win[il]
            dd_win = jax.lax.dynamic_slice_in_dim(
                dag_dst, jnp.minimum(i0, dag_dst.shape[0] - d_win),
                d_win)
            dbase = jnp.minimum(i0, dag_dst.shape[0] - d_win)
            b = dd_win[jnp.clip(i - dbase, 0, d_win - 1)]
            c = dd_win[jnp.clip(i + 1 + off - dbase, 0, d_win - 1)]
        else:
            # synthetic (b, c): uniform pseudo-random pairs — same hash
            # distribution, zero decode work
            b = (k * jnp.int32(-1640531527)) & jnp.int32(0x3FFFFF)
            c = (k * jnp.int32(40503)) & jnp.int32(0x3FFFFF)
        if mode == "decode":
            # NOTE: b/c are dead here and XLA DCEs their window
            # gathers — this measures marks/cumsum only
            hit = valid
        elif mode == "decode_live":
            # consume b and c so the in-VMEM window gathers survive;
            # no membership probe — isolates the true decode cost
            hit = (((b ^ c) & 1) == 0) & valid
        elif mode == "gather":
            h1 = T._mix_hash(b, c, seed, hp, xp=jnp)
            rows = prim[h1]
            hit = (rows[:, 0] == b) & valid
        elif mode in ("wide", "wide_syn"):
            # prim here is the [Hw, 2*WSLOTS] one-level wide table
            h1 = T._mix_hash(b, c, seed, prim.shape[0], xp=jnp)
            hit = probe(prim, h1, b, c) & valid
        elif mode in ("split", "split_syn"):
            ns = prim.shape[1] // 2
            h1 = T._mix_hash(b, c, seed, prim.shape[0], xp=jnp)
            rows = prim[h1]
            hit = jnp.any((rows[:, :ns] == b[:, None])
                          & (rows[:, ns:] == c[:, None]), axis=1)
            hit = hit & valid
        else:
            h1 = T._mix_hash(b, c, seed, hp, xp=jnp)
            hit = probe(prim, h1, b, c)
            if mode in ("full", "probes"):
                h2 = T._mix_hash(b, c, seed ^ 0x5bd1e995, hs, xp=jnp)
                hit = hit | probe(sec, h2, b, c)
            hit = hit & valid
        return limb_add(acc, jnp.sum(hit.astype(jnp.int32)))

    return jax.lax.fori_loop(0, num_chunks, do_chunk, limb_zero())


@partial(jax.jit, static_argnames=("chunk", "s_max", "d_win", "seed"))
def kern_twopass(dag_dst, pair_cum, samples, wide, k0, n_limit,
                 chunk: int, s_max: int, d_win: int, seed: int):
    """Phase 1: decode every wedge's (b, c) into an HBM staging buffer
    (sequential writes).  Phase 2: probe the wide table with the staged
    pairs (pure gather pass, no decode dependency in the index chain)."""
    num_chunks = DISPATCH_W // chunk
    n_marks = samples.shape[0]
    hw = wide.shape[0]

    def decode_chunk(ci, bufs):
        bs, cs = bufs
        k_start = k0 + ci * chunk
        k = k_start + jnp.arange(chunk, dtype=jnp.int32)
        i0 = samples[jnp.minimum(k_start >> 8, n_marks - 1)]
        i0 = jnp.minimum(i0, pair_cum.shape[0] - s_max)
        pc_win = jax.lax.dynamic_slice_in_dim(
            pair_cum, jnp.maximum(i0, 0), s_max)
        pos = pc_win.astype(jnp.int32) - k_start
        base = jnp.sum((pos <= 0).astype(jnp.int32))
        inb = (pos >= 1) & (pos < chunk)
        marks = jnp.zeros((chunk,), jnp.int32).at[
            jnp.clip(pos, 0, chunk - 1)].add(
            jnp.where(inb, 1, 0), mode="drop")
        inc = jnp.cumsum(marks)
        i = i0 + base - 1 + inc
        il = jnp.clip(i - i0, 0, s_max - 1)
        off = k - pc_win[il]
        dd_win = jax.lax.dynamic_slice_in_dim(
            dag_dst, jnp.minimum(i0, dag_dst.shape[0] - d_win), d_win)
        dbase = jnp.minimum(i0, dag_dst.shape[0] - d_win)
        b = dd_win[jnp.clip(i - dbase, 0, d_win - 1)]
        c = dd_win[jnp.clip(i + 1 + off - dbase, 0, d_win - 1)]
        bs = jax.lax.dynamic_update_slice_in_dim(bs, b, ci * chunk, 0)
        cs = jax.lax.dynamic_update_slice_in_dim(cs, c, ci * chunk, 0)
        return bs, cs

    bs0 = jnp.zeros((DISPATCH_W,), jnp.int32)
    bs, cs = jax.lax.fori_loop(0, num_chunks, decode_chunk, (bs0, bs0))

    if os.environ.get("TRI_FLAT", "0") == "1":
        # ONE flat gather + fused compare/reduce over the whole
        # dispatch — the binned engine's edge_map shape (gather feeds a
        # reduction directly; XLA tiles it without materializing
        # [n, 128] in HBM)
        k = k0 + jnp.arange(DISPATCH_W, dtype=jnp.int32)
        valid = k < n_limit
        h = T._mix_hash(bs, cs, seed, hw, xp=jnp)
        rows = wide[h]
        kb = rows[:, 0::2]
        kc = rows[:, 1::2]
        hit = jnp.any((kb == bs[:, None]) & (kc == cs[:, None]), axis=1)
        n_hit = jnp.sum((hit & valid).astype(jnp.int32))
        return limb_add(limb_zero(), n_hit)

    def probe_chunk(ci, acc):
        k_start = k0 + ci * chunk
        k = k_start + jnp.arange(chunk, dtype=jnp.int32)
        valid = k < n_limit
        b = jax.lax.dynamic_slice_in_dim(bs, ci * chunk, chunk)
        c = jax.lax.dynamic_slice_in_dim(cs, ci * chunk, chunk)
        h = T._mix_hash(b, c, seed, hw, xp=jnp)
        rows = wide[h]
        kb = rows[:, 0::2]
        kc = rows[:, 1::2]
        hit = jnp.any((kb == b[:, None]) & (kc == c[:, None]), axis=1)
        return limb_add(acc, jnp.sum((hit & valid).astype(jnp.int32)))

    return jax.lax.fori_loop(0, num_chunks, probe_chunk, limb_zero())


n_disp = (n_w + DISPATCH_W - 1) // DISPATCH_W
modes = ["full", "prim", "decode", "probes", "gather"]
if wide_d is not None:
    modes += ["wide", "wide_syn"]
if os.environ.get("TRI_ONLY"):
    modes = os.environ["TRI_ONLY"].split(",")


def run_mode(mode, chunk):
    tb = wide_d if mode.startswith("wide") else \
        wsplit_d if mode.startswith("split") else prim_d
    sd = wseed if mode.startswith(("wide", "split")) else seed
    t = kern(dd, pc, smp_d, tb, sec_d, jnp.asarray(0, jnp.int32),
             jnp.asarray(n_w, jnp.int32), chunk, s_max, d_win, sd,
             mode)
    limb_value(t)
    t0 = time.time()
    total = 0
    for k0 in range(0, n_w, DISPATCH_W):
        t = kern(dd, pc, smp_d, tb, sec_d,
                 jnp.asarray(k0, jnp.int32),
                 jnp.asarray(n_w, jnp.int32), chunk, s_max, d_win,
                 sd, mode)
        total += limb_value(t)
    dt = time.time() - t0
    print(f"# {mode:8s} c={chunk:>6d} T={total:>9d} {dt:6.1f}s "
          f"{n_w/dt/1e6:7.1f} Mw/s {dt/n_w*1e9:6.1f} ns/wedge",
          flush=True)


def run_twopass(chunk):
    t = kern_twopass(dd, pc, smp_d, wide_d, jnp.asarray(0, jnp.int32),
                     jnp.asarray(n_w, jnp.int32), chunk, s_max, d_win,
                     wseed)
    limb_value(t)
    t0 = time.time()
    total = 0
    for k0 in range(0, n_w, DISPATCH_W):
        t = kern_twopass(dd, pc, smp_d, wide_d,
                         jnp.asarray(k0, jnp.int32),
                         jnp.asarray(n_w, jnp.int32), chunk, s_max,
                         d_win, wseed)
        total += limb_value(t)
    dt = time.time() - t0
    label = "flat" if os.environ.get("TRI_FLAT", "0") == "1" \
        else "twopass"
    print(f"# {label:8s} c={chunk:>6d} T={total:>9d} {dt:6.1f}s "
          f"{n_w/dt/1e6:7.1f} Mw/s {dt/n_w*1e9:6.1f} ns/wedge",
          flush=True)


if len(chunks) > 1:
    for mode in modes:
        for ch in chunks:
            run_mode(mode, ch)
    if wide_d is not None and os.environ.get("TRI_TWOPASS", "1") == "1":
        run_twopass(chunks[0])
    raise SystemExit(0)

if wide_d is not None and os.environ.get("TRI_TWOPASS", "1") == "1":
    t = kern_twopass(dd, pc, smp_d, wide_d, jnp.asarray(0, jnp.int32),
                     jnp.asarray(n_w, jnp.int32), chunk, s_max, d_win,
                     wseed)
    limb_value(t)
    t0 = time.time()
    total = 0
    for k0 in range(0, n_w, DISPATCH_W):
        t = kern_twopass(dd, pc, smp_d, wide_d,
                         jnp.asarray(k0, jnp.int32),
                         jnp.asarray(n_w, jnp.int32), chunk, s_max,
                         d_win, wseed)
        total += limb_value(t)
    dt = time.time() - t0
    print(f"# twopass  T={total:>9d} {dt:6.1f}s "
          f"{n_w/dt/1e6:7.1f} Mw/s {dt/n_w*1e9:6.1f} ns/wedge",
          flush=True)
for mode in modes:
    tb = wide_d if mode.startswith("wide") else prim_d
    sd = wseed if mode.startswith("wide") else seed
    # warm (compile)
    t = kern(dd, pc, smp_d, tb, sec_d, jnp.asarray(0, jnp.int32),
             jnp.asarray(n_w, jnp.int32), chunk, s_max, d_win, sd,
             mode)
    limb_value(t)
    t0 = time.time()
    total = 0
    for k0 in range(0, n_w, DISPATCH_W):
        t = kern(dd, pc, smp_d, tb, sec_d,
                 jnp.asarray(k0, jnp.int32),
                 jnp.asarray(n_w, jnp.int32), chunk, s_max, d_win,
                 sd, mode)
        total += limb_value(t)
    dt = time.time() - t0
    print(f"# {mode:8s} T={total:>9d} {dt:6.1f}s "
          f"{n_w/dt/1e6:7.1f} Mw/s {dt/n_w*1e9:6.1f} ns/wedge",
          flush=True)
