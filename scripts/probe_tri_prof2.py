"""On-TPU ablation profile of the v4 wide-hash triangle kernel.

End-to-end bench steady state is ~19 Mwedges/s (~53 ns/wedge) while the
r5 notes size the 512 B wide-bucket probe at ~17 ns — this isolates the
rest on ONE dense sub-range of the real cached LJ-scale DAG:

  full     production _count_wedges_hashed (decode + probe)
  decode   expansion decode only (b, c materialized, no table probe)
  probe    synthetic in-window (b, c), real table gather + compare
  gather   raw random 512 B-row gather from the wide table
  compare  the 64-wide VPU key compare on resident rows (no gather)

Env: TRI_CHUNK (default bench's 2^17), TRI_WEDGES (default 2^26).
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import green_marl_tpu.models.triangle as T  # noqa: E402
from green_marl_tpu.utils.limbs import limb_add, limb_value, limb_zero  # noqa: E402

d = np.load("/root/repo/data/rmat_lj_tri.npz")
assert int(d["version"]) == 4, "needs the v4 wide-hash cache"
dag_begin = d["dag_begin"]
dag_dst_np = d["dag_dst"]
D = int(d["D"])
wide, seed = d["wide"], int(d["seed"])

deg = np.diff(dag_begin.astype(np.int64))
src_of = np.repeat(np.arange(dag_begin.shape[0] - 1, dtype=np.int64),
                   deg)
row_end = dag_begin.astype(np.int64)[src_of + 1]
pairs = row_end - np.arange(D, dtype=np.int64) - 1
cum = np.zeros(D + 1, np.int64)
cum[1:] = np.cumsum(pairs)
num_w = int(cum[D])
max_deg = int(deg.max(initial=1))

CHUNK = int(os.environ.get("TRI_CHUNK", str(1 << 17)))
NW = int(os.environ.get("TRI_WEDGES", str(1 << 26)))

t0 = time.time()
float(jnp.zeros((), jnp.float32) + 1)
print(f"# tunnel init {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
wide_d = jax.device_put(wide)
dd = jax.device_put(dag_dst_np)
jax.block_until_ready((wide_d, dd))
print(f"# transfer {(wide.nbytes+dag_dst_np.nbytes)/1e6:.0f}MB "
      f"in {time.time()-t0:.1f}s", flush=True)

# dense sub-range 0, exactly as bench slices it
s1 = int(np.searchsorted(cum, NW, side="left"))
s1 = max(s1 - 1, 1)
n_w = int(cum[s1])
pcv = np.clip(cum[: s1 + 2], 0, n_w)
smp, span_bits = T._anchor_samples(pcv, n_w)
pc = jax.device_put(pcv.astype(np.int32))
smp_d = jax.device_put(smp.astype(np.int32))
exp = T._quantized_windows(smp, n_w, CHUNK, max_deg,
                           int(dag_dst_np.shape[0]), 0)
s_max, d_win = exp[0], exp[1]
print(f"# subrange: n_w={n_w} s_max={s_max} d_win={d_win} "
      f"chunk={CHUNK}", flush=True)

hw = wide.shape[0]
DW = T._DISPATCH_W


def pad_to_pow2(a, fill):
    n = int(a.shape[0])
    m = 1 << max(n - 1, 1).bit_length()
    if m > n:
        a = jnp.concatenate([a, jnp.full((m - n,), fill, a.dtype)])
    return a


smp_p = pad_to_pow2(smp_d, smp_d[-1])
pc_p = pad_to_pow2(pc, jnp.asarray(n_w, jnp.int32))
if pc_p.shape[0] < s_max + 8:
    pc_p = jnp.concatenate([pc_p, jnp.full((s_max + 8 - pc_p.shape[0],),
                                           n_w, pc_p.dtype)])


@partial(jax.jit, static_argnames=("chunk", "s_max", "d_win", "sseed",
                                   "mode"))
def kernel(dag_dst, pair_cum, samples, table, k0, n_limit, chunk,
           s_max, d_win, sseed, mode):
    num_chunks = DW // chunk
    n_marks = samples.shape[0]

    def do_chunk(ci, acc):
        k_start = k0 + ci * chunk
        if mode in ("dec_cmx", "dec_cmx2", "full_cmx2"):
            # scatter+cummax decode: anchor ordinal+pos packed in one
            # int32 (il<<17 | pos, il<16384, pos<2^17), forward-filled
            # by cummax; b forward-filled via two 16-bit half packs
            i0 = samples[jnp.minimum(k_start >> 8, n_marks - 1)]
            i0 = jnp.minimum(i0, pair_cum.shape[0] - s_max)
            pc_win = jax.lax.dynamic_slice_in_dim(
                pair_cum, jnp.maximum(i0, 0), s_max)
            dd_win = jax.lax.dynamic_slice_in_dim(
                dag_dst, jnp.minimum(i0, dag_dst.shape[0] - d_win),
                d_win)
            dbase = jnp.minimum(i0, dag_dst.shape[0] - d_win)
            karr = jnp.arange(chunk, dtype=jnp.int32)
            k = k_start + karr
            valid = k < n_limit
            pos = pc_win.astype(jnp.int32) - k_start      # [s_max]
            base = jnp.sum((pos <= 0).astype(jnp.int32))
            inb = (pos >= 1) & (pos < chunk)
            mpos = jnp.clip(pos, 0, chunk - 1)
            ils = jnp.arange(s_max, dtype=jnp.int32)
            NEG = jnp.int32(-2147483647)
            packA = jnp.where(inb, (ils << 17) | pos, NEG)
            fillA = jnp.full((chunk,), NEG, jnp.int32).at[mpos].max(
                packA, mode="drop")
            b0 = base - 1
            pos0 = pc_win[jnp.clip(b0, 0, s_max - 1)] - k_start
            fillA = fillA.at[0].max((b0 << 17) |
                                    jnp.maximum(pos0 + chunk, 0) - chunk
                                    + chunk * 0)
            # pos0 <= 0 breaks the packing; encode pos0 as 0 and
            # absorb the difference into off via poscur<=0 handling:
            fillA = fillA.at[0].max((b0 << 17))
            cmA = jax.lax.cummax(fillA)
            il = cmA >> 17
            poscur = cmA & jnp.int32(0x1ffff)
            # lane 0 carry-in: anchors with pos<=0 encoded pos=0; true
            # off needs k - pc_win[il]; recover via pc gather only when
            # poscur==0? cheap: off = karr - poscur works when pos>=1;
            # for the carry-in segment use karr - pos0
            off = jnp.where(poscur > 0, karr - poscur, karr - pos0)
            if mode == "dec_cmx":
                b = dd_win[jnp.clip(il, 0, d_win - 1)]
            else:
                bwin = dd_win[:s_max]
                lo = jnp.where(inb, (ils << 16) | (bwin & 0xffff), NEG)
                hi = jnp.where(inb, (ils << 16) |
                               ((bwin >> 16) & 0x7f), NEG)
                fillL = jnp.full((chunk,), NEG, jnp.int32).at[
                    mpos].max(lo, mode="drop")
                fillH = jnp.full((chunk,), NEG, jnp.int32).at[
                    mpos].max(hi, mode="drop")
                b0c = jnp.clip(b0, 0, s_max - 1)
                fillL = fillL.at[0].max((b0c << 16) |
                                        (bwin[b0c] & 0xffff))
                fillH = fillH.at[0].max((b0c << 16) |
                                        ((bwin[b0c] >> 16) & 0x7f))
                b = ((jax.lax.cummax(fillH) & 0xffff) << 16) | \
                    (jax.lax.cummax(fillL) & 0xffff)
            c = dd_win[jnp.clip(il + 1 + off, 0, d_win - 1)]
        elif mode in ("full", "decode", "full_ss", "decode_ss",
                    "dec_nosc", "dec_nowin", "dec_nocum", "dec_seg"):
            i0 = samples[jnp.minimum(k_start >> 8, n_marks - 1)]
            i0 = jnp.minimum(i0, pair_cum.shape[0] - s_max)
            pc_win = jax.lax.dynamic_slice_in_dim(
                pair_cum, jnp.maximum(i0, 0), s_max)
            k = k_start + jnp.arange(chunk, dtype=jnp.int32)
            valid = k < n_limit
            if mode.endswith("_ss"):
                # pos sorted ascending -> anchor index by searchsorted
                i = i0 - 1 + jnp.searchsorted(
                    pc_win, k, side='right').astype(jnp.int32)
            else:
                pos = pc_win.astype(jnp.int32) - k_start
                base = jnp.sum((pos <= 0).astype(jnp.int32))
                inb = (pos >= 1) & (pos < chunk)
                if mode == "dec_nosc":
                    marks = (k & 7) == 0          # no scatter
                    marks = marks.astype(jnp.int32)
                elif mode == "dec_seg":
                    marks = jax.ops.segment_sum(
                        jnp.where(inb, 1, 0),
                        jnp.clip(pos, 0, chunk - 1),
                        num_segments=chunk, indices_are_sorted=True)
                else:
                    marks = jnp.zeros((chunk,), jnp.int32).at[
                        jnp.clip(pos, 0, chunk - 1)].add(
                        jnp.where(inb, 1, 0), mode="drop")
                if mode == "dec_nocum":
                    inc = marks                   # no cumsum
                else:
                    inc = jnp.cumsum(marks)
                i = i0 + base - 1 + inc
            if mode == "dec_nowin":
                b = jnp.clip(i, 0, dag_dst.shape[0] - 1)  # no gathers
                c = b + 1
            else:
                il = jnp.clip(i - i0, 0, s_max - 1)
                off = k - pc_win[il]
                dd_win = jax.lax.dynamic_slice_in_dim(
                    dag_dst, jnp.minimum(i0, dag_dst.shape[0] - d_win),
                    d_win)
                dbase = jnp.minimum(i0, dag_dst.shape[0] - d_win)
                b = dd_win[jnp.clip(i - dbase, 0, d_win - 1)]
                j = i + 1 + off
                c = dd_win[jnp.clip(j - dbase, 0, d_win - 1)]
        else:
            # synthetic decode: spread ids over the key space
            k = k_start + jnp.arange(chunk, dtype=jnp.int32)
            valid = k < n_limit
            b = (k.astype(jnp.uint32) * jnp.uint32(2654435761)
                 ).astype(jnp.int32) & jnp.int32(0x7fffffff)
            b = b % jnp.asarray(dag_dst.shape[0] - 1, jnp.int32)
            c = b + 1
        if mode in ("full", "full_ss", "full_cmx2", "probe"):
            h1 = T._mix_hash(b, c, sseed, hw, xp=jnp)
            rows = table[h1]
            kb = rows[:, 0::2]
            kc = rows[:, 1::2]
            hit = jnp.any((kb == b[:, None]) & (kc == c[:, None]),
                          axis=1)
        elif mode == "gather":
            h1 = T._mix_hash(b, c, sseed, hw, xp=jnp)
            rows = table[h1]
            hit = rows[:, 0] == b
        elif mode == "compare":
            rows = jax.lax.dynamic_slice_in_dim(
                table, 0, chunk)             # resident block, no gather
            kb = rows[:, 0::2]
            kc = rows[:, 1::2]
            hit = jnp.any((kb == b[:, None]) & (kc == c[:, None]),
                          axis=1)
        else:
            hit = (b + c) % 7 == 0           # decode-only consumer
        return limb_add(acc, jnp.sum((hit & valid).astype(jnp.int32)))

    return jax.lax.fori_loop(0, num_chunks, do_chunk, limb_zero())


n_run = min(n_w, NW)
for mode in ("decode", "dec_cmx", "dec_cmx2", "full", "full_cmx2"):
    # warm
    tot = limb_value(kernel(dd, pc_p, smp_p, wide_d,
                            jnp.asarray(0, jnp.int32),
                            jnp.asarray(n_run, jnp.int32), CHUNK,
                            s_max, d_win, seed, mode))
    reps = []
    for r in (1, 2, 3):
        t0 = time.time()
        acc = 0
        for k0 in range(0, n_run, DW):
            # n_limit varies per rep to defeat the tunnel's dispatch
            # memoization (identical args would return cached results)
            acc += limb_value(kernel(
                dd, pc_p, smp_p, wide_d, jnp.asarray(k0, jnp.int32),
                jnp.asarray(n_run - r, jnp.int32), CHUNK,
                s_max, d_win, seed, mode))
        reps.append(time.time() - t0)
    dt = float(np.median(reps))
    print(f"{mode:8s} {n_run/dt/1e6:8.1f} Mwedges/s  "
          f"{dt*1e9/n_run:6.1f} ns/wedge  (count={acc})", flush=True)
