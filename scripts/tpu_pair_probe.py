#!/usr/bin/env python3
"""Pair-space Pallas DP step probe (B=16 class).

The edge-space kernel (tpu_edge_probe.py) measured 3.64 us/level at
B=16: its [19,16,16] tensors use 16 of 128 lanes, wasting 8x of the
VPU. This probe reformulates the transition in PAIR SPACE:

  state Vp[r, s] with s = i*B + j  -> [R1, 256] (full 2-vreg lanes)
  cand[r, e12]  = Vx[r, gidx[e12]] + S[e12]      (one MXU matmul)
  Vx            = concat over lanes of (Vp, roll_r(Vp,1), roll_r(Vp,2))
  best[r, d12]  = segmented lexicographic max over e12 grouped by
                  dstpair d12 (edge pairs host-sorted by (d12, tie))

Also probes the backpointer spill: the tie plane [R1, 256] int16 is
written per level into a flat HBM output at a prefetched dynamic
offset (1-D contiguous DMA), which the production megakernel needs for
mixed-bucket layouts.

Cross-checks the final DP state against the same numpy oracle as
tpu_edge_probe.py and reports the per-level slope.

Usage: python scripts/tpu_pair_probe.py [T1 T2]
"""
from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R1 = 19
NEG = -(2**19)
REACH_T = -(2**18)
INVALID = -(2**30)
B = 16
EB = 16
NP2 = B * B  # pair lanes


def make_tables(T, seed=0):
    """Random level chain (same graph family as tpu_edge_probe).

    Returns tbl [T, 8, NP2] int32 with rows: 0 gidx (srcpair lane),
    1 score, 2 tie (slotcode, larger = preferred), 3 dstpair segment id,
    4 lastE (last e12 per dstpair, -1 if none), 5 wsum; rows 6-7 spare
    (TPU blocks need sublane multiples of 8).
    """
    rng = np.random.default_rng(seed)
    tbl = np.zeros((T, 8, NP2), np.int32)
    gidx, sc, tie, seg, lastE, wsum = (tbl[:, i] for i in range(6))
    hostE = []
    for t in range(T):
        dst = np.concatenate([np.arange(B), rng.integers(0, B, EB - B)])
        src = rng.integers(0, B, EB)
        w = (rng.random(EB) < 0.12).astype(np.int32)
        order = np.lexsort((src, dst))
        dst, src, w = dst[order], src[order], w[order]
        s2 = rng.integers(0, 50, (EB, EB)).astype(np.int32)
        hostE.append((src.copy(), dst.copy(), w.copy(), s2))
        # edge pairs, sorted by (dstpair, e1, e2); slot order == pred order
        e1 = np.repeat(np.arange(EB), EB)
        e2 = np.tile(np.arange(EB), EB)
        dp = dst[e1] * B + dst[e2]
        po = np.lexsort((e2, e1, dp))
        e1, e2, dp = e1[po], e2[po], dp[po]
        gidx[t] = src[e1] * B + src[e2]
        wsum[t] = w[e1] + w[e2]
        sc[t] = s2[e1, e2]
        tie[t] = NP2 - 1 - np.arange(NP2)  # lane-monotone slotcode
        seg[t] = dp
        le = np.full(NP2, -1, np.int32)
        le[dp] = np.arange(NP2)  # increasing, so last write wins
        lastE[t] = le
    return tbl, hostE


def oracle(hostE):
    V = np.full((R1, B, B), NEG, np.int64)
    V[:, 0, 0] = 0
    for src, dst, w, sc in hostE:
        Vn = np.full((R1, B, B), NEG, np.int64)
        for e1 in range(EB):
            for e2 in range(EB):
                ws = w[e1] + w[e2]
                for r in range(R1):
                    if r - ws < 0:
                        continue
                    g = V[r - ws, src[e1], src[e2]]
                    if g <= REACH_T:
                        continue
                    c = g + sc[e1, e2]
                    if c > Vn[r, dst[e1], dst[e2]]:
                        Vn[r, dst[e1], dst[e2]] = c
        V = Vn
    return V


def kernel(off_ref, tbl_ref, bp_ref, v_ref, V):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        li = jax.lax.broadcasted_iota(jnp.int32, (R1, NP2), 1)
        V[...] = jnp.where(li == 0, 0, NEG)

    tbl = tbl_ref[0]  # [8, NP2]
    gidx = tbl[0]
    sc = tbl[1]
    tiev = tbl[2]
    seg = tbl[3]
    lastE = tbl[4]
    wsum = tbl[5]

    v = V[...]  # [R1, NP2] int32

    # one-hot gather matrix G[g, e12] = (gidx[e12] == g); the r-shift by
    # wsum is applied AFTER the lane gather (roll in r commutes with a
    # per-lane gather), so G is NP2-wide, not 3*NP2-wide
    rows = jax.lax.broadcasted_iota(jnp.int32, (NP2, NP2), 0)
    G = (rows == gidx[None, :]).astype(jnp.float32)
    g0 = jax.lax.dot_general(
        v.astype(jnp.float32), G,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # [R1, NP2]
    ri = jax.lax.broadcasted_iota(jnp.int32, (R1, NP2), 0)
    g1 = jnp.where(ri >= 1, pltpu.roll(g0, 1, 0), NEG)
    g2 = jnp.where(ri >= 2, pltpu.roll(g0, 2, 0), NEG)
    wb = wsum[None, :]
    cand = jnp.where(wb == 0, g0, jnp.where(wb == 1, g1, g2))

    # packed key: (value << 8) | slotcode  (larger slotcode = preferred;
    # exact for |value + score| < 2^22, guarded at plan time)
    kv = jnp.where(
        cand < REACH_T, jnp.int32(INVALID),
        (cand + sc[None, :]) * 256 + tiev[None, :],
    )

    # segmented inclusive max-scan over lanes (e12 axis), single key
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, NP2), 1)
    segb = seg[None, :]
    s = 1
    while s < NP2:
        conn = (lane >= s) & (segb == pltpu.roll(segb, s, 1))
        m = jnp.broadcast_to(conn, (R1, NP2))
        sv = pltpu.roll(kv, s, 1)
        kv = jnp.where(m & (sv > kv), sv, kv)
        s *= 2

    # unpack, then extract segment ends with ONE stacked matmul
    vfin = jax.lax.shift_right_arithmetic(kv, 8)
    slot = jnp.bitwise_and(kv, 255)
    OFF = jnp.int32(1 << 22)  # makes extracted values strictly positive
    stacked = jnp.concatenate([vfin + OFF, slot + 1], axis=0)  # [2*R1, NP2]
    rowsE = jax.lax.broadcasted_iota(jnp.int32, (NP2, NP2), 0)
    E = (rowsE == lastE[None, :]).astype(jnp.float32)
    ex = jax.lax.dot_general(
        stacked.astype(jnp.float32), E,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # [2*R1, NP2]
    zv = jnp.where(ex[:R1] > 0, ex[:R1] - OFF, jnp.int32(INVALID))
    zt = ex[R1:] - 1

    reach = zv > REACH_T
    V[...] = jnp.where(reach, zv, jnp.int32(NEG))
    v_ref[...] = V[...]

    # bp spill: int16 tie plane via pipelined output block (row-padded
    # to a sublane multiple; production uses prefetch-scalar index maps
    # so each bucket class flushes at its own rate)
    bp = jnp.where(reach, zt, 0).astype(jnp.int16)
    bp_ref[0, :R1, :] = bp


def build(T):
    tbl, hostE = make_tables(T)
    offs = (np.arange(T) * R1).astype(np.int32)  # row offset into [T*R1, NP2]

    def kern(off_ref, tbl_ref, bp_ref, v_ref, V):
        kernel(off_ref, tbl_ref, bp_ref, v_ref, V)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 8, NP2), lambda t, off: (t, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 24, NP2), lambda t, off: (t, 0, 0)),
            pl.BlockSpec((R1, NP2), lambda t, off: (0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((R1, NP2), jnp.int32),
        ],
    )

    def run(offs, tbl):
        bp, v = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((T, 24, NP2), jnp.int16),
                jax.ShapeDtypeStruct((R1, NP2), jnp.int32),
            ),
        )(offs, tbl)
        return v[R1 - 1, 0], v, bp

    args = (jnp.asarray(offs), jnp.asarray(tbl))
    return jax.jit(run), args, hostE


def timed(fn, args, label):
    t0 = time.time()
    out = fn(*args)
    float(np.asarray(out[0]))
    dt = time.time() - t0
    print(f"  {label}: {dt:.3f}s", file=sys.stderr, flush=True)
    return dt, out


def main():
    T1 = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    T2 = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    fc, ac, hostE = build(40)
    _, out = timed(fc, ac, "correctness T=40")
    got = np.asarray(out[1]).reshape(R1, B, B)
    want = oracle(hostE)
    want_c = np.where(want > REACH_T, want, NEG)
    if not np.array_equal(got.astype(np.int64), want_c):
        bad = np.argwhere(got != want_c)
        print(f"MISMATCH at {bad[:10]}: got {got[tuple(bad[0])]} want "
              f"{want_c[tuple(bad[0])]}", flush=True)
        return 1
    print("correctness: OK", flush=True)
    # bp spill sanity: level 0 tie plane nonzero somewhere
    bp = np.asarray(out[2])[:, :R1, :]
    print(f"bp spill: shape {bp.shape}, nonzero {np.count_nonzero(bp)}",
          flush=True)

    f1, a1, _ = build(T1)
    f2, a2, _ = build(T2)
    timed(f1, a1, f"warmup T={T1}")
    timed(f2, a2, f"warmup T={T2}")
    t1 = min(timed(f1, a1, f"T={T1} rep{i}")[0] for i in range(2))
    t2 = min(timed(f2, a2, f"T={T2} rep{i}")[0] for i in range(2))
    s = (t2 - t1) / (T2 - T1)
    print(f"ppair16: {s * 1e6:.3f} us/level (slope {T1}->{T2})", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
