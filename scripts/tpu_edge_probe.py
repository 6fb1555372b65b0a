#!/usr/bin/env python3
"""Prototype + floor probe for the edge-pair diploid-DP Pallas step.

One grid step = one level transition in the edge-pair formulation that
ops/diploid_pallas.py productionizes:

  cand[r, e1, e2] = V[r - w(e1) - w(e2), src(e1), src(e2)] + S[e1, e2]
  best[r, i2, j2] = lexicographic-max over {(e1, e2) : dst(e1)=i2,
                                            dst(e2)=j2} of (cand, tie)

Gathers are one-hot batched matmuls (f32, exact for |x| < 2^24); the
dst-grouped max is a segmented inclusive max-scan (edges sorted by
(dst, src)) + a one-hot extraction at per-dst segment ends. Every
primitive used here PASSes tpu_caps_probe / tpu_caps_probe2.

Measures the per-level slope (see tpu_floor_probe.py for the slope
methodology) and cross-checks the final DP state against a numpy oracle.

Usage: python scripts/tpu_edge_probe.py [T1 T2]
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


def make_tables(T, seed=0):
    """Random level chain: every level width B, E=EB edges sorted by
    (dst, src), ~12% weight-1 edges, every dst reachable."""
    rng = np.random.default_rng(seed)
    tblc = np.zeros((T, EB, 8), np.int32)
    tbl2c = np.zeros((T, B, 4), np.int32)
    S = np.zeros((T, EB, EB), np.int32)
    hostE = []
    for t in range(T):
        # one edge per dst first (connectivity), rest random
        dst = np.concatenate([np.arange(B), rng.integers(0, B, EB - B)])
        src = rng.integers(0, B, EB)
        w = (rng.random(EB) < 0.12).astype(np.int32)
        order = np.lexsort((src, dst))
        dst, src, w = dst[order], src[order], w[order]
        sc = rng.integers(0, 50, (EB, EB)).astype(np.int32)
        tblc[t, :, 0] = w * B + src
        tblc[t, :, 1] = dst
        tblc[t, :, 2] = 1
        laste = np.full(B, -1, np.int32)
        for e in range(EB):
            laste[dst[e]] = e
        tbl2c[t, :, 0] = laste
        tbl2c[t, :, 1] = (laste >= 0).astype(np.int32)
        S[t] = sc
        hostE.append((src.copy(), dst.copy(), w.copy(), sc))
    tblr = np.swapaxes(tblc, 1, 2).copy()
    tbl2r = np.swapaxes(tbl2c, 1, 2).copy()
    return tblc, tblr, tbl2c, tbl2r, S, hostE


def oracle(hostE):
    """Numpy reference DP over the same chain (value only)."""
    V = np.full((R1, B, B), NEG, np.int64)
    V[:, 0, 0] = 0
    for src, dst, w, sc in hostE:
        Vn = np.full((R1, B, B), NEG, np.int64)
        for e1 in range(EB):
            for e2 in range(EB):
                wsum = w[e1] + w[e2]
                for r in range(R1):
                    if r - wsum < 0:
                        continue
                    g = V[r - wsum, src[e1], src[e2]]
                    if g <= REACH_T:
                        continue
                    c = g + sc[e1, e2]
                    if c > Vn[r, dst[e1], dst[e2]]:
                        Vn[r, dst[e1], dst[e2]] = c
        V = Vn
    return V


def kernel(tblc_ref, tblr_ref, tbl2c_ref, tbl2r_ref, s_ref, bp_ref, v_ref,
           V):  # V: VMEM scratch [R1, B, B] int32
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        ri = jax.lax.broadcasted_iota(jnp.int32, (R1, B, B), 1)
        ci = jax.lax.broadcasted_iota(jnp.int32, (R1, B, B), 2)
        V[...] = jnp.where((ri == 0) & (ci == 0), 0, NEG)

    tblc = tblc_ref[0]  # [EB, 8]
    tblr = tblr_ref[0]  # [8, EB]
    tbl2c = tbl2c_ref[0]  # [B, 4]
    tbl2r = tbl2r_ref[0]  # [4, B]
    S = s_ref[0]  # [EB, EB]

    rsel_c = tblc[:, 0:1]  # [EB, 1]
    rsel_r = tblr[0:1, :]  # [1, EB]
    dst_c = tblc[:, 1:2]
    dst_r = tblr[1:2, :]
    valid_c = tblc[:, 2:3]
    laste_c = tbl2c[:, 0:1]  # [B, 1]
    laste_r = tbl2r[0:1, :]  # [1, B]
    hp_c = tbl2c[:, 1:2]
    hp_r = tbl2r[1:2, :]

    v = V[...]
    negblk = jnp.full((1, B, B), NEG, jnp.int32)
    vx = jnp.concatenate([v, jnp.concatenate([negblk, v[: R1 - 1]], 0)], 1)
    vxf = vx.astype(jnp.float32)  # [R1, 2B, B]

    # row gather: A[r, e1, j] = V[r - w(e1), src(e1), j]
    cols2b = jax.lax.broadcasted_iota(jnp.int32, (EB, 2 * B), 1)
    R1h = ((cols2b == rsel_c) & (valid_c > 0)).astype(jnp.float32)
    A = jax.lax.dot_general(
        jnp.broadcast_to(R1h[None], (R1, EB, 2 * B)), vxf,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [R1, EB, B]

    # col gather: G[r, e1, e2] = A[r - w(e2), e1, src(e2)]
    negeb = jnp.full((1, EB, B), np.float32(NEG), jnp.float32)
    ax = jnp.concatenate([A, jnp.concatenate([negeb, A[: R1 - 1]], 0)], 2)
    rows2b = jax.lax.broadcasted_iota(jnp.int32, (2 * B, EB), 0)
    C1h = (rows2b == rsel_r).astype(jnp.float32)
    G = jax.lax.dot_general(
        ax, jnp.broadcast_to(C1h[None], (R1, 2 * B, EB)),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [R1, EB, EB]

    gi = G.astype(jnp.int32)
    sv = jnp.broadcast_to(S[None], (R1, EB, EB))
    e1i = jax.lax.broadcasted_iota(jnp.int32, (R1, EB, EB), 1)
    e2i = jax.lax.broadcasted_iota(jnp.int32, (R1, EB, EB), 2)
    tie = (EB - 1 - e1i) * EB + (EB - 1 - e2i)
    kv = jnp.where(
        (sv < -8192) | (gi < REACH_T), jnp.int32(INVALID), gi + sv
    )
    kt = tie

    # segmented inclusive max-scan over e1 (axis 1), lexicographic (kv, kt)
    e1col = jax.lax.broadcasted_iota(jnp.int32, (EB, 1), 0)
    s = 1
    while s < EB:
        conn = (e1col >= s) & (dst_c == pltpu.roll(dst_c, s, 0))
        m = jnp.broadcast_to(conn[None, :, :], (R1, EB, EB))
        sv_ = pltpu.roll(kv, s, 1)
        st_ = pltpu.roll(kt, s, 1)
        take = m & ((sv_ > kv) | ((sv_ == kv) & (st_ > kt)))
        kv = jnp.where(take, sv_, kv)
        kt = jnp.where(take, st_, kt)
        s *= 2

    # extract rows at laste[i2]: one-hot [B, EB] batched matmul gather
    colseb = jax.lax.broadcasted_iota(jnp.int32, (B, EB), 1)
    E1h = (colseb == laste_c).astype(jnp.float32)
    E1hb = jnp.broadcast_to(E1h[None], (R1, B, EB))
    yv = jax.lax.dot_general(
        E1hb, kv.astype(jnp.float32),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # [R1, B, EB]
    yt = jax.lax.dot_general(
        E1hb, kt.astype(jnp.float32),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    yv = jnp.where(hp_c[None, :, :] > 0, yv, jnp.int32(INVALID))

    # segmented max-scan over e2 (axis 2)
    s = 1
    while s < EB:
        connr = (
            jax.lax.broadcasted_iota(jnp.int32, (1, EB), 1) >= s
        ) & (dst_r == pltpu.roll(dst_r, s, 1))
        m = jnp.broadcast_to(connr[None, :, :], (R1, B, EB))
        sv_ = pltpu.roll(yv, s, 2)
        st_ = pltpu.roll(yt, s, 2)
        take = m & ((sv_ > yv) | ((sv_ == yv) & (st_ > yt)))
        yv = jnp.where(take, sv_, yv)
        yt = jnp.where(take, st_, yt)
        s *= 2

    # extract cols at laste[j2]: one-hot [EB, B]
    rowseb = jax.lax.broadcasted_iota(jnp.int32, (EB, B), 0)
    E2h = (rowseb == laste_r).astype(jnp.float32)
    E2hb = jnp.broadcast_to(E2h[None], (R1, EB, B))
    zv = jax.lax.dot_general(
        yv.astype(jnp.float32), E2hb,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # [R1, B, B]
    zt = jax.lax.dot_general(
        yt.astype(jnp.float32), E2hb,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    zv = jnp.where(hp_r[None, :, :] > 0, zv, jnp.int32(INVALID))

    reach = zv > REACH_T
    V[...] = jnp.where(reach, zv, jnp.int32(NEG))
    bp_ref[0] = jnp.where(reach, zt, 0).astype(jnp.int16)
    v_ref[...] = V[...]


def build(T):
    tblc, tblr, tbl2c, tbl2r, S, hostE = make_tables(T)

    def run(tblc, tblr, tbl2c, tbl2r, S):
        bp, v = pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, EB, 8), lambda t: (t, 0, 0)),
                pl.BlockSpec((1, 8, EB), lambda t: (t, 0, 0)),
                pl.BlockSpec((1, B, 4), lambda t: (t, 0, 0)),
                pl.BlockSpec((1, 4, B), lambda t: (t, 0, 0)),
                pl.BlockSpec((1, EB, EB), lambda t: (t, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, R1, B, B), lambda t: (t, 0, 0, 0)),
                pl.BlockSpec((R1, B, B), lambda t: (0, 0, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((T, R1, B, B), jnp.int16),
                jax.ShapeDtypeStruct((R1, B, B), jnp.int32),
            ),
            scratch_shapes=[pltpu.VMEM((R1, B, B), jnp.int32)],
        )(tblc, tblr, tbl2c, tbl2r, S)
        return v[R1 - 1, 0, 0], v

    args = tuple(jnp.asarray(x) for x in (tblc, tblr, tbl2c, tbl2r, S))
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

    # correctness on a short chain first
    fc, ac, hostE = build(40)
    _, out = timed(fc, ac, "correctness T=40")
    got = np.asarray(out[1])
    want = oracle(hostE)
    want_c = np.where(want > REACH_T, want, NEG)
    if not np.array_equal(got, want_c.astype(np.int64)):
        bad = np.argwhere(got != want_c)
        print(f"MISMATCH at {bad[:10]}: got {got[tuple(bad[0])]} want "
              f"{want_c[tuple(bad[0])]}", flush=True)
        return 1
    print("correctness: OK", flush=True)

    f1, a1, _ = build(T1)
    f2, a2, _ = build(T2)
    timed(f1, a1, f"warmup T={T1}")
    timed(f2, a2, f"warmup T={T2}")
    t1 = min(timed(f1, a1, f"T={T1} rep{i}")[0] for i in range(2))
    t2 = min(timed(f2, a2, f"T={T2} rep{i}")[0] for i in range(2))
    s = (t2 - t1) / (T2 - T1)
    print(f"pedge16: {s * 1e6:.3f} us/level (slope {T1}->{T2})", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
