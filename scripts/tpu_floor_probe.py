#!/usr/bin/env python3
"""Honest per-level-cost probe for the tunnel-attached TPU.

The tunnel runtime has ~seconds-scale blocking round trips and degraded
dispatch latency after the first device->host fetch, so absolute wall
times of a single run are meaningless. This probe measures SLOPES:
every variant is timed at two grid lengths T1 < T2 (same compiled
structure), each timed call ends in a scalar fetch, and the reported
per-level cost is (t2 - t1) / (T2 - T1) — launch overhead, RTT and
fetch cost cancel. A warmup fetch first puts the whole process in the
post-first-fetch regime so both points see identical dispatch latency.

Variants:
  scan1      lax.scan, trivial body (V + 1)
  pallas0    pallas kernel, grid=(T,), per-step: stream a 4KB block in,
             write a [19,16,16] int16 bp block out, touch VMEM scratch
  pallas16   realistic (B=16, P=4) DP step body, select-form gathers,
             C-table in, bp out  (see design notes in diploid_pallas.py)

Usage: python scripts/tpu_floor_probe.py [variant ...]
"""
from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R1 = 19  # R+1
NEG = -(2 ** 19)


def timed(fn, args, label):
    """Call fn(*args) -> array; fetch one scalar; return wall seconds."""
    t0 = time.time()
    out = fn(*args)
    # single scalar fetch = the only trustworthy sync on this runtime
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    dt = time.time() - t0
    print(f"  {label}: {dt:.3f}s", file=sys.stderr, flush=True)
    return dt


def slope(build, T1, T2, reps=2):
    """build(T) -> (fn, args). Returns per-step seconds via slope."""
    f1, a1 = build(T1)
    f2, a2 = build(T2)
    timed(f1, a1, f"warmup T={T1}")  # compile + first-fetch poison
    timed(f2, a2, f"warmup T={T2}")
    t1 = min(timed(f1, a1, f"T={T1} rep{i}") for i in range(reps))
    t2 = min(timed(f2, a2, f"T={T2} rep{i}") for i in range(reps))
    return (t2 - t1) / (T2 - T1)


# ---------------------------------------------------------------- scan1
def build_scan1(T):
    xs = jnp.zeros((T, 8, 128), jnp.int32)

    def body(c, x):
        return c + 1 + x[0, 0], None

    def run(xs):
        c, _ = jax.lax.scan(body, jnp.int32(0), xs)
        return c

    return jax.jit(run), (xs,)


# -------------------------------------------------------------- pallas0
def build_pallas0(T):
    tbl = jnp.zeros((T, 8, 128), jnp.int32)  # 4KB/step streamed in

    def kernel(tbl_ref, bp_ref, acc_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += tbl_ref[0]
        bp_ref[0] = (acc_ref[...] & 0x7FFF).astype(jnp.int16)

    def run(tbl):
        out = pl.pallas_call(
            kernel,
            grid=(tbl.shape[0],),
            in_specs=[pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0))],
            out_specs=pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((tbl.shape[0], 8, 128), jnp.int16),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
        )(tbl)
        return out[-1, 0, 0]

    return jax.jit(run), (tbl,)


# ------------------------------------------------------------- pallas16
# Realistic dominant-bucket step: B=16, P=4, select-form gathers.
# State V [R1, B, B] int32 in VMEM scratch. Per step, streamed blocks:
#   pi   [1, PB=64  ] int32  (pred index per (i2, p), row-major (p,i2)? see below)
#   pw   [1, 64     ] int32  edge weight
#   C    [1, 64, 64 ] int32  packed score*2^tb + tie (or -2^29 invalid)
# bp out [1, R1*B, B] int16.
def build_pallas16(T, B=16, P=4):
    PB = P * B
    tb = 4  # tie bits (2 bits p + 2 bits q)
    rng = np.random.default_rng(0)
    pi = rng.integers(0, B, (T, P, B)).astype(np.int32)
    pw = (rng.random((T, P, B)) < 0.12).astype(np.int32)
    C = rng.integers(0, 100, (T, PB, PB)).astype(np.int32) * (1 << tb)

    # broadcast pred index/weight to [P, B(sublane i2), B(lane j1)] layout?
    # kernel needs, per p: row index pi[p, i2] as a per-sublane value.
    # Pre-tile on host: pi_t [T, P, B, 1] -> streamed as [1, P, B, 128]?
    # Keep it simple: stream pi/pw as [1, P*8, 128] padded int32 where
    # element [p, i2] sits at [p*8 + i2//? ...] — instead use iota-compare
    # in-kernel from a [1, 8, 128] block holding pi at [p, i2] = [p, i2].
    pit = np.zeros((T, 8, 128), np.int32)
    pit[:, :P, :B] = pi
    pwt = np.zeros((T, 8, 128), np.int32)
    pwt[:, :P, :B] = pw

    def kernel(pit_ref, pwt_ref, C_ref, bp_ref, V_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            ri = jax.lax.broadcasted_iota(jnp.int32, (R1 * B, B), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (R1 * B, B), 1)
            V_ref[...] = jnp.where((ri % B == 0) & (ci == 0), 0, NEG)

        V = V_ref[...]  # [R1*B, B]  rows = r*B + i, cols = j
        # shift by one r (for weight-1 edges): rows r-1
        Vs = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (R1 * B, B), 0) < B,
            NEG,
            pltpu.roll(V, B, 0),
        )
        pit_ = pit_ref[0]
        pwt_ = pwt_ref[0]
        best = jnp.full((R1 * B, B), -(2 ** 31) + 1, jnp.int32)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (R1 * B, B), 0) % B
        coli = jax.lax.broadcasted_iota(jnp.int32, (R1 * B, B), 1)
        for p in range(P):
            # gather rows u1 = pi[p, i2] with wu shift folded:
            # A[r*B + i2, j1] = (wu? Vs : V)[r*B + u1, j1]
            # select-form: for each candidate source row u in 0..B-1
            pi_p = pit_[p, :]  # [128] lanes, first B valid
            pw_p = pwt_[p, :]
            A = jnp.full((R1 * B, B), NEG, jnp.int32)
            for u in range(B):
                # rows where pi[p, i2] == u pick source row u (all r)
                src = jnp.where(pw_p[u] > 0, Vs, V)
                # broadcast source row r*B+u to all i2: roll rows so that
                # row r*B+u lands on every r*B+i2?  Use segment trick:
                # build M[r*B+i2, j1] = src[r*B+u, j1] via strided select:
                su = jax.lax.dynamic_slice(
                    src.reshape(R1, B, B), (0, u, 0), (R1, 1, B)
                )
                sub = jnp.broadcast_to(su, (R1, B, B)).reshape(R1 * B, B)
                A = jnp.where(pi_p[rowi % B] == u, sub, A)
            for q in range(P):
                pi_q = pit_[q, :]
                pw_q = pwt_[q, :]
                # gather cols v1 = pi[q, j2]; shift r by wv
                As = jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, (R1 * B, B), 0) < B,
                    NEG,
                    pltpu.roll(A, B, 0),
                )
                G = jnp.full((R1 * B, B), NEG, jnp.int32)
                for v in range(B):
                    srcq = jnp.where(pw_q[v] > 0, As, A)
                    gv = jax.lax.dynamic_slice(srcq, (0, v), (R1 * B, 1))
                    G = jnp.where(
                        pi_q[coli] == v, jnp.broadcast_to(gv, G.shape), G
                    )
                Cpq = C_ref[0, p * B : (p + 1) * B, q * B : (q + 1) * B]
                Crep = jnp.concatenate([Cpq] * R1, 0)  # hmm: [R1*B, B]
                key = G * (1 << tb) + Crep
                best = jnp.maximum(best, key)
        Vn = best >> tb
        V_ref[...] = jnp.where(Vn > -(2 ** 18), Vn, NEG)
        bp_ref[0] = (best & ((1 << tb) - 1)).astype(jnp.int16)

    def run(pit, pwt, C):
        out = pl.pallas_call(
            kernel,
            grid=(pit.shape[0],),
            in_specs=[
                pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0)),
                pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0)),
                pl.BlockSpec((1, PB, PB), lambda t: (t, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, R1 * B, B), lambda t: (t, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(
                (pit.shape[0], R1 * B, B), jnp.int16
            ),
            scratch_shapes=[pltpu.VMEM((R1 * B, B), jnp.int32)],
        )(pit, pwt, C)
        return out[-1, 0, 0]

    return jax.jit(run), (
        jnp.asarray(pit),
        jnp.asarray(pwt),
        jnp.asarray(C),
    )


# ------------------------------------------------------------- scandus
# Realistic lax.scan body: dynamic_slice table loads from a stacked HBM
# array + a dp-step-sized compute + dynamic_update_slice bp store into a
# carried buffer (the structure of ops/diploid_fused.py without switch).
def build_scandus(T, B=16, P=4):
    rng = np.random.default_rng(0)
    PI = jnp.asarray(rng.integers(0, B, (T, B, P)).astype(np.int32))
    C = jnp.asarray(rng.integers(0, 100, (T, P * B, P * B)).astype(np.int32))
    nbp = T * R1 * B * B

    def body(tables, carry, x):
        PI, C = tables
        V, buf = carry
        row = x

        pi = jax.lax.dynamic_slice_in_dim(PI, row, 1, 0)[0]
        Ct = jax.lax.dynamic_slice_in_dim(C, row, 1, 0)[0]
        best = jnp.full((R1, B, B), -(2 ** 31) + 1, jnp.int32)
        for p in range(P):
            A = V[:, pi[:, p], :]
            for q in range(P):
                G = A[:, :, pi[:, q]]
                key = G * 16 + Ct[p * B : p * B + B, q * B : q * B + B][None]
                best = jnp.maximum(best, key)
        Vn = best >> 4
        bp = (best & 15).astype(jnp.int16)
        buf = jax.lax.dynamic_update_slice(
            buf, bp.reshape(-1), (row * np.int32(R1 * B * B),)
        )
        return (Vn, buf), None

    def run(PI, C, xs, V0, buf):
        import functools

        (V, buf), _ = jax.lax.scan(
            functools.partial(body, (PI, C)), (V0, buf), xs
        )
        return V[0, 0, 0] + buf[0]

    xs = jnp.arange(T, dtype=jnp.int32)
    V0 = jnp.full((R1, B, B), NEG, jnp.int32)
    buf = jnp.zeros(nbp, jnp.int16)
    # no donation: the probe re-calls with the same buffers; the one
    # defensive copy this forces is O(T) and negligible in the slope
    return jax.jit(run), (PI, C, xs, V0, buf)


VARIANTS = {
    "scan1": (build_scan1, 4000, 40000),
    "pallas0": (build_pallas0, 4000, 40000),
    "pallas16": (build_pallas16, 2000, 20000),
    "scandus": (build_scandus, 2000, 20000),
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    print(f"devices: {jax.devices()}", file=sys.stderr)
    for name in names:
        build, T1, T2 = VARIANTS[name]
        print(f"== {name} ==", file=sys.stderr)
        s = slope(build, T1, T2)
        print(f"{name}: {s * 1e6:.3f} us/level (slope {T1}->{T2})")


if __name__ == "__main__":
    main()
