"""TPU diploid pair DP: level-synchronous wavefront as JAX kernels.

The hot loop of the pipeline (reference: src/approximator.cpp:362-716)
recast for XLA/TPU:

  * state V[(R+1), B, B] int32 (+ s_het companion) per level, padded to a
    fixed bucket width B;
  * per-transition inputs: predecessor tables (pred index + edge weight,
    padded to P slots) and per-vertex HOM/HET colour bitsets re-indexed
    to the level-pair's local colour universe (W uint32 words) — scoring
    is popcount((h1|h2)&(h3|h4)) + popcount((t1|t2)^(t3|t4)), exactly the
    reference's 4-way merge counts;
  * transitions whose (width, in-degree, colour words) fit the uniform
    small bucket (the vast majority) run inside `lax.scan` chunks of
    fixed length — variable-length runs are padded with *no-op identity
    transitions* (pred=self, weight 0, no colours) so only a handful of
    shapes ever compile;
  * oversized transitions dispatch to per-shape jitted "big" steps;
  * backpointers (pred_i | pred_j<<12 | wu<<24 | wv<<25, the same packing
    as the native runtime) are emitted per chunk and streamed to host;
    backtracking then matches dgcore/diploid.py bit for bit;
  * the deterministic tie-break (value, then smaller pred_i, then smaller
    pred_j — approximator.cpp:655-659) is encoded in the masked reduction.

`plan_transitions` does the host-side preprocessing from the levelized
expanded graph's CSR arrays.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial

import numpy as np

NEG_INF = -(2**28)
VALID_T = -(2**27)  # values above this are reachable states

SMALL_B = 32
SMALL_P = 4
SMALL_W = 1
CHUNKS = (64, 512, 4096)  # allowed scan lengths (padded with no-ops)


@dataclass
class Transition:
    k: int
    k2: int
    pred_i: np.ndarray  # [k2, P] int32
    pred_w: np.ndarray  # [k2, P] int32
    pred_m: np.ndarray  # [k2, P] bool
    Hl: np.ndarray  # [k, W] uint32
    Tl: np.ndarray
    Hr: np.ndarray  # [k2, W] uint32
    Tr: np.ndarray
    B: int = 0
    P: int = 0
    W: int = 0


def _bucket(x: int, opts) -> int:
    for o in opts:
        if x <= o:
            return o
    return opts[-1]


def plan_transitions(
    level_ptr: np.ndarray,
    adj_ptr: np.ndarray,
    adj_v: np.ndarray,
    adj_w: np.ndarray,
    hom_ptr: np.ndarray,
    hom_colors: np.ndarray,
    het_ptr: np.ndarray,
    het_colors: np.ndarray,
) -> list[Transition]:
    """Build per-transition tables from levelized CSR arrays (host)."""
    L = len(level_ptr) - 1
    out: list[Transition] = []
    for l in range(L - 1):
        b0, b1, b2 = int(level_ptr[l]), int(level_ptr[l + 1]), int(level_ptr[l + 2])
        k, k2 = b1 - b0, b2 - b1
        # predecessor lists
        e0, e1 = int(adj_ptr[b0]), int(adj_ptr[b1])
        dsts = adj_v[e0:e1] - b1
        ws = adj_w[e0:e1].astype(np.int32)
        srcs = np.repeat(
            np.arange(k, dtype=np.int32), np.diff(adj_ptr[b0 : b1 + 1]).astype(np.int64)
        )
        order = np.argsort(dsts, kind="stable")
        dsts_s, srcs_s, ws_s = dsts[order], srcs[order], ws[order]
        indeg = np.bincount(dsts_s, minlength=k2)
        P = int(indeg.max()) if len(indeg) else 1
        P = max(P, 1)
        pred_i = np.zeros((k2, P), np.int32)
        pred_w = np.zeros((k2, P), np.int32)
        pred_m = np.zeros((k2, P), bool)
        slot = np.concatenate([np.arange(c) for c in indeg]) if len(dsts_s) else np.empty(0, np.int64)
        pred_i[dsts_s, slot] = srcs_s
        pred_w[dsts_s, slot] = ws_s
        pred_m[dsts_s, slot] = True

        # local colour re-index over both levels
        cs = np.concatenate(
            [
                hom_colors[hom_ptr[b0] : hom_ptr[b2]],
                het_colors[het_ptr[b0] : het_ptr[b2]],
            ]
        )
        uniq = np.unique(cs)
        W = max(1, (len(uniq) + 31) // 32)

        def masks(vs, ve, ptr, colors):
            cnt = ve - vs
            m = np.zeros((cnt, W), np.uint32)
            for i in range(cnt):
                v = vs + i
                loc = np.searchsorted(uniq, colors[ptr[v] : ptr[v + 1]])
                m[i, loc // 32] |= (np.uint32(1) << (loc % 32).astype(np.uint32))
            return m

        def masks_fast(vs, ve, ptr, colors):
            cnt = ve - vs
            m = np.zeros((cnt, W), np.uint32)
            seg = colors[ptr[vs] : ptr[ve]]
            if len(seg):
                loc = np.searchsorted(uniq, seg).astype(np.int64)
                rows = np.repeat(
                    np.arange(cnt, dtype=np.int64),
                    np.diff(ptr[vs : ve + 1]).astype(np.int64),
                )
                np.bitwise_or.at(
                    m, (rows, loc // 32), np.uint32(1) << (loc % 32).astype(np.uint32)
                )
            return m

        Hl = masks_fast(b0, b1, hom_ptr, hom_colors)
        Tl = masks_fast(b0, b1, het_ptr, het_colors)
        Hr = masks_fast(b1, b2, hom_ptr, hom_colors)
        Tr = masks_fast(b1, b2, het_ptr, het_colors)
        out.append(Transition(k, k2, pred_i, pred_w, pred_m, Hl, Tl, Hr, Tr))
    return out


def _pad_transition(t: Transition, B: int, P: int, W: int):
    """Pad one transition's arrays to (B, P, W)."""
    pi = np.zeros((B, P), np.int32)
    pw = np.zeros((B, P), np.int32)
    pm = np.zeros((B, P), bool)
    pi[: t.k2, : t.pred_i.shape[1]] = t.pred_i
    pw[: t.k2, : t.pred_w.shape[1]] = t.pred_w
    pm[: t.k2, : t.pred_m.shape[1]] = t.pred_m

    def padm(m, rows):
        o = np.zeros((B, W), np.uint32)
        o[: rows, : m.shape[1]] = m
        return o

    return pi, pw, pm, padm(t.Hl, t.k), padm(t.Tl, t.k), padm(t.Hr, t.k2), padm(t.Tr, t.k2)


def _noop_transition(B: int, P: int, W: int):
    """Identity transition: state passes through unchanged."""
    pi = np.tile(np.arange(B, dtype=np.int32)[:, None], (1, P))
    pw = np.zeros((B, P), np.int32)
    pm = np.zeros((B, P), bool)
    pm[:, 0] = True
    z = np.zeros((B, W), np.uint32)
    return pi, pw, pm, z, z, z, z


def _step_body(R: int, P: int, carry, xs):
    """One DP transition. carry = (V, SH); xs = transition arrays.

    Returns ((V', SH'), packed backpointers [R+1,B,B])."""
    import jax
    import jax.numpy as jnp

    V, SH = carry
    pi, pw, pm, Hl, Tl, Hr, Tr = xs
    B = V.shape[1]
    SENT = np.int32(2**20)  # pred sentinel > any index (INT_MAX in reference)

    HRu = Hr[:, None, :] | Hr[None, :, :]  # [B,B,W]
    TRu = Tr[:, None, :] | Tr[None, :, :]

    best_v = jnp.full((R + 1, B, B), NEG_INF, jnp.int32)
    best_i = jnp.full((R + 1, B, B), SENT, jnp.int32)
    best_j = jnp.full((R + 1, B, B), SENT, jnp.int32)
    best_sh = jnp.zeros((R + 1, B, B), jnp.int32)
    best_bp = jnp.zeros((R + 1, B, B), jnp.int32)

    # r-shifted source values: Vsh[w][r2] = V[r2-w] (NEG_INF below)
    def shift(x, w, fill):
        if w == 0:
            return x
        pad = jnp.full((w,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([pad, x[: R + 1 - w]], axis=0)

    Vsh = [shift(V, w, NEG_INF) for w in range(3)]
    SHsh = [shift(SH, w, 0) for w in range(3)]

    for p in range(P):
        i_of = pi[:, p]  # [B] source index per dst i2
        wu = pw[:, p]
        mu = pm[:, p]
        Hli = Hl[i_of]  # [B,W]
        Tli = Tl[i_of]
        for q in range(P):
            j_of = pi[:, q]
            wv = pw[:, q]
            mv = pm[:, q]
            m = mu[:, None] & mv[None, :]  # [B,B] over (i2,j2)

            HLu = Hli[:, None, :] | Hl[j_of][None, :, :]  # [B,B,W]
            TLu = Tli[:, None, :] | Tl[j_of][None, :, :]
            symd = jax.lax.population_count(TLu ^ TRu).sum(-1).astype(jnp.int32)
            score = (
                jax.lax.population_count(HLu & HRu).sum(-1).astype(jnp.int32) + symd
            )

            w = (wu[:, None] + wv[None, :])[None]  # [1,B,B] in {0,1,2}

            def gsel(stack):
                g0 = stack[0][:, i_of, :][:, :, j_of]
                g1 = stack[1][:, i_of, :][:, :, j_of]
                g2 = stack[2][:, i_of, :][:, :, j_of]
                return jnp.where(w == 0, g0, jnp.where(w == 1, g1, g2))

            Vg = gsel(Vsh)  # [R+1,B,B]
            SHg = gsel(SHsh)
            cand = Vg + score[None]
            ci = jnp.broadcast_to(i_of[:, None], (B, B))[None]  # [1,B,B]
            cj = jnp.broadcast_to(j_of[None, :], (B, B))[None]
            valid = m[None] & (Vg > VALID_T)
            better = valid & (
                (cand > best_v)
                | (
                    (cand == best_v)
                    & ((ci < best_i) | ((ci == best_i) & (cj < best_j)))
                )
            )
            bp = ci | (cj << 12) | (wu[:, None][None] << 24) | (wv[None, :][None] << 25)
            best_v = jnp.where(better, cand, best_v)
            best_i = jnp.where(better, ci, best_i)
            best_j = jnp.where(better, cj, best_j)
            best_sh = jnp.where(better, SHg + symd, best_sh)
            best_bp = jnp.where(better, jnp.broadcast_to(bp, best_bp.shape), best_bp)
    return (best_v, best_sh), best_bp


@dataclass
class _Segment:
    kind: str  # "scan" | "big"
    data: object
    length: int  # real transitions covered (before no-op padding)
    shape: tuple


class DiploidDeviceDP:
    """Run the diploid DP forward pass on device, streaming backpointers.

    Produces results identical to the native/exact tiers (validated in
    tests): sink value, sink s_het, and per-level winning transitions.
    """

    def __init__(self, transitions: list[Transition], R: int,
                 small=(SMALL_B, SMALL_P, SMALL_W), chunks=CHUNKS,
                 b_buckets=(8, 16, 32, 64, 256), p_buckets=(2, 4, 8, 32),
                 w_buckets=(1, 2, 4, 8, 32)):
        self.R = R
        self.small = small
        self.chunks = sorted(chunks)
        self.transitions = transitions
        self.b_buckets = b_buckets
        self.p_buckets = p_buckets
        self.w_buckets = w_buckets
        self._jit_cache: dict = {}

    def _is_small(self, t: Transition) -> bool:
        B, P, W = self.small
        return (
            max(t.k, t.k2) <= B
            and t.pred_i.shape[1] <= P
            and t.Hl.shape[1] <= W
        )

    def _scan_fn(self, T: int):
        import jax

        key = ("scan", T)
        if key not in self._jit_cache:
            R, P = self.R, self.small[1]

            def run(carry, stacked):
                def f(c, xs):
                    return _step_body(R, P, c, xs)

                (V, SH), bps = jax.lax.scan(f, carry, stacked)
                return (V, SH), bps

            self._jit_cache[key] = jax.jit(run)
        return self._jit_cache[key]

    def _big_fn(self, shape):
        import jax

        key = ("big", shape)
        if key not in self._jit_cache:
            R = self.R
            _B, P, _W = shape

            def run(carry, xs):
                return _step_body(R, P, carry, xs)

            self._jit_cache[key] = jax.jit(run)
        return self._jit_cache[key]

    def _resize(self, V, SH, B_new: int):
        import jax.numpy as jnp

        B_old = V.shape[1]
        if B_old == B_new:
            return V, SH
        R = self.R
        if B_new > B_old:
            Vn = jnp.full((R + 1, B_new, B_new), NEG_INF, jnp.int32)
            Vn = Vn.at[:, :B_old, :B_old].set(V)
            Sn = jnp.zeros((R + 1, B_new, B_new), jnp.int32)
            Sn = Sn.at[:, :B_old, :B_old].set(SH)
            return Vn, Sn
        return V[:, :B_new, :B_new], SH[:, :B_new, :B_new]

    def run(self):
        """Forward pass; returns (sink_val, sink_shet, transitions) in the
        same format as solver.diploid._forward_exact."""
        import jax.numpy as jnp

        R = self.R
        ts = self.transitions
        L1 = len(ts)  # number of transitions (levels - 1)
        SB, SP, SW = self.small

        # initial state (level 0: single source, all r live at value 0)
        k0 = ts[0].k if ts else 1
        B0 = SB if (ts and self._is_small(ts[0])) else self._bucket_B(ts[0]) if ts else SB
        V = jnp.full((R + 1, B0, B0), NEG_INF, jnp.int32)
        V = V.at[:, 0, 0].set(0)  # width-1 source level
        SH = jnp.zeros((R + 1, B0, B0), jnp.int32)
        del k0

        bp_store: list[tuple[int, np.ndarray]] = []  # (k2, packed [R+1,k2,k2])

        i = 0
        noop = _noop_transition(SB, SP, SW)
        while i < L1:
            if self._is_small(ts[i]):
                j = i
                while j < L1 and self._is_small(ts[j]):
                    j += 1
                run_len = j - i
                pos = i
                while pos < j:
                    take = min(run_len - (pos - i), self.chunks[-1])
                    T = next(c for c in self.chunks if c >= take)
                    batch = [
                        _pad_transition(ts[pos + t], SB, SP, SW)
                        for t in range(take)
                    ] + [noop] * (T - take)
                    stacked = tuple(
                        jnp.asarray(np.stack([b[f] for b in batch]))
                        for f in range(7)
                    )
                    V, SH = self._resize(V, SH, SB)
                    (V, SH), bps = self._scan_fn(T)((V, SH), stacked)
                    bps_h = np.asarray(bps[:take])
                    for t in range(take):
                        k2 = ts[pos + t].k2
                        bp_store.append((k2, bps_h[t][:, :k2, :k2]))
                    pos += take
                i = j
            else:
                t = ts[i]
                B = self._bucket_B(t)
                P = _bucket(t.pred_i.shape[1], self.p_buckets)
                W = _bucket(t.Hl.shape[1], self.w_buckets)
                arrs = _pad_transition(t, B, P, W)
                V, SH = self._resize(V, SH, B)
                xs = tuple(jnp.asarray(a) for a in arrs)
                (V, SH), bps = self._big_fn((B, P, W))((V, SH), xs)
                bp_store.append((t.k2, np.asarray(bps[:, : t.k2, : t.k2])))
                i += 1

        sink_val = int(V[R, 0, 0])
        sink_shet = int(SH[R, 0, 0])

        # backtrack (same contract as solver.diploid._forward_exact)
        transitions = []
        i2, j2, r2 = 0, 0, R
        for l in range(L1, 0, -1):
            _k2, bp = bp_store[l - 1]
            packed = int(bp[r2, i2, j2])
            pi = packed & 0xFFF
            pj = (packed >> 12) & 0xFFF
            wu = (packed >> 24) & 1
            wv = (packed >> 25) & 1
            transitions.append((l, pi, pj, i2, j2, wu, wv))
            i2, j2, r2 = pi, pj, r2 - wu - wv
        transitions.reverse()
        return sink_val, sink_shet, transitions

    def _bucket_B(self, t: Transition) -> int:
        return _bucket(max(t.k, t.k2), self.b_buckets)
