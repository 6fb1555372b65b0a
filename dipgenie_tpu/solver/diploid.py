"""Diploid pair DP over the levelized expanded graph — exact host tier.

Equivalent of ``Approximator::diploid_dp_approximation_solver``
(reference: src/approximator.cpp:362-1011):

  * state (level ℓ, i, j, r): i,j index the two haplotype paths'
    vertices within level ℓ, r = recombinations used so far;
  * transition score for ((u1,v1) → (u2,v2)) =
    |(H(u1)∪H(v1)) ∩ (H(u2)∪H(v2))| + |(T(u1)∪T(v1)) △ (T(u2)∪T(v2))|
    over per-vertex HOM (H) / HET (T) colour sets
    (approximator.cpp:269-311, 604-624). Computed here with colour
    *bitsets*: popcount((h1|h2)&(h3|h4)) and popcount((t1|t2)^(t3|t4))
    — exactly equivalent to the reference's 4-way sorted merges;
  * relaxation with the deterministic tie-break (value, then smaller
    pred_i, then smaller pred_j) (approximator.cpp:655-659); among
    fully-tied candidates the first in (r asc, i, j, edge-order) wins,
    matching single-threaded reference iteration order;
  * instead of the reference's per-state EdgeNode linked lists
    (approximator.cpp:381-529) we record per-level backpointer tables
    (pred_i, pred_j, pred_r, wu, wv) and reconstruct the weighted-edge
    lists by backtracking — including the doubled final-transition edge
    (approximator.cpp:684-692) that makes r = #edges − 1;
  * sequence stitching walks the original walks between consecutive
    weighted edges, hopping haplotypes via 0-weight BFS
    (``find_next_zero_hap``, approximator.cpp:732-755);
  * prints DP value, per-path recombination counts and the
    multiplicative approximation certificate (approximator.cpp:932-1004).

This module is the exact reference tier (validated byte-identical on
fixtures); `dipgenie_tpu.ops.diploid_jax` provides the TPU kernel with
identical tie-break semantics, and tests assert agreement.
"""

from __future__ import annotations

import math
import sys
import time
from collections import deque

import numpy as np

from ..graph.expanded import AnchorRec, ExpandedGraph
from ..graph.pangenome import PangenomeIndex
from .haploid import _fmt

NEG_INF = -(2**31) // 4


def build_color_masks(
    g: ExpandedGraph, color_homo_bv: list[bool]
) -> tuple[list[int], list[int]]:
    """Per-vertex HOM/HET colour bitsets (approximator.cpp:430-453)."""
    H = [0] * len(g.adj_list)
    T = [0] * len(g.adj_list)
    for v, colors in enumerate(g.color):
        hm = tm = 0
        for c in colors:
            if color_homo_bv[c]:
                hm |= 1 << c
            else:
                tm |= 1 << c
        H[v], T[v] = hm, tm
    return H, T


def _forward_exact(g: ExpandedGraph, R: int, Hm, Tm, progress: bool = False):
    """Exact numpy forward DP; returns (sink_val, sink_shet, transitions).

    transitions[t] = (level, pred_i, pred_j, i2, j2, wu, wv) along the
    backtracked optimal path, level ascending 1..L-1."""
    L = len(g.vertices_in_level)
    n = len(g.adj_list)
    pos_in_level = [-1] * n
    for l in range(L):
        for i, v in enumerate(g.vertices_in_level[l]):
            pos_in_level[v] = i

    # rolling state at current level: [(R+1), k, k]
    val = np.zeros((R + 1, 1, 1), np.int64)
    shet = np.zeros((R + 1, 1, 1), np.int64)
    # per-level backpointer tables, filled for levels 1..L-1
    back: list[dict[str, np.ndarray] | None] = [None] * L

    from ..utils.progress import ProgressThrottle

    bar = ProgressThrottle(L) if progress else None
    rs = np.arange(R + 1)
    for l in range(L - 1):
        lnow = g.vertices_in_level[l]
        lnext = g.vertices_in_level[l + 1]
        k, k2 = len(lnow), len(lnext)
        nval = np.full((R + 1, k2, k2), NEG_INF, np.int64)
        nsh = np.zeros((R + 1, k2, k2), np.int64)
        pi = np.full((R + 1, k2, k2), np.iinfo(np.int32).max, np.int64)
        pj = np.full((R + 1, k2, k2), np.iinfo(np.int32).max, np.int64)
        pr = np.full((R + 1, k2, k2), -1, np.int64)
        wub = np.zeros((R + 1, k2, k2), np.int8)
        wvb = np.zeros((R + 1, k2, k2), np.int8)

        HL: dict[tuple[int, int], int] = {}
        TL: dict[tuple[int, int], int] = {}
        for i in range(k):
            u1 = lnow[i]
            au = g.adj_list[u1]
            for j in range(k):
                v1 = lnow[j]
                src = val[:, i, j]
                if not (src != NEG_INF).any():
                    continue
                hl = Hm[u1] | Hm[v1]
                tl = Tm[u1] | Tm[v1]
                ssrc = shet[:, i, j]
                for u2, wu in au:
                    iu2 = pos_in_level[u2]
                    for v2, wv in g.adj_list[v1]:
                        jv2 = pos_in_level[v2]
                        w = wu + wv
                        if w > R:
                            continue
                        symd = (tl ^ (Tm[u2] | Tm[v2])).bit_count()
                        score = (hl & (Hm[u2] | Hm[v2])).bit_count() + symd
                        lim = R + 1 - w
                        cand = src[:lim] + score
                        dv = nval[w:, iu2, jv2]
                        valid = src[:lim] != NEG_INF
                        better = valid & (
                            (cand > dv)
                            | ((cand == dv) & (i < pi[w:, iu2, jv2]))
                            | (
                                (cand == dv)
                                & (i == pi[w:, iu2, jv2])
                                & (j < pj[w:, iu2, jv2])
                            )
                        )
                        if not better.any():
                            continue
                        bidx = np.nonzero(better)[0]
                        nval[w + bidx, iu2, jv2] = cand[bidx]
                        nsh[w + bidx, iu2, jv2] = ssrc[bidx] + symd
                        pi[w + bidx, iu2, jv2] = i
                        pj[w + bidx, iu2, jv2] = j
                        pr[w + bidx, iu2, jv2] = bidx
                        wub[w + bidx, iu2, jv2] = wu
                        wvb[w + bidx, iu2, jv2] = wv
        back[l + 1] = {"pi": pi, "pj": pj, "pr": pr, "wu": wub, "wv": wvb}
        val, shet = nval, nsh
        if bar is not None:
            bar.update(l + 1)
    if bar is not None:
        bar.update(L)

    best_r = R
    sink_val = int(val[best_r, 0, 0])
    sink_shet = int(shet[best_r, 0, 0])

    i2, j2, r2 = 0, 0, best_r
    transitions: list[tuple[int, int, int, int, int, int, int]] = []
    for l in range(L - 1, 0, -1):
        b = back[l]
        bi = int(b["pi"][r2, i2, j2])
        bj = int(b["pj"][r2, i2, j2])
        br = int(b["pr"][r2, i2, j2])
        wu = int(b["wu"][r2, i2, j2])
        wv = int(b["wv"][r2, i2, j2])
        transitions.append((l, bi, bj, i2, j2, wu, wv))
        i2, j2, r2 = bi, bj, br
    transitions.reverse()
    return sink_val, sink_shet, transitions


def csr_arrays(g, color_homo_bv):
    """Dense CSR arrays of the levelized graph for the native/device DPs:
    (level_ptr, adj_ptr, adj_v, adj_w, hom_ptr, hom_colors, het_ptr,
    het_colors). Accepts an ExpandedGraph or a LeveledGraph CSR view."""
    import numpy as np

    if hasattr(g, "color_csr"):  # LeveledGraph: already CSR
        hom_ptr, hom_colors, het_ptr, het_colors = g.color_csr(color_homo_bv)
        adj_ptr, adj_v, adj_w = g.csr
        return (g.level_ptr, adj_ptr, adj_v, adj_w,
                hom_ptr, hom_colors, het_ptr, het_colors)

    L = len(g.vertices_in_level)
    n = len(g.adj_list)
    level_ptr = np.zeros(L + 1, np.int64)
    widths = np.fromiter(
        (len(lv) for lv in g.vertices_in_level), np.int64, L
    )
    np.cumsum(widths, out=level_ptr[1:])
    # levelized ids are consecutive per level
    assert all(
        len(lv) == 0 or lv[0] == level_ptr[l]
        for l, lv in enumerate(g.vertices_in_level)
    )

    deg = np.fromiter((len(a) for a in g.adj_list), np.int64, n)
    adj_ptr = np.zeros(n + 1, np.int64)
    np.cumsum(deg, out=adj_ptr[1:])
    ne = int(adj_ptr[-1])
    flat = np.fromiter(
        (x for a in g.adj_list for vw in a for x in vw), np.int64, 2 * ne
    )
    adj_v = flat[0::2].astype(np.int32)
    adj_w = flat[1::2].astype(np.int8)

    ccnt = np.fromiter((len(c) for c in g.color), np.int64, n)
    nc = int(ccnt.sum())
    col_vals = np.fromiter((c for cs in g.color for c in cs), np.int64, nc)
    rows = np.repeat(np.arange(n, dtype=np.int64), ccnt)
    chb = np.asarray(color_homo_bv, bool)
    is_h = chb[col_vals] if nc else np.zeros(0, bool)
    hom_ptr = np.zeros(n + 1, np.int64)
    het_ptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(rows[is_h], minlength=n), out=hom_ptr[1:])
    np.cumsum(np.bincount(rows[~is_h], minlength=n), out=het_ptr[1:])
    hom_colors = col_vals[is_h].astype(np.int32)
    het_colors = col_vals[~is_h].astype(np.int32)
    return (level_ptr, adj_ptr, adj_v, adj_w, hom_ptr, hom_colors,
            het_ptr, het_colors)


def _forward_native(g: ExpandedGraph, R: int, color_homo_bv, n_threads: int = 0,
                    progress: bool = False):
    """Native (dgcore) forward DP; same return contract as _forward_exact."""
    from .. import native

    (level_ptr, adj_ptr, adj_v, adj_w, hom_ptr, hom_colors,
     het_ptr, het_colors) = csr_arrays(g, color_homo_bv)
    L = len(g.vertices_in_level)
    sink_val, sink_shet, trans = native.diploid_dp(
        level_ptr, adj_ptr, adj_v, adj_w, hom_ptr, hom_colors,
        het_ptr, het_colors, R, n_threads, progress,
    )
    transitions = []
    i2, j2 = 0, 0
    chain = []
    for l in range(L - 1, 0, -1):
        pi, pj, _pr, wu, wv = (int(x) for x in trans[l])
        chain.append((l, pi, pj, i2, j2, wu, wv))
        i2, j2 = pi, pj
    chain.reverse()
    transitions = chain
    return sink_val, sink_shet, transitions


def diploid_dp_solver(
    g: ExpandedGraph,
    R: int,
    color_homo_bv: list[bool],
    anchors_by_hap: list[list[AnchorRec]],
    index: PangenomeIndex,
    out=sys.stdout,
    progress: bool = False,
    backend: str = "exact",
    n_threads: int = 0,
    mesh=None,
):
    start_time = time.time()
    L = len(g.vertices_in_level)
    if L > 0 and len(g.vertices_in_level[0]) > 1:
        print("There is more than one source on level zero!", file=out)

    print("Creating hetro/hom-zygous colors per vertex lists", file=out)
    print("Running DP", file=out)
    if backend == "native":
        sink_val, sink_shet, transitions = _forward_native(
            g, R, color_homo_bv, n_threads=n_threads, progress=progress
        )
    elif backend == "jax":
        from ..ops.diploid_jax import DeviceDiploidDP, plan_transitions

        plan = plan_transitions(*csr_arrays(g, color_homo_bv))
        sink_val, sink_shet, transitions = DeviceDiploidDP(
            plan, R, mesh=mesh
        ).run()
    elif backend == "fused":
        from ..ops.diploid_fused import FusedDiploidDP, plan_fused

        plan = plan_fused(*csr_arrays(g, color_homo_bv), R)
        sink_val, sink_shet, transitions = FusedDiploidDP(plan).run(
            verbose=progress
        )
    elif backend == "pallas":
        import jax as _jax

        from ..ops.diploid_pallas import PairDiploidDP, plan_pairs_cached
        from ..utils.timing import log_stage

        try:
            _t0 = time.time()
            plan = plan_pairs_cached(csr_arrays(g, color_homo_bv), R)
            log_stage(
                "diploid_dp", f"pair plan ready in {time.time()-_t0:.1f}s"
            )
        except ValueError as e:
            # R > 31 or packed-key value bound exceeded: the chunked jax
            # tier has no such limits — fall back loudly.
            print(
                f"[W::diploid_dp] pallas tier unavailable ({e}); "
                "falling back to the chunked jax tier",
                file=sys.stderr,
            )
            from ..ops.diploid_jax import DeviceDiploidDP, plan_transitions

            plan = plan_transitions(*csr_arrays(g, color_homo_bv))
            sink_val, sink_shet, transitions = DeviceDiploidDP(
                plan, R, mesh=mesh
            ).run()
        else:
            # Mosaic only compiles on TPU; elsewhere (CPU CI) interpret
            interp = _jax.default_backend() != "tpu"
            try:
                _t0 = time.time()
                sink_val, sink_shet, transitions = PairDiploidDP(
                    plan, interpret=interp, mesh=mesh
                ).run(verbose=progress)
                log_stage(
                    "diploid_dp",
                    "device ship+compile+forward+traceback in "
                    f"{time.time()-_t0:.1f}s",
                )
            except Exception as e:  # noqa: BLE001
                # the pipeline auto-routes every TPU session here, so a
                # Mosaic lowering/compile or runtime failure must fall
                # back loudly to the chunked tier instead of aborting
                # the whole pipeline (round-4 advisor finding)
                print(
                    f"[W::diploid_dp] pallas tier failed at runtime "
                    f"({type(e).__name__}: {e}); falling back to the "
                    "chunked jax tier",
                    file=sys.stderr,
                )
                from ..ops.diploid_jax import (
                    DeviceDiploidDP, plan_transitions,
                )

                jplan = plan_transitions(*csr_arrays(g, color_homo_bv))
                sink_val, sink_shet, transitions = DeviceDiploidDP(
                    jplan, R, mesh=mesh
                ).run()
    else:
        Hm, Tm = build_color_masks(g, color_homo_bv)
        sink_val, sink_shet, transitions = _forward_exact(
            g, R, Hm, Tm, progress=progress
        )
    best_r = R
    print(f"DP value: {sink_val}", file=out)

    # ---- weighted edge lists from backtracked transitions ----
    p1_edges: list[tuple[int, int]] = []
    p2_edges: list[tuple[int, int]] = []
    for l, bi, bj, ti, tj, wu, wv in transitions:
        u1 = g.vertices_in_level[l - 1][bi]
        u2 = g.vertices_in_level[l][ti]
        v1 = g.vertices_in_level[l - 1][bj]
        v2 = g.vertices_in_level[l][tj]
        if wu > 0:
            p1_edges.append((u1, u2))
        if wv > 0:
            p2_edges.append((v1, v2))
        if l == L - 1:  # doubled final edge (approximator.cpp:684-692)
            p1_edges.append((u1, u2))
            p2_edges.append((v1, v2))

    r1 = len(p1_edges) - 1
    r2_count = len(p2_edges) - 1

    def find_next_zero_hap(src: int, target_hap: int) -> int:
        if g.haplotype[src] == target_hap and len(g.original_vertex[src]) > 0:
            return src
        q = deque([src])
        visited = {src}
        while q:
            u = q.popleft()
            for v, w in g.adj_list[u]:
                if w != 0:
                    continue
                if v in visited:
                    continue
                visited.add(v)
                if g.haplotype[v] == target_hap and len(g.original_vertex[v]) > 0:
                    return v
                q.append(v)
        return -1

    # per-hap anchor arrays for vectorized colour collection
    import numpy as _np

    anc_so: list[_np.ndarray] = []
    anc_eo: list[_np.ndarray] = []
    anc_cptr: list[_np.ndarray] = []
    anc_cvals: list[_np.ndarray] = []
    from ..graph.expanded import FlatAnchors

    if isinstance(anchors_by_hap, FlatAnchors):
        fa = anchors_by_hap
        for h in range(len(fa.anc_ptr) - 1):
            a0, a1 = int(fa.anc_ptr[h]), int(fa.anc_ptr[h + 1])
            anc_so.append(fa.so[a0:a1].astype(_np.int64))
            anc_eo.append(fa.eo[a0:a1].astype(_np.int64))
            cp = fa.cptr[a0 : a1 + 1].astype(_np.int64)
            anc_cptr.append(cp - cp[0])
            anc_cvals.append(
                fa.cv[int(cp[0]) : int(cp[-1])].astype(_np.int64)
            )
    else:
        for vec in anchors_by_hap:
            anc_so.append(_np.asarray([a.startOrg for a in vec], _np.int64))
            anc_eo.append(_np.asarray([a.endOrg for a in vec], _np.int64))
            cp = _np.zeros(len(vec) + 1, _np.int64)
            for ai, a in enumerate(vec):
                cp[ai + 1] = cp[ai] + len(a.colours)
            anc_cptr.append(cp)
            anc_cvals.append(
                _np.fromiter(
                    (c for a in vec for c in a.colours), _np.int64, int(cp[-1])
                )
            )

    def recover(weighted_edges: list[tuple[int, int]], tag: str):
        color_freq: dict[int, int] = {}
        colors: list[int] = []
        hap_seq: list[str] = []
        start_exp = g.vertices_in_level[0][0]
        for ei, edge in enumerate(weighted_edges):
            if len(g.original_vertex[edge[0]]) != 1:
                print(
                    f"{tag}: Vertex {edge[0]} in map back has "
                    f"{len(g.original_vertex[edge[0]])} original vertices",
                    file=out,
                )
                raise SystemExit(1)
            end_exp = edge[0]
            h = g.haplotype[end_exp]
            if start_exp == g.vertices_in_level[0][0]:
                for v in g.vertices_in_level[1]:
                    if g.haplotype[v] == h:
                        start_exp = v
            start_org = g.original_vertex[start_exp][0]
            end_org = g.original_vertex[end_exp][0]
            activated = False
            for t in range(len(index.paths[h])):
                pv = int(index.paths[h][t])
                if pv == start_org:
                    activated = True
                if activated:
                    hap_seq.append(index.node_seq[pv])
                if pv == end_org:
                    activated = False
                    break
            # vectorized: anchors strictly inside (start_org, end_org)
            hit = _np.nonzero((anc_so[h] > start_org) & (anc_eo[h] < end_org))[0]
            if len(hit):
                cp = anc_cptr[h]
                lens = cp[hit + 1] - cp[hit]
                total = int(lens.sum())
                if total:
                    cum = _np.cumsum(lens) - lens
                    within = _np.arange(total) - _np.repeat(cum, lens)
                    cs = anc_cvals[h][_np.repeat(cp[hit], lens) + within]
                    uniq, first, counts = _np.unique(
                        cs, return_index=True, return_counts=True
                    )
                    # preserve first-appearance order for new colours
                    order = _np.argsort(first, kind="stable")
                    for c, n in zip(uniq[order].tolist(), counts[order].tolist()):
                        if c not in color_freq:
                            color_freq[c] = n
                            colors.append(c)
                        else:
                            color_freq[c] += n
            if g.level[edge[1]] == L - 1:
                break
            next_edge = weighted_edges[ei + 1]
            next_hap = g.haplotype[next_edge[0]]
            ns = find_next_zero_hap(edge[1], next_hap)
            if ns != -1:
                start_exp = ns
            else:
                print(
                    f"{tag} (path recovery) Could not find next_hap={next_hap}"
                    f" from {edge[1]} via 0-weight edges",
                    file=out,
                )
        return "".join(hap_seq), color_freq, colors

    hap_1, p1_color_freq, p1_colors = recover(p1_edges, "P1")
    hap_2, p2_color_freq, p2_colors = recover(p2_edges, "P2")

    # ---- approximation certificate (approximator.cpp:932-1004) ----
    p1_hom = sorted({c for c in p1_colors if color_homo_bv[c]})
    p1_het = sorted({c for c in p1_colors if not color_homo_bv[c]})
    p2_hom = sorted({c for c in p2_colors if color_homo_bv[c]})
    p2_het = sorted({c for c in p2_colors if not color_homo_bv[c]})
    inter = sorted(set(p1_hom) & set(p2_hom))
    symd = sorted(set(p1_het) ^ set(p2_het))
    intersection_count = len(inter)
    symdiff_count = len(symd)
    m_G_hom = sum(
        max(p1_color_freq.get(c, 0), p2_color_freq.get(c, 0)) for c in inter
    )
    m_G_het = sum(p1_color_freq.get(c, 0) + p2_color_freq.get(c, 0) for c in symd)

    def fdiv(a: float, b: float) -> float:
        if b == 0:
            if a == 0:
                return math.copysign(math.nan, -1.0)
            return math.copysign(math.inf, a)
        return a / b

    m_G_hom_avg = fdiv(float(m_G_hom), float(intersection_count))
    m_G_het_avg = fdiv(float(m_G_het), float(symdiff_count))
    # std::max(a, b) semantics: returns b only when a < b (NaN-comparisons false)
    m_bar = m_G_het_avg if m_G_hom_avg < m_G_het_avg else m_G_hom_avg
    loss_het = sink_shet - m_G_het
    if math.isnan(m_G_het_avg):
        additive_term = float("nan")
    else:
        additive_term = fdiv(float(loss_het), m_G_het_avg)
    obj = intersection_count + symdiff_count
    print(f"r: {best_r} obj: {obj}", file=out)
    opt_obj_upper_bound = m_bar * (obj + additive_term)
    print(
        "Approximation certificate: multiplicative factor: "
        f"{_fmt(fdiv(opt_obj_upper_bound, float(obj)) if obj else opt_obj_upper_bound * math.inf)}",
        file=out,
    )
    elapsed_ms = int((time.time() - start_time) * 1000)
    print(f"diploid_dp_approximation_solver took {elapsed_ms} ms", file=out)
    return [(r1, r2_count, hap_1, hap_2)]
