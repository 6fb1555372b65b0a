"""Semantic property test: the diploid DP must equal a brute-force
enumeration of all path pairs on tiny levelized graphs.

Objective (reference approximator.cpp:362-716): over pairs of
source→sink paths (P1, P2) stepping one level at a time, maximize
  sum over transitions of |(H(u1)∪H(v1)) ∩ (H(u2)∪H(v2))|
                        + |(T(u1)∪T(v1)) △ (T(u2)∪T(v2))|
subject to total edge weight (recombinations) summed over both paths
<= R; the DP reads the sink state at exactly r = R, which is always
reachable because every r slot of the source level starts at 0.
"""

import itertools

import numpy as np

from dipgenie_tpu.solver.diploid import _forward_exact, build_color_masks
from tests.test_device_kernels import _random_leveled_graph


def _brute_force(g, R, Hm, Tm):
    L = len(g.vertices_in_level)
    # enumerate all root-to-sink level paths with their recombination cost
    def paths_from(u, l):
        if l == L - 1:
            yield ([u], 0)
            return
        for v, w in g.adj_list[u]:
            for tail, c in paths_from(v, l + 1):
                yield ([u] + tail, c + w)

    all_paths = list(paths_from(g.vertices_in_level[0][0], 0))
    best = None
    for (p1, c1), (p2, c2) in itertools.product(all_paths, repeat=2):
        if c1 + c2 > R:
            continue
        score = 0
        for l in range(L - 1):
            u1, v1, u2, v2 = p1[l], p2[l], p1[l + 1], p2[l + 1]
            inter = bin((Hm[u1] | Hm[v1]) & (Hm[u2] | Hm[v2])).count("1")
            symd = bin((Tm[u1] | Tm[v1]) ^ (Tm[u2] | Tm[v2])).count("1")
            score += inter + symd
        if best is None or score > best:
            best = score
    return best


def test_dp_equals_bruteforce():
    for seed in range(6):
        rng = np.random.default_rng(100 + seed)
        g = _random_leveled_graph(rng, L=6, kmax=3, ncolors=6)
        chb = [bool(x) for x in rng.random(6) < 0.5]
        R = 4
        Hm, Tm = build_color_masks(g, chb)
        dp_val, _, _ = _forward_exact(g, R, Hm, Tm)
        bf = _brute_force(g, R, Hm, Tm)
        assert dp_val == bf, seed
