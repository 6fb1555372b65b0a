"""Exact ILP solver tests (solver/ilp.py vs reference ILP_index.cpp:162-1034).

The optimality cross-check enumerates every pure-walk copy assignment
(no recombination => recombination cost 0) and computes its kmer-miss
objective directly from the anchor chains; the exact solver's optimum must
be <= the best enumerated solution, and when HiGHS reports optimality with
penalty high enough to forbid recombinations they must agree exactly.
"""

import io
import itertools
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import ref_fixture


def _toy_setup(threshold=1.0, k=5, w=3, gfa="test.gfa", reads="read.fa"):
    from dipgenie_tpu.io.gfa import read_gfa
    from dipgenie_tpu.graph.pangenome import PangenomeIndex
    from dipgenie_tpu.io.fastx import read_fastx
    from dipgenie_tpu.solver.anchors import (
        compute_and_classify_anchors, materialize_hits,
    )

    index = PangenomeIndex.from_gfa(read_gfa(ref_fixture(gfa)))
    rd = read_fastx(ref_fixture(reads))
    anchors = compute_and_classify_anchors(
        index, rd, k, w, threshold, verbose=False
    )
    if anchors.occ_sp is not None and not anchors.anchor_hits:
        anchors.anchor_hits = materialize_hits(anchors, index.num_walks)
    return index, anchors


def _walk_edge_sets(index):
    out = []
    for p in index.paths:
        out.append({(int(a), int(b)) for a, b in zip(p[:-1], p[1:])})
    return out


def _pure_pair_objective(index, anchors, ploidy):
    """Best kmer-miss objective over all pure-walk copy assignments.

    A copy fixed to walk j covers spectrum id i iff some occurrence chain
    (from any walk) has every consecutive edge inside walk j's edge set.
    hom ids must be covered by every copy; het ids by at least one (the
    coupling allows crediting just one copy even if both could).
    """
    edges = _walk_edge_sets(index)
    H = index.num_walks
    S = anchors.count_sp_r

    covered = np.zeros((S, H), bool)  # id i coverable by pure walk j
    for i in range(S):
        for jsrc in range(H):
            for chain in anchors.anchor_hits[i][jsrc]:
                if len(chain) < 2:
                    continue
                ce = list(zip(chain[:-1], chain[1:]))
                for j in range(H):
                    if not covered[i, j] and all(e in edges[j] for e in ce):
                        covered[i, j] = True
    has_any = covered.any(axis=1) | np.array(
        [any(len(c) >= 2 for j in range(H) for c in anchors.anchor_hits[i][j])
         for i in range(S)]
    )
    best = np.inf
    hom = anchors.homo_bv.astype(bool)
    for combo in itertools.product(range(H), repeat=ploidy):
        miss = 0
        for i in range(S):
            if not has_any[i]:
                continue  # no length>=2 chain anywhere: no alpha/beta var
            cov = [covered[i, j] for j in combo]
            if hom[i]:
                miss += 0 if all(cov) else 1
            else:
                miss += 0 if any(cov) else 1
        best = min(best, miss)
    return float(best)


def test_ilp_toy_optimal_vs_enumeration():
    from dipgenie_tpu.solver.ilp import ilp_solve

    index, anchors = _toy_setup()
    sol = ilp_solve(index, anchors, "/tmp/ilp_toy_out", "toy",
                    ploidy=2, recombination_penalty=100, verbose=False)
    best_pure = _pure_pair_objective(index, anchors, 2)
    assert sol.objective <= best_pure + 1e-9
    # with P=100 >> max misses (7 kmers), recombination never pays here
    assert sol.recomb_cost == 0.0
    assert sol.objective == best_pure


def test_ilp_writes_fastas_and_valid_paths(tmp_path):
    from dipgenie_tpu.solver.ilp import ilp_solve

    index, anchors = _toy_setup()
    out = str(tmp_path / "ilp")
    sol = ilp_solve(index, anchors, out, "toy", ploidy=2, verbose=False)
    assert len(sol.copies) == 2
    for h, (recomb, seq) in enumerate(sol.copies, start=1):
        path = f"{out}_{h}.fa"
        assert os.path.exists(path)
        body = open(path).read()
        assert body.startswith(f">toy_{h} LN:{len(seq)}\n")
        assert body[body.index("\n"):].replace("\n", "") == seq
        assert recomb >= 0
        # each copy must be one of the toy haplotype sequences or a valid
        # recombinant; with recomb==0 it equals some pure walk sequence
        if recomb == 0 and seq:
            assert seq in [index.haplotype_seq(j)
                           for j in range(index.num_walks)]


def test_ilp_m0_matches_m1_objective():
    from dipgenie_tpu.solver.ilp import ilp_solve

    index, anchors = _toy_setup(gfa="test2.gfa", reads="read2.fa")
    a = ilp_solve(index, anchors, "/tmp/ilp_m1", "t", ploidy=2,
                  is_mixed=True, verbose=False)
    b = ilp_solve(index, anchors, "/tmp/ilp_m0", "t", ploidy=2,
                  is_mixed=False, verbose=False)
    assert a.objective == pytest.approx(b.objective, abs=1e-6)


def test_ilp_hom_coupling():
    """Force one id homozygous: both copies must carry it or miss costs 1."""
    from dipgenie_tpu.solver.ilp import ilp_solve

    index, anchors = _toy_setup()
    anchors.homo_bv = anchors.homo_bv.copy()
    anchors.homo_bv[:] = 1  # all hom: every id must be covered in BOTH copies
    sol = ilp_solve(index, anchors, "/tmp/ilp_hom", "t", ploidy=2,
                    verbose=False)
    best_pure = _pure_pair_objective(index, anchors, 2)
    assert sol.recomb_cost == 0.0
    assert sol.objective == best_pure
    # hom-everywhere is at least as costly as the het-split optimum
    anchors.homo_bv[:] = 0
    het = ilp_solve(index, anchors, "/tmp/ilp_het", "t", ploidy=2,
                    verbose=False)
    assert sol.objective >= het.objective


def test_ilp_cli_smoke(tmp_path):
    out = tmp_path / "ilp"
    r = subprocess.run(
        [sys.executable, "-m", "dipgenie_tpu", "-k5", "-w3", "-p2", "-a1",
         "-g", ref_fixture("test.gfa"), "-r", ref_fixture("read.fa"),
         "-o", str(out)],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(__file__)),
        env={**os.environ, "PYTHONPATH": os.path.dirname(
            os.path.dirname(__file__))},
    )
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "ilp_1.fa").exists()
    assert (tmp_path / "ilp_2.fa").exists()
    assert "Recombination count for haplotype 1" in r.stderr
    assert "Model optimized" in r.stderr
