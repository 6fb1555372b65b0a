"""Parity tests: native anchor stage (dg_anchor_run) and expanded-graph
builder (dg_build_run) against the pure-Python reference tier.

The native path must reproduce the Python path's observable state
exactly: flat occurrence arrays, the reordered graph (adjacency CSR,
colours, original vertices, haplotype, sink), colour tables, and the
per-hap post-sweep anchor tables (reference semantics:
src/solver.cpp:563-663, src/approximator.cpp:1017-1256,
src/ExpandedGraph.hpp:29-102).
"""

import numpy as np
import pytest

from tests.conftest import ref_fixture

from dipgenie_tpu import native
from dipgenie_tpu.graph.expanded import (
    build_expanded_graph,
    build_expanded_graph_native,
    flatten_hits,
)
from dipgenie_tpu.graph.pangenome import PangenomeIndex
from dipgenie_tpu.io.fastx import read_fastx
from dipgenie_tpu.io.gfa import read_gfa
from dipgenie_tpu.solver.anchors import compute_and_classify_anchors

pytestmark = pytest.mark.skipif(
    not native.available(), reason="dgcore not built"
)

CASES = [
    ("test.gfa", "read.fa", 5, 3, 1.0),
    ("test.gfa", "read.fa", 5, 3, 0.5),
    ("test2.gfa", "read2.fa", 5, 3, 1.0),
    ("test.gfa", "read.fa", 7, 2, 1.0),
]


def _both_anchor_paths(gfa, reads_f, k, w, threshold):
    idx = PangenomeIndex.from_gfa(read_gfa(ref_fixture(gfa)))
    reads = read_fastx(ref_fixture(reads_f))
    py = compute_and_classify_anchors(
        idx, reads, k, w, threshold, verbose=False, sketch_backend="python"
    )
    nat = compute_and_classify_anchors(
        idx, reads, k, w, threshold, verbose=False
    )
    return idx, py, nat


@pytest.mark.parametrize("gfa,reads_f,k,w,threshold", CASES)
def test_anchor_stage_parity(gfa, reads_f, k, w, threshold):
    idx, py, nat = _both_anchor_paths(gfa, reads_f, k, w, threshold)
    assert nat.occ_sp is not None, "native path did not produce flat arrays"
    sp, hap, ptr, vals = flatten_hits(py, idx.num_walks)
    np.testing.assert_array_equal(nat.occ_sp, sp)
    np.testing.assert_array_equal(nat.occ_hap, hap)
    np.testing.assert_array_equal(nat.occ_ptr, ptr)
    np.testing.assert_array_equal(nat.occ_v, vals)
    assert nat.count_sp_r == py.count_sp_r
    np.testing.assert_array_equal(nat.homo_bv, py.homo_bv)


@pytest.mark.parametrize("gfa,reads_f,k,w,threshold", CASES)
def test_build_parity(gfa, reads_f, k, w, threshold):
    idx, py, nat = _both_anchor_paths(gfa, reads_f, k, w, threshold)

    pb = build_expanded_graph(idx, py)
    pb.graph.topologically_reorder(pb.sink)
    nb = build_expanded_graph_native(idx, nat)

    pg, ng = pb.graph, nb.graph
    n = len(pg.adj_list)
    assert len(ng.adj_list) == n
    # Python keeps the pre-reorder sink id; the Kahn reorder guarantees
    # the sink lands last, which is what the native builder reports.
    assert nb.sink == n - 1
    assert nb.num_colors == pb.num_colors
    assert list(nb.color_to_anchor) == list(pb.color_to_anchor)

    for u in range(n):
        assert ng.adj_list[u] == pg.adj_list[u], f"adj mismatch at {u}"
        assert ng.color[u] == pg.color[u], f"color mismatch at {u}"
        assert ng.original_vertex[u] == pg.original_vertex[u], (
            f"orig mismatch at {u}"
        )
        assert int(ng.haplotype[u]) == pg.haplotype[u]

    # per-hap post-sweep anchor tables
    fa = nb.anchors_by_hap
    for h in range(idx.num_walks):
        vec = pb.anchors_by_hap[h]
        a0, a1 = int(fa.anc_ptr[h]), int(fa.anc_ptr[h + 1])
        assert a1 - a0 == len(vec)
        for i, rec in enumerate(vec):
            ai = a0 + i
            assert int(fa.so[ai]) == rec.startOrg
            assert int(fa.eo[ai]) == rec.endOrg
            c0, c1 = int(fa.cptr[ai]), int(fa.cptr[ai + 1])
            assert fa.cv[c0:c1].tolist() == rec.colours


def test_haploid_pipeline_csr_matches_python(tmp_path):
    """Full haploid run through the CSR builder == Python builder."""
    import io

    from dipgenie_tpu.solver.pipeline import Pipeline, PipelineConfig

    gfa = ref_fixture("test.gfa")
    reads = ref_fixture("read.fa")
    outs = []
    for backend in ("python", "host"):
        out = tmp_path / f"hap_{backend}.fa"
        cfg = PipelineConfig(
            k=5, w=3, recombination_limit=4, ploidy=1, verbose=False,
            sketch_backend=backend,
            dp_backend="exact" if backend == "python" else "auto",
        )
        Pipeline(gfa, reads, str(out), cfg).run(out=io.StringIO())
        outs.append(out.read_bytes())
    assert outs[0] == outs[1]


@pytest.mark.parametrize("fixture", ["test.gfa", "test2.gfa"])
def test_native_gfa_parser_matches_python(fixture):
    """dg_gfa_run == the Python parser on every field (io/gfa.py is the
    behavioral oracle; reference semantics src/gfa-io.cpp:214-508)."""
    from dipgenie_tpu.io.gfa import read_gfa_python

    fn = ref_fixture(fixture)
    a = read_gfa(fn, backend="native")
    b = read_gfa_python(fn)
    assert a.seg_names == b.seg_names
    assert a.seg_seqs == b.seg_seqs
    assert a.seg_lens == list(b.seg_lens)
    assert a.seg_del == b.seg_del
    assert a.name2id == b.name2id
    assert a.arcs == b.arcs
    assert len(a.walks) == len(b.walks)
    for wa, wb in zip(a.walks, b.walks):
        assert (wa.sample, wa.hap, wa.seqname, wa.st, wa.en) == (
            wb.sample, wb.hap, wb.seqname, wb.st, wb.en)
        assert (wa.v == wb.v).all()


def test_native_gfa_parser_embedded_fasta(tmp_path):
    """Embedded-FASTA mode (gfa-io.cpp:479-499): auto-named segments."""
    from dipgenie_tpu.io.gfa import read_gfa_python

    fn = tmp_path / "emb.gfa"
    fn.write_text(
        ">frag\nACGTACGT\nACGT\n"
        "S\ts2\tGGGG\n"
        "L\ts1\t+\ts2\t+\t0M\n"
    )
    a = read_gfa(str(fn), backend="native")
    b = read_gfa_python(str(fn))
    assert a.seg_names == b.seg_names == ["s1", "s2"]
    assert a.seg_seqs == b.seg_seqs == ["ACGTACGTACGT", "GGGG"]
    assert a.arcs == b.arcs
