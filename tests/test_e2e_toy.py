"""End-to-end golden tests on the reference toy fixtures.

Golden outputs were produced by the compiled reference binary
(`DipGenie -t1 -k5 -w3 -R4 -p{1,2} -g test/test.gfa -r test/read.fa`);
we assert byte-identical FASTA output and the key solver log values.
"""

import io

import pytest

from dipgenie_tpu.solver.pipeline import Pipeline, PipelineConfig
from tests.conftest import ref_fixture

TOY_HAP_GOLDEN = ">dp_sol LN:19\nATCGAAAATACTTACCATG\n"
TOY_DIP_GOLDEN = (
    ">sol_1 bp:19\nATCGAAAATACTTACCATG\n>sol_2 bp:19\nATCGATCATACGCATCATG\n"
)


def test_toy_haploid_byte_identical(tmp_path):
    gfa = ref_fixture("test.gfa")
    reads = ref_fixture("read.fa")
    out = tmp_path / "hap.fa"
    cfg = PipelineConfig(k=5, w=3, recombination_limit=4, ploidy=1, verbose=False)
    buf = io.StringIO()
    Pipeline(gfa, reads, str(out), cfg).run(out=buf)
    assert out.read_text() == TOY_HAP_GOLDEN
    log = buf.getvalue()
    assert "Recombination count" not in log  # that line goes to stderr
    assert "r: 0 true score: 5" in log


def test_toy_diploid_byte_identical(tmp_path):
    gfa = ref_fixture("test.gfa")
    reads = ref_fixture("read.fa")
    out = tmp_path / "dip.fa"
    cfg = PipelineConfig(k=5, w=3, recombination_limit=4, ploidy=2, verbose=False)
    buf = io.StringIO()
    Pipeline(gfa, reads, str(out), cfg).run(out=buf)
    assert out.read_text() == TOY_DIP_GOLDEN
    log = buf.getvalue()
    assert "DP value: 14" in log
    assert "recombinations in P1: 1, recombinations in P2: 1" in log


TOY2_HAP_GOLDEN = (
    ">dp_sol LN:87\n"
    "ACGTCATGCAGTCGTAACGTAGTCGTCACAGTCAGTCGTAGCTATGTAGCGTCAGTCAGTCAGTCGTAGCGTAACGTCGT\n"
    "AGTCAGT\n"
)
TOY2_DIP_GOLDEN = (
    ">sol_1 bp:87\n"
    "ACGTCATGCAGTCGTAACGTAGTCGTCACAGTCAGTCGTAGCTAAGTAGCGTCAGTCAGTCAGTCGTAGCGTAACGTCGT\n"
    "AGTCAGT\n"
    ">sol_2 bp:87\n"
    "ACGTCATGCAGTCGTAACGTAGTCGTCACAGTCAGTCGTAGCTATGTAGCGTCAGTCAGTCAGTCGTAGCGTAACGTCGT\n"
    "AGTCAGT\n"
)


def test_toy2_haploid_and_diploid(tmp_path):
    gfa = ref_fixture("test2.gfa")
    reads = ref_fixture("read2.fa")
    for ploidy, golden in ((1, TOY2_HAP_GOLDEN), (2, TOY2_DIP_GOLDEN)):
        out = tmp_path / f"out{ploidy}.fa"
        cfg = PipelineConfig(
            k=5, w=3, recombination_limit=4, ploidy=ploidy, verbose=False
        )
        Pipeline(gfa, reads, str(out), cfg).run(out=io.StringIO())
        assert out.read_text() == golden, f"ploidy {ploidy}"


def test_toy_fit_params():
    """Fitted model params must match the reference run exactly."""
    gfa = ref_fixture("test.gfa")
    reads = ref_fixture("read.fa")
    cfg = PipelineConfig(k=5, w=3, recombination_limit=4, ploidy=1, verbose=False)
    p = Pipeline(gfa, reads, "/dev/null", cfg)
    p.load()
    from dipgenie_tpu.io.fastx import read_fastx
    from dipgenie_tpu.solver.anchors import compute_and_classify_anchors

    a = compute_and_classify_anchors(
        p.index, read_fastx(reads), 5, 3, 1.0, verbose=False
    )
    P = a.fit.P
    assert (round(P.u_v, 2), round(P.sd_v, 2), round(P.var_w, 2)) == (1.0, 0.5, 0.71)
    assert (round(P.p_d, 2), round(P.zp_copy, 2), round(P.zp_copy_het, 2)) == (
        0.1, 4.0, 3.5,
    )
    assert round(a.fit.nll, 2) == 2.07
    assert a.count_sp_r == 7
    assert a.hap_minimizer_counts == [6, 6, 8, 8, 8]


def test_toy_diploid_fused_backend_byte_identical(tmp_path):
    """The fused single-dispatch DP behind --dp-backend fused produces
    the same golden output through the full pipeline."""
    gfa = ref_fixture("test.gfa")
    reads = ref_fixture("read.fa")
    out = tmp_path / "dip_fused.fa"
    cfg = PipelineConfig(
        k=5, w=3, recombination_limit=4, ploidy=2, verbose=False,
        dp_backend="fused",
    )
    buf = io.StringIO()
    Pipeline(gfa, reads, str(out), cfg).run(out=buf)
    assert out.read_text() == TOY_DIP_GOLDEN
    assert "DP value: 14" in buf.getvalue()
