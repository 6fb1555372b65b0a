"""MHC-scale golden tests (slow; skipped unless RUN_SLOW=1).

Golden md5s were produced by the compiled reference binary on this
machine and verified byte-identical against this pipeline:
  haploid MHC + CHM13 reads      (reference README.md:32 smoke config)
  diploid MHC + CHM13 reads      (-p2 -R18)
  diploid MHC + simulated HG002 2x reads (README.md:34 analogue; the
  real HG002 read set is not shipped in the reference's test/)
"""

import hashlib
import os
import subprocess
import sys

import pytest

from tests.conftest import ref_fixture

SLOW = os.environ.get("RUN_SLOW") == "1"

MHC_HAP_MD5 = "0c4df87ded10634a36db0a2c90521ff0"
MHC_DIP_MD5 = "46394489af8bc9026605ddf237aca4c7"
HG002_SIM_DIP_MD5 = "64310a17ddb02d9c8547362ae00814d9"


def _md5(path):
    with open(path, "rb") as fh:
        return hashlib.md5(fh.read()).hexdigest()


@pytest.mark.skipif(not SLOW, reason="set RUN_SLOW=1 for MHC-scale goldens")
def test_mhc_haploid_golden(tmp_path):
    from dipgenie_tpu.solver.pipeline import Pipeline, PipelineConfig

    gfa = ref_fixture("MHC_4.gfa.gz")
    reads = ref_fixture("CHM13_reads.fq.gz")
    out = tmp_path / "hap.fa"
    import io

    Pipeline(gfa, reads, str(out), PipelineConfig(ploidy=1, verbose=False)).run(
        out=io.StringIO()
    )
    assert _md5(out) == MHC_HAP_MD5


@pytest.mark.skipif(not SLOW, reason="set RUN_SLOW=1 for MHC-scale goldens")
def test_mhc_diploid_golden(tmp_path):
    import io

    from dipgenie_tpu.solver.pipeline import Pipeline, PipelineConfig

    gfa = ref_fixture("MHC_4.gfa.gz")
    reads = ref_fixture("CHM13_reads.fq.gz")
    out = tmp_path / "dip.fa"
    Pipeline(
        gfa, reads, str(out),
        PipelineConfig(ploidy=2, verbose=False, dp_backend="native"),
    ).run(out=io.StringIO())
    assert _md5(out) == MHC_DIP_MD5


@pytest.mark.skipif(not SLOW, reason="set RUN_SLOW=1 for MHC-scale goldens")
def test_mhc_haploid_device_tier_golden(tmp_path):
    """Device sketch tier must match the host-tier golden byte-for-byte."""
    import io

    from dipgenie_tpu.solver.pipeline import Pipeline, PipelineConfig

    gfa = ref_fixture("MHC_4.gfa.gz")
    reads = ref_fixture("CHM13_reads.fq.gz")
    out = tmp_path / "hap_dev.fa"
    Pipeline(
        gfa, reads, str(out),
        PipelineConfig(ploidy=1, verbose=False, sketch_backend="device"),
    ).run(out=io.StringIO())
    assert _md5(out) == MHC_HAP_MD5


@pytest.mark.skipif(not SLOW, reason="set RUN_SLOW=1 for MHC-scale goldens")
def test_mhc_diploid_device_tier_golden(tmp_path):
    """JAX wavefront DP + device sketch on MHC: byte-identical to the
    native-tier golden (measured ~8 min on the 2-vCPU XLA-CPU backend)."""
    import io

    from dipgenie_tpu.solver.pipeline import Pipeline, PipelineConfig

    gfa = ref_fixture("MHC_4.gfa.gz")
    reads = ref_fixture("CHM13_reads.fq.gz")
    out = tmp_path / "dip_dev.fa"
    Pipeline(
        gfa, reads, str(out),
        PipelineConfig(ploidy=2, verbose=False, dp_backend="jax",
                       sketch_backend="device"),
    ).run(out=io.StringIO())
    assert _md5(out) == MHC_DIP_MD5


@pytest.mark.skipif(not SLOW, reason="set RUN_SLOW=1 for MHC-scale goldens")
def test_hg002_sim_diploid_golden(tmp_path):
    """Deterministic simulated HG002 2x diploid read set (seed 7)."""
    import io

    from dipgenie_tpu.solver.pipeline import Pipeline, PipelineConfig

    gfa = ref_fixture("MHC_4.gfa.gz")
    reads = tmp_path / "hg002.fq"
    subprocess.run(
        [sys.executable, "scripts/simulate_reads.py", "-g", gfa,
         "-s", "HG002.1", "-s", "HG002.2", "-c", "2.0", "-l", "150",
         "--seed", "7", "-o", str(reads)],
        check=True, cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    out = tmp_path / "dip.fa"
    Pipeline(
        gfa, str(reads), str(out),
        PipelineConfig(ploidy=2, verbose=False, dp_backend="native"),
    ).run(out=io.StringIO())
    assert _md5(out) == HG002_SIM_DIP_MD5
