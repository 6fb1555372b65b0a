"""Harness scripts exercised in CI under a stub external toolchain.

The real tools (vg, gfa2gbwt, kmc, seqtk, whatshap, truvari, bcftools,
seqkit, cactus-pangenome) are absent here; each test fabricates stub
executables on PATH that write plausible outputs, then runs the real
shell/python harness scripts end-to-end and asserts the control flow
and the parsed/aggregated results.
"""

import gzip
import os
import shutil
import stat
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")


def _stub(bindir, name, body):
    p = os.path.join(bindir, name)
    with open(p, "w") as fh:
        fh.write("#!/usr/bin/env bash\n" + body)
    os.chmod(p, os.stat(p).st_mode | stat.S_IEXEC)
    return p


def _env_with(bindir):
    env = dict(os.environ)
    env["PATH"] = bindir + os.pathsep + env["PATH"]
    env["PYTHONPATH"] = REPO
    return env


def test_run_batch_on_toy_fixture(tmp_path):
    """run_batch.sh drives the real CLI over a 1-sample leave-one-out
    layout built from the toy fixture."""
    graph = tmp_path / "Graph"
    reads = tmp_path / "Reads"
    outd = tmp_path / "Results"
    graph.mkdir()
    reads.mkdir()
    with open("/root/reference/test/test.gfa", "rb") as src:
        with gzip.open(graph / "MHC_wo_S1.gfa.gz", "wb") as dst:
            dst.write(src.read())
    with open("/root/reference/test/read.fa", "rb") as src:
        with gzip.open(reads / "S1.2x.fq.gz", "wb") as dst:
            dst.write(src.read())
    samples = tmp_path / "samples.txt"
    samples.write_text("S1\n")

    env = dict(os.environ, PYTHONPATH=REPO, R="4",
               DIPGENIE_ARGS="-k 5 -w 3", PYTHON=sys.executable)
    r = subprocess.run(
        ["bash", os.path.join(SCRIPTS, "run_batch.sh"), str(samples),
         str(graph), str(reads), str(outd), "2x", "1"],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr + r.stdout
    full = outd / "S1_2x" / "full.fa"
    assert full.exists()
    body = full.read_text()
    assert body.count(">") == 2  # diploid pair
    assert (outd / "S1_2x" / "full_1.fa").read_text().count(">") == 1
    assert (outd / "S1_2x" / "full_2.fa").read_text().count(">") == 1


def test_vg_haplotypes_stub_toolchain(tmp_path):
    """vg_haplotypes.py sequences the vg/kmc/seqtk calls correctly."""
    bindir = tmp_path / "bin"
    bindir.mkdir()
    log = tmp_path / "calls.log"
    # every stub appends its argv and creates the expected artifact
    _stub(bindir, "vg", f"""
echo "vg $@" >> {log}
case "$1" in
  index) touch "$3";;
  gbwt) for a in "$@"; do [ "$prev" = "-r" ] && touch "$a"; prev=$a; done;;
  haplotypes) for a in "$@"; do
      [ "$prev" = "-H" ] && touch "$a"; [ "$prev" = "-g" ] && touch "$a";
      prev=$a; done;;
  paths) printf '>hap1\\nACGT\\n>hap2\\nTTTT\\n';;
esac
""")
    _stub(bindir, "kmc", f"""
echo "kmc $@" >> {log}
touch "${{@: -2:1}}.kff"
""")
    _stub(bindir, "seqtk", f"""
echo "seqtk $@" >> {log}
# stub reverse-complement: emit fixed rc content
printf '>hap1\\nACGT\\n>hap2\\nAAAA\\n'
""")
    readf = tmp_path / "r.fq"
    readf.write_text("@r1\nACGT\n+\nIIII\n")
    gbz = tmp_path / "g.gbz"
    gbz.write_text("")
    out = tmp_path / "out.fa"
    r = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "vg_haplotypes.py"),
         "-g", str(gbz), "-r", str(readf), "-d", str(tmp_path / "t"),
         "-t", "2", "-o", str(out)],
        capture_output=True, text=True, env=_env_with(str(bindir)),
    )
    assert r.returncode == 0, r.stderr
    calls = log.read_text()
    # the reference pipeline order: dist, r-index, hapl, kmc, sampling, paths
    order = ["vg index -j", "vg gbwt -p", "vg haplotypes -v",
             "kmc -k29", "vg haplotypes --diploid-sampling", "vg paths"]
    pos = [calls.find(s) for s in order]
    assert all(p >= 0 for p in pos), calls
    assert pos == sorted(pos), calls
    assert out.read_text().startswith(">hap1")
    assert "AAAA" in out.read_text()  # seqtk rc applied


def test_run_vg_batch_stub_toolchain(tmp_path):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    log = tmp_path / "calls.log"
    _stub(bindir, "gfa2gbwt", f'echo "gfa2gbwt $@" >> {log}; touch "$2.gbwt"')
    _stub(bindir, "vg", f"""
echo "vg $@" >> {log}
case "$1" in
  convert) printf 'XG';;
  gbwt) for a in "$@"; do [ "$prev" = "-g" ] && touch "$a";
        [ "$prev" = "-r" ] && touch "$a"; prev=$a; done;;
  index) touch "$3";;
  haplotypes) for a in "$@"; do
      [ "$prev" = "-H" ] && touch "$a"; [ "$prev" = "-g" ] && touch "$a";
      prev=$a; done;;
  paths) printf '>h1\\nAC\\n>h2\\nGT\\n';;
esac
""")
    _stub(bindir, "kmc", 'touch "${@: -2:1}.kff"')
    _stub(bindir, "seqtk", "printf '>h1\\nGT\\n>h2\\nAC\\n'")

    graph = tmp_path / "Graph"
    reads = tmp_path / "Reads"
    outd = tmp_path / "ResultsVG"
    graph.mkdir()
    reads.mkdir()
    (graph / "MHC_wo_S1.gfa").write_text("H\tVN:Z:1.1\n")
    (reads / "S1.2x.fq").write_text("@r\nAC\n+\nII\n")
    samples = tmp_path / "samples.txt"
    samples.write_text("S1\n")
    r = subprocess.run(
        ["bash", os.path.join(SCRIPTS, "run_vg_batch.sh"), str(samples),
         str(graph), str(reads), str(outd), "2x", "1"],
        capture_output=True, text=True, env=_env_with(str(bindir)),
    )
    assert r.returncode == 0, r.stderr + r.stdout
    assert (outd / "S1_2x" / "full.fa").exists()
    assert "gfa2gbwt" in log.read_text()


def test_eval_ser_f1_stub_toolchain(tmp_path):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    _stub(bindir, "cactus-pangenome", """
outdir=""; name=""
prev=""
for a in "$@"; do
  [ "$prev" = "--outDir" ] && outdir=$a
  [ "$prev" = "--outName" ] && name=$a
  prev=$a
done
mkdir -p "$outdir"; touch "$outdir/$name.vcf.gz"
""")
    _stub(bindir, "whatshap", """
# args: compare --names truth,test --tsv-pairwise ser.tsv truth test
prev=""; tsv=""
for a in "$@"; do [ "$prev" = "--tsv-pairwise" ] && tsv=$a; prev=$a; done
printf 'h\\th\\tall_switch_rate\\n' > "$tsv"
printf 'x\\ty\\t0.0123\\n' >> "$tsv"
""")
    _stub(bindir, "bcftools", """
case "$1" in
  norm) prev=""; for a in "$@"; do [ "$prev" = "-o" ] && touch "$a"; prev=$a; done;;
  index) :;;
esac
""")
    _stub(bindir, "truvari", """
prev=""; out=""
for a in "$@"; do [ "$prev" = "-o" ] && out=$a; prev=$a; done
mkdir -p "$out"
printf '{"precision": 0.9, "recall": 0.8, "f1": 0.8471}\\n' > "$out/summary.json"
""")
    outd = tmp_path / "eval"
    outd.mkdir()
    (outd / "seqfile.txt").write_text("")
    truth = tmp_path / "truth.vcf.gz"
    truth.write_text("")
    ref = tmp_path / "ref.fa"
    ref.write_text(">r\nACGT\n")
    r = subprocess.run(
        ["bash", os.path.join(SCRIPTS, "eval_ser_f1.sh"), "S1",
         str(ref), str(truth), str(outd)],
        capture_output=True, text=True, env=_env_with(str(bindir)),
    )
    assert r.returncode == 0, r.stderr + r.stdout
    assert "SER: 0.0123" in r.stdout
    assert "f1=0.8471" in r.stdout


def test_print_results_aggregators(tmp_path):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    # ser tree
    ev = tmp_path / "Evaluation"
    d = ev / "HG002" / "HG002_2x"
    d.mkdir(parents=True)
    (d / "SER.txt").write_text("blah\nthe switch error rate was: 0.042\n")
    r = subprocess.run(
        ["bash", os.path.join(SCRIPTS, "print_results.sh"), "ser", str(ev)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    assert "Sample\tDepth\tSwitchErrorRate" in r.stdout
    assert "HG002\t2x\t0.042" in r.stdout

    # f1 tree
    sv = tmp_path / "SV_Evaluation"
    b = sv / "HG002" / "HG002_4x" / "bench"
    b.mkdir(parents=True)
    (b / "log.txt").write_text('  "precision": 0.91,\n  "f1": 0.8567,\n')
    r = subprocess.run(
        ["bash", os.path.join(SCRIPTS, "print_results.sh"), "f1", str(sv)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    assert "HG002\t4x\t0.8567" in r.stdout

    # len tree with a stub seqkit
    _stub(str(bindir), "seqkit",
          "printf 'file\\tformat\\ttype\\tnum_seqs\\tsum_len\\n"
          "a.fa\\tFASTA\\tDNA\\t1\\t4500000\\n'")
    res = tmp_path / "Results"
    rd = res / "HG002" / "HG002_2x"
    rd.mkdir(parents=True)
    (rd / "full_1.fa").write_text(">a\nACGT\n")
    r = subprocess.run(
        ["bash", os.path.join(SCRIPTS, "print_results.sh"), "len", str(res)],
        capture_output=True, text=True, env=_env_with(str(bindir)),
    )
    assert r.returncode == 0, r.stderr
    assert "HG002\t2x\t4.50" in r.stdout
    assert "HG002\t4x\tNA" in r.stdout

    # svs tree with a stub bcftools emitting one >=50bp indel
    _stub(str(bindir), "bcftools",
          "printf 'A\\t" + "G" * 60 + "\\nA\\tC\\n'")
    (rd / "MHC_HG002_2x.vcf.gz").write_text("")
    r = subprocess.run(
        ["bash", os.path.join(SCRIPTS, "print_results.sh"), "svs", str(res)],
        capture_output=True, text=True, env=_env_with(str(bindir)),
    )
    assert r.returncode == 0, r.stderr
    assert "HG002\t2x\t1" in r.stdout


def test_vcf2gfa_stub_toolchain(tmp_path):
    """vcf2gfa.py: chromosome renaming to REF#0 and the vg construct ->
    gbwt(x4) -> gfa2gbwt chain (reference: vcf2gfa.py:44-54) under a
    stub toolchain; asserts the command sequence and output plumbing."""
    bindir = tmp_path / "bin"
    bindir.mkdir()
    log = tmp_path / "calls.log"
    _stub(bindir, "bgzip", f'echo "bgzip $@" >> {log}; mv "$2" "$2.gz"')
    _stub(bindir, "tabix", f'echo "tabix $@" >> {log}; touch "$4.tbi"')
    _stub(bindir, "vg", f"""
echo "vg $@" >> {log}
case "$1" in
  construct) printf 'VGGRAPH';;
  gbwt) prev=""; for a in "$@"; do
          [ "$prev" = "-o" ] && touch "$a"
          [ "$prev" = "-g" ] && touch "$a"
          prev=$a; done;;
esac
""")
    _stub(bindir, "gfa2gbwt", f"""
echo "gfa2gbwt $@" >> {log}
# emits <basename>.gfa next to the GBZ (-d <basename>)
printf 'H\\tVN:Z:1.1\\nS\\t1\\tACGT\\nW\\tREF\\t0\\tREF#0\\t0\\t4\\t>1\\n' > "$2.gfa"
""")

    vcf = tmp_path / "in.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        "##contig=<ID=chr6,length=8>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "chr6\t2\t.\tA\tC\t.\t.\t.\n"
    )
    ref = tmp_path / "ref.fa"
    ref.write_text(">chr6\nAACGTTAG\n")
    out = tmp_path / "out.gfa"
    wd = tmp_path / "work"
    r = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "vcf2gfa.py"),
         "-v", str(vcf), "-r", str(ref), "-o", str(out),
         "--tmpdir", str(wd)],
        capture_output=True, text=True, env=_env_with(str(bindir)),
    )
    assert r.returncode == 0, r.stderr
    # renamed inputs: single PanSN chromosome name
    renamed_fa = (wd / "renamed.fa").read_text()
    assert renamed_fa.startswith(">REF#0\n")
    calls = log.read_text()
    order = ["bgzip -f", "tabix -f -p vcf", "vg construct -aS",
             "vg gbwt -x", "vg gbwt -x", "vg gbwt -m",
             "--gbz-format", "gfa2gbwt -d"]
    pos, start = [], 0
    for s in order:
        i = calls.find(s, start)
        assert i >= 0, (s, calls)
        pos.append(i)
        start = i + 1
    # renamed VCF records carry the new chrom before bgzip
    assert "ID=REF#0" not in calls  # sanity: log holds commands only
    # the emitted GFA is copied verbatim to -o
    assert out.read_text().startswith("H\tVN:Z:1.1\nS\t1\tACGT\n")
    assert "W\tREF" in out.read_text()
