"""CLI flag-surface smoke tests (reference main.cpp parity)."""

import subprocess
import sys

from tests.conftest import ref_fixture

TOY_DIP = ">sol_1 bp:19\nATCGAAAATACTTACCATG\n>sol_2 bp:19\nATCGATCATACGCATCATG\n"


def _run(args):
    return subprocess.run(
        [sys.executable, "-m", "dipgenie_tpu", *args],
        capture_output=True, text=True, cwd="/root/repo",
    )


def test_version():
    r = _run(["--version"])
    assert r.returncode == 0
    assert "PHI version: 1.0" in r.stderr


def test_usage_on_missing_args():
    r = _run([])
    assert r.returncode == 1


def test_toy_diploid_via_cli(tmp_path):
    gfa = ref_fixture("test.gfa")
    reads = ref_fixture("read.fa")
    out = tmp_path / "out.fa"
    r = _run(["-t", "1", "-k", "5", "-w", "3", "-p", "2", "-R", "4",
              "-g", gfa, "-r", reads, "-o", str(out)])
    assert r.returncode == 0, r.stderr
    assert out.read_text() == TOY_DIP
    assert "Real time" in r.stderr


def test_ilp_branch_runs_exact_solver(tmp_path):
    # the stock reference compiles -a1 out (no -DILP); here it runs the
    # exact HiGHS-backed solver and writes {out}_{h}.fa per copy
    gfa = ref_fixture("test.gfa")
    reads = ref_fixture("read.fa")
    out = tmp_path / "out.fa"
    r = _run(["-a", "1", "-k", "5", "-w", "3", "-p", "2",
              "-g", gfa, "-r", reads, "-o", str(out)])
    assert r.returncode == 0, r.stderr
    assert not out.exists()  # per-copy files, not the -o path itself
    assert (tmp_path / "out.fa_1.fa").exists()
    assert (tmp_path / "out.fa_2.fa").exists()


def test_checkpoint_resume_byte_identical(tmp_path):
    """--checkpoint-dir: the second run resumes the anchor stage from
    disk (ROADMAP 9; the reference has no checkpointing) and produces
    byte-identical output; a changed parameter set gets a different
    key and recomputes rather than resuming stale state."""
    import io

    from dipgenie_tpu.solver.pipeline import Pipeline, PipelineConfig
    from dipgenie_tpu.utils import checkpoint as ckpt
    from tests.conftest import ref_fixture

    gfa = ref_fixture("test.gfa")
    reads = ref_fixture("read.fa")
    ckdir = str(tmp_path / "ck")

    def run(out_name):
        out = tmp_path / out_name
        cfg = PipelineConfig(
            k=5, w=3, recombination_limit=4, ploidy=2, verbose=False,
            checkpoint_dir=ckdir,
        )
        Pipeline(gfa, reads, str(out), cfg).run(out=io.StringIO())
        return out.read_bytes()

    first = run("a.fa")
    key = ckpt.anchors_key(gfa, reads, 5, 3, 1.0)
    assert __import__("os").path.exists(ckpt.anchors_path(ckdir, key))
    # resumed run: loads the checkpoint (drop mtime-sensitivity risk by
    # checking the loader directly too) and matches byte for byte
    assert ckpt.load_anchors(ckdir, key) is not None
    second = run("b.fa")
    assert second == first
    # different parameters -> different key (no stale resume)
    assert ckpt.anchors_key(gfa, reads, 7, 3, 1.0) != key
    # corrupt checkpoint -> silently recomputed
    with open(ckpt.anchors_path(ckdir, key), "wb") as fh:
        fh.write(b"garbage")
    assert ckpt.load_anchors(ckdir, key) is None
    third = run("c.fa")
    assert third == first
