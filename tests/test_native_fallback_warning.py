"""A broken native toolchain must warn loudly (once), not silently route
the pipeline onto the multi-hour pure-Python tiers."""

import numpy as np

from dipgenie_tpu import native


def test_broken_build_warns_once(tmp_path, monkeypatch, capfd):
    # point the module at an empty dir: `make` fails, no .so to load
    monkeypatch.setattr(native, "_NATIVE_DIR", str(tmp_path))
    monkeypatch.setattr(native, "_LIB_PATH", str(tmp_path / "libdgcore.so"))
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_warned", False)
    monkeypatch.delenv("DIPGENIE_NO_NATIVE_WARNING", raising=False)
    # force a rebuild attempt by making the source file look newer
    src = tmp_path / "dgcore.cpp"
    src.write_text("int broken(\n")

    assert native.get_lib() is None
    assert not native.available()
    err = capfd.readouterr().err
    assert "WARNING" in err and "libdgcore.so" in err
    # one-time: a second probe stays quiet
    assert native.get_lib() is None
    assert capfd.readouterr().err == ""


def test_wrapper_annotation_degenerate_haps():
    # ADVICE round 1: n_vtx==0 with nonempty (all-empty) walks must give
    # len(haps) == 0, not a spurious 1-element split.
    from dipgenie_tpu.graph.pangenome import PangenomeIndex
    from dipgenie_tpu.io.gfa import Gfa, Walk

    g = Gfa()
    g.walks = [Walk(sample="s", hap=1, seqname="c", st=0, en=0,
                    v=np.zeros(0, np.uint32))]
    idx = PangenomeIndex.from_gfa(g)
    assert len(idx.haps) == 0
