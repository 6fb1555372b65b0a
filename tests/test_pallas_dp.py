"""Pair-space Pallas diploid DP tier vs the exact tier.

The tier (ops/diploid_pallas.py) runs narrow level runs as Pallas
megakernels and wide gaps as XLA scans; on CPU CI everything executes in
interpret mode through the identical planning/orchestration code. Parity
contract: (sink_value, sink_s_het, transitions) bit-equal to
solver/diploid._forward_exact (reference semantics
src/approximator.cpp:362-716, tie-break :655-659).
"""

import io

import numpy as np
import pytest

from dipgenie_tpu.ops.diploid_pallas import (
    _NARROW_MAX_PAIRS, PairDiploidDP, _NarrowRun, _WideRun, plan_pairs,
)
from dipgenie_tpu.solver.diploid import (
    _forward_exact, build_color_masks, csr_arrays,
)
from tests.test_device_kernels import _random_leveled_graph


def _check(g, chb, R, interpret=True):
    Hm, Tm = build_color_masks(g, chb)
    ev, es, etr = _forward_exact(g, R, Hm, Tm)
    plan = plan_pairs(*csr_arrays(g, chb), R)
    pv, ps, ptr = PairDiploidDP(plan, interpret=interpret).run()
    assert (pv, ps) == (ev, es)
    assert ptr == etr
    return plan


# 20 random instances: narrow-only, mixed 16/32 layouts, and wide levels
# (width > 32) that exercise the XLA gap path and narrow<->wide handoffs.
CASES = (
    [(s, 12, 5, 5, 8) for s in range(6)]          # narrow, Bcls=16
    + [(100 + s, 8, 3, 2, 6) for s in range(3)]   # tiny, low R
    + [(200 + s, 16, 16, 5, 10) for s in range(3)]  # 16/32 layout mix
    + [(300 + s, 10, 30, 4, 12) for s in range(3)]  # near narrow limit
    + [(600 + s, 14, 24, 5, 8) for s in range(2)]   # flat 512/768 extents
    + [(400 + s, 10, 40, 4, 8) for s in range(3)]   # wide levels (>32)
    + [(500 + s, 14, 36, 6, 9) for s in range(2)]   # longer wide mixes
)


@pytest.mark.parametrize("seed,L,kmax,R,nc", CASES)
def test_pallas_dp_matches_exact_tier(seed, L, kmax, R, nc):
    rng = np.random.default_rng(seed)
    g = _random_leveled_graph(rng, L=L, kmax=kmax, ncolors=nc)
    chb = [bool(x) for x in rng.random(nc) < 0.4]
    _check(g, chb, R)


def test_pallas_wide_gap_has_wide_segment():
    """kmax=40 instances must actually route through the wide-gap path."""
    rng = np.random.default_rng(400)
    g = _random_leveled_graph(rng, L=10, kmax=40, ncolors=8)
    chb = [bool(x) for x in rng.random(8) < 0.4]
    plan = plan_pairs(*csr_arrays(g, chb), 4)
    kinds = {type(s) for s in plan.segments}
    assert _WideRun in kinds and _NarrowRun in kinds


def _dense_graph(rng, widths, deg, pw=0.25, ncolors=6):
    """Leveled DAG with controlled fan-out (for pair-count stress)."""
    from dipgenie_tpu.graph.expanded import ExpandedGraph

    starts = np.cumsum([0] + widths)
    n = int(starts[-1])
    g = ExpandedGraph(
        adj_list=[[] for _ in range(n)],
        color=[[] for _ in range(n)],
        original_vertex=[[v] for v in range(n)],
        haplotype=[0] * n,
        level=[l for l, w in enumerate(widths) for _ in range(w)],
        vertices_in_level=[
            list(range(starts[l], starts[l + 1])) for l in range(len(widths))
        ],
    )
    for l in range(len(widths) - 1):
        k2 = widths[l + 1]
        for u in range(starts[l], starts[l + 1]):
            for v in rng.choice(k2, size=min(k2, deg), replace=False):
                g.adj_list[u].append(
                    (int(starts[l + 1] + v), int(rng.random() < pw))
                )
        for v in range(starts[l + 1], starts[l + 2]):
            if not any(
                v == t
                for u in range(starts[l], starts[l + 1])
                for t, _ in g.adj_list[u]
            ):
                u = int(rng.integers(starts[l], starts[l + 1]))
                g.adj_list[u].append((v, 0))
    for v in range(n):
        for c in rng.choice(ncolors, size=rng.integers(0, 3), replace=False):
            g.color[v].append(int(c))
        g.color[v].sort()
    return g


def test_pallas_int16_bp_overflow_routes_to_wide_path():
    """A narrow-width transition with > 2^15 kept edge pairs would wrap
    the narrow kernel's int16 backpointer ordinals; the planner must
    route it to the wide-gap (int32 bp) path and stay bit-exact."""
    rng = np.random.default_rng(7)
    # width 16, fan-out 13 -> E = 208 edges, E^2 = 43264 pairs > 32768
    widths = [1, 16, 16, 16, 1]
    g = _dense_graph(rng, widths, deg=13, pw=0.1)
    chb = [bool(x) for x in rng.random(6) < 0.5]
    plan = plan_pairs(*csr_arrays(g, chb), 3)
    wide = [s for s in plan.segments if isinstance(s, _WideRun)]
    assert wide, "big-pair transitions must use the int32-bp gap path"
    _check(g, chb, 3)


def test_pallas_ladder_extends_beyond_fixed_rungs():
    """Width > 132 (Bin*Bin > 17536 lanes) used to raise a bare
    StopIteration from the fixed padding ladders; the ladders now extend
    by doubling and the result stays exact."""
    rng = np.random.default_rng(11)
    widths = [1, 140, 140, 1]
    g = _dense_graph(rng, widths, deg=2, pw=0.2)
    chb = [bool(x) for x in rng.random(6) < 0.5]
    _check(g, chb, 2)


def _hand_graph(widths, edges, colors=None):
    """ExpandedGraph with explicit per-transition edge lists.

    edges[l] = list of (i, j, w): level-l vertex i -> level-(l+1) vertex
    j with weight w. colors = {vertex: [colour,...]}.
    """
    from dipgenie_tpu.graph.expanded import ExpandedGraph

    starts = np.cumsum([0] + widths)
    n = int(starts[-1])
    g = ExpandedGraph(
        adj_list=[[] for _ in range(n)],
        color=[[] for _ in range(n)],
        original_vertex=[[v] for v in range(n)],
        haplotype=[0] * n,
        level=[l for l, w in enumerate(widths) for _ in range(w)],
        vertices_in_level=[
            list(range(starts[l], starts[l + 1])) for l in range(len(widths))
        ],
    )
    for l, es in enumerate(edges):
        for i, j, w in es:
            g.adj_list[starts[l] + i].append((int(starts[l + 1] + j), w))
    for v, cs in (colors or {}).items():
        g.color[v] = sorted(cs)
    return g


def test_pallas_wide_commit_shrinking_extent_stale_window():
    """Wide-run regression (round-4 advisor, diploid_pallas commit):
    when a transition's dst extent shrinks, V windows >= ext must be
    reset to NEG at commit — a stale older-level value left in a high
    window is otherwise gathered as a live state by a later transition.

    Construction: widths [1,40,40,40,1] (flat 40*40=1600 pair lanes = 2
    windows). t0 reaches all L1 pairs (ext 2). t1 only connects vertices
    0..24 (ext 1, window 0) — L2 pairs with i>=26 are unreachable, but
    the buggy commit left window 1 holding t0's (reachable) values at
    the same lanes. t2 has edges from ALL L2 vertices, so its gather
    reads lane 30*40+30 in window 1; a hom colour shared by L2[30] and
    L3[30] then scores 1 on that phantom path (exact answer: 0)."""
    W = 40
    starts = np.cumsum([0, 1, W, W, W])
    edges = [
        [(0, i, 0) for i in range(W)],
        [(i, i, 0) for i in range(25)],
        [(i, i, 0) for i in range(W)],
        [(i, 0, 0) for i in range(W)],
    ]
    colors = {int(starts[2] + 30): [0], int(starts[3] + 30): [0]}
    g = _hand_graph([1, W, W, W, 1], edges, colors)
    chb = [True]  # hom colour: scores via intersection
    plan = plan_pairs(*csr_arrays(g, chb), 0)
    assert any(isinstance(s, _WideRun) for s in plan.segments)
    _check(g, chb, 0)


def test_pallas_wide_commit_hole_window():
    """Wide-run dst-window hole: a transition whose kept pairs touch
    windows {0,2,3} but not 1 (within ext=4) must commit NEG for the
    untouched hole window, never raw Vnext scratch (undefined on real
    TPU; interpret mode masks this by zero-initializing VMEM)."""
    W = 56  # flat pair lanes up to 55*56+55 = 3135 -> 4 windows
    lo = list(range(18))  # pairs over lo*lo  -> window 0
    hi = list(range(37, W))  # pairs over hi*hi -> windows 2,3
    edges = [
        [(0, i, 0) for i in range(W)],
        [(i, i, 0) for i in lo + hi],
        [(i, 0, 0) for i in range(W)],
    ]
    g = _hand_graph([1, W, W, 1], edges, {1 + 5: [0], 1 + W + 5: [0]})
    chb = [True]
    plan = plan_pairs(*csr_arrays(g, chb), 0)
    wides = [s for s in plan.segments if isinstance(s, _WideRun)]
    assert wides
    holes = 0
    for s in wides:
        for row in range(len(s.wbits)):
            if not (int(s.wbits[row]) & 4) or not (int(s.wbits[row]) & 2):
                continue  # only real commit rows carry the mask we check
            pmask = int(s.wpmask[row])
            ext = pmask.bit_length()
            if pmask != (1 << ext) - 1:
                holes += 1
    assert holes, "fixture must produce a dst-window hole"
    _check(g, chb, 0)


def test_native_planner_matches_numpy_planner():
    """dg_pair_tables (one-call OpenMP planner) must produce plans whose
    every array is byte-identical to the numpy reference producer, on
    narrow-only, mixed, and wide instances."""
    import os

    from dipgenie_tpu import native

    if not native.available():
        pytest.skip("native runtime unavailable")
    cases = [(0, 12, 5, 5, 8), (200, 16, 16, 5, 10), (400, 10, 40, 4, 8),
             (500, 14, 36, 6, 9)]
    for seed, L, kmax, R, nc in cases:
        rng = np.random.default_rng(seed)
        g = _random_leveled_graph(rng, L=L, kmax=kmax, ncolors=nc)
        chb = [bool(x) for x in rng.random(nc) < 0.4]
        arrs = csr_arrays(g, chb)
        os.environ["DIPGENIE_NO_NATIVE_PLANNER"] = "1"
        try:
            pn = plan_pairs(*arrs, R)
        finally:
            del os.environ["DIPGENIE_NO_NATIVE_PLANNER"]
        pv = plan_pairs(*arrs, R)
        assert pv.max_abs_value == pn.max_abs_value, seed
        assert len(pv.segments) == len(pn.segments), seed
        for sv, sn in zip(pv.segments, pn.segments):
            assert type(sv) is type(sn)
            for f in sv.__dataclass_fields__:
                a, b = getattr(sv, f), getattr(sn, f)
                if isinstance(a, np.ndarray):
                    assert np.array_equal(a, b), (seed, f)
                else:
                    assert a == b, (seed, f)


def test_pallas_value_bound_guard():
    """Planning rejects instances whose packed int32 key would overflow."""
    rng = np.random.default_rng(3)
    g = _random_leveled_graph(rng, L=6, kmax=4, ncolors=8)
    # a HET colour mass large enough to push the value bound past 2^21
    # (het colours score via symmetric difference, so a one-sided pile
    # contributes its full cardinality to the per-level max score)
    n_big = 4_200_000
    g.color[2] = list(range(n_big))
    chb = [False] * n_big
    with pytest.raises(ValueError, match="packed int32 key"):
        plan_pairs(*csr_arrays(g, chb), 5)


def test_pallas_requires_small_R():
    rng = np.random.default_rng(3)
    g = _random_leveled_graph(rng, L=6, kmax=4)
    chb = [True] * 8
    with pytest.raises(ValueError, match="R <= 31"):
        plan_pairs(*csr_arrays(g, chb), 40)


def test_toy_diploid_pallas_backend_byte_identical(tmp_path):
    """Full pipeline with --dp-backend pallas reproduces the reference
    golden byte-for-byte (clone of the fused-tier e2e test)."""
    from dipgenie_tpu.solver.pipeline import Pipeline, PipelineConfig
    from tests.conftest import ref_fixture
    from tests.test_e2e_toy import TOY_DIP_GOLDEN

    gfa = ref_fixture("test.gfa")
    reads = ref_fixture("read.fa")
    out = tmp_path / "dip_pallas.fa"
    cfg = PipelineConfig(
        k=5, w=3, recombination_limit=4, ploidy=2, verbose=False,
        dp_backend="pallas",
    )
    buf = io.StringIO()
    Pipeline(gfa, reads, str(out), cfg).run(out=buf)
    assert out.read_text() == TOY_DIP_GOLDEN
    assert "DP value: 14" in buf.getvalue()


def test_pallas_fallback_on_large_R(tmp_path):
    """R beyond the pallas packed-key limit falls back to the chunked
    jax tier with a warning instead of failing."""
    from dipgenie_tpu.solver.pipeline import Pipeline, PipelineConfig
    from tests.conftest import ref_fixture
    from tests.test_e2e_toy import TOY_DIP_GOLDEN

    gfa = ref_fixture("test.gfa")
    reads = ref_fixture("read.fa")
    out = tmp_path / "dip_fb.fa"
    cfg = PipelineConfig(
        k=5, w=3, recombination_limit=40, ploidy=2, verbose=False,
        dp_backend="pallas",
    )
    Pipeline(gfa, reads, str(out), cfg).run(out=io.StringIO())
    assert out.read_text() == TOY_DIP_GOLDEN


@pytest.mark.parametrize(
    "seed,L,kmax,R,nc",
    [(201, 16, 16, 5, 10), (401, 10, 40, 4, 8), (500, 14, 36, 6, 9)],
)
def test_pallas_fused_forward_matches_exact(seed, L, kmax, R, nc, monkeypatch):
    """The grouped-dispatch forward (one jit per segment group) must
    produce the same sink value as the exact tier, including across
    group boundaries (group size 2 forces several groups)."""
    monkeypatch.setenv("DIPGENIE_FUSE_GROUP", "2")
    rng = np.random.default_rng(seed)
    g = _random_leveled_graph(rng, L=L, kmax=kmax, ncolors=nc)
    chb = [bool(x) for x in rng.random(nc) < 0.4]
    Hm, Tm = build_color_masks(g, chb)
    ev, _, _ = _forward_exact(g, R, Hm, Tm)
    plan = plan_pairs(*csr_arrays(g, chb), R)
    drv = PairDiploidDP(plan, interpret=True)
    V = drv._forward_fused()
    assert int(np.asarray(V)[R, 0]) == ev
    # and the measure path (which prefers the fused forward) agrees
    walls, v = drv.measure_passes(passes=1)
    assert v == ev and len(walls) == 1
