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
