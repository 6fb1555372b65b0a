#!/usr/bin/env python3
"""Benchmark driver. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: diploid pair-DP throughput (DP states/s) of the device
kernel on the MHC fixture — the dominant compute of the pipeline, which
the reference runs serially over levels (README.md:83 lists
parallelizing it as future work).

Baseline: the compiled reference C++ (g++ -O3 -fopenmp, 2 threads) on
the same MHC workload measured on the dev host: 421,330,928 DP states in
14.150 s = 29.78M states/s (see BENCH_NOTES.md for methodology). The
byte-identical outputs of all tiers are asserted by tests/, so this is
an apples-to-apples throughput comparison.

Falls back to a synthetic workload when the MHC fixture is unavailable,
and to the native C++ runtime when no accelerator is usable.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REF_MHC = "/root/reference/test/MHC_4.gfa.gz"
REF_READS = "/root/reference/test/CHM13_reads.fq.gz"
CACHE = "/tmp/dipgenie_tpu_bench_csr.npz"

# reference C++ diploid DP on MHC (this host, -t2): 421,330,928 states / 14.150 s
BASELINE_CELLS_PER_S = 29.78e6


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def build_mhc_csr():
    if os.path.exists(CACHE):
        log(f"using cached CSR arrays: {CACHE}")
        d = np.load(CACHE)
        return [d[k] for k in (
            "level_ptr", "adj_ptr", "adj_v", "adj_w",
            "hom_ptr", "hom_colors", "het_ptr", "het_colors",
        )]
    log("building MHC levelized CSR (full front-end run)...")
    from dipgenie_tpu import native
    from dipgenie_tpu.io.fastx import read_fastx
    from dipgenie_tpu.solver.anchors import compute_and_classify_anchors
    from dipgenie_tpu.solver.diploid import csr_arrays
    from dipgenie_tpu.solver.pipeline import Pipeline, PipelineConfig

    p = Pipeline(REF_MHC, REF_READS, "/dev/null", PipelineConfig(verbose=False))
    p.load()
    reads = read_fastx(REF_READS)
    anchors = compute_and_classify_anchors(p.index, reads, 31, 25, 1.0, verbose=False)
    # Same front-end path as pipeline.solve(): native builder + levelizer
    # when available; otherwise materialize the flat native anchor arrays
    # into per-hit chains for the Python builder.
    if native.available():
        from dipgenie_tpu.graph.expanded import build_expanded_graph_native
        from dipgenie_tpu.graph.leveled import levelize_native

        b = build_expanded_graph_native(p.index, anchors)
        g = levelize_native(b.graph)
    else:
        from dipgenie_tpu.graph.expanded import build_expanded_graph

        if anchors.occ_sp is not None and not anchors.anchor_hits:
            from dipgenie_tpu.solver.anchors import materialize_hits

            anchors.anchor_hits = materialize_hits(anchors, p.index.num_walks)
        b = build_expanded_graph(p.index, anchors)
        g = b.graph
        g.topologically_reorder(b.sink)
        g.strict_bfs_levelize_and_reorder()
    chb = [False] * b.num_colors
    for c in range(b.num_colors):
        if anchors.homo_bv[b.color_to_anchor[c]]:
            chb[c] = True
    arrs = csr_arrays(g, chb)
    np.savez(
        CACHE, level_ptr=arrs[0], adj_ptr=arrs[1], adj_v=arrs[2], adj_w=arrs[3],
        hom_ptr=arrs[4], hom_colors=arrs[5], het_ptr=arrs[6], het_colors=arrs[7],
    )
    return list(arrs)


def synthetic_csr(L=20000, seed=0):
    """Synthetic leveled DAG shaped like the MHC expanded graph."""
    rng = np.random.default_rng(seed)
    widths = np.clip(rng.poisson(8, L), 2, 48)
    widths[0] = 1
    widths[-1] = 1
    level_ptr = np.zeros(L + 1, np.int64)
    np.cumsum(widths, out=level_ptr[1:])
    n = int(level_ptr[-1])
    adj_ptr = [0]
    adj_v = []
    adj_w = []
    colors = [[] for _ in range(n)]
    ncolors = 0
    for l in range(L - 1):
        b0, b1, b2 = level_ptr[l], level_ptr[l + 1], level_ptr[l + 2]
        k, k2 = int(b1 - b0), int(b2 - b1)
        for i in range(k):
            deg = 1 + (rng.random() < 0.3)
            targets = rng.integers(0, k2, deg)
            for t in targets:
                adj_v.append(b1 + t)
                adj_w.append(int(rng.random() < 0.1))
            adj_ptr.append(len(adj_v))
        if rng.random() < 0.3:
            c = ncolors
            ncolors += 1
            for v in rng.integers(b0, b2, 3):
                colors[int(v)].append(c)
    for i in range(int(level_ptr[-1] - level_ptr[-2])):
        adj_ptr.append(len(adj_v))
    hom = rng.random(max(ncolors, 1)) < 0.15
    hom_ptr, het_ptr = [0], [0]
    hom_c, het_c = [], []
    for v in range(n):
        for c in sorted(set(colors[v])):
            (hom_c if hom[c] else het_c).append(c)
        hom_ptr.append(len(hom_c))
        het_ptr.append(len(het_c))
    return [
        level_ptr, np.asarray(adj_ptr, np.int64), np.asarray(adj_v, np.int32),
        np.asarray(adj_w, np.int8), np.asarray(hom_ptr, np.int64),
        np.asarray(hom_c, np.int32), np.asarray(het_ptr, np.int64),
        np.asarray(het_c, np.int32),
    ]


def main() -> int:
    R = 18
    using_mhc = os.path.exists(REF_MHC) and os.path.exists(REF_READS)
    t_all = time.time()
    if using_mhc:
        # no silent synthetic fallback: the baseline constant is the
        # reference C++ on this exact MHC workload, so a front-end crash
        # must fail the bench rather than record an apples-to-oranges number
        arrs = build_mhc_csr()
    else:
        log("MHC fixture unavailable; using synthetic workload")
        arrs = synthetic_csr()
    level_ptr = arrs[0]
    widths = np.diff(level_ptr)
    cells = int(np.sum((R + 1) * widths[1:] * widths[1:]))
    log(f"workload: L={len(widths)} levels, {cells:,} DP states"
        f" ({'MHC' if using_mhc else 'synthetic'})")

    value = None
    backend = "jax-tpu"
    try:
        import jax

        log(f"devices: {jax.devices()}")
        from dipgenie_tpu.ops.diploid_jax import DeviceDiploidDP, plan_transitions

        t0 = time.time()
        plan = plan_transitions(*arrs)
        log(f"plan: {time.time()-t0:.1f}s")
        dp = DeviceDiploidDP(plan, R)
        # steady-state forward throughput, measured WITHOUT any d2h fetch
        # (fetches permanently degrade dispatch latency on tunnel-attached
        # runtimes; a production run needs exactly one fetch at the end)
        t0 = time.time()
        warm, dp_value = dp.measure_forward(passes=3, fetch_value=True)
        log(f"forward passes done in {time.time()-t0:.1f}s; best {warm:.2f}s; "
            f"DP value {dp_value}")
        if using_mhc and dp_value != 60729:
            # hard-fail: a wrong DP value means the measured workload is
            # not the real MHC problem — never record a bogus number
            log(f"FATAL: DP value {dp_value} != expected 60729")
            return 1
        value = cells / warm
        backend = f"jax-{jax.devices()[0].platform}"
    except Exception as e:  # noqa: BLE001
        log(f"device DP failed ({e}); falling back to native runtime")
        from dipgenie_tpu import native

        if not native.available():
            log("native runtime unavailable; aborting")
            return 1
        t0 = time.time()
        native.diploid_dp(*arrs, R, 0, False)
        warm = time.time() - t0
        value = cells / warm
        backend = "native-cpp"

    result = {
        "metric": "diploid_dp_states_per_s",
        "value": round(value, 1),
        "unit": "states/s",
        "vs_baseline": round(value / BASELINE_CELLS_PER_S, 3),
        "backend": backend,
        "workload": "MHC_4+CHM13" if using_mhc else "synthetic",
        "total_bench_wall_s": round(time.time() - t_all, 1),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
