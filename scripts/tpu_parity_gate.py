#!/usr/bin/env python3
"""Compiled-on-TPU parity gate for the pair-space Pallas DP kernels.

The CI parity suite (tests/test_pallas_dp.py) runs the kernels in
interpret mode on CPU; Mosaic lowering differences are invisible there
(round 3's DEFAULT-precision bf16 truncation silently zeroed the DP and
only failed on hardware; round 4's uninitialized-Vnext class is masked
by interpret mode's zeroed scratch). This gate re-runs the full kernel
parity matrix COMPILED on the attached TPU and writes a JSON verdict.

Run once per round before benching:
    python scripts/tpu_parity_gate.py [-o TPU_PARITY.json]

Exit code 0 iff every case matches the exact host tier bit for bit.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.join(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__)), ".."
))


def run_cases():
    import jax

    from dipgenie_tpu.ops.diploid_pallas import PairDiploidDP, plan_pairs
    from dipgenie_tpu.solver.diploid import (
        _forward_exact, build_color_masks, csr_arrays,
    )
    from tests.test_device_kernels import _random_leveled_graph
    from tests.test_pallas_dp import CASES, _dense_graph, _hand_graph

    if jax.default_backend() != "tpu":
        print(f"FATAL: no TPU attached (backend {jax.default_backend()})",
              file=sys.stderr)
        return None

    results = []

    def check(name, g, chb, R):
        t0 = time.time()
        Hm, Tm = build_color_masks(g, chb)
        ev, es, etr = _forward_exact(g, R, Hm, Tm)
        plan = plan_pairs(*csr_arrays(g, chb), R)
        pv, ps, ptr = PairDiploidDP(plan, interpret=False).run()
        ok = (pv, ps) == (ev, es) and ptr == etr
        results.append({
            "case": name, "ok": bool(ok),
            "value": int(pv), "expect": int(ev),
            "wall_s": round(time.time() - t0, 2),
        })
        print(f"  [{'ok' if ok else 'FAIL'}] {name}: value {pv}/{ev}",
              file=sys.stderr)
        return ok

    # the full randomized parity matrix (narrow, layout mixes, wide)
    for seed, L, kmax, R, nc in CASES:
        rng = np.random.default_rng(seed)
        g = _random_leveled_graph(rng, L=L, kmax=kmax, ncolors=nc)
        chb = [bool(x) for x in rng.random(nc) < 0.4]
        check(f"rand-{seed}-L{L}-k{kmax}-R{R}", g, chb, R)

    # int16 bp overflow -> wide routing (big-pair stress)
    rng = np.random.default_rng(7)
    g = _dense_graph(rng, [1, 16, 16, 16, 1], deg=13, pw=0.1)
    chb = [bool(x) for x in rng.random(6) < 0.5]
    check("int16-bp-overflow", g, chb, 3)

    # ladder extension beyond fixed rungs (width 140)
    rng = np.random.default_rng(11)
    g = _dense_graph(rng, [1, 140, 140, 1], deg=2, pw=0.2)
    chb = [bool(x) for x in rng.random(6) < 0.5]
    check("ladder-extension-w140", g, chb, 2)

    # wide-commit stale-window regression (round-4 advisor) — exercises
    # shrinking dst extent on REAL hardware where Vnext scratch is
    # undefined (interpret mode masks the uninitialized variant)
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
    check("wide-commit-stale-window", g, [True], 0)

    # wide-commit hole-window regression
    W = 56
    lo = list(range(18))
    hi = list(range(37, W))
    edges = [
        [(0, i, 0) for i in range(W)],
        [(i, i, 0) for i in lo + hi],
        [(i, 0, 0) for i in range(W)],
    ]
    g = _hand_graph([1, W, W, 1], edges, {1 + 5: [0], 1 + W + 5: [0]})
    check("wide-commit-hole-window", g, [True], 0)

    return results


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--output", default="TPU_PARITY.json")
    args = ap.parse_args()

    t0 = time.time()
    results = run_cases()
    if results is None:
        return 2
    n_ok = sum(r["ok"] for r in results)
    verdict = {
        "gate": "pallas-compiled-parity",
        "backend": "tpu",
        "cases": len(results),
        "passed": n_ok,
        "ok": n_ok == len(results),
        "wall_s": round(time.time() - t0, 1),
        "results": results,
    }
    with open(args.output, "w") as fh:
        json.dump(verdict, fh, indent=1)
        fh.write("\n")
    print(json.dumps({k: verdict[k] for k in
                      ("gate", "cases", "passed", "ok", "wall_s")}))
    return 0 if verdict["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
