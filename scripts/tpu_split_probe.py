#!/usr/bin/env python3
"""Measure the narrow vs wide share of the MHC pallas DP pass.

Timing-only ablation: replaces one kernel kind's dispatch with an
identity on V (DP values become wrong; walls stay honest because the
pass is still fetch-terminated). Serialize with other TPU work — the
tunnel is single-client.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dipgenie_tpu.ops import diploid_pallas as dp


def load_plan():
    import glob
    import pickle

    cands = sorted(
        glob.glob(
            os.path.expanduser("~/.cache/dipgenie_tpu/pair_plan_*.pkl")
        ),
        key=os.path.getmtime,
    )
    for p in cands[::-1]:
        plan = pickle.load(open(p, "rb"))
        if plan.L > 100000:  # the MHC plan
            return plan
    raise SystemExit("no cached MHC plan; run bench.py first")


def timed(drv, passes=3):
    def one():
        t0 = time.time()
        V, _ = drv._forward(keep_bp=False)
        np.asarray(V)[drv.R, 0]
        return time.time() - t0

    one()
    return min(one() for _ in range(passes))


def main():
    plan = load_plan()
    drv = dp.PairDiploidDP(plan)
    full = timed(drv)
    print(f"full pass: {full:.3f}s")

    orig_n = dp.PairDiploidDP._narrow_jit
    orig_w = dp.PairDiploidDP._wide_jit
    orig_w2 = dp.PairDiploidDP._wide_split_jit

    dp.PairDiploidDP._narrow_jit = lambda self, seg: (
        lambda *a: (None, None, a[-1])
    )
    no_narrow = timed(drv)
    dp.PairDiploidDP._narrow_jit = orig_n
    print(f"narrow skipped: {no_narrow:.3f}s -> narrow ~{full-no_narrow:.3f}s")

    dp.PairDiploidDP._wide_jit = lambda self, seg: (lambda *a: (None, a[-1]))
    dp.PairDiploidDP._wide_split_jit = lambda self, seg: (
        lambda *a: (None, a[-1])
    )
    no_wide = timed(drv)
    dp.PairDiploidDP._wide_jit = orig_w
    dp.PairDiploidDP._wide_split_jit = orig_w2
    print(f"wide skipped: {no_wide:.3f}s -> wide ~{full-no_wide:.3f}s")

    for ab in ("gather", "scan", "extract"):
        os.environ["DIPGENIE_ABLATE"] = ab
        drv2 = dp.PairDiploidDP(plan)
        t = timed(drv2)
        print(f"ablate {ab}: {t:.3f}s -> term ~{full-t:.3f}s")
        del drv2
    os.environ.pop("DIPGENIE_ABLATE", None)


if __name__ == "__main__":
    main()
