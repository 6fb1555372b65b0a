#!/usr/bin/env python3
"""Stage-by-stage wall breakdown of the fused pallas run() on the
cached MHC plan. Serialize with other TPU work (single-client tunnel).
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
        if plan.L > 100000:
            # content hash is embedded in the cache filename
            plan.fingerprint = os.path.basename(p).split("_")[-1][:16]
            return plan
    raise SystemExit("no cached MHC plan; run bench.py first")


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    plan = load_plan()
    print(f"plan load: {time.time()-t0:.1f}s")
    drv = dp.PairDiploidDP(plan)

    t0 = time.time()
    shipped = drv._ship()
    jax.block_until_ready(shipped[0][2][0])
    print(f"ship: {time.time()-t0:.1f}s")

    groups = drv._fused_groups()
    print(f"groups: {len(groups)}")

    # build/compile group programs
    t0 = time.time()
    for gkind, idxs in groups:
        if gkind == "f":
            drv._group_jit(tuple(idxs))
    print(f"group jit build (no compile): {time.time()-t0:.1f}s")

    t0 = time.time()
    V = drv._forward_fused()
    v = int(np.asarray(V)[drv.R, 0])
    print(f"forward+compile: {time.time()-t0:.1f}s (value {v})")

    t0 = time.time()
    V = drv._forward_fused()
    v = int(np.asarray(V)[drv.R, 0])
    print(f"forward warm: {time.time()-t0:.1f}s")

    # full run with phase timers
    t_run = time.time()
    val, shet, tr = drv.run()
    print(f"run() total: {time.time()-t_run:.1f}s "
          f"(value {val}, s_het {shet}, {len(tr)} transitions)")

    t_run = time.time()
    val, shet, tr = drv.run()
    print(f"run() again: {time.time()-t_run:.1f}s")


if __name__ == "__main__":
    main()
