"""Debug driver: pair-space Pallas tier vs exact tier on random toy DAGs.

Usage: python scripts/debug_pallas.py [seeds...]
Runs in interpret mode on CPU.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from test_device_kernels import _random_leveled_graph  # noqa: E402

from dipgenie_tpu.ops.diploid_pallas import PairDiploidDP, plan_pairs  # noqa: E402
from dipgenie_tpu.solver.diploid import (  # noqa: E402
    _forward_exact, build_color_masks, csr_arrays,
)


def run_one(seed, L=12, kmax=6, R=5, ncolors=8, verbose=False):
    rng = np.random.default_rng(seed)
    g = _random_leveled_graph(rng, L=L, kmax=kmax, ncolors=ncolors)
    chb = [bool(x) for x in rng.random(ncolors) < 0.4]

    Hm, Tm = build_color_masks(g, chb)
    ev, es, etr = _forward_exact(g, R, Hm, Tm)

    plan = plan_pairs(*csr_arrays(g, chb), R)
    pv, ps, ptr = PairDiploidDP(plan, interpret=True).run()
    ok = (pv, ps) == (ev, es) and ptr == etr
    print(f"seed={seed} L={L} kmax={kmax} R={R}: exact=({ev},{es}) pallas=({pv},{ps}) {'OK' if ok else 'MISMATCH'}")
    if not ok and verbose:
        print(" exact transitions:")
        for t in etr:
            print("  ", t)
        print(" pallas transitions:")
        for t in ptr:
            print("  ", t)
    return ok


if __name__ == "__main__":
    seeds = [int(s) for s in sys.argv[1:]] or [0, 1, 2]
    nfail = 0
    for s in seeds:
        if not run_one(s, verbose=True):
            nfail += 1
    print(f"{len(seeds) - nfail}/{len(seeds)} OK")
    sys.exit(1 if nfail else 0)
