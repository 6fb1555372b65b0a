"""Grid fitter: numpy vs jax backends must agree exactly (the exact
float64 re-evaluation makes the argmin independent of the vectorized
backend), and toy params must match the reference run."""

import numpy as np

from dipgenie_tpu.models.fitter import KGFitOptions, fit_histogram

FIELDS = ("u_v", "sd_v", "var_w", "zp_copy", "zp_copy_het", "p_d", "p_e",
          "err_shape")


def test_jax_backend_matches_numpy():
    rng = np.random.default_rng(3)
    mult = np.concatenate(
        [np.ones(5000), rng.poisson(3, 1500) + 1, rng.poisson(9, 400) + 1]
    ).astype(int)
    uniq, freq = np.unique(mult, return_counts=True)
    pairs = [(int(m), float(f)) for m, f in zip(uniq, freq)]
    mm = int(uniq.max())
    opt = KGFitOptions(max_copy=10, max_x_use=mm, u_hi=float(mm))
    a = fit_histogram(pairs, opt, backend="numpy")
    b = fit_histogram(pairs, opt, backend="jax")
    for f in FIELDS:
        assert getattr(a.P, f) == getattr(b.P, f), f
    assert a.nll == b.nll


def test_toy_histogram_reference_params():
    opt = KGFitOptions(max_copy=10, max_x_use=1, u_hi=1.0)
    res = fit_histogram([(1, 7.0)], opt)
    assert round(res.nll, 2) == 2.07
    assert (res.P.u_v, res.P.sd_v) == (1.0, 0.5)


def _exhaustive_argmin(pairs, opt):
    """Oracle: exact f64 NLL at EVERY grid point, loop-order first min."""
    import math

    from dipgenie_tpu.models import fitter as F

    nmax = max((m for m, _ in pairs), default=0)
    n = min(nmax, opt.max_x_use)
    dense = [0.0] * (n + 1)
    for m, f in pairs:
        if m <= n:
            dense[m] += f
    xs_all = np.arange(1, n + 1, dtype=np.int64)
    ysd = np.asarray(dense[1:], np.float64)
    mask = ysd > 0
    xs, ys = xs_all[mask], ysd[mask]

    lin = F._linspace
    U = lin(opt.u_lo, opt.u_hi, opt.grid_u)
    SD = lin(opt.sd_lo, opt.sd_hi, opt.grid_sd)
    VW = lin(opt.varw_lo, opt.varw_hi, opt.grid_varw)
    ZP = lin(opt.zp_lo, opt.zp_hi, opt.grid_zp)
    ZPH = lin(opt.zp_lo, opt.zp_hi, opt.grid_zp)
    PD = lin(opt.pd_lo, opt.pd_hi, opt.grid_pd)
    PE = lin(opt.pe_lo, opt.pe_hi, opt.grid_pe)
    SS = lin(opt.s_lo, opt.s_hi, opt.grid_s)
    best = math.inf
    best_combo = None
    for u in U:
        for sd in SD:
            for vw in VW:
                for zp in ZP:
                    for zph in ZPH:
                        for pd in PD:
                            for pe in PE:
                                for s in SS:
                                    e = F._nll_exact(
                                        float(u), float(sd), float(vw),
                                        float(zp), float(zph), float(pd),
                                        float(pe), float(s), opt.max_copy,
                                        xs, ys)
                                    if e < best:
                                        best = e
                                        best_combo = (u, sd, vw, zp, zph,
                                                      pd, pe, s)
    return best, best_combo


def test_adaptive_window_adversarial_near_ties():
    """Histograms crafted so many grid points nearly tie: the adaptive
    exact-re-eval window must still return the true f64 loop-order argmin
    even with a tiny top-K seed and the f32 device ranking."""
    opt = KGFitOptions(max_copy=4, max_x_use=12, u_hi=6.0,
                       grid_u=3, grid_sd=3, grid_varw=2, grid_pd=3,
                       grid_pe=2, grid_s=2, grid_zp=3)
    cases = [
        # flat histogram: every mixture fits equally badly (mass ties)
        [(m, 100.0) for m in range(1, 13)],
        # symmetric bimodal, peaks on grid-ambiguous positions
        [(1, 500.0), (2, 900.0), (3, 500.0), (5, 500.0), (6, 900.0),
         (7, 500.0)],
        # near-degenerate: single spike
        [(3, 1e6)],
        # heavy error tail + weak signal
        [(1, 1e5), (2, 3e4), (3, 1e4), (6, 300.0), (12, 290.0)],
    ]
    for pairs in cases:
        exp_nll, exp_combo = _exhaustive_argmin(pairs, opt)
        for backend, seed_k in (("numpy", 1), ("jax", 1), ("jax", 4)):
            res = fit_histogram(pairs, opt, exact_topk=seed_k,
                                backend=backend)
            assert res.nll == exp_nll, (backend, seed_k, pairs[:2])
            got = (res.P.u_v, res.P.sd_v, res.P.var_w, res.P.zp_copy,
                   res.P.zp_copy_het, res.P.p_d, res.P.p_e, res.P.err_shape)
            assert got == tuple(float(x) for x in exp_combo), (backend, seed_k)
