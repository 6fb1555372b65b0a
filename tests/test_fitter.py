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
