"""Native diploid-DP boundary safety: large R (the round-1 fixed-size
scratch overflowed at R >= 64) and the backpointer-packing width limit.

-R is a free CLI integer (reference main.cpp:75 parses it unchecked), so
the native kernel must accept any R without stack corruption and must
reject workloads whose level width breaks the pi|pj<<12 packing."""

import numpy as np
import pytest

from dipgenie_tpu import native
from dipgenie_tpu.solver.diploid import (
    _forward_exact,
    build_color_masks,
    csr_arrays,
)
from tests.test_device_kernels import _random_leveled_graph

pytestmark = pytest.mark.skipif(
    not native.available(), reason="dgcore not built"
)


@pytest.mark.parametrize("R", [63, 64, 65, 100])
def test_native_dp_large_R_matches_exact(R):
    rng = np.random.default_rng(7)
    g = _random_leveled_graph(rng, L=8, kmax=4, ncolors=8)
    chb = [bool(x) for x in rng.random(8) < 0.5]
    Hm, Tm = build_color_masks(g, chb)
    want_val, want_shet, _ = _forward_exact(g, R, Hm, Tm)
    arrs = csr_arrays(g, chb)
    got_val, got_shet, _ = native.diploid_dp(*arrs, R, 2, False)
    assert got_val == want_val
    assert got_shet == want_shet


def test_native_dp_rejects_wide_levels():
    # 3-level graph: source -> 4096-wide level -> sink
    k = 4096
    level_ptr = np.array([0, 1, 1 + k, 2 + k], np.int64)
    n = 2 + k
    adj_ptr = np.zeros(n + 1, np.int64)
    adj_v = []
    # source fans out to all middle vertices; each middle -> sink
    adj_ptr[1] = k
    adj_v.extend(range(1, 1 + k))
    for i in range(k):
        adj_ptr[2 + i] = adj_ptr[1 + i] + 1
        adj_v.append(1 + k)
    adj_ptr[n] = adj_ptr[n - 1]
    adj_v = np.asarray(adj_v, np.int32)
    adj_w = np.zeros(len(adj_v), np.int8)
    zero_ptr = np.zeros(n + 1, np.int64)
    none = np.zeros(0, np.int32)
    with pytest.raises(ValueError, match="4096"):
        native.diploid_dp(
            level_ptr, adj_ptr, adj_v, adj_w,
            zero_ptr, none, zero_ptr, none, 2, 1, False,
        )


def test_native_dp_rejects_negative_R():
    g = _random_leveled_graph(np.random.default_rng(3), L=5, kmax=3, ncolors=4)
    arrs = csr_arrays(g, [False] * 4)
    with pytest.raises(ValueError):
        native.diploid_dp(*arrs, -1, 1, False)
