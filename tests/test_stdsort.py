"""libstdc++ std::sort compatibility: the pure-Python introsort emulation
must order ties exactly like the real std::sort (native oracle)."""

import random

import numpy as np
import pytest

from dipgenie_tpu import native
from dipgenie_tpu.utils.stdsort import std_sort


def _native_sort3(k1, k2, k3):
    perm = np.arange(len(k1), dtype=np.int32)
    native.get_lib().dg_std_sort3(
        np.asarray(k1, np.int64), np.asarray(k2, np.int64),
        np.asarray(k3, np.int64), perm, len(k1),
    )
    return perm.tolist()


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_python_introsort_matches_libstdcxx():
    random.seed(99)
    for trial in range(40):
        n = random.choice([3, 15, 17, 40, 200, 1000])
        # many ties: small key space, payload distinguishes elements
        k1 = [random.randrange(max(2, n // 8)) for _ in range(n)]
        k2 = [random.randrange(3) for _ in range(n)]
        k3 = [0] * n
        ref = _native_sort3(k1, k2, k3)
        idx = list(range(n))
        std_sort(idx, lambda a, b: (k1[a], k2[a]) < (k1[b], k2[b]))
        assert idx == ref, f"trial {trial} n={n}"


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_python_introsort_deep_recursion_heapsort_path():
    # adversarial: already-sorted with heavy dup blocks still must match
    n = 2000
    k1 = sorted([i % 7 for i in range(n)])
    k2 = [0] * n
    ref = _native_sort3(k1, k2, k2)
    idx = list(range(n))
    std_sort(idx, lambda a, b: k1[a] < k1[b])
    assert idx == ref
