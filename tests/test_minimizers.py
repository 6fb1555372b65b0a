"""Minimizer scan vs a naive monotonic-deque implementation that mirrors
the reference loop (src/solver.cpp:277-412) literally."""

import collections
import random

import numpy as np

from dipgenie_tpu.sketch.minimizers import sketch_sequence
from dipgenie_tpu.sketch.murmur import murmur3_x64_128_fold64

_COMP = {"A": "T", "T": "A", "C": "G", "G": "C"}


def _revc(s: str) -> str:
    return "".join(_COMP.get(c, c) for c in reversed(s))


def _naive_sketch(seq: str, k: int, w: int):
    seq = seq.upper()
    out = []
    if len(seq) < w + k - 1:
        return out
    prev = 2**64 - 1
    dq: collections.deque = collections.deque()
    for i in range(len(seq) - k + 1):
        f = seq[i : i + k]
        m = min(f, _revc(f))
        while dq and dq[-1][0] >= m:
            dq.pop()
        dq.append((m, i))
        if dq and dq[0][1] <= i - w:
            dq.popleft()
        if i >= w - 1:
            best, p = dq[0]
            h = int(murmur3_x64_128_fold64(np.frombuffer(best.encode(), np.uint8))[0])
            if h != prev:
                prev = h
                out.append((h, p))
    return out


def test_sketch_matches_naive_deque():
    random.seed(1234)
    for trial in range(20):
        n = random.randint(8, 400)
        alpha = "ACGT" if trial % 2 == 0 else "ACGTN"
        s = "".join(random.choice(alpha) for _ in range(n))
        for k, wz in [(5, 3), (7, 4), (31, 25), (11, 8)]:
            mine = sketch_sequence(s, k, wz)
            got = list(zip(mine.hashes.tolist(), mine.positions.tolist()))
            assert got == _naive_sketch(s, k, wz), (trial, k, wz)


def test_sketch_lowercase_and_short():
    m = sketch_sequence("acgtacgtacgt", 5, 3)
    mu = sketch_sequence("ACGTACGTACGT", 5, 3)
    assert m.hashes.tolist() == mu.hashes.tolist()
    assert len(sketch_sequence("ACGT", 5, 3).hashes) == 0
