"""MurmurHash3 x64_128 XOR-fold — golden values from the reference
implementation (src/MurmurHash3.cpp:255 linked into a checker binary)."""

import numpy as np

from dipgenie_tpu.sketch.murmur import murmur3_x64_128_fold64

GOLDEN = {
    # k=31-ish DNA strings
    "ACGTACGTACGTACGTACGTACGTACGTACG": 10321218047303017979,
    "AAAAA": 9679707352608988203,
    "TTTTTTTTTTTTTTTTTTTTTTTTTTTTTTT": 13439281459378799449,
    "GATTACAGATTACAGATTACAGATTACAGAT": 5429387701165693879,
    "NNNNNCCCCCGGGGGTTTTTAAAAACGTACG": 1038868247561029562,
    # length edge cases around the 16-byte block / 8-byte tail boundaries
    "A": 4261021162394626125,
    "AB": 5099556816679455625,
    "ABCDEFGH": 14050820338066699718,
    "ABCDEFGHI": 2849090736459045089,
    "ABCDEFGHIJKLMNOP": 9063498233101762846,
    "ABCDEFGHIJKLMNOPQ": 9872535330714859298,
    "ABCDEFGHIJKLMNOPQRSTUVWX": 17406429689216363874,
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmn": 13382433176187034966,
}


def test_murmur_fold64_matches_reference():
    for s, expected in GOLDEN.items():
        arr = np.frombuffer(s.encode(), np.uint8)
        assert int(murmur3_x64_128_fold64(arr)[0]) == expected


def test_murmur_batched_rows():
    keys = [s for s in GOLDEN if len(s) == 31]
    rows = np.stack([np.frombuffer(s.encode(), np.uint8) for s in keys])
    got = murmur3_x64_128_fold64(rows)
    assert [int(h) for h in got] == [GOLDEN[s] for s in keys]
