"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest


def _need_devices(n):
    import jax

    if len(jax.devices()) < n:
        pytest.skip(f"need {n} devices")


def test_sharded_sketch_count_matches_host():
    import jax.numpy as jnp

    _need_devices(4)
    from dipgenie_tpu.ops.sketch_jax import encode_reads
    from dipgenie_tpu.parallel.mesh import make_mesh, sharded_sketch_count_step
    from dipgenie_tpu.sketch.minimizers import sketch_sequence

    rng = np.random.default_rng(7)
    k, w = 11, 5
    reads = ["".join(rng.choice(list("ACGT"), 80)) for _ in range(16)]
    # haplotype table: minimizers of a random "haplotype"
    hap = "".join(rng.choice(list("ACGT"), 2000))
    tbl = np.unique(sketch_sequence(hap, k, w).hashes)
    thi = (tbl >> np.uint64(32)).astype(np.uint32)
    tlo = (tbl & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    order = np.lexsort((tlo, thi))
    thi, tlo = thi[order], tlo[order]

    codes, lens, _ = encode_reads(reads, 80)
    mesh = make_mesh(n_dp=4, n_tp=1)
    counts, per_read = sharded_sketch_count_step(
        mesh, jnp.asarray(codes), jnp.asarray(lens),
        jnp.asarray(thi), jnp.asarray(tlo), k, w,
    )
    counts = np.asarray(counts)
    per_read = np.asarray(per_read)

    # host truth: per-window emitted minimizers matched against the table
    tbl64 = (thi.astype(np.uint64) << np.uint64(32)) | tlo.astype(np.uint64)
    exp_counts = np.zeros(len(tbl64), np.int64)
    exp_per_read = np.zeros(len(reads), np.int64)
    for i, s in enumerate(reads):
        m = sketch_sequence(s, k, w)
        for h in m.hashes:
            j = np.searchsorted(tbl64, h)
            if j < len(tbl64) and tbl64[j] == h:
                exp_counts[j] += 1
                exp_per_read[i] += 1
    assert np.array_equal(counts, exp_counts)
    assert np.array_equal(per_read, exp_per_read)


def test_dryrun_multichip_entrypoints():
    _need_devices(8)
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    import jax

    out = jax.jit(fn)(*args)
    assert out[0].shape == (7, 8, 8)
    ge.dryrun_multichip(8)
