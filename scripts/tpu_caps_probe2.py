#!/usr/bin/env python3
"""Second Mosaic/Pallas capability probe: primitives the edge-pair
diploid-DP megakernel (ops/diploid_edge.py) depends on.

Run after tpu_caps_probe.py; same PASS/FAIL contract. Each check is an
isolated pallas_call so a failure pinpoints the unsupported primitive.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R1 = 19


def check(name, make, run=True):
    try:
        fn, args, expect = make()
        c = jax.jit(fn).lower(*args).compile()
        if run:
            out = np.asarray(c(*args))
            if expect is not None and not np.allclose(out, expect):
                print(f"WRONG {name}: got\n{out.ravel()[:8]}\nexpect\n{np.asarray(expect).ravel()[:8]}")
                return False
        print(f"PASS  {name}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL  {name}: {type(e).__name__}: {msg}", flush=True)
        return False


def _call(kernel, out_shape, *args, scratch=()):
    return pl.pallas_call(
        kernel, out_shape=out_shape, scratch_shapes=list(scratch)
    )(*args)


def mk_batched_dot():
    # [19,16,32] @ [19,32,16] batch dim 0 -> [19,16,16] (f32)
    rng = np.random.default_rng(0)
    A = rng.integers(0, 100, (R1, 16, 32)).astype(np.float32)
    B = rng.integers(0, 2, (R1, 32, 16)).astype(np.float32)

    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    def fn(a, b):
        return _call(kernel, jax.ShapeDtypeStruct((R1, 16, 16), jnp.float32), a, b)

    return fn, (jnp.asarray(A), jnp.asarray(B)), np.einsum("rij,rjk->rik", A, B)


def mk_batched_dot_bcast_lhs():
    # one-hot [16,32] broadcast over r then batched dot
    rng = np.random.default_rng(1)
    sel = rng.integers(0, 32, 16)
    one = np.zeros((16, 32), np.float32)
    one[np.arange(16), sel] = 1.0
    V = rng.integers(0, 100, (R1, 32, 16)).astype(np.float32)

    def kernel(one_ref, v_ref, o_ref):
        ob = jnp.broadcast_to(one_ref[...][None], (R1, 16, 32))
        o_ref[...] = jax.lax.dot_general(
            ob, v_ref[...],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    def fn(one, v):
        return _call(kernel, jax.ShapeDtypeStruct((R1, 16, 16), jnp.float32), one, v)

    return fn, (jnp.asarray(one), jnp.asarray(V)), V[:, sel, :]


def mk_concat3d_ax0():
    A = np.arange(R1 * 16 * 16, dtype=np.int32).reshape(R1, 16, 16)

    def kernel(a_ref, o_ref):
        a = a_ref[...]
        o_ref[...] = jnp.concatenate([jnp.full((1, 16, 16), -7, jnp.int32), a[: R1 - 1]], 0)

    def fn(a):
        return _call(kernel, jax.ShapeDtypeStruct((R1, 16, 16), jnp.int32), a)

    return fn, (jnp.asarray(A),), np.concatenate([np.full((1, 16, 16), -7, np.int32), A[: R1 - 1]], 0)


def mk_concat3d_ax1():
    A = np.arange(R1 * 16 * 16, dtype=np.int32).reshape(R1, 16, 16)

    def kernel(a_ref, o_ref):
        a = a_ref[...]
        o_ref[...] = jnp.concatenate([a, a + 1], 1)

    def fn(a):
        return _call(kernel, jax.ShapeDtypeStruct((R1, 32, 16), jnp.int32), a)

    return fn, (jnp.asarray(A),), np.concatenate([A, A + 1], 1)


def mk_concat3d_ax2():
    A = np.arange(R1 * 16 * 16, dtype=np.int32).reshape(R1, 16, 16)

    def kernel(a_ref, o_ref):
        a = a_ref[...]
        o_ref[...] = jnp.concatenate([a, a + 1], 2)

    def fn(a):
        return _call(kernel, jax.ShapeDtypeStruct((R1, 16, 32), jnp.int32), a)

    return fn, (jnp.asarray(A),), np.concatenate([A, A + 1], 2)


def mk_roll3d_ax1():
    A = np.arange(R1 * 16 * 16, dtype=np.int32).reshape(R1, 16, 16)

    def kernel(a_ref, o_ref):
        o_ref[...] = pltpu.roll(a_ref[...], 4, 1)

    def fn(a):
        return _call(kernel, jax.ShapeDtypeStruct((R1, 16, 16), jnp.int32), a)

    return fn, (jnp.asarray(A),), np.roll(A, 4, 1)


def mk_roll3d_ax2():
    A = np.arange(R1 * 16 * 16, dtype=np.int32).reshape(R1, 16, 16)

    def kernel(a_ref, o_ref):
        o_ref[...] = pltpu.roll(a_ref[...], 4, 2)

    def fn(a):
        return _call(kernel, jax.ShapeDtypeStruct((R1, 16, 16), jnp.int32), a)

    return fn, (jnp.asarray(A),), np.roll(A, 4, 2)


def mk_convert_f32_i32_3d():
    A = (np.arange(R1 * 16 * 16, dtype=np.float32).reshape(R1, 16, 16) - 1000.0)

    def kernel(a_ref, o_ref):
        o_ref[...] = a_ref[...].astype(jnp.int32) * 2

    def fn(a):
        return _call(kernel, jax.ShapeDtypeStruct((R1, 16, 16), jnp.int32), a)

    return fn, (jnp.asarray(A),), A.astype(np.int32) * 2


def mk_iota3d_onehot():
    # build a [16, 32] f32 one-hot from a streamed index vector in VMEM
    sel = np.arange(16, dtype=np.int32) * 2 % 32

    def kernel(sel_ref, o_ref):
        cols = jax.lax.broadcasted_iota(jnp.int32, (16, 32), 1)
        s = sel_ref[...].reshape(16, 1)
        o_ref[...] = (cols == s).astype(jnp.float32)

    def fn(sel):
        return _call(kernel, jax.ShapeDtypeStruct((16, 32), jnp.float32), sel)

    one = np.zeros((16, 32), np.float32)
    one[np.arange(16), sel] = 1.0
    return fn, (jnp.asarray(sel.reshape(16, 1)),), one


def mk_where3d():
    A = np.arange(R1 * 16 * 16, dtype=np.int32).reshape(R1, 16, 16)

    def kernel(a_ref, o_ref):
        a = a_ref[...]
        m = jax.lax.broadcasted_iota(jnp.int32, (R1, 16, 16), 1) < 8
        o_ref[...] = jnp.where(m, a, -1)

    def fn(a):
        return _call(kernel, jax.ShapeDtypeStruct((R1, 16, 16), jnp.int32), a)

    return fn, (jnp.asarray(A),), np.where(np.arange(16)[None, :, None] < 8, A, -1)


def mk_transpose2d():
    A = np.arange(304 * 16, dtype=np.float32).reshape(304, 16)

    def kernel(a_ref, o_ref):
        o_ref[...] = a_ref[...].T

    def fn(a):
        return _call(kernel, jax.ShapeDtypeStruct((16, 304), jnp.float32), a)

    return fn, (jnp.asarray(A),), A.T


def mk_dma_strided_3d():
    # HBM->VMEM DMA of a [19,8,8] corner of a [19,16,16] HBM array at a
    # dynamic row, and VMEM->HBM write-back of a corner slice
    A = np.arange(4 * R1 * 16 * 16, dtype=np.int16).reshape(4, R1, 16, 16)

    def kernel(a_hbm, o_hbm, scratch, sem, osem):
        row = 2
        cp = pltpu.make_async_copy(
            a_hbm.at[row], scratch, sem
        )
        cp.start()
        cp.wait()
        scratch[...] = scratch[...] + 1
        cp2 = pltpu.make_async_copy(
            scratch.at[:, 0:8, 0:8], o_hbm.at[1], osem
        )
        cp2.start()
        cp2.wait()

    def fn(a):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((2, R1, 8, 8), jnp.int16),
            scratch_shapes=[
                pltpu.VMEM((R1, 16, 16), jnp.int16),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        )(a)[1]

    return fn, (jnp.asarray(A),), A[2, :, 0:8, 0:8] + 1


def mk_switch_compute():
    # lax.switch over 3 branches with different static-slice footprints
    A = np.arange(R1 * 16 * 16, dtype=np.int32).reshape(R1, 16, 16)

    def kernel(b_ref, a_ref, o_ref):
        b = b_ref[0]
        a = a_ref[...]

        def f0(x):
            return x + 1

        def f1(x):
            y = x.at[:, :8, :8].set(x[:, :8, :8] * 2)
            return y

        def f2(x):
            return x - 3

        o_ref[...] = jax.lax.switch(b, [f0, f1, f2], a)

    def fn(b, a):
        return _call(kernel, jax.ShapeDtypeStruct((R1, 16, 16), jnp.int32), b, a)

    exp = A.copy()
    exp[:, :8, :8] *= 2
    return fn, (jnp.asarray([1], np.int32), jnp.asarray(A)), exp


def mk_dma_in_when():
    # DMA issued under pl.when (conditional prefetch pattern)
    A = np.arange(4 * 8 * 128, dtype=np.int32).reshape(4, 8, 128)

    def kernel(a_hbm, o_ref, scratch, sem):
        @pl.when(pl.program_id(0) == 0)
        def _():
            cp = pltpu.make_async_copy(a_hbm.at[2], scratch, sem)
            cp.start()
            cp.wait()

        o_ref[...] = scratch[...]

    def fn(a):
        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((8, 128), lambda t: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((8, 128), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )(a)

    return fn, (jnp.asarray(A),), A[2]


def mk_dot2d_f32():
    # plain 2D dot [64,32]@[32,304]
    rng = np.random.default_rng(2)
    A = rng.integers(0, 2, (64, 32)).astype(np.float32)
    B = rng.integers(0, 100, (32, 304)).astype(np.float32)

    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jnp.dot(a_ref[...], b_ref[...], preferred_element_type=jnp.float32)

    def fn(a, b):
        return _call(kernel, jax.ShapeDtypeStruct((64, 304), jnp.float32), a, b)

    return fn, (jnp.asarray(A), jnp.asarray(B)), A @ B


CHECKS = [
    ("batched_dot_3d", mk_batched_dot),
    ("batched_dot_bcast_lhs", mk_batched_dot_bcast_lhs),
    ("concat3d_ax0", mk_concat3d_ax0),
    ("concat3d_ax1", mk_concat3d_ax1),
    ("concat3d_ax2", mk_concat3d_ax2),
    ("roll3d_ax1", mk_roll3d_ax1),
    ("roll3d_ax2", mk_roll3d_ax2),
    ("convert_f32_i32_3d", mk_convert_f32_i32_3d),
    ("iota_onehot_build", mk_iota3d_onehot),
    ("where3d_iota_mask", mk_where3d),
    ("transpose2d", mk_transpose2d),
    ("dma_strided_3d", mk_dma_strided_3d),
    ("switch_compute", mk_switch_compute),
    ("dma_in_when", mk_dma_in_when),
    ("dot2d_f32", mk_dot2d_f32),
]


def main():
    import sys

    names = sys.argv[1:]
    for name, make in CHECKS:
        if names and name not in names:
            continue
        check(name, make)


if __name__ == "__main__":
    main()
