#!/usr/bin/env python3
"""Probe Mosaic/Pallas capabilities on the attached TPU.

Each candidate primitive is compiled (and optionally run) in isolation
so kernel design can rely only on what this toolchain actually lowers.
Results print one PASS/FAIL line per capability.
"""
from __future__ import annotations

import sys
import traceback

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def check(name, make, run=True):
    try:
        fn, args, expect = make()
        c = jax.jit(fn).lower(*args).compile()
        if run:
            out = np.asarray(c(*args))
            if expect is not None and not np.array_equal(out, expect):
                print(f"WRONG {name}: got\n{out}\nexpect\n{expect}")
                return False
        print(f"PASS  {name}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL  {name}: {type(e).__name__}: {msg}")
        return False


def _call(kernel, out_shape, *args, scratch=()):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        scratch_shapes=list(scratch),
    )(*args)


def mk_lane_gather_taa():
    # take_along_axis on lanes, idx within each 128-lane vreg
    A = np.arange(16 * 256, dtype=np.int32).reshape(16, 256)
    rng = np.random.default_rng(0)
    idx = (rng.integers(0, 16, (16, 256)) + (np.arange(256) // 16) * 16).astype(
        np.int32
    )

    def kernel(a_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(a_ref[...], i_ref[...], axis=1)

    def fn(a, i):
        return _call(kernel, jax.ShapeDtypeStruct((16, 256), jnp.int32), a, i)

    return fn, (jnp.asarray(A), jnp.asarray(idx)), np.take_along_axis(A, idx, 1)


def mk_lane_gather_cross():
    # take_along_axis on lanes with arbitrary cross-vreg indices
    A = np.arange(16 * 256, dtype=np.int32).reshape(16, 256)
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 256, (16, 256)).astype(np.int32)

    def kernel(a_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(a_ref[...], i_ref[...], axis=1)

    def fn(a, i):
        return _call(kernel, jax.ShapeDtypeStruct((16, 256), jnp.int32), a, i)

    return fn, (jnp.asarray(A), jnp.asarray(idx)), np.take_along_axis(A, idx, 1)


def mk_sublane_gather():
    # take_along_axis on sublanes, idx < 8 (single sublane tile)
    A = np.arange(8 * 128, dtype=np.int32).reshape(8, 128)
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 8, (8, 128)).astype(np.int32)

    def kernel(a_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(a_ref[...], i_ref[...], axis=0)

    def fn(a, i):
        return _call(kernel, jax.ShapeDtypeStruct((8, 128), jnp.int32), a, i)

    return fn, (jnp.asarray(A), jnp.asarray(idx)), np.take_along_axis(A, idx, 0)


def mk_sublane_gather16():
    # sublane gather across two 8-row tiles (idx < 16)
    A = np.arange(16 * 128, dtype=np.int32).reshape(16, 128)
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 16, (16, 128)).astype(np.int32)

    def kernel(a_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(a_ref[...], i_ref[...], axis=0)

    def fn(a, i):
        return _call(kernel, jax.ShapeDtypeStruct((16, 128), jnp.int32), a, i)

    return fn, (jnp.asarray(A), jnp.asarray(idx)), np.take_along_axis(A, idx, 0)


def mk_roll_lane():
    A = np.arange(16 * 256, dtype=np.int32).reshape(16, 256)

    def kernel(a_ref, o_ref):
        o_ref[...] = pltpu.roll(a_ref[...], 16, 1)

    def fn(a):
        return _call(kernel, jax.ShapeDtypeStruct((16, 256), jnp.int32), a)

    return fn, (jnp.asarray(A),), np.roll(A, 16, 1)


def mk_roll_sublane():
    A = np.arange(24 * 256, dtype=np.int32).reshape(24, 256)

    def kernel(a_ref, o_ref):
        o_ref[...] = pltpu.roll(a_ref[...], 1, 0)

    def fn(a):
        return _call(kernel, jax.ShapeDtypeStruct((24, 256), jnp.int32), a)

    return fn, (jnp.asarray(A),), np.roll(A, 1, 0)


def mk_lane_bcast_col():
    # [16,1] -> [16,256] broadcast (lanes only)
    A = np.arange(16, dtype=np.int32).reshape(16, 1)

    def kernel(a_ref, o_ref):
        o_ref[...] = jnp.broadcast_to(a_ref[...], (16, 256))

    def fn(a):
        return _call(kernel, jax.ShapeDtypeStruct((16, 256), jnp.int32), a)

    return fn, (jnp.asarray(A),), np.broadcast_to(A, (16, 256))


def mk_sublane_bcast_row():
    # [1,256] -> [16,256] broadcast (sublanes only)
    A = np.arange(256, dtype=np.int32).reshape(1, 256)

    def kernel(a_ref, o_ref):
        o_ref[...] = jnp.broadcast_to(a_ref[...], (16, 256))

    def fn(a):
        return _call(kernel, jax.ShapeDtypeStruct((16, 256), jnp.int32), a)

    return fn, (jnp.asarray(A),), np.broadcast_to(A, (16, 256))


def mk_tile_lane():
    # [16,16] -> [16,304] tiling via concatenate
    A = np.arange(16 * 16, dtype=np.int32).reshape(16, 16)

    def kernel(a_ref, o_ref):
        o_ref[...] = jnp.concatenate([a_ref[...]] * 19, axis=1)

    def fn(a):
        return _call(kernel, jax.ShapeDtypeStruct((16, 304), jnp.int32), a)

    return fn, (jnp.asarray(A),), np.tile(A, (1, 19))


def mk_dyn_slice_row():
    # dynamic row slice with traced index + sublane broadcast
    A = np.arange(16 * 256, dtype=np.int32).reshape(16, 256)

    def kernel(a_ref, o_ref):
        i = a_ref[0, 0] % 16
        row = a_ref[pl.ds(i, 1), :]
        o_ref[...] = jnp.broadcast_to(row, (16, 256))

    def fn(a):
        return _call(kernel, jax.ShapeDtypeStruct((16, 256), jnp.int32), a)

    return fn, (jnp.asarray(A),), np.broadcast_to(A[0:1], (16, 256))


def mk_manual_dma():
    # HBM->VMEM async copy at dynamic offset + VMEM->HBM out copy
    A = np.arange(64 * 128, dtype=np.int32).reshape(64, 128)

    def kernel(a_hbm, o_hbm, scratch, sem, osem):
        cp = pltpu.make_async_copy(a_hbm.at[pl.ds(8, 16)], scratch, sem)
        cp.start()
        cp.wait()
        scratch[...] += 1
        cp2 = pltpu.make_async_copy(scratch, o_hbm.at[pl.ds(0, 16)], osem)
        cp2.start()
        cp2.wait()

    def fn(a):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((16, 128), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((16, 128), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        )(a)

    return fn, (jnp.asarray(A),), A[8:24] + 1


def mk_scalar_prefetch():
    # PrefetchScalarGridSpec: per-step scalar offsets steering block maps
    A = np.arange(8 * 8 * 128, dtype=np.int32).reshape(8, 8, 128)
    sel = np.array([3, 1, 4, 1, 5, 2, 6, 0], np.int32)

    def kernel(sel_ref, a_ref, o_ref):
        o_ref[...] = a_ref[...]

    def fn(sel, a):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(8,),
                in_specs=[
                    pl.BlockSpec((1, 8, 128), lambda t, sel: (sel[t], 0, 0))
                ],
                out_specs=pl.BlockSpec((1, 8, 128), lambda t, sel: (t, 0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((8, 8, 128), jnp.int32),
        )(sel, a)

    return fn, (jnp.asarray(sel), jnp.asarray(A)), A[sel]


def mk_popcount():
    A = np.arange(16 * 256, dtype=np.uint32).reshape(16, 256)

    def kernel(a_ref, o_ref):
        o_ref[...] = jax.lax.population_count(a_ref[...]).astype(jnp.int32)

    def fn(a):
        return _call(kernel, jax.ShapeDtypeStruct((16, 256), jnp.int32), a)

    return fn, (jnp.asarray(A),), np.vectorize(lambda x: bin(x).count("1"))(A)


def mk_strided_slice():
    # strided lane slice A[:, v::16]
    A = np.arange(16 * 304, dtype=np.int32).reshape(16, 304)

    def kernel(a_ref, o_ref):
        o_ref[...] = a_ref[...][:, 3::16]

    def fn(a):
        return _call(kernel, jax.ShapeDtypeStruct((16, 19), jnp.int32), a)

    return fn, (jnp.asarray(A),), A[:, 3::16]


def mk_reshape_lane_groups():
    # [16,304] -> [16,19,16] reshape (split lanes)
    A = np.arange(16 * 304, dtype=np.int32).reshape(16, 304)

    def kernel(a_ref, o_ref):
        o_ref[...] = a_ref[...].reshape(16, 19, 16)

    def fn(a):
        return _call(kernel, jax.ShapeDtypeStruct((16, 19, 16), jnp.int32), a)

    return fn, (jnp.asarray(A),), A.reshape(16, 19, 16)


CAPS = {
    "lane_gather_taa_grouped": mk_lane_gather_taa,
    "lane_gather_cross_vreg": mk_lane_gather_cross,
    "sublane_gather_8": mk_sublane_gather,
    "sublane_gather_16": mk_sublane_gather16,
    "roll_lane": mk_roll_lane,
    "roll_sublane": mk_roll_sublane,
    "lane_bcast_col": mk_lane_bcast_col,
    "sublane_bcast_row": mk_sublane_bcast_row,
    "tile_lane_concat": mk_tile_lane,
    "dyn_slice_row_bcast": mk_dyn_slice_row,
    "manual_dma_dynoff": mk_manual_dma,
    "scalar_prefetch_grid": mk_scalar_prefetch,
    "popcount": mk_popcount,
    "strided_slice_lane": mk_strided_slice,
    "reshape_lane_groups": mk_reshape_lane_groups,
}


def main():
    names = sys.argv[1:] or list(CAPS)
    print(f"devices: {jax.devices()}", file=sys.stderr)
    for n in names:
        check(n, CAPS[n])


if __name__ == "__main__":
    main()
