#!/usr/bin/env python
"""In-Pallas matmul-pattern microbench for the backward blend's per-chunk
reductions. Runs each variant 1000x inside one kernel, so per-iteration cost
is dispatch-free; run all variants in one session so contention (if any)
cancels in the comparison."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_IT = 1000
H = jax.lax.Precision.HIGHEST


def bench(name, kernel, *shapes):
    rng = np.random.default_rng(0)
    args = [jnp.asarray(rng.standard_normal(s), jnp.float32) for s in shapes]
    f = jax.jit(
        lambda *a: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(a),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*a)
    )
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 5 / N_IT
    print(f"{name:44s} {dt*1e6:8.3f} us/iter")


def k_two_matmuls(basis_ref, dpix_ref, x_ref, y_ref, out_ref):
    def body(i, acc):
        mom = jax.lax.dot_general(
            basis_ref[...], x_ref[...] + acc[0, 0], (((0,), (0,)), ((), ())),
            precision=H, preferred_element_type=jnp.float32)
        dfeat = jax.lax.dot_general(
            dpix_ref[...], y_ref[...], (((0,), (0,)), ((), ())),
            precision=H, preferred_element_type=jnp.float32)
        return acc + jnp.sum(mom) * 0.0 + jnp.pad(
            dfeat, ((0, 4), (0, 0))) * 1e-9 + mom[:6].sum() * 0.0
    out_ref[...] = jax.lax.fori_loop(0, N_IT, body, jnp.zeros((8, 128), jnp.float32))


def k_merged(basisdpix_ref, x_ref, y_ref, out_ref):
    def body(i, acc):
        rhs = jnp.concatenate([x_ref[...] + acc[0, 0], y_ref[...]], axis=1)
        both = jax.lax.dot_general(
            basisdpix_ref[...], rhs, (((0,), (0,)), ((), ())),
            precision=H, preferred_element_type=jnp.float32)
        return acc + both[0:8, 0:128] * 1e-9
    out_ref[...] = jax.lax.fori_loop(0, N_IT, body, jnp.zeros((8, 128), jnp.float32))


def k_cmatmul(dpix_ref, feat_ref, out_ref):
    def body(i, acc):
        c = jax.lax.dot_general(
            dpix_ref[...], feat_ref[...] + acc[0, 0] * 1e-20,
            (((1,), (0,)), ((), ())),
            precision=H, preferred_element_type=jnp.float32)  # (256,128)
        return acc + c[:8] * 1e-9
    out_ref[...] = jax.lax.fori_loop(0, N_IT, body, jnp.zeros((8, 128), jnp.float32))


def k_cvpu(dpix_ref, feat_ref, out_ref):
    def body(i, acc):
        f = feat_ref[...] + acc[0, 0] * 1e-20
        d = dpix_ref[...]
        c = (d[:, 0:1] * f[0:1, :] + d[:, 1:2] * f[1:2, :]
             + d[:, 2:3] * f[2:3, :] + d[:, 3:4] * f[3:4, :])
        return acc + c[:8] * 1e-9
    out_ref[...] = jax.lax.fori_loop(0, N_IT, body, jnp.zeros((8, 128), jnp.float32))


def k_fwd_accum(w_ref, feat_ref, out_ref):
    def body(i, acc):
        a = jax.lax.dot_general(
            w_ref[...] + acc[0, 0] * 1e-20, feat_ref[...],
            (((1,), (1,)), ((), ())),
            precision=H, preferred_element_type=jnp.float32)  # (256,4)
        return acc + jnp.pad(a[:8], ((0, 0), (0, 124))) * 1e-9
    out_ref[...] = jax.lax.fori_loop(0, N_IT, body, jnp.zeros((8, 128), jnp.float32))


def k_cumprod(x_ref, out_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1)

    def body(i, acc):
        v = x_ref[...] + acc[0, 0] * 1e-20
        s = 1
        while s < 128:
            sh = pltpu.roll(v, s, axis=1)
            v = v * jnp.where(lane >= s, sh, 1.0)
            s *= 2
        return acc + v[:8] * 1e-9
    out_ref[...] = jax.lax.fori_loop(0, N_IT, body, jnp.zeros((8, 128), jnp.float32))


def main():
    print(f"backend: {jax.default_backend()}")
    bench("two HIGHEST matmuls (6,256)x + (4,256)x", k_two_matmuls,
          (256, 6), (256, 4), (256, 128), (256, 128))
    bench("ONE merged (10,256)@(256,256)", k_merged,
          (256, 10), (256, 128), (256, 128))
    bench("c as K=4 HIGHEST matmul (256,4)@(4,128)", k_cmatmul,
          (256, 4), (4, 128))
    bench("c as 7 VPU broadcast ops", k_cvpu, (256, 4), (4, 128))
    bench("fwd accum (256,128)@(128,4) HIGHEST", k_fwd_accum,
          (256, 128), (4, 128))
    bench("cumprod 7 doubling steps (256,128)", k_cumprod, (256, 128))


if __name__ == "__main__":
    main()
