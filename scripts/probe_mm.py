#!/usr/bin/env python
"""In-Pallas per-chunk op-rate microbench for the blend kernels.

v2: the first version fed only 8 of 256 sublanes back into the loop carry,
letting Mosaic dead-code-narrow the (256,128) computations ~32x and making
every pattern look ~10x too cheap. Every variant now carries its FULL
result so nothing can be eliminated. Run all variants in one session;
compare relatively."""

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


def bench(name, kernel, out_shape, *shapes):
    rng = np.random.default_rng(0)
    args = [jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32) for s in shapes]
    f = jax.jit(
        lambda *a: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
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
    print(f"{name:52s} {dt*1e6:8.3f} us/iter")
    return dt


def dep(x, acc):
    # full-rank loop dependency: every input element depends on the carry
    return x + acc[0:1, :] * 1e-20


def k_cumprod(x_ref, out_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1)

    def body(i, acc):
        v = dep(x_ref[...], acc)
        s = 1
        while s < 128:
            sh = pltpu.roll(v, s, axis=1)
            v = v * jnp.where(lane >= s, sh, 1.0)
            s *= 2
        return v

    out_ref[...] = jax.lax.fori_loop(0, N_IT, body, jnp.zeros((256, 128), jnp.float32))


def k_vpu9(x_ref, out_ref):
    def body(i, acc):
        v = dep(x_ref[...], acc)
        for _ in range(3):
            v = v * x_ref[...] + x_ref[...]
        return v * 1.0000001

    out_ref[...] = jax.lax.fori_loop(0, N_IT, body, jnp.zeros((256, 128), jnp.float32))


def k_exp(x_ref, out_ref):
    def body(i, acc):
        return jnp.exp(dep(x_ref[...], acc) * 1e-3)

    out_ref[...] = jax.lax.fori_loop(0, N_IT, body, jnp.zeros((256, 128), jnp.float32))


def k_div(x_ref, out_ref):
    def body(i, acc):
        return 1.0 / (1.5 + dep(x_ref[...], acc) * 1e-3)

    out_ref[...] = jax.lax.fori_loop(0, N_IT, body, jnp.zeros((256, 128), jnp.float32))


def k_cvpu(dpix_ref, feat_ref, x_ref, out_ref):
    def body(i, acc):
        d = dep(dpix_ref[...][:, 0:4], acc[:, 0:1] * 0 + acc) if False else dpix_ref[...]
        f = feat_ref[...] + jnp.sum(acc[0:1, :], axis=1, keepdims=True) * 1e-20
        c = (d[:, 0:1] * f[0:1, :] + d[:, 1:2] * f[1:2, :]
             + d[:, 2:3] * f[2:3, :] + d[:, 3:4] * f[3:4, :])
        return c

    out_ref[...] = jax.lax.fori_loop(0, N_IT, body, jnp.zeros((256, 128), jnp.float32))


def k_cmatmul(dpix_ref, feat_ref, out_ref):
    def body(i, acc):
        f = feat_ref[...] + jnp.sum(acc[0:1, :], axis=1, keepdims=True) * 1e-20
        return jax.lax.dot_general(
            dpix_ref[...], f, (((1,), (0,)), ((), ())),
            precision=H, preferred_element_type=jnp.float32)

    out_ref[...] = jax.lax.fori_loop(0, N_IT, body, jnp.zeros((256, 128), jnp.float32))


def k_two_matmuls(basis_ref, dpix_ref, x_ref, y_ref, out_ref):
    def body(i, acc):
        x = x_ref[...] + acc[0:1, :] * 1e-20
        mom = jax.lax.dot_general(
            basis_ref[...], x, (((0,), (0,)), ((), ())),
            precision=H, preferred_element_type=jnp.float32)  # (6,128)
        dfeat = jax.lax.dot_general(
            dpix_ref[...], y_ref[...], (((0,), (0,)), ((), ())),
            precision=H, preferred_element_type=jnp.float32)  # (4,128)
        return jnp.concatenate(
            [mom, dfeat, jnp.zeros((6, 128), jnp.float32)], axis=0)

    out_ref[...] = jax.lax.fori_loop(0, N_IT, body, jnp.zeros((16, 128), jnp.float32))


def k_merged(bd_ref, x_ref, y_ref, out_ref):
    def body(i, acc):
        x = x_ref[...] + acc[0:1, 0:128] * 1e-20
        rhs = jnp.concatenate([x, y_ref[...]], axis=1)  # (256,256)
        both = jax.lax.dot_general(
            bd_ref[...], rhs, (((0,), (0,)), ((), ())),
            precision=H, preferred_element_type=jnp.float32)  # (10,256)
        return jnp.pad(both, ((0, 6), (0, 0)))

    out_ref[...] = jax.lax.fori_loop(0, N_IT, body, jnp.zeros((16, 256), jnp.float32))


def k_fwd_accum(w_ref, feat_ref, out_ref):
    def body(i, acc):
        w = w_ref[...] + acc[:, 0:1] * 1e-20
        a = jax.lax.dot_general(
            w, feat_ref[...], (((1,), (1,)), ((), ())),
            precision=H, preferred_element_type=jnp.float32)  # (256,4)
        return jnp.pad(a, ((0, 0), (0, 124)))

    out_ref[...] = jax.lax.fori_loop(0, N_IT, body, jnp.zeros((256, 128), jnp.float32))


def make_kappa(kappa):
    def k(basis_ref, q_ref, out_ref):
        def body(i, acc):
            q = q_ref[...] + acc[0:1, :] * 1e-20
            p = jax.lax.dot_general(
                basis_ref[...], q, (((1,), (0,)), ((), ())),
                precision=H, preferred_element_type=jnp.float32)  # (256,128k)
            return p

        out_ref[...] = jax.lax.fori_loop(
            0, N_IT, body, jnp.zeros((256, 128 * kappa), jnp.float32)
        )

    return k


def main():
    print(f"backend: {jax.default_backend()}")
    t9 = bench("9 VPU mul/add ops (256,128)", k_vpu9, (256, 128), (256, 128))
    print(f"  -> per-op cost {t9/9*1e9:.1f} ns")
    bench("cumprod 7 doubling steps (21 ops)", k_cumprod, (256, 128), (256, 128))
    bench("exp (256,128)", k_exp, (256, 128), (256, 128))
    bench("divide (256,128)", k_div, (256, 128), (256, 128))
    bench("c: 7 VPU broadcast ops", k_cvpu, (256, 128), (256, 4), (4, 128), (1, 1))
    bench("c: K=4 HIGHEST matmul", k_cmatmul, (256, 128), (256, 4), (4, 128))
    bench("two HIGHEST matmuls (6+4 x 256-deep)", k_two_matmuls, (16, 128),
          (256, 6), (256, 4), (256, 128), (256, 128))
    bench("ONE merged (10,256)@(256,256)", k_merged, (16, 256),
          (256, 10), (256, 128), (256, 128))
    bench("fwd accum (256,128)@(128,4)", k_fwd_accum, (256, 128),
          (256, 128), (4, 128))
    for kappa in (1, 2, 4):
        t = bench(f"power matmul (256,8)@(8,128*{kappa}) HIGHEST",
                  make_kappa(kappa), (256, 128 * kappa), (256, 8), (8, 128 * kappa))
        print(f"  -> per-chunk {t/kappa*1e6:.3f} us (replaces ~9 VPU ops = {t9*1e6:.3f})")


if __name__ == "__main__":
    main()
