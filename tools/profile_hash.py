#!/usr/bin/env python
"""Microbenchmark candidate per-ray hash functions on TPU.

Hypothesis: 32-bit integer multiply is emulated on the TPU VPU, so
multiply-heavy hashes (pcg4d) pay ~10x per op vs add/xor/shift (ARX).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 512 * 512
REPS = 50


def sync(x):
    np.asarray(jnp.sum(x))


def timeit(fn, *args):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / REPS * 1000.0


def rotl(x, r):
    return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))


def chacha_qr(a, b, c, d):
    a = a + b; d = d ^ a; d = rotl(d, 16)
    c = c + d; b = b ^ c; b = rotl(b, 12)
    a = a + b; d = d ^ a; d = rotl(d, 8)
    c = c + d; b = b ^ c; b = rotl(b, 7)
    return a, b, c, d


def main():
    pid = jnp.arange(N, dtype=jnp.uint32)

    from raytracingthenextweekcuda_tpu.ops.rng import pcg4d, to_uniform

    @jax.jit
    def f_pcg(pid):
        a, b, c, d = pcg4d(pid, pid ^ jnp.uint32(123), pid + jnp.uint32(7),
                           jnp.full_like(pid, 99))
        return to_uniform(a) + to_uniform(b) + to_uniform(c) + to_uniform(d)

    @jax.jit
    def f_chacha2(pid):
        a, b, c, d = (pid, pid ^ jnp.uint32(123), pid + jnp.uint32(7),
                      jnp.full_like(pid, 99))
        a, b, c, d = chacha_qr(a, b, c, d)
        a, b, c, d = chacha_qr(a, b, c, d)
        return to_uniform(a) + to_uniform(b) + to_uniform(c) + to_uniform(d)

    @jax.jit
    def f_chacha4(pid):
        a, b, c, d = (pid, pid ^ jnp.uint32(123), pid + jnp.uint32(7),
                      jnp.full_like(pid, 99))
        for _ in range(4):
            a, b, c, d = chacha_qr(a, b, c, d)
        return to_uniform(a) + to_uniform(b) + to_uniform(c) + to_uniform(d)

    @jax.jit
    def f_imul(pid):
        # 16 bare int multiplies — isolates the mul cost.
        x = pid
        for _ in range(16):
            x = x * jnp.uint32(1664525)
        return x

    @jax.jit
    def f_iadd(pid):
        x = pid
        for _ in range(16):
            x = x + jnp.uint32(1664525)
        return x

    @jax.jit
    def f_threefry_u4(pid):
        key = jax.random.key(0)
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(pid)
        return jax.vmap(lambda k: jax.random.uniform(k, (4,)))(keys)

    for name, fn in [
        ("pcg4d (16 imul)", f_pcg),
        ("chacha 2 qr (ARX)", f_chacha2),
        ("chacha 4 qr (ARX)", f_chacha4),
        ("16x int mul", f_imul),
        ("16x int add", f_iadd),
        ("threefry fold+u4", f_threefry_u4),
    ]:
        print(f"{name:22s} {timeit(fn, pid):8.4f} ms")


if __name__ == "__main__":
    main()
