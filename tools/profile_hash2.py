#!/usr/bin/env python
"""Marginal-cost microbenchmark: K hash iterations inside ONE jit, diff K."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 512 * 512
REPS = 20


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


from raytracingthenextweekcuda_tpu.ops.rng import pcg4d, to_uniform


def make(kind, k):
    @jax.jit
    def f(pid):
        def body(i, st):
            a, b, c, d = st
            if kind == "pcg":
                a, b, c, d = pcg4d(a + i.astype(jnp.uint32), b, c, d)
            elif kind == "chacha":
                a = a + i.astype(jnp.uint32)
                a, b, c, d = chacha_qr(a, b, c, d)
                a, b, c, d = chacha_qr(a, b, c, d)
            elif kind == "f32mad":
                fa = to_uniform(a)
                for _ in range(16):
                    fa = fa * 1.0001 + 0.3
                a = (fa * 16777216.0).astype(jnp.uint32)
            return (a, b, c, d)

        st = (pid, pid ^ jnp.uint32(123), pid + jnp.uint32(7),
              jnp.full_like(pid, 99))
        st = jax.lax.fori_loop(0, k, body, st)
        return st[0]

    return f


def main():
    pid = jnp.arange(N, dtype=jnp.uint32)
    for kind in ["pcg", "chacha", "f32mad"]:
        t2 = timeit(make(kind, 2), pid)
        t42 = timeit(make(kind, 42), pid)
        per = (t42 - t2) / 40
        print(f"{kind:8s}: k=2 {t2:7.4f} ms  k=42 {t42:7.4f} ms  "
              f"-> {per*1000:7.2f} us/iter ({N/per*1e-9:6.2f} G elem/s)")


if __name__ == "__main__":
    main()
