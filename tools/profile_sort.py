"""Measure lax.sort + cull/top-k costs on the TPU — sizing the pair-expansion
tile-major traversal design."""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

REPS = 10


def timeit(fn, *args, label=""):
    out = jax.jit(fn)(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])  # warm+sync
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = jax.jit(fn)(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        times.append(time.perf_counter() - t0)
    print(f"{label}: {min(times)*1000:.2f} ms")


def main():
    print("device:", jax.devices()[0])
    key = jax.random.key(0)

    def mk(n, ops):
        ks = jax.random.split(key, ops)
        ik = jax.random.randint(ks[0], (n,), 0, 1 << 30, jnp.int32)
        vals = [jax.random.normal(ks[i], (n,)) for i in range(1, ops)]
        return (ik, *vals)

    for n, ops in [(65536, 17), (262144, 17), (262144, 8), (524288, 8),
                   (1048576, 8), (2097152, 8), (2097152, 3), (2097152, 2)]:
        args = mk(n, ops)
        timeit(lambda *a: jax.lax.sort(a, num_keys=1), *args,
               label=f"sort n={n:>8} operands={ops}")

    # Cull: (N, L) slab test + top-K nearest by tn.
    for n, L, K in [(65536, 128, 8), (262144, 128, 8)]:
        o = jax.random.normal(key, (n, 3))
        d = jax.random.normal(key, (n, 3))
        lo = jax.random.normal(key, (L, 3))
        hi = lo + 0.5

        def cull(o, d, lo, hi):
            inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
            t0 = (lo[None] - o[:, None]) * inv[:, None]
            t1 = (hi[None] - o[:, None]) * inv[:, None]
            tn = jnp.minimum(t0, t1).max(-1)
            tf = jnp.maximum(t0, t1).min(-1)
            hit = (tf >= tn) & (tf > 1e-3)
            tn_m = jnp.where(hit, tn, jnp.inf)
            neg, idx = jax.lax.top_k(-tn_m, K)
            return idx, -neg

        timeit(cull, o, d, lo, hi, label=f"cull n={n:>8} L={L} top{K}")


if __name__ == "__main__":
    main()
