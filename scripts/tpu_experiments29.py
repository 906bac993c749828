"""Round-3 perf experiments, part 20: decode/finalize A/B, drift-cancelled.

Program-to-program chained marginals vary +-3-5 ms/batch through the
tunnel, so stage-level before/after comparisons across runs are mush.
Time the voxel slot DECODE (divmod -> keys/sums) and FINALIZE (centroid
divide) in isolation, old vs new implementations INTERLEAVED in one
process (A/B/A/B), on the exact [32, 24576] slot shapes.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, flush=True)


def timed(fn, *args, iters=5):
    import jax

    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pointcloud_obstacle_processing_tpu.ops.intmath import exact_divmod

    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    log("probe ok")

    B, cap = 32, 24576
    dims = (221, 119, 160)  # flagship-like lattice
    K = dims[0] * dims[1] * dims[2]
    rng = np.random.default_rng(0)
    slot_key = jnp.asarray(rng.integers(0, K, (B, cap)).astype(np.int32))
    counts = jnp.asarray(rng.integers(1, 60, (B, cap)).astype(np.float32))
    sums = jnp.asarray(rng.standard_normal((B, cap, 3)).astype(np.float32))

    def chain(fn, m):
        def run(k, c, s):
            def body(carry, _):
                kk = k + (carry * 0.0).astype(jnp.int32)
                return fn(kk, c + 0.0 * carry, s), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    def marg(fn):
        fa, fb = chain(fn, 1), chain(fn, 8)
        ta = timed(fa, slot_key, counts, sums)
        tb = timed(fb, slot_key, counts, sums)
        return (tb - ta) / 7.0

    def decode_old(k, c, s):
        lx = k // (dims[1] * dims[2])
        lrem = k % (dims[1] * dims[2])
        ly = lrem // dims[2]
        lz = lrem % dims[2]
        corner = jnp.stack([lx, ly, lz], axis=-1).astype(jnp.float32) * 0.04
        out = s + corner * c[..., None]
        return jnp.sum(out) + jnp.sum(lz).astype(jnp.float32)

    def decode_new(k, c, s):
        lx, lrem = exact_divmod(k, dims[1] * dims[2])
        ly, lz = exact_divmod(lrem, dims[2])
        corner = jnp.stack([lx, ly, lz], axis=-1).astype(jnp.float32) * 0.04
        out = s + corner * c[..., None]
        return jnp.sum(out) + jnp.sum(lz).astype(jnp.float32)

    def fin_old(k, c, s):
        cent = s / jnp.maximum(c, 1.0)[..., None]
        return jnp.sum(cent) + jnp.sum(k).astype(jnp.float32)

    def fin_new(k, c, s):
        inv = 1.0 / jnp.maximum(c, 1.0)
        cent = s * inv[..., None]
        return jnp.sum(cent) + jnp.sum(k).astype(jnp.float32)

    # correctness first
    q_o, r_o = slot_key // dims[2], slot_key % dims[2]
    q_n, r_n = exact_divmod(slot_key, dims[2])
    assert np.array_equal(np.asarray(q_o), np.asarray(q_n))
    assert np.array_equal(np.asarray(r_o), np.asarray(r_n))
    log("divmod exact on device: ok")

    for rep in range(2):
        for name, fn in [
            ("decode_old", decode_old), ("decode_new", decode_new),
            ("fin_old", fin_old), ("fin_new", fin_new),
        ]:
            t = marg(fn)
            log(f"[{rep}] {name}: {t*1e3:.3f} ms/batch")


if __name__ == "__main__":
    main()
