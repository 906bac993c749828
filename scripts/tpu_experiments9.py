"""TPU micro-experiments, round 9: can anything beat the N*K binning dot?

Round 7 established voxel binning is MXU-FLOP-bound: 4 channels x N x K
one-hot MACs ~ 45 ms/batch-of-32 at N=131072, K=229824.  Candidates:

* sort-based segment reduce (K-independent): measure batched multi-operand
  lax.sort cost at the flagship and fullscale shapes;
* int8 / fp8 one-hot dots (2x MXU rate on v5e if XLA emits them);
* capacity sensitivity (MACs scale with N).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import numpy as np


def log(*a):
    print(*a, flush=True)


NULL = [0.0]


def timed(fn, *args, iters=5, label=""):
    import jax

    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    log(f"  {label:<56s} {t*1e3:9.2f} ms  (true ~{t*1e3-NULL[0]:8.2f})")
    return t


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
    small = jnp.ones((8, 8), jnp.float32)
    NULL[0] = timed(jax.jit(lambda s: jnp.sum(s)), small, iters=8, label="null (RPC)") * 1e3

    rng = np.random.default_rng(0)
    B, N, K = 32, 131072, 229824
    keys = jnp.asarray(rng.integers(0, K, (B, N)).astype(np.int32))
    pays = jnp.asarray(rng.standard_normal((B, 3, N)).astype(np.float32))

    # s1: batched 1-key sort with 3 payloads (flagship shape)
    def s1(k, p):
        out = lax.sort((k, p[:, 0], p[:, 1], p[:, 2]), dimension=1, num_keys=1)
        return out[0][:, ::1024].astype(jnp.float32).sum() + out[1][:, ::1024].sum()

    timed(jax.jit(s1), keys, pays, label=f"s1 lax.sort [B={B}, N={N}] 1key+3pay")

    # s2: key-only sort
    def s2(k):
        out = lax.sort((k,), dimension=1, num_keys=1)
        return out[0][:, ::1024].astype(jnp.float32).sum()

    timed(jax.jit(s2), keys, label="s2 lax.sort key only")

    # s3: fullscale single-row 2M sort, 1 key + 3 payloads
    N2 = 2 * 1024 * 1024
    k2 = jnp.asarray(rng.integers(0, 1 << 22, (1, N2)).astype(np.int32))
    p2 = jnp.asarray(rng.standard_normal((1, 3, N2)).astype(np.float32))
    timed(jax.jit(s1), k2, p2, iters=3, label=f"s3 lax.sort [1, {N2}] 1key+3pay")

    # d*: one-hot binning dot dtype probes at production shape
    A, Bc = 320, 719
    ids = jnp.asarray(rng.integers(0, A * Bc, (B, N)).astype(np.int32))
    w = jnp.asarray(rng.random((B, N)).astype(np.float32))

    def dot_probe(dtype_name):
        dt = dict(bf16=jnp.bfloat16, f8=None, i8=jnp.int8)[dtype_name]

        def f(ids, w):
            def one(ii, ww):
                cols_a = lax.broadcasted_iota(jnp.int32, (1, A), 1)
                cols_b = lax.broadcasted_iota(jnp.int32, (1, Bc), 1)
                if dtype_name == "f8":
                    hi = (ii[:, None] // Bc == cols_a).astype(jnp.float8_e4m3fn)
                    lo = (ii[:, None] % Bc == cols_b).astype(jnp.float8_e4m3fn)
                    whi = hi * ww[:, None].astype(jnp.float8_e4m3fn)
                elif dtype_name == "i8":
                    hi = (ii[:, None] // Bc == cols_a).astype(jnp.int8)
                    lo = (ii[:, None] % Bc == cols_b).astype(jnp.int8)
                    whi = hi  # int8 can't carry f32 weights; counts-style probe
                else:
                    hi = (ii[:, None] // Bc == cols_a).astype(jnp.bfloat16)
                    lo = (ii[:, None] % Bc == cols_b).astype(jnp.bfloat16)
                    whi = hi * ww[:, None].astype(jnp.bfloat16)
                acc = jnp.int32 if dtype_name == "i8" else jnp.float32
                out = lax.dot_general(
                    whi, lo, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=acc,
                )
                return out[::64, ::64].astype(jnp.float32).sum()

            return jnp.sum(jax.vmap(one)(ids, w))

        return f

    for name in ("bf16", "i8", "f8"):
        try:
            timed(
                jax.jit(dot_probe(name)), ids, w,
                label=f"d one-hot dot {name} [{A},{N}]x[{N},{Bc}] x32",
            )
        except Exception as e:
            log(f"  d {name}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
