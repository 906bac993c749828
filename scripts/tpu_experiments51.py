"""Round-3 perf experiments, part 42: is a 1-payload sort cheaper than 2?

Motivation: the flagship voxel stage's stable sort currently moves
1 key + 2 int32 payloads (16-bit-packed x|y and z offsets).  The packed
voxel key uses ~18 of 31 bits at the flagship lattice (204k keys), so a
13-bit z quantum (leaf/8192 ~ 4.9 um) could ride the KEY's low bits,
dropping the sort to 1 key + 1 payload and the run-reduce kernel to one
fewer streamed buffer.  Before building that (kernel contract change +
fallback + tests), measure the pure sort delta at the flagship shape —
if the 2-column -> 1-column sort saves nothing, the idea dies here.

Also A/B the batched sort at [32, 100352]:
  s3: 1 key + 2 payloads (current packed form)
  s2: 1 key + 1 payload (the z-in-key form's cost)
  s1: key only (lower bound)
Chained 3-vs-1 marginals, interleaved rounds.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B, N = 32, 100352
K = 204_000


def make_inputs():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, K, (B, N), dtype=np.int32)
    p1 = rng.integers(0, 2**31 - 1, (B, N), dtype=np.int32)
    p2 = rng.integers(0, 65536, (B, N), dtype=np.int32)
    return jnp.asarray(keys), jnp.asarray(p1), jnp.asarray(p2)


def chained(fn, m):
    def run(k, a, b):
        def body(carry, _):
            return fn(k + carry, a, b), None

        out, _ = lax.scan(body, jnp.int32(0), None, length=m)
        return out

    return jax.jit(run)


def s3(k, a, b):
    sk, sa, sb = lax.sort((k, a, b), num_keys=1, is_stable=True)
    return sk[:, ::997].sum() + sa[:, ::997].sum() + sb[:, ::997].sum()


def s2(k, a, b):
    # the z-in-key form: key' = key * 8192 + (b >> 3), one payload
    k2 = k * 8192 + lax.shift_right_logical(b, 3)
    sk, sa = lax.sort((k2, a), num_keys=1, is_stable=True)
    return sk[:, ::997].sum() + sa[:, ::997].sum()


def s1(k, a, b):
    sk = lax.sort(k, dimension=-1, is_stable=True)
    return sk[:, ::997].sum()


def main():
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    print("probe ok", flush=True)
    k, a, b = make_inputs()

    progs = {}
    for name, fn in (("s3_2payload", s3), ("s2_1payload", s2), ("s1_keyonly", s1)):
        f1, f4 = chained(fn, 1), chained(fn, 4)
        v = int(np.asarray(f1(k, a, b)))
        np.asarray(f4(k, a, b))
        progs[name] = (f1, f4)
        print(f"compiled {name}: {v}", flush=True)

    for rnd in range(3):
        for name, (f1, f4) in progs.items():
            ts1, ts4 = [], []
            for _ in range(2):
                t0 = time.perf_counter(); np.asarray(f1(k, a, b))
                ts1.append(time.perf_counter() - t0)
                t0 = time.perf_counter(); np.asarray(f4(k, a, b))
                ts4.append(time.perf_counter() - t0)
            marg = (min(ts4) - min(ts1)) / 3.0
            print(f"round {rnd} {name}: {marg*1e3:7.2f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
