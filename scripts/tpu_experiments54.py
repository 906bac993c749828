"""Round-3 perf experiments, part 44: window-unlimited pointer jump in the
fullscale cluster loop.

tpu_experiments53: coarse-cell seeding and a block-sum frontier change
NOTHING (still 24 sweeps) — the convergence chain is the arena-spanning
noise component, whose root lies OUTSIDE most members' 4096-column
windows, so the banded kernel's fused jump (hit = lt == cols) never fires
for them; labels crawl toward the root one adjacency hop per sweep.

Candidate: one explicit full-array jump ``new = min(new, new[new])`` per
sweep — a [16384] serialized gather (~0.3 ms) with NO window limit, i.e.
real Shiloach-Vishkin pointer doubling.  Exact: labels[i] always names an
in-component point <= i, so label-of-label is too, and the update is
monotone non-increasing.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pointcloud_obstacle_processing_tpu.models import REFERENCE_FULLSCALE_CONFIG
from pointcloud_obstacle_processing_tpu.ops import cluster as cl

cfg = REFERENCE_FULLSCALE_CONFIG
CACHE = "/tmp/fullscale_comp_cloud.npz"


def chained_cloud(fn, m):
    def run(pts, valid):
        def body(carry, _):
            return fn(pts + 0.0 * carry, valid), None

        out, _ = lax.scan(body, jnp.float32(0), None, length=m)
        return out

    return jax.jit(run)


def time_marginal(f1, f4, args, rounds=3):
    outs = []
    for _ in range(rounds):
        ts1, ts4 = [], []
        for _ in range(2):
            t0 = time.perf_counter(); np.asarray(f1(*args))
            ts1.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); np.asarray(f4(*args))
            ts4.append(time.perf_counter() - t0)
        outs.append((min(ts4) - min(ts1)) / 3.0)
    return sorted(outs)[1]


def main():
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    print("probe ok", flush=True)
    z = np.load(CACHE)
    pts = jnp.asarray(z["pts"])
    valid = jnp.asarray(z["valid"])
    n = int(valid.shape[0])
    tol = float(cfg.euc_cluster_tolerance)
    tol2 = tol * tol
    window = cfg.cluster_band_window

    def preamble(p_in, v_in):
        denom = jnp.maximum(jnp.sum(v_in.astype(jnp.float32)), 1.0)
        center = jnp.sum(jnp.where(v_in[:, None], p_in, 0.0), axis=0) / denom
        p = jnp.where(v_in[:, None], p_in - center, 0.0)
        idx = lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
        prev = jnp.concatenate([p[:1], p[:-1]], axis=0)
        gap2 = jnp.sum((p - prev) * (p - prev), axis=-1)
        prev_valid = jnp.concatenate([jnp.zeros((1,), bool), v_in[:-1]])
        chain = v_in & prev_valid & (gap2 <= tol2 * (1.0 - 1e-6))
        head = v_in & ~chain
        run_head = jnp.where(head, idx, -1)
        d = 1
        while d < n:
            run_head = jnp.maximum(
                run_head,
                jnp.concatenate([jnp.full((d,), -1, run_head.dtype), run_head[:-d]]),
            )
            d *= 2
        labels0 = jnp.where(v_in, run_head, idx)
        starts, _ = cl._band_starts(p, v_in, 128, window, tol)
        return p, idx, labels0, starts

    def frontier_cumsum(starts, changed_vec):
        cs = jnp.cumsum(changed_vec.astype(jnp.int32))
        hi = cs[starts + (window - 1)]
        lo = jnp.where(starts > 0, cs[jnp.maximum(starts - 1, 0)], 0)
        return (hi - lo) > 0

    def make_loop(n_jumps):
        def run(p_in, v_in):
            p, idx, labels0, starts = preamble(p_in, v_in)
            band = (128, window, starts)

            def cond(state):
                labels, changed, it = state
                return jnp.any(changed) & (it < cfg.cluster_max_iters)

            def body(state):
                labels, changed, it = state
                tl = frontier_cumsum(starts, changed)
                nbr = cl._neighbor_min_sweep(
                    p, v_in, labels, tol2, 512, band=band, tile_live=tl
                )
                new = labels.at[labels].min(nbr)
                new = jnp.minimum(new, nbr)
                for _ in range(n_jumps):
                    new = jnp.minimum(new, new[new])
                return (new, new != labels, it + 1)

            return lax.while_loop(
                cond, body, (labels0, jnp.ones((n,), bool), jnp.int32(0))
            )

        return run

    def checker(loop):
        def run(p_in, v_in):
            labels, _, it = loop(p_in, v_in)
            idx = lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
            return it, jnp.sum(labels), jnp.sum(labels * ((idx * 40503) % 251))

        return jax.jit(run)

    def timed(loop):
        def run(p_in, v_in):
            labels, _, it = loop(p_in, v_in)
            return jnp.sum(labels.astype(jnp.float32)) + it.astype(jnp.float32)

        return run

    for name, loop in {
        "jump0 (base)": make_loop(0),
        "jump1": make_loop(1),
        "jump2": make_loop(2),
        "jump3": make_loop(3),
    }.items():
        it, c1, c2 = (int(np.asarray(v)) for v in checker(loop)(pts, valid))
        fn = timed(loop)
        f1 = chained_cloud(fn, 1)
        f4 = chained_cloud(fn, 4)
        np.asarray(f1(pts, valid)); np.asarray(f4(pts, valid))
        m = time_marginal(f1, f4, (pts, valid))
        print(f"{name:14s} {m*1e3:7.2f} ms/window  sweeps {it:2d}  "
              f"chk {c1} {c2}", flush=True)


if __name__ == "__main__":
    main()
