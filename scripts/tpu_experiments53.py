"""Round-3 perf experiments, part 43: cut the fullscale cluster loop's
24-sweep convergence and its per-sweep fixed overhead.

tpu_experiments52 measured the 7.16 ms fullscale cluster stage as
24 sweeps x ~0.29 ms: sweep kernel 0.185 + hook scatter 0.134 + ~0.1 of
frontier bookkeeping that persists even on late, mostly-skipped sweeps
(the [16384] jnp.cumsum).  Two candidate fixes, both output-exact:

1. BLOCK-SUM FRONTIER: starts are 128-aligned and window % 128 == 0, so
   the per-tile window change count equals a sum of 128-wide block sums —
   a [nb, 128] reshape-sum + nb-element prefix instead of a full-length
   cumsum.
2. COARSE-CELL SEEDING: any labels0[i] = (index of an in-component point
   <= i) converges to the same fixpoint.  Points in the same cubic cell
   of side tol/sqrt(3)*(1-1e-4) are provably within tolerance (diagonal
   < tol*(1-1e-6), under the chain-seed margin), so seeding each point
   with its cell's min index merges whole rocks across lattice slabs
   before the first sweep — the run graph the sweeps must contract drops
   from ~diameter-33 chains to a handful of cells.  One-time cost: one
   scatter-min + one gather over a dense coarse table.
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

    def coarse_seed(p, v_in, idx):
        # cells over the CENTERED coordinates; diagonal < tol*(1-1e-6)
        s = tol / np.sqrt(3.0) * (1.0 - 1e-4)
        span = 8.0  # static bound on |centered coord| (arena is ~4.5 m)
        dims = int(np.ceil(2 * span / s)) + 1
        ix = jnp.clip(((p[:, 0] + span) / s).astype(jnp.int32), 0, dims - 1)
        iy = jnp.clip(((p[:, 1] + span) / s).astype(jnp.int32), 0, dims - 1)
        iz = jnp.clip(((p[:, 2] + span) / s).astype(jnp.int32), 0, dims - 1)
        key = (ix * dims + iy) * dims + iz
        K = dims * dims * dims
        key = jnp.where(v_in, key, K)
        mins = jnp.full((K + 1,), jnp.int32(n), jnp.int32).at[key].min(idx)
        seed = mins[key]
        return jnp.where(v_in, jnp.minimum(seed, idx), idx)

    def frontier_cumsum(starts, changed_vec):
        cs = jnp.cumsum(changed_vec.astype(jnp.int32))
        hi = cs[starts + (window - 1)]
        lo = jnp.where(starts > 0, cs[jnp.maximum(starts - 1, 0)], 0)
        return (hi - lo) > 0

    def frontier_blocksum(starts, changed_vec):
        nb = n // 128
        wb = window // 128
        blk = jnp.sum(changed_vec.reshape(nb, 128).astype(jnp.int32), axis=1)
        cs = jnp.cumsum(blk)
        sb = starts // 128
        hi = cs[sb + (wb - 1)]
        lo = jnp.where(sb > 0, cs[jnp.maximum(sb - 1, 0)], 0)
        return (hi - lo) > 0

    def make_loop(seed_mode, frontier):
        def run(p_in, v_in):
            p, idx, labels0, starts = preamble(p_in, v_in)
            if seed_mode == "coarse":
                labels0 = jnp.minimum(labels0, coarse_seed(p, v_in, idx))
            band = (128, window, starts)

            def cond(state):
                labels, changed, it = state
                return jnp.any(changed) & (it < cfg.cluster_max_iters)

            def body(state):
                labels, changed, it = state
                tl = frontier(starts, changed)
                nbr = cl._neighbor_min_sweep(
                    p, v_in, labels, tol2, 512, band=band, tile_live=tl
                )
                new = labels.at[labels].min(nbr)
                new = jnp.minimum(new, nbr)
                return (new, new != labels, it + 1)

            return lax.while_loop(
                cond, body, (labels0, jnp.ones((n,), bool), jnp.int32(0))
            )

        return run

    def checker(loop):
        def run(p_in, v_in):
            labels, _, it = loop(p_in, v_in)
            idx = lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
            chk1 = jnp.sum(labels)  # < 2^31 at n=16384
            chk2 = jnp.sum(labels * ((idx * 40503) % 251))  # wraps, det.
            return it, chk1, chk2

        return jax.jit(run)

    def timed(loop):
        def run(p_in, v_in):
            labels, _, it = loop(p_in, v_in)
            return jnp.sum(labels.astype(jnp.float32)) + it.astype(jnp.float32)

        return run

    variants = {
        "base_cumsum": make_loop("chain", frontier_cumsum),
        "blocksum": make_loop("chain", frontier_blocksum),
        "coarse_seed": make_loop("coarse", frontier_cumsum),
        "coarse+blocksum": make_loop("coarse", frontier_blocksum),
    }

    for name, loop in variants.items():
        it, c1, c2 = (int(np.asarray(v)) for v in checker(loop)(pts, valid))
        fn = timed(loop)
        f1 = chained_cloud(fn, 1)
        f4 = chained_cloud(fn, 4)
        np.asarray(f1(pts, valid)); np.asarray(f4(pts, valid))
        m = time_marginal(f1, f4, (pts, valid))
        print(f"{name:16s} {m*1e3:7.2f} ms/window  sweeps {it:2d}  "
              f"chk {c1} {c2}", flush=True)


if __name__ == "__main__":
    main()
