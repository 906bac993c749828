"""Round-3 perf experiments, part 17: e2e marginal checkpoint.

Authoritative full-pipeline chained marginal (the bench headline's core
number) after the run-reduce flush/group defaults + unstacked payloads,
with more timing iterations to beat the tunnel's ±2-3 ms/batch
program-to-program variance.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, flush=True)


def timed(fn, *args, iters=6):
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

    from pointcloud_obstacle_processing_tpu import Cloud
    from pointcloud_obstacle_processing_tpu.models import FLAGSHIP_CONFIG
    from pointcloud_obstacle_processing_tpu.pipeline import process_scan
    from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    log("probe ok")

    cfg = FLAGSHIP_CONFIG
    B = 32
    spec = SceneSpec(n_ground=90_000, n_rocks=4, points_per_rock=2_000, n_noise=500)
    pts = np.zeros((B, cfg.max_points, 3), np.float32)
    valid = np.zeros((B, cfg.max_points), bool)
    scenes = [make_scene(seed=i, spec=spec).points[: cfg.max_points] for i in range(8)]
    for i in range(B):
        p = scenes[i % 8]
        pts[i, : len(p)] = p
        valid[i, : len(p)] = True
    clouds = Cloud(points=jnp.asarray(pts), valid=jnp.asarray(valid))
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    def scan_scalar(c, k):
        r = jax.vmap(lambda c1, k1: process_scan(c1, k1, cfg))(c, k)
        return (
            jnp.sum(r.grid.data.astype(jnp.float32))
            + jnp.sum(r.centroids.points.xyzr)
            + r.stats.num_clusters.sum().astype(jnp.float32)
        )

    def chained(m):
        def run(c, k):
            def body(carry, _):
                cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
                return scan_scalar(cc, k), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    fa, fb = chained(1), chained(4)
    ta, tb = timed(fa, clouds, keys), timed(fb, clouds, keys)
    ta2, tb2 = timed(fa, clouds, keys), timed(fb, clouds, keys)
    ta, tb = min(ta, ta2), min(tb, tb2)
    m = (tb - ta) / 3.0
    log(f"e2e marginal: {m*1e3:.2f} ms/batch ({m/B*1e3:.3f} ms/scan, "
        f"{B/m:.1f} scans/s)  [pre-change cum: 50.38 / 635 scans-equiv; "
        f"bench r3 headline: 48.27 / 662.9]")


if __name__ == "__main__":
    main()
