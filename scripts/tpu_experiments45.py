"""Round-3 perf experiments, part 36: sortnet lane tile at T=384 + the
distance/selection split, in pipeline context.

tpu_experiments44 put knn_row_tile=384 ahead (26.22 ms/batch prefix-3 vs
256's 27.00) DESPITE the sortnet kernel's lane-tile rule degrading to
tc=128 there (384 % 256 != 0 -> three 128-lane grid steps).  Variants at
T=384, interleaved 3 rounds:

  A: shipped kernel (tc=128);
  B: tc=384 — one grid step, whole query tile as lanes
     (block [16, 88, 384] f32 = 2.2 MB VMEM);
  C: selection replaced by a plane min-reduction (distance tiles +
     [16, nc, T] materialization only) — the in-context distance floor,
     bounding what any better selection could save.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import importlib.util

spec = importlib.util.spec_from_file_location("pp", "scripts/profile_prefix.py")
pp = importlib.util.module_from_spec(spec)


def main():
    sys.argv = [sys.argv[0]]
    spec.loader.exec_module(pp)

    import jax
    import jax.numpy as jnp

    from pointcloud_obstacle_processing_tpu.ops import outliers as om

    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    print("probe ok", flush=True)

    base = pp.cfg
    pp.cfg = base.replace(knn_row_tile=384)
    orig = om._sortnet_mean_pallas

    def pallas_tc_full(d2p, k, big):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        _, nc, t = d2p.shape
        tc = t  # one grid step, whole tile as lanes

        def kernel(x_ref, o_ref):
            P = om._sortnet_comparators([x_ref[i] for i in range(16)], big, 0)
            for i in range(16):
                o_ref[i, :] = P[i][0]

        vals = pl.pallas_call(
            kernel,
            grid=(t // tc,),
            in_specs=[
                pl.BlockSpec((16, nc, tc), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((16, tc), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, t), jnp.float32),
        )(d2p)
        return om._sortnet_mean_from_sorted(vals, k, big)

    def distance_only(d2p, k, big):
        # min over planes+chunks: touches every d2 element once, no network
        return jnp.sqrt(jnp.min(jnp.minimum(d2p, big), axis=(0, 1)))

    progs = {}
    for name, fn in (("A_tc128", orig), ("B_tcfull", pallas_tc_full),
                     ("C_distonly", distance_only)):
        om._sortnet_mean_pallas = fn
        f1 = pp.chained(pp.stage_prefix(3), 1)
        f4 = pp.chained(pp.stage_prefix(3), 4)
        v = float(np.asarray(f1(pp.clouds, pp.keys)))
        np.asarray(f4(pp.clouds, pp.keys))
        progs[name] = (f1, f4)
        print(f"compiled {name}  scalar={v:.6e}", flush=True)
    om._sortnet_mean_pallas = orig
    pp.cfg = base

    def timed(fn):
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(fn(pp.clouds, pp.keys))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    meds = {k: [] for k in progs}
    for r in range(3):
        row = {}
        for k, (f1, f4) in progs.items():
            t1, t4 = timed(f1), timed(f4)
            if t4 <= t1:
                t1, t4 = timed(f1), timed(f4)
            row[k] = (t4 - t1) / 3.0 * 1e3
            meds[k].append(row[k])
        print("round %d: " % r + "  ".join(f"{k}={v:7.2f}" for k, v in row.items()),
              flush=True)
    med = {k: float(np.median(v)) for k, v in meds.items()}
    print("medians (ms/batch): " + "  ".join(f"{k}={v:7.2f}" for k, v in med.items()))


if __name__ == "__main__":
    main()
