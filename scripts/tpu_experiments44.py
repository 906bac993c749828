"""Round-3 perf experiments, part 35: kNN query-tile height under the
Pallas sortnet, in pipeline context.

Banded-window total work is N + 2*band*N/row_tile — LARGER query tiles do
strictly less total window columns (T=512 scores 40% fewer than T=256 at
band=512), and each row's candidate window at a larger T is a SUPERSET of
its window at a smaller T (row r in tile t covers [tT-band, tT+T+band)),
so fidelity is monotone non-degrading in T.  The round-3 rejected-list
entry that put 512 at 2.59 ms/scan vs 256's 1.31 was measured UNDER THE
XLA NETWORK (it materialized every comparator plane in HBM — VMEM-sized
tiles spilled); the Pallas kernel holds the planes resident, so the
tradeoff must be re-measured.

Times prefix-3 (crop+voxel+outlier) marginals at knn_row_tile in
{256, 384, 512, 768}, interleaved 3 rounds (the tpu_experiments41
protocol).  VMEM estimate per tile: planes [16, W/16, T] f32 = 4*W*T
bytes = 1.3 / 2.2 / 3.1 / 5.5 MB for T=256/384/512/768 (band 512).
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

    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    print("probe ok", flush=True)

    base = pp.cfg
    progs = {}
    vals = {}
    for T in (256, 384, 512, 768):
        pp.cfg = base.replace(knn_row_tile=T)
        f1 = pp.chained(pp.stage_prefix(3), 1)
        f4 = pp.chained(pp.stage_prefix(3), 4)
        vals[T] = float(np.asarray(f1(pp.clouds, pp.keys)))
        np.asarray(f4(pp.clouds, pp.keys))
        progs[f"T{T}"] = (f1, f4)
        print(f"compiled T={T}  scalar={vals[T]:.6e}", flush=True)
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
