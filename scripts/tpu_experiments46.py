"""Round-3 perf experiments, part 37: one-hot segment-min cluster hook, A/B.

Hypothesis: the cluster stage's 3.24 ms/batch in-context cost (prefix-6
marginal, tpu_experiments42) is dominated not by the Pallas sweep but by
the per-sweep SCATTER-MIN hook (`labels.at[labels].min(nbr_min)`) plus the
one-time size scatter: XLA scatters serialize at ~20+ cycles/element
(CLAUDE.md), ~0.75 ms/batch per [32, 1024] scatter, and the loop runs ~4
sweeps.  ops/cluster.py now computes both as fused one-hot [C, C]
compare+select+reductions when C <= ONEHOT_SEGMENT_MAX (bitwise-identical
int32 minima/counts).

A/B by toggling cluster.ONEHOT_SEGMENT_MAX (a trace-time Python gate)
between 0 (scatter, the old form) and 2048 (one-hot) on prefix-6
marginals, interleaved 3 rounds.
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

    from pointcloud_obstacle_processing_tpu.ops import cluster as cm

    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    print("probe ok", flush=True)

    progs = {}
    for name, bound in (("scatter", 0), ("onehot", 2048)):
        cm.ONEHOT_SEGMENT_MAX = bound
        f1 = pp.chained(pp.stage_prefix(6), 1)
        f4 = pp.chained(pp.stage_prefix(6), 4)
        v = float(np.asarray(f1(pp.clouds, pp.keys)))
        np.asarray(f4(pp.clouds, pp.keys))
        progs[name] = (f1, f4)
        print(f"compiled {name}  scalar={v:.6e}", flush=True)
    cm.ONEHOT_SEGMENT_MAX = 2048

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
