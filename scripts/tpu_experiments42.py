"""Round-3 perf experiments, part 33: channel-wise pipeline tails, measured.

After tpu_experiments41 localized REAL composition costs (stable across
interleaved rounds) to compact (+4.91), cluster (+3.62) and the
centroids/shadows/mark tail (+5.49) — all stages that are nearly free in
isolation — the hypothesized cause is the [N, 3] channel-minor point
stack: 2-D consumers (the compact gather, `all(isfinite(points), -1)`,
the outlier preamble's `pts - center` / `sum(p*p, -1)`) force XLA to
materialize/relayout the stack the voxel tail keeps fused as three [N]
channel vectors (the tpu_experiments38/39 finding, now applied to the
REST of the pipeline).

This script re-times prefixes 2, 3, 4, 5, 6, 9 with the channel-wise
rewrites in place (ops/compaction.py gather, ops/outliers.py preamble +
banded tiles, ops/occupancy.py mark isfinite), same interleaved 3-round
protocol as tpu_experiments41.  Reference medians BEFORE the change:

  p3=28.60  p4=30.16  p5=35.07  p6=38.69  p9=44.18
"""

from __future__ import annotations

import sys

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

    ks = [2, 3, 4, 5, 6, 9]
    progs = {}
    for k in ks:
        f1 = pp.chained(pp.stage_prefix(k), 1)
        f4 = pp.chained(pp.stage_prefix(k), 4)
        np.asarray(f1(pp.clouds, pp.keys))
        np.asarray(f4(pp.clouds, pp.keys))
        progs[k] = (f1, f4)
        print(f"compiled prefix {k}", flush=True)

    results = {k: [] for k in ks}
    for rnd in range(3):
        for k in ks:
            f1, f4 = progs[k]
            t1 = pp.timed(f1, pp.clouds, pp.keys)
            t4 = pp.timed(f4, pp.clouds, pp.keys)
            results[k].append((t4 - t1) / 3.0)
        print(
            f"round {rnd}: "
            + "  ".join(f"p{k}={results[k][-1]*1e3:6.2f}" for k in ks),
            flush=True,
        )

    med = {k: sorted(results[k])[1] for k in ks}
    print("medians (ms/batch): " + "  ".join(f"p{k}={med[k]*1e3:6.2f}" for k in ks))
    print(
        f"stage deltas: outlier={1e3*(med[3]-med[2]):.2f} "
        f"ransac={1e3*(med[4]-med[3]):.2f} "
        f"compact={1e3*(med[5]-med[4]):.2f} cluster={1e3*(med[6]-med[5]):.2f} "
        f"tail(7..9)={1e3*(med[9]-med[6]):.2f}"
    )


if __name__ == "__main__":
    main()
