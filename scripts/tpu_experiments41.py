"""Round-3 perf experiments, part 32: prefix-marginal noise + the
composition gap.

tpu_experiments40 measured compact at 0.05 ms/batch and mark_obstacles at
0.20 isolated, while the prefix profile attributed +5.30 and +3.71 to
them.  Either the prefix context genuinely charges them (fusion-boundary
effects like the round-3 RANSAC permutation discovery) or the
single-shot prefix marginals carry ±2-3 ms of tunnel noise.

This script times prefixes 3, 4, 5, 6 and 9 (outlier, +ransac, +compact,
+cluster, full) in THREE interleaved rounds (compile once, then measure
round-robin so drift hits every prefix equally) and prints each round
plus the median — enough to separate real composition costs from noise.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import importlib.util

spec = importlib.util.spec_from_file_location("pp", "scripts/profile_prefix.py")
pp = importlib.util.module_from_spec(spec)
# profile_prefix defines stage_prefix/chained/clouds/keys at module level;
# its main() only runs under __main__, so exec is safe


def main():
    sys.argv = [sys.argv[0]]
    spec.loader.exec_module(pp)

    import jax
    import jax.numpy as jnp

    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    print("probe ok", flush=True)

    ks = [3, 4, 5, 6, 9]
    progs = {}
    for k in ks:
        f1 = pp.chained(pp.stage_prefix(k), 1)
        f4 = pp.chained(pp.stage_prefix(k), 4)
        # compile + warm
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
            m = (t4 - t1) / 3.0
            results[k].append(m)
        print(
            f"round {rnd}: "
            + "  ".join(f"p{k}={results[k][-1]*1e3:6.2f}" for k in ks),
            flush=True,
        )

    med = {k: sorted(results[k])[1] for k in ks}
    print("medians (ms/batch): " + "  ".join(f"p{k}={med[k]*1e3:6.2f}" for k in ks))
    print(
        f"stage deltas: ransac={1e3*(med[4]-med[3]):.2f} "
        f"compact={1e3*(med[5]-med[4]):.2f} cluster={1e3*(med[6]-med[5]):.2f} "
        f"tail(7..9)={1e3*(med[9]-med[6]):.2f}"
    )


if __name__ == "__main__":
    main()
