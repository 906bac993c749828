"""Round-3 perf experiments, part 19: find the composition gap in the HLO.

The composed voxel stage measures ~20 ms/batch while its parts (sort 4.5
+ reduce-in-context 8.7 + prologue 0.1 + decode ~0.3) sum to ~13.6; the
full pipeline likewise carries ~6 ms of unattributed "glue".  Dump the
optimized HLO of (a) the composed voxel stage and (b) the full pipeline,
and inventory fusion-boundary copies / big intermediate materializations
by shape.
"""

from __future__ import annotations

import re
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pointcloud_obstacle_processing_tpu import Cloud
    from pointcloud_obstacle_processing_tpu.models import FLAGSHIP_CONFIG
    from pointcloud_obstacle_processing_tpu.pipeline import process_scan
    from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample

    cfg = FLAGSHIP_CONFIG
    B = 32
    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))

    clouds = Cloud(
        points=jnp.zeros((B, cfg.max_points, 3), jnp.float32),
        valid=jnp.zeros((B, cfg.max_points), bool),
    )
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    def vox_scalar(c):
        r = jax.vmap(
            lambda c1: voxel_downsample(
                c1, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
                cfg.voxel_sum_precision, cfg.voxel_binning, cfg.voxel_order,
            )
        )(c)
        return jnp.sum(r.cloud.points) + jnp.sum(r.num_voxels).astype(jnp.float32)

    def pipe_scalar(c, k):
        r = jax.vmap(lambda c1, k1: process_scan(c1, k1, cfg))(c, k)
        return jnp.sum(r.grid.data.astype(jnp.float32)) + jnp.sum(
            r.centroids.points.xyzr
        )

    def inventory(name, hlo: str):
        log(f"===== {name}: {len(hlo.splitlines())} HLO lines")
        # count copies / transposes / big buffers
        pat = re.compile(r"(\w[\w.-]*) = (\S+)\[([\d,]*)\][^=]*? (copy|transpose|"
                         r"dynamic-update-slice|scatter|gather|sort|custom-call)\(")
        big = Counter()
        for m in pat.finditer(hlo):
            dtype_shape = f"{m.group(2)}[{m.group(3)}]"
            dims = [int(x) for x in m.group(3).split(",") if x]
            elems = int(np.prod(dims)) if dims else 1
            if elems >= 1 << 20:
                big[f"{m.group(4)} {dtype_shape}"] += 1
        for k, v in big.most_common(25):
            log(f"  {v:3d} x {k}")

    for name, fn, args in [
        ("voxel stage", vox_scalar, (clouds,)),
        ("full pipeline", pipe_scalar, (clouds, keys)),
    ]:
        compiled = jax.jit(fn).lower(*args).compile()
        txt = compiled.as_text()
        with open(f"/tmp/hlo_{name.split()[0]}.txt", "w") as f:
            f.write(txt)
        inventory(name, txt)
        # memory analysis if available
        try:
            ma = compiled.memory_analysis()
            log(f"  temp_size={ma.temp_size_in_bytes/1e6:.1f}MB "
                f"output={ma.output_size_in_bytes/1e6:.1f}MB")
        except Exception as e:  # noqa: BLE001
            log(f"  (memory analysis unavailable: {e})")


if __name__ == "__main__":
    main()
