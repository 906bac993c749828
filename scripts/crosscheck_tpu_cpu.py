"""Cross-backend validation: the same scan through the TPU and CPU backends.

Catches TPU-specific numerical hazards (bf16 matmul defaults, approx top-k,
scatter semantics) at the whole-pipeline level.  Runs the pipeline in this
process (TPU by default under axon) and in a JAX_PLATFORMS-forced CPU
subprocess, then compares grids, stage counts, and centroids.

Usage: python scripts/crosscheck_tpu_cpu.py
"""

import json
import subprocess
import sys

sys.path.insert(0, ".")

import numpy as np

CHILD = r"""
import sys, json
sys.path.insert(0, ".")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from pointcloud_obstacle_processing_tpu import Cloud, REFERENCE_YAML_CONFIG
from pointcloud_obstacle_processing_tpu.pipeline import jit_pipeline
from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

cfg = REFERENCE_YAML_CONFIG.replace(
    max_points=32768, max_voxels=16384, cluster_capacity=2048,
    max_clusters=16, downsample_leaf_size=0.06,
    knn_backend="banded",  # the bench configuration's kNN path
)
scene = make_scene(seed=77, spec=SceneSpec(n_ground=20000, n_rocks=3, points_per_rock=1000, n_noise=100))
r = jit_pipeline(cfg)(Cloud.pad_to(scene.points, cfg.max_points), jax.random.PRNGKey(5))
out = {
    "grid": np.asarray(r.grid.data).tolist(),
    "counts": {k: int(getattr(r.stats, k)) for k in (
        "cropped_points", "voxel_points", "inlier_points", "nonplane_points",
        "num_planes", "num_clusters")},
    "centroids": np.asarray(r.points if False else r.centroids.points.xyzr)[
        np.asarray(r.centroids.valid)].tolist(),
}
print(json.dumps(out))
"""


def main():
    import jax

    from pointcloud_obstacle_processing_tpu import Cloud, REFERENCE_YAML_CONFIG
    from pointcloud_obstacle_processing_tpu.pipeline import jit_pipeline
    from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

    cfg = REFERENCE_YAML_CONFIG.replace(
        max_points=32768, max_voxels=16384, cluster_capacity=2048,
        max_clusters=16, downsample_leaf_size=0.06,
        knn_backend="banded",  # the bench configuration's kNN path
    )
    scene = make_scene(
        seed=77, spec=SceneSpec(n_ground=20000, n_rocks=3, points_per_rock=1000, n_noise=100)
    )
    r = jit_pipeline(cfg)(Cloud.pad_to(scene.points, cfg.max_points), jax.random.PRNGKey(5))
    here = {
        "grid": np.asarray(r.grid.data),
        "counts": {
            k: int(getattr(r.stats, k))
            for k in (
                "cropped_points", "voxel_points", "inlier_points",
                "nonplane_points", "num_planes", "num_clusters",
            )
        },
        "centroids": np.asarray(r.centroids.points.xyzr)[np.asarray(r.centroids.valid)],
    }
    print(f"this process backend: {jax.devices()[0].platform}", file=sys.stderr)

    proc = subprocess.run([sys.executable, "-c", CHILD], capture_output=True, text=True, timeout=1200)
    if proc.returncode != 0:
        print(proc.stderr[-2000:], file=sys.stderr)
        sys.exit(1)
    other = json.loads(proc.stdout.strip().splitlines()[-1])

    grid_o = np.asarray(other["grid"], np.int8)
    diff = np.mean(here["grid"] != grid_o)
    print(f"grid cells differing: {diff:.4%}")
    for k, v in here["counts"].items():
        print(f"{k}: tpu={v} cpu={other['counts'][k]} delta={v - other['counts'][k]}")
    c_here = here["centroids"]
    c_other = np.asarray(other["centroids"], np.float32).reshape(-1, 4)
    print(f"clusters: tpu={len(c_here)} cpu={len(c_other)}")
    if len(c_here) == len(c_other):
        for row in c_other:
            d = np.linalg.norm(c_here[:, :3] - row[:3], axis=1)
            j = int(np.argmin(d))
            print(f"  centroid match: dist={d[j]:.5f} radius delta={abs(c_here[j,3]-row[3]):.5f}")
    ok = diff < 0.01 and len(c_here) == len(c_other)
    print("CROSSCHECK:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 2)


if __name__ == "__main__":
    main()
