"""Round-3 perf experiments, part 55: fullscale VOXEL stage dissection.

The fullscale stage table (tpu_experiments50.py, re-measured after the
pointer-jump + fused-compact work) puts voxel at ~8.8 ms of the ~27 ms
window.  This script splits the stage into its sub-steps with the chained
1-vs-4 marginal protocol, all prefixes including the crop so the marginal
deltas are the in-context sub-step costs:

  q0 crop+seed only                       (baseline)
  q1 + key pack / corner offsets / 16-bit payload pack
  q2 + stable 1-key+2-payload sort        (the suspected wall)
  q3 + fused sorted_run_reduce kernel
  q4 + slot decode tail (= full voxel_downsample)

Also A/Bs the pure sort at [2M] rows: 3-column (key,pxy,qz) vs 2-column
(key,pxy) vs 1-column (key) to bound what any payload re-packing could
ever buy.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pointcloud_obstacle_processing_tpu import Cloud
from pointcloud_obstacle_processing_tpu.models import REFERENCE_FULLSCALE_CONFIG
from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
from pointcloud_obstacle_processing_tpu.ops.pallas_runreduce import (
    sorted_run_reduce,
)
from pointcloud_obstacle_processing_tpu.ops.voxel import (
    _pack_spec,
    voxel_downsample,
)
from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

cfg = REFERENCE_FULLSCALE_CONFIG
BOUNDS = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
LEAF = cfg.downsample_leaf_size


def build_window():
    fspec = SceneSpec(
        n_ground=230_000, n_rocks=6, points_per_rock=3_000, n_noise=2_000
    )
    base = make_scene(seed=100, spec=fspec).points
    jit_rng = np.random.default_rng(7)
    parts = [
        base + jit_rng.normal(0, 0.003, base.shape).astype(np.float32)
        for _ in range(8)
    ]
    fpts = np.concatenate(parts)[: cfg.max_points]
    fcloud_np = np.zeros((cfg.max_points, 3), np.float32)
    fcloud_np[: len(fpts)] = fpts
    fvalid = np.zeros(cfg.max_points, bool)
    fvalid[: len(fpts)] = True
    return Cloud(points=jnp.asarray(fcloud_np), valid=jnp.asarray(fvalid))


def scalarize(x):
    return jnp.sum(jnp.asarray(x).astype(jnp.float32))


def sub_prefix(k):
    imin, dims = _pack_spec(BOUNDS, LEAF)
    K = dims[0] * dims[1] * dims[2]
    quantum = LEAF / 65536.0

    def run(cloud):
        seed = crop_and_seed(cloud, cfg)
        if k == 0:
            return scalarize(seed.hole_grid) + scalarize(seed.cloud.points)
        if k == 4:
            vox = voxel_downsample(
                seed.cloud, LEAF, cfg.max_voxels, BOUNDS,
                cfg.voxel_sum_precision, cfg.voxel_binning, cfg.voxel_order,
                cfg.voxel_payload_packing,
            )
            return scalarize(vox.cloud.points) + scalarize(vox.num_voxels)
        pts, valid = seed.cloud.points, seed.cloud.valid
        valid = valid & jnp.all(jnp.isfinite(pts), axis=-1)
        ijk = jnp.floor(pts / jnp.float32(LEAF)).astype(jnp.int32)
        ix = jnp.clip(ijk[:, 0] - imin[0], 0, dims[0] - 1)
        iy = jnp.clip(ijk[:, 1] - imin[1], 0, dims[1] - 1)
        iz = jnp.clip(ijk[:, 2] - imin[2], 0, dims[2] - 1)
        packed = jnp.where(valid, (ix * dims[1] + iy) * dims[2] + iz, K)
        corner0 = (
            jnp.stack([ix + imin[0], iy + imin[1], iz + imin[2]], axis=0)
            .astype(jnp.float32) * jnp.float32(LEAF)
        )
        off0 = jnp.where(valid[None, :], pts.T - corner0, 0.0)
        q = jnp.float32(65536.0 / LEAF)
        qx = jnp.clip((off0[0] * q).astype(jnp.int32), 0, 65535)
        qy = jnp.clip((off0[1] * q).astype(jnp.int32), 0, 65535)
        qz = jnp.clip((off0[2] * q).astype(jnp.int32), 0, 65535)
        pxy = lax.shift_left(qx, 16) | qy
        if k == 1:
            return scalarize(packed) + scalarize(pxy) + scalarize(qz)
        skey, spxy, spz = lax.sort((packed, pxy, qz), num_keys=1, is_stable=True)
        if k == 2:
            return scalarize(skey) + scalarize(spxy) + scalarize(spz)
        slot_vals, num = sorted_run_reduce(
            skey, (spxy, spz), K, cfg.max_voxels, quantum=quantum
        )
        return scalarize(slot_vals) + scalarize(num)

    return run


def chained(fn, m):
    def run(c):
        def body(carry, _):
            cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
            return fn(cc), None

        out, _ = lax.scan(body, jnp.float32(0), None, length=m)
        return out

    return jax.jit(run)


def sort_ab(cloud):
    """Pure-sort A/B: how much do the payload columns cost at 2M rows?"""
    imin, dims = _pack_spec(BOUNDS, LEAF)
    K = dims[0] * dims[1] * dims[2]

    def prep(c):
        pts, valid = c.points, c.valid
        ijk = jnp.floor(pts / jnp.float32(LEAF)).astype(jnp.int32)
        ix = jnp.clip(ijk[:, 0] - imin[0], 0, dims[0] - 1)
        iy = jnp.clip(ijk[:, 1] - imin[1], 0, dims[1] - 1)
        iz = jnp.clip(ijk[:, 2] - imin[2], 0, dims[2] - 1)
        packed = jnp.where(valid, (ix * dims[1] + iy) * dims[2] + iz, K)
        return packed, ix, iy

    def make(ncols):
        def run(c):
            packed, ix, iy = prep(c)
            if ncols == 1:
                (s,) = lax.sort((packed,), num_keys=1, is_stable=True)
                return scalarize(s)
            if ncols == 2:
                s, a = lax.sort((packed, ix), num_keys=1, is_stable=True)
                return scalarize(s) + scalarize(a)
            s, a, b = lax.sort((packed, ix, iy), num_keys=1, is_stable=True)
            return scalarize(s) + scalarize(a) + scalarize(b)

        return run

    for ncols in (1, 2, 3):
        f1, f4 = chained(make(ncols), 1), chained(make(ncols), 4)
        np.asarray(f1(cloud)); np.asarray(f4(cloud))
        ts1, ts4 = [], []
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(f1(cloud))
            ts1.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); np.asarray(f4(cloud))
            ts4.append(time.perf_counter() - t0)
        m = (min(ts4) - min(ts1)) / 3.0
        print(f"pure sort {ncols} col(s): {m*1e3:7.2f} ms/window", flush=True)


def main():
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    print("probe ok", flush=True)
    cloud = build_window()

    progs = {}
    for k in range(5):
        f1, f4 = chained(sub_prefix(k), 1), chained(sub_prefix(k), 4)
        v = float(np.asarray(f1(cloud)))
        np.asarray(f4(cloud))
        progs[k] = (f1, f4)
        print(f"compiled q{k}: scalar={v:.6e}", flush=True)

    margs = {k: [] for k in progs}
    for rnd in range(3):
        for k, (f1, f4) in progs.items():
            ts1, ts4 = [], []
            for _ in range(2):
                t0 = time.perf_counter(); np.asarray(f1(cloud))
                ts1.append(time.perf_counter() - t0)
                t0 = time.perf_counter(); np.asarray(f4(cloud))
                ts4.append(time.perf_counter() - t0)
            marg = (min(ts4) - min(ts1)) / 3.0
            margs[k].append(marg)
            print(f"round {rnd} q{k}: {marg*1e3:7.2f} ms/window", flush=True)

    names = ["crop+seed", "+keys/offsets/pack", "+sort", "+run_reduce",
             "+decode tail (full)"]
    print("\nvoxel sub-stage table (median prefix marginals):", flush=True)
    prev = 0.0
    for k in range(5):
        med = sorted(margs[k])[1]
        print(f"  q{k} {names[k]:22s} prefix {med*1e3:7.2f} ms  "
              f"step {(med-prev)*1e3:7.2f} ms", flush=True)
        prev = med

    print("\npure-sort column A/B:", flush=True)
    sort_ab(cloud)


if __name__ == "__main__":
    main()
