"""Round-3 perf experiments, part 56: 2-windows-per-step run-reduce A/B.

tpu_experiments55.py put the fullscale run-reduce at ~3.0 ms of the
~8.8 ms voxel stage (sort 4.6 is near the pure-sort floor).  The 1-row
kernel walks N/W = 512 sequential grid steps with a [4, W] channel stack
(half the VPU sublanes idle).  `_kernel2w` pairs windows (2i, 2i+1) per
step — [8, W] stack, 256 steps, identical per-window arithmetic (window
b's carry-in is window a's adjusted last row, the exact value the
sequential chain forwards), so outputs must be bitwise equal.

This script, on hardware:
  1. bitwise-compares 2w vs 1w vs the XLA fallback on the authentic
     fullscale window's sorted arrays (exact equality, checked on host);
  2. times the isolated run-reduce (chained 1-vs-4 marginals) 2w vs 1w;
  3. times the full voxel stage 2w vs 1w.
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
from pointcloud_obstacle_processing_tpu.ops import pallas_runreduce as prr
from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
from pointcloud_obstacle_processing_tpu.ops.pallas_runreduce import (
    sorted_run_reduce,
)
from pointcloud_obstacle_processing_tpu.ops.voxel import _pack_spec, voxel_downsample
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


def sorted_arrays(cloud):
    """The voxel stage's sorted key/payload arrays for the window."""
    imin, dims = _pack_spec(BOUNDS, LEAF)
    K = dims[0] * dims[1] * dims[2]

    @jax.jit
    def prep(c):
        seed = crop_and_seed(c, cfg)
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
        return lax.sort((packed, pxy, qz), num_keys=1, is_stable=True)

    skey, spxy, spz = prep(cloud)
    return np.asarray(skey), np.asarray(spxy), np.asarray(spz), K


def scalarize(x):
    return jnp.sum(jnp.asarray(x).astype(jnp.float32))


def main():
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    print("probe ok", flush=True)
    cloud = build_window()
    skey, spxy, spz, K = sorted_arrays(cloud)
    quantum = LEAF / 65536.0
    skey_j, spxy_j, spz_j = map(jnp.asarray, (skey, spxy, spz))

    # --- 1. bitwise parity on hardware -----------------------------------
    outs = {}
    for mode in ("1w", "2w", "fallback"):
        prr.KERNEL2W_ENABLED = mode == "2w"

        @jax.jit
        def rr(k, a, b):
            return sorted_run_reduce(
                k, (a, b), K, cfg.max_voxels, quantum=quantum,
                use_pallas=(mode != "fallback"),
            )

        vals, num = rr(skey_j, spxy_j, spz_j)
        outs[mode] = (np.asarray(vals), int(num))
        del rr
    prr.KERNEL2W_ENABLED = True
    n1, n2, nf = outs["1w"][1], outs["2w"][1], outs["fallback"][1]
    print(f"num_runs: 1w={n1} 2w={n2} fallback={nf}", flush=True)
    kk = min(nf, cfg.max_voxels)
    eq12 = np.array_equal(outs["1w"][0][:kk], outs["2w"][0][:kk])
    eqf = np.array_equal(outs["2w"][0][:kk], outs["fallback"][0][:kk])
    print(f"bitwise 2w==1w: {eq12}   2w==fallback: {eqf}", flush=True)
    assert n1 == n2 == nf and eq12 and eqf

    # --- 2. isolated run-reduce marginals --------------------------------
    def time_reduce(mode):
        prr.KERNEL2W_ENABLED = mode == "2w"

        def once(k, a, b, carry):
            # float-path perturbation: 0.0*carry is NOT algebraically
            # foldable (carry could be nan/inf), so the reduce stays inside
            # the scan; an int32 0*carry WOULD be folded (CLAUDE.md).
            k2 = k + (0.0 * carry).astype(jnp.int32)
            vals, num = sorted_run_reduce(
                k2, (a, b), K, cfg.max_voxels, quantum=quantum,
                use_pallas=True,
            )
            return scalarize(vals) + num.astype(jnp.float32)

        def make(m):
            @jax.jit
            def run(k, a, b):
                def body(carry, _):
                    return once(k, a, b, carry), None

                out, _ = lax.scan(body, jnp.float32(0), None, length=m)
                return out

            return run

        f1, f4 = make(1), make(4)
        np.asarray(f1(skey_j, spxy_j, spz_j))
        np.asarray(f4(skey_j, spxy_j, spz_j))
        ms = []
        for _ in range(4):
            t0 = time.perf_counter(); np.asarray(f1(skey_j, spxy_j, spz_j))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); np.asarray(f4(skey_j, spxy_j, spz_j))
            t4 = time.perf_counter() - t0
            ms.append((t4 - t1) / 3.0)
        med = sorted(ms)[len(ms) // 2]
        print(f"isolated run-reduce [{mode}]: {med*1e3:6.2f} ms/window "
              f"(all {[f'{x*1e3:.2f}' for x in ms]})", flush=True)

    for mode in ("1w", "2w", "1w", "2w"):
        time_reduce(mode)

    # --- 3. full voxel stage marginals ------------------------------------
    def time_stage(mode):
        prr.KERNEL2W_ENABLED = mode == "2w"

        def stage(c, carry):
            seed = crop_and_seed(
                Cloud(points=c.points + 0.0 * carry, valid=c.valid), cfg
            )
            vox = voxel_downsample(
                seed.cloud, LEAF, cfg.max_voxels, BOUNDS,
                cfg.voxel_sum_precision, cfg.voxel_binning, cfg.voxel_order,
                cfg.voxel_payload_packing,
            )
            return scalarize(vox.cloud.points) + scalarize(vox.num_voxels)

        def make(m):
            @jax.jit
            def run(c):
                def body(carry, _):
                    return stage(c, carry), None

                out, _ = lax.scan(body, jnp.float32(0), None, length=m)
                return out

            return run

        f1, f4 = make(1), make(4)
        np.asarray(f1(cloud)); np.asarray(f4(cloud))
        ms = []
        for _ in range(4):
            t0 = time.perf_counter(); np.asarray(f1(cloud))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); np.asarray(f4(cloud))
            t4 = time.perf_counter() - t0
            ms.append((t4 - t1) / 3.0)
        med = sorted(ms)[len(ms) // 2]
        print(f"voxel stage (incl crop) [{mode}]: {med*1e3:6.2f} ms/window",
              flush=True)

    for mode in ("1w", "2w", "1w", "2w"):
        time_stage(mode)
    prr.KERNEL2W_ENABLED = True


if __name__ == "__main__":
    main()
