"""Round-3 perf experiments, part 34: channel-wise RANSAC, A/B on hardware.

The prefix marginals (tpu_experiments42, after the channel-wise pipeline
tails) still charge segment_planes 7.76 ms/batch in context vs ~2 ms
isolated.  Suspect: ransac_plane_once's [N, 3] consumers — the refine
scan's centroid / scatter-matrix / re-threshold ops and the hypothesis
scoring slices — materialize the channel-minor point stack (3 -> 128
lane padding, 32x bloat) once per while-loop iteration.

This script A/Bs the shipped segment_planes against a channel-wise
variant (same expression structure, per-channel [N] vectors; the 3x3
scatter matrix becomes nine explicit [N] mul-reductions instead of a
HIGHEST-precision [3,N]x[N,3] matmul) by monkeypatching
ops.ransac.ransac_plane_once and timing prefix-4 marginals interleaved
over 3 rounds (same protocol as tpu_experiments41/42).
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

import importlib.util

spec = importlib.util.spec_from_file_location("pp", "scripts/profile_prefix.py")
pp = importlib.util.module_from_spec(spec)


def make_channelwise(ransac_mod):
    import jax
    import jax.numpy as jnp
    from jax import lax

    PlaneOnceResult = ransac_mod.PlaneOnceResult
    _smallest_eigvec_3x3 = ransac_mod._smallest_eigvec_3x3
    Cloud = ransac_mod.Cloud

    def ransac_plane_once_cw(cloud, key, config, axis=(0.0, 0.0, 1.0)):
        pts = cloud.points
        valid = cloud.valid
        n = cloud.capacity
        K = config.ransac_hypotheses
        thresh = jnp.float32(config.plane_segment_dist_thresh)
        eps_angle = jnp.float32(config.eps_angle_radians)
        ax = jnp.asarray(axis, jnp.float32)

        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]

        idx = lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
        _, perm = lax.sort((~valid, idx), num_keys=1, is_stable=True)
        n_valid = jnp.sum(valid.astype(jnp.int32))

        u = jax.random.randint(key, (K, 3), 0, jnp.maximum(n_valid, 1))
        tri = perm[u]
        i0, i1, i2 = tri[:, 0], tri[:, 1], tri[:, 2]
        p0x, p0y, p0z = x[i0], y[i0], z[i0]
        p1x, p1y, p1z = x[i1], y[i1], z[i1]
        p2x, p2y, p2z = x[i2], y[i2], z[i2]

        ux_, uy_, uz_ = p1x - p0x, p1y - p0y, p1z - p0z
        vx_, vy_, vz_ = p2x - p0x, p2y - p0y, p2z - p0z
        nx = uy_ * vz_ - uz_ * vy_
        ny = uz_ * vx_ - ux_ * vz_
        nz = ux_ * vy_ - uy_ * vx_
        norms = jnp.sqrt(nx * nx + ny * ny + nz * nz)
        degenerate = norms < 1e-12
        inv = 1.0 / jnp.maximum(norms, 1e-20)
        nx, ny, nz = nx * inv, ny * inv, nz * inv
        ds = -(nx * p0x + ny * p0y + nz * p0z)

        cosang = jnp.clip(jnp.abs(nx * ax[0] + ny * ax[1] + nz * ax[2]), 0.0, 1.0)
        ang = jnp.arccos(cosang)
        axis_ok = ang <= eps_angle

        dists = jnp.abs(
            x[:, None] * nx[None, :]
            + y[:, None] * ny[None, :]
            + z[:, None] * nz[None, :]
            + ds[None, :]
        )
        inl = (dists < thresh) & valid[:, None]
        counts = jnp.sum(inl.astype(jnp.int32), axis=0)
        counts = jnp.where(axis_ok & ~degenerate & (n_valid >= 3), counts, -1)

        best = jnp.argmax(counts)
        found = counts[best] > 0
        normal = jnp.stack([nx[best], ny[best], nz[best]])
        d = ds[best]
        inliers = inl[:, best]

        def refine(carry, _):
            normal, d, inliers = carry
            w = inliers.astype(jnp.float32)
            n_inl = jnp.sum(w)
            cnt = jnp.maximum(n_inl, 3.0)
            cx = jnp.sum(x * w) / cnt
            cy = jnp.sum(y * w) / cnt
            cz = jnp.sum(z * w) / cnt
            dx, dy, dz = x - cx, y - cy, z - cz
            qx, qy, qz = dx * w, dy * w, dz * w
            cov = jnp.array(
                [
                    [jnp.sum(qx * dx), jnp.sum(qx * dy), jnp.sum(qx * dz)],
                    [jnp.sum(qy * dx), jnp.sum(qy * dy), jnp.sum(qy * dz)],
                    [jnp.sum(qz * dx), jnp.sum(qz * dy), jnp.sum(qz * dz)],
                ]
            )
            nrm = _smallest_eigvec_3x3(cov, normal)
            nrm = nrm * jnp.sign(jnp.sum(nrm * normal) + 1e-30)
            c3 = jnp.stack([cx, cy, cz])
            nd = -jnp.sum(nrm * c3)
            new_in = (
                jnp.abs(x * nrm[0] + y * nrm[1] + z * nrm[2] + nd) < thresh
            ) & valid
            ok = n_inl >= 3.0
            return (
                jnp.where(ok, nrm, normal),
                jnp.where(ok, nd, d),
                jnp.where(ok, new_in, inliers),
            ), None

        def do_refine(args):
            (carry, _) = lax.scan(refine, args, None, length=config.ransac_refine_iters)
            return carry

        normal, d, inliers = lax.cond(found, do_refine, lambda c: c, (normal, d, inliers))
        inliers = inliers & found
        return PlaneOnceResult(normal=normal, d=d, inliers=inliers, found=found)

    return ransac_plane_once_cw


def main():
    sys.argv = [sys.argv[0]]
    spec.loader.exec_module(pp)

    import jax
    import jax.numpy as jnp

    from pointcloud_obstacle_processing_tpu.ops import ransac as ransac_mod

    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    print("probe ok", flush=True)

    orig = ransac_mod.ransac_plane_once
    cw = make_channelwise(ransac_mod)

    # build both prefix-4 programs (old, new) + prefix-3 baseline
    progs = {}
    f1 = pp.chained(pp.stage_prefix(3), 1)
    f4 = pp.chained(pp.stage_prefix(3), 4)
    np.asarray(f1(pp.clouds, pp.keys)); np.asarray(f4(pp.clouds, pp.keys))
    progs["p3"] = (f1, f4)

    ransac_mod.ransac_plane_once = orig
    f1 = pp.chained(pp.stage_prefix(4), 1)
    f4 = pp.chained(pp.stage_prefix(4), 4)
    np.asarray(f1(pp.clouds, pp.keys)); np.asarray(f4(pp.clouds, pp.keys))
    progs["p4_old"] = (f1, f4)

    ransac_mod.ransac_plane_once = cw
    f1 = pp.chained(pp.stage_prefix(4), 1)
    f4 = pp.chained(pp.stage_prefix(4), 4)
    v_old = np.asarray(progs["p4_old"][0](pp.clouds, pp.keys))
    v_new = np.asarray(f1(pp.clouds, pp.keys))
    np.asarray(f4(pp.clouds, pp.keys))
    progs["p4_new"] = (f1, f4)
    ransac_mod.ransac_plane_once = orig
    print(f"prefix-4 scalar old={v_old:.6e} new={v_new:.6e} "
          f"rel={abs(v_old - v_new) / max(abs(v_old), 1e-30):.2e}", flush=True)

    import time

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
        print(
            f"round {r}: " + "  ".join(f"{k}={v:7.2f}" for k, v in row.items()),
            flush=True,
        )
    med = {k: float(np.median(v)) for k, v in meds.items()}
    print("medians (ms/batch): " + "  ".join(f"{k}={v:7.2f}" for k, v in med.items()))
    print(
        f"ransac marginal: old={med['p4_old'] - med['p3']:.2f} "
        f"new={med['p4_new'] - med['p3']:.2f} ms/batch",
        flush=True,
    )


if __name__ == "__main__":
    main()
