"""Benchmark driver: scans/sec/chip on the BASELINE.json configs.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
and a per-stage breakdown (the reference's timing-table equivalent,
obstacle_detection.cpp:913-925) on stderr.

Measurement notes (axon-tunneled TPU):
* ``block_until_ready`` is not a reliable fence and host transfers run
  ~50 MB/s, so every timed function reduces to a scalar on device and is
  synced by fetching that scalar.
* a single dispatch+fetch round-trip costs ~26 ms of tunnel RPC, which is
  NOT device time: steady-state throughput is measured by CHAINING M
  batches inside one jit (each iteration's input depends on the previous
  scalar, so XLA cannot parallelize or elide them) and dividing the
  marginal time by M — exactly what a pipelined production feed sees.
  Both the chained (steady-state) and single-dispatch numbers are
  reported; p50 device latency is likewise the marginal chained
  single-scan time, alongside the RPC-inclusive p50.

Two configurations are benchmarked:
* the flagship 100k-pt scan batch (BASELINE.json north-star shape,
  leaf 0.04), and
* the authentic reference workload (params.yaml:16 ``downsample_size:
  0.015`` at REFERENCE_FULLSCALE_CONFIG scale: a 2M-point accumulation
  window, 262144-voxel cap) — reported as window latency and
  frames/s (accumulate_count=200 frames per window, params.yaml:10).

The reference publishes no numbers (BASELINE.md) — ``vs_baseline`` is
measured against the BASELINE.json north-star target of 1000 full
scans/sec/chip on 100k-point clouds.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _timed(fn, *args, iters=5):
    """Min wall-clock of fn(*args) where fn returns a small array."""
    import jax

    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _stage_marginal(fn, cloud, *rest, iters=3):
    """Chained 4-vs-1 marginal of a scalar-returning stage fn(cloud, *rest):
    subtracts dispatch RPC exactly (the profilers' protocol) instead of a
    separately-measured null program, whose jitter can exceed a fast
    stage's whole cost (the round-3 cluster stage clamped to 0 that way).
    The float perturbation (+0.0*carry) forces a data dependency XLA
    cannot fold (CLAUDE.md)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pointcloud_obstacle_processing_tpu import Cloud

    def chain(m):
        def run(c, *r):
            def body(carry, _):
                cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
                return fn(cc, *r).astype(jnp.float32), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    t1 = _timed(chain(1), cloud, *rest, iters=iters)
    t4 = _timed(chain(4), cloud, *rest, iters=iters)
    # raw marginal: may be <= 0 when the stage cost is below tunnel jitter.
    # Callers must report that case as below-noise, NOT as zero cost
    # (VERDICT r4 weak #3).
    return (t4 - t1) / 3.0


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pointcloud_obstacle_processing_tpu import Cloud, REFERENCE_YAML_CONFIG
    from pointcloud_obstacle_processing_tpu.models import (
        FLAGSHIP_CONFIG,
        REFERENCE_FULLSCALE_CONFIG,
    )
    from pointcloud_obstacle_processing_tpu.ops.cluster import euclidean_cluster
    from pointcloud_obstacle_processing_tpu.ops.compaction import compact
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
    from pointcloud_obstacle_processing_tpu.ops.outliers import remove_statistical_outliers
    from pointcloud_obstacle_processing_tpu.ops.ransac import segment_planes
    from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample
    from pointcloud_obstacle_processing_tpu.pipeline import process_scan
    from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene
    from pointcloud_obstacle_processing_tpu.utils.timing import StageTimer

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    cfg = FLAGSHIP_CONFIG

    # ---- 100k-point scan batch --------------------------------------------
    B = 32
    spec = SceneSpec(n_ground=90_000, n_rocks=4, points_per_rock=2_000, n_noise=500)
    pts = np.zeros((B, cfg.max_points, 3), np.float32)
    valid = np.zeros((B, cfg.max_points), bool)
    n_pts = 0
    uniq = min(B, 8)  # 8 distinct scenes, tiled
    scenes = [make_scene(seed=i, spec=spec).points[: cfg.max_points] for i in range(uniq)]
    for i in range(B):
        p = scenes[i % uniq]
        pts[i, : len(p)] = p
        valid[i, : len(p)] = True
        n_pts += len(p)
    log(f"scan batch: {B} scans, avg {n_pts // B} pts/scan, capacity {cfg.max_points}")

    clouds = Cloud(points=jnp.asarray(pts), valid=jnp.asarray(valid))
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    pipe = jax.vmap(lambda c, k: process_scan(c, k, cfg))

    def batch_scalar(c, k):
        r = pipe(c, k)
        # tiny result: forces the whole pipeline, transfers ~4 bytes
        return (
            jnp.sum(r.grid.data.astype(jnp.int32)) + jnp.sum(r.clusters.num_clusters)
        ).astype(jnp.float32)

    def chained(c, k, m):
        """m pipeline batches, serialized by a data dependency."""

        def body(carry, _):
            cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
            return batch_scalar(cc, k), None

        out, _ = lax.scan(body, jnp.float32(0), None, length=m)
        return out

    chain2 = jax.jit(lambda c, k: chained(c, k, 2))
    chain10 = jax.jit(lambda c, k: chained(c, k, 10))

    t0 = time.perf_counter()
    np.asarray(chain2(clouds, keys))
    log(f"compile+first chained batch: {time.perf_counter() - t0:.2f}s")

    remeasured = []  # recorded in the JSON: which numbers came from a retry

    t2 = _timed(chain2, clouds, keys, iters=4)
    t10 = _timed(chain10, clouds, keys, iters=4)
    if t10 <= t2:  # tunnel hiccup inflated a measurement: remeasure once
        remeasured.append("batch_marginal")
        log("note: non-physical batch marginal (t10 <= t2) — remeasuring once")
        t2 = _timed(chain2, clouds, keys, iters=4)
        t10 = _timed(chain10, clouds, keys, iters=4)
    t_batch = (t10 - t2) / 8.0  # marginal = steady-state batch time
    if t_batch <= 0:
        t_batch = t10 / 10.0  # RPC-inclusive upper bound
    scans_per_sec = B / t_batch

    t_single_dispatch = _timed(jax.jit(batch_scalar), clouds, keys, iters=5)

    # p50 single-scan latency: RPC-inclusive and chained (device) forms
    def single_scalar(c, k):
        r = process_scan(c, k, cfg)
        return jnp.sum(r.grid.data.astype(jnp.int32)).astype(jnp.float32)

    def chained_single(c, k, m):
        def body(carry, _):
            cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
            return single_scalar(cc, k), None

        out, _ = lax.scan(body, jnp.float32(0), None, length=m)
        return out

    c0 = jax.tree_util.tree_map(lambda x: x[0], clouds)
    lat = []
    f_single = jax.jit(single_scalar)
    np.asarray(f_single(c0, keys[0]))
    for _ in range(11):
        t0 = time.perf_counter()
        np.asarray(f_single(c0, keys[0]))
        lat.append(time.perf_counter() - t0)
    lat.sort()
    t_single = lat[len(lat) // 2]

    cs2 = jax.jit(lambda c, k: chained_single(c, k, 2))
    cs12 = jax.jit(lambda c, k: chained_single(c, k, 12))
    s2 = _timed(cs2, c0, keys[0], iters=4)
    s12 = _timed(cs12, c0, keys[0], iters=4)
    if s12 <= s2:  # tunnel hiccup: remeasure once
        remeasured.append("single_scan_marginal")
        log("note: non-physical single-scan marginal (s12 <= s2) — remeasuring once")
        s2 = _timed(cs2, c0, keys[0], iters=4)
        s12 = _timed(cs12, c0, keys[0], iters=4)
    t_single_device = (s12 - s2) / 10.0
    if t_single_device <= 0:
        t_single_device = s12 / 12.0  # RPC-inclusive upper bound

    # ---- per-stage table (reference cpp:913-925 equivalent) ----------------
    # each stage timed batched with a scalar reduction; the shared dispatch
    # RPC (~26 ms/call) is measured separately and subtracted.
    t_null = _timed(jax.jit(lambda s: jnp.sum(s)), jnp.ones((8, 8)), iters=8)
    # (t_null is reported as the tunnel RPC constant; stage timings below
    # use chained 4-vs-1 marginals, which subtract it exactly)
    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))

    def s_crop(c):
        r = jax.vmap(lambda cc: crop_and_seed(cc, cfg))(c)
        return jnp.sum(r.counts)

    seeded = jax.jit(jax.vmap(lambda cc: crop_and_seed(cc, cfg)))(clouds)

    def s_vox(c):
        r = jax.vmap(
            lambda cc: voxel_downsample(
                cc, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
                cfg.voxel_sum_precision,
            )
        )(c)
        return jnp.sum(r.cloud.points)

    vox = jax.jit(
        jax.vmap(
            lambda cc: voxel_downsample(
                cc, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
                cfg.voxel_sum_precision,
            )
        )
    )(seeded.cloud)

    def s_out(c):
        r = jax.vmap(
            lambda cc: remove_statistical_outliers(
                cc, cfg.statistical_outlier_mean_k,
                cfg.statistical_outlier_std_dev_thresh, backend=cfg.knn_backend,
                band=cfg.knn_band, row_tile=cfg.knn_row_tile,
                skip_dead_tiles=cfg.knn_skip_dead_tiles,
            )
        )(c)
        return jnp.sum(r.cloud.valid)

    outl = jax.jit(
        jax.vmap(
            lambda cc: remove_statistical_outliers(
                cc, cfg.statistical_outlier_mean_k,
                cfg.statistical_outlier_std_dev_thresh, backend=cfg.knn_backend,
                band=cfg.knn_band, row_tile=cfg.knn_row_tile,
                skip_dead_tiles=cfg.knn_skip_dead_tiles,
            )
        )
    )(vox.cloud)

    def s_seg(c, k):
        r = jax.vmap(lambda cc, kk: segment_planes(cc, kk, cfg))(c, k)
        return jnp.sum(r.nonplane_cloud.valid)

    seg = jax.jit(jax.vmap(lambda cc, kk: segment_planes(cc, kk, cfg)))(outl.cloud, keys)
    comp = jax.jit(jax.vmap(lambda cc: compact(cc, cfg.cluster_capacity)))(seg.nonplane_cloud)

    def s_clus(c):
        r = jax.vmap(
            lambda cc: euclidean_cluster(
                cc, cfg.euc_cluster_tolerance, cfg.euc_min_cluster_size,
                cfg.euc_max_cluster_size, cfg.max_clusters, cfg.cluster_max_iters,
            )
        )(c)
        return jnp.sum(r.clusters.sizes)

    timer = StageTimer()

    def rec(name, marginal):
        """Record a per-scan stage marginal; a non-positive marginal is
        below the tunnel-noise floor — record as clamped so the table
        prints '<noise' rather than 0.000000 (VERDICT r4 weak #3)."""
        timer.record(name, max(marginal, 0.0) / B, clamped=marginal <= 0.0)
        return max(marginal, 1e-7) / B

    t_crop = rec("occupancy grid creation", _stage_marginal(s_crop, clouds))
    t_vox = rec("downsampling", _stage_marginal(s_vox, seeded.cloud))
    t_out = rec(
        "statistical outlier removal", _stage_marginal(s_out, vox.cloud)
    )
    t_seg = rec("plane segmentation", _stage_marginal(s_seg, outl.cloud, keys))
    t_clus = rec("euclidian clustering", _stage_marginal(s_clus, comp.cloud))
    log(timer.table())

    # BASELINE.json config throughputs (#1 crop+voxel, #2 ransac+outlier,
    # #3 cluster extraction, #4 full pipeline, #5 batched stream)
    baseline_configs = {
        "1_crop_voxel_scans_per_s": round(1.0 / (t_crop + t_vox), 1),
        "2_outlier_ransac_scans_per_s": round(1.0 / (t_out + t_seg), 1),
        "3_cluster_extraction_scans_per_s": round(1.0 / t_clus, 1),
        "4_full_pipeline_p50_latency_ms": round(t_single * 1e3, 3),
        # the LATENCY config (VERDICT r3 weak #1): chained B=1 steady
        # state — what a latency-sensitive caller sees per scan on
        # attached hardware, with the tunnel RPC reported separately
        "4b_latency_chained_b1_device_ms": round(t_single_device * 1e3, 3),
        "5_batched_stream_scans_per_s": round(scans_per_sec, 2),
    }

    result = jax.jit(pipe)(clouds, keys)
    log(
        "stage counts (scan 0): "
        + ", ".join(
            f"{k}={np.asarray(getattr(result.stats, k))[0]}"
            for k in (
                "accumulated_points", "cropped_points", "voxel_points",
                "inlier_points", "nonplane_points", "num_planes", "num_clusters",
            )
        )
    )
    for flag in (
        "voxel_overflow", "cluster_overflow", "cluster_band_overflow",
        "planes_truncated", "cluster_unconverged",
    ):
        v = np.asarray(getattr(result.stats, flag))
        if v.any():
            log(f"WARNING: {flag} on {int(v.sum())}/{B} scans — capacities truncated")

    # speed-of-light check (VERDICT r4 next #4): the measured per-scan
    # stage marginals against the VPU/MXU/HBM lower-bound model
    # (utils/bounds.py; the consolidated fullscale table lives in
    # docs/PERFORMANCE.md via scripts/speed_of_light.py).  A stage whose
    # fraction-of-bound grows round-over-round has drifted off its floor.
    from pointcloud_obstacle_processing_tpu.utils.bounds import (
        LATENCY_CLASS,
        stage_bounds,
    )

    s0 = result.stats
    sb = stage_bounds(
        cfg,
        int(np.asarray(s0.accumulated_points)[0]),
        int(np.asarray(s0.voxel_points)[0]),
        int(np.asarray(s0.nonplane_points)[0]),
    )
    achieved = {
        "crop+seed": t_crop, "voxel": t_vox, "outlier": t_out,
        "ransac": t_seg, "cluster": t_clus,
    }
    fracs = {
        k: achieved[k] / sb[k][0] for k in achieved if sb[k][0] > 0
    }
    _cands = [k for k in fracs if k not in LATENCY_CLASS]
    worst = max(_cands, key=fracs.get) if _cands else None
    log(
        "speed-of-light (flagship, per scan): "
        + ", ".join(
            f"{k} {achieved[k]*1e3:.3f} ms vs {sb[k][0]*1e3:.3f} bound "
            f"({sb[k][1]}, {fracs[k]:.1f}x)"
            for k in achieved
            if k in fracs  # a degenerate scene can zero a bound
        )
        + (
            f" — worst stage vs bound: {worst} at {fracs[worst]:.1f}x"
            if worst is not None
            else " — no stage with a meaningful bound (degenerate scene)"
        )
    )

    # Latency attribution (VERDICT r3 weak #1): the RPC-inclusive p50 is
    # device p50 + one dispatch+fetch round trip through the axon tunnel.
    # Reporting the decomposition makes round-over-round movement
    # attributable: if rpc_overhead tracks the measured null-program RPC,
    # the RPC-inclusive number moved with TUNNEL LOAD, not dispatch cost
    # (the r2->r3 28.77->34.33 ms movement was exactly this: device p50
    # IMPROVED 3.49->1.03 while the tunnel constant grew; see
    # docs/PERFORMANCE.md round-4 log).
    rpc_overhead = t_single - t_single_device
    log(
        f"throughput: {scans_per_sec:.1f} scans/sec/chip steady-state "
        f"(chained batches of {B}, {t_batch*1e3:.2f} ms/batch marginal; "
        f"single dispatch {t_single_dispatch*1e3:.2f} ms incl. ~{t_null*1e3:.0f} ms tunnel RPC); "
        f"p50 single-scan latency: {t_single*1e3:.2f} ms RPC-inclusive = "
        f"{t_single_device*1e3:.2f} ms device + {rpc_overhead*1e3:.2f} ms "
        f"dispatch/RPC (null-program RPC measures {t_null*1e3:.2f} ms — "
        f"overhead ~= null means the inclusive p50 moves with tunnel load, "
        f"not dispatch cost)"
    )

    # ---- authentic reference configuration (params.yaml leaf 0.015) --------
    fcfg = REFERENCE_FULLSCALE_CONFIG
    log(
        f"fullscale config: leaf {fcfg.downsample_leaf_size}, window capacity "
        f"{fcfg.max_points}, voxel cap {fcfg.max_voxels}"
    )
    # ONE arena re-observed 8 times with fresh 3 mm sensor noise per
    # observation — the authentic accumulation semantics (the reference
    # accumulates 200 frames of the SAME arena, cpp:691-698).  The old
    # construction stacked 8 different arenas (48 rock fields + 8x noise
    # blankets), which fused the whole cloud into one giant over-max_size
    # component once the cluster stage stopped truncating.  Shared with
    # the speed-of-light and merge-A/B scripts so every fullscale
    # measurement runs the identical workload.
    from pointcloud_obstacle_processing_tpu.utils.scene import (
        make_fullscale_window,
    )

    fcloud_np, fvalid = make_fullscale_window(fcfg.max_points)
    log(f"fullscale window: {int(fvalid.sum())} points")
    fcloud = Cloud(points=jnp.asarray(fcloud_np), valid=jnp.asarray(fvalid))

    def f_single(c, k):
        r = process_scan(c, k, fcfg)
        return jnp.sum(r.grid.data.astype(jnp.int32)).astype(jnp.float32)

    def f_chained(c, k, m):
        def body(carry, _):
            cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
            return f_single(cc, k), None

        out, _ = lax.scan(body, jnp.float32(0), None, length=m)
        return out

    t0 = time.perf_counter()
    fc1 = jax.jit(lambda c, k: f_chained(c, k, 1))
    fc3 = jax.jit(lambda c, k: f_chained(c, k, 3))
    f1 = _timed(fc1, fcloud, keys[0], iters=3)
    f3 = _timed(fc3, fcloud, keys[0], iters=3)
    t_window = (f3 - f1) / 2.0
    if t_window <= 0:
        # a tunnel hiccup inflated one measurement; remeasure once, then
        # fall back to the RPC-inclusive x3 mean as a valid upper bound
        remeasured.append("fullscale_window")
        log("note: non-physical fullscale marginal (f3 <= f1) — remeasuring once")
        f1 = _timed(fc1, fcloud, keys[0], iters=3)
        f3 = _timed(fc3, fcloud, keys[0], iters=3)
        t_window = (f3 - f1) / 2.0
        if t_window <= 0:
            t_window = f3 / 3.0
    frames_per_s = fcfg.accumulate_count / t_window
    log(
        f"fullscale (authentic 0.015 leaf): {t_window*1e3:.1f} ms/window device "
        f"({fcfg.accumulate_count}-frame windows -> {frames_per_s:.0f} frames/s; "
        f"measured in {time.perf_counter()-t0:.1f}s)"
    )
    baseline_configs["6_fullscale_0015_window_ms"] = round(t_window * 1e3, 1)
    baseline_configs["6_fullscale_0015_frames_per_s"] = round(frames_per_s, 1)

    # ---- node-level cycle rate (accumulate -> publish, end to end) ---------
    # The full host runtime: synthetic kinect frames through the bus, native
    # decode, per-frame async device_put (accumulate_on_device), async
    # dispatch, publish.  Single-stream and therefore LATENCY-bound: every
    # cycle pays one tunnel RPC (~26 ms) that the batched/pipelined
    # throughput numbers amortize — on directly-attached hardware the
    # node/device gap closes to the publish cost.

    # host-accumulate + async dispatch: through the tunnel each eager device
    # op is a full RPC and bulk uploads run ~3 MB/s, so the node cycle is
    # upload/fetch-bound here (compute is ~4.5 ms of it); per-frame
    # device_put (accumulate_on_device) is the right mode on attached
    # hardware but pays per-frame RPCs through a tunnel.
    from pointcloud_obstacle_processing_tpu.runtime.bus import MessageBus
    from pointcloud_obstacle_processing_tpu.runtime.driver import (
        ObstacleDetectionNode,
        POINT_TOPIC,
    )
    from pointcloud_obstacle_processing_tpu.runtime.launch import (
        DEFAULT_SENSOR_POS,
        DEFAULT_SENSOR_QUAT,
        SyntheticKinect,
    )
    from pointcloud_obstacle_processing_tpu.runtime.tf import TransformBuffer

    def node_cycle_rate(publish_point_clouds: bool, cyc: int = 6):
        """Windows/s of the full node loop in the given debug posture.
        publish_point_clouds=False is the reference's PRODUCTION gate
        (cpp:945 default); True additionally fetches + publishes the five
        per-stage debug clouds every cycle (cpp:288-295, :332-339,
        :401-426) — the RViz-inspection posture."""
        ncfg = cfg.replace(
            accumulate_count=16, publish_point_clouds=publish_point_clouds
        )
        bus = MessageBus(immediate=True)
        tfb = TransformBuffer()
        tfb.set_static(
            "world", "kinect2_link", DEFAULT_SENSOR_QUAT, DEFAULT_SENSOR_POS
        )
        node = ObstacleDetectionNode(
            ncfg, bus=bus, tf_buffer=tfb, async_pipeline=True
        )
        kin = SyntheticKinect(
            bus.advertise(POINT_TOPIC),
            tfb.lookup_transform("world", "kinect2_link"),
            points_per_frame=8192,
        )
        for _ in range(2 * 17):  # two warmup windows incl. compile
            kin.emit_frame()
        node.flush()
        n_warm = len(node.metrics)
        t0 = time.perf_counter()
        for _ in range(cyc * 17):
            kin.emit_frame()
        node.flush()
        wall = time.perf_counter() - t0
        # transfer decomposition (VERDICT r4 weak #2): bytes this node
        # actually moved per cycle, so a windows/s movement attributes
        # itself — if bytes/cycle is flat and MB/s fell, it was the
        # tunnel; if bytes/cycle grew, it was the node.
        measured = node.metrics[n_warm:] or node.metrics
        up = sum(m["upload_bytes"] for m in measured) / len(measured)
        fet = sum(m["fetch_bytes"] for m in measured) / len(measured)
        return cyc / wall, cyc * 16 / wall, wall / cyc, up, fet

    windows_per_s, frames_s, cycle_s, up_b, fet_b = node_cycle_rate(False)
    eff_mbps = (up_b + fet_b) / 1e6 / cycle_s
    log(
        f"node end-to-end (production posture, debug clouds off): "
        f"{windows_per_s:.2f} windows/s "
        f"({frames_s:.0f} frames/s; {cycle_s*1e3:.1f} ms/cycle "
        f"accumulate->publish — tunnel upload/fetch bound, "
        f"~{1e3*cycle_s - t_single_device*1e3:.0f} ms of it is transfer/RPC; "
        f"moved {up_b/1e6:.2f} MB up + {fet_b/1e6:.3f} MB down per cycle "
        f"= {eff_mbps:.1f} MB/s effective link rate)"
    )
    baseline_configs["7_node_windows_per_s"] = round(windows_per_s, 2)
    baseline_configs["7_node_frames_per_s"] = round(frames_s, 1)
    baseline_configs["7_node_upload_mb_per_cycle"] = round(up_b / 1e6, 3)
    baseline_configs["7_node_fetch_mb_per_cycle"] = round(fet_b / 1e6, 4)
    baseline_configs["7_node_effective_mb_per_s"] = round(eff_mbps, 2)

    w_dbg, f_dbg, c_dbg, up_dbg, fet_dbg = node_cycle_rate(True, cyc=4)
    log(
        f"node end-to-end (debug posture, 5 per-stage clouds fetched + "
        f"published per cycle): {w_dbg:.2f} windows/s ({c_dbg*1e3:.1f} ms/cycle; "
        f"{up_dbg/1e6:.2f} MB up + {fet_dbg/1e6:.2f} MB down per cycle = "
        f"{(up_dbg+fet_dbg)/1e6/c_dbg:.1f} MB/s effective)"
    )
    baseline_configs["7b_node_debug_clouds_windows_per_s"] = round(w_dbg, 2)
    baseline_configs["7b_node_debug_mb_per_cycle"] = round(
        (up_dbg + fet_dbg) / 1e6, 2
    )

    print(
        json.dumps(
            {
                "metric": "scans/sec/chip (100k-pt full pipeline)",
                "value": round(scans_per_sec, 2),
                "unit": "scans/s",
                "vs_baseline": round(scans_per_sec / 1000.0, 4),
                "p50_latency_ms": round(t_single * 1e3, 3),
                "p50_device_latency_ms": round(t_single_device * 1e3, 3),
                # p50_latency_ms - p50_device_latency_ms: compare with
                # null_rpc_ms to attribute movement (tunnel load vs
                # dispatch cost)
                "p50_rpc_overhead_ms": round((t_single - t_single_device) * 1e3, 2),
                "null_rpc_ms": round(t_null * 1e3, 2),
                "single_dispatch_batch_ms": round(t_single_dispatch * 1e3, 2),
                # which marginals needed a tunnel-hiccup retry (ADVICE r2:
                # records that a number came from a remeasurement)
                "remeasured": remeasured,
                # absent stage/x when no stage had a computable bound
                # (degenerate scene) — never a fabricated 0.0
                "worst_stage_vs_bound": (
                    {"stage": worst, "x_of_bound": round(fracs[worst], 1)}
                    if worst is not None
                    else {}
                ),
                "configs": baseline_configs,
            }
        )
    )


if __name__ == "__main__":
    main()
