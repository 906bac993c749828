"""Speed-of-light bounds per pipeline stage (VERDICT r4 next #4).

Computes, from the config and the run's measured occupancies, the
hardware lower bound each stage cannot beat on a v5e chip — the
max of its HBM-traffic time and its VPU/MXU-flop time.  The bench
prints achieved/bound per stage so a stage silently drifting off its
floor is visible round-over-round, and docs/PERFORMANCE.md carries the
consolidated table (scripts/speed_of_light.py derives it).

Hardware model (v5e, public figures + derivations):

* ``MXU_BF16`` = 197e12 FLOP/s — the published v5e peak.
* ``CLOCK`` ≈ 1.5 GHz, back-derived from the MXU peak: 197e12 /
  (2 FLOP/MAC * 128*128 MACs * 4 MXUs).
* ``VPU_F32`` = 8 sublanes * 128 lanes * 4 ALUs * CLOCK ≈ 6.1e12 op/s —
  the vector unit's elementwise ceiling.
* ``HBM_BW`` = 819e9 B/s — the published v5e HBM bandwidth.

The ops/bytes counts per stage are documented inline; they follow the
kernel geometries established in docs/PERFORMANCE.md (e.g. the kNN
stage's "~13 touches/element over [16, W/16, T] selection planes" and
~8/element for the distance planes, the log2(N)-pass sort traffic
model).  Bounds are LOWER bounds under this model: a fraction-of-bound
near 1 means at the floor; a large fraction means either headroom or a
structurally latency-bound stage (the sequential run-reduce grid, the
sort's comparator passes) — the table says which.
"""

from __future__ import annotations

import math

__all__ = ["HBM_BW", "MXU_BF16", "VPU_F32", "CLOCK", "stage_bounds"]

HBM_BW = 819e9  # B/s
MXU_BF16 = 197e12  # FLOP/s
CLOCK = MXU_BF16 / (2 * 128 * 128 * 4)  # ~1.5e9 Hz
VPU_F32 = 8 * 128 * 4 * CLOCK  # ~6.1e12 op/s


def _bound(hbm_bytes: float, vpu_ops: float = 0.0, mxu_flops: float = 0.0):
    t_hbm = hbm_bytes / HBM_BW
    t_vpu = vpu_ops / VPU_F32
    t_mxu = mxu_flops / MXU_BF16
    t = max(t_hbm, t_vpu, t_mxu)
    limiter = (
        "HBM" if t == t_hbm else ("VPU" if t == t_vpu else "MXU")
    )
    return t, limiter


def stage_bounds(
    cfg,
    n_valid: int,
    n_voxels: int,
    n_cluster_rows: int,
    sweeps: int = 5,
) -> dict:
    """{stage: (seconds_lower_bound, limiter, note)} for one scan/window.

    ``n_valid``: points in the accumulated window; ``n_voxels``: live
    voxel-table rows entering the kNN stage; ``n_cluster_rows``: live
    rows entering the cluster stage; ``sweeps``: label-propagation
    sweeps to convergence (5 on the bench scenes with the SV pointer
    jump — docs/PERFORMANCE.md round-3 log).
    """
    N = cfg.max_points
    V = cfg.max_voxels
    C = cfg.cluster_capacity
    H, W = cfg.grid_height, cfg.grid_width

    out = {}

    # 1. crop + seed: read [N,3] f32, write the cropped cloud + valid;
    #    the histogram is one-hot matmuls N x (H + W) on the MXU.  The
    #    strict floor is the point stream; if XLA materializes the bf16
    #    one-hot operands they add N x (H+W) x 2 B (~1.1 ms at fullscale)
    #    of traffic — measured marginals (0.8-1.3 ms across runs) sit AT
    #    or BELOW that ceiling, i.e. the one-hot generation is at least
    #    partially fused; achieved/strict-floor is therefore expected to
    #    read ~10-20x here and that is a property of the histogram
    #    algorithm (chosen because scatters are 20 cyc/elem), not drift.
    out["crop+seed"] = _bound(
        hbm_bytes=N * 12 * 2 + N,
        mxu_flops=2.0 * N * (H + W),
    ) + ("point stream (one-hot operand traffic ceiling noted)",)

    # 2. voxel sort: ~log2(N) merge passes over (key + 3 payloads) = 16 B
    #    read+written per pass; the measured pure-sort floor (3.6 ms at
    #    2M rows) sits ~2x this traffic model — comparator VPU cost.
    p = math.ceil(math.log2(max(N, 2)))
    sort_bytes = p * N * 16 * 2
    # 3. + run-reduce: 5 channels r+w once — but the kernel walks a
    #    SEQUENTIAL grid (overwrite contract), so its wall is per-step
    #    latency, not bandwidth; the bound stays the honest traffic floor.
    reduce_bytes = N * 5 * 4 * 2 + V * 5 * 4
    out["voxel"] = _bound(hbm_bytes=sort_bytes + reduce_bytes) + (
        f"{p}-pass sort traffic + run-reduce stream",
    )

    # 4. outlier kNN: live rows x band window, ~8 VPU touches/element for
    #    the distance planes + ~13 for the sortnet selection planes
    #    (docs/PERFORMANCE.md: [16, W/16, T] geometry).  HBM traffic is
    #    per-TILE: each row tile DMAs its [4-channel, Wk] column window
    #    into VMEM once; the per-row x window work runs out of VMEM.
    T = cfg.knn_row_tile
    Wk = min(T + 2 * cfg.knn_band, V)
    live_tiles = math.ceil(n_voxels / T)
    knn_ops = float(n_voxels) * Wk * (8 + 13)
    knn_bytes = float(live_tiles) * Wk * 16 + float(n_voxels) * Wk * 4 / T
    out["outlier"] = _bound(hbm_bytes=knn_bytes, vpu_ops=knn_ops) + (
        f"{n_voxels} rows x {Wk} window x ~21 touches",
    )

    # 5. RANSAC: K hypotheses x live rows x dot3+compare per plane round;
    #    f32 HIGHEST precision = 6 bf16 MXU passes per term.
    K = cfg.ransac_hypotheses
    rounds = cfg.max_planes
    ransac_flops = 6.0 * rounds * K * n_voxels * 8
    out["ransac"] = _bound(
        hbm_bytes=rounds * n_voxels * 16 * 2, mxu_flops=ransac_flops
    ) + (f"{rounds} rounds x {K} hyp x {n_voxels} rows",)

    # 6. compact: one stream of the nonplane cloud into the cluster buffer.
    out["compact"] = _bound(hbm_bytes=float(n_voxels) * 16 * 2) + (
        "stream compaction",
    )

    # 7. cluster: sweeps x live rows x band window, ~12 touches/element
    #    (adjacency dists + min-select + label plumbing) + the column
    #    table DMA per sweep, PLUS a structural serialization: the SV
    #    pointer jump's ``new[new]`` is a [C]-row data-dependent gather
    #    that XLA serializes at ~20 cycles/row (CLAUDE.md measured fact)
    #    once per sweep — a floor no layout change removes while the jump
    #    exists (it is what cut 24 sweeps to ~5; PERFORMANCE.md round 3).
    Wc = min(cfg.cluster_band_window or C, C)
    rows = min(n_cluster_rows, C)
    clus_ops = float(sweeps) * rows * Wc * 12
    clus_bytes = float(sweeps) * rows * Wc / 128 * 4  # [8,Wc] tiles per 128-row
    t, limiter = _bound(hbm_bytes=clus_bytes, vpu_ops=clus_ops)
    t_gather = sweeps * C * 20.0 / CLOCK  # serialized jump gathers
    out["cluster"] = (
        t + t_gather,
        f"{limiter}+serial-gather",
        f"{sweeps} sweeps x {rows} rows x {Wc} window + {sweeps} "
        f"serialized [{C}] jump gathers",
    )

    # 8. glue (centroids + shadows + grid marks): a chain of tiny kernels
    #    (segment reduces over <=max_clusters slots, per-cluster shadow
    #    rasterization over a [H, W] grid, grid scatters) whose wall is
    #    kernel-launch/pipeline latency, not bandwidth or flops — the
    #    traffic bound below is orders below the achieved ~0.5 ms and is
    #    NOT a meaningful floor (excluded from worst-stage checks).
    out["glue"] = _bound(
        hbm_bytes=rows * 16 * 4 + cfg.max_clusters * H * W * 1.0
    ) + ("latency-class small kernels (bound not meaningful)",)
    return out


# stages whose achieved cost sits at kernel-latency/noise scale — their
# fraction-of-bound is not a drift signal (see the per-stage notes above)
LATENCY_CLASS = {"glue", "ransac", "compact"}
