"""Model registry.

This framework's "model family" is perception pipelines, not neural nets —
the reference has no learned components (SURVEY.md §2.3: TP/PP/EP absent,
not fabricated).  The flagship model is the obstacle-detection pipeline;
variants are config presets.  Exposed here in the conventional
``models/`` location so users find the entry points where they expect them.
"""

from ..config import PipelineConfig, REFERENCE_YAML_CONFIG
from ..pipeline import jit_pipeline, process_frames, process_scan

__all__ = [
    "ObstacleDetectionModel",
    "process_scan",
    "process_frames",
    "jit_pipeline",
    "FLAGSHIP_CONFIG",
    "REFERENCE_FULLSCALE_CONFIG",
]

# The benchmark/flagship configuration: 100k-pt scans (BASELINE.json
# north-star contract) in a 100352-point buffer (= 784*128, the smallest
# 128-aligned capacity holding a true 100k cloud — the old 128Ki buffer
# spent 25% of every N-bound op on padding: 714.9 -> 761.9 scans/s,
# scripts/tpu_experiments33.py).  kNN runs the banded (rank-window
# grid-pruned) engine over the voxel-lattice-sorted cloud.
# Capacities are sized to the workload with NO truncation (round 3): the
# bench scenes occupy ~20.9-21.6k voxels at leaf 0.04 (the old 16384 cap
# silently dropped ~24% of them) and ~470-600 non-plane points
# (cluster_capacity 1024 = ~1.7x headroom; every cap is watched by a
# StageStats overflow flag).  knn_band=512 re-validated at this capacity:
# 0.13% of kNN means perturbed vs exact (scripts/tpu_experiments11.py).
# voxel_payload_packing trades <=0.6 um of centroid quantization (two
# orders below the crosscheck tolerance; PARITY deviation 11) for a
# 1-key+2-payload sort: voxel stage 0.575 -> 0.534 ms/scan at this shape.
FLAGSHIP_CONFIG = REFERENCE_YAML_CONFIG.replace(
    max_points=100352,
    max_voxels=24576,
    cluster_capacity=1024,
    max_clusters=64,
    downsample_leaf_size=0.04,
    knn_backend="banded",
    # T=384 measured best under the Pallas sortnet (prefix-3 in context:
    # 26.22 ms/batch vs 256's 27.00 and 512's 27.49; 768 spills VMEM —
    # scripts/tpu_experiments44.py).  A larger tile also makes each row's
    # candidate window a strict SUPERSET (rows of tile t cover
    # [tT-band, tT+T+band)), so banded fidelity only improves.
    knn_row_tile=384,
    voxel_payload_packing=True,
)

# The authentic reference workload at full fidelity: a 200-frame
# accumulation window (params.yaml:10) re-observing ONE arena at the
# shipped 0.015 leaf — 2M-point windows, ~166k voxels, ~7k non-plane
# points on the bench arena (round 3: the old bench window stacked 8
# DIFFERENT arenas, whose merged noise blankets both overflowed the
# cluster capacity — silently, before StageStats.cluster_overflow existed
# — and fused into one over-max_size component).
# knn_band widened: at leaf 0.015 a rank band must span more voxels per
# x-slab (~550 valid/slab) to cover the same metric radius.
# cluster_capacity 16384 = 2.3x headroom over the bench window's ~7k
# non-plane points; the banded sweep scores cluster_band_window columns
# per query tile instead of all 16384.  The bench window's measured
# worst-case tile span is 3322 (p99 3263, scripts/span_probe.py), so
# 4096 carries ~23% headroom — and cluster_band_overflow observably
# flags any denser deployment that outgrows it (StageStats), the same
# contract as every other capacity knob.
REFERENCE_FULLSCALE_CONFIG = REFERENCE_YAML_CONFIG.replace(
    max_points=2 * 1024 * 1024,
    max_voxels=262144,
    cluster_capacity=16384,
    cluster_band_window=4096,
    max_clusters=64,
    knn_backend="banded",
    # Band knee MEASURED at this shape (scripts/tpu_experiments57.py,
    # vs a +-3328-rank superset reference): there is no sharp knee at
    # fullscale density — 1792 (the old analytic scaling of the flagship
    # 512) already perturbs 0.61% of kNN means / flips 44 of 165898 keep
    # decisions, 1280 perturbs 1.10% / flips 71 (0.043%) — while the
    # prefix-3 stage drops ~2.5 ms/window (20.2 -> 17.7).  Keep-decision
    # impact stays in the 0.03-0.04% class across 1280..1792, invisible
    # to the mu + m*sigma gate; 1280 takes the time.
    knn_band=1280,
    # total banded work is N*(1 + 2*band/T): T=1024 scores 44% fewer
    # window columns than 512 and each row's candidate window is a superset
    # (fidelity monotone non-degrading); measured prefix-3 ~21.0 vs ~21.9
    # ms/window (T=2048 exceeds VMEM — scripts/tpu_experiments49.py)
    knn_row_tile=1024,
    # the window runs as ONE unbatched program with 262144 capacity vs
    # ~166k valid voxels: skipping the ~37% dead query tiles is free
    # (see config.knn_skip_dead_tiles for why batched configs keep False)
    knn_skip_dead_tiles=True,
    # 1-key + 2-payload sort (PARITY deviation 11): quantum leaf/65536 =
    # 0.23 um at leaf 0.015; ~0.5-1 ms/window (tpu_experiments49.py)
    voxel_payload_packing=True,
)


class ObstacleDetectionModel:
    """Thin stateful facade over the pure pipeline: config + compiled fn."""

    def __init__(self, config: PipelineConfig | None = None):
        self.config = config or FLAGSHIP_CONFIG
        self.config.validate()
        self._fn = jit_pipeline(self.config)

    def __call__(self, cloud, key, world_from_sensor=None):
        return self._fn(cloud, key, world_from_sensor=world_from_sensor)
