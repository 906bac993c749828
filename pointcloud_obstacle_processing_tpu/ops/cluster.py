"""Euclidean cluster extraction (pcl::EuclideanClusterExtraction equivalent).

Reference: extract_euclidian_clusters (obstacle_detection.cpp:430-455) — PCL
BFS flood fill over KD-tree radius neighbors (dist <= tolerance), then a
[min,max] size gate, clusters sorted by size descending (PCL sorts at the end
of extraction).  This is the reference's self-reported slowest stage
(cpp:721, :886-887).

TPU-native design (SURVEY.md §7 step 7): connected components of the
"distance <= tolerance" graph via **min-label propagation with pointer
jumping** over a fixed-capacity compacted buffer:

* every valid point starts labeled with its own index;
* one sweep recomputes ``label[i] = min(label[j])`` over all neighbors j —
  the neighbor test is a tiled [T, C] distance expansion on the MXU (the
  adjacency is never materialized in HBM);
* between sweeps, labels are path-compressed by repeated ``l = min(l, l[l])``
  gathers (pointer jumping), which turns O(diameter) convergence into
  O(log diameter) sweeps;
* a ``lax.while_loop`` runs sweeps until a fixed point (statically bounded
  by ``cluster_max_iters``).

The final label of each point is the minimum point index in its component —
a canonical, order-independent cluster id.  Cluster slots are then assigned
by size descending (ties: smaller root index first — identical to PCL's
stable discovery-order tie behavior).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..types import Cloud, ClusterSet, PointIndicesArray, PointWithRad

__all__ = ["euclidean_cluster", "cluster_centroids", "ClusterOutput"]


def _neighbor_min_sweep(
    pts: jax.Array, valid: jax.Array, labels: jax.Array, tol2: jax.Array, row_tile: int
) -> jax.Array:
    """One ``label[i] <- min over {i} ∪ neighbors(i)`` pass, tiled on the MXU."""
    n = pts.shape[0]
    n_q = -(-n // row_tile) * row_tile  # query rows padded to a tile multiple
    p_sq = jnp.sum(pts * pts, axis=-1)
    labels_col = jnp.where(valid, labels, jnp.int32(n))  # invalid cols never win

    def tile_fn(args):
        q, q_sq, q_lab, q_valid = args
        # HIGHEST precision: TPU's default bf16 MXU inputs would perturb
        # distances near the tolerance boundary and change connectivity.
        d2 = q_sq[:, None] + p_sq[None, :] - 2.0 * jnp.dot(
            q, pts.T, preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        adj = (d2 <= tol2) & valid[None, :] & q_valid[:, None]
        cand = jnp.where(adj, labels_col[None, :], jnp.int32(n))
        return jnp.minimum(jnp.min(cand, axis=1), q_lab)

    tiles = n_q // row_tile
    pad = n_q - n
    out = lax.map(
        tile_fn,
        (
            jnp.pad(pts, ((0, pad), (0, 0))).reshape(tiles, row_tile, 3),
            jnp.pad(p_sq, (0, pad)).reshape(tiles, row_tile),
            jnp.pad(labels, (0, pad), constant_values=n).reshape(tiles, row_tile),
            jnp.pad(valid, (0, pad)).reshape(tiles, row_tile),  # False pads
        ),
    )
    return out.reshape(n_q)[:n]


class ClusterOutput(NamedTuple):
    clusters: ClusterSet
    labels: jax.Array  # [C] int32 raw component roots (min index), self for invalid
    root_slot: jax.Array  # [C] int32 root index -> slot id or -1
    overflow: jax.Array  # [] bool: more gated clusters than max_clusters


def euclidean_cluster(
    cloud: Cloud,
    tolerance: float,
    min_size: int,
    max_size: int,
    max_clusters: int,
    max_iters: int = 64,
    row_tile: int = 512,
) -> ClusterOutput:
    """Connected components + size gate + size-descending slot assignment."""
    pts = cloud.points
    valid = cloud.valid
    n = cloud.capacity
    row_tile = min(row_tile, n)  # odd capacities are query-padded in the sweep

    # Center + park invalid at the centroid (their rows/cols are masked out).
    denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    center = jnp.sum(jnp.where(valid[:, None], pts, 0.0), axis=0) / denom
    p = jnp.where(valid[:, None], pts - center, 0.0)
    tol2 = jnp.float32(tolerance) ** 2

    idx = lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    labels0 = idx  # every point its own component (incl. invalid: stays self)

    def cond(state):
        labels, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        labels, _, it = state
        nbr_min = _neighbor_min_sweep(p, valid, labels, tol2, row_tile)

        # Shiloach-Vishkin style hook: propagate each point's neighborhood
        # minimum to its component ROOT via scatter-min.  Updating only the
        # point itself is not enough — interior members (including the old
        # root) would never learn about a merge seen at the boundary, and a
        # long chain would need O(diameter) sweeps instead of O(log n).
        new = labels.at[labels].min(nbr_min)
        new = jnp.minimum(new, nbr_min)

        # Full path compression: jump pointers to a fixed point so every
        # label is a root before the next sweep.
        def jump_cond(s):
            return s[1]

        def jump_body(s):
            l, _ = s
            l2 = jnp.minimum(l, l[l])
            return (l2, jnp.any(l2 != l))

        new, _ = lax.while_loop(jump_cond, jump_body, (new, jnp.bool_(True)))
        return (new, jnp.any(new != labels), it + 1)

    labels, _, _ = lax.while_loop(cond, body, (labels0, jnp.bool_(True), jnp.int32(0)))

    # ---- component sizes & size gate --------------------------------------
    sizes_by_root = jnp.zeros((n,), jnp.int32).at[
        jnp.where(valid, labels, n)
    ].add(1, mode="drop")
    is_root = valid & (labels == idx)
    gate = is_root & (sizes_by_root >= min_size) & (sizes_by_root <= max_size)
    num_clusters_total = jnp.sum(gate.astype(jnp.int32))

    # ---- slot assignment: size desc, root asc (PCL's end-of-extract sort) --
    # lax.top_k is stable (equal values keep ascending index order), giving
    # exactly the (size desc, root asc) order without a full sort.
    gated_size = jnp.where(gate, sizes_by_root, jnp.int32(-1))
    _, top_roots = lax.top_k(gated_size, max_clusters)
    slot_valid = (
        lax.broadcasted_iota(jnp.int32, (max_clusters, 1), 0)[:, 0]
        < jnp.minimum(num_clusters_total, max_clusters)
    )
    root_slot = jnp.full((n,), -1, jnp.int32)
    root_slot = root_slot.at[jnp.where(slot_valid, top_roots, n)].set(
        lax.broadcasted_iota(jnp.int32, (max_clusters, 1), 0)[:, 0], mode="drop"
    )

    point_cluster = jnp.where(valid, root_slot[labels], -1)
    slot_sizes = jnp.where(slot_valid, sizes_by_root[top_roots], 0)

    clusters = ClusterSet(
        point_cluster=point_cluster,
        sizes=slot_sizes,
        valid=slot_valid,
        num_clusters=jnp.minimum(num_clusters_total, max_clusters),
    )
    return ClusterOutput(
        clusters=clusters,
        labels=labels,
        root_slot=root_slot,
        overflow=num_clusters_total > max_clusters,
    )


def cluster_centroids(cloud: Cloud, clusters: ClusterSet) -> PointIndicesArray:
    """Per-cluster centroid + bounding radius -> PointWithRad rows.

    The reference's dormant ``create_cluster_cloud``/``centroids`` output
    (obstacle_detection.cpp:806-814, msg/PointWithRad.msg) — first-class here
    as two segment reduces (scatter-add centroid, scatter-max radius).
    """
    m = clusters.sizes.shape[0]
    pc = clusters.point_cluster
    ok = pc >= 0
    ids = jnp.where(ok, pc, m)

    w = ok.astype(jnp.float32)
    sums = jnp.zeros((m, 3), jnp.float32).at[ids].add(
        cloud.points * w[:, None], mode="drop"
    )
    counts = jnp.zeros((m,), jnp.float32).at[ids].add(w, mode="drop")
    centroids = sums / jnp.maximum(counts, 1.0)[:, None]

    d = jnp.linalg.norm(cloud.points - centroids[jnp.clip(ids, 0, m - 1)], axis=-1)
    radii = jnp.zeros((m,), jnp.float32).at[ids].max(
        jnp.where(ok, d, 0.0), mode="drop"
    )

    xyzr = jnp.concatenate([centroids, radii[:, None]], axis=-1)
    xyzr = jnp.where(clusters.valid[:, None], xyzr, 0.0)
    return PointIndicesArray(points=PointWithRad(xyzr=xyzr), valid=clusters.valid)
