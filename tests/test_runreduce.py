"""Fused sorted-run reduce+compact kernel (ops/pallas_runreduce.py).

Contract: the Pallas kernel (interpret mode on the CPU test backend) and
the XLA fallback produce BITWISE-identical (vals, num) — that equality is
what keeps the TPU<->CPU crosscheck exact — and both agree with a NumPy
per-run ground truth (exact keys/counts; sums to f32 tolerance, since the
windowed scan order differs from NumPy's linear sum only by rounding).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloud_obstacle_processing_tpu.ops.pallas_runreduce import (
    sorted_run_reduce,
)


def _case(rng, n, n_runs, n_valid, sentinel):
    """Sorted keys with duplicate runs + trailing invalid rows."""
    keys = np.sort(rng.integers(0, n_runs, n_valid)).astype(np.int32)
    skey = np.full(n, sentinel, np.int32)
    skey[:n_valid] = keys
    offs = np.zeros((3, n), np.float32)
    offs[:, :n_valid] = rng.standard_normal((3, n_valid)).astype(np.float32)
    return jnp.asarray(skey), jnp.asarray(offs)


def _ground_truth(skey, offs, sentinel, capacity):
    skey = np.asarray(skey)
    offs = np.asarray(offs)
    valid = skey < sentinel
    uniq = np.unique(skey[valid])
    rows = []
    for k in uniq[:capacity]:
        m = skey == k
        rows.append([k, *offs[:, m].sum(axis=1), m.sum()])
    return np.array(rows, np.float64), len(uniq)


@pytest.mark.parametrize(
    "n,n_runs,n_valid,cap,group,flush",
    [
        (1024, 50, 700, 128, 8, 512),
        (2048, 300, 2048, 512, 8, 512),   # no invalid tail
        (1024, 1, 600, 16, 4, 512),       # one giant run spanning many windows
        (4096, 900, 3100, 1024, 8, 512),
        (1024, 200, 512, 64, 1, 512),     # window = one 128-block
        (4096, 900, 3100, 1024, 8, 1024), # flush == window: no remainder tier
        (4096, 900, 3100, 1024, 16, 256), # small flush: remainder tier fires
    ],
)
def test_fused_matches_fallback_and_truth(n, n_runs, n_valid, cap, group, flush):
    rng = np.random.default_rng(n + n_runs)
    sentinel = n_runs + 7
    skey, offs = _case(rng, n, n_runs, n_valid, sentinel)

    vals_p, num_p = sorted_run_reduce(
        skey, offs, sentinel, cap, group=group, flush=flush,
        use_pallas=True, interpret=True,
    )
    vals_f, num_f = sorted_run_reduce(
        skey, offs, sentinel, cap, group=group, use_pallas=False
    )
    gt, n_runs_true = _ground_truth(skey, offs, sentinel, cap)

    assert int(num_p) == int(num_f) == n_runs_true
    k = min(n_runs_true, cap)
    # kernel vs fallback: bitwise (the crosscheck contract)
    assert np.array_equal(np.asarray(vals_p)[:k], np.asarray(vals_f)[:k])
    got = np.asarray(vals_f)[:k]
    assert np.array_equal(got[:, 0], gt[:, 0])  # keys exact
    assert np.array_equal(got[:, 4], gt[:, 4])  # counts exact
    np.testing.assert_allclose(got[:, 1:4], gt[:, 1:4], rtol=1e-5, atol=1e-5)


def test_fused_vmap_batched_grid():
    """The custom_vmap rule routes jax.vmap onto the (B, steps) grid and
    matches per-element application bitwise."""
    rng = np.random.default_rng(11)
    n, cap, B, sentinel = 1024, 128, 3, 61
    ks, os_ = zip(*[_case(rng, n, 60, 1024 - 128 * i, sentinel) for i in range(B)])
    skey = jnp.stack(ks)
    offs = jnp.stack(os_)

    f = lambda k, o: sorted_run_reduce(  # noqa: E731
        k, o, sentinel, cap, group=8, use_pallas=True, interpret=True
    )
    vals_b, num_b = jax.vmap(f)(skey, offs)
    for b in range(B):
        vals_1, num_1 = f(skey[b], offs[b])
        assert int(num_b[b]) == int(num_1)
        kk = min(int(num_1), cap)
        assert np.array_equal(
            np.asarray(vals_b)[b, :kk], np.asarray(vals_1)[:kk]
        )


@pytest.mark.parametrize("B", [8, 9, 11])
def test_eight_row_kernel_matches_fallback(B, monkeypatch):
    """Batches >= 8 route onto the 8-rows-per-step kernel (with padding
    for non-multiples); outputs must stay bitwise equal to the fallback
    per element."""
    from pointcloud_obstacle_processing_tpu.ops import pallas_runreduce as prr

    monkeypatch.setattr(prr, "KERNEL8_ENABLED", True)
    rng = np.random.default_rng(100 + B)
    n, cap, sentinel = 1024, 128, 61
    ks, os_ = zip(*[
        _case(rng, n, 60, n - 128 * (i % 5), sentinel) for i in range(B)
    ])
    skey = jnp.stack(ks)
    offs = jnp.stack(os_)

    f = lambda k, o: sorted_run_reduce(  # noqa: E731
        k, o, sentinel, cap, group=8, use_pallas=True, interpret=True
    )
    vals_b, num_b = jax.vmap(f)(skey, offs)
    for b in range(B):
        vals_1, num_1 = sorted_run_reduce(
            skey[b], offs[b], sentinel, cap, group=8, use_pallas=False
        )
        assert int(num_b[b]) == int(num_1)
        kk = min(int(num_1), cap)
        assert np.array_equal(np.asarray(vals_b)[b, :kk], np.asarray(vals_1)[:kk])


def _packed_case(rng, n, n_runs, n_valid, sentinel, leaf=0.04):
    """Sorted keys + offsets in [0, leaf) packed as 16-bit fixed point
    (the voxel payload-packing layout: x|y in one int32, z in another)."""
    skey, _ = _case(rng, n, n_runs, n_valid, sentinel)
    offs = np.zeros((3, n), np.float32)
    offs[:, :n_valid] = (
        rng.uniform(0.0, leaf, (3, n_valid)).astype(np.float32)
    )
    q = np.float32(65536.0 / leaf)
    qi = np.clip((offs * q).astype(np.int32), 0, 65535)
    pxy = (qi[0] << 16) | qi[1]
    pz = qi[2]
    quantum = leaf / 65536.0
    # the values the reduction actually sums: the decoded fixed point
    dec = qi.astype(np.float32) * np.float32(quantum)
    return skey, jnp.asarray(pxy), jnp.asarray(pz), dec, quantum


@pytest.mark.parametrize("kernel8", [False, True])
def test_packed_payloads_match_fallback_and_truth(kernel8, monkeypatch):
    """quantum-mode: (pxy, pz) int32 payloads decode in-kernel; kernel and
    fallback stay bitwise equal and match the NumPy truth of the DECODED
    offsets (keys/counts exact, sums to f32 tolerance)."""
    from pointcloud_obstacle_processing_tpu.ops import pallas_runreduce as prr

    rng = np.random.default_rng(77 + kernel8)
    n, n_runs, cap, sentinel = 1024, 150, 256, 200
    B = 9 if kernel8 else 3
    if kernel8:
        monkeypatch.setattr(prr, "KERNEL8_ENABLED", True)

    cases = [
        _packed_case(rng, n, n_runs, n - 128 * (i % 4), sentinel)
        for i in range(B)
    ]
    skey = jnp.stack([c[0] for c in cases])
    pxy = jnp.stack([c[1] for c in cases])
    pz = jnp.stack([c[2] for c in cases])
    quantum = cases[0][4]

    f = lambda k, a, b: sorted_run_reduce(  # noqa: E731
        k, (a, b), sentinel, cap, group=8, quantum=quantum,
        use_pallas=True, interpret=True,
    )
    vals_b, num_b = jax.vmap(f)(skey, pxy, pz)
    for b in range(B):
        vals_1, num_1 = sorted_run_reduce(
            skey[b], (pxy[b], pz[b]), sentinel, cap, group=8,
            quantum=quantum, use_pallas=False,
        )
        assert int(num_b[b]) == int(num_1)
        kk = min(int(num_1), cap)
        assert np.array_equal(np.asarray(vals_b)[b, :kk], np.asarray(vals_1)[:kk])
        gt, n_true = _ground_truth(skey[b], cases[b][3], sentinel, cap)
        assert int(num_1) == n_true
        got = np.asarray(vals_1)[:kk]
        assert np.array_equal(got[:, 0], gt[:kk, 0])
        assert np.array_equal(got[:, 4], gt[:kk, 4])
        np.testing.assert_allclose(got[:, 1:4], gt[:kk, 1:4], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize(
    "packed,group,flush",
    [
        (False, 4, 512),   # flush == window: no remainder tier
        (True, 4, 512),
        (False, 8, 256),   # flush < window: 2w remainder tier fires
        (True, 8, 256),
    ],
)
def test_two_window_kernel_bitwise_vs_one_window(packed, group, flush, monkeypatch):
    """The 2-windows-per-step kernel (unbatched fullscale path) must be
    bitwise equal to the 1-row kernel AND the fallback: identical window
    scans; window b's carry-in is window a's adjusted last row — the same
    value the sequential chain forwards."""
    from pointcloud_obstacle_processing_tpu.ops import pallas_runreduce as prr

    rng = np.random.default_rng(55 + packed + group)
    n, n_runs, cap, sentinel = 4096, 700, 1024, 800
    if packed:
        skey, pxy, pz, _, quantum = _packed_case(rng, n, n_runs, 3900, sentinel)
        offs, q = (pxy, pz), quantum
    else:
        skey, offs = _case(rng, n, n_runs, 3900, sentinel)
        q = None

    monkeypatch.setattr(prr, "KERNEL2W_ENABLED", False)
    vals_1w, num_1w = sorted_run_reduce(
        skey, offs, sentinel, cap, group=group, flush=flush, quantum=q,
        use_pallas=True, interpret=True,
    )
    monkeypatch.setattr(prr, "KERNEL2W_ENABLED", True)
    vals_2w, num_2w = sorted_run_reduce(
        skey, offs, sentinel, cap, group=group, flush=flush, quantum=q,
        use_pallas=True, interpret=True,
    )
    vals_f, num_f = sorted_run_reduce(
        skey, offs, sentinel, cap, group=group, quantum=q, use_pallas=False
    )
    assert int(num_2w) == int(num_1w) == int(num_f)
    k = min(int(num_f), cap)
    assert np.array_equal(np.asarray(vals_2w)[:k], np.asarray(vals_1w)[:k])
    assert np.array_equal(np.asarray(vals_2w)[:k], np.asarray(vals_f)[:k])


def test_two_window_capacity_overflow_keeps_prefix():
    """Overflow through the 2w path: ascending-prefix survival and a true
    num, same contract as the 1-row kernel."""
    rng = np.random.default_rng(9)
    sentinel = 2000
    skey, offs = _case(rng, 2048, 1900, 2048, sentinel)  # group 8 -> steps 2
    cap = 128
    vals_p, num_p = sorted_run_reduce(
        skey, offs, sentinel, cap, group=8, use_pallas=True, interpret=True
    )
    vals_f, num_f = sorted_run_reduce(
        skey, offs, sentinel, cap, group=8, use_pallas=False
    )
    gt, n_runs_true = _ground_truth(skey, offs, sentinel, cap)
    assert int(num_p) == int(num_f) == n_runs_true > cap
    assert np.array_equal(np.asarray(vals_p)[:cap], np.asarray(vals_f)[:cap])
    assert np.array_equal(np.asarray(vals_f)[:cap, 0], gt[:cap, 0])


def test_two_window_kernel_skipped_for_odd_steps(monkeypatch):
    """An odd step count cannot pair windows: dispatch must stay on the
    1-row kernel (proved by making the 2w launcher explode)."""
    from pointcloud_obstacle_processing_tpu.ops import pallas_runreduce as prr

    def _boom(*a, **k):
        raise AssertionError("2w launcher must not be called for odd steps")

    monkeypatch.setattr(prr, "_pallas_batched2w", _boom)
    rng = np.random.default_rng(12)
    sentinel = 100
    skey, offs = _case(rng, 3 * 1024, 80, 2500, sentinel)  # group 8 -> steps 3
    vals_p, num_p = sorted_run_reduce(
        skey, offs, sentinel, 128, group=8, use_pallas=True, interpret=True
    )
    vals_f, num_f = sorted_run_reduce(
        skey, offs, sentinel, 128, group=8, use_pallas=False
    )
    assert int(num_p) == int(num_f)
    k = min(int(num_f), 128)
    assert np.array_equal(np.asarray(vals_p)[:k], np.asarray(vals_f)[:k])


def test_capacity_overflow_keeps_prefix():
    """More runs than capacity: the first ``capacity`` runs in ascending
    key order survive and num reports the true total (the voxel stage's
    overflow flag feeds off it)."""
    rng = np.random.default_rng(3)
    sentinel = 1000
    skey, offs = _case(rng, 1024, 900, 1024, sentinel)
    cap = 64
    vals_p, num_p = sorted_run_reduce(
        skey, offs, sentinel, cap, group=8, use_pallas=True, interpret=True
    )
    vals_f, num_f = sorted_run_reduce(
        skey, offs, sentinel, cap, group=8, use_pallas=False
    )
    gt, n_runs_true = _ground_truth(skey, offs, sentinel, cap)
    assert int(num_p) == int(num_f) == n_runs_true > cap
    assert np.array_equal(np.asarray(vals_p)[:cap], np.asarray(vals_f)[:cap])
    assert np.array_equal(np.asarray(vals_f)[:cap, 0], gt[:cap, 0])


def test_all_invalid():
    skey = jnp.full((1024,), 99, jnp.int32)
    offs = jnp.zeros((3, 1024), jnp.float32)
    for use_pallas in (True, False):
        vals, num = sorted_run_reduce(
            skey, offs, 99, 32, group=8, use_pallas=use_pallas, interpret=use_pallas
        )
        assert int(num) == 0


@pytest.mark.parametrize("kernel2w", [False, True])
def test_counts_channel_matches_two_pass_and_ones(kernel2w, monkeypatch):
    """The 4-buffer counts-channel layout (the merge path,
    merge_voxel_partials): (a) counts of all-ones is BITWISE equal to the
    3-buffer form on both the kernel and the fallback; (b) arbitrary
    integer counts reproduce the two-pass construction (a second reduce
    over (cnt, cnt, cnt)) exactly — integer-valued f32 segmented sums are
    order-exact; (c) kernel == fallback bitwise."""
    import pointcloud_obstacle_processing_tpu.ops.pallas_runreduce as rr

    if not kernel2w:
        monkeypatch.setattr(rr, "KERNEL2W_ENABLED", False)
    rng = np.random.default_rng(5)
    n, n_runs, n_valid, cap, sentinel = 2048, 160, 1500, 256, 10**6
    skey, offs = _case(rng, n, n_runs, n_valid, sentinel)
    counts = np.zeros(n, np.float32)
    counts[:n_valid] = rng.integers(1, 50, n_valid).astype(np.float32)
    counts = jnp.asarray(counts)
    bufs4 = (offs[0], offs[1], offs[2], counts)

    # (a) all-ones counts == implicit-ones form, bitwise, both paths
    ones = jnp.where(skey < sentinel, 1.0, 0.0)
    for use_pallas in (True, False):
        v3, n3 = sorted_run_reduce(
            skey, offs, sentinel, cap, group=8,
            use_pallas=use_pallas, interpret=use_pallas,
        )
        v1, n1 = sorted_run_reduce(
            skey, (offs[0], offs[1], offs[2], ones), sentinel, cap, group=8,
            use_pallas=use_pallas, interpret=use_pallas,
        )
        m3 = np.arange(cap) < int(n3)
        np.testing.assert_array_equal(np.asarray(v3)[m3], np.asarray(v1)[m3])
        assert int(n3) == int(n1)

    # (b) arbitrary counts: single 4-buffer pass == two-pass construction
    vk, nk = sorted_run_reduce(
        skey, bufs4, sentinel, cap, group=8, use_pallas=True, interpret=True,
    )
    vf, nf = sorted_run_reduce(
        skey, bufs4, sentinel, cap, group=8, use_pallas=False,
    )
    mk = np.arange(cap) < int(nk)
    np.testing.assert_array_equal(np.asarray(vk)[mk], np.asarray(vf)[mk])  # (c)
    assert int(nk) == int(nf)
    v_sums, _ = sorted_run_reduce(
        skey, offs, sentinel, cap, group=8, use_pallas=False
    )
    v_cnts, _ = sorted_run_reduce(
        skey, (counts, counts, counts), sentinel, cap, group=8, use_pallas=False
    )
    m = np.arange(cap) < int(nf)
    np.testing.assert_array_equal(
        np.asarray(vk)[m, :4], np.asarray(v_sums)[m, :4]  # key + 3 sums
    )
    np.testing.assert_array_equal(
        np.asarray(vk)[m, 4], np.asarray(v_cnts)[m, 1]  # counts channel
    )

    # vmap with counts routes onto the generic kernel and stays equal to
    # per-row fallback runs
    kb = jnp.stack([skey, skey])
    bb = tuple(jnp.stack([b, b]) for b in bufs4)
    vb, nb = jax.vmap(
        lambda k, a, b, c, d: sorted_run_reduce(
            k, (a, b, c, d), sentinel, cap, group=8,
            use_pallas=True, interpret=True,
        )
    )(kb, *bb)
    np.testing.assert_array_equal(np.asarray(vb[0])[mk], np.asarray(vk)[mk])
    assert int(nb[0]) == int(nk)
