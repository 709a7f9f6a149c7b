"""Property suite for the CGL moment-block buffer stack.

Coverage model: the reference's ``tests/adaptation/test_metric_buffers.py``
(2,045 LoC) pins merge exactness under every policy; this file covers the
same CASES as properties — merge == batch over the union (dense and
diagonal), associativity, empty absorption, streaming == two-pass, and a
policy grid where every buffer's ``get_moments`` is checked against numpy
moments over exactly the rows its retention semantics promise.

Tolerances are f32-safe (the file runs in both the x64 and the
``BJT_TEST_X64=0`` passes — see ``tests/F32.md``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu.adaptation.metric_buffers import (
    MomentBlock,
    accumulating_split_pop_buffer,
    cgl_merge_two,
    cgl_update_batch,
    diag_from_moment_block,
    ensemble_batch_buffer,
    late_start,
    merge_block_ring,
    raw_draw_ring_buffer,
    reset_window_buffer,
)

D = 5
RTOL = 1e-4  # f32-safe; CGL is numerically stable at these sizes


def _np_block(rows: np.ndarray, diagonal: bool) -> MomentBlock:
    """Two-pass numpy reference moments over ``rows``."""
    n = rows.shape[0]
    if n == 0:
        z = np.zeros(D)
        return MomentBlock(0.0, z, z if diagonal else np.zeros((D, D)))
    mean = rows.mean(0)
    c = rows - mean
    m2 = (c**2).sum(0) if diagonal else c.T @ c
    return MomentBlock(float(n), mean, m2)


def _block_of(rows, diagonal):
    b = _np_block(np.asarray(rows), diagonal)
    return MomentBlock(
        jnp.asarray(b.count), jnp.asarray(b.mean), jnp.asarray(b.m2)
    )


def _assert_block_close(got: MomentBlock, want: MomentBlock):
    np.testing.assert_allclose(float(got.count), float(want.count), rtol=0)
    np.testing.assert_allclose(
        np.asarray(got.mean), np.asarray(want.mean), rtol=RTOL, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.m2), np.asarray(want.m2), rtol=RTOL, atol=1e-5
    )


def _rows(key, n):
    return 2.0 + jax.random.normal(key, (n, D)) * jnp.arange(1.0, D + 1.0)


# -------------------------------------------------------------------------
# merge algebra
# -------------------------------------------------------------------------


@pytest.mark.parametrize("diagonal", [False, True])
@pytest.mark.parametrize("na,nb", [(1, 1), (1, 50), (37, 13), (100, 100)])
def test_cgl_merge_equals_union(rng_key, diagonal, na, nb):
    ka, kb = jax.random.split(rng_key)
    a, b = _rows(ka, na), _rows(kb, nb)
    merged = cgl_merge_two(_block_of(a, diagonal), _block_of(b, diagonal))
    _assert_block_close(merged, _np_block(np.concatenate([a, b]), diagonal))


@pytest.mark.parametrize("diagonal", [False, True])
def test_cgl_merge_associative_and_symmetric(rng_key, diagonal):
    ka, kb, kc = jax.random.split(rng_key, 3)
    A = _block_of(_rows(ka, 11), diagonal)
    B = _block_of(_rows(kb, 29), diagonal)
    C = _block_of(_rows(kc, 5), diagonal)
    left = cgl_merge_two(cgl_merge_two(A, B), C)
    right = cgl_merge_two(A, cgl_merge_two(B, C))
    _assert_block_close(left, right)
    _assert_block_close(cgl_merge_two(A, B), cgl_merge_two(B, A))


@pytest.mark.parametrize("diagonal", [False, True])
@pytest.mark.parametrize("side", ["left", "right", "both"])
def test_cgl_merge_absorbs_empty(rng_key, diagonal, side):
    X = _block_of(_rows(rng_key, 17), diagonal)
    E = _block_of(np.zeros((0, D)), diagonal)
    if side == "left":
        _assert_block_close(cgl_merge_two(E, X), X)
    elif side == "right":
        _assert_block_close(cgl_merge_two(X, E), X)
    else:
        got = cgl_merge_two(E, E)
        assert float(got.count) == 0.0
        assert np.all(np.asarray(got.mean) == 0) and np.all(np.asarray(got.m2) == 0)


@pytest.mark.parametrize("diagonal", [False, True])
def test_cgl_update_batch_equals_merge_of_batch_block(rng_key, diagonal):
    ka, kb = jax.random.split(rng_key)
    base = _block_of(_rows(ka, 23), diagonal)
    batch = _rows(kb, 9)
    via_update = cgl_update_batch(base, batch)
    via_merge = cgl_merge_two(base, _block_of(batch, diagonal))
    _assert_block_close(via_update, via_merge)


@pytest.mark.parametrize("diagonal", [False, True])
def test_streaming_one_row_at_a_time_equals_two_pass(rng_key, diagonal):
    rows = _rows(rng_key, 64)
    z = jnp.zeros(D)
    block = MomentBlock(jnp.zeros(()), z, z if diagonal else jnp.zeros((D, D)))
    for i in range(rows.shape[0]):
        block = cgl_update_batch(block, rows[i : i + 1])
    _assert_block_close(block, _np_block(np.asarray(rows), diagonal))


@pytest.mark.parametrize("k", [1, 2, 5])
def test_merge_block_ring_equals_sequential(rng_key, k):
    keys = jax.random.split(rng_key, k)
    sizes = [7, 19, 3, 11, 28][:k]
    parts = [_rows(kk, n) for kk, n in zip(keys, sizes)]
    blocks = [_block_of(p, False) for p in parts]
    ring = merge_block_ring(
        jnp.stack([b.count for b in blocks]),
        jnp.stack([b.mean for b in blocks]),
        jnp.stack([b.m2 for b in blocks]),
    )
    _assert_block_close(ring, _np_block(np.concatenate(parts), False))


def test_diag_from_moment_block_edge_counts():
    # count < 2 -> isotropic ones (never 0 or NaN)
    for n in [0, 1]:
        rows = np.random.default_rng(0).normal(size=(n, D))
        blk = _block_of(rows, True)
        np.testing.assert_array_equal(
            np.asarray(diag_from_moment_block(blk)), np.ones(D)
        )
    rows = np.random.default_rng(1).normal(size=(40, D))
    blk = _block_of(rows, True)
    np.testing.assert_allclose(
        np.asarray(diag_from_moment_block(blk)), rows.var(0, ddof=1), rtol=RTOL
    )


# -------------------------------------------------------------------------
# policy grid: get_moments == numpy moments over the retained rows
# -------------------------------------------------------------------------


def _drive(buffer, stream, split_after):
    """Feed ``stream`` (list of (n_i, D) batches), pushing a split after the
    batch indices in ``split_after``. Returns the final state."""
    state = buffer.init()
    for i, batch in enumerate(stream):
        state = buffer.update(state, batch)
        if i in split_after:
            state = buffer.push_split(state)
    return state


@pytest.mark.parametrize("diagonal", [False, True])
def test_reset_window_policy_retains_only_current_split(rng_key, diagonal):
    keys = jax.random.split(rng_key, 6)
    stream = [_rows(k, n) for k, n in zip(keys, [8, 4, 12, 6, 9, 3])]
    buffer = reset_window_buffer(D, diagonal=diagonal)
    # splits after batches 1 and 3 -> retained = batches 4, 5
    state = _drive(buffer, stream, split_after={1, 3})
    retained = np.concatenate([np.asarray(stream[4]), np.asarray(stream[5])])
    _assert_block_close(buffer.get_moments(state), _np_block(retained, diagonal))


@pytest.mark.parametrize("k", [2, 3])
def test_accumulating_policy_forgets_oldest_split(rng_key, k):
    keys = jax.random.split(rng_key, 5)
    stream = [_rows(kk, n) for kk, n in zip(keys, [10, 7, 5, 8, 6])]
    buffer = accumulating_split_pop_buffer(D, k)
    # a split after every batch: 5 completed splits, active block empty.
    state = _drive(buffer, stream, split_after=set(range(5)))
    # ring keeps the ACTIVE slot plus k-1 completed -> last k-1 splits
    retained = np.concatenate([np.asarray(b) for b in stream[-(k - 1) :]])
    _assert_block_close(buffer.get_moments(state), _np_block(retained, False))
    total, per_split = buffer.get_support(state)
    assert float(total) == retained.shape[0]


def test_accumulating_policy_includes_active_block(rng_key):
    keys = jax.random.split(rng_key, 3)
    stream = [_rows(kk, n) for kk, n in zip(keys, [10, 7, 5])]
    buffer = accumulating_split_pop_buffer(D, 2)
    # one split after batch 0: completed = batch 0, active = batches 1+2
    state = _drive(buffer, stream, split_after={0})
    retained = np.concatenate([np.asarray(b) for b in stream])
    _assert_block_close(buffer.get_moments(state), _np_block(retained, False))


def test_ensemble_batch_buffer_folds_snapshots(rng_key):
    n_chains = 16
    keys = jax.random.split(rng_key, 4)
    stream = [_rows(kk, n_chains) for kk in keys]
    buffer = ensemble_batch_buffer(D, n_chains)
    state = _drive(buffer, stream, split_after=set())
    retained = np.concatenate([np.asarray(b) for b in stream])
    _assert_block_close(buffer.get_moments(state), _np_block(retained, False))
    with pytest.raises(ValueError, match="expects batch"):
        buffer.update(state, _rows(rng_key, n_chains - 1))


def test_late_start_skips_transient_rows_each_split(rng_key):
    keys = jax.random.split(rng_key, 6)
    stream = [_rows(kk, 1) for kk in keys]  # one row per update
    inner = reset_window_buffer(D, diagonal=True)
    buffer = late_start(inner, offset_steps=2)
    # no splits: first 2 updates are skipped, rows 2..5 retained
    state = _drive(buffer, stream, split_after=set())
    retained = np.concatenate([np.asarray(b) for b in stream[2:]])
    _assert_block_close(buffer.get_moments(state), _np_block(retained, True))


@pytest.mark.parametrize("capacity,total", [(8, 5), (8, 8), (8, 13), (4, 31)])
def test_raw_draw_ring_window_semantics(rng_key, capacity, total):
    rows = _rows(rng_key, total)
    buffer = raw_draw_ring_buffer(D, capacity)
    state = buffer.init()
    for i in range(total):
        state = buffer.update(state, rows[i])
    kept = np.asarray(rows)[-min(capacity, total) :]
    _assert_block_close(buffer.get_moments(state), _np_block(kept, False))
    n_valid, mask = buffer.get_support(state)
    assert float(n_valid) == min(capacity, total)
    # the exact ring rows (order-insensitive): sorted row sums match
    valid = np.asarray(state.draws)[np.asarray(mask) > 0]
    np.testing.assert_allclose(
        np.sort(valid.sum(1)), np.sort(kept.sum(1)), rtol=RTOL
    )


def test_raw_draw_ring_batch_write_wraps(rng_key):
    buffer = raw_draw_ring_buffer(D, 6)
    state = buffer.init()
    rows = _rows(rng_key, 10)
    state = buffer.update(state, rows[:4])
    state = buffer.update(state, rows[4:8])  # wraps past slot 6
    kept = np.asarray(rows[2:8])
    _assert_block_close(buffer.get_moments(state), _np_block(kept, False))
    with pytest.raises(ValueError, match="exceeds ring capacity"):
        buffer.update(state, _rows(rng_key, 7))


# -------------------------------------------------------------------------
# sharded feed: cgl_update_batch(axis_name=...) pools over the mesh
# -------------------------------------------------------------------------


def test_cgl_update_batch_psum_pooled_matches_global(rng_key):
    from jax.sharding import Mesh, PartitionSpec

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(np.array(jax.devices()[:4]), ("chains",))
    rows = _rows(rng_key, 32)

    def shard_fn(block_rows):
        z = jnp.zeros(D)
        empty = MomentBlock(jnp.zeros(()), z, jnp.zeros((D, D)))
        blk = cgl_update_batch(empty, block_rows, axis_name="chains")
        return blk.count, blk.mean, blk.m2

    count, mean, m2 = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(PartitionSpec("chains"),),
            out_specs=(PartitionSpec(), PartitionSpec(), PartitionSpec()),
        )
    )(rows)
    _assert_block_close(
        MomentBlock(count, mean, m2), _np_block(np.asarray(rows), False)
    )


# -------------------------------------------------------------------------
# degenerate counts (the step-size proxy must see ones, never 0/NaN)
# -------------------------------------------------------------------------


def test_diag_reference_degenerate_counts(rng_key):
    buf = reset_window_buffer(D, diagonal=True)
    state = buf.init()
    # n = 0 and n = 1: isotropic fallback
    np.testing.assert_allclose(np.asarray(buf.get_diag_reference(state)), np.ones(D))
    rows = _rows(rng_key, 3)
    state = buf.update(state, rows[0])
    np.testing.assert_allclose(np.asarray(buf.get_diag_reference(state)), np.ones(D))
    # n = 2: exact Bessel-corrected variance of the two rows
    state = buf.update(state, rows[1])
    expected = np.var(np.asarray(rows[:2]), axis=0, ddof=1)
    np.testing.assert_allclose(
        np.asarray(buf.get_diag_reference(state)), expected, rtol=RTOL, atol=1e-6
    )
    # n = 3: still exact
    state = buf.update(state, rows[2])
    expected = np.var(np.asarray(rows), axis=0, ddof=1)
    np.testing.assert_allclose(
        np.asarray(buf.get_diag_reference(state)), expected, rtol=RTOL, atol=1e-6
    )


def test_diag_from_moment_block_dense_and_diag_agree(rng_key):
    rows = _rows(rng_key, 40)
    dense = diag_from_moment_block(_block_of(rows, diagonal=False))
    diag = diag_from_moment_block(_block_of(rows, diagonal=True))
    np.testing.assert_allclose(np.asarray(dense), np.asarray(diag), rtol=RTOL)


# -------------------------------------------------------------------------
# restart and k=1 degeneracies
# -------------------------------------------------------------------------


def test_restart_cycle_matches_fresh_accumulation(rng_key):
    """Two full push_split cycles on the Stan reset-window buffer: after the
    second reset, moments AND diag reference equal a fresh buffer fed only
    the final rows."""
    k1, k2, k3 = jax.random.split(rng_key, 3)
    buf = reset_window_buffer(D)
    state = buf.init()
    for r in _rows(k1, 10):
        state = buf.update(state, r)
    state = buf.push_split(state)
    for r in _rows(k2, 7):
        state = buf.update(state, r)
    state = buf.push_split(state)
    final_rows = _rows(k3, 9)
    for r in final_rows:
        state = buf.update(state, r)

    fresh = buf.init()
    for r in final_rows:
        fresh = buf.update(fresh, r)
    _assert_block_close(buf.get_moments(state), buf.get_moments(fresh))
    np.testing.assert_allclose(
        np.asarray(buf.get_diag_reference(state)),
        np.asarray(buf.get_diag_reference(fresh)),
        rtol=RTOL,
    )


def test_ring_k1_returns_single_slot(rng_key):
    rows = _rows(rng_key, 12)
    block = _block_of(rows, diagonal=False)
    merged = merge_block_ring(
        block.count[None], block.mean[None], block.m2[None]
    )
    _assert_block_close(merged, block)


def test_accumulating_k1_equals_reset_window(rng_key):
    """k=1 of the rolling window IS the Stan hard reset: identical moments
    through a split cycle."""
    ka, kb = jax.random.split(rng_key)
    acc = accumulating_split_pop_buffer(D, 1)
    rst = reset_window_buffer(D)
    sa, sr = acc.init(), rst.init()
    for r in _rows(ka, 8):
        sa, sr = acc.update(sa, r), rst.update(sr, r)
    sa, sr = acc.push_split(sa), rst.push_split(sr)
    for r in _rows(kb, 6):
        sa, sr = acc.update(sa, r), rst.update(sr, r)
    _assert_block_close(acc.get_moments(sa), rst.get_moments(sr))


# -------------------------------------------------------------------------
# scan-carry stability (buffers live inside lax.scan in the staged engine)
# -------------------------------------------------------------------------


@pytest.mark.parametrize(
    "make_buffer",
    [
        lambda: reset_window_buffer(D),
        lambda: reset_window_buffer(D, diagonal=True),
        lambda: accumulating_split_pop_buffer(D, 3),
        lambda: ensemble_batch_buffer(D, 4),
    ],
    ids=["reset", "reset-diag", "acc3", "ensemble4"],
)
def test_buffer_states_are_scan_stable(rng_key, make_buffer):
    buf = make_buffer()
    # every policy accepts (batch, d) updates; the ensemble buffer REQUIRES
    # its declared batch size, so feed 4-row batches uniformly
    keys = jax.random.split(rng_key, 20)
    rows = jax.vmap(lambda key: _rows(key, 4))(keys)

    def body(state, row):
        return buf.update(state, row), None

    scanned, _ = jax.lax.scan(body, buf.init(), rows)
    sequential = buf.init()
    for i in range(20):
        sequential = buf.update(sequential, rows[i])
    _assert_block_close(buf.get_moments(scanned), buf.get_moments(sequential))


# -------------------------------------------------------------------------
# f32 accuracy golden (run in the x64 pass where the f64 reference exists)
# -------------------------------------------------------------------------


@pytest.mark.x64only
def test_f32_ring_merge_accuracy_vs_f64(rng_key):
    """The CGL combination in f32 must track the f64 reference to ~1e-4
    relative even with a large between-block mean shift (the classic
    catastrophic-cancellation case for naive two-pass merging)."""
    ka, kb = jax.random.split(rng_key)
    rows_a = np.asarray(_rows(ka, 500)) + 1000.0  # large common offset
    rows_b = np.asarray(_rows(kb, 500)) + 1000.0

    def merged(dtype):
        a = _block_of(jnp.asarray(rows_a, dtype), diagonal=False)
        b = _block_of(jnp.asarray(rows_b, dtype), diagonal=False)
        out = cgl_merge_two(
            MomentBlock(*(jnp.asarray(x, dtype) for x in a)),
            MomentBlock(*(jnp.asarray(x, dtype) for x in b)),
        )
        return np.asarray(out.m2, np.float64)

    m2_64 = merged(jnp.float64)
    m2_32 = merged(jnp.float32)
    scale = np.abs(m2_64).max()
    np.testing.assert_allclose(m2_32 / scale, m2_64 / scale, atol=2e-4)


# -------------------------------------------------------------------------
# late-start edges and support totals
# -------------------------------------------------------------------------


def test_late_start_zero_offset_is_identity(rng_key):
    inner = reset_window_buffer(D)
    wrapped = late_start(reset_window_buffer(D), 0)
    si, sw = inner.init(), wrapped.init()
    for r in _rows(rng_key, 10):
        si, sw = inner.update(si, r), wrapped.update(sw, r)
    _assert_block_close(wrapped.get_moments(sw), inner.get_moments(si))


def test_late_start_skip_count_resets_each_split(rng_key):
    ka, kb = jax.random.split(rng_key)
    offset = 3
    buf = late_start(reset_window_buffer(D), offset)
    state = buf.init()
    for r in _rows(ka, 8):
        state = buf.update(state, r)
    state = buf.push_split(state)
    rows2 = _rows(kb, 8)
    for r in rows2:
        state = buf.update(state, r)
    # second split must ALSO have skipped its first `offset` rows
    expected = _block_of(rows2[offset:], diagonal=False)
    _assert_block_close(buf.get_moments(state), expected)


def test_support_totals_across_splits(rng_key):
    buf = accumulating_split_pop_buffer(D, 3)
    state = buf.init()
    sizes = (5, 7, 4)
    for i, n in enumerate(sizes):
        for r in _rows(jax.random.fold_in(rng_key, i), n):
            state = buf.update(state, r)
        if i < len(sizes) - 1:
            state = buf.push_split(state)
    total, per_slot = buf.get_support(state)
    assert float(total) == sum(sizes)
    np.testing.assert_array_equal(np.sort(np.asarray(per_slot)), np.sort(sizes))
