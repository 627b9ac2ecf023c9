"""Morton codes + sparse voxel-grid op tests (vs numpy references)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastpcc_tpu.ops import (
    morton_encode, morton_decode, INVALID_CODE, VoxelGrid,
    downsample_with_bins, build_neighbor_table, octant_symbols,
    symbols_to_bins, expand_children, ancestor_gather_dense, pad_to,
)
from fastpcc_tpu.ops.sparse import pack_codes, sparse_conv_apply, gather_padded


def _np_morton_ref(xyz):
    """Bit-by-bit reference: x at bit 2, y at 1, z at 0 per level."""
    out = np.zeros(len(xyz), dtype=np.int64)
    for level in range(21):
        out |= ((xyz[:, 0].astype(np.int64) >> level) & 1) << (3 * level + 2)
        out |= ((xyz[:, 1].astype(np.int64) >> level) & 1) << (3 * level + 1)
        out |= ((xyz[:, 2].astype(np.int64) >> level) & 1) << (3 * level + 0)
    return out


def test_morton_roundtrip_and_reference():
    rng = np.random.default_rng(0)
    xyz = rng.integers(0, 2 ** 21, (1000, 3)).astype(np.int64)
    codes = np.asarray(morton_encode(jnp.asarray(xyz)))
    np.testing.assert_array_equal(codes, _np_morton_ref(xyz))
    back = np.asarray(morton_decode(jnp.asarray(codes)))
    np.testing.assert_array_equal(back, xyz)


def test_morton_order_matches_lexicographic_xyz():
    # Sorting by inverse-morton code == sorting by (x-major bit interleave):
    # same parent (coords >> 1) groups must be contiguous.
    rng = np.random.default_rng(1)
    xyz = rng.integers(0, 64, (500, 3)).astype(np.int64)
    codes = np.asarray(morton_encode(jnp.asarray(xyz)))
    order = np.argsort(codes)
    parents = np.asarray(morton_encode(jnp.asarray(xyz[order] >> 1)))
    # parent codes must be non-decreasing in child order
    assert (np.diff(parents) >= 0).all()


def _make_grid(xyz, bits=8, capacity=None, batch=None):
    codes = np.asarray(pack_codes(jnp.asarray(xyz), None if batch is None
                                  else jnp.asarray(batch), bits))
    codes = np.unique(codes)
    n = capacity or len(codes)
    padded = np.full((n,), np.asarray(INVALID_CODE), dtype=np.int64)
    padded[:len(codes)] = codes
    return jnp.asarray(padded), len(codes)


def test_downsample_matches_numpy():
    rng = np.random.default_rng(2)
    xyz = rng.integers(0, 256, (300, 3))
    codes, cnt = _make_grid(xyz, bits=8, capacity=400)
    grid, bins, c2p = downsample_with_bins(codes, jnp.int32(cnt), bits=8)
    codes_np = np.asarray(codes)[:cnt]
    parents_expected = np.unique(codes_np >> 3)
    m = int(grid.count)
    assert m == len(parents_expected)
    np.testing.assert_array_equal(np.asarray(grid.codes)[:m], parents_expected)
    # bins: occupancy of each parent's 8 octants
    bins_np = np.asarray(bins)[:m]
    for i, p in enumerate(parents_expected):
        children = codes_np[(codes_np >> 3) == p]
        expected = np.zeros(8)
        expected[children & 7] = 1
        np.testing.assert_array_equal(bins_np[i], expected)
    # child_to_parent maps each child to its parent row
    c2p_np = np.asarray(c2p)[:cnt]
    np.testing.assert_array_equal(np.asarray(grid.codes)[c2p_np], codes_np >> 3)


def test_downsample_respects_batch_packing():
    # two samples occupying the same spatial voxel must not merge
    xyz = np.array([[0, 0, 0], [0, 0, 1], [0, 0, 0], [1, 1, 1]])
    batch = np.array([0, 0, 1, 1])
    codes, cnt = _make_grid(xyz, bits=4, capacity=8, batch=batch)
    grid, bins, _ = downsample_with_bins(codes, jnp.int32(cnt), bits=4)
    assert int(grid.count) == 2  # one parent per sample
    b = (np.asarray(grid.codes)[:2] >> 12)
    np.testing.assert_array_equal(b, [0, 1])


def test_octant_symbol_roundtrip():
    rng = np.random.default_rng(3)
    bins = (rng.random((100, 8)) < 0.5)
    bins[bins.sum(1) == 0, 0] = True  # every parent has >= 1 child
    syms = octant_symbols(jnp.asarray(bins, jnp.float32))
    assert (np.asarray(syms) >= 0).all() and (np.asarray(syms) <= 254).all()
    back = symbols_to_bins(syms)
    np.testing.assert_array_equal(np.asarray(back), bins)


def test_symbol_bit_layout_matches_reference():
    # occupancy only in octant 0 (offset 0,0,0) -> symbol = (1 << 7) - 1
    bins = np.zeros((1, 8), np.float32)
    bins[0, 0] = 1
    assert int(octant_symbols(jnp.asarray(bins))[0]) == 127
    bins = np.zeros((1, 8), np.float32)
    bins[0, 7] = 1  # offset (1,1,1) -> lowest bit
    assert int(octant_symbols(jnp.asarray(bins))[0]) == 0


def test_expand_children_inverts_downsample():
    rng = np.random.default_rng(4)
    xyz = rng.integers(0, 128, (200, 3))
    codes, cnt = _make_grid(xyz, bits=8, capacity=256)
    grid, bins, _ = downsample_with_bins(codes, jnp.int32(cnt), bits=8)
    child, p_of_c, oct_of_c = expand_children(
        grid.codes, grid.count, jnp.asarray(bins, bool), bits=8, capacity=256)
    n = int(child.count)
    assert n == cnt
    np.testing.assert_array_equal(np.asarray(child.codes)[:n],
                                  np.asarray(codes)[:cnt])
    # parent/octant maps reconstruct the child code
    pc = np.asarray(grid.codes)[np.asarray(p_of_c)[:n]]
    oc = np.asarray(oct_of_c)[:n]
    np.testing.assert_array_equal((pc << 3) | oc, np.asarray(codes)[:cnt])


def test_neighbor_table_matches_bruteforce():
    rng = np.random.default_rng(5)
    xyz = rng.integers(0, 16, (100, 3))
    codes, cnt = _make_grid(xyz, bits=6, capacity=128)
    table = np.asarray(build_neighbor_table(codes, jnp.int32(cnt), bits=6,
                                            scale_bits=6))
    codes_np = np.asarray(codes)
    coords = np.asarray(morton_decode(jnp.asarray(codes_np)))
    offs = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)]
    lookup = {tuple(coords[i]): i for i in range(cnt)}
    for i in range(cnt):
        for k, off in enumerate(offs):
            tgt = tuple(coords[i] + np.array(off))
            expected = lookup.get(tgt, 128)
            if min(tgt) < 0 or max(tgt) >= 64:
                expected = 128
            assert table[i, k] == expected, (i, k, off)
    # padding rows all miss
    assert (table[cnt:] == 128).all()


def test_sparse_conv_matches_dense_conv():
    """Sparse 3^3 conv == dense conv3d evaluated at occupied voxels."""
    rng = np.random.default_rng(6)
    size = 8
    occ = rng.random((size, size, size)) < 0.3
    xyz = np.argwhere(occ)
    cin, cout = 3, 5
    feats_dense = rng.normal(size=(size, size, size, cin)).astype(np.float32)
    feats_dense[~occ] = 0.0
    w = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1

    codes, cnt = _make_grid(xyz, bits=4, capacity=xyz.shape[0])
    coords = np.asarray(morton_decode(jnp.asarray(codes)))[:cnt]
    feats = jnp.asarray(feats_dense[coords[:, 0], coords[:, 1], coords[:, 2]])
    table = build_neighbor_table(codes, jnp.int32(cnt), bits=4, scale_bits=4)
    out = np.asarray(sparse_conv_apply(feats, table, jnp.asarray(w)))

    # numpy dense reference
    offs = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)]
    for i in range(cnt):
        expected = np.zeros(cout, np.float32)
        for k, (dx, dy, dz) in enumerate(offs):
            p = coords[i] + np.array([dx, dy, dz])
            if (p < 0).any() or (p >= size).any() or not occ[tuple(p)]:
                continue
            expected += feats_dense[tuple(p)] @ w[k]
        np.testing.assert_allclose(out[i], expected, rtol=1e-4, atol=1e-4)


def test_ancestor_gather_dense():
    rng = np.random.default_rng(7)
    xyz = rng.integers(0, 32, (100, 3))
    codes, cnt = _make_grid(xyz, bits=6, capacity=128)
    feats = jnp.asarray(rng.normal(size=(128, 4)).astype(np.float32))
    # two levels of downsampling -> ancestors at stride 4
    g1, _, _ = downsample_with_bins(codes, jnp.int32(cnt), bits=6)
    g2, _, _ = downsample_with_bins(g1.codes, g1.count, bits=6, stride_log2=1)
    dense = np.asarray(ancestor_gather_dense(
        codes, jnp.int32(cnt), feats, g2.codes, bits=6, levels=2))
    codes_np, anc_np = np.asarray(codes), np.asarray(g2.codes)
    for i in range(cnt):
        row = np.searchsorted(anc_np, codes_np[i] >> 6)
        off = codes_np[i] & 63
        np.testing.assert_array_equal(dense[row, off], np.asarray(feats)[i])
    # total mass preserved
    assert np.isclose(dense.sum(), np.asarray(feats)[:cnt].sum(), rtol=1e-5)


def test_gather_padded_zero_row():
    feats = jnp.asarray(np.ones((4, 2), np.float32))
    out = gather_padded(feats, jnp.asarray([0, 4, 2]))
    np.testing.assert_array_equal(np.asarray(out),
                                  [[1, 1], [0, 0], [1, 1]])


def test_child_table_from_parent_matches_search():
    """Parent-propagated neighbor tables must equal the searchsorted ones
    (including range-boundary misses and batch separation)."""
    import numpy as np
    from fastpcc_tpu.ops import sparse as sp
    from fastpcc_tpu.ops.morton import np_morton_encode
    rng = np.random.default_rng(0)
    bits, scale_bits = 8, 5     # child scale: coords < 2^5
    cap = 1024
    for trial in range(3):
        xyz = rng.integers(0, 1 << scale_bits, size=(600, 3)).astype(np.int64)
        batch = rng.integers(0, 2, size=(600,)).astype(np.int64)
        codes = np.unique((batch << (3 * bits))
                          | np_morton_encode(xyz << (bits - scale_bits))
                          >> (3 * (bits - scale_bits))
                          | (batch << (3 * bits)))
        codes = np.unique((batch << (3 * bits)) | np_morton_encode(xyz))
        n = len(codes)
        codes_j = jnp.asarray(np.pad(codes, (0, cap - n),
                                     constant_values=1 << 62))
        count = jnp.int32(n)
        parent, bins, c2p = sp.downsample_with_bins(codes_j, count, bits, 0)
        octant = (codes_j & 7).astype(jnp.int32)
        parent_table = sp.build_neighbor_table(parent.codes, parent.count,
                                               bits, scale_bits - 1)
        fast = sp.child_table_from_parent(parent_table, c2p, octant, count)
        ref = sp.build_neighbor_table(codes_j, count, bits, scale_bits)
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(ref))


def test_sparse_conv_branch_regimes():
    """All three conv branches (center-only / compacted correction / full)
    produce the exact per-tap result. nhit is swept across the K = N//8
    compaction budget boundary."""
    rng = np.random.default_rng(8)
    n, cin, cout = 64, 4, 6
    w = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
    feats_np = rng.normal(size=(n, cin)).astype(np.float32)
    kcap = n // 8

    for nhit in (0, 1, kcap - 1, kcap, kcap + 1, n // 2, n):
        table_np = np.full((n, 27), n, np.int64)
        table_np[:, 13] = np.arange(n)
        hit_rows = rng.choice(n, size=nhit, replace=False)
        for r in hit_rows:
            taps = rng.choice([t for t in range(27) if t != 13],
                              size=rng.integers(1, 4), replace=False)
            table_np[r, taps] = rng.integers(0, n, size=len(taps))
        out = np.asarray(sparse_conv_apply(
            jnp.asarray(feats_np), jnp.asarray(table_np), jnp.asarray(w)))
        expected = np.zeros((n, cout), np.float32)
        for t in range(27):
            src = table_np[:, t]
            g = np.where((src < n)[:, None], feats_np[np.minimum(src, n - 1)],
                         0.0)
            expected += g @ w[t]
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5,
                                   err_msg=f'nhit={nhit}')


def test_sparse_conv_gradients_across_branches():
    """Gradients w.r.t. feats and weights agree between the compacted
    sparse-correction branch and a reference full accumulation."""
    rng = np.random.default_rng(9)
    n, c = 32, 3
    w = jnp.asarray(rng.normal(size=(27, c, c)).astype(np.float32) * 0.1)
    feats = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    table_np = np.full((n, 27), n, np.int64)
    table_np[:, 13] = np.arange(n)
    table_np[3, 0] = 7
    table_np[3, 22] = 1   # nhit=1 -> sparse-correction branch
    table = jnp.asarray(table_np)

    def loss(f, ww):
        return jnp.sum(sparse_conv_apply(f, table, ww) ** 2)

    def loss_ref(f, ww):
        padded = jnp.concatenate([f, jnp.zeros((1, c))], axis=0)
        acc = sum(padded[table[:, t]] @ ww[t] for t in range(27))
        return jnp.sum(acc ** 2)

    gf, gw = jax.grad(loss, argnums=(0, 1))(feats, w)
    gf_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-5)


def test_windowed_pallas_conv_matches_xla_path():
    """fast=True (Pallas windowed kernel + compacted far correction,
    interpret mode on CPU) == fast=False per-tap XLA path while far rows
    fit the correction capacity (nfar <= N//4). Beyond that the fast conv
    TRUNCATES the correction (cond-free by libtpu necessity, see
    sparse_conv_apply): a deterministic approximation, asserted bit-stable
    across calls rather than equal to the exact path."""
    rng = np.random.default_rng(11)
    n, cin, cout = 512, 128, 128
    feats = jnp.asarray(rng.normal(size=(n, cin)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(27, cin, cout)) * 0.05, jnp.bfloat16)
    for far_frac in (0.0, 0.1, 0.6):
        table_np = np.full((n, 27), n, np.int64)
        table_np[:, 13] = np.arange(n)
        # dense near hits (forces past the compacted-correction branch) ...
        for r in range(n):
            taps = rng.choice([t for t in range(27) if t != 13], size=8,
                              replace=False)
            table_np[r, taps] = np.clip(
                r + rng.integers(-100, 100, size=8), 0, n - 1)
        # ... plus far rows referencing the other end of the array
        far_rows = rng.choice(n, size=int(n * far_frac), replace=False)
        for r in far_rows:
            table_np[r, rng.integers(0, 13)] = (r + n // 2) % n
        table = jnp.asarray(table_np)
        ref = np.asarray(sparse_conv_apply(feats, table, w, fast=False),
                         np.float32)
        out = np.asarray(sparse_conv_apply(feats, table, w, fast=True),
                         np.float32)
        scale = np.abs(ref).max() + 1e-9
        if far_frac <= 0.25:
            err = np.abs(out - ref).max() / scale
            assert err < 2e-2, (far_frac, err)
        else:
            # truncation regime (nfar > N//4): the correction covers the
            # first N//4 far rows in ascending row order; those rows plus
            # every non-far row must still MATCH the exact path — only
            # rows past the cap may diverge (and at least one must, or
            # this regime wasn't exercised).
            from fastpcc_tpu.ops.pallas_conv import far_mask
            rowfar = np.asarray(far_mask(table, n).any(axis=1))
            far_rows = np.flatnonzero(rowfar)
            covered = np.ones(n, bool)
            covered[far_rows[n // 4:]] = False
            err_cov = (np.abs(out - ref)[covered].max() / scale)
            assert err_cov < 2e-2, (far_frac, err_cov)
            err_trunc = np.abs(out - ref)[~covered].max() / scale
            assert err_trunc > 2e-2, \
                'truncation regime not exercised (all rows matched exact)'
            # codec-soundness: repeated traces are the identical function
            out2 = np.asarray(sparse_conv_apply(feats, table, w, fast=True),
                              np.float32)
            np.testing.assert_array_equal(out, out2)


def test_windowed_conv_narrow_channels_pad_into_kernel():
    """fast=True at ch32/ch64 (below the 128-lane grid) rides the Pallas
    kernel via the pad-to-128 shim and matches the XLA path."""
    rng = np.random.default_rng(13)
    for cin, cout in ((32, 32), (64, 64), (32, 64)):
        n = 512
        feats = jnp.asarray(rng.normal(size=(n, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(27, cin, cout)) * 0.05, jnp.bfloat16)
        table_np = np.full((n, 27), n, np.int64)
        table_np[:, 13] = np.arange(n)
        for r in range(n):
            taps = rng.choice([t for t in range(27) if t != 13], size=8,
                              replace=False)
            table_np[r, taps] = np.clip(
                r + rng.integers(-100, 100, size=8), 0, n - 1)
        far_rows = rng.choice(n, size=n // 10, replace=False)
        for r in far_rows:
            table_np[r, rng.integers(0, 13)] = (r + n // 2) % n
        table = jnp.asarray(table_np)
        ref = np.asarray(sparse_conv_apply(feats, table, w, fast=False),
                         np.float32)
        out = np.asarray(sparse_conv_apply(feats, table, w, fast=True),
                         np.float32)
        scale = np.abs(ref).max() + 1e-9
        assert np.abs(out - ref).max() / scale < 2e-2, (cin, cout)


def test_corr_conv_matches_exact_within_budget():
    """fast='corr' (cond-free center + compacted correction, the sparse-
    scale routing of the round-5 plan) equals the exact path while
    nhit <= N//8; beyond the budget only uncovered hit rows may diverge."""
    rng = np.random.default_rng(21)
    n, cin, cout = 256, 16, 16
    kcap = n // 8
    feats = jnp.asarray(rng.normal(size=(n, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1)
    for nhit in (0, 1, kcap, kcap + 5, n // 2):
        table_np = np.full((n, 27), n, np.int64)
        table_np[:, 13] = np.arange(n)
        hit_rows = np.sort(rng.choice(n, size=nhit, replace=False))
        for r in hit_rows:
            taps = rng.choice([t for t in range(27) if t != 13],
                              size=2, replace=False)
            table_np[r, taps] = rng.integers(0, n, size=2)
        table = jnp.asarray(table_np)
        ref = np.asarray(sparse_conv_apply(feats, table, w, fast=False))
        out = np.asarray(sparse_conv_apply(feats, table, w, fast='corr'))
        covered = np.ones(n, bool)
        covered[hit_rows[kcap:]] = False   # ascending-order budget
        np.testing.assert_allclose(out[covered], ref[covered],
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f'nhit={nhit}')
        if nhit > kcap:
            assert np.abs(out[~covered] - ref[~covered]).max() > 1e-4, \
                'truncation regime not exercised'
        # determinism across calls (encoder == decoder function)
        out2 = np.asarray(sparse_conv_apply(feats, table, w, fast='corr'))
        np.testing.assert_array_equal(out, out2)


def test_child_table_static_trivial_matches_runtime():
    """static_trivial True/False must reproduce the runtime cond's two
    branches exactly (the round-5 host-planned triviality)."""
    import numpy as np
    from fastpcc_tpu.ops import sparse as sp
    from fastpcc_tpu.ops.morton import np_morton_encode
    rng = np.random.default_rng(5)
    bits, scale_bits = 8, 5
    cap = 1024
    xyz = rng.integers(0, 1 << scale_bits, size=(500, 3)).astype(np.int64)
    codes = np.unique(np_morton_encode(xyz))
    n = len(codes)
    codes_j = jnp.asarray(np.pad(codes, (0, cap - n),
                                 constant_values=1 << 62))
    count = jnp.int32(n)
    parent, bins, c2p = sp.downsample_with_bins(codes_j, count, bits, 0)
    octant = (codes_j & 7).astype(jnp.int32)
    parent_table = sp.build_neighbor_table(parent.codes, parent.count,
                                           bits, scale_bits - 1)
    full = sp.child_table_from_parent(parent_table, c2p, octant, count,
                                      parent.count, static_trivial=False)
    ref = sp.build_neighbor_table(codes_j, count, bits, scale_bits)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(ref))
    triv = np.asarray(sp.child_table_from_parent(
        parent_table, c2p, octant, count, parent.count, static_trivial=True))
    expect = np.full((cap, 27), cap, np.int32)
    expect[:n, 13] = np.arange(n)
    np.testing.assert_array_equal(triv, expect)


def test_windowed_conv_unqualified_shapes_fall_back():
    """fast=True with non-qualifying shapes/dtype must silently produce the
    XLA-path result (no Pallas, no shape assert)."""
    rng = np.random.default_rng(12)
    for n, c, dt in ((384, 128, jnp.bfloat16),
                     (512, 128, jnp.float32)):
        feats = jnp.asarray(rng.normal(size=(n, c)), dt)
        w = jnp.asarray(rng.normal(size=(27, c, c)) * 0.05, dt)
        table_np = np.full((n, 27), n, np.int64)
        table_np[:, 13] = np.arange(n)
        for r in range(n):
            table_np[r, rng.integers(0, 27, size=6)] = rng.integers(0, n, 6)
        table = jnp.asarray(table_np)
        ref = np.asarray(sparse_conv_apply(feats, table, w, fast=False),
                         np.float32)
        out = np.asarray(sparse_conv_apply(feats, table, w, fast=True),
                         np.float32)
        np.testing.assert_allclose(out, ref, rtol=2e-2, atol=1e-2)


def test_windowed_conv_small_window_geometry(monkeypatch):
    """The round-5 small-window geometry (blk=128, margin=64 — selected by
    window_plan at full-resolution caps) matches the exact path while far
    rows fit the correction, with far_mask derived from the same plan."""
    from fastpcc_tpu.ops import pallas_conv as pc
    monkeypatch.setattr(pc, 'window_plan', lambda n: 128)
    rng = np.random.default_rng(17)
    n, cin, cout = 512, 128, 128
    feats = jnp.asarray(rng.normal(size=(n, cin)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(27, cin, cout)) * 0.05, jnp.bfloat16)
    table_np = np.full((n, 27), n, np.int64)
    table_np[:, 13] = np.arange(n)
    for r in range(n):
        taps = rng.choice([t for t in range(27) if t != 13], size=8,
                          replace=False)
        # offsets up to +-60: mostly within the 64-row margin
        table_np[r, taps] = np.clip(r + rng.integers(-60, 60, size=8),
                                    0, n - 1)
    # plus ~n/8 explicit far rows so the correction path is exercised
    for r in rng.choice(n, size=n // 8, replace=False):
        table_np[r, rng.integers(0, 13)] = (r + n // 2) % n
    table = jnp.asarray(table_np)
    rowfar = np.asarray(pc.far_mask(table, n).any(axis=1))
    assert 0 < rowfar.sum() <= n // 4, rowfar.sum()
    ref = np.asarray(sparse_conv_apply(feats, table, w, fast=False),
                     np.float32)
    out = np.asarray(sparse_conv_apply(feats, table, w, fast=True),
                     np.float32)
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(out - ref).max() / scale < 2e-2


def test_ancestor_rows_dense_narrow_scatter():
    """The k3>8 narrow-scatter formulation (rows anc*8+hi, lo-block one-hot)
    must equal direct accumulation into [M, k3, C]."""
    from fastpcc_tpu.ops import sparse as sp
    rng = np.random.default_rng(3)
    n, cap, levels = 512, 256, 2
    k3 = 1 << (3 * levels)
    codes = np.sort(rng.choice(1 << 20, size=n, replace=False)).astype(np.int64)
    count = 400
    feats = rng.normal(size=(n, 8)).astype(np.float32)
    anc_rows = np.sort(rng.integers(0, cap, size=n)).astype(np.int32)
    out = np.asarray(sp.ancestor_rows_dense(
        jnp.asarray(codes), jnp.int32(count), jnp.asarray(feats),
        jnp.asarray(anc_rows), cap, levels))
    ref = np.zeros((cap, k3, 8), np.float32)
    for i in range(count):
        if anc_rows[i] < cap:
            ref[anc_rows[i], codes[i] & (k3 - 1)] += feats[i]
    np.testing.assert_allclose(out, ref, rtol=1e-6)
