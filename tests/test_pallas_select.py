"""Fused octant-select-dense kernel == the XLA masked-GEMM chain
(nn/blocks.py::OctantSelectDense), bit-for-bit in interpret mode."""
import os.path as osp
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from fastpcc_tpu.ops.pallas_select import octant_select_dense


def test_octant_select_dense_matches_xla():
    rng = np.random.default_rng(7)
    n, cin, ch = 512, 128, 128
    g = jnp.asarray(rng.normal(size=(n, cin)), jnp.bfloat16)
    octant = jnp.asarray(rng.integers(0, 8, size=n).astype(np.int32))
    k = jnp.asarray(rng.normal(size=(cin, 8 * ch)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(8 * ch,)) * 0.1, jnp.float32)
    kd, bd = k.astype(g.dtype), b.astype(g.dtype)
    out_ref = None
    for o in range(8):
        y = jax.lax.dot(g, kd[:, o * ch:(o + 1) * ch],
                        preferred_element_type=jnp.float32).astype(g.dtype)
        y = y + bd[o * ch:(o + 1) * ch]
        m = (octant == o)[:, None]
        out_ref = jnp.where(m, y, 0.0 if out_ref is None else out_ref)
    got = octant_select_dense(g, octant, k, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_ref, np.float32),
                                  np.asarray(got, np.float32))


def test_lut_select_matches_indexing():
    from fastpcc_tpu.ops.pallas_select import lut_select_pallas
    rng = np.random.default_rng(9)
    n = 512
    for in_w, out_w in ((27, 8), (64, 27)):
        x = jnp.asarray(rng.integers(0, 1 << 20, size=(n, in_w)),
                        jnp.int32)
        octant = jnp.asarray(rng.integers(0, 8, size=n), jnp.int32)
        lut = rng.integers(0, in_w, size=(8, out_w)).astype(np.int32)
        got = np.asarray(lut_select_pallas(x, octant, lut, interpret=True))
        xn, on = np.asarray(x), np.asarray(octant)
        ref = np.take_along_axis(
            xn, lut[on], axis=1)
        np.testing.assert_array_equal(got, ref)


def test_child_table_kernel_path_matches_xla():
    """child_table_from_parent with the pallas lane-select kernels (fast
    scope + static_trivial=False) must equal the XLA masked-matmul path."""
    from fastpcc_tpu.ops import sparse as sp
    from fastpcc_tpu.ops.morton import np_morton_encode
    rng = np.random.default_rng(11)
    bits, scale_bits = 8, 5
    cap = 1024
    xyz = rng.integers(0, 1 << scale_bits, size=(700, 3)).astype(np.int64)
    codes = np.unique(np_morton_encode(xyz))
    n = len(codes)
    codes_j = jnp.asarray(np.pad(codes, (0, cap - n),
                                 constant_values=1 << 62))
    count = jnp.int32(n)
    parent, bins, c2p = sp.downsample_with_bins(codes_j, count, bits, 0)
    octant = (codes_j & 7).astype(jnp.int32)
    parent_table = sp.build_neighbor_table(parent.codes, parent.count,
                                           bits, scale_bits - 1)
    ref = np.asarray(sp.child_table_from_parent(
        parent_table, c2p, octant, count, parent.count,
        static_trivial=False))
    with sp.fast_conv_scope(True):
        got = np.asarray(sp.child_table_from_parent(
            parent_table, c2p, octant, count, parent.count,
            static_trivial=False))
    np.testing.assert_array_equal(got, ref)
