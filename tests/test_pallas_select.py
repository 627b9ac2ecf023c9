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
