"""Pallas CDF kernel vs the jnp reference (interpret mode on CPU)."""
import sys
import os.path as osp

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from fastpcc_tpu.ops.pallas_cdf import cdf_rows_pallas
from fastpcc_tpu.models.lossl_coord.model import _cdf_rows


def test_pallas_cdf_matches_reference_interpret():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((512, 255)).astype(np.float32) * 4)
    ref = np.asarray(_cdf_rows(logits))
    got = np.asarray(cdf_rows_pallas(logits, interpret=True))
    assert ref.shape == got.shape and ref.dtype == got.dtype
    # interpret mode runs the same float ops as XLA CPU -> exact agreement
    assert (ref == got).mean() > 0.999
    # structural invariants that the coder relies on
    assert (got[:, -1] == 65535).all()
    q = np.diff(got.astype(np.int64), axis=1)
    assert (q >= 1).all(), 'every symbol needs freq >= 1'
