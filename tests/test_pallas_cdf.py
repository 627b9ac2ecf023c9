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


def test_fused_enc_pairs_matches_two_step_interpret():
    """enc_pairs_pallas == _enc_pairs(cdf_rows_pallas(logits), syms) bit-for-
    bit (the encoder's word-coder inputs must be the exact pairs the
    decoder's table search reproduces)."""
    from fastpcc_tpu.ops.pallas_cdf import enc_pairs_pallas
    from fastpcc_tpu.models.lossl_coord.model import _enc_pairs
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((512, 255)).astype(np.float32) * 4)
    syms = jnp.asarray(rng.integers(0, 255, size=512).astype(np.int32))
    # force the edge symbols into the batch
    syms = syms.at[0].set(0).at[1].set(254).at[2].set(253)
    cdfs = cdf_rows_pallas(logits, interpret=True)
    ref_start, ref_freq = _enc_pairs(cdfs, syms)
    got_start, got_freq = enc_pairs_pallas(logits, syms, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref_start), np.asarray(got_start))
    np.testing.assert_array_equal(np.asarray(ref_freq), np.asarray(got_freq))
