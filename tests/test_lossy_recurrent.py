"""lossy_coord with the recurrent lossless-based EM (em_mode='lossless_based',
reference: models/convolutional/lossy_coord/geo_lossl_em.py:20-400).

Core invariant: the recurrent part is LOSSLESS — the decoder must rebuild the
stride-8 coordinates exactly and the bottleneck features bit-identically from
the word stream alone (no side channels)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastpcc_tpu.models.lossy_coord import Config
from fastpcc_tpu.models.lossy_coord.model import (Model, _bucket, _rec_cap,
                                                  sp_pad)
from fastpcc_tpu.ops import ilv_rans as ir
from fastpcc_tpu.ops.morton import np_morton_encode

pytestmark = pytest.mark.slow  # model e2e: heavy compile + train


def _cloud(n, res, seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    r = res * 0.4 * (1 + 0.05 * rng.normal(size=(n, 1)))
    xyz = np.clip(v * r + res / 2, 0, res - 1).astype(np.int32)
    return np.unique(xyz, axis=0)


def _cfg(**kw):
    cfg = Config()
    cfg.coord_bits = 8
    cfg.em_mode = 'lossless_based'
    cfg.compressed_channels = 4
    cfg.recurrent_part_channels = 8
    cfg.encoder_channels = (4, 4, 8, 8)
    cfg.decoder_channels = (8, 8, 4)
    cfg.basic_block_num = 1
    cfg.lossless_coord_indexes_range = (4, 4)
    cfg.prior_indexes_range = (4, 4)
    cfg.lossless_fea_num_filters = (1, 2, 1)
    cfg.em_tail_range = 8
    cfg.coder_lanes = 8
    cfg.rec_capacity_div = 1
    cfg.rec_cand_factor = 8
    for k, v in kw.items():
        setattr(cfg, k, v)
    cfg.check()
    return cfg


@pytest.mark.parametrize('hybrid', [False, True])
def test_recurrent_em_lossless_roundtrip(hybrid):
    cfg = _cfg(hybrid_hyper_decoder_fea=hybrid)
    model = Model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    xyz = _cloud(600, 256, seed=0)
    codes_np = np.unique(np_morton_encode(xyz.astype(np.int64)))
    n = len(codes_np)
    cap = _bucket(n)
    rec_cap = _rec_cap(cap, cfg)
    codes = jnp.asarray(sp_pad(codes_np, cap))

    bptr, buf, ok, targets = model._jit_rec_encode(
        {'params': params}, codes, jnp.int32(n), cfg.coord_bits,
        model.compute_dtype, rec_cap)
    assert bool(ok)
    blob = ir.stream_to_bytes(bptr, buf, cfg.coder_lanes)
    words, _, _ = ir.bytes_to_stream(
        blob, model._rec_word_capacity(rec_cap), cfg.coder_lanes)
    codes3_d, count3_d, y3_d = model._jit_rec_decode(
        {'params': params}, words, cfg.coord_bits, model.compute_dtype,
        rec_cap)

    exp_codes3 = np.unique(codes_np >> 9)       # three stride-2 downsamples
    assert int(count3_d) == len(exp_codes3)
    np.testing.assert_array_equal(np.asarray(codes3_d)[:len(exp_codes3)],
                                  exp_codes3)
    y3 = np.asarray(y3_d)[:len(exp_codes3)]
    assert np.isfinite(y3).all()
    if not hybrid:
        # decoded features are exactly the rounded transmitted symbols
        np.testing.assert_array_equal(y3, np.round(y3))
    else:
        # hybrid adds the hyper-decoded float prediction
        assert np.abs(y3).max() > 0


def test_lossless_based_e2e():
    cfg = _cfg()
    model = Model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    xyz = _cloud(600, 256, seed=1)
    blob = model.compress(params, xyz)
    recon = model.decompress(params, blob)
    assert recon.shape[1] == 3
    # adaptive pruning steers output count to the transmitted target
    assert 0.5 * len(xyz) < len(recon) < 2.0 * len(xyz)
    recon2 = model.decompress(params, blob)
    np.testing.assert_array_equal(recon, recon2)   # deterministic decode
    bpp = len(blob) * 8 / len(xyz)
    assert bpp < 200


def test_lossless_based_train_loss_decreases():
    import optax
    cfg = _cfg()
    model = Model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    xyz = _cloud(500, 256, seed=2)
    codes_np = np.unique(np_morton_encode(xyz.astype(np.int64)))
    cap = _bucket(len(codes_np))
    codes = jnp.asarray(sp_pad(codes_np, cap))
    count = jnp.int32(len(codes_np))
    pn = jnp.asarray([float(len(codes_np))], jnp.float32)

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, i):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: model.train_loss(p, codes, count, pn, step=i),
            has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(15):
        params, opt_state, loss = step(params, opt_state, jnp.int32(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # step 0 can be a lucky-low init transient; compare to the early peak
    assert losses[-1] < max(losses[:5]) - 1e-3, losses
