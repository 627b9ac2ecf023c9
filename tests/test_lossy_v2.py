"""lossy_coord_v2 (reference: models/convolutional/lossy_coord_v2): geo part
must be lossless (coords + bounded residual ints), e2e lossy round trip runs
deterministically, training loss decreases."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastpcc_tpu.models.lossy_coord_v2 import Config, Model
from fastpcc_tpu.models.lossy_coord_v2.model import _bucket, sp_pad
from fastpcc_tpu.ops.morton import np_morton_encode

pytestmark = pytest.mark.slow  # model e2e: heavy compile + train


def _cloud(n, res, seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    r = res * 0.4 * (1 + 0.05 * rng.normal(size=(n, 1)))
    return np.unique(np.clip(v * r + res / 2, 0, res - 1).astype(np.int32),
                     axis=0)


def _cfg(**kw):
    cfg = Config()
    cfg.coord_bits = 8
    cfg.encoder_channels = (8, 16)
    cfg.decoder_channels = (8,)
    cfg.geo_lossl_if_sample = (0, 1, 0, 1)
    cfg.geo_lossl_channels = (16, 32, 32, 32, 1)
    cfg.compressed_channels = (1,)
    cfg.skip_encoding_fea = 1
    cfg.bottleneck_value_bound = 8
    cfg.em_tail_range = 8
    cfg.coder_lanes = 8
    cfg.geo_cap_shrink_log2 = 0     # generous static caps for tiny inputs
    for k, v in kw.items():
        setattr(cfg, k, v)
    cfg.check()
    return cfg


def test_v2_e2e_roundtrip():
    cfg = _cfg()
    model = Model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    xyz = _cloud(600, 256, seed=0)
    blob = model.compress(params, xyz)
    recon = model.decompress(params, blob)
    assert recon.shape[1] == 3
    assert 0.3 * len(xyz) < len(recon) < 3.0 * len(xyz)
    recon2 = model.decompress(params, blob)
    np.testing.assert_array_equal(recon, recon2)
    bpp = len(blob) * 8 / len(xyz)
    assert bpp < 300


def test_v2_geo_part_lossless():
    """The geo pyramid's coordinates at the bottleneck scale must decode
    exactly (the lossy part is only the final generative upsample)."""
    cfg = _cfg()
    model = Model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    xyz = _cloud(500, 256, seed=1)
    codes_np = np.unique(np_morton_encode(xyz.astype(np.int64)))
    n = len(codes_np)
    cap = _bucket(n)
    out = model._jit_encode({'params': params},
                            jnp.asarray(sp_pad(codes_np, cap)),
                            jnp.int32(n), cfg.coord_bits, cap,
                            model.compute_dtype)
    (bptr, buf, res_row, bottom_coords, count_b, _e_coords, _e_count,
     targets, ok) = out
    assert bool(ok)
    from fastpcc_tpu.ops import ilv_rans as ir
    blob = ir.stream_to_bytes(bptr, buf, cfg.coder_lanes)

    # expected: scale-1 codes (encoder has one downsample)
    exp_e = np.unique(codes_np >> 3)
    # bottom scale = 1 + number of sampled geo steps
    s_b = 1 + sum(cfg.geo_lossl_if_sample)
    exp_b = np.unique(codes_np >> (3 * s_b))
    assert int(count_b) == len(exp_b)
    np.testing.assert_array_equal(np.asarray(bottom_coords)[:len(exp_b)],
                                  _decode_morton(exp_b))

    from fastpcc_tpu.models.lossy_coord_v2.model import _cap_of
    cap_b = _cap_of(cap, s_b, cfg)
    words, _, _ = ir.bytes_to_stream(
        blob, ir.word_capacity_for(8 * cap, cfg.coder_lanes), cfg.coder_lanes)
    bcodes = np.sort(np_morton_encode(_decode_morton(exp_b).astype(np.int64)))
    codes_e, count_e, fea_e = model._jit_decode(
        {'params': params}, words,
        jnp.asarray(np.asarray(res_row)),
        jnp.asarray(sp_pad(bcodes, cap_b)), jnp.int32(len(exp_b)),
        cfg.coord_bits, cap, model.compute_dtype)
    assert int(count_e) == len(exp_e)
    np.testing.assert_array_equal(np.asarray(codes_e)[:len(exp_e)], exp_e)
    assert np.isfinite(np.asarray(fea_e)[:len(exp_e)]).all()


def _decode_morton(codes):
    from fastpcc_tpu.ops.morton import masked_decode
    import jax.numpy as jnp
    return np.asarray(masked_decode(jnp.asarray(codes), 16))


def test_v2_train_loss_decreases():
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
    for i in range(8):
        params, opt_state, loss = step(params, opt_state, jnp.int32(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_gpcc_variant_roundtrip():
    """coord_mode='gpcc_raw' (the gpcc_lossy_coord_v2 variant): scale-E
    coordinates travel raw/G-PCC, no mask streams; geometry above the normal
    part must reconstruct exactly from them."""
    from fastpcc_tpu.models.gpcc_lossy_coord_v2 import Config as GConfig, \
        Model as GModel
    cfg = GConfig()
    cfg.coord_bits = 8
    cfg.encoder_channels = (8, 16)
    cfg.decoder_channels = (8,)
    cfg.geo_lossl_if_sample = (0, 1, 0, 1)
    cfg.geo_lossl_channels = (16, 32, 32, 32, 1)
    cfg.compressed_channels = (1,)
    cfg.skip_encoding_fea = 1
    cfg.bottleneck_value_bound = 8
    cfg.em_tail_range = 8
    cfg.coder_lanes = 8
    cfg.geo_cap_shrink_log2 = 0
    cfg.check()
    assert cfg.coord_mode == 'gpcc_raw'
    model = GModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    xyz = _cloud(500, 256, seed=3)
    blob = model.compress(params, xyz)
    recon = model.decompress(params, blob)
    assert 0.3 * len(xyz) < len(recon) < 3.0 * len(xyz)
    recon2 = model.decompress(params, blob)
    np.testing.assert_array_equal(recon, recon2)
