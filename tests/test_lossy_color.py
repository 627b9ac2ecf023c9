"""lossy_coord_lossy_color (reference:
models/convolutional/lossy_coord_lossy_color): joint geometry+color round
trip, KNN recolor semantics, training convergence."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastpcc_tpu.models.lossy_coord_lossy_color import Config, Model
from fastpcc_tpu.models.lossy_coord_lossy_color.network import \
    sample_wise_recolor
from fastpcc_tpu.models.lossy_coord.model import _bucket, sp_pad
from fastpcc_tpu.ops.morton import np_morton_encode

pytestmark = pytest.mark.slow  # model e2e: heavy compile + train


def _cloud(n, res, seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    r = res * 0.4 * (1 + 0.05 * rng.normal(size=(n, 1)))
    xyz = np.unique(np.clip(v * r + res / 2, 0, res - 1).astype(np.int32),
                    axis=0)
    color = rng.integers(0, 256, size=(len(xyz), 3)).astype(np.float32)
    return xyz, color


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
    cfg.geo_cap_shrink_log2 = 0
    cfg.recolor_k = 4
    for k, v in kw.items():
        setattr(cfg, k, v)
    cfg.check()
    return cfg


def test_recolor_exact_and_interp():
    """Exact coordinate matches copy the target color; identical clouds
    recolor to exactly the target colors."""
    rng = np.random.default_rng(0)
    xyz = rng.integers(0, 64, size=(100, 3)).astype(np.float32)
    xyz = np.unique(xyz, axis=0)
    rgb = rng.integers(0, 256, size=(len(xyz), 3)).astype(np.float32)
    m = 128
    pred = jnp.asarray(np.pad(xyz, ((0, m - len(xyz)), (0, 0)),
                              constant_values=1e6))
    tgt = jnp.asarray(np.pad(xyz, ((0, m - len(xyz)), (0, 0)),
                             constant_values=1e6))
    trgb = jnp.asarray(np.pad(rgb, ((0, m - len(xyz)), (0, 0))))
    out = sample_wise_recolor(pred, jnp.int32(len(xyz)), tgt,
                              jnp.int32(len(xyz)), trgb, k=4)
    np.testing.assert_allclose(np.asarray(out)[:len(xyz)], rgb, atol=1e-3)


@pytest.mark.parametrize('yuv', [False, True])
def test_color_train_loss_decreases(yuv):
    import optax
    cfg = _cfg(use_yuv_loss=yuv)
    model = Model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    xyz, color = _cloud(400, 256, seed=1)
    codes_np, first = np.unique(np_morton_encode(xyz.astype(np.int64)),
                                return_index=True)
    cap = _bucket(len(codes_np))
    codes = jnp.asarray(sp_pad(codes_np, cap))
    colors = jnp.asarray(np.pad(color[first], ((0, cap - len(codes_np)),
                                               (0, 0))))
    count = jnp.int32(len(codes_np))
    pn = jnp.asarray([float(len(codes_np))], jnp.float32)

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, i):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: model.train_loss(p, codes, count, colors, pn, step=i),
            has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(10):
        params, opt_state, loss = step(params, opt_state, jnp.int32(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < max(losses[:4]) - 1e-3, losses


def test_color_e2e_roundtrip():
    cfg = _cfg()
    model = Model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    xyz, color = _cloud(500, 256, seed=2)
    blob = model.compress(params, xyz, color)
    recon_xyz, recon_rgb = model.decompress(params, blob)
    assert recon_xyz.shape[1] == 3 and recon_rgb.shape[1] == 3
    assert 0.2 * len(xyz) < len(recon_xyz) < 4.0 * len(xyz)
    assert (recon_rgb >= 0).all() and (recon_rgb <= 255).all()
    r2 = model.decompress(params, blob)
    np.testing.assert_array_equal(recon_xyz, r2[0])
    np.testing.assert_array_equal(recon_rgb, r2[1])
