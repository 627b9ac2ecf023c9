"""lossy_coord_v3 (reference: models/convolutional/lossy_coord_v3):
per-scale latents + mixed lossless/lossy upsampling with top-k selection."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastpcc_tpu.models.lossy_coord_v3 import Config, Model
from fastpcc_tpu.models.lossy_coord.model import _bucket, sp_pad
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
    cfg.channels = 8
    cfg.compressed_channels = 1
    cfg.num_latents = (0, 1)
    cfg.lossl_geo_upsample = (0, 1)
    cfg.max_stride = 16
    cfg.latent_bound = 8
    cfg.coord_bits = 8
    cfg.em_tail_range = 8
    cfg.coder_lanes = 8
    for k, v in kw.items():
        setattr(cfg, k, v)
    cfg.check()
    return cfg


def test_v3_all_lossless_roundtrip_exact():
    """With every scale lossless, v3 must reconstruct exactly (the latents
    only help the prediction)."""
    cfg = _cfg(lossl_geo_upsample=(1, 1), num_latents=(0, 1))
    model = Model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    xyz = _cloud(600, 256, seed=0)
    blob = model.compress(params, xyz)
    recon = model.decompress(params, blob)
    recon_sorted = recon[np.lexsort(recon.T[::-1])]
    xyz_sorted = xyz[np.lexsort(xyz.T[::-1])]
    np.testing.assert_array_equal(recon_sorted, xyz_sorted)


def test_v3_lossy_roundtrip_budgeted():
    cfg = _cfg()
    model = Model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    xyz = _cloud(600, 256, seed=1)
    blob = model.compress(params, xyz)
    recon = model.decompress(params, blob)
    assert recon.shape[1] == 3
    # top-k decode emits ~ the transmitted point budget
    assert 0.5 * len(xyz) <= len(recon) <= 2.0 * len(xyz)
    recon2 = model.decompress(params, blob)
    np.testing.assert_array_equal(recon, recon2)
    bpp = len(blob) * 8 / len(xyz)
    assert bpp < 200


def test_v3_train_loss_decreases():
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
    assert losses[-1] < max(losses[:5]) - 1e-3, losses
