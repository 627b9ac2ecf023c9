"""lossy_coord end-to-end: train loss decreases, compress/decompress round
trip produces a valid cloud with bounded distortion and sane bpp."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastpcc_tpu.models.lossy_coord import Config
from fastpcc_tpu.models.lossy_coord.model import Model, _bucket, sp_pad
from fastpcc_tpu.ops.morton import np_morton_encode

pytestmark = pytest.mark.slow  # model e2e: heavy compile + train


def _cfg():
    cfg = Config()
    cfg.encoder_channels = (4, 8, 16, 16)
    cfg.decoder_channels = (16, 8, 4)
    cfg.basic_block_num = 1
    cfg.compressed_channels = 4
    cfg.coord_bits = 8
    cfg.em_tail_range = 16
    cfg.check()
    return cfg


def _cloud(seed, n=600, res=128):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    r = res * 0.4 * (1 + 0.04 * rng.normal(size=(n, 1)))
    return np.unique(np.clip(v * r + res / 2, 0, res - 1).astype(np.int32),
                     axis=0)


@pytest.fixture(scope='module')
def setup():
    cfg = _cfg()
    model = Model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    return cfg, model, params


def test_train_loss_decreases(setup):
    import optax
    cfg, model, params = setup
    xyz = _cloud(0)
    codes = np.unique(np_morton_encode(xyz.astype(np.int64)))
    cap = _bucket(len(codes))
    codes_j = jnp.asarray(sp_pad(codes, cap))
    count = jnp.int32(len(codes))
    pn = jnp.asarray([float(len(codes))], jnp.float32)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, i):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: model.train_loss(p, codes_j, count, pn, step=i),
            has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(15):
        params, opt_state, loss = step(params, opt_state, i)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # step 0 can be a lucky-low init transient; compare against the early peak
    assert losses[-1] < max(losses[:5]) - 1e-3, losses
    assert losses[-1] < losses[4], losses


def test_roundtrip(setup):
    cfg, model, params = setup
    xyz = _cloud(1)
    blob = model.compress(params, xyz)
    recon = model.decompress(params, blob)
    assert len(blob) > 0
    assert recon.shape[1] == 3
    # untrained model: reconstruction must still be a plausible cloud -
    # point count within 3x of target and coords inside the bbox
    assert 0.2 * len(xyz) <= len(recon) <= 3 * len(xyz)
    assert recon.min() >= xyz.min() - 8 and recon.max() <= xyz.max() + 8
    bpp = len(blob) * 8 / len(xyz)
    assert bpp < 60


def test_adaptive_pruning_hits_target(setup):
    cfg, model, params = setup
    xyz = _cloud(2)
    blob = model.compress(params, xyz)
    recon = model.decompress(params, blob)
    # adaptive pruning aims for ~N kept points at the final scale
    # (local-max floor can push it above target)
    assert len(recon) >= 0.5 * len(xyz)


def test_keep_mask_threshold():
    from fastpcc_tpu.models.lossy_coord.model import adaptive_keep_mask
    rng = np.random.default_rng(3)
    codes = np.sort(rng.choice(4096, 300, replace=False)).astype(np.int64)
    cap = 512
    padded = np.full((cap,), (1 << 62), np.int64)
    padded[:300] = codes
    logits = jnp.asarray(rng.normal(size=(cap,)).astype(np.float32))
    keep = adaptive_keep_mask(jnp.asarray(padded), jnp.int32(300), logits,
                              jnp.int32(100), levels=3)
    kept = int(np.asarray(keep).sum())
    # target 100, plus local maxima that fall below threshold
    assert 100 <= kept <= 300
    assert not np.asarray(keep)[300:].any()


def test_hyperprior_mode_roundtrip():
    cfg = _cfg()
    cfg.em_mode = 'hyperprior'
    cfg.hyper_channels = 2
    model = Model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    xyz = _cloud(5)
    # training pass produces finite loss through the hyperprior EM
    import numpy as np
    codes = np.unique(np_morton_encode(xyz.astype(np.int64)))
    cap = _bucket(len(codes))
    loss, aux = model.train_loss(
        params, jnp.asarray(sp_pad(codes, cap)), jnp.int32(len(codes)),
        jnp.asarray([float(len(codes))], jnp.float32))
    assert np.isfinite(float(loss))
    blob = model.compress(params, xyz)
    recon = model.decompress(params, blob)
    assert 0.2 * len(xyz) <= len(recon) <= 3 * len(xyz)


def test_dist_loss_roundtrip_and_train():
    """coord_recon_loss_type='Dist': knn sq-dist regression target
    (reference: generative_upsample.py:144-166) trains and round-trips."""
    import optax
    cfg = _cfg()
    cfg.coord_recon_loss_type = 'Dist'
    cfg.check()
    model = Model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    xyz = _cloud(5)
    codes = np.unique(np_morton_encode(xyz.astype(np.int64)))
    cap = _bucket(len(codes))
    codes_j = jnp.asarray(sp_pad(codes, cap))
    count = jnp.int32(len(codes))
    pn = jnp.asarray([float(len(codes))], jnp.float32)

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: model.train_loss(p, codes_j, count, pn),
            has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(6):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses

    blob = model.compress(params, xyz)
    recon = model.decompress(params, blob)
    assert 0.3 * len(xyz) < len(recon) < 3.0 * len(xyz)
