"""End-to-end tests for the lossl_coord flagship: lossless round trip through
the real rANS bitstream, and a decreasing training loss (SURVEY §4 strategy:
correctness == exact reconstruction)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastpcc_tpu.models.lossl_coord import Config
from fastpcc_tpu.models.lossl_coord.model import Model, _bucket, sp_pad_codes
from fastpcc_tpu.ops.morton import np_morton_encode

pytestmark = pytest.mark.slow  # model e2e: heavy compile + train


def _random_cloud(n, res, seed):
    rng = np.random.default_rng(seed)
    # surface-ish cloud: points near a sphere shell (structured, compressible)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    r = res * 0.4 * (1 + 0.05 * rng.normal(size=(n, 1)))
    xyz = np.clip(v * r + res / 2, 0, res - 1).astype(np.int32)
    return np.unique(xyz, axis=0)


def _small_cfg(**kw):
    cfg = Config()
    cfg.channels = 16
    cfg.max_stride = 64
    cfg.max_stride_wo_recurrent = 16
    cfg.fea_stride = 4
    cfg.coord_bits = 8
    cfg.coder_lanes = 8
    for k, v in kw.items():
        setattr(cfg, k, v)
    cfg.check()
    return cfg


@pytest.mark.parametrize('cfg_kw', [
    dict(),                                          # MS(2) + OSP mix
    dict(fea_stride=16, max_stride_wo_recurrent=32,
         max_stride=128),                            # MS(4)+MS(3)+MS(2) chains
    dict(fea_stride=2),                              # pure OSP ladder
    dict(device_coder=False),                        # reference-style host coder
    dict(fea_stride=2, feature_propagation=False),   # wo_fea_prop ablation
])
def test_roundtrip_lossless(cfg_kw):
    cfg = _small_cfg(**cfg_kw)
    model = Model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    xyz = _random_cloud(800, 256, seed=0)
    blob = model.compress(params, xyz)
    recon = model.decompress(params, blob)
    recon_sorted = recon[np.lexsort(recon.T[::-1])]
    xyz_sorted = xyz[np.lexsort(xyz.T[::-1])]
    np.testing.assert_array_equal(recon_sorted, xyz_sorted)
    assert len(blob) > 0
    bpp = len(blob) * 8 / len(xyz)
    assert bpp < 48  # untrained, but far below raw 3*8 bits/axis


def test_device_loopback_roundtrip():
    """Encode + backward-decode entirely on device must be lossless and
    agree with the host-flushed bitstream size scale."""
    cfg = _small_cfg()
    model = Model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    xyz = _random_cloud(700, 256, seed=9)
    recon, ok, nbytes = model.device_roundtrip(params, xyz)
    assert ok, 'device loopback not lossless'
    recon_sorted = recon[np.lexsort(recon.T[::-1])]
    xyz_sorted = xyz[np.lexsort(xyz.T[::-1])]
    np.testing.assert_array_equal(recon_sorted, xyz_sorted)
    blob = model.compress(params, xyz)
    # loopback byte estimate excludes the host-coded bottom coords
    assert 0.3 * len(blob) < nbytes < 1.5 * len(blob)


def test_train_loss_decreases():
    import optax
    cfg = _small_cfg()
    model = Model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    xyz = _random_cloud(500, 256, seed=1)
    codes = np.unique(np_morton_encode(xyz.astype(np.int64)))
    cap = _bucket(len(codes))
    codes_j = jnp.asarray(sp_pad_codes(codes, cap))
    count = jnp.int32(len(codes))
    pn = jnp.asarray([len(codes)], jnp.float32)

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        (loss, ld), grads = jax.value_and_grad(
            lambda p: model.train_loss(p, codes_j, count, pn),
            has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses
    assert np.isfinite(losses).all()


def test_trained_model_compresses_better():
    """After a few steps of training on a cloud, its bitstream must shrink."""
    import optax
    cfg = _small_cfg()
    model = Model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    xyz = _random_cloud(800, 256, seed=2)
    blob0 = model.compress(params, xyz)

    codes = np.unique(np_morton_encode(xyz.astype(np.int64)))
    cap = _bucket(len(codes))
    codes_j = jnp.asarray(sp_pad_codes(codes, cap))
    count, pn = jnp.int32(len(codes)), jnp.asarray([len(codes)], jnp.float32)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        (_, _), grads = jax.value_and_grad(
            lambda p: model.train_loss(p, codes_j, count, pn),
            has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state

    for _ in range(15):
        params, opt_state = step(params, opt_state)

    blob1 = model.compress(params, xyz)
    recon = model.decompress(params, blob1)
    assert len(recon) == len(xyz)
    assert len(blob1) < len(blob0)


def test_sticky_caps_no_recompile_across_samples():
    """Dataset-stable static shapes (round-2 'weak #3'): after the first
    (largest) cloud sets the per-scale capacities, every later cloud that
    fits reuses the SAME compiled mega programs — a multi-scan test pass
    pays one compile, not one per sample."""
    cfg = _small_cfg()
    model = Model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    big = _random_cloud(900, 256, seed=5)
    small = _random_cloud(240, 256, seed=6)

    blob_big = model.compress(params, big)
    caps_after_big = model._sticky_caps
    blob_small = model.compress(params, small)
    assert model._sticky_caps == caps_after_big, \
        'smaller cloud must reuse the sticky capacities'
    assert model._mega_encode._cache_size() == 1, \
        'second sample must not retrace the mega encoder'

    for xyz, blob in ((big, blob_big), (small, blob_small)):
        recon = model.decompress(params, blob)
        recon_sorted = recon[np.lexsort(recon.T[::-1])]
        np.testing.assert_array_equal(recon_sorted,
                                      xyz[np.lexsort(xyz.T[::-1])])
    assert model._mega_decode._cache_size() == 1, \
        'decoder shapes come from the header -> single trace as well'


def test_batched_frame_loopback_roundtrip():
    """Batched-frame throughput mode (bench.py --batch): two frames packed
    via the code high bits through ONE roundtrip program must be lossless,
    with batch separation preserved down to scale 0."""
    cfg = _small_cfg()
    model = Model(cfg)
    model.batch_hint = 2
    params = model.init_params(jax.random.PRNGKey(0))
    parts = []
    for b in range(2):
        xyz = _random_cloud(500 + 100 * b, 256, seed=20 + b)
        c = np.unique(np_morton_encode(xyz.astype(np.int64)))
        parts.append(c | (np.int64(b) << (3 * cfg.coord_bits)))
    codes_np = np.sort(np.concatenate(parts))
    cap = _bucket(len(codes_np))
    caps = model._scale_caps(codes_np, cap)
    rt = jax.jit(model._traced_roundtrip, static_argnums=(3,))
    _, ok, nbytes = rt(params, jnp.asarray(sp_pad_codes(codes_np, cap)),
                       jnp.int32(len(codes_np)), caps)
    assert bool(ok), 'batched loopback not lossless'
    assert int(nbytes) > 0
