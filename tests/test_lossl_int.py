"""lossl_coord_int: integer-only deterministic decode (reference:
models/convolutional/lossl_coord_int/model.py:28-353).

The guarantee under test: after PTQ conversion, compress->decompress is
LOSSLESS and every CDF the coder sees is computed with integer-only ops —
bit-identical on any backend."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fastpcc_tpu.models.lossl_coord import Config
from fastpcc_tpu.models.lossl_coord.model import Model as FloatModel
from fastpcc_tpu.models.lossl_coord_int import Model as IntModel, convert
from fastpcc_tpu.ops.morton import np_morton_encode

pytestmark = pytest.mark.slow  # model e2e: heavy compile + train


def _cloud(n, res, seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    r = res * 0.4 * (1 + 0.05 * rng.normal(size=(n, 1)))
    return np.unique(np.clip(v * r + res / 2, 0, res - 1).astype(np.int32),
                     axis=0)


def _cfg():
    cfg = Config()
    cfg.channels = 16
    cfg.max_stride = 64
    cfg.max_stride_wo_recurrent = 16
    cfg.fea_stride = 2           # OneScalePredictor ladder (int-supported)
    cfg.coord_bits = 8
    cfg.coder_lanes = 8
    cfg.check()
    return cfg


def test_int_model_lossless_roundtrip():
    cfg = _cfg()
    fm = FloatModel(cfg)
    params = fm.init_params(jax.random.PRNGKey(0))
    calib = [_cloud(500, 256, seed=9)]
    im, iparams = IntModel.from_float(fm, params, calib)

    xyz = _cloud(700, 256, seed=1)
    blob = im.compress(iparams, xyz)
    recon = im.decompress(iparams, blob)
    recon_sorted = recon[np.lexsort(recon.T[::-1])]
    xyz_sorted = xyz[np.lexsort(xyz.T[::-1])]
    np.testing.assert_array_equal(recon_sorted, xyz_sorted)
    bpp = len(blob) * 8 / len(xyz)
    assert bpp < 48


def test_int_model_rate_close_to_float():
    """PTQ should not blow up the rate (reference validates ~equal rate,
    kitti_ford_test_int_r*.yaml)."""
    cfg = _cfg()
    fm = FloatModel(cfg)
    params = fm.init_params(jax.random.PRNGKey(0))
    xyz = _cloud(700, 256, seed=2)
    im, iparams = IntModel.from_float(fm, params, [xyz])
    b_float = fm.compress(params, xyz)
    b_int = im.compress(iparams, xyz)
    assert len(b_int) < 1.3 * len(b_float) + 64
    recon = im.decompress(iparams, b_int)
    assert len(recon) == len(xyz)


def _cfg_ms():
    """Shipped-flagship topology at test scale: fea_stride=16 gives three
    multi-step chains (k=4,3,2) + a no-upsample OSP under the OSP ladder
    (reference: config/convolutional/lossl_coord/kitti_ford.yaml)."""
    cfg = Config()
    cfg.channels = 16
    cfg.max_stride = 128
    cfg.max_stride_wo_recurrent = 64
    cfg.fea_stride = 16
    cfg.coord_bits = 8
    cfg.coder_lanes = 8
    cfg.check()
    return cfg


def test_int_model_ms_chains_lossless_roundtrip():
    """The int path must quantize the ACTUAL flagship topology (multi-step
    predictor chains), not only OSP ladders (round-2 gap)."""
    cfg = _cfg_ms()
    fm = FloatModel(cfg)
    params = fm.init_params(jax.random.PRNGKey(0))
    calib = [_cloud(500, 256, seed=9)]
    im, iparams = IntModel.from_float(fm, params, calib)

    xyz = _cloud(700, 256, seed=4)
    blob = im.compress(iparams, xyz)
    recon = im.decompress(iparams, blob)
    recon_sorted = recon[np.lexsort(recon.T[::-1])]
    xyz_sorted = xyz[np.lexsort(xyz.T[::-1])]
    np.testing.assert_array_equal(recon_sorted, xyz_sorted)

    b_float = fm.compress(params, xyz)
    assert len(blob) < 1.3 * len(b_float) + 64


def test_int_cdfs_are_integer_deterministic():
    """Two independent jit instances must produce byte-identical streams."""
    cfg = _cfg()
    fm = FloatModel(cfg)
    params = fm.init_params(jax.random.PRNGKey(0))
    xyz = _cloud(400, 256, seed=3)
    im1, iparams = IntModel.from_float(fm, params, [xyz])
    im2 = IntModel(cfg)
    b1 = im1.compress(iparams, xyz)
    b2 = im2.compress(iparams, xyz)
    assert b1 == b2
