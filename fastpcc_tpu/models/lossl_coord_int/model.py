"""lossl_coord_int — integer-only deterministic decode of the flagship.

TPU-native rebuild of the reference's int model
(reference: models/convolutional/lossl_coord_int/model.py:28-353): the same
multiscale topology re-run from quantized parameters with integer-only
arithmetic (int8 MXU GEMMs, fixed-point requant, integer softmax->CDF), so
the bitstream decodes bit-identically on ANY backend (CPU/TPU/...) — float
nondeterminism cannot desynchronize encoder and decoder.

The driver (pyramid, scale loop, interleaved word coder) is inherited from
the float flagship; only the NN step hooks change (Model._nn_logits /
_nn_upsample / _nn_cdf / _init_feats).
"""
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from ...ops import sparse as sp
from ...ops.intops import int8_matmul, requant, prelu_int, int_softmax_cdf
from ..lossl_coord.model import Model as FloatModel
from ..lossl_coord.model_config import Config
from .quantize import convert, calibrate


def _gather8(feats8: jax.Array, table: jax.Array) -> jax.Array:
    """int8 row gather with zero rows for misses."""
    padded = jnp.concatenate(
        [feats8, jnp.zeros((1, feats8.shape[1]), jnp.int8)], axis=0)
    return padded[table]


def _qconv(x8, table, pack, with_prelu: bool, out_dtype=jnp.int8):
    n = x8.shape[0]
    k = table.shape[1]
    g = _gather8(x8, table).reshape(n, k * x8.shape[1])
    acc = int8_matmul(g, pack['w8']) + pack['bias_q']
    if with_prelu:
        acc = prelu_int(acc, pack['alpha'])
    return requant(acc, pack['mul'], pack['shift'], out_dtype)


def _qdense(x8, pack, out_dtype=jnp.int8):
    acc = int8_matmul(x8, pack['w8']) + pack['bias_q']
    return requant(acc, pack['mul'], pack['shift'], out_dtype)


def _prelu8(x8, alpha_q15):
    neg = (x8.astype(jnp.int32) * alpha_q15 + (1 << 14)) >> 15
    return jnp.where(x8 >= 0, x8,
                     jnp.clip(neg, -128, 127).astype(jnp.int8))


def _add8(a8, b8):
    return jnp.clip(a8.astype(jnp.int16) + b8.astype(jnp.int16),
                    -128, 127).astype(jnp.int8)


class Model(FloatModel):
    """Integer flagship: compress/decompress only (no training,
    reference: lossl_coord_int/model.py:297-299). Construct via
    ``Model.from_float(float_model, params, calibration_clouds)`` or with a
    previously saved integer parameter tree."""

    def __init__(self, cfg: Config):
        assert cfg.fea_stride == 2, \
            'int model supports OneScalePredictor ladders (fea_stride=2)'
        super().__init__(cfg)

    @classmethod
    def from_float(cls, float_model: FloatModel, params: Dict, clouds):
        m = cls(float_model.cfg)
        return m, convert(float_model, params, clouds)

    def train_loss(self, *a, **k):
        raise NotImplementedError('the int model does not train '
                                  '(reference: lossl_coord_int/model.py:297)')

    def _set_ef(self, iparams):
        self._e_f = int(iparams['e_f'])

    def compress(self, iparams, xyz):
        self._set_ef(iparams)
        return super().compress(iparams, xyz)

    def decompress(self, iparams, data):
        self._set_ef(iparams)
        return super().decompress(iparams, data)

    def device_roundtrip(self, iparams, xyz):
        self._set_ef(iparams)
        return super().device_roundtrip(iparams, xyz)

    # ----------------------------------------------------- integer NN hooks

    def _init_feats(self, cap: int):
        # quantized all-ones input at the global feature scale; e_f is baked
        # into the jitted program via the param tree (int scalar)
        return None  # placeholder; real init happens in _nn_logits

    def _nn_logits(self, mod, p, feats, table):
        if feats is None or (hasattr(feats, 'dtype')
                             and feats.dtype != jnp.int8):
            # fresh ones input: 1.0 / 2^e_f (e_f read host-side at entry)
            cap = table.shape[0]
            val = int(round(1.0 / (2.0 ** self._e_f)))
            feats = jnp.full((cap, 1), min(val, 127), jnp.int8)
        x = feats
        if 'dec_init' in p and x.shape[-1] == 1:
            # the float path applies dec_init only to 1-channel inputs
            # (reference: lossl_coord/model.py:50-52)
            x = _qconv(x, table, p['dec_init'], with_prelu=False)
        r = x
        h = _qconv(x, table, p['dec_conv0'], with_prelu=True)
        y = _qconv(h, table, p['dec_conv1'], with_prelu=False)
        z = _add8(y, r)
        dec_feats = _prelu8(z, p['dec_conv1']['alpha'])
        pc = _qconv(dec_feats, table, p['pred_conv'], with_prelu=True)
        logits_q16 = _qdense(pc, p['pred_out'], out_dtype=jnp.int32)
        return dec_feats, logits_q16

    def _nn_upsample(self, mod, p, dec_feats, bins, table, c2p, octant):
        up = p['up_in']
        bins8 = bins.astype(jnp.int8)
        accf = int8_matmul(dec_feats, up['wf8']) + up['biasf_q']
        accb = int8_matmul(bins8, up['wb8'])
        x = _add8(requant(accf, up['mulf'], up['shf']),
                  requant(accb, up['mulb'], up['shb']))
        x = _prelu8(x, up['alpha'])
        r = x
        h = _qconv(x, table, p['up_conv0'], with_prelu=True)
        y = _qconv(h, table, p['up_conv1'], with_prelu=False)
        z = _prelu8(_add8(y, r), p['up_conv1']['alpha'])
        out = _qdense(z, p['up_out'])                      # [N, 8*ch] int8
        n, ch8 = out.shape
        flat = out.reshape(n * 8, ch8 // 8)
        flat = jnp.concatenate([flat, jnp.zeros_like(flat[:1])], axis=0)
        idx = jnp.minimum(c2p * 8 + octant, n * 8)
        return flat[idx]

    def _nn_cdf(self, logits_q16):
        return int_softmax_cdf(logits_q16)
