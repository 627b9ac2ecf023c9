"""lossl_coord_int — integer-only deterministic decode of the flagship.

TPU-native rebuild of the reference's int model
(reference: models/convolutional/lossl_coord_int/model.py:28-353): the same
multiscale topology re-run from quantized parameters with integer-only
arithmetic (int8 MXU GEMMs, fixed-point requant, integer softmax->CDF), so
the bitstream decodes bit-identically on ANY backend (CPU/TPU/...) — float
nondeterminism cannot desynchronize encoder and decoder.

The driver (pyramid, scale loop, interleaved word coder) is inherited from
the float flagship; only the NN step hooks change (Model._nn_logits /
_nn_upsample / _nn_ms_root / _nn_ms_chain / _nn_cdf / _init_feats). Covers
both OneScalePredictor ladders (fea_stride=2) and the shipped flagship's
OneScaleMultiStepPredictor chains (fea_stride=16), matching the reference's
full-model quantization (reference: lossl_coord/model.py:685-888).

Every tensor crossing a block boundary is int8 at one global scale 2^e_f
(baked into the parameter packs at conversion — no host-side state), so any
block chain composes: recurrent OSP -> OSP -> MS k=2 -> MS k=3 -> MS k=4.
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


def _qsplit(a8, b8, pack):
    """SplitDense int pack: y = requant(a8 @ wf8 + bias) + requant(b8 @ wb8),
    PReLU'd when the pack carries an alpha."""
    accf = int8_matmul(a8, pack['wf8']) + pack['biasf_q']
    accb = int8_matmul(b8, pack['wb8'])
    x = _add8(requant(accf, pack['mulf'], pack['shf']),
              requant(accb, pack['mulb'], pack['shb']))
    if 'alpha' in pack:
        x = _prelu8(x, pack['alpha'])
    return x


def _qselect(h8, pack, p_of_c, octant):
    """OctantSelectDense int form: dense ch -> 8*ch at parents, then child
    rows gather their (parent, octant) slice (same math as the float fused
    layer; bias is per-octant via the 8*ch bias vector)."""
    out = _qdense(h8, pack)                         # [n_parent, 8*ch] int8
    n, ch8 = out.shape
    flat = out.reshape(n * 8, ch8 // 8)
    flat = jnp.concatenate([flat, jnp.zeros_like(flat[:1])], axis=0)
    return flat[jnp.minimum(p_of_c * 8 + octant, n * 8)]


def _prelu8(x8, alpha_q15):
    neg = (x8.astype(jnp.int32) * alpha_q15 + (1 << 14)) >> 15
    return jnp.where(x8 >= 0, x8,
                     jnp.clip(neg, -128, 127).astype(jnp.int8))


def _add8(a8, b8):
    return jnp.clip(a8.astype(jnp.int16) + b8.astype(jnp.int16),
                    -128, 127).astype(jnp.int8)


def _rescale8(x8, pack):
    return requant(x8.astype(jnp.int32), pack['mul'], pack['shift'])


class Model(FloatModel):
    """Integer flagship: compress/decompress only (no training,
    reference: lossl_coord_int/model.py:297-299). Construct via
    ``Model.from_float(float_model, params, calibration_clouds)`` or with a
    previously saved integer parameter tree (a *_quantize.yaml run's
    int_param_save_path; the harness loads it verbatim — see
    ``raw_param_tree``)."""

    # test.py: the checkpoint IS the parameter tree (packs of int8 weights,
    # requant mul/shifts, ...) — no float init / loose matching applies.
    raw_param_tree = True

    @classmethod
    def from_float(cls, float_model: FloatModel, params: Dict, clouds):
        m = cls(float_model.cfg)
        return m, convert(float_model, params, clouds)

    def train_loss(self, *a, **k):
        raise NotImplementedError('the int model does not train '
                                  '(reference: lossl_coord_int/model.py:297)')

    # ----------------------------------------------------- integer NN hooks

    def _init_feats(self, cap: int):
        return None  # real init happens in _nn_logits (needs the pack)

    def _nn_logits(self, mod, p, feats, table):
        if feats is None or (hasattr(feats, 'dtype')
                             and feats.dtype != jnp.int8):
            # fresh ones input quantized at the global feature scale
            cap = table.shape[0]
            feats = jnp.zeros((cap, 1), jnp.int8) + p['ones_q']
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
        if not mod.if_upsample:
            # dec output feeds the next block -> global feature scale
            dec_feats = _rescale8(dec_feats, p['dec_rescale'])
        return dec_feats, logits_q16

    def _nn_upsample(self, mod, p, dec_feats, bins, table, c2p, octant):
        x = _qsplit(dec_feats, bins.astype(jnp.int8), p['up_in'])
        r = x
        h = _qconv(x, table, p['up_conv0'], with_prelu=True)
        y = _qconv(h, table, p['up_conv1'], with_prelu=False)
        z = _prelu8(_add8(y, r), p['up_conv1']['alpha'])
        return _qselect(z, p['up_out'], c2p, octant)

    def _nn_ms_root(self, mod, p, feats, root_table, bins_root, embed_dense):
        di = p['dec_in']
        if mod.pred_steps == 2:
            x = _qsplit(feats, bins_root.astype(jnp.int8), di)
        else:
            emb = p['embed']
            d8 = embed_dense.astype(jnp.int8)
            d8 = d8.reshape(d8.shape[0], -1)          # [M, 8^(k-2) * 8]
            acc = int8_matmul(d8, emb['w8']) + emb['bias_q']
            if 'alpha' in emb:
                acc = prelu_int(acc, emb['alpha'])
            e8 = requant(acc, emb['mul'], emb['shift'])
            x = _qsplit(feats, e8, di)
        r = x
        h = _qconv(x, root_table, p['dec_conv0'], with_prelu=True)
        y = _qconv(h, root_table, p['dec_conv1'], with_prelu=False)
        z = _prelu8(_add8(y, r), p['dec_conv1']['alpha'])
        # crosses the block boundary (next MS root AND this block's chain)
        return _rescale8(z, p['root_rescale'])

    def _nn_ms_chain(self, mod, p, root_out, chain_tables, select_maps,
                     cat_bins):
        k = mod.pred_steps
        h = _qconv(root_out, chain_tables[0], p['chain_0_conv'],
                   with_prelu=True)
        for i in range(1, k):
            p_of_c, octant = select_maps[i - 1]
            x = _qselect(h, p[f'chain_{i - 1}_out'], p_of_c, octant)
            if i != k - 1:
                mix = p[f'chain_{i}_mix']
                x = _prelu8(x, mix['pre_alpha'])
                x = _qsplit(x, cat_bins[i - 1].astype(jnp.int8), mix)
            h = _qconv(x, chain_tables[i], p[f'chain_{i}_conv'],
                       with_prelu=True)
        return _qdense(h, p[f'chain_{k - 1}_out'], out_dtype=jnp.int32)

    def _nn_cdf(self, logits_q16):
        return int_softmax_cdf(logits_q16)
