"""PTQ conversion of the lossl_coord flagship to integer-only inference.

TPU-native counterpart of the reference's quantized module zoo +
import_parameters conversion (reference: lib/int_sparse_conv/cuda_ops.py:189-681
and models/convolutional/lossl_coord/model.py:685-888). Scheme:

  * activations: int8, symmetric, POWER-OF-TWO scales 2^e (e from a
    calibration pass recording per-layer max-abs — the analog of the
    reference's HistogramObserver pass, cuda_ops.py:20-37),
  * weights: int8 symmetric per-tensor; biases int32 in the accumulator
    scale; rescales as (mul, shift) fixed-point pairs (requant),
  * PReLU: Q15 alpha on the int32 accumulator (scale-invariant),
  * logits: requantized to Q16 and fed to the integer softmax->CDF
    (ops/intops.py), so encoder and decoder CDFs are bit-identical on ANY
    backend — the cross-platform determinism guarantee.

Only OneScalePredictor ladders are quantized (fea_stride=2 configs, e.g.
kitti_ford_wo_fea_prop-style); multi-step predictor chains remain float.
"""
import math
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.intops import quantize_scale_to_mul_shift
from .. import lossl_coord
from ..lossl_coord.network import OneScalePredictor


def _pow2_e(maxabs: float) -> int:
    """Smallest e with 127 * 2^e >= maxabs."""
    return int(math.ceil(math.log2(max(maxabs, 1e-12) / 127.0)))


def _q_weights(w: np.ndarray):
    s = float(np.abs(w).max()) / 127.0
    s = max(s, 1e-12)
    return np.clip(np.round(w / s), -127, 127).astype(np.int8), s


def _mul_shift(scale: float):
    mul, shift = quantize_scale_to_mul_shift(scale)
    return np.int32(mul), np.int32(shift)


class _MaxTracker(dict):
    def see(self, key: str, arr):
        v = float(np.abs(np.asarray(arr)).max())
        self[key] = max(self.get(key, 0.0), v)


def calibrate(model: 'lossl_coord.model.Model', params: Dict,
              clouds: List[np.ndarray]) -> Dict[str, float]:
    """Run the float compress pipeline on calibration clouds, recording
    per-(block, layer) output max-abs via flax capture_intermediates."""
    from ..lossl_coord.model import _bucket, sp_pad_codes, _build_pyramid
    from ...ops import sparse as sp
    from ...ops.morton import np_morton_encode

    tr = _MaxTracker()
    for xyz in clouds:
        offset, codes_np = model._prep_xyz(xyz)
        cap = _bucket(len(codes_np))
        codes = jnp.asarray(sp_pad_codes(codes_np, cap))
        count = jnp.int32(len(codes_np))
        top = model.max_down - model.cfg.skip_top_scales_num
        pyramid = _build_pyramid(codes, count, model.bits, top)
        states = {0: (codes, count, None, None)}
        for s in range(1, top + 1):
            pc, pcnt, bins, c2p, octant, _ = pyramid[s - 1]
            states[s] = (pc, pcnt, bins, None)
            states[s - 1] = states[s - 1][:2] + (states[s - 1][2], (c2p, octant))
        tables = {top: sp.build_neighbor_table(
            states[top][0], states[top][1], model.bits, model.bits - top)}
        for s in range(top - 1, 0, -1):
            c2p, octant = states[s][3]
            tables[s] = sp.child_table_from_parent(tables[s + 1], c2p, octant,
                                                   states[s][1],
                                                   states[s + 1][1])
        feats = jnp.ones((cap, 1), jnp.float32)
        for idx in range(top, 0, -1):
            name, mod = model._block_info(idx, top)
            assert isinstance(mod, OneScalePredictor), \
                'int conversion supports OneScalePredictor ladders only'
            if not model.cfg.feature_propagation:
                feats = jnp.ones((cap, 1), jnp.float32)
            tr.see(f'{name}.in', feats)
            (dec_feats, logits), st = mod.apply(
                {'params': params[name]}, feats, tables[idx],
                method=OneScalePredictor.logits, capture_intermediates=True)
            inter = st['intermediates']
            _track_osp_logits(tr, name, inter, dec_feats, logits)
            bins = states[idx][2]
            if mod.if_upsample and idx != 1:
                c2p, octant = states[idx - 1][3]
                up, st2 = mod.apply(
                    {'params': params[name]}, dec_feats, bins, tables[idx],
                    c2p, octant, method=OneScalePredictor.upsample,
                    capture_intermediates=True)
                _track_osp_upsample(tr, name, st2['intermediates'], up)
                feats = up
            else:
                feats = dec_feats
    return dict(tr)


def _leaf(inter, *path):
    node = inter
    for p in path:
        node = node[p]
    return np.asarray(node['__call__'][0])


def _track_osp_logits(tr, name, inter, dec_feats, logits):
    if 'dec_init' in inter:
        tr.see(f'{name}.dec_init', _leaf(inter, 'dec_init'))
    tr.see(f'{name}.dec.conv0', _leaf(inter, 'dec', 'SparseConv3x3_0'))
    tr.see(f'{name}.dec.act0', _leaf(inter, 'dec', 'PReLU_0'))
    tr.see(f'{name}.dec.out', dec_feats)
    tr.see(f'{name}.pred_conv', _leaf(inter, 'pred_conv'))
    tr.see(f'{name}.pred_act', _leaf(inter, 'pred_act'))
    tr.see(f'{name}.logits', logits)


def _track_osp_upsample(tr, name, inter, up):
    tr.see(f'{name}.up_in', _leaf(inter, 'up_in'))
    tr.see(f'{name}.up_act', _leaf(inter, 'up_act'))
    tr.see(f'{name}.up_block.conv0', _leaf(inter, 'up_block', 'SparseConv3x3_0'))
    tr.see(f'{name}.up_block.act0', _leaf(inter, 'up_block', 'PReLU_0'))
    tr.see(f'{name}.up_block.out', _leaf(inter, 'up_block'))
    tr.see(f'{name}.up_out', up)


def _alpha_q15(p):
    return np.int32(np.round(float(np.asarray(p['alpha'])[0]) * (1 << 15)))


def _conv_pack(p, e_in: int, e_out: int, prelu=None):
    """SparseConv3x3 params -> int pack. Returns dict with w8 [27*cin, cout],
    bias_q int32, (mul, shift) to the int8 output scale, optional alpha."""
    w = np.asarray(p['kernel'], np.float64)        # [27, cin, cout]
    k, cin, cout = w.shape
    w8, ws = _q_weights(w)
    a_in = 2.0 ** e_in
    b = np.asarray(p.get('bias', np.zeros(cout)), np.float64)
    bias_q = np.round(b / (a_in * ws)).astype(np.int32)
    mul, shift = _mul_shift(a_in * ws / (2.0 ** e_out))
    out = dict(w8=w8.reshape(k * cin, cout), bias_q=bias_q, mul=mul,
               shift=shift)
    if prelu is not None:
        out['alpha'] = _alpha_q15(prelu)
    return out


def _dense_pack(p, e_in: int, e_out=None, q16=False):
    w = np.asarray(p['kernel'], np.float64)        # [cin, cout]
    w8, ws = _q_weights(w)
    a_in = 2.0 ** e_in
    b = np.asarray(p.get('bias', np.zeros(w.shape[1])), np.float64)
    bias_q = np.round(b / (a_in * ws)).astype(np.int32)
    tgt = (1 / 65536.0) if q16 else (2.0 ** e_out)
    mul, shift = _mul_shift(a_in * ws / tgt)
    return dict(w8=w8, bias_q=bias_q, mul=mul, shift=shift)


def convert(model: 'lossl_coord.model.Model', params: Dict,
            clouds: List[np.ndarray]) -> Dict:
    """Float flagship -> integer parameter tree (numpy; the int model wraps
    it in jnp arrays). The analog of the reference's post_test_hook
    conversion (reference: lossl_coord/model.py:638-642, 685-888)."""
    scales = calibrate(model, params, clouds)
    # one GLOBAL inter-block feature scale: every block's input and every
    # upsample output share it, so the recurrent block can feed both itself
    # and the next non-shared block consistently.
    e_f = _pow2_e(max(v for k, v in scales.items()
                      if k.endswith('.in') or k.endswith('.up_out')))
    iparams = {'e_f': e_f}
    for name, mod in model.blocks.items():
        if not isinstance(mod, OneScalePredictor):
            raise NotImplementedError(
                'int conversion supports OneScalePredictor ladders only '
                '(use fea_stride=2 configs)')
        p = params[name]
        e_in = e_f
        blk = {'e_in': e_in}
        cur = e_in
        if 'dec_init' in p:
            e0 = _pow2_e(scales[f'{name}.dec_init'])
            blk['dec_init'] = _conv_pack(p['dec_init'], cur, e0)
            cur = e0
        e_res = cur
        e_h = _pow2_e(scales[f'{name}.dec.act0'])
        blk['dec_conv0'] = _conv_pack(p['dec']['SparseConv3x3_0'], cur, e_h,
                                      prelu=p['dec']['PReLU_0'])
        blk['dec_conv1'] = _conv_pack(p['dec']['SparseConv3x3_1'], e_h, e_res,
                                      prelu=p['dec']['PReLU_1'])
        e_dec = e_res
        e_pc = _pow2_e(scales[f'{name}.pred_act'])
        blk['pred_conv'] = _conv_pack(p['pred_conv'], e_dec, e_pc,
                                      prelu=p['pred_act'])
        blk['pred_out'] = _dense_pack(p['pred_out'], e_pc, q16=True)
        blk['e_dec'] = e_dec
        if mod.if_upsample:
            # up_in consumes [dec_feats (2^e_dec), bins (exact ints)]
            e_ui = _pow2_e(scales[f'{name}.up_act'])
            w = np.asarray(p['up_in']['kernel'], np.float64)
            ch = w.shape[1]
            wf, wb = w[:-8], w[-8:]
            wf8, wfs = _q_weights(wf)
            wb8, wbs = _q_weights(wb)
            b = np.asarray(p['up_in']['bias'], np.float64)
            a_in = 2.0 ** e_dec
            mulf, shf = _mul_shift(a_in * wfs / (2.0 ** e_ui))
            mulb, shb = _mul_shift(wbs / (2.0 ** e_ui))
            blk['up_in'] = dict(
                wf8=wf8, wb8=wb8,
                biasf_q=np.round(b / (a_in * wfs)).astype(np.int32),
                mulf=mulf, shf=shf, mulb=mulb, shb=shb,
                alpha=_alpha_q15(p['up_act']))
            e_ub = _pow2_e(scales[f'{name}.up_block.act0'])
            blk['up_conv0'] = _conv_pack(p['up_block']['SparseConv3x3_0'],
                                         e_ui, e_ub,
                                         prelu=p['up_block']['PReLU_0'])
            blk['up_conv1'] = _conv_pack(p['up_block']['SparseConv3x3_1'],
                                         e_ub, e_ui,
                                         prelu=p['up_block']['PReLU_1'])
            # all inter-block features share the global scale e_f
            blk['up_out'] = _dense_pack(p['up_out'], e_ui, e_out=e_f)
        iparams[name] = blk
    return iparams
