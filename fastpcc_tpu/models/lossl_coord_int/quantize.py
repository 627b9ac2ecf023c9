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
    backend — the cross-platform determinism guarantee,
  * every tensor that CROSSES a block boundary is requantized to one global
    feature scale 2^e_f (OSP up_out heads, OSP no-upsample dec outputs, MS
    root_out), so arbitrary block chains (recurrent OSP -> OSP -> MS k=2 ->
    MS k=3 -> ...) compose — this covers the shipped flagship topology
    (fea_stride=16: three multi-step chains under an OSP ladder), matching
    the reference's quantization of the full model
    (reference: config/convolutional/lossl_coord/kitti_ford_quantize.yaml).

Calibration runs the REAL float pipeline: a _CalibModel subclass overrides
the Model NN hooks to re-apply each block with flax capture_intermediates
and record per-layer output max-abs — topology logic stays in one place
(Model._run_scales).
"""
import math
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.intops import quantize_scale_to_mul_shift
from .. import lossl_coord
from ..lossl_coord.model import Model as FloatModel
from ..lossl_coord.network import (OneScalePredictor,
                                   OneScaleMultiStepPredictor)


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
        v = float(np.abs(np.asarray(arr, np.float32)).max())
        self[key] = max(self.get(key, 0.0), v)


def _leaf(inter, *path):
    node = inter
    for p in path:
        node = node[p]
    return np.asarray(node['__call__'][0], np.float32)


class _CalibModel(FloatModel):
    """Float flagship whose NN hooks re-run each block with
    capture_intermediates and record per-layer max-abs. The pass runs
    EAGERLY (no mega-encode jit — the tracker pulls values to host), and
    skips the entropy coder: only the NN activations matter."""

    def __init__(self, cfg, tracker: _MaxTracker):
        super().__init__(cfg)
        self._tr = tracker
        self._names = {id(m): n for n, m in self.blocks.items()}

    def calibration_pass(self, params, xyz: np.ndarray):
        from ..lossl_coord.model import (_ScaleState, _bucket, _build_pyramid,
                                         sp_pad_codes)
        _, codes_np = self._prep_xyz(xyz)
        n = len(codes_np)
        cap = _bucket(n)
        caps = self._scale_caps(codes_np, cap)
        codes = jnp.asarray(sp_pad_codes(codes_np, cap))
        count = jnp.int32(n)
        top = self.max_down - self.cfg.skip_top_scales_num
        pyramid = _build_pyramid(codes, count, self.bits, top, caps)
        states = {0: _ScaleState(codes, count, None)}
        for s in range(1, top + 1):
            pc, pcnt, bins, c2p, octant, _ = pyramid[s - 1]
            states[s] = _ScaleState(pc, pcnt, None, bins)
            states[s - 1].c2p = c2p
            states[s - 1].octant = octant
        self._thread_tables(states, top)
        self._run_scales(params, states, top,
                         symbols_of=lambda s: pyramid[s - 1][5])

    def _nn_logits(self, mod, p, feats, table):
        name = self._names[id(mod)]
        self._tr.see(f'{name}.in', feats)
        (dec_feats, logits), st = mod.apply(
            {'params': p}, feats, table,
            method=OneScalePredictor.logits, capture_intermediates=True)
        inter = st['intermediates']
        tr = self._tr
        if 'dec_init' in inter:
            tr.see(f'{name}.dec_init', _leaf(inter, 'dec_init'))
        tr.see(f'{name}.dec.conv0', _leaf(inter, 'dec', 'SparseConv3x3_0'))
        tr.see(f'{name}.dec.act0', _leaf(inter, 'dec', 'PReLU_0'))
        tr.see(f'{name}.dec.out', dec_feats)
        tr.see(f'{name}.pred_conv', _leaf(inter, 'pred_conv'))
        tr.see(f'{name}.pred_act', _leaf(inter, 'pred_act'))
        tr.see(f'{name}.logits', logits)
        return dec_feats, logits

    def _nn_upsample(self, mod, p, dec_feats, bins, table, c2p, octant):
        name = self._names[id(mod)]
        up, st = mod.apply(
            {'params': p}, dec_feats, bins, table, c2p, octant,
            method=OneScalePredictor.upsample, capture_intermediates=True)
        inter = st['intermediates']
        tr = self._tr
        tr.see(f'{name}.up_in', _leaf(inter, 'up_in'))
        tr.see(f'{name}.up_act', _leaf(inter, 'up_act'))
        tr.see(f'{name}.up_block.conv0',
               _leaf(inter, 'up_block', 'SparseConv3x3_0'))
        tr.see(f'{name}.up_block.act0', _leaf(inter, 'up_block', 'PReLU_0'))
        tr.see(f'{name}.up_block.out', _leaf(inter, 'up_block'))
        tr.see(f'{name}.up_out', up)
        return up

    def _nn_ms_root(self, mod, p, feats, root_table, bins_root, embed_dense):
        name = self._names[id(mod)]
        self._tr.see(f'{name}.in', feats)
        out, st = mod.apply(
            {'params': p}, feats, root_table, bins_root, embed_dense,
            method=OneScaleMultiStepPredictor.root_feats,
            capture_intermediates=True)
        inter = st['intermediates']
        tr = self._tr
        if 'embed' in inter:
            key = 'embed_act' if 'embed_act' in inter else 'embed'
            tr.see(f'{name}.embed', _leaf(inter, key))
        tr.see(f'{name}.dec_act', _leaf(inter, 'dec_act'))
        tr.see(f'{name}.dec_block.act0',
               _leaf(inter, 'dec_block', 'PReLU_0'))
        tr.see(f'{name}.root_out', out)
        return out

    def _nn_ms_chain(self, mod, p, root_out, chain_tables, select_maps,
                     cat_bins):
        name = self._names[id(mod)]
        logits, st = mod.apply(
            {'params': p}, root_out, chain_tables, select_maps, cat_bins,
            method=OneScaleMultiStepPredictor.chain_logits,
            capture_intermediates=True)
        inter = st['intermediates']
        tr = self._tr
        for i in range(mod.pred_steps):
            tr.see(f'{name}.chain_{i}_act', _leaf(inter, f'chain_{i}_act'))
            if i < mod.pred_steps - 1:
                tr.see(f'{name}.chain_{i}_out',
                       _leaf(inter, f'chain_{i}_out'))
            if 0 < i < mod.pred_steps - 1:
                tr.see(f'{name}.chain_{i}_mix_act',
                       _leaf(inter, f'chain_{i}_mix_act'))
        tr.see(f'{name}.logits', logits)
        return logits


def calibrate(model: FloatModel, params: Dict,
              clouds: List[np.ndarray]) -> Dict[str, float]:
    """Run the float compress pipeline on calibration clouds, recording
    per-(block, layer) output max-abs (the reference's observer insertion by
    pre_test_hook, reference: lossl_coord/model.py:633-637)."""
    calib = _CalibModel(model.cfg, _MaxTracker())
    for xyz in clouds:
        calib.calibration_pass(params, np.asarray(xyz))
    return dict(calib._tr)


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


def _split_pack(p, ca: int, e_a: int, e_b: int, e_out: int, act=None):
    """SplitDense params (kernel [ca+cb, out]) -> int pack: separate int8
    weights/rescales for the two logical inputs (a at 2^e_a, b at 2^e_b —
    b is exact small ints when e_b == 0), bias carried on the a side."""
    w = np.asarray(p['kernel'], np.float64)
    wa, wb = w[:ca], w[ca:]
    wa8, was = _q_weights(wa)
    wb8, wbs = _q_weights(wb)
    b = np.asarray(p.get('bias', np.zeros(w.shape[1])), np.float64)
    a_in = 2.0 ** e_a
    b_in = 2.0 ** e_b
    mulf, shf = _mul_shift(a_in * was / (2.0 ** e_out))
    mulb, shb = _mul_shift(b_in * wbs / (2.0 ** e_out))
    out = dict(wf8=wa8, wb8=wb8,
               biasf_q=np.round(b / (a_in * was)).astype(np.int32),
               mulf=mulf, shf=shf, mulb=mulb, shb=shb)
    if act is not None:
        out['alpha'] = _alpha_q15(act)
    return out


def _rescale_pack(e_from: int, e_to: int):
    mul, shift = _mul_shift(2.0 ** (e_from - e_to))
    return dict(mul=mul, shift=shift)


def _convert_osp(name, mod, p, scales, e_f):
    blk = {'e_in': e_f,
           # quantized 1.0 at the global feature scale (fresh-ones init for
           # the topmost block; baked into the pack so no host-side state)
           'ones_q': np.int8(min(max(int(round(2.0 ** -e_f)), 1), 127))}
    cur = e_f
    if f'{name}.dec_init' in scales:
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
        ch = np.asarray(p['up_in']['kernel']).shape[0] - 8
        e_ui = _pow2_e(scales[f'{name}.up_act'])
        blk['up_in'] = _split_pack(p['up_in'], ch, e_dec, 0, e_ui,
                                   act=p['up_act'])
        e_ub = _pow2_e(scales[f'{name}.up_block.act0'])
        blk['up_conv0'] = _conv_pack(p['up_block']['SparseConv3x3_0'],
                                     e_ui, e_ub,
                                     prelu=p['up_block']['PReLU_0'])
        blk['up_conv1'] = _conv_pack(p['up_block']['SparseConv3x3_1'],
                                     e_ub, e_ui,
                                     prelu=p['up_block']['PReLU_1'])
        # all inter-block features share the global scale e_f
        blk['up_out'] = _dense_pack(p['up_out'], e_ui, e_out=e_f)
    else:
        # dec output may feed the next block -> bring it to the global scale
        blk['dec_rescale'] = _rescale_pack(e_dec, e_f)
    return blk


def _convert_ms(name, mod, p, scales, e_f):
    """OneScaleMultiStepPredictor -> int pack (the shipped flagship's
    fea_stride=16 chains; reference quantizes the same chains via its module
    zoo, reference: lossl_coord_int/model.py:28-353)."""
    k = mod.pred_steps
    ch = mod.channels
    blk = {'pred_steps': k}
    e_di = _pow2_e(scales[f'{name}.dec_act'])
    if k == 2:
        blk['dec_in'] = _split_pack(p['dec_in'], ch, e_f, 0, e_di,
                                    act=p['dec_act'])
    else:
        e_emb = _pow2_e(scales[f'{name}.embed'])
        w = np.asarray(p['embed']['kernel'], np.float64)   # [k3, 8, ch]
        k3 = w.shape[0]
        w8, ws = _q_weights(w)
        b = np.asarray(p['embed'].get('bias', np.zeros(ch)), np.float64)
        mul, shift = _mul_shift(ws / (2.0 ** e_emb))       # bins exact ints
        blk['embed'] = dict(w8=w8.reshape(k3 * 8, ch),
                            bias_q=np.round(b / ws).astype(np.int32),
                            mul=mul, shift=shift)
        if 'embed_act' in p:          # PReLU only instantiated for ch >= 256
            blk['embed']['alpha'] = _alpha_q15(p['embed_act'])
        blk['dec_in'] = _split_pack(p['dec_in'], ch, e_f, e_emb, e_di,
                                    act=p['dec_act'])
    e_db0 = _pow2_e(scales[f'{name}.dec_block.act0'])
    blk['dec_conv0'] = _conv_pack(p['dec_block']['SparseConv3x3_0'],
                                  e_di, e_db0,
                                  prelu=p['dec_block']['PReLU_0'])
    blk['dec_conv1'] = _conv_pack(p['dec_block']['SparseConv3x3_1'],
                                  e_db0, e_di,
                                  prelu=p['dec_block']['PReLU_1'])
    # root_out crosses the block boundary (feeds the next MS root AND this
    # block's own chain): requantized to the global scale inside _nn_ms_root
    blk['root_rescale'] = _rescale_pack(e_di, e_f)
    blk['e_root'] = e_di
    # chain: conv/act at 2^e_i, selection heads at 2^e_sel_i; chain_0
    # consumes the globally-rescaled root
    e_prev = e_f
    for i in range(k):
        e_i = _pow2_e(scales[f'{name}.chain_{i}_act'])
        blk[f'chain_{i}_conv'] = _conv_pack(
            p[f'chain_{i}_conv'], e_prev, e_i, prelu=p[f'chain_{i}_act'])
        if i < k - 1:
            e_sel = _pow2_e(scales[f'{name}.chain_{i}_out'])
            blk[f'chain_{i}_out'] = _dense_pack(p[f'chain_{i}_out'], e_i,
                                                e_out=e_sel)
            if i + 1 < k - 1:
                e_mix = _pow2_e(scales[f'{name}.chain_{i + 1}_mix_act'])
                mix = _split_pack(p[f'chain_{i + 1}_mix'], ch, e_sel, 0,
                                  e_mix, act=p[f'chain_{i + 1}_mix_act'])
                mix['pre_alpha'] = _alpha_q15(p[f'chain_{i + 1}_pre_act'])
                blk[f'chain_{i + 1}_mix'] = mix
                e_prev = e_mix
            else:
                e_prev = e_sel
        else:
            blk[f'chain_{i}_out'] = _dense_pack(p[f'chain_{i}_out'], e_i,
                                                q16=True)
    return blk


def convert(model: FloatModel, params: Dict,
            clouds: List[np.ndarray]) -> Dict:
    """Float flagship -> integer parameter tree (numpy; the int model wraps
    it in jnp arrays). The analog of the reference's post_test_hook
    conversion (reference: lossl_coord/model.py:638-642, 685-888)."""
    assert model.cfg.feature_propagation, \
        'int conversion targets the feature-propagating flagship'
    scales = calibrate(model, params, clouds)
    # one GLOBAL inter-block feature scale: every tensor crossing a block
    # boundary is requantized to 2^e_f, so any block chain composes.
    e_f = _pow2_e(max(v for k, v in scales.items() if k.endswith('.in')))
    iparams = {'e_f': e_f}
    for name, mod in model.blocks.items():
        if f'{name}.in' not in scales:
            continue     # block never fired on the calibration clouds
        p = params[name]
        if isinstance(mod, OneScalePredictor):
            iparams[name] = _convert_osp(name, mod, p, scales, e_f)
        else:
            iparams[name] = _convert_ms(name, mod, p, scales, e_f)
    return iparams
