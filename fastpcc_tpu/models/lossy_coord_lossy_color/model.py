"""lossy_coord_lossy_color — TMM'25 joint geometry + color compression.

TPU-native rebuild of the reference model
(reference: models/convolutional/lossy_coord_lossy_color/model.py:23-314):
the v2 geo-lossless pyramid (shared implementation,
fastpcc_tpu/models/lossy_coord_v2/model.py) carries joint geometry+color
features; the normal decoder reconstructs coordinates by generative
upsampling AND predicts per-point RGB, trained against a KNN-recolored
ground truth (reference: layers.py:269-333) with optional BT.709 YUV loss.

Input features: [rgb/255, 2] at the full-resolution coords (reference:
model.py:151-158). Bitstream = the v2 layout (no extra color stream — color
rides in the coded features).
"""
import functools
import io
import math
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import sparse as sp
from ...ops import ilv_rans as ir
from ...ops.morton import masked_decode, np_morton_encode
from ...runtime import RansEncoder, RansDecoder
from ...entropy_models.batched import ContinuousBatchedEntropyModel
from ..lossy_coord.model import (_bucket, _bce, sp_pad, sp_pad2,
                                 _octant_gather, adaptive_keep_mask,
                                 simple_keep_mask, _sep_coords)
from ..lossy_coord_v2.model import (_geo_scale_of, _cap_of, _encoder_pass,
                                    _fea_pred, _coord_logits, _binary_rows,
                                    _rec_encode_impl, _rec_decode_impl)
from ..lossy_coord_v2.network import (GeoEncStep, HyperDecFeaV2,
                                      HyperDecCoordV2, SubResidualV2,
                                      SubDecoderV2, ConvA, bound_value)
from .network import (ColorEncStage, ColorDecStage, ColorHead, rgb_to_yuv709,
                      sample_wise_recolor)
from .model_config import Config

LN2 = math.log(2)


class ColorNet(nn.Module):
    """Same attribute surface as V2Net for the shared geo drivers, plus the
    color decoder head."""
    cfg: Config

    def setup(self):
        c = self.cfg
        enc_ch = c.encoder_channels
        g = c.geo_lossl_channels
        self.first = ConvA(enc_ch[0], c.activation)
        self.enc_stages = [
            ColorEncStage(ch, ch if i < len(enc_ch) - 2 else g[0],
                          c.activation)
            for i, ch in enumerate(enc_ch[1:])]
        self.dec_stages = [ColorDecStage(ch, c.activation)
                           for ch in c.decoder_channels]
        self.color_head = ColorHead(c.decoder_channels[-1], c.activation)

        ups = c.geo_lossl_if_sample
        skip = c.skip_encoding_fea
        self.geo_enc = [
            GeoEncStep(in_ch=g[i] if i == 0 else max(g[i - 1], g[i]),
                       out_ch=g[i + 1], down=bool(ups[i]),
                       has_out=(i >= skip), act=c.activation)
            for i in range(len(ups))]
        self.hd_fea = [HyperDecFeaV2(g[i + 1], g[i], bool(ups[i]),
                                     c.activation)
                       for i in range(len(ups))]
        self.hd_coord = [HyperDecCoordV2(g[i + 1], c.activation)
                         if ups[i] else None for i in range(len(ups))]
        self.residuals = [SubResidualV2(g[i], c.compressed_channels[i],
                                        c.bottleneck_value_bound, c.activation)
                          if i > skip else None for i in range(len(ups))]
        self.dec_blocks = [SubDecoderV2(c.compressed_channels[i], g[i], g[i],
                                        with_res=(i > skip), act=c.activation)
                           for i in range(len(ups))]
        self.fea_em = ContinuousBatchedEntropyModel(
            c.compressed_channels[0], tail_range=c.em_tail_range)

    def geo_step(self, i: int, x_or_dense, table):
        return self.geo_enc[i].step(x_or_dense, table)

    def bottom_bound(self, x):
        return bound_value(x, jnp.float32(self.cfg.bottleneck_value_bound))


def _color_dec_chain(net, fea, grids, tables, cap, bits, dtype, cfg,
                     rng_unused=None, train_targets=None, eval_targets=None):
    """Normal decoder chain -> (cand codes/count/table, keep, cand rgb,
    recon losses dict). train_targets: grids for BCE; eval_targets: per-scale
    point budgets."""
    e = len(cfg.encoder_channels) - 1
    parent_codes, parent_count = grids[e]
    parent_table = tables[e]
    feats = fea.astype(dtype)
    losses = {}
    keep = None
    cand = cand_table = None
    for j, stage in enumerate(net.dec_stages):
        s_child = e - 1 - j
        cand_cap = 8 * _cap_of(cap, s_child + 1, cfg)
        dense = stage.child_dense(feats)
        pcap = parent_codes.shape[0]
        all8 = jnp.broadcast_to((jnp.arange(pcap) < parent_count)[:, None],
                                (pcap, 8))
        cand, p_of_c, oct_of_c = sp.expand_children(
            parent_codes, parent_count, all8, bits, cand_cap)
        cand_feats = _octant_gather(dense, p_of_c, oct_of_c)
        cand_table = sp.child_table_from_parent(parent_table, p_of_c,
                                                oct_of_c, cand.count)
        refined, logits = stage.refine(cand_feats, cand_table)
        cand_valid = jnp.arange(cand_cap) < cand.count
        levels = len(net.dec_stages) - s_child
        if train_targets is not None:
            tgt = sp.membership_mask(cand.codes, *train_targets[s_child])
            losses[f'coord_{s_child}_recon_loss'] = \
                (_bce(logits, tgt.astype(jnp.float32)) * cand_valid).sum()
            keep = simple_keep_mask(cand.codes, cand.count, logits, levels) \
                | tgt
        else:
            keep = adaptive_keep_mask(cand.codes, cand.count, logits,
                                      eval_targets[s_child], levels,
                                      keep_local_max=True) \
                if cfg.adaptive_pruning else \
                simple_keep_mask(cand.codes, cand.count, logits, levels)
        keep = keep & cand_valid
        if j < len(net.dec_stages) - 1:
            new_codes, new_count, gidx = sp.mask_compact(cand.codes, keep,
                                                         cand_cap)
            feats = sp.gather_padded(refined, gidx)
            parent_table = sp.compact_table(cand_table, gidx, new_count)
            parent_codes, parent_count = new_codes, new_count
        else:
            feats = refined
    # color head on the LAST candidate set with keep flags
    # (reference: layers.py:150-160)
    kf = keep.astype(jnp.float32)[:, None]
    x = jnp.concatenate([feats, jnp.broadcast_to(kf, (feats.shape[0], 2))
                        .astype(feats.dtype)], axis=-1)
    rgb = net.color_head(x, cand_table, train_targets is not None)
    return cand, keep, rgb, losses


def _train_apply(net: ColorNet, codes, count, colors, points_num, rng, step):
    cfg = net.cfg
    bits = cfg.coord_bits
    cap = codes.shape[0]
    dtype = jnp.bfloat16 if cfg.compute_dtype == 'bfloat16' else jnp.float32
    steps = len(cfg.geo_lossl_if_sample)
    skip = cfg.skip_encoding_fea
    scale_of = _geo_scale_of(cfg)
    total_points = points_num.sum()

    feats0 = jnp.concatenate(
        [colors.astype(jnp.float32) / 255.0,
         jnp.full((cap, 1), 2.0, jnp.float32)], axis=-1).astype(dtype)
    grids, maps, tables, strided, bottom, targets, _ = _encoder_pass(
        net, codes, count, bits, cap, dtype, cfg, feats0)
    loss = {}
    s_b = scale_of[-1]
    valid_b = (jnp.arange(grids[s_b][0].shape[0]) < grids[s_b][1]) \
        .astype(jnp.float32)
    bottom_tilde, bbits = net.fea_em(bottom, jax.random.fold_in(rng, 0),
                                     valid_b)
    loss['fea_bottom_bits'] = bbits
    lower = bottom_tilde * valid_b[:, None]
    for i in range(steps - 1, -1, -1):
        s_tgt = scale_of[i]
        up = bool(cfg.geo_lossl_if_sample[i])
        if up:
            cand_cap = 8 * _cap_of(cap, s_tgt + 1, cfg)
            cand, _, _, logits, _ = _coord_logits(
                net, i, lower, grids, bits, s_tgt, cand_cap,
                tables[s_tgt + 1], cfg)
            tgt = sp.membership_mask(cand.codes, *grids[s_tgt])
            cand_valid = jnp.arange(cand_cap) < cand.count
            loss[f'coord_{i}_bits'] = (_bce(logits, tgt.astype(jnp.float32))
                                       * cand_valid).sum() / LN2
        pred = _fea_pred(net, i, lower, up, grids, maps, tables,
                         scale_of[i + 1], s_tgt, bits, dtype)
        valid_s = (jnp.arange(grids[s_tgt][0].shape[0]) < grids[s_tgt][1]) \
            .astype(jnp.float32)
        if i > skip:
            fea_i = strided[i][0].astype(jnp.float32)
            res = net.residuals[i](fea_i, pred, tables[s_tgt])
            res_tilde, fbits = net.fea_em(res, jax.random.fold_in(rng, i + 1),
                                          valid_s)
            loss[f'fea_{i}_bits'] = fbits
            lower = net.dec_blocks[i](res_tilde, pred)
        else:
            lower = net.dec_blocks[i](None, pred)
        lower = lower * valid_s[:, None]

    cand, keep, rgb, recon_losses = _color_dec_chain(
        net, lower, grids, tables, cap, bits, dtype, cfg,
        train_targets=grids)
    # recolor ground-truth transfer onto KEPT predictions
    pred_xyz = _sep_coords(jnp.where(keep, cand.codes, jnp.int64(0)), bits)
    tgt_xyz = _sep_coords(jnp.where(jnp.arange(cap) < count, codes,
                                    jnp.int64(0)), bits)
    recolored = sample_wise_recolor(pred_xyz, cand.count, tgt_xyz, count,
                                    colors.astype(jnp.float32),
                                    k=cfg.recolor_k)
    recolored = jax.lax.stop_gradient(recolored)
    pr, rr = (rgb, recolored)
    if cfg.use_yuv_loss:
        pr, rr = rgb_to_yuv709(pr), rgb_to_yuv709(rr)
    rgb_loss = (((pr - rr) ** 2).sum(-1) * keep.astype(jnp.float32)).sum()

    fea_factor = jnp.where(jnp.asarray(step) < cfg.warmup_fea_loss_steps,
                           cfg.warmup_fea_loss_factor, cfg.bits_loss_factor)
    color_factor = jnp.where(jnp.asarray(step) < cfg.warmup_color_loss_steps,
                             cfg.warmup_color_loss_factor,
                             cfg.color_recon_loss_factor)
    total = jnp.float32(0)
    aux = {}
    for k, v in loss.items():
        w = fea_factor if 'fea' in k else cfg.bits_loss_factor
        total = total + v * w / total_points
        aux[k] = v
    for k, v in recon_losses.items():
        total = total + v * cfg.coord_recon_loss_factor / total_points
        aux[k] = v
    total = total + rgb_loss * color_factor / total_points
    aux['color_recon_loss'] = rgb_loss
    aux['loss'] = total
    return total, aux


class Model:
    """Public API: train_loss / compress(xyz, color) ->
    bytes / decompress(bytes) -> (xyz, rgb)."""

    requires_point_feats = True     # harness packs per-point RGB features

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.bits = cfg.coord_bits
        self.net = ColorNet(cfg)
        self.compute_dtype = jnp.bfloat16 if cfg.compute_dtype == 'bfloat16' \
            else jnp.float32
        self._rans_enc = None
        self._rans_dec = None
        self._jit_encode = jax.jit(
            functools.partial(_c_encode_full, self.net),
            static_argnums=(4, 5, 6))
        self._jit_decode = jax.jit(
            functools.partial(_c_decode_full, self.net),
            static_argnums=(5, 6, 7))
        self._jit_color_dec = jax.jit(
            functools.partial(_c_color_dec, self.net),
            static_argnums=(5, 6, 7))

    def init_params(self, rng: jax.Array, example_n: int = 512) -> Dict:
        cap = _bucket(example_n)
        r = np.random.default_rng(0)
        codes_np = np.sort(r.choice(1 << 15, size=cap // 4,
                                    replace=False)).astype(np.int64)
        codes = jnp.asarray(sp_pad(codes_np, cap))
        colors = jnp.asarray(r.integers(0, 256, size=(cap, 3))
                             .astype(np.float32))
        count = jnp.int32(len(codes_np))
        pn = jnp.asarray([float(len(codes_np))], jnp.float32)
        v = self.net.init(rng, codes, count, colors, pn,
                          jax.random.PRNGKey(1), jnp.int32(0),
                          method=_train_apply)
        return v['params']

    def train_loss(self, params, codes, count, colors, points_num, step=0,
                   rng: Optional[jax.Array] = None):
        if rng is None:
            rng = jax.random.fold_in(jax.random.PRNGKey(7), jnp.asarray(step))
        return self.net.apply({'params': params}, codes, count, colors,
                              points_num, rng, step, method=_train_apply)

    def _coders(self):
        if self._rans_enc is None:
            self._rans_enc = RansEncoder(1 << 22)
            self._rans_dec = RansDecoder()
        return self._rans_enc, self._rans_dec

    def compress(self, params, xyz: np.ndarray, color: np.ndarray) -> bytes:
        from ..lossy_coord.model import Model as V1Model
        enc, _ = self._coders()
        offset = xyz.min(0)
        raw_codes = np_morton_encode((xyz - offset).astype(np.int64))
        codes_np, first_idx = np.unique(raw_codes, return_index=True)
        colors_np = color[first_idx].astype(np.float32)
        n = len(codes_np)
        cap = _bucket(n)
        feats0 = np.concatenate(
            [colors_np / 255.0, np.full((n, 1), 2.0, np.float32)], axis=-1)
        out = self._jit_encode({'params': params},
                               jnp.asarray(sp_pad(codes_np, cap)),
                               jnp.int32(n),
                               jnp.asarray(sp_pad2(feats0, cap)),
                               self.bits, cap, self.compute_dtype)
        (bptr, buf, res_row, bottom_coords_d, count_b, _e_coords, _e_count,
         targets, ok) = out
        assert bool(ok), 'lossy_coord_lossy_color capacity overflow'
        blob = ir.stream_to_bytes(bptr, buf, self.cfg.coder_lanes)
        bn = int(count_b)
        bcoords = np.asarray(bottom_coords_d)[:bn]
        coord_stream = V1Model._encode_bottom_coords(self, enc, bcoords)
        scaler = self.cfg.adaptive_pruning_scaler
        e = len(self.cfg.encoder_channels) - 1
        alpha = 2 * self.cfg.bottleneck_value_bound + 1
        with io.BytesIO() as bs:
            for v in offset.tolist():
                bs.write(int(v).to_bytes(2, 'little'))
            bs.write(n.to_bytes(4, 'little'))
            for t in np.asarray(targets).tolist():
                bs.write(int(t * scaler).to_bytes(3, 'little'))
            bs.write(bn.to_bytes(4, 'little'))
            bs.write(np.asarray(res_row).astype('<u2').tobytes())
            bs.write(len(blob).to_bytes(4, 'little'))
            bs.write(blob)
            bs.write(len(coord_stream).to_bytes(4, 'little'))
            bs.write(coord_stream)
            return bs.getvalue()

    def decompress(self, params, data: bytes):
        from ..lossy_coord.model import Model as V1Model
        _, dec = self._coders()
        cfg = self.cfg
        e = len(cfg.encoder_channels) - 1
        alpha = 2 * cfg.bottleneck_value_bound + 1
        with io.BytesIO(data) as bs:
            offset = np.array([int.from_bytes(bs.read(2), 'little')
                               for _ in range(3)], np.int64)
            n = int.from_bytes(bs.read(4), 'little')
            targets = [int.from_bytes(bs.read(3), 'little') for _ in range(e)]
            bn = int.from_bytes(bs.read(4), 'little')
            res_row = np.frombuffer(bs.read(2 * alpha), '<u2')
            blob = bs.read(int.from_bytes(bs.read(4), 'little'))
            coord_stream = bs.read(int.from_bytes(bs.read(4), 'little'))
        cap = _bucket(n)
        scale_of = _geo_scale_of(cfg)
        cap_b = _cap_of(cap, scale_of[-1], cfg)
        bcoords = V1Model._decode_bottom_coords(self, dec, coord_stream,
                                                bn * 3).reshape(-1, 3)
        bcodes = np.sort(np_morton_encode(bcoords.astype(np.int64)))
        total_syms = cap_b * alpha
        for i, up in enumerate(cfg.geo_lossl_if_sample):
            s = scale_of[i]
            total_syms += _cap_of(cap, s, cfg) * cfg.compressed_channels[i] \
                + 8 * _cap_of(cap, s + 1, cfg) * up
        capw = ir.word_capacity_for(total_syms, cfg.coder_lanes)
        words, _, _ = ir.bytes_to_stream(blob, capw, cfg.coder_lanes)
        codes_e, count_e, fea_e = self._jit_decode(
            {'params': params}, words, jnp.asarray(res_row),
            jnp.asarray(sp_pad(bcodes, cap_b)), jnp.int32(bn),
            self.bits, cap, self.compute_dtype)
        table_e = sp.build_neighbor_table(codes_e, count_e, self.bits,
                                          self.bits - e)
        cand_codes, keep, rgb = self._jit_color_dec(
            {'params': params}, fea_e, codes_e, count_e, table_e,
            self.bits, cap, self.compute_dtype,
            jnp.asarray(targets, jnp.int32))
        keep_np = np.asarray(keep)
        xyz = np.asarray(masked_decode(cand_codes, self.bits))[keep_np]
        rgb_np = np.round(np.asarray(rgb)[keep_np])
        return xyz + offset[None], rgb_np


def _c_encode_full(net, variables, codes, count, feats0, bits, cap, dtype):
    return net.apply(variables, codes, count, feats0,
                     method=lambda m, c, n, f: _rec_encode_impl(
                         m, c, n, bits, cap, dtype, m.cfg, f.astype(dtype)))


def _c_decode_full(net, variables, stream, res_row, bcodes, bcount, bits,
                   cap, dtype):
    return net.apply(variables, stream, res_row, bcodes, bcount,
                     method=lambda m, s, r, bc, bn: _rec_decode_impl(
                         m, s, r, bc, bn, bits, cap, dtype, m.cfg))


def _c_color_dec(net, variables, fea_e, codes_e, count_e, table_e, bits, cap,
                 dtype, targets):
    def fn(m, fea, codes, cnt, table, tg):
        cfg = m.cfg
        e = len(cfg.encoder_channels) - 1
        grids = {e: (codes, cnt)}
        tables = {e: table}
        cand, keep, rgb, _ = _color_dec_chain(
            m, fea, grids, tables, cap, bits, dtype, cfg,
            eval_targets={s: tg[s] for s in range(e)})
        return cand.codes, keep, rgb
    return net.apply(variables, fea_e, codes_e, count_e, table_e, targets,
                     method=fn)
