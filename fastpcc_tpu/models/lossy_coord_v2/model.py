"""lossy_coord_v2 — TMM'25 hierarchical lossy geometry compression.

TPU-native rebuild of the reference model
(reference: models/convolutional/lossy_coord_v2/model.py:23-288 and the
shared GeoLosslessEntropyModel,
lossy_coord_lossy_color/geo_lossl_em.py:20-329): a shallow lossy
encoder/decoder pair wraps a multi-scale "geo lossless" pyramid in which
each scale codes (a) a binary occupancy mask of all 8 candidate children
under hyper-decoded Bernoulli probabilities and (b) a bounded integer
feature residual against a hyper-decoded prediction. Rate points r1..r6 are
training-time bits_loss_factor settings (same architecture).

TPU-first: coordinates are sorted Morton codes; eval entropy coding runs on
device with the interleaved word coder — binary masks use per-element
2-symbol CDF rows quantized from the logits, and ALL feature residuals plus
the bottom feature share one empirical bincount CDF computed on device and
transmitted in the header (reference: geo_lossl_em.py:59-93
rans_encode_with_cdf).

Bitstream: [3x2B offset][4B n][E x 3B targets][4B bottom count]
           [1B res offset][2B res alphabet k][k x 2B CDF row]
           [4B word count + word stream]
           [host stream: bottom coords (bincount CDF, explicit alphabet)]
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
                                 simple_keep_mask)
from .network import (V2EncStage, V2DecStage, GeoEncStep, HyperDecFeaV2,
                      HyperDecCoordV2, SubResidualV2, SubDecoderV2, ConvA,
                      bound_value)
from .model_config import Config

LN2 = math.log(2)


class V2Net(nn.Module):
    """All learnable pieces of lossy_coord_v2."""
    cfg: Config

    def setup(self):
        c = self.cfg
        enc_ch = c.encoder_channels
        self.first = ConvA(enc_ch[0], c.activation)
        self.enc_stages = [V2EncStage(ch, c.activation) for ch in enc_ch[1:]]
        dec_ch = c.decoder_channels
        self.dec_stages = [
            V2DecStage(ch, c.activation, last=(i == len(dec_ch) - 1))
            for i, ch in enumerate(dec_ch)]

        g = c.geo_lossl_channels
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

    # the geo encoder's conv chain changes channel count; expose the step
    def geo_step(self, i: int, x_or_dense, table):
        return self.geo_enc[i].step(x_or_dense, table)

    def bottom_bound(self, x):
        return bound_value(x, jnp.float32(self.cfg.bottleneck_value_bound))


def _cap_of(cap: int, s: int, cfg) -> int:
    return max(cap >> (cfg.geo_cap_shrink_log2 * s), 256)


def _pyramid(codes, count, bits, cap, top_scale, cfg):
    """grids[s] = (codes, count) at static cap_of(s); maps[s] = (c2p, octant)
    mapping scale-s rows into s+1; tables[s] = neighbor table; fits = all
    counts within their static caps."""
    grids = {0: (codes, count)}
    maps, tables = {}, {}
    g = (codes, count)
    fits = jnp.bool_(True)
    for s in range(top_scale):
        octant = (g[0] & 7).astype(jnp.int32)
        parent, _, c2p = sp.downsample_with_bins(g[0], g[1], bits, 0)
        nxt_cap = _cap_of(cap, s + 1, cfg)
        fits = fits & (parent.count <= nxt_cap)
        pcodes = parent.codes[:nxt_cap]
        pcount = jnp.minimum(parent.count, nxt_cap)
        maps[s] = (c2p, octant)
        grids[s + 1] = (pcodes, pcount)
        g = (pcodes, pcount)
    # tables propagate top-down from one cheap coarse-scale search
    tables[top_scale] = sp.build_neighbor_table(*grids[top_scale], bits,
                                                bits - top_scale)
    for s in range(top_scale - 1, -1, -1):
        tables[s] = sp.child_table_from_parent(tables[s + 1], *maps[s],
                                               grids[s][1])
    return grids, maps, tables, fits


def _geo_scale_of(cfg) -> List[int]:
    e = len(cfg.encoder_channels) - 1
    out = [e]
    for up in cfg.geo_lossl_if_sample:
        out.append(out[-1] + up)
    return out


def _encoder_pass(net, codes, count, bits, cap, dtype, cfg, feats0=None):
    """Normal encoder + geo encoder -> (grids, maps, tables, strided feas,
    bottom fea, targets). feats0 defaults to ones (the color model passes
    [rgb/255, 2] features, reference: lossy_coord_lossy_color/model.py:151-158)."""
    scale_of = _geo_scale_of(cfg)
    top = scale_of[-1]
    grids, maps, tables, fits = _pyramid(codes, count, bits, cap, top, cfg)
    e = len(cfg.encoder_channels) - 1
    if feats0 is None:
        feats0 = jnp.ones((cap, 1), dtype)
    x = net.first(feats0, tables[0])
    targets = []
    for i, stage in enumerate(net.enc_stages):
        targets.append(grids[i][1])
        dense = sp.ancestor_gather_dense(grids[i][0], grids[i][1], x,
                                         grids[i + 1][0], bits, 1)
        x = stage(dense, tables[i + 1])
    # geo encoder chain (reference: layers.py:394-414)
    strided = [(x, e)]          # list[i] = (fea, scale); list[0] fea unused
    for i in range(len(cfg.geo_lossl_if_sample)):
        s = scale_of[i]
        if cfg.geo_lossl_if_sample[i]:
            dense = sp.ancestor_gather_dense(
                grids[s][0], grids[s][1], x, grids[s + 1][0], bits, 1)
            x, out = net.geo_step(i, dense, tables[s + 1])
        else:
            x, out = net.geo_step(i, x, tables[s])
        strided.append((out if out is not None else x, scale_of[i + 1]))
    bottom = net.bottom_bound(strided[-1][0].astype(jnp.float32))
    return grids, maps, tables, strided[:-1], bottom, targets, fits


def _fea_pred(net, i, lower, up, grids, maps, tables, s_low, s_tgt, bits,
              dtype):
    """Hyper-decode the scale-s_tgt feature prediction from lower (at
    s_low = s_tgt + up)."""
    hd = net.hd_fea[i]
    if up:
        dense = hd.up_dense(lower.astype(jnp.float32))
        c2p, octant = maps[s_tgt]
        feats = _octant_gather(dense, c2p, octant)
    else:
        feats = hd.same(lower.astype(jnp.float32), tables[s_tgt])
    return hd.refine(feats, tables[s_tgt])


def _coord_logits(net, i, lower, grids, bits, s_tgt, cand_cap, parent_table,
                  cfg):
    """All-8 candidate occupancy logits from lower (at s_tgt + 1)."""
    hd = net.hd_coord[i]
    codes_p, count_p = grids[s_tgt + 1]
    dense = hd.up_dense(lower.astype(jnp.float32))
    pcap = codes_p.shape[0]
    all8 = jnp.broadcast_to((jnp.arange(pcap) < count_p)[:, None], (pcap, 8))
    cand, p_of_c, oct_of_c = sp.expand_children(codes_p, count_p, all8, bits,
                                                cand_cap)
    cand_feats = _octant_gather(dense, p_of_c, oct_of_c)
    cand_table = sp.child_table_from_parent(parent_table, p_of_c, oct_of_c,
                                            cand.count)
    logits = hd.refine(cand_feats, cand_table)
    return cand, p_of_c, oct_of_c, logits, cand_table


def _train_apply(net: V2Net, codes, count, points_num, rng, step):
    cfg = net.cfg
    bits = cfg.coord_bits
    cap = codes.shape[0]
    dtype = jnp.bfloat16 if cfg.compute_dtype == 'bfloat16' else jnp.float32
    scale_of = _geo_scale_of(cfg)
    steps = len(cfg.geo_lossl_if_sample)
    skip = cfg.skip_encoding_fea
    total_points = points_num.sum()

    grids, maps, tables, strided, bottom, targets, _ = _encoder_pass(
        net, codes, count, bits, cap, dtype, cfg)
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
        if up and cfg.coord_mode == 'learned':
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

    # normal decoder with per-scale BCE (reference: layers.py:118-137)
    e = len(cfg.encoder_channels) - 1
    feats = lower.astype(dtype)
    parent_codes, parent_count = grids[e]
    recon_losses = []
    for j, stage in enumerate(net.dec_stages):
        s_child = e - 1 - j
        cand_cap = 2 * _cap_of(cap, s_child, cfg)
        dense = stage.child_dense(feats, tables[s_child + 1])
        pcap = parent_codes.shape[0]
        all8 = jnp.broadcast_to((jnp.arange(pcap) < parent_count)[:, None],
                                (pcap, 8))
        cand, p_of_c, oct_of_c = sp.expand_children(
            parent_codes, parent_count, all8, bits, cand_cap)
        cand_feats = _octant_gather(dense, p_of_c, oct_of_c)
        cand_table = sp.build_neighbor_table(cand.codes, cand.count, bits,
                                             bits - s_child)
        refined, logits = stage.refine(cand_feats, cand_table)
        tgt = sp.membership_mask(cand.codes, *grids[s_child])
        cand_valid = jnp.arange(cand_cap) < cand.count
        recon = (_bce(logits, tgt.astype(jnp.float32)) * cand_valid).sum()
        recon_losses.append(recon / total_points)
        if j < len(net.dec_stages) - 1:
            keep = (tgt | (logits > 0)) & cand_valid
            new_codes, new_count, gidx = sp.mask_compact(cand.codes, keep,
                                                         cand_cap)
            feats = sp.gather_padded(refined, gidx)
            parent_codes, parent_count = new_codes, new_count

    fea_factor = jnp.where(jnp.asarray(step) < cfg.warmup_fea_loss_steps,
                           cfg.warmup_fea_loss_factor, cfg.bits_loss_factor)
    total = jnp.float32(0)
    aux = {}
    for k, v in loss.items():
        w = fea_factor if 'fea' in k else cfg.bits_loss_factor
        total = total + v * w / total_points
        aux[k] = v
    for j, r in enumerate(recon_losses):
        total = total + r * cfg.coord_recon_loss_factor
        aux[f'coord_recon_{j}_loss'] = r
    aux['loss'] = total
    return total, aux


# --------------------------------------------------------------- eval coding

def _binary_rows(logits):
    """[N] logits -> [N, 2] uint16 CDF rows: row[0] = quantized P(0)."""
    p1 = jax.nn.sigmoid(logits.astype(jnp.float32))
    q1 = jnp.clip(jnp.round(p1 * 65536.0), 1, 65535)
    row0 = (65536.0 - q1)
    rows = jnp.stack([row0, jnp.full_like(row0, 65535.0)], axis=-1)
    return rows.astype(jnp.uint16)


def _rec_encode_impl(net, codes, count, bits, cap, dtype, cfg, feats0=None):
    """Traced eval encode -> (bptr, buf, res_cdf_row, res_offset_ok...,
    bottom coords, bottom count, targets, ok)."""
    scale_of = _geo_scale_of(cfg)
    steps = len(cfg.geo_lossl_if_sample)
    skip = cfg.skip_encoding_fea
    bound = cfg.bottleneck_value_bound
    alpha = 2 * bound + 1

    grids, maps, tables, strided, bottom, targets, fits = _encoder_pass(
        net, codes, count, bits, cap, dtype, cfg, feats0)
    ok = fits
    s_b = scale_of[-1]
    count_b = grids[s_b][1]
    cap_b = grids[s_b][0].shape[0]
    c_b = bottom.shape[-1]

    # pass 1: walk scales, collect residual symbol arrays + mask segments
    sym_arrays = []     # (symbols [N], valid count) in DECODE order
    seg_meta = []       # ('fea', i) | ('coord', i) | ('bottom',)
    coord_rows = {}
    coord_syms = {}

    bottom_syms = jnp.round(bottom).astype(jnp.int32)          # bounded
    sym_arrays.append((bottom_syms.reshape(-1) + bound, count_b * c_b))
    seg_meta.append(('bottom',))
    valid_b = (jnp.arange(cap_b) < count_b).astype(jnp.float32)
    lower = bottom_syms.astype(jnp.float32) * valid_b[:, None]

    for i in range(steps - 1, -1, -1):
        s_tgt = scale_of[i]
        up = bool(cfg.geo_lossl_if_sample[i])
        if up and cfg.coord_mode == 'learned':
            cand_cap = 8 * _cap_of(cap, s_tgt + 1, cfg)
            cand, _, _, logits, _ = _coord_logits(
                net, i, lower, grids, bits, s_tgt, cand_cap,
                tables[s_tgt + 1], cfg)
            mask = sp.membership_mask(cand.codes, *grids[s_tgt])
            coord_rows[i] = _binary_rows(logits)
            coord_syms[i] = (mask.astype(jnp.int32), cand.count)
            seg_meta.append(('coord', i))
        pred = _fea_pred(net, i, lower, up, grids, maps, tables,
                         scale_of[i + 1], s_tgt, bits, dtype)
        valid_s = (jnp.arange(grids[s_tgt][0].shape[0]) < grids[s_tgt][1]) \
            .astype(jnp.float32)
        if i > skip:
            fea_i = strided[i][0].astype(jnp.float32)
            res = net.residuals[i](fea_i, pred, tables[s_tgt])
            syms = jnp.round(res).astype(jnp.int32)
            sym_arrays.append(((syms + bound).reshape(-1),
                               grids[s_tgt][1] * syms.shape[-1]))
            seg_meta.append(('fea', i))
            lower = net.dec_blocks[i](syms.astype(jnp.float32), pred)
        else:
            lower = net.dec_blocks[i](None, pred)
        lower = lower * valid_s[:, None]

    # empirical bincount CDF over ALL residual symbols (device-side analog of
    # the reference's rans_encode_with_cdf, geo_lossl_em.py:59-75)
    counts = jnp.zeros((alpha,), jnp.float32)
    for syms, cnt in sym_arrays:
        valid = jnp.arange(syms.shape[0]) < cnt
        onehot = (syms[:, None] == jnp.arange(alpha)[None, :]) & valid[:, None]
        counts = counts + onehot.sum(0)
    pmf = counts / jnp.maximum(counts.sum(), 1.0)
    from ...entropy_models.indexed import pmf_to_quantized_cdf_rows
    res_row = pmf_to_quantized_cdf_rows(pmf[None])[0]          # [alpha] u16

    # encode segments in reverse decode order
    lanes = cfg.coder_lanes
    total_syms = sum(int(s.shape[0]) for s, _ in sym_arrays) \
        + sum(int(r.shape[0]) for r in coord_rows.values())
    capw = ir.word_capacity_for(total_syms, lanes)
    rs, bptr, buf = ir.init_encoder(lanes, capw)
    segments = []
    fea_iter = iter(sym_arrays)
    for meta in seg_meta:
        if meta[0] in ('bottom', 'fea'):
            syms, cnt = next(fea_iter)
            rows = jnp.broadcast_to(res_row[None], (syms.shape[0], alpha))
            segments.append((rows, syms, cnt))
        else:
            i = meta[1]
            syms, cnt = coord_syms[i]
            segments.append((coord_rows[i], syms, cnt))
    for rows, syms, cnt in reversed(segments):
        starts, freqs = ir.enc_pairs(rows, syms)
        rs, bptr, buf = ir.encode_segment(rs, bptr, buf, starts, freqs, cnt)
    bptr, buf = ir.encode_flush(rs, bptr, buf)

    bottom_coords = masked_decode(grids[s_b][0], bits)
    e = len(cfg.encoder_channels) - 1
    e_coords = masked_decode(grids[e][0], bits)
    e_count = grids[e][1]
    tgt_stack = jnp.stack(targets) if targets else jnp.zeros((0,), jnp.int32)
    return (bptr, buf, res_row, bottom_coords, count_b, e_coords, e_count,
            tgt_stack, ok)


def _rec_decode_impl(net, stream, res_row, bottom_codes, bottom_count, bits,
                     cap, dtype, cfg, e_codes=None, e_count=None):
    """Eval decode (traceable): stream words -> (codes_e, count_e, fea_e).
    In coord_mode='gpcc_raw', e_codes/e_count give the scale-E geometry
    (decoded from the raw/G-PCC stream); all scale coords derive from it and
    no mask segments exist."""
    scale_of = _geo_scale_of(cfg)
    steps = len(cfg.geo_lossl_if_sample)
    skip = cfg.skip_encoding_fea
    bound = cfg.bottleneck_value_bound
    alpha = 2 * bound + 1
    lanes = cfg.coder_lanes
    c_b = cfg.geo_lossl_channels[-1]

    rs, ptr = ir.init_decoder(stream, jnp.int32(0), lanes)
    s_b = scale_of[-1]
    cap_b = _cap_of(cap, s_b, cfg)
    known = None
    if cfg.coord_mode == 'gpcc_raw':
        e = len(cfg.encoder_channels) - 1
        kgrids, kmaps, ktables, _ = _pyramid(e_codes, e_count, bits, cap,
                                             s_b - e, cfg)
        known = (kgrids, kmaps, ktables, e)
    rows_b = jnp.broadcast_to(res_row[None], (cap_b * c_b, alpha))
    rs, ptr, syms_b = ir.decode_segment(rs, ptr, stream, rows_b,
                                        bottom_count * c_b)
    valid_b = (jnp.arange(cap_b) < bottom_count).astype(jnp.float32)
    lower = (syms_b.reshape(cap_b, c_b).astype(jnp.float32) - bound) \
        * valid_b[:, None]
    codes_cur, count_cur = bottom_codes, bottom_count
    cur_table = sp.build_neighbor_table(codes_cur, count_cur, bits,
                                        bits - scale_of[-1])

    for i in range(steps - 1, -1, -1):
        s_tgt = scale_of[i]
        up = bool(cfg.geo_lossl_if_sample[i])
        grids_i = {s_tgt + 1: (codes_cur, count_cur)}
        if up and known is not None:
            kgrids, kmaps, ktables, e = known
            codes_t, count_t = kgrids[s_tgt - e]
            c2p_t, oct_t = kmaps[s_tgt - e]
            table_t = ktables[s_tgt - e]
        elif up:
            cand_cap = 8 * _cap_of(cap, s_tgt + 1, cfg)
            cand, p_of_c, oct_of_c, logits, cand_table = _coord_logits(
                net, i, lower, grids_i, bits, s_tgt, cand_cap, cur_table,
                cfg)
            rows_c = _binary_rows(logits)
            rs, ptr, msyms = ir.decode_segment(rs, ptr, stream, rows_c,
                                               cand.count)
            keep = msyms.astype(bool) & (jnp.arange(cand_cap) < cand.count)
            tgt_cap = _cap_of(cap, s_tgt, cfg)
            codes_t, count_t, gidx = sp.mask_compact(cand.codes, keep,
                                                     tgt_cap)
            p_pad = jnp.concatenate([p_of_c,
                                     jnp.full((1,), codes_cur.shape[0],
                                              jnp.int32)])
            o_pad = jnp.concatenate([oct_of_c, jnp.zeros((1,), jnp.int32)])
            c2p_t = p_pad[jnp.minimum(gidx, cand_cap)]
            oct_t = o_pad[jnp.minimum(gidx, cand_cap)]
            table_t = sp.compact_table(cand_table, gidx, count_t)
        else:
            codes_t, count_t = codes_cur, count_cur
            c2p_t = oct_t = None
            table_t = cur_table
        hd = net.hd_fea[i]
        if up:
            dense = hd.up_dense(lower.astype(jnp.float32))
            feats = _octant_gather(dense, c2p_t, oct_t)
        else:
            feats = hd.same(lower.astype(jnp.float32), table_t)
        pred = hd.refine(feats, table_t)
        valid_t = (jnp.arange(codes_t.shape[0]) < count_t) \
            .astype(jnp.float32)
        if i > skip:
            ch = cfg.compressed_channels[i]
            n_rows = codes_t.shape[0] * ch
            rows_f = jnp.broadcast_to(res_row[None], (n_rows, alpha))
            rs, ptr, syms = ir.decode_segment(rs, ptr, stream, rows_f,
                                              count_t * ch)
            res = syms.reshape(codes_t.shape[0], ch).astype(jnp.float32) \
                - bound
            lower = net.dec_blocks[i](res, pred)
        else:
            lower = net.dec_blocks[i](None, pred)
        lower = lower * valid_t[:, None]
        codes_cur, count_cur = codes_t, count_t
        cur_table = table_t
    return codes_cur, count_cur, lower



class Model:
    """Public API: train_loss / compress / decompress (reference Model,
    lossy_coord_v2/model.py:23)."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.bits = cfg.coord_bits
        self.net = V2Net(cfg)
        self.compute_dtype = jnp.bfloat16 if cfg.compute_dtype == 'bfloat16' \
            else jnp.float32
        self._rans_enc = None
        self._rans_dec = None
        self._jit_encode = jax.jit(
            functools.partial(_v2_encode_full, self.net),
            static_argnums=(3, 4, 5))
        self._jit_decode = jax.jit(
            functools.partial(_v2_decode_full, self.net),
            static_argnums=(5, 6, 7))
        self._jit_dec_stage = jax.jit(
            functools.partial(_v2_dec_stage, self.net),
            static_argnums=(1, 5, 6, 7, 9))

    def init_params(self, rng: jax.Array, example_n: int = 512) -> Dict:
        cap = _bucket(example_n)
        codes_np = np.sort(np.random.default_rng(0).choice(
            1 << 15, size=cap // 4, replace=False)).astype(np.int64)
        codes = jnp.asarray(sp_pad(codes_np, cap))
        count = jnp.int32(len(codes_np))
        pn = jnp.asarray([float(len(codes_np))], jnp.float32)
        v = self.net.init(rng, codes, count, pn, jax.random.PRNGKey(1),
                          jnp.int32(0), method=_train_apply)
        return v['params']

    def train_loss(self, params, codes, count, points_num, step=0,
                   rng: Optional[jax.Array] = None):
        if rng is None:
            rng = jax.random.fold_in(jax.random.PRNGKey(7), jnp.asarray(step))
        return self.net.apply({'params': params}, codes, count, points_num,
                              rng, step, method=_train_apply)

    def _coders(self):
        if self._rans_enc is None:
            self._rans_enc = RansEncoder(1 << 22)
            self._rans_dec = RansDecoder()
        return self._rans_enc, self._rans_dec

    def compress(self, params, xyz: np.ndarray) -> bytes:
        from ..lossy_coord.model import Model as V1Model
        enc, _ = self._coders()
        offset = xyz.min(0)
        codes_np = np.unique(np_morton_encode((xyz - offset).astype(np.int64)))
        n = len(codes_np)
        cap = _bucket(n)
        out = self._jit_encode({'params': params},
                               jnp.asarray(sp_pad(codes_np, cap)),
                               jnp.int32(n), self.bits, cap,
                               self.compute_dtype)
        (bptr, buf, res_row, bottom_coords_d, count_b, e_coords_d, e_count,
         targets, ok) = out
        assert bool(ok), 'lossy_coord_v2 capacity overflow (geo_cap_shrink)'
        blob = ir.stream_to_bytes(bptr, buf, self.cfg.coder_lanes)
        bn = int(count_b)
        if self.cfg.coord_mode == 'gpcc_raw':
            # scale-E geometry replaces the bottom coords + mask streams
            # (reference: gpcc_lossy_coord_v2/geo_lossl_em.py; tmc3 when
            # available, self-contained raw coder otherwise)
            from ...metrics.gpcc_utils import gpcc_available, \
                gpcc_octree_lossless_geom_encode
            en = int(e_count)
            ecoords = np.asarray(e_coords_d)[:en]
            if gpcc_available():
                coord_stream = b'\x01' + gpcc_octree_lossless_geom_encode(
                    ecoords, '')
                self.extra_metric_info = {'bottom_coord_coder': 'gpcc_tmc3'}
            else:
                coord_stream = b'\x00' + V1Model._encode_bottom_coords(
                    self, enc, ecoords)
                self.extra_metric_info = {'bottom_coord_coder':
                                          'bincount_raw'}
            bn = en
        else:
            bcoords = np.asarray(bottom_coords_d)[:bn]
            coord_stream = V1Model._encode_bottom_coords(self, enc, bcoords)
            self.extra_metric_info = {'bottom_coord_coder': 'bincount_raw'}
        scaler = self.cfg.adaptive_pruning_scaler
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

    def decompress(self, params, data: bytes) -> np.ndarray:
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
        e = len(cfg.encoder_channels) - 1
        e_codes_j = None
        if cfg.coord_mode == 'gpcc_raw':
            from ...metrics.gpcc_utils import gpcc_decode
            if coord_stream[:1] == b'\x01':
                ecoords = gpcc_decode(coord_stream[1:])
            else:
                ecoords = V1Model._decode_bottom_coords(
                    self, dec, coord_stream[1:], bn * 3).reshape(-1, 3)
            ecodes = np.sort(np_morton_encode(ecoords.astype(np.int64)))
            e_codes_j = jnp.asarray(sp_pad(ecodes, _cap_of(cap, e, cfg)))
            # the bottom grid derives from the scale-E codes
            bshift = 3 * (scale_of[-1] - e)
            bcodes = np.unique(ecodes >> bshift)
            bn = len(bcodes)
        else:
            bcoords = V1Model._decode_bottom_coords(self, dec, coord_stream,
                                                    bn * 3).reshape(-1, 3)
            bcodes = np.sort(np_morton_encode(bcoords.astype(np.int64)))
        total_syms = 0
        for i, up in enumerate(cfg.geo_lossl_if_sample):
            s = scale_of[i]
            total_syms += _cap_of(cap, s, cfg) * cfg.compressed_channels[i] \
                + 8 * _cap_of(cap, s + 1, cfg) * up
        capw = ir.word_capacity_for(total_syms + cap_b * alpha,
                                    cfg.coder_lanes)
        words, _, _ = ir.bytes_to_stream(blob, capw, cfg.coder_lanes)
        codes_e, count_e, fea_e = self._jit_decode(
            {'params': params}, words, jnp.asarray(res_row.astype(np.int32))
            .astype(jnp.uint16),
            jnp.asarray(sp_pad(bcodes, cap_b)), jnp.int32(bn),
            self.bits, cap, self.compute_dtype,
            e_codes_j, None if e_codes_j is None else jnp.int32(len(ecodes)))
        # normal decoder
        parent_codes, parent_count = codes_e, count_e
        feats = fea_e.astype(self.compute_dtype)
        for j in range(len(cfg.decoder_channels)):
            s_child = e - 1 - j
            cand_cap = _bucket(min(int(parent_count) * 8, 8 * cap))
            parent_codes, parent_count, feats = self._jit_dec_stage(
                {'params': params}, j, feats, parent_codes, parent_count,
                self.bits, s_child, cand_cap, jnp.int32(targets[s_child]),
                cfg.adaptive_pruning)
        cnt = int(parent_count)
        xyz = np.asarray(masked_decode(parent_codes, self.bits)[:cnt])
        return xyz + offset[None]


def _v2_encode_full(net, variables, codes, count, bits, cap, dtype):
    return net.apply(variables, codes, count,
                     method=lambda m, c, n: _rec_encode_impl(
                         m, c, n, bits, cap, dtype, m.cfg))


def _v2_decode_full(net, variables, stream, res_row, bcodes, bcount, bits,
                    cap, dtype, e_codes=None, e_count=None):
    if e_codes is None:
        return net.apply(variables, stream, res_row, bcodes, bcount,
                         method=lambda m, s, r, bc, bn: _rec_decode_impl(
                             m, s, r, bc, bn, bits, cap, dtype, m.cfg))
    return net.apply(variables, stream, res_row, bcodes, bcount, e_codes,
                     e_count,
                     method=lambda m, s, r, bc, bn, ec, en: _rec_decode_impl(
                         m, s, r, bc, bn, bits, cap, dtype, m.cfg, ec, en))


def _v2_dec_stage(net, variables, stage_j, feats, parent_codes, parent_count,
                  bits, s_child, cand_cap, target_num, adaptive):
    def fn(m, feats, parent_codes, parent_count, target_num):
        stage = m.dec_stages[stage_j]
        # the last stage's pre-conv needs the parent table
        ptable = sp.build_neighbor_table(parent_codes, parent_count, bits,
                                         bits - (s_child + 1))
        dense = stage.child_dense(feats, ptable)
        pcap = parent_codes.shape[0]
        all8 = jnp.broadcast_to((jnp.arange(pcap) < parent_count)[:, None],
                                (pcap, 8))
        cand, p_of_c, oct_of_c = sp.expand_children(
            parent_codes, parent_count, all8, bits, cand_cap)
        cand_feats = _octant_gather(dense, p_of_c, oct_of_c)
        cand_table = sp.build_neighbor_table(cand.codes, cand.count, bits,
                                             bits - s_child)
        refined, logits = stage.refine(cand_feats, cand_table)
        levels = len(m.dec_stages) - s_child
        if adaptive:
            keep = adaptive_keep_mask(cand.codes, cand.count, logits,
                                      target_num, levels, keep_local_max=True)
        else:
            keep = simple_keep_mask(cand.codes, cand.count, logits, levels)
        new_codes, new_count, gidx = sp.mask_compact(cand.codes, keep,
                                                     cand_cap)
        new_feats = sp.gather_padded(refined, gidx)
        return new_codes, new_count, new_feats
    return net.apply(variables, feats, parent_codes, parent_count, target_num,
                     method=fn)
