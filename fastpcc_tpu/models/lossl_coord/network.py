"""Network definition for the lossless-coordinate flagship model.

Faithful in topology to the reference's multiscale binary-occupancy
factorization (reference: models/convolutional/lossl_coord/model.py:30-273):
a pyramid of 2x2x2 occupancy "bins" is predicted top-down; each scale's
255-way octant distribution is coded with rANS. TPU-native execution:

  * The pyramid is pure Morton-code arithmetic (ops.downsample_with_bins).
  * Every scale's 3^3 convs share one neighbor table (ops.build_neighbor_table).
  * OneScalePredictor upsampling scatters parent features to occupied children
    through (parent_of_child, octant) index maps instead of sparse transpose
    convs (reference: lossl_coord/model.py:72-79).
  * OneScaleMultiStepPredictor re-densification chains run the fine scales
    with pointwise GEMMs + per-level convs (reference: lossl_coord/model.py:124-273).

All methods are shape-static; compress/decompress drive them as per-scale
jitted steps so encoder and decoder produce bit-identical CDFs.
"""
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn.blocks import (OctantSelectDense, PDense, PReLU, ResBlock,
                          SparseConv3x3, SplitDense, StridedOctantConv)
from ...ops.sparse import gather_padded


class OneScalePredictor(nn.Module):
    """Predict one scale's octant symbols and upsample features to children
    (reference: lossl_coord/model.py:30-121).

    All pointwise layers compute in the activation dtype (bf16 by default) —
    round-3 traces showed flax Dense's f32 promotion materializing f32
    [N, 8*ch] HBM intermediates that dominated the full-resolution scales.
    The ch->8*ch upsample head + child selection is fused (OctantSelectDense)
    and concat inputs use split matmuls (SplitDense); both are param-tree
    compatible with the unfused layers."""
    channels: int
    if_upsample: bool = True
    allow_single_ch: bool = False

    def setup(self):
        if self.allow_single_ch:
            self.dec_init = SparseConv3x3(self.channels)
        self.dec = ResBlock(self.channels)
        self.pred_conv = SparseConv3x3(self.channels)
        self.pred_act = PReLU()
        self.pred_out = PDense(255)
        if self.if_upsample:
            self.up_in = SplitDense(self.channels)
            self.up_act = PReLU()
            self.up_block = ResBlock(self.channels)
            self.up_out = OctantSelectDense(self.channels)

    def logits(self, feats: jax.Array, table: jax.Array):
        """-> (dec_feats [N, ch], logits [N, 255])."""
        if feats.shape[-1] == 1:
            feats = self.dec_init(feats, table)
        feats = self.dec(feats, table)
        x = self.pred_conv(feats, table)
        x = self.pred_act(x)
        return feats, self.pred_out(x)

    def upsample(self, dec_feats: jax.Array, bins: jax.Array, table: jax.Array,
                 parent_of_child: jax.Array, octant_of_child: jax.Array):
        """-> child feats [cap_child, ch]; rows past the child count are junk
        (downstream ops mask by count)."""
        x = self.up_in(dec_feats, bins)
        x = self.up_act(x)
        x = self.up_block(x, table)
        return self.up_out(x, parent_of_child, octant_of_child)


class OneScaleMultiStepPredictor(nn.Module):
    """Predict ``pred_steps`` successively finer scales from one feature level
    (reference: lossl_coord/model.py:124-273). This port implements the
    reference's default ``use_more_ch_for_multi_step_pred=False`` layout.

    feature_propagation=False is the wo_fea_prop ablation: the propagated
    root features are dropped and dec consumes only the bins embed
    (reference: lossl_coord_wo_fea_prop/model.py:101-137)."""
    channels: int
    pred_steps: int
    feature_propagation: bool = True

    def setup(self):
        ch = self.channels
        if self.pred_steps == 2:
            self.embed = None
            # [ch | 8] -> ch; wo_fea_prop: [8] -> ch
            self.dec_in = SplitDense(ch) if self.feature_propagation \
                else PDense(ch)
        else:
            assert self.pred_steps >= 3
            self.embed = StridedOctantConv(ch, self.pred_steps - 2)
            self.embed_act = PReLU() if ch >= 256 else None
            # [ch | ch] -> ch; wo_fea_prop: [ch] -> ch
            self.dec_in = SplitDense(ch) if self.feature_propagation \
                else PDense(ch)
        self.dec_act = PReLU()
        self.dec_block = ResBlock(ch)

        chain = []
        for i in range(self.pred_steps):
            if i == 0:
                chain.append(dict(conv=SparseConv3x3(ch), act=PReLU(),
                                  out=OctantSelectDense(ch)))
            elif i != self.pred_steps - 1:
                chain.append(dict(
                    pre_act=PReLU(), mix=SplitDense(ch),
                    mix_act=PReLU(), conv=SparseConv3x3(ch), act=PReLU(),
                    out=OctantSelectDense(ch)))
            else:
                chain.append(dict(conv=SparseConv3x3(ch), act=PReLU(),
                                  out=PDense(255)))
        self.chain = chain

    def root_feats(self, feats: jax.Array, root_table: jax.Array,
                   bins_root: jax.Array, embed_dense: Optional[jax.Array]):
        """Fuse root features with the root-level bins (+ strided embed of the
        next-finer bins for pred_steps >= 3); returns the block's cur_rec."""
        if self.pred_steps == 2:
            x = self.dec_in(feats, bins_root) if self.feature_propagation \
                else self.dec_in(bins_root.astype(feats.dtype))
        else:
            e = self.embed(embed_dense)
            if self.embed_act is not None:
                e = self.embed_act(e)
            x = self.dec_in(feats, e) if self.feature_propagation \
                else self.dec_in(e)
        x = self.dec_act(x)
        return self.dec_block(x, root_table)

    def chain_logits(self, root_out: jax.Array, tables: Sequence[jax.Array],
                     select_maps: Sequence[Tuple[jax.Array, jax.Array]],
                     cat_bins: Sequence[Optional[jax.Array]]):
        """Run the re-densification chain.

        tables[i]:      neighbor table at chain level i (root first).
        select_maps[i]: (parent_of_child, octant) mapping level i rows to
                        level i+1 rows, for i < pred_steps-1.
        cat_bins[i]:    bins to concatenate after selection i (None for last).
        -> logits [cap_finest, 255]

        The ch->8*ch 'out' head of level i is fused with level i+1's child
        selection (OctantSelectDense), and the bins concat is a split matmul.
        The pre-select PReLU ('pre_act') is applied to the selected features
        only — bins are 0/1 so PReLU is the identity on them."""
        step = self.chain[0]
        h = step['conv'](root_out, tables[0])
        h = step['act'](h)
        for i in range(1, self.pred_steps):
            p_of_c, octant = select_maps[i - 1]
            x = self.chain[i - 1]['out'](h, p_of_c, octant)
            step = self.chain[i]
            if i != self.pred_steps - 1:
                x = step['pre_act'](x)
                x = step['mix'](x, cat_bins[i - 1])
                x = step['mix_act'](x)
            h = step['conv'](x, tables[i])
            h = step['act'](h)
        return self.chain[-1]['out'](h)


def block_plan(max_stride: int, max_stride_wo_recurrent: int, fea_stride: int):
    """Return (max_down, per-scale block spec list).

    spec[idx-1] for idx in 1..max_down_wo_recurrent describes the block used
    at stride 2^idx (reference: lossl_coord/model.py:322-332):
      ('osp', if_upsample) or ('ms', pred_steps).
    Scales above max_down_wo_recurrent reuse the recurrent OSP block."""
    import math
    max_down = int(math.log2(max_stride))
    max_down_wo = int(math.log2(max_stride_wo_recurrent))
    fea_log = int(math.log2(fea_stride))
    specs = []
    for idx in range(max_down_wo):
        pred_steps = fea_log - idx
        if pred_steps < 1:
            specs.append(('osp', True))
        elif pred_steps == 1:
            specs.append(('osp', False))
        else:
            specs.append(('ms', pred_steps))
    return max_down, max_down_wo, specs


def make_blocks(channels: int, max_stride: int, max_stride_wo_recurrent: int,
                fea_stride: int, feature_propagation: bool = True):
    """Instantiate the per-scale block modules.

    Returns (max_down, max_down_wo, specs, blocks) where blocks is a dict
    name -> module: 'rec' plus 'b{i}' for i in 0..max_down_wo-1. Blocks are
    standalone modules (params keyed per block) so that jit traces of the
    per-scale step functions are shared across blocks with identical
    parameter structure.

    feature_propagation=False is the wo_fea_prop ablation: every scale starts
    from fresh ones-features through its own dec_init conv instead of the
    learned upsample, and multi-step chains consume only the bins embed
    (reference: lossl_coord_wo_fea_prop/model.py:25-137; with fea_stride 2
    this is the wo_redens configuration)."""
    max_down, max_down_wo, specs = block_plan(max_stride, max_stride_wo_recurrent,
                                              fea_stride)
    blocks = {'rec': OneScalePredictor(channels, feature_propagation,
                                       allow_single_ch=True)}
    for i, (kind, arg) in enumerate(specs):
        if kind == 'osp':
            if feature_propagation:
                blocks[f'b{i}'] = OneScalePredictor(channels, if_upsample=arg)
            else:
                blocks[f'b{i}'] = OneScalePredictor(channels, False,
                                                    allow_single_ch=True)
        else:
            blocks[f'b{i}'] = OneScaleMultiStepPredictor(
                channels, arg, feature_propagation=feature_propagation)
    return max_down, max_down_wo, specs, blocks
