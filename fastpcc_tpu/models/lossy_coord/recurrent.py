"""Recurrent lossless-based entropy model for lossy_coord.

TPU-native rebuild of the reference's GeoLosslessNoisyDeepFactorizedEntropyModel
(reference: models/convolutional/lossy_coord/geo_lossl_em.py:20-400) and its
recurrent encoder (reference: lossy_coord/layers.py:385-481): the stride-8
bottleneck is recursively downsampled by a gated recurrent encoder until one
voxel per sample remains; the bottom feature is coded with a factorized EM,
and each finer scale is reconstructed by hyper-decoding (a) a binary
occupancy mask over all 8 candidate children (indexed EM over
NoisyDeepFactorized priors) and (b) the scale's feature (optionally as a
residual against a hyper-decoded prediction, ``hybrid_hyper_decoder_fea``).

TPU-first differences from the reference:
  * Coordinates are sorted Morton codes; candidate generation, pruning and
    parent->child maps are code arithmetic (ops/sparse.py), not ME kernel maps.
  * Entropy coding runs on device via the interleaved word coder
    (ops/ilv_rans.py): CDF rows are gathered from the EMs' full-grid quantized
    tables by flat index, so eval decode needs NO per-scale host round trips
    (the reference ships tensors across the GPU/CPU boundary per scale).
  * Weight sharing follows the reference: the finest ``NON_SHARED_SCALES``
    scale steps own their blocks; coarser steps share one block set
    (reference: lossy_coord/layers.py:17-18,338-343).
"""
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import sparse as sp
from ...ops import ilv_rans as ir
from ...entropy_models.batched import ContinuousBatchedEntropyModel
from ...entropy_models.indexed import IndexedNoisyDeepFactorized
from .network import ConvBlock3, basic_blocks, _act

NON_SHARED_SCALES = 3   # reference: lossy_coord/layers.py:18


def _slot(i: int) -> int:
    return min(i, NON_SHARED_SCALES)


class _EncStep(nn.Module):
    """One gated recurrent downsample step (reference:
    lossy_coord/layers.py:396-414 make_block + forward gating :450-476)."""
    hidden: int
    out: int
    block_type: str
    block_num: int
    act: str

    def setup(self):
        h = self.hidden
        self.gate = nn.Dense(h, param_dtype=jnp.float32,
                             kernel_init=nn.initializers.ones,
                             bias_init=nn.initializers.zeros)
        self.down = nn.Dense(h, param_dtype=jnp.float32)   # applied on [M,8,h]
        self.blocks = basic_blocks(self.block_type, h, self.block_num, self.act)
        self.conv_out = ConvBlock3(h, self.act)

        def eye_init(key, shape, dtype=jnp.float32):
            w = jnp.zeros(shape, dtype)
            return w.at[:self.out, :].set(jnp.eye(self.out, shape[1], dtype=dtype))

        self.out_mlp = nn.Dense(self.out, param_dtype=jnp.float32,
                                kernel_init=eye_init,
                                bias_init=nn.initializers.zeros)

    def forget(self, cx, hx):
        """forget_gate * cx (reference: layers.py:468-471)."""
        g = 2.0 * jax.nn.sigmoid(self.gate(hx.astype(jnp.float32)))
        return cx * g.astype(cx.dtype)

    def step_parent(self, dense_child, parent_table):
        """dense_child: [M, 8, H] gated child features gathered per parent ->
        (cx_parent [M, H], hx_parent [M, out])."""
        m, k, h = dense_child.shape
        x = self.down(dense_child.reshape(m, k * h))
        x = _act(x, self.act)
        for b in self.blocks:
            x = b(x, parent_table)
        cx = self.conv_out(x, parent_table)
        hx = self.out_mlp(cx.astype(jnp.float32))
        return cx, hx


class _HyperDecUp(nn.Module):
    """Hyper decoder: transpose-conv 2x to children + blocks + head
    (reference: HyperDecoderUpsample / HyperDecoderGenUpsample,
    lossy_coord/layers.py:293-381)."""
    intra: int
    out: int
    block_type: str
    block_num: int
    act: str

    def setup(self):
        from ...nn.blocks import SparseConv3x3
        self.up = nn.Dense(8 * self.intra, param_dtype=jnp.float32)
        self.blocks = basic_blocks(self.block_type, self.intra,
                                   self.block_num, self.act)
        self.head = SparseConv3x3(self.out)     # final 3^3 conv, no act

    def up_dense(self, lower_fea):
        """[M, C] -> [M, 8, intra] per-octant child features."""
        m = lower_fea.shape[0]
        x = self.up(lower_fea.astype(jnp.float32))
        return _act(x, self.act).reshape(m, 8, self.intra)

    def refine(self, child_feats, child_table):
        """[N, intra] gathered child feats -> [N, out]."""
        x = child_feats
        for b in self.blocks:
            x = b(x, child_table)
        return self.head(x, child_table).astype(jnp.float32)


class RecurrentEM(nn.Module):
    """All learnable parts of the lossless-based EM. Drivers live in
    ``model.py``; every method is shape-static."""
    hidden: int                       # recurrent_part_channels
    channels: int                     # compressed_channels
    block_type: str
    block_num: int
    act: str
    coord_index_ranges: Tuple[int, ...] = (8, 8, 8, 8)
    coord_num_filters: Tuple[int, ...] = (1, 3, 3, 3, 1)
    fea_index_ranges: Tuple[int, ...] = (16, 16, 16, 16)
    fea_num_filters: Tuple[int, ...] = (1, 3, 3, 3, 3, 1)
    hybrid_hyper_decoder_fea: bool = False
    fea_tail_range: int = 32
    bottleneck_process: str = 'noise'
    mlp_num: int = 2

    def setup(self):
        c, h = self.channels, self.hidden
        self.out_first = nn.Dense(c, param_dtype=jnp.float32)
        n_slots = NON_SHARED_SCALES + 1
        self.enc_steps = [_EncStep(h, c, self.block_type, self.block_num,
                                   self.act) for _ in range(n_slots)]
        kc = len(self.coord_index_ranges)
        kf = len(self.fea_index_ranges)
        fea_out = c * (kf + 1) if self.hybrid_hyper_decoder_fea else c * kf
        self.hd_coord = [_HyperDecUp(h, kc, self.block_type, self.block_num,
                                     self.act) for _ in range(n_slots)]
        self.hd_fea = [_HyperDecUp(h, fea_out, self.block_type,
                                   self.block_num, self.act)
                       for _ in range(n_slots)]
        self.bottom_em = ContinuousBatchedEntropyModel(
            c, tail_range=self.fea_tail_range)
        self.coord_em = IndexedNoisyDeepFactorized(
            index_ranges=self.coord_index_ranges,
            num_filters=self.coord_num_filters,
            parameter_fns_type='transform', mlp_num=self.mlp_num,
            support_lower=0, support_upper=1, bottleneck_process='')
        self.fea_em = IndexedNoisyDeepFactorized(
            index_ranges=self.fea_index_ranges,
            num_filters=self.fea_num_filters,
            parameter_fns_type='transform', mlp_num=self.mlp_num,
            support_lower=-self.fea_tail_range,
            support_upper=self.fea_tail_range,
            bottleneck_process=self.bottleneck_process)

    # -------------------------------------------------------- encoder side

    def first_hx(self, cx):
        return self.out_first(cx.astype(jnp.float32))

    def enc_forget(self, i: int, cx, hx):
        return self.enc_steps[_slot(i)].forget(cx, hx)

    def enc_step_parent(self, i: int, dense_child, parent_table):
        return self.enc_steps[_slot(i)].step_parent(dense_child, parent_table)

    # ---------------------------------------------------- hyper decoders

    def hd_coord_up(self, i: int, lower_fea):
        return self.hd_coord[_slot(i)].up_dense(lower_fea)

    def hd_coord_refine(self, i: int, cand_feats, cand_table):
        return self.hd_coord[_slot(i)].refine(cand_feats, cand_table)

    def hd_fea_up(self, i: int, lower_fea):
        return self.hd_fea[_slot(i)].up_dense(lower_fea)

    def hd_fea_refine(self, i: int, child_feats, child_table):
        return self.hd_fea[_slot(i)].refine(child_feats, child_table)

    def split_fea_pred(self, fea_info):
        """Hybrid split (reference: geo_lossl_em.py:136-140)."""
        c = self.channels
        if not self.hybrid_hyper_decoder_fea:
            return None, fea_info.reshape(*fea_info.shape[:-1], c,
                                          len(self.fea_index_ranges))
        pred = fea_info[..., :c]
        idx = fea_info[..., c:].reshape(*fea_info.shape[:-1], c,
                                        len(self.fea_index_ranges))
        return pred, idx

    # ---------------------------------------------------------- EM passes

    def bottom_train(self, y, rng, mask):
        y_tilde, bits = self.bottom_em(y, rng, mask)
        return y_tilde, bits

    def coord_bits(self, mask_f, idx, valid):
        p = self.coord_em.likelihood(mask_f, idx)
        return (-jnp.log2(p) * valid).sum()

    def fea_train(self, y, idx, rng, mask):
        return self.fea_em(y, idx, rng, mask=mask)

    # ------------------------------------------------- quantized CDF tables

    def bottom_cdf_table(self):
        """[C, V] uint16 rows, offset -tail."""
        from ...entropy_models.indexed import pmf_to_quantized_cdf_rows
        pmf = self.bottom_em.pmf_table(-self.fea_tail_range,
                                       self.fea_tail_range)
        return pmf_to_quantized_cdf_rows(pmf)

    def coord_cdf_table(self):
        return self.coord_em.quantized_cdf_table()

    def fea_cdf_table(self):
        return self.fea_em.quantized_cdf_table()

    def coord_flat(self, idx):
        return self.coord_em.flatten_indexes(idx)

    def fea_flat(self, idx):
        return self.fea_em.flatten_indexes(idx)
