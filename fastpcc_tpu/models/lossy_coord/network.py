"""Encoder/decoder blocks for the lossy-coordinate model (PCGCv2 reimpl).

Mirrors the reference topology (reference: models/convolutional/lossy_coord/
layers.py:66-147 make_downsample_blocks / make_upsample_block and
lib/minkowski_sparse_conv_layers.py:162-226 ResBlock / InceptionResBlock),
executed on the Morton-code sparse grid: stride-2 convs are octant-dense
GEMMs, 3^3 convs ride per-scale neighbor tables, and the generative
transpose emits all 8 children per parent in one GEMM.
"""
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn.blocks import SparseConv3x3, StridedOctantConv, OctantTransposeConv


def _act(x, name: Optional[str]):
    if name is None or name == '':
        return x
    if name == 'relu':
        return jax.nn.relu(x)
    if name.startswith('leaky_relu'):
        slope = float(name.split('(', 1)[1].rstrip(')')) if '(' in name else 0.01
        return jax.nn.leaky_relu(x, slope)
    raise NotImplementedError(name)


class ConvBlock3(nn.Module):
    """3^3 conv + activation."""
    features: int
    act: Optional[str] = 'relu'

    @nn.compact
    def __call__(self, feats, table):
        return _act(SparseConv3x3(self.features)(feats, table), self.act)


class ResBlockS(nn.Module):
    """conv3 -> act -> conv3 -> +x (reference: ResBlock,
    lib/minkowski_sparse_conv_layers.py:162-183)."""
    features: int
    act: Optional[str] = 'relu'

    @nn.compact
    def __call__(self, feats, table):
        x = ConvBlock3(self.features, self.act)(feats, table)
        x = SparseConv3x3(self.features)(x, table)
        return x + feats


class InceptionResBlockS(nn.Module):
    """Two-path (1/4, 1/2 channel) inception residual (reference:
    lib/minkowski_sparse_conv_layers.py:195-226)."""
    features: int
    act: Optional[str] = 'relu'

    @nn.compact
    def __call__(self, feats, table):
        ch = self.features
        p0 = ConvBlock3(ch // 4, self.act)(feats, table)
        p0 = SparseConv3x3(ch // 2)(p0, table)
        p1 = _act(nn.Dense(ch // 4, dtype=feats.dtype,
                           param_dtype=jnp.float32)(feats), self.act)
        p1 = ConvBlock3(ch // 4, self.act)(p1, table)
        p1 = nn.Dense(ch // 2, dtype=feats.dtype,
                      param_dtype=jnp.float32)(p1)
        return jnp.concatenate([p0, p1], axis=-1) + feats


def basic_blocks(block_type: str, features: int, num: int, act):
    cls = InceptionResBlockS if block_type == 'InceptionResBlock' else ResBlockS
    return [cls(features, act) for _ in range(num)]


class EncoderStage(nn.Module):
    """One downsample stage: stride-2 conv -> N basic blocks -> conv3
    (reference: make_downsample_blocks, lossy_coord/layers.py:66-101)."""
    features: int
    out_features: int
    block_type: str
    block_num: int
    act: Optional[str] = 'relu'
    last_act: Optional[str] = 'relu'

    def setup(self):
        self.down = StridedOctantConv(self.features, levels=1)
        self.blocks = basic_blocks(self.block_type, self.features,
                                   self.block_num, self.act)
        self.out = SparseConv3x3(self.out_features)

    def __call__(self, dense_child_feats, parent_table):
        x = _act(self.down(dense_child_feats), self.act)
        for b in self.blocks:
            x = b(x, parent_table)
        x = self.out(x, parent_table)
        return _act(x, self.last_act)


class DecoderStage(nn.Module):
    """Generative upsample + conv blocks + classifier
    (reference: make_upsample_block lossy_coord/layers.py:104-147 and
    DecoderBlock :190-218)."""
    features: int
    block_type: str
    block_num: int
    act: Optional[str] = 'relu'

    def setup(self):
        self.up = OctantTransposeConv(self.features)
        self.conv_in = ConvBlock3(self.features, self.act)
        self.blocks = basic_blocks(self.block_type, self.features,
                                   self.block_num, self.act)
        self.classify = SparseConv3x3(1)

    def child_feats(self, parent_feats):
        """[M, Cin] -> [M, 8, C] candidate-child features."""
        return _act(self.up(parent_feats), self.act)

    def refine_and_classify(self, cand_feats, cand_table):
        """candidate features [Nc, C] -> (refined feats, logits [Nc])."""
        x = self.conv_in(cand_feats, cand_table)
        for b in self.blocks:
            x = b(x, cand_table)
        logits = self.classify(x, cand_table)[:, 0]
        return x, logits
