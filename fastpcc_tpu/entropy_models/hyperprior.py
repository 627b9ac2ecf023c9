"""Hyperprior entropy model: a factorized-prior EM on hyper-latents z whose
decoded value conditions an indexed EM on the main latents y.

JAX rebuild of the reference's hyperprior EntropyModel
(reference: lib/entropy_models/hyperprior/noisy_deep_factorized/basic.py:18-202):
hyper_encoder(y) -> z, z coded by ContinuousBatchedEntropyModel,
hyper_decoder(z_hat) -> scale indexes for a scale-indexed noisy-Normal EM on
y; the two byte streams are concatenated with length prefixes.
"""
from typing import Callable, Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .batched import (ContinuousBatchedEntropyModel, build_coder,
                      compress_with_coder, decompress_with_coder)
from .indexed import ScaleIndexedNormalEntropyModel, build_scale_indexed_coder
from .utils import concat_byte_streams, split_byte_streams


class ScaleHyperprior(nn.Module):
    """y --he--> z (factorized EM) --hd--> per-element scale index (indexed
    noisy-Normal EM on y). hyper_encoder / hyper_decoder are caller-supplied
    module factories (reference passes hyper nets the same way,
    basic.py:77-90)."""
    hyper_encoder: nn.Module
    hyper_decoder: nn.Module
    hyper_channels: int
    num_scales: int = 64
    z_tail_range: int = 32
    y_tail_range: int = 64

    def setup(self):
        self.em_z = ContinuousBatchedEntropyModel(
            self.hyper_channels, tail_range=self.z_tail_range)
        self.em_y = ScaleIndexedNormalEntropyModel(
            num_scales=self.num_scales, tail_range=self.y_tail_range)

    def _he(self, y, table):
        return self.hyper_encoder(y) if table is None \
            else self.hyper_encoder(y, table)

    def _hd(self, z, table):
        return self.hyper_decoder(z) if table is None \
            else self.hyper_decoder(z, table)

    def __call__(self, y: jax.Array, rng: jax.Array, mask=None, table=None):
        """Training pass -> (y_tilde, total_bits). ``table`` threads a
        neighbor table into sparse-conv hyper nets (the reference's hyper
        nets are sparse convs, lossy_coord/model.py:126-192)."""
        rz, ry = jax.random.split(rng)
        z = self._he(y, table)
        z_tilde, z_bits = self.em_z(z, rz, mask)
        indexes = self._hd(z_tilde, table)
        y_tilde, y_bitmap = self.em_y(y, indexes, ry)
        if mask is not None:
            y_bitmap = y_bitmap * mask[..., None]
        return y_tilde, z_bits + y_bitmap.sum()

    # --- eval-path pieces (driven by HyperpriorCoder below) ---

    def encode_path(self, y: jax.Array, table=None):
        """-> (z_int, indexes_int, y_int): everything the coders need."""
        z = self._he(y, table)
        z_int = jnp.round(z)
        indexes = self._hd(z_int, table)
        idx_int = jnp.clip(jnp.round(indexes), 0, self.num_scales - 1) \
            .astype(jnp.int32)
        return z_int.astype(jnp.int32), idx_int, jnp.round(y).astype(jnp.int32)

    def decode_path(self, z_int: jax.Array, table=None):
        indexes = self._hd(z_int.astype(jnp.float32), table)
        return jnp.clip(jnp.round(indexes), 0, self.num_scales - 1) \
            .astype(jnp.int32)

    def z_pmf(self, lower, upper):
        return self.em_z.pmf_table(lower, upper)

    def y_pmf(self):
        return self.em_y.pmf_table()


class HyperpriorCoder:
    """Host-side driver pairing a trained ScaleHyperprior with the native
    rANS coders (byte layout: length-prefixed [z bytes, y bytes], the
    reference's BytesListUtils composition, basic.py:145-155)."""

    def __init__(self, module: ScaleHyperprior, variables: Dict):
        self.module = module
        self.variables = variables
        self.coder_z = build_coder(
            lambda lo, hi: module.apply(variables, lo, hi,
                                        method=ScaleHyperprior.z_pmf),
            module.hyper_channels, module.z_tail_range)
        pmf = np.asarray(module.apply(variables,
                                      method=ScaleHyperprior.y_pmf),
                         dtype=np.float64)
        from ..runtime import IndexedRansCoder
        offsets = np.full((pmf.shape[0],), -module.y_tail_range, np.int32)
        self.coder_y = IndexedRansCoder(True, 1)
        self.coder_y.init_with_pmfs(pmf, offsets)

    def compress(self, y: jax.Array, table=None,
                 n: int = 0) -> Tuple[bytes, Tuple[int, ...]]:
        """n > 0: y/table row capacity exceeds the valid count n (sparse-conv
        hyper nets run at padded capacity); only the first n rows are coded."""
        z_int, idx_int, y_int = self.module.apply(
            self.variables, y, table, method=ScaleHyperprior.encode_path)
        z_np = np.asarray(z_int)
        y_np = np.asarray(y_int)
        idx_np = np.asarray(idx_int)
        if n:
            z_np, y_np, idx_np = z_np[:n], y_np[:n], idx_np[:n]
        z_bytes = compress_with_coder(self.coder_z, z_np[None])[0]
        y_bytes = self.coder_y.encode_with_indexes(
            y_np.reshape(1, -1).astype(np.int32),
            idx_np.reshape(1, -1).astype(np.int32))[0]
        return concat_byte_streams([z_bytes, y_bytes]), z_np.shape

    def decompress(self, data: bytes, z_shape, y_shape,
                   table=None, cap: int = 0) -> np.ndarray:
        z_bytes, y_bytes = split_byte_streams(data, 2)
        z_int = decompress_with_coder(self.coder_z, [z_bytes], z_shape)[0]
        if cap:
            z_int = np.pad(z_int, ((0, cap - z_int.shape[0]), (0, 0)))
        idx_int = self.module.apply(
            self.variables, jnp.asarray(z_int), table,
            method=ScaleHyperprior.decode_path)
        if cap:
            idx_int = idx_int[:y_shape[0]]
        idx_np = np.asarray(idx_int).reshape(1, -1).astype(np.int32)
        y_out = np.empty_like(idx_np)
        self.coder_y.decode_with_indexes([y_bytes], idx_np, y_out)
        return y_out.reshape(y_shape)
