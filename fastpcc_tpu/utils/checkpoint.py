"""Checkpoint save/load with loose (shape-sliced) loading.

Mirrors the reference's resume semantics (reference: train.py:452-469,
lib/torch_utils.py:69-102): a checkpoint holds state_dict /
optimizer_state_dict / scheduler state / last_epoch / ema_state_dict, and
loose loading copies the overlapping slice of mismatched arrays.
"""
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params, opt_state=None, last_epoch: int = -1,
                    ema_params=None, extra: Optional[Dict] = None):
    ckpt = {'state_dict': _to_host(params), 'last_epoch': last_epoch}
    if opt_state is not None:
        ckpt['optimizer_state_dict'] = _to_host(opt_state)
    if ema_params is not None:
        ckpt['ema_state_dict'] = _to_host(ema_params)
    if extra:
        ckpt.update(extra)
    with open(path, 'wb') as f:
        pickle.dump(ckpt, f, protocol=4)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, 'rb') as f:
        return pickle.load(f)


def load_loose_params(target, loaded, logger=None) -> Tuple[Any, list]:
    """Merge ``loaded`` into the structure of ``target``: matching leaves are
    taken whole; shape-mismatched leaves are copied over the overlapping
    slice (the reference's 'experimental' loose loading,
    lib/torch_utils.py:69-102). Returns (params, list of warnings)."""
    warnings = []
    t_flat = _flatten('', target)
    l_flat = _flatten('', loaded)
    out = dict(t_flat)
    for key, tv in t_flat.items():
        if key not in l_flat:
            warnings.append(f'missing in checkpoint: {key}')
            continue
        lv = np.asarray(l_flat[key])
        tv_np = np.asarray(tv)
        if lv.shape == tv_np.shape:
            out[key] = lv.astype(tv_np.dtype)
        else:
            sl = tuple(slice(0, min(a, b)) for a, b in zip(lv.shape, tv_np.shape))
            merged = np.array(tv_np)
            if len(lv.shape) == len(tv_np.shape):
                merged[sl] = lv[sl].astype(tv_np.dtype)
                warnings.append(f'shape-sliced load: {key} '
                                f'{lv.shape} -> {tv_np.shape}')
            else:
                warnings.append(f'rank mismatch, kept init: {key}')
            out[key] = merged
    for key in l_flat:
        if key not in t_flat:
            warnings.append(f'unexpected in checkpoint: {key}')
    if logger is not None:
        for w in warnings:
            logger.warning(w)
    return _unflatten(out), warnings


def _flatten(prefix, tree):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(f'{prefix}/{k}' if prefix else str(k), v))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: Dict[str, Any]):
    root: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split('/')
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return root
