"""Misc metrics: precision/recall of occupancy prediction and BT.709 YUV
conversion (reference: lib/metrics/misc.py:5-34)."""
from typing import Dict

import numpy as np


def precision_recall(pred: np.ndarray, tgt: np.ndarray) -> Dict[str, float]:
    pred = np.asarray(pred, bool)
    tgt = np.asarray(tgt, bool)
    tp = float((pred & tgt).sum())
    p = tp / max(float(pred.sum()), 1.0)
    r = tp / max(float(tgt.sum()), 1.0)
    f1 = 2 * p * r / max(p + r, 1e-12)
    return {'precision': p, 'recall': r, 'f1': f1}


_BT709 = np.array([[0.2126, 0.7152, 0.0722],
                   [-0.1146, -0.3854, 0.5],
                   [0.5, -0.4542, -0.0458]])


def rgb_to_yuv_bt709(rgb: np.ndarray) -> np.ndarray:
    """RGB [0,1] or [0,255] -> YUV (Y in same range, UV centered at mid)."""
    rgb = np.asarray(rgb, np.float64)
    scale = 255.0 if rgb.max() > 1.5 else 1.0
    yuv = (rgb / scale) @ _BT709.T
    yuv[..., 1:] += 0.5
    return yuv * scale


def yuv_to_rgb_bt709(yuv: np.ndarray) -> np.ndarray:
    yuv = np.asarray(yuv, np.float64)
    scale = 255.0 if yuv.max() > 1.5 else 1.0
    x = yuv / scale
    x = x.copy()
    x[..., 1:] -= 0.5
    rgb = x @ np.linalg.inv(_BT709).T
    return np.clip(rgb, 0, 1) * scale
