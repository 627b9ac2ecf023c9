"""Bjøntegaard-delta rate/PSNR via cubic fit in log-rate space
(reference: lib/metrics/bjontegaard.py:28+, itself a port of Google
compare-codecs). Implementation here is the standard BD integral."""
from typing import Sequence

import numpy as np


def _bd(rate1, psnr1, rate2, psnr2, by_rate: bool):
    lr1, lr2 = np.log(np.asarray(rate1)), np.log(np.asarray(rate2))
    p1, p2 = np.asarray(psnr1), np.asarray(psnr2)
    if by_rate:
        x1, y1, x2, y2 = p1, lr1, p2, lr2
    else:
        x1, y1, x2, y2 = lr1, p1, lr2, p2
    f1 = np.polyfit(x1, y1, min(3, len(x1) - 1))
    f2 = np.polyfit(x2, y2, min(3, len(x2) - 1))
    lo = max(x1.min(), x2.min())
    hi = min(x1.max(), x2.max())
    if hi <= lo:
        return float('nan')
    int1 = np.polyint(f1)
    int2 = np.polyint(f2)
    avg1 = (np.polyval(int1, hi) - np.polyval(int1, lo)) / (hi - lo)
    avg2 = (np.polyval(int2, hi) - np.polyval(int2, lo)) / (hi - lo)
    diff = avg2 - avg1
    if by_rate:
        return float((np.exp(diff) - 1) * 100)   # percent rate change
    return float(diff)                            # dB


def bd_rate(rate_anchor: Sequence[float], psnr_anchor: Sequence[float],
            rate_test: Sequence[float], psnr_test: Sequence[float]) -> float:
    """BD-rate of test vs anchor in percent (negative = test is better)."""
    return _bd(rate_anchor, psnr_anchor, rate_test, psnr_test, by_rate=True)


def bd_psnr(rate_anchor, psnr_anchor, rate_test, psnr_test) -> float:
    """BD-PSNR of test vs anchor in dB (positive = test is better)."""
    return _bd(rate_anchor, psnr_anchor, rate_test, psnr_test, by_rate=False)
