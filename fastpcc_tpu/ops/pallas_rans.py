"""Pallas hardware-loop rANS coder (flag + kernels).

Motivation (PERFNOTES.md): the XLA ``while`` coder loops cost ~36 ms per
whole-frame roundtrip at the 1.08 s operating point — per-iteration prefetch
machinery, not useful work. A Pallas kernel runs the symbol loop as a
hardware grid loop with explicit VMEM residency, removing XLA's
per-iteration overhead entirely.

This module owns the module-level enable flag (mirrors
``ops.sparse.FAST_CONV``): the flag is read when the coder is TRACED, so set
it before jitting. ``set_pallas_coder(True)`` only takes effect once the
kernels exist (``available()``); until then the XLA coder in
``ops.ilv_rans`` is used regardless, and callers can report which path
actually ran via ``active()``.

Reference parity note: the reference's coder loop lives in CUDA-adjacent
C++ (lib/entropy_models/rans_coder/); this is the TPU-native equivalent of
moving that loop off the host interpreter.
"""

# Set True once the Pallas encode/decode kernels land. Kept separate from
# the user flag so ``bench.py --pallas-coder 1`` degrades honestly (reports
# the XLA path) instead of mislabeling the measurement.
_IMPLEMENTED = False

_ENABLED = False


def set_pallas_coder(enabled: bool) -> None:
    global _ENABLED
    _ENABLED = bool(enabled)


def active() -> bool:
    """True when coder tracing should take the Pallas path."""
    return _ENABLED and _IMPLEMENTED


def available() -> bool:
    return _IMPLEMENTED
