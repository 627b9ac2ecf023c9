"""Small host-side utilities (reference: lib/utils.py:10-77, lib/torch_utils.py:55-62)."""
import datetime
import os
import os.path as osp
import re
import time

import jax


def autoindex_obj(path: str) -> str:
    """Expand ``<autoindex>`` (next free integer) and ``<maxindex>`` (largest
    existing integer) templates in a path (reference: lib/utils.py:20-44)."""
    for tag, pick_next in (('<autoindex>', True), ('<maxindex>', False)):
        if tag not in path:
            continue
        prefix, _, suffix = path.partition(tag)
        parent = osp.dirname(prefix) or '.'
        base = osp.basename(prefix)
        pattern = re.compile(re.escape(base) + r'(\d+)' + re.escape(osp.basename(suffix)) + '$')
        indices = []
        if osp.isdir(parent):
            for name in os.listdir(parent):
                m = pattern.match(name)
                if m:
                    indices.append(int(m.group(1)))
        if pick_next:
            idx = max(indices) + 1 if indices else 0
        else:
            idx = max(indices) if indices else 0
        path = prefix + str(idx) + suffix
    return path


class Timer:
    """Wall-clock context manager; ``elapsed_time`` in seconds
    (reference: lib/utils.py:70-77)."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed_time = time.perf_counter() - self.start
        return False


class DeviceMemoryMonitor:
    """Peak device memory context (TPU analog of TorchCudaMaxMemoryAllocated,
    reference: lib/torch_utils.py:55-62). Reports bytes in use at exit; JAX
    exposes live stats only, so this is an upper-bound snapshot."""

    def __init__(self, device=None):
        self.device = device or jax.devices()[0]

    def _stat(self):
        try:
            stats = self.device.memory_stats()
            return stats.get('peak_bytes_in_use', stats.get('bytes_in_use', 0)) or 0
        except Exception:
            return 0

    def __enter__(self):
        self.start_bytes = self._stat()
        return self

    def __exit__(self, *exc):
        end = self._stat()
        self.max_memory_allocated_kb = max(end - 0, 0) // 1024
        return False


def eta_by_seconds(seconds: float) -> str:
    return str(datetime.timedelta(seconds=round(seconds)))


def human_bytes(n: int) -> str:
    for unit in ('B', 'KB', 'MB', 'GB'):
        if abs(n) < 1024:
            return f'{n:.1f}{unit}'
        n /= 1024
    return f'{n:.1f}TB'
