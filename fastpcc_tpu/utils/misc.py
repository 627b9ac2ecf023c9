"""Small host-side utilities (reference: lib/utils.py:10-77, lib/torch_utils.py:55-62)."""
import datetime
import os
import os.path as osp
import re
import time

import jax


def autoindex_obj(path: str) -> str:
    """Expand ``<autoindex>`` (next free integer), ``<maxindex>`` /
    ``<minindex>`` (largest / smallest existing integer) templates in a path
    (reference: lib/utils.py:20-44)."""
    picks = {'<autoindex>': lambda xs: max(xs) + 1 if xs else 0,
             '<maxindex>': lambda xs: max(xs) if xs else 0,
             '<minindex>': lambda xs: min(xs) if xs else 0}
    for tag, pick in picks.items():
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
        path = prefix + str(pick(indices)) + suffix
    return path


def make_new_dirs(dir_path: str, logger=None) -> None:
    """Create ``dir_path``; when it already exists, rotate the old directory
    to ``<dir_path>_bak<N>`` first (reference: lib/utils.py:10-17), so a rerun
    with the same rundir_name never mixes artifacts with a previous run."""
    if osp.exists(dir_path):
        target = autoindex_obj(str(dir_path) + '_bak<autoindex>')
        os.rename(dir_path, target)
        if logger is not None:
            logger.warning(f'folder "{dir_path}" already exists; '
                           f'renamed to {target}')
    os.makedirs(dir_path)


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
    exposes live stats only, so this is an upper-bound snapshot. Backends
    without memory_stats (the CPU backend) fall back to process peak RSS
    (ru_maxrss) so the evaluator's memory columns are nonzero everywhere the
    reference's would be."""

    def __init__(self, device=None):
        self.device = device or jax.devices()[0]
        self._via_rss = False

    def _stat(self):
        try:
            stats = self.device.memory_stats()
            v = stats.get('peak_bytes_in_use', stats.get('bytes_in_use', 0))
            if v:
                return int(v)
        except Exception:
            pass
        self._via_rss = True
        import resource
        # ru_maxrss is KB on Linux
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024

    def __enter__(self):
        self.start_bytes = self._stat()
        return self

    def __exit__(self, *exc):
        end = self._stat()
        self.max_memory_allocated_kb = max(end, 0) // 1024
        return False


def eta_by_seconds(seconds: float) -> str:
    return str(datetime.timedelta(seconds=round(seconds)))


def human_bytes(n: int) -> str:
    for unit in ('B', 'KB', 'MB', 'GB'):
        if abs(n) < 1024:
            return f'{n:.1f}{unit}'
        n /= 1024
    return f'{n:.1f}TB'
