"""On-demand g++ build of the native runtime (csrc/ -> libfastpcc_rans.so).

The reference builds its extensions with torch.utils.cpp_extension.load
(reference: lib/entropy_models/rans_coder/__init__.py:36-46); here we compile
a plain C-ABI shared library and bind with ctypes — no torch dependency.
"""
import hashlib
import os
import os.path as osp
import subprocess
import threading

_REPO_ROOT = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
_CSRC = osp.join(_REPO_ROOT, 'csrc')
_BUILD_DIR = osp.join(_REPO_ROOT, 'build')
_LOCK = threading.Lock()

_SOURCES = ['fastpcc_rans.cpp']
_HEADERS = ['rans_core.h']


def _source_digest() -> str:
    h = hashlib.sha256()
    for name in _SOURCES + _HEADERS:
        with open(osp.join(_CSRC, name), 'rb') as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def build_rans_lib() -> str:
    """Compile (if stale) and return the path to libfastpcc_rans.so."""
    with _LOCK:
        os.makedirs(_BUILD_DIR, exist_ok=True)
        digest = _source_digest()
        lib_path = osp.join(_BUILD_DIR, f'libfastpcc_rans_{digest}.so')
        if osp.isfile(lib_path):
            return lib_path
        cmd = [
            'g++', '-O3', '-march=native', '-std=c++17', '-shared', '-fPIC',
            '-fopenmp', '-Wall', '-Wextra',
            osp.join(_CSRC, 'fastpcc_rans.cpp'),
            '-I', _CSRC,
            '-o', lib_path + '.tmp',
        ]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(lib_path + '.tmp', lib_path)
        return lib_path
