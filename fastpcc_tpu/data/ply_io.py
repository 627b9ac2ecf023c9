"""Minimal self-contained PLY reader/writer (ascii + binary_little_endian).

Replaces the reference's plyfile/open3d dependency
(reference: lib/data_utils.py:286-361). Supports xyz plus optional
rgb / reflectance / normal properties — the full set the evaluator and
pc_error tooling need.
"""
import struct
from typing import Dict, Optional, Tuple

import numpy as np

_DTYPES = {
    'char': 'i1', 'int8': 'i1', 'uchar': 'u1', 'uint8': 'u1',
    'short': 'i2', 'int16': 'i2', 'ushort': 'u2', 'uint16': 'u2',
    'int': 'i4', 'int32': 'i4', 'uint': 'u4', 'uint32': 'u4',
    'float': 'f4', 'float32': 'f4', 'double': 'f8', 'float64': 'f8',
}


def read_ply(path: str) -> Dict[str, np.ndarray]:
    """Read a PLY 'vertex' element into a dict of per-property arrays, plus
    'xyz' [N, 3] (and 'rgb' [N, 3] / 'normal' [N, 3] when present)."""
    with open(path, 'rb') as f:
        magic = f.readline().strip()
        assert magic == b'ply', f'not a ply file: {path}'
        fmt = None
        props = []          # (name, numpy dtype str) for the vertex element
        counts = {}
        cur_elem = None
        while True:
            line = f.readline()
            if not line:
                raise ValueError('unexpected EOF in ply header')
            tokens = line.decode('ascii', 'replace').strip().split()
            if not tokens:
                continue
            if tokens[0] == 'format':
                fmt = tokens[1]
            elif tokens[0] == 'element':
                cur_elem = tokens[1]
                counts[cur_elem] = int(tokens[2])
            elif tokens[0] == 'property' and cur_elem == 'vertex':
                if tokens[1] == 'list':
                    raise ValueError('list property on vertex unsupported')
                props.append((tokens[2], _DTYPES[tokens[1]]))
            elif tokens[0] == 'end_header':
                break
        n = counts.get('vertex', 0)
        if fmt == 'ascii':
            rows = []
            for _ in range(n):
                rows.append(f.readline().split())
            raw = np.array(rows, dtype=np.float64)
            data = {name: raw[:, i].astype(dt)
                    for i, (name, dt) in enumerate(props)}
        elif fmt == 'binary_little_endian':
            dtype = np.dtype([(name, '<' + dt) for name, dt in props])
            raw = np.frombuffer(f.read(dtype.itemsize * n), dtype=dtype)
            data = {name: np.ascontiguousarray(raw[name]) for name, _ in props}
        else:
            raise ValueError(f'unsupported ply format {fmt}')

    out = dict(data)
    if all(k in data for k in 'xyz'):
        out['xyz'] = np.stack([data['x'], data['y'], data['z']], axis=1)
    for group, keys in (('rgb', ('red', 'green', 'blue')),
                        ('normal', ('nx', 'ny', 'nz'))):
        if all(k in data for k in keys):
            out[group] = np.stack([data[k] for k in keys], axis=1)
    return out


def write_ply(path: str, xyz: np.ndarray, rgb: Optional[np.ndarray] = None,
              reflectance: Optional[np.ndarray] = None,
              normal: Optional[np.ndarray] = None,
              xyz_dtype: str = 'f4') -> str:
    """Write a binary_little_endian PLY (reference: lib/data_utils.py:286-351)."""
    n = len(xyz)
    fields = [('x', xyz_dtype), ('y', xyz_dtype), ('z', xyz_dtype)]
    cols = [xyz[:, 0], xyz[:, 1], xyz[:, 2]]
    if rgb is not None:
        fields += [('red', 'u1'), ('green', 'u1'), ('blue', 'u1')]
        cols += [rgb[:, 0], rgb[:, 1], rgb[:, 2]]
    if reflectance is not None:
        fields += [('reflectance', 'u2')]
        cols += [reflectance.reshape(-1)]
    if normal is not None:
        fields += [('nx', 'f4'), ('ny', 'f4'), ('nz', 'f4')]
        cols += [normal[:, 0], normal[:, 1], normal[:, 2]]

    ply_types = {'f4': 'float', 'f8': 'double', 'u1': 'uchar', 'u2': 'ushort',
                 'i4': 'int', 'u4': 'uint', 'i2': 'short'}
    header = ['ply', 'format binary_little_endian 1.0',
              f'element vertex {n}']
    header += [f'property {ply_types[dt]} {name}' for name, dt in fields]
    header.append('end_header')

    rec = np.empty((n,), dtype=np.dtype([(name, '<' + dt)
                                         for name, dt in fields]))
    for (name, dt), col in zip(fields, cols):
        rec[name] = col.astype('<' + dt)
    with open(path, 'wb') as f:
        f.write(('\n'.join(header) + '\n').encode('ascii'))
        f.write(rec.tobytes())
    return path
