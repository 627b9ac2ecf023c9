"""PCQM / GraphSIM perceptual-metric subprocess wrappers
(reference: lib/metrics/pcqm_wrapper.py:8-16, graph_sim_wrapper.py).
External binaries; enabled via $PCQM_BIN / $GRAPHSIM_BIN."""
import os
import os.path as osp
import re
import subprocess
from typing import Dict


def pcqm(ref_ply: str, deg_ply: str, binary: str = '') -> Dict[str, float]:
    binary = binary or os.environ.get('PCQM_BIN', '')
    if not binary or not osp.isfile(binary):
        return {}
    res = subprocess.run([binary, ref_ply, deg_ply, '-fq', '-r', '0.004',
                          '-knn', '20', '-rx', '2.0'],
                         capture_output=True, text=True)
    m = re.search(r'PCQM value is\s*:\s*([0-9.e+-]+)', res.stdout)
    return {'PCQM': float(m.group(1))} if m else {}


def graph_sim(ref_ply: str, deg_ply: str, binary: str = '') -> Dict[str, float]:
    binary = binary or os.environ.get('GRAPHSIM_BIN', '')
    if not binary or not osp.isfile(binary):
        return {}
    res = subprocess.run([binary, ref_ply, deg_ply],
                         capture_output=True, text=True)
    m = re.search(r'GraphSIM\s*[:=]\s*([0-9.e+-]+)', res.stdout)
    return {'GraphSIM': float(m.group(1))} if m else {}
