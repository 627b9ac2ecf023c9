"""Strip texture/material references from ShapeNetCore.v2 OBJ files so the
mesh sampler does not chase missing .mtl assets
(reference: scripts/shapenet_mtl.py). Usage:
python scripts/shapenet_mtl.py <shapenet_root>"""
import os
import sys


def main(root):
    n = 0
    for dirpath, _, files in os.walk(root):
        for name in files:
            if not name.endswith('.obj'):
                continue
            path = os.path.join(dirpath, name)
            with open(path) as f:
                lines = f.readlines()
            out = [l for l in lines
                   if not l.startswith(('mtllib', 'usemtl'))]
            if len(out) != len(lines):
                with open(path, 'w') as f:
                    f.writelines(out)
                n += 1
    print(f'stripped material refs from {n} obj files')


if __name__ == '__main__':
    main(sys.argv[1])
