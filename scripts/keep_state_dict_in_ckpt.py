"""Slim a training checkpoint down to weights only
(reference: scripts/keep_state_dict_in_ckpt.py): drops optimizer/scheduler
state, keeping state_dict (+ ema_state_dict unless --drop-ema)."""
import argparse
import pickle


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('ckpt')
    ap.add_argument('out')
    ap.add_argument('--drop-ema', action='store_true')
    ap.add_argument('--f16', action='store_true',
                    help='store float params as float16 (halves the file; '
                         'load_loose_params casts back to the target dtype '
                         '— used for the committed bench checkpoint)')
    args = ap.parse_args()

    with open(args.ckpt, 'rb') as f:
        ckpt = pickle.load(f)

    def shrink(tree):
        if not args.f16:
            return tree
        import numpy as np
        import jax
        return jax.tree_util.tree_map(
            lambda v: v.astype(np.float16)
            if getattr(v, 'dtype', None) in (np.dtype(np.float32),
                                             np.dtype(np.float64)) else v,
            tree)

    slim = {'state_dict': shrink(ckpt['state_dict']),
            'last_epoch': ckpt.get('last_epoch', -1)}
    if not args.drop_ema and 'ema_state_dict' in ckpt:
        slim['ema_state_dict'] = shrink(ckpt['ema_state_dict'])
    with open(args.out, 'wb') as f:
        pickle.dump(slim, f, protocol=4)
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
