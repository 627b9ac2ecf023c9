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
    args = ap.parse_args()

    with open(args.ckpt, 'rb') as f:
        ckpt = pickle.load(f)
    slim = {'state_dict': ckpt['state_dict'],
            'last_epoch': ckpt.get('last_epoch', -1)}
    if not args.drop_ema and 'ema_state_dict' in ckpt:
        slim['ema_state_dict'] = ckpt['ema_state_dict']
    with open(args.out, 'wb') as f:
        pickle.dump(slim, f, protocol=4)
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
