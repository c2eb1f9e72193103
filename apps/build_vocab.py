"""Offline ORB vocabulary training (DBoW2 replacement pipeline).

Reference analog: the prebuilt ~1M-word `Vocabulary/ORBvoc.txt` that
`System::System` loads (`/root/reference/src/System.cc:118-126`; built with
DBoW2's k-means++ binary tree, `Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h`).
Here the tree is trained on descriptors extracted from your own dataset
frames and saved as flat device tensors.

Usage:
  python apps/build_vocab.py --seq <euroc_dir> [--out vocab.npz]
      [--k 10] [--depth 4] [--max-frames 100] [--stride 2] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seq', required=True)
    ap.add_argument('--out', default='vocab.npz')
    ap.add_argument('--k', type=int, default=10)
    ap.add_argument('--depth', type=int, default=4)
    ap.add_argument('--max-frames', type=int, default=100)
    ap.add_argument('--stride', type=int, default=2)
    ap.add_argument('--features', type=int, default=1000)
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    import numpy as np
    import jax.numpy as jnp

    from orbslam3_tpu.datasets import load_euroc
    from orbslam3_tpu.place.vocab import build_vocabulary
    from orbslam3_tpu.vision.frame import extract_features

    seq = load_euroc(args.seq)
    idxs = range(0, len(seq), args.stride)
    descs = []
    for n, i in enumerate(idxs):
        if n >= args.max_frames:
            break
        img = seq.read_image(i)
        feats = extract_features(jnp.asarray(img, jnp.float32),
                                 n_features=args.features)
        d = np.asarray(feats.desc)[np.asarray(feats.valid)]
        descs.append(d)
        if n % 10 == 0:
            print(f'frame {i}: {sum(len(x) for x in descs)} descriptors')
    packed = np.concatenate(descs)
    print(f'training k={args.k} depth={args.depth} '
          f'({args.k ** args.depth} words) on {len(packed)} descriptors...')
    vocab = build_vocabulary(packed, k=args.k, depth=args.depth, seed=0)
    vocab.save(args.out)
    print(f'saved {vocab.n_words}-word vocabulary to {args.out}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
