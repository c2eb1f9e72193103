"""Train and ship the reference-scale vocabulary artifact.

The reference loads a prebuilt ~1M-word DBoW2 tree
(`/root/reference/src/System.cc:118-126`, `Vocabulary/ORBvoc.txt`). This
script builds the framework's equivalent artifact from RENDERED frames (the
environment has no dataset egress): many box-scene sequences with distinct
textures/viewpoints -> ORB descriptors -> k=10 depth=5 k-means tree
(10^5 words) -> `orbslam3_tpu/assets/vocab_100k.npz`.

Usage: python scripts/train_vocab_large.py [--frames-per-scene 40]
       [--scenes 16] [--k 10] [--depth 5] [--out <path>]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--frames-per-scene', type=int, default=40)
    ap.add_argument('--scenes', type=int, default=16)
    ap.add_argument('--k', type=int, default=10)
    ap.add_argument('--depth', type=int, default=5)
    ap.add_argument('--features', type=int, default=1000)
    ap.add_argument('--width', type=int, default=640)
    ap.add_argument('--height', type=int, default=480)
    ap.add_argument('--out', default=os.path.join(
        os.path.dirname(__file__), '..', 'orbslam3_tpu', 'assets',
        'vocab_100k.npz'))
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    import numpy as np
    import jax.numpy as jnp

    from orbslam3_tpu.datasets.render import BoxScene
    from orbslam3_tpu.datasets.synth_euroc import excited_trajectory
    from orbslam3_tpu.place.vocab import build_vocabulary
    from orbslam3_tpu.vision.frame import extract_features

    W, H = args.width, args.height
    fx = 0.75 * W
    K = np.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1.0]])
    descs = []
    t0 = time.time()
    for s in range(args.scenes):
        scene = BoxScene.default(seed=100 + s)
        center = (scene.lo + scene.hi) / 2.0
        center = (float(center[0]), float(center[1]), float(center[2]) + 3.0)
        R_cw, t_cw, _, _, _, _ = excited_trajectory(
            args.frames_per_scene, 10.0, 100.0, center,
            radius=2.5 + 0.3 * (s % 4), arc=2.0, excitation=0.1, seed=s)
        for i in range(args.frames_per_scene):
            img = scene.render(K, R_cw[i], t_cw[i], W, H,
                               seed=s * 10000 + i)
            feats = extract_features(jnp.asarray(img, jnp.float32),
                                     n_features=args.features)
            d = np.asarray(feats.desc)[np.asarray(feats.valid)]
            descs.append(d)
        n = sum(len(x) for x in descs)
        print(f'scene {s}: {n} descriptors ({time.time() - t0:.0f}s)',
              flush=True)
    packed = np.concatenate(descs)
    n_words = args.k ** args.depth
    print(f'training k={args.k} depth={args.depth} ({n_words} words) on '
          f'{len(packed)} descriptors...', flush=True)
    t1 = time.time()
    vocab = build_vocabulary(packed, k=args.k, depth=args.depth, seed=0)
    print(f'trained in {time.time() - t1:.0f}s; populated words: '
          f'{int((vocab.idf > 0).sum())}/{n_words}', flush=True)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    vocab.save(args.out)
    sz = os.path.getsize(args.out) / 1e6
    print(f'saved {args.out} ({sz:.1f} MB)')


if __name__ == '__main__':
    main()
