"""Vocabulary scale study: does 10^5 words saturate place recognition?

The reference ships a ~10^6-word DBoW2 tree trained on natural images
(`/root/reference/src/System.cc:118-126`). We ship a 10^5-word artifact
trained on rendered "blobs"-family scenes. VERDICT r4 missing #3 asks for
evidence, not scale-matching: either train 10^6 words or show 10^5
saturates, with precision/recall measured on data DISJOINT from training —
held-out scene seeds AND held-out texture FAMILIES ("cells", "stripes":
generators the training pipeline never saw).

Protocol (per vocabulary x family): render a full-circle revisit circuit,
register every 4th frame of the first 3/4 as pseudo-keyframes, query the
wrap-around tail, count a hit when a top-3 candidate's ground-truth camera
center lies within 1.2 m of the query's. Same operating point as
tests/test_vocab_scale.py, which lifts its thresholds from this study.

Writes docs/VOCAB_SCALING.md + docs/vocab_scaling.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def training_descriptors(n_scenes=8, frames=25, nf=1000):
    """Same generator as scripts/train_vocab_large.py: 'blobs' scenes."""
    from orbslam3_tpu.datasets.render import BoxScene
    from orbslam3_tpu.datasets.synth_euroc import excited_trajectory
    from orbslam3_tpu.vision.frame import extract_features
    W, H = 640, 480
    fx = 0.75 * W
    K = np.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1.0]])
    descs = []
    for s in range(n_scenes):
        scene = BoxScene.default(seed=100 + s)
        center = (scene.lo + scene.hi) / 2.0
        center = (float(center[0]), float(center[1]), float(center[2]) + 3.0)
        R_cw, t_cw, _, _, _, _ = excited_trajectory(
            frames, 10.0, 100.0, center, radius=2.5 + 0.3 * (s % 4),
            arc=2.0, excitation=0.1, seed=s)
        for i in range(frames):
            img = scene.render(K, R_cw[i], t_cw[i], W, H, seed=5000 + i)
            f = extract_features(jnp.asarray(img, jnp.float32),
                                 n_features=nf)
            d = np.asarray(f.desc)[np.asarray(f.valid)]
            descs.append(d)
    return np.concatenate(descs)


def eval_family(family: str, seed: int):
    """Render one held-out circuit; returns (desc_list, valid_list,
    centers, registered indices, query indices)."""
    from orbslam3_tpu.datasets.render import BoxScene
    from orbslam3_tpu.datasets.synth_euroc import excited_trajectory
    from orbslam3_tpu.vision.frame import extract_features
    W = H = 320
    fx = 240.0
    K = np.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1.0]])
    scene = BoxScene.default(seed=seed, family=family)
    center = (scene.lo + scene.hi) / 2.0
    center = (float(center[0]), float(center[1]), float(center[2]) + 3.0)
    n = 160
    R_cw, t_cw, _, _, _, _ = excited_trajectory(
        n, 20.0, 200.0, center, radius=3.0, arc=2 * np.pi,
        excitation=0.02, seed=5)
    centers = np.stack([-R_cw[i].T @ t_cw[i] for i in range(n)])
    reg = list(range(0, int(n * 0.75), 4))
    queries = list(range(152, n, 2))
    feats = {}
    for i in sorted(set(reg) | set(queries)):
        img = scene.render(K, R_cw[i], t_cw[i], W, H, seed=7000 + i)
        f = extract_features(jnp.asarray(img, jnp.float32), n_features=400)
        feats[i] = (np.asarray(f.desc), np.asarray(f.valid))
    return feats, centers, reg, queries


def pr_for(vocab, feats, centers, reg, queries):
    from orbslam3_tpu.place.database import KeyFrameDatabase
    db = KeyFrameDatabase(vocab, max_keyframes=64)
    for j, i in enumerate(reg):
        d, v = feats[i]
        _, bow = db.compute_bow(d, v)
        db.add(j, bow, map_id=0)
    covis = lambda kf: []
    tp = fp = fn = 0
    for i in queries:
        d, v = feats[i]
        _, bow = db.compute_bow(d, v)
        cands = db.detect_n_best_candidates(bow, exclude=set(),
                                            covis_fn=covis, n_best=3)
        dist = np.linalg.norm(centers[np.asarray(reg)] - centers[i], axis=1)
        gt_near = set(np.nonzero(dist < 1.2)[0])
        hit = any(int(c) in gt_near for _, c in cands)
        tp += int(hit)
        fn += int(not hit)
        fp += sum(1 for _, c in cands if int(c) not in gt_near)
    return tp / max(tp + fn, 1), tp / max(tp + fp, 1)


def main():
    from orbslam3_tpu.place.vocab import (build_vocabulary,
                                          load_default_vocabulary)
    t0 = time.time()
    print("collecting training descriptors (blobs family)...")
    pool = training_descriptors()
    print(f"  {len(pool)} descriptors, {time.time()-t0:.0f}s")

    vocabs = {}
    for name, k, depth in (("1k", 10, 3), ("10k", 10, 4)):
        t1 = time.time()
        vocabs[name] = build_vocabulary(pool, k=k, depth=depth, seed=7)
        print(f"  built {name} tree ({vocabs[name].n_words} words, "
              f"{time.time()-t1:.0f}s)")
    v100k = load_default_vocabulary()
    assert v100k is not None, "shipped artifact missing"
    vocabs["100k (shipped)"] = v100k

    families = [("blobs held-out seed", "blobs", 31),
                ("cells (unseen family)", "cells", 40),
                ("stripes (unseen family)", "stripes", 41)]
    results = {}
    for label, fam, seed in families:
        t1 = time.time()
        feats, centers, reg, queries = eval_family(fam, seed)
        print(f"rendered eval circuit '{label}' ({time.time()-t1:.0f}s)")
        for vname, v in vocabs.items():
            r, p = pr_for(v, feats, centers, reg, queries)
            results.setdefault(vname, {})[label] = {
                "recall": round(r, 3), "precision_top3": round(p, 3)}
            print(f"  {vname:>14} on {label}: R={r:.2f} P@3={p:.2f}")

    os.makedirs("docs", exist_ok=True)
    with open("docs/vocab_scaling.json", "w") as f:
        json.dump(results, f, indent=1)
    with open("docs/VOCAB_SCALING.md", "w") as f:
        f.write("# Vocabulary scale study\n\n")
        f.write(__doc__.split("Writes ")[0] + "\n")
        f.write("| vocabulary | " + " | ".join(l for l, _, _ in families)
                + " |\n")
        f.write("|---" * (1 + len(families)) + "|\n")
        for vname, row in results.items():
            cells = [f"R={row[l]['recall']:.2f} "
                     f"P@3={row[l]['precision_top3']:.2f}"
                     for l, _, _ in families]
            f.write(f"| {vname} | " + " | ".join(cells) + " |\n")
    print("wrote docs/VOCAB_SCALING.md")


if __name__ == "__main__":
    main()
