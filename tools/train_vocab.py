#!/usr/bin/env python
"""Train and ship the default 10k-word ORB vocabulary.

The reference depends on a 1M-word ORBvoc trained offline on large image
corpora (reference: README.md:24, Vocabulary/ORBvoc.bin); this trains a
k=10, L=4 tree on ORB descriptors extracted from many synthetic-world
viewpoints and writes orb_slam2_map_tpu/place/data/vocab10k.npz, which
KeyFrameDatabase loads by default (place/database.py
load_default_vocabulary). Convert a real ORBvoc.txt instead with
tools/bin_vocabulary.py.

Usage: python tools/train_vocab.py [--out PATH] [--frames N] [--L 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "orb_slam2_map_tpu", "place",
        "data", "vocab10k.npz"))
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--L", type=int, default=4)
    ap.add_argument("--max-descs", type=int, default=120000)
    args = ap.parse_args()

    import jax

    from orb_slam2_map_tpu.config import SystemConfig
    from orb_slam2_map_tpu.io.synthetic import (SyntheticWorld,
                                                orbit_trajectory,
                                                sweep_trajectory)
    from orb_slam2_map_tpu.place.vocabulary import train_vocabulary
    from orb_slam2_map_tpu.slam import frame as frame_mod

    pool = []
    # several worlds (texture seeds) x several trajectories: corpus
    # diversity stands in for the reference's multi-scene training set
    for seed in (0, 1, 2):
        world = SyntheticWorld(seed=seed) if _has_seed() else SyntheticWorld()
        cfg = SystemConfig(camera=world.cam)
        n = args.frames // 2
        trajs = [orbit_trajectory(n)[0], sweep_trajectory(n)[0]]
        for Twc in trajs:
            for i in range(len(Twc)):
                gray, depth, rgb = world.render(Twc[i])
                f = frame_mod.build_rgbd_frame(cfg, gray, depth)
                valid = np.asarray(f.valid)
                pool.append(np.asarray(f.desc)[valid])
        if not _has_seed():
            break
    descs = np.concatenate(pool, axis=0)
    print(f"extracted {len(descs)} descriptors")
    if len(descs) > args.max_descs:
        sel = np.random.default_rng(0).choice(len(descs), args.max_descs,
                                              replace=False)
        descs = descs[sel]
    t0 = time.time()
    vocab = train_vocabulary(descs, k=args.k, L=args.L)
    print(f"trained k={args.k} L={args.L} ({args.k**args.L} words) "
          f"in {time.time()-t0:.1f}s")
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    vocab.save(args.out)
    print(f"saved {args.out}")


def _has_seed():
    import inspect

    from orb_slam2_map_tpu.io.synthetic import SyntheticWorld

    return "seed" in inspect.signature(SyntheticWorld.__init__).parameters


if __name__ == "__main__":
    main()
