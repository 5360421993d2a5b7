#!/usr/bin/env python
"""Convert a DBoW2 text vocabulary (ORBvoc.txt) to the compact binary
array format this framework loads at startup.

Replaces the reference's text->binary converter (reference:
tools/bin_vocabulary.cc — `voc.saveToBinaryFile` after `loadFromTextFile`;
the binary path cuts System startup from minutes to seconds,
src/System.cc:76-95). Here the binary format is an npz of dense arrays
(node centroids uint32[ N,8 ], leaf weights, k, L) that maps straight to
the device-resident batched tree-descent in place/vocabulary.py.

Usage: python tools/bin_vocabulary.py ORBvoc.txt ORBvoc.npz
"""

import sys
import time


def main(argv):
    if len(argv) != 3:
        print(__doc__)
        return 1
    src, dst = argv[1], argv[2]
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from orb_slam2_map_tpu.place.vocabulary import load_orbvoc_text

    t0 = time.time()
    voc = load_orbvoc_text(src)
    print(f"loaded text vocabulary k={voc.k} L={voc.L} "
          f"({voc.n_words} words) in {time.time() - t0:.1f}s")
    voc.save(dst)
    t0 = time.time()
    from orb_slam2_map_tpu.place.vocabulary import Vocabulary

    Vocabulary.load(dst)
    print(f"saved {dst}; reload takes {time.time() - t0:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
