"""Keyframe database: BoW inverted-file retrieval for loops + reloc.

Replaces KeyFrameDatabase (reference: src/KeyFrameDatabase.cc, 311 LoC):
loop candidates (shared-word count >= 0.8*max, score >= minScore,
covisibility-group accumulation over top-10, retain > 0.75*bestAcc,
:76-197) and relocalization candidates (same without covis exclusion and
minScore, :199-311).

Representation: SPARSE per-keyframe BoW (sorted word ids + weights,
W <= n_features entries each) plus a word -> keyframes inverted file —
memory and query cost are independent of vocabulary size, so the same
code serves the self-trained 10k-word tree and a converted 1M-word
ORBvoc (the reference's mvInvertedFile, src/KeyFrameDatabase.cc:33-46).
L1 scores use the shared-word identity sum(min(a,b)) == 1 - 0.5*|a-b|_1.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

import numpy as np

from ..config import SystemConfig
from ..slam.mapstore import MapStore
from .vocabulary import Vocabulary, train_vocabulary


class KeyFrameDatabase:
    def __init__(self, cfg: SystemConfig, map_store: MapStore,
                 vocabulary: Optional[Vocabulary] = None):
        self.cfg = cfg
        self.map = map_store
        self.vocab = vocabulary
        K = map_store.K
        self._words: List[Optional[np.ndarray]] = [None] * K
        self._vals: List[Optional[np.ndarray]] = [None] * K
        self._has_bow = np.zeros(K, dtype=bool)
        self._inv: Dict[int, Set[int]] = {}
        self._synced_version = -1

    # ------------------------------------------------------------------

    def ensure_vocabulary(self, descs: Optional[np.ndarray] = None):
        """Load the shipped 10k-word vocabulary, or train one lazily from
        map descriptors (the reference *requires* the prebuilt 1M-word
        ORBvoc file, src/System.cc:73-95; a self-contained default keeps
        the engine runnable anywhere)."""
        if self.vocab is not None:
            return
        self.vocab = load_default_vocabulary()
        if self.vocab is not None:
            return
        if descs is None:
            kfs = self.map.keyframe_ids()
            pool = [self.map.kf_desc[k][self.map.kf_kp_valid[k]] for k in kfs]
            descs = (np.concatenate(pool, axis=0) if pool
                     else np.random.default_rng(0).integers(
                         0, 2 ** 32, (4000, 8), dtype=np.uint32))
        if len(descs) > 30000:
            sel = np.random.default_rng(0).choice(len(descs), 30000,
                                                  replace=False)
            descs = descs[sel]
        self.vocab = train_vocabulary(descs, k=10, L=3)

    def maybe_refresh(self):
        """Sync BoW entries with map changes (new/culled KFs)."""
        if self.map.version == self._synced_version:
            return
        if self.vocab is None:
            if self.map.n_keyframes() >= 4:
                self.ensure_vocabulary()
            else:
                return
        live = self.map.kf_exists
        for k in np.nonzero(self._has_bow & ~live)[0]:
            for w in self._words[k]:
                self._inv.get(int(w), set()).discard(int(k))
            self._words[k] = self._vals[k] = None
            self._has_bow[k] = False
        for k in np.nonzero(live & ~self._has_bow)[0]:
            words, vals = self.vocab.bow_sparse(
                self.map.kf_desc[k], self.map.kf_kp_valid[k])
            self._words[k] = words
            self._vals[k] = vals
            for w in words:
                self._inv.setdefault(int(w), set()).add(int(k))
            self._has_bow[k] = True
        self._synced_version = self.map.version

    def clear(self):
        K = self.map.K
        self._words = [None] * K
        self._vals = [None] * K
        self._has_bow[:] = False
        self._inv.clear()
        self._synced_version = -1

    def rebuild(self):
        self.clear()
        self.maybe_refresh()

    # ------------------------------------------------------------------

    def _shared_counts(self, words: np.ndarray) -> np.ndarray:
        """[K] number of query words shared with each keyframe (the
        inverted-file walk, reference src/KeyFrameDatabase.cc:83-104)."""
        counts = np.zeros(self.map.K, dtype=np.int32)
        for w in words:
            for kid in self._inv.get(int(w), ()):
                counts[kid] += 1
        return counts

    def _score(self, words, vals, kid: int) -> float:
        return Vocabulary.score_sparse(words, vals,
                                       self._words[kid], self._vals[kid])

    def detect_loop_candidates(self, kid: int, min_score: float
                               ) -> np.ndarray:
        """(reference: src/KeyFrameDatabase.cc:76-197)."""
        self.maybe_refresh()
        if self.vocab is None or not self._has_bow[kid]:
            return np.asarray([], dtype=np.int64)
        words, vals = self._words[kid], self._vals[kid]
        connected = set(self.map.covisible_keyframes(kid).tolist())

        shared = self._shared_counts(words)
        shared[kid] = 0
        shared[~(self.map.kf_exists & self._has_bow)] = 0
        for c in connected:
            shared[c] = 0
        if shared.max() == 0:
            return np.asarray([], dtype=np.int64)
        min_common = int(0.8 * shared.max())
        cands = np.nonzero(shared > max(min_common, 0))[0]
        scores = np.asarray([self._score(words, vals, int(c))
                             for c in cands])
        keep = scores >= min_score
        cands = cands[keep]
        if len(cands) == 0:
            return cands.astype(np.int64)

        # accumulate score over each candidate's top-10 covisibility group
        acc_scores = np.zeros(len(cands))
        best_of_group = np.zeros(len(cands), dtype=np.int64)
        for i, c in enumerate(cands):
            group = [int(c)] + self.map.covisible_keyframes(
                int(c), top_n=10).tolist()
            g = [x for x in group if self._has_bow[x]]
            g_scores = np.asarray([self._score(words, vals, int(x))
                                   for x in g])
            acc_scores[i] = g_scores.sum()
            best_of_group[i] = g[int(np.argmax(g_scores))]
        th = 0.75 * acc_scores.max()
        out = np.unique(best_of_group[acc_scores >= th])
        return out.astype(np.int64)

    def reloc_candidates(self, f) -> np.ndarray:
        """(reference: src/KeyFrameDatabase.cc:199-311). Ranked
        best-first."""
        self.maybe_refresh()
        if self.vocab is None:
            return self.map.keyframe_ids()
        words, vals = self.vocab.bow_sparse(np.asarray(f.desc),
                                            np.asarray(f.valid))
        shared = self._shared_counts(words)
        shared[~(self.map.kf_exists & self._has_bow)] = 0
        if shared.max() == 0:
            return np.asarray([], dtype=np.int64)
        cands = np.nonzero(shared > 0.8 * shared.max())[0]
        scores = np.asarray([self._score(words, vals, int(c))
                             for c in cands])
        order = np.argsort(-scores, kind="stable")
        return cands[order].astype(np.int64)

    def min_score_vs_neighbors(self, kid: int) -> float:
        """Reference DetectLoop's minScore: lowest BoW score between the
        query KF and its covisibility neighbors
        (reference: src/LoopClosing.cc:125-139)."""
        self.maybe_refresh()
        if not self._has_bow[kid]:
            return 0.0
        words, vals = self._words[kid], self._vals[kid]
        nbs = [int(n) for n in self.map.covisible_keyframes(kid)
               if self._has_bow[n]]
        if not nbs:
            return 0.0
        return min(self._score(words, vals, n) for n in nbs)


_DEFAULT_VOCAB = None
_DEFAULT_VOCAB_TRIED = False


def load_default_vocabulary() -> Optional[Vocabulary]:
    """The 10k-word vocabulary shipped with the package (trained on
    synthetic-world ORB descriptors by tools/train_vocab.py)."""
    global _DEFAULT_VOCAB, _DEFAULT_VOCAB_TRIED
    if _DEFAULT_VOCAB_TRIED:
        return _DEFAULT_VOCAB
    _DEFAULT_VOCAB_TRIED = True
    import os

    path = os.path.join(os.path.dirname(__file__), "data", "vocab10k.npz")
    if os.path.exists(path):
        _DEFAULT_VOCAB = Vocabulary.load(path)
    return _DEFAULT_VOCAB
