"""Keyframe database: BoW inverted-file retrieval for loops + reloc.

Replaces KeyFrameDatabase (reference: src/KeyFrameDatabase.cc, 311 LoC):
loop candidates (shared-word count >= 0.8*max, score >= minScore,
covisibility-group accumulation over top-10, retain > 0.75*bestAcc,
:76-197) and relocalization candidates (same without covis exclusion and
minScore, :199-311).

Representation: dense [K, n_words] float32 BoW matrix (a 512-KF map with
a 1k-word test vocabulary is 2 MB; even 10k words is 20 MB) — shared-word
counts and L1 scores against all keyframes are then single mat-vec
products instead of inverted-file walks.
"""

from __future__ import annotations

from typing import List, Optional

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
        self._bow: Optional[np.ndarray] = None       # [K, n_words]
        self._has_bow = np.zeros(map_store.K, dtype=bool)
        self._synced_version = -1

    # ------------------------------------------------------------------

    def ensure_vocabulary(self, descs: Optional[np.ndarray] = None):
        """Train a vocabulary lazily from map descriptors if none was
        supplied (the reference *requires* the prebuilt 1M-word ORBvoc
        file, src/System.cc:73-95; a self-trained tree keeps the engine
        self-contained)."""
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
        self._bow = None
        self._has_bow[:] = False

    def maybe_refresh(self):
        """Sync BoW vectors with map changes (new/culled KFs)."""
        if self.map.version == self._synced_version:
            return
        if self.vocab is None:
            if self.map.n_keyframes() >= 4:
                self.ensure_vocabulary()
            else:
                return
        if self._bow is None:
            self._bow = np.zeros((self.map.K, self.vocab.n_words),
                                 dtype=np.float32)
        live = self.map.kf_exists
        # drop culled
        gone = self._has_bow & ~live
        self._bow[gone] = 0.0
        self._has_bow[gone] = False
        # add new
        for k in np.nonzero(live & ~self._has_bow)[0]:
            self._bow[k] = self.vocab.bow_vector(
                self.map.kf_desc[k], self.map.kf_kp_valid[k])
            self._has_bow[k] = True
        self._synced_version = self.map.version

    def clear(self):
        self._bow = None
        self._has_bow[:] = False
        self._synced_version = -1

    def rebuild(self):
        self.clear()
        self.maybe_refresh()

    # ------------------------------------------------------------------

    def _frame_bow(self, f) -> np.ndarray:
        return self.vocab.bow_vector(np.asarray(f.desc), np.asarray(f.valid))

    def detect_loop_candidates(self, kid: int, min_score: float
                               ) -> np.ndarray:
        """(reference: src/KeyFrameDatabase.cc:76-197)."""
        self.maybe_refresh()
        if self.vocab is None or self._bow is None:
            return np.asarray([], dtype=np.int64)
        v = self._bow[kid]
        connected = set(self.map.covisible_keyframes(kid).tolist())
        live = self.map.kf_exists & self._has_bow
        live[kid] = False

        shared = ((self._bow > 0) & (v > 0)[None, :]).sum(axis=1)
        shared = np.where(live, shared, 0)
        # exclude the covisibility neighborhood
        for c in connected:
            shared[c] = 0
        if shared.max() == 0:
            return np.asarray([], dtype=np.int64)
        min_common = int(0.8 * shared.max())
        cands = np.nonzero(shared > max(min_common, 0))[0]
        scores = 1.0 - 0.5 * np.abs(self._bow[cands] - v[None, :]).sum(axis=1)
        keep = scores >= min_score
        cands, scores = cands[keep], scores[keep]
        if len(cands) == 0:
            return cands.astype(np.int64)

        # accumulate score over each candidate's top-10 covisibility group
        acc_scores = np.zeros(len(cands))
        best_of_group = np.zeros(len(cands), dtype=np.int64)
        for i, c in enumerate(cands):
            group = [int(c)] + self.map.covisible_keyframes(int(c),
                                                            top_n=10).tolist()
            g = [x for x in group if live[x] or x == int(c)]
            g_scores = 1.0 - 0.5 * np.abs(self._bow[g] - v[None, :]).sum(axis=1)
            acc_scores[i] = g_scores.sum()
            best_of_group[i] = g[int(np.argmax(g_scores))]
        th = 0.75 * acc_scores.max()
        out = np.unique(best_of_group[acc_scores > th])
        return out.astype(np.int64)

    def reloc_candidates(self, f) -> np.ndarray:
        """(reference: src/KeyFrameDatabase.cc:199-311). Ranked best-first."""
        self.maybe_refresh()
        if self.vocab is None or self._bow is None:
            return self.map.keyframe_ids()
        v = self._frame_bow(f)
        live = self.map.kf_exists & self._has_bow
        shared = ((self._bow > 0) & (v > 0)[None, :]).sum(axis=1)
        shared = np.where(live, shared, 0)
        if shared.max() == 0:
            return np.asarray([], dtype=np.int64)
        cands = np.nonzero(shared > 0.8 * shared.max())[0]
        scores = 1.0 - 0.5 * np.abs(self._bow[cands] - v[None, :]).sum(axis=1)
        order = np.argsort(-scores, kind="stable")
        return cands[order].astype(np.int64)

    def min_score_vs_neighbors(self, kid: int) -> float:
        """Reference DetectLoop's minScore: lowest BoW score between the
        query KF and its covisibility neighbors
        (reference: src/LoopClosing.cc:125-139)."""
        self.maybe_refresh()
        if self._bow is None:
            return 0.0
        v = self._bow[kid]
        nbs = self.map.covisible_keyframes(kid)
        nbs = [n for n in nbs if self._has_bow[n]]
        if not nbs:
            return 0.0
        scores = 1.0 - 0.5 * np.abs(self._bow[nbs] - v[None, :]).sum(axis=1)
        return float(scores.min())
