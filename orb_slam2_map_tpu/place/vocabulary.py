"""BoW vocabulary: hierarchical binary-descriptor tree as dense arrays.

Replaces DBoW2's TemplatedVocabulary (reference:
Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h, 1746 LoC): a k^L tree of
ORB descriptor centroids with TF-IDF weighting and L1 scoring, binary
save/load, and the levels-up direct index used for node-constrained
matching.

TPU-first redesign: the tree is a complete k-ary array — level l holds
k^(l+1) centroids, children of node j are the contiguous block j*k ..
j*k+k-1 — so `transform` (descriptor -> word) is L rounds of a gated
Hamming argmin, entirely batched over descriptors on device: gather the
k candidate centroids, one [N, k] distance tile per level, argmin. The
reference walks pointer nodes per descriptor on the CPU.

Training is hierarchical k-medians with bitwise-majority centroids (the
FORB::meanValue recipe, reference: Thirdparty/DBoW2/DBoW2/FORB.cpp:28-120)
on host numpy; vocabularies are persisted as .npz. A text-format
converter covers the reference's ORBvoc.txt ecosystem
(tools/bin_vocabulary.cc equivalent).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _popcount_np(x: np.ndarray) -> np.ndarray:
    x = (x - ((x >> 1) & 0x55555555)).astype(np.uint32)
    x = ((x & 0x33333333) + ((x >> 2) & 0x33333333)).astype(np.uint32)
    x = ((x + (x >> 4)) & 0x0F0F0F0F).astype(np.uint32)
    return (((x * 0x01010101) & 0xFFFFFFFF) >> 24).astype(np.int32)


def hamming_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[N, 8] x [M, 8] -> [N, M] int32 Hamming distances (host)."""
    x = a[:, None, :] ^ b[None, :, :]
    return _popcount_np(x).sum(axis=-1)


def majority_centroid(descs: np.ndarray) -> np.ndarray:
    """Bitwise majority vote over packed descriptors [N, 8] -> [8]
    (FORB::meanValue semantics)."""
    bits = np.unpackbits(descs.view(np.uint8), axis=1)     # [N, 256]
    maj = (bits.sum(axis=0) * 2 >= len(descs)).astype(np.uint8)
    return np.packbits(maj).view(np.uint32)


@dataclass
class Vocabulary:
    k: int                      # branching factor
    L: int                      # depth (levels below root)
    centroids: np.ndarray       # [n_internal + n_words, 8] uint32, level-major
    weights: np.ndarray         # [n_words] float32 idf weights
    levelsup: int = 2           # direct-index level distance from leaves

    @property
    def n_words(self) -> int:
        return self.k ** self.L

    def level_offset(self, level: int) -> int:
        """Start index of level `level` (1-based below root) in centroids."""
        return sum(self.k ** l for l in range(1, level))

    # ------------------------------------------------------------------

    def save(self, path: str):
        np.savez_compressed(path, k=self.k, L=self.L,
                            centroids=self.centroids, weights=self.weights,
                            levelsup=self.levelsup)

    @staticmethod
    def load(path: str) -> "Vocabulary":
        z = np.load(path)
        return Vocabulary(k=int(z["k"]), L=int(z["L"]),
                          centroids=z["centroids"], weights=z["weights"],
                          levelsup=int(z["levelsup"]))

    # ------------------------------------------------------------------

    def transform(self, desc: np.ndarray, valid: Optional[np.ndarray] = None
                  ) -> Tuple[np.ndarray, np.ndarray]:
        """Descriptors [N, 8] -> (word_id [N], node_id [N]).

        node_id is the direct-index node `levelsup` levels above the leaf
        (reference: Frame::ComputeBoW levelsup=4 from the 6-level ORBvoc;
        scaled to this tree's depth). Invalid descriptors get word -1.
        """
        w, n = _transform_device(self, jnp.asarray(desc))
        w, n = np.asarray(w), np.asarray(n)
        if valid is not None:
            w = np.where(valid, w, -1)
            n = np.where(valid, n, -1)
        return w, n

    def bow_vector(self, desc: np.ndarray,
                   valid: Optional[np.ndarray] = None) -> np.ndarray:
        """L1-normalized tf-idf histogram [n_words] float32."""
        w, _ = self.transform(desc, valid)
        v = np.zeros(self.n_words, dtype=np.float32)
        ww = w[w >= 0]
        np.add.at(v, ww, self.weights[ww])
        s = v.sum()
        return v / s if s > 0 else v

    def bow_sparse(self, desc: np.ndarray,
                   valid: Optional[np.ndarray] = None
                   ) -> Tuple[np.ndarray, np.ndarray]:
        """Sparse L1-normalized tf-idf BoW: (sorted word ids [W],
        weights [W]). Scales to the reference's 1M-word ORBvoc where a
        dense histogram would not (W <= n_features regardless of
        vocabulary size)."""
        w, _ = self.transform(desc, valid)
        ww = w[w >= 0]
        words, cnt = np.unique(ww, return_counts=True)
        vals = cnt.astype(np.float32) * self.weights[words]
        s = vals.sum()
        if s > 0:
            vals = vals / s
        return words.astype(np.int64), vals.astype(np.float32)

    @staticmethod
    def score_l1(v1: np.ndarray, v2: np.ndarray) -> float:
        """DBoW2 L1 score: 1 - 0.5 |v1 - v2|_1, in [0, 1]."""
        return float(1.0 - 0.5 * np.abs(v1 - v2).sum())

    @staticmethod
    def score_sparse(w1, v1, w2, v2) -> float:
        """L1 score on sparse BoW pairs: for L1-normalized vectors,
        1 - 0.5*|v1-v2|_1 == sum over SHARED words of min(a, b) — the
        inverted-file-friendly form DBoW2 exploits
        (Thirdparty/DBoW2 L1Scoring)."""
        c1, i1, i2 = np.intersect1d(w1, w2, assume_unique=True,
                                    return_indices=True)
        if len(c1) == 0:
            return 0.0
        return float(np.minimum(v1[i1], v2[i2]).sum())


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _descend(desc, k: int, L: int, levelsup: int, centroids):
    """Batched tree descent: L rounds of gather + Hamming argmin."""
    from ..ops.matching import unpack_pm1

    d_pm = unpack_pm1(desc)                                  # [N, 256]
    n = desc.shape[0]
    node = jnp.zeros(n, dtype=jnp.int32)                     # index in level
    direct = jnp.zeros(n, dtype=jnp.int32)
    offset = 0
    for level in range(1, L + 1):
        block = centroids[offset:offset + k ** level]        # [k^level, 8]
        c_pm = unpack_pm1(block)                             # [k^level, 256]
        child_base = node * k                                # [N]
        # gather each descriptor's k candidate centroids
        idx = child_base[:, None] + jnp.arange(k)[None, :]   # [N, k]
        cand = c_pm[idx]                                     # [N, k, 256]
        dot = jnp.einsum("nd,nkd->nk", d_pm, cand)
        best = jnp.argmax(dot, axis=1).astype(jnp.int32)     # min hamming
        node = child_base + best
        if level == L - levelsup:
            direct = node
        offset += k ** level
    if L - levelsup <= 0:
        direct = jnp.zeros_like(node)
    return node, direct


def _transform_device(vocab: Vocabulary, desc):
    return _descend(desc, vocab.k, vocab.L, vocab.levelsup,
                    jnp.asarray(vocab.centroids))


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def train_vocabulary(descs: np.ndarray, k: int = 10, L: int = 3,
                     seed: int = 0, iters: int = 8,
                     levelsup: int = 1) -> Vocabulary:
    """Hierarchical k-medians over packed descriptors [N, 8].

    Builds a complete k^L tree (empty clusters re-seeded from the largest
    cluster so the dense-array layout always holds).
    """
    rng = np.random.default_rng(seed)
    levels = []                 # per level: [k^level, 8]
    assignments = np.zeros(len(descs), dtype=np.int64)  # node idx in level

    for level in range(1, L + 1):
        n_nodes = k ** level
        cents = np.zeros((n_nodes, 8), dtype=np.uint32)
        new_assign = np.zeros_like(assignments)
        for parent in range(k ** (level - 1)):
            sel = np.nonzero(assignments == parent)[0]
            sub = descs[sel]
            c = _kmedians(sub, k, rng, iters)
            cents[parent * k:(parent + 1) * k] = c
            if len(sel):
                a = np.argmin(hamming_np(sub, c), axis=1)
                new_assign[sel] = parent * k + a
        assignments = new_assign
        levels.append(cents)

    centroids = np.concatenate(levels, axis=0)
    # idf weights from training data (reference TF_IDF weighting)
    n_words = k ** L
    counts = np.bincount(assignments, minlength=n_words).astype(np.float64)
    n_docs = max(len(descs) / 500.0, 1.0)  # pseudo-documents of ~500 feats
    idf = np.log(np.maximum(n_docs, 2.0) /
                 np.maximum(counts / 500.0, 1e-3))
    idf = np.clip(idf, 0.05, None).astype(np.float32)
    return Vocabulary(k=k, L=L, centroids=centroids, weights=idf,
                      levelsup=min(levelsup, L - 1))


def _kmedians(sub: np.ndarray, k: int, rng, iters: int) -> np.ndarray:
    """k-medians with majority centroids; always returns k centroids."""
    if len(sub) == 0:
        return rng.integers(0, 2 ** 32, (k, 8), dtype=np.uint32)
    if len(sub) <= k:
        out = np.zeros((k, 8), dtype=np.uint32)
        out[:len(sub)] = sub
        out[len(sub):] = sub[rng.integers(0, len(sub), k - len(sub))]
        # perturb duplicates one bit so children differ
        for i in range(len(sub), k):
            out[i, 0] ^= np.uint32(1 << int(rng.integers(0, 32)))
        return out
    # k-means++ style init in Hamming space
    cents = [sub[rng.integers(len(sub))]]
    for _ in range(k - 1):
        d = hamming_np(sub, np.asarray(cents)).min(axis=1).astype(np.float64)
        s = d.sum()
        if s > 0:
            cents.append(sub[rng.choice(len(sub), p=d / s)])
        else:  # all descriptors identical to a centroid: uniform pick
            cents.append(sub[rng.integers(len(sub))])
    cents = np.asarray(cents, dtype=np.uint32)
    for _ in range(iters):
        a = np.argmin(hamming_np(sub, cents), axis=1)
        for j in range(k):
            sel = sub[a == j]
            if len(sel):
                cents[j] = majority_centroid(sel)
            else:  # re-seed from the biggest cluster
                big = np.argmax(np.bincount(a, minlength=k))
                pool = sub[a == big]
                cents[j] = pool[rng.integers(len(pool))]
    return cents


# ---------------------------------------------------------------------------
# ORBvoc text-format converter (tools/bin_vocabulary.cc equivalent)
# ---------------------------------------------------------------------------

def load_orbvoc_text(path: str) -> Vocabulary:
    """Parse the DBoW2 text vocabulary format: header 'k L scoring
    weighting', then one node per line: 'parent is_leaf d0..d31 weight'.

    Non-complete trees are densified: missing children are filled with
    copies of the parent centroid (they never win an argmin against a
    real sibling unless the subtree was genuinely absent).
    """
    with open(path) as f:
        header = f.readline().split()
        k, L = int(header[0]), int(header[1])
        n_internal = sum(k ** l for l in range(1, L))
        n_total = sum(k ** l for l in range(1, L + 1))
        centroids = np.zeros((n_total, 8), dtype=np.uint32)
        weights = np.zeros(k ** L, dtype=np.float32)
        filled = np.zeros(n_total, dtype=bool)

        # reconstruct tree positions: children are listed in parent order
        child_count = {}
        level_of = {0: 0}
        pos_in_level = {0: 0}
        line_nodes = []
        for line in f:
            parts = line.split()
            if len(parts) < 35:
                continue
            parent = int(parts[0])
            desc = np.packbits(
                np.asarray([[int(b) for b in f"{int(x):08b}"]
                            for x in parts[2:34]], dtype=np.uint8)
            ).view(np.uint32)
            weight = float(parts[34])
            line_nodes.append((parent, desc, weight))

        for i, (parent, desc, weight) in enumerate(line_nodes, start=1):
            level_of[i] = level_of[parent] + 1
            c = child_count.get(parent, 0)
            child_count[parent] = c + 1
            pos_in_level[i] = pos_in_level[parent] * k + c
            lvl = level_of[i]
            off = sum(k ** l for l in range(1, lvl))
            idx = off + pos_in_level[i]
            if idx < n_total:
                centroids[idx] = desc
                filled[idx] = True
                if lvl == L:
                    weights[pos_in_level[i]] = weight
        # densify: unfilled nodes copy their parent
        off_prev = 0
        for lvl in range(2, L + 1):
            off = sum(k ** l for l in range(1, lvl))
            for j in range(k ** lvl):
                if not filled[off + j]:
                    centroids[off + j] = centroids[off_prev + j // k]
            off_prev = off
        return Vocabulary(k=k, L=L, centroids=centroids, weights=weights,
                          levelsup=min(4, L - 1))
