import numpy as np
import pytest

from orb_slam2_map_tpu.place import vocabulary


@pytest.fixture(scope="module")
def descs():
    """Clustered binary descriptors: 20 clusters x 100 perturbed copies."""
    rng = np.random.default_rng(0)
    centers = rng.integers(0, 2 ** 32, (20, 8), dtype=np.uint32)
    out = []
    for c in centers:
        bits = np.unpackbits(c.view(np.uint8))
        for _ in range(100):
            b = bits.copy()
            flip = rng.choice(256, 10, replace=False)
            b[flip] ^= 1
            out.append(np.packbits(b).view(np.uint32))
    return np.asarray(out), centers


class TestVocabulary:
    def test_train_and_transform(self, descs):
        d, centers = descs
        voc = vocabulary.train_vocabulary(d, k=5, L=2, seed=1)
        assert voc.n_words == 25
        words, nodes = voc.transform(d)
        assert words.min() >= 0 and words.max() < 25
        # same-cluster descriptors should mostly share a word
        agree = 0
        for c in range(20):
            w = words[c * 100:(c + 1) * 100]
            agree += (w == np.bincount(w).argmax()).mean()
        assert agree / 20 > 0.8

    def test_bow_similarity_ranking(self, descs):
        d, _ = descs
        voc = vocabulary.train_vocabulary(d, k=5, L=2, seed=1)
        rng = np.random.default_rng(2)
        setA = d[rng.choice(2000, 300, replace=False)]
        # setB shares 250 of setA's descriptors; setC is disjoint-ish
        setB = np.concatenate([setA[:250], d[rng.choice(2000, 50)]])
        setC = d[rng.choice(2000, 300, replace=False)]
        vA = voc.bow_vector(setA)
        vB = voc.bow_vector(setB)
        vC = voc.bow_vector(setC)
        sAB = vocabulary.Vocabulary.score_l1(vA, vB)
        sAC = vocabulary.Vocabulary.score_l1(vA, vC)
        assert sAB > sAC

    def test_save_load(self, descs, tmp_path):
        d, _ = descs
        voc = vocabulary.train_vocabulary(d[:500], k=4, L=2, seed=3)
        p = str(tmp_path / "voc.npz")
        voc.save(p)
        voc2 = vocabulary.Vocabulary.load(p)
        w1, _ = voc.transform(d[:100])
        w2, _ = voc2.transform(d[:100])
        np.testing.assert_array_equal(w1, w2)

    def test_majority_centroid(self):
        a = np.asarray([[0b1100], [0b1000], [0b1001]], dtype=np.uint32)
        a = np.tile(a, (1, 8))
        c = vocabulary.majority_centroid(a)
        assert c.shape == (8,)
        # bit 3 (value 8) set in all three -> must be set in centroid
        assert c[0] & 0b1000

    def test_hamming_np(self):
        a = np.zeros((1, 8), dtype=np.uint32)
        b = np.full((1, 8), 0xFFFFFFFF, dtype=np.uint32)
        assert vocabulary.hamming_np(a, b)[0, 0] == 256
        assert vocabulary.hamming_np(a, a)[0, 0] == 0


class TestORBvocScale:
    """The reference ships a 1M-word ORBvoc (k=10, L=6, README.md:24);
    the text converter and the device tree descent must work at that
    shape, not just the 10k shipped vocab. The routine test runs the
    same code paths at 100k words (k=10, L=5, ~12 MB text file); set
    ORB_TPU_BIG_VOCAB=1 to run the full 1M-word configuration."""

    def test_orbvoc_text_roundtrip_small(self, tmp_path):
        voc = vocabulary.synthesize_vocabulary(k=10, L=3, seed=1)
        p = str(tmp_path / "voc.txt")
        vocabulary.save_orbvoc_text(voc, p)
        voc2 = vocabulary.load_orbvoc_text(p)
        assert (voc2.k, voc2.L) == (10, 3)
        np.testing.assert_array_equal(voc.centroids, voc2.centroids)
        np.testing.assert_allclose(voc.weights, voc2.weights, rtol=1e-5)
        rng = np.random.default_rng(0)
        d = rng.integers(0, 2 ** 32, (256, 8), dtype=np.uint32)
        w1, n1 = voc.transform(d)
        w2, n2 = voc2.transform(d)
        np.testing.assert_array_equal(w1, w2)
        np.testing.assert_array_equal(n1, n2)

    def test_real_dbow2_text_quirks(self, tmp_path):
        """Real ORBvoc.txt files written by the reference's
        saveToTextFile carry a DOUBLE space in the header
        (`f << m_k << " " << m_L << " " << " " << m_scoring ...`,
        TemplatedVocabulary.h:1446) and often trailing blank lines; the
        loader must tolerate both (ADVICE r3: the strict np.loadtxt
        parse raised on ragged lines)."""
        voc = vocabulary.synthesize_vocabulary(k=10, L=3, seed=4)
        p0 = str(tmp_path / "clean.txt")
        vocabulary.save_orbvoc_text(voc, p0)
        body = open(p0).read().split("\n", 1)[1]
        p = str(tmp_path / "quirky.txt")
        with open(p, "w") as f:
            f.write("10 3  0 0\n")          # the reference's double space
            f.write(body)
            f.write("\n\n")                 # trailing blanks
        voc2 = vocabulary.load_orbvoc_text(p)
        assert (voc2.k, voc2.L) == (10, 3)
        np.testing.assert_array_equal(voc.centroids, voc2.centroids)

    def test_orbvoc_binary_roundtrip(self, tmp_path):
        """The fork's fast-start ORBvoc.bin layout (TemplatedVocabulary
        saveToBinaryFile: 24-byte header + packed 41-byte node records)
        must round-trip bit-exactly and agree with the text format."""
        voc = vocabulary.synthesize_vocabulary(k=10, L=3, seed=5)
        p = str(tmp_path / "voc.bin")
        vocabulary.save_orbvoc_binary(voc, p)
        import os

        n_nodes = sum(10 ** l for l in range(1, 4))
        assert os.path.getsize(p) == 24 + 41 * n_nodes
        voc2 = vocabulary.load_orbvoc_binary(p)
        assert (voc2.k, voc2.L) == (10, 3)
        np.testing.assert_array_equal(voc.centroids, voc2.centroids)
        np.testing.assert_allclose(voc.weights, voc2.weights, rtol=1e-6)
        rng = np.random.default_rng(0)
        d = rng.integers(0, 2 ** 32, (128, 8), dtype=np.uint32)
        w1, _ = voc.transform(d)
        w2, _ = voc2.transform(d)
        np.testing.assert_array_equal(w1, w2)

    def test_large_vocab_convert_and_descend(self, tmp_path):
        import os
        import time

        big = os.environ.get("ORB_TPU_BIG_VOCAB") == "1"
        L = 6 if big else 5
        voc = vocabulary.synthesize_vocabulary(k=10, L=L, seed=2)
        assert voc.n_words == 10 ** L
        p = str(tmp_path / "voc_big.txt")
        vocabulary.save_orbvoc_text(voc, p)
        t0 = time.time()
        voc2 = vocabulary.load_orbvoc_text(p)
        t_load = time.time() - t0
        assert t_load < 300.0, f"text convert took {t_load:.0f}s"
        np.testing.assert_array_equal(voc.centroids, voc2.centroids)

        rng = np.random.default_rng(1)
        # descriptors near random leaves -> retrieval should hit the
        # exact leaf word despite 4 flipped bits
        leaf_off = voc.level_offset(L)
        pick = rng.choice(10 ** L, 512, replace=False)
        d = voc.centroids[leaf_off + pick].copy()
        flips = rng.integers(0, 256, (512, 4))
        for i in range(512):
            for b in flips[i]:
                d[i, b // 32] ^= np.uint32(1) << np.uint32(b % 32)
        t0 = time.time()
        words, _ = voc.transform(d)
        t_first = time.time() - t0
        t0 = time.time()
        words, _ = voc.transform(d)
        t_warm = time.time() - t0
        hit = (words == pick).mean()
        assert hit > 0.95, f"leaf retrieval {hit:.2f} at {10**L} words"
        assert t_warm < 10.0, f"device descent {t_warm*1e3:.0f}ms"


class TestKeyFrameDatabase:
    def test_loop_candidates_on_synthetic_map(self, descs):
        """Build a tiny map where KF0 and KF4 see the same descriptors."""
        from orb_slam2_map_tpu.config import SystemConfig
        from orb_slam2_map_tpu.place.database import KeyFrameDatabase
        from orb_slam2_map_tpu.slam.mapstore import MapStore

        d, _ = descs
        rng = np.random.default_rng(4)
        cfg = SystemConfig()
        N = 64
        m = MapStore(max_keyframes=8, max_points=512, kp_capacity=N)
        db = KeyFrameDatabase(cfg, m)
        db.ensure_vocabulary(d)

        scene = {}
        for kid in range(6):
            m.alloc_keyframe()
            if kid in (0, 5):
                if "loop" not in scene:
                    scene["loop"] = d[rng.choice(2000, N)]
                m.kf_desc[kid] = scene["loop"]
            else:
                m.kf_desc[kid] = d[rng.choice(2000, N)]
            m.kf_kp_valid[kid] = True
            m.version += 1
        db.maybe_refresh()
        cands = db.detect_loop_candidates(5, min_score=0.05)
        assert 0 in cands.tolist()

    def test_reloc_candidates_ranked(self, descs):
        from orb_slam2_map_tpu.config import SystemConfig
        from orb_slam2_map_tpu.place.database import KeyFrameDatabase
        from orb_slam2_map_tpu.slam.mapstore import MapStore
        from orb_slam2_map_tpu.slam.frame import Frame
        import jax.numpy as jnp

        d, _ = descs
        rng = np.random.default_rng(5)
        cfg = SystemConfig()
        N = 64
        m = MapStore(max_keyframes=8, max_points=512, kp_capacity=N)
        db = KeyFrameDatabase(cfg, m)
        db.ensure_vocabulary(d)
        target = d[rng.choice(2000, N)]
        for kid in range(4):
            m.alloc_keyframe()
            m.kf_desc[kid] = target if kid == 2 else d[rng.choice(2000, N)]
            m.kf_kp_valid[kid] = True
            m.version += 1

        class F:
            desc = jnp.asarray(target)
            valid = jnp.ones(N, dtype=bool)

        cands = db.reloc_candidates(F())
        assert cands[0] == 2
