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
