"""Local mapping: keyframe processing, point culling, triangulation,
fusion, local BA, keyframe culling.

Replaces the reference's LocalMapping thread (reference:
src/LocalMapping.cc, 762 LoC). The thread + 3ms-poll queue becomes a
host-orchestrated stage invoked per keyframe; the numeric core (epipolar
triangulation matching, fusion matching, local BA) runs as fixed-shape
device programs. Interlocks (InterruptBA / stop / accept flags,
reference :555-630) disappear: stages are serialized by the orchestrator,
matching the reference's semantics without data races by construction.
"""

from __future__ import annotations

import contextlib
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from ..utils import transfer


from ..config import SystemConfig
from ..geom import se3 as se3_np  # jnp-based but works on np inputs
from ..ops import matching
from ..optim import local_ba, triangulate
from ..utils import profiling
from . import mapping_kernels
from .mapstore import MapStore

# fixed device capacities for the local-BA problem
BA_MAX_FREE = 16
BA_MAX_FIXED = 16
BA_MAX_POINTS = 4096


class LocalMapper:
    def __init__(self, cfg: SystemConfig, map_store: MapStore,
                 loop_closer=None):
        self.cfg = cfg
        self.map = map_store
        self.loop_closer = loop_closer
        self.loop_queue = None   # set by the async pipeline: keyframes
                                 # hand off to a dedicated loop thread
        self.external_ba = False  # set by the async pipeline: local BA
                                  # runs on its continuous thread
        self.recent_points: List[np.ndarray] = []  # queues for culling
        self.recent_kf: List[int] = []
        self.enabled = True
        # host-map lock for concurrent operation (the async pipeline sets
        # this to its map RLock so mapping can run on its own thread; the
        # expensive device round trips happen OUTSIDE lock-held sections,
        # the mutations inside — the fine-grained analogue of the
        # reference's per-phase mutexing, src/LocalMapping.cc:128-698)
        self.lock = contextlib.nullcontext()

    # ------------------------------------------------------------------

    @contextlib.contextmanager
    def _hold(self, name: str):
        """Acquire the map lock, separately timing the wait (lock
        contention with the supervisor) from the held section."""
        with profiling.stage(f"local_mapping/lockwait_{name}"):
            got = getattr(self.lock, "acquire", None)
            if got is not None:
                self.lock.acquire()
        try:
            yield
        finally:
            if got is not None:
                self.lock.release()

    # ------------------------------------------------------------------

    def process_keyframe(self, kid: int, effort: str = "full"):
        """Full per-KF pipeline (reference: src/LocalMapping.cc:47-112
        Run): bookkeeping -> point culling -> triangulate new points ->
        fuse duplicates -> local BA -> KF culling -> feed loop closer.

        `effort` is the backlog-shedding knob (the reference's
        InterruptBA analogue, src/LocalMapping.cc:118: under load its
        local BA is constantly aborted by incoming keyframes): "full"
        runs everything, "medium" skips the local BA and KF culling,
        "light" additionally skips triangulation/fuse — bookkeeping
        only, so keyframe CREATION (which feeds the tracker fresh
        candidates) never waits on refinement work."""
        if not self.enabled:
            return
        with profiling.stage("local_mapping"):
            with self.lock:
                self._process_new_keyframe(kid)
                self._cull_map_points(kid)
                n_kfs = self.map.n_keyframes()
            if effort != "light" and n_kfs > 1:
                with profiling.stage("local_mapping/triangulate"):
                    self._create_new_map_points(kid)
                with profiling.stage("local_mapping/fuse"):
                    self._fuse_neighbors(kid)
            # external_ba: the async pipeline runs local BA on its own
            # continuous-refinement thread (device-bound, overlaps this
            # thread's bookkeeping) — under backlog the effort ladder
            # used to shed BA entirely and drift exploded (r5: 33 cm
            # mid-run KF error whenever scheduling starved the BA)
            if not self.external_ba and effort == "full" and n_kfs > 2:
                with profiling.stage("local_mapping/local_ba"):
                    self._local_bundle_adjustment(kid)
            if effort == "full":
                with self.lock:
                    self._cull_keyframes(kid)
        if self.loop_queue is not None:
            # dedicated loop-closing thread (reference: src/LoopClosing.cc
            # :58-102 — its own thread + KF queue so mapping continues
            # while a closure runs); the loop closer takes the map lock
            # itself, only around detection and the correction write-back
            self.loop_queue.put(kid)
        elif self.loop_closer is not None:
            with profiling.stage("loop_closing"):
                self.loop_closer.process_keyframe(kid)

    # ------------------------------------------------------------------

    def _process_new_keyframe(self, kid: int):
        """(reference: src/LocalMapping.cc:128-168): refresh point
        normals/descriptors and track recently added points."""
        obs = self.map.kf_obs[kid]
        mids = np.unique(obs[obs >= 0])
        sf = np.asarray(self.cfg.orb.scale_factors, dtype=np.float32)
        with profiling.stage("local_mapping/point_stats"):
            self.map.update_point_stats(mids, sf)
        new_mask = self.map.mp_first_kf[mids] == kid
        self.recent_points.append(mids[new_mask])
        self.recent_kf.append(kid)

    def _cull_map_points(self, kid: int):
        """(reference: src/LocalMapping.cc:170-205): drop points with
        found/visible < 0.25 or too few observations within 2 KFs of
        creation."""
        lcfg = self.cfg.local_mapping
        keep_queues = []
        to_erase = []
        for created_kf, mids in zip(self.recent_kf, self.recent_points):
            mids = mids[self.map.mp_exists[mids]]
            age = kid - created_kf  # keyframes since creation (id distance)
            ratio = (self.map.mp_found[mids] /
                     np.maximum(self.map.mp_visible[mids], 1))
            bad = ratio < lcfg.culling_found_ratio
            if age >= 2:
                # weighted obs count (stereo counts 2): reference gate is
                # Observations() <= 3 (src/LocalMapping.cc:186)
                bad |= self.map.mp_obs_count[mids] <= lcfg.culling_min_obs
            to_erase.append(mids[bad])
            if age <= 2:
                keep_queues.append((created_kf, mids[~bad]))
        if to_erase:
            self.map.erase_points_bulk(np.concatenate(to_erase))
        self.recent_kf = [k for k, _ in keep_queues]
        self.recent_points = [m for _, m in keep_queues]

    # ------------------------------------------------------------------

    def _create_new_map_points(self, kid: int):
        """Two-view triangulation with covisible neighbors (reference:
        src/LocalMapping.cc:207-452). For RGB-D most points come from
        depth at KF creation; triangulation adds the far/mono points.

        Per neighbor: epipolar-gated descriptor matching of unmatched
        keypoints (reference SearchForTriangulation, src/ORBmatcher.cc:
        657-823) -> batched DLT -> acceptance gates."""
        lcfg = self.cfg.local_mapping
        cam = self.cfg.camera
        n_neighbors = lcfg.triangulation_neighbors_stereo
        with self._hold("tri_read"):   # consistent candidate geometry
            neighbors = self.map.covisible_keyframes(kid,
                                                     top_n=n_neighbors)
            if len(neighbors) == 0:
                return
            R1 = self.map.kf_R[kid].copy()
            t1 = self.map.kf_t[kid].copy()
            c1 = -R1.T @ t1
            obs1 = self.map.kf_obs[kid]
            free1 = (obs1 < 0) & self.map.kf_kp_valid[kid]

            # build the neighbor batch (baseline-gated), padded to a
            # fixed width so the vmapped program compiles once
            B = n_neighbors
            nbs = []
            for nb in neighbors:
                c2 = -self.map.kf_R[nb].T @ self.map.kf_t[nb]
                if np.linalg.norm(c2 - c1) < cam.baseline:  # ref :252-261
                    continue
                if ((self.map.kf_obs[nb] < 0)
                        & self.map.kf_kp_valid[nb]).sum() > 0:
                    nbs.append(int(nb))
            if free1.sum() == 0 or len(nbs) == 0:
                self.map.update_connections(kid)
                return
            nbs = nbs[:B]
            pad_ids = nbs + [nbs[-1]] * (B - len(nbs))
            pad_arr = np.asarray(pad_ids)
            free2s = ((self.map.kf_obs[pad_arr] < 0)
                      & self.map.kf_kp_valid[pad_arr])
            free2s[len(nbs):] = False  # padded entries: no matches

            # all pairs in ONE dispatch; ONE batched upload + ONE
            # download (each individual transfer pays a host<->device
            # round trip on networked TPU)
            _t_tri = profiling.PROFILER.stage("local_mapping/tri_dispatch")
            _t_tri.__enter__()
            args = jax.device_put((
                R1, t1, self.map.kf_xy[kid], self.map.kf_level[kid],
                self.map.kf_desc[kid], free1, self.map.kf_ur[kid],
                self.map.kf_R[pad_arr], self.map.kf_t[pad_arr],
                self.map.kf_xy[pad_arr], self.map.kf_level[pad_arr],
                self.map.kf_desc[pad_arr], free2s,
                self.map.kf_ur[pad_arr]))
            res = mapping_kernels.triangulate_pairs_batch(self.cfg, *args)
            _t_tri.__exit__(None, None, None)
        # device round trip runs WITHOUT the map lock
        with profiling.stage("local_mapping/tri_fetch"):
            ok_b, col_b, X_b = transfer.fetch((res.ok, res.kp2_idx, res.X))

        with self._hold("tri_write"):
            new_all = []
            for j, nb in enumerate(nbs):
                # drop keypoints consumed by earlier pairs or bound since
                ok = ok_b[j] & free1 & (self.map.kf_obs[kid] < 0)
                rows = np.nonzero(ok)[0]
                if len(rows) == 0:
                    continue
                cols = col_b[j][rows]
                X = X_b[j][rows]
                mids = self.map.alloc_points(len(rows))
                self.map.mp_pos[mids] = X
                self.map.mp_desc[mids] = self.map.kf_desc[kid][rows]
                self.map.mp_level[mids] = self.map.kf_level[kid][rows]
                self.map.mp_first_kf[mids] = kid
                self.map.set_observations_bulk(kid, rows, mids)
                self.map.set_observations_bulk(nb, cols, mids)
                free1[rows] = False
                new_all.append(mids)
            if new_all:
                mids = np.concatenate(new_all)
                with profiling.stage("local_mapping/tri_stats"):
                    self.map.update_point_stats(
                        mids, np.asarray(self.cfg.orb.scale_factors,
                                         np.float32))
                if len(self.recent_points):
                    self.recent_points[-1] = np.concatenate(
                        [self.recent_points[-1], mids])
            self.map.update_connections(kid)

    # ------------------------------------------------------------------

    def _fuse_neighbors(self, kid: int):
        """Two-way duplicate fusion with 1st+2nd ring neighbors
        (reference: src/LocalMapping.cc:454-534 SearchInNeighbors +
        src/ORBmatcher.cc:825-975 Fuse): project this KF's points into
        each neighbor; merge matches that hit a keypoint already bound to
        another point (keep the more-observed one)."""
        with self._hold("fuse_read"):
            first_ring = self.map.covisible_keyframes(kid, top_n=10)
            targets = list(first_ring)
            seen = set(targets) | {kid}
            for k in first_ring:
                for nb in self.map.covisible_keyframes(k, top_n=5):
                    if int(nb) not in seen:
                        targets.append(int(nb))
                        seen.add(int(nb))
            obs_self = self.map.kf_obs[kid]
            own = np.unique(obs_self[obs_self >= 0])
            own = own[self.map.mp_exists[own]]
            if len(own) == 0:
                return
            # both fuse directions dispatched together: the forward batch
            # and the reverse projection share ONE download round trip
            # (their device programs are independent; only the host
            # bookkeeping is ordered, as in the reference's sequential
            # Fuse calls)
            nb_points = [self.map.kf_obs[nb][self.map.kf_obs[nb] >= 0]
                         for nb in targets]
            cand = np.unique(np.concatenate(nb_points)) if nb_points else \
                np.asarray([], dtype=np.int64)
            cand = cand[self.map.mp_exists[cand]]
            fwd = self._fuse_into_many_dispatch(targets, own)
            rev = self._fuse_into_dispatch(kid, cand)
        pulls = []
        if fwd is not None:
            pulls.extend([fwd[2].ok, fwd[2].kp_idx])
        if rev is not None:
            pulls.extend([rev[2].ok, rev[2].kp_idx])
        with profiling.stage("local_mapping/fuse_fetch"):
            host = transfer.fetch(pulls)   # no map lock during the RTT
        with self._hold("fuse_write"):
            batches = []
            if fwd is not None:
                targets_f, mids_p = fwd[0], fwd[1]
                keep_b, kp_b = host[0], host[1]
                valid_f = fwd[3]
                for j, nb in enumerate(targets_f):
                    keep = keep_b[j] & valid_f
                    rows = np.nonzero(keep)[0]
                    batches.append((int(nb), mids_p, rows, kp_b[j][rows]))
            if rev is not None:
                off = 2 if fwd is not None else 0
                ok_np, kp_np = host[off], host[off + 1]
                keep = ok_np & rev[3]
                rows = np.nonzero(keep)[0]
                batches.append((kid, rev[1], rows, kp_np[rows]))
            with profiling.stage("local_mapping/apply_fuse"):
                self.apply_fuse_round(batches)
            # descriptors/normals + covisibility changed
            with profiling.stage("local_mapping/fuse_stats"):
                self.map.update_point_stats(
                    own, np.asarray(self.cfg.orb.scale_factors, np.float32))
            self.map.update_connections(kid)

    FUSE_TARGET_CAP = 24  # fixed vmap width for the forward fuse batch

    def _fuse_into_many_dispatch(self, targets: List[int],
                                 mids: np.ndarray):
        """Dispatch the forward fuse batch (one candidate set into MANY
        keyframes); returns (targets, mids_p, device result, valid) for a
        caller-batched download."""
        if len(mids) == 0 or len(targets) == 0:
            return None
        T = self.FUSE_TARGET_CAP
        targets = list(targets)[:T]
        pad_ids = targets + [targets[-1]] * (T - len(targets))
        pad_arr = np.asarray(pad_ids)
        kf_valids = self.map.kf_kp_valid[pad_arr].copy()
        kf_valids[len(targets):] = False    # padded targets: no matches

        C = mapping_kernels.bucket_size(len(mids))
        pad = C - len(mids)
        mids_p = np.concatenate([mids, np.zeros(pad, dtype=mids.dtype)])
        valid = np.concatenate([np.ones(len(mids), bool),
                                np.zeros(pad, bool)])
        args = jax.device_put((
            self.map.kf_R[pad_arr], self.map.kf_t[pad_arr],
            self.map.mp_pos[mids_p], self.map.mp_desc[mids_p],
            self.map.mp_min_dist[mids_p], self.map.mp_max_dist[mids_p],
            valid, self.map.kf_xy[pad_arr], self.map.kf_level[pad_arr],
            kf_valids, self.map.kf_desc[pad_arr]))
        res = mapping_kernels.fuse_match_batch(self.cfg, *args)
        return targets, mids_p, res, valid

    def _fuse_into_dispatch(self, kid: int, mids: np.ndarray):
        """Dispatch projection of `mids` into KF `kid` (reference Fuse,
        src/ORBmatcher.cc:825-975); download is the caller's."""
        if len(mids) == 0:
            return None
        # pad candidates to a power-of-two bucket: jit compiles per
        # bucket size instead of per call
        C = mapping_kernels.bucket_size(len(mids))
        pad = C - len(mids)
        mids_p = np.concatenate([mids, np.zeros(pad, dtype=mids.dtype)])
        valid = np.concatenate([np.ones(len(mids), bool),
                                np.zeros(pad, bool)])
        args = jax.device_put((
            self.map.kf_R[kid], self.map.kf_t[kid],
            self.map.mp_pos[mids_p], self.map.mp_desc[mids_p],
            self.map.mp_min_dist[mids_p], self.map.mp_max_dist[mids_p],
            valid, self.map.kf_xy[kid], self.map.kf_level[kid],
            self.map.kf_kp_valid[kid], self.map.kf_desc[kid]))
        res = mapping_kernels.fuse_match(self.cfg, *args)
        return kid, mids_p, res, valid

    def _fuse_into(self, kid: int, mids: np.ndarray):
        """Synchronous fuse of `mids` into KF `kid` (kept for loop
        closing's SearchAndFuse, reference src/LoopClosing.cc:585-611)."""
        d = self._fuse_into_dispatch(kid, mids)
        if d is None:
            return
        _, mids_p, res, valid = d
        ok_np, kp_np = transfer.fetch((res.ok, res.kp_idx))
        keep = ok_np & valid
        rows = np.nonzero(keep)[0]
        self._apply_fuse(kid, mids_p, rows, kp_np[rows])

    def fuse_into_many(self, targets, mids: np.ndarray):
        """Fuse `mids` into many keyframes with vmapped dispatch + ONE
        bookkeeping round (loop closing's SearchAndFuse over the
        corrected neighborhood, reference src/LoopClosing.cc:585-611;
        the per-KF variant paid one device round trip per keyframe)."""
        targets = [int(t) for t in targets]
        if len(targets) == 0 or len(mids) == 0:
            return
        dispatches = []
        for st in range(0, len(targets), self.FUSE_TARGET_CAP):
            d = self._fuse_into_many_dispatch(
                targets[st:st + self.FUSE_TARGET_CAP], mids)
            if d is not None:
                dispatches.append(d)
        batches = []
        for targets_f, mids_p, res, valid in dispatches:
            ok_b, kp_b = transfer.fetch((res.ok, res.kp_idx))
            for j, nb in enumerate(targets_f):
                keep = ok_b[j] & valid
                rows = np.nonzero(keep)[0]
                batches.append((int(nb), mids_p, rows, kp_b[j][rows]))
        self.apply_fuse_round(batches)

    def _apply_fuse(self, kid: int, mids: np.ndarray, rows: np.ndarray,
                    kp: np.ndarray):
        with profiling.stage("local_mapping/apply_fuse"):
            self.apply_fuse_round([(kid, mids, rows, kp)])

    def apply_fuse_round(self, batches):
        """Bind/merge a whole round of accepted fuse matches (reference
        Fuse bookkeeping, src/ORBmatcher.cc:825-975 + MapPoint::Replace,
        src/MapPoint.cc:177-215). `batches` is a list of
        (kid, mids, rows, kp) acceptance sets.

        Decisions (bind vs merge, merge direction) run as O(1) host-dict
        ops per match; all resulting merges apply in ONE pass over the
        observation table (MapStore.replace_points_bulk). The previous
        per-match variant scanned the full K x N table per merged point
        — O(matches*K*N) per fuse round at KITTI capacity (ADVICE r3)."""
        m = self.map
        merges = []                     # (drop, keep) pairs
        binds = []                      # (kid, kp, mid)
        repl: dict = {}                 # local view of this round's merges

        def resolve(x: int) -> int:
            while x in repl:
                x = repl[x]
            return x

        bound_sets: dict = {}
        overlay: dict = {}              # (kid, kp) -> mid bound this round
        cnt: dict = {}                  # merged-obs-count overlay
        for kid, mids, rows, kp in batches:
            if len(rows) == 0:
                continue
            kid = int(kid)
            if kid not in bound_sets:
                row = m.kf_obs[kid]
                bound_sets[kid] = set(row[row >= 0].tolist())
            for r, k in zip(rows, kp):
                mid = resolve(int(mids[r]))
                if not m.mp_exists[mid]:
                    continue            # merged away earlier this round
                cur = overlay.get((kid, int(k)))
                if cur is None:
                    b = int(m.kf_obs[kid, k])
                    cur = resolve(b) if b >= 0 else -1
                    if cur >= 0 and not m.mp_exists[cur]:
                        cur = -1
                else:
                    cur = resolve(cur)
                if cur == mid:
                    continue
                if cur >= 0:
                    # merge: keep the more-observed point (live view:
                    # earlier merges this round add their observations)
                    c_cur = cnt.get(cur, None)
                    if c_cur is None:
                        c_cur = int(m.mp_obs_count[cur])
                    c_mid = cnt.get(mid, None)
                    if c_mid is None:
                        c_mid = int(m.mp_obs_count[mid])
                    if c_cur >= c_mid:
                        keep, drop = cur, mid
                    else:
                        keep, drop = mid, cur
                    cnt[keep] = c_cur + c_mid
                    cnt[drop] = 0
                    repl[drop] = keep
                    merges.append((drop, keep))
                else:
                    if mid in bound_sets[kid]:
                        continue        # KF already observes this point
                    binds.append((kid, int(k), mid))
                    overlay[(kid, int(k))] = mid
                    bound_sets[kid].add(mid)

        if merges:
            m.replace_points_bulk(merges)
        touched = set()
        for kid, k, mid in binds:
            mid = resolve(mid)
            if not m.mp_exists[mid]:
                continue
            if mid != int(m.kf_obs[kid, k]) \
                    and (m.kf_obs[kid] == mid).any():
                continue                # survivor landed here via a merge
            m.kf_obs[kid, k] = mid
            touched.add(kid)
        if touched:
            m.refresh_obs_rows(np.fromiter(touched, np.int64,
                                           len(touched)))

    def _replace_point(self, old: int, new: int):
        """Re-bind every observation of `old` to `new`, then erase `old`
        (single-pair wrapper around the bulk pass)."""
        self.map.replace_points_bulk([(old, new)])

    # ------------------------------------------------------------------

    def _local_bundle_adjustment(self, kid: int, discard_if=None):
        """Assemble the dense padded BA problem and run the jitted solver
        (reference: src/Optimizer.cc:453-778). `discard_if`, when given,
        is checked right before write-back: a loop correction / GBA
        merge that moved the map while this solve ran makes the result
        stale (its poses would undo the correction), so it is dropped —
        the staged-write-back discipline of BackgroundGBA, applied to
        the continuous-refinement thread."""
        mstore = self.map
        with self._hold("ba_read"):
            built = self._build_ba_inputs(kid)
        if built is None:
            return
        free_ids, fix_ids, mids, prob_np = built
        prob = jax.device_put(prob_np)          # ONE host->device transfer
        res = local_ba.local_ba_jit(self.cfg.camera, prob)
        with profiling.stage("local_mapping/ba_fetch"):
            R_f, t_f, X_f, inl_f = transfer.fetch(  # ONE d->h, no lock
                (res.R_free, res.t_free, res.X, res.inlier_free))

        if discard_if is not None and discard_if():
            return
        with self._hold("ba_write"):
            # write back poses + points. Rotations are re-projected to
            # SO(3): repeated f32 LM retractions drift R R^T off identity
            # by ~1e-4, which downstream SE3 composes (spanning-tree
            # corrections, Tcp recovery) amplify since they use R^T as
            # the inverse
            K = len(free_ids)
            P = len(mids)
            # sanity guard (defense in depth for the continuous-BA
            # thread): a solve that went degenerate must never teleport
            # the map — r5 observed runs where points landed at quasi-
            # infinite range and tracking never recovered
            pose_ok = (np.isfinite(t_f[:K]).all(axis=1)
                       & (np.linalg.norm(
                           t_f[:K] - mstore.kf_t[free_ids], axis=1) < 2.0))
            pt_ok = (np.isfinite(X_f[:P]).all(axis=1)
                     & (np.linalg.norm(
                         X_f[:P] - mstore.mp_pos[mids], axis=1) < 5.0))
            if not pose_ok.all() or not pt_ok.all():
                import sys
                print(f"[local_ba] write-back guard: rejected "
                      f"{int((~pose_ok).sum())} poses / "
                      f"{int((~pt_ok).sum())} points (divergent solve)",
                      file=sys.stderr)
            wids = free_ids[pose_ok]
            U, _, Vt = np.linalg.svd(R_f[:K][pose_ok])
            mstore.kf_R[wids] = (U @ Vt).astype(np.float32)
            mstore.kf_t[wids] = t_f[:K][pose_ok]
            alive = mstore.mp_exists[mids] & pt_ok
            mstore.mp_pos[mids[alive]] = X_f[:P][alive]
            mstore.mark_points_dirty(mids[alive])

            # remove outlier observations (reference: :714-748)
            inl_free = inl_f[:P, :K]
            mask_free = prob_np.mask_free[:P, :K]
            bad = mask_free & ~inl_free
            for j, k in enumerate(free_ids):
                rows = np.nonzero(bad[:, j])[0]
                if len(rows) == 0:
                    continue
                bad_mids = mids[rows]
                sel = np.isin(mstore.kf_obs[k], bad_mids)
                mstore.kf_obs[k][sel] = -1
                mstore._refresh_obs_row(k)
            self.map.version += 1

    def _build_ba_inputs(self, kid: int):
        mstore = self.map
        neighbors = mstore.covisible_keyframes(kid)
        free_ids = np.concatenate([[kid], neighbors])[:BA_MAX_FREE]
        # never move the map origin (reference fixes KF id 0, :500)
        free_ids = free_ids[free_ids != mstore.kf_origin]
        if len(free_ids) == 0:
            return
        # points seen by the free KFs
        inc = mstore.observed_mask(free_ids) & mstore.mp_exists
        mids = np.nonzero(inc)[0]
        if len(mids) == 0:
            return
        if len(mids) > BA_MAX_POINTS:
            order = np.argsort(-mstore.mp_obs_count[mids], kind="stable")
            mids = np.sort(mids[order[:BA_MAX_POINTS]])
        # fixed KFs: other observers of those points (+ origin if observer)
        observers = (mstore.shared_counts(mids) > 0) & mstore.kf_exists
        observers[free_ids] = False
        fix_ids = np.nonzero(observers)[0]
        if len(fix_ids) > BA_MAX_FIXED:
            # keep the most strongly covisible fixed observers
            w = mstore.covis[fix_ids][:, free_ids].sum(axis=1)
            fix_ids = fix_ids[np.argsort(-w, kind="stable")[:BA_MAX_FIXED]]

        prob_np = self._build_problem(free_ids, fix_ids, mids)
        return free_ids, fix_ids, mids, prob_np

    def _build_problem(self, free_ids, fix_ids, mids) -> local_ba.BAProblem:
        """Gather the dense [P, K] observation grids from the SoA map."""
        mstore = self.map
        P, K, F = BA_MAX_POINTS, BA_MAX_FREE, BA_MAX_FIXED
        n_free, n_fix, n_pts = len(free_ids), len(fix_ids), len(mids)

        inv_sigma2 = 1.0 / np.asarray(self.cfg.orb.level_sigma2,
                                      dtype=np.float32)
        # mp id -> row index (shared by both grids)
        row_of = np.full(mstore.M, -1, dtype=np.int64)
        row_of[mids] = np.arange(n_pts)

        def grids(ids, C):
            """One vectorized scatter over all (KF, keypoint) pairs."""
            uv = np.zeros((P, C, 2), dtype=np.float32)
            ur = np.full((P, C), -1.0, dtype=np.float32)
            iv = np.ones((P, C), dtype=np.float32)
            mask = np.zeros((P, C), dtype=bool)
            if len(ids) == 0:
                return uv, ur, iv, mask
            obs = mstore.kf_obs[ids]                       # [C', N]
            rows = row_of[np.clip(obs, 0, None)]
            sel = (obs >= 0) & (rows >= 0)
            jj = np.broadcast_to(np.arange(len(ids))[:, None],
                                 obs.shape)[sel]
            rr = rows[sel]
            uv[rr, jj] = mstore.kf_xy[ids][sel]
            ur[rr, jj] = mstore.kf_ur[ids][sel]
            iv[rr, jj] = inv_sigma2[mstore.kf_level[ids][sel]]
            mask[rr, jj] = True
            return uv, ur, iv, mask

        uv_f, ur_f, iv_f, m_f = grids(free_ids, K)
        uv_x, ur_x, iv_x, m_x = grids(fix_ids, F)

        def pad_poses(ids, C):
            R = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
            t = np.zeros((C, 3), dtype=np.float32)
            R[:len(ids)] = mstore.kf_R[ids]
            t[:len(ids)] = mstore.kf_t[ids]
            return R, t

        R_free, t_free = pad_poses(free_ids, K)
        R_fix, t_fix = pad_poses(fix_ids, F)
        X = np.zeros((P, 3), dtype=np.float32)
        X[:n_pts] = mstore.mp_pos[mids]
        cam_valid = np.zeros(K, dtype=bool)
        cam_valid[:n_free] = True
        point_valid = np.zeros(P, dtype=bool)
        point_valid[:n_pts] = True

        return local_ba.BAProblem(
            R_free=R_free, t_free=t_free, R_fix=R_fix, t_fix=t_fix,
            X=X, cam_valid=cam_valid, point_valid=point_valid,
            uv_free=uv_f, ur_free=ur_f, inv_sigma2_free=iv_f, mask_free=m_f,
            uv_fix=uv_x, ur_fix=ur_x, inv_sigma2_fix=iv_x, mask_fix=m_x,
        )

    # ------------------------------------------------------------------

    def _cull_keyframes(self, kid: int):
        """Redundant-KF culling (reference: src/LocalMapping.cc:632-698):
        a local KF whose map points are >= 90% seen by >= 3 other KFs at
        the same or finer scale is removed."""
        lcfg = self.cfg.local_mapping
        targets = [int(k) for k in self.map.covisible_keyframes(kid)
                   if int(k) != self.map.kf_origin and int(k) != kid]
        if not targets:
            return
        # level-of-point lookup per existing KF: lvl[j, mid] = pyramid
        # level at which KF j observes mid (127 = not observed). One
        # vectorized scatter replaces the reference's nested per-point
        # observer walk (src/LocalMapping.cc:650-686).
        kfs_alive = self.map.keyframe_ids()
        lvl = np.full((len(kfs_alive), self.map.M), 127, dtype=np.int8)
        obs_all = self.map.kf_obs[kfs_alive]                  # [Ka, N]
        sel = obs_all >= 0
        rows = np.broadcast_to(np.arange(len(kfs_alive))[:, None],
                               obs_all.shape)[sel]
        lvl[rows, obs_all[sel]] = np.minimum(
            self.map.kf_level[kfs_alive][sel], 126).astype(np.int8)
        row_of = np.full(self.map.K, -1)
        row_of[kfs_alive] = np.arange(len(kfs_alive))

        for k in targets:
            obs = self.map.kf_obs[k]
            kp = np.nonzero(obs >= 0)[0]
            mids = obs[kp]
            alive = self.map.mp_exists[mids]
            kp, mids = kp[alive], mids[alive]
            if len(mids) == 0:
                continue
            levels = self.map.kf_level[k][kp]                 # [P]
            cand = self.map.mp_obs_count[mids] >= lcfg.kf_culling_min_obs + 1
            # observers at same-or-finer scale (level <= level_k + 1)
            lv = lvl[:, mids].astype(np.int32)                # [Ka, P]
            finer = (lv <= levels[None, :] + 1)
            finer[row_of[k]] = False                          # exclude self
            redundant = int((cand
                             & (finer.sum(axis=0)
                                >= lcfg.kf_culling_min_obs)).sum())
            if redundant > lcfg.kf_culling_redundancy * len(mids):
                self.map.erase_keyframe(k)
                lvl[row_of[k]] = 127
