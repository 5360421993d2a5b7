"""Loop closing: detection, Sim3 estimation, correction, essential graph,
global BA.

Replaces the reference's LoopClosing thread (reference: src/LoopClosing.cc,
771 LoC): BoW loop detection with covisibility-consistency voting (3
consecutive, :43), Sim3 RANSAC + refinement (:232-401), loop correction
via Sim3 propagation to the covisibility neighborhood + point re-mapping
+ fusion (:403-583), essential-graph optimization (src/Optimizer.cc:781),
and a global BA with staged write-back (:643-744).

The loop_detected flag consumed by the dense mapper mirrors the fork's
addition (reference: include/LoopClosing.h:83-86, set at
src/LoopClosing.cc:743).
"""

from __future__ import annotations

import contextlib
import os
from dataclasses import dataclass
from typing import List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SystemConfig
from ..geom import se3, sim3
from ..ops import matching
from ..optim import pose_graph, sim3_solver
from ..utils import profiling
from .mapstore import MapStore


@dataclass
class _PairSnapshot:
    """Copies of the map rows the Sim3 computation reads, taken under
    the map lock so the expensive RANSAC/optimization stages can run
    WITHOUT it (the reference likewise runs ComputeSim3 concurrently
    with LocalMapping, blocking only in CorrectLoop,
    src/LoopClosing.cc:403-427)."""

    kid: int
    cand: int
    obs2: np.ndarray         # loop-KF keypoint -> map point id
    has1: np.ndarray
    has2: np.ndarray
    desc1: np.ndarray
    desc2: np.ndarray
    level1: np.ndarray
    level2: np.ndarray
    xy1: np.ndarray
    xy2: np.ndarray
    Xc1_all: np.ndarray      # per-keypoint camera-frame point coords
    Xc2_all: np.ndarray
    min_dist1: np.ndarray
    max_dist1: np.ndarray
    min_dist2: np.ndarray
    max_dist2: np.ndarray


class LoopCloser:
    def __init__(self, cfg: SystemConfig, map_store: MapStore, place_db,
                 fix_scale: bool = True, run_global_ba: bool = True):
        self.cfg = cfg
        self.map = map_store
        self.db = place_db
        self.fix_scale = fix_scale
        self.run_global_ba_flag = run_global_ba
        self.background_gba = None   # set to a parallel.background.
                                     # BackgroundGBA to run GBA off-thread
        self.consistent_groups: List[Tuple[Set[int], int]] = []
        # (query kid, candidate covis group) of recently FAILED Sim3
        # attempts: each attempt costs seconds of loop-thread device
        # dispatches (r5: 23 attempts for 3 closures), and the same
        # candidate region re-fires on consecutive keyframes; back off
        # for a couple of keyframes before retrying the same region
        self._failed_sim3: List[Tuple[int, Set[int]]] = []
        self._empty_detect_rounds = 0
        self._last_periodic_gba_kid = 0
        self.last_loop_kf = 0
        self.loop_detected = False   # consumed by dense mapping rebuild
        self.n_loops_closed = 0
        # map lock for concurrent operation: the async pipeline sets this
        # to its map RLock. Held for detection (cheap BoW queries), the
        # input snapshot, and the correction write-back — NOT for the
        # Sim3 RANSAC / widening / optimization device programs.
        self.lock = contextlib.nullcontext()
        # silent-truncation counters (no-silent-caps rule): bumped when
        # the fixed Sim3 RANSAC/optimization pads drop matches
        self.n_ransac_pad_truncations = 0
        self.n_opt_pad_truncations = 0
        # map-transform listeners: called (under the map lock) with the
        # 4x4 world-space SE3 `A` that the tracker's neighborhood just
        # moved by (X_new = A @ X_old) whenever a loop correction or GBA
        # merge discontinuously moves the map. Consumers (the async
        # pipeline's device carry, the sync tracker's last-frame pose)
        # transform their cached poses Tcw_new = Tcw_old @ A^-1 so
        # tracking stays consistent with the corrected map — without
        # this the post-correction frame matches old-frame predictions
        # against new-frame points and tracking collapses (the
        # reference's Tracking keeps running on mLastFrame's stale pose
        # too, but its correction is mutex-blocking and its local points
        # move WITH the neighborhood, reference src/LoopClosing.cc:403).
        self.transform_listeners = []

    def _notify_transform(self, A: np.ndarray):
        if float(np.abs(A - np.eye(4)).max()) < 1e-9:
            return
        for fn in self.transform_listeners:
            try:
                fn(A)
            except Exception:  # pragma: no cover
                import traceback
                traceback.print_exc()

    def enable_background_gba(self):
        """Run post-loop global BA on a worker with staged write-back
        (reference: src/LoopClosing.cc:571-575). The map owner must call
        poll_background() regularly to merge finished results."""
        from ..parallel.background import BackgroundGBA

        self.background_gba = BackgroundGBA(self.cfg, self.map)
        self.background_gba.on_transform = self._notify_transform
        return self.background_gba

    def poll_background(self) -> bool:
        if self.background_gba is not None:
            return self.background_gba.poll()
        return False

    def prewarm(self) -> None:
        """Compile the smallest essential-graph bucket BEFORE any closure
        arrives — the jit compile that otherwise happens inside the
        lock-held correction write-back. Kept deliberately minimal (ONE
        bucket): each compile/load costs 7-20 s of 2-core host time that
        starves tracking during warm-up. Larger buckets are warmed
        incrementally as the map approaches them (maybe_prewarm, idle
        loop thread) and as a final guard right before a correction
        takes the lock (_warm_for_correction, lock-free)."""
        if os.environ.get("ORB_TPU_NO_PREWARM") == "1":
            return
        self._warm_pose_graph_bucket(64)

    _warmed_pg = None   # set of warmed (Vc, n_dev>1) keys

    def _warm_pose_graph_bucket(self, Vc: int) -> None:
        """Compile the pose-graph program for vertex bucket Vc (edge pad
        4*Vc, matching _optimize_essential_graph) — including the
        distributed variant when a device mesh is live (ADVICE r4: live
        closures on multi-device ran the un-prewarmed
        distributed_pose_graph)."""
        n_dev = len(jax.devices())
        key = (Vc, n_dev > 1)
        if self._warmed_pg is None:
            self._warmed_pg = set()
        if key in self._warmed_pg:
            return
        self._warmed_pg.add(key)
        E_pad = 4 * Vc
        R = jnp.tile(jnp.eye(3, dtype=jnp.float32), (Vc, 1, 1))
        t = jnp.zeros((Vc, 3), jnp.float32)
        s = jnp.ones(Vc, jnp.float32)
        ij = np.zeros((E_pad, 2), np.int32)
        ij[0] = (1, 0)   # one real edge keeps the solve well-posed
        Rm = jnp.tile(jnp.eye(3, dtype=jnp.float32), (E_pad, 1, 1))
        tm = jnp.zeros((E_pad, 3), jnp.float32)
        sm = jnp.ones(E_pad, jnp.float32)
        ev = np.zeros(E_pad, bool)
        ev[0] = True
        valid = np.zeros(Vc, bool)
        valid[:2] = True
        fixed = np.zeros(Vc, bool)
        fixed[0] = True
        poses = (R, t, s)
        if n_dev > 1:
            from jax.sharding import Mesh

            from ..parallel import dist_pose_graph

            mesh = Mesh(np.asarray(jax.devices()), ("data",))
            ij_s, meas_s, ev_s = dist_pose_graph.shard_edges(
                ij, (np.asarray(Rm), np.asarray(tm), np.asarray(sm)),
                ev, n_dev)
            res = dist_pose_graph.distributed_pose_graph(
                poses, jnp.asarray(ij_s),
                tuple(jnp.asarray(a) for a in meas_s), jnp.asarray(ev_s),
                jnp.asarray(valid), jnp.asarray(fixed), mesh, "data",
                fix_scale=self.fix_scale, iters=20)
        else:
            res = pose_graph.optimize_pose_graph(
                poses, jnp.asarray(ij), (Rm, tm, sm),
                jnp.asarray(ev), jnp.asarray(valid), jnp.asarray(fixed),
                None, fix_scale=self.fix_scale, iters=20)
        jax.block_until_ready(res.R)

    def maybe_prewarm(self) -> None:
        """Idle-time warming (called by the loop thread between queue
        polls, NEVER under the lock): as the live keyframe count
        approaches the next vertex bucket, compile it ahead of need."""
        if os.environ.get("ORB_TPU_NO_PREWARM") == "1":
            return
        n = self.map.n_keyframes()
        Vc = max(64, 1 << max(n - 1, 1).bit_length())
        self._warm_pose_graph_bucket(Vc)
        if n > 0.75 * Vc:
            self._warm_pose_graph_bucket(Vc * 2)

    def _warm_for_correction(self, kid: int, loop_points: np.ndarray
                             ) -> None:
        """Lock-free final guard before a correction takes the map lock:
        ensure every size bucket the lock-held write-back will hit is
        already compiled — the pose-graph bucket for the live KF count
        and the fuse bucket for the loop neighborhood's point count.
        Runs the real kernels on snapshot data and discards the results
        (a warm dispatch costs ~ms; a cold compile inside the lock cost
        up to 10 s of map-blocking time in r5 measurements)."""
        from . import mapping_kernels
        from .local_mapping import LocalMapper

        n = self.map.n_keyframes()
        self._warm_pose_graph_bucket(max(64, 1 << max(n - 1, 1)
                                         .bit_length()))
        if len(loop_points) == 0:
            return
        m = self.map
        fuser = LocalMapper(self.cfg, m)
        pts = loop_points[m.mp_exists[loop_points]]
        if len(pts) == 0:
            return
        # compile both the single-KF variant (widen) and the vmapped
        # batch variant (SearchAndFuse) at this candidate bucket
        d = fuser._fuse_into_dispatch(int(kid), pts)
        db = fuser._fuse_into_many_dispatch([int(kid)], pts)
        for dd in (d, db):
            if dd is not None:
                jax.block_until_ready(dd[2].ok)

    # ------------------------------------------------------------------

    def process_keyframe(self, kid: int):
        """Detect + close a loop for one keyframe. Lock discipline
        (reference: src/LoopClosing.cc:58-89 Run): detection and the
        input snapshot hold the map lock briefly; the expensive Sim3
        compute runs lock-free on the snapshot; the correction
        write-back re-takes the lock."""
        with self.lock:
            self.db.maybe_refresh()
            cands = self._detect_loop(kid)
            if len(cands) == 0:
                self._maybe_periodic_gba(kid)
        if len(cands) == 0:
            return
        ok = self._compute_sim3_and_correct(kid, cands)
        if ok:
            self.last_loop_kf = kid
            self.n_loops_closed += 1
            self.loop_detected = True

    def _maybe_periodic_gba(self, kid: int):
        """TPU-native drift control (see config.periodic_gba_kfs):
        re-launch the background global BA every N keyframes so global
        consistency is maintained continuously rather than only after a
        closure. Caller holds the map lock (launch snapshots the map);
        the worker runs off-thread and merges via the usual staged
        write-back + pose re-basing."""
        n = self.cfg.loop_closing.periodic_gba_kfs
        if (n <= 0 or self.background_gba is None
                or self.background_gba.running()
                or kid - self._last_periodic_gba_kid < n
                or self.map.n_keyframes() < 4):
            return
        with profiling.stage("loop_closing/periodic_gba_launch"):
            if self.background_gba.launch(iters=40):
                self._last_periodic_gba_kid = kid

    # ------------------------------------------------------------------

    def _detect_loop(self, kid: int) -> List[int]:
        """(reference: src/LoopClosing.cc:104-230)."""
        lcfg = self.cfg.loop_closing
        if self.map.n_keyframes() < lcfg.min_kfs_since_last_loop:
            return []
        if kid - self.last_loop_kf < lcfg.min_kfs_since_last_loop \
                and self.last_loop_kf > 0:
            return []
        min_score = self.db.min_score_vs_neighbors(kid)
        cands = self.db.detect_loop_candidates(kid, max(min_score, 0.01))
        if len(cands) > 0:
            # temporal gate: a loop is a REVISIT — candidates closer
            # than min_candidate_gap_frames are adjacent-segment
            # reconnections (covisibility exclusion misses them after a
            # recovery fragments the graph), not loops
            gap = self.map.kf_frame_id[kid] - self.map.kf_frame_id[cands]
            cands = cands[gap >= lcfg.min_candidate_gap_frames]
        if len(cands) == 0:
            # deliberate deviation from the reference (which clears the
            # consistency groups on any empty round,
            # src/LoopClosing.cc:224-228): at low keyframe density a
            # revisit window may span only ~4 keyframes, and a single
            # BoW dropout round would reset the 3-consecutive chain and
            # lose the loop. The chain survives exactly ONE empty round.
            if self._empty_detect_rounds == 0 and self.consistent_groups:
                self._empty_detect_rounds = 1
            else:
                self.consistent_groups = []
                self._empty_detect_rounds = 0
            return []
        self._empty_detect_rounds = 0

        # covisibility-consistency voting (:153-212)
        enough: List[int] = []
        new_groups: List[Tuple[Set[int], int]] = []
        for c in cands:
            group = set(self.map.covisible_keyframes(int(c)).tolist())
            group.add(int(c))
            best_count = 0
            matched_any = False
            for prev_set, count in self.consistent_groups:
                if group & prev_set:
                    matched_any = True
                    best_count = max(best_count, count + 1)
            new_groups.append((group, best_count if matched_any else 0))
            if best_count >= lcfg.covisibility_consistency_th:
                enough.append(int(c))
        self.consistent_groups = new_groups
        return enough

    # ------------------------------------------------------------------

    def _compute_sim3_and_correct(self, kid: int, cands: List[int]) -> bool:
        """(reference: src/LoopClosing.cc:232-401 + :403-583): BoW match →
        Sim3 RANSAC → SearchBySim3 match widening → Sim3 optimization →
        final projection widen with the loop neighborhood's points,
        accepted only at >= sim3_min_total_matches (40) total."""
        self._failed_sim3 = [(k, g) for k, g in self._failed_sim3
                             if kid - k <= 2]
        for cand in cands:
            cand_group = set(
                self.map.covisible_keyframes(int(cand)).tolist())
            cand_group.add(int(cand))
            if any(cand_group & g for _, g in self._failed_sim3):
                continue   # this region just failed; retry in >=2 KFs
            with self.lock:
                snap = self._snapshot_pair(kid, int(cand))
            with profiling.stage("loop_closing/sim3_compute"):
                hyp = self._compute_sim3(snap)
            if hyp is None:
                self._failed_sim3.append((kid, cand_group))
                continue
            S12, mkp, mmp = hyp
            # --- lock-free pre-correction phase: everything that does
            # NOT need write-consistency runs on snapshot-grade reads —
            # the final projection widen (a device dispatch + fetch,
            # formerly the bulk of the lock-held time) and the compile
            # warming of every size bucket the write-back will hit ---
            loop_points = self._loop_neighborhood_points(int(cand))
            with profiling.stage("loop_closing/warm_buckets"):
                try:
                    self._warm_for_correction(kid, loop_points)
                except Exception:  # pragma: no cover - warm is best-effort
                    import traceback
                    traceback.print_exc()
            alive = self.map.mp_exists[np.clip(mmp, 0, None)] & (mmp >= 0)
            mkp, mmp = mkp[alive], mmp[alive]
            with profiling.stage("loop_closing/widen"):
                mkp, mmp = self._widen_with_loop_points(
                    kid, int(cand), S12, loop_points, mkp, mmp)
            if len(mkp) < self.cfg.loop_closing.sim3_min_total_matches:
                continue
            # abort a stale background GBA BEFORE taking the map lock
            # (reference: src/LoopClosing.cc:409-427 sets mbStopGBA then
            # waits) — waiting under the lock stalled the supervisor for
            # up to the GBA chunk length
            if (self.run_global_ba_flag and self.background_gba is not None
                    and self.background_gba.running()):
                self.background_gba.abort()
                self.background_gba.wait(timeout=60.0)
            with self.lock:
                with profiling.stage("loop_closing/correct"):
                    if self._finalize_and_correct(kid, int(cand), S12,
                                                  loop_points, mkp, mmp):
                        return True
        return False

    def _snapshot_pair(self, kid: int, cand: int) -> _PairSnapshot:
        """Copy the rows the Sim3 compute reads (held lock: a few 100 KB
        of row gathers)."""
        m = self.map
        obs1 = m.kf_obs[kid].copy()
        obs2 = m.kf_obs[cand].copy()
        has1 = (obs1 >= 0) & m.mp_exists[np.clip(obs1, 0, None)]
        has2 = (obs2 >= 0) & m.mp_exists[np.clip(obs2, 0, None)]
        R1, t1 = m.kf_R[kid], m.kf_t[kid]
        R2, t2 = m.kf_R[cand], m.kf_t[cand]
        mid1 = np.clip(obs1, 0, None)
        mid2 = np.clip(obs2, 0, None)
        return _PairSnapshot(
            kid=kid, cand=cand, obs2=obs2, has1=has1, has2=has2,
            desc1=m.kf_desc[kid].copy(), desc2=m.kf_desc[cand].copy(),
            level1=m.kf_level[kid].copy(), level2=m.kf_level[cand].copy(),
            xy1=m.kf_xy[kid].copy(), xy2=m.kf_xy[cand].copy(),
            Xc1_all=(m.mp_pos[mid1] @ R1.T + t1).astype(np.float32),
            Xc2_all=(m.mp_pos[mid2] @ R2.T + t2).astype(np.float32),
            min_dist1=m.mp_min_dist[mid1].copy(),
            max_dist1=m.mp_max_dist[mid1].copy(),
            min_dist2=m.mp_min_dist[mid2].copy(),
            max_dist2=m.mp_max_dist[mid2].copy())

    # fixed device pads for the Sim3 stages; overflows are counted and
    # logged (no-silent-caps rule), never silently dropped
    SIM3_RANSAC_PAD = 256
    SIM3_OPT_PAD = 512

    def _compute_sim3(self, s: _PairSnapshot):
        """Lock-free Sim3 hypothesis computation over a `_PairSnapshot`.
        Returns (S12, mkp, mmp) — the optimized current→loop Sim3 plus
        the matched (current keypoint, loop map point) pairs — or None."""
        lcfg = self.cfg.loop_closing
        sigma2 = np.asarray(self.cfg.orb.level_sigma2, dtype=np.float32)
        kid, cand = s.kid, s.cand

        # descriptor match between map-point-bound keypoints
        gate = s.has1[:, None] & s.has2[None, :]
        # standalone dispatch with a host-built gate: Pallas
        # XOR+popcount path (ops/matching._use_pallas policy)
        res = matching.gated_nn(jnp.asarray(s.desc1), jnp.asarray(s.desc2),
                                jnp.asarray(gate),
                                max_dist=50.0, ratio=0.75,
                                standalone=True)
        keep = np.asarray(matching.resolve_duplicates(
            res.idx, res.dist, res.ok, self.map.N))
        rows = np.nonzero(keep)[0]
        if len(rows) < lcfg.sim3_min_bow_matches:
            return None
        cols = np.asarray(res.idx)[rows]

        N_pad = self.SIM3_RANSAC_PAD
        if len(rows) > N_pad:
            self.n_ransac_pad_truncations += 1
            profiling.PROFILER.add_sample(
                "loop_closing/sim3_ransac_pad_truncated",
                float(len(rows) - N_pad))
            import sys
            print(f"[loop_closing] Sim3 RANSAC pad truncation: "
                  f"{len(rows)} BoW matches > pad {N_pad} "
                  f"(KF {kid} vs {cand}); keeping the first {N_pad}",
                  file=sys.stderr)
        npts = min(len(rows), N_pad)
        rows_r, cols_r = rows[:npts], cols[:npts]
        X1p = np.zeros((N_pad, 3), np.float32)
        X2p = np.zeros((N_pad, 3), np.float32)
        s2_1 = np.ones(N_pad, np.float32)
        s2_2 = np.ones(N_pad, np.float32)
        valid = np.zeros(N_pad, bool)
        X1p[:npts] = s.Xc1_all[rows_r]
        X2p[:npts] = s.Xc2_all[cols_r]
        s2_1[:npts] = sigma2[s.level1[rows_r]]
        s2_2[:npts] = sigma2[s.level2[cols_r]]
        valid[:npts] = True

        rr = sim3_solver.sim3_ransac_jit(
            self.cfg.camera, jnp.asarray(X1p), jnp.asarray(X2p),
            jnp.asarray(s2_1), jnp.asarray(s2_2), jnp.asarray(valid),
            jax.random.PRNGKey(kid), 256, self.fix_scale,
            lcfg.sim3_ransac_min_inliers)
        if not bool(rr.ok):
            return None

        # --- SearchBySim3 widening (reference: src/LoopClosing.cc:324
        # + src/ORBmatcher.cc:1102-1326): mutual Sim3-guided projection
        # matches for keypoints outside the RANSAC-inlier set ---
        from . import mapping_kernels

        inl_mask = np.asarray(rr.inliers)[:npts]
        rows_i, cols_i = rows_r[inl_mask], cols_r[inl_mask]
        already1 = np.zeros(self.map.N, bool)
        already2 = np.zeros(self.map.N, bool)
        already1[rows_i] = True
        already2[cols_i] = True
        wid = mapping_kernels.search_by_sim3(
            self.cfg, jnp.asarray(np.asarray(rr.R)),
            jnp.asarray(np.asarray(rr.t)), jnp.asarray(np.asarray(rr.s)),
            jnp.asarray(s.Xc1_all), jnp.asarray(s.has1),
            jnp.asarray(s.desc1), jnp.asarray(s.level1),
            jnp.asarray(s.min_dist1), jnp.asarray(s.max_dist1),
            jnp.asarray(s.xy1), jnp.asarray(already1),
            jnp.asarray(s.Xc2_all), jnp.asarray(s.has2),
            jnp.asarray(s.desc2), jnp.asarray(s.level2),
            jnp.asarray(s.min_dist2), jnp.asarray(s.max_dist2),
            jnp.asarray(s.xy2), jnp.asarray(already2))
        w_ok, w_m12 = np.asarray(wid.ok), np.asarray(wid.match12)
        w_rows = np.nonzero(w_ok)[0]
        w_cols = w_m12[w_rows]

        # combined correspondence set → Sim3 optimization (reference
        # runs OptimizeSim3 over the widened vpMapPointMatches)
        a_rows = np.concatenate([rows_i, w_rows])
        a_cols = np.concatenate([cols_i, w_cols])
        P = self.SIM3_OPT_PAD
        if len(a_rows) > P:
            self.n_opt_pad_truncations += 1
            profiling.PROFILER.add_sample(
                "loop_closing/sim3_opt_pad_truncated",
                float(len(a_rows) - P))
            import sys
            print(f"[loop_closing] Sim3 optimization pad truncation: "
                  f"{len(a_rows)} widened matches > pad {P} "
                  f"(KF {kid} vs {cand}); keeping the first {P}",
                  file=sys.stderr)
        n_all = min(len(a_rows), P)
        a_rows, a_cols = a_rows[:n_all], a_cols[:n_all]
        X1o = np.zeros((P, 3), np.float32)
        X2o = np.zeros((P, 3), np.float32)
        uv1 = np.zeros((P, 2), np.float32)
        uv2 = np.zeros((P, 2), np.float32)
        is2_1 = np.ones(P, np.float32)
        is2_2 = np.ones(P, np.float32)
        v_all = np.zeros(P, bool)
        X1o[:n_all] = s.Xc1_all[a_rows]
        X2o[:n_all] = s.Xc2_all[a_cols]
        uv1[:n_all] = s.xy1[a_rows]
        uv2[:n_all] = s.xy2[a_cols]
        is2_1[:n_all] = 1.0 / sigma2[s.level1[a_rows]]
        is2_2[:n_all] = 1.0 / sigma2[s.level2[a_cols]]
        v_all[:n_all] = True
        so = sim3_solver.optimize_sim3_jit(
            self.cfg.camera, rr.R, rr.t, rr.s,
            jnp.asarray(X1o), jnp.asarray(X2o),
            jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.asarray(is2_1), jnp.asarray(is2_2),
            jnp.asarray(v_all), self.fix_scale)
        if int(so.n_inliers) < lcfg.sim3_min_opt_inliers:
            return None
        S12 = (np.asarray(so.R), np.asarray(so.t), float(so.s))

        # current-KF matched points after optimization (the
        # reference's mvpCurrentMatchedPoints): kp -> loop map point
        opt_inl = np.asarray(so.inliers)[:n_all]
        mkp = a_rows[opt_inl]
        mmp = s.obs2[a_cols[opt_inl]]
        return S12, mkp, mmp

    def _finalize_and_correct(self, kid: int, cand: int, S12,
                              loop_points: np.ndarray,
                              mkp: np.ndarray, mmp: np.ndarray) -> bool:
        """Under the map lock: revalidate the (lock-free computed)
        hypothesis + widened matches against the live map, re-apply the
        >= 40 total-matches gate (reference: src/LoopClosing.cc:340-395),
        then correct. Point-level staleness (merges/culls since the
        lock-free widen) is handled per pair inside _correct_loop."""
        m = self.map
        lcfg = self.cfg.loop_closing
        if not (m.kf_exists[kid] and m.kf_exists[cand]):
            return False
        alive = m.mp_exists[np.clip(mmp, 0, None)] & (mmp >= 0)
        mkp, mmp = mkp[alive], mmp[alive]
        if len(mkp) < lcfg.sim3_min_total_matches:
            return False
        if self.background_gba is not None:
            # a COMPLETED GBA staged on pre-correction poses must never
            # merge after this correction (it would undo it)
            self.background_gba.discard_staged()
        Tcw_old = m.kf_Tcw(kid)
        self._correct_loop(kid, cand, S12, loop_points, mkp, mmp)
        # announce the net world-space motion of the tracker's
        # neighborhood (Sim3 propagation + essential graph combined),
        # anchored at the current KF: X_new = A @ X_old
        self._notify_transform(m.kf_Twc(kid) @ Tcw_old)
        return True

    def _loop_neighborhood_points(self, loop_kf: int) -> np.ndarray:
        """Map points seen by the loop KF + its covisible neighbors
        (reference mvpLoopMapPoints, src/LoopClosing.cc:340-358)."""
        m = self.map
        hood = [loop_kf] + m.covisible_keyframes(loop_kf).tolist()
        pts = [m.kf_obs[i][m.kf_obs[i] >= 0] for i in hood]
        if not pts:
            return np.asarray([], dtype=np.int64)
        pts = np.unique(np.concatenate(pts))
        return pts[m.mp_exists[pts]]

    def _widen_with_loop_points(self, kid: int, loop_kf: int, S12,
                                loop_points: np.ndarray,
                                mkp: np.ndarray, mmp: np.ndarray):
        """SearchByProjection with Scw at th=10 (reference:
        src/LoopClosing.cc:376-386 + src/ORBmatcher.cc:290-403): project
        the loop neighborhood's points into the current KF with the
        corrected Sim3 and add matches on still-free keypoints."""
        from . import mapping_kernels

        m = self.map
        R12, t12, s12 = S12
        # Scw = S12 ∘ T_loop_w, normalized to SE3 (R, t/s) as the
        # reference decomposes Scw before projecting
        R_scw = R12 @ m.kf_R[loop_kf]
        t_scw = s12 * (R12 @ m.kf_t[loop_kf]) + t12
        R_n = R_scw.astype(np.float32)
        t_n = (t_scw / max(s12, 1e-12)).astype(np.float32)

        cand_pts = loop_points[~np.isin(loop_points, mmp)]
        if len(cand_pts) == 0:
            return mkp, mmp
        C = mapping_kernels.bucket_size(len(cand_pts))
        mids_p = np.zeros(C, dtype=np.int64)
        mids_p[:len(cand_pts)] = cand_pts
        pvalid = np.zeros(C, bool)
        pvalid[:len(cand_pts)] = True
        kp_free = m.kf_kp_valid[kid].copy()
        kp_free[mkp] = False
        res = mapping_kernels.fuse_match(
            self.cfg, jnp.asarray(R_n), jnp.asarray(t_n),
            jnp.asarray(m.mp_pos[mids_p]), jnp.asarray(m.mp_desc[mids_p]),
            jnp.asarray(m.mp_min_dist[mids_p]),
            jnp.asarray(m.mp_max_dist[mids_p]), jnp.asarray(pvalid),
            jnp.asarray(m.kf_xy[kid]), jnp.asarray(m.kf_level[kid]),
            jnp.asarray(kp_free), jnp.asarray(m.kf_desc[kid]), 10.0)
        ok = np.asarray(res.ok) & pvalid
        kp_new = np.asarray(res.kp_idx)[ok]
        mp_new = mids_p[ok]
        return (np.concatenate([mkp, kp_new]),
                np.concatenate([mmp, mp_new]))

    # ------------------------------------------------------------------

    def _correct_loop(self, kid: int, loop_kf: int, S12,
                      loop_points: Optional[np.ndarray] = None,
                      mkp: Optional[np.ndarray] = None,
                      mmp: Optional[np.ndarray] = None):
        """(reference: src/LoopClosing.cc:403-583). S12 maps loop-KF
        camera coords into current-KF camera coords. mkp/mmp are the
        matched (current-KF keypoint, loop map point) pairs from
        ComputeSim3's widening (mvpCurrentMatchedPoints)."""
        m = self.map
        R12, t12, s12 = S12

        # corrected pose of current KF: S_cw = S12 * S_loop_w.
        # Host numpy throughout this section: these are 3x3 composes in
        # a Python loop, and each jnp call was a device dispatch — the
        # propagation alone cost seconds of tunnel round trips under
        # the map lock.
        R_lw, t_lw = m.kf_R[loop_kf], m.kf_t[loop_kf]
        R_cw_corr = np.asarray(R12) @ R_lw
        t_cw_corr = float(s12) * (np.asarray(R12) @ t_lw) + np.asarray(t12)
        s_cw_corr = float(s12)

        # pre-correction pose snapshot: essential-graph edge measurements
        # must reflect the uncorrected odometry (reference NonCorrectedSim3,
        # src/LoopClosing.cc:445-470 + src/Optimizer.cc:849-947) — edges
        # measured across the corrected/uncorrected boundary with mixed
        # poses would encode the Sim3 discontinuity as a constraint
        R_pre = m.kf_R.copy()
        t_pre = m.kf_t.copy()

        # neighborhood of the current KF gets Sim3-propagated corrections
        neighborhood = [kid] + m.covisible_keyframes(kid).tolist()
        R_cw_old, t_cw_old = m.kf_R[kid].copy(), m.kf_t[kid].copy()
        corrected: dict = {}
        for i in neighborhood:
            R_iw, t_iw = m.kf_R[i], m.kf_t[i]
            # S_ic = T_iw * T_wc_old
            R_ic = R_iw @ R_cw_old.T
            t_ic = t_iw - R_ic @ t_cw_old
            # corrected S_iw = S_ic * S_cw_corr (host numpy)
            Rn = R_ic @ R_cw_corr
            tn = R_ic @ t_cw_corr + t_ic
            corrected[int(i)] = (Rn.astype(np.float32),
                                 tn.astype(np.float32), float(s_cw_corr))

        # re-map the neighborhood's points: X' = S_wi_new(S_iw_old(X))
        moved = np.zeros(m.M, dtype=bool)
        for i, (Rn, tn, sn) in corrected.items():
            obs = m.kf_obs[i]
            mids = np.unique(obs[obs >= 0])
            mids = mids[m.mp_exists[mids] & ~moved[mids]]
            if len(mids) == 0:
                continue
            Xc = m.mp_pos[mids] @ m.kf_R[i].T + m.kf_t[i]
            # S_iw^-1 = (R^T, -R^T t / s, 1/s) applied on host
            si = 1.0 / max(sn, 1e-12)
            Xw = si * ((Xc - tn) @ Rn)
            m.mp_pos[mids] = Xw.astype(np.float32)
            m.mark_points_dirty(mids)
            moved[mids] = True

        # write corrected SE3 poses (t/s recovery, reference :497-504)
        for i, (Rn, tn, sn) in corrected.items():
            m.set_kf_pose(i, Rn, tn / sn)

        from .local_mapping import LocalMapper

        fuser = LocalMapper(self.cfg, m)

        # direct fusion of the Sim3-matched pairs: the loop point replaces
        # the current KF's binding (reference: src/LoopClosing.cc:516-533,
        # pCurMP->Replace(pLoopMP)). All merges apply in ONE table pass.
        if mkp is not None and len(mkp) > 0:
            merges = []
            binds = []
            for k, lp in zip(mkp, mmp):
                k, lp = int(k), int(lp)
                if not m.mp_exists[lp]:
                    continue
                bound = int(m.kf_obs[kid, k])
                if bound == lp:
                    continue
                if bound >= 0 and m.mp_exists[bound]:
                    merges.append((bound, lp))
                else:
                    binds.append((k, lp))
            if merges:
                m.replace_points_bulk(merges)
            for k, lp in binds:
                if m.mp_exists[lp] and not (m.kf_obs[kid] == lp).any():
                    m.kf_obs[kid, k] = lp
            m._refresh_obs_row(kid)

        # fuse loop points into the corrected neighborhood (SearchAndFuse,
        # reference: src/LoopClosing.cc:585-611) — one batched dispatch
        # over all corrected KFs instead of a round trip per KF
        with profiling.stage("loop_closing/fuse"):
            if loop_points is None:
                loop_points = self._loop_neighborhood_points(loop_kf)
            if len(loop_points) > 0:
                loop_points = loop_points[m.mp_exists[loop_points]]
                fuser.fuse_into_many(list(corrected), loop_points)
            for i in corrected:
                m.update_connections(int(i))
            m.update_connections(loop_kf)
        self.map.loop_edges.append((kid, loop_kf))

        with profiling.stage("loop_closing/essential"):
            self._optimize_essential_graph(kid, loop_kf, corrected,
                                           R_pre, t_pre)
        if self.run_global_ba_flag:
            if self.background_gba is not None:
                # a stale run was aborted lock-free before the correction
                # (the _compute_sim3_and_correct pre-abort); this is only
                # a short safety net
                with profiling.stage("loop_closing/gba_launch"):
                    if self.background_gba.running():
                        self.background_gba.abort()
                        self.background_gba.wait(timeout=5.0)
                    # 60 iters with the tightened chi2 plateau: the
                    # reference's 20 g2o iterations underconverged here
                    # (3.1 cm vs the 1.5 cm optimum, r5 diagnostics);
                    # the worker is backgrounded and abortable, so the
                    # extra iterations cost no map-blocking time
                    self.background_gba.launch(iters=60)
            else:
                self._global_bundle_adjustment(kid)
        m.version += 1

    # ------------------------------------------------------------------

    def _optimize_essential_graph(self, kid: int, loop_kf: int, corrected,
                                  R_pre=None, t_pre=None):
        """(reference: src/Optimizer.cc:781-1044). Edges: spanning tree +
        covisibility >= 100 + loop edges; loop KF held fixed.

        Spanning-tree/covisibility edges are measured with the
        PRE-correction poses (the reference's NonCorrectedSim3 map); loop
        edges with the corrected ones — the optimizer then spreads the
        loop discrepancy around the cycle instead of being told the
        corrected configuration is already consistent."""
        m = self.map
        lcfg = self.cfg.loop_closing
        kfs = m.keyframe_ids()
        V = m.K
        if R_pre is None:
            R_pre, t_pre = m.kf_R, m.kf_t

        edges = []
        meas = []

        def rel_se3(i, j, Rsrc, tsrc):
            """S_ji = T_jw * T_wi as a Sim3 with s=1."""
            Rj, tj = Rsrc[j], tsrc[j]
            Ri, ti = Rsrc[i], tsrc[i]
            Rji = Rj @ Ri.T
            tji = tj - Rji @ ti
            return Rji, tji, 1.0

        seen = set()
        for i in kfs:
            i = int(i)
            p = int(m.parent[i])
            if p >= 0 and m.kf_exists[p]:
                edges.append((i, p))
                meas.append(rel_se3(i, p, R_pre, t_pre))
                seen.add((min(i, p), max(i, p)))
        for (a, b) in m.loop_edges:
            if m.kf_exists[a] and m.kf_exists[b] and \
                    (min(a, b), max(a, b)) not in seen:
                edges.append((a, b))
                # loop constraint: measured with the CORRECTED poses
                meas.append(rel_se3(a, b, m.kf_R, m.kf_t))
                seen.add((min(a, b), max(a, b)))
        strong = np.argwhere(m.covis >= lcfg.essential_graph_min_weight)
        for a, b in strong:
            a, b = int(a), int(b)
            if a < b and m.kf_exists[a] and m.kf_exists[b] \
                    and (a, b) not in seen:
                edges.append((a, b))
                meas.append(rel_se3(a, b, R_pre, t_pre))
                seen.add((a, b))
        if not edges:
            return

        # COMPACT to live keyframes: the dense [7V, 7V] normal-equation
        # solve scales cubically in the vertex count, and running it at
        # MAP CAPACITY (e.g. 1024 slots for 54 live KFs) cost ~14 s per
        # closure. Live ids remap to a power-of-two-padded dense range
        # (one compile per size bucket).
        slot_of = np.full(V, -1, dtype=np.int32)
        slot_of[kfs] = np.arange(len(kfs), dtype=np.int32)
        Vc = max(64, 1 << (len(kfs) - 1).bit_length())

        E = len(edges)
        # E_pad keyed to Vc (not to E): one compiled program per vertex
        # bucket instead of a (Vc, E) grid — each extra bucket costs a
        # 7-20 s compile/load on the loop thread (r5: the 3-bucket
        # prewarm burned 100-200 s of 2-core host time while tracking
        # warmed up). 4*Vc covers spanning tree + loop + >=100-weight
        # covis edges in practice; larger E falls back to its own pow2.
        E_pad = max(4 * Vc, 1 << (E - 1).bit_length())
        ij = np.zeros((E_pad, 2), np.int32)
        Rm = np.tile(np.eye(3, dtype=np.float32), (E_pad, 1, 1))
        tm = np.zeros((E_pad, 3), np.float32)
        sm = np.ones(E_pad, np.float32)
        ev = np.zeros(E_pad, bool)
        for e, ((i, j), (Rji, tji, sji)) in enumerate(zip(edges, meas)):
            ij[e] = (slot_of[i], slot_of[j])
            Rm[e], tm[e], sm[e] = Rji, tji, sji
            ev[e] = True

        vertex_valid = np.zeros(Vc, bool)
        vertex_valid[:len(kfs)] = True
        fixed = np.zeros(Vc, bool)
        fixed[slot_of[loop_kf]] = True
        Rv = np.tile(np.eye(3, dtype=np.float32), (Vc, 1, 1))
        tv = np.zeros((Vc, 3), np.float32)
        Rv[:len(kfs)] = m.kf_R[kfs]
        tv[:len(kfs)] = m.kf_t[kfs]

        # snapshot old poses for landmark correction
        R_old = m.kf_R.copy()
        t_old = m.kf_t.copy()

        # past a size threshold, shard the edge set over the device mesh
        # (trajectory-axis parallelism; VERDICT r2 item 3: the LIVE
        # essential graph rides the distributed backend, not only the
        # scaling benchmark)
        n_dev = len(jax.devices())
        poses = (jnp.asarray(Rv), jnp.asarray(tv),
                 jnp.ones(Vc, jnp.float32))
        if n_dev > 1 and E >= 64:
            from jax.sharding import Mesh

            from ..parallel import dist_pose_graph

            mesh = Mesh(np.asarray(jax.devices()), ("data",))
            ij_s, meas_s, ev_s = dist_pose_graph.shard_edges(
                ij, (Rm, tm, sm), ev, n_dev)
            res = dist_pose_graph.distributed_pose_graph(
                poses, jnp.asarray(ij_s),
                tuple(jnp.asarray(a) for a in meas_s), jnp.asarray(ev_s),
                jnp.asarray(vertex_valid), jnp.asarray(fixed), mesh,
                "data", fix_scale=self.fix_scale, iters=20)
        else:
            res = pose_graph.optimize_pose_graph(
                poses,
                jnp.asarray(ij), (jnp.asarray(Rm), jnp.asarray(tm),
                                  jnp.asarray(sm)),
                jnp.asarray(ev), jnp.asarray(vertex_valid),
                jnp.asarray(fixed),
                None, fix_scale=self.fix_scale, iters=20)

        R_new = np.asarray(res.R)
        t_new = np.asarray(res.t)
        s_new = np.asarray(res.s)
        for k in kfs:
            k = int(k)
            c = slot_of[k]
            m.set_kf_pose(k, R_new[c], t_new[c] / max(s_new[c], 1e-9))

        # landmark correction through each point's reference KF (:963-1010)
        mids = m.point_ids()
        ref = m.mp_first_kf[mids]
        ok = (ref >= 0) & m.kf_exists[np.clip(ref, 0, None)]
        mids, ref = mids[ok], ref[ok]
        Xc = np.einsum("pij,pj->pi", R_old[ref],
                       m.mp_pos[mids]) + t_old[ref]
        Rwc = np.swapaxes(m.kf_R[ref], 1, 2)
        # X' = R_new^T (s^{-1} Xc - t') with corrected SE3 pose (s folded)
        Xw = np.einsum("pij,pj->pi", Rwc, Xc - m.kf_t[ref])
        m.mp_pos[mids] = Xw
        m.mark_points_dirty(mids)

    # ------------------------------------------------------------------

    def _global_bundle_adjustment(self, kid: int):
        """Synchronous global BA (reference: src/LoopClosing.cc:643-744
        RunGlobalBundleAdjustment). The background variant with staged
        write-back + spanning-tree correction of concurrently added KFs
        lives in parallel/background.BackgroundGBA (enable via
        enable_background_gba)."""
        from ..optim.global_ba import run_global_ba

        run_global_ba(self.cfg, self.map, fixed_kf=self.map.kf_origin,
                      iters=20)
