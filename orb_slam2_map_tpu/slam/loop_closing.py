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

from typing import List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SystemConfig
from ..geom import se3, sim3
from ..ops import matching
from ..optim import pose_graph, sim3_solver
from .mapstore import MapStore


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
        self.last_loop_kf = 0
        self.loop_detected = False   # consumed by dense mapping rebuild
        self.n_loops_closed = 0

    def enable_background_gba(self):
        """Run post-loop global BA on a worker with staged write-back
        (reference: src/LoopClosing.cc:571-575). The map owner must call
        poll_background() regularly to merge finished results."""
        from ..parallel.background import BackgroundGBA

        self.background_gba = BackgroundGBA(self.cfg, self.map)
        return self.background_gba

    def poll_background(self) -> bool:
        if self.background_gba is not None:
            return self.background_gba.poll()
        return False

    # ------------------------------------------------------------------

    def process_keyframe(self, kid: int):
        self.db.maybe_refresh()
        cands = self._detect_loop(kid)
        if len(cands) == 0:
            return
        ok = self._compute_sim3_and_correct(kid, cands)
        if ok:
            self.last_loop_kf = kid
            self.n_loops_closed += 1
            self.loop_detected = True

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
        if len(cands) == 0:
            self.consistent_groups = []
            return []

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
        """(reference: src/LoopClosing.cc:232-401 + :403-583)."""
        lcfg = self.cfg.loop_closing
        m = self.map
        sigma2 = np.asarray(self.cfg.orb.level_sigma2, dtype=np.float32)

        for cand in cands:
            # descriptor match between map-point-bound keypoints
            obs1 = m.kf_obs[kid]
            obs2 = m.kf_obs[cand]
            has1 = (obs1 >= 0) & m.mp_exists[np.clip(obs1, 0, None)]
            has2 = (obs2 >= 0) & m.mp_exists[np.clip(obs2, 0, None)]
            gate = has1[:, None] & has2[None, :]
            dmat = matching.hamming_matrix(jnp.asarray(m.kf_desc[kid]),
                                           jnp.asarray(m.kf_desc[cand]))
            res = matching.masked_nn(dmat, jnp.asarray(gate),
                                     max_dist=50.0, ratio=0.75)
            keep = np.asarray(matching.resolve_duplicates(
                res.idx, res.dist, res.ok, m.N))
            rows = np.nonzero(keep)[0]
            if len(rows) < lcfg.sim3_min_bow_matches:
                continue
            cols = np.asarray(res.idx)[rows]

            # camera-frame coordinates of the associated map points
            mids1 = obs1[rows]
            mids2 = obs2[cols]
            X1w = m.mp_pos[mids1]
            X2w = m.mp_pos[mids2]
            R1, t1 = m.kf_R[kid], m.kf_t[kid]
            R2, t2 = m.kf_R[cand], m.kf_t[cand]
            X1c = X1w @ R1.T + t1
            X2c = X2w @ R2.T + t2

            N_pad = 256
            npts = min(len(rows), N_pad)
            X1p = np.zeros((N_pad, 3), np.float32)
            X2p = np.zeros((N_pad, 3), np.float32)
            s2_1 = np.ones(N_pad, np.float32)
            s2_2 = np.ones(N_pad, np.float32)
            valid = np.zeros(N_pad, bool)
            X1p[:npts] = X1c[:npts]
            X2p[:npts] = X2c[:npts]
            s2_1[:npts] = sigma2[m.kf_level[kid][rows[:npts]]]
            s2_2[:npts] = sigma2[m.kf_level[cand][cols[:npts]]]
            valid[:npts] = True

            rr = sim3_solver.sim3_ransac_jit(
                self.cfg.camera, jnp.asarray(X1p), jnp.asarray(X2p),
                jnp.asarray(s2_1), jnp.asarray(s2_2), jnp.asarray(valid),
                jax.random.PRNGKey(kid), 256, self.fix_scale,
                lcfg.sim3_ransac_min_inliers)
            if not bool(rr.ok):
                continue

            uv1 = np.zeros((N_pad, 2), np.float32)
            uv2 = np.zeros((N_pad, 2), np.float32)
            uv1[:npts] = m.kf_xy[kid][rows[:npts]]
            uv2[:npts] = m.kf_xy[cand][cols[:npts]]
            so = sim3_solver.optimize_sim3_jit(
                self.cfg.camera, rr.R, rr.t, rr.s,
                jnp.asarray(X1p), jnp.asarray(X2p),
                jnp.asarray(uv1), jnp.asarray(uv2),
                jnp.asarray(1.0 / s2_1), jnp.asarray(1.0 / s2_2),
                jnp.asarray(valid & np.asarray(rr.inliers)),
                self.fix_scale)
            if int(so.n_inliers) < lcfg.sim3_min_opt_inliers:
                continue

            self._correct_loop(kid, cand,
                               (np.asarray(so.R), np.asarray(so.t),
                                float(so.s)))
            return True
        return False

    # ------------------------------------------------------------------

    def _correct_loop(self, kid: int, loop_kf: int, S12):
        """(reference: src/LoopClosing.cc:403-583). S12 maps loop-KF
        camera coords into current-KF camera coords."""
        m = self.map
        R12, t12, s12 = S12

        # corrected pose of current KF: S_cw = S12 * S_loop_w
        R_lw, t_lw = m.kf_R[loop_kf], m.kf_t[loop_kf]
        R_cw_corr, t_cw_corr, s_cw_corr = sim3.compose(
            jnp.asarray(R12), jnp.asarray(t12), jnp.asarray(s12),
            jnp.asarray(R_lw), jnp.asarray(t_lw), jnp.asarray(1.0))
        R_cw_corr = np.asarray(R_cw_corr)
        t_cw_corr = np.asarray(t_cw_corr)
        s_cw_corr = float(s_cw_corr)

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
            # corrected S_iw = S_ic * S_cw_corr
            Rn, tn, sn = sim3.compose(
                jnp.asarray(R_ic), jnp.asarray(t_ic), jnp.asarray(1.0),
                jnp.asarray(R_cw_corr), jnp.asarray(t_cw_corr),
                jnp.asarray(s_cw_corr))
            corrected[int(i)] = (np.asarray(Rn), np.asarray(tn), float(sn))

        # re-map the neighborhood's points: X' = S_wi_new(S_iw_old(X))
        moved = np.zeros(m.M, dtype=bool)
        for i, (Rn, tn, sn) in corrected.items():
            obs = m.kf_obs[i]
            mids = np.unique(obs[obs >= 0])
            mids = mids[m.mp_exists[mids] & ~moved[mids]]
            if len(mids) == 0:
                continue
            Xc = m.mp_pos[mids] @ m.kf_R[i].T + m.kf_t[i]
            Rni, tni, sni = sim3.inverse(jnp.asarray(Rn), jnp.asarray(tn),
                                         jnp.asarray(sn))
            Xw = np.asarray(sim3.act(Rni, tni, sni, jnp.asarray(Xc)))
            m.mp_pos[mids] = Xw
            moved[mids] = True

        # write corrected SE3 poses (t/s recovery, reference :497-504)
        for i, (Rn, tn, sn) in corrected.items():
            m.set_kf_pose(i, Rn, tn / sn)

        # fuse loop points into the corrected neighborhood
        loop_hood = [loop_kf] + m.covisible_keyframes(loop_kf).tolist()
        loop_points = []
        for i in loop_hood:
            o = m.kf_obs[i]
            loop_points.append(o[o >= 0])
        if loop_points:
            loop_points = np.unique(np.concatenate(loop_points))
            loop_points = loop_points[m.mp_exists[loop_points]]
            from .local_mapping import LocalMapper

            fuser = LocalMapper(self.cfg, m)
            for i in corrected:
                fuser._fuse_into(int(i), loop_points)
        for i in corrected:
            m.update_connections(int(i))
        m.update_connections(loop_kf)
        self.map.loop_edges.append((kid, loop_kf))

        self._optimize_essential_graph(kid, loop_kf, corrected,
                                       R_pre, t_pre)
        if self.run_global_ba_flag:
            if self.background_gba is not None:
                # abort a stale run (reference: src/LoopClosing.cc:409-427)
                # and launch on the corrected map; results merge later via
                # poll_background()
                if self.background_gba.running():
                    self.background_gba.abort()
                    self.background_gba.wait(timeout=30.0)
                self.background_gba.launch(iters=20)
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

        E = len(edges)
        E_pad = max(64, 1 << (E - 1).bit_length())
        ij = np.zeros((E_pad, 2), np.int32)
        Rm = np.tile(np.eye(3, dtype=np.float32), (E_pad, 1, 1))
        tm = np.zeros((E_pad, 3), np.float32)
        sm = np.ones(E_pad, np.float32)
        ev = np.zeros(E_pad, bool)
        for e, ((i, j), (Rji, tji, sji)) in enumerate(zip(edges, meas)):
            ij[e] = (i, j)
            Rm[e], tm[e], sm[e] = Rji, tji, sji
            ev[e] = True

        vertex_valid = m.kf_exists.copy()
        fixed = np.zeros(V, bool)
        fixed[loop_kf] = True

        # snapshot old poses for landmark correction
        R_old = m.kf_R.copy()
        t_old = m.kf_t.copy()

        res = pose_graph.optimize_pose_graph(
            (jnp.asarray(m.kf_R), jnp.asarray(m.kf_t),
             jnp.ones(V, jnp.float32)),
            jnp.asarray(ij), (jnp.asarray(Rm), jnp.asarray(tm),
                              jnp.asarray(sm)),
            jnp.asarray(ev), jnp.asarray(vertex_valid), jnp.asarray(fixed),
            None, fix_scale=self.fix_scale, iters=12)

        R_new = np.asarray(res.R)
        t_new = np.asarray(res.t)
        s_new = np.asarray(res.s)
        for k in kfs:
            k = int(k)
            m.set_kf_pose(k, R_new[k], t_new[k] / max(s_new[k], 1e-9))

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
