"""Asynchronous RGB-D tracking pipeline: device-resident recurrence +
background supervision.

The reference overlaps Tracking / LocalMapping / LoopClosing as CPU
threads over a mutexed map (reference: src/System.cc:107-133). The
TPU-native equivalent re-draws the boundary around the *device*:

  * The per-frame tracking recurrence (pose, velocity, last-frame
    features, keypoint->point bindings) lives ON the TPU as a jit carry
    (pipeline_step.TrackCarry). The dispatch thread streams frames into
    `fused_frame_step` without ever blocking on a result — essential on
    networked-TPU deployments where one device->host fetch costs more
    than a whole frame period.
  * A fetcher thread downloads the packed per-frame results in batches
    (one RTT amortizes over several frames).
  * A supervisor thread owns the host map (single writer — the lock-free
    analogue of the reference's map mutex): it consumes results with a
    small lag, maintains visibility counters and the trajectory log, runs
    the keyframe policy, local mapping and loop closing, and *publishes*
    immutable device snapshots (map-point columns + local-candidate set)
    that the dispatch thread picks up at the next frame. Publication is
    a single reference assignment — torn reads are impossible, giving the
    safe async semantics the reference builds from interlock flags
    (src/LocalMapping.cc:555-630, SetNotErase src/KeyFrame.cc:469-489).
  * Failure (tracking lost) is detected with ~pipeline-depth frames of
    lag; the pipeline then drains, rolls back to the buffered frames and
    runs the synchronous relocalization path before resuming.
"""

from __future__ import annotations

import collections
import queue
import threading
import time as _time
from dataclasses import dataclass
from typing import Deque, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from ..utils import transfer


from ..config import SystemConfig
from ..utils import profiling
from . import frame as frame_mod
from . import pipeline_step
from .pipeline_step import PACK_SCALARS, TrackCarry
from .tracking import LOCAL_POINT_CAP, FrameLog, Tracker, TrackingState


@dataclass
class Published:
    """Immutable device snapshot published by the supervisor; swapped
    atomically (reference analogue: the map state guarded by
    mMutexMapUpdate, src/Tracking.cc:463)."""

    cols: Dict[str, jnp.ndarray]
    mp_alive: jnp.ndarray       # [M] bool
    mids_np: np.ndarray         # [<=C] selected local candidate ids
    mids_dev: jnp.ndarray       # [C] int32 padded
    mp_valid_dev: jnp.ndarray   # [C] bool
    version: int
    # reference KF id + its pose AT PUBLISH TIME: frame poses computed
    # against this snapshot log their Tcr against THIS pose, so the
    # relative transform is internally consistent. Composing the device
    # pose with the ref-KF pose read at supervision time instead mixes
    # two map epochs (local BA / GBA merges move keyframes in between)
    # — measured as per-frame error growing with |Tcr| up to ~12 cm
    # RMSE on the 1000-frame orbit while KF ATE was 1.3 cm.
    ref_kf: int = -1
    ref_Tcw: Optional[np.ndarray] = None


@dataclass
class _InFlight:
    fid: int
    ts: float
    packed: jnp.ndarray
    frame: frame_mod.Frame
    published: Published
    rgb: Optional[np.ndarray]
    deltas_applied: int = 0   # map-transform deltas folded into the
                              # carry when this frame dispatched


class AsyncRGBDPipeline:
    """Pipelined steady-state tracking around a synchronous Tracker.

    The sync Tracker handles initialization, relocalization and any
    fallback; once tracking is OK with a velocity estimate, frames flow
    through the device recurrence. Results are processed by the
    supervisor with `depth`-frames of lag."""

    def __init__(self, cfg: SystemConfig, tracker: Tracker,
                 local_mapper=None, dense_mapper=None,
                 max_in_flight: int = 16, ring: int = 64):
        self.cfg = cfg
        self.tracker = tracker
        self.map = tracker.map
        self.local_mapper = local_mapper
        self.dense_mapper = dense_mapper
        self.max_in_flight = max_in_flight

        self._carry: Optional[TrackCarry] = None
        self._published: Optional[Published] = None
        self._mode = "sync"
        self._failed_at: Optional[int] = None
        self._ring: Deque[Tuple[int, float, np.ndarray, np.ndarray,
                                Optional[np.ndarray]]] = \
            collections.deque(maxlen=ring)
        self._inflight_sem = threading.Semaphore(max_in_flight)

        self._fetch_q: "queue.Queue[Optional[_InFlight]]" = queue.Queue()
        self._result_q: "queue.Queue" = queue.Queue()
        # uploader thread: image conversion + device_put run OFF the
        # dispatch critical path. Inline upload serialized ~6 ms/frame
        # with device compute (probe: step-only 11.9 ms vs upload+step
        # 18.0 ms — a 55 fps ceiling before any host work); a one-frame
        # lookahead lets frame t+1's host->device transfer ride the
        # tunnel while frame t's compute and supervision proceed.
        self._upload_q: "queue.Queue" = queue.Queue(maxsize=2)
        self._uploaded_q: "queue.Queue" = queue.Queue(maxsize=2)
        self._pending_uploads = 0   # main-thread-only counter
        self._uploader = threading.Thread(target=self._upload_loop,
                                          daemon=True)
        # host-map ownership; reentrant: recovery holds it across the
        # sync replay and re-enters via _enter_async/_publish
        self._map_lock = threading.RLock()
        self._results_since_refresh = 0
        self._recovered_to = -1
        self._pending_results = 0
        self._pending_cv = threading.Condition()
        self._running = True
        self._fetcher = threading.Thread(target=self._fetch_loop,
                                         daemon=True)
        self._supervisor = threading.Thread(target=self._supervise_loop,
                                            daemon=True)
        # local mapping on its own thread (the reference's LocalMapping
        # thread, src/System.cc:109-110); shares the map via the RLock
        # with device round trips outside lock-held sections
        self._kf_q: "queue.Queue" = queue.Queue()
        self._mapper = threading.Thread(target=self._mapper_loop,
                                        daemon=True)
        if self.local_mapper is not None:
            self.local_mapper.lock = self._map_lock
        # loop closing on its OWN thread (reference: src/LoopClosing.cc
        # :58-102 — a dedicated thread + KF queue so triangulation/fuse/
        # local BA keep running while a closure computes its Sim3; the
        # lock is held only for detection, the input snapshot, and the
        # correction write-back)
        self._loop_q: Optional["queue.Queue"] = None
        self._loop_thread = None
        self._force_republish = False
        # map-transform deltas (loop corrections / GBA merges): each
        # entry is (map_version_after, A_inv 4x4). The device carry and
        # every in-flight result pose get re-based Tcw' = Tcw @ A_inv so
        # tracking stays consistent when the map moves under it — the
        # loop discrepancy is exactly the accumulated drift, which far
        # exceeds the projection search window, so an uncorrected carry
        # loses tracking right after every closure.
        self._map_deltas: List[Tuple[int, np.ndarray]] = []
        self._carry_deltas_applied = 0
        self._notok_streak = 0
        lc = getattr(self.local_mapper, "loop_closer", None)
        if lc is not None:
            lc.lock = self._map_lock
            lc.transform_listeners.append(self._on_map_transform)
            self._loop_q = queue.Queue()
            self.local_mapper.loop_queue = self._loop_q
            self._loop_thread = threading.Thread(target=self._loop_loop,
                                                 daemon=True)
        # continuous-refinement thread: local BA decoupled from the KF
        # queue. The mapper's effort ladder used to shed BA under
        # backlog and mid-run drift exploded whenever host scheduling
        # starved it (r5: 2-33 cm run-to-run variance); BA is mostly
        # device-wait (GIL released), so a dedicated loop sustains
        # refinement at whatever rate the device allows regardless of
        # bookkeeping load.
        self._ba_thread = None
        if self.local_mapper is not None:
            self.local_mapper.external_ba = True
            self._ba_thread = threading.Thread(target=self._ba_loop,
                                               daemon=True)
        self._fetcher.start()
        self._supervisor.start()
        self._uploader.start()
        self._mapper.start()
        if self._loop_thread is not None:
            self._loop_thread.start()
        if self._ba_thread is not None:
            self._ba_thread.start()

    # ------------------------------------------------------------------
    # main-thread API
    # ------------------------------------------------------------------

    def submit(self, ts: float, gray: np.ndarray, depth: np.ndarray,
               rgb: Optional[np.ndarray] = None) -> None:
        """Feed one frame. Non-blocking in steady state (the per-frame
        pose is recovered from the trajectory log; the reference's
        blocking TrackRGBD return value has no lag-free async analogue)."""
        fid = self.tracker.frame_id + 1
        self._ring.append((fid, ts, gray, depth, rgb))

        if self._failed_at is not None:
            self._drain_pending_uploads()
            self._recover()
            if self._recovered_to >= fid:
                # the recovery replay already tracked this frame through
                # the synchronous state machine — tracking it again would
                # duplicate its FrameLog entry and double-step frame_id
                return

        if self._mode == "sync":
            with self._map_lock:
                self.tracker.track_rgbd(ts, gray, depth, rgb=rgb)
            if (self.tracker.state == TrackingState.OK
                    and self.tracker.velocity is not None):
                self._enter_async()
            return

        # --- async steady state: hand the frame to the uploader, then
        # dispatch the OLDEST uploaded frame (one-frame lookahead so the
        # host->device transfer overlaps device compute; dispatch order
        # is preserved because both queues are FIFO and only this thread
        # pushes/pops) ---
        self.tracker.frame_id = fid
        th = 3.0
        if fid - self.tracker.last_reloc_frame_id < int(self.cfg.camera.fps):
            th = 5.0
        min_inl = self.cfg.tracking.local_map_min_inliers
        if fid - self.tracker.last_reloc_frame_id < int(self.cfg.camera.fps):
            min_inl = self.cfg.tracking.local_map_min_inliers_after_reloc
        self._upload_q.put((fid, ts, gray, depth, rgb, th, min_inl))
        self._pending_uploads += 1
        if self._pending_uploads > 1:
            self._dispatch_one()

    def _upload_loop(self):
        """Uploader thread: image conversion + device_put. Upload diet:
        u8 gray + u16 depth (the dataset's native format, e.g. 0.2 mm
        quantization for TUM) is 40% of the f32 bytes — upload bandwidth
        serializes with device compute on networked TPUs. Depths beyond
        the u16 range are INVALIDATED (0 = no depth), not saturated: a
        clipped far point would otherwise get a corrupted pseudo-stereo
        constraint."""
        qf = float(self.cfg.depth_map_factor) or 5000.0
        while self._running:
            item = self._upload_q.get()
            if item is None:
                return
            fid, ts, gray, depth, rgb, th, min_inl = item
            try:
                with profiling.stage("pipeline/upload"):
                    d = np.asarray(depth) * qf
                    depth_u16 = np.where(d > 65535.0, 0.0,
                                         d).astype(np.uint16)
                    dev = jax.device_put(
                        (np.asarray(gray, dtype=np.uint8), depth_u16,
                         np.asarray([th, float(min_inl), 1.0, 1.0 / qf],
                                    dtype=np.float32)))
            except Exception as e:  # pragma: no cover - surfaced at
                self._uploaded_q.put((fid, ts, e, rgb))  # dispatch time
                continue
            self._uploaded_q.put((fid, ts, dev, rgb))

    def _drain_pending_uploads(self):
        """Discard queued-but-undispatched frames (main thread): they
        remain in the ring, and the recovery replay re-tracks them
        through the synchronous state machine."""
        while self._pending_uploads > 0:
            self._uploaded_q.get()
            self._pending_uploads -= 1

    def _dispatch_one(self) -> None:
        """Dispatch the oldest uploaded frame into the device recurrence
        (main thread)."""
        fid, ts, dev, rgb = self._uploaded_q.get()
        self._pending_uploads -= 1
        if isinstance(dev, Exception):
            raise dev
        gray_u8, depth_f32, ctrl = dev
        with profiling.stage("pipeline/backpressure"):
            self._inflight_sem.acquire()
        pub = self._published
        self._apply_pending_carry_deltas(pub)
        with profiling.stage("pipeline/dispatch"):
            self._carry, packed, f = pipeline_step.fused_frame_step(
                self.cfg, self._carry, gray_u8, depth_f32, ctrl,
                pub.cols["mp_pos"], pub.cols["mp_desc"], pub.cols["mp_normal"],
                pub.cols["mp_min_dist"], pub.cols["mp_max_dist"],
                pub.mp_alive, pub.mids_dev, pub.mp_valid_dev,
                pub.cols["mp_redirect"])
        # start the device->host copy of the packed result NOW: the copy
        # overlaps with later frames' compute and the fetcher's blocking
        # materialize becomes a short wait instead of a full tunnel RTT
        # (~70 ms per batch measured, the end-to-end fps ceiling)
        if hasattr(packed, "copy_to_host_async"):
            packed.copy_to_host_async()
        # ONE async device->host copy per frame — everything the
        # supervisor needs (pose, bindings, xy/ur/inv_sigma2 for the
        # refinement log) rides inside `packed`; keyframe promotion
        # (~1 frame in 10) does ONE batched fetch. The r4/r5 pattern of
        # 10 copy_to_host_async calls per frame flipped the
        # networked-TPU tunnel into a sticky degraded mode (~25 ms RTT,
        # measured) and was the real end-to-end fps cap.
        with self._pending_cv:
            self._pending_results += 1
        self._fetch_q.put(_InFlight(fid=fid, ts=ts, packed=packed, frame=f,
                                    published=pub, rgb=rgb,
                                    deltas_applied=
                                    self._carry_deltas_applied))

    def flush(self) -> None:
        """Drain all in-flight frames, their supervision, any queued
        local-mapping work, and any queued loop-closing work."""
        while self._pending_uploads > 0:
            self._dispatch_one()
        with self._pending_cv:
            while self._pending_results > 0:
                self._pending_cv.wait(timeout=0.1)
        self._kf_q.join()
        if self._loop_q is not None:
            self._loop_q.join()
        if self._failed_at is not None:
            self._recover()

    def shutdown(self) -> None:
        self.flush()
        self._running = False
        self._fetch_q.put(None)
        self._result_q.put(None)
        self._kf_q.put(None)
        self._upload_q.put(None)
        if self._loop_q is not None:
            self._loop_q.put(None)
        self._uploader.join(timeout=5.0)
        self._fetcher.join(timeout=5.0)
        self._supervisor.join(timeout=5.0)
        self._mapper.join(timeout=5.0)
        if self._loop_thread is not None:
            self._loop_thread.join(timeout=5.0)
        if self._ba_thread is not None:
            self._ba_thread.join(timeout=10.0)

    # ------------------------------------------------------------------
    # map-transform re-basing (loop corrections / GBA merges)
    # ------------------------------------------------------------------

    def _on_map_transform(self, A: np.ndarray):
        """Called under the map lock when the tracker's neighborhood
        moves by world transform A (X_new = A @ X_old). Registers the
        delta for the device carry (applied at the next dispatch once
        the published snapshot includes the move) and for in-flight
        results (applied at supervision). The sync tracker's cached
        poses are re-based by its own listener
        (Tracker.apply_map_transform, registered by SLAMSystem)."""
        Ainv = np.linalg.inv(A).astype(np.float32)
        self._map_deltas.append((self.map.version, Ainv))

    def _apply_pending_carry_deltas(self, pub: Published):
        """Dispatch-thread: fold every delta already visible in the
        published snapshot into the device carry (tiny async device
        composes; never blocks)."""
        while (self._carry_deltas_applied < len(self._map_deltas)
               and self._map_deltas[self._carry_deltas_applied][0]
               <= pub.version):
            _, Ainv = self._map_deltas[self._carry_deltas_applied]
            c = self._carry
            Ra = jnp.asarray(Ainv[:3, :3])
            ta = jnp.asarray(Ainv[:3, 3])
            self._carry = c._replace(R=c.R @ Ra, t=c.R @ ta + c.t)
            self._carry_deltas_applied += 1

    # ------------------------------------------------------------------
    # mode transitions
    # ------------------------------------------------------------------

    def _enter_async(self):
        t = self.tracker
        lf = t.last_frame
        cur_obs = np.where(
            (t.last_obs >= 0) & self.map.mp_exists[np.clip(t.last_obs, 0,
                                                           None)],
            t.last_obs, -1).astype(np.int32)
        Rv, tv = t.velocity
        self._carry = TrackCarry(
            R=jnp.asarray(np.asarray(lf.R, dtype=np.float32)),
            t=jnp.asarray(np.asarray(lf.t, dtype=np.float32)),
            Rv=jnp.asarray(Rv.astype(np.float32)),
            tv=jnp.asarray(tv.astype(np.float32)),
            cur_obs=jnp.asarray(cur_obs),
            last_xy=lf.xy, last_ur=lf.ur, last_depth=lf.depth,
            last_desc=lf.desc, last_level=lf.level, last_angle=lf.angle,
            last_valid=lf.valid, ok=jnp.asarray(True))
        # the fresh carry comes from the (re-based) sync tracker state:
        # every registered delta is already folded in
        self._carry_deltas_applied = len(self._map_deltas)
        with self._map_lock:
            self._publish(t.last_obs)
        self._mode = "async"

    def _publish(self, bindings: Optional[np.ndarray]):
        """Build + swap the published device snapshot (supervisor/main
        thread under map lock)."""
        with profiling.stage("pipeline/publish"):
            self._publish_inner(bindings)

    def _publish_inner(self, bindings: Optional[np.ndarray]):
        with profiling.stage("pipeline/publish_cols"):
            cols = dict(self.map.device_point_arrays())
            mp_alive = jnp.asarray(self.map.mp_exists)
        if bindings is None:
            bindings = np.full(self.map.N, -1, dtype=np.int64)
        with profiling.stage("pipeline/publish_cand"):
            cand = self._publish_cand(bindings)
        return self._publish_finish(cols, mp_alive, cand)

    def _publish_cand(self, bindings):
        return self.tracker._local_candidates(
            np.where(self.map.mp_exists[np.clip(bindings, 0, None)]
                     & (bindings >= 0), bindings, -1))

    def _publish_finish(self, cols, mp_alive, cand):
        if cand is None:
            # no covisibility votes available: fall back to the current
            # ref KF's neighborhood (points the tracker can actually
            # see), not the arbitrary lowest-id live points
            ref = self.tracker.ref_kf
            if ref >= 0 and self.map.kf_exists[ref]:
                hood = [ref] + self.map.covisible_keyframes(
                    ref, top_n=10).tolist()
                mids = np.nonzero(self.map.observed_mask(
                    np.asarray(hood)))[0][:LOCAL_POINT_CAP]
            else:
                mids = np.nonzero(self.map.mp_exists)[0][:LOCAL_POINT_CAP]
            pad = LOCAL_POINT_CAP - len(mids)
            mids_p = np.concatenate([mids, np.zeros(pad, dtype=np.int64)])
            valid = np.concatenate([np.ones(len(mids), bool),
                                    np.zeros(pad, bool)])
        else:
            mids, mids_p, valid = cand
            # in the pipelined path, already-bound points must stay
            # matchable: bindings lag the current frame
            valid = np.concatenate([np.ones(len(mids), bool),
                                    np.zeros(LOCAL_POINT_CAP - len(mids),
                                             bool)])
        with profiling.stage("pipeline/publish_put"):
            mids_dev, valid_dev = jax.device_put(
                (mids_p.astype(np.int32), valid))
        ref = self.tracker.ref_kf
        self._published = Published(
            cols=cols, mp_alive=mp_alive, mids_np=mids,
            mids_dev=mids_dev, mp_valid_dev=valid_dev,
            version=self.map.version,
            ref_kf=ref,
            ref_Tcw=(self.map.kf_Tcw(ref) if ref >= 0
                     and self.map.kf_exists[ref] else None))

    def _recover(self):
        """Roll back to synchronous tracking after an async failure:
        frames from the failure on are marked lost; relocalization runs
        on the most recent buffered frame (reference behavior: LOST state
        -> Relocalization, src/Tracking.cc:1645-1806)."""
        # drain in-flight results first — everything after the failure is
        # untrusted and gets logged lost by _process_result
        with self._pending_cv:
            while self._pending_results > 0:
                self._pending_cv.wait(timeout=0.1)
        failed = self._failed_at
        self._failed_at = None
        self._mode = "sync"
        t = self.tracker
        with self._map_lock:
            t.state = TrackingState.LOST
            t.velocity = None
            # re-track the buffered frames from the failure point through
            # the synchronous state machine (reloc / re-init / ref-KF
            # fallbacks all available there), then resume the pipeline
            start = max(failed if failed is not None else 0,
                        self._recovered_to + 1)
            buffered = [fr for fr in self._ring if fr[0] >= start]
            replay = buffered[-8:]
            if len(buffered) > len(replay):
                # no-silent-caps: frames beyond the replay window stay
                # logged as lost instead of being re-tracked
                profiling.PROFILER.add_sample(
                    "pipeline/replay_cap_dropped",
                    float(len(buffered) - len(replay)))
                import sys
                print(f"[pipeline] recovery replay cap: "
                      f"{len(buffered)} buffered frames > 8; the first "
                      f"{len(buffered) - len(replay)} remain lost",
                      file=sys.stderr)
        # per-frame locking: a replay spans seconds of sync tracking
        # (device round trips); holding the map lock across it starved
        # the mapper/loop threads exactly when the backlog most needed
        # draining (measured 17 s lockwait spikes)
        for fid, ts, gray, depth, rgb in replay:
            with self._map_lock:
                self._recovered_to = fid
                t.frame_id = fid - 1
                t.track_rgbd(ts, gray, depth, rgb=rgb)
        with self._map_lock:
            if (t.state == TrackingState.OK
                    and t.velocity is not None):
                self._enter_async()

    # ------------------------------------------------------------------
    # fetcher thread: batched device->host downloads
    # ------------------------------------------------------------------

    def _fetch_loop(self):
        while self._running:
            item = self._fetch_q.get()
            if item is None:
                return
            batch = [item]
            while True:
                try:
                    nxt = self._fetch_q.get_nowait()
                except queue.Empty:
                    break
                if nxt is None:
                    self._running = False
                    break
                batch.append(nxt)
            with profiling.stage("pipeline/fetch"):
                arrs = transfer.fetch([b.packed for b in batch])
            profiling.PROFILER.add_sample("pipeline/fetch_batchsz",
                                          float(len(batch)))
            for b, a in zip(batch, arrs):
                self._result_q.put((b, a))

    # ------------------------------------------------------------------
    # mapper thread: the reference's LocalMapping loop
    # ------------------------------------------------------------------

    def _mapper_loop(self):
        while self._running:
            kid = self._kf_q.get()
            if kid is None:
                return
            try:
                if self.local_mapper is not None:
                    # backlog-shedding (reference InterruptBA analogue):
                    # with keyframes queuing faster than full mapping
                    # drains, drop to bookkeeping-only so the queue
                    # clears and tracking keeps getting fresh keyframes
                    q = self._kf_q.unfinished_tasks   # incl. this one
                    effort = ("full" if q <= 1 else
                              "medium" if q <= 3 else "light")
                    self.local_mapper.process_keyframe(kid, effort=effort)
            except Exception:  # pragma: no cover
                import traceback
                traceback.print_exc()
            finally:
                self._kf_q.task_done()

    # ------------------------------------------------------------------
    # continuous-refinement thread: local BA at device rate
    # ------------------------------------------------------------------

    def _ba_loop(self):
        while self._running:
            try:
                m = self.map
                if m.n_keyframes() < 3:
                    _time.sleep(0.1)
                    continue
                live = m.keyframe_ids()
                kid = int(live[np.argmax(m.kf_frame_id[live])])
                n0 = len(self._map_deltas)
                with profiling.stage("pipeline/continuous_ba"):
                    self.local_mapper._local_bundle_adjustment(
                        kid, discard_if=lambda:
                        len(self._map_deltas) > n0)
            except Exception:  # pragma: no cover
                import traceback
                traceback.print_exc()
                _time.sleep(0.5)
            _time.sleep(0.02)

    # ------------------------------------------------------------------
    # loop-closing thread: the reference's LoopClosing loop (:58-102)
    # ------------------------------------------------------------------

    def _loop_loop(self):
        lc = self.local_mapper.loop_closer
        try:
            # compile the essential-graph buckets before any closure
            # arrives: the one jit compile that would otherwise happen
            # inside the lock-held correction write-back
            with profiling.stage("loop_closing/prewarm"):
                lc.prewarm()
        except Exception:  # pragma: no cover - warm-up is best-effort
            import traceback
            traceback.print_exc()
        while self._running:
            try:
                kid = self._loop_q.get(timeout=2.0)
            except queue.Empty:
                # idle: warm the next essential-graph size bucket ahead
                # of need (compiles must never land inside the lock-held
                # correction; see LoopCloser.maybe_prewarm)
                try:
                    lc.maybe_prewarm()
                except Exception:  # pragma: no cover
                    pass
                continue
            if kid is None:
                return
            try:
                before = lc.n_loops_closed
                with profiling.stage("loop_closing"):
                    lc.process_keyframe(kid)
                if lc.n_loops_closed > before:
                    # the map moved under the tracker: force an immediate
                    # snapshot republish (the periodic throttle would let
                    # the tracker match a pre-correction snapshot for up
                    # to 15 frames)
                    self._force_republish = True
            except Exception:  # pragma: no cover
                import traceback
                traceback.print_exc()
            finally:
                self._loop_q.task_done()

    # ------------------------------------------------------------------
    # supervisor thread: result consumption + keyframe policy
    # ------------------------------------------------------------------

    def _supervise_loop(self):
        while self._running:
            item = self._result_q.get()
            if item is None:
                return
            inflight, packed = item
            try:
                with profiling.stage("pipeline/supervise"):
                    with self._map_lock:
                        self._process_result(inflight, packed)
            except Exception:  # pragma: no cover - supervisor must survive
                import traceback
                traceback.print_exc()
            finally:
                # release the in-flight slot only AFTER supervision: the
                # slot count then bounds SNAPSHOT STALENESS (dispatch can
                # never run more than max_in_flight frames ahead of the
                # published map). Releasing at fetch time (r3) let the
                # supervisor fall arbitrarily behind, and the tracker
                # quietly matched against seconds-old candidate sets —
                # fatal on rotation-heavy trajectories.
                self._inflight_sem.release()
                with self._pending_cv:
                    self._pending_results -= 1
                    self._pending_cv.notify_all()

    def _process_result(self, inflight: _InFlight, packed: np.ndarray):
        t = self.tracker
        # merge any finished background global BA (staged write-back,
        # reference: src/LoopClosing.cc:643-744) — we own the map here.
        # The republish happens at the END of this supervision step with
        # the frame's REAL bindings: publishing with none (r4 behavior)
        # degraded the local-candidate set to the arbitrary
        # most-observed fallback and the next frames drifted ~15 cm
        # until the throttled refresh caught up.
        lc = getattr(self.local_mapper, "loop_closer", None)
        if lc is not None and lc.poll_background():
            self._force_republish = True
        n_mm, n_inl_mm, n_inl_final = packed[0], packed[1], packed[2]
        close_tracked, close_untracked = int(packed[3]), int(packed[4])
        ok = packed[5] > 0.5
        N = self.map.N
        S = PACK_SCALARS
        R = packed[S:S + 9].reshape(3, 3).astype(np.float32)
        tt = packed[S + 9:S + 12].astype(np.float32)
        # the raw device pose is consistent with the dispatched
        # snapshot's map epoch; keep it for snapshot-relative logging
        R_snap, tt_snap = R, tt
        # re-base to the CURRENT map frame: deltas registered after this
        # frame dispatched (loop correction / GBA merge) moved the map.
        # Used for everything that must live in the current epoch
        # (async_pose truncation anchor, keyframe creation).
        for _, Ainv in self._map_deltas[inflight.deltas_applied:]:
            R, tt = R @ Ainv[:3, :3], R @ Ainv[:3, 3] + tt
        cur_obs = packed[S + 12:S + 12 + N].astype(np.int64)
        visible = packed[S + 12 + N:S + 12 + N + LOCAL_POINT_CAP] > 0.5
        base = S + 12 + N + LOCAL_POINT_CAP
        f_xy = packed[base:base + 2 * N].reshape(N, 2)
        f_ur = packed[base + 2 * N:base + 3 * N]
        f_is2 = packed[base + 3 * N:base + 4 * N]

        if self._failed_at is not None and inflight.fid > self._failed_at:
            ok = False   # everything after a failure is untrusted
        if not ok:
            # grace window: a brief matching dropout (motion blur, a
            # texture-poor wall) often recovers by itself — the device
            # carry freezes its pose and the in-program 2x-window retry
            # re-acquires within a few frames. Declaring failure
            # immediately cost a 3-8 s pipeline drain + sync replay and
            # corrupted ~20 frames of trajectory per event.
            if self._failed_at is None:
                self._notok_streak += 1
                if self._notok_streak > 3:
                    self._failed_at = inflight.fid
                    t.failure_ts.append(float(inflight.ts))
            # log as lost; pose withheld
            t.logs.append(FrameLog(timestamp=inflight.ts,
                                   ref_kf=t.ref_kf,
                                   Tcr=np.eye(4, dtype=np.float32),
                                   lost=True))
            return
        self._notok_streak = 0

        # visibility / found counters (reference: Tracking.cc:1470-1505)
        mids_pub = inflight.published.mids_np
        vis = visible[:len(mids_pub)]
        self.map.mp_visible[mids_pub[vis]] += 1
        alive_obs = cur_obs[(cur_obs >= 0)]
        alive_obs = alive_obs[self.map.mp_exists[alive_obs]]
        self.map.mp_found[alive_obs] += 1
        t.matches_inliers = int(n_inl_final)

        # latest supervised pose: candidate frustum truncation anchors
        # here (tracking.Tracker._local_candidates)
        t.async_pose = (R, tt)
        # trajectory log: Tcr against the ref-KF pose FROM THE SNAPSHOT
        # this frame was computed against (same map epoch — see
        # Published.ref_Tcw). Falls back to the live ref KF when the
        # snapshot predates the first keyframe.
        Tcw = np.eye(4, dtype=np.float32)
        pub = inflight.published
        if pub.ref_Tcw is not None:
            Tcw[:3, :3] = R_snap
            Tcw[:3, 3] = tt_snap
            ref, Trw = pub.ref_kf, pub.ref_Tcw
        else:
            Tcw[:3, :3] = R
            Tcw[:3, 3] = tt
            ref, Trw = t.ref_kf, self.map.kf_Tcw(t.ref_kf)
        fake_cur = np.where(self.map.mp_exists[np.clip(cur_obs, 0, None)]
                            & (cur_obs >= 0), cur_obs, -1)
        from .tracking import obs_snapshot
        t.logs.append(FrameLog(
            timestamp=inflight.ts, ref_kf=ref,
            Tcr=Tcw @ np.linalg.inv(Trw), lost=False,
            # binding snapshot for the final trajectory refinement
            # (keypoint xy/ur/inv_sigma2 ride inside `packed`)
            obs=obs_snapshot(fake_cur, f_xy, f_ur, f_is2)))

        # keyframe policy (reference: src/Tracking.cc:1261-1358), with the
        # reference's local-mapping backpressure (:1340-1350): while the
        # mapper is behind (results queued up), defer keyframe insertion
        # unless the hard c1a timeout forces one
        # mapping backpressure (reference: Tracking.cc:1340-1350): the
        # reference does NOT wait for LocalMapping to go idle — it
        # interrupts the local BA and inserts unless the queue is
        # already long (mlNewKeyFrames < 3 for stereo/RGB-D). Gating on
        # full idleness starved keyframe insertion whenever per-KF
        # mapping spans several frame periods (tunnel RTTs), which let
        # the published candidates go stale and collapsed tracking on
        # rotation-heavy trajectories
        # KF CREATION must outpace the mapper: the supervisor's insert +
        # depth-point creation + publish is what keeps the tracker's
        # candidate set fresh; triangulation/fuse/BA are asynchronous
        # refinements, and the mapper loop sheds them under backlog.
        # Only a pathological backlog defers creation.
        mapper_busy = self._kf_q.unfinished_tasks > 30
        c1a_force = (inflight.fid - t.last_frame_id_of_kf
                     >= t.max_frames_between_kf)
        if (not t.only_tracking
                and (not mapper_busy or c1a_force)
                and t._need_new_keyframe(
                    inflight.frame, fake_cur,
                    (close_tracked, close_untracked),
                    fid=inflight.fid)):
            with profiling.stage("pipeline/create_kf"):
                self._create_keyframe(inflight, R, tt, fake_cur)
            self._publish(fake_cur)
            self._results_since_refresh = 0
        else:
            self._results_since_refresh += 1
            # periodic candidate refresh: covisibility voting with lag.
            # Deliberately NOT triggered on every map-version bump — the
            # mapper thread bumps the version continuously while working
            # a keyframe, and republishing each time turns one KF into a
            # storm of ~25 ms publishes that starves the supervisor
            # (measured 91 publishes / 118 frames before the throttle)
            # while the mapper thread is actively working a keyframe,
            # defer the periodic refresh (both contend for the map lock
            # and, on small hosts, the same cores) — with a safety valve
            # so candidates can never go more than ~15 frames stale.
            # A loop-closure correction BYPASSES the throttle: the loop
            # thread raises _force_republish and the very next result
            # republishes, so the tracker never matches a pre-correction
            # snapshot for more than ~1 frame
            if (self._force_republish
                    or (self._results_since_refresh >= 5
                        and (self._kf_q.unfinished_tasks == 0
                             or self._results_since_refresh >= 15))):
                self._force_republish = False
                self._publish(fake_cur)
                self._results_since_refresh = 0

    def _create_keyframe(self, inflight: _InFlight, R, tt,
                         cur_obs: np.ndarray):
        """Download the frame once, insert KF + depth points, run local
        mapping (reference: src/Tracking.cc:1360-1445 + LocalMapping)."""
        t = self.tracker
        f = inflight.frame
        with profiling.stage("pipeline/create_kf_fetch"):
            host = transfer.fetch((f.xy, f.ur, f.depth, f.desc, f.level,
                                   f.angle, f.valid, f.inv_sigma2,
                                   f.response))
        hf = frame_mod.Frame(
            xy=host[0], ur=host[1], depth=host[2], desc=host[3],
            level=host[4], angle=host[5], valid=host[6],
            inv_sigma2=host[7], response=host[8], R=R, t=tt)
        # create points for ALL valid-depth free keypoints, not only the
        # close band: the reference leaves far points to LocalMapping's
        # triangulation, which lands before the next frame on its CPU —
        # here the mapper's output lags by the queue depth (tunnel RTTs),
        # and rotation into new territory starves tracking while it
        # waits. RGB-D depth is metric at all ranges; far points carry
        # the same per-level sigma weighting.
        obs = t._create_points_from_depth(
            hf, cur_obs, max_new=self.map.N)
        kid = self.map.add_keyframe(hf, inflight.ts, inflight.fid, obs)
        t._finish_new_points(kid, obs)
        t.ref_kf = kid
        t.last_kf_id = kid
        t.last_frame_id_of_kf = inflight.fid
        if self.local_mapper is not None:
            self._kf_q.put(kid)   # hand to the mapper thread
        if self.dense_mapper is not None and inflight.rgb is not None:
            # dense mapping needs the full depth image: recover it from
            # the frame ring buffer by frame id
            for rfid, _, _, rdepth, _ in self._ring:
                if rfid == inflight.fid:
                    self.dense_mapper.insert_keyframe(kid, inflight.rgb,
                                                      rdepth)
                    break
