"""In-process pub/sub message bus + map-streaming nodes.

Replaces the reference's ROS topic IPC for the 2D-grid pipeline:
`ros_mono_pub.cc` publishes the current frame's tracked map points on
`pts_and_pose` and, on loop closure, every keyframe's points + pose on
`all_kf_and_pts` (reference: Examples/ROS/ORB_SLAM2/src/ros_mono_pub.cc:
94-96, pubParams); `ros_mono_sub.cc` subscribes and integrates them into
a `nav_msgs::OccupancyGrid` with Bresenham ray counting and a full grid
rebuild when a loop-closure batch arrives (reference:
Examples/ROS/ORB_SLAM2/src/ros_mono_sub.cc:58-74).

TPU-native redesign: topics are bounded in-process queues carrying numpy
payloads (the host-side analogue of ROS messages — the numeric work per
message is a batched Bresenham pass through the native C++ runtime or
numpy, not per-point callbacks). The same node API runs the nodes either
synchronously (deterministic tests) or each on its own thread.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import numpy as np


class Topic:
    """Bounded fan-out queue: one publisher, many subscribers."""

    def __init__(self, name: str, maxsize: int = 64):
        self.name = name
        self.maxsize = maxsize
        self._subs: List["queue.Queue"] = []
        self._lock = threading.Lock()

    def subscribe(self) -> "queue.Queue":
        q: "queue.Queue" = queue.Queue(maxsize=self.maxsize)
        with self._lock:
            self._subs.append(q)
        return q

    def publish(self, msg) -> None:
        with self._lock:
            subs = list(self._subs)
        for q in subs:
            try:
                q.put_nowait(msg)
            except queue.Full:  # drop-oldest backpressure
                try:
                    q.get_nowait()
                except queue.Empty:
                    pass
                q.put_nowait(msg)


class MessageBus:
    """Named topics (the ROS master equivalent, minus the network)."""

    def __init__(self):
        self._topics: Dict[str, Topic] = {}
        self._lock = threading.Lock()

    def topic(self, name: str, maxsize: int = 64) -> Topic:
        with self._lock:
            if name not in self._topics:
                self._topics[name] = Topic(name, maxsize=maxsize)
            return self._topics[name]


@dataclass
class PtsAndPose:
    """Per-frame message: camera pose + the map points the frame tracks
    (payload of `pts_and_pose`, ros_mono_pub.cc publishLoop)."""

    frame_id: int
    timestamp: float
    Twc: np.ndarray              # [4, 4] camera-to-world
    points: np.ndarray           # [P, 3] tracked map points (world)


@dataclass
class AllKfAndPts:
    """Loop-closure rebuild message: every KF pose + its points
    (payload of `all_kf_and_pts`)."""

    n_keyframes: int
    Twc: List[np.ndarray] = field(default_factory=list)
    points: List[np.ndarray] = field(default_factory=list)


class MapPointPublisher:
    """Publisher node: call `update(system)` once per tracked frame.

    Mirrors ros_mono_pub.cc: publishes PtsAndPose every `every_n`-th
    frame, and an AllKfAndPts full-map snapshot when the loop closer
    reports a correction (so subscribers can rebuild from re-optimized
    keyframe poses).
    """

    def __init__(self, bus: MessageBus, every_n: int = 1):
        self.pts_topic = bus.topic("pts_and_pose")
        self.all_topic = bus.topic("all_kf_and_pts", maxsize=4)
        self.every_n = max(1, every_n)
        self._n = 0
        self._loops_seen = 0

    def update(self, system) -> None:
        tracker = system.tracker
        m = system.map
        self._n += 1
        f = tracker.last_frame
        if f is None or tracker.last_obs is None:
            return
        if self._n % self.every_n == 0:
            obs = tracker.last_obs
            mp = obs[(obs >= 0)]
            mp = mp[m.mp_exists[mp]]
            pts = m.mp_pos[mp] if len(mp) else np.zeros((0, 3), np.float32)
            R, t = np.asarray(f.R), np.asarray(f.t)
            Twc = np.eye(4, dtype=np.float32)
            Twc[:3, :3] = R.T
            Twc[:3, 3] = -R.T @ t
            self.pts_topic.publish(PtsAndPose(
                frame_id=tracker.frame_id, timestamp=0.0, Twc=Twc,
                points=pts.copy()))
        lc = system.loop_closer
        n_loops = getattr(lc, "n_loops_closed", 0) if lc is not None else 0
        if lc is not None and n_loops > self._loops_seen:
            self._loops_seen = n_loops
            self.all_topic.publish(self._snapshot(m))

    @staticmethod
    def _snapshot(m) -> AllKfAndPts:
        msg = AllKfAndPts(n_keyframes=0)
        for kid in m.keyframe_ids():
            kid = int(kid)
            obs = m.kf_obs[kid]
            mp = obs[obs >= 0]
            mp = mp[m.mp_exists[mp]]
            msg.Twc.append(m.kf_Twc(kid))
            msg.points.append(m.mp_pos[mp].copy())
            msg.n_keyframes += 1
        return msg


class Grid2DBuilderNode:
    """Subscriber node: integrates map-point messages into a 2D
    occupancy grid (ros_mono_sub.cc semantics — incremental Bresenham
    counting per frame, full rebuild on a loop-closure snapshot).
    """

    def __init__(self, bus: MessageBus, grid_factory: Callable[[], "object"]):
        self._pts_q = bus.topic("pts_and_pose").subscribe()
        self._all_q = bus.topic("all_kf_and_pts", maxsize=4).subscribe()
        self._grid_factory = grid_factory
        self.grid = grid_factory()
        self.n_msgs = 0
        self.n_rebuilds = 0

    def spin_once(self, timeout: Optional[float] = None) -> bool:
        """Process at most one message per topic; returns True if any
        message was handled."""
        handled = False
        try:
            msg = self._all_q.get_nowait()
            self._rebuild(msg)
            handled = True
        except queue.Empty:
            pass
        try:
            msg = (self._pts_q.get(timeout=timeout) if timeout
                   else self._pts_q.get_nowait())
            self._integrate(msg.Twc, msg.points)
            self.n_msgs += 1
            handled = True
        except queue.Empty:
            pass
        return handled

    def drain(self) -> int:
        n = 0
        while self.spin_once():
            n += 1
        return n

    def _integrate(self, Twc: np.ndarray, points: np.ndarray) -> None:
        if len(points) == 0:
            return
        origin = np.asarray([Twc[0, 3], Twc[2, 3]])
        self.grid.insert_rays(origin, points[:, [0, 2]])

    def _rebuild(self, msg: AllKfAndPts) -> None:
        self.grid = self._grid_factory()
        for Twc, pts in zip(msg.Twc, msg.points):
            self._integrate(Twc, pts)
        self.n_rebuilds += 1


class NodeRunner:
    """Runs a subscriber node on its own thread (the multi-process ROS
    graph collapsed to host threads; device work stays batched)."""

    def __init__(self, node, poll_s: float = 0.005):
        self.node = node
        self._poll = poll_s
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def start(self) -> "NodeRunner":
        self._thread.start()
        return self

    def _run(self):
        while not self._stop.is_set():
            if not self.node.spin_once(timeout=self._poll):
                self._stop.wait(self._poll)

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=5.0)
        self.node.drain()
