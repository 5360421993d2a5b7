"""Binary map checkpoint: save AND load.

Replaces Map::Save (reference: src/Map.cc:123-249 — points, keyframes
with keypoints + descriptors + point bindings, spanning-tree parents,
covisibility weights) and implements the load/resume path the reference
declares but never implemented (reference: include/System.h:114-116
"TODO: Load the map"). Format: a single compressed npz of the SoA arrays
— self-describing, versioned, loads in one shot.
"""

from __future__ import annotations

import numpy as np

from ..slam.mapstore import MapStore

FORMAT_VERSION = 1


def save_map(path: str, m: MapStore) -> None:
    np.savez_compressed(
        path,
        format_version=FORMAT_VERSION,
        kf_exists=m.kf_exists, kf_R=m.kf_R, kf_t=m.kf_t,
        kf_timestamp=m.kf_timestamp, kf_frame_id=m.kf_frame_id,
        kf_xy=m.kf_xy, kf_ur=m.kf_ur, kf_depth=m.kf_depth,
        kf_level=m.kf_level, kf_angle=m.kf_angle, kf_desc=m.kf_desc,
        kf_kp_valid=m.kf_kp_valid, kf_obs=m.kf_obs, kf_Tcp=m.kf_Tcp,
        mp_exists=m.mp_exists, mp_pos=m.mp_pos, mp_desc=m.mp_desc,
        mp_normal=m.mp_normal, mp_min_dist=m.mp_min_dist,
        mp_max_dist=m.mp_max_dist, mp_visible=m.mp_visible,
        mp_found=m.mp_found, mp_first_kf=m.mp_first_kf,
        mp_obs_count=m.mp_obs_count, mp_level=m.mp_level,
        parent=m.parent, covis=m.covis,
        loop_edges=np.asarray(m.loop_edges, dtype=np.int64).reshape(-1, 2),
        kf_origin=m.kf_origin,
        next_kf=m._next_kf, next_mp=m._next_mp,
    )


def load_map(path: str, m: MapStore) -> None:
    """Load a checkpoint into an existing (capacity-compatible or larger)
    MapStore."""
    z = np.load(path)
    assert int(z["format_version"]) <= FORMAT_VERSION, "newer map format"
    K = z["kf_exists"].shape[0]
    M = z["mp_exists"].shape[0]
    N = z["kf_xy"].shape[1]
    assert K <= m.K and M <= m.M and N == m.N, (
        f"map store too small: needs K>={K}, M>={M}, N=={N}")

    def put(dst, src):
        dst[tuple(slice(0, s) for s in src.shape)] = src

    put(m.kf_exists, z["kf_exists"])
    put(m.kf_R, z["kf_R"])
    put(m.kf_t, z["kf_t"])
    put(m.kf_timestamp, z["kf_timestamp"])
    put(m.kf_frame_id, z["kf_frame_id"])
    put(m.kf_xy, z["kf_xy"])
    put(m.kf_ur, z["kf_ur"])
    put(m.kf_depth, z["kf_depth"])
    put(m.kf_level, z["kf_level"])
    put(m.kf_angle, z["kf_angle"])
    put(m.kf_desc, z["kf_desc"])
    put(m.kf_kp_valid, z["kf_kp_valid"])
    put(m.kf_obs, z["kf_obs"])
    put(m.kf_Tcp, z["kf_Tcp"])
    put(m.mp_exists, z["mp_exists"])
    put(m.mp_pos, z["mp_pos"])
    put(m.mp_desc, z["mp_desc"])
    put(m.mp_normal, z["mp_normal"])
    put(m.mp_min_dist, z["mp_min_dist"])
    put(m.mp_max_dist, z["mp_max_dist"])
    put(m.mp_visible, z["mp_visible"])
    put(m.mp_found, z["mp_found"])
    put(m.mp_first_kf, z["mp_first_kf"])
    put(m.mp_obs_count, z["mp_obs_count"])
    put(m.mp_level, z["mp_level"])
    put(m.parent[:K], z["parent"])
    m.covis[:K, :K] = z["covis"]
    m.loop_edges = [tuple(e) for e in z["loop_edges"]]
    m.kf_origin = int(z["kf_origin"])
    m._next_kf = int(z["next_kf"])
    m._next_mp = int(z["next_mp"])
    # rebuild observation counts from kf_obs
    m.mp_obs_count[:] = 0
    m._counted_obs[:] = -1
    for k in np.nonzero(m.kf_exists)[0]:
        m._refresh_obs_row(int(k))
    m.mark_all_points_dirty()
    m.version += 1
