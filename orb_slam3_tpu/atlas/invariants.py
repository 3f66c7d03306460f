"""Map-structure invariant checks.

Role of the reference's debug validators (`Map::CheckEssentialGraph`,
`/root/reference/include/Map.h:128`) — but as pure functions over the SoA
MapState, usable as test predicates (SURVEY.md §5.2: assert-based invariant
checks become test predicates in the functional design).

Each check returns a list of violation strings (empty = healthy).
"""

from __future__ import annotations

import numpy as np


def check_spanning_tree(s) -> list[str]:
    """Every valid KF either is a root (parent < 0) or points to a valid
    parent in the same map, and parent chains are acyclic (KeyFrame spanning
    tree, KeyFrame.h:220-247)."""
    bad = []
    n = int(s.n_kf)
    valid = np.array(s.kf_valid)[:n]
    parent = np.array(s.kf_parent)[:n]
    map_id = np.array(s.kf_map_id)[:n]
    for r in range(n):
        if not valid[r]:
            continue
        p = parent[r]
        if p < 0:
            continue
        if p >= n or not valid[p]:
            bad.append(f"KF {r}: parent {p} invalid")
            continue
        if map_id[p] != map_id[r]:
            bad.append(f"KF {r}: parent {p} in different map")
        # cycle walk (paths are <= n long in a tree)
        seen = set()
        cur = r
        while cur >= 0 and parent[cur] >= 0:
            if cur in seen:
                bad.append(f"KF {r}: parent cycle through {cur}")
                break
            seen.add(cur)
            cur = parent[cur]
    return bad


def check_prev_chain(s) -> list[str]:
    """Temporal mPrevKF links (inertial chain): a valid KF's prev link, if
    set, references a valid earlier KF of the same map with an earlier
    timestamp (KeyFrame mPrevKF/mNextKF, LocalMapping.cc:1020-1041)."""
    bad = []
    n = int(s.n_kf)
    valid = np.array(s.kf_valid)[:n]
    prev = np.array(s.kf_prev)[:n]
    map_id = np.array(s.kf_map_id)[:n]
    ts = np.array(s.kf_timestamp)[:n]
    for r in range(n):
        if not valid[r] or prev[r] < 0:
            continue
        p = prev[r]
        if p >= r:
            bad.append(f"KF {r}: prev {p} not earlier")
        elif not valid[p]:
            bad.append(f"KF {r}: prev {p} culled but still linked")
        elif map_id[p] != map_id[r]:
            bad.append(f"KF {r}: prev {p} in different map")
        elif ts[p] >= ts[r]:
            bad.append(f"KF {r}: prev timestamp not increasing")
    return bad


def check_observations(s) -> list[str]:
    """Feature->landmark bindings reference valid landmarks, and every
    valid landmark is observed by at least one valid keyframe (MapPoint
    observations contract, MapPoint.h)."""
    bad = []
    n = int(s.n_kf)
    L = s.lmax
    valid = np.array(s.kf_valid)[:n]
    lm_valid = np.array(s.lm_valid)
    feat_lm = np.array(s.kf_feat_lm)[:n]
    feat_valid = np.array(s.kf_feat_valid)[:n]
    obs_count = np.zeros(L, np.int64)
    for r in range(n):
        if not valid[r]:
            continue
        bound = (feat_lm[r] >= 0) & feat_valid[r]
        rows = feat_lm[r][bound]
        dead = ~lm_valid[np.clip(rows, 0, L - 1)]
        if dead.any():
            bad.append(
                f"KF {r}: {int(dead.sum())} observations of dead landmarks"
            )
        np.add.at(obs_count, np.clip(rows, 0, L - 1), 1)
    orphan = lm_valid & (obs_count == 0)
    if orphan.any():
        bad.append(f"{int(orphan.sum())} valid landmarks with no observation")
    return bad


def check_all(s) -> list[str]:
    return (check_spanning_tree(s) + check_prev_chain(s)
            + check_observations(s))
