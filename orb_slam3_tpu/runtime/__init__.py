"""Host-side runtime: the asynchronous tracking/mapping/loop pipeline.

The reference runs LocalMapping, LoopClosing and a transient global-BA as
POSIX threads around a mutex-guarded pointer graph
(`/root/reference/src/System.cc:197,214,233`). The TPU-native runtime keeps
tracking on the caller's thread and runs the whole per-keyframe mapping
stack on a background mapper thread over immutable MapState snapshots with
atomic commits — no locks on the hot path (SURVEY.md §2.4/§7.3-3).
"""

from .mapper import AsyncMapper, MapCommit  # noqa: F401
