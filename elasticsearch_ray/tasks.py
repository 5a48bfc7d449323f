"""Task management API analog (`GET/POST _tasks`).

Mirrors the reference's task registry surface (tasks/TaskManager.java,
action/admin/cluster/node/tasks/list/ListTasksAction + the cancellable
bulk-by-scroll tasks of reindex/update_by_query/delete_by_query,
index/reindex/BulkByScrollTask.java): every long-running job registers a
task with an id, action name and live status counters; tasks can be listed,
fetched and cancelled. Cancellation is COOPERATIVE, exactly like the
reference: the running job calls `check_cancelled` at its batch checkpoints
and unwinds with TaskCancelledError.

Two deployment shapes:
- `TaskManager`: plain in-process registry — driver-side pipelines check
  between Dataset stages.
- `ray.remote(TaskManager)` (see `start_task_manager_actor`): a named actor
  holding the registry so map_batches workers on any node can check the
  cancel flag — the shared-mutable-state case where a raw actor is the
  idiomatic Ray escape hatch.
"""

from __future__ import annotations

import itertools
import threading
import time


class TaskCancelledError(RuntimeError):
    """Raised at a cancellation checkpoint of a cancelled task."""


_COUNTERS = ("total", "created", "updated", "deleted", "batches",
             "version_conflicts", "noops")


class TaskManager:
    def __init__(self, node_id: str = "ray-driver"):
        self._node = node_id
        self._seq = itertools.count(1)
        self._tasks: dict[str, dict] = {}
        self._lock = threading.Lock()

    def start(self, action: str, description: str = "") -> str:
        """Register a running task; returns its `<node>:<seq>` id."""
        tid = f"{self._node}:{next(self._seq)}"
        with self._lock:
            self._tasks[tid] = {
                "id": tid,
                "action": action,
                "description": description,
                "start_time_millis": int(time.time() * 1000),
                "cancellable": True,
                "cancelled": False,
                "completed": False,
                "status": {c: 0 for c in _COUNTERS},
            }
        return tid

    def update(self, tid: str, **counters: int) -> None:
        """Increment status counters (a batch checkpoint)."""
        with self._lock:
            st = self._tasks[tid]["status"]
            for k, v in counters.items():
                st[k] = st.get(k, 0) + int(v)

    def check_cancelled(self, tid: str) -> None:
        if self._tasks[tid]["cancelled"]:
            raise TaskCancelledError(f"task {tid} was cancelled")

    def finish(self, tid: str) -> dict:
        with self._lock:
            t = self._tasks[tid]
            t["completed"] = True
            t["running_time_millis"] = (
                int(time.time() * 1000) - t["start_time_millis"])
        return t

    def cancel(self, tid: str) -> bool:
        """`POST _tasks/<id>/_cancel`: flag the task; the job unwinds at its
        next checkpoint. Returns False for unknown/completed tasks."""
        with self._lock:
            t = self._tasks.get(tid)
            if t is None or t["completed"]:
                return False
            t["cancelled"] = True
            return True

    def get(self, tid: str) -> dict:
        """`GET _tasks/<id>`."""
        return dict(self._tasks[tid])

    def list(self, action: str | None = None,
             detailed: bool = True) -> list[dict]:
        """`GET _tasks?actions=<glob>`: glob-filter on the action name."""
        import fnmatch

        with self._lock:
            out = [dict(t) for t in self._tasks.values()
                   if action is None or fnmatch.fnmatch(t["action"], action)]
        if not detailed:
            for t in out:
                t.pop("status", None)
        return sorted(out, key=lambda t: t["id"])


def start_task_manager_actor(name: str = "task_manager"):
    """The multi-node shape: the registry as a named detached-ish actor so
    any worker can reach the cancel flag with one actor call per batch."""
    import ray

    return ray.remote(TaskManager).options(name=name).remote()
