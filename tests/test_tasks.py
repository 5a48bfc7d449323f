"""Task management registry (tasks/TaskManager.java,
BulkByScrollTask.java cancellable semantics)."""

from __future__ import annotations

import pytest

from elasticsearch_ray.tasks import TaskCancelledError, TaskManager


def test_task_lifecycle_and_counters():
    mgr = TaskManager(node_id="n1")
    tid = mgr.start("indices:data/write/reindex", "test job")
    assert tid == "n1:1"
    mgr.update(tid, total=100, created=100, batches=1)
    mgr.update(tid, total=50, created=50, batches=1)
    rec = mgr.finish(tid)
    assert rec["completed"] and not rec["cancelled"]
    assert rec["status"]["total"] == 150
    assert rec["status"]["batches"] == 2
    assert rec["running_time_millis"] >= 0


def test_task_cancel_cooperative():
    mgr = TaskManager()
    tid = mgr.start("indices:data/write/update/byquery")
    mgr.check_cancelled(tid)  # not cancelled -> no raise
    assert mgr.cancel(tid) is True
    with pytest.raises(TaskCancelledError):
        mgr.check_cancelled(tid)
    # cancelling a completed or unknown task is a no-op False
    mgr.finish(tid)
    assert mgr.cancel(tid) is False
    assert mgr.cancel("nope:99") is False


def test_task_list_glob_filter():
    mgr = TaskManager()
    a = mgr.start("indices:data/write/reindex")
    b = mgr.start("indices:data/write/delete/byquery")
    c = mgr.start("cluster:monitor/health")
    ids = [t["id"] for t in mgr.list("indices:data/write/*")]
    assert ids == sorted([a, b]) and c not in ids
    brief = mgr.list(detailed=False)
    assert len(brief) == 3 and all("status" not in t for t in brief)


def test_task_manager_actor_cross_worker_cancel(ray_session):
    """The named-actor shape: a worker task observes the driver's cancel."""
    import ray

    from elasticsearch_ray.tasks import start_task_manager_actor

    mgr = start_task_manager_actor(name="tm_test")
    tid = ray.get(mgr.start.remote("indices:data/write/reindex"))

    @ray.remote
    def worker(mgr, tid):
        import time as _t

        for _ in range(200):
            try:
                ray.get(mgr.check_cancelled.remote(tid))
            except TaskCancelledError:
                return "cancelled"
            ray.get(mgr.update.remote(tid, batches=1))
            _t.sleep(0.01)
        return "ran-to-end"

    fut = worker.remote(mgr, tid)
    ray.get(mgr.cancel.remote(tid))
    assert ray.get(fut) == "cancelled"
    ray.kill(mgr)
