"""Executor/runner tests, mirroring the reference's fake-cluster tests
(controllable_agent/test_executor.py) with a local thread pool."""

import time

import pytest

from controllable_agent_tpu.orchestration import (
    DelayedExecutor,
    LocalExecutor,
    wait_for_jobs,
)


def _func(fail: bool = False) -> int:
    if fail:
        raise ValueError("boom")
    return 12


def test_batching_by_count() -> None:
    ex: DelayedExecutor = DelayedExecutor(LocalExecutor(), default=0,
                                          batch_size=2, max_delay=1000)
    job1 = ex.submit(_func)
    assert job1._job is None  # queued, not submitted
    job2 = ex.submit(_func)
    assert job1._job is not None  # batch size reached -> submitted
    assert job1.result() == 12 and job2.result() == 12


def test_batching_by_delay() -> None:
    ex: DelayedExecutor = DelayedExecutor(LocalExecutor(), default=0,
                                          batch_size=10, max_delay=0.05)
    job = ex.submit(_func)
    assert job._job is None
    time.sleep(0.1)
    assert job.done() or job._job is not None  # delay elapsed -> submitted
    assert job.result() == 12


def test_default_on_failure() -> None:
    ex: DelayedExecutor = DelayedExecutor(LocalExecutor(), default=-1,
                                          batch_size=1, max_failure_rate=1.0)
    job = ex.submit(_func, fail=True)
    assert job.result() == -1


def test_failure_rate_abort() -> None:
    ex: DelayedExecutor = DelayedExecutor(LocalExecutor(), default=-1,
                                          batch_size=1, max_failure_rate=0.3)
    for _ in range(3):
        ex.submit(_func, fail=True).result()
    with pytest.raises(RuntimeError):
        ex.submit(_func, fail=True).result()


def test_result_forces_submission() -> None:
    ex: DelayedExecutor = DelayedExecutor(LocalExecutor(), default=0,
                                          batch_size=100, max_delay=1000)
    job = ex.submit(_func)
    assert job.result() == 12  # .result() flushes the queue


def test_wait_for_jobs() -> None:
    ex = LocalExecutor()
    jobs = [ex.submit(_func) for _ in range(4)]
    wait_for_jobs(jobs, sleep=0.01, print_every=0.01)
    assert all(j.done() for j in jobs)


def test_entry_point_config_composition() -> None:
    from controllable_agent_tpu.orchestration import EntryPoint
    ep = EntryPoint("online")
    cfg = ep.config(task="grid_simple", num_train_frames=100)
    assert cfg.task == "grid_simple"
    assert cfg.num_train_frames == 100


def test_on_exception_enter_postmortem(monkeypatch) -> None:
    import pdb

    from controllable_agent_tpu.orchestration.runner import (
        on_exception_enter_postmortem,
    )

    entered = []
    monkeypatch.setattr(pdb, "post_mortem", lambda tb: entered.append(tb))

    @on_exception_enter_postmortem
    def boom() -> None:
        raise RuntimeError("boom")

    @on_exception_enter_postmortem
    def fine() -> int:
        return 7

    assert fine() == 7
    import pytest
    with pytest.raises(RuntimeError):
        boom()
    assert len(entered) == 1
