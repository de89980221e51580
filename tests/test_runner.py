"""Runner: step retries, sensor timeout, callback wiring (G1-G8 parity)."""

from __future__ import annotations

import pytest

from etl_platform_nyc_taxi_spark.plans.runner import (
    Pipeline,
    SensorTimeout,
    Step,
    wait_for,
)


def test_step_retries_then_succeeds():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 2:
            raise RuntimeError("boom")
        return "ok"

    assert Step("s", flaky, retries=1, retry_delay_s=0.0).run() == "ok"
    assert len(calls) == 2


def test_step_exhausts_retries():
    def always():
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        Step("s", always, retries=2, retry_delay_s=0.0).run()


def test_wait_for_success_and_timeout():
    state = {"n": 0}

    def cond():
        state["n"] += 1
        return state["n"] >= 3

    wait_for(cond, poke_interval_s=0.0, timeout_s=5.0)
    with pytest.raises(SensorTimeout):
        wait_for(lambda: False, poke_interval_s=0.0, timeout_s=0.05)


def test_pipeline_order_and_callbacks():
    events = []
    p = Pipeline(
        "p",
        steps=[
            Step("a", lambda: events.append("a") or 1, retries=0),
            Step("b", lambda: events.append("b") or 2, retries=0),
        ],
        on_success=lambda name: events.append(f"ok:{name}"),
    )
    out = p.run()
    assert events == ["a", "b", "ok:p"]
    assert out == {"a": 1, "b": 2}


def test_pipeline_failure_callback():
    seen = []
    p = Pipeline(
        "p",
        steps=[Step("a", lambda: 1 / 0, retries=0)],
        on_failure=lambda name, exc: seen.append((name, type(exc).__name__)),
    )
    with pytest.raises(ZeroDivisionError):
        p.run()
    assert seen == [("p", "ZeroDivisionError")]


def test_airflow_adapter_specs_preserve_retry_policy():
    """G1 adapter: Step → operator mapping carries each step's own retry
    config (reference parity: daily_transactions_dag.py:30-31). Pure-data
    path — Airflow itself is not installed in this environment."""
    from etl_platform_nyc_taxi_spark.plans.airflow_adapter import (
        airflow_task_specs,
    )

    p = Pipeline(
        "adapted",
        steps=[
            Step("sense", lambda: True, retries=0, retry_delay_s=1.0),
            Step("compute", lambda: 42, retries=1, retry_delay_s=300.0),
        ],
    )
    specs = airflow_task_specs(p)
    assert [s.task_id for s in specs] == ["sense", "compute"]
    assert specs[1].retries == 1 and specs[1].retry_delay_s == 300.0
