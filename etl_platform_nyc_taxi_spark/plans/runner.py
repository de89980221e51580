"""Scheduler-agnostic pipeline runner (SURVEY.md §2.11 G1-G8).

The reference expresses its flow as an Airflow DAG:
``FileSensor >> CREATE TABLE >> spark-submit`` with retries and
success/failure callbacks (dags/daily_transactions_dag.py:49-96). That
couples the Spark jobs to Airflow (BaseHook inside the job,
calculate_daily_transactions.py:8). Here the same flow is a plain ordered
step list with sensing, retry, and callbacks built in — runnable from a
cron line, a CLI, or wrapped BY Airflow (one operator per Step) without the
engine importing any orchestrator.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

log = logging.getLogger("etl_platform_nyc_taxi_spark.runner")


class SensorTimeout(TimeoutError):
    """Raised when a wait-step's condition never became true."""


@dataclass
class Step:
    """One pipeline stage: a callable plus retry policy.

    Parity with the reference's task-level config: 1 retry after 300 s
    (daily_transactions_dag.py:30-31).
    """

    name: str
    fn: Callable[[], object]
    retries: int = 1
    retry_delay_s: float = 300.0

    def run(self) -> object:
        attempt = 0
        while True:
            try:
                return self.fn()
            except Exception:
                attempt += 1
                if attempt > self.retries:
                    raise
                log.warning("step %s failed (attempt %d); retrying in %ss", self.name, attempt, self.retry_delay_s)
                time.sleep(self.retry_delay_s)


def wait_for(
    condition: Callable[[], bool],
    poke_interval_s: float = 300.0,
    timeout_s: float = 1800.0,
    name: str = "sensor",
) -> None:
    """FileSensor parity (S9; daily_transactions_dag.py:58-65): poll until
    ``condition()`` or timeout. Structured Streaming's file source subsumes
    this for continuous pipelines (streaming/), but batch runs keep the
    explicit gate."""
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if condition():
            return
        time.sleep(min(poke_interval_s, max(0.0, deadline - time.monotonic())))
    if condition():
        return
    raise SensorTimeout(f"{name}: condition not met within {timeout_s}s")


@dataclass
class Pipeline:
    """Ordered steps with callbacks — G1/G2/G7 parity without Airflow."""

    name: str
    steps: Sequence[Step] = field(default_factory=list)
    on_success: Callable[[str], None] | None = None
    on_failure: Callable[[str, BaseException], None] | None = None

    def run(self) -> dict[str, object]:
        results: dict[str, object] = {}
        try:
            for step in self.steps:
                log.info("pipeline %s: step %s", self.name, step.name)
                results[step.name] = step.run()
        except BaseException as exc:
            if self.on_failure:
                self.on_failure(self.name, exc)
            raise
        if self.on_success:
            self.on_success(self.name)
        return results
