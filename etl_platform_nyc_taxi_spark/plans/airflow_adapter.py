"""Airflow adapter (SURVEY.md §2.11 G1): map a scheduler-agnostic
:class:`~etl_platform_nyc_taxi_spark.plans.runner.Pipeline` onto an Airflow
DAG — drop-in parity for reference users
(reference: dags/daily_transactions_dag.py:49-96) without the engine ever
importing an orchestrator in its core.

The reference couples jobs to Airflow twice: BaseHook credential lookups
inside the Spark job and DAG-only retry config. Here the Pipeline carries
its own retry policy; this adapter just translates:

* ``Step``            → ``PythonOperator`` (same retries / retry_delay)
* runner.``wait_for`` → a ``PythonSensor``-shaped poke (or keep it as a
  plain Step — the Pipeline's sensor already blocks correctly)
* step order          → linear ``>>`` dependencies

Airflow is imported lazily inside :func:`to_airflow_dag`, so the engine
(and its tests) run without it; :func:`airflow_task_specs` exposes the
translation as pure data for environments without Airflow installed.
"""

from __future__ import annotations

import datetime as dt
import re
from dataclasses import dataclass

from etl_platform_nyc_taxi_spark.plans.runner import Pipeline


@dataclass(frozen=True)
class TaskSpec:
    """Orchestrator-neutral task description derived from one Step."""

    task_id: str
    retries: int
    retry_delay_s: float


def airflow_task_specs(pipeline: Pipeline) -> list[TaskSpec]:
    """The Step → operator mapping as data (testable without Airflow)."""
    return [
        TaskSpec(task_id=s.name, retries=s.retries, retry_delay_s=s.retry_delay_s)
        for s in pipeline.steps
    ]


def to_airflow_dag(
    pipeline: Pipeline,
    schedule: str | None = "@daily",
    start_date: dt.datetime | None = None,
    **dag_kwargs,
):
    """Build an Airflow DAG running the Pipeline's steps in order.

    Example (in a dags/ file)::

        from etl_platform_nyc_taxi_spark.plans.airflow_adapter import to_airflow_dag
        from my_pipelines import build_daily_pipeline  # returns Pipeline

        dag = to_airflow_dag(build_daily_pipeline(), schedule="@daily")

    Each Step keeps its own retry policy (reference parity:
    daily_transactions_dag.py:30-31 — 1 retry / 300 s).
    """
    from airflow import DAG  # lazy: engine core never requires Airflow
    from airflow.operators.python import PythonOperator

    dag = DAG(
        # Airflow restricts dag_id to [\w.-]; sanitize so any Pipeline name
        # (e.g. user-supplied job tags) composes without raising
        dag_id=re.sub(r"[^\w.-]", "_", pipeline.name),
        schedule=schedule,
        start_date=start_date or dt.datetime(2024, 1, 1),
        catchup=False,
        **dag_kwargs,
    )
    prev = None
    for step in pipeline.steps:
        op = PythonOperator(
            task_id=step.name,
            python_callable=step.fn,
            retries=step.retries,
            retry_delay=dt.timedelta(seconds=step.retry_delay_s),
            dag=dag,
        )
        if prev is not None:
            prev >> op
        prev = op
    return dag
