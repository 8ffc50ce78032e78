"""Airflow DAG mirroring the reference topology (``dags/etl/main.py:8-85``).

The reference runs PythonOperator tasks that do pandas work inside the
Airflow worker. Here each task submits a Spark job (the functions in
:mod:`.source_to_stage` / :mod:`.stage_to_nds`); Airflow only
orchestrates — same DAG id, schedule (22:00 daily, no catchup), task
groups and dependency chain:

    source_to_stage (load_into_aqi_stage ∥ load_into_counties_stage)
        >> stage_to_nds (states >> counties >> measurements)

Airflow is not installed in this image; the module degrades to a no-op
importable stub so the engine package never hard-depends on it.
"""

from __future__ import annotations

import os

try:  # pragma: no cover - airflow not in the test image
    from airflow import DAG
    from airflow.operators.python import PythonOperator
    from airflow.utils.task_group import TaskGroup

    HAVE_AIRFLOW = True
except ImportError:  # pragma: no cover
    HAVE_AIRFLOW = False

from datetime import datetime


def _run_source_to_stage() -> None:
    from ..session import get_spark
    from .source_to_stage import run_source_to_stage
    from .warehouse import Warehouse

    wh = Warehouse(get_spark("etl_aqi"), os.environ["AQI_WAREHOUSE"])
    run_source_to_stage(
        wh, os.environ["AQI_SOURCE_DIR"], os.environ["AQI_COUNTIES_CSV"]
    )


def _task(fn_name: str):
    from . import stage_to_nds as s2n
    from ..session import get_spark
    from .warehouse import Warehouse

    def _inner() -> None:
        wh = Warehouse(get_spark("etl_aqi"), os.environ["AQI_WAREHOUSE"])
        getattr(s2n, fn_name)(wh)

    return _inner


if HAVE_AIRFLOW:  # pragma: no cover
    with DAG(
        dag_id="ETL_AQI",
        start_date=datetime(2024, 11, 20),
        schedule_interval="0 22 * * *",
        catchup=False,
    ) as dag:
        with TaskGroup("source_to_stage") as source_to_stage_group:
            load = PythonOperator(
                task_id="run_source_to_stage", python_callable=_run_source_to_stage
            )
        with TaskGroup("stage_to_nds") as stage_to_nds_group:
            states = PythonOperator(
                task_id="get_merged_state_data", python_callable=_task("upsert_states")
            )
            counties = PythonOperator(
                task_id="get_merged_county_data",
                python_callable=_task("upsert_counties"),
            )
            measurements = PythonOperator(
                task_id="get_merged_measurement_data",
                python_callable=_task("upsert_measurements"),
            )
            states >> counties >> measurements
        source_to_stage_group >> stage_to_nds_group
