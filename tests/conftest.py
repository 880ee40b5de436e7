"""Shared fixtures: one SparkSession per test run, small-SF data dir."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from flink_orc_sink_spark.session import get_spark

    spark = get_spark(
        "tests",
        shuffle_partitions=8,
        extra_conf={"spark.default.parallelism": "8"},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
