"""Shared test fixtures: one SparkSession per test run."""

from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "4")
    session = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ibis-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield session


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def con(spark):
    import ibis_spark as isp

    return isp.connect(spark)


@pytest.fixture(scope="session")
def lineitem(con, sf_dir):
    return con.read_parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="session")
def orders(con, sf_dir):
    return con.read_parquet(f"{sf_dir}/orders.parquet")


@pytest.fixture(scope="session")
def customer(con, sf_dir):
    return con.read_parquet(f"{sf_dir}/customer.parquet")
