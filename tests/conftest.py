from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "4")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("swish-e-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def corpus300():
    """300-doc deterministic synthetic pages corpus (list of dicts)."""
    from swish_e_spark.datagen.pages import generate_rows

    return list(generate_rows(300))


@pytest.fixture(scope="session")
def oracle300(corpus300):
    from swish_e_spark.datagen.pages import doctype_of_url
    from swish_e_spark.oracle.engine import OracleIndex
    from swish_e_spark.textproc.tokenizer import TokenizerConfig

    idx = OracleIndex(TokenizerConfig(buzzwords=frozenset({"c++"})))
    for r in corpus300:
        idx.add(r["url"], r["html"], doctype=doctype_of_url(r["url"]),
                lang=r["lang"], warc_ts=r["warc_ts"])
    return idx.build()
