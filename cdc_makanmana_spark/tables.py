"""Table loading for the driver-provided parquet fixtures.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings. Schema-on-read is banned in the
engine proper (SURVEY.md §1.3) — parquet carries its schema, so reads
are already schema-enforced; the JSON/CSV sources in
``cdc_makanmana_spark.sources`` take explicit StructTypes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    # events.parquet has shipped two timestamp physical types across
    # fixture generations: TIMESTAMP(NANOS), which Spark's reader
    # rejects by default (read as long, truncate ns→µs with integer
    # division — exact; DuckDB truncates the same way), and plain
    # TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 infers
    # as timestamp_ntz. Normalize both to session-TZ TimestampType:
    # the session runs UTC, so wall-clock values match DuckDB's naive
    # timestamps either way.
    _configure_parquet_timestamps(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if any(f.name == "ts" for f in df.schema.fields):
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def _configure_parquet_timestamps(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load all fixture tables and register them as temp views so the
    same queries run via the DataFrame API or ``spark.sql``."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = load_table(spark, name, sf_dir)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
