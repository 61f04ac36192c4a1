"""Catalog over the driver-generated TPC-H-ish fixtures (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under a scale-factor dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

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


# (session-id, sf_dir, table) -> DataFrame. A DataFrame is just a lazy
# plan, so reusing it skips the repeated footer/schema read that
# spark.read.parquet performs (~0.5 s per call on this fixture set) while
# every action still runs a fresh pushdown-capable FileScan.
_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Plain ``spark.read.parquet`` so Catalyst
    sees a pushdown-capable FileScan (ReadSchema/PushedFilters)."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    key = (id(spark), sf_dir, name)
    cached = _CACHE.get(key)
    if cached is not None:
        return cached
    df = _read_table(spark, sf_dir, name)
    _CACHE[key] = df
    return df


def _read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # The fixture stores ts as TIMESTAMP(NANOS), which Spark's parquet
        # reader rejects; read it as int64 ns (legacy conf) and floor to
        # microseconds — the DuckDB oracle mirrors this exact floor with
        # make_timestamp(epoch_ns(ts)//1000).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # ts is converted through a session-tz-sensitive LTZ type; pin UTC
        # so results are identical regardless of the host session's zone.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every fixture table into a dict keyed by table name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each fixture table as a temp view (for ``spark.sql``)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
