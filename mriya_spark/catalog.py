"""Fixture catalog: table name -> DataFrame over the driver's parquet.

Plays the role of the reference's implicit "catalog": SObject names
resolved by the remote Salesforce org (`/root/reference/mapping_parser.py:19-20`
`source_object` / `destination_object` strings). Here a table name
resolves to a parquet file under a scale-factor directory and is
registered as a temp view so both DataFrame and SQL entry points see
the same relations.

At 100 TB each "table" would be a partitioned directory (or an
Iceberg/Delta table); nothing here assumes single-file layout —
``spark.read.parquet`` takes directories the same way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
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

#: Small dimension tables that should always be broadcast in joins.
DIMENSIONS = frozenset({"region", "nation", "supplier", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Canonicalize ``events.ts`` to TIMESTAMP_NTZ whatever the parquet
    encoding of the fixture generation at hand:

    - INT64 TIMESTAMP(NANOS) read as long under
      ``spark.sql.legacy.parquet.nanosAsLong`` (early fixtures),
    - plain TIMESTAMP(MICROS) without tz adjustment, which Spark 4
      infers as TIMESTAMP_NTZ (current fixtures),
    - tz-adjusted TIMESTAMP (LTZ), cast through the session tz (UTC).

    DuckDB reads the same column as a naive TIMESTAMP, so NTZ is the
    canonical type that hashes equal cross-engine.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        # integer division: ns values exceed 2^53, so float division
        # would lose precision; truncation matches DuckDB's ns->us
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    elif isinstance(dt, T.TimestampType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df


class Catalog:
    """Resolve table names to DataFrames for one scale-factor directory."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir.rstrip("/")
        self._cache: dict[str, DataFrame] = {}

    def path(self, name: str) -> str:
        return f"{self.sf_dir}/{name}.parquet"

    def table(self, name: str) -> DataFrame:
        """Lazy scan of one table (column pruning/pushdown handled by Catalyst)."""
        if name not in self._cache:
            if name == "events":
                # must be set on whatever session the caller built —
                # the driver's vanilla session won't have it
                self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = self.spark.read.parquet(self.path(name))
            if name == "events":
                df = normalize_events_ts(df)
            self._cache[name] = df
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self, names: tuple[str, ...] = TABLES) -> None:
        """Register temp views so ``spark.sql`` queries see the catalog."""
        for name in names:
            if os.path.exists(self.path(name)):
                self.table(name).createOrReplaceTempView(name)


def load_catalog(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> Catalog:
    cat = Catalog(spark, sf_dir)
    cat.register_views()
    return cat
