"""Schema-driven synthetic data generation (G1).

Spark-native restatement of the reference's test-data generator
(`/root/reference/test_data_generator.py:46-80` ``gen_data``): n rows
from a type map with ``defaults`` (fixed values), ``prefixes``
(prefix + random suffix), and per-type random fallbacks
(`test_data_generator.py:71-76`); the ``'ObjectName'`` marker injects
the table name (`test_data_generator.py:11,55-57`).

Distributed shape: ``spark.range(n)`` (parallel, no driver loop) +
seedable column expressions. ``F.rand(seed)`` gives run-to-run
determinism for tests — the reference's generator is unseeded.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

OBJECT_NAME_MARKER = "ObjectName"

#: Reference's canonical Account schema (`test_data_generator.py:9-36`).
ACCOUNT_STRUCT = {
    "Name": "text",
    "type": OBJECT_NAME_MARKER,
    "Billing_Address__c": "text",
    "Billing_City__c": "text",
    "Billing_County__c": "text",
    "Billing_Zip_Code__c": "int",
    "Shipping_Address__c": "text",
    "Shipping_City__c": "text",
    "Shipping_County__c": "text",
    "Shipping_Zip_Code__c": "int",
    "Account_Birthday__c": "date",
    "Website": "text",
}
ACCOUNT_DEFAULTS = {
    "Billing_City__c": "San Antonio",
    "Billing_County__c": "USA",
    "Shipping_City__c": "San Antonio",
    "Shipping_County__c": "USA",
    "Website": "www.rackspace.com",
}
ACCOUNT_PREFIXES = {
    "Name": "Account name_",
    "Billing_Address__c": "Street_Billing_Address_",
    "Shipping_Address__c": "Street_Shipping_Address_",
}

INT_MIN, INT_MAX = 10_000, 100_000  # `test_data_generator.py:74`
DATE_MIN = datetime(2000, 1, 1, 13, 30)  # `test_data_generator.py:89-92`
DATE_MAX = datetime(2017, 1, 1, 13, 30)
RAND_STR_LEN = 10


def _rand_string(seed: int, length: int = RAND_STR_LEN) -> Column:
    """F2 — random uppercase alnum string, JVM-side (no UDF): hash the
    row id through sha2 and take ``length`` uppercased hex chars."""
    return F.upper(
        F.substring(
            F.sha2(F.concat(F.col("__id").cast("string"), F.lit(str(seed))), 256),
            1,
            length,
        )
    )


def _rand_int(seed: int, lo: int = INT_MIN, hi: int = INT_MAX) -> Column:
    """F1 — random int in [lo, hi] (`test_data_generator.py:82-83`)."""
    return (F.rand(seed) * (hi - lo) + lo).cast("long")


def _rand_timestamp(seed: int, lo: datetime = DATE_MIN, hi: datetime = DATE_MAX) -> Column:
    """F3 — random datetime in [lo, hi] (`test_data_generator.py:88-92`)."""
    lo_s = int(lo.timestamp())
    hi_s = int(hi.timestamp())
    return F.timestamp_seconds(
        (F.rand(seed) * (hi_s - lo_s) + lo_s).cast("long")
    )


def _uniform_portable(seed: int) -> Column:
    """Engine-portable uniform in [0, 1): md5-60bit of (seed, row id)
    scaled (`mriya_spark.portable.md5_uniform`)."""
    from mriya_spark.portable import md5_uniform

    return md5_uniform(seed, F.col("__id"))


def _rand_int_portable(seed: int, lo: int = INT_MIN, hi: int = INT_MAX) -> Column:
    return (F.floor(_uniform_portable(seed) * (hi - lo)).cast("long") + lo)


def _rand_timestamp_portable(
    seed: int, lo: datetime = DATE_MIN, hi: datetime = DATE_MAX
) -> Column:
    lo_s = int(lo.timestamp())
    hi_s = int(hi.timestamp())
    return F.timestamp_seconds(
        F.floor(_uniform_portable(seed) * (hi_s - lo_s)).cast("long") + lo_s
    )


def gen_data(
    spark: SparkSession,
    n: int,
    object_name: str,
    data_struct: dict[str, str] | None = None,
    defaults: dict[str, object] | None = None,
    prefixes: dict[str, str] | None = None,
    *,
    seed: int = 42,
    num_partitions: int | None = None,
    portable: bool = False,
) -> DataFrame:
    """G1 — generate ``n`` rows for ``object_name``.

    Precedence per column mirrors the reference
    (`test_data_generator.py:50-70`): ObjectName marker > default >
    prefix+random > random-by-type. Fully distributed: ``spark.range``
    partitions the id space, every column is a codegen'd expression.

    ``portable=True`` swaps the int/timestamp draws from Spark's
    ``rand(seed)`` (XorShift — reproducible but engine-internal) to
    md5-derived uniforms, so the identical rows regenerate in any
    engine with md5/sha256 — the hash-checkable form (strings already
    are: sha2 of (row id, seed)).
    """
    data_struct = data_struct if data_struct is not None else ACCOUNT_STRUCT
    defaults = defaults if defaults is not None else ACCOUNT_DEFAULTS
    prefixes = prefixes if prefixes is not None else ACCOUNT_PREFIXES

    base = spark.range(0, n, 1, num_partitions or max(1, min(32, n // 10_000 or 1)))
    base = base.withColumnRenamed("id", "__id")

    cols = [F.col("__id").alias("row_id")]
    for i, (name, ctype) in enumerate(data_struct.items()):
        col_seed = seed * 1000 + i
        if ctype == OBJECT_NAME_MARKER:
            col = F.lit(object_name)
        elif name in defaults:
            col = F.lit(defaults[name])
        elif name in prefixes:
            col = F.concat(F.lit(prefixes[name]), _rand_string(col_seed))
        elif ctype == "text":
            col = _rand_string(col_seed)
        elif ctype == "int":
            col = (_rand_int_portable if portable else _rand_int)(col_seed)
        elif ctype == "date":
            col = (_rand_timestamp_portable if portable else _rand_timestamp)(col_seed)
        else:
            raise ValueError(f"unknown column type {ctype!r} for {name!r}")
        cols.append(col.alias(name))
    return base.select(*cols)
