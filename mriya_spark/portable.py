"""Engine-portable deterministic draws, shared by every op that must
reproduce bit-for-bit in the DuckDB oracle.

All portability rests on ONE construction: ``md5('{seed}_{key}')``,
whose hex prefix both engines parse identically (Spark
``conv(substr(.., 1, 15), 16, 10)`` == DuckDB
``('0x' || substr(.., 1, 15))::BIGINT``). Centralized here so the five
consumers (weighted/temperature sampling, per-group quota, reshard,
the portable generator) cannot drift apart — a one-character change in
any copy would silently break cross-engine reproducibility for just
that op (r7 review finding).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hex(seed: int, key: Column) -> Column:
    """md5 hex of ``"{seed}_{key}"`` — the shared keyed-draw input."""
    return F.md5(F.concat_ws("_", F.lit(str(seed)), key.cast("string")))


def md5_long60(seed: int, key: Column) -> Column:
    """First 60 hash bits as a non-negative BIGINT (DuckDB:
    ``('0x' || substr(md5(..), 1, 15))::BIGINT``)."""
    return F.conv(F.substring(md5_hex(seed, key), 1, 15), 16, 10).cast("long")


def md5_uniform(seed: int, key: Column) -> Column:
    """Deterministic uniform draw in [0, 1): the 60-bit integer scaled
    by 2^60. Exact cross-engine: 60-bit ints round to double the same
    way everywhere, and the divisor is a power of two."""
    return md5_long60(seed, key).cast("double") / float(1 << 60)
