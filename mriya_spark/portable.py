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


# -- portable HLL (md5 family) ----------------------------------------
#
# m=256 buckets from the LOW 8 bits of the 60-bit draw (h % 256); the
# rho window is the remaining high 52 bits (h >> 8).
# The scale constant alpha*m^2*2^53 and the linear-counting table are
# computed ONCE here and inlined as identical double literals on both
# sides, so the only float op either engine performs is one
# IEEE-correctly-rounded division (neither Spark's java.lang.Math.log
# nor DuckDB's libm ln guarantees correct rounding, hence the table —
# m*ln(m/n_empty) has only m possible values). Shared by
# sketch_hll_portable and the approx table profile so the register
# layout cannot drift between consumers.

import math as _math

HLL_M = 256
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
HLL_SCALE = HLL_ALPHA * HLL_M * HLL_M * float(1 << 53)
HLL_LC_TABLE = [HLL_M * _math.log(HLL_M / n) for n in range(1, HLL_M + 1)]


def hll_bucket_rho(h: Column) -> tuple[Column, Column]:
    """(bucket, rho) of a 60-bit draw: bucket = h mod m; rho = leading
    zeros of the remaining 52 bits + 1, via binary-string length (both
    engines agree on bin()/conv semantics including the rest=0 edge,
    where rho is the full 53-bit window)."""
    rest = F.shiftright(h, 8)
    rho = F.when(rest == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.conv(rest.cast("string"), 10, 2))
    )
    return (h % HLL_M).cast("long"), rho


def hll_state_aggs() -> list[Column]:
    """The two exact-integer state aggregates over a grouped register
    frame with an ``m`` max-rho column: ``s_int`` = BIGINT harmonic
    denominator (sum of 2^(53-M) plus 2^53 per empty bucket — no float
    summation order to diverge) and ``n_empty``."""
    return [
        (
            F.sum(F.expr("shiftleft(cast(1 as bigint), 53 - m)"))
            + (HLL_M - F.count(F.lit(1))) * F.lit(1 << 53).cast("long")
        ).cast("long").alias("s_int"),
        (HLL_M - F.count(F.lit(1))).cast("long").alias("n_empty"),
    ]


def hll_estimate(s_int: Column, n_empty: Column) -> Column:
    """4dp-rounded HLL estimate from the exact state: harmonic branch
    is one division on identical operands; the small-range
    linear-counting branch indexes the precomputed literal table."""
    est_raw = F.lit(HLL_SCALE) / s_int
    # one SQL-parsed array constant, not 256 F.lit py4j round-trips
    # (the measured r9 plan-build trap); repr round-trips each double
    # exactly, so the parsed constants match the oracle's (which
    # hll_sql_parts interpolates from the same reprs)
    lc_lit = F.expr(
        "array(" + ",".join(f"{v!r}D" for v in HLL_LC_TABLE) + ")"
    )
    return F.round(
        F.when(
            (est_raw <= 2.5 * HLL_M) & (n_empty > 0),
            F.element_at(lc_lit, n_empty.cast("int")),
        ).otherwise(est_raw),
        4,
    )


def hll_sql_parts(h_expr: str = "h") -> dict[str, str]:
    """DuckDB fragments mirroring the column helpers above — one
    definition for rho/state/estimate so the oracle constants cannot
    drift from the Spark side. Keys: ``bucket``, ``rho`` (select-list
    exprs over ``h_expr``), ``s_int``, ``n_empty`` (aggregates over a
    register frame with an ``m`` column), ``estimate`` (expr over
    emitted s_int/n_empty columns)."""
    lc = ", ".join(repr(v) for v in HLL_LC_TABLE)
    return {
        "bucket": f"{h_expr} % {HLL_M}",
        "rho": (
            f"CASE WHEN ({h_expr} >> 8) = 0 THEN 53 "
            f"ELSE 53 - length(bin({h_expr} >> 8)) END"
        ),
        "s_int": (
            f"CAST(sum(1::BIGINT << (53 - m)) "
            f"+ ({HLL_M} - count(*)) * (1::BIGINT << 53) AS BIGINT)"
        ),
        "n_empty": f"CAST({HLL_M} - count(*) AS BIGINT)",
        "estimate": (
            f"round(CASE WHEN {HLL_SCALE!r} / s_int <= {2.5 * HLL_M} "
            f"AND n_empty > 0 "
            f"THEN ([{lc}])[CAST(n_empty AS INTEGER)] "
            f"ELSE {HLL_SCALE!r} / s_int END, 4)"
        ),
    }
