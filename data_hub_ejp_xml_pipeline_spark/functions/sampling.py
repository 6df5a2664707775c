"""Deterministic, engine-portable hash sampling/splitting.

ONE idiom, two renderings: a row's sampling score is the first 7 hex
chars of ``md5(CAST(id AS string))`` read as an integer, taken modulo a
basis. Both renderings are byte-identical in semantics, so a DuckDB
oracle reproduces exactly the rows a Spark-side sample selects — the
contract every sampled/split query in this repo depends on. Change the
idiom HERE or nowhere (five call sites pin cross-engine parity on it).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_mod_col(id_col: Column | str, basis: int) -> Column:
    """Spark: ``conv(substr(md5(cast(id as string)), 1, 7), 16, 10) % basis``."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 7), 16, 10).cast("long")
        % basis
    )


def md5_mod_sql(id_expr: str, basis: int) -> str:
    """DuckDB rendering of the same score (hex prefix → BIGINT → mod)."""
    return (
        f"(('0x' || substring(md5(CAST({id_expr} AS VARCHAR)), 1, 7))::BIGINT "
        f"% {basis})"
    )


# sampling fractions quantize to basis points (1/10000): fine enough for
# any realistic train_fraction while keeping the threshold an integer
# both engines compare identically
SAMPLE_BASIS = 10_000


def sample_threshold(fraction: float) -> int:
    """``fraction`` → integer threshold in basis points; refuses a
    fraction that quantizes to an EMPTY sample (silent empty results are
    the failure mode this guards)."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    thr = int(round(fraction * SAMPLE_BASIS))
    if thr == 0:
        raise ValueError(
            f"fraction {fraction} quantizes to an empty sample "
            f"(< 1/{SAMPLE_BASIS}); raise it or change SAMPLE_BASIS"
        )
    return thr
