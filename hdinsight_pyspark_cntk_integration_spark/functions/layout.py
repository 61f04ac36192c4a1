"""Data-layout keys: Morton (Z-order) interleaving for multi-column
data skipping.

Sorting a table by the interleaved bits of two filter columns clusters
rows so that BOTH columns' parquet min/max row-group stats stay tight —
a range filter on either column then skips most row groups, where a
plain lexicographic sort only helps its leading column. This is the
layout story behind Delta/Iceberg ``OPTIMIZE ZORDER BY``; here it is a
pure Catalyst bit-arithmetic expression (codegen'd, shuffle-free) fed to
``sources.io.write_zordered``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Parallel-bit-spread magic masks: 16 input bits -> even bit positions of
# a 32-bit lane (the classic "interleave by magic numbers" sequence).
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def spread_bits16(col: Column | str) -> Column:
    """Spread the low 16 bits of a non-negative integer into the even bit
    positions of a 32-bit lane (b_i moves to position 2i). Pure shifts
    and masks — identical semantics in any engine with 64-bit integer
    ops, so the oracle reproduces it bit-for-bit."""
    x = _col(col).cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_key2(a: Column | str, b: Column | str) -> Column:
    """Morton key of two 16-bit-quantized columns: interleave a's bits
    into even positions and b's into odd. Callers quantize first
    (``pmod(col, 65536)`` or a rank bucket) — quantization choice is the
    caller's skew lever."""
    return spread_bits16(a).bitwiseOR(F.shiftleft(spread_bits16(b), 1))


def spread_bits16_sql(expr: str) -> str:
    """SQL-text twin of ``spread_bits16`` (ANSI bit ops, DuckDB/Spark
    compatible)."""
    x = f"(CAST({expr} AS BIGINT) & 65535)"
    for shift, mask in _SPREAD:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def zorder_key2_sql(a: str, b: str) -> str:
    """SQL-text twin of ``zorder_key2``."""
    return f"({spread_bits16_sql(a)} | ({spread_bits16_sql(b)} << 1))"
