"""Z-order (Morton-interleaved) lake layout for multi-dimensional skipping.

A compound sort key (``scale.write_range_sorted``) gives tight parquet
min/max statistics on the FIRST sort column only — a predicate on the
second column still reads every file. Interleaving the bits of both keys
into one Morton code and range-sorting on THAT gives every file a small
rectangle in (a, b) space, so predicates on EITHER column (or both) skip
most files at 100 TB. This is the layout Delta/Iceberg expose as
``OPTIMIZE ... ZORDER BY``; here it is plain Spark: a bit-twiddling column
expression + ``repartitionByRange`` — no new physical operator needed, and
the codes never leave whole-stage codegen.

The Morton code is deterministic integer arithmetic, so the DuckDB oracle
recomputes identical codes (both engines use two's-complement BIGINT
shifts), making the layout itself driver-verifiable — not just its effect.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative longs:
    bit i of ``a`` lands at position 2i+1, bit i of ``b`` at 2i.

    Built as a balanced sum of shifted masked bits — ~4*bits stateless
    integer ops per row, all inside codegen. Inputs are masked to ``bits``
    so out-of-range values wrap rather than corrupt high bits.
    """
    a = a.cast("long") % (1 << bits)
    b = b.cast("long") % (1 << bits)
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        parts.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i))
    return reduce(lambda x, y: x + y, parts)


def morton_sql(a: str, b: str, bits: int = 16) -> str:
    """DuckDB SQL for the identical Morton code (oracle mirror)."""
    # NB: in DuckDB/Postgres, + binds TIGHTER than <<, so every shifted
    # term must be fully parenthesized before joining with +.
    terms = []
    for i in range(bits):
        terms.append(f"(((({a} % {1 << bits}) >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"(((({b} % {1 << bits}) >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


def write_zorder(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write parquet Z-ordered on two integer columns.

    Each output file covers one Morton-code range = one small rectangle in
    key space, so parquet min/max stats are tight on BOTH columns and a
    predicate on either one prunes files/row-groups at the scan.
    ``tests/test_scale.py`` asserts the per-file span of each key is a
    fraction of the global span — the measurable skipping property.
    """
    if len(cols) != 2:
        raise ValueError("write_zorder interleaves exactly two columns")
    z = morton_code(F.col(cols[0]), F.col(cols[1]), bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
