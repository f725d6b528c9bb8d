"""Data-layout helpers: Z-order (Morton) clustering for multi-column scan
pruning.

A parquet row group can be skipped when its min/max stats exclude the
filter. Sorting by ONE column makes that column's stats selective and
leaves every other column's range spanning the whole file — a filter on
the second column prunes nothing. Interleaving the bits of several
columns (the Z-order curve — Morton 1966; Delta Lake's OPTIMIZE ZORDER,
Databricks' data-skipping recipe) makes EACH participating column's
range small within any contiguous chunk of the sort order, so filters on
any subset of the columns skip row groups.

``zorder_key`` is a pure JVM expression (shiftleft/or chains — no UDF, no
shuffle of its own): add it as a column and ``sortWithinPartitions`` on
it before writing (the same slot as ``write_overwrite(sort_by=...)``).
Columns must already be NON-NEGATIVE INTEGER surrogates of bounded width
— map domain values onto a grid first (truncate timestamps to epoch
buckets, quantize floats to fixed-point, hash-bucket strings).
Range-id assignment via global quantiles is deliberately NOT built in:
computing exact global ranks needs a global sort (the cost Z-ordering
exists to avoid); at scale derive grid cells from static domain knowledge
or a sampled-quantile map, both shuffle-free per row.

The locality property (consecutive chunks of the z-order have small
per-column spans, so chunk min/max stats prune on EVERY dimension) is
pinned in ``tests/test_layout.py`` against a lexicographic-sort control.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Morton-interleave ``bits`` low bits of each column into one long.

    Bit layout: output bit ``i * len(cols) + j`` = bit ``i`` of column
    ``j`` — dimension 0 occupies the least-significant position of each
    group, so equal-width dimensions contribute symmetrically to the
    curve. ``len(cols) * bits`` must fit in 63 bits (raises otherwise).
    Out-of-range inputs (negative or >= 2^bits) raise at execution time
    rather than silently aliasing distant grid cells onto each other.
    """
    ncols = len(cols)
    if ncols == 0:
        raise ValueError("zorder_key needs at least one column")
    if ncols * bits > 63:
        raise ValueError(f"{ncols} cols x {bits} bits exceeds a signed long")
    limit = 1 << bits
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        col = col.cast("long")
        # NULL must raise too: a NULL comparison is falsy in when(), so
        # without the explicit isNull the guard would silently emit NULL
        # keys and cluster every NULL row together unnoticed.
        guard = F.when(
            col.isNull() | (col < 0) | (col >= limit),
            F.raise_error(
                F.concat(
                    F.lit(f"zorder_key: NULL or out-of-[0, {limit}) value for {bits}-bit dim {j}: "),
                    F.coalesce(col.cast("string"), F.lit("NULL")),
                )
            ).cast("long"),
        ).otherwise(col)
        for i in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(guard, i).bitwiseAND(F.lit(1)), i * ncols + j)
            )
    return out


def grid_surrogate(col: Column | str, lo: float, hi: float, bits: int = 16) -> Column:
    """Map a bounded numeric/timestamp-epoch column onto the [0, 2^bits)
    integer grid ``zorder_key`` consumes: linear quantization against the
    STATIC domain bounds [lo, hi] — shuffle-free (every executor decides
    locally from constants), unlike rank/quantile normalization which
    needs the global sort Z-ordering exists to avoid. Values are clamped
    to the bounds (out-of-domain stragglers land in the edge cells rather
    than failing the write); NULLs and NaNs stay NULL (route them to a
    dedicated partition or filter them out before z-ordering —
    zorder_key raises loudly on NULL input).

    Bounds come from domain knowledge (timestamps: the table's retention
    window; lat/lon: the service region) or a one-off sampled min/max —
    precision beyond "cells distribute the data" is not required, the
    curve only needs a consistent grid.
    """
    if not hi > lo:
        raise ValueError(f"grid_surrogate needs hi > lo, got [{lo}, {hi}]")
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    cells = (1 << bits) - 1
    scaled = F.floor((c - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(float(cells + 1)))
    # greatest/least IGNORE nulls (they return the extreme non-null), which
    # would silently clamp NULL inputs into cell 0; and floor(NaN) casts to
    # long 0 in Spark, aliasing NaN onto real lo-edge values — keep both
    # NULL so downstream routing (and zorder_key's guard) sees them.
    clamped = F.least(F.greatest(scaled, F.lit(0)), F.lit(cells)).cast("long")
    return F.when(c.isNull() | F.isnan(c), F.lit(None).cast("long")).otherwise(clamped)
