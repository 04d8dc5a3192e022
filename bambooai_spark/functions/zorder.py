"""Z-order (Morton) multi-dimensional clustering keys.

Linear clustering (``writer._cluster``: range-partition + sort on the
cluster columns) gives min/max scan pruning on the LEADING column only —
the second column's per-file range spans nearly its whole domain, so a
filter on it skips nothing. Z-ordering interleaves the bits of each
column's quantile-bucket rank into one key; sorting by that key makes
every file cover a narrow range of EVERY participating column (each
dimension's per-file spread shrinks toward domain/2^(bits/k) instead of
domain), which is what multi-predicate data skipping needs. Same
mechanism as Delta Lake OPTIMIZE ZORDER BY; built here from plain
DataFrame expressions.

Pipeline per column (all JVM-side after one driver-side quantile probe):

1. ``approxQuantile`` computes ``2^bits − 1`` boundary values — ONE
   sketch-based pass over all requested columns together; the driver
   holds ``k · 2^bits`` doubles, independent of row count.
2. Each value maps to its bucket rank with a broadcast boundary-array
   ``size(filter(bounds, b -> b <= v))`` expression — quantile buckets,
   so skew cannot pile the corpus into few buckets the way fixed-width
   buckets would.
3. The per-column ranks interleave bit-by-bit (``shiftleft``/
   ``bitwiseOR`` chains) into one long.

NULLs rank below every boundary (bucket 0) and cluster together at the
low end. Column types must be numeric, boolean, date, or timestamp
(cast to double for the probe); strings have no quantile order here —
put them in the PARTITION columns or lead a linear clustering instead.

The key is computed from a SAMPLE-based sketch, so it is a layout hint,
not a stable value: never store it, always ``drop`` after sorting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_ZORDER_BITS = 8  # 256 quantile buckets per dimension
_CASTABLE = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType,
    T.DoubleType, T.DecimalType, T.BooleanType, T.DateType,
    T.TimestampType, T.TimestampNTZType,
)


def _as_double(col: str, dtype: T.DataType) -> Column:
    """The column as a double with the SAME ordering (quantile buckets
    only need order, not magnitude)."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(F.col(col)).cast("double")
    if isinstance(dtype, T.DateType):
        return F.datediff(F.col(col), F.lit("1970-01-01")).cast("double")
    return F.col(col).cast("double")


def zorder_key(
    df: DataFrame,
    cols: tuple[str, ...] | list[str],
    *,
    bits: int = DEFAULT_ZORDER_BITS,
    out_col: str = "_zkey",
    relative_error: float | None = None,
) -> DataFrame:
    """Return ``df`` with ``out_col`` (long) added: the Morton interleave
    of each column's ``2^bits``-quantile bucket rank. Sort/range-partition
    by it, then drop it (see module docstring).

    ``bits`` per dimension; the key needs ``bits · len(cols)`` bits and
    must fit a long (≤ 63). ``relative_error`` tunes the quantile probe
    (default ``1/2^(bits+2)`` — boundaries land within a quarter bucket).

    The quantile probe is an EAGER action over ``df``'s full lineage;
    when that lineage is expensive (not a plain scan), persist ``df``
    first or the downstream write recomputes it — ``write_corpus`` does
    exactly that around its zorder path.
    """
    cols = list(cols)
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if len(cols) == 1:
        # degenerate z-order IS linear order — skip the probe entirely
        raise ValueError(
            "zorder over one column is linear clustering — use "
            "cluster_by with the default strategy instead"
        )
    if bits < 1 or bits * len(cols) > 63:
        raise ValueError(
            f"bits*len(cols) must be in [1, 63], got {bits}*{len(cols)}"
        )
    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    schema = {f.name: f.dataType for f in df.schema.fields}
    for c in cols:
        if c not in schema:
            raise ValueError(f"no such column: {c!r}")
        if not isinstance(schema[c], _CASTABLE):
            raise TypeError(
                f"zorder column {c!r} has type {schema[c].simpleString()}; "
                "needs a quantile order (numeric/boolean/date/timestamp) — "
                "lead a linear clustering or partition by it instead"
            )
    nb = 1 << bits
    err = relative_error if relative_error is not None else 1.0 / (4 * nb)
    probes = [f"_zq_{i}" for i in range(len(cols))]
    probed = df.select(
        *[_as_double(c, schema[c]).alias(p) for c, p in zip(cols, probes)]
    )
    qs = [i / nb for i in range(1, nb)]
    # one sketch pass for ALL columns; NaNs are ignored by the sketch
    bounds = probed.stat.approxQuantile(probes, qs, err)

    ranks = []
    for c, p, bs in zip(cols, probes, bounds):
        # dedupe: skewed/low-cardinality data repeats boundaries. The
        # deduped rank (0..u) must then be RESCALED onto the full 0..nb−1
        # bucket space — raw it would occupy only the LOW bits and lose
        # its high interleave positions to the other columns entirely (a
        # 15-value column would z-sort as an afterthought of its partner)
        uniq = sorted({b for b in bs if b == b})  # drop NaN boundaries
        v = _as_double(c, schema[c])
        if not uniq:
            ranks.append(F.lit(0))  # constant/empty/all-NaN column
            continue
        barr = F.lit(uniq)
        raw = F.when(v.isNull() | F.isnan(v), F.lit(0)).otherwise(
            F.size(F.filter(barr, lambda b: b <= v))
        )
        ranks.append(
            F.floor(raw.cast("long") * F.lit(nb - 1) / F.lit(len(uniq)))
        )

    z = F.lit(0).cast("long")
    for bit in range(bits - 1, -1, -1):  # MSB first
        for r in ranks:
            z = F.shiftleft(z, 1).bitwiseOR(
                F.shiftright(r.cast("long"), bit).bitwiseAND(F.lit(1))
            )
    return df.withColumn(out_col, z)
