"""Distributed exact statistics helpers.

``histogram_median`` exists because Spark's ``median``/``percentile``
aggregates are sort-bearing and buffer every group value: with a
low-cardinality group key, a handful of aggregation buffers carry the
whole table (straggler tasks that only worsen with scale). When the
VALUE column is low-cardinality too, the exact interpolated median
falls out of a (key, value) count histogram instead — map-side
combined, so the shuffle is bounded by |keys|×|values|, never the row
count (plans/curation.moment_aggregates rationale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def histogram_median(
    df: DataFrame, key: str, val: str, out: str = "median"
) -> DataFrame:
    """Exact interpolated median of ``val`` per ``key`` — one row per
    key, matching ``median(val)`` / ``quantile_cont(val, 0.5)`` exactly.

    Shape: (key, value) count histogram → cumulative counts over the
    per-key value order (a window over histogram rows, not data rows) →
    the two middle ranks lo = floor((n+1)/2) and hi = floor(n/2)+1
    (equal when n is odd) located as the smallest value whose cumulative
    count reaches the rank; the median is their mean. NULL values are
    ignored, like the aggregate.

    Contract difference vs ``F.median``: a key whose values are ALL
    NULL has an empty histogram and therefore NO output row (the
    aggregate would keep the group with a null median). Callers needing
    aggregate parity must LEFT-join this frame to the group keys and
    read the null (see plans/curation.moment_aggregates).
    """
    hist = (
        df.filter(F.col(val).isNotNull())
        .groupBy(key, val)
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w_cum = (
        Window.partitionBy(key)
        .orderBy(val)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(key)
    cum = hist.withColumn("__cum", F.sum("__c").over(w_cum)).withColumn(
        "__n", F.sum("__c").over(w_all)
    )

    def v_at(r: Column) -> Column:
        return F.min(F.when(F.col("__cum") >= r, F.col(val)))

    lo = F.floor((F.col("__n") + 1).cast("double") / 2)
    hi = F.floor(F.col("__n").cast("double") / 2) + 1
    return cum.groupBy(key).agg(
        ((v_at(lo) + v_at(hi)).cast("double") / 2).alias(out)
    )
