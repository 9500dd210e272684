"""Corpus observability: one call → a tall (metric, value) frame of
the statistics a curation run is steered by. Pipelines at 100 TB are
flown on these dashboards — doc/token volumes, length distribution,
duplication rate, per-domain mix — and every number here is computed
with the package's scale-shaped operators, then unioned into one
small result:

- volumes + length moments: one aggregate pass (map-side partial);
- exact length percentiles: operators/ranking.exact_percentiles
  (range-partitioned ranking, never a value-buffering percentile());
- exact-dup rate: the q19 fingerprint groupBy, reduced to a ratio;
- per-stratum mix: one groupBy over the stratum column.

The result is a metric table, not a report string — write it to a
sink and diff it between pipeline runs. Value-checked end-to-end as
q73 (the oracle recomputes every metric in SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, token_count
from .ranking import exact_percentiles


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stratum_col: str | None = None,
    length_quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Tall (metric string, value double) corpus summary:

    - ``n_docs``, ``n_tokens``, ``avg_tokens`` (rounded to 6)
    - ``p{q}_tokens`` — EXACT token-count percentiles
    - ``exact_dup_rate`` — 1 − distinct fingerprints / docs (rounded)
    - ``docs_{stratum}={v}`` — per-stratum doc counts (optional)

    Tie-break for the percentiles is (token_count, id) so the picked
    row is deterministic and engine-portable."""
    tc = token_count(text_col).alias("__tc")
    base = df.select(F.col(id_col), tc, fingerprint(text_col).alias("__fp"))

    volumes = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("__tc").cast("double").alias("n_tokens"),
        F.round(F.avg("__tc"), 6).alias("avg_tokens"),
        F.round(
            1 - F.count_distinct(F.col("__fp")) / F.count(F.lit(1)), 6
        ).alias("exact_dup_rate"),
    )
    tall = volumes.unpivot([], list(volumes.columns), "metric", "value")

    pctl = exact_percentiles(
        base, "__tc", list(length_quantiles), tiebreak=F.col(id_col)
    )
    pct = pctl.select(
        # round BEFORE the int cast: 0.95*100 is 94.999… in binary and
        # Spark's double→int cast truncates (DuckDB's rounds)
        F.concat(F.lit("p"), F.round(F.col("q") * 100).cast("int").cast("string"),
                 F.lit("_tokens")).alias("metric"),
        F.col("value").cast("double").alias("value"),
    )
    out = tall.unionByName(pct)

    if stratum_col is not None:
        mix = df.groupBy(stratum_col).agg(
            F.count(F.lit(1)).cast("double").alias("value")
        ).select(
            F.concat(
                F.lit(f"docs_{stratum_col}="), F.col(stratum_col).cast("string")
            ).alias("metric"),
            "value",
        )
        out = out.unionByName(mix)
    # pass the ranking recipe's persisted-frame release hook through
    # (operators/cache.py contract) — without it the range-partitioned
    # copy of `base` could never be unpersisted by the caller
    from .cache import attach_cleanup

    return attach_cleanup(out, pctl.cleanup)
