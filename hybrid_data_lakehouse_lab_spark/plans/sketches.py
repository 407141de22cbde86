"""Count-min sketch heavy hitters — the mergeable-sketch scale pattern.

At 100 TB you cannot afford an exact groupBy over a web-scale token
stream just to find the heavy hitters; a count-min sketch (Cormode &
Muthukrishnan 2005) replaces the |vocabulary|-sized aggregation state
with a fixed d×w counter grid that (a) updates map-side, (b) MERGES by
element-wise addition across partitions, executors, or streaming
micro-batches, and (c) never underestimates. This lane builds the grid
as a relational aggregate, answers point queries for the exact top
terms, and asserts the one-sided error guarantee in-engine.

Everything is integer arithmetic on md5-derived buckets (the repo's
standard cross-engine hash: first 8 hex chars → BIGINT), so Spark and
DuckDB agree bit-for-bit with no rounding contract at all.

The related exact sketch surface lives in plans/advanced.py
(`sketch_distinct_users`, HLL++ with an error-bound verdict).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register

CMS_D = 4  # hash rows
CMS_W = 1024  # buckets per row
TOP_N = 20  # heavy hitters reported

# Bucket of `term` under hash row i, Spark dialect. One md5 per
# (term, row); the '#i' salt makes the d rows independent.
def _bucket_spark(term: str, i: str) -> F.Column:
    h = F.md5(F.concat(F.col(term), F.lit("#"), F.col(i).cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % CMS_W).alias(
        "bucket"
    )


_BUCKET_SQL = (
    f"(('0x' || substr(md5(term || '#' || i), 1, 8))::BIGINT % {CMS_W})"
)


@register(
    "sketch_heavy_hitters_cmin",
    oracle=f"""
    WITH terms AS (
      SELECT t.term
      FROM (SELECT string_split(text, ' ') AS toks FROM documents),
           UNNEST(toks) AS t(term)
    ),
    exact AS (
      SELECT term, CAST(count(*) AS BIGINT) AS exact_cnt
      FROM terms GROUP BY term
    ),
    top AS (
      SELECT term, exact_cnt, rnk FROM (
        SELECT *, CAST(row_number() OVER (
          ORDER BY exact_cnt DESC, term) AS INT) AS rnk
        FROM exact
      ) WHERE rnk <= {TOP_N}
    ),
    counters AS (
      SELECT r.i, {_BUCKET_SQL} AS bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM terms, UNNEST(range(0, {CMS_D})) AS r(i)
      GROUP BY r.i, bucket
    ),
    probes AS (
      SELECT t.term, t.exact_cnt, t.rnk, r.i,
             {_BUCKET_SQL.replace("term ", "t.term ")} AS bucket
      FROM top t, UNNEST(range(0, {CMS_D})) AS r(i)
    ),
    est AS (
      SELECT p.term, p.exact_cnt, p.rnk, min(c.cnt) AS est_cnt
      FROM probes p JOIN counters c ON c.i = p.i AND c.bucket = p.bucket
      GROUP BY p.term, p.exact_cnt, p.rnk
    )
    SELECT term, exact_cnt, est_cnt, est_cnt >= exact_cnt AS never_underestimates, rnk
    FROM est ORDER BY rnk
    """,
)
def sketch_heavy_hitters_cmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a d=4 × w=1024 count-min sketch, point-queried
    for the exact top-{TOP_N} terms, with the sketch's one-sided
    guarantee (estimate ≥ true count) asserted as a verdict column.

    100 TB plan shape: the counter grid is ONE aggregate keyed
    (i, bucket) — map-side combine collapses every partition to ≤ d×w
    partial sums regardless of token volume, and grids from different
    partitions/streams merge by addition (the property that makes CMS
    the right tool for streaming heavy hitters; the exact `top` relation
    here exists only to grade the sketch, the way the recall audits
    grade the ANN lanes). Point queries join the d×w-row grid broadcast.
    """
    d = load_table(spark, sf_dir, "documents")
    terms = d.select(F.explode(F.split("text", " ")).alias("term"))
    rows = F.array(*[F.lit(i) for i in range(CMS_D)])
    # (term, i, bucket): each occurrence updates d counters
    upd = terms.select("term", F.explode(rows).alias("i")).select(
        "i", _bucket_spark("term", "i")
    )
    counters = upd.groupBy("i", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    exact = terms.groupBy("term").agg(F.count(F.lit(1)).alias("exact_cnt"))
    w = Window.orderBy(F.desc("exact_cnt"), "term")
    top = (
        exact.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_N)
    )
    probes = top.select(
        "term", "exact_cnt", "rnk", F.explode(rows).alias("i")
    ).select("term", "exact_cnt", "rnk", "i", _bucket_spark("term", "i"))
    est = (
        F.broadcast(probes)
        .join(counters, ["i", "bucket"])
        .groupBy("term", "exact_cnt", "rnk")
        .agg(F.min("cnt").alias("est_cnt"))
    )
    return est.select(
        "term",
        "exact_cnt",
        "est_cnt",
        (F.col("est_cnt") >= F.col("exact_cnt")).alias("never_underestimates"),
        "rnk",
    ).orderBy("rnk")
