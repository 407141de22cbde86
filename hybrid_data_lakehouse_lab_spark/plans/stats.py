"""Corpus statistical audits: Zipf-law fit over the term distribution
(degenerate/synthetic-corpus detector) and per-source decile drift
(distribution-shift monitor between ingestion sources).

Both are the checks a training-data pipeline runs per snapshot: a
natural-language corpus follows Zipf (rank-frequency log-log slope near
-1); machine-generated or template spam flattens or steepens it. Source
drift — one crawl's length distribution wandering from the corpus — is
the earliest signal of an upstream extraction regression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register

ZIPF_TOP = 100  # terms in the regression
DECILES = [i / 10 for i in range(1, 10)]


@register(
    "text_zipf_fit",
    oracle=f"""
    WITH terms AS (
      SELECT t.term
      FROM (SELECT string_split(text, ' ') AS toks FROM documents),
           UNNEST(toks) AS t(term)
    ),
    top AS (
      SELECT cnt, rnk FROM (
        SELECT count(*) AS cnt,
               row_number() OVER (ORDER BY count(*) DESC, term) AS rnk
        FROM terms GROUP BY term
      ) WHERE rnk <= {ZIPF_TOP}
    ),
    pts AS (SELECT ln(rnk) AS x, ln(cnt) AS y FROM top),
    fit AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4)
             AS intercept,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4)
             BETWEEN -1.5 AND -0.5 AS zipf_like
    FROM fit
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS fit of ln(frequency) against ln(rank) over the top-100 terms:
    slope ≈ -1 is Zipf — the natural-language signature; a flat or
    cliff-edge slope flags template spam or synthetic filler. The
    zipf_like verdict compares the ROUNDED slope so both engines agree
    even at the band edge.

    100 TB plan shape: term counts are one map-side-combined aggregate;
    the top-100 cut is a WindowGroupLimit (per-partition partial top-k,
    then merge — no vocabulary-sized single-partition sort); the
    regression itself is a 1-row aggregate of 100 points.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), "term")
    top = (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= ZIPF_TOP)
        .select(F.log("rnk").alias("x"), F.log("cnt").alias("y"))
    )
    fit = top.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return fit.select(
        F.col("n").cast("bigint").alias("n_terms"),
        F.round(slope, 4).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 4).alias(
            "intercept"
        ),
        F.round(slope, 4).between(-1.5, -0.5).alias("zipf_like"),
    )


_DECILE_COLS_SQL = ",\n           ".join(
    f"round(quantile_cont(n_chars, {q}), 2) AS p{int(q * 100)}" for q in DECILES
)
_LINF_SQL = "greatest(" + ", ".join(
    f"abs(s.p{int(q * 100)} - g.p{int(q * 100)})" for q in DECILES
) + ")"


@register(
    "corpus_drift_deciles",
    oracle=f"""
    WITH per_src AS (
      SELECT source, {_DECILE_COLS_SQL}
      FROM documents GROUP BY source
    ),
    global AS (
      SELECT {_DECILE_COLS_SQL}
      FROM documents
    )
    SELECT s.source,
           {", ".join(f"s.p{int(q * 100)}" for q in DECILES)},
           round({_LINF_SQL}, 2) AS linf_vs_global
    FROM per_src s CROSS JOIN global g
    ORDER BY s.source
    """,
)
def corpus_drift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length deciles plus the L∞ distance to the
    corpus-global deciles — the Kolmogorov-style drift score a pipeline
    alerts on when one source's extraction starts producing truncated
    (or bloated) documents.

    100 TB plan shape: two aggregates over one scan subtree (per-source
    and global percentile state are both bounded); the global row is a
    1-row broadcast back over the |sources|-row relation. Exact
    interpolated percentiles match DuckDB's quantile_cont — the same
    cross-engine contract quantiles_by_group uses.
    """
    d = load_table(spark, sf_dir, "documents")

    def dec_cols():
        return [
            F.round(F.expr(f"percentile(n_chars, {q})"), 2).alias(f"p{int(q * 100)}")
            for q in DECILES
        ]

    per_src = d.groupBy("source").agg(*dec_cols())
    glob = d.agg(*[c.alias(f"g{int(q * 100)}") for c, q in zip(dec_cols(), DECILES)])
    linf = F.greatest(
        *[
            F.abs(F.col(f"p{int(q * 100)}") - F.col(f"g{int(q * 100)}"))
            for q in DECILES
        ]
    )
    return (
        per_src.join(F.broadcast(glob))
        .select(
            "source",
            *[f"p{int(q * 100)}" for q in DECILES],
            F.round(linf, 2).alias("linf_vs_global"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Table content fingerprint — order-insensitive checksum for replication
# / migration validation. Two engines (or two clusters) that disagree on
# a single row disagree on the fingerprint; the oracle comparison of
# this very lane IS the cross-engine validation it implements.
# ---------------------------------------------------------------------------
def _hash40(row: F.Column) -> F.Column:
    """40-bit md5-prefix row hash — the ONE definition both fingerprint
    lanes use (table-level and per-partition), so they stay provably
    comparable."""
    return F.conv(F.substring(F.md5(row), 1, 10), 16, 10).cast("bigint")


def _row_hash_sql(concat: str) -> str:
    """40-bit per-row hash (DuckDB dialect). Row hashes are summed in
    UNBOUNDED precision (DuckDB HUGEINT / Spark decimal(38,0) — see
    ``_fp_sum``): a plain BIGINT sum of ~2^39-mean values overflows at
    roughly 1.7e7 rows, and Spark 4 runs ANSI so the overflow would
    THROW mid-migration-check rather than wrap."""
    return f"('0x' || substr(md5({concat}), 1, 10))::BIGINT"


#: Largest prime below 2^63. The unbounded-precision hash sum is reduced
#: mod this prime so the published fingerprint fits BIGINT in both
#: engines at ANY row count. A single-row difference can never hide in
#: the reduction: the delta of two 40-bit row hashes is < 2^40 << p, so
#: it is nonzero mod p.
_FP_MOD = 9223372036854775783


def _fp_sum(h: F.Column) -> F.Column:
    """Overflow-proof commutative fingerprint: sum 40-bit row hashes as
    decimal(38,0) (good to ~1e26 rows; ANSI-safe), reduce mod _FP_MOD,
    publish as BIGINT. DuckDB twin: ``CAST(sum(h) % p AS BIGINT)`` —
    DuckDB sums BIGINT into HUGEINT natively, and both engines truncate
    toward zero on non-negative operands, so the values match exactly."""
    return (F.sum(h.cast("decimal(38,0)")) % F.lit(_FP_MOD)).cast("bigint")


def _fp_sum_sql(col: str = "h") -> str:
    """DuckDB twin of ``_fp_sum`` (HUGEINT accumulate, mod, BIGINT)."""
    return f"CAST(sum({col}) % {_FP_MOD} AS BIGINT)"


@register(
    "table_content_fingerprint",
    oracle=f"""
    WITH o AS (
      SELECT {_row_hash_sql("concat_ws('|', o_orderkey, o_custkey, o_orderstatus,"
                            " CAST(round(o_totalprice * 100) AS BIGINT),"
                            " epoch_us(o_orderdate), o_orderpriority)")} AS h
      FROM orders
    ),
    c AS (
      SELECT {_row_hash_sql("concat_ws('|', c_custkey, c_name, c_nationkey,"
                            " CAST(round(c_acctbal * 100) AS BIGINT), c_mktsegment)")} AS h
      FROM customer
    )
    SELECT 'customer' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
           {_fp_sum_sql()} AS fingerprint
    FROM c
    UNION ALL
    SELECT 'orders', CAST(count(*) AS BIGINT), {_fp_sum_sql()}
    FROM o
    ORDER BY table_name
    """,
)
def table_content_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content checksum per table: serialize each row
    canonically (integers and strings verbatim, money as exact cents,
    timestamps as exact epoch MICROSECONDS — unix_micros/epoch_us agree
    bit-for-bit across engines, whereas whole-second epoch() ROUNDS in
    DuckDB but TRUNCATES in Spark on sub-second values), hash to 40
    bits, SUM in unbounded precision, reduce mod a fixed 63-bit prime.
    Commutative addition makes the fingerprint independent of
    partitioning, file order, and parallelism — two copies of a table
    match iff the fingerprints match (modulo 2^40-collision odds).

    This is the end-of-migration check a replication pipeline runs
    between source and target warehouse — and the lane's own DuckDB
    oracle run IS that check, across two unrelated engines.

    100 TB plan shape: embarrassingly parallel map-side hashing, one
    1-row aggregate per table; no shuffle of row data at all.
    """

    def fp(df: DataFrame, concat: F.Column, name: str) -> DataFrame:
        h = _hash40(concat)
        return df.select(h.alias("h")).agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
            _fp_sum(F.col("h")).alias("fingerprint"),
        )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    o_concat = F.concat_ws(
        "|",
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("bigint"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")),
        "o_orderpriority",
    )
    c_concat = F.concat_ws(
        "|",
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint"),
        "c_mktsegment",
    )
    return (
        fp(c, c_concat, "customer")
        .unionByName(fp(o, o_concat, "orders"))
        .orderBy("table_name")
    )


@register(
    "fingerprint_partition_diff_demo",
    oracle="""
    WITH mutated_day AS (
      SELECT CAST(min(ts)::DATE AS VARCHAR) AS d FROM events
      WHERE event_id = (SELECT min(event_id) FROM events)
    )
    SELECT CAST(e.ts::DATE AS VARCHAR) AS day,
           CAST(e.ts::DATE AS VARCHAR) = m.d AS diverged
    FROM events e CROSS JOIN mutated_day m
    GROUP BY 1, 2 ORDER BY day
    """,
)
def fingerprint_partition_diff_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy repair scoping: per-PARTITION (per-day) fingerprints
    of two copies of the events table — one pristine, one with a single
    mutated row — joined day-against-day. Exactly the mutated row's day
    diverges; every other day hash-matches, so a repair job re-syncs ONE
    partition instead of the table. This is the partition-granular
    extension of table_content_fingerprint (same canonical row hash,
    grouped by the partition key instead of globally).

    The oracle states the expected diff declaratively: the day of the
    minimum event_id (the row the demo mutates) and no other.

    100 TB plan shape: two map-side hash passes + one |days|-row join.
    Locating divergence costs two scans and moves |days| rows — the
    re-copy cost is then proportional to the DAMAGE, not the table.
    """
    ev = load_table(spark, sf_dir, "events")
    target = ev.agg(F.min("event_id").alias("mid"))
    mutated = ev.join(F.broadcast(target)).select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.when(F.col("event_id") == F.col("mid"), F.col("value") + 1.0)
        .otherwise(F.col("value"))
        .alias("value"),
    )

    def day_fp(df: DataFrame) -> DataFrame:
        row = F.concat_ws(
            "|",
            "event_id",
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")),
            F.round(F.col("value") * 10000).cast("bigint"),
        )
        h = _hash40(row)
        return (
            df.groupBy(F.col("ts").cast("date").cast("string").alias("day"))
            .agg(_fp_sum(h).alias("fp"))
        )

    a = day_fp(ev).withColumnRenamed("fp", "fp_a")
    b = day_fp(mutated).withColumnRenamed("fp", "fp_b")
    return (
        a.join(b, "day")
        .select("day", (F.col("fp_a") != F.col("fp_b")).alias("diverged"))
        .orderBy("day")
    )
