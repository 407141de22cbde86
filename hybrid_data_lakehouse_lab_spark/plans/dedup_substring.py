"""Exact-substring deduplication: cross-document duplicated token spans.

The one dedup family the registry lacked relative to published LLM-data
practice: Lee et al., "Deduplicating Training Data Makes Language Models
Better" (arXiv:2107.06499) remove every token span of length >= 50 that
appears verbatim in more than one document, computed with a corpus-level
suffix array. A suffix array is a single global sort of every suffix —
exactly the kind of monolithic structure that does not shard. The
Spark-first equivalent uses rolling k-token grams and the identity that
a span of length L >= k is duplicated across documents iff every one of
its L-k+1 constituent k-grams is:

  1. explode each document into its k-token grams with positions
     (map-side only; O(total tokens) rows),
  2. one map-side-combined groupBy finds grams present in >= 2 distinct
     documents (corpus-wide boilerplate collapses to partial rows
     BEFORE its shuffle),
  3. a gram-keyed join marks each document's duplicated positions
     (output is linear in duplicated-gram occurrences — NOT a pair
     join, so a gram shared by 10^8 docs emits 10^8 rows, not 10^16),
  4. a per-document gaps-and-islands window merges runs of adjacent
     duplicated positions into MAXIMAL spans — the suffix array's
     output, restricted to spans >= k tokens.

Reference scope anchor: the reference corpus jobs end at row-level
hashes (`/root/reference/libs/scd2_spark_processor.py` hashes whole
records); sub-document span dedup is part of the training-data battery
this engine adds as first-class (brief: dedup family).

Scale notes (100 TB):
- The gram explode multiplies rows by ~tokens/doc but each row is
  (doc_id, pos, gram); at production k=50 the gram string would
  dominate shuffle bytes — substitute xxhash64(gram) as the group/join
  key there (64-bit collisions are ~1e-8 at 10^9 distinct grams and
  only ever MERGE two gram classes, never split). The lanes here keep
  the gram text as the key so the DuckDB oracle pairing is exact by
  construction, and document the hash swap as the scale variant.
- Three shuffles total: gram groupBy (partial-agg'd), gram join (both
  sides already keyed by gram), per-doc window (keyed by doc_id). No
  self-join, no cartesian, no global window.
- Skew: the gram-join's heaviest key carries one row per occurrence of
  the hottest duplicated gram — linear, and AQE skew-split handles a
  pathological boilerplate gram; there is no quadratic bucket to cap
  (contrast plans/dedup.py's pair lanes, which need SHINGLE_DF_CAP).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.util import fan_out
from ..sources import load_table
from .registry import register

#: Span gram width k. Lee et al. use 50 tokens on web corpora; the
#: synthetic documents table averages ~50 tokens/doc over a ~30-word
#: vocabulary, so k=6 puts the lane in the same engaged regime (real
#: duplicated spans exist, most positions are not duplicated) that
#: k=50 produces on web text. Semantics are identical at any k.
SPAN_K = 6


def _grams(d: DataFrame, k: int = SPAN_K) -> DataFrame:
    """(doc_id, pos, g): every k-token gram with its 1-based position.

    Docs shorter than k tokens emit nothing (guarded BEFORE sequence():
    Spark's sequence(1, n) with n < 1 counts DOWN, it does not return
    empty). fan_out first — gram construction is CPU-bound and a small
    scan is one partition (operators/util.py).
    """
    words = F.split("text", " ")
    toks = fan_out(d).select("doc_id", words.alias("ts")).where(
        F.size("ts") >= k
    )
    idx = F.sequence(F.lit(1), F.size("ts") - (k - 1))
    return toks.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    i.alias("pos"),
                    F.concat_ws(" ", F.slice("ts", i, k)).alias("g"),
                ),
            )
        ).alias("pg"),
    ).select("doc_id", F.col("pg.pos").alias("pos"), F.col("pg.g").alias("g"))


def _gram_cte(k: int = SPAN_K) -> str:
    """DuckDB twin of _grams over the documents view."""
    return f"""
    toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ), grams AS (
      SELECT doc_id, i AS pos,
             array_to_string(ts[i:i + {k - 1}], ' ') AS g
      FROM toks, UNNEST(range(1, len(ts) - {k - 2})) AS t(i)
      WHERE len(ts) >= {k}
    )"""


def _dup_spans(
    spark: SparkSession, sf_dir: str, hash_grams: bool = False
) -> DataFrame:
    """Shared relation: maximal cross-document duplicated spans.

    hash_grams=True is the 100 TB shuffle-byte variant: the group/join
    key becomes xxhash64(gram) — 8 bytes instead of a k-token string.
    A 64-bit collision can only MERGE two gram classes (an extra
    duplicated position, never a lost one) with probability ~1e-8 at
    10^9 distinct grams; the registered lane keeps the exact string key
    so the DuckDB oracle pairing holds by construction, and
    tests/test_dedup_substring.py proves both variants produce
    identical spans on the gate corpus."""
    d = load_table(spark, sf_dir, "documents")
    grams = _grams(d)
    if hash_grams:
        grams = grams.select(
            "doc_id", "pos", F.xxhash64("g").alias("g")
        )
    # Map-side-combined groupBy, NOT a count window: a boilerplate gram
    # in 10^8 docs collapses to <= #map-partitions partial rows before
    # the shuffle; the >=2 filter then shrinks the join's build side to
    # duplicated grams only.
    dup = (
        grams.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= 2)
    )
    hits = grams.join(dup, "g").select("doc_id", "pos", "n_docs")
    # Gaps-and-islands: adjacent duplicated positions share
    # pos - row_number(), so one per-doc window + groupBy merges runs
    # of duplicated k-grams into maximal spans.
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        hits.withColumn("island", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(SPAN_K - 1)).cast("long").alias("span_end"),
            (F.max("pos") - F.min("pos") + F.lit(SPAN_K))
            .cast("long")
            .alias("span_tokens"),
            F.max("n_docs").cast("long").alias("max_gram_docs"),
        )
        .select(
            "doc_id", "span_start", "span_end", "span_tokens", "max_gram_docs"
        )
    )


_SPANS_SQL = f"""
    WITH {_gram_cte()}, dup AS (
      SELECT g, count(DISTINCT doc_id) AS n_docs
      FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2
    ), hits AS (
      SELECT grams.doc_id, grams.pos, dup.n_docs
      FROM grams JOIN dup USING (g)
    ), islands AS (
      SELECT doc_id, pos, n_docs,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
               AS island
      FROM hits
    )
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + {SPAN_K - 1} AS BIGINT) AS span_end,
           CAST(max(pos) - min(pos) + {SPAN_K} AS BIGINT) AS span_tokens,
           CAST(max(n_docs) AS BIGINT) AS max_gram_docs
    FROM islands GROUP BY doc_id, island
"""


@register("dedup_substring_spans", oracle=_SPANS_SQL)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal token spans (>= SPAN_K tokens) each document shares
    verbatim with at least one other document — the exact-substring
    dedup primitive (Lee et al. 2021), re-expressed as rolling k-grams
    + gaps-and-islands instead of a suffix array. span_start/span_end
    are 1-based token offsets (inclusive); max_gram_docs is the widest
    cross-document fan-out of any gram inside the span."""
    return _dup_spans(spark, sf_dir)


@register(
    "dedup_substring_doc_stats",
    oracle=f"""
    WITH spans AS ({_SPANS_SQL}),
    per_doc AS (
      SELECT doc_id, count(*) AS dup_spans, sum(span_tokens) AS dup_tokens
      FROM spans GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           CAST(coalesce(p.dup_spans, 0) AS BIGINT) AS dup_spans,
           CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           CAST(coalesce(p.dup_tokens, 0) * 1000000
                // len(string_split(d.text, ' ')) AS BIGINT)
             AS dup_frac_ppm
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
)
def dedup_substring_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span rollup: how much of each document is
    covered by cross-document exact spans. The curation signal Lee et
    al. act on (cut or drop docs past a duplicated-fraction threshold);
    dup_frac_ppm is integer parts-per-million (house rule: micro-unit
    integer arithmetic, bit-identical across engines — no float ratios).
    Maximal spans from one island pass are disjoint by construction, so
    sum(span_tokens) never double-counts a token."""
    d = load_table(spark, sf_dir, "documents")
    per_doc = (
        _dup_spans(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("dup_spans"),
            F.sum("span_tokens").cast("long").alias("dup_tokens"),
        )
    )
    n_tokens = F.size(F.split("text", " ")).cast("long")
    return (
        d.select("doc_id", n_tokens.alias("n_tokens"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_spans", F.lit(0)).cast("long").alias("dup_spans"),
            F.coalesce("dup_tokens", F.lit(0))
            .cast("long")
            .alias("dup_tokens"),
            # integer floor division (`div`), matching the oracle's
            # `//` bit-for-bit — double `/` + cast can round up across
            # an integer boundary within one ulp of it
            F.expr(
                "coalesce(dup_tokens, 0L) * 1000000L div n_tokens"
            )
            .cast("long")
            .alias("dup_frac_ppm"),
        )
    )


@register("dedup_substring_spans_hashed", oracle=_SPANS_SQL)
def dedup_substring_spans_hashed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 100 TB shuffle-byte variant of `dedup_substring_spans` as a
    first-class oracle-paired lane: the gram group/join key is
    xxhash64(gram) — 8 bytes on the wire instead of a k-token string,
    which at production k=50 is the difference between shuffling ~8 B
    and ~300 B per gram occurrence. The oracle is the SAME exact-string
    spans SQL: a 64-bit collision could only MERGE two gram classes
    (an extra duplicated position, never a lost one) with probability
    ~1e-8 at 10^9 distinct grams, so hashed output is value-identical
    to the exact lane on any non-adversarial corpus — and the driver's
    hash compare proves it on every run, making the documented scale
    swap a verified equivalence instead of a docstring claim."""
    return _dup_spans(spark, sf_dir, hash_grams=True)
