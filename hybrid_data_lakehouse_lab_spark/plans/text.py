"""Text-analysis extension lane (documents table) — part of the 100 TB
training-data pipeline surface: token counting, quality scoring,
language-ID heuristic, document fingerprinting.

All operators are pure pyspark.sql.functions (JVM-side, codegen) — no
Python UDFs in this lane. Oracles are exact DuckDB twins; regexes avoid
dialect differences (DuckDB regexp_replace needs the 'g' flag for global).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.util import FAN_OUT_MIN_BYTES, fan_out
from ..sources import load_table
from .registry import register

# Tiny stopword list shared by both dialects (enough for scoring).
STOPWORDS = ["the", "a", "of", "and", "to", "in"]
_SW_SQL = "', '".join(STOPWORDS)


@register(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_measured,
           n_chars
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_measured"),
        "n_chars",
    )


@register(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           round(CAST(len(list_filter(string_split(text, ' '), w -> w IN ('{_SW_SQL}'))) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS stopword_ratio,
           round(CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')), 6) AS avg_token_len,
           CAST(len(string_split(text, ' ')) BETWEEN 10 AND 1000 AS BOOLEAN) AS len_ok
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(sw, w)))
    return d.select(
        "doc_id",
        F.round(n_stop.cast("double") / F.size(toks), 6).alias("stopword_ratio"),
        F.round(F.length("text").cast("double") / F.size(toks), 6).alias("avg_token_len"),
        F.size(toks).between(10, 1000).alias("len_ok"),
    )


# Marker-word language heuristic: deterministic n-gram-free scorer usable
# at 100 TB (pure column ops; no model). Real corpora would swap in a
# char-n-gram profile — the plumbing (score → argmax) is identical.
_MARKERS = {
    "en": ["the", "fast", "key"],
    "es": ["order", "sort", "table"],
}


@register(
    "text_lang_id",
    oracle="""
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN len(list_filter(string_split(text, ' '), w -> w IN ('the', 'fast', 'key')))
                     >= len(list_filter(string_split(text, ' '), w -> w IN ('order', 'sort', 'table')))
                THEN 'en' ELSE 'es' END AS predicted_lang
    FROM documents
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    def score(words: list[str]):
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda w: F.array_contains(arr, w)))

    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.when(score(_MARKERS["en"]) >= score(_MARKERS["es"]), "en")
        .otherwise("es")
        .alias("predicted_lang"),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # size-gated fan_out: md5+regex per doc parallelizes once the
    # corpus is past the shuffle crossover (see FAN_OUT_MIN_BYTES)
    d = fan_out(
        load_table(spark, sf_dir, "documents"), min_bytes=FAN_OUT_MIN_BYTES
    )
    normalized = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    return d.select("doc_id", F.md5(normalized).alias("fingerprint"))


# BPE-ish pre-tokenizer regex (GPT-2 style, lookahead-free so Java
# regex (Spark) and RE2 (DuckDB) agree): contraction tail, space-glued
# letter runs, digit runs, punctuation runs.
BPE_PATTERN = r"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


@register(
    "text_token_count_bpe",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{BPE_PATTERN.replace("'", "''")}')) AS INT)
             AS n_bpe_tokens,
           CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens
    FROM documents
    """,
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-word-style token counting with a BPE pre-tokenizer regex —
    the training-cost estimator that whitespace counts understate on
    punctuation/digit-heavy text. Pure regexp_extract_all: map-side,
    codegen, no shuffle."""
    d = fan_out(
        load_table(spark, sf_dir, "documents"), min_bytes=FAN_OUT_MIN_BYTES
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0)).alias(
            "n_bpe_tokens"
        ),
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
    )


@register(
    "text_tfidf_top_terms",
    oracle="""
    WITH terms AS (
      SELECT doc_id, t.term
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           UNNEST(toks) AS t(term)
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(n.n_docs / df.df), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, rnk
    FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INT) AS rnk
      FROM scored)
    WHERE rnk <= 3
    ORDER BY doc_id, rnk
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by tf-idf.

    Plan: the explode runs twice — tf groups on (doc, term) (hot terms
    spread across docs, uniform) and df groups on term with MAP-SIDE
    COMBINE, so a stopword's postings collapse to ≤ #map-partitions
    partials before the shuffle. df then joins back as a broadcast, so
    the tf relation is never shuffled by bare term (a term-keyed
    exchange — join or count-window — would put df("the") ≈ n_docs rows
    in one task; never window a Zipf key). On a corpus whose vocabulary
    outgrows the broadcast limit, drop the hint and AQE picks a
    sort-merge join. The doc-count scalar is a 1-row broadcast."""
    d = load_table(spark, sf_dir, "documents")
    terms = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = terms.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .orderBy("doc_id", "rnk")
    )


@register(
    "text_gopher_rules",
    oracle=f"""
    SELECT doc_id,
           n_words BETWEEN 20 AND 100000 AS word_count_ok,
           mean_word_len BETWEEN 2.5 AND 10.0 AS word_len_ok,
           n_stop_kinds >= 2 AS stopword_ok,
           rep_frac * 10 < 6 AS repetition_ok,
           (n_words BETWEEN 20 AND 100000)
             AND (mean_word_len BETWEEN 2.5 AND 10.0)
             AND n_stop_kinds >= 2
             AND rep_frac * 10 < 6 AS keep
    FROM (
      SELECT doc_id,
             len(words) AS n_words,
             round((length(text) - (len(words) - 1)) * 1.0 / len(words), 6) AS mean_word_len,
             len(list_intersect(list_distinct(words), ['{_SW_SQL}'])) AS n_stop_kinds,
             round(1.0 - len(list_distinct(words)) * 1.0 / len(words), 6) AS rep_frac
      FROM (SELECT doc_id, text, string_split(text, ' ') AS words FROM documents))
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule battery (Rae et al. 2021, arXiv:2112.11446 §A1.1):
    per-document boolean quality gates — word-count bounds, mean-word-length
    bounds, minimum distinct-stopword evidence, and a repeated-word cap —
    plus the conjunctive ``keep`` verdict pretraining filters act on.

    Thresholds are adapted to the synthetic corpus (Gopher's originals
    are 50–100k words, 3–10 chars, ≥2 stopwords, <60% repetition); the
    rule *structure* is the operator under test. Verdicts use integer /
    rounded arithmetic so the oracle hash is float-stable.

    100 TB: pure per-row higher-order-function pipeline — no shuffle, no
    explode; every rule shares one tokenization inside whole-stage
    codegen, so adding rules costs arithmetic, not passes.
    """
    d = load_table(spark, sf_dir, "documents")
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    toks = F.split("text", " ")
    base = d.select(
        "doc_id",
        F.size(toks).alias("n_words"),
        F.round(
            (F.length("text") - (F.size(toks) - 1)) / F.size(toks).cast("double"), 6
        ).alias("mean_word_len"),
        F.size(F.array_intersect(F.array_distinct(toks), sw)).alias("n_stop_kinds"),
        F.round(
            1.0 - F.size(F.array_distinct(toks)) / F.size(toks).cast("double"), 6
        ).alias("rep_frac"),
    )
    word_count_ok = F.col("n_words").between(20, 100000)
    word_len_ok = F.col("mean_word_len").between(2.5, 10.0)
    stopword_ok = F.col("n_stop_kinds") >= 2
    repetition_ok = F.col("rep_frac") * 10 < 6
    return base.select(
        "doc_id",
        word_count_ok.alias("word_count_ok"),
        word_len_ok.alias("word_len_ok"),
        stopword_ok.alias("stopword_ok"),
        repetition_ok.alias("repetition_ok"),
        (word_count_ok & word_len_ok & stopword_ok & repetition_ok).alias("keep"),
    )
