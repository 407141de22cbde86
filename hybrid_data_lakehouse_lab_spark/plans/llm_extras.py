"""Additional LLM-training-data lanes: PII scrubbing, repetition-based
quality, eval-set contamination checks, embedding quantization, and the
first BPE merge step (adjacent-pair counts).

These extend the reference's analytics surface (which has no
document-pipeline operators at all — SURVEY §2 extension lanes) with the
operations a pretraining-data curation run needs beyond dedup/similarity.
All Spark-side work is built-in-function / codegen only — no Python UDFs.

Cross-engine determinism notes (the oracle pairs value-hash-compare):
* No rounded float ratios in outputs — Spark rounds binary doubles via
  BigDecimal HALF_UP while DuckDB multiplies by 10^d, which disagrees on
  boundary values. Integer counts + integer-arithmetic booleans instead.
* Truncation toward zero is spelled sign(x)*floor(abs(x)) because
  Spark's double→int CAST truncates while DuckDB's rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.util import fan_out
from ..sources import load_table
from .registry import register

# Synthetic PII suffix: the corpus itself is clean lowercase words, so the
# scrub lane appends a deterministic contact blob per doc — the regexes,
# replacement plan, and counting are what the lane exercises.
_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"\+1-555-\d{4}"


@register(
    "text_pii_scrub",
    oracle=f"""
    WITH raw AS (
        SELECT doc_id,
               text || ' contact user' || doc_id || '@example.com or +1-555-'
                    || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS raw_text
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(raw_text, '{_EMAIL_RE}'))
              + len(regexp_extract_all(raw_text, '{_PHONE_RE}')) AS INT) AS n_pii,
           md5(regexp_replace(regexp_replace(raw_text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g')) AS scrub_hash
    FROM raw
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII redaction (emails, phone patterns) with per-doc match
    counts; the scrubbed text is emitted as an md5 so the oracle compares
    exact scrub results without shipping bodies.

    100 TB: pure map-side regex work in codegen — scales linearly, no
    shuffle; the same plan shape as the reference-free text_normalize lane.
    """
    d = fan_out(load_table(spark, sf_dir, "documents"))
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(raw, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    n_pii = (F.regexp_count(raw, F.lit(_EMAIL_RE)) + F.regexp_count(raw, F.lit(_PHONE_RE))).cast(
        "int"
    )
    return d.select("doc_id", n_pii.alias("n_pii"), F.md5(scrubbed).alias("scrub_hash"))


@register(
    "text_repetition_ratio",
    oracle="""
    WITH tri AS (
        SELECT doc_id,
               list_transform(range(1, len(words) - 1),
                              i -> array_to_string(words[i:i+2], ' ')) AS tris
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    )
    SELECT doc_id,
           CAST(len(tris) AS INT) AS n_trigrams,
           CAST(len(list_distinct(tris)) AS INT) AS n_unique_trigrams,
           (len(tris) - len(list_distinct(tris))) * 10 >= 3 * len(tris) AS is_repetitive
    FROM tri
    WHERE len(tris) > 0
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-trigram quality signal: documents where ≥30% of word
    trigrams are repeats (the boilerplate/spam pattern every pretraining
    filter drops). The verdict is integer arithmetic — (n−u)·10 ≥ 3·n —
    so the oracle hash can't be broken by float rounding.

    100 TB: per-doc HOF pipeline (split → slide → distinct) entirely in
    codegen; no shuffle, no explode — state is one doc's trigram array.
    """
    d = fan_out(load_table(spark, sf_dir, "documents"))
    words = F.split("text", " ")
    idx = F.sequence(F.lit(1), F.size(words) - 2)
    tris = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, 3)))
    return (
        d.select("doc_id", tris.alias("tris"))
        .filter(F.size("tris") > 0)
        .select(
            "doc_id",
            F.size("tris").cast("int").alias("n_trigrams"),
            F.size(F.array_distinct("tris")).cast("int").alias("n_unique_trigrams"),
            (
                (F.size("tris") - F.size(F.array_distinct("tris"))) * 10
                >= F.size("tris") * 3
            ).alias("is_repetitive"),
        )
    )


@register(
    "corpus_contamination_check",
    oracle="""
    WITH sh AS (
        SELECT DISTINCT doc_id,
               array_to_string(words[i:i+2], ' ') AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
             UNNEST(range(1, len(words) - 1)) AS t(i)
    )
    SELECT t.doc_id AS train_doc_id,
           CAST(count(*) AS BIGINT) AS n_shared_shingles,
           count(*) >= 20 AS contaminated
    FROM (SELECT * FROM sh WHERE doc_id % 97 <> 0) t
    JOIN (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0) e USING (shingle)
    GROUP BY t.doc_id
    """,
)
def corpus_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination scan: word-trigram overlap between each
    train document and the (small) eval split — the decontamination pass
    every benchmark-respecting pretraining pipeline runs.

    100 TB: the eval shingle set is tiny (a benchmark suite), so it
    BROADCASTS — the train side never shuffles for the join; the only
    shuffle is the final per-doc count. Shingles are hash-joined, never
    pairwise-compared.
    """
    d = fan_out(load_table(spark, sf_dir, "documents"))
    words = F.split("text", " ")
    idx = F.sequence(F.lit(1), F.size(words) - 2)
    tris = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, 3)))
    sh = d.select("doc_id", F.explode(tris).alias("shingle")).distinct()
    train = sh.filter(F.col("doc_id") % 97 != 0)
    eval_sh = sh.filter(F.col("doc_id") % 97 == 0).select("shingle").distinct()
    return (
        train.join(F.broadcast(eval_sh), "shingle")
        .groupBy(F.col("doc_id").alias("train_doc_id"))
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
        .select(
            "train_doc_id",
            "n_shared_shingles",
            (F.col("n_shared_shingles") >= 20).alias("contaminated"),
        )
    )


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH m AS (
        SELECT vec_id,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs,
               embedding
        FROM embeddings
    )
    SELECT vec_id,
           CAST(maxabs AS DOUBLE) AS maxabs,
           list_transform(embedding,
               x -> CAST(sign(CAST(x AS DOUBLE) * 127.0 / nullif(maxabs, 0))
                       * floor(abs(CAST(x AS DOUBLE) * 127.0 / nullif(maxabs, 0)))
                     AS INT)) AS qvec
    FROM m
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column (the
    vector-store compression step): scale each vector by 127/max|x| and
    truncate toward zero. Truncation is spelled sign·floor·abs because
    Spark's double→int cast truncates while DuckDB's rounds — this form
    is identical in both engines, so the oracle compares exact codes.

    100 TB: map-side HOF over the vector column, no shuffle; output is
    ~4× smaller than float32, the point of the lane.
    """
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    x = lambda v: v.cast("double")  # noqa: E731
    maxabs = F.array_max(F.transform("embedding", lambda v: F.abs(x(v))))
    with_m = emb.select("vec_id", "embedding", maxabs.alias("maxabs"))
    p = lambda v: x(v) * F.lit(127.0) / F.nullif(F.col("maxabs"), F.lit(0.0))  # noqa: E731
    q = F.transform(
        "embedding",
        lambda v: (F.signum(p(v)) * F.floor(F.abs(p(v)))).cast("int"),
    )
    return with_m.select(
        "vec_id", F.col("maxabs").cast("double").alias("maxabs"), q.alias("qvec")
    )


@register(
    "bpe_pair_merge_counts",
    oracle="""
    WITH pairs AS (
        SELECT array_to_string(words[i:i+1], ' ') AS pair
        FROM (SELECT string_split(text, ' ') AS words FROM documents),
             UNNEST(range(1, len(words))) AS t(i)
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS n
    FROM pairs
    GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 20
    """,
)
def bpe_pair_merge_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE merge step at corpus scale: global adjacent-token-pair
    frequencies, top 20 (deterministic tie-break on the pair string).
    Iterating this lane (count → merge → re-count) is vocabulary
    induction; one step is the judged, oracle-paired unit.

    100 TB: explode to pairs → partial (map-side) count → one shuffle on
    the pair key → top-k via TakeOrderedAndProject, never a full sort.
    """
    d = fan_out(load_table(spark, sf_dir, "documents"))
    words = F.split("text", " ")
    idx = F.sequence(F.lit(1), F.size(words) - 1)
    pairs = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, 2)))
    return (
        d.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(20)
    )
