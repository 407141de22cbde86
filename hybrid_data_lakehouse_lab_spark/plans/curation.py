"""Corpus-curation pipeline: the training-data prep lanes composed
end-to-end into ONE query — the flagship of the 100 TB document surface.

Stages (each individually registered and oracle-paired elsewhere; this
query proves they compose):

1. quality gate    — token-count bounds (text.py:text_quality_score)
2. language gate   — marker-word lang-ID, keep 'en' (text.py:text_lang_id)
3. exact dedup     — normalized-fingerprint keeper, lowest doc_id wins
                     (text.py:text_fingerprint + dedup.py:dedup_exact)
4. near-dup drop   — MinHash LSH pairs with >= 2 matching bands among
                     survivors; the higher doc_id of each pair is dropped
                     (dedup.py:dedup_near_pairs_lsh)
5. emit            — curated doc_id, token count, fingerprint

Scale notes: stages 1-3 are one scan + one tiny-keyed shuffle
(fingerprint groups); stage 4's signature matrix is computed over the
ALREADY-FILTERED corpus, so the expensive shingle hashing runs on the
survivors only. The greedy doc_b drop is deterministic and single-pass;
full connected-component clustering (iterative) is intentionally out of
scope here — at scale that is a GraphFrames/iterative-join job keyed by
the same candidate pairs this query produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.util import DEFAULT_MAX_BUCKET, bucket_pairs, fan_out
from ..sources import load_table
from .dedup import minhash_long, minhash_sig_sql, shingles_sql
from .registry import register

_EN = "'the', 'fast', 'key'"
_ES = "'order', 'sort', 'table'"


@register(
    "corpus_curation_pipeline",
    oracle=f"""
    WITH survivors AS (
      SELECT doc_id, text,
             CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
      FROM documents
      WHERE len(string_split(text, ' ')) BETWEEN 10 AND 1000
        AND len(list_filter(string_split(text, ' '), w -> w IN ({_EN})))
         >= len(list_filter(string_split(text, ' '), w -> w IN ({_ES})))
    ),
    canon AS (
      SELECT * FROM survivors
      WHERE doc_id IN (SELECT min(doc_id) FROM survivors GROUP BY fingerprint)
    ),
    shingles AS ({shingles_sql("canon")}),
    sig AS ({minhash_sig_sql()}),
    near AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b ON a.seed = b.seed AND a.minhash = b.minhash
                            AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2
    )
    SELECT c.doc_id, c.n_tokens, c.fingerprint
    FROM canon c
    WHERE c.doc_id NOT IN (SELECT doc_b FROM near)
    ORDER BY c.doc_id
    """,
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents"))
    toks = F.split("text", " ")

    def score(words: list[str]) -> F.Column:
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda w: F.array_contains(arr, w)))

    survivors = (
        d.filter(F.size(toks).between(10, 1000))
        .filter(score(["the", "fast", "key"]) >= score(["order", "sort", "table"]))
        .select(
            "doc_id",
            "text",
            F.size(toks).alias("n_tokens"),
            F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))).alias(
                "fingerprint"
            ),
        )
    )
    # Keeper selection is a window-min on the fingerprint partition — the
    # keeper SET is corpus-sized, so a groupBy+semi-join (let alone a
    # broadcast) would shuffle it twice; the window does it in one.
    # canon is referenced TWICE (signature side + final anti-join side)
    # and Spark reuses no subtrees across join branches, so without the
    # pin the scan→gates→md5→window chain runs twice (measured 2× scans,
    # 1.43 s vs 0.73 s at sf0.1). localCheckpoint here IS the
    # materialize-the-curated-corpus-between-stages step a production
    # pipeline performs anyway — at 100 TB it becomes a parquet write of
    # the (much smaller) post-gate corpus, same dataflow.
    canon = (
        survivors.withColumn(
            "_keeper", F.min("doc_id").over(Window.partitionBy("fingerprint"))
        )
        .filter(F.col("doc_id") == F.col("_keeper"))
        .drop("_keeper")
        .localCheckpoint()
    )
    sig = minhash_long(canon.select("doc_id", "text"))
    near_b = (
        bucket_pairs(
            sig, ["seed", "minhash"], "doc_id", [], max_bucket=DEFAULT_MAX_BUCKET
        )
        .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("nb"))
        .filter(F.col("nb") >= 2)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    # The dropped set is bounded by the near-dup pair count — usually
    # small, but not provably broadcastable; AQE picks the join strategy.
    return (
        canon.join(near_b, "doc_id", "left_anti")
        .select("doc_id", "n_tokens", "fingerprint")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Deterministic train/val split — hash-based assignment, no RNG, stable
# under reruns and appends (a doc's split never changes when the corpus
# grows — the property shuffles/rand() based splits lack).
# ---------------------------------------------------------------------------
@register(
    "corpus_train_val_split",
    oracle="""
    SELECT doc_id,
           CASE WHEN substr(md5(doc_id::VARCHAR), 1, 2) <= 'e5'
                THEN 'train' ELSE 'val' END AS split
    FROM documents
    """,
)
def corpus_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~90/10 split on the first md5 byte of the doc id (0x00–0xe5 →
    train: 230/256 ≈ 89.8%). Pure map-side column op — no shuffle, no
    state; at 100 TB the split is a free projection on every scan."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return d.select(
        "doc_id",
        F.when(bucket <= "e5", "train").otherwise("val").alias("split"),
    )


# ---------------------------------------------------------------------------
# Corpus statistics by source — the profiling pass a curation run logs.
# ---------------------------------------------------------------------------
@register(
    "corpus_stats_by_source",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           round(avg(len(string_split(text, ' '))), 4) AS avg_tokens,
           round(median(len(string_split(text, ' '))), 4) AS median_tokens,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def corpus_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source profile: doc/token counts, mean/median tokens, max
    chars. Exact median here for the oracle pairing; the 100 TB form is
    approx_percentile (same plan shape, sketch merge instead of sort)."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    return (
        d.select("source", n_tok.alias("n_tok"), "n_chars")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
            F.round(F.expr("percentile(n_tok, 0.5)"), 4).alias("median_tokens"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Sequence packing — concat-then-chunk assignment of documents to
# fixed-token-budget packs (LLM pretraining batch prep).
# ---------------------------------------------------------------------------
PACK_BUDGET = 2048


@register(
    "corpus_pack_sequences",
    oracle=f"""
    SELECT doc_id, source, n_tokens,
           CAST(floor((cum_tokens - n_tokens) / {PACK_BUDGET}) AS INT) AS pack_id
    FROM (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
             sum(len(string_split(text, ' '))) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      FROM documents)
    ORDER BY source, doc_id
    """,
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each doc to the pack where its token stream STARTS
    (concat-then-chunk semantics): pack_id = floor(start_offset /
    budget), start_offset from a running-sum window per source.

    Scale: the window partitions by source — parallel across sources,
    sequential within one. A single giant source needs a two-level pack
    (window within (source, dt), then offset-shift by per-dt totals) —
    same stitching pattern as the SCD2 hot-key note in SCALE.md."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.select("doc_id", "source", n_tok.alias("n_tokens"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.floor((F.col("cum_tokens") - F.col("n_tokens")) / PACK_BUDGET)
            .cast("int")
            .alias("pack_id"),
        )
        .orderBy("source", "doc_id")
    )


# ---------------------------------------------------------------------------
# Stratified sampling — per-language keep rates, deterministic (hash
# thresholds, no RNG): rebalancing a multilingual corpus toward a target
# language mix without sacrificing rerun/append stability.
# ---------------------------------------------------------------------------
STRATA_RATES = {"en": "bf", "es": "3f"}  # first md5 byte ≤ x → keep (~75% / ~25%)


@register(
    "corpus_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE substr(md5(doc_id::VARCHAR), 1, 2) <=
          CASE lang WHEN 'en' THEN '{STRATA_RATES["en"]}' ELSE '{STRATA_RATES["es"]}' END
    ORDER BY doc_id
    """,
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep ~75% of 'en' docs and ~25% of 'es' docs by hash threshold —
    the same stable-split trick as corpus_train_val_split, with a
    per-stratum cut. Map-side only; composes with the split (independent
    hash inputs would be needed for independent draws — use a salted
    hash input per decision, e.g. md5('sample|' || doc_id))."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    threshold = F.when(F.col("lang") == "en", STRATA_RATES["en"]).otherwise(
        STRATA_RATES["es"]
    )
    return (
        d.filter(bucket <= threshold)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


@register(
    "corpus_length_buckets",
    oracle="""
    WITH tok AS (
        SELECT source, len(string_split(text, ' ')) AS n_tokens
        FROM documents)
    SELECT source,
           CAST(n_tokens // 16 AS INT) AS bucket,
           CAST((n_tokens // 16) * 16 AS INT) AS bucket_lo,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM tok GROUP BY 1, 2, 3
    """,
)
def corpus_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length histogram per source (16-token buckets) — the
    sizing pass a packing/batching stage runs first, so bucket boundaries
    (and padding waste) are known before corpus_pack_sequences commits to
    a max_len. Pure map-side tokenize-and-count into a (source, bucket)
    partial aggregate; output is bounded by sources × buckets.
    """
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    return (
        d.select(
            "source",
            F.expr("CAST(size(split(text, ' ')) div 16 AS INT)").alias("bucket"),
            n_tok.alias("n_tokens"),
        )
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
        .select(
            "source",
            "bucket",
            (F.col("bucket") * 16).cast("int").alias("bucket_lo"),
            "n_docs",
            "total_tokens",
        )
    )


# ---------------------------------------------------------------------------
# Curation lineage — every document, its verdict, and the FIRST gate
# that dropped it. The governance twin of corpus_curation_pipeline:
# that lane returns the survivors; this one explains the casualties
# ("why was my document dropped" is the first question a data audit
# asks of a 100 TB curation run).
# ---------------------------------------------------------------------------
# Shared lineage CTE chain (DuckDB side): relation `lineage(doc_id,
# source, n_tokens, verdict)` — one definition for the per-document
# lane and the per-source rate report so the gate semantics cannot
# drift between them.
_LINEAGE_SQL = f"""
    base AS (
      SELECT doc_id, source, text,
             CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
             len(string_split(text, ' ')) BETWEEN 10 AND 1000 AS length_ok,
             len(list_filter(string_split(text, ' '), w -> w IN ({_EN})))
              >= len(list_filter(string_split(text, ' '), w -> w IN ({_ES}))) AS lang_ok,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
      FROM documents
    ),
    keepers AS (
      SELECT fingerprint, min(doc_id) AS keeper
      FROM base WHERE length_ok AND lang_ok GROUP BY fingerprint
    ),
    canon AS (
      SELECT b.doc_id, b.text FROM base b
      JOIN keepers k ON k.fingerprint = b.fingerprint AND k.keeper = b.doc_id
      WHERE b.length_ok AND b.lang_ok
    ),
    shingles AS ({shingles_sql("canon")}),
    sig AS ({minhash_sig_sql()}),
    near AS (
      SELECT DISTINCT doc_b AS doc_id FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sig a JOIN sig b ON a.seed = b.seed AND a.minhash = b.minhash
                              AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2
      )
    ),
    lineage AS (
      SELECT b.doc_id, b.source, b.n_tokens,
             CASE WHEN NOT b.length_ok THEN 'drop_length'
                  WHEN NOT b.lang_ok THEN 'drop_lang'
                  WHEN k.keeper IS NULL OR k.keeper <> b.doc_id THEN 'drop_exact_dup'
                  WHEN n.doc_id IS NOT NULL THEN 'drop_near_dup'
                  ELSE 'kept' END AS verdict
      FROM base b
      LEFT JOIN keepers k ON k.fingerprint = b.fingerprint
      LEFT JOIN near n ON n.doc_id = b.doc_id
    )
"""


def _lineage_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared lineage relation (doc_id, source, n_tokens, verdict) —
    the Spark twin of the _LINEAGE_SQL CTE chain; per-document drop attribution through the curation gates, in gate
    order: length → language → exact-dup (fingerprint keeper) →
    near-dup (MinHash-LSH) → kept. Gate definitions are copied from
    corpus_curation_pipeline so the 'kept' set here IS that lane's
    output (asserted in tests/test_curation_lineage.py).

    100 TB plan shape: identical cost to the pipeline itself plus one
    fingerprint-keyed keeper join — attribution rides the same shuffles;
    no per-gate corpus re-scan. (A production run would write this as
    the pipeline's second output, not a separate job; the lane keeps
    them separate so both stay oracle-paired.)
    """
    d = fan_out(load_table(spark, sf_dir, "documents"))
    toks = F.split("text", " ")

    def score(words: list[str]) -> F.Column:
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda w: F.array_contains(arr, w)))

    # base is referenced THREE times (keepers, canon, the final verdict
    # join) and canon once more via the signature chain — unpinned, the
    # gate expressions (split/regex/md5 over every document) re-run per
    # branch. Same materialize-between-stages rationale as the pin in
    # corpus_curation_pipeline.
    base = d.select(
        "doc_id",
        "source",
        "text",
        F.size(toks).cast("int").alias("n_tokens"),
        F.size(toks).between(10, 1000).alias("length_ok"),
        (score(["the", "fast", "key"]) >= score(["order", "sort", "table"])).alias(
            "lang_ok"
        ),
        F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))).alias(
            "fingerprint"
        ),
    ).localCheckpoint()
    keepers = (
        base.filter(F.col("length_ok") & F.col("lang_ok"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper"))
    )
    canon = (
        base.filter(F.col("length_ok") & F.col("lang_ok"))
        .join(keepers, "fingerprint")
        .filter(F.col("doc_id") == F.col("keeper"))
        .select("doc_id", "text")
    )
    sig = minhash_long(canon)
    near = (
        bucket_pairs(
            sig, ["seed", "minhash"], "doc_id", [], max_bucket=DEFAULT_MAX_BUCKET
        )
        .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("nb"))
        .filter(F.col("nb") >= 2)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("_near", F.lit(True))
    )
    return (
        base.join(keepers, "fingerprint", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.when(~F.col("length_ok"), "drop_length")
            .when(~F.col("lang_ok"), "drop_lang")
            .when(
                F.col("keeper").isNull() | (F.col("keeper") != F.col("doc_id")),
                "drop_exact_dup",
            )
            .when(F.col("_near").isNotNull(), "drop_near_dup")
            .otherwise("kept")
            .alias("verdict"),
        )
    )


@register(
    "corpus_curation_lineage",
    oracle=f"""
    WITH {_LINEAGE_SQL}
    SELECT doc_id, n_tokens, verdict FROM lineage
    ORDER BY doc_id
    """,
)
def corpus_curation_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See _lineage_verdicts — this lane is its per-document projection."""
    return _lineage_verdicts(spark, sf_dir).select(
        "doc_id", "n_tokens", "verdict"
    ).orderBy("doc_id")


@register(
    "corpus_dedup_rate_report",
    oracle=f"""
    WITH {_LINEAGE_SQL}
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (verdict = 'kept') AS BIGINT) AS n_kept,
           CAST(count(*) FILTER (verdict = 'drop_length') AS BIGINT) AS n_drop_length,
           CAST(count(*) FILTER (verdict = 'drop_lang') AS BIGINT) AS n_drop_lang,
           CAST(count(*) FILTER (verdict = 'drop_exact_dup') AS BIGINT) AS n_drop_exact,
           CAST(count(*) FILTER (verdict = 'drop_near_dup') AS BIGINT) AS n_drop_near,
           CAST((count(*) FILTER (verdict IN ('drop_exact_dup', 'drop_near_dup')))
                * 1000000 // count(*) AS BIGINT) AS dedup_rate_ppm
    FROM lineage
    GROUP BY source ORDER BY source
    """,
)
def corpus_dedup_rate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation scorecard: document counts by verdict and the
    duplicate rate in exact integer ppm — the per-crawl health report a
    data team reviews after each curation run (a source whose dedup rate
    jumps is re-crawling itself; one whose drop_lang spikes changed
    language mix). Shares the lineage relation with
    corpus_curation_lineage in BOTH engines, so the report can never
    disagree with the per-document attribution.

    100 TB plan shape: the lineage relation's cost (the pipeline's own
    shuffles) plus one |sources|-row aggregate with map-side combine.
    """

    def vcount(v: str, alias: str) -> F.Column:
        return F.sum(F.when(F.col("verdict") == v, 1).otherwise(0)).cast(
            "bigint"
        ).alias(alias)

    return (
        _lineage_verdicts(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            vcount("kept", "n_kept"),
            vcount("drop_length", "n_drop_length"),
            vcount("drop_lang", "n_drop_lang"),
            vcount("drop_exact_dup", "n_drop_exact"),
            vcount("drop_near_dup", "n_drop_near"),
        )
        .select(
            "source",
            "n_docs",
            "n_kept",
            "n_drop_length",
            "n_drop_lang",
            "n_drop_exact",
            "n_drop_near",
            F.expr(
                "(n_drop_exact + n_drop_near) * 1000000 div n_docs"
            ).alias("dedup_rate_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Deterministic shuffle + sharding — the LAST step of every training-data
# pipeline: fix a global pseudo-random order, cut the corpus into N
# equal-ish shard files, and prove the cut is balanced. Seeded so a
# re-run (or a resumed run) produces byte-identical shards.
# ---------------------------------------------------------------------------

N_SHARDS = 8
SHUFFLE_SEED = "r10"  # part of the sort key: new seed = new epoch order


# hex-digit VALUE of char `pos` of the sort key (0-15): ascii('0'-'9')
# minus 48, ascii('a'-'f') minus 87. (ascii(c) % N is NOT uniform over
# the 16 hex chars; the parsed 8-bit value of two hex digits is exactly
# uniform mod any power of two.)
_SQL_KEY = f"md5('{SHUFFLE_SEED}' || ':' || CAST(doc_id AS VARCHAR))"


def _sql_hexval(pos: int) -> str:
    a = f"ascii(substr({_SQL_KEY}, {pos}, 1))"
    return f"(CASE WHEN {a} <= 57 THEN {a} - 48 ELSE {a} - 87 END)"


_SQL_SHARD = (
    f"CAST(({_sql_hexval(1)} * 16 + {_sql_hexval(2)}) "
    f"% {N_SHARDS} AS INT)"
)


@register(
    "corpus_shuffle_shards",
    oracle=f"""
    SELECT doc_id,
           {_SQL_KEY} AS sort_key,
           {_SQL_SHARD} AS shard
    FROM documents
    """,
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic shuffle + shard assignment: every document
    gets a pseudo-random sort key md5(seed:doc_id) and a shard in
    [0, N_SHARDS) derived from the key's first two hex chars — so the
    training order is (a) uniform, (b) independent of input order, and
    (c) reproducible from the seed alone (epoch 2 = new seed, a full
    reshuffle with zero state). The writer's final step is
    repartition(shard).sortWithinPartitions(sort_key) — shard cut and
    in-shard order both come from THIS relation, so the lane's output
    is the complete spec of the physical layout.

    100 TB: pure map-side projection (no shuffle in the lane itself);
    the one real exchange is the writer's repartition-by-shard, which
    is the intended data movement. No global sort, no global window —
    in-shard order needs only sortWithinPartitions (map-side sort).
    The shard id is the PARSED 8-bit value of the key's first two hex
    digits mod N — exactly uniform for power-of-two N (ascii-of-hex
    mod N is not: the 16 hex codepoints are not equidistributed mod 8,
    which skewed shards 3x before this fix), computed with the same
    integer arithmetic in both engines."""
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat_ws(":", F.lit(SHUFFLE_SEED), F.col("doc_id")))
    shard = (_shard_of(key) % N_SHARDS).cast("int")
    return d.select(
        "doc_id", key.alias("sort_key"), shard.alias("shard")
    )


def _hexval(c):
    """Value of one hex-digit column (0-15)."""
    a = F.ascii(c)
    return F.when(a <= 57, a - 48).otherwise(a - 87)


def _shard_of(key):
    """Parsed 8-bit value of the key's first two hex digits."""
    return _hexval(F.substring(key, 1, 1)) * 16 + _hexval(
        F.substring(key, 2, 1)
    )


@register(
    "corpus_shard_balance",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id,
             {_SQL_SHARD} AS shard,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    per_shard AS (
      SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      FROM assigned GROUP BY shard
    ),
    tot AS (SELECT sum(n_docs) AS all_docs FROM per_shard)
    SELECT shard, n_docs, total_tokens,
           CAST(n_docs * {N_SHARDS} * 1000000 // all_docs - 1000000
                AS BIGINT) AS skew_ppm
    FROM per_shard, tot
    """,
)
def corpus_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard balance report for the deterministic sharding: docs,
    tokens, and each shard's deviation from the uniform share in
    integer ppm (n_docs x N / total - 1, micro-units — the number an
    operator alerts on before a skewed shard slows every epoch).

    100 TB: one map-side-combined groupBy on the shard key (N_SHARDS
    groups); the totals side is a 1-row broadcast."""
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat_ws(":", F.lit(SHUFFLE_SEED), F.col("doc_id")))
    shard = (_shard_of(key) % N_SHARDS).cast("int")
    per_shard = (
        d.select(
            shard.alias("shard"),
            F.size(F.split("text", " ")).alias("n_tokens"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )
    tot = per_shard.agg(F.sum("n_docs").alias("all_docs"))
    return per_shard.crossJoin(F.broadcast(tot)).select(
        "shard",
        "n_docs",
        "total_tokens",
        F.expr(
            f"CAST(n_docs * {N_SHARDS} * 1000000 div all_docs - 1000000"
            " AS BIGINT)"
        ).alias("skew_ppm"),
    )
