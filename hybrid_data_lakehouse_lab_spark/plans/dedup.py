"""Deduplication extension lane (documents table).

Exact dedup is a hash-groupBy; near-dup is MinHash + LSH banding
(shingle → k independent min-hashes → band buckets → candidate join).
Portability trick for the oracle: a min-hash can be the lexicographic MIN
of md5(seed || shingle) — hex strings compare identically in Spark and
DuckDB, so no hex→int conversion is needed and signatures match bit-for-bit.

Scale notes (100 TB): the shingle explode is map-side only; the heavy op
is the groupBy (doc_id, seed) — one shuffle keyed by doc, well-distributed.
The LSH candidate join shuffles on (seed, minhash), whose cardinality is
bounded by docs × k; skew only occurs for degenerate constant documents
(salt or cap bucket size if a corpus has them).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.util import DEFAULT_MAX_BUCKET, bucket_pairs, fan_out
from ..sources import load_table
from .registry import register
from .data_selection import SEMDEDUP_MAX_CLUSTER
from .similarity import _KMEANS_A1_SQL
from .simhash_kernel import _TOKENS_SQL, _simhash_select

N_HASHES = 8  # k independent min-hash functions (seeds 0..7)
SHINGLE = 3  # word 3-grams
_SEEDS_SQL = ", ".join(str(s) for s in range(N_HASHES))


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash,
           min(doc_id) AS keeper_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content, keep lowest doc_id per group.

    At 100 TB: hash first (map-side, 32 bytes/row), shuffle only the hash +
    id — never the document bodies.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.md5("text").alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def _shingles(d: DataFrame, distinct: bool = True) -> DataFrame:
    """doc_id, shingle (word 3-grams; distinct=True for set semantics).

    fan_out first: shingling + hashing are CPU-bound and a small scan
    would otherwise run on one core (see operators/util.py).
    """
    words = F.split("text", " ")
    idx = F.sequence(F.lit(1), F.size(words) - (SHINGLE - 1))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, SHINGLE)))
    out = fan_out(d).select("doc_id", F.explode(sh).alias("shingle"))
    return out.distinct() if distinct else out


def shingles_sql(src: str = "documents") -> str:
    """DuckDB shingle CTE body over any (doc_id, text) relation."""
    return f"""
      SELECT DISTINCT doc_id,
             array_to_string(words[i:i+{SHINGLE - 1}], ' ') AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM {src}),
           UNNEST(range(1, len(words) - {SHINGLE - 2})) AS t(i)
"""


_SHINGLES_SQL = shingles_sql()

#: Document-frequency cap τ for the exact-verification lanes
#: (dedup_ngram_jaccard / dedup_containment / dedup_lsh_calibration).
#: A shingle shared by B documents emits O(B²) candidate rows in the
#: shingle self-join; on a web corpus a boilerplate 3-gram ("all rights
#: reserved") appears in 10⁸ docs → 10¹⁶ join rows. Shingles past the
#: cap carry ≈0 Jaccard information (they are corpus-wide boilerplate,
#: present on both sides of almost every pair), so the lanes compute
#: similarity over the INFORMATIVE shingle set: every shingle with
#: n_docs ≤ τ. The cap is part of the lane semantics — the DuckDB
#: oracles apply the identical filter, so the pairing holds on any
#: corpus, not just ones that never trigger it. On the gate corpora the
#: max observed DF is 25 (sf0.1), so τ=128 leaves results bit-identical
#: to the uncapped lanes there (asserted by
#: tests/test_round4_hardening.py::test_gate_corpora_below_shingle_df_cap).
SHINGLE_DF_CAP = 128


def informative_shingles_sql(df_cap: int = SHINGLE_DF_CAP, src: str = "shingles0") -> str:
    """DuckDB CTE body: shingles whose document frequency is ≤ df_cap —
    the oracle twin of the count-window filter inside _pair_overlaps."""
    return f"""
      SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS n_docs
        FROM {src})
      WHERE n_docs <= {df_cap}
"""


def _pair_overlaps(d: DataFrame, df_cap: int = SHINGLE_DF_CAP) -> DataFrame:
    """(doc_a, doc_b, n_common, na, nb) over informative shingles — the
    shared candidate relation of the exact-verification lanes.

    Plan shape, chosen shuffle-by-shuffle for the hot-shingle case:

    - Document frequency comes from a map-side-combined groupBy — a
      boilerplate shingle in 10⁸ docs collapses to ≤ #map-partitions
      partial rows BEFORE its shuffle. (A count-window would move every
      raw occurrence to one reducer: the explosion re-introduced at the
      DF step. Never window a Zipf key.)
    - Only the HOT side of the frequency table ships: shingles with
      n_docs > df_cap are few by nature (each one is corpus-wide
      boilerplate), so they broadcast as a left-anti probe — the raw
      shingle relation is filtered map-side, never shuffled by shingle
      at full width.
    - Per-doc sizes are a doc_id window (group size = shingles per doc,
      bounded by document length — no skew), and ride the rows into
      bucket_pairs as payload, so both set sizes arrive attached to
      each pair with no size-table joins.
    - Pair generation shuffles the FILTERED relation on shingle; after
      the cap no bucket exceeds df_cap members, so the expansion is
      bounded by construction and stays exact (no star-pair fallback).

    The shingle explode itself is computed twice (frequency pass +
    probe pass) — map-side CPU, the deliberate price for keeping every
    shuffle skew-free; the self-join form it replaced computed it FOUR
    times AND shuffled raw shingles.
    """
    from pyspark.sql import Window

    sh = _shingles(d)
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > df_cap)
        .select("shingle")
    )
    informative = sh.join(F.broadcast(hot), "shingle", "left_anti").withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    )
    pairs = bucket_pairs(informative, ["shingle"], "doc_id", ["n"])
    return pairs.groupBy(
        F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b")
    ).agg(
        F.count(F.lit(1)).alias("n_common"),
        F.first("a.n").alias("na"),
        F.first("b.n").alias("nb"),
    )

# Carter–Wegman MinHash: ONE md5 per shingle (its first 8 hex chars →
# a 31-bit int h), then k affine transforms g_i(h) = (a_i·h + b_i) mod p
# with p = 2³¹−1. Versus k independent md5s per shingle this trades 7
# string hashes for 7 integer mult-adds per shingle and shrinks the
# shuffle payload from k×32-char strings to k bigints per doc. The
# (a_i, b_i) are md5-derived constants, identical in both dialects; all
# products stay < 2⁶² (no bigint overflow).
P31 = 2_147_483_647


def _coeff(kind: str, i: int) -> int:
    v = int(hashlib.md5(f"minhash_{kind}_{i}".encode()).hexdigest()[:15], 16) % P31
    return v if (kind == "b" or v > 0) else 1


_COEFFS = [(_coeff("a", i), _coeff("b", i)) for i in range(N_HASHES)]

_COEFF_VALUES = ", ".join(
    f"({i}, {a}::BIGINT, {b}::BIGINT)" for i, (a, b) in enumerate(_COEFFS)
)


def minhash_sig_sql(shingles_cte: str = "shingles") -> str:
    """DuckDB CTE body: (doc_id, seed, minhash BIGINT) from a shingle
    relation — the oracle twin of ``minhash_long``."""
    return f"""
      SELECT doc_id, seed, min((a * h + b) % {P31}) AS minhash
      FROM (
        SELECT doc_id,
               (('0x' || substr(md5(shingle), 1, 8))::BIGINT & {P31}) AS h
        FROM {shingles_cte}
      ) hs, (VALUES {_COEFF_VALUES}) AS s(seed, a, b)
      GROUP BY doc_id, seed
"""


def minhash_long(d: DataFrame) -> DataFrame:
    """MinHash signature matrix (doc_id, seed, minhash) for any
    (doc_id, text) DataFrame — the reusable core of
    ``dedup_minhash_signatures`` (see its docstring for the plan shape).
    """
    sh = _shingles(d, distinct=False)
    hashed = sh.selectExpr(
        "doc_id",
        f"CAST(conv(substr(md5(shingle), 1, 8), 16, 10) AS BIGINT) & {P31} AS h",
    ).selectExpr(
        "doc_id",
        *[f"({a} * h + {b}) % {P31} AS h{i}" for i, (a, b) in enumerate(_COEFFS)],
    )
    wide = hashed.groupBy("doc_id").agg(
        *[F.min(f"h{s}").alias(f"h{s}") for s in range(N_HASHES)]
    )
    stack_args = ", ".join(f"{s}, h{s}" for s in range(N_HASHES))
    return wide.selectExpr(
        "doc_id", f"stack({N_HASHES}, {stack_args}) AS (seed, minhash)"
    )


@register(
    "dedup_minhash_signatures",
    oracle=f"""
    WITH shingles AS ({_SHINGLES_SQL})
    {minhash_sig_sql()}
    """,
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature matrix in long form: (doc_id, seed, minhash).

    Plan shape for scale: the k hashes are computed as k map-side COLUMNS
    per shingle (not a k-way row explode), so the single shuffle carries
    |docs| × k bigints after partial min aggregation — not |shingles| × k
    rows. Duplicate shingles are left in (min() is dup-invariant), saving
    the distinct's extra shuffle; the oracle's DISTINCT is semantically
    identical.
    """
    return minhash_long(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_near_pairs_lsh",
    oracle=f"""
    WITH shingles AS ({_SHINGLES_SQL}),
    sig AS ({minhash_sig_sql()})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS INT) AS n_matching_bands
    FROM sig a JOIN sig b ON a.seed = b.seed AND a.minhash = b.minhash
                          AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    """,
)
def dedup_near_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs: docs sharing a (band, minhash) bucket.

    Band size 1 row (OR-construction over k hashes); n_matching_bands / k
    estimates Jaccard. Implemented as intra-bucket pair generation
    (operators.util.bucket_pairs) rather than a signature self-join: the
    signature subtree is computed ONCE and shuffled once on the bucket
    key — the self-join form computes it twice (Spark does not reuse the
    exchange across join sides).
    """
    sig = dedup_minhash_signatures(spark, sf_dir)
    return (
        bucket_pairs(
            sig, ["seed", "minhash"], "doc_id", [], max_bucket=DEFAULT_MAX_BUCKET
        )
        .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("int").alias("n_matching_bands"))
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH shingles0 AS ({_SHINGLES_SQL}),
    shingles AS ({informative_shingles_sql()}),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM shingles a JOIN shingles b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b,
           round(CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) >= 0.2
    """,
)
def dedup_ngram_jaccard(
    spark: SparkSession, sf_dir: str, df_cap: int = SHINGLE_DF_CAP
) -> DataFrame:
    """Exact n-gram Jaccard over shingle-sharing candidate pairs.

    The candidate space is docs sharing ≥1 INFORMATIVE 3-gram: shingles
    with document frequency > df_cap are excluded from both candidate
    generation and the size table (see SHINGLE_DF_CAP — this is what
    bounds the pair space to O(corpus · τ) instead of O(hot-shingle²)).
    Candidate pairs + both set sizes come from ONE pass over the
    shingle relation (see _pair_overlaps). At corpus scale: band with
    LSH first, then verify with this.
    """
    inter = _pair_overlaps(load_table(spark, sf_dir, "documents"), df_cap)
    jac = F.col("n_common").cast("double") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        inter.filter(jac >= 0.2)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@register(
    "dedup_duplicate_ngram_fraction",
    oracle=f"""
    WITH shingles AS ({_SHINGLES_SQL}),
    freq AS (SELECT shingle, count(*) AS n_docs FROM shingles GROUP BY shingle)
    SELECT s.doc_id,
           CAST(count(*) AS INT) AS n_shingles,
           round(avg(CASE WHEN f.n_docs > 1 THEN 1.0 ELSE 0.0 END), 6)
             AS dup_fraction
    FROM shingles s JOIN freq f ON s.shingle = f.shingle
    GROUP BY s.doc_id
    """,
)
def dedup_duplicate_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-ngram score: the fraction of a doc's
    distinct 3-gram shingles that appear in at least one OTHER document.

    This is the doc-level "how much of me is boilerplate" signal
    pretraining curation uses to drop template-heavy pages before (or
    instead of) pairwise near-dedup — it needs no pair enumeration at all.

    100 TB: two shuffles, both well-keyed — the corpus-wide shingle
    frequency table (map-side combine collapses each partition to its
    distinct shingles first) and the per-doc re-aggregation. The
    shingle⋈freq join co-partitions on the shingle key; nothing is ever
    paired doc-against-doc, so cost is linear in corpus size.
    """
    sh = _shingles(load_table(spark, sf_dir, "documents"))
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        sh.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_shingles"),
            F.round(
                F.avg(F.when(F.col("n_docs") > 1, 1.0).otherwise(0.0)), 6
            ).alias("dup_fraction"),
        )
    )


@register(
    "dedup_containment",
    oracle=f"""
    WITH shingles0 AS ({_SHINGLES_SQL}),
    shingles AS ({informative_shingles_sql()}),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM shingles a JOIN shingles b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b,
           round(CAST(i.n_common AS DOUBLE) / least(sa.n, sb.n), 6) AS containment
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE CAST(i.n_common AS DOUBLE) / least(sa.n, sb.n) >= 0.5
    """,
)
def dedup_containment(
    spark: SparkSession, sf_dir: str, df_cap: int = SHINGLE_DF_CAP
) -> DataFrame:
    """Shingle containment (overlap coefficient): |A∩B| / min(|A|,|B|).

    Catches PARTIAL duplication that symmetric Jaccard misses — a short
    document embedded verbatim inside a long one scores containment ≈ 1
    while its Jaccard stays tiny (the union is dominated by the long
    doc). This is the "document-inside-document" dedup pass pretraining
    pipelines run after whole-doc near-dedup.

    100 TB: identical candidate generation to dedup_ngram_jaccard —
    informative-shingle-sharing pairs only (df > df_cap boilerplate
    shingles excluded on both sides; see SHINGLE_DF_CAP), one pass over
    the shingle relation with sizes riding the pairs (_pair_overlaps);
    band with LSH first at corpus scale.
    """
    inter = _pair_overlaps(load_table(spark, sf_dir, "documents"), df_cap)
    cont = F.col("n_common").cast("double") / F.least("na", "nb")
    return (
        inter.filter(cont >= 0.5)
        .select("doc_a", "doc_b", F.round(cont, 6).alias("containment"))
    )


@register(
    "dedup_lsh_calibration",
    oracle=f"""
    WITH shingles0 AS ({_SHINGLES_SQL}),
    shingles AS ({informative_shingles_sql()}),
    sig AS ({minhash_sig_sql("shingles0")}),
    est AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(*) AS n_matching_bands
      FROM sig a JOIN sig b ON a.seed = b.seed AND a.minhash = b.minhash
                            AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM shingles a JOIN shingles b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    exact AS (
      SELECT i.doc_a, i.doc_b,
             CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) AS jac
      FROM inter i
      JOIN sizes sa ON i.doc_a = sa.doc_id
      JOIN sizes sb ON i.doc_b = sb.doc_id)
    SELECT e.n_matching_bands,
           count(*) AS n_pairs,
           round(avg(x.jac), 6) AS avg_exact_jaccard,
           round(avg(abs(e.n_matching_bands / {N_HASHES}.0 - x.jac)), 6)
             AS avg_abs_err
    FROM est e JOIN exact x
      ON e.doc_a = x.doc_a AND e.doc_b = x.doc_b
    GROUP BY 1
    """,
)
def dedup_lsh_calibration(
    spark: SparkSession, sf_dir: str, df_cap: int = SHINGLE_DF_CAP
) -> DataFrame:
    """Estimator-calibration audit: for every LSH candidate pair, the
    band-match fraction (n_bands/k, the MinHash Jaccard estimate) against
    the EXACT shingle Jaccard — grouped by band count, with the mean
    absolute estimation error. This is the "do we trust the approximate
    pass" report a dedup pipeline publishes before turning thresholds
    into deletions.

    100 TB: exact Jaccard is computed ONLY for LSH candidates (the
    shingle self-join is the verification pass on the banded candidate
    set, not all pairs), and only over informative shingles (df ≤
    df_cap; see SHINGLE_DF_CAP) so a corpus-wide boilerplate shingle
    cannot re-inflate the verification join. The MinHash estimate side
    intentionally stays on the FULL shingle set — it is the production
    LSH pass being audited, and its bucket sizes are already bounded by
    bucket_pairs' max_bucket. Output is bounded by k rows.
    """
    d = load_table(spark, sf_dir, "documents")
    est = dedup_near_pairs_lsh(spark, sf_dir)
    exact = _pair_overlaps(d, df_cap).select(
        "doc_a",
        "doc_b",
        (
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common"))
        ).alias("jac"),
    )
    err = F.abs(F.col("n_matching_bands") / float(N_HASHES) - F.col("jac"))
    return (
        est.join(exact, ["doc_a", "doc_b"])
        .groupBy("n_matching_bands")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("jac"), 6).alias("avg_exact_jaccard"),
            F.round(F.avg(err), 6).alias("avg_abs_err"),
        )
    )


@register(
    "dedup_cap_audit",
    oracle=f"""
    WITH shingles0 AS ({_SHINGLES_SQL}),
    freq AS (SELECT shingle, count(*) AS n FROM shingles0 GROUP BY shingle),
    sig AS ({minhash_sig_sql("shingles0")}),
    buckets AS (SELECT seed, minhash, count(*) AS n FROM sig GROUP BY seed, minhash),
    {_KMEANS_A1_SQL},
    clusters AS (SELECT cluster, count(*) AS n FROM a1 GROUP BY cluster),
    shtok AS ({_TOKENS_SQL}),
    shsig AS (SELECT doc_id, {_simhash_select("duckdb")} AS simhash
              FROM shtok GROUP BY doc_id),
    shbands AS (SELECT substr(simhash, 1, 16) AS band, count(*) AS n
                FROM shsig GROUP BY band)
    SELECT 'lsh_bucket' AS lane, {DEFAULT_MAX_BUCKET} AS cap,
           count(*) AS n_groups,
           count(*) FILTER (n > {DEFAULT_MAX_BUCKET}) AS n_capped,
           max(n) AS max_group_size
    FROM buckets
    UNION ALL
    SELECT 'semdedup_cluster', {SEMDEDUP_MAX_CLUSTER}, count(*),
           count(*) FILTER (n > {SEMDEDUP_MAX_CLUSTER}), max(n)
    FROM clusters
    UNION ALL
    SELECT 'shingle_df', {SHINGLE_DF_CAP}, count(*),
           count(*) FILTER (n > {SHINGLE_DF_CAP}), max(n)
    FROM freq
    UNION ALL
    SELECT 'simhash_band', {DEFAULT_MAX_BUCKET}, count(*),
           count(*) FILTER (n > {DEFAULT_MAX_BUCKET}), max(n)
    FROM shbands
    ORDER BY lane
    """,
)
def dedup_cap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximation-trigger audit: how close the corpus sits to each
    dedup cap, and how many groups the caps actually bit.

    bucket_pairs surfaces its capped_buckets count only through an
    attached Observation — visible to the caller holding the DataFrame,
    silent to everyone else. This lane makes the same information a
    first-class, oracle-checked query: per capped mechanism, the group
    count, the number of groups over the cap (i.e. where the engine
    switched to O(B) star pairs / dropped boilerplate shingles), and the
    max group size. n_capped == 0 means every pair lane this round was
    EXACT; a pipeline publishes this next to its dedup report so
    approximation is never silent.

    100 TB: four groupBy aggregations (shingle DF, LSH bucket sizes,
    k-means cluster sizes, simhash band-bucket sizes) — the same shapes
    the dedup lanes themselves run, reduced to 4 rows. Engaged-regime
    proof (tools/make_scaled_slice.py 10× slice, round 5): shingle_df
    reported 4,950 capped groups and semdedup_cluster 8/8 capped while
    the df-capped lanes stayed oracle-exact — the audit is what makes
    the simhash/semdedup divergence on such a corpus a published
    number instead of a silent recall loss.
    """
    from .dedup_advanced import dedup_simhash
    from .similarity import kmeans_a1

    docs = load_table(spark, sf_dir, "documents")
    sh = _shingles(docs)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("n"))
    buckets = (
        minhash_long(docs).groupBy("seed", "minhash").agg(F.count(F.lit(1)).alias("n"))
    )
    clusters = (
        kmeans_a1(spark, sf_dir).groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
    )
    sbands = (
        dedup_simhash(spark, sf_dir)
        .select(F.substring("simhash", 1, 16).alias("band"))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    def audit(grp: DataFrame, lane: str, cap: int) -> DataFrame:
        # coalesce: on an EMPTY group relation (degenerate corpus — e.g.
        # every document shorter than one shingle) sum() is NULL but the
        # oracle's count(*) FILTER is 0; the audit must stay paired on
        # exactly the corpora it exists to flag.
        return grp.agg(
            F.lit(lane).alias("lane"),
            F.lit(cap).alias("cap"),
            F.count(F.lit(1)).alias("n_groups"),
            F.coalesce(
                F.sum(F.when(F.col("n") > cap, 1).otherwise(0)), F.lit(0)
            ).cast("bigint").alias("n_capped"),
            F.max("n").alias("max_group_size"),
        )

    return (
        audit(buckets, "lsh_bucket", DEFAULT_MAX_BUCKET)
        .unionByName(audit(clusters, "semdedup_cluster", SEMDEDUP_MAX_CLUSTER))
        .unionByName(audit(freq, "shingle_df", SHINGLE_DF_CAP))
        .unionByName(audit(sbands, "simhash_band", DEFAULT_MAX_BUCKET))
        .orderBy("lane")
    )


LINE_W = 8  # words per pseudo-line (the corpus has no sentence marks)


@register(
    "corpus_line_dedup",
    oracle=f"""
    WITH chunks AS (
      SELECT doc_id, CAST((t.i - 1) / {LINE_W} AS INT) AS idx,
             array_to_string(words[t.i:t.i+{LINE_W - 1}], ' ') AS chunk
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
           UNNEST(range(1, len(words) + 1, {LINE_W})) AS t(i)
    ),
    flagged AS (
      SELECT *, row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) = 1 AS kept
      FROM chunks
    )
    SELECT doc_id, CAST(count(*) AS INT) AS n_chunks,
           CAST(count(*) FILTER (NOT kept) AS INT) AS n_dropped,
           md5(coalesce(string_agg(chunk, ' ' ORDER BY idx) FILTER (kept), ''))
             AS cleaned_md5
    FROM flagged GROUP BY doc_id
    """,
)
def corpus_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-span (line-level) dedup, the C4/CCNet boilerplate pass:
    each document splits into fixed {LINE_W}-word pseudo-lines (the
    corpus carries no sentence marks), and every occurrence of a span
    already seen at a lexicographically earlier (doc_id, position) is
    DROPPED — within-document repeats included. Output per document:
    span counts, dropped count, and the md5 of the cleaned
    reconstruction (surviving spans re-joined in order), so the lane is
    value-checked end-to-end without shipping full texts.

    100 TB plan shape: the keeper of each span is min(struct(doc, idx))
    from a MAP-SIDE-COMBINED groupBy — a boilerplate span in 10⁸ docs
    collapses to ≤ #map-partitions partials before its shuffle (the
    row_number()-over-span form the oracle states would move every raw
    occurrence of a hot span to one reducer; never window a Zipf key).
    The keep/drop flag then attaches via a LEFT join on the FULL
    (span, doc, idx) triple — unique per row on the build side, so the
    join key is uniform even when the span alone is white-hot. The
    reconstruction groups by doc_id (bounded by document length).
    """
    from pyspark.sql import Window as _W  # noqa: F401  (parity w/ oracle docs)

    d = fan_out(load_table(spark, sf_dir, "documents"))
    words = F.split("text", " ")
    starts = F.sequence(F.lit(1), F.size(words), F.lit(LINE_W))
    chunks = d.select(
        "doc_id",
        F.posexplode(
            F.transform(starts, lambda i: F.concat_ws(" ", F.slice(words, i, LINE_W)))
        ).alias("idx", "chunk"),
    )
    keepers = (
        chunks.groupBy("chunk")
        .agg(F.min(F.struct("doc_id", "idx")).alias("m"))
        .select("chunk", F.col("m.doc_id").alias("doc_id"), F.col("m.idx").alias("idx"))
        .withColumn("kept", F.lit(True))
    )
    flagged = chunks.join(keepers, ["chunk", "doc_id", "idx"], "left")
    cleaned = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.when(F.col("kept"), F.struct("idx", "chunk")))
            ),
            lambda s: s["chunk"],
        ),
        " ",
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_chunks"),
        F.sum(F.when(F.col("kept").isNull(), 1).otherwise(0)).cast("int").alias(
            "n_dropped"
        ),
        F.md5(cleaned).alias("cleaned_md5"),
    )
