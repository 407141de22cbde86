"""SimHash + embedding-cosine near-duplicate lanes.

SimHash portability: a 64-bit fingerprint needs per-bit token votes. Both
engines share md5; the per-bit extraction (hex digit → 4 bits) is emitted
as generated SQL in each dialect (Spark: shiftright/&, DuckDB: >>/&) from
ONE Python generator, so the 64 aggregate expressions are structurally
identical and the fingerprints match bit-for-bit.

Embedding LSH: sign-random-projection with hyperplane weights derived
deterministically from md5 in PYTHON and embedded as ±1 literals in both
dialects — no RNG, no engine-specific hash, reproducible everywhere.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.util import DEFAULT_MAX_BUCKET, bucket_pairs, fan_out
from ..sources import load_table
from .registry import register

# --------------------------------------------------------------------------
# SimHash — kernel generators live in plans/simhash_kernel.py (a leaf
# module) so the cap audit in plans/dedup.py can share them without a
# circular import; re-exported here for the lanes below.
# --------------------------------------------------------------------------
from .simhash_kernel import (  # noqa: E402
    _HALF_COLS,
    _TOKENS_SQL,
    _digit_cols,
    _simhash_select,
)


@register(
    "dedup_simhash",
    oracle=f"""
    WITH tokens AS ({_TOKENS_SQL})
    SELECT doc_id, {_simhash_select("duckdb")} AS simhash
    FROM tokens GROUP BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document (token-vote fingerprint).

    One explode + one groupBy(doc_id): the shuffle carries 64 small int
    partial sums per doc (map-side combine), independent of token count.
    """
    d = fan_out(load_table(spark, sf_dir, "documents"))
    digits = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .select("doc_id", F.md5("token").alias("h"))
        .selectExpr("doc_id", *_HALF_COLS)
        .selectExpr("doc_id", *_digit_cols("spark"))
    )
    return digits.groupBy("doc_id").agg(
        F.expr(_simhash_select("spark")).alias("simhash")
    )


@register(
    "dedup_simhash_near_pairs",
    oracle=f"""
    WITH tokens AS ({_TOKENS_SQL}),
    sig AS (
      SELECT doc_id, {_simhash_select("duckdb")} AS simhash
      FROM tokens GROUP BY doc_id
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.simhash::BIT, b.simhash::BIT)) AS INT) AS hamming
      FROM sig a JOIN sig b
        ON a.doc_id < b.doc_id
       AND substr(a.simhash, 1, 16) = substr(b.simhash, 1, 16)
    )
    SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 16
    """,
)
def dedup_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates: block on the first 16-bit band (the
    LSH step — at scale, block on each of the 4 bands), then verify by
    Hamming distance ≤ 16. Intra-bucket pair generation (bucket_pairs)
    computes the fingerprints once instead of per join side.

    The Hamming verify is integer xor + bit_count over two 32-bit halves
    conv'd from the fingerprint ONCE per document — not 64 per-character
    substring compares per PAIR. The substring form generated ~300
    codegen nodes in the pair loop; its whole-stage JIT compile alone
    cost more than the query (observed ~2.5 s at sf0.1) and the
    per-pair work scales with candidate count, the sig-side conv with
    document count."""
    sig = (
        dedup_simhash(spark, sf_dir)
        .withColumn("band", F.substring("simhash", 1, 16))
        .withColumn("h1", F.conv(F.substring("simhash", 1, 32), 2, 10).cast("bigint"))
        .withColumn("h2", F.conv(F.substring("simhash", 33, 32), 2, 10).cast("bigint"))
    )
    pairs = bucket_pairs(
        sig, ["band"], "doc_id", ["h1", "h2"], max_bucket=DEFAULT_MAX_BUCKET
    ).select(
        F.col("a.id").alias("doc_a"),
        F.col("b.id").alias("doc_b"),
        (
            F.bit_count(F.col("a.h1").bitwiseXOR(F.col("b.h1")))
            + F.bit_count(F.col("a.h2").bitwiseXOR(F.col("b.h2")))
        ).cast("int").alias("hamming"),
    )
    return pairs.filter(F.col("hamming") <= 16)


# --------------------------------------------------------------------------
# Embedding-cosine near-dup via sign-random-projection LSH
# --------------------------------------------------------------------------
N_PLANES = 32  # 4 bands × 8 planes
BAND_BITS = 8
N_BANDS = N_PLANES // BAND_BITS
DIM = 64
COSINE_TAU = 0.35


def _weight(plane: int, dim: int) -> int:
    """Deterministic ±1 hyperplane weight (md5-seeded, engine-independent)."""
    return 1 if int(hashlib.md5(f"{plane}_{dim}".encode()).hexdigest()[0], 16) < 8 else -1


def _bucket_expr(vec: str, dialect: str) -> str:
    """8-char sign bucket for a DOUBLE[] column named `vec`.

    Each plane is a dot product against an ARRAY LITERAL of ±1 weights —
    not 64 inline multiply terms. The inline form generates enormous
    whole-stage-codegen methods (8×64 expression nodes) whose JIT
    compilation measurably stalls every subsequent query's codegen; the
    array form compiles to a constant-array loop. Both engines sum in
    index order, so the sign bits agree bit-for-bit.
    """
    chars = []
    for p in range(N_PLANES):
        ws = ", ".join(str(_weight(p, d)) for d in range(DIM))
        if dialect == "spark":
            proj = (
                f"aggregate(zip_with({vec}, array({ws}), "
                "(x, w) -> x * CAST(w AS DOUBLE)), "
                "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
            )
        else:
            proj = f"list_dot_product({vec}, [{ws}]::DOUBLE[])"
        chars.append(f"CASE WHEN ({proj}) > 0 THEN '1' ELSE '0' END")
    return f"concat({', '.join(chars)})"


_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"


_BAND_EQ = " OR ".join(
    f"substr(a.bucket, {i * BAND_BITS + 1}, {BAND_BITS})"
    f" = substr(b.bucket, {i * BAND_BITS + 1}, {BAND_BITS})"
    for i in range(N_BANDS)
)


@register(
    "dedup_embedding_near_pairs",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             {_bucket_expr("(embedding::DOUBLE[])", "duckdb")} AS bucket
      FROM embeddings
    ),
    cand AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             list_cosine_similarity(a.v, b.v) AS sim
      FROM e a JOIN e b
        ON a.vec_id < b.vec_id
       AND ({_BAND_EQ})
    )
    SELECT vec_a, vec_b, round(sim, 6) AS cosine_sim
    FROM cand WHERE sim >= {COSINE_TAU}
    """,
)
def dedup_embedding_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate embeddings: LSH banding (4 bands × 8 sign bits)
    prunes the pair space, exact cosine verifies survivors.

    Band geometry: 8-bit bands give 256 buckets per band, so the
    candidate set is ~n²·Σp_band instead of the n²/16 a 4-bit band
    allows (measured at sf0.1: 4-bit × 2 bands produced 264k candidate
    pairs from 2000 vectors — 13% of the full cross product — while
    8-bit × 4 bands produces ~8× fewer with better recall on
    high-cosine pairs). Band width must grow with log(n) at larger
    corpora; 8 bits serves to ~10⁵ vectors, then widen.

    At 100 TB the band join replaces the O(n²) cross product with
    per-bucket blocks; skewed buckets (near-constant vectors) would need
    bucket-size caps — noted, not needed on this corpus.

    Two per-pair cost cuts vs the naive verify:
    - vector norms are computed ONCE per vector before pair generation,
      so each candidate pair runs one 64-element dot product, not three;
    - a pair matching in multiple bands is kept only from its FIRST
      matching band (later bands require all earlier band keys to
      differ), replacing the dropDuplicates shuffle of the whole
      candidate set with a scalar predicate.
    """
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    e = (
        emb.selectExpr(
            "vec_id",
            "transform(embedding, x -> CAST(x AS DOUBLE)) AS v",
        )
        .withColumn("bucket", F.expr(_bucket_expr("v", "spark")))
        .withColumn("norm", F.sqrt(F.expr(_DOT.format(a="v", b="v"))))
    )
    # Explode the OR over bands into band rows: an OR-of-equalities join
    # condition cannot hash-partition (it degenerates to a nested-loop
    # cross product); per-band bucket keys restore a proper hash shuffle.
    bands = e.select(
        "vec_id",
        "v",
        "bucket",
        "norm",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.substring("bucket", i * BAND_BITS + 1, BAND_BITS).alias("key"),
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("vec_id", "v", "bucket", "norm", "band.band_id", "band.key")

    def _band(side: str, i: int) -> F.Column:
        return F.substring(F.col(f"{side}.bucket"), i * BAND_BITS + 1, BAND_BITS)

    # Keep a pair only in its FIRST matching band: for band i, all
    # earlier bands must differ (else the pair already surfaced there).
    first_match = F.lit(True)
    for i in range(1, N_BANDS):
        earlier_differ = F.lit(True)
        for j in range(i):
            earlier_differ = earlier_differ & (_band("a", j) != _band("b", j))
        first_match = F.when(F.col("band_id") == i, earlier_differ).otherwise(
            first_match
        )
    pairs = (
        bucket_pairs(
            bands, ["band_id", "key"], "vec_id", ["v", "bucket", "norm"],
            keep_bucket_cols=True, max_bucket=DEFAULT_MAX_BUCKET,
        )
        .filter(first_match)
        .select(
            F.col("a.id").alias("vec_a"),
            F.col("b.id").alias("vec_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
            (F.col("a.norm") * F.col("b.norm")).alias("norm_ab"),
        )
    )
    dot = F.expr(_DOT.format(a="va", b="vb"))
    return (
        pairs.withColumn("sim", dot / F.col("norm_ab"))
        .filter(F.col("sim") >= COSINE_TAU)
        .select("vec_a", "vec_b", F.round("sim", 6).alias("cosine_sim"))
    )


# --------------------------------------------------------------------------
# Duplicate clusters: connected components over the MinHash near-pair
# graph — the correct "keep one per duplicate CLUSTER" semantics (pair
# lists over- or under-delete when duplicates chain a~b~c).
# --------------------------------------------------------------------------
from ..operators.graph import connected_components  # noqa: E402
from .dedup import _SHINGLES_SQL, minhash_sig_sql  # noqa: E402
from .dedup import dedup_near_pairs_lsh as _lsh_pairs  # noqa: E402


@register(
    "dedup_cluster_assignments",
    oracle=f"""
    WITH RECURSIVE
    shingles AS ({_SHINGLES_SQL}),
    sig AS ({minhash_sig_sql()}),
    edges AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b ON a.seed = b.seed AND a.minhash = b.minhash
                            AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2
    ),
    und AS (
      SELECT doc_a AS u, doc_b AS v FROM edges
      UNION SELECT doc_b, doc_a FROM edges
    ),
    reach(u, v) AS (
      SELECT u, v FROM und
      UNION
      SELECT r.u, d.v FROM reach r JOIN und d ON r.v = d.u
    )
    SELECT u AS doc_id, least(u, min(v)) AS cluster_id
    FROM reach GROUP BY u ORDER BY doc_id
    """,
)
def dedup_cluster_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id) for every doc in a near-dup pair (>= 2
    matching MinHash bands); cluster_id is the smallest doc_id in the
    connected component. Spark side: iterative label propagation
    (operators/graph.py); oracle side: DuckDB recursive-CTE transitive
    closure — an independent algorithm, so the equivalence check covers
    the iteration's convergence, not just a SQL restatement."""
    pairs = _lsh_pairs(spark, sf_dir).filter(F.col("n_matching_bands") >= 2)
    cc = connected_components(pairs, "doc_a", "doc_b")
    return cc.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    ).orderBy("doc_id")


@register(
    "dedup_cluster_keep_best",
    oracle=f"""
    WITH RECURSIVE
    shingles AS ({_SHINGLES_SQL}),
    sig AS ({minhash_sig_sql()}),
    edges AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b ON a.seed = b.seed AND a.minhash = b.minhash
                            AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2
    ),
    und AS (
      SELECT doc_a AS u, doc_b AS v FROM edges
      UNION SELECT doc_b, doc_a FROM edges
    ),
    reach(u, v) AS (
      SELECT u, v FROM und
      UNION
      SELECT r.u, d.v FROM reach r JOIN und d ON r.v = d.u
    ),
    clusters AS (
      SELECT u AS doc_id, least(u, min(v)) AS cluster_id
      FROM reach GROUP BY u
    ),
    ranked AS (
      SELECT c.doc_id, c.cluster_id,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn
      FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
    )
    SELECT r.doc_id, r.cluster_id,
           k.doc_id AS keeper_doc_id,
           (r.rn = 1) AS is_kept
    FROM ranked r
    JOIN ranked k ON r.cluster_id = k.cluster_id AND k.rn = 1
    """,
)
def dedup_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's END PRODUCT: one survivor per duplicate
    cluster — the longest document (n_chars), doc_id as tiebreak — with
    every member mapped to its keeper. Pair lists alone over- or
    under-delete when duplicates chain (a~b~c); clustering first, then
    argmax-per-cluster, is the semantics pretraining dedup actually ships.

    100 TB: clusters come from the banded-LSH component pass (bounded
    pair space, label propagation); the ranking window partitions by
    cluster_id — duplicate clusters are small by nature, so no window
    skew — and the keeper map is a self-join on the cluster key of an
    already-tiny relation.
    """
    clusters = dedup_cluster_assignments(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = clusters.join(d, "doc_id").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("cluster_id").orderBy(
                F.col("n_chars").desc(), F.col("doc_id").asc()
            )
        ),
    )
    keepers = ranked.filter(F.col("rn") == 1).select(
        "cluster_id", F.col("doc_id").alias("keeper_doc_id")
    )
    return ranked.join(keepers, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "keeper_doc_id",
        (F.col("rn") == 1).alias("is_kept"),
    )
