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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.util import fan_out
from ..sources import load_table
from .registry import register

# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------
_HEX = "0123456789abcdef"


def _simhash_bit_votes(dialect: str) -> list[str]:
    """64 aggregate expressions: vote sum for each fingerprint bit.

    Bit j lives in hex digit position j//4 (1-based substr) at sub-bit
    j%4. d = instr('0123456789abcdef', substr(h, pos, 1)) - 1 ∈ [0,15].
    """
    exprs = []
    for j in range(64):
        pos, b = j // 4 + 1, j % 4
        d = f"(instr('{_HEX}', substr(h, {pos}, 1)) - 1)"
        bit = f"(shiftright({d}, {b}) & 1)" if dialect == "spark" else f"(({d} >> {b}) & 1)"
        exprs.append(f"sum(2 * {bit} - 1)")
    return exprs


def _simhash_select(dialect: str) -> str:
    votes = _simhash_bit_votes(dialect)
    bits = ", ".join(f"CASE WHEN {v} > 0 THEN '1' ELSE '0' END" for v in votes)
    return f"concat({bits})"


_TOKENS_SQL = """
      SELECT doc_id, md5(t.token) AS h
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           UNNEST(toks) AS t(token)
"""


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
    tokens = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).select("doc_id", F.md5("token").alias("h"))
    return tokens.groupBy("doc_id").agg(
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
             a.simhash AS ha, b.simhash AS hb
      FROM sig a JOIN sig b
        ON a.doc_id < b.doc_id
       AND substr(a.simhash, 1, 16) = substr(b.simhash, 1, 16)
    )
    SELECT doc_a, doc_b,
           CAST({" + ".join(f"CASE WHEN substr(ha,{i},1) <> substr(hb,{i},1) THEN 1 ELSE 0 END" for i in range(1, 65))} AS INT)
             AS hamming
    FROM pairs
    WHERE {" + ".join(f"CASE WHEN substr(ha,{i},1) <> substr(hb,{i},1) THEN 1 ELSE 0 END" for i in range(1, 65))} <= 16
    """,
)
def dedup_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates: block on the first 16-bit band (the
    LSH step — at scale, block on each of the 4 bands), then verify by
    Hamming distance ≤ 16."""
    sig = dedup_simhash(spark, sf_dir)
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    hamming = sum(
        F.when(F.substring("ha", i, 1) != F.substring("hb", i, 1), 1).otherwise(0)
        for i in range(1, 65)
    )
    return (
        a.join(
            b,
            (F.col("doc_a") < F.col("doc_b"))
            & (F.substring("ha", 1, 16) == F.substring("hb", 1, 16)),
        )
        .withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= 16)
        .select("doc_a", "doc_b", "hamming")
    )


# --------------------------------------------------------------------------
# Embedding-cosine near-dup via sign-random-projection LSH
# --------------------------------------------------------------------------
N_PLANES = 8  # 2 bands × 4 planes
BAND_BITS = 4
DIM = 64
COSINE_TAU = 0.35


def _weight(plane: int, dim: int) -> int:
    """Deterministic ±1 hyperplane weight (md5-seeded, engine-independent)."""
    return 1 if int(hashlib.md5(f"{plane}_{dim}".encode()).hexdigest()[0], 16) < 8 else -1


def _bucket_expr(vec: str, dialect: str) -> str:
    """8-char sign bucket for a DOUBLE[] column named `vec`."""
    chars = []
    for p in range(N_PLANES):
        elem = (
            (lambda i: f"element_at({vec}, {i})")
            if dialect == "spark"
            else (lambda i: f"{vec}[{i}]")
        )
        proj = " + ".join(f"({_weight(p, d)})*{elem(d + 1)}" for d in range(DIM))
        chars.append(f"CASE WHEN ({proj}) > 0 THEN '1' ELSE '0' END")
    return f"concat({', '.join(chars)})"


_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"


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
       AND (substr(a.bucket, 1, {BAND_BITS}) = substr(b.bucket, 1, {BAND_BITS})
            OR substr(a.bucket, {BAND_BITS + 1}, {BAND_BITS}) = substr(b.bucket, {BAND_BITS + 1}, {BAND_BITS}))
    )
    SELECT vec_a, vec_b, round(sim, 6) AS cosine_sim
    FROM cand WHERE sim >= {COSINE_TAU}
    """,
)
def dedup_embedding_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate embeddings: LSH banding (2 bands × 4 sign bits)
    prunes the pair space, exact cosine verifies survivors.

    At 100 TB the band join replaces the O(n²) cross product with
    per-bucket blocks; skewed buckets (near-constant vectors) would need
    bucket-size caps — noted, not needed on this corpus.
    """
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    e = emb.selectExpr(
        "vec_id",
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS v",
    ).withColumn("bucket", F.expr(_bucket_expr("v", "spark")))
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("bucket").alias("ba")
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("bucket").alias("bb")
    )
    dot = F.expr(_DOT.format(a="va", b="vb"))
    na = F.sqrt(F.expr(_DOT.format(a="va", b="va")))
    nb = F.sqrt(F.expr(_DOT.format(a="vb", b="vb")))
    band_match = (
        F.substring("ba", 1, BAND_BITS) == F.substring("bb", 1, BAND_BITS)
    ) | (
        F.substring("ba", BAND_BITS + 1, BAND_BITS)
        == F.substring("bb", BAND_BITS + 1, BAND_BITS)
    )
    return (
        a.join(b, (F.col("vec_a") < F.col("vec_b")) & band_match)
        .withColumn("sim", dot / (na * nb))
        .filter(F.col("sim") >= COSINE_TAU)
        .select("vec_a", "vec_b", F.round("sim", 6).alias("cosine_sim"))
    )
