"""Hybrid retrieval: keyword (inverted-index) search + vector search
over the SAME corpus (documents.doc_id ↔ embeddings.vec_id), fused by
reciprocal-rank fusion (RRF), plus the retrieve-then-rerank composition.

This is the serving-side shape of a modern retrieval stack (BM25-ish
lexical recall + dense-vector semantic recall, RRF fusion as used by
OpenSearch/Vespa/Elastic hybrid endpoints), re-expressed as relational
plans — the natural consumer of the corpus this engine curates.

Determinism contract: both per-system scores round at 1e-6 BEFORE
ranking (near-ties become exact ties, broken by doc id in both
engines), so ranks — which feed the fused score — cannot flip on float
summation order. The RRF terms 1/(60+rank) are single correctly-rounded
IEEE divisions of integers, bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register

N_QUERIES = 5  # doc_id < 5 are the query documents
K_RETRIEVE = 20  # per-system candidate depth
TOP_K = 10  # fused / reranked result depth
RRF_K = 60  # standard RRF dampening constant

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"


def _kw_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword retrieval: idf-weighted distinct-token overlap between
    each query document and every other document, top-K_RETRIEVE per
    query. score(q, d) = Σ_{t ∈ tokens(q) ∩ tokens(d)} ln(N/df(t)).

    100 TB plan shape: the score sums idf only over terms the QUERY SET
    contains, so no vocabulary-wide df state is ever built — the df
    table is computed for the query terms alone (semi-join against the
    broadcast query tokens, then a map-side-combined count: a stopword
    query term appearing in every doc collapses to ≤ #map-partitions
    partials before its shuffle) and broadcast back at |Q-vocabulary|
    size. The corpus term relation is only ever filtered/joined
    map-side against broadcasts — raw postings are NEVER shuffled by
    term (a term-keyed exchange would put a stopword's every posting in
    one task). The query side is a pushed-down scan of the |Q| ids. The
    only real shuffle is the per-(query, doc) score aggregate, which
    has map-side combine. The term explode runs twice (df pass + probe
    pass) — map-side CPU, the price of zero skewed shuffles.
    """
    d = load_table(spark, sf_dir, "documents")
    terms = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).distinct()
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    q = (
        d.filter(F.col("doc_id") < N_QUERIES)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.split("text", " ")).alias("term"),
        )
        .distinct()
    )
    idf_q = (
        terms.join(F.broadcast(q.select("term").distinct()), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(F.broadcast(n))
        .select("term", F.log(F.col("n_docs") / F.col("df")).alias("idf"))
    )
    scored = (
        terms.join(F.broadcast(q), "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(F.broadcast(idf_q), "term")
        .groupBy("query_id", F.col("doc_id").alias("match_id"))
        .agg(F.round(F.sum("idf"), 6).alias("kw_score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("kw_score"), "match_id")
    return (
        scored.withColumn("kw_rank", F.row_number().over(w))
        .filter(F.col("kw_rank") <= K_RETRIEVE)
        .select("query_id", "match_id", "kw_score", "kw_rank")
    )


def _vec_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector retrieval: cosine top-K_RETRIEVE per query embedding
    (broadcast-query corpus scan — the brute-force baseline; swap in the
    IVF/PQ lanes for the indexed path at scale). Bounded by the same
    query-set guard as the similarity lanes."""
    from .similarity import check_brute_force_bound

    check_brute_force_bound(N_QUERIES)
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = e.select(F.col("vec_id").alias("match_id"), F.col("v").alias("cv"))
    dot = F.expr(_DOT.format(a="qv", b="cv"))
    nq = F.sqrt(F.expr(_DOT.format(a="qv", b="qv")))
    nc = F.sqrt(F.expr(_DOT.format(a="cv", b="cv")))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("match_id"))
        .select("query_id", "match_id", F.round(dot / (nq * nc), 6).alias("vec_score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("vec_score"), "match_id")
    return (
        scored.withColumn("vec_rank", F.row_number().over(w))
        .filter(F.col("vec_rank") <= K_RETRIEVE)
        .select("query_id", "match_id", "vec_score", "vec_rank")
    )


# Shared CTE chains (DuckDB side), mirroring the two retrievers above.
_KW_SQL = f"""
    terms AS (
      SELECT DISTINCT doc_id, t.term
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           UNNEST(toks) AS t(term)
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    idf AS (
      SELECT term, ln(n.n_docs * 1.0 / count(*)) AS idf
      FROM terms CROSS JOIN n GROUP BY term, n.n_docs
    ),
    kw_scored AS (
      SELECT q.doc_id AS query_id, c.doc_id AS match_id,
             round(sum(i.idf), 6) AS kw_score
      FROM terms q
      JOIN terms c ON c.term = q.term AND c.doc_id <> q.doc_id
      JOIN idf i ON i.term = q.term
      WHERE q.doc_id < {N_QUERIES}
      GROUP BY q.doc_id, c.doc_id
    ),
    kw_topk AS (
      SELECT query_id, match_id, kw_score, kw_rank FROM (
        SELECT *, CAST(row_number() OVER (
          PARTITION BY query_id ORDER BY kw_score DESC, match_id) AS INT) AS kw_rank
        FROM kw_scored
      ) WHERE kw_rank <= {K_RETRIEVE}
    )
"""

_VEC_SQL = f"""
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    vec_scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS match_id,
             round(list_cosine_similarity(q.v, c.v), 6) AS vec_score
      FROM e q, e c
      WHERE q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    ),
    vec_topk AS (
      SELECT query_id, match_id, vec_score, vec_rank FROM (
        SELECT *, CAST(row_number() OVER (
          PARTITION BY query_id ORDER BY vec_score DESC, match_id) AS INT) AS vec_rank
        FROM vec_scored
      ) WHERE vec_rank <= {K_RETRIEVE}
    )
"""


@register(
    "hybrid_search_rrf",
    oracle=f"""
    WITH {_KW_SQL},
    {_VEC_SQL},
    fused AS (
      SELECT coalesce(k.query_id, v.query_id) AS query_id,
             coalesce(k.match_id, v.match_id) AS match_id,
             round(coalesce(1.0 / ({RRF_K} + k.kw_rank), 0)
                 + coalesce(1.0 / ({RRF_K} + v.vec_rank), 0), 6) AS rrf_score,
             coalesce(k.kw_rank, 0) AS kw_rank,
             coalesce(v.vec_rank, 0) AS vec_rank
      FROM kw_topk k
      FULL OUTER JOIN vec_topk v
        ON v.query_id = k.query_id AND v.match_id = k.match_id
    )
    SELECT query_id, match_id, rrf_score, kw_rank, vec_rank, rnk FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY rrf_score DESC, match_id) AS INT) AS rnk
      FROM fused
    ) WHERE rnk <= {TOP_K}
    """,
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion: keyword top-20 and
    vector top-20 per query, fused as Σ 1/(60+rank) over the systems
    that retrieved the document (rank 0 in the output = not retrieved by
    that system). The fused top-10 rewards documents BOTH systems agree
    on without comparing their incomparable raw scores — which is why
    production hybrid endpoints default to RRF.

    100 TB plan shape: each retriever is independently scalable (see
    _kw_topk / _vec_topk); fusion joins two K-row-per-query relations —
    negligible. The full-outer join keys are (query, match) on two
    already-small sides; AQE will broadcast one.
    """
    kw = _kw_topk(spark, sf_dir)
    vec = _vec_topk(spark, sf_dir)
    fused = (
        kw.join(vec, ["query_id", "match_id"], "full_outer")
        .select(
            "query_id",
            "match_id",
            F.round(
                F.coalesce(1.0 / (RRF_K + F.col("kw_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (RRF_K + F.col("vec_rank")), F.lit(0.0)),
                6,
            ).alias("rrf_score"),
            F.coalesce("kw_rank", F.lit(0)).alias("kw_rank"),
            F.coalesce("vec_rank", F.lit(0)).alias("vec_rank"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), "match_id")
    return (
        fused.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "match_id", "rrf_score", "kw_rank", "vec_rank", "rnk")
    )


@register(
    "hybrid_search_rerank",
    oracle=f"""
    WITH {_KW_SQL},
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    reranked AS (
      SELECT k.query_id, k.match_id, k.kw_rank,
             round(list_cosine_similarity(qe.v, ce.v), 6) AS vec_score
      FROM kw_topk k
      JOIN e qe ON qe.vec_id = k.query_id
      JOIN e ce ON ce.vec_id = k.match_id
    )
    SELECT query_id, match_id, vec_score, kw_rank, rnk FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY vec_score DESC, match_id) AS INT) AS rnk
      FROM reranked
    ) WHERE rnk <= {TOP_K}
    """,
)
def hybrid_search_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieve-then-rerank: the keyword index supplies cheap lexical
    recall (top-20), the dense vectors re-score ONLY those candidates by
    cosine — the two-stage shape used when the reranker (here a dot
    product; in production a cross-encoder) is too expensive for the
    full corpus.

    100 TB plan shape: the rerank join touches K_RETRIEVE×|Q| vectors —
    the candidate relation is broadcast against the embedding table's
    equi-join on id, so reranking cost is independent of corpus size.
    """
    kw = _kw_topk(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    qe = e.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    ce = e.select(F.col("vec_id").alias("match_id"), F.col("v").alias("cv"))
    dot = F.expr(_DOT.format(a="qv", b="cv"))
    nq = F.sqrt(F.expr(_DOT.format(a="qv", b="qv")))
    nc = F.sqrt(F.expr(_DOT.format(a="cv", b="cv")))
    reranked = (
        F.broadcast(kw.select("query_id", "match_id", "kw_rank"))
        .join(qe, "query_id")
        .join(ce, "match_id")
        .select(
            "query_id",
            "match_id",
            "kw_rank",
            F.round(dot / (nq * nc), 6).alias("vec_score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("vec_score"), "match_id")
    return (
        reranked.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "match_id", "vec_score", "kw_rank", "rnk")
    )
