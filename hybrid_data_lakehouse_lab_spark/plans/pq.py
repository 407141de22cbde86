"""Product quantization (PQ) for embedding compression + ANN scoring.

The IVF lanes (plans/similarity.py) answer the "which vectors do I even
look at" half of the 100 TB ANN problem; PQ answers the other half:
"how do I score candidates without storing/scanning full vectors". A
64-d float vector (256 B) compresses to M_SUB codebook codes (one byte
each) — 32× — and queries score candidates from a per-query lookup table (LUT)
without ever touching the original vectors. This is the FAISS IVF-PQ
shape re-expressed as relational plans; the reference repo has no
comparable operator (its serving layer is Pinot segment scans).

Determinism contract (same as the k-means quantizer in
plans/similarity.py): codebook coordinates round at 1e-6 after each
mean, squared distances at 1e-5 before each argmin, ties break by code
id — so engine-specific float summation order cannot flip any code
assignment, and both engines build bit-identical codebooks.

The key structural fact both engines share: the training-assignment
distance relation pqd1(vec_id, sub, code, d) IS the ADC lookup table —
restricted to query vec_ids it gives, for every (query, subspace,
code), the squared distance from the query's subvector to that
codeword. The Spark plan and the oracle both read the LUT out of pqd1,
so they cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register

DIM = 64
M_SUB = 8  # subspaces
SUB_DIM = DIM // M_SUB  # dims per subspace
K_CODES = 16  # codewords per subspace; vec_id < K_CODES seed the codebooks
N_QUERIES = 5  # vec_id < 5 are the query vectors
TOP_K = 10

# Squared L2 distance between two double arrays, JVM-side.
_SQDIST = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
    " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
)


def _subvectors(e: DataFrame, m_sub: int = M_SUB) -> DataFrame:
    """(vec_id, v[64]) -> (vec_id, sub, sv[dim/m_sub]): m_sub rows per
    vector (M_SUB production default; 16 for the code-budget lever).

    100 TB: map-side array slicing — no shuffle, no Python. The m_sub×
    row inflation carries 1/m_sub-width arrays, so bytes in flight are
    unchanged.
    """
    sub_dim = DIM // m_sub
    subs = F.array(
        *[
            F.struct(
                F.lit(m).alias("sub"),
                F.slice("v", m * sub_dim + 1, sub_dim).alias("sv"),
            )
            for m in range(m_sub)
        ]
    )
    return e.select("vec_id", F.explode(subs).alias("s")).select(
        "vec_id", F.col("s.sub").alias("sub"), F.col("s.sv").alias("sv")
    )


def _pq_distances(subv: DataFrame, cb: DataFrame) -> DataFrame:
    """Distance relation: (vec_id, sub, code, d) for every codeword of
    the row's subspace. cb is (sub, code, cv[SUB_DIM]) — K_CODES×M_SUB rows,
    always broadcast; the join on sub never shuffles the corpus."""
    d = F.round(F.expr(_SQDIST.format(a="sv", b="cv")), 5)
    return subv.join(F.broadcast(cb), "sub").select("vec_id", "sub", "code", d.alias("d"))


def _pq_assign(dist: DataFrame) -> DataFrame:
    """Argmin over codes per (vec_id, sub) via struct-min (no window)."""
    return (
        dist.groupBy("vec_id", "sub")
        .agg(F.min(F.struct("d", "code")).alias("m"))
        .select("vec_id", "sub", F.col("m.code").alias("code"))
    )


def _pq_codebook_update(assigned: DataFrame, subv: DataFrame) -> DataFrame:
    """Per-(sub, code) mean subvector. Explode to scalar dims for the
    mean, re-assemble ordered by position, round at 1e-6.

    100 TB: map-side combine reduces each partition to ≤ M_SUB×K_CODES×
    SUB_DIM partial sums before the one shuffle; output is M_SUB×K_CODES rows."""
    dims = assigned.join(subv, ["vec_id", "sub"]).select(
        "sub", "code", F.posexplode("sv").alias("spos", "x")
    )
    cd = dims.groupBy("sub", "code", "spos").agg(F.avg("x").alias("cx"))
    cv = F.transform(
        F.array_sort(F.collect_list(F.struct("spos", "cx"))),
        lambda s: F.round(s["cx"], 6),
    )
    return cd.groupBy("sub", "code").agg(cv.alias("cv"))


def _pq_train_distances(
    spark: SparkSession,
    sf_dir: str,
    m_sub: int = M_SUB,
    k_codes: int = K_CODES,
    seed: str = "prefix",
) -> DataFrame:
    """Train the PQ codebooks (seed → assign → mean-update) and return
    the final distance relation pqd1 against the refined codebooks.
    Codes = argmin(pqd1); ADC LUT = pqd1 filtered to query ids.

    Seeding: ``prefix`` (production default) takes vec_id < k_codes;
    ``md5`` takes the k_codes vec_ids with the smallest
    md5(CAST(vec_id AS STRING)) — a deterministic pseudo-random sample
    identical in both engines, required once k_codes stops being tiny
    relative to the corpus (a contiguous id-prefix of 256 would be a
    biased, generator-order-correlated seed set and would swallow the
    query ids). Scale shape: the md5 pick is orderBy().limit(k) — a
    per-partition top-k merge (TakeOrderedAndProject), never a global
    sort — and the k-row result gets its code ids from a window over
    k rows, then broadcasts."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    subv = _subvectors(e, m_sub)
    if seed == "md5":
        picked = (
            e.select("vec_id", F.md5(F.col("vec_id").cast("string")).alias("h"))
            .orderBy("h", "vec_id")
            .limit(k_codes)
        )
        codes = picked.withColumn(
            "code",
            (F.row_number().over(Window.orderBy("h", "vec_id")) - 1).cast("int"),
        ).select("vec_id", "code")
        cb0 = subv.join(F.broadcast(codes), "vec_id").select(
            "sub", "code", F.col("sv").alias("cv")
        )
    else:
        cb0 = subv.filter(F.col("vec_id") < k_codes).select(
            "sub", F.col("vec_id").cast("int").alias("code"), F.col("sv").alias("cv")
        )
    pqa0 = _pq_assign(_pq_distances(subv, cb0))
    # Materialize the trained codebooks (M_SUB×K_CODES rows): every
    # downstream reference to pqd1 otherwise re-runs the whole training
    # subtree — Spark reuses no subtrees across join branches, and the
    # composed lanes (codes + LUT + refine) reference it repeatedly
    # (measured 14 corpus scans in similarity_ivfpq_topk before this).
    # With cb1 pinned, training touches the corpus exactly twice (assign,
    # update) and each pqd1 consumer costs one broadcast-join pass.
    cb1 = _pq_codebook_update(pqa0, subv).localCheckpoint()
    return _pq_distances(subv, cb1)


def _pq_adc_distances(pqd1: DataFrame, cand: DataFrame | None = None) -> DataFrame:
    """ADC distance relation (query_id, match_id, adc_dist) from the
    trained distance relation: codes = argmin(pqd1), LUT = pqd1's
    query-id slice, score = round(Σ_m pd, 5). With `cand` (query_id,
    match_id) the scoring is restricted to those candidate pairs (the
    IVF-PQ path); without it every corpus vector is a candidate. One
    definition for all three ADC consumers so the rounding contract and
    query predicate cannot drift between lanes."""
    codes = _pq_assign(pqd1)
    lut = pqd1.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "sub", "code", F.col("d").alias("pd")
    )
    if cand is not None:
        scored = codes.join(F.broadcast(cand), codes.vec_id == cand.match_id).join(
            F.broadcast(lut), ["query_id", "sub", "code"]
        )
    else:
        scored = (
            codes.join(F.broadcast(lut), ["sub", "code"])
            .filter(F.col("vec_id") != F.col("query_id"))
            .withColumn("match_id", F.col("vec_id"))
        )
    return scored.groupBy("query_id", "match_id").agg(
        F.round(F.sum("pd"), 5).alias("adc_dist")
    )


# Shared training CTE chain (DuckDB side). sdims is the scalar-dim view
# of every vector's subvectors; pqd1 is the final distance relation whose
# argmin is the code assignment and whose query-id slice is the ADC LUT
# — exactly mirroring _pq_train_distances above.
_PQ_E_SQL = "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)"

# Chain body without the `e` CTE, so it can compose with the k-means
# chain from plans/similarity.py (which defines the identical `e`).
# Generated so the code-budget audit can instantiate a second chain
# (m_sub=16 → 64-bit codes) with suffixed CTE names beside the default.


def _pq_chain_sql(
    m_sub: int = M_SUB,
    sfx: str = "",
    k_codes: int = K_CODES,
    seed: str = "prefix",
) -> str:
    sub_dim = DIM // m_sub
    if seed == "md5":
        cb0 = f"""
    seeds{sfx} AS (
      SELECT vec_id,
             CAST(row_number() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS INT) AS code
      FROM (SELECT vec_id FROM e
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k_codes})
    ),
    cb0{sfx} AS (
      SELECT s.sub, sd.code, s.spos, s.x AS cx
      FROM sdims{sfx} s JOIN seeds{sfx} sd ON sd.vec_id = s.vec_id
    ),"""
    else:
        cb0 = f"""
    cb0{sfx} AS (
      SELECT sub, CAST(vec_id AS INT) AS code, spos, x AS cx
      FROM sdims{sfx} WHERE vec_id < {k_codes}
    ),"""
    return f"""
    sdims{sfx} AS (
      SELECT vec_id,
             CAST((t.i - 1) // {sub_dim} AS INT) AS sub,
             CAST((t.i - 1) % {sub_dim} AS INT) AS spos,
             v[t.i] AS x
      FROM e, UNNEST(range(1, {DIM + 1})) AS t(i)
    ),{cb0}
    pqd0{sfx} AS (
      SELECT s.vec_id, s.sub, c.code,
             round(sum((s.x - c.cx) * (s.x - c.cx)), 5) AS d
      FROM sdims{sfx} s JOIN cb0{sfx} c ON c.sub = s.sub AND c.spos = s.spos
      GROUP BY s.vec_id, s.sub, c.code
    ),
    pqa0{sfx} AS (
      SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code) AS rn
        FROM pqd0{sfx}
      ) WHERE rn = 1
    ),
    cb1{sfx} AS (
      SELECT a.sub, a.code, s.spos, round(avg(s.x), 6) AS cx
      FROM pqa0{sfx} a JOIN sdims{sfx} s ON s.vec_id = a.vec_id AND s.sub = a.sub
      GROUP BY a.sub, a.code, s.spos
    ),
    pqd1{sfx} AS (
      SELECT s.vec_id, s.sub, c.code,
             round(sum((s.x - c.cx) * (s.x - c.cx)), 5) AS d
      FROM sdims{sfx} s JOIN cb1{sfx} c ON c.sub = s.sub AND c.spos = s.spos
      GROUP BY s.vec_id, s.sub, c.code
    )
"""


_PQ_CHAIN_SQL = _pq_chain_sql()

_PQ_SQL = f"{_PQ_E_SQL},{_PQ_CHAIN_SQL}"


@register(
    "embedding_pq_codes",
    oracle=f"""
    WITH {_PQ_SQL}
    SELECT vec_id, sub, CAST(code AS INT) AS code FROM (
      SELECT vec_id, sub, code,
             row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code) AS rn
      FROM pqd1
    ) WHERE rn = 1
    ORDER BY vec_id, sub
    """,
)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encoding of the corpus: each vector becomes M_SUB codebook
    codes — the 64×-compressed representation an ANN index actually
    stores. Codebooks are trained with one deterministic Lloyd step per
    subspace (seed = subvectors of the K_CODES lowest vec_ids).

    100 TB plan shape: training touches the corpus twice (assign,
    mean-update) with only the M_SUB×K_CODES-row codebook ever broadcast; encoding
    is one more broadcast-join pass. The corpus is never shuffled at
    vector width — the only wide shuffle key is (sub, code, spos) with
    map-side combine.
    """
    pqd1 = _pq_train_distances(spark, sf_dir)
    return _pq_assign(pqd1).select(
        "vec_id", "sub", F.col("code").cast("int").alias("code")
    ).orderBy("vec_id", "sub")


@register(
    "similarity_pq_adc_topk",
    oracle=f"""
    WITH {_PQ_SQL},
    codes AS (
      SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code) AS rn
        FROM pqd1
      ) WHERE rn = 1
    ),
    lut AS (
      SELECT vec_id AS query_id, sub, code, d AS pd
      FROM pqd1 WHERE vec_id < {N_QUERIES}
    ),
    adist AS (
      SELECT l.query_id, co.vec_id AS match_id, round(sum(l.pd), 5) AS adc_dist
      FROM codes co JOIN lut l ON l.sub = co.sub AND l.code = co.code
      WHERE co.vec_id <> l.query_id
      GROUP BY l.query_id, co.vec_id
    )
    SELECT query_id, match_id, adc_dist, rnk FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY adc_dist, match_id) AS INT) AS rnk
      FROM adist
    ) WHERE rnk <= {TOP_K}
    """,
)
def similarity_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: queries keep exact subvectors,
    candidates are scored from their PQ codes alone via a per-query LUT
    — approximate squared-L2 = Σ_m LUT[query, m, code_m]. The LUT is the
    query-id slice of the training distance relation, so no separate
    query-encoding step can drift from the codebooks. The summed
    distance re-rounds at 1e-5: the true sum of M_SUB 1e-5-multiples is
    itself a 1e-5 multiple, so the float jitter (~1e-15) can never reach
    a rounding boundary — a coarser 1e-4 round would sit exactly on the
    x.00005 half-ulp and flip between engines.

    100 TB plan shape: the scored relation never touches a stored
    vector — it joins the (vec_id, sub, code) code table against a
    broadcast LUT of |Q|×M_SUB×K_CODES rows on (sub, code) and sums
    map-side-combined partials per (query, candidate). With the code
    table as an array column the same LUT applies via element_at with
    zero join — the relational form is kept here so the oracle states
    the identical dataflow.
    """
    adist = _pq_adc_distances(_pq_train_distances(spark, sf_dir))
    w = Window.partitionBy("query_id").orderBy("adc_dist", "match_id")
    return (
        adist.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "match_id", "adc_dist", "rnk")
    )


@register(
    "similarity_pq_recall_audit",
    oracle=f"""
    WITH {_PQ_SQL},
    codes AS (
      SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code) AS rn
        FROM pqd1
      ) WHERE rn = 1
    ),
    lut AS (
      SELECT vec_id AS query_id, sub, code, d AS pd
      FROM pqd1 WHERE vec_id < {N_QUERIES}
    ),
    adist AS (
      SELECT l.query_id, co.vec_id AS match_id, round(sum(l.pd), 5) AS adc_dist
      FROM codes co JOIN lut l ON l.sub = co.sub AND l.code = co.code
      WHERE co.vec_id <> l.query_id
      GROUP BY l.query_id, co.vec_id
    ),
    pq_topk AS (
      SELECT query_id, match_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY adc_dist, match_id) AS rnk
        FROM adist
      ) WHERE rnk <= {TOP_K}
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
    exact AS (
      SELECT query_id, match_id FROM (
        SELECT q.query_id, c.vec_id AS match_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY round(list_distance(q.qv, c.v), 4), c.vec_id) AS rnk
        FROM q, e c WHERE c.vec_id <> q.query_id
      ) WHERE rnk <= {TOP_K}
    )
    SELECT x.query_id,
           CAST(count(p.match_id) AS BIGINT) AS hits,
           round(count(p.match_id) / {TOP_K}.0, 4) AS recall_at_{TOP_K}
    FROM exact x LEFT JOIN pq_topk p
      ON p.query_id = x.query_id AND p.match_id = x.match_id
    GROUP BY x.query_id
    ORDER BY x.query_id
    """,
)
def similarity_pq_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the PQ-ADC index against exact-L2 ground truth per
    query — the accuracy half of the compression trade, graded inside
    the engine (same shape as similarity_ivf_recall_audit). Ground truth
    ranks on L2 distance rounded at 1e-4, ties by match_id, in both
    engines.

    100 TB: the audit costs one brute-force scan per audit RUN (not per
    production query) over a query sample — exactly how recall is
    monitored on a real corpus.
    """
    adist = _pq_adc_distances(_pq_train_distances(spark, sf_dir))
    wk = Window.partitionBy("query_id").orderBy("adc_dist", "match_id")
    pq_topk = (
        adist.withColumn("rnk", F.row_number().over(wk))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "match_id")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    dist = F.round(F.sqrt(F.expr(_SQDIST.format(a="qv", b="cv"))), 4)
    we = Window.partitionBy("query_id").orderBy("ed", "match_id")
    exact = (
        F.broadcast(q)
        .crossJoin(e.select(F.col("vec_id").alias("match_id"), F.col("v").alias("cv")))
        .filter(F.col("match_id") != F.col("query_id"))
        .select("query_id", "match_id", dist.alias("ed"))
        .withColumn("rnk", F.row_number().over(we))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "match_id")
    )
    return (
        exact.join(pq_topk.withColumn("hit", F.lit(1)), ["query_id", "match_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce("hit", F.lit(0))).alias("hits"))
        .select(
            "query_id",
            "hits",
            F.round(F.col("hits") / F.lit(float(TOP_K)), 4).alias(f"recall_at_{TOP_K}"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# IVF-PQ: the full two-level ANN index — IVF coarse quantizer picks the
# candidate list, PQ-ADC scores it from codes. Composes the k-means
# chain (plans/similarity.py) with the PQ chain above in one oracle.
# ---------------------------------------------------------------------------

from .similarity import (  # noqa: E402  (shared quantizer machinery)
    _KMEANS_A1_SQL,
    _kmeans_assign,
    _kmeans_centroids,
    K_CLUSTERS,
)


@register(
    "similarity_ivfpq_topk",
    oracle=f"""
    WITH {_KMEANS_A1_SQL},
    {_PQ_CHAIN_SQL},
    cand AS (
      SELECT qa.vec_id AS query_id, a.vec_id AS match_id
      FROM a1 qa JOIN a1 a ON a.cluster = qa.cluster AND a.vec_id <> qa.vec_id
      WHERE qa.vec_id < {N_QUERIES}
    ),
    codes AS (
      SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code) AS rn
        FROM pqd1
      ) WHERE rn = 1
    ),
    lut AS (
      SELECT vec_id AS query_id, sub, code, d AS pd
      FROM pqd1 WHERE vec_id < {N_QUERIES}
    ),
    adist AS (
      SELECT c.query_id, c.match_id, round(sum(l.pd), 5) AS adc_dist
      FROM cand c
      JOIN codes co ON co.vec_id = c.match_id
      JOIN lut l ON l.query_id = c.query_id AND l.sub = co.sub AND l.code = co.code
      GROUP BY c.query_id, c.match_id
    )
    SELECT query_id, match_id, adc_dist, rnk FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY adc_dist, match_id) AS INT) AS rnk
      FROM adist
    ) WHERE rnk <= {TOP_K}
    """,
)
def similarity_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-k — the production 100 TB ANN shape end-to-end: the
    k-means coarse quantizer restricts each query to its own cluster's
    inverted list (candidate selection never scans the corpus), and
    PQ-ADC scores those candidates from their codes alone (scoring never
    touches a stored vector). This is the composition FAISS calls
    IndexIVFPQ, re-expressed as two shared relational chains.

    100 TB plan shape: the candidate relation (query_id, match_id) is
    |Q|×|list| rows and is BROADCAST; joining it to the code table is
    map-side, the LUT join is a second broadcast, and the only shuffle
    is the per-(query, candidate) partial-sum aggregate of M_SUB-row
    groups. Neither the IVF side nor the PQ side ever shuffles vectors.

    Determinism: inherits both chains' rounding contracts; the summed
    ADC distance re-rounds at 1e-5 (sum of 1e-5 multiples — see
    similarity_pq_adc_topk), ties break by match_id.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    c0 = e.filter(F.col("vec_id") < K_CLUSTERS).select(
        F.col("vec_id").cast("int").alias("cluster"), F.col("v").alias("cv")
    )
    a1 = _kmeans_assign(e, _kmeans_centroids(_kmeans_assign(e, c0)))
    cand = (
        a1.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "cluster")
        .join(a1.select(F.col("vec_id").alias("match_id"), "cluster"), "cluster")
        .filter(F.col("match_id") != F.col("query_id"))
        .select("query_id", "match_id")
    )
    adist = _pq_adc_distances(_pq_train_distances(spark, sf_dir), cand=cand)
    w = Window.partitionBy("query_id").orderBy("adc_dist", "match_id")
    return (
        adist.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "match_id", "adc_dist", "rnk")
    )


# ---------------------------------------------------------------------------
# PQ + exact refine (the FAISS IndexRefine shape): ADC ranks the corpus
# from codes alone, then the top-SHORTLIST candidates per query are
# re-scored with EXACT distances — only |Q|×SHORTLIST full vectors are
# ever fetched. This is what makes the compression lane USABLE: plain
# ADC top-10 recall is honest-but-low (~0.4 on these isotropic synthetic
# embeddings, where 8 bytes/vector cannot rank 10 near-equidistant
# neighbors), while the reranked lane recovers recall@10 ≥ 0.85 at the
# production config (M=8, K=16, scale-aware shortlist — measured 0.90 at
# sf0.01 with s=100 and 0.94 at sf0.1 with s=400 by
# similarity_pq_refine_sensitivity). Residual encoding after the IVF
# coarse quantizer was evaluated and does NOT help here (~0.3-0.4): with
# k=8 clusters over isotropic vectors the centroids absorb almost no
# variance, so the residual codebooks face the same quantization error —
# the refine step is the correct lever.
#
# SHORTLIST LAW (round 5): a fixed shortlist decays with corpus size —
# measured 0.96/0.90/0.76 recall@10 at N=500/500/2000 with s=100. On
# isotropic data a FIXED 32-bit code confuses a constant FRACTION of the
# corpus near any query, so the shortlist that holds recall grows
# linearly in N: s = clamp(SHORTLIST_FLOOR, ceil(N / SHORTLIST_DIV),
# SHORTLIST_MAX), integer-only so both engines agree exactly. The
# SHORTLIST_MAX cap (4096, ~40x the floor) marks where this knob is
# exhausted: past N ≈ 20M vectors the CODE budget must grow instead
# (bits per vector ∝ log N — more subspaces or K=256 codewords), which
# is a retrain, not a serving-time knob. The cap is visible by
# construction — similarity_pq_refine_sensitivity always carries the
# production-s row, so a recall sag at the cap shows up in the audit.
# The code-budget lever itself is implemented and measured by
# similarity_pq_code_budget_audit (round 6): doubling to 64-bit codes
# (M=16) lifts rerank recall at a FIXED 100-deep shortlist from
# 0.90→0.96 (sf0.01) and 0.76→0.84 (sf0.1) — the extra bits buy what
# deeper shortlists otherwise would, confirming the post-saturation
# escape hatch works before anyone needs it.
# ---------------------------------------------------------------------------

SHORTLIST_FLOOR = 100  # minimum ADC candidates per query for the refine step
SHORTLIST_DIV = 5  # s grows as ceil(N / 5): 100 at the N=500 anchor corpora
SHORTLIST_MAX = 4096  # past this, grow the code (log N bits), not the list
# integer-only law, identical text in both engines' dialects
_SL_SPARK = (
    f"least(greatest({SHORTLIST_FLOOR}, "
    f"(count(*) + {SHORTLIST_DIV - 1}) div {SHORTLIST_DIV}), {SHORTLIST_MAX})"
)
_SL_DUCK = (
    f"least(greatest({SHORTLIST_FLOOR}, "
    f"(count(*) + {SHORTLIST_DIV - 1}) // {SHORTLIST_DIV}), {SHORTLIST_MAX})"
)
REFINE_RS = (10, 50, 100)  # static sweep rows; 10 = plain ADC top-k set

_ADC_ORACLE_BODY = f"""
    codes AS (
      SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code) AS rn
        FROM pqd1
      ) WHERE rn = 1
    ),
    lut AS (
      SELECT vec_id AS query_id, sub, code, d AS pd
      FROM pqd1 WHERE vec_id < {N_QUERIES}
    ),
    adist AS (
      SELECT l.query_id, co.vec_id AS match_id, round(sum(l.pd), 5) AS adc_dist
      FROM codes co JOIN lut l ON l.sub = co.sub AND l.code = co.code
      WHERE co.vec_id <> l.query_id
      GROUP BY l.query_id, co.vec_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY adc_dist, match_id) AS arnk
      FROM adist
    ),
    sl AS (SELECT {_SL_DUCK} AS s FROM e),
    cand AS (SELECT query_id, match_id, arnk FROM ranked
             WHERE arnk <= (SELECT s FROM sl)),
    xd AS (
      SELECT c.query_id, c.match_id, c.arnk,
             round(list_distance(q.v, m.v), 4) AS ed
      FROM cand c
      JOIN e q ON q.vec_id = c.query_id
      JOIN e m ON m.vec_id = c.match_id
    )
"""


def _pq_rerank_xd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared Spark refine relation: (query_id, match_id, arnk, ed) for
    the per-query top-s ADC candidates (s = the scale-aware shortlist
    law), exact distance attached.

    100 TB plan shape: the shortlist (|Q|×s rows, s ≤ SHORTLIST_MAX) is
    BROADCAST to the corpus scan, so the refine step fetches exactly the
    candidate vectors and nothing else — the corpus is still never
    shuffled at vector width, and full-precision distance is paid for at
    most SHORTLIST_MAX vectors per query instead of the whole corpus.
    The corpus count feeding the law is a 1-row broadcast (audited BNLJ
    shape, listed in _INTENDED_BNLJ)."""
    adist = _pq_adc_distances(_pq_train_distances(spark, sf_dir))
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    sl = e.agg(F.expr(_SL_SPARK).alias("s"))
    wa = Window.partitionBy("query_id").orderBy("adc_dist", "match_id")
    cand = (
        adist.withColumn("arnk", F.row_number().over(wa))
        .crossJoin(F.broadcast(sl))
        .filter(F.col("arnk") <= F.col("s"))
        .select("query_id", "match_id", "arnk")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    ed = F.round(F.sqrt(F.expr(_SQDIST.format(a="qv", b="v"))), 4)
    return (
        F.broadcast(cand.join(q, "query_id"))
        .join(e, e.vec_id == cand.match_id)
        .select("query_id", "match_id", "arnk", ed.alias("ed"))
    )


@register(
    "similarity_pq_rerank_topk",
    oracle=f"""
    WITH {_PQ_SQL},
    {_ADC_ORACLE_BODY}
    SELECT query_id, match_id, ed AS exact_dist, rnk FROM (
      SELECT query_id, match_id, ed,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY ed, match_id) AS INT) AS rnk
      FROM xd
    ) WHERE rnk <= {TOP_K}
    """,
)
def similarity_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC shortlist → exact re-rank top-k: the production serving
    shape for the compression lane. ADC (codes only, no stored vectors)
    ranks the corpus and keeps s candidates per query — s from the
    scale-aware shortlist law (clamp(100, ceil(N/5), 4096), see the
    module-level SHORTLIST LAW note) so recall holds as the corpus
    grows; exact L2 re-scores just those and returns the top-k.
    Recall@10 at this config is ≥0.85 on every gate corpus (0.90 at
    sf0.01 with s=100, 0.94 at sf0.1 with s=400 — measured by
    similarity_pq_refine_sensitivity), vs ~0.4 for raw ADC
    top-10 — the standard accuracy/IO trade: full-precision reads for
    SHORTLIST vectors per query, never a corpus scan.

    Determinism: ADC ranks under the 1e-5 rounding contract, exact
    distances round at 1e-4, all ties break by match_id — both the
    shortlist membership and the final order are engine-independent.
    """
    xd = _pq_rerank_xd(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy("ed", "match_id")
    return (
        xd.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "match_id", F.col("ed").alias("exact_dist"), "rnk")
    )


@register(
    "similarity_pq_refine_sensitivity",
    oracle=f"""
    WITH {_PQ_SQL},
    {_ADC_ORACLE_BODY},
    rs AS (
      SELECT DISTINCT r FROM (
        {" UNION ALL ".join(f"SELECT CAST({r} AS BIGINT) AS r" for r in REFINE_RS)}
        UNION ALL SELECT s AS r FROM sl
      )
    ),
    rr AS (
      SELECT r.r, x.query_id, x.match_id,
             row_number() OVER (
               PARTITION BY r.r, x.query_id ORDER BY x.ed, x.match_id) AS rnk
      FROM xd x JOIN rs r ON x.arnk <= r.r
    ),
    sel AS (SELECT r, query_id, match_id FROM rr WHERE rnk <= {TOP_K}),
    q2 AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
    exact AS (
      SELECT query_id, match_id FROM (
        SELECT q2.query_id, c.vec_id AS match_id,
               row_number() OVER (
                 PARTITION BY q2.query_id
                 ORDER BY round(list_distance(q2.qv, c.v), 4), c.vec_id) AS rnk
        FROM q2, e c WHERE c.vec_id <> q2.query_id
      ) WHERE rnk <= {TOP_K}
    )
    SELECT CAST(r.r AS INT) AS shortlist,
           round(count(s.match_id) / {N_QUERIES * TOP_K}.0, 4) AS mean_recall
    FROM rs r
    JOIN exact x ON true
    LEFT JOIN sel s ON s.r = r.r AND s.query_id = x.query_id
                   AND s.match_id = x.match_id
    GROUP BY r.r
    ORDER BY shortlist
    """,
)
def similarity_pq_refine_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Refine-depth sensitivity: mean recall@k of the PQ pipeline as a
    function of the rerank shortlist size — the calibration report that
    justifies the shortlist law before the index serves traffic.
    r=10 is the plain-ADC baseline (reranking the top-10 set is a pure
    reorder, so its recall IS the uncompressed-ADC recall); the sweep
    ALWAYS carries the production-s row (the scale-aware law's value on
    this corpus — deduped against the static rows when they coincide),
    which must clear 0.85 (asserted by tests/test_round4_hardening.py
    and, at sf0.1, tests/test_round5_hardening.py).

    100 TB: the sweep reuses ONE ADC ranking and ONE exact-distance pass
    over the max-r candidate set; each row is a window re-cut, not a
    re-scan. The audit costs one brute-force ground-truth scan per RUN,
    same as the other recall audits.
    """
    xd = _pq_rerank_xd(spark, sf_dir)
    emb0 = load_table(spark, sf_dir, "embeddings")
    sl = emb0.agg(F.expr(_SL_SPARK).cast("bigint").alias("r"))
    rdf = (
        spark.createDataFrame([(r,) for r in REFINE_RS], "r BIGINT")
        .unionByName(sl)
        .distinct()
    )
    wr = Window.partitionBy("r", "query_id").orderBy("ed", "match_id")
    sel = (
        xd.join(F.broadcast(rdf), F.col("arnk") <= F.col("r"))
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= TOP_K)
        .select("r", "query_id", "match_id")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    dist = F.round(F.sqrt(F.expr(_SQDIST.format(a="qv", b="cv"))), 4)
    we = Window.partitionBy("query_id").orderBy("ed", "match_id")
    exact = (
        F.broadcast(q)
        .crossJoin(e.select(F.col("vec_id").alias("match_id"), F.col("v").alias("cv")))
        .filter(F.col("match_id") != F.col("query_id"))
        .select("query_id", "match_id", dist.alias("ed"))
        .withColumn("rnk", F.row_number().over(we))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "match_id")
    )
    return (
        exact.crossJoin(F.broadcast(rdf))
        .join(sel.withColumn("hit", F.lit(1)), ["r", "query_id", "match_id"], "left")
        .groupBy("r")
        .agg(
            F.round(
                F.sum(F.coalesce("hit", F.lit(0))) / F.lit(float(N_QUERIES * TOP_K)), 4
            ).alias("mean_recall")
        )
        .select(F.col("r").cast("int").alias("shortlist"), "mean_recall")
        .orderBy("shortlist")
    )


# ---------------------------------------------------------------------------
# Code-budget lever (round 6): the SHORTLIST LAW note above documents that
# past N ≈ 20M the shortlist knob saturates and the CODE budget must grow
# (bits per vector ∝ log N). This audit implements that lever — M=16
# subspaces → 64-bit codes vs the production M=8/32-bit — and measures
# what the extra bits buy at a FIXED refine cost: recall@10 of plain ADC
# and of exact-rerank over a fixed SHORTLIST_FLOOR-deep shortlist, per
# code budget. Better codes raising rerank-at-fixed-r recall is exactly
# "bits substitute for shortlist depth", the property the post-saturation
# regime needs. K=256 codewords is the same lever on the other axis; M=16
# is used here because its seeding (vec_id < K_CODES) stays corpus-
# independent, while K=256 seeds would consume half the sf0.001 corpus.
# ---------------------------------------------------------------------------

BUDGET_M16 = 16  # the doubled code budget: 16 subspaces × 4 bits


def _budget_oracle_block(sfx: str) -> str:
    """Per-chain oracle CTEs: ADC ranking, fixed-floor shortlist with
    exact distances, and the two top-k selections (plain ADC, reranked)."""
    return f"""
    codes{sfx}b AS (
      SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code) AS rn
        FROM pqd1{sfx}
      ) WHERE rn = 1
    ),
    lut{sfx}b AS (
      SELECT vec_id AS query_id, sub, code, d AS pd
      FROM pqd1{sfx} WHERE vec_id < {N_QUERIES}
    ),
    adist{sfx}b AS (
      SELECT l.query_id, co.vec_id AS match_id, round(sum(l.pd), 5) AS adc_dist
      FROM codes{sfx}b co JOIN lut{sfx}b l ON l.sub = co.sub AND l.code = co.code
      WHERE co.vec_id <> l.query_id
      GROUP BY l.query_id, co.vec_id
    ),
    ranked{sfx}b AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY adc_dist, match_id) AS arnk
      FROM adist{sfx}b
    ),
    xd{sfx}b AS (
      SELECT r.query_id, r.match_id, round(list_distance(q.v, m.v), 4) AS ed
      FROM ranked{sfx}b r
      JOIN e q ON q.vec_id = r.query_id
      JOIN e m ON m.vec_id = r.match_id
      WHERE r.arnk <= {SHORTLIST_FLOOR}
    ),
    rr{sfx}b AS (
      SELECT query_id, match_id FROM (
        SELECT query_id, match_id, row_number() OVER (
          PARTITION BY query_id ORDER BY ed, match_id) AS rnk
        FROM xd{sfx}b
      ) WHERE rnk <= {TOP_K}
    ),
    adc{sfx}b AS (
      SELECT query_id, match_id FROM ranked{sfx}b WHERE arnk <= {TOP_K}
    )
"""


def _budget_oracle_row(m_sub: int, sfx: str) -> str:
    hit = (
        "s JOIN exact x ON x.query_id = s.query_id AND x.match_id = s.match_id"
    )
    denom = f"{N_QUERIES * TOP_K}.0"
    return f"""
    SELECT CAST({m_sub} AS INT) AS m_sub,
           CAST({m_sub * 4} AS INT) AS code_bits,
           (SELECT round(count(*) / {denom}, 4) FROM adc{sfx}b {hit}) AS adc_recall,
           (SELECT round(count(*) / {denom}, 4) FROM rr{sfx}b {hit})
             AS rerank_floor_recall
"""


@register(
    "similarity_pq_code_budget_audit",
    oracle=f"""
    WITH {_PQ_E_SQL},
    {_pq_chain_sql(M_SUB)},
    {_pq_chain_sql(BUDGET_M16, "16")},
    q2 AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
    exact AS (
      SELECT query_id, match_id FROM (
        SELECT q2.query_id, c.vec_id AS match_id,
               row_number() OVER (
                 PARTITION BY q2.query_id
                 ORDER BY round(list_distance(q2.qv, c.v), 4), c.vec_id) AS rnk
        FROM q2, e c WHERE c.vec_id <> q2.query_id
      ) WHERE rnk <= {TOP_K}
    ),
    {_budget_oracle_block("")},
    {_budget_oracle_block("16")}
    {_budget_oracle_row(M_SUB, "")}
    UNION ALL
    {_budget_oracle_row(BUDGET_M16, "16")}
    ORDER BY m_sub
    """,
)
def similarity_pq_code_budget_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-budget sensitivity: recall@{TOP_K} of the PQ pipeline at 32-
    vs 64-bit codes (M=8 vs M=16 subspaces, same K={K_CODES} codewords),
    measured two ways per budget — plain ADC top-k and exact rerank over
    a FIXED {SHORTLIST_FLOOR}-deep shortlist. The fixed-r column is the
    point: the shortlist law saturates at SHORTLIST_MAX (~N=20M, see the
    SHORTLIST LAW note), and the escape hatch is buying ranking quality
    with bits instead of list depth — this audit is the measurement that
    the lever actually works on this corpus, in both engines, before
    anyone retrains a production index on it.

    100 TB plan shape: both chains inherit the PQ machinery's bounds —
    codebooks broadcast (M×K rows), corpus never shuffled at vector
    width, the fixed-floor refine reads ≤ {SHORTLIST_FLOOR} full vectors
    per query. Training cost is one extra assign/update pass for the
    second chain; output is 2 rows.

    Determinism: inherits the 1e-5/1e-6/1e-4 rounding contracts; M=16
    halves each subvector (8 dims → 4), and every per-subspace sum stays
    inside the same rounding guards, so codes and recalls are
    engine-exact at both budgets.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    return _budget_rows(
        spark,
        sf_dir,
        [(M_SUB, K_CODES, "prefix"), (BUDGET_M16, K_CODES, "prefix")],
        key_cols="m_sub INT, code_bits INT",
        key_of=lambda m, k, _s: (m, m * 4),
    ).orderBy("m_sub")


def _budget_rows(spark, sf_dir, variants, key_cols, key_of) -> DataFrame:
    """Shared recall machinery of the two code-budget audits: exact
    top-k ground truth once, then per (m_sub, k_codes, seed) variant the
    plain-ADC and fixed-floor-rerank recall@TOP_K, labeled by key_of."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    dist = F.round(F.sqrt(F.expr(_SQDIST.format(a="qv", b="cv"))), 4)
    we = Window.partitionBy("query_id").orderBy("ed", "match_id")
    exact = (
        F.broadcast(q)
        .crossJoin(e.select(F.col("vec_id").alias("match_id"), F.col("v").alias("cv")))
        .filter(F.col("match_id") != F.col("query_id"))
        .select("query_id", "match_id", dist.alias("ed"))
        .withColumn("rnk", F.row_number().over(we))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "match_id")
    )

    def recall_of(sel: DataFrame, name: str) -> DataFrame:
        return (
            exact.join(sel.withColumn("hit", F.lit(1)), ["query_id", "match_id"], "left")
            .agg(
                F.round(
                    F.sum(F.coalesce("hit", F.lit(0)))
                    / F.lit(float(N_QUERIES * TOP_K)),
                    4,
                ).alias(name)
            )
        )

    out = None
    for m_sub, k_codes, seed in variants:
        adist = _pq_adc_distances(
            _pq_train_distances(spark, sf_dir, m_sub, k_codes, seed)
        )
        wa = Window.partitionBy("query_id").orderBy("adc_dist", "match_id")
        ranked = adist.withColumn("arnk", F.row_number().over(wa))
        adc_sel = ranked.filter(F.col("arnk") <= TOP_K).select("query_id", "match_id")
        cand = ranked.filter(F.col("arnk") <= SHORTLIST_FLOOR).select(
            "query_id", "match_id"
        )
        ed = F.round(F.sqrt(F.expr(_SQDIST.format(a="qv", b="v"))), 4)
        xd = (
            F.broadcast(cand.join(q, "query_id"))
            .join(e, e.vec_id == cand.match_id)
            .select("query_id", "match_id", ed.alias("ed"))
        )
        rr_sel = (
            xd.withColumn("rnk", F.row_number().over(we))
            .filter(F.col("rnk") <= TOP_K)
            .select("query_id", "match_id")
        )
        row = (
            spark.createDataFrame([key_of(m_sub, k_codes, seed)], key_cols)
            .crossJoin(recall_of(adc_sel, "adc_recall"))
            .crossJoin(recall_of(rr_sel, "rerank_floor_recall"))
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# Codeword-budget lever (round 6, second axis): the audit above grows the
# code by adding SUBSPACES (M=16); this one grows it by deepening the
# CODEBOOKS (K=256 codewords → 8 bits/code), reaching the same 64-bit
# budget down the other axis of the M×K matrix. K=256 cannot use the
# production vec_id < K seeding — a 256-id prefix is a generator-order-
# correlated sample that swallows the query ids and half the smallest
# corpus — so both variants here seed from the md5-ranked vec_id sample
# (deterministic, engine-identical, corpus-size-stable in distribution);
# the K=16 row therefore differs from the code_budget audit's K=16 row
# only by seeding, which makes the pair ALSO a seeding-sensitivity check.
# ---------------------------------------------------------------------------

BUDGET_K256 = 256  # deepened codebooks: 8 subspaces × 8 bits


def _kbudget_oracle_row(k_codes: int, bits: int, sfx: str) -> str:
    hit = "s JOIN exact x ON x.query_id = s.query_id AND x.match_id = s.match_id"
    denom = f"{N_QUERIES * TOP_K}.0"
    return f"""
    SELECT CAST({k_codes} AS INT) AS k_codes,
           CAST({bits} AS INT) AS code_bits,
           (SELECT round(count(*) / {denom}, 4) FROM adc{sfx}b {hit}) AS adc_recall,
           (SELECT round(count(*) / {denom}, 4) FROM rr{sfx}b {hit})
             AS rerank_floor_recall
"""


@register(
    "similarity_pq_codeword_budget_audit",
    oracle=f"""
    WITH {_PQ_E_SQL},
    {_pq_chain_sql(M_SUB, "ka", K_CODES, "md5")},
    {_pq_chain_sql(M_SUB, "kb", BUDGET_K256, "md5")},
    q2 AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
    exact AS (
      SELECT query_id, match_id FROM (
        SELECT q2.query_id, c.vec_id AS match_id,
               row_number() OVER (
                 PARTITION BY q2.query_id
                 ORDER BY round(list_distance(q2.qv, c.v), 4), c.vec_id) AS rnk
        FROM q2, e c WHERE c.vec_id <> q2.query_id
      ) WHERE rnk <= {TOP_K}
    ),
    {_budget_oracle_block("ka")},
    {_budget_oracle_block("kb")}
    {_kbudget_oracle_row(K_CODES, M_SUB * 4, "ka")}
    UNION ALL
    {_kbudget_oracle_row(BUDGET_K256, M_SUB * 8, "kb")}
    ORDER BY k_codes
    """,
)
def similarity_pq_codeword_budget_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codeword-budget sensitivity: recall@{TOP_K} at K={K_CODES} vs
    K={BUDGET_K256} codewords per subspace (32- vs 64-bit codes at the
    production M={M_SUB}), both md5-seeded, measured as plain-ADC top-k
    and exact rerank over a FIXED {SHORTLIST_FLOOR}-deep shortlist.
    Together with similarity_pq_code_budget_audit (the M axis at fixed
    K) this completes the M×K lever matrix the SHORTLIST LAW note calls
    for past its ~N=20M saturation point: two independent ways to spend
    log-N bits, measured under the same fixed refine cost in both
    engines before anyone retrains a production index.

    100 TB plan shape: the broadcast codebook grows to M×K = 2048 rows —
    still trivially broadcastable — and the seed pick is a per-partition
    top-k merge (orderBy().limit(k)), never a global sort; everything
    else inherits the PQ bounds (corpus never shuffled at vector width,
    ≤ {SHORTLIST_FLOOR} full-vector reads per query in the refine).

    Determinism: inherits the 1e-5/1e-6/1e-4 rounding contracts; the
    seed sample is md5-of-string ranked with vec_id tiebreak, identical
    in both engines.
    """
    return _budget_rows(
        spark,
        sf_dir,
        [(M_SUB, K_CODES, "md5"), (M_SUB, BUDGET_K256, "md5")],
        key_cols="k_codes INT, code_bits INT",
        key_of=lambda m, k, _s: (k, m * (4 if k == K_CODES else 8)),
    ).orderBy("k_codes")
