"""Data-selection lanes: choosing WHAT goes into a pretraining corpus.

The dedup/curation modules decide what to *remove*; these lanes decide
what to *keep and how often* — the selection half of a training-data
pipeline (SURVEY §2 extension surface; the reference has no document
pipeline at all):

* ``corpus_dsir_importance`` — hashed n-gram importance weights against a
  target distribution (DSIR, Xie et al. 2023: "Data Selection for
  Language Models via Importance Resampling").
* ``corpus_quality_classifier`` — a hash-kernel linear classifier score
  per document (the fasttext-style quality filter of GPT-3/CCNet,
  expressed as pure column arithmetic).
* ``corpus_token_budget_plan`` — per-source epoch/sampling plan for a
  fixed token budget with an upsampling cap (the "don't repeat data much
  past 4 epochs" rule of Muennighoff et al. 2023).
* ``similarity_semdedup`` — semantic dedup inside k-means clusters
  (SemDeDup, Abbas et al. 2023), composed on the shared deterministic
  k-means chain from ``plans/similarity.py``.
* ``corpus_selection_pipeline`` — the composed keep/drop decision with
  first-failing-gate attribution, built from the SAME shared gate
  definitions (``_CLS_W_*``, ``dsir_scores``/``_DSIR_SQL``).

Cross-engine determinism: every per-document reduction is INTEGER
arithmetic (micro-unit fixed point). Floats appear only in trained
state of bounded cardinality — the 64-row DSIR weight table, the 20-row
source plan, per-pair cosines — and are rounded to micro-units before
any comparison, so engine summation order cannot flip a verdict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.util import fan_out
from ..sources import load_table
from .registry import register
from .similarity import (
    _DOT,
    _as_double,
    _kmeans_assign,
    _kmeans_centroids,
    _KMEANS_A1_SQL,
    K_CLUSTERS,
)

DSIR_BUCKETS = 64  # hashed-feature dimensionality
DSIR_TARGET_LANG = "en"  # the "target distribution" sample: English docs
BUDGET_TOKENS = 1_000_000  # planning budget for corpus_token_budget_plan
MAX_EPOCHS_MICRO = 4_000_000  # upsampling cap: at most 4 passes per source
SEMDEDUP_TAU_MICRO = 350_000  # drop threshold: cosine > 0.35 (micro-units)
# Degenerate-cluster guard for SemDeDup pair generation: clusters past
# this size switch to star pairs (bucket_pairs max_bucket). Gate corpora
# peak far below it (canary-tested); at real scale k ∝ N keeps clusters
# well under the cap and this never fires.
SEMDEDUP_MAX_CLUSTER = 1024

# Cross-engine token bucket: md5 prefix → int (identical in both engines,
# see dedup.py's Carter–Wegman hash) → mod the feature dimensionality.
_BUCKET_SPARK = (
    f"CAST(conv(substr(md5(word), 1, 8), 16, 10) AS BIGINT) % {DSIR_BUCKETS}"
)
_BUCKET_DUCK = f"(('0x' || substr(md5(word), 1, 8))::BIGINT % {DSIR_BUCKETS})"


# The DSIR scoring CTE chain, shared by corpus_dsir_importance and
# corpus_selection_pipeline so the two cannot drift (the k-means
# `_KMEANS_A1_SQL` pattern). All CTEs are dsir-prefixed to compose.
_DSIR_SQL = f"""
    dsir_tok AS (
        SELECT doc_id, lang, t.word
        FROM documents, UNNEST(string_split(text, ' ')) AS t(word)
        WHERE t.word <> ''
    ),
    dsir_per_doc AS (
        SELECT doc_id, lang, {_BUCKET_DUCK} AS bucket, count(*) AS cnt
        FROM dsir_tok GROUP BY 1, 2, 3
    ),
    dsir_stats AS (
        SELECT bucket,
               sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN cnt ELSE 0 END) AS tgt,
               sum(cnt) AS src
        FROM dsir_per_doc GROUP BY bucket
    ),
    dsir_tot AS (SELECT sum(tgt) AS tgt_tot, sum(src) AS src_tot FROM dsir_stats),
    dsir_w AS (
        SELECT bucket,
               CAST(round((ln((tgt + 1)::DOUBLE / (tgt_tot + {DSIR_BUCKETS})::DOUBLE)
                         - ln((src + 1)::DOUBLE / (src_tot + {DSIR_BUCKETS})::DOUBLE))
                          * 1000000) AS BIGINT) AS lw_micro
        FROM dsir_stats, dsir_tot
    ),
    dsir AS (
        SELECT p.doc_id,
               CAST(sum(p.cnt) AS INT) AS n_tokens,
               CAST(sum(p.cnt * w.lw_micro) AS BIGINT) AS importance_micro,
               sum(p.cnt * w.lw_micro) > 0 AS selected
        FROM dsir_per_doc p JOIN dsir_w w USING (bucket)
        GROUP BY p.doc_id
    )
"""


@register(
    "corpus_dsir_importance",
    oracle=f"""
    WITH {_DSIR_SQL}
    SELECT doc_id, n_tokens, importance_micro, selected FROM dsir
    """,
)
def corpus_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: estimate a hashed-unigram bag-of-words
    model for the target distribution (here: the corpus' own English
    slice) and for the raw source, then score each document by its
    log importance ratio  Σ_tokens [log p_tgt(bucket) − log p_src(bucket)]
    (Laplace-smoothed). ``selected`` marks documents that look more
    target-like than source-like — the resampling acceptance signal.

    Determinism: the 64 per-bucket log-ratios are rounded to integer
    micro-units ONCE (trained state, bounded cardinality); every per-doc
    reduction after that is an exact integer sum, so summation order is
    irrelevant in both engines.

    100 TB plan shape: two passes over documents — one to train (explode
    → map-side-combined (doc,bucket) counts → 64-row weight table,
    pinned with localCheckpoint like the k-means centroids), one to
    score (same pre-aggregated shape joined against the BROADCAST weight
    table, then an exact integer agg by doc_id). The bucket table is
    O(DSIR_BUCKETS) regardless of vocabulary: no vocab-wide state, no
    Zipf-keyed shuffle (buckets fold the head terms into fixed cells and
    the groupBy is map-side combined).
    """
    return dsir_scores(spark, sf_dir)


def _doc_bucket_counts(d: DataFrame) -> DataFrame:
    """(doc_id, lang, bucket, cnt): the hashed-feature representation a
    document reduces to — used by training and by every scoring site."""
    tok = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    return tok.groupBy(
        "doc_id", "lang", F.expr(_BUCKET_SPARK).alias("bucket")
    ).agg(F.count("*").alias("cnt"))


def dsir_weight_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN: the 64-row (bucket, lw_micro) weight table over the corpus
    at sf_dir. Trained state — lineage truncated (localCheckpoint) so
    scoring sites never re-run the training subtree; persist it to
    parquet to apply in streaming (``selection_stream``)."""
    per_doc = _doc_bucket_counts(fan_out(load_table(spark, sf_dir, "documents")))
    stats = (
        per_doc.groupBy("bucket")
        .agg(
            F.sum(
                F.when(F.col("lang") == DSIR_TARGET_LANG, F.col("cnt")).otherwise(
                    F.lit(0)
                )
            ).alias("tgt"),
            F.sum("cnt").alias("src"),
        )
        .localCheckpoint()
    )
    tot = stats.agg(
        F.sum("tgt").alias("tgt_tot"), F.sum("src").alias("src_tot")
    )
    lw = F.round(
        (
            F.log((F.col("tgt") + 1).cast("double") / (F.col("tgt_tot") + DSIR_BUCKETS).cast("double"))
            - F.log((F.col("src") + 1).cast("double") / (F.col("src_tot") + DSIR_BUCKETS).cast("double"))
        )
        * 1_000_000
    ).cast("bigint")
    return stats.crossJoin(F.broadcast(tot)).select("bucket", lw.alias("lw_micro"))


def dsir_apply(d: DataFrame, w: DataFrame) -> DataFrame:
    """SCORE documents ``d`` against a (possibly pre-trained, possibly
    read-from-disk) weight table ``w`` — one pass, exact integer sums,
    weight table broadcast."""
    imp = F.sum(F.col("cnt") * F.col("lw_micro"))
    return (
        _doc_bucket_counts(d)
        .join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("int").alias("n_tokens"),
            imp.alias("importance_micro"),
            (imp > 0).alias("selected"),
        )
    )


def dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR scoring relation (doc_id, n_tokens, importance_micro,
    selected) — train + apply on the same corpus, mirroring the
    ``_DSIR_SQL`` oracle chain."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    return dsir_apply(d, dsir_weight_table(spark, sf_dir))


# Deterministic hash-kernel weight for one token: md5 prefix → integer in
# [-1000, 1000]. Stands in for a broadcast trained-weight lookup; the
# lane's point is the scoring plan shape, which is identical either way.
_CLS_W_SPARK = (
    "(CAST(conv(substr(md5(concat('qw#', w)), 1, 8), 16, 10) AS BIGINT) % 2001) - 1000"
)
_CLS_W_DUCK = "(('0x' || substr(md5('qw#' || w), 1, 8))::BIGINT % 2001) - 1000"


@register(
    "corpus_quality_classifier",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), w -> w <> '') AS words
        FROM documents
    )
    SELECT doc_id,
           CAST(len(words) AS INT) AS n_tokens,
           CAST(coalesce(list_sum(list_transform(words,
                w -> {_CLS_W_DUCK})), 0) AS BIGINT) AS score,
           coalesce(list_sum(list_transform(words,
                w -> {_CLS_W_DUCK})), 0) > 0 AS keep
    FROM t
    """,
)
def corpus_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier scoring (the GPT-3/CCNet fasttext-filter
    shape): each document's score is the sum of per-token weights from a
    hashed feature kernel; ``keep`` is the sign. The weights here are a
    deterministic function of the token hash — in production they'd be a
    broadcast map from a trained model, which changes nothing about the
    plan.

    100 TB: a pure map — split, transform, integer-fold — entirely inside
    whole-stage codegen. No explode, no shuffle, no Python; scoring cost
    is one pass over the bytes, the same shape as text_quality_score.
    """
    d = fan_out(load_table(spark, sf_dir, "documents"))
    words = "filter(split(text, ' '), w -> w <> '')"
    score = F.expr(
        f"aggregate({words}, CAST(0 AS BIGINT), (acc, w) -> acc + ({_CLS_W_SPARK}))"
    )
    return d.select(
        "doc_id",
        F.expr(f"size({words})").cast("int").alias("n_tokens"),
        score.alias("score"),
        (score > 0).alias("keep"),
    )


# Round-1 budget chain (ends in CTE `budget_round1`), shared with the
# redistribution lane so the rounds cannot drift.
_BUDGET_SQL = f"""
    bp_per_src AS (
        SELECT source,
               count(*) AS n_docs,
               sum(len(list_filter(string_split(text, ' '), w -> w <> ''))) AS n_tokens
        FROM documents GROUP BY source
        HAVING n_tokens > 0
    ),
    bp_s AS (
        SELECT source, n_docs, n_tokens,
               CAST(floor(sqrt(n_tokens::DOUBLE) * 1000000) AS BIGINT) AS sqrt_micro
        FROM bp_per_src
    ),
    bp_tot AS (SELECT sum(sqrt_micro) AS denom FROM bp_s),
    budget_round1 AS (
        SELECT source,
               CAST(n_docs AS INT) AS n_docs,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               sqrt_micro,
               CAST(CAST(sqrt_micro AS HUGEINT) * 1000000 // denom AS BIGINT) AS weight_micro,
               CAST({BUDGET_TOKENS} * CAST(sqrt_micro AS HUGEINT) // denom AS BIGINT) AS target_tokens,
               CAST(({BUDGET_TOKENS} * CAST(sqrt_micro AS HUGEINT) // denom) * 1000000 // n_tokens AS BIGINT)
                   AS epochs_micro,
               (({BUDGET_TOKENS} * CAST(sqrt_micro AS HUGEINT) // denom) * 1000000 // n_tokens)
                   > {MAX_EPOCHS_MICRO} AS capped,
               CAST({BUDGET_TOKENS} * CAST(sqrt_micro AS HUGEINT) // denom
                   - CAST(n_tokens AS HUGEINT)
                     * least(({BUDGET_TOKENS} * CAST(sqrt_micro AS HUGEINT) // denom) * 1000000 // n_tokens,
                             {MAX_EPOCHS_MICRO}) // 1000000 AS BIGINT) AS shortfall_tokens
        FROM bp_s, bp_tot
    )
"""


@register(
    "corpus_token_budget_plan",
    oracle=f"""
    WITH {_BUDGET_SQL}
    SELECT source, n_docs, n_tokens, weight_micro, target_tokens,
           epochs_micro, capped, shortfall_tokens
    FROM budget_round1
    """,
)
def corpus_token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget planning: allocate a fixed training budget across
    sources with a sqrt-scaled mix (temperature α=0.5 — rarer sources
    upsampled relative to their share), then convert each allocation to
    epochs over that source, capped at 4 passes (repeating data much past
    that stops helping — Muennighoff et al. 2023). ``shortfall_tokens``
    is the allocation a capped source cannot absorb, i.e. what a second
    planning round would redistribute.

    Determinism: per-source sqrt shares become integer micro-units via
    floor (sqrt is correctly rounded in both engines), and every derived
    quantity is integer `div` arithmetic — exact everywhere.

    100 TB: one map-side-combined aggregate over documents to the
    |sources|-row table (pinned), then arithmetic on that tiny relation;
    the 1-row denominator broadcast is the same audited BNLJ shape as
    corpus_domain_mix_weights.
    """
    return _budget_round1(spark, sf_dir).drop("sqrt_micro")


def _budget_round1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-1 allocation incl. the sqrt_micro share column — the shared
    body of corpus_token_budget_plan and the redistribution round,
    mirroring the ``_BUDGET_SQL`` chain."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    n_tok = F.size(F.expr("filter(split(text, ' '), w -> w <> '')"))
    per_src = (
        d.groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum(n_tok).alias("n_tokens"))
        # an all-empty source has nothing to sample — and would divide
        # the epoch computation by zero
        .filter(F.col("n_tokens") > 0)
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1_000_000)
            .cast("bigint")
            .alias("sqrt_micro"),
        )
        .localCheckpoint()
    )
    return _budget_arith(per_src)


def _budget_arith(per_src: DataFrame) -> DataFrame:
    """Round-1 allocation arithmetic over a (source, n_docs, n_tokens,
    sqrt_micro) relation — split out so the overflow headroom can be
    regression-tested at corpus sizes no local fixture can reach."""
    denom = per_src.agg(F.sum("sqrt_micro").alias("denom"))
    # Overflow headroom: sqrt_micro reaches ~9.2e12 at 8.5e13 tokens per
    # source, so a raw BIGINT product with 1e6 sits on the int64 edge
    # (ANSI throw). Widen every product through decimal(38,0) — Spark's
    # IntegralDivide returns BIGINT, so output types are unchanged and
    # the DuckDB chain's HUGEINT casts mirror it exactly.
    sqrt_d = "CAST(sqrt_micro AS DECIMAL(38,0))"
    ntok_d = "CAST(n_tokens AS DECIMAL(38,0))"
    target = f"{BUDGET_TOKENS} * {sqrt_d} div denom"
    epochs = f"({target}) * 1000000 div n_tokens"
    return per_src.crossJoin(F.broadcast(denom)).select(
        "source",
        F.col("n_docs").cast("int").alias("n_docs"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "sqrt_micro",
        F.expr(f"{sqrt_d} * 1000000 div denom").alias("weight_micro"),
        F.expr(target).alias("target_tokens"),
        F.expr(epochs).alias("epochs_micro"),
        F.expr(f"({epochs}) > {MAX_EPOCHS_MICRO}").alias("capped"),
        F.expr(
            f"{target} - {ntok_d} * least({epochs}, {MAX_EPOCHS_MICRO}) div 1000000"
        ).alias("shortfall_tokens"),
    )


@register(
    "corpus_token_budget_redistribute",
    oracle=f"""
    WITH {_BUDGET_SQL},
    bp_agg AS (
        SELECT sum(shortfall_tokens) AS surplus,
               sum(CASE WHEN NOT capped THEN sqrt_micro ELSE 0 END) AS denom_u
        FROM budget_round1
    )
    SELECT source, n_tokens, target_tokens,
           CAST(extra_tokens AS BIGINT) AS extra_tokens,
           CAST(final_target AS BIGINT) AS final_target_tokens,
           CAST(CAST(final_target AS HUGEINT) * 1000000 // n_tokens AS BIGINT) AS final_epochs_micro,
           CAST(final_target AS HUGEINT) * 1000000 // n_tokens > {MAX_EPOCHS_MICRO} AS still_capped,
           CAST(final_target
               - CAST(n_tokens AS HUGEINT)
                 * least(CAST(final_target AS HUGEINT) * 1000000 // n_tokens,
                         {MAX_EPOCHS_MICRO}) // 1000000 AS BIGINT)
               AS residual_tokens
    FROM (
        SELECT b.*,
               CASE WHEN b.capped OR a.denom_u = 0 THEN 0
                    ELSE a.surplus * CAST(b.sqrt_micro AS HUGEINT) // a.denom_u END AS extra_tokens,
               b.target_tokens - b.shortfall_tokens
                   + CASE WHEN b.capped OR a.denom_u = 0 THEN 0
                          ELSE a.surplus * CAST(b.sqrt_micro AS HUGEINT) // a.denom_u END AS final_target
        FROM budget_round1 b, bp_agg a
    )
    """,
)
def corpus_token_budget_redistribute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 2 of the budget planner — the water-filling step the
    round-1 ``shortfall_tokens`` column calls for: the surplus capped
    sources cannot absorb is redistributed to the UNCAPPED sources in
    proportion to their sqrt shares, and each source's final allocation
    is re-expressed as epochs under the same 4-epoch cap. One round by
    design (a redistribution that re-caps a source reports the remainder
    in ``residual_tokens`` instead of iterating — plan relations must
    have statically known depth); residual > 0 means the corpus simply
    cannot absorb the budget under the cap.

    Shares the ``_BUDGET_SQL`` chain / ``_budget_round1`` relation with
    the round-1 lane, so the rounds cannot drift; all arithmetic remains
    integer `div`.

    100 TB: arithmetic over the pinned |sources|-row relation with one
    more 1-row aggregate broadcast — no additional corpus pass.
    """
    return _redistribute_arith(_budget_round1(spark, sf_dir))


def _redistribute_arith(r1: DataFrame) -> DataFrame:
    """Water-filling arithmetic over a budget_round1-shaped relation —
    split out (like ``_budget_arith``) for overflow regression tests."""
    agg = r1.agg(
        F.sum("shortfall_tokens").alias("surplus"),
        F.sum(F.when(~F.col("capped"), F.col("sqrt_micro")).otherwise(F.lit(0))).alias(
            "denom_u"
        ),
    )
    # Same decimal(38,0) widening as _budget_round1: surplus*sqrt_micro
    # and n_tokens*epochs both clear int64 once a source holds ~8.5e13
    # tokens; `div` collapses each product back to BIGINT.
    extra = (
        "CASE WHEN capped OR denom_u = 0 THEN 0 "
        "ELSE surplus * CAST(sqrt_micro AS DECIMAL(38,0)) div denom_u END"
    )
    final = f"target_tokens - shortfall_tokens + ({extra})"
    fe = f"CAST(({final}) AS DECIMAL(38,0)) * 1000000 div n_tokens"
    return r1.crossJoin(F.broadcast(agg)).select(
        "source",
        "n_tokens",
        "target_tokens",
        F.expr(extra).cast("bigint").alias("extra_tokens"),
        F.expr(final).cast("bigint").alias("final_target_tokens"),
        F.expr(fe).cast("bigint").alias("final_epochs_micro"),
        F.expr(f"({fe}) > {MAX_EPOCHS_MICRO}").alias("still_capped"),
        F.expr(
            f"({final}) - CAST(n_tokens AS DECIMAL(38,0))"
            f" * least({fe}, {MAX_EPOCHS_MICRO}) div 1000000"
        )
        .cast("bigint")
        .alias("residual_tokens"),
    )


@register(
    "similarity_semdedup",
    oracle=f"""
    WITH {_KMEANS_A1_SQL},
    m AS (
        SELECT a.vec_id, a.cluster, e.v
        FROM a1 a JOIN e ON e.vec_id = a.vec_id
    ),
    dup AS (
        SELECT DISTINCT b.vec_id
        FROM m a JOIN m b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        WHERE CAST(round(list_cosine_similarity(a.v, b.v) * 1000000) AS BIGINT)
              > {SEMDEDUP_TAU_MICRO}
    )
    SELECT m.vec_id, m.cluster, dup.vec_id IS NULL AS kept
    FROM m LEFT JOIN dup ON m.vec_id = dup.vec_id
    """,
)
def similarity_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate removal via
    the k-means partition — candidate pairs exist only INSIDE a cluster,
    and a vector is dropped when a lower-id cluster-mate sits above the
    cosine threshold (so the lowest id of every duplicate neighborhood
    survives; each cluster always keeps its minimum id).

    Composes the shared deterministic k-means chain (2 Lloyd steps,
    centroids pinned — see similarity_kmeans_clusters); pair cosines are
    compared in rounded micro-units so the verdict can't flip on float
    jitter.

    100 TB: this is the published algorithm's own scaling argument — k
    grows with the corpus so cluster sizes stay bounded, making the
    within-cluster quadratic a constant per cluster; and the quadratic
    is BOUNDED BY CODE, not by hope: pair generation routes through
    ``bucket_pairs`` (cluster = bucket, vectors ride as payload — the
    assignment relation is computed ONCE, no self-join), so a
    degenerate cluster past ``SEMDEDUP_MAX_CLUSTER`` degrades to O(B)
    star pairs against its minimum id. The star fallback guarantees
    linkage only for exact duplicates of the hub and members cosine-
    similar to it; two near-duplicates that each fall BELOW the
    threshold against the hub both survive a capped cluster even though
    the full quadratic pass would drop one — that recall loss is the
    divergence ``dedup_cap_audit`` exists to surface, alongside the
    capped count in the attached Observation (the r3 LSH cap machinery,
    same oracle-divergence contract: gate corpora never reach the cap,
    asserted by a canary test).
    """
    from ..operators.util import bucket_pairs
    from .similarity import kmeans_a1

    m = kmeans_a1(spark, sf_dir).select("vec_id", "cluster", "v")
    pairs = bucket_pairs(
        m, ["cluster"], "vec_id", ["v"], max_bucket=SEMDEDUP_MAX_CLUSTER
    )
    dot = F.expr(_DOT.format(a="a.v", b="b.v"))
    na = F.sqrt(F.expr(_DOT.format(a="a.v", b="a.v")))
    nb = F.sqrt(F.expr(_DOT.format(a="b.v", b="b.v")))
    sim_micro = F.round(dot / (na * nb) * 1_000_000).cast("bigint")
    dup = (
        pairs.filter(sim_micro > SEMDEDUP_TAU_MICRO)
        .select(F.col("b.id").alias("vec_id"))
        .distinct()
    )
    return m.join(
        dup.withColumn("is_dup", F.lit(True)), "vec_id", "left"
    ).select("vec_id", "cluster", F.col("is_dup").isNull().alias("kept"))


# The composed selection chain (ends in CTE `selection`), shared by the
# per-document pipeline lane and the streaming round-trip's aggregated
# oracle so the two state identical semantics.
_SELECTION_SQL = f"""
    {_DSIR_SQL},
    sel_base AS (
        SELECT doc_id,
               len(list_filter(string_split(text, ' '), w -> w <> ''))
                   BETWEEN 20 AND 100000 AS word_count_ok,
               coalesce(list_sum(list_transform(
                   list_filter(string_split(text, ' '), w -> w <> ''),
                   w -> {_CLS_W_DUCK})), 0) > 0 AS classifier_keep
        FROM documents
    ),
    selection AS (
        SELECT b.doc_id, b.word_count_ok, b.classifier_keep,
               coalesce(d.selected, FALSE) AS dsir_keep,
               b.word_count_ok AND b.classifier_keep
                   AND coalesce(d.selected, FALSE) AS selected,
               CASE WHEN NOT b.word_count_ok THEN 'word_count'
                    WHEN NOT b.classifier_keep THEN 'classifier'
                    WHEN NOT coalesce(d.selected, FALSE) THEN 'dsir_importance'
                    ELSE 'kept' END AS verdict
        FROM sel_base b LEFT JOIN dsir d ON b.doc_id = d.doc_id
    )
"""


@register(
    "corpus_selection_pipeline",
    oracle=f"""
    WITH {_SELECTION_SQL}
    SELECT doc_id, word_count_ok, classifier_keep, dsir_keep, selected, verdict
    FROM selection
    """,
)
def corpus_selection_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed selection pipeline with per-document attribution — the
    selection-side twin of corpus_curation_pipeline: a length sanity
    gate, the hash-kernel classifier verdict, and the DSIR target-fit
    verdict, folded into one ``selected`` decision plus a first-failing-
    gate ``verdict`` column (what a curation dashboard reports). Gates
    share their definitions with the standalone lanes — the classifier
    weight expression is the same ``_CLS_W_*`` constant and the DSIR side
    is the same ``dsir_scores`` relation / ``_DSIR_SQL`` chain — so the
    composition cannot drift from its parts.

    Documents that tokenize to nothing have no DSIR row; they re-enter
    via the left join as not-selected rather than silently vanishing.

    100 TB: the two map-only gates fuse into ONE pass over documents
    (codegen expressions, no join between them); only DSIR adds its
    two-pass train/score shape, and the final join is doc_id-keyed —
    the same shuffle the DSIR aggregation already produced.
    """
    d = fan_out(load_table(spark, sf_dir, "documents"))
    return selection_verdicts(d, dsir_weight_table(spark, sf_dir))


def selection_verdicts(d: DataFrame, w: DataFrame) -> DataFrame:
    """The composed per-document selection decision over any documents
    relation ``d`` (batch table or a foreachBatch micro-batch) and a
    DSIR weight table ``w`` — the shared body of
    corpus_selection_pipeline and the streaming ``selection_stream``."""
    words = "filter(split(text, ' '), w -> w <> '')"
    cls_score = F.expr(
        f"aggregate({words}, CAST(0 AS BIGINT), (acc, w) -> acc + ({_CLS_W_SPARK}))"
    )
    base = d.select(
        "doc_id",
        F.expr(f"size({words})").between(20, 100000).alias("word_count_ok"),
        (cls_score > 0).alias("classifier_keep"),
    )
    dsir = dsir_apply(d, w).select("doc_id", F.col("selected").alias("dsir_sel"))
    j = base.join(dsir, "doc_id", "left")
    dsir_keep = F.coalesce(F.col("dsir_sel"), F.lit(False))
    return j.select(
        "doc_id",
        "word_count_ok",
        "classifier_keep",
        dsir_keep.alias("dsir_keep"),
        (F.col("word_count_ok") & F.col("classifier_keep") & dsir_keep).alias(
            "selected"
        ),
        F.when(~F.col("word_count_ok"), F.lit("word_count"))
        .when(~F.col("classifier_keep"), F.lit("classifier"))
        .when(~dsir_keep, F.lit("dsir_importance"))
        .otherwise(F.lit("kept"))
        .alias("verdict"),
    )


@register(
    "corpus_dsir_resample",
    oracle=f"""
    WITH {_DSIR_SQL},
    prob AS (
        SELECT doc_id, n_tokens, importance_micro,
               least(1000000, greatest(0,
                   500000 + importance_micro // (2 * n_tokens))) AS p_micro
        FROM dsir
    )
    SELECT doc_id, n_tokens, importance_micro, CAST(p_micro AS BIGINT) AS p_micro,
           (('0x' || substr(md5('dsir#' || doc_id::VARCHAR), 1, 8))::BIGINT % 1000000)
               < p_micro AS accepted
    FROM prob
    """,
)
def corpus_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Executes the DSIR weights as a RESAMPLE (the paper's second half):
    each document's acceptance probability is a piecewise-linear squash
    of its per-token importance (1/2 + importance/(2·n_tokens) in micro-
    units, clamped to [0, 1]) and acceptance is a deterministic
    md5-threshold draw on doc_id — the same seedless, rerun- and
    append-stable coin as corpus_train_val_split / corpus_mix_resample.
    Target-like documents keep probability > 1/2; source-typical ones
    fall below it. Every step is integer `div` arithmetic.

    100 TB: adds one map-side projection to the DSIR scoring plan — the
    accept decision needs no extra pass, no state, and no RNG service;
    acceptance is reproducible per document forever (a replayed shard
    selects the identical subset).
    """
    scores = dsir_scores(spark, sf_dir)
    p = F.expr(
        "least(1000000L, greatest(0L, 500000L + importance_micro div (2 * n_tokens)))"
    )
    coin = F.expr(
        "CAST(conv(substr(md5(concat('dsir#', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 1000000"
    )
    return scores.select(
        "doc_id",
        "n_tokens",
        "importance_micro",
        p.cast("bigint").alias("p_micro"),
        (coin < p).alias("accepted"),
    )
