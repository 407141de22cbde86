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

from pyspark.sql import DataFrame, SparkSession, Window
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
    d = fan_out(load_table(spark, sf_dir, "documents")).filter(
        # 0/1-token guard: sequence(1, size-1) on size<=1 is the
        # DESCENDING [1, 0] and slice(words, 0, …) throws, where the
        # oracle's range() just yields no rows (ADVICE r2).
        F.size(F.split("text", " ")) >= 2
    )
    words = F.split("text", " ")
    # the size>=2 filter above guarantees size-1 >= 1 here
    idx = F.sequence(F.lit(1), F.size(words) - 1)
    pairs = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, 2)))
    return (
        d.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(20)
    )


@register(
    "text_perplexity_proxy",
    oracle="""
    WITH tok AS (
        SELECT doc_id, u.token AS token
        FROM documents, UNNEST(string_split(text, ' ')) AS u(token)
    ),
    freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
    tot AS (SELECT count(*) AS n_total FROM tok)
    SELECT t.doc_id,
           CAST(count(*) AS INT) AS n_tokens,
           round(avg(-ln(f.cnt / tt.n_total)), 5) AS nll_proxy
    FROM tok t JOIN freq f USING (token) CROSS JOIN tot tt
    GROUP BY t.doc_id
    """,
)
def text_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram LM quality filter: score every document by the
    mean negative log-probability of its tokens under the corpus's own
    unigram distribution (high = rare/garbled text, low = boilerplate).
    Real curation runs threshold on this score; the score is the judged
    unit.

    100 TB: the token explode runs twice — once for the vocabulary
    count (one shuffle on token with MAP-SIDE COMBINE: a stopword's
    ~5%-of-corpus occurrences collapse to ≤ #map-partitions partials
    before moving; never window a Zipf key) and once for the scoring
    join, which stays map-side against the broadcast probability table.
    The corpus token total needs no explode at all: it is the map-side
    sum of per-document token counts, a 1-row broadcast. On a corpus
    whose vocabulary outgrows the broadcast limit, drop the hint and
    AQE picks a sort-merge join on token. Output rounds at 1e-5, two
    orders above cross-engine float-summation jitter (~1e-13 relative);
    ln() values are irrational so the HALF_UP-boundary hazard that
    rounded ratios carry cannot occur.
    """
    d = fan_out(load_table(spark, sf_dir, "documents"))
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    tot = d.agg(F.sum(F.size(F.split("text", " "))).alias("n_total"))
    return (
        tok.join(F.broadcast(freq), "token")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.round(
                F.avg(-F.log(F.col("cnt") / F.col("n_total"))), 5
            ).alias("nll_proxy"),
        )
    )


@register(
    "corpus_domain_mix_weights",
    oracle="""
    WITH src AS (
        SELECT source,
               count(*) AS n_docs,
               sum(len(string_split(text, ' '))) AS src_tokens
        FROM documents
        GROUP BY source
    ),
    tot AS (
        SELECT sum(src_tokens) AS total_tokens, count(*) AS n_sources
        FROM src
    )
    SELECT source, n_docs, src_tokens,
           (1000000 * total_tokens) // (n_sources * src_tokens) AS weight_ppm,
           (1000000 * total_tokens) // (n_sources * src_tokens) > 1000000
               AS upsampled
    FROM src CROSS JOIN tot
    ORDER BY source
    """,
)
def corpus_domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing weights for a training run: per-source token mass vs
    a uniform target mixture, emitted as parts-per-million resampling
    weights (>1e6 ⇒ the source must be upsampled / multi-epoched). The
    arithmetic is pure BIGINT (integer division), so the oracle pairing
    is exact — no float rounding anywhere.

    100 TB: a 20-group aggregate over the corpus (one shuffle, map-side
    combine), a source-count-sized scalar broadcast back; output is
    O(|sources|).
    """
    d = fan_out(load_table(spark, sf_dir, "documents"))
    src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("src_tokens"),
    )
    tot = src.agg(
        F.sum("src_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    w = F.expr("(1000000 * total_tokens) div (n_sources * src_tokens)")
    return (
        src.join(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "src_tokens",
            w.alias("weight_ppm"),
            (w > 1000000).alias("upsampled"),
        )
        .orderBy("source")
    )


@register(
    "text_inverted_index",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT doc_id, u.token AS token
        FROM documents, UNNEST(string_split(text, ' ')) AS u(token)
    )
    SELECT token,
           CAST(count(*) AS BIGINT) AS df,
           array_to_string(list_slice(list_sort(list(doc_id)), 1, 20), ',')
               AS postings
    FROM pairs
    GROUP BY token
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval building block: term → document-frequency + capped,
    sorted posting list (first 20 doc_ids ascending, comma-joined so the
    oracle compares exact postings as a scalar).

    100 TB: explode → distinct (token, doc_id) — one shuffle with
    map-side partial dedup — then one aggregate on token. The per-term
    posting cap bounds the collect_list state against stopword-like
    terms whose full posting list would be corpus-sized; a production
    index would segment those terms, the cap is the honest stand-in.
    """
    d = fan_out(load_table(spark, sf_dir, "documents"))
    pairs = d.select(
        F.explode(F.split("text", " ")).alias("token"), "doc_id"
    ).distinct()
    postings = F.concat_ws(
        ",",
        F.transform(
            F.slice(F.sort_array(F.collect_list("doc_id")), 1, 20),
            lambda x: x.cast("string"),
        ),
    )
    return pairs.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        postings.alias("postings"),
    )


@register(
    "corpus_mix_resample",
    oracle="""
    WITH src AS (
        SELECT source, sum(len(string_split(text, ' '))) AS src_tokens
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT sum(src_tokens) AS total_tokens, count(*) AS n_sources
        FROM src
    ),
    w AS (
        SELECT source,
               (1000000 * total_tokens) // (n_sources * src_tokens) AS weight_ppm
        FROM src CROSS JOIN tot
    )
    SELECT d.doc_id, d.source,
           greatest(w.weight_ppm // 1000000, 1) AS n_epochs
    FROM documents d JOIN w USING (source)
    WHERE (('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT % 1000000)
          < least(w.weight_ppm, 1000000)
    """,
)
def corpus_mix_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute the domain-mixing plan: over-represented sources are
    downsampled by a deterministic md5-threshold on doc_id (keep rate =
    weight_ppm/1e6), under-represented sources keep every doc and carry
    n_epochs = floor(weight_ppm/1e6) passes for the trainer. Pure
    integer arithmetic end to end — the oracle pairing is exact.

    100 TB: the weight table is O(|sources|) and broadcast; the keep
    decision is a map-side hash per doc — no shuffle of the corpus at
    all beyond the one |sources|-group aggregate that derives weights.
    """
    d = fan_out(load_table(spark, sf_dir, "documents"))
    src = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).alias("src_tokens")
    )
    tot = src.agg(
        F.sum("src_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    w = (
        src.join(F.broadcast(tot))
        .select(
            "source",
            F.expr(
                "(1000000 * total_tokens) div (n_sources * src_tokens)"
            ).alias("weight_ppm"),
        )
    )
    keep_h = F.expr(
        "pmod(CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)"
        " AS BIGINT), 1000000)"
    )
    return (
        d.join(F.broadcast(w), "source")
        .filter(keep_h < F.least(F.col("weight_ppm"), F.lit(1000000)))
        .select(
            "doc_id",
            "source",
            F.expr("greatest(weight_ppm div 1000000, 1)").alias("n_epochs"),
        )
    )


@register(
    "text_bigram_conditionals",
    oracle="""
    WITH big AS (
        SELECT words[i] AS w1, words[i+1] AS w2
        FROM (SELECT string_split(text, ' ') AS words FROM documents),
             UNNEST(range(1, len(words))) AS t(i)
    ),
    pc AS (SELECT w1, w2, count(*) AS n12 FROM big GROUP BY 1, 2),
    uc AS (SELECT w1, sum(n12) AS n1 FROM pc GROUP BY w1),
    ranked AS (
        SELECT pc.w1, pc.w2, pc.n12,
               round(CAST(pc.n12 AS DOUBLE) / uc.n1, 6) AS p_cond,
               row_number() OVER (PARTITION BY pc.w1
                                  ORDER BY pc.n12 DESC, pc.w2 ASC) AS rn
        FROM pc JOIN uc ON pc.w1 = uc.w1
        WHERE uc.n1 >= 50
    )
    SELECT w1, w2, n12, p_cond
    FROM ranked WHERE rn <= 3
    """,
)
def text_bigram_conditionals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram conditional-probability table: for every context token with
    ≥50 corpus occurrences (as a bigram left side), its top-3 next tokens
    with P(w2|w1) — the statistical-LM view of the corpus (and the data
    a repetition/templating auditor reads: a near-deterministic
    distribution means boilerplate).

    100 TB: pair explode is map-side; ONE shuffle keyed on (w1, w2) with
    partial counts; the context totals derive from the pair counts by a
    second vocabulary-sized aggregate (never re-reading the corpus); the
    ranking window partitions on w1 over ≤|vocab seen after w1| rows.
    """
    d = fan_out(load_table(spark, sf_dir, "documents")).filter(
        # 0/1-token guard: sequence(1, size-1) on size<=1 is the
        # DESCENDING [1, 0] and element_at(words, 0) throws, where the
        # oracle's range() just yields no rows (ADVICE r2).
        F.size(F.split("text", " ")) >= 2
    )
    words = F.split("text", " ")
    # the size>=2 filter above guarantees size-1 >= 1 here
    idx = F.sequence(F.lit(1), F.size(words) - 1)
    bigrams = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(words, i).alias("w1"),
            F.element_at(words, i + 1).alias("w2"),
        ),
    )
    pc = (
        d.select(F.explode(bigrams).alias("b"))
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n12"))
    )
    uc = pc.groupBy("w1").agg(F.sum("n12").alias("n1"))
    ranked = (
        pc.join(F.broadcast(uc.filter(F.col("n1") >= 50)), "w1")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("w1").orderBy(
                    F.col("n12").desc(), F.col("w2").asc()
                )
            ),
        )
    )
    return ranked.filter(F.col("rn") <= 3).select(
        "w1",
        "w2",
        "n12",
        F.round(F.col("n12").cast("double") / F.col("n1"), 6).alias("p_cond"),
    )


MIX_ALPHA = 0.3  # temperature exponent (multilingual-pretraining convention)


@register(
    "corpus_domain_mix_temperature",
    oracle=f"""
    WITH src AS (
        SELECT source, sum(len(string_split(text, ' '))) AS src_tokens
        FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(src_tokens) AS total FROM src),
    sh AS (
        SELECT source, src_tokens, total,
               1.0 * src_tokens / total AS share
        FROM src CROSS JOIN tot
    ),
    z AS (SELECT sum(pow(share, {MIX_ALPHA})) AS zsum FROM sh)
    SELECT source,
           (1000000 * src_tokens) // total AS share_ppm,
           round(pow(share, {MIX_ALPHA}) / zsum, 6) AS p_temperature,
           round(pow(share, {MIX_ALPHA}) / zsum / share, 4) AS boost
    FROM sh CROSS JOIN z
    ORDER BY source
    """,
)
def corpus_domain_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain mixing: sampling probability per source
    ∝ share^α with α=0.3 — the exponentiated-mixture rule multilingual
    pretraining uses to lift low-resource domains without flattening
    the mixture entirely (α=1 keeps natural proportions, α=0 is the
    uniform target corpus_domain_mix_weights computes). ``boost`` is
    the resulting up/down-sampling factor vs natural sampling.

    Determinism: share_ppm is exact BIGINT arithmetic; the temperature
    terms are pow/ln-irrational doubles rounded at 1e-6/1e-4 — far
    above the ≤1-ulp libm and 20-term summation-order jitter, and
    irrational values cannot sit on HALF_UP boundaries (the perplexity
    lane's argument).

    100 TB: one |sources|-group aggregate over the corpus with map-side
    combine; everything after operates on O(|sources|) rows with two
    1-row scalar broadcasts.
    """
    d = fan_out(load_table(spark, sf_dir, "documents"))
    src = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).alias("src_tokens")
    )
    tot = src.agg(F.sum("src_tokens").alias("total"))
    sh = src.join(F.broadcast(tot)).withColumn(
        "share", F.col("src_tokens") / F.col("total")
    )
    z = sh.agg(F.sum(F.pow("share", F.lit(MIX_ALPHA))).alias("zsum"))
    p = F.pow("share", F.lit(MIX_ALPHA)) / F.col("zsum")
    return (
        sh.join(F.broadcast(z))
        .select(
            "source",
            F.expr("(1000000 * src_tokens) div total").alias("share_ppm"),
            F.round(p, 6).alias("p_temperature"),
            F.round(p / F.col("share"), 4).alias("boost"),
        )
        .orderBy("source")
    )


BPE_MERGE_STEPS = 3  # unrolled training iterations (kmeans-style)

# The trained chain (vocab -> 3 argmax/merge rounds, ends with CTE `b2`
# and the fully-merged symbolization `s3`) is shared by the trainer and
# the encoder oracles so they cannot drift.
_BPE_CHAIN_SQL = r"""wc AS (
        SELECT t.word, count(*) AS cnt
        FROM documents, UNNEST(string_split(text, ' ')) AS t(word)
        WHERE regexp_matches(t.word, '^[a-z0-9]+$')
        GROUP BY t.word
    ),
    s0 AS (SELECT word, cnt, array_to_string(string_split(word, ''), ' ') AS s FROM wc),
    p0 AS (
        SELECT syms[i] AS l, syms[i+1] AS r, sum(cnt) AS pc
        FROM (SELECT cnt, string_split(s, ' ') AS syms FROM s0),
             UNNEST(range(1, len(syms))) AS t(i)
        GROUP BY 1, 2
    ),
    b0 AS (SELECT l, r, pc FROM p0 ORDER BY pc DESC, l, r LIMIT 1),
    s1 AS (
        SELECT word, cnt,
               regexp_replace(s, '\b' || b0.l || ' ' || b0.r || '\b',
                              b0.l || b0.r, 'g') AS s
        FROM s0, b0
    ),
    p1 AS (
        SELECT syms[i] AS l, syms[i+1] AS r, sum(cnt) AS pc
        FROM (SELECT cnt, string_split(s, ' ') AS syms FROM s1),
             UNNEST(range(1, len(syms))) AS t(i)
        GROUP BY 1, 2
    ),
    b1 AS (SELECT l, r, pc FROM p1 ORDER BY pc DESC, l, r LIMIT 1),
    s2 AS (
        SELECT word, cnt,
               regexp_replace(s, '\b' || b1.l || ' ' || b1.r || '\b',
                              b1.l || b1.r, 'g') AS s
        FROM s1, b1
    ),
    p2 AS (
        SELECT syms[i] AS l, syms[i+1] AS r, sum(cnt) AS pc
        FROM (SELECT cnt, string_split(s, ' ') AS syms FROM s2),
             UNNEST(range(1, len(syms))) AS t(i)
        GROUP BY 1, 2
    ),
    b2 AS (SELECT l, r, pc FROM p2 ORDER BY pc DESC, l, r LIMIT 1),
    s3 AS (
        SELECT word,
               regexp_replace(s, '\b' || b2.l || ' ' || b2.r || '\b',
                              b2.l || b2.r, 'g') AS s
        FROM s2, b2
    )"""


@register(
    "bpe_train_merges",
    oracle=f"""
    WITH {_BPE_CHAIN_SQL}
    SELECT CAST(1 AS INT) AS step, l AS left_sym, r AS right_sym,
           l || r AS merged, CAST(pc AS BIGINT) AS pair_count FROM b0
    UNION ALL
    SELECT CAST(2 AS INT), l, r, l || r, CAST(pc AS BIGINT) FROM b1
    UNION ALL
    SELECT CAST(3 AS INT), l, r, l || r, CAST(pc AS BIGINT) FROM b2
    """,
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-step BPE tokenizer TRAINING (not just the first pair count):
    three merge rounds unrolled, each round = weighted adjacent-pair
    count over the current symbolization, argmax pair (count desc, then
    lexicographic — the deterministic tie rule both engines share), and
    a greedy non-overlapping merge applied via word-boundary regex on the
    space-joined symbol string (regex global replace IS left-to-right
    non-overlapping — the exact BPE merge semantics). The training vocab
    is filtered to normalized lowercase-alphanumeric words in BOTH
    engines, so every symbol is regex-literal and the \\b delimiters are
    sound by construction, not by assumption.

    This is how production BPE trainers actually scale: aggregate the
    corpus ONCE into a word-frequency table (map-side-combined groupBy —
    the Zipf head never shuffles raw), then iterate on the compact
    |vocab|-row relation. Each round's state is localCheckpoint-ed (the
    graph.py label-propagation pattern) so round N never re-runs rounds
    1..N-1, and the 1-row argmax rides a broadcast. Corpus cost: one
    scan, independent of merge count.
    """
    steps, _ = _bpe_train(spark, sf_dir)
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out


def _bpe_train(spark: SparkSession, sf_dir: str):
    """Shared BPE training chain: returns (per-step merge rows, final
    encoded vocab after ALL merges). bpe_train_merges publishes the
    steps; bpe_encode_corpus applies the final vocab — one chain, so
    trainer and encoder cannot drift (the _KMEANS_A1_SQL pattern)."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    # Train on NORMALIZED words only (lowercase alphanumerics) — BPE
    # trainers run after text normalization anyway, and this makes the
    # \b-delimited merge regex sound BY CONSTRUCTION instead of by
    # assumption (a regex metacharacter inside a symbol would corrupt
    # the merge pattern). Enforced identically in the oracle; a no-op
    # on the gate corpora.
    wc = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word").rlike("^[a-z0-9]+$"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    cur = wc.select(
        "word", "cnt", F.array_join(F.split("word", ""), " ").alias("s")
    ).localCheckpoint()
    steps = []
    for step in range(1, BPE_MERGE_STEPS + 1):
        pairs = (
            cur.filter(F.size(F.split("s", " ")) > 1)
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(split(s, ' ')) - 1), "
                        "i -> struct(element_at(split(s, ' '), i) AS l, "
                        "element_at(split(s, ' '), i + 1) AS r))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("pc"))
        )
        best = pairs.orderBy(F.desc("pc"), "l", "r").limit(1).localCheckpoint()
        steps.append(
            best.select(
                F.lit(step).cast("int").alias("step"),
                F.col("l").alias("left_sym"),
                F.col("r").alias("right_sym"),
                F.concat("l", "r").alias("merged"),
                F.col("pc").cast("bigint").alias("pair_count"),
            )
        )
        # apply EVERY merge (the trainer only needed 1..N-1 for its own
        # next round; the encoder needs the vocab after all N)
        b = F.broadcast(
            best.select(F.col("l").alias("bl"), F.col("r").alias("br"))
        )
        pat = F.concat(F.lit("\\b"), F.col("bl"), F.lit(" "), F.col("br"), F.lit("\\b"))
        cur = cur.crossJoin(b).select(
            "word",
            "cnt",
            F.regexp_replace(F.col("s"), pat, F.concat("bl", "br")).alias("s"),
        )
        # The final merge application stays LAZY: only bpe_encode_corpus
        # consumes the post-merge vocab, so bpe_train_merges (which reads
        # just `steps`) must not pay a full-vocab regex pass + checkpoint
        # for it. Intermediate rounds still checkpoint so round N never
        # re-runs rounds 1..N-1.
        if step < BPE_MERGE_STEPS:
            cur = cur.localCheckpoint()
    return steps, cur


@register(
    "bpe_encode_corpus",
    oracle=f"""
    WITH {_BPE_CHAIN_SQL},
    docw AS (
        SELECT doc_id, i, ws[i] AS word
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             UNNEST(range(1, len(ws) + 1)) AS t(i)
        WHERE regexp_matches(ws[i], '^[a-z0-9]+$')
    ),
    j AS (SELECT d.doc_id, d.i, e.s FROM docw d JOIN s3 e ON d.word = e.word)
    SELECT doc_id,
           CAST(count(*) AS INT) AS n_words,
           CAST(sum(len(string_split(s, ' '))) AS BIGINT) AS n_tokens,
           md5(string_agg(s, ' ' ORDER BY i)) AS stream_md5
    FROM j GROUP BY doc_id
    """,
)
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLY — the other half of the BPE story: encode every
    document with the merges bpe_train_merges learned. The trained vocab
    is symbolized ONCE (word -> post-merge symbol string, all merges
    applied in rank order via the same word-boundary regex the trainer
    used), then documents encode through
    a plain word -> symbols lookup. Output per document: normalized word
    count, encoded token count, and the md5 of the full token stream in
    word order — the whole tokenization is value-pinned, not just
    counted.

    100 TB plan shape: training iterates on the compact vocab relation
    (see bpe_train_merges); encoding joins the exploded corpus against
    the BROADCAST encoded vocab — the Zipf-keyed word relation is never
    shuffled (a hash join on `word` would funnel every 'the' through
    one reducer; the broadcast turns it into a map-side lookup, the
    production tokenizer shape: ship the merge table, stream the
    corpus). Per-doc stream ordering sorts only within a document
    (bounded by doc length), never globally.
    """
    _, vocab = _bpe_train(spark, sf_dir)
    d = fan_out(load_table(spark, sf_dir, "documents"))
    words = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    ).filter(F.col("word").rlike("^[a-z0-9]+$"))
    j = words.join(F.broadcast(vocab.select("word", "s")), "word")
    ordered = F.expr("transform(array_sort(collect_list(struct(pos, s))), x -> x.s)")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_words"),
        F.sum(F.size(F.split("s", " "))).cast("bigint").alias("n_tokens"),
        F.md5(F.array_join(ordered, " ")).alias("stream_md5"),
    )


@register(
    "text_bigram_kneser_ney",
    oracle="""
    WITH big AS (
        SELECT words[i] AS w1, words[i+1] AS w2
        FROM (SELECT string_split(text, ' ') AS words FROM documents),
             UNNEST(range(1, len(words))) AS t(i)
    ),
    pc AS (SELECT w1, w2, count(*) AS n12 FROM big GROUP BY 1, 2),
    uc AS (SELECT w1, sum(n12) AS n1, count(*) AS fert FROM pc GROUP BY w1),
    cont AS (SELECT w2, count(*) AS n_cont FROM pc GROUP BY w2),
    types AS (SELECT count(*) AS b FROM pc),
    scored AS (
        SELECT pc.w1, pc.w2, pc.n12,
               CASE WHEN 4 * pc.n12 - 3 > 0
                    THEN (4 * pc.n12 - 3) * 1000000 // (4 * uc.n1)
                    ELSE 0 END
               + 3 * uc.fert * (cont.n_cont * 1000000 // types.b)
                   // (4 * uc.n1) AS p_kn_micro
        FROM pc
        JOIN uc ON pc.w1 = uc.w1
        JOIN cont ON pc.w2 = cont.w2
        CROSS JOIN types
        WHERE uc.n1 >= 50
    )
    SELECT w1, w2, n12, CAST(p_kn_micro AS BIGINT) AS p_kn_micro, rn
    FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY w1
                   ORDER BY p_kn_micro DESC, w2 ASC) AS INT) AS rn
        FROM scored
    ) WHERE rn <= 3
    """,
)
def text_bigram_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser–Ney smoothed bigram LM (the production n-gram smoothing,
    vs text_bigram_conditionals' raw MLE): absolute discount D = 3/4 on
    every observed pair, with the discounted mass re-allocated through
    the CONTINUATION distribution — P_cont(w2) = |distinct contexts
    preceding w2| / |bigram types| — the "how many contexts does this
    word complete" insight that fixes MLE's overconfidence on frequent-
    but-context-bound words. Top-3 continuations per ≥50-count context.

    Fixed point: with D = 3/4 every term is a ratio of integers, so the
    whole probability is computed in integer micro-units
    ((4·n12−3)·10⁶ div 4·n1 + 3·fert·p_cont div 4·n1) — bit-identical
    across engines, no float smoothing anywhere.

    100 TB: everything derives from the ONE (w1,w2)-keyed pair-count
    shuffle (map-side combined); context totals, fertilities, and
    continuation counts are vocabulary-sized aggregates OF that relation
    (never a corpus re-read); the 1-row type total rides a broadcast and
    the ranking window partitions on w1.
    """
    d = fan_out(load_table(spark, sf_dir, "documents")).filter(
        F.size(F.split("text", " ")) >= 2
    )
    words = F.split("text", " ")
    idx = F.sequence(F.lit(1), F.size(words) - 1)
    bigrams = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(words, i).alias("w1"),
            F.element_at(words, i + 1).alias("w2"),
        ),
    )
    pc = (
        d.select(F.explode(bigrams).alias("b"))
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n12"))
        .localCheckpoint()  # four aggregates below derive from this one relation
    )
    uc = pc.groupBy("w1").agg(
        F.sum("n12").alias("n1"), F.count(F.lit(1)).alias("fert")
    )
    cont = pc.groupBy("w2").agg(F.count(F.lit(1)).alias("n_cont"))
    types = pc.agg(F.count(F.lit(1)).alias("b"))
    p_kn = (
        "CASE WHEN 4 * n12 - 3 > 0 "
        "THEN (4 * n12 - 3) * 1000000 div (4 * n1) ELSE 0 END "
        "+ 3 * fert * (n_cont * 1000000 div b) div (4 * n1)"
    )
    scored = (
        pc.join(F.broadcast(uc.filter(F.col("n1") >= 50)), "w1")
        .join(F.broadcast(cont), "w2")
        .crossJoin(F.broadcast(types))
        .select("w1", "w2", "n12", F.expr(p_kn).cast("bigint").alias("p_kn_micro"))
    )
    w = Window.partitionBy("w1").orderBy(F.desc("p_kn_micro"), F.asc("w2"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
    )


# Shared int8-code CTE for the SQ search lane — the same quantization
# embedding_quantize_int8 registers, factored as SQL so both lanes'
# oracles state identical code math.
_SQ8_CODES_SQL = """
    sq8 AS (
      SELECT vec_id, embedding,
             list_transform(embedding,
                 x -> CAST(sign(CAST(x AS DOUBLE) * 127.0
                                / nullif(list_max(list_transform(embedding,
                                      v -> abs(CAST(v AS DOUBLE)))), 0))
                         * floor(abs(CAST(x AS DOUBLE) * 127.0
                                / nullif(list_max(list_transform(embedding,
                                      v -> abs(CAST(v AS DOUBLE)))), 0)))
                       AS BIGINT)) AS qvec
      FROM embeddings
    )"""


def _sq8_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, embedding, qvec): symmetric per-vector int8 codes as
    BIGINT elements (the exact embedding_quantize_int8 math; bigint so
    the integer dot below never casts)."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    x = lambda v: v.cast("double")  # noqa: E731
    maxabs = F.array_max(F.transform("embedding", lambda v: F.abs(x(v))))
    with_m = emb.select("vec_id", "embedding", maxabs.alias("maxabs"))
    p = lambda v: x(v) * F.lit(127.0) / F.nullif(F.col("maxabs"), F.lit(0.0))  # noqa: E731
    q = F.transform(
        "embedding",
        lambda v: (F.signum(p(v)) * F.floor(F.abs(p(v)))).cast("bigint"),
    )
    return with_m.select("vec_id", "embedding", q.alias("qvec"))


def _sq8_scored(spark: SparkSession, sf_dir: str, n_queries: int):
    """(codes, scored): the int8-code corpus and the query-vs-corpus
    integer-dot scoring relation (query_id, match_id, idot) — ONE
    implementation shared by the serving lane and the recall audit so
    the dot expression and tie-break can never drift between them.
    The query codes broadcast; the corpus streams once."""
    c = _sq8_codes(spark, sf_dir)
    q_codes = c.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("qvec").alias("qq")
    )
    idot = F.expr(
        "aggregate(zip_with(qq, cvec, (a, b) -> a * b), "
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    scored = (
        F.broadcast(q_codes)
        .crossJoin(
            c.select(
                F.col("vec_id").alias("match_id"),
                F.col("qvec").alias("cvec"),
            )
        )
        .filter(F.col("match_id") != F.col("query_id"))
        .select("query_id", "match_id", idot.alias("idot"))
    )
    return c, scored


def _register_sq8_rerank():
    from .pq import _SL_DUCK, _SL_SPARK
    from .similarity import (
        N_QUERIES,
        TOP_K,
        _DOT,
        _as_double,
        check_brute_force_bound,
    )

    @register(
        "similarity_sq8_rerank_topk",
        oracle=f"""
        WITH {_SQ8_CODES_SQL},
        sl AS (SELECT {_SL_DUCK} AS s FROM embeddings),
        q AS (SELECT vec_id AS query_id, qvec AS qq,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
              FROM sq8 WHERE vec_id < {N_QUERIES}),
        scored AS (
          SELECT q.query_id, c.vec_id AS match_id,
                 CAST(list_inner_product(qq, c.qvec) AS BIGINT) AS idot,
                 row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY CAST(list_inner_product(qq, c.qvec) AS BIGINT)
                              DESC, c.vec_id
                 ) AS srnk
          FROM q JOIN sq8 c ON c.vec_id <> q.query_id
        ),
        xd AS (
          SELECT s.query_id, s.match_id,
                 list_cosine_similarity(
                   q.qv, list_transform(e.embedding, x -> CAST(x AS DOUBLE))
                 ) AS sim
          FROM scored s, sl
          JOIN q ON q.query_id = s.query_id
          JOIN embeddings e ON e.vec_id = s.match_id
          WHERE s.srnk <= sl.s
        )
        SELECT query_id, match_id, round(sim, 6) AS cosine_sim, rnk FROM (
          SELECT query_id, match_id, sim,
                 CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY sim DESC, match_id) AS INT)
                   AS rnk
          FROM xd
        ) WHERE rnk <= {TOP_K}
        """,
    )
    def similarity_sq8_rerank_topk(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Scalar-quantization serving shape — the third quantization
        tier beside PQ (similarity_pq_rerank_topk) and binary
        (similarity_hamming_rerank_topk): per-vector symmetric int8
        codes (4x smaller than float32), shortlist ranked by the
        INTEGER code dot product (exact in both engines — no float
        divergence can flip a shortlist boundary), s from the shared
        scale-aware shortlist law, then exact cosine re-rank over the
        shortlist's full vectors.

        100 TB plan shape (the _pq_rerank_xd pattern): the corpus scan
        reads 64-byte codes, not 256-byte floats; the shortlist
        (|Q|xs rows) is BROADCAST to the full-vector scan so float
        vectors are fetched for at most s candidates per query; the
        corpus count feeding the law is a 1-row broadcast."""
        check_brute_force_bound(N_QUERIES)
        _, scored = _sq8_scored(spark, sf_dir, N_QUERIES)
        e = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double("embedding").alias("v")
        )
        sl = e.agg(F.expr(_SL_SPARK).alias("s"))
        ws = Window.partitionBy("query_id").orderBy(
            F.desc("idot"), "match_id"
        )
        cand = (
            scored.withColumn("srnk", F.row_number().over(ws))
            .crossJoin(F.broadcast(sl))
            .filter(F.col("srnk") <= F.col("s"))
            .select("query_id", "match_id")
        )
        q_vecs = e.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        dot = F.expr(_DOT.format(a="qv", b="v"))
        nq = F.sqrt(F.expr(_DOT.format(a="qv", b="qv")))
        nc = F.sqrt(F.expr(_DOT.format(a="v", b="v")))
        xd = (
            F.broadcast(cand.join(q_vecs, "query_id"))
            .join(e, e.vec_id == cand.match_id)
            .select("query_id", "match_id", (dot / (nq * nc)).alias("sim"))
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "match_id")
        return (
            xd.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= TOP_K)
            .select(
                "query_id",
                "match_id",
                F.round("sim", 6).alias("cosine_sim"),
                "rnk",
            )
        )


_register_sq8_rerank()


def _register_sq8_recall_audit():
    from .similarity import (
        N_QUERIES,
        TOP_K,
        _DOT,
        _as_double,
        check_brute_force_bound,
    )

    @register(
        "similarity_sq8_recall_audit",
        oracle=f"""
        WITH {_SQ8_CODES_SQL},
        e AS (SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
        q AS (
          SELECT c.vec_id AS query_id, c.qvec AS qq, e.v AS qv
          FROM sq8 c JOIN e ON e.vec_id = c.vec_id
          WHERE c.vec_id < {N_QUERIES}
        ),
        exact_topk AS (
          SELECT query_id, match_id FROM (
            SELECT q.query_id, c.vec_id AS match_id,
                   row_number() OVER (
                     PARTITION BY q.query_id
                     ORDER BY list_cosine_similarity(q.qv, c.v) DESC,
                              c.vec_id
                   ) AS rnk
            FROM q JOIN e c ON c.vec_id <> q.query_id
          ) WHERE rnk <= {TOP_K}
        ),
        sq_topk AS (
          SELECT query_id, match_id FROM (
            SELECT q.query_id, c.vec_id AS match_id,
                   row_number() OVER (
                     PARTITION BY q.query_id
                     ORDER BY CAST(list_inner_product(q.qq, c.qvec)
                                   AS BIGINT) DESC, c.vec_id
                   ) AS rnk
            FROM q JOIN sq8 c ON c.vec_id <> q.query_id
          ) WHERE rnk <= {TOP_K}
        )
        SELECT x.query_id,
               CAST(sum(CASE WHEN s.match_id IS NULL THEN 0 ELSE 1 END)
                    AS INT) AS n_hits,
               round(sum(CASE WHEN s.match_id IS NULL THEN 0 ELSE 1 END)
                     / {TOP_K}.0, 2) AS recall_at_{TOP_K}
        FROM exact_topk x
        LEFT JOIN sq_topk s
          ON s.query_id = x.query_id AND s.match_id = x.match_id
        GROUP BY x.query_id
        """,
    )
    def similarity_sq8_recall_audit(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Recall@k of raw int8-code dot ranking against brute-force
        cosine ground truth — the measurement behind the SQ serving
        lane's design (same audit discipline as the IVF/PQ/Hamming
        families: the approximation is never trusted, it is measured).
        Measured mean recall@10: 0.70 at sf0.01 (N=500), 0.66 at sf0.1
        (N=5,000) — the per-vector scale biases the integer dot by
        1/max|c| relative to cosine's 1/||c||, which is exactly why
        similarity_sq8_rerank_topk never serves raw code ranks: its
        law-sized shortlist (s=100 at the N=500 anchor — 20% of the
        corpus) recovers the true top-k under exact re-rank (the lane's
        oracle pairing proves equality with the law-identical SQL).

        100 TB shape: ground truth is one broadcast-query corpus scan
        (bounded by MAX_BRUTE_FORCE_QUERIES); the SQ side scans 64-byte
        codes; the comparison joins two k-row-per-query relations."""
        check_brute_force_bound(N_QUERIES)
        e = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double("embedding").alias("v")
        )
        _c, sq_scored = _sq8_scored(spark, sf_dir, N_QUERIES)
        q = e.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        dot = F.expr(_DOT.format(a="qv", b="cv"))
        nq = F.sqrt(F.expr(_DOT.format(a="qv", b="qv")))
        nc = F.sqrt(F.expr(_DOT.format(a="cv", b="cv")))
        exact_scored = (
            F.broadcast(q.select("query_id", "qv"))
            .crossJoin(
                e.select(
                    F.col("vec_id").alias("match_id"),
                    F.col("v").alias("cv"),
                )
            )
            .filter(F.col("match_id") != F.col("query_id"))
            .select(
                "query_id", "match_id", (dot / (nq * nc)).alias("sim")
            )
        )
        w_sim = Window.partitionBy("query_id").orderBy(
            F.desc("sim"), "match_id"
        )
        exact_topk = (
            exact_scored.withColumn("rnk", F.row_number().over(w_sim))
            .filter(F.col("rnk") <= TOP_K)
            .select("query_id", "match_id")
        )
        w_sq = Window.partitionBy("query_id").orderBy(
            F.desc("idot"), "match_id"
        )
        sq_topk = (
            sq_scored.withColumn("rnk", F.row_number().over(w_sq))
            .filter(F.col("rnk") <= TOP_K)
            .select(
                "query_id", F.col("match_id").alias("sq_match_id")
            )
        )
        joined = exact_topk.join(
            sq_topk,
            (exact_topk.query_id == sq_topk.query_id)
            & (exact_topk.match_id == sq_topk.sq_match_id),
            "left",
        ).select(exact_topk.query_id, sq_topk.sq_match_id)
        hits = F.sum(
            F.when(F.col("sq_match_id").isNull(), 0).otherwise(1)
        )
        return joined.groupBy("query_id").agg(
            hits.cast("int").alias("n_hits"),
            F.round(hits / F.lit(float(TOP_K)), 2).alias(
                f"recall_at_{TOP_K}"
            ),
        )


_register_sq8_recall_audit()
