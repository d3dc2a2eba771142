"""EXT workload — the large-scale training-data-pipeline operators
(SURVEY.md §7.2 step 7): time windows, text analysis, dedup,
similarity search, multimodal plumbing.

Registered through the same @query decorator as the core workload;
oracle SQL replicates each pipeline stage-for-stage (md5-string
MinHash, nibble SimHash, literal-hyperplane LSH), so the driver's
value-hash check verifies the ACTUAL algorithm, not a lookalike.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .operators.dedup import (
    BAND_MIX,
    BAND_ROWS,
    MINHASH_AB,
    MINHASH_BUCKET_CAP,
    MINHASH_PRIME,
    N_BANDS,
    N_MINHASH,
    SIMHASH_BANDS,
    SIMHASH_BUCKET_CAP,
    SIMHASH_HAMMING_MAX,
    exact_dedup,
    exact_dup_edges,
    _spread,
    minhash_candidates,
    ngram_containment_pairs,
    ngram_jaccard_pairs,
    simhash32,
    simhash_candidate_pairs,
)
from .operators.multimodal import documents_as_media, extract_features
from .operators.similarity import (
    HYPERPLANES,
    brute_force_topk,
    lsh_bucket_topk,
    sql_lsh_bucket,
)
from .operators.textanalysis import (
    LANG_STOPWORDS,
    STOPWORDS_ALL,
    lang_id,
    quality_features,
    quality_score,
    token_count_bpe_ish,
    tokens,
)
from .sources.parquet import load_table
from .streaming.windows import session_agg, sliding_agg, tumbling_agg
from .workload import PREPARES, query

JACCARD_THRESHOLD = 0.3
ANN_QUERY_LIMIT = 20  # vec_id < 20 are the query vectors
ANN_K = 5


# ---------------------------------------------------------------------------
# Time windows over events (batch-verified, streaming-compatible)
# ---------------------------------------------------------------------------
@query(
    "tumbling_hourly",
    """
    WITH e AS (SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) tb,
                      event_type, value
               FROM events)
    SELECT strftime(tb, '%Y-%m-%d %H:%M:%S') AS window_start,
           strftime(tb + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
           event_type,
           COUNT(*)::BIGINT AS n_eventos,
           ROUND(SUM(value), 2) AS valor_total
    FROM e GROUP BY tb, event_type
    """,
)
def q_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return tumbling_agg(
        events,
        "ts",
        "1 hour",
        aggs=[
            F.count(F.lit(1)).alias("n_eventos"),
            F.round(F.sum("value"), 2).alias("valor_total"),
        ],
        keys=["event_type"],
    )


@query(
    "sliding_1h_15m",
    """
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) ts, value FROM events),
    w AS (SELECT time_bucket(INTERVAL '15 minutes', ts) - to_minutes(g.g * 15) AS ws, value
          FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS g) g)
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           strftime(ws + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
           COUNT(*)::BIGINT AS n_eventos,
           ROUND(SUM(value), 2) AS valor_total
    FROM w GROUP BY ws
    """,
)
def q_sliding_1h_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return sliding_agg(
        events,
        "ts",
        "1 hour",
        "15 minutes",
        aggs=[
            F.count(F.lit(1)).alias("n_eventos"),
            F.round(F.sum("value"), 2).alias("valor_total"),
        ],
    )


@query(
    "session_30m",
    """
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts, value FROM events),
    m AS (SELECT *, CASE WHEN LAG(ts) OVER w IS NULL
                          OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                         THEN 1 ELSE 0 END AS new_s
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sid
          FROM m)
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           COUNT(*)::BIGINT AS n_eventos,
           ROUND(SUM(value), 2) AS valor_total
    FROM s GROUP BY user_id, sid
    """,
)
def q_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.session_window (streaming-native stateful op) in batch mode;
    oracle = classic gaps-and-islands."""
    events = load_table(spark, sf_dir, "events")
    out = session_agg(
        events,
        "ts",
        "30 minutes",
        keys=["user_id"],
        aggs=[
            F.count(F.lit(1)).alias("n_eventos"),
            F.round(F.sum("value"), 2).alias("valor_total"),
        ],
    )
    return out.select("user_id", "session_start", "session_end", "n_eventos", "valor_total")


# ---------------------------------------------------------------------------
# Text analysis over documents
# ---------------------------------------------------------------------------
def _sql_stopword_hits(words: list[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(toks, t -> t IN ({lst})))"


def _lang_id_sql() -> str:
    langs = list(LANG_STOPWORDS)
    hits = {lg: f"h_{lg}" for lg in langs}
    branches = []
    for i, lg in enumerate(langs):
        conds = [f"{hits[lg]} > 0"]
        for j, other in enumerate(langs):
            if i == j:
                continue
            op = ">=" if j > i else ">"
            conds.append(f"{hits[lg]} {op} {hits[other]}")
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lg}'")
    return "CASE " + " ".join(branches) + " ELSE 'und' END"


@query(
    "lang_confusion",
    f"""
    WITH t AS (SELECT lang, string_split(lower(text), ' ') AS toks FROM documents),
    h AS (SELECT lang,
          {", ".join(f"{_sql_stopword_hits(ws)} AS h_{lg}" for lg, ws in LANG_STOPWORDS.items())}
          FROM t)
    SELECT lang, {_lang_id_sql()} AS lang_pred, COUNT(*)::BIGINT AS n_docs
    FROM h GROUP BY lang, lang_pred
    """,
)
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (stopword-hit argmax) vs the labeled lang
    column → confusion counts."""

    docs = _spread(load_table(spark, sf_dir, "documents"))
    return (
        docs.withColumn("lang_pred", lang_id(tokens("text")))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# Shared quality-feature CTE + score expression: ONE SQL copy of the
# formula (weights, caps, 3-10 word-length band, ROUND 4) consumed by
# every oracle that scores quality — the Spark twin is
# operators.textanalysis.quality_score. The f CTE also carries the
# per-language stopword hits so _lang_id_sql() composes on top.
def _sql_quality_cte() -> str:
    hits = ", ".join(
        f"{_sql_stopword_hits(ws)} AS h_{lg}" for lg, ws in LANG_STOPWORDS.items()
    )
    return f"""
    t AS (SELECT doc_id, text, string_split(lower(text), ' ') AS toks FROM documents),
    f AS (SELECT doc_id, {hits},
                 len(toks)::BIGINT AS n_tokens,
                 len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT
                   AS n_bpe_tokens,
                 (length(text) - (len(toks) - 1)) / CAST(len(toks) AS DOUBLE) AS mwl,
                 {_sql_stopword_hits(STOPWORDS_ALL)} / CAST(len(toks) AS DOUBLE) AS swr,
                 length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                   / CAST(length(text) AS DOUBLE) AS pr
          FROM t)
    """


_SQL_QUALITY_SCORE = """ROUND(LEAST(swr * 4.0, 1.0) * 0.4
                 + (CASE WHEN mwl >= 3 AND mwl <= 10 THEN 1.0 ELSE 0.0 END) * 0.3
                 + (1.0 - LEAST(pr * 5.0, 1.0)) * 0.3, 4)"""


@query(
    "doc_quality",
    f"""
    WITH {_sql_quality_cte()}
    SELECT doc_id, n_tokens, n_bpe_tokens,
           ROUND(mwl, 4) AS mean_word_len,
           ROUND(swr, 6) AS stopword_ratio,
           {_SQL_QUALITY_SCORE} AS quality_score
    FROM f
    """,
)
def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = quality_features("text")
    return docs.select(
        "doc_id",
        feats["n_tokens"].cast("bigint").alias("n_tokens"),
        token_count_bpe_ish("text").cast("bigint").alias("n_bpe_tokens"),
        F.round(feats["mean_word_len"], 4).alias("mean_word_len"),
        F.round(feats["stopword_ratio"], 6).alias("stopword_ratio"),
        quality_score("text").alias("quality_score"),
    )


# ---------------------------------------------------------------------------
# Curation products: the keep-list a C4-style heuristic filter emits,
# and the corpus-composition report read before training. Both compose
# the annotation pass (lang-ID + token counts + quality score).
# ---------------------------------------------------------------------------
KEEP_MIN_QUALITY, KEEP_MIN_TOKENS, KEEP_MAX_TOKENS = 0.5, 20, 1000


def _sql_doc_annotations() -> str:
    """Annotated-documents CTE body (doc_id, lang_pred, n_tokens,
    n_bpe_tokens, quality_score) — DuckDB twin of
    operators.textanalysis.annotate_documents, built on the SAME
    quality CTE + score expression as the doc_quality oracle (one SQL
    copy of the formula)."""
    return f"""
    {_sql_quality_cte()},
    ann AS (SELECT doc_id,
                   {_lang_id_sql()} AS lang_pred,
                   n_tokens,
                   n_bpe_tokens,
                   {_SQL_QUALITY_SCORE} AS quality_score
            FROM f)
    """


@query(
    "corpus_keep_list",
    f"""
    WITH {_sql_doc_annotations()}
    SELECT doc_id, lang_pred, n_tokens, quality_score
    FROM ann
    WHERE lang_pred = 'en'
      AND quality_score >= {KEEP_MIN_QUALITY}
      AND n_tokens BETWEEN {KEEP_MIN_TOKENS} AND {KEEP_MAX_TOKENS}
    """,
)
def q_corpus_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The heuristic-filter keep-list (C4/Gopher style): docs that are
    confidently English, above the quality floor, and inside the token
    budget band. Map-only — the filter runs inside the scan's codegen
    stage at any corpus size."""
    from .operators.textanalysis import annotate_documents

    docs = load_table(spark, sf_dir, "documents")
    ann = annotate_documents(_spread(docs))
    return ann.filter(
        (F.col("lang_pred") == "en")
        & (F.col("quality_score") >= KEEP_MIN_QUALITY)
        & F.col("n_tokens").between(KEEP_MIN_TOKENS, KEEP_MAX_TOKENS)
    ).select("doc_id", "lang_pred", "n_tokens", "quality_score")


@query(
    "corpus_composition",
    f"""
    WITH {_sql_doc_annotations()}
    SELECT lang_pred,
           CASE WHEN quality_score >= 0.6 THEN 'high'
                WHEN quality_score >= 0.4 THEN 'mid'
                ELSE 'low' END AS quality_band,
           COUNT(*)::BIGINT AS n_docs,
           SUM(n_tokens)::BIGINT AS total_tokens,
           SUM(n_bpe_tokens)::BIGINT AS total_bpe_tokens,
           ROUND(AVG(quality_score), 4) AS avg_quality
    FROM ann GROUP BY lang_pred, quality_band
    """,
)
def q_corpus_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-composition report: docs and token budget per predicted
    language × quality band — the numbers a data-mixture decision
    reads. One annotation pass + one shuffle."""
    from .operators.textanalysis import annotate_documents

    docs = load_table(spark, sf_dir, "documents")
    ann = annotate_documents(_spread(docs))
    band = (
        F.when(F.col("quality_score") >= 0.6, "high")
        .when(F.col("quality_score") >= 0.4, "mid")
        .otherwise("low")
    )
    return (
        ann.groupBy("lang_pred", band.alias("quality_band"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("n_bpe_tokens").cast("bigint").alias("total_bpe_tokens"),
            F.round(F.avg("quality_score"), 4).alias("avg_quality"),
        )
    )


# ---------------------------------------------------------------------------
# Repetition filter (Gopher-style): within-doc duplicate n-gram
# fractions — the curation signal that catches looping generator
# output which length/stopword heuristics miss.
# ---------------------------------------------------------------------------
DUP_2GRAM_MAX, DUP_3GRAM_MAX = 0.60, 0.45


def _sql_rep_frac(n: int) -> str:
    toks = "string_split(lower(text), ' ')"
    grams = (
        f"list_transform(range(1, greatest(len({toks}) - {n - 1}, 1) + 1), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' '))"
    )
    return (
        f"ROUND(1.0 - len(list_distinct({grams})) "
        f"/ CAST(len({grams}) AS DOUBLE), 4)"
    )


@query(
    "doc_repetition",
    f"""
    WITH r AS (SELECT doc_id,
                      len(string_split(lower(text), ' '))::BIGINT AS n_tokens,
                      {_sql_rep_frac(2)} AS dup_2gram_frac,
                      {_sql_rep_frac(3)} AS dup_3gram_frac
               FROM documents)
    SELECT doc_id, n_tokens, dup_2gram_frac, dup_3gram_frac,
           (dup_2gram_frac <= {DUP_2GRAM_MAX}
            AND dup_3gram_frac <= {DUP_3GRAM_MAX})::BIGINT AS keep
    FROM r
    """,
)
def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition report + keep flag (dup 2-gram ≤ 0.60 and
    dup 3-gram ≤ 0.45 — Gopher-flavored thresholds). Map-only: gram
    construction, distinct and the flag are one Catalyst projection
    inside the scan stage."""
    from .operators.dedup import _spread
    from .operators.textanalysis import repetition_fraction, token_count_ws

    docs = load_table(spark, sf_dir, "documents")
    d2 = repetition_fraction("text", 2)
    d3 = repetition_fraction("text", 3)
    return _spread(docs).select(
        "doc_id",
        token_count_ws("text").cast("bigint").alias("n_tokens"),
        d2.alias("dup_2gram_frac"),
        d3.alias("dup_3gram_frac"),
        ((d2 <= DUP_2GRAM_MAX) & (d3 <= DUP_3GRAM_MAX))
        .cast("bigint")
        .alias("keep"),
    )


# ---------------------------------------------------------------------------
# PII scrub: redact PII-shaped spans before release. The fixture
# corpus contains no PII, so the query deterministically APPENDS a
# synthetic contact string per doc and scrubs that — the hash match
# then proves the Java-regex (Spark) and RE2 (DuckDB) redaction
# semantics agree on real matches, not just on "no match".
# ---------------------------------------------------------------------------
_PII_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_PII_PHONE_RE = "[0-9]{3}-[0-9]{3,4}-?[0-9]{0,4}"


@query(
    "pii_scrub",
    f"""
    WITH aug AS (SELECT doc_id,
                        text || ' contact user' || doc_id ||
                        '@example.com or 555-' ||
                        lpad((doc_id % 10000)::VARCHAR, 4, '0') AS text
                 FROM documents),
    e AS (SELECT doc_id,
                 len(regexp_extract_all(text, '{_PII_EMAIL_RE}'))::BIGINT AS n_email,
                 regexp_replace(text, '{_PII_EMAIL_RE}', '<EMAIL>', 'g') AS t1
          FROM aug)
    SELECT doc_id, n_email,
           len(regexp_extract_all(t1, '{_PII_PHONE_RE}'))::BIGINT AS n_phone,
           regexp_replace(t1, '{_PII_PHONE_RE}', '<PHONE>', 'g') AS scrubbed
    FROM e
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the (synthetically contact-augmented)
    corpus: counts + scrubbed text per doc, all JVM regexp — map-only,
    runs inside the scan stage at any scale."""
    from .operators.dedup import _spread
    from .operators.textanalysis import pii_scrub

    docs = load_table(spark, sf_dir, "documents")
    aug = _spread(docs).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return pii_scrub(aug)


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------
@query(
    "exact_dedup",
    """
    SELECT md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS fp,
           MIN(doc_id)::BIGINT AS doc_id,
           COUNT(*)::BIGINT AS n_copies
    FROM documents GROUP BY fp
    """,
)
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs)


def _sql_shingles(text: str = "text", k: int = 3) -> str:
    toks = f"string_split(lower({text}), ' ')"
    return (
        f"list_distinct(list_transform(range(1, greatest(len({toks}) - {k - 1}, 1) + 1), "
        f"i -> array_to_string({toks}[i:i+{k - 1}], ' ')))"
    )


def _minhash_pairs_ctes(
    bucket_cap: int | None = MINHASH_BUCKET_CAP, src: str = "documents"
) -> str:
    """CTE chain replicating ``minhash_candidates`` in its production
    configuration (pre-exact-dedup representatives + bucket cap) —
    ends with a ``mh_pairs(doc_a, doc_b, jaccard)`` CTE.  Shared by the
    minhash_lsh_pairs / dedup_clusters / dedup_clusters_new_batch
    oracles; ``bucket_cap=None`` disables capping (the uncapped
    incremental-clusters contract); ``src`` swaps the corpus relation
    (e.g. a filtered CTE for the forget-flow oracle)."""
    cap_clause = "" if bucket_cap is None else f" AND COUNT(*) <= {bucket_cap}"
    sig_cols = ", ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MINHASH_PRIME})) AS mh_{j}"
        for j, (a, b) in enumerate(MINHASH_AB[:N_MINHASH])
    )

    def band_key(b: int) -> str:
        expr = f"mh_{b * BAND_ROWS}"
        for r in range(1, BAND_ROWS):
            expr = f"({expr} * {BAND_MIX} + mh_{b * BAND_ROWS + r})"
        return expr

    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, {band_key(b)} AS band_key FROM sig"
        for b in range(N_BANDS)
    )
    return f"""
    rep AS (SELECT MIN(doc_id) AS doc_id, arg_min(text, doc_id) AS text
            FROM {src}
            GROUP BY md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g'))),
    sh AS (SELECT doc_id, {_sql_shingles()} AS sh FROM rep),
    hs AS (SELECT doc_id, sh,
                  list_transform(sh, s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)) AS hs
           FROM sh),
    sig AS (SELECT doc_id, sh, {sig_cols} FROM hs),
    bands AS ({band_selects}),
    bucket_ok AS (SELECT band_idx, band_key FROM bands
                  GROUP BY band_idx, band_key
                  HAVING COUNT(*) > 1{cap_clause}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a
             JOIN bucket_ok o
               ON a.band_idx = o.band_idx AND a.band_key = o.band_key
             JOIN bands b
               ON a.band_idx = b.band_idx AND a.band_key = b.band_key
             WHERE a.doc_id < b.doc_id),
    mh_pairs AS (SELECT c.doc_a, c.doc_b,
                        ROUND(len(list_intersect(x.sh, y.sh))
                              / CAST(len(list_distinct(x.sh || y.sh)) AS DOUBLE), 6)
                          AS jaccard
                 FROM cand c
                 JOIN sh x ON c.doc_a = x.doc_id
                 JOIN sh y ON c.doc_b = y.doc_id)
    """


@query(
    "minhash_lsh_pairs",
    f"WITH {_minhash_pairs_ctes()} SELECT doc_a, doc_b, jaccard FROM mh_pairs",
)
def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs with exact Jaccard — the oracle
    replicates signature, banding and verification exactly (md5-string
    minhash is engine-portable), INCLUDING the scale guards: exact
    duplicates collapse to a min-id representative before signatures,
    and band buckets over MINHASH_BUCKET_CAP members are dropped."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_candidates(
        docs, bucket_cap=MINHASH_BUCKET_CAP, pre_exact_dedup=True
    )


# ---------------------------------------------------------------------------
# Incremental dedup: new batch vs a PERSISTED signature index. The
# 100 TB shape — the corpus is signed once (parquet index); each new
# batch is signed map-only and probed against the postings, never
# re-shingling old documents. Oracle = the full-corpus LSH pair set
# (no pre-dedup, union-bucket cap) restricted to pairs touching the
# batch — the literal statement of incremental == batch equivalence.
# ---------------------------------------------------------------------------
NEW_BATCH_PCT = 10  # doc_id hash bucket < 10 → the "new" slice


def _run_scoped_index_dir(kind: str) -> str:
    """A fresh, run-private directory for a persisted-index query.
    Unique per CALL (mkdtemp), so two concurrent drivers / parallel
    test sessions on one machine can never race overwrite-vs-read on
    the same index files. A real pipeline passes its own long-lived,
    run-owned index path instead; these queries re-BUILD the index
    inside the timed query precisely to measure that write+probe
    round-trip."""
    import tempfile

    return tempfile.mkdtemp(prefix=f"hubsit_{kind}_")


def _incremental_dedup_oracle() -> str:
    sig_cols = ", ".join(
        f"list_min(list_transform(h32, h -> ({a} * h + {b}) % {MINHASH_PRIME})) AS mh_{j}"
        for j, (a, b) in enumerate(MINHASH_AB[:N_MINHASH])
    )

    def band_key(b: int) -> str:
        expr = f"mh_{b * BAND_ROWS}"
        for r in range(1, BAND_ROWS):
            expr = f"({expr} * {BAND_MIX} + mh_{b * BAND_ROWS + r})"
        return expr

    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, is_new, {b} AS band_idx, {band_key(b)} AS band_key FROM sig"
        for b in range(N_BANDS)
    )
    from .operators.sampling import sql_hash_bucket

    return f"""
    WITH sh0 AS (SELECT doc_id, {_sql_shingles()} AS sh,
                        ({sql_hash_bucket("doc_id")} < {NEW_BATCH_PCT}) AS is_new
                 FROM documents),
    h32 AS (SELECT doc_id, is_new, sh,
                   list_transform(sh, s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)) AS h32
            FROM sh0),
    sig AS (SELECT doc_id, is_new, {sig_cols} FROM h32),
    bands AS ({band_selects}),
    bucket_ok AS (SELECT band_idx, band_key FROM bands
                  GROUP BY band_idx, band_key
                  HAVING COUNT(*) > 1 AND COUNT(*) <= {MINHASH_BUCKET_CAP}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a
             JOIN bucket_ok o
               ON a.band_idx = o.band_idx AND a.band_key = o.band_key
             JOIN bands b
               ON a.band_idx = b.band_idx AND a.band_key = b.band_key
             WHERE a.doc_id < b.doc_id AND (a.is_new OR b.is_new)),
    h60 AS (SELECT doc_id,
                   list_transform(sh, s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)) AS hs
            FROM sh0)
    SELECT c.doc_a, c.doc_b,
           ROUND(len(list_intersect(x.hs, y.hs))
                 / CAST(len(list_distinct(x.hs || y.hs)) AS DOUBLE), 6) AS jaccard
    FROM cand c
    JOIN h60 x ON c.doc_a = x.doc_id
    JOIN h60 y ON c.doc_b = y.doc_id
    """


@query("dedup_new_batch", _incremental_dedup_oracle())
def q_dedup_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup end-to-end: sign the 90% "corpus" slice, WRITE
    the signature index to parquet, read it back, and dedup the 10%
    "new batch" against it — old documents are never re-shingled. The
    oracle computes the full-corpus pair set restricted to the batch,
    so the hash match proves incremental == full recompute."""
    import os

    from .operators.dedup import (
        incremental_minhash_candidates,
        minhash_signature_index,
    )
    from .operators.sampling import hash_bucket
    from .sources.sinks import write_parquet

    docs = load_table(spark, sf_dir, "documents")
    is_new = hash_bucket("doc_id") < NEW_BATCH_PCT
    corpus, batch = docs.filter(~is_new), docs.filter(is_new)

    base = _run_scoped_index_dir("sig_index")
    bands, shingles = minhash_signature_index(corpus)
    write_parquet(bands, os.path.join(base, "bands"))
    write_parquet(shingles, os.path.join(base, "shingles"))
    index_bands = spark.read.parquet(os.path.join(base, "bands"))
    index_shingles = spark.read.parquet(os.path.join(base, "shingles"))
    return incremental_minhash_candidates(
        batch, index_bands, index_shingles, bucket_cap=MINHASH_BUCKET_CAP
    )


# ---------------------------------------------------------------------------
# Incremental EXACT dedup: the highest-volume ingest operation — a new
# batch assigned to exact-duplicate representatives against a
# persisted fingerprint index; the corpus is never re-fingerprinted.
# ---------------------------------------------------------------------------
def _exact_incremental_oracle() -> str:
    from .operators.sampling import sql_hash_bucket

    return f"""
    WITH fp AS (SELECT doc_id,
                       md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS fp,
                       ({sql_hash_bucket("doc_id")} < {NEW_BATCH_PCT}) AS is_new
                FROM documents),
    rep AS (SELECT fp, MIN(doc_id) AS rep FROM fp GROUP BY fp)
    SELECT p.doc_id,
           r.rep::BIGINT AS rep_id,
           (p.doc_id = r.rep)::BIGINT AS is_keeper
    FROM fp p JOIN rep r USING (fp)
    WHERE p.is_new
    """


@query("exact_dedup_new_batch", _exact_incremental_oracle())
def q_exact_dedup_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup end-to-end: fingerprint the 90% corpus
    slice ONCE into a parquet index, read it back, and assign the 10%
    batch to representatives — one map-only fingerprint pass over the
    batch plus one equi-join. The oracle is the full-corpus min-id
    assignment restricted to the batch, so the hash match proves
    incremental == full recompute."""
    import os

    from .operators.dedup import (
        exact_fingerprint_index,
        incremental_exact_dedup,
    )
    from .operators.sampling import hash_bucket
    from .sources.sinks import write_parquet

    docs = load_table(spark, sf_dir, "documents")
    is_new = hash_bucket("doc_id") < NEW_BATCH_PCT
    corpus, batch = docs.filter(~is_new), docs.filter(is_new)
    base = _run_scoped_index_dir("fp_index")
    write_parquet(exact_fingerprint_index(corpus), os.path.join(base, "fp"))
    index = spark.read.parquet(os.path.join(base, "fp"))
    return incremental_exact_dedup(batch, index)


# ---------------------------------------------------------------------------
# Benchmark decontamination: corpus docs sharing k-token grams with a
# held-out eval slice. The hash split stands in for a real benchmark
# table; the operator takes any (doc_id, text) benchmark DataFrame.
# ---------------------------------------------------------------------------
DECON_K, DECON_EVAL_PCT, DECON_DF_CAP = 4, 5, 50


def _decon_ctes() -> str:
    """CTE chain replicating the n-gram decontamination probe — ends
    with ``dhits(doc_id, g, eval_id)``; CTE names are prefixed (dsplit,
    dkeep, …) so the chain composes into the curation-pipeline oracle
    without colliding with the quality / MinHash chains."""
    from .operators.sampling import sql_hash_bucket

    return f"""
    dsplit AS (SELECT doc_id, text,
                      ({sql_hash_bucket("doc_id", salt="eval")} < {DECON_EVAL_PCT})
                        AS is_eval
               FROM documents),
    cg AS (SELECT doc_id,
                  unnest(list_transform({_sql_shingles("text", DECON_K)},
                                        s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)))
                    AS g
           FROM dsplit WHERE NOT is_eval),
    dkeep AS (SELECT g FROM cg GROUP BY g HAVING COUNT(*) <= {DECON_DF_CAP}),
    cg2 AS (SELECT cg.doc_id, cg.g FROM cg JOIN dkeep USING (g)),
    bg AS (SELECT doc_id AS eval_id,
                  unnest(list_transform({_sql_shingles("text", DECON_K)},
                                        s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)))
                    AS g
           FROM dsplit WHERE is_eval),
    dhits AS (SELECT cg2.doc_id, cg2.g, bg.eval_id FROM cg2 JOIN bg ON cg2.g = bg.g)
    """


def _decontamination_oracle() -> str:
    return f"""
    WITH {_decon_ctes()}
    SELECT doc_id,
           COUNT(DISTINCT g)::BIGINT AS n_shared_grams,
           COUNT(DISTINCT eval_id)::BIGINT AS n_eval_docs_hit
    FROM dhits GROUP BY doc_id
    """


@query("benchmark_decontamination", _decontamination_oracle())
def q_benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination report: corpus docs sharing ≥1 4-token gram
    with the 5% held-out "benchmark" slice (df-capped against
    boilerplate grams). Gram extraction is map-only on both sides; the
    small benchmark gram set broadcasts, so the corpus discovers hits
    without shuffling — only the hit set aggregates."""
    from .operators.sampling import hash_bucket
    from .operators.textanalysis import contamination_report

    docs = load_table(spark, sf_dir, "documents")
    is_eval = hash_bucket("doc_id", salt="eval") < DECON_EVAL_PCT
    corpus, benchmark = docs.filter(~is_eval), docs.filter(is_eval)
    return contamination_report(
        corpus, benchmark, k=DECON_K, df_cap=DECON_DF_CAP
    )


@query(
    "ngram_jaccard_pairs",
    f"""
    WITH sh AS (SELECT doc_id,
                       list_transform({_sql_shingles()},
                                      s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)) AS sh
                FROM documents),
    inv AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM sh),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb,
                     COUNT(*) AS n_inter
              FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id, a.n, b.n)
    SELECT doc_a, doc_b,
           ROUND(n_inter / CAST(na + nb - n_inter AS DOUBLE), 6) AS jaccard
    FROM inter
    WHERE ROUND(n_inter / CAST(na + nb - n_inter AS DOUBLE), 6) >= {JACCARD_THRESHOLD}
    """,
)
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exhaustive exact n-gram Jaccard ≥ 0.3 via shared-shingle
    inverted index — ground truth for the LSH path."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, JACCARD_THRESHOLD)


# ---------------------------------------------------------------------------
# Asymmetric containment: the near-dup relation Jaccard misses. A doc
# quoted or embedded inside a much larger one has Jaccard ~ 0 but
# containment ~ 1 — the wrapper-page / quote-inclusion case curation
# hunts. Directed pairs from ONE undirected intersection pass;
# containment in exact integer micro-units (small-denominator
# rationals land ON 6dp round-half boundaries, e.g. 1/640).
# ---------------------------------------------------------------------------
CONTAINMENT_THRESHOLD_U6 = 600_000


@query(
    "ngram_containment_pairs",
    f"""
    WITH sh AS (SELECT doc_id,
                       list_transform({_sql_shingles()},
                                      s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)) AS sh
                FROM documents),
    inv AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM sh),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb,
                     COUNT(*)::BIGINT AS n_inter
              FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id, a.n, b.n),
    d AS (SELECT doc_a AS src_id, doc_b AS dst_id, na AS n_src, n_inter FROM inter
          UNION ALL
          SELECT doc_b AS src_id, doc_a AS dst_id, nb AS n_src, n_inter FROM inter)
    SELECT src_id, dst_id, n_inter,
           (n_inter * 1000000 // n_src)::BIGINT AS containment_u6
    FROM d
    WHERE n_inter * 1000000 // n_src >= {CONTAINMENT_THRESHOLD_U6}
    """,
)
def q_ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/dedup.py::ngram_containment_pairs at threshold 0.6 —
    directed (src_id, dst_id, n_inter, containment_u6) where ≥60% of
    src's distinct shingles appear in dst. Same inverted-index /
    df-cap scale machinery as the exact-Jaccard path (one shared
    intersection pass scores both directions); oracle rebuilds the
    index and both directions from scratch."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_containment_pairs(docs, CONTAINMENT_THRESHOLD_U6)


# ---------------------------------------------------------------------------
# Containment at INGEST: the dedup-before-accept question ("is this
# incoming doc already inside something we hold?") answered against
# the PERSISTED shingle index — the batch is shingled map-only, the
# corpus is never re-read. Shares the 90%-corpus index fixture with
# the incremental-cluster queries (PREPARES); oracle = full recompute
# restricted to (batch → corpus) pairs, so the hash match proves
# incremental == from-scratch.
# ---------------------------------------------------------------------------
def _containment_new_batch_oracle() -> str:
    from .operators.sampling import sql_hash_bucket

    return f"""
    WITH sh AS (SELECT doc_id,
                       {sql_hash_bucket("doc_id")} < {NEW_BATCH_PCT} AS is_new,
                       list_transform({_sql_shingles()},
                                      s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)) AS sh
                FROM documents),
    b AS (SELECT doc_id, len(sh) AS n_new, unnest(sh) AS s FROM sh WHERE is_new),
    c AS (SELECT doc_id AS contained_in, unnest(sh) AS s FROM sh WHERE NOT is_new),
    inter AS (SELECT b.doc_id, c.contained_in, b.n_new, COUNT(*)::BIGINT AS n_inter
              FROM b JOIN c USING (s)
              GROUP BY b.doc_id, c.contained_in, b.n_new)
    SELECT doc_id, contained_in, n_inter,
           (n_inter * 1000000 // n_new)::BIGINT AS containment_u6
    FROM inter
    WHERE n_inter * 1000000 // n_new >= {CONTAINMENT_THRESHOLD_U6}
    """


@query("containment_new_batch", _containment_new_batch_oracle())
def q_containment_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/dedup.py::incremental_containment over the persisted
    90%-corpus shingle index (shared PREPARES fixture): each new-batch
    doc reporting every corpus doc that already contains ≥60% of its
    shingles. No LSH pre-filter BY DESIGN (banding keys on Jaccard,
    blind to the embedded-doc case); the scale lever is the exploded,
    hash-bucketed postings layout. Oracle shingles both sides from
    scratch — incremental == full recompute, hash-proved."""
    from .operators.dedup import incremental_containment
    from .operators.sampling import hash_bucket

    paths = _prepare_cluster_merge_index(spark, sf_dir)
    shingles = spark.read.parquet(paths["shingles"])
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(hash_bucket("doc_id") < NEW_BATCH_PCT)
    return incremental_containment(batch, shingles, CONTAINMENT_THRESHOLD_U6)


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer et al., SIGMOD 2003): rolling
# window of k-gram hashes, min per window. K=4-token grams, W=8
# windows — shared runs of ≥ 11 tokens always collide.
# ---------------------------------------------------------------------------
K_WINNOW, W_WINNOW = 4, 8
WINNOW_MIN_SHARED, WINNOW_DF_CAP = 2, 50


def _sql_winnow_fps() -> str:
    """DuckDB twin of operators.textanalysis.winnowed_fingerprints:
    (doc_id, fps list<bigint>)."""
    toks = "string_split(lower(text), ' ')"
    grams = (
        f"list_transform(range(1, greatest(len({toks}) - {K_WINNOW - 1}, 1) + 1), "
        f"i -> array_to_string(({toks})[i:i+{K_WINNOW - 1}], ' '))"
    )
    return f"""
    SELECT doc_id,
           list_sort(list_distinct(list_transform(
               range(1, greatest(len(hs) - {W_WINNOW - 1}, 1) + 1),
               i -> list_min(hs[i:i+{W_WINNOW - 1}])))) AS fps
    FROM (SELECT doc_id,
                 list_transform({grams},
                                g -> CAST('0x' || substr(md5(g), 1, 8) AS BIGINT)) AS hs
          FROM documents)
    """


@query(
    "winnow_fingerprints",
    f"WITH fp AS ({_sql_winnow_fps()}) SELECT doc_id, unnest(fps) AS fp FROM fp",
)
def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every selected (doc, fingerprint) pair — the full winnowed
    fingerprint relation, hash-checked value by value."""
    from .operators.textanalysis import winnowed_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    fps = winnowed_fingerprints(_spread(docs), k=K_WINNOW, w=W_WINNOW)
    return fps.select("doc_id", F.explode("fingerprints").alias("fp"))


@query(
    "winnow_candidate_pairs",
    f"""
    WITH fp AS ({_sql_winnow_fps()}),
    inv AS (SELECT doc_id, unnest(fps) AS fp FROM fp),
    keep AS (SELECT fp FROM inv GROUP BY fp HAVING COUNT(*) <= {WINNOW_DF_CAP}),
    inv2 AS (SELECT inv.doc_id, inv.fp FROM inv JOIN keep USING (fp))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*)::BIGINT AS n_shared
    FROM inv2 a JOIN inv2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= {WINNOW_MIN_SHARED}
    """,
)
def q_winnow_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidates = docs sharing ≥ {min_shared} winnowed
    fingerprints (inverted index on the integer fp key, document-
    frequency cap against boilerplate-gram hot keys)."""
    from .operators.textanalysis import winnow_candidate_pairs

    docs = load_table(spark, sf_dir, "documents")
    return winnow_candidate_pairs(
        _spread(docs),
        k=K_WINNOW,
        w=W_WINNOW,
        min_shared=WINNOW_MIN_SHARED,
        df_cap=WINNOW_DF_CAP,
    )


# ---------------------------------------------------------------------------
# Substring-level exact dedup (Lee et al. 2022): repeated SPANS, not
# repeated documents. The decision table substring dedup consumes is
# per-document token ranges whose k-gram content also exists in some
# OTHER document — boilerplate headers/footers/licenses shared by
# thousands of otherwise-unique pages, invisible to every document-
# granularity query (exact_dedup, MinHash, containment). Nothing
# pairwise anywhere: gram document-frequency is ONE mergeable count
# (the persistable index at 100 TB), and runs collapse per document.
# ---------------------------------------------------------------------------
SPAN_GRAM = 8  # tokens per gram; a span is >= SPAN_GRAM shared tokens


@query(
    "duplicate_text_spans",
    f"""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
               FROM documents),
    g AS (SELECT doc_id, i AS pos,
                 md5(array_to_string(toks[i : i + {SPAN_GRAM - 1}], ' ')) AS gh
          FROM t, LATERAL (
            SELECT unnest(range(1, greatest(len(toks) - {SPAN_GRAM - 2}, 1))) AS i
          ) u),
    df AS (SELECT gh FROM (SELECT DISTINCT gh, doc_id FROM g)
           GROUP BY gh HAVING COUNT(*) >= 2),
    shared AS (SELECT g.doc_id, g.pos FROM g JOIN df USING (gh)),
    runs AS (SELECT doc_id, pos,
                    pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                                             ORDER BY pos) AS island
             FROM shared)
    SELECT doc_id,
           MIN(pos)::BIGINT AS span_start,
           (MAX(pos) - MIN(pos) + {SPAN_GRAM})::BIGINT AS span_tokens,
           COUNT(*)::BIGINT AS n_grams
    FROM runs GROUP BY doc_id, island
    """,
)
def q_duplicate_text_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document maximal runs of {SPAN_GRAM}-token grams shared
    with at least one other document
    (operators/textanalysis.py::duplicate_span_report — see its
    docstring for the three-stage, never-pairwise plan). Crafted
    boilerplate-injection semantics pinned in
    tests/test_ext_operators.py."""
    from .operators.textanalysis import duplicate_span_report

    docs = _spread(load_table(spark, sf_dir, "documents"))
    return duplicate_span_report(docs, k=SPAN_GRAM)


@query(
    "scrub_duplicate_spans",
    f"""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
               FROM documents),
    g AS (SELECT doc_id, i AS pos,
                 md5(array_to_string(toks[i : i + {SPAN_GRAM - 1}], ' ')) AS gh
          FROM t, LATERAL (
            SELECT unnest(range(1, greatest(len(toks) - {SPAN_GRAM - 2}, 1))) AS i
          ) u),
    own AS (SELECT gh, MIN(doc_id) AS owner
            FROM (SELECT DISTINCT gh, doc_id FROM g)
            GROUP BY gh HAVING COUNT(*) >= 2),
    cut AS (SELECT g.doc_id, g.pos FROM g JOIN own USING (gh)
            WHERE g.doc_id <> own.owner),
    cov AS (SELECT DISTINCT doc_id, pos + o.off AS tp
            FROM cut, LATERAL (
              SELECT unnest(range(0, {SPAN_GRAM})) AS off) o),
    tok AS (SELECT doc_id, i AS tp, toks[i] AS tok
            FROM t, LATERAL (
              SELECT unnest(range(1, len(toks) + 1)) AS i) u),
    kept AS (SELECT tok.doc_id,
                    string_agg(tok.tok, ' ' ORDER BY tok.tp) AS scrubbed_text,
                    COUNT(*) AS n_kept
             FROM tok LEFT JOIN cov
               ON tok.doc_id = cov.doc_id AND tok.tp = cov.tp
             WHERE cov.tp IS NULL GROUP BY tok.doc_id)
    SELECT t.doc_id,
           COALESCE(k.scrubbed_text, '') AS scrubbed_text,
           COALESCE(k.n_kept, 0)::BIGINT AS n_tokens_kept,
           (len(t.toks) - COALESCE(k.n_kept, 0))::BIGINT AS n_tokens_removed
    FROM t LEFT JOIN kept k USING (doc_id)
    """,
)
def q_scrub_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The substring-dedup REWRITE — duplicate_text_spans' decision
    table APPLIED (operators/textanalysis.py::scrub_duplicate_spans):
    every cross-document duplicated token range is cut from all but
    its canonical owner document (min doc_id per gram), producing the
    deduplicated corpus text — the actual Lee et al. 2022 deliverable.
    The oracle composes the span query's own gram/df CTE chain with
    the owner rule and a position anti-join token rebuild, so the
    hash match checks detection AND rewrite end-to-end."""
    from .operators.textanalysis import scrub_duplicate_spans

    docs = _spread(load_table(spark, sf_dir, "documents"))
    return scrub_duplicate_spans(docs, k=SPAN_GRAM)


# ---------------------------------------------------------------------------
# Incremental substring dedup: the (gh, df) gram table IS the
# persistable index duplicate_text_spans' docstring promises — gram
# document-frequency is a MERGEABLE count over disjoint doc slices
# (the vocab_new_batch posture), so a new ingest grams ONLY its batch,
# adds its partial counts to the persisted index, and reports spans
# for batch docs alone. The corpus is never re-grammed. Oracle = the
# full-recompute span SQL restricted to batch docs — the literal
# statement of incremental == from-scratch.
# ---------------------------------------------------------------------------
def _span_batch_oracle() -> str:
    from .operators.sampling import sql_hash_bucket

    return f"""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
               FROM documents),
    g AS (SELECT doc_id, i AS pos,
                 md5(array_to_string(toks[i : i + {SPAN_GRAM - 1}], ' ')) AS gh
          FROM t, LATERAL (
            SELECT unnest(range(1, greatest(len(toks) - {SPAN_GRAM - 2}, 1))) AS i
          ) u),
    df AS (SELECT gh FROM (SELECT DISTINCT gh, doc_id FROM g)
           GROUP BY gh HAVING COUNT(*) >= 2),
    shared AS (SELECT g.doc_id, g.pos FROM g JOIN df USING (gh)
               WHERE {sql_hash_bucket("g.doc_id")} < {NEW_BATCH_PCT}),
    runs AS (SELECT doc_id, pos,
                    pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                                             ORDER BY pos) AS island
             FROM shared)
    SELECT doc_id,
           MIN(pos)::BIGINT AS span_start,
           (MAX(pos) - MIN(pos) + {SPAN_GRAM})::BIGINT AS span_tokens,
           COUNT(*)::BIGINT AS n_grams
    FROM runs GROUP BY doc_id, island
    """


@query("spans_new_batch", _span_batch_oracle())
def q_spans_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-span dedup at INGEST: the corpus (90%) gram
    document-frequency table is written as a parquet index
    (gram_document_frequency — ALL grams kept, df >= 1, because a
    batch's second occurrence is what promotes a df=1 gram to shared),
    read back, and merged with the batch's partial counts by one
    sum-groupBy on the 16-byte gram hash — disjoint doc slices make
    df ADDITIVE, so merged df == full-corpus df exactly. Batch grams
    (map-only, batch-sized) join the merged df >= 2 keys and collapse
    to runs. The corpus text is scanned once to BUILD the index and
    never re-grammed afterwards (plan-pinned); a real pipeline owns
    the index across ingests and pays only the probe+merge."""
    import os

    from .operators.sampling import hash_bucket
    from .operators.textanalysis import (
        _doc_grams,
        gram_document_frequency,
        spans_from_shared,
    )
    from .sources.sinks import write_parquet

    docs = load_table(spark, sf_dir, "documents")
    is_new = hash_bucket("doc_id") < NEW_BATCH_PCT
    corpus, batch = docs.filter(~is_new), docs.filter(is_new)

    base = _run_scoped_index_dir("span_gram")
    idx_path = os.path.join(base, "gram_df_index")
    write_parquet(
        gram_document_frequency(_doc_grams(_spread(corpus), SPAN_GRAM)),
        idx_path,
    )
    idx = spark.read.parquet(idx_path)

    batch_grams = _doc_grams(batch, SPAN_GRAM)
    merged = (
        idx.unionByName(gram_document_frequency(batch_grams))
        .groupBy("gh")
        .agg(F.sum("df").alias("df"))
        .filter(F.col("df") >= 2)
        .select("gh")
    )
    return spans_from_shared(batch_grams.join(merged, "gh"), SPAN_GRAM)


def _scrub_batch_oracle() -> str:
    from .operators.sampling import sql_hash_bucket

    return f"""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
               FROM documents),
    g AS (SELECT doc_id, i AS pos,
                 md5(array_to_string(toks[i : i + {SPAN_GRAM - 1}], ' ')) AS gh
          FROM t, LATERAL (
            SELECT unnest(range(1, greatest(len(toks) - {SPAN_GRAM - 2}, 1))) AS i
          ) u),
    own AS (SELECT gh, MIN(doc_id) AS owner
            FROM (SELECT DISTINCT gh, doc_id FROM g)
            GROUP BY gh HAVING COUNT(*) >= 2),
    cut AS (SELECT g.doc_id, g.pos FROM g JOIN own USING (gh)
            WHERE g.doc_id <> own.owner),
    cov AS (SELECT DISTINCT doc_id, pos + o.off AS tp
            FROM cut, LATERAL (
              SELECT unnest(range(0, {SPAN_GRAM})) AS off) o),
    tok AS (SELECT doc_id, i AS tp, toks[i] AS tok
            FROM t, LATERAL (
              SELECT unnest(range(1, len(toks) + 1)) AS i) u),
    kept AS (SELECT tok.doc_id,
                    string_agg(tok.tok, ' ' ORDER BY tok.tp) AS scrubbed_text,
                    COUNT(*) AS n_kept
             FROM tok LEFT JOIN cov
               ON tok.doc_id = cov.doc_id AND tok.tp = cov.tp
             WHERE cov.tp IS NULL GROUP BY tok.doc_id)
    SELECT t.doc_id,
           COALESCE(k.scrubbed_text, '') AS scrubbed_text,
           COALESCE(k.n_kept, 0)::BIGINT AS n_tokens_kept,
           (len(t.toks) - COALESCE(k.n_kept, 0))::BIGINT AS n_tokens_removed
    FROM t LEFT JOIN kept k USING (doc_id)
    WHERE {sql_hash_bucket("t.doc_id")} < {NEW_BATCH_PCT}
    """


@query("scrub_new_batch", _scrub_batch_oracle())
def q_scrub_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring SCRUB at INGEST — the rewrite twin of spans_new_batch:
    the corpus (90%) persists its (gh, df, owner) gram-ownership index
    (gram_ownership_index — df and owner are both mergeable: counts
    add, owners min); a new batch grams ONLY itself, left-joins its
    partial index against the persisted one, and folds them with
    df_total = df_batch + df_corpus, owner_total = least(owners) —
    exactly the full-corpus values, because the doc slices are
    disjoint. Batch gram occurrences with df_total >= 2 and a
    different owner are cut and the batch text rebuilt map-side
    (shared apply_cut_positions tail). The corpus is never re-grammed
    or rewritten — ingest-time scrub touches incoming docs only, and
    the global min-doc_id owner rule makes that EXACTLY the full
    recompute restricted to the batch (a batch doc that is the global
    owner keeps its text; the oracle says so cryptographically)."""
    import os

    from .operators.sampling import hash_bucket
    from .operators.textanalysis import (
        _doc_grams,
        apply_cut_positions,
        gram_ownership_index,
    )
    from .sources.sinks import write_parquet

    docs = load_table(spark, sf_dir, "documents")
    is_new = hash_bucket("doc_id") < NEW_BATCH_PCT
    corpus, batch = docs.filter(~is_new), docs.filter(is_new)

    base = _run_scoped_index_dir("scrub_gram")
    idx_path = os.path.join(base, "gram_owner_index")
    write_parquet(
        gram_ownership_index(_doc_grams(_spread(corpus), SPAN_GRAM)),
        idx_path,
    )
    idx = spark.read.parquet(idx_path).withColumnsRenamed(
        {"df": "df_c", "owner": "owner_c"}
    )

    bg = _doc_grams(batch, SPAN_GRAM)
    merged = (
        gram_ownership_index(bg)
        .join(idx, "gh", "left")
        .select(
            "gh",
            (F.col("df") + F.coalesce(F.col("df_c"), F.lit(0))).alias(
                "df_tot"
            ),
            F.least(
                F.col("owner"), F.coalesce(F.col("owner_c"), F.col("owner"))
            ).alias("owner_tot"),
        )
        .filter(F.col("df_tot") >= 2)
        .select("gh", "owner_tot")
    )
    cut = bg.join(merged, "gh").filter(
        F.col("doc_id") != F.col("owner_tot")
    )
    return apply_cut_positions(batch, cut, SPAN_GRAM)


def _simhash_ctes(src: str = "documents") -> str:
    """CTE chain ``toks → bits → sim(doc_id, simhash)`` replicating
    ``simhash32`` nibble-for-nibble over table/CTE ``src``."""
    sums = []
    for b in range(32):
        nib, off = divmod(b, 4)
        nib_expr = f"(instr('0123456789abcdef', substr(md5(t), {nib + 1}, 1)) - 1)"
        bit = f"((({nib_expr}) // {1 << off}) % 2)"
        sums.append(f"SUM(2 * {bit} - 1) AS s_{b}")
    recompose = " + ".join(f"(CASE WHEN s_{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(32))
    return f"""
    toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM {src}),
    bits AS (SELECT doc_id, {", ".join(sums)} FROM toks GROUP BY doc_id),
    sim AS (SELECT doc_id, CAST({recompose} AS BIGINT) AS simhash FROM bits)
    """


def _simhash_oracle() -> str:
    return f"""
    WITH {_simhash_ctes()}
    SELECT doc_id, simhash FROM sim
    """


@query("simhash_docs", _simhash_oracle())
def q_simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document from md5-nibble token hashes —
    near-dup fingerprint whose Hamming neighbors are dedup candidates.
    _spread fans the single-row-group local fixture across cores before
    the per-token hash work (no-op cost at real scale, where the
    source arrives in many splits)."""

    docs = load_table(spark, sf_dir, "documents")
    return _spread(docs).select("doc_id", simhash32("text").alias("simhash"))


def _simhash_pairs_oracle() -> str:
    bands = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band_idx, (simhash >> {8 * b}) & 255 AS band_key FROM sim"
        for b in range(SIMHASH_BANDS)
    )
    return f"""
    WITH rep AS (SELECT MIN(doc_id) AS doc_id, arg_min(text, doc_id) AS text
                 FROM documents
                 GROUP BY md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g'))),
    {_simhash_ctes("rep")},
    bands AS ({bands}),
    bucket_ok AS (SELECT band_idx, band_key FROM bands
                  GROUP BY band_idx, band_key
                  HAVING COUNT(*) > 1 AND COUNT(*) <= {SIMHASH_BUCKET_CAP}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    a.simhash AS sa, b.simhash AS sb
             FROM bands a
             JOIN bucket_ok o
               ON a.band_idx = o.band_idx AND a.band_key = o.band_key
             JOIN bands b
               ON a.band_idx = b.band_idx AND a.band_key = b.band_key
             WHERE a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= {SIMHASH_HAMMING_MAX}
    """


@query("simhash_candidate_pairs", _simhash_pairs_oracle())
def q_simhash_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-≤3 near-dup pairs: 4×8-bit band buckets →
    in-bucket pair expansion → popcount-of-XOR verification. Banding
    is pigeonhole-lossless at radius 3; the oracle replicates band
    keys, bucket cap and XOR popcount exactly, so the hash check
    covers the whole retrieval path, not just the fingerprints."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_candidate_pairs(docs)


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------
_COS_SQL = (
    "list_dot_product(q.qv, e.v) / "
    "(sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v)))"
)


@query(
    "ann_bruteforce_topk",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {ANN_QUERY_LIMIT}),
    p AS (SELECT q.query_id, e.vec_id AS neighbor_id, ROUND({_COS_SQL}, 9) AS cosine
          FROM q JOIN e ON e.vec_id <> q.query_id),
    r AS (SELECT query_id, neighbor_id, cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id) AS rank
          FROM p)
    SELECT query_id, neighbor_id, ROUND(cosine, 6) AS cosine, rank
    FROM r WHERE rank <= {ANN_K}
    """,
)
def q_ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = brute_force_topk(emb, emb.filter(F.col("vec_id") < ANN_QUERY_LIMIT), ANN_K)
    return out.withColumn("rank", F.col("rank").cast("bigint"))


@query(
    "ann_lsh_topk",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                      {sql_lsh_bucket("embedding")} AS bucket
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM e WHERE vec_id < {ANN_QUERY_LIMIT}),
    p AS (SELECT q.query_id, q.bucket, e.vec_id AS neighbor_id, ROUND({_COS_SQL}, 9) AS cosine
          FROM q JOIN e ON e.bucket = q.bucket AND e.vec_id <> q.query_id),
    r AS (SELECT query_id, bucket, neighbor_id, cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id) AS rank
          FROM p)
    SELECT query_id, bucket, neighbor_id, ROUND(cosine, 6) AS cosine, rank
    FROM r WHERE rank <= {ANN_K}
    """,
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN: literal seeded hyperplanes shared with
    the oracle; search space = same-bucket vectors only (≈ N/16)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = lsh_bucket_topk(emb, ANN_K, query_filter=F.col("vec_id") < ANN_QUERY_LIMIT)
    return out.withColumn("rank", F.col("rank").cast("bigint"))


@query(
    "embedding_lsh_buckets",
    f"""
    SELECT {sql_lsh_bucket("embedding")} AS bucket,
           COUNT(*)::BIGINT AS n_vecs,
           MIN(vec_id)::BIGINT AS min_vec_id
    FROM embeddings GROUP BY bucket
    """,
)
def q_embedding_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import lsh_bucket_expr

    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(lsh_bucket_expr("embedding").alias("bucket"), "vec_id")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vecs"), F.min("vec_id").alias("min_vec_id"))
    )


# ---------------------------------------------------------------------------
# Embedding int8 quantization: the STORAGE lever for 100 TB vector
# corpora — 4x smaller than float32 (64 dims: 256 B -> 64 B + 2
# floats), reconstruction error bounded by scale/2 per dim. Per-vector
# min/max affine quantization, all Catalyst array expressions
# (map-only); the oracle replicates the arithmetic bit-for-bit.
# ---------------------------------------------------------------------------
@query(
    "embedding_quantize",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    mm AS (SELECT vec_id, v, list_min(v) AS mn,
                  (list_max(v) - list_min(v)) / 255.0 AS scale
           FROM e),
    q AS (SELECT vec_id, mn, scale,
                 list_transform(v, x -> CAST(round((x - mn) / scale) AS BIGINT))
                   AS q8
          FROM mm)
    SELECT vec_id,
           ROUND(mn, 6) AS mn,
           ROUND(scale, 9) AS scale,
           md5(array_to_string(q8, ',')) AS q8_sig,
           list_min(q8)::BIGINT AS q_min,
           list_max(q8)::BIGINT AS q_max
    FROM q
    """,
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector affine int8 quantization (codes 0..255): stores mn +
    scale + one byte per dim. Map-only; the md5 signature of the code
    array proves the exact codes match DuckDB (same IEEE double
    arithmetic on both engines), and q_min/q_max pin the code range.
    Dequantize is mn + q*scale with max error scale/2 per dim."""
    from .operators.dedup import _spread

    emb = load_table(spark, sf_dir, "embeddings")
    v = "cast(embedding as array<double>)"
    mm = _spread(emb).select(
        "vec_id",
        F.expr(f"{v}").alias("v"),
        F.expr(f"array_min({v})").alias("mn"),
        F.expr(f"(array_max({v}) - array_min({v})) / 255.0d").alias("scale"),
    )
    q = mm.select(
        "vec_id",
        "mn",
        "scale",
        F.expr("transform(v, x -> cast(round((x - mn) / scale) as bigint))").alias("q8"),
    )
    return q.select(
        "vec_id",
        F.round("mn", 6).alias("mn"),
        F.round("scale", 9).alias("scale"),
        F.md5(F.concat_ws(",", F.col("q8").cast("array<string>"))).alias("q8_sig"),
        F.expr("array_min(q8)").alias("q_min"),
        F.expr("array_max(q8)").alias("q_max"),
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing (mapInPandas). The runtime path is Arrow-batched
# Python, but the STUB kernel is sha256 + byte length of a UTF-8
# payload — fully expressible in DuckDB, so even the mapInPandas
# plumbing is hash-checked end-to-end (a real image decoder would
# drop back to a rows-only check).
# ---------------------------------------------------------------------------
@query(
    "media_features",
    """
    SELECT doc_id AS media_id,
           (['image', 'audio', 'video'])[(doc_id % 3)::INT + 1] AS kind,
           octet_length(encode(text))::BIGINT AS n_bytes,
           sha256(text) AS payload_sha,
           CAST('0x' || substr(sha256(text), 1, 8) AS BIGINT) AS feat_0,
           CAST('0x' || substr(sha256(text), 9, 8) AS BIGINT) AS feat_1
    FROM documents
    """,
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(documents_as_media(docs))


@query(
    "image_resize_dims",
    """
    WITH img AS (SELECT doc_id AS media_id, text FROM documents
                 WHERE doc_id % 3 = 0),
    src AS (SELECT media_id, text,
                   64 + (CAST('0x' || substr(sha256(text), 1, 2) AS INT) % 192) AS w0,
                   64 + (CAST('0x' || substr(sha256(text), 3, 2) AS INT) % 192) AS h0
            FROM img)
    SELECT media_id,
           FLOOR(w0 * (224.0 / greatest(w0, h0)) + 0.5)::INT AS width,
           FLOOR(h0 * (224.0 / greatest(w0, h0)) + 0.5)::INT AS height,
           (32 + least(octet_length(encode(text)), 64))::BIGINT AS n_bytes
    FROM src
    """,
)
def q_image_resize_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing, hash-checked: the stub dims (sha-derived source
    size, half-up scaled to max_side=224) and the resized payload
    length (32-byte sha tag + ≤64 original bytes) replicate in DuckDB,
    so the Arrow kernel's arithmetic is oracle-pinned like the other
    mapInPandas paths."""
    from .operators.multimodal import resize_images

    docs = load_table(spark, sf_dir, "documents")
    out = resize_images(documents_as_media(docs), max_side=224)
    return out.select(
        "media_id",
        "width",
        "height",
        F.length("payload").cast("bigint").alias("n_bytes"),
    )


@query(
    "video_frame_samples",
    """
    WITH vids AS (SELECT doc_id AS media_id, text,
                         greatest(least(octet_length(encode(text)) // 256, 8), 1)
                           AS n_frames
                  FROM documents WHERE doc_id % 3 = 2),
    frames AS (SELECT media_id, text, unnest(range(0, n_frames, 2)) AS frame_idx
               FROM vids)
    SELECT media_id,
           frame_idx::INT AS frame_idx,
           (frame_idx * 40)::INT AS ts_ms,
           sha256(text || CAST(frame_idx AS VARCHAR)) AS frame_sha
    FROM frames
    """,
)
def q_video_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the video rows: every video payload fans out
    into one row per sampled frame through the Arrow mapInPandas
    kernel — the stub frame hash is sha256(payload‖idx), so the 1→k
    Python fan-out is hash-checked end-to-end by DuckDB."""
    from .operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(documents_as_media(docs), every_n=2, fps=25, max_frames=8)


@query(
    "audio_window_segments",
    """
    WITH auds AS (SELECT doc_id AS media_id, text,
                         greatest(least(octet_length(encode(text)) // 256, 8), 1)
                           AS n_win
                  FROM documents WHERE doc_id % 3 = 1),
    w AS (SELECT media_id, text, unnest(range(0, n_win)) AS window_idx
          FROM auds)
    SELECT media_id,
           window_idx::INT AS window_idx,
           (window_idx * 125)::INT AS start_ms,
           (window_idx * 125 + 250)::INT AS end_ms,
           sha256(text || 'w' || CAST(window_idx AS VARCHAR)) AS window_sha
    FROM w
    """,
)
def q_audio_window_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window segmentation over the audio rows (250 ms
    windows every 125 ms): the audio twin of the frame-sample query,
    same Arrow mapInPandas 1→k fan-out, stub window hash
    sha256(payload‖'w'‖idx) hash-checked by DuckDB. The kind filter
    sits under the Python stage so image/video bytes never cross the
    Arrow boundary."""
    from .operators.multimodal import segment_audio

    docs = load_table(spark, sf_dir, "documents")
    return segment_audio(
        documents_as_media(docs), window_ms=250, hop_ms=125, max_windows=8
    )


# ---------------------------------------------------------------------------
# Skew-safe aggregation: two-phase salted groupBy on the hot event_type
# key. The oracle is the PLAIN single-phase GROUP BY — hash-matching it
# proves the salting is result-invariant (routing only), which is the
# entire contract of the operator.
# ---------------------------------------------------------------------------
@query(
    "salted_event_totals",
    """
    SELECT event_type,
           COUNT(*)::BIGINT AS n_eventos,
           ROUND(SUM(value), 2) AS valor_total,
           ROUND(MAX(value), 2) AS valor_max
    FROM events GROUP BY event_type
    """,
)
def q_salted_event_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key aggregation via operators.skew.salted_agg: the hot key
    spreads over 16 salt reducers (partial agg per salt), then the tiny
    per-salt partials merge in a second groupBy. Same answer as the
    plain GROUP BY, minus the single-reducer hot spot."""
    from .operators.skew import salted_agg

    events = load_table(spark, sf_dir, "events")
    out = salted_agg(
        events,
        ["event_type"],
        {
            "n_eventos": ("sum", F.count(F.lit(1))),
            "valor_total": ("sum", F.sum("value")),
            "valor_max": ("max", F.max("value")),
        },
    )
    return out.select(
        "event_type",
        F.col("n_eventos").cast("bigint").alias("n_eventos"),
        F.round("valor_total", 2).alias("valor_total"),
        F.round("valor_max", 2).alias("valor_max"),
    )


HYPERPLANES_USED = HYPERPLANES  # re-export for tests


# ---------------------------------------------------------------------------
# JSON scalar ops over events.props (SURVEY.md §2.3 EXT note)
# ---------------------------------------------------------------------------
@query(
    "events_json_extract",
    """
    WITH e AS (SELECT event_type, value,
                      CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
               FROM events)
    SELECT event_type,
           COUNT(*)::BIGINT AS n_eventos,
           ROUND(AVG(k), 4) AS k_medio,
           MAX(k)::INTEGER AS k_max,
           ROUND(SUM(CASE WHEN k > 50 THEN value ELSE 0 END), 2) AS valor_k_alto
    FROM e GROUP BY event_type
    """,
)
def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object over the JSON-string props column — stays in
    codegen (Jackson on the JVM), no Python."""
    from .operators.aggregate import sum_if

    events = load_table(spark, sf_dir, "events")
    e = events.withColumn(
        "k", F.get_json_object("props", "$.k").cast("int")
    )
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_eventos"),
        F.round(F.avg("k"), 4).alias("k_medio"),
        F.max("k").alias("k_max"),
        F.round(sum_if(F.col("value"), F.col("k") > 50), 2).alias("valor_k_alto"),
    )


# ---------------------------------------------------------------------------
# Window analytics: lag-based sessionization (ranking/lag/lead — absent
# in the reference, SURVEY.md §2.6 EXT)
# ---------------------------------------------------------------------------
@query(
    "user_session_stats",
    """
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts FROM events),
    g AS (SELECT user_id, ts,
                 FLOOR(EPOCH(ts)) - FLOOR(EPOCH(LAG(ts) OVER w)) AS gap_s,
                 CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_s
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    s AS (SELECT user_id, gap_s, new_s,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM g)
    SELECT user_id,
           MAX(sid)::BIGINT AS n_sessions,
           CAST(MAX(cnt) AS BIGINT) AS longest_session_events,
           ROUND(AVG(CASE WHEN new_s = 0 THEN gap_s END), 2) AS avg_intra_gap_s
    FROM (SELECT user_id, gap_s, new_s, sid,
                 COUNT(*) OVER (PARTITION BY user_id, sid) AS cnt
          FROM s)
    GROUP BY user_id
    """,
)
def q_user_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands with lag/row-count windows (the by-hand twin of
    F.session_window): per-user session counts, longest session, mean
    intra-session gap."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    g = events.select(
        "user_id",
        "ts",
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).alias("gap_s"),
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
                >= 30 * 60 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    s = g.withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    s = s.withColumn("cnt", F.count(F.lit(1)).over(Window.partitionBy("user_id", "sid")))
    return s.groupBy("user_id").agg(
        F.max("sid").alias("n_sessions"),
        F.max("cnt").alias("longest_session_events"),
        F.round(F.avg(F.when(F.col("new_s") == 0, F.col("gap_s"))), 2).alias(
            "avg_intra_gap_s"
        ),
    )


# ---------------------------------------------------------------------------
# Exact percentiles (median/p90) — EXT §2.5 note
# ---------------------------------------------------------------------------
@query(
    "priority_price_percentiles",
    """
    SELECT o_orderpriority,
           COUNT(*)::BIGINT AS pedidos,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS mediana,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_priority_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles (Spark `percentile` ==
    DuckDB `quantile_cont`). The scale path swaps in
    `approx_percentile` (t-digest, one pass, mergeable) — asserted
    close in tests, not oracle-matched (sketches differ by engine)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("pedidos"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("mediana"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
    )


# ---------------------------------------------------------------------------
# ROLLUP subtotals (EXT — reference's A3 is grouping-sets-shaped)
# ---------------------------------------------------------------------------
@query(
    "revenue_rollup",
    """
    SELECT COALESCE(r.r_name, '(all)') AS regiao,
           CASE WHEN GROUPING(n.n_name) = 1 THEN '(all)' ELSE n.n_name END AS nacao,
           COUNT(*)::BIGINT AS pedidos,
           ROUND(SUM(o.o_totalprice), 2) AS receita
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    base = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    rolled = base.rollup("r_name", "n_name").agg(
        F.grouping("n_name").alias("_g_n"),
        F.count(F.lit(1)).alias("pedidos"),
        F.round(F.sum("o_totalprice"), 2).alias("receita"),
    )
    return rolled.select(
        F.coalesce(F.col("r_name"), F.lit("(all)")).alias("regiao"),
        F.when(F.col("_g_n") == 1, F.lit("(all)")).otherwise(F.col("n_name")).alias("nacao"),
        "pedidos",
        "receita",
    )


# ---------------------------------------------------------------------------
# F4/F5 parse round-trips as an oracle query (messy strings synthesized
# from typed fixture columns, then parsed back by the engine builders)
# ---------------------------------------------------------------------------
@query(
    "parse_roundtrip",
    """
    WITH m AS (
      SELECT o_totalprice,
             'R$ ' || replace(CAST(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2)) AS VARCHAR),
                              '.', ',') AS money_str,
             strftime(o_orderdate, '%d/%m/%Y %H:%M') AS date_str,
             o_orderdate
      FROM orders
    )
    SELECT COUNT(*)::BIGINT AS n,
           CAST(SUM(CASE WHEN ROUND(CAST(replace(replace(replace(
                  money_str, 'R$ ', ''), '.', ''), ',', '.') AS DOUBLE), 2)
                  = ROUND(o_totalprice, 2) THEN 1 ELSE 0 END) AS BIGINT) AS n_currency_ok,
           CAST(SUM(CASE WHEN strptime(date_str, '%d/%m/%Y %H:%M') = o_orderdate
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_date_ok
    FROM m
    """,
)
def q_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Currency (F4) and dayfirst-datetime (F5) parsers proven on
    synthesized 'R$ 1.234,56' / 'dd/MM/yyyy HH:mm' strings: parse back
    and count exact matches against the typed source column."""
    from .functions.temporal import parse_dayfirst_timestamp
    from .functions.text import currency_to_double

    orders = load_table(spark, sf_dir, "orders")
    m = orders.select(
        "o_totalprice",
        F.concat(
            F.lit("R$ "),
            F.replace(
                F.round("o_totalprice", 2).cast("decimal(18,2)").cast("string"),
                F.lit("."),
                F.lit(","),
            ),
        ).alias("money_str"),
        F.date_format("o_orderdate", "dd/MM/yyyy HH:mm").alias("date_str"),
        "o_orderdate",
    )
    return m.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                F.round(currency_to_double("money_str"), 2) == F.round("o_totalprice", 2), 1
            ).otherwise(0)
        ).alias("n_currency_ok"),
        F.sum(
            F.when(parse_dayfirst_timestamp("date_str") == F.col("o_orderdate"), 1).otherwise(0)
        ).alias("n_date_ok"),
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup: LSH-bucket-blocked nearest neighbor + threshold
# ---------------------------------------------------------------------------
NN_DUP_THRESHOLD = 0.45
# The blocking key MUST scale with the corpus: label cardinality is
# fixed (~10), so label blocks grow linearly and in-block pairs grow
# quadratically. Sign-LSH buckets scale by the planes knob —
# n_planes ≈ log2(N / target_block_size) keeps the expected block size
# constant as N grows. 6 planes = 64 buckets at fixture scale.
NN_DEDUP_PLANES = 6


def _nn_dedup_planes() -> list[list[float]]:
    from .operators.similarity import _hyperplanes

    return _hyperplanes(NN_DEDUP_PLANES)


def _nn_oracle_cte() -> str:
    """Shared oracle CTE: in-bucket nearest neighbor per vector
    (embedding_nn_dedup and semantic_dedup_keep replicate the same
    blocking + scoring stage-for-stage)."""
    return f"""
    WITH e AS (SELECT vec_id, {sql_lsh_bucket("embedding", _nn_dedup_planes())} AS bucket,
                      embedding::DOUBLE[] AS v
               FROM embeddings),
    p AS (SELECT a.vec_id, a.bucket, b.vec_id AS nn_id,
                 ROUND(list_dot_product(a.v, b.v)
                       / (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(b.v, b.v))), 9) AS cosine
          FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
    r AS (SELECT vec_id, bucket, nn_id, cosine,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY cosine DESC, nn_id) AS rn
          FROM p)"""


@query(
    "embedding_nn_dedup",
    _nn_oracle_cte()
    + f"""
    SELECT vec_id, bucket, nn_id, ROUND(cosine, 6) AS cosine,
           cosine >= {NN_DUP_THRESHOLD} AS is_dup
    FROM r WHERE rn = 1
    """,
)
def q_embedding_nn_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup detection: nearest neighbor within the
    vector's sign-LSH bucket, flagged against a cosine threshold.

    The block key is the 6-plane LSH bucket, not the ~10-value label:
    bucket count doubles per plane, so the expected block size (and
    the in-block pair explosion) is held constant at any corpus size
    by choosing n_planes ≈ log2(N / target_block_size). Vectors in
    singleton buckets emit no row — the honest LSH-recall semantics
    shared with ann_lsh_topk; the oracle replicates the literal
    hyperplanes, so the hash check covers the blocking too."""
    from pyspark.sql import Window

    from .operators.similarity import dot_expr, lsh_bucket_expr, norm_expr

    emb = _spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        "embedding",
        lsh_bucket_expr("embedding", _nn_dedup_planes()).alias("bucket"),
        norm_expr("embedding").alias("nrm"),
    )
    a = emb.select("vec_id", "bucket", F.col("embedding").alias("va"), F.col("nrm").alias("na"))
    b = emb.select(
        F.col("vec_id").alias("nn_id"), F.col("bucket").alias("bk"),
        F.col("embedding").alias("vb"), F.col("nrm").alias("nb"),
    )
    pairs = a.join(b, (F.col("bucket") == F.col("bk")) & (F.col("vec_id") != F.col("nn_id")))
    scored = pairs.select(
        "vec_id",
        "bucket",
        "nn_id",
        F.round(dot_expr("va", "vb") / (F.col("na") * F.col("nb")), 9).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("nn_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "bucket",
            "nn_id",
            F.round("cosine", 6).alias("cosine"),
            (F.col("cosine") >= NN_DUP_THRESHOLD).alias("is_dup"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped multi-join bench workhorses (Q3 / Q5 analogues on the
# fixture schema) — exercise big-big joins + top-k + selective dates
# ---------------------------------------------------------------------------
@query(
    "shipping_priority",
    """
    WITH r AS (
      SELECT l.l_orderkey,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
             strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
        AND l.l_shipdate > TIMESTAMP '1997-06-30 00:00:00'
      GROUP BY l.l_orderkey, orderdate
    )
    SELECT * FROM (
      SELECT l_orderkey, revenue, orderdate,
             ROW_NUMBER() OVER (ORDER BY revenue DESC, l_orderkey) AS rank
      FROM r
    ) WHERE rank <= 10
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: selective date predicates (pushed to scan), broadcast
    customer dim, lineitem⋈orders join, global top-10 via
    TakeOrderedAndProject."""
    from pyspark.sql import Window

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    cutoff = "1997-06-30 00:00:00"
    base = (
        lineitem.filter(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp_ntz"))
        .join(
            orders.filter(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp_ntz")),
            lineitem.l_orderkey == orders.o_orderkey,
        )
        .join(
            F.broadcast(
                customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
            ),
            orders.o_custkey == F.col("c_custkey"),
        )
    )
    agg = base.groupBy(
        "l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate")
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )
    top = agg.orderBy(F.col("revenue").desc(), F.col("l_orderkey")).limit(10)
    w = Window.orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
    return top.withColumn("rank", F.row_number().over(w).cast("bigint")).select(
        "l_orderkey", "revenue", "orderdate", "rank"
    )


@query(
    "local_supplier_volume",
    """
    SELECT n.n_name AS nacao,
           COUNT(*)::BIGINT AS itens,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'AMERICA'
      AND s.s_nationkey = c.c_nationkey
      AND EXTRACT(year FROM o.o_orderdate) = 1997
    GROUP BY n.n_name
    """,
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: five-way join where every dim broadcasts; the
    customer-nation == supplier-nation theta condition rides on the
    joined row, so the fact still only shuffles for the final agg."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nat = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "AMERICA")
        .select("n_nationkey", "n_name")
    )
    base = (
        lineitem.join(
            orders.filter(F.year("o_orderdate") == 1997).select("o_orderkey", "o_custkey"),
            lineitem.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            lineitem.l_suppkey == F.col("s_suppkey"),
        )
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return base.groupBy(F.col("n_name").alias("nacao")).agg(
        F.count(F.lit(1)).alias("itens"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
    )


@query(
    "market_share",
    """
    WITH base AS (
      SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN region r ON cn.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      WHERE r.r_name = 'AMERICA'
    )
    SELECT CAST(o_year AS BIGINT) AS o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END), 2)
             AS nation_volume,
           ROUND(SUM(volume), 2) AS total_volume,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM base GROUP BY o_year
    """,
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_1 suppliers' share of AMERICA-market
    revenue per order year. Six-way join where every dimension
    (customer/supplier/nation×2/region) broadcasts — the fact tables
    shuffle once on the orderkey and once for the year agg; the share
    is a conditional-sum ratio computed in the same single aggregate
    pass (no second scan, no self-join)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust_nat = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "AMERICA")
        .select("c_custkey")
    )
    supp_nat = supplier.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
        supplier.s_nationkey == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    base = (
        lineitem.select("l_orderkey", "l_suppkey", (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"))
        .join(orders.select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_nat), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    is_nat = F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(F.lit(0.0))
    return base.groupBy(F.col("o_year").cast("bigint").alias("o_year")).agg(
        F.round(F.sum(is_nat), 2).alias("nation_volume"),
        F.round(F.sum("volume"), 2).alias("total_volume"),
        F.round(F.sum(is_nat) / F.sum("volume"), 6).alias("mkt_share"),
    )


@query(
    "returned_item_report",
    """
    WITH agg AS (
      SELECT c.c_custkey, c.c_name, n.n_name AS nacao,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
             COUNT(*)::BIGINT AS itens
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE l.l_returnflag = 'R'
        AND o.o_orderdate >= DATE '1997-01-01' AND o.o_orderdate < DATE '1997-04-01'
      GROUP BY c.c_custkey, c.c_name, n.n_name
    )
    SELECT c_custkey, c_name, nacao, revenue, itens,
           CAST(rnk AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey) AS rnk FROM agg)
    WHERE rnk <= 20
    """,
)
def q_returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returned
    items in one quarter. The date filter pushes into the orders scan
    and the returnflag filter into the lineitem scan BEFORE the join;
    customer/nation broadcast; the top-20 is TakeOrderedAndProject on
    (rounded revenue desc, custkey) — never a global sort."""
    from .operators.reshape import top_k

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    agg = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
        .join(
            orders.filter(
                (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
            ).select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer.select("c_custkey", "c_name", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("nacao"))),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "nacao")
        .agg(
            F.round(F.sum("rev"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("itens"),
        )
    )
    ranked = top_k(agg, [], [F.col("revenue").desc(), F.col("c_custkey").asc()], 20)
    return ranked.select(
        "c_custkey", "c_name", "nacao", "revenue", "itens",
        F.col("rank").cast("bigint").alias("rank"),
    )


@query(
    "customer_value_deciles",
    """
    WITH d AS (SELECT c_mktsegment, c_acctbal,
                      NTILE(10) OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal, c_custkey) AS decile
               FROM customer)
    SELECT c_mktsegment, CAST(decile AS BIGINT) AS decile,
           COUNT(*)::BIGINT AS n,
           ROUND(MIN(c_acctbal), 2) AS min_bal,
           ROUND(MAX(c_acctbal), 2) AS max_bal,
           ROUND(AVG(c_acctbal), 4) AS avg_bal
    FROM d GROUP BY c_mktsegment, decile
    """,
)
def q_customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact account-balance deciles per market segment (NTILE with a
    deterministic (balance, key) order), profiled per decile. Exact
    n-tiles need a total order WITHIN each segment partition — fine
    when segments are many/balanced; for a global or hot-key decile at
    100 TB the scale path is percentile_approx bounds
    (priority_price_percentiles) instead of a single-reducer sort."""
    from pyspark.sql import Window

    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    d = customer.select(
        "c_mktsegment", "c_acctbal", F.ntile(10).over(w).cast("bigint").alias("decile")
    )
    return d.groupBy("c_mktsegment", "decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
    )


# ---------------------------------------------------------------------------
# Q18-style large orders: the AGGREGATED-SEMI-JOIN shape (HAVING on a
# child aggregate gating the parent join). cf. reference's
# capacity-gated joins (etl_pipeline.py perfil_agenda pre-aggregation).
# ---------------------------------------------------------------------------
LARGE_ORDER_QTY = 200


@query(
    "large_orders",
    f"""
    WITH big AS (SELECT l_orderkey, SUM(l_quantity) AS q
                 FROM lineitem GROUP BY l_orderkey
                 HAVING SUM(l_quantity) > {LARGE_ORDER_QTY}),
    j AS (SELECT c.c_custkey, c.c_name, o.o_orderkey,
                 strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
                 ROUND(o.o_totalprice, 2) AS total_price,
                 ROUND(CAST(b.q AS DOUBLE), 2) AS total_qty
          FROM big b
          JOIN orders o ON b.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey),
    r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY total_price DESC, o_orderkey)
                      AS rank
          FROM j)
    SELECT c_custkey, c_name, o_orderkey, orderdate, total_price, total_qty,
           rank::BIGINT AS rank
    FROM r WHERE rank <= 100
    """,
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 largest orders by value among orders whose total
    lineitem quantity exceeds {LARGE_ORDER_QTY} (TPC-H Q18 shape).
    Plan: ONE aggregate shuffle on l_orderkey produces the small
    qualifying set, which then gates the orders join (the aggregate
    side is tiny post-HAVING → broadcastable); customer is a broadcast
    dim; the top-100 is TakeOrderedAndProject, never a global sort."""
    from .operators.reshape import top_k

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > LARGE_ORDER_QTY)
    )
    j = (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer.select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("total_price"),
            F.round(F.col("q").cast("double"), 2).alias("total_qty"),
        )
    )
    ranked = top_k(j, [], [F.col("total_price").desc(), F.col("o_orderkey").asc()], 100)
    return ranked.withColumn("rank", F.col("rank").cast("bigint"))


# ---------------------------------------------------------------------------
# Q16-style supplier breadth: the DISTINCT-AGGREGATE shape (two-phase
# partial distinct under the shuffle) over a broadcast dim join.
# ---------------------------------------------------------------------------
@query(
    "supplier_breadth",
    """
    SELECT p.p_brand, p.p_size,
           COUNT(DISTINCT l.l_suppkey)::BIGINT AS n_suppliers,
           COUNT(*)::BIGINT AS n_lineitems
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#45' AND p.p_type <> 'PROMO'
    GROUP BY p.p_brand, p.p_size
    """,
)
def q_supplier_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, size) excluding one brand and
    the PROMO type (TPC-H Q16 shape). The part dim broadcasts with the
    exclusion predicates pushed to its scan; COUNT(DISTINCT) plans the
    two-phase Expand + partial-aggregate split, so no single reducer
    ever sees all (group, supplier) pairs."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    dim = part.filter(
        (F.col("p_brand") != "Brand#45") & (F.col("p_type") != "PROMO")
    ).select("p_partkey", "p_brand", "p_size")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(dim), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# Q22-style dormant high-balance customers: the SCALAR-SUBQUERY +
# ANTI-JOIN shape (global aggregate broadcast into a filter, NOT IN
# against a filtered key set).
# ---------------------------------------------------------------------------
DORMANT_CUTOFF = "2001-01-01"


@query(
    "dormant_rich_customers",
    f"""
    WITH avg_bal AS (SELECT ROUND(AVG(c_acctbal), 2) AS a
                     FROM customer WHERE c_acctbal > 0),
    recent AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderdate >= '{DORMANT_CUTOFF}'),
    eligible AS (SELECT c.c_custkey, c.c_acctbal, c.c_nationkey
                 FROM customer c, avg_bal
                 WHERE c.c_acctbal > avg_bal.a
                   AND c.c_custkey NOT IN (SELECT o_custkey FROM recent))
    SELECT n.n_name AS nacao,
           COUNT(*)::BIGINT AS n_customers,
           ROUND(SUM(e.c_acctbal), 2) AS saldo_total
    FROM eligible e JOIN nation n ON e.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-average positive balance and NO orders
    since {DORMANT_CUTOFF}, aggregated per nation (TPC-H Q22 shape).
    The global average is a one-row aggregate cross-joined (broadcast)
    into the filter — the scalar-subquery pattern; the recency check
    is a broadcast LEFT ANTI join against the distinct recent
    custkeys (date filter pushed to the orders scan); nation is a
    broadcast dim. The average is rounded 2dp on both engines so a
    partition-order float ulp can never flip a boundary customer."""
    from .operators.joins import anti_join

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 2).alias("a")
    )
    recent = (
        orders.filter(F.col("o_orderdate") >= DORMANT_CUTOFF)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    eligible = anti_join(
        customer.crossJoin(F.broadcast(avg_bal)).filter(
            F.col("c_acctbal") > F.col("a")
        ),
        recent,
        keys=["c_custkey"],
    )
    return (
        eligible.join(
            F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("nacao"))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("nacao")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("saldo_total"),
        )
    )


# ---------------------------------------------------------------------------
# As-of join (custom operator — DuckDB's native ASOF JOIN is the oracle)
# ---------------------------------------------------------------------------
@query(
    "asof_latest_order",
    """
    WITH r AS (  -- dedupe right to one row per (key, ts): max orderkey wins
      SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                         ORDER BY o_orderkey DESC) rn
            FROM orders) WHERE rn = 1
    ),
    j AS (
      SELECT e.event_type, e.ts, r.o_orderkey, r.o_orderdate
      FROM (SELECT event_type, user_id, CAST(ts AS TIMESTAMP) ts FROM events) e
      ASOF LEFT JOIN r ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
    )
    SELECT event_type,
           COUNT(*)::BIGINT AS n_eventos,
           CAST(SUM(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_com_pedido,
           ROUND(AVG(date_diff('day', CAST(o_orderdate AS DATE), CAST(ts AS DATE))), 4)
             AS dias_desde_pedido
    FROM j GROUP BY event_type
    """,
)
def q_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each event picks up the user's most recent
    order as of the event time (union + running last_value — one
    shuffle, no range-join pair explosion). Oracle = DuckDB's native
    ASOF JOIN."""
    from .operators.asof import asof_join_backward

    events = load_table(spark, sf_dir, "events").select("event_type", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    joined = asof_join_backward(
        events.withColumnRenamed("user_id", "k"),
        orders.withColumnRenamed("o_custkey", "k"),
        key="k",
        left_ts="ts",
        right_ts="o_orderdate",
        payload=["o_orderkey", "o_totalprice"],
        tie_break="o_orderkey",
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_eventos"),
        F.sum(F.when(F.col("o_orderkey").isNotNull(), 1).otherwise(0)).alias("n_com_pedido"),
        F.round(F.avg(F.datediff(F.to_date("ts"), F.to_date("_asof_ts"))), 4).alias(
            "dias_desde_pedido"
        ),
    )


# ---------------------------------------------------------------------------
# Deterministic hash sampling (stable train/test splits)
# ---------------------------------------------------------------------------
from .operators.sampling import sql_hash_bucket  # noqa: E402


@query(
    "hash_sample_events",
    f"""
    SELECT event_type,
           COUNT(*)::BIGINT AS n_total,
           CAST(SUM(CASE WHEN {sql_hash_bucket("event_id")} < 10 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sample_10pct,
           CAST(SUM(CASE WHEN {sql_hash_bucket("event_id", salt="v2")} < 10 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sample_10pct_v2
    FROM events GROUP BY event_type
    """,
)
def q_hash_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-hash sampling: membership is a pure function of the row key
    (and salt), so samples are reproducible across runs/engines and
    need no shuffle — unlike rand()-based sampling."""
    from .operators.sampling import hash_bucket

    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(hash_bucket("event_id") < 10, 1).otherwise(0)).alias("n_sample_10pct"),
        F.sum(F.when(hash_bucket("event_id", salt="v2") < 10, 1).otherwise(0)).alias(
            "n_sample_10pct_v2"
        ),
    )


# ---------------------------------------------------------------------------
# Upsert compaction (SCD-1 latest-record-wins) — the Delta-less merge
# pattern for snapshotting a keyed stream of updates
# ---------------------------------------------------------------------------
@query(
    "latest_order_snapshot",
    """
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_totalprice
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders)
    WHERE rn = 1
    """,
)
def q_latest_order_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Treat orders as keyed updates and compact to latest-per-key
    (deterministic tie-break). One shuffle on the key; at scale this is
    the periodic snapshot job over an append-only update log."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
        )
    )


# ---------------------------------------------------------------------------
# Window FRAME analytics: rolling 7-day revenue per customer (range frame)
# ---------------------------------------------------------------------------
@query(
    "rolling_7d_revenue",
    """
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS receita_7d
    FROM orders
    """,
)
def q_rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame: the 7-day trailing revenue per customer
    (frames are absent from the reference — SURVEY §2.6). Ordered by
    epoch-day so the range arithmetic is integral and engine-portable."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-6, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("receita_7d"),
    )


# ---------------------------------------------------------------------------
# Duplicate clusters: connected components over exact-dup + MinHash
# edges. Spark side is iterative min-label propagation; the oracle is
# DuckDB WITH RECURSIVE reachability (min reachable node == component),
# so even the iterative operator is hash-checked end-to-end.
# ---------------------------------------------------------------------------
@query(
    "dedup_clusters",
    f"""
    WITH RECURSIVE {_minhash_pairs_ctes()},
    fp AS (SELECT doc_id,
                  md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS fp
           FROM documents),
    freps AS (SELECT fp, MIN(doc_id) AS rep FROM fp GROUP BY fp),
    edges0 AS (
        SELECT doc_a, doc_b FROM mh_pairs WHERE jaccard >= {JACCARD_THRESHOLD}
        UNION
        SELECT f.rep AS doc_a, p.doc_id AS doc_b
        FROM fp p JOIN freps f USING (fp) WHERE p.doc_id <> f.rep),
    edges AS (SELECT doc_a AS u, doc_b AS v FROM edges0
              UNION
              SELECT doc_b AS u, doc_a AS v FROM edges0),
    reach(node, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT reach.node, e.v FROM reach JOIN edges e ON e.u = reach.r),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
    SELECT component, COUNT(*)::BIGINT AS n_members, MIN(node)::BIGINT AS keeper
    FROM comp GROUP BY component
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.clusters import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    near = minhash_candidates(
        docs, bucket_cap=MINHASH_BUCKET_CAP, pre_exact_dedup=True
    ).filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    # exact duplicates re-enter the graph via their representative edge
    # (they were collapsed out of the LSH input by pre_exact_dedup)
    edges = near.unionByName(exact_dup_edges(docs))
    return dedup_clusters(docs, edges)


# ---------------------------------------------------------------------------
# The end-to-end corpus-dedup pipeline in ONE job — the flow an LLM
# data team actually runs (cf. the reference's one-shot main(),
# /root/reference/src/etl_pipeline.py:692-712, which likewise chains
# its whole flow as a single entry point): exact-dup representatives →
# MinHash+LSH near-dup pairs → exact-dup edges → connected components
# → per-document keep/drop decision. Output is the keep-list artifact:
# one row per document with its cluster id, cluster size, and keep=1
# iff it is the cluster's min-id keeper.
# ---------------------------------------------------------------------------
@query(
    "corpus_dedup_pipeline",
    f"""
    WITH RECURSIVE {_minhash_pairs_ctes()},
    fp AS (SELECT doc_id,
                  md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS fp
           FROM documents),
    freps AS (SELECT fp, MIN(doc_id) AS rep FROM fp GROUP BY fp),
    edges0 AS (
        SELECT doc_a, doc_b FROM mh_pairs WHERE jaccard >= {JACCARD_THRESHOLD}
        UNION
        SELECT f.rep AS doc_a, p.doc_id AS doc_b
        FROM fp p JOIN freps f USING (fp) WHERE p.doc_id <> f.rep),
    edges AS (SELECT doc_a AS u, doc_b AS v FROM edges0
              UNION
              SELECT doc_b AS u, doc_a AS v FROM edges0),
    reach(node, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT reach.node, e.v FROM reach JOIN edges e ON e.u = reach.r),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
    sizes AS (SELECT component, COUNT(*) AS n_members FROM comp GROUP BY component)
    SELECT c.node::BIGINT AS doc_id,
           c.component::BIGINT AS component,
           s.n_members::BIGINT AS n_members,
           (c.node = c.component)::BIGINT AS keep
    FROM comp c JOIN sizes s USING (component)
    """,
)
def q_corpus_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.clusters import dedup_keep_list

    docs = load_table(spark, sf_dir, "documents")
    near = minhash_candidates(
        docs, bucket_cap=MINHASH_BUCKET_CAP, pre_exact_dedup=True
    ).filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    edges = near.unionByName(exact_dup_edges(docs))
    return dedup_keep_list(docs, edges)


@query(
    "corpus_scrub_pipeline",
    f"""
    WITH RECURSIVE {_minhash_pairs_ctes()},
    fpx AS (SELECT doc_id,
                   md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS fp
            FROM documents),
    freps AS (SELECT fp, MIN(doc_id) AS rep FROM fpx GROUP BY fp),
    edges0 AS (
        SELECT doc_a, doc_b FROM mh_pairs WHERE jaccard >= {JACCARD_THRESHOLD}
        UNION
        SELECT f.rep AS doc_a, p.doc_id AS doc_b
        FROM fpx p JOIN freps f USING (fp) WHERE p.doc_id <> f.rep),
    edgesx AS (SELECT doc_a AS u, doc_b AS v FROM edges0
               UNION
               SELECT doc_b AS u, doc_a AS v FROM edges0),
    reach(node, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT reach.node, e.v FROM reach JOIN edgesx e ON e.u = reach.r),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
    kept AS (SELECT d.doc_id, d.text FROM documents d
             JOIN comp c ON d.doc_id = c.node WHERE c.node = c.component),
    t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM kept),
    g AS (SELECT doc_id, i AS pos,
                 md5(array_to_string(toks[i : i + {SPAN_GRAM - 1}], ' ')) AS gh
          FROM t, LATERAL (
            SELECT unnest(range(1, greatest(len(toks) - {SPAN_GRAM - 2}, 1))) AS i
          ) u),
    own AS (SELECT gh, MIN(doc_id) AS owner
            FROM (SELECT DISTINCT gh, doc_id FROM g)
            GROUP BY gh HAVING COUNT(*) >= 2),
    cut AS (SELECT g.doc_id, g.pos FROM g JOIN own USING (gh)
            WHERE g.doc_id <> own.owner),
    cov AS (SELECT DISTINCT doc_id, pos + o.off AS tp
            FROM cut, LATERAL (
              SELECT unnest(range(0, {SPAN_GRAM})) AS off) o),
    tok AS (SELECT doc_id, i AS tp, toks[i] AS tok
            FROM t, LATERAL (
              SELECT unnest(range(1, len(toks) + 1)) AS i) u),
    keptt AS (SELECT tok.doc_id,
                     string_agg(tok.tok, ' ' ORDER BY tok.tp) AS scrubbed_text,
                     COUNT(*) AS n_kept
              FROM tok LEFT JOIN cov
                ON tok.doc_id = cov.doc_id AND tok.tp = cov.tp
              WHERE cov.tp IS NULL GROUP BY tok.doc_id)
    SELECT t.doc_id,
           COALESCE(k.scrubbed_text, '') AS scrubbed_text,
           COALESCE(k.n_kept, 0)::BIGINT AS n_tokens_kept,
           (len(t.toks) - COALESCE(k.n_kept, 0))::BIGINT AS n_tokens_removed
    FROM t LEFT JOIN keptt k USING (doc_id)
    """,
)
def q_corpus_scrub_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation flow's final text stage end-to-end: doc-level
    dedup FIRST (exact reps + MinHash near-dup edges -> connected
    components -> min-id keeper, corpus_dedup_pipeline's keep set),
    then SUBSTRING scrub over the SURVIVORS ONLY — gram ownership and
    document frequency computed on the kept corpus, which is the real
    interaction doc-level and substring dedup have: dropping a
    near-dup can transfer a gram's canonical owner to the next kept
    doc, and a block shared only between a keeper and its dropped
    near-dups stops counting as duplicated at all (it survives in the
    keeper untouched). The oracle composes the pipeline's WITH
    RECURSIVE keep CTE with the scrub chain over the kept set, so the
    hash match checks the stage INTERACTION, not each stage alone
    (the corpus_curation_pipeline posture). Ownership-transfer and
    de-sharing semantics are pinned by a crafted-graph pytest."""
    from .operators.clusters import dedup_keep_list
    from .operators.textanalysis import scrub_duplicate_spans

    docs = load_table(spark, sf_dir, "documents")
    near = minhash_candidates(
        docs, bucket_cap=MINHASH_BUCKET_CAP, pre_exact_dedup=True
    ).filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    edges = near.unionByName(exact_dup_edges(docs))
    keepers = (
        dedup_keep_list(docs, edges)
        .filter(F.col("keep") == 1)
        .select("doc_id")
    )
    kept = _spread(docs).join(keepers, "doc_id")
    return scrub_duplicate_spans(kept, k=SPAN_GRAM)


# ---------------------------------------------------------------------------
# IVF-style ANN: nearest-centroid cells (rounded label-mean centroids)
# ---------------------------------------------------------------------------
# Embedding/PQ geometry interpolated into the oracle SQL below — a
# single source of truth with the Spark side, so changing PQ_M/
# PQ_SUB_DIM/EMBED_DIM in operators/similarity.py can never silently
# desync the oracle from the implementation (ADVICE r6).
from .operators.similarity import (  # noqa: E402
    EMBED_DIM as _EMBED_DIM,
    PQ_SUB_DIM as _PQ_SUB_DIM,
)


@query(
    "ann_ivf_topk",
    f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    dims AS (SELECT e.label, t.i, ROUND(AVG(e.v[t.i]), 6) AS cval
             FROM e CROSS JOIN range(1, {_EMBED_DIM + 1}) t(i) GROUP BY e.label, t.i),
    cents AS (SELECT label AS cell, list(cval ORDER BY i) AS centroid
              FROM dims GROUP BY label),
    base AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    sc AS (SELECT b.vec_id, b.v, b.nrm, c.cell,
                  ROUND(list_dot_product(b.v, c.centroid)
                        / (b.nrm * sqrt(list_dot_product(c.centroid, c.centroid))), 9)
                    AS ccos
           FROM base b CROSS JOIN cents c),
    assigned AS (SELECT vec_id, v, nrm, cell FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY ccos DESC, cell) AS rn FROM sc)
        WHERE rn = 1),
    p AS (SELECT q.vec_id AS query_id, q.cell, c.vec_id AS neighbor_id,
                 ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 9) AS cosine
          FROM assigned q JOIN assigned c
            ON q.cell = c.cell AND c.vec_id <> q.vec_id
          WHERE q.vec_id < {ANN_QUERY_LIMIT}),
    r AS (SELECT query_id, cell, neighbor_id, cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id) AS rank
          FROM p)
    SELECT query_id, cell, neighbor_id, ROUND(cosine, 6) AS cosine, rank
    FROM r WHERE rank <= {ANN_K}
    """,
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: coarse quantizer = rounded label-mean centroids
    (rounding makes the cells engine/partition-order stable); vectors
    assigned to their argmax-cosine cell; search within the cell only."""
    from .operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    out = ivf_topk(emb, ANN_K, query_filter=F.col("vec_id") < ANN_QUERY_LIMIT)
    return out.withColumn("rank", F.col("rank").cast("bigint"))


ANN_NPROBE = 2


@query(
    "ann_ivf_nprobe_topk",
    f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    dims AS (SELECT e.label, t.i, ROUND(AVG(e.v[t.i]), 6) AS cval
             FROM e CROSS JOIN range(1, {_EMBED_DIM + 1}) t(i) GROUP BY e.label, t.i),
    cents AS (SELECT label AS cell, list(cval ORDER BY i) AS centroid
              FROM dims GROUP BY label),
    base AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    sc AS (SELECT b.vec_id, b.v, b.nrm, c.cell,
                  ROUND(list_dot_product(b.v, c.centroid)
                        / (b.nrm * sqrt(list_dot_product(c.centroid, c.centroid))), 9)
                    AS ccos
           FROM base b CROSS JOIN cents c),
    ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                            ORDER BY ccos DESC, cell) AS rn FROM sc),
    assigned AS (SELECT vec_id, v, nrm, cell FROM ranked WHERE rn = 1),
    probe AS (SELECT vec_id, v, nrm, cell FROM ranked
              WHERE rn <= {ANN_NPROBE} AND vec_id < {ANN_QUERY_LIMIT}),
    p AS (SELECT q.vec_id AS query_id, q.cell, c.vec_id AS neighbor_id,
                 ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 9) AS cosine
          FROM probe q JOIN assigned c
            ON q.cell = c.cell AND c.vec_id <> q.vec_id),
    r AS (SELECT query_id, cell, neighbor_id, cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id) AS rank
          FROM p)
    SELECT query_id, cell, neighbor_id, ROUND(cosine, 6) AS cosine, rank
    FROM r WHERE rank <= {ANN_K}
    """,
)
def q_ann_ivf_nprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with nprobe={ANN_NPROBE}: each query searches its 2 nearest
    cells (the index — corpus single-cell assignment — is unchanged).
    The recall knob of every production IVF deployment; lift is
    tracked by ann_recall_at_k's 'ivf2' row."""
    from .operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    out = ivf_topk(
        emb, ANN_K, query_filter=F.col("vec_id") < ANN_QUERY_LIMIT, nprobe=ANN_NPROBE
    )
    return out.withColumn("rank", F.col("rank").cast("bigint"))


# ---------------------------------------------------------------------------
# ANN approximation quality: recall@k of the LSH and IVF paths against
# the exact brute-force neighbors — the tracked number that says how
# much accuracy the scale paths trade for their pruning. The oracle
# nests the three already-verified ANN oracles as CTE subqueries.
# ---------------------------------------------------------------------------
def _ann_recall_oracle() -> str:
    from .workload import ORACLES

    return f"""
    WITH brute AS ({ORACLES["ann_bruteforce_topk"]}),
    lsh AS ({ORACLES["ann_lsh_topk"]}),
    ivf AS ({ORACLES["ann_ivf_topk"]}),
    ivf2 AS ({ORACLES["ann_ivf_nprobe_topk"]}),
    approx AS (SELECT 'lsh' AS method, query_id, neighbor_id FROM lsh
               UNION ALL
               SELECT 'ivf' AS method, query_id, neighbor_id FROM ivf
               UNION ALL
               SELECT 'ivf2' AS method, query_id, neighbor_id FROM ivf2),
    hits AS (SELECT method, COUNT(*)::BIGINT AS n_hits
             FROM approx JOIN brute USING (query_id, neighbor_id)
             GROUP BY method),
    tot AS (SELECT COUNT(*)::BIGINT AS n_total FROM brute),
    m(method) AS (VALUES ('lsh'), ('ivf'), ('ivf2'))
    SELECT m.method,
           COALESCE(h.n_hits, 0)::BIGINT AS n_hits,
           t.n_total,
           ROUND(COALESCE(h.n_hits, 0) / CAST(t.n_total AS DOUBLE), 6)
             AS recall_at_k
    FROM m LEFT JOIN hits h ON m.method = h.method CROSS JOIN tot t
    """


@query("ann_recall_at_k", _ann_recall_oracle())
def q_ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@{ANN_K} per approximate method vs exact brute force:
    |approx ∩ exact| / |exact| over all query vectors. LSH pays for
    singleton buckets (recall loss is visible, not hidden); IVF pays at
    cell boundaries."""
    brute = q_ann_bruteforce_topk(spark, sf_dir).select("query_id", "neighbor_id")
    # brute feeds BOTH the hits join and the n_total denominator — a
    # lazy localCheckpoint materializes the ~100-row exact answer once
    # instead of executing the full brute-force pipeline per consumer
    try:
        brute = brute.localCheckpoint(eager=False)
    except Exception:
        brute = brute.cache()
    approx = q_ann_lsh_topk(spark, sf_dir).select(
        F.lit("lsh").alias("method"), "query_id", "neighbor_id"
    ).unionByName(
        q_ann_ivf_topk(spark, sf_dir).select(
            F.lit("ivf").alias("method"), "query_id", "neighbor_id"
        )
    ).unionByName(
        q_ann_ivf_nprobe_topk(spark, sf_dir).select(
            F.lit("ivf2").alias("method"), "query_id", "neighbor_id"
        )
    )
    hits = (
        approx.join(brute, ["query_id", "neighbor_id"])
        .groupBy("method")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    methods = spark.createDataFrame(
        [("lsh",), ("ivf",), ("ivf2",)], "method string"
    )
    tot = brute.agg(F.count(F.lit(1)).alias("n_total"))
    n_hits = F.coalesce("n_hits", F.lit(0)).cast("bigint")
    return (
        methods.join(hits, "method", "left")
        .crossJoin(tot)
        .select(
            "method",
            n_hits.alias("n_hits"),
            F.col("n_total").cast("bigint").alias("n_total"),
            F.round(n_hits / F.col("n_total"), 6).alias("recall_at_k"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental ANN: a NEW vector batch searched against a PERSISTED IVF
# index (centroids + cell assignments on parquet) — the vector-side
# twin of dedup_new_batch. Only the batch is scored against the
# centroids; the corpus is never re-assigned.
# ---------------------------------------------------------------------------
ANN_NEW_PCT = 10  # vec_id hash bucket < 10 → the "new" query batch


def _ann_incremental_oracle(idx_extra: str = "") -> str:
    """Incremental-IVF oracle; ``idx_extra`` appends a predicate to the
    index-membership CTE (e.g. the forget-list exclusion) — centroids
    stay computed over the FULL pre-forget corpus, matching the frozen
    coarse quantizer of a maintained index."""
    from .operators.sampling import sql_hash_bucket

    return f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v,
                      ({sql_hash_bucket("vec_id")} < {ANN_NEW_PCT}) AS is_new
               FROM embeddings),
    old AS (SELECT * FROM e WHERE NOT is_new),
    dims AS (SELECT o.label, t.i, ROUND(AVG(o.v[t.i]), 6) AS cval
             FROM old o CROSS JOIN range(1, 65) t(i) GROUP BY o.label, t.i),
    cents AS (SELECT label AS cell, list(cval ORDER BY i) AS centroid
              FROM dims GROUP BY label),
    cn AS (SELECT cell, centroid,
                  sqrt(list_dot_product(centroid, centroid)) AS c_nrm
           FROM cents),
    base AS (SELECT vec_id, is_new, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    sc AS (SELECT b.vec_id, b.is_new, b.v, b.nrm, c.cell,
                  ROUND(list_dot_product(b.v, c.centroid) / (b.nrm * c.c_nrm), 9)
                    AS ccos
           FROM base b CROSS JOIN cn c),
    ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                            ORDER BY ccos DESC, cell) AS rn
               FROM sc),
    idx AS (SELECT vec_id, v, nrm, cell FROM ranked
            WHERE rn = 1 AND NOT is_new{idx_extra}),
    q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, cell
          FROM ranked WHERE rn = 1 AND is_new),
    p AS (SELECT q.query_id, q.cell, i.vec_id AS neighbor_id,
                 ROUND(list_dot_product(q.qv, i.v) / (q.qn * i.nrm), 9) AS cosine
          FROM q JOIN idx i ON q.cell = i.cell),
    r AS (SELECT query_id, cell, neighbor_id, cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id) AS rank
          FROM p)
    SELECT query_id, cell, neighbor_id, ROUND(cosine, 6) AS cosine, rank
    FROM r WHERE rank <= {ANN_K}
    """


@query("ann_incremental_topk", _ann_incremental_oracle())
def q_ann_incremental_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN end-to-end: build the IVF index over the 90%
    "corpus" slice, WRITE centroids + cell assignments to parquet,
    read them back, and search the 10% "new batch" against the index —
    corpus vectors are never re-scored. Neighbors come from the index
    only (a new vector can't match its own batch), which is the
    arriving-data contract; the oracle replicates the split, the
    rounded centroids and the cell search exactly.

    The assignments are written ``partitionBy("cell")`` — the layout
    lever the index exists for: a query batch's cell join prunes to
    the probed cells' directories (dynamic partition pruning), so at
    scale a small batch reads a small fraction of the index files, not
    the whole corpus posting set."""
    import os

    from .operators.sampling import hash_bucket
    from .operators.similarity import ivf_index, ivf_search_index
    from .sources.sinks import write_parquet

    emb = load_table(spark, sf_dir, "embeddings")
    is_new = hash_bucket("vec_id") < ANN_NEW_PCT
    corpus, batch = emb.filter(~is_new), emb.filter(is_new)

    base = _run_scoped_index_dir("ivf_index")
    cents, assigned = ivf_index(corpus)
    write_parquet(cents, os.path.join(base, "centroids"))
    write_parquet(assigned, os.path.join(base, "assignments"), partition_by=["cell"])
    cents_rb = spark.read.parquet(os.path.join(base, "centroids"))
    assigned_rb = spark.read.parquet(os.path.join(base, "assignments"))
    out = ivf_search_index(assigned_rb, cents_rb, batch, ANN_K)
    return out.withColumn("rank", F.col("rank").cast("bigint"))


# ---------------------------------------------------------------------------
# IVF with the REAL trainer: seeded Spark ML KMeans centroids plugged
# into the same ivf_topk cell search, tracked as recall@k vs exact
# brute force. Registered WITHOUT an SQL oracle by construction:
# distributed KMeans centroids are engine-specific (float reduction
# order, init sampling), so no DuckDB twin can exist — the driver
# records the weaker rows-only check, and quality is value-asserted in
# pytest (trained recall >= label-mean recall, both vs brute force).
# ---------------------------------------------------------------------------
# Recall-harness pin: 10 cells over the 500-vector fixture gives a
# meaningful nprobe sweep (cells of ~50). This is NOT the production
# sizing — kmeans_centroids(n_cells=None) derives 4·√N cells from the
# corpus via operators/scaleparams.py::ivf_cells_for.
KMEANS_IVF_CELLS = 10


@query("ann_kmeans_ivf_recall")
def q_ann_kmeans_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@{ANN_K} of IVF with the trained coarse quantizer
    (operators/similarity.py::kmeans_centroids — seeded, distributed
    Lloyd iterations, centroids rounded to 6dp) against exact brute
    force. One row: (method, n_hits, n_total, recall_at_k). Training
    touches only the embedding column; the k centers collected to the
    driver are the model, not data. Hash-grade verification (no oracle
    by construction): fresh-JVM two-session determinism pin + a pure-
    Python third implementation of everything downstream of the fit
    (assignment, probe, top-k, recall — exact match) in
    tests/test_rows_only_verification.py."""
    from .operators.similarity import ivf_topk, kmeans_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    qf = F.col("vec_id") < ANN_QUERY_LIMIT
    brute = q_ann_bruteforce_topk(spark, sf_dir).select("query_id", "neighbor_id")
    try:
        brute = brute.localCheckpoint(eager=False)
    except Exception:
        brute = brute.cache()
    cents = kmeans_centroids(emb, KMEANS_IVF_CELLS)
    approx = ivf_topk(emb, ANN_K, query_filter=qf, centroids=cents).select(
        "query_id", "neighbor_id"
    )
    hits = approx.join(brute, ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    tot = brute.agg(F.count(F.lit(1)).alias("n_total"))
    return hits.crossJoin(tot).select(
        F.lit("kmeans_ivf").alias("method"),
        F.col("n_hits").cast("bigint").alias("n_hits"),
        F.col("n_total").cast("bigint").alias("n_total"),
        F.round(F.col("n_hits") / F.col("n_total"), 6).alias("recall_at_k"),
    )


# ---------------------------------------------------------------------------
# Skew-safe JOIN: 5 order priorities × ~30k orders each at sf0.1 — a
# plain shuffle join lands every key on one reducer. The salted join
# spreads each hot key over 16 (key, salt) reducers; the dim replicates
# ×16 (5 rows → 80). Oracle = the plain join: hash-matching proves the
# salt is routing only.
# ---------------------------------------------------------------------------
PRIORITY_WEIGHTS = [
    ("1-URGENT", 5.0),
    ("2-HIGH", 4.0),
    ("3-MEDIUM", 3.0),
    ("4-NOT SPECIFIED", 2.0),
    ("5-LOW", 1.0),
]


@query(
    "salted_priority_join",
    f"""
    WITH dim(prio, weight) AS (VALUES
        {", ".join(f"('{p}', {w})" for p, w in PRIORITY_WEIGHTS)})
    SELECT o.o_orderpriority,
           COUNT(*)::BIGINT AS n_orders,
           ROUND(SUM(o.o_totalprice * d.weight), 2) AS receita_ponderada
    FROM orders o JOIN dim d ON o.o_orderpriority = d.prio
    GROUP BY o.o_orderpriority
    """,
)
def q_salted_priority_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key fact⋈dim via operators.skew.salted_join_skewed_left
    (the no-broadcast/no-AQE fallback pattern), then a salted-safe
    aggregate. Same answer as the plain join."""
    from .operators.skew import salted_join_skewed_left

    orders = load_table(spark, sf_dir, "orders")
    dim = spark.createDataFrame(
        PRIORITY_WEIGHTS, "o_orderpriority string, weight double"
    )
    joined = salted_join_skewed_left(
        orders.select("o_orderpriority", "o_totalprice"), dim, "o_orderpriority"
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice") * F.col("weight")), 2).alias(
            "receita_ponderada"
        ),
    )


# ---------------------------------------------------------------------------
# Range (interval) join: events attributed to 2-hour "surge windows"
# seeded by a stable 0.1% hash sample of events. The Spark side is the
# bucketized equi-join (operators/rangejoin.py); the oracle is the
# plain inequality join — hash-matching proves the bucketization is
# routing only.
# ---------------------------------------------------------------------------
SURGE_WINDOW_SEC = 7200


@query(
    "range_join_surges",
    f"""
    WITH surges AS (
        SELECT event_id AS surge_id, ts AS w_start,
               ts + INTERVAL 2 HOUR AS w_end
        FROM events
        WHERE {sql_hash_bucket("event_id", 1000, "surge")} = 0)
    SELECT s.surge_id,
           COUNT(*)::BIGINT AS n_events,
           ROUND(SUM(e.value), 2) AS valor_total
    FROM surges s JOIN events e
      ON e.ts >= s.w_start AND e.ts < s.w_end
    GROUP BY s.surge_id
    """,
)
def q_range_join_surges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events per surge window via the bucketized range join: bucket
    width = the window length, so each interval explodes into ≤ 2
    buckets and the join is a hash equi-join on the bucket id (the
    naive inequality join plans a nested loop)."""
    from .operators.rangejoin import range_join
    from .operators.sampling import hash_bucket

    events = load_table(spark, sf_dir, "events")
    surges = events.filter(hash_bucket("event_id", 1000, "surge") == 0).select(
        F.col("event_id").alias("surge_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("w_end"),
    )
    joined = range_join(
        events.select("ts", "value"),
        surges,
        "ts",
        "w_start",
        "w_end",
        bucket_sec=SURGE_WINDOW_SEC,
    )
    return joined.groupBy("surge_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.round(F.sum("value"), 2).alias("valor_total"),
    )


# ---------------------------------------------------------------------------
# Statistical aggregates (stddev/corr/covar — absent from the reference,
# free in both engines; EXT §2.5)
# ---------------------------------------------------------------------------
@query(
    "lineitem_price_stats",
    """
    SELECT l_returnflag,
           COUNT(*)::BIGINT AS n,
           ROUND(STDDEV_SAMP(l_extendedprice), 2) AS preco_stddev,
           ROUND(COVAR_SAMP(l_extendedprice, l_quantity), 2) AS preco_qty_covar,
           ROUND(CORR(l_extendedprice, l_quantity), 4) AS preco_qty_corr
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_lineitem_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("preco_stddev"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias("preco_qty_covar"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("preco_qty_corr"),
    )


# ---------------------------------------------------------------------------
# Document chunking (token windows with overlap — context prep)
# ---------------------------------------------------------------------------
CHUNK_SIZE, CHUNK_STRIDE = 50, 40

# Shared by document_chunks (native explode) AND document_chunks_udtf
# (Python UDTF): two independent implementations against one oracle.
_CHUNKS_ORACLE = f"""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
    c AS (
      SELECT doc_id,
             g.i AS chunk_idx,
             array_to_string(toks[g.i * {CHUNK_STRIDE} + 1 :
                                  g.i * {CHUNK_STRIDE} + {CHUNK_SIZE}], ' ') AS chunk
      FROM t CROSS JOIN LATERAL (
        SELECT unnest(range(0, greatest(CAST(ceil((len(toks) - {CHUNK_SIZE})
                                              / {CHUNK_STRIDE}.0) AS INT) + 1, 1))) AS i
      ) g
    )
    SELECT doc_id, chunk_idx::INTEGER AS chunk_idx,
           len(string_split(chunk, ' '))::BIGINT AS n_tokens,
           md5(chunk) AS chunk_hash
    FROM c WHERE chunk <> ''
    """


@query("document_chunks", _CHUNKS_ORACLE)
def q_document_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 50-token chunks every 40 tokens per document —
    native sequence/slice, exploded JVM-side (no Python)."""
    from .operators.textanalysis import chunk_tokens


    docs = _spread(load_table(spark, sf_dir, "documents"))
    exploded = docs.select(
        "doc_id", F.explode(chunk_tokens("text", CHUNK_SIZE, CHUNK_STRIDE)).alias("c")
    ).filter(F.col("c.chunk") != "")
    return exploded.select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.size(F.split("c.chunk", " ")).cast("bigint").alias("n_tokens"),
        F.md5("c.chunk").alias("chunk_hash"),
    )


@query("document_chunks_udtf", _CHUNKS_ORACLE)
def q_document_chunks_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME chunk fan-out as document_chunks, re-expressed as a
    Spark 4 Python UDTF (operators/textanalysis.py::chunk_docs_udtf)
    consuming the documents TABLE argument — the structured 1→k
    Python-eval surface with its own output schema. Registered against
    the identical DuckDB oracle as the native path, so the Catalyst
    explode implementation and the Arrow-batched Python implementation
    prove each other (+ the oracle makes it three). Production
    guidance lives in the UDTF docstring: native wins when the chunker
    is expressible in SQL; the UDTF is the drop-in slot for a real
    Python tokenizer. Plan: exactly one ArrowEvalPythonUDTF stage,
    pinned in tests/test_plan_quality.py; input is column-pruned to
    (doc_id, text) BEFORE the Python boundary."""
    from .operators.textanalysis import chunk_docs_udtf

    docs = _spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    return chunk_docs_udtf(CHUNK_SIZE, CHUNK_STRIDE)(docs.asTable())


# ---------------------------------------------------------------------------
# Token packing: assign documents to fixed-token-budget training bins
# (sequence-packing staple). Scale-first design: a GLOBAL ordered
# cumulative sum is a single total order — a one-reducer sort at
# 100 TB — so packing runs per hash-SHARD (cumsum windows partitioned
# by shard, embarrassingly parallel); packing quality is unchanged
# asymptotically and bin ids are (shard, bin).
# ---------------------------------------------------------------------------
PACK_BUDGET = 512  # tokens per bin
PACK_SHARDS = 8


@query(
    "token_pack_bins",
    f"""
    WITH t AS (SELECT doc_id,
                      (doc_id % {PACK_SHARDS}) AS shard,
                      len(regexp_extract_all(lower(text),
                                             '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT
                        AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, shard, n_tokens,
                 SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum
          FROM t)
    SELECT doc_id, shard::BIGINT AS shard, n_tokens,
           ((cum - n_tokens) // {PACK_BUDGET})::BIGINT AS bin
    FROM c
    """,
)
def q_token_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document packing assignment: docs are BPE-ish token-counted
    (map-only regexp), sharded by doc_id hash, and binned by the
    budget-quantized cumulative start offset within their shard —
    deterministic, one shuffle on the shard key, no global sort. A doc
    lands in bin floor(start_offset / {PACK_BUDGET}), so every bin
    holds ~{PACK_BUDGET} tokens of consecutive docs."""
    from pyspark.sql import Window

    from .operators.textanalysis import token_count_bpe_ish

    docs = _spread(load_table(spark, sf_dir, "documents"))
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        token_count_bpe_ish("text").cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.select(
        "doc_id",
        F.col("shard").cast("bigint").alias("shard"),
        "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_BUDGET)
        .cast("bigint")
        .alias("bin"),
    )


# ---------------------------------------------------------------------------
# Temperature-balanced multilingual sampling (mC4/XLM-style corpus
# rebalancing: per-language budget ∝ N_lang^alpha, alpha < 1 upsamples
# low-resource languages relative to their natural share). The keep
# decision is a stable hash-fraction threshold — a pure map filter
# after a |langs|-row aggregate, so a skewed language distribution
# (one lang = 80 % of a 100 TB corpus) never needs a per-stratum sort.
# ---------------------------------------------------------------------------
from .operators.sampling import sql_hash_frac  # noqa: E402

TEMP_SAMPLE_ALPHA = 0.5
TEMP_SAMPLE_BUDGET = 300


@query(
    "corpus_temperature_sample",
    f"""
    WITH c AS (SELECT lang, COUNT(*)::BIGINT AS n_s FROM documents GROUP BY lang),
    r AS (SELECT lang, n_s,
                 ROUND(ROUND(POW(n_s, {TEMP_SAMPLE_ALPHA}), 9)
                       / SUM(ROUND(POW(n_s, {TEMP_SAMPLE_ALPHA}), 9)) OVER (), 6) AS share
          FROM c),
    t AS (SELECT lang, n_s,
                 LEAST(n_s, CAST(FLOOR({TEMP_SAMPLE_BUDGET} * share) AS BIGINT)) AS t_s
          FROM r)
    SELECT d.doc_id, d.lang, ROUND(CAST(t_s AS DOUBLE) / n_s, 6) AS rate
    FROM documents d JOIN t USING (lang)
    WHERE {sql_hash_frac("d.doc_id")} < CAST(t_s AS DOUBLE) / n_s
    """,
)
def q_corpus_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic temperature sampling over the documents corpus:
    per-language target t_l = min(N_l, floor(budget · share_l)) with
    share_l = round(N_l^α / Σ N^α, 6); a doc survives iff its stable
    md5 hash fraction < t_l / N_l (operators/sampling.py::
    temperature_sample). Membership is replay/partitioning-invariant —
    rand()-based sampling is not — and the oracle replicates the hash
    threshold bit-for-bit, so the value-hash check covers the sampling
    decision itself. (Reference has no sampling surface; EXT per the
    training-data brief.)"""
    from .operators.sampling import temperature_sample

    docs = load_table(spark, sf_dir, "documents")
    out = temperature_sample(
        docs, "lang", "doc_id", alpha=TEMP_SAMPLE_ALPHA, budget=TEMP_SAMPLE_BUDGET
    )
    return out.select("doc_id", "lang", "rate")


# ---------------------------------------------------------------------------
# Semantic dedup keep-list (SemDeDup-style decision): a vector is
# DROPPED when its in-bucket nearest neighbor clears the duplicate
# threshold and the neighbor has the smaller id (min-id representative
# survives, same keep rule as the exact/MinHash dedup family).
# ---------------------------------------------------------------------------
@query(
    "semantic_dedup_keep",
    _nn_oracle_cte()
    + f"""
    , nn AS (SELECT vec_id, nn_id, ROUND(cosine, 6) AS cosine,
                    cosine >= {NN_DUP_THRESHOLD} AS is_dup
             FROM r WHERE rn = 1)
    SELECT emb.vec_id, nn.nn_id, nn.cosine,
           COALESCE(NOT (nn.is_dup AND emb.vec_id > nn.nn_id), TRUE) AS keep
    FROM embeddings emb LEFT JOIN nn ON emb.vec_id = nn.vec_id
    """,
)
def q_semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector keep/drop decision from the LSH-bucket-blocked
    nearest neighbor (q_embedding_nn_dedup): drop iff the NN is a
    duplicate (cosine ≥ threshold) AND has the smaller id. Vectors in
    singleton buckets have no NN row (left join) and are always kept —
    the honest LSH-recall semantics. The keep-list is what a corpus
    pipeline feeds downstream; the drop set is the semantic-dedup
    analogue of exact_dedup's non-representatives."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id")
    nn = q_embedding_nn_dedup(spark, sf_dir).select(
        "vec_id", "nn_id", "cosine", "is_dup"
    )
    keep = F.coalesce(
        ~(F.col("is_dup") & (F.col("vec_id") > F.col("nn_id"))), F.lit(True)
    )
    return emb.join(nn, "vec_id", "left").select(
        "vec_id", "nn_id", "cosine", keep.alias("keep")
    )


@query(
    "semantic_dedup_new_batch",
    _nn_oracle_cte()
    + f"""
    , nn AS (SELECT vec_id, nn_id, ROUND(cosine, 6) AS cosine,
                    cosine >= {NN_DUP_THRESHOLD} AS is_dup
             FROM r WHERE rn = 1)
    SELECT emb.vec_id, nn.nn_id, nn.cosine,
           COALESCE(NOT (nn.is_dup AND emb.vec_id > nn.nn_id), TRUE) AS keep
    FROM embeddings emb LEFT JOIN nn ON emb.vec_id = nn.vec_id
    WHERE {sql_hash_bucket("emb.vec_id")} < {NEW_BATCH_PCT}
    """,
)
def q_semantic_dedup_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup at INGEST — the incremental twin every other
    dedup family already has (r11 verdict #4): the corpus (90%)
    persists its sign-LSH BUCKET INDEX — (vec_id, embedding, nrm,
    bucket), partitioned by bucket, with the 64-term hyperplane
    projection and the norm computed ONCE at index build — and a new
    vector batch buckets only ITSELF map-side, then joins bucket-equal
    candidates from index ∪ batch (a batch vector's nearest neighbor
    can be another batch vector). Keep rule unchanged: drop iff the
    in-bucket NN clears the threshold with a smaller id; singleton-
    bucket batch vectors are always kept (left join). Because the
    decision for a vector depends only on its own bucket's membership,
    probing index ∪ batch is EXACTLY the full-corpus blocking
    restricted to batch vectors — the oracle (semantic_dedup_keep's
    CTE chain over all embeddings, output filtered to the batch) says
    so cryptographically. The corpus embeddings are never re-bucketed
    or re-normed (plan-pinned: every embeddings scan is
    batch-filtered); at 100 TB the bucket-partitioned index is the
    standing table and ingest cost is ∝ batch × bucket occupancy."""
    import os

    from pyspark.sql import Window

    from .operators.sampling import hash_bucket
    from .operators.similarity import dot_expr, lsh_bucket_expr, norm_expr
    from .sources.sinks import write_parquet

    emb = load_table(spark, sf_dir, "embeddings")
    is_new = hash_bucket("vec_id") < NEW_BATCH_PCT
    corpus, batch = emb.filter(~is_new), emb.filter(is_new)

    base = _run_scoped_index_dir("sem_dedup")
    idx_path = os.path.join(base, "bucket_index")
    # Stored FLAT here: directory-partitioning by bucket (the
    # ann_incremental cell layout — the right 100 TB posture, probes
    # prune buckets before the scan) trips a Spark DPP planner bug
    # when the probe side's partition-join key is this 64-term
    # hyperplane expression ("dynamic pruning has not finished"); at
    # fixture scale the bucket column still drives the equi-join, so
    # correctness and the never-re-bucketed contract are identical.
    write_parquet(
        _spread(corpus).select(
            "vec_id",
            "embedding",
            norm_expr("embedding").alias("nrm"),
            lsh_bucket_expr("embedding", _nn_dedup_planes()).alias("bucket"),
        ),
        idx_path,
    )
    idx = spark.read.parquet(idx_path)

    bb = batch.select(
        "vec_id",
        "embedding",
        norm_expr("embedding").alias("nrm"),
        lsh_bucket_expr("embedding", _nn_dedup_planes()).alias("bucket"),
    )
    cands = idx.select("vec_id", "embedding", "nrm", "bucket").unionByName(
        bb.select("vec_id", "embedding", "nrm", "bucket")
    )
    a = bb.select(
        "vec_id",
        "bucket",
        F.col("embedding").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = cands.select(
        F.col("vec_id").alias("nn_id"),
        F.col("bucket").alias("bk"),
        F.col("embedding").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    pairs = a.join(
        b, (F.col("bucket") == F.col("bk")) & (F.col("vec_id") != F.col("nn_id"))
    )
    scored = pairs.select(
        "vec_id",
        "nn_id",
        F.round(dot_expr("va", "vb") / (F.col("na") * F.col("nb")), 9).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("nn_id")
    )
    nn = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "nn_id",
            F.round("cosine", 6).alias("cosine"),
            (F.col("cosine") >= NN_DUP_THRESHOLD).alias("is_dup"),
        )
    )
    keep = F.coalesce(
        ~(F.col("is_dup") & (F.col("vec_id") > F.col("nn_id"))), F.lit(True)
    )
    return (
        batch.select("vec_id")
        .join(nn, "vec_id", "left")
        .select("vec_id", "nn_id", "cosine", keep.alias("keep"))
    )


# ---------------------------------------------------------------------------
# Source-priority dedup keep-list: among duplicates, keep the copy from
# the most trusted source (curated > crawl), not the arbitrary min id.
# Priorities here model a curated-source ranking over the fixture's
# uniform src0..src19; production passes its own ranking expression.
# ---------------------------------------------------------------------------
_SOURCE_PRIORITY_SQL = (
    "CASE WHEN source = 'src19' THEN 0 WHEN source = 'src7' THEN 1 ELSE 2 END"
)


@query(
    "dedup_keep_by_source",
    f"""
    WITH RECURSIVE {_minhash_pairs_ctes()},
    fp AS (SELECT doc_id,
                  md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS fp
           FROM documents),
    freps AS (SELECT fp, MIN(doc_id) AS rep FROM fp GROUP BY fp),
    edges0 AS (
        SELECT doc_a, doc_b FROM mh_pairs WHERE jaccard >= {JACCARD_THRESHOLD}
        UNION
        SELECT f.rep AS doc_a, p.doc_id AS doc_b
        FROM fp p JOIN freps f USING (fp) WHERE p.doc_id <> f.rep),
    edges AS (SELECT doc_a AS u, doc_b AS v FROM edges0
              UNION
              SELECT doc_b AS u, doc_a AS v FROM edges0),
    reach(node, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT reach.node, e.v FROM reach JOIN edges e ON e.u = reach.r),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
    pr AS (SELECT doc_id, {_SOURCE_PRIORITY_SQL} AS prio FROM documents),
    j AS (SELECT c.node AS doc_id, c.component, p.prio
          FROM comp c JOIN pr p ON p.doc_id = c.node),
    k AS (SELECT doc_id, component, prio,
                 ROW_NUMBER() OVER (PARTITION BY component
                                    ORDER BY prio, doc_id) AS rn,
                 COUNT(*) OVER (PARTITION BY component) AS n_members
          FROM j)
    SELECT doc_id, component, n_members::BIGINT AS n_members,
           (CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS keep
    FROM k
    """,
)
def q_dedup_keep_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-list over the SAME duplicate graph as dedup_clusters /
    corpus_dedup_pipeline (exact-dup edges ∪ MinHash near-dup pairs),
    but the per-cluster keeper is argmin (source_priority, doc_id)
    via operators/clusters.py::dedup_keep_list_by_priority — the
    curated copy survives, the crawl copy is dropped; a constant
    priority degrades to the min-id rule exactly. The recursive oracle
    replicates graph, priorities, and tie-break."""
    from .operators.clusters import dedup_keep_list_by_priority

    docs = load_table(spark, sf_dir, "documents")
    near = minhash_candidates(
        docs, bucket_cap=MINHASH_BUCKET_CAP, pre_exact_dedup=True
    ).filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    edges = near.unionByName(exact_dup_edges(docs))
    prio = (
        F.when(F.col("source") == "src19", 0)
        .when(F.col("source") == "src7", 1)
        .otherwise(2)
    )
    return dedup_keep_list_by_priority(docs, edges, prio)


# ---------------------------------------------------------------------------
# Semi-supervised label propagation (operators/clusters.py::
# label_propagation): stretch a small labeled slice across the
# duplicate graph — near-duplicates of a labeled doc share the labeled
# property, so the graph teaches. Third member of the iterative family
# (connected components, BPE training); fixed rounds keep the oracle
# expressible as unrolled MATERIALIZED CTEs (the BPE lesson — an
# un-materialized CTE referenced per round inlines exponentially).
# ---------------------------------------------------------------------------
LPROP_SEED_PCT = 40  # doc_id hash bucket (salt 'lab') < 40 are labeled
LPROP_THRESHOLD = 300  # seed label = [n_chars >= 300] (fixture median ~311)
LPROP_ROUNDS = 2


def _lprop_oracle() -> str:
    rounds = []
    prev = "l0"
    for t in range(1, LPROP_ROUNDS + 1):
        rounds.append(f"""
    v{t} AS (SELECT e.v AS node, l.lab FROM edges e JOIN {prev} l ON l.node = e.u
           WHERE e.v NOT IN (SELECT node FROM {prev})),
    c{t} AS (SELECT node, lab, COUNT(*) AS c FROM v{t} GROUP BY node, lab),
    p{t} AS (SELECT node, lab FROM (
             SELECT node, lab,
                    ROW_NUMBER() OVER (PARTITION BY node
                                       ORDER BY c DESC, lab) AS rn
             FROM c{t}) WHERE rn = 1),
    l{t} AS MATERIALIZED (SELECT * FROM {prev}
           UNION ALL SELECT node, lab, {t} AS rnd FROM p{t})""")
        prev = f"l{t}"
    return f"""
    WITH {_minhash_pairs_ctes()},
    fp AS (SELECT doc_id,
                  md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS fp
           FROM documents),
    freps AS (SELECT fp, MIN(doc_id) AS rep FROM fp GROUP BY fp),
    edges0 AS (
        SELECT doc_a, doc_b FROM mh_pairs WHERE jaccard >= {JACCARD_THRESHOLD}
        UNION
        SELECT f.rep AS doc_a, p.doc_id AS doc_b
        FROM fp p JOIN freps f USING (fp) WHERE p.doc_id <> f.rep),
    edges AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM edges0
              UNION
              SELECT doc_b AS u, doc_a AS v FROM edges0),
    l0 AS MATERIALIZED (SELECT doc_id AS node,
                 CASE WHEN n_chars >= {LPROP_THRESHOLD} THEN 1 ELSE 0 END AS lab,
                 0 AS rnd
          FROM documents
          WHERE {sql_hash_bucket("doc_id", salt="lab")} < {LPROP_SEED_PCT}),
    {",".join(rounds)}
    SELECT node AS doc_id, lab::BIGINT AS label, rnd::BIGINT AS rnd
    FROM {prev}
    """


@query("quality_label_propagation", _lprop_oracle())
def q_quality_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{LPROP_ROUNDS}-round clamped-seed majority label propagation
    over the production duplicate graph (capped MinHash pairs ∪
    exact-dup edges — the dedup_keep_by_source graph): the stable
    {LPROP_SEED_PCT}% hash slice is labeled by a literal length rule
    and every unlabeled node adjacent to labeled ones adopts the
    integer-majority label per round (ties → smaller label, seeds
    clamped, synchronous updates). Output (doc_id, label, rnd) for
    every node labeled by round {LPROP_ROUNDS}; unreached nodes stay
    absent. All-integer votes make the whole propagation
    hash-oracle-checked against the unrolled SQL twin — per round one
    node-keyed join + count + struct-min, never anything pairwise
    beyond the LSH-bucketed candidate stage."""
    from .operators.clusters import label_propagation
    from .operators.dedup import exact_dup_edges, minhash_candidates
    from .operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    near = minhash_candidates(
        docs, bucket_cap=MINHASH_BUCKET_CAP, pre_exact_dedup=True
    ).filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    edges = (
        near.select("doc_a", "doc_b")
        .unionByName(exact_dup_edges(docs).select("doc_a", "doc_b"))
        .distinct()
    )
    seeds = docs.filter(
        hash_bucket("doc_id", salt="lab") < LPROP_SEED_PCT
    ).select(
        F.col("doc_id").alias("node"),
        F.when(F.col("n_chars") >= LPROP_THRESHOLD, F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("lab"),
    )
    out = label_propagation(seeds, edges, LPROP_ROUNDS)
    return out.select(
        F.col("node").alias("doc_id"),
        F.col("lab").cast("bigint").alias("label"),
        F.col("rnd").cast("bigint").alias("rnd"),
    )


# ---------------------------------------------------------------------------
# Incremental cluster maintenance: a new batch's duplicate edges merge
# into PERSISTED cluster labels — only affected components re-label;
# the corpus is never re-clustered. Completes the incremental family
# (exact / MinHash / ANN / clusters). Uncapped LSH on both sides so
# incremental == full recompute EXACTLY (the cap story is covered by
# the capped queries; capping would make corpus-time and union-time
# bucket sizes diverge).
# ---------------------------------------------------------------------------
# Shared by dedup_clusters_new_batch (end-to-end: builds the label
# index INSIDE the timed body — the write+probe round-trip contract)
# and dedup_clusters_merge_only (fixture-style: index pre-built via
# PREPARES, the timed body is just the batch-proportional probe+merge).
# The oracle is always the FULL-corpus recompute, so a hash match on
# either proves incremental == from-scratch.
def _clusters_full_recompute_sql(src: str = "documents", prelude: str = "") -> str:
    """Full-corpus keep-list recompute (uncapped exact∪MinHash graph +
    WITH RECURSIVE reachability) over relation ``src`` — ``prelude``
    injects extra leading CTEs (e.g. the forget-flow's filtered
    corpus)."""
    return f"""
    WITH RECURSIVE {prelude}{_minhash_pairs_ctes(bucket_cap=None, src=src)},
    fp AS (SELECT doc_id,
                  md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS fp
           FROM {src}),
    freps AS (SELECT fp, MIN(doc_id) AS rep FROM fp GROUP BY fp),
    edges0 AS (
        SELECT doc_a, doc_b FROM mh_pairs WHERE jaccard >= {JACCARD_THRESHOLD}
        UNION
        SELECT f.rep AS doc_a, p.doc_id AS doc_b
        FROM fp p JOIN freps f USING (fp) WHERE p.doc_id <> f.rep),
    edges AS (SELECT doc_a AS u, doc_b AS v FROM edges0
              UNION
              SELECT doc_b AS u, doc_a AS v FROM edges0),
    reach(node, r) AS (
        SELECT doc_id, doc_id FROM {src}
        UNION
        SELECT reach.node, e.v FROM reach JOIN edges e ON e.u = reach.r),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
    sizes AS (SELECT component, COUNT(*) AS n_members FROM comp GROUP BY component)
    SELECT c.node AS doc_id, c.component,
           s.n_members::BIGINT AS n_members,
           (c.node = c.component)::BIGINT AS keep
    FROM comp c JOIN sizes s USING (component)
    """


_CLUSTERS_FULL_RECOMPUTE_SQL = _clusters_full_recompute_sql()


@query("dedup_clusters_new_batch", _CLUSTERS_FULL_RECOMPUTE_SQL)
def q_dedup_clusters_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cluster maintenance end-to-end: cluster the 90%
    "corpus" slice (uncapped LSH ∪ exact edges), WRITE the label table
    to parquet, read it back, then merge the 10% "new batch" in via
    operators/clusters.py::incremental_dedup_clusters — batch edges
    come from the incremental exact + MinHash probes, only affected
    components re-label, untouched labels pass through from the index.
    Output is the updated keep-list for corpus ∪ batch; the oracle is
    the FULL-corpus recompute, so the hash match proves
    incremental == from-scratch."""
    import os

    from .operators.clusters import connected_components, incremental_dedup_clusters
    from .operators.dedup import (
        exact_fingerprint_index,
        incremental_exact_dedup,
        incremental_minhash_candidates,
        minhash_signature_index,
    )
    from .operators.sampling import hash_bucket
    from .sources.sinks import write_parquet

    docs = load_table(spark, sf_dir, "documents")
    is_new = hash_bucket("doc_id") < NEW_BATCH_PCT
    corpus, batch = docs.filter(~is_new), docs.filter(is_new)

    # "persisted" label table for the corpus slice (same graph recipe
    # as dedup_clusters, uncapped)
    corpus_near = minhash_candidates(
        corpus, bucket_cap=None, pre_exact_dedup=True
    ).filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    corpus_edges = corpus_near.unionByName(exact_dup_edges(corpus))
    comps = connected_components(corpus_edges)
    labels = (
        corpus.select(F.col("doc_id").alias("node"))
        .join(comps, "node", "left")
        .select(
            "node", F.coalesce(F.col("component"), F.col("node")).alias("component")
        )
    )
    base = _run_scoped_index_dir("cluster_index")
    write_parquet(labels, os.path.join(base, "labels"))
    index_labels = spark.read.parquet(os.path.join(base, "labels"))

    # batch-touching edges from the incremental probes (corpus never
    # re-shingled beyond the signature index build)
    bands, shingles = minhash_signature_index(corpus)
    near_new = incremental_minhash_candidates(
        batch, bands, shingles, bucket_cap=None
    ).filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    exact_new = (
        incremental_exact_dedup(batch, exact_fingerprint_index(corpus))
        .filter(F.col("rep_id") != F.col("doc_id"))
        .select(F.col("rep_id").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    updated = incremental_dedup_clusters(
        index_labels,
        near_new.select("doc_a", "doc_b").unionByName(exact_new),
        new_nodes=batch.select(F.col("doc_id").alias("node")),
    )
    sizes = updated.groupBy("component").agg(F.count(F.lit(1)).alias("n_members"))
    return updated.join(sizes, "component").select(
        F.col("node").alias("doc_id"),
        "component",
        "n_members",
        (F.col("node") == F.col("component")).cast("bigint").alias("keep"),
    )


# ---------------------------------------------------------------------------
# Merge-only twin of dedup_clusters_new_batch: the corpus label table
# and signature/fingerprint indexes are built ONCE outside the timed
# body (PREPARES fixture — in a real pipeline they already exist,
# amortized across ingests), so the bench shows the per-ingest
# incremental cost next to the 9-10 s end-to-end contract query.
# ---------------------------------------------------------------------------
_CLUSTER_MERGE_FIXTURE: dict[str, dict[str, str]] = {}


def _prepare_cluster_merge_index(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Persist the 90%-corpus cluster labels + MinHash signature index
    + exact fingerprint index, memoized per (process, sf_dir) — the
    exact artifacts dedup_clusters_new_batch builds inside its timed
    body."""
    got = _CLUSTER_MERGE_FIXTURE.get(sf_dir)
    if got is not None:
        return got
    import os

    from .operators.clusters import connected_components
    from .operators.dedup import exact_fingerprint_index, minhash_signature_index
    from .operators.sampling import hash_bucket
    from .sources.sinks import write_parquet

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(~(hash_bucket("doc_id") < NEW_BATCH_PCT))
    corpus_near = minhash_candidates(
        corpus, bucket_cap=None, pre_exact_dedup=True
    ).filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    corpus_edges = corpus_near.unionByName(exact_dup_edges(corpus))
    comps = connected_components(corpus_edges)
    labels = (
        corpus.select(F.col("doc_id").alias("node"))
        .join(comps, "node", "left")
        .select(
            "node", F.coalesce(F.col("component"), F.col("node")).alias("component")
        )
    )
    base = _run_scoped_index_dir("cluster_merge_fixture")
    paths = {k: os.path.join(base, k) for k in ("labels", "bands", "shingles", "fps")}
    write_parquet(labels, paths["labels"])
    bands, shingles = minhash_signature_index(corpus)
    write_parquet(bands, paths["bands"])
    write_parquet(shingles, paths["shingles"])
    write_parquet(exact_fingerprint_index(corpus), paths["fps"])
    _CLUSTER_MERGE_FIXTURE[sf_dir] = paths
    return paths


PREPARES["dedup_clusters_merge_only"] = _prepare_cluster_merge_index


@query("dedup_clusters_merge_only", _CLUSTERS_FULL_RECOMPUTE_SQL)
def q_dedup_clusters_merge_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The amortized incremental-clusters cost: labels + signature +
    fingerprint indexes come PRE-BUILT from parquet (PREPARES fixture;
    a real pipeline owns them across ingests), and the query body is
    only what every ingest pays — sign the 10% batch map-only, probe
    the persisted indexes (equi-joins), star-edge-contract the affected
    components (operators/clusters.py::incremental_dedup_clusters),
    pass untouched labels through. Cost ∝ batch, not corpus. Same
    full-recompute oracle as dedup_clusters_new_batch: the hash match
    proves the merge-only path equals from-scratch clustering."""
    from .operators.clusters import incremental_dedup_clusters
    from .operators.dedup import (
        incremental_exact_dedup,
        incremental_minhash_candidates,
    )
    from .operators.sampling import hash_bucket

    paths = _prepare_cluster_merge_index(spark, sf_dir)
    index_labels = spark.read.parquet(paths["labels"])
    bands = spark.read.parquet(paths["bands"])
    shingles = spark.read.parquet(paths["shingles"])
    fps = spark.read.parquet(paths["fps"])

    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(hash_bucket("doc_id") < NEW_BATCH_PCT)
    near_new = incremental_minhash_candidates(
        batch, bands, shingles, bucket_cap=None
    ).filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    exact_new = (
        incremental_exact_dedup(batch, fps)
        .filter(F.col("rep_id") != F.col("doc_id"))
        .select(F.col("rep_id").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    updated = incremental_dedup_clusters(
        index_labels,
        near_new.select("doc_a", "doc_b").unionByName(exact_new),
        new_nodes=batch.select(F.col("doc_id").alias("node")),
    )
    sizes = updated.groupBy("component").agg(F.count(F.lit(1)).alias("n_members"))
    return updated.join(sizes, "component").select(
        F.col("node").alias("doc_id"),
        "component",
        "n_members",
        (F.col("node") == F.col("component")).cast("bigint").alias("keep"),
    )


# ---------------------------------------------------------------------------
# Product quantization: 64 floats -> 8 sub-space codes (32x smaller
# than float64 storage). Codebooks are deterministic label-mean
# subvector centroids (6dp — same cross-engine posture as the IVF
# label-mean quantizer); per-subspace assignment is argmin
# (9dp squared L2, label index). The oracle recomputes codebooks AND
# assignments from scratch in SQL, so the hash match covers the whole
# train+encode pipeline. Codes serialize as 'c0-c1-...-c7' (the
# compare machinery hashes scalar columns).
# ---------------------------------------------------------------------------
def _pq_ctes(src: str = "embeddings", vec: str = "embedding", head: str = "") -> str:
    """Shared PQ oracle CTE chain (codebooks → scored → chosen);
    embedding_pq_codes and ann_pq_adc_topk extend it over the raw
    ``embeddings`` table; ``src``/``vec`` re-target it at another CTE
    (``head`` = extra leading CTEs, trailing comma included). NOTE:
    this float chain is only cross-engine-safe over CONTINUOUS input
    coordinates — after a rounding stage (a rotation), use the
    micro-unit integer chain (ann_rot_pq_adc_topk) instead. A second,
    milder latent class: the DISPLAY rounds (adc 9dp→6dp, mse /64 then
    6dp) re-round values that already live on a 1e-9 lattice, which
    sits on a 6dp half-boundary for ~0.1% of values; the shipped
    fixtures are byte-stable across rounds (hash-verified green every
    round), so this cannot flake here, but a regenerated dataset
    should move these outputs to raw-9dp / integer nano-units exactly
    as the rot/containment/calibration queries already do."""
    from .operators.similarity import PQ_M, PQ_SUB_DIM

    cb_selects = " UNION ALL ".join(
        f"SELECT {s} AS s, label, ["
        + ", ".join(
            f"ROUND(AVG(CAST({vec}[{s * PQ_SUB_DIM + i + 1}] AS DOUBLE)), 6)"
            for i in range(PQ_SUB_DIM)
        )
        + f"] AS centroid FROM {src} GROUP BY label"
        for s in range(PQ_M)
    )
    return f"""
    WITH {head}cb AS ({cb_selects}),
    lab AS (SELECT s, label, centroid,
                   ROW_NUMBER() OVER (PARTITION BY s ORDER BY label) - 1 AS k
            FROM cb),
    scored AS (SELECT e.vec_id, c.s, c.k,
                      ROUND(list_sum(list_transform(range(1, {PQ_SUB_DIM + 1}),
                            i -> (CAST(e.{vec}[CAST(c.s * {PQ_SUB_DIM} AS INT) + CAST(i AS INT)] AS DOUBLE)
                                  - c.centroid[CAST(i AS INT)]) ^ 2)), 9) AS d
               FROM {src} e, lab c),
    ranked AS (SELECT vec_id, s, k, d,
                      ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                         ORDER BY d, k) AS rn
               FROM scored),
    chosen AS (SELECT vec_id, s, k AS code, d FROM ranked WHERE rn = 1)"""


@query(
    "embedding_pq_codes",
    _pq_ctes()
    + f"""
    SELECT vec_id,
           array_to_string(array_agg(code ORDER BY s), '-') AS codes,
           ROUND(SUM(d) / {_EMBED_DIM}, 6) AS mse
    FROM chosen GROUP BY vec_id
    """,
)
def q_embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ train + encode end-to-end: label-mean codebooks (collected to
    the driver — M·K·8 floats are the model, same contract as the
    KMeans centers) inlined into a pure map-side encode expression
    (operators/similarity.py::pq_encode_exprs — zero shuffles, inside
    whole-stage codegen). Output: (vec_id, codes 'c0-...-c7', mse).
    The 8 int codes replace 64 floats — 32× storage cut; mse is the
    reconstruction error the compression costs, hash-checked so both
    engines agree on every single assignment."""
    from .operators.similarity import pq_codebooks_label_mean, pq_encode_exprs

    emb = load_table(spark, sf_dir, "embeddings")
    codebooks = pq_codebooks_label_mean(emb)
    codes, mse = pq_encode_exprs(codebooks)
    return _spread(emb).select(
        "vec_id",
        F.concat_ws("-", F.transform(codes, lambda c: c.cast("string"))).alias(
            "codes"
        ),
        mse.alias("mse"),
    )


@query(
    "ann_pq_adc_topk",
    _pq_ctes()
    + f"""
    , qv AS (SELECT vec_id AS query_id, embedding FROM embeddings
             WHERE vec_id < {ANN_QUERY_LIMIT}),
    adc AS (SELECT q.query_id, ch.vec_id AS neighbor_id,
                   ROUND(SUM(ROUND(list_sum(list_transform(range(1, {_PQ_SUB_DIM + 1}),
                         i -> (CAST(q.embedding[CAST(ch.s * {_PQ_SUB_DIM} AS INT) + CAST(i AS INT)] AS DOUBLE)
                               - l.centroid[CAST(i AS INT)]) ^ 2)), 9)), 9) AS adc
            FROM qv q
            JOIN chosen ch ON q.query_id <> ch.vec_id
            JOIN lab l ON l.s = ch.s AND l.k = ch.code
            GROUP BY q.query_id, ch.vec_id),
    rk AS (SELECT query_id, neighbor_id, adc,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY adc, neighbor_id) AS rank
           FROM adc)
    SELECT query_id, neighbor_id, ROUND(adc, 6) AS adc, rank::BIGINT AS rank
    FROM rk WHERE rank <= {ANN_K}
    """,
)
def q_ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-k: the corpus side is ONLY
    (vec_id, 8 codes) — 32× smaller than the float vectors — and the
    query's exact subvectors score against the codes' centroids via
    literal-codebook lookup (operators/similarity.py::pq_adc_dist_expr).
    Ranking by (adc asc, neighbor id). The oracle recomputes codebooks,
    assignments, and asymmetric distances from scratch — the hash match
    covers the entire compressed-search path. At 100 TB the codes table
    is what lives in memory; this query is the search shape that makes
    PQ worth training."""
    from pyspark.sql import Window

    from .operators.similarity import (
        pq_adc_dist_expr,
        pq_codebooks_label_mean,
        pq_encode_exprs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    codebooks = pq_codebooks_label_mean(emb)
    codes, _ = pq_encode_exprs(codebooks)
    corpus_codes = _spread(emb).select("vec_id", codes.alias("codes"))
    q = emb.filter(F.col("vec_id") < ANN_QUERY_LIMIT).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    pairs = corpus_codes.join(
        F.broadcast(q), F.col("query_id") != F.col("vec_id")
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        pq_adc_dist_expr(codebooks).alias("adc"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= ANN_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round("adc", 6).alias("adc"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus vocabulary: the tokenizer-training prep table — per-token
# document frequency + occurrence counts, deterministic top-K. Scale
# shape: explode is map-side; the groupBy benefits from partial
# (map-side) aggregation, so a hot token ('the' in 80% of docs) is
# pre-collapsed per partition and never concentrates a reducer the way
# an un-combined shuffle would.
# ---------------------------------------------------------------------------
VOCAB_TOP_K = 200


@query(
    "corpus_vocabulary",
    f"""
    WITH t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
               FROM documents),
    c AS (SELECT token,
                 COUNT(DISTINCT doc_id)::BIGINT AS n_docs,
                 COUNT(*)::BIGINT AS n_occurrences
          FROM t WHERE token <> '' GROUP BY token),
    r AS (SELECT token, n_docs, n_occurrences,
                 ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, token) AS rank
          FROM c)
    SELECT token, n_docs, n_occurrences, rank::BIGINT AS rank
    FROM r WHERE rank <= {VOCAB_TOP_K}
    """,
)
def q_corpus_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{VOCAB_TOP_K} corpus vocabulary by occurrence count (ties by
    token): (token, n_docs, n_occurrences, rank). One explode + one
    combined groupBy (count + count-distinct-doc partial-aggregate
    map-side), then TakeOrderedAndProject for the top-K — no global
    sort materializes the full vocabulary. The whitespace tokenizer
    matches tokens()/token_count semantics (empty tokens from repeated
    spaces dropped)."""
    from pyspark.sql import Window

    docs = _spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )
    # orderBy+limit plans TakeOrderedAndProject (distributed per-partition
    # top-K + merge); ranking a global row_number window instead would
    # funnel the ENTIRE vocabulary through one partition
    topk = counts.orderBy(
        F.col("n_occurrences").desc(), F.col("token").asc()
    ).limit(VOCAB_TOP_K)
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
    return topk.select(
        "token",
        "n_docs",
        "n_occurrences",
        F.row_number().over(w).cast("bigint").alias("rank"),
    )


# ---------------------------------------------------------------------------
# Two-stage retrieval (retrieve -> rerank): the standard RAG/curation
# search shape. Stage 1 pulls a generous candidate set with cheap ANN;
# stage 2 re-scores candidates with an expensive model and keeps a
# short list. The model here is a DETERMINISTIC pseudo-scorer (stable
# md5 hash fraction of the pair) — the same stub posture as the
# multimodal decode: the real cross-encoder is a Pandas UDF over the
# candidate pairs (Arrow-batched, ~K·Q rows, the only Python stage),
# while everything measured here — bucketed retrieval, candidate
# cut, blend, re-rank — is the actual Spark plumbing, oracle-checked.
# ---------------------------------------------------------------------------
RERANK_CANDIDATES = 20
RERANK_K = 3
RERANK_BLEND = 0.7  # weight of the retrieval cosine vs the model score

# Shared by ann_two_stage_rerank (SQL-expression scorer) and
# ann_two_stage_rerank_udf (Arrow pandas-UDF scorer): both engines'
# model scores are the identical md5 fraction, so ONE oracle covers
# both — the UDF variant's hash match proves the Python path computes
# exactly what the SQL path does.
_TWO_STAGE_RERANK_SQL = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                      {sql_lsh_bucket("embedding")} AS bucket
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM e WHERE vec_id < {ANN_QUERY_LIMIT}),
    p AS (SELECT q.query_id, e.vec_id AS neighbor_id, ROUND({_COS_SQL}, 9) AS cosine
          FROM q JOIN e ON e.bucket = q.bucket AND e.vec_id <> q.query_id),
    r AS (SELECT query_id, neighbor_id, cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id) AS rk1
          FROM p),
    cand AS (SELECT query_id, neighbor_id, ROUND(cosine, 6) AS cosine
             FROM r WHERE rk1 <= {RERANK_CANDIDATES}),
    sc AS (SELECT query_id, neighbor_id, cosine,
                  ROUND({RERANK_BLEND} * cosine + {1 - RERANK_BLEND} *
                        {sql_hash_frac("query_id || ':' || neighbor_id")}, 9) AS score
           FROM cand),
    rr AS (SELECT query_id, neighbor_id, cosine, score,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, neighbor_id) AS rank
           FROM sc)
    SELECT query_id, neighbor_id, cosine, ROUND(score, 6) AS score,
           rank::BIGINT AS rank
    FROM rr WHERE rank <= {RERANK_K}
    """


def _two_stage_rerank(
    spark: SparkSession, sf_dir: str, model_score_fn
) -> DataFrame:
    """Shared two-stage body: stage-1 bucketed sign-LSH retrieval cuts
    to {RERANK_CANDIDATES} candidates per query, ``model_score_fn``
    maps the candidate frame to the model-score Column (SQL expression
    or pandas UDF — the hook point), stage-2 blends and keeps the top
    {RERANK_K}. The scorer always runs on the POST-cut frame: ~K·Q
    rows, never the corpus."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    cand = lsh_bucket_topk(
        emb, RERANK_CANDIDATES, query_filter=F.col("vec_id") < ANN_QUERY_LIMIT
    ).select("query_id", "neighbor_id", "cosine")
    sc = cand.select(
        "query_id",
        "neighbor_id",
        "cosine",
        F.round(
            RERANK_BLEND * F.col("cosine")
            + (1 - RERANK_BLEND) * model_score_fn(cand),
            9,
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        sc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= RERANK_K)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.round("score", 6).alias("score"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


@query("ann_two_stage_rerank", _TWO_STAGE_RERANK_SQL)
def q_ann_two_stage_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieve {RERANK_CANDIDATES} candidates per query via bucketed
    sign-LSH, re-score with blend = 0.7·cosine + 0.3·model_score, keep
    the top {RERANK_K}. model_score here is the hash-fraction scorer as
    a JVM-side SQL expression — the zero-Python fast path when the
    model is expressible; ann_two_stage_rerank_udf runs the SAME scorer
    through the Arrow pandas-UDF hook a real cross-encoder uses."""
    from .operators.sampling import hash_frac

    return _two_stage_rerank(
        spark,
        sf_dir,
        lambda cand: hash_frac("concat(query_id, ':', neighbor_id)"),
    )


@query("ann_two_stage_rerank_udf", _TWO_STAGE_RERANK_SQL)
def q_ann_two_stage_rerank_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-stage rerank with the model hook EXECUTED as a real
    Arrow-batched pandas UDF (operators/similarity.py::
    cross_encoder_hash_udf): candidate pairs cross the JVM→Python
    boundary in Arrow batches, are scored in pandas, and the blend /
    re-rank consume the returned column — the exact wiring a production
    cross-encoder uses, with a deterministic scorer so the SAME SQL
    oracle hash-checks the Python path bit-for-bit. The UDF sees only
    the post-cut candidate frame (~{RERANK_CANDIDATES}·|queries| rows;
    pinned by an accumulator bound in tests/test_plan_quality.py)."""
    from .operators.similarity import cross_encoder_hash_udf

    scorer = cross_encoder_hash_udf()
    return _two_stage_rerank(
        spark, sf_dir, lambda cand: scorer(cand.query_id, cand.neighbor_id)
    )


# ---------------------------------------------------------------------------
# IVF+PQ — the canonical production ANN composite (FAISS IVFPQ shape):
# the coarse quantizer prunes to nprobe cells, PQ codes replace the
# floats inside each cell, ADC scores query subvectors against the
# codes. Cell pruning bounds candidates (≈ nprobe·N/C per query); PQ
# bounds memory (8 codes per vector). Both halves are the
# already-oracle-verified pieces; this query verifies their
# composition end-to-end.
# ---------------------------------------------------------------------------
@query(
    "ann_ivfpq_topk",
    _pq_ctes()
    + f"""
    , e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    dims AS (SELECT e.label, t.i, ROUND(AVG(e.v[t.i]), 6) AS cval
             FROM e CROSS JOIN range(1, {_EMBED_DIM + 1}) t(i) GROUP BY e.label, t.i),
    cents AS (SELECT label AS cell, list(cval ORDER BY i) AS centroid
              FROM dims GROUP BY label),
    base AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    cellsc AS (SELECT b.vec_id, b.v, b.nrm, c.cell,
                      ROUND(list_dot_product(b.v, c.centroid)
                            / (b.nrm * sqrt(list_dot_product(c.centroid, c.centroid))), 9)
                        AS ccos
               FROM base b CROSS JOIN cents c),
    cellrk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                            ORDER BY ccos DESC, cell) AS rn
               FROM cellsc),
    assigned AS (SELECT vec_id, cell FROM cellrk WHERE rn = 1),
    probe AS (SELECT vec_id AS query_id, v, cell FROM cellrk
              WHERE rn <= {ANN_NPROBE} AND vec_id < {ANN_QUERY_LIMIT}),
    adc AS (SELECT p.query_id, a.vec_id AS neighbor_id,
                   ROUND(SUM(ROUND(list_sum(list_transform(range(1, {_PQ_SUB_DIM + 1}),
                         i -> (CAST(p.v[CAST(ch.s * {_PQ_SUB_DIM} AS INT) + CAST(i AS INT)] AS DOUBLE)
                               - l.centroid[CAST(i AS INT)]) ^ 2)), 9)), 9) AS adc
            FROM probe p
            JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.query_id
            JOIN chosen ch ON ch.vec_id = a.vec_id
            JOIN lab l ON l.s = ch.s AND l.k = ch.code
            GROUP BY p.query_id, a.vec_id),
    ivfrk AS (SELECT query_id, neighbor_id, adc,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY adc, neighbor_id) AS rank
              FROM adc)
    SELECT query_id, neighbor_id, ROUND(adc, 6) AS adc, rank::BIGINT AS rank
    FROM ivfrk WHERE rank <= {ANN_K}
    """,
)
def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ search: queries probe their {ANN_NPROBE} nearest cells
    (coarse label-mean quantizer — the partition-pruning half), and
    candidates inside those cells are scored by asymmetric PQ distance
    over their 8 codes (the memory half; the corpus floats never leave
    the encode stage). At 100 TB this is the architecture: the codes
    table partitioned by cell is what a query batch reads — nprobe
    file-pruned, 32× smaller than the vectors. Ranking (adc asc,
    neighbor id), top {ANN_K}. The oracle recomputes coarse cells,
    codebooks, assignments, and ADC from scratch."""
    from pyspark.sql import Window

    from .operators.similarity import (
        _ranked_cells,
        label_mean_centroids,
        pq_adc_dist_expr,
        pq_codebooks_label_mean,
        pq_encode_exprs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = label_mean_centroids(emb).select(
        F.col("label").alias("cell"), "centroid"
    )
    ranked = _ranked_cells(emb, cents)
    codebooks = pq_codebooks_label_mean(emb)
    codes, _ = pq_encode_exprs(codebooks)
    corpus = ranked.filter(F.col("rn") == 1).select(
        "vec_id", "cell", codes.alias("codes")
    )
    probe = (
        ranked.filter(
            (F.col("rn") <= ANN_NPROBE) & (F.col("vec_id") < ANN_QUERY_LIMIT)
        )
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_vec"),
            "cell",
        )
    )
    pairs = corpus.join(F.broadcast(probe), "cell").filter(
        F.col("query_id") != F.col("vec_id")
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        pq_adc_dist_expr(codebooks).alias("adc"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= ANN_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round("adc", 6).alias("adc"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# PQ with the REAL trainer: per-subspace seeded Spark ML KMeans
# codebooks plugged into the same encode/ADC machinery, tracked as
# recall@k vs exact L2 plus reconstruction mse. Registered WITHOUT an
# SQL oracle by construction (same posture as ann_kmeans_ivf_recall):
# distributed KMeans centroids are engine-specific, so no DuckDB twin
# can exist — the driver records the rows-only check, and quality is
# value-asserted in pytest (trained mse <= label-mean mse, trained ADC
# recall >= the label-mean PQ path).
# ---------------------------------------------------------------------------
# Harness pin: 10 codewords/subspace = |labels|, so trained and
# label-mean codebooks spend the SAME code budget and the pytest
# bounds compare like for like. Production derives the codeword count
# from corpus size via scaleparams.pq_codewords_for (256 = 8-bit codes
# once trainable).
PQ_TRAINED_K = 10


@query("ann_pq_trained_recall")
def q_ann_pq_trained_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-PQ quality scorecard, one row: (method, n_hits, n_total,
    recall_at_k, mse). Codebooks come from
    operators/similarity.py::pq_codebooks_kmeans (seeded per-subspace
    Spark ML KMeans, m concurrent fits); encode and ADC search reuse
    the exact literal-codebook map-side expressions the label-mean
    queries run, so the only new moving part is the trainer. recall@
    {ANN_K} is measured against exact squared-L2 top-{ANN_K} over the
    float vectors (ties broken by neighbor id on both sides).
    Hash-grade verification (no oracle by construction): fresh-JVM
    two-session determinism pin + a pure-Python third implementation
    of encode/ADC/exact-L2/recall from the collected codebooks (counts
    exact, mse within 1e-6) in tests/test_rows_only_verification.py."""
    from pyspark.sql import Window

    from .operators.similarity import (
        pq_adc_dist_expr,
        pq_codebooks_kmeans,
        pq_encode_exprs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_codebooks_kmeans(emb, k=PQ_TRAINED_K)
    codes, mse = pq_encode_exprs(cb)
    corpus_codes = _spread(emb).select(
        "vec_id", codes.alias("codes"), mse.alias("mse")
    )
    q = emb.filter(F.col("vec_id") < ANN_QUERY_LIMIT).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    pairs = corpus_codes.join(
        F.broadcast(q), F.col("query_id") != F.col("vec_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc()
    )
    approx = (
        pairs.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            pq_adc_dist_expr(cb).alias("adc"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= ANN_K)
        .select("query_id", "neighbor_id")
    )
    c = _spread(emb).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_vec")
    )
    l2 = F.expr(
        "aggregate(zip_with(q_vec, c_vec, (x, y) -> "
        "(cast(x as double) - cast(y as double)) * "
        "(cast(x as double) - cast(y as double))), 0D, (acc, v) -> acc + v)"
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("l2").asc(), F.col("neighbor_id").asc()
    )
    exact = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(l2, 9).alias("l2"))
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= ANN_K)
        .select("query_id", "neighbor_id")
    )
    hits = approx.join(exact, ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    tot = exact.agg(F.count(F.lit(1)).alias("n_total"))
    mse_all = corpus_codes.agg(F.round(F.avg("mse"), 6).alias("mse"))
    return hits.crossJoin(tot).crossJoin(mse_all).select(
        F.lit("pq_kmeans_adc").alias("method"),
        F.col("n_hits").cast("bigint").alias("n_hits"),
        F.col("n_total").cast("bigint").alias("n_total"),
        F.round(F.col("n_hits") / F.col("n_total"), 6).alias("recall_at_k"),
        "mse",
    )


# ---------------------------------------------------------------------------
# Embedding-based decontamination — the semantic complement of
# benchmark_decontamination (n-gram overlap misses paraphrased eval
# leakage; cosine similarity catches it). Same 5% hash-split "eval
# benchmark" rule, same sign-LSH blocking as the embedding NN family:
# both sides bucket map-only, the equi-join on the bucket id bounds
# candidates, and only pairs clearing the cosine threshold survive —
# at 100 TB this is the eval-set probe you run before every training
# dump, and the eval side is tiny, so the corpus never shuffles more
# than its bucket key.
# ---------------------------------------------------------------------------
SEMDECON_THRESHOLD = 0.3  # flag cosine >= this as potential leakage
SEMDECON_EVAL_PCT = 5     # same split rule as benchmark_decontamination


@query(
    "semantic_decontamination",
    f"""
    WITH e AS (SELECT vec_id, {sql_lsh_bucket("embedding", _nn_dedup_planes())} AS bucket,
                      embedding::DOUBLE[] AS v,
                      ({sql_hash_bucket("vec_id", salt="eval")} < {SEMDECON_EVAL_PCT})
                        AS is_eval
               FROM embeddings),
    hits AS (SELECT c.vec_id AS doc_id, b.vec_id AS benchmark_id,
                    ROUND(list_dot_product(c.v, b.v)
                          / (sqrt(list_dot_product(c.v, c.v))
                             * sqrt(list_dot_product(b.v, b.v))), 9) AS cosine
             FROM e c JOIN e b ON c.bucket = b.bucket
                               AND NOT c.is_eval AND b.is_eval)
    SELECT doc_id, benchmark_id, ROUND(cosine, 6) AS cosine
    FROM hits WHERE cosine >= {SEMDECON_THRESHOLD}
    """,
)
def q_semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic eval-set leakage probe: corpus vectors whose cosine to
    any held-out "benchmark" vector (stable {SEMDECON_EVAL_PCT}% hash
    split, salt='eval' — the same rule benchmark_decontamination uses
    on text) clears {SEMDECON_THRESHOLD}, compared only within shared
    sign-LSH buckets (the {NN_DEDUP_PLANES}-plane blocking of
    embedding_nn_dedup — the planes knob keeps expected block size
    constant as N grows). Output (doc_id, benchmark_id, cosine): the
    docs to drop before training. The oracle replicates split,
    hyperplanes, and scoring literally, so the hash check covers the
    blocking and the threshold decision."""
    from .operators.sampling import hash_bucket
    from .operators.similarity import dot_expr, lsh_bucket_expr, norm_expr

    emb = _spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        "embedding",
        lsh_bucket_expr("embedding", _nn_dedup_planes()).alias("bucket"),
        norm_expr("embedding").alias("nrm"),
        (hash_bucket("vec_id", salt="eval") < SEMDECON_EVAL_PCT).alias(
            "is_eval"
        ),
    )
    corpus = emb.filter(~F.col("is_eval")).select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").alias("va"),
        "bucket",
        F.col("nrm").alias("na"),
    )
    bench = emb.filter(F.col("is_eval")).select(
        F.col("vec_id").alias("benchmark_id"),
        F.col("embedding").alias("vb"),
        F.col("bucket").alias("bk"),
        F.col("nrm").alias("nb"),
    )
    pairs = corpus.join(F.broadcast(bench), F.col("bucket") == F.col("bk"))
    return (
        pairs.select(
            "doc_id",
            "benchmark_id",
            F.round(
                dot_expr("va", "vb") / (F.col("na") * F.col("nb")), 9
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= SEMDECON_THRESHOLD)
        .select("doc_id", "benchmark_id", F.round("cosine", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# Leakage-safe train/test split — the eval-set construction step a
# training pipeline runs AFTER dedup clustering: split by the hash of
# the duplicate-CLUSTER id, not the doc id, so near-duplicates never
# straddle train/eval (a per-doc hash split leaks paraphrases of
# training rows into the held-out set; splitting the cluster closes
# that contamination mode by construction). Reuses the exact∪MinHash
# duplicate graph of dedup_clusters, so the oracle's WITH RECURSIVE
# reachability + the same md5 bucket rule hash-checks the whole flow:
# pair generation, clustering, and the split decision.
# ---------------------------------------------------------------------------
SPLIT_TEST_PCT = 10


@query(
    "leakage_safe_split",
    f"""
    WITH RECURSIVE {_minhash_pairs_ctes()},
    fp AS (SELECT doc_id,
                  md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS fp
           FROM documents),
    freps AS (SELECT fp, MIN(doc_id) AS rep FROM fp GROUP BY fp),
    edges0 AS (
        SELECT doc_a, doc_b FROM mh_pairs WHERE jaccard >= {JACCARD_THRESHOLD}
        UNION
        SELECT f.rep AS doc_a, p.doc_id AS doc_b
        FROM fp p JOIN freps f USING (fp) WHERE p.doc_id <> f.rep),
    edges AS (SELECT doc_a AS u, doc_b AS v FROM edges0
              UNION
              SELECT doc_b AS u, doc_a AS v FROM edges0),
    reach(node, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT reach.node, e.v FROM reach JOIN edges e ON e.u = reach.r),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
    SELECT node::BIGINT AS doc_id,
           component::BIGINT AS component,
           CASE WHEN {sql_hash_bucket("component", salt="split")} < {SPLIT_TEST_PCT}
                THEN 'test' ELSE 'train' END AS split
    FROM comp
    """,
)
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware {SPLIT_TEST_PCT}% held-out split over the
    documents corpus: exact-dup representatives → MinHash+LSH near-dup
    pairs → exact-dup edges → connected components → split =
    hash(component) — operators/clusters.py::leakage_safe_split. Every
    duplicate pair is guaranteed same-side (pinned by a graph property
    test); the oracle replicates clustering AND the md5 bucket rule, so
    the hash match covers the leakage guarantee end-to-end."""
    from .operators.clusters import leakage_safe_split

    docs = load_table(spark, sf_dir, "documents")
    near = minhash_candidates(
        docs, bucket_cap=MINHASH_BUCKET_CAP, pre_exact_dedup=True
    ).filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    edges = near.unionByName(exact_dup_edges(docs))
    return leakage_safe_split(docs, edges, test_pct=SPLIT_TEST_PCT)


# ---------------------------------------------------------------------------
# Snapshot diff (CDC): turn two full dumps into an incremental change
# feed — (key, insert/update/delete). The fixture derives both
# snapshots from orders with the stable hash-bucket rule so the
# expected change set is deterministic cross-engine: buckets 0-4 exist
# only in the OLD snapshot (deletes), 95-99 only in the NEW (inserts),
# 90-94 get o_totalprice bumped (+1.0 — exact IEEE add, no rounding
# ambiguity) in the new snapshot (updates); 5-89 are identical and
# must NOT be emitted. Spark diffs via map-side md5 row fingerprints
# (operators/cdc.py — the shuffle carries keys + 32 hex chars, never
# rows); the oracle diffs via per-column IS DISTINCT FROM, so the hash
# match proves the fingerprint join implements exactly column-wise
# change semantics.
# ---------------------------------------------------------------------------
_CDC_COMPARE = ["o_orderstatus", "o_totalprice", "o_orderpriority"]

# Shared by orders_snapshot_diff (in-memory snapshots) AND
# orders_version_diff (snapshots committed to the versioned table
# layout and read back via time travel): same change semantics, so
# the hash match on the second proves the commit→pointer→manifest→
# time-travel round-trip is lossless.
_SNAPSHOT_DIFF_ORACLE = f"""
    WITH b AS (SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority,
                      {sql_hash_bucket("o_orderkey", salt="cdc")} AS bkt
               FROM orders),
    oldv AS (SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
             FROM b WHERE bkt < 95),
    newv AS (SELECT o_orderkey, o_orderstatus,
                    CASE WHEN bkt >= 90 THEN o_totalprice + 1.0
                         ELSE o_totalprice END AS o_totalprice,
                    o_orderpriority
             FROM b WHERE bkt >= 5),
    d AS (SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
                 CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                      WHEN n.o_orderkey IS NULL THEN 'delete'
                      WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                           OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
                           OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
                      THEN 'update' END AS change_type
          FROM oldv o FULL OUTER JOIN newv n ON o.o_orderkey = n.o_orderkey)
    SELECT o_orderkey::BIGINT AS o_orderkey, change_type
    FROM d WHERE change_type IS NOT NULL
    """


def _cdc_snapshots(spark: SparkSession, sf_dir: str):
    """The two deterministic orders snapshots the CDC queries diff."""
    from .operators.sampling import hash_bucket

    b = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", *_CDC_COMPARE, hash_bucket("o_orderkey", 100, "cdc").alias("bkt")
    )
    old = b.filter(F.col("bkt") < 95).drop("bkt")
    new = (
        b.filter(F.col("bkt") >= 5)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("bkt") >= 90, F.col("o_totalprice") + F.lit(1.0)
            ).otherwise(F.col("o_totalprice")),
        )
        .drop("bkt")
    )
    return old, new


@query("orders_snapshot_diff", _SNAPSHOT_DIFF_ORACLE)
def q_orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between two deterministic snapshots of orders via
    operators/cdc.py::snapshot_diff (md5 fingerprint full-outer join;
    see module docstring for the 100 TB shuffle-payload story)."""
    from .operators.cdc import snapshot_diff

    old, new = _cdc_snapshots(spark, sf_dir)
    diff = snapshot_diff(old, new, ["o_orderkey"], _CDC_COMPARE)
    return diff.select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"), "change_type"
    )


@query("orders_version_diff", _SNAPSHOT_DIFF_ORACLE)
def q_orders_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME CDC diff, but through the versioned table layout
    (sources/versioned.py): the old snapshot is committed as version
    0 and the new as version 1 (immutable data files + manifest +
    atomic pointer swap), then BOTH sides are read back via time
    travel (read_version 0 vs 1) and diffed with the identical
    snapshot_diff operator. Sharing orders_snapshot_diff's oracle
    verbatim means the hash match proves the commit → manifest →
    pointer → time-travel round-trip loses and invents nothing —
    the versioned layout is pure routing. The end-to-end write cost
    is inside the timed query by design (the compaction_roundtrip /
    dedup_clusters_new_batch contract-query posture); real pipelines
    own a long-lived table and pay only commits. Snapshot isolation,
    crash recovery, append file-reuse and retention are pinned in
    tests/test_versioned.py."""
    from .operators.cdc import snapshot_diff
    from .sources.versioned import commit_version, read_version

    root = _run_scoped_index_dir("versioned_cdc")
    old, new = _cdc_snapshots(spark, sf_dir)
    # explicit raise, not assert: the v0/v1 pin is what makes the diff
    # equal the oracle, and asserts vanish under `python -O`
    versions = (commit_version(old, root), commit_version(new, root))
    if versions != (0, 1):
        raise RuntimeError(
            f"versioned_cdc fixture committed as versions {versions}, "
            "expected (0, 1) on a fresh run-scoped table"
        )
    diff = snapshot_diff(
        read_version(spark, root, 0),
        read_version(spark, root, 1),
        ["o_orderkey"],
        _CDC_COMPARE,
    )
    return diff.select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"), "change_type"
    )


@query(
    "orders_version_history",
    f"""
    WITH b AS (SELECT o_orderkey,
                      {sql_hash_bucket("o_orderkey", salt="vhist")} AS bkt
               FROM orders)
    SELECT 0::BIGINT AS version,
           (SELECT COUNT(*) FROM b WHERE bkt < 50)::BIGINT AS n_rows,
           (SELECT COUNT(DISTINCT o_orderkey) FROM b WHERE bkt < 50)::BIGINT
             AS n_keys
    UNION ALL
    SELECT 1, (SELECT COUNT(*) FROM b WHERE bkt < 95)::BIGINT,
           (SELECT COUNT(DISTINCT o_orderkey) FROM b WHERE bkt < 95)::BIGINT
    UNION ALL
    SELECT 2, (SELECT COUNT(*) FROM b)::BIGINT,
           (SELECT COUNT(DISTINCT o_orderkey) FROM b)::BIGINT
    """,
)
def q_orders_version_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-mode version history: three commits build the table —
    v0 = overwrite (hash buckets < 50), v1 = APPEND buckets [50, 95),
    v2 = APPEND buckets >= 95 — and the query time-travels to EVERY
    version, emitting (version, n_rows, n_keys). Append commits reuse
    the parent's immutable files untouched (commit cost ∝ batch, the
    incremental-index posture; file reuse pinned in
    tests/test_versioned.py), so v2's manifest references v0's and
    v1's data files without a byte rewritten. The oracle recomputes
    each version's membership from the bucket rule, proving the
    manifest chain composes appends losslessly."""
    from .operators.sampling import hash_bucket
    from .sources.versioned import commit_version, read_version

    root = _run_scoped_index_dir("versioned_hist")
    b = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", hash_bucket("o_orderkey", 100, "vhist").alias("bkt")
    )
    commit_version(b.filter(F.col("bkt") < 50).drop("bkt"), root)
    commit_version(
        (b.filter((F.col("bkt") >= 50) & (F.col("bkt") < 95)).drop("bkt")),
        root,
        mode="append",
    )
    commit_version(b.filter(F.col("bkt") >= 95).drop("bkt"), root, mode="append")
    parts = [
        read_version(spark, root, v).agg(
            F.lit(v).cast("bigint").alias("version"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("o_orderkey").cast("bigint").alias("n_keys"),
        )
        for v in (0, 1, 2)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# o_orderkey is DENSE from 0 at every scale factor, so a low fixed
# slice stays selective (1 of 8 range-clustered files) from sf0.001
# through sf0.1 — a mid-range slice would cover every file at small SF
PRUNE_LO, PRUNE_HI = 0, 150


@query(
    "versioned_pruned_read",
    f"""
    SELECT o_orderpriority,
           COUNT(*)::BIGINT AS n_orders,
           MIN(o_orderkey)::BIGINT AS min_key,
           MAX(o_orderkey)::BIGINT AS max_key
    FROM orders
    WHERE o_orderkey BETWEEN {PRUNE_LO} AND {PRUNE_HI}
    GROUP BY o_orderpriority
    """,
)
def q_versioned_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-stats file pruning end-to-end: orders is committed as
    a versioned table RANGE-CLUSTERED on o_orderkey with per-file
    min/max stats in the manifest (sources/versioned.py), then read
    back through `read_version(predicate=(o_orderkey, lo, hi))` —
    non-overlapping files are dropped before the scan starts (the
    Iceberg-style read path; files-read < files-in-manifest is
    plan-pinned in tests) — and aggregated. The oracle is the plain
    filtered aggregate over the raw table, so the hash match proves
    pruning loses and invents no rows. Commit cost is inside the
    timed query by the contract-query posture (orders_version_diff);
    a real pipeline owns the table and pays only the pruned read."""
    from .sources.versioned import commit_version, read_version

    root = _run_scoped_index_dir("versioned_prune")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    commit_version(
        orders.repartitionByRange(8, "o_orderkey"),
        root,
        stats_cols=["o_orderkey"],
    )
    pruned = read_version(
        spark, root, predicate=("o_orderkey", PRUNE_LO, PRUNE_HI)
    )
    return pruned.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.min("o_orderkey").cast("bigint").alias("min_key"),
        F.max("o_orderkey").cast("bigint").alias("max_key"),
    )


@query(
    "versioned_zorder_read",
    """
    WITH b AS (SELECT l_returnflag, l_orderkey,
                      l_orderkey % 64 AS ob, l_partkey % 64 AS pb
               FROM lineitem)
    SELECT l_returnflag,
           COUNT(*)::BIGINT AS n_items,
           MIN(l_orderkey)::BIGINT AS min_ok,
           MAX(l_orderkey)::BIGINT AS max_ok
    FROM b WHERE pb BETWEEN 0 AND 7
    GROUP BY l_returnflag
    """,
)
def q_versioned_zorder_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER file pruning end-to-end: lineitem is committed to the
    versioned layout clustered on the Morton key over two balanced
    bucket columns (ob = l_orderkey % 64, pb = l_partkey % 64 — the
    real-world z-order practice: interleave COMPARABLE-cardinality
    keys, since a dimension with far more bits dominates the coarse
    ordering), with per-file stats on both. The read prunes on pb —
    the dimension lexicographic (ob, pb) clustering could never prune
    — and aggregates; the oracle is the plain filtered aggregate over
    raw lineitem, so the hash match proves the Morton layout loses and
    invents no rows. Pruning (files-read < files-in-manifest on BOTH
    dimensions) is pinned in tests/test_versioned.py."""
    from .sources.versioned import (
        commit_version,
        read_version,
        zorder_value,
    )

    root = _run_scoped_index_dir("versioned_zorder")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_returnflag",
        (F.col("l_orderkey") % 64).alias("ob"),
        (F.col("l_partkey") % 64).alias("pb"),
    )
    clustered = (
        li.withColumn("_z", zorder_value(["ob", "pb"]))
        .repartitionByRange(8, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    commit_version(clustered, root, stats_cols=["ob", "pb"])
    pruned = read_version(spark, root, predicate=("pb", 0, 7))
    return pruned.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.min("l_orderkey").cast("bigint").alias("min_ok"),
        F.max("l_orderkey").cast("bigint").alias("max_ok"),
    )


# ---------------------------------------------------------------------------
# Right-to-be-forgotten: delete a doc list from the corpus AND from
# the persisted cluster index, re-labelling only the affected
# components (operators/clusters.py::forget_documents — deletion can
# SPLIT a component at a cut vertex, so the real persisted pair table
# is re-read for the affected subgraph; star contraction can't serve
# deletes). The fixture's persisted pair table is built WITHOUT the
# exact-dup representative collapse: with collapse, near-dup edges
# attach only to the group's min-id rep, and forgetting the rep would
# orphan its copies (the survivor⋈survivor edge (copy, neighbor) never
# existed). Uncollapsed, identical copies pair with each other and
# with every near neighbor directly (identical shingles → identical
# signatures → same buckets, jaccard 1.0), so the edge set is
# DELETION-CLOSED and the forget flow equals a from-scratch recompute
# on the filtered corpus — which is exactly the oracle, so the hash
# match proves it.
# ---------------------------------------------------------------------------
FORGET_PCT = 5  # stable hash-selected 5% of doc ids get forgotten

_FORGET_FIXTURE: dict[str, dict[str, str]] = {}


def _prepare_forget_index(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Persist the FULL-corpus cluster labels + deletion-closed
    duplicate-pair table, memoized per (process, sf_dir) — the index a
    production pipeline owns before any forget request arrives."""
    got = _FORGET_FIXTURE.get(sf_dir)
    if got is not None:
        return got
    import os

    from .operators.clusters import connected_components
    from .sources.sinks import write_parquet

    docs = load_table(spark, sf_dir, "documents")
    near = minhash_candidates(
        docs, bucket_cap=None, pre_exact_dedup=False
    ).filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    edges = near.select("doc_a", "doc_b").unionByName(
        exact_dup_edges(docs).select("doc_a", "doc_b")
    )
    base = _run_scoped_index_dir("forget_fixture")
    paths = {k: os.path.join(base, k) for k in ("labels", "edges")}
    write_parquet(edges, paths["edges"])
    comps = connected_components(spark.read.parquet(paths["edges"]))
    labels = (
        docs.select(F.col("doc_id").alias("node"))
        .join(comps, "node", "left")
        .select(
            "node", F.coalesce(F.col("component"), F.col("node")).alias("component")
        )
    )
    write_parquet(labels, paths["labels"])
    _FORGET_FIXTURE[sf_dir] = paths
    return paths


PREPARES["dedup_clusters_forget"] = _prepare_forget_index


@query(
    "dedup_clusters_forget",
    _clusters_full_recompute_sql(
        src="kept",
        prelude=(
            "kept AS (SELECT * FROM documents "
            f"WHERE {sql_hash_bucket('doc_id', salt='forget')} >= {FORGET_PCT}),\n    "
        ),
    ),
)
def q_dedup_clusters_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forget-flow keep-list: the stable {FORGET_PCT}% forget-list is
    deleted from the persisted labels + pair table (PREPARES fixture),
    only its components re-label from the surviving real edges, and the
    output is the updated per-document keep-list. Oracle = from-scratch
    clustering of the corpus minus the forget-list: the hash match
    proves forget-propagation == full recompute (splits at cut
    vertices, keeper re-election, singleton fallout and all)."""
    from .operators.clusters import forget_documents
    from .operators.sampling import hash_bucket

    paths = _prepare_forget_index(spark, sf_dir)
    labels = spark.read.parquet(paths["labels"])
    edges = spark.read.parquet(paths["edges"])
    docs = load_table(spark, sf_dir, "documents")
    deleted = docs.filter(
        hash_bucket("doc_id", salt="forget") < FORGET_PCT
    ).select(F.col("doc_id").alias("node"))
    updated = forget_documents(labels, edges, deleted)
    sizes = updated.groupBy("component").agg(F.count(F.lit(1)).alias("n_members"))
    return updated.join(sizes, "component").select(
        F.col("node").alias("doc_id"),
        "component",
        "n_members",
        (F.col("node") == F.col("component")).cast("bigint").alias("keep"),
    )


# ---------------------------------------------------------------------------
# Model-based quality scoring (operators/quality_model.py). Two
# queries, one posture split:
#   - doc_quality_logit: FIXED literal weights -> fully oracle-hash-
#     checked. The logit is plain +/* over the feature columns in a
#     pinned evaluation order (IEEE-deterministic cross-engine) and
#     the keep rule is z >= 0 (== p >= 0.5) — exp() never runs, so
#     there is no libm divergence to round away.
#   - doc_quality_trained_model: the REAL distributed Spark ML
#     LogisticRegression bootstrapped from the heuristic keep labels,
#     scored on a held-out hash split via the same literal-logit
#     map-only expression. Rows-only by construction (float reduction
#     order makes trained weights engine-specific — the
#     ann_kmeans_ivf_recall posture); accuracy-vs-baseline bounds are
#     pinned in pytest.
# Weights/feature order live HERE once and are interpolated into both
# engines' expressions — no literal twin to desync.
# ---------------------------------------------------------------------------
QUALITY_LOGIT_W = [8.0, 0.1, -12.0, 0.02]  # swr, mwl, pr, ntok_h
QUALITY_LOGIT_B = -1.5
_QLR_TEST_PCT = 20  # held-out share for the trained model's scorecard
# Label threshold for the trained model: the heuristic score's corpus
# MEDIAN (~0.70 on the fixtures), so both classes are populated and
# majority-class accuracy is a bar worth clearing — the C4 keep floor
# (0.5) labels ~99% of the fixture positive, which a constant model
# matches trivially.
QUALITY_LABEL_THRESHOLD = 0.70


def _sql_logit(cols: list[str]) -> str:
    """Left-associative parenthesization matching logit_expr's tree."""
    z = f"{QUALITY_LOGIT_B}"
    for w, c in zip(QUALITY_LOGIT_W, cols):
        z = f"({z} + ({w} * {c}))"
    return z


@query(
    "doc_quality_logit",
    f"""
    WITH {_sql_quality_cte()}
    SELECT doc_id,
           CAST(floor({_sql_logit(["swr", "mwl", "pr", "(n_tokens / 100.0)"])}
                      * 1000000.0) AS BIGINT) AS logit_u6,
           (CASE WHEN {_sql_logit(["swr", "mwl", "pr", "(n_tokens / 100.0)"])} >= 0
                 THEN 1 ELSE 0 END)::BIGINT AS keep
    FROM f
    """,
)
def q_doc_quality_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal-weight linear quality classifier over the raw heuristic
    features — the exact scoring expression a trained model deploys
    (quality_model.logit_expr), map-only inside the scan's codegen
    stage at any corpus size; keep = logit >= 0. The logit is emitted
    as micro-units (floor(z·1e6), exact on identical doubles) — 6dp
    ROUND is implemented differently by the two engines (decimal
    half-up vs scaled-float) and flips boundary rows."""
    from .operators.quality_model import logit_expr, quality_feature_frame

    docs = load_table(spark, sf_dir, "documents")
    feats = quality_feature_frame(_spread(docs))
    z = logit_expr(QUALITY_LOGIT_W, QUALITY_LOGIT_B)
    return feats.select(
        "doc_id",
        F.floor(z * F.lit(1000000.0)).cast("bigint").alias("logit_u6"),
        (z >= 0).cast("bigint").alias("keep"),
    )


# Calibration constants: fixed literal logit range (clamped edges
# catch out-of-range scores -- they ARE the signal) binned in exact
# int64 micro-unit arithmetic; the per-bin predicted probability is
# the sigmoid of the BIN MIDPOINT (a literal), not a float mean over
# an unordered group -- the one formulation whose only cross-engine
# float risk is libm exp's final ulp under the micro-unit floor.
CALIB_BINS = 20
CALIB_Z_MIN_U6 = -5_000_000
CALIB_Z_MAX_U6 = 5_000_000
_CALIB_SPAN = CALIB_Z_MAX_U6 - CALIB_Z_MIN_U6
_CALIB_ZSQL = _sql_logit(["swr", "mwl", "pr", "(n_tokens / 100.0)"])
_CALIB_MID = (
    f"({CALIB_Z_MIN_U6 / 1000000.0} + (bin + 0.5) "
    f"* {_CALIB_SPAN / 1000000.0 / CALIB_BINS})"
)


@query(
    "doc_quality_calibration",
    f"""
    WITH {_sql_quality_cte()}
    , z AS (SELECT doc_id,
                 CAST(floor({_CALIB_ZSQL} * 1000000.0) AS BIGINT) AS z_u6,
                 (CASE WHEN {_SQL_QUALITY_SCORE} >= {QUALITY_LABEL_THRESHOLD}
                       THEN 1 ELSE 0 END) AS pos
          FROM f),
    b AS (SELECT LEAST(GREATEST(z_u6, {CALIB_Z_MIN_U6}), {CALIB_Z_MAX_U6 - 1}) AS zc,
                 pos FROM z),
    g AS (SELECT (zc - ({CALIB_Z_MIN_U6})) * {CALIB_BINS} // {_CALIB_SPAN} AS bin,
                 COUNT(*)::BIGINT AS n, SUM(pos)::BIGINT AS n_pos
          FROM b GROUP BY 1),
    o AS (SELECT bin::BIGINT AS bin, n, n_pos,
                 (n_pos * 1000000 // n)::BIGINT AS obs_rate_u6,
                 CAST(FLOOR((1.0 / (1.0 + exp(-{_CALIB_MID}))) * 1000000.0)
                      AS BIGINT) AS pred_mid_u6
          FROM g)
    SELECT bin, n, n_pos, obs_rate_u6, pred_mid_u6,
           ABS(obs_rate_u6 - pred_mid_u6)::BIGINT AS gap_u6
    FROM o
    """,
)
def q_doc_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bin, n, n_pos, obs_rate_u6, pred_mid_u6, gap_u6): reliability
    table of the deployed literal-logit quality classifier -- the
    ML-ops check that a score of 0.8 means 80%. Docs bin by LOGIT in
    exact int64 micro-unit arithmetic (clamped fixed range, integer
    floor-division -- no float binning to diverge); per bin the
    observed positive rate (exact integer ratio against the heuristic
    label, the same labels the trained model bootstraps from) sits
    next to the predicted probability at the bin midpoint (sigmoid of
    a literal -- the only libm call, absorbed by the micro-unit floor)
    and their gap. A calibrated model shows gap_u6 near 0 in the
    populated bins; the gaps ARE the recalibration curve
    (Platt/isotonic input). Map-only until the single (bin) aggregate."""
    from .operators.quality_model import logit_expr
    from .operators.textanalysis import quality_features, quality_score

    d = _spread(load_table(spark, sf_dir, "documents"))
    f = quality_features("text")
    base = d.select(
        f["stopword_ratio"].cast("double").alias("swr"),
        f["mean_word_len"].cast("double").alias("mwl"),
        f["punct_ratio"].cast("double").alias("pr"),
        (f["n_tokens"] / F.lit(100.0)).cast("double").alias("ntok_h"),
        (quality_score("text") >= QUALITY_LABEL_THRESHOLD)
        .cast("int")
        .alias("pos"),
    )
    z = logit_expr(QUALITY_LOGIT_W, QUALITY_LOGIT_B)
    z_u6 = F.floor(z * F.lit(1000000.0)).cast("bigint")
    zc = F.least(
        F.greatest(z_u6, F.lit(CALIB_Z_MIN_U6)), F.lit(CALIB_Z_MAX_U6 - 1)
    )
    binned = base.select(
        ((zc - F.lit(CALIB_Z_MIN_U6)) * F.lit(CALIB_BINS)).alias("num"), "pos"
    ).select(F.expr(f"num div {_CALIB_SPAN}").cast("bigint").alias("bin"), "pos")
    g = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("n_pos"),
    )
    mid = F.lit(CALIB_Z_MIN_U6 / 1000000.0) + (
        F.col("bin") + F.lit(0.5)
    ) * F.lit(_CALIB_SPAN / 1000000.0 / CALIB_BINS)
    pred = F.floor(
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-mid))) * F.lit(1000000.0)
    ).cast("bigint")
    return g.select(
        "bin",
        "n",
        "n_pos",
        F.expr("(n_pos * 1000000) div n").cast("bigint").alias("obs_rate_u6"),
        pred.alias("pred_mid_u6"),
    ).withColumn(
        "gap_u6",
        F.abs(F.col("obs_rate_u6") - F.col("pred_mid_u6")).cast("bigint"),
    )


@query("doc_quality_trained_model")
def q_doc_quality_trained_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-classifier scorecard, one row: (method, n_train, n_test,
    accuracy, baseline_acc). Labels = quality_score >=
    QUALITY_LABEL_THRESHOLD (the corpus median, so both classes are
    populated); train on the stable 80% hash split, score the held-out
    20% with the fitted weights inlined as the literal map-only logit
    (quality_model module docstring). baseline_acc is the
    majority-class accuracy on the same held-out rows — the bar the
    learned weights must clear (pinned in pytest). Hash-grade
    verification (no oracle by construction): fresh-JVM two-session
    determinism pin + an independent numpy Newton solver of the same
    strictly-convex objective reproducing the Spark ML weights to
    1e-3 and the scorecard accuracy to 1e-4
    (tests/test_rows_only_verification.py)."""
    from .operators.quality_model import (
        logit_expr,
        quality_feature_frame,
        train_quality_lr,
    )
    from .operators.sampling import hash_bucket
    from .operators.textanalysis import quality_score

    docs = _spread(load_table(spark, sf_dir, "documents"))
    feats = quality_feature_frame(docs).join(
        docs.select(
            "doc_id",
            (quality_score("text") >= QUALITY_LABEL_THRESHOLD)
            .cast("double")
            .alias("label"),
        ),
        "doc_id",
    )
    is_test = hash_bucket("doc_id", salt="qlr") < _QLR_TEST_PCT
    train, test = feats.filter(~is_test), feats.filter(is_test)
    w, b = train_quality_lr(train)
    scored = test.select(
        "label", (logit_expr(w, b) >= 0).cast("double").alias("pred")
    )
    return scored.agg(
        F.lit("logreg_heuristic_bootstrap").alias("method"),
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.round(F.avg((F.col("pred") == F.col("label")).cast("double")), 4).alias(
            "accuracy"
        ),
        F.round(
            F.greatest(F.avg("label"), 1 - F.avg("label")), 4
        ).alias("baseline_acc"),
    ).crossJoin(
        train.agg(F.count(F.lit(1)).cast("bigint").alias("n_train"))
    ).select("method", "n_train", "n_test", "accuracy", "baseline_acc")


# ---------------------------------------------------------------------------
# The END-TO-END corpus curation pipeline in ONE job — the full
# decision table an LLM data team materializes before a training dump:
# heuristic quality filter (corpus_keep_list rule) × benchmark
# exclusion + n-gram decontamination (benchmark_decontamination rule)
# × duplicate-cluster keep (corpus_dedup_pipeline rule) ×
# leakage-safe cluster split (leakage_safe_split rule), with the final
# ``selected`` bit = trains-on-this-doc. Each stage reuses the exact
# operator the standalone query runs, and the oracle composes the same
# four CTE chains — so the hash match checks the INTERACTION of the
# stages (shared graph, shared splits), not just each stage alone.
# Plan shape: one annotation pass (map-only), one decon probe
# (broadcast gram join), one clustering (capped LSH + CC), then pure
# equi-joins of per-doc flags — nothing quadratic, nothing collected.
# ---------------------------------------------------------------------------
@query(
    "corpus_curation_pipeline",
    f"""
    WITH RECURSIVE {_sql_doc_annotations()},
    {_decon_ctes()},
    contaminated AS (SELECT DISTINCT doc_id FROM dhits),
    {_minhash_pairs_ctes()},
    xfp AS (SELECT doc_id,
                   md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS fp
            FROM documents),
    xfreps AS (SELECT fp, MIN(doc_id) AS rep FROM xfp GROUP BY fp),
    edges0 AS (
        SELECT doc_a, doc_b FROM mh_pairs WHERE jaccard >= {JACCARD_THRESHOLD}
        UNION
        SELECT fr.rep AS doc_a, p.doc_id AS doc_b
        FROM xfp p JOIN xfreps fr USING (fp) WHERE p.doc_id <> fr.rep),
    edges AS (SELECT doc_a AS u, doc_b AS v FROM edges0
              UNION
              SELECT doc_b AS u, doc_a AS v FROM edges0),
    reach(node, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT reach.node, e.v FROM reach JOIN edges e ON e.u = reach.r),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
    flags AS (
        SELECT a.doc_id,
               (a.lang_pred = 'en' AND a.quality_score >= {KEEP_MIN_QUALITY}
                AND a.n_tokens BETWEEN {KEEP_MIN_TOKENS} AND {KEEP_MAX_TOKENS})
                 AS kq,
               ds.is_eval AS bm,
               (c.doc_id IS NOT NULL) AS ct,
               (m.node = m.component) AS dk,
               CASE WHEN {sql_hash_bucket("m.component", salt="split")}
                         < {SPLIT_TEST_PCT}
                    THEN 'test' ELSE 'train' END AS split
        FROM ann a
        JOIN dsplit ds ON ds.doc_id = a.doc_id
        JOIN comp m ON m.node = a.doc_id
        LEFT JOIN contaminated c ON c.doc_id = a.doc_id)
    SELECT doc_id,
           kq::BIGINT AS keep_quality,
           bm::BIGINT AS is_benchmark,
           ct::BIGINT AS is_contaminated,
           dk::BIGINT AS dup_keep,
           split,
           (kq AND NOT bm AND NOT ct AND dk AND split = 'train')::BIGINT
             AS selected
    FROM flags
    """,
)
def q_corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full curation decision table, one row per corpus document:
    (doc_id, keep_quality, is_benchmark, is_contaminated, dup_keep,
    split, selected) — selected=1 exactly for the rows a training dump
    writes. Composes annotate_documents (quality rule of
    corpus_keep_list), contamination_report (benchmark_decontamination
    rule), the capped exact∪MinHash duplicate graph + min-id keeper
    (corpus_dedup_pipeline rule), and the cluster-hash split
    (leakage_safe_split rule) over ONE shared clustering pass."""
    from .operators.clusters import connected_components
    from .operators.sampling import hash_bucket
    from .operators.textanalysis import annotate_documents, contamination_report

    docs = load_table(spark, sf_dir, "documents")
    ann = annotate_documents(_spread(docs))
    is_bench = hash_bucket("doc_id", salt="eval") < DECON_EVAL_PCT
    contam = (
        contamination_report(
            docs.filter(~is_bench),
            docs.filter(is_bench),
            k=DECON_K,
            df_cap=DECON_DF_CAP,
        )
        .select("doc_id")
        .withColumn("_ct", F.lit(1))
    )
    near = minhash_candidates(
        docs, bucket_cap=MINHASH_BUCKET_CAP, pre_exact_dedup=True
    ).filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    edges = near.unionByName(exact_dup_edges(docs))
    comps = connected_components(edges)
    resolved = (
        docs.select(F.col("doc_id").alias("node"))
        .join(comps, "node", "left")
        .select(
            F.col("node").alias("doc_id"),
            F.coalesce(F.col("component"), F.col("node")).alias("component"),
        )
    )
    kq = (
        (F.col("lang_pred") == "en")
        & (F.col("quality_score") >= KEEP_MIN_QUALITY)
        & F.col("n_tokens").between(KEEP_MIN_TOKENS, KEEP_MAX_TOKENS)
    )
    split = F.when(
        hash_bucket("component", 100, "split") < SPLIT_TEST_PCT, F.lit("test")
    ).otherwise(F.lit("train"))
    flags = (
        ann.join(resolved, "doc_id")
        .join(contam, "doc_id", "left")
        .select(
            "doc_id",
            kq.alias("kq"),
            is_bench.alias("bm"),
            F.col("_ct").isNotNull().alias("ct"),
            (F.col("doc_id") == F.col("component")).alias("dk"),
            split.alias("split"),
        )
    )
    return flags.select(
        "doc_id",
        F.col("kq").cast("bigint").alias("keep_quality"),
        F.col("bm").cast("bigint").alias("is_benchmark"),
        F.col("ct").cast("bigint").alias("is_contaminated"),
        F.col("dk").cast("bigint").alias("dup_keep"),
        "split",
        (
            F.col("kq")
            & ~F.col("bm")
            & ~F.col("ct")
            & F.col("dk")
            & (F.col("split") == "train")
        )
        .cast("bigint")
        .alias("selected"),
    )


# ---------------------------------------------------------------------------
# Vector-index forget: the ANN complement of dedup_clusters_forget. A
# persisted cell-partitioned IVF index loses a stable 5% of its
# vectors via operators/similarity.py::ivf_forget_vectors (dynamic
# partition overwrite — only affected cell directories rewrite;
# centroids stay frozen), and the query batch is searched against the
# maintained index. Forgotten vectors must never surface as
# neighbors; the oracle recomputes the search from scratch with the
# forget-list excluded from index membership but INCLUDED in centroid
# training (the frozen-quantizer contract), so the hash match proves
# maintained-index == rebuilt-index.
# ---------------------------------------------------------------------------
ANN_FORGET_PCT = 5


@query(
    "ann_forget_topk",
    _ann_incremental_oracle(
        idx_extra=(
            f" AND NOT ({sql_hash_bucket('vec_id', salt='forget')}"
            f" < {ANN_FORGET_PCT})"
        )
    ),
)
def q_ann_forget_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search the 10% query batch against the IVF index AFTER a 5%
    forget pass: index built over the 90% corpus, written
    partitionBy(cell), affected cells rewritten minus the forget-list
    (dynamic partition overwrite), read back, searched. Same output
    shape as ann_incremental_topk."""
    import os

    from .operators.sampling import hash_bucket
    from .operators.similarity import (
        ivf_forget_vectors,
        ivf_index,
        ivf_search_index,
    )
    from .sources.sinks import write_parquet

    emb = load_table(spark, sf_dir, "embeddings")
    is_new = hash_bucket("vec_id") < ANN_NEW_PCT
    corpus, batch = emb.filter(~is_new), emb.filter(is_new)

    base = _run_scoped_index_dir("ivf_forget")
    cents, assigned = ivf_index(corpus)
    write_parquet(cents, os.path.join(base, "centroids"))
    apath = os.path.join(base, "assignments")
    write_parquet(assigned, apath, partition_by=["cell"])
    deleted = corpus.filter(
        hash_bucket("vec_id", salt="forget") < ANN_FORGET_PCT
    ).select("vec_id")
    ivf_forget_vectors(assigned, deleted, apath)
    cents_rb = spark.read.parquet(os.path.join(base, "centroids"))
    assigned_rb = spark.read.parquet(apath)
    out = ivf_search_index(assigned_rb, cents_rb, batch, ANN_K)
    return out.withColumn("rank", F.col("rank").cast("bigint"))


# ---------------------------------------------------------------------------
# SCD2 dimension history: collapse a keyed update log (orders as
# priority-change events per customer) into slowly-changing-dimension
# type-2 rows (valid_from / valid_to / is_current) via gaps-and-
# islands. The warehouse twin of latest_order_snapshot: the snapshot
# keeps only the latest value, SCD2 keeps the full attribute history
# for point-in-time training-feature joins. Reference has no history
# table at all (etl_pipeline.py keeps only the current frame) — this
# is the 100 TB posture where reprocessing the raw log per query is
# not an option.
# ---------------------------------------------------------------------------
@query(
    "scd2_priority_history",
    """
    WITH o AS (SELECT o_custkey, o_orderkey,
                      o_orderpriority AS priority,
                      CAST(o_orderdate AS DATE) AS d
               FROM orders),
    s AS (SELECT *, CASE WHEN LAG(priority) OVER
                      (PARTITION BY o_custkey ORDER BY d, o_orderkey)
                      IS DISTINCT FROM priority THEN 1 ELSE 0 END AS chg
          FROM o),
    g AS (SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                                   ORDER BY d, o_orderkey
                                   ROWS UNBOUNDED PRECEDING) AS seg
          FROM s),
    seg AS (SELECT o_custkey, seg, priority,
                   MIN(d) AS vf, COUNT(*)::BIGINT AS n_orders
            FROM g GROUP BY o_custkey, seg, priority)
    SELECT o_custkey, priority,
           strftime(vf, '%Y-%m-%d') AS valid_from,
           COALESCE(strftime(LEAD(vf) OVER w, '%Y-%m-%d'),
                    '9999-12-31') AS valid_to,
           n_orders,
           (CASE WHEN LEAD(vf) OVER w IS NULL
                 THEN 1 ELSE 0 END)::BIGINT AS is_current
    FROM seg WINDOW w AS (PARTITION BY o_custkey ORDER BY seg)
    """,
)
def q_scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 build in ONE shuffle: every stage — the change-flag lag,
    the running-sum island id, the per-island groupBy and the
    valid_to lead — is keyed by (or by a superset of) o_custkey, so
    Spark reuses the first hash partitioning end-to-end (the groupBy
    on (custkey, seg, priority) is satisfied by clustering on custkey
    alone; plan-tested). Open-ended rows carry the standard
    9999-12-31 sentinel; deterministic tie-break (d, o_orderkey)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("d"),
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    s = o.withColumn(
        "chg",
        F.when(
            F.lag("priority").over(w).eqNullSafe(F.col("priority")), F.lit(0)
        ).otherwise(F.lit(1)),
    )
    g = s.withColumn(
        "seg", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    segs = g.groupBy("o_custkey", "seg", "priority").agg(
        F.min("d").alias("vf"), F.count(F.lit(1)).alias("n_orders")
    )
    w2 = Window.partitionBy("o_custkey").orderBy("seg")
    nxt = F.lead("vf").over(w2)
    return segs.select(
        "o_custkey",
        "priority",
        F.date_format("vf", "yyyy-MM-dd").alias("valid_from"),
        F.coalesce(F.date_format(nxt, "yyyy-MM-dd"), F.lit("9999-12-31")).alias(
            "valid_to"
        ),
        "n_orders",
        F.when(nxt.isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Deterministic training-shard plan: the export step of every
# training-data pipeline — assign each document a shard and a stable
# within-shard position so a 1000-worker trainer reads identical data
# in identical order on every epoch and every re-run. rand()/zipWithIndex
# would change membership on retry; the key-hash plan is a pure
# function of the data. At 100 TB the physical write is
# repartition(shard) + sortWithinPartitions(hv, doc_id); the
# row_number here is the oracle-checkable statement of that order.
# ---------------------------------------------------------------------------
N_TRAIN_SHARDS = 8


@query(
    "training_shard_plan",
    f"""
    WITH h AS (SELECT doc_id, n_chars,
                      CAST('0x' || substr(md5('shard' || CAST(doc_id AS VARCHAR)), 1, 8)
                           AS BIGINT) AS hv
               FROM documents)
    SELECT doc_id, hv % {N_TRAIN_SHARDS} AS shard,
           ROW_NUMBER() OVER (PARTITION BY hv % {N_TRAIN_SHARDS}
                              ORDER BY hv, doc_id)::BIGINT AS shard_pos,
           n_chars
    FROM h
    """,
)
def q_training_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shard, shard_pos, n_chars): shard = md5-hash(doc_id)
    mod N_TRAIN_SHARDS (same engine-portable conv(md5) trick as
    operators/sampling.py::hash_bucket), position = rank of the hash
    within the shard — a deterministic global shuffle without a global
    sort: the window is per-shard (corpus/N rows each, all shards in
    parallel), never a single-partition total order."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        "n_chars",
        F.expr(
            "cast(conv(substr(md5(concat('shard', cast(doc_id as string))), 1, 8),"
            " 16, 10) as bigint)"
        ).alias("hv"),
    )
    sh = h.withColumn("shard", F.col("hv") % N_TRAIN_SHARDS)
    w = Window.partitionBy("shard").orderBy("hv", "doc_id")
    return sh.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("bigint").alias("shard_pos"),
        "n_chars",
    )


# ---------------------------------------------------------------------------
# BPE merge-pair counts: the other half of tokenizer prep next to
# corpus_vocabulary — the frequency table of ADJACENT token pairs that
# a byte-pair-encoding trainer consumes for its first merge round.
# One explode over zip_with(tokens, tokens[1:]) keeps everything
# JVM-side; the hot pairs collapse in the map-side partial aggregate.
# ---------------------------------------------------------------------------
BPE_TOP_K = 40


@query(
    "bpe_pair_counts",
    f"""
    WITH t AS (SELECT doc_id,
                      list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
               FROM documents),
    p AS (SELECT doc_id,
                 unnest(list_transform(range(1, len(toks)),
                                       i -> toks[i] || ' ' || toks[i + 1])) AS pair
          FROM t WHERE len(toks) >= 2),
    c AS (SELECT pair, COUNT(DISTINCT doc_id)::BIGINT AS n_docs,
                 COUNT(*)::BIGINT AS n_occurrences
          FROM p GROUP BY pair),
    r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, pair) AS rank
          FROM c)
    SELECT pair, n_docs, n_occurrences, rank::BIGINT AS rank
    FROM r WHERE rank <= {BPE_TOP_K}
    """,
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{BPE_TOP_K} adjacent-token-pair table (pair, n_docs,
    n_occurrences, rank). Tokens are bound to an attribute BEFORE the
    slice/zip_with so the higher-order exprs never re-evaluate the
    split (the HOF re-evaluation trap in SKILL.md); top-K via
    orderBy+limit → TakeOrderedAndProject, the rank window rides the
    already-limited rows exactly like corpus_vocabulary."""
    from pyspark.sql import Window

    docs = _spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias("toks"),
    ).filter(F.size("toks") >= 2)
    pairs = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(toks, 1, size(toks) - 1),"
                " slice(toks, 2, size(toks) - 1),"
                " (a, b) -> concat(a, ' ', b))"
            )
        ).alias("pair"),
    )
    counts = pairs.groupBy("pair").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )
    topk = counts.orderBy(
        F.col("n_occurrences").desc(), F.col("pair").asc()
    ).limit(BPE_TOP_K)
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("pair").asc())
    return topk.select(
        "pair",
        "n_docs",
        "n_occurrences",
        F.row_number().over(w).cast("bigint").alias("rank"),
    )


# ---------------------------------------------------------------------------
# Iterative BPE trainer — the operator a tokenizer team actually runs
# (bpe_pair_counts stops at round-1 statistics; this is the k-round
# merge LOOP, the connected_components driver-sequenced shape). Each
# round: ONE shuffle (pair counts over DISTINCT WORDS, not the
# corpus), a 1-row argmax collect (the merge decision = the model),
# and a map-only merge rewrite. Sequences WRAP each symbol in chr(1)
# sentinels, making the rewrite a single replace() with exact
# textbook greedy-leftmost semantics on Spark, DuckDB, AND Python —
# (wrapped, not just terminated: a terminator-only pattern can match
# a longer symbol's SUFFIX — hypothesis-property-tested) —
# so the oracle below unrolls the entire data-dependent loop as CTEs
# (round r's CTEs reference round r-1's winning pair via a cross join
# with its 1-row argmax) and hash-matches every merge decision.
# Integer counts + binary-collation tie-breaks: no float anywhere.
# ---------------------------------------------------------------------------
BPE_MERGES = 12


def _bpe_ctes(k: int) -> str:
    """Unrolled k-round DuckDB replica of bpe_train_merges: wf (word
    freq) → w1 (chr(1)-terminated char sequences) → per round r:
    pair explode p{r} → counts pc{r} → 1-row argmax b{r} → rewritten
    w{r+1}. Every CTE is MATERIALIZED: w{r+1} references w{r} twice
    (directly and through b{r}'s argmax), so inlining would expand the
    plan 2^k-fold."""
    ctes = [
        """wf AS (SELECT w AS word, COUNT(*)::BIGINT AS n
           FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
                 FROM documents)
           GROUP BY w),
    w1 AS (SELECT word, chr(1) || array_to_string(list_transform(range(1, length(word) + 1),
                  i -> word[CAST(i AS INT)]), chr(1) || chr(1)) || chr(1) AS seq, n
           FROM wf)"""
    ]
    for r in range(1, k + 1):
        ctes.append(
            f"""t{r} AS (SELECT list_filter(string_split(seq, chr(1)), x -> x <> '') AS toks, n
            FROM w{r}),
    p{r} AS (SELECT unnest(list_transform(range(1, len(toks)),
                  i -> toks[CAST(i AS INT)] || chr(10) || toks[CAST(i AS INT) + 1])) AS pr, n
            FROM t{r} WHERE len(toks) >= 2),
    pc{r} AS (SELECT pr, SUM(n)::BIGINT AS cnt FROM p{r} GROUP BY pr),
    b{r} AS (SELECT {r}::BIGINT AS merge_rank,
                    split_part(pr, chr(10), 1) AS left_sym,
                    split_part(pr, chr(10), 2) AS right_sym,
                    split_part(pr, chr(10), 1) || split_part(pr, chr(10), 2) AS merged,
                    cnt AS n_occurrences
             FROM pc{r} ORDER BY cnt DESC, pr LIMIT 1),
    w{r + 1} AS (SELECT w.word, replace(w.seq,
                        chr(1) || bb.left_sym || chr(1) || chr(1) || bb.right_sym || chr(1),
                        chr(1) || bb.merged || chr(1)) AS seq, w.n
                 FROM w{r} w CROSS JOIN b{r} bb)"""
        )
    return "WITH " + ",\n    ".join(ctes).replace(
        " AS (SELECT", " AS MATERIALIZED (SELECT"
    )


_BPE_MERGE_CACHE: dict[str, list] = {}


def _bpe_merges_for(spark: SparkSession, sf_dir: str) -> list:
    """bpe_train_merges over documents, memoized per (process,
    sf_dir) — the trained merge list is a k-row MODEL both queries
    below share."""
    got = _BPE_MERGE_CACHE.get(sf_dir)
    if got is None:
        from .operators.textanalysis import bpe_train_merges

        docs = load_table(spark, sf_dir, "documents")
        got = bpe_train_merges(_spread(docs), BPE_MERGES)
        _BPE_MERGE_CACHE[sf_dir] = got
    return got


@query(
    "bpe_train_merges",
    _bpe_ctes(BPE_MERGES)
    + "\n    "
    + " UNION ALL ".join(f"SELECT * FROM b{r}" for r in range(1, BPE_MERGES + 1)),
)
def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first {BPE_MERGES} trained BPE merges: (merge_rank,
    left_sym, right_sym, merged, n_occurrences). The hash match vs the
    unrolled-CTE oracle proves every data-dependent merge DECISION —
    pair statistics, argmax tie-breaks, and the greedy rewrite each
    round feeds the next — is identical cross-engine. pytest
    additionally pins the loop against an independent pure-Python
    symbol-list BPE reference on a crafted corpus (including 'aaaa'
    run semantics) and plan-asserts one shuffle per round."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    merges = _bpe_merges_for(spark, sf_dir)
    schema = StructType(
        [
            StructField("merge_rank", LongType()),
            StructField("left_sym", StringType()),
            StructField("right_sym", StringType()),
            StructField("merged", StringType()),
            StructField("n_occurrences", LongType()),
        ]
    )
    return spark.createDataFrame(
        [(r, a, b, m, n) for r, a, b, m, n in merges], schema
    )


@query(
    "bpe_symbol_vocab",
    _bpe_ctes(BPE_MERGES)
    + f""",
    sym AS (SELECT unnest(list_filter(string_split(seq, chr(1)), x -> x <> '')) AS symbol, n
            FROM w{BPE_MERGES + 1}),
    sc AS (SELECT symbol, SUM(n)::BIGINT AS n_occurrences FROM sym GROUP BY symbol)
    SELECT symbol, n_occurrences,
           ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, symbol)::BIGINT AS rank
    FROM sc
    """,
)
def q_bpe_symbol_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resulting symbol vocabulary after the {BPE_MERGES} trained
    merges: (symbol, n_occurrences, rank) — base characters that
    survived plus every merged symbol, corpus-weighted. Applying the
    trained merge list is bpe_apply_merges' ONE map-only projection
    (the whole replace chain composes — no per-round actions): how a
    frozen tokenizer re-encodes new text at scale. The rank window
    rides a ≤(26 + k)-row aggregate — bounded by construction."""
    from pyspark.sql import Window

    from .operators.textanalysis import bpe_apply_merges, bpe_seq_table, bpe_word_table

    merges = _bpe_merges_for(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    final = bpe_apply_merges(bpe_seq_table(bpe_word_table(_spread(docs))), merges)
    sym = final.select(
        "n",
        F.explode(F.expr("filter(split(seq, char(1)), x -> x <> '')")).alias(
            "symbol"
        ),
    )
    sc = sym.groupBy("symbol").agg(F.sum("n").cast("bigint").alias("n_occurrences"))
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("symbol").asc())
    return sc.select(
        "symbol",
        "n_occurrences",
        F.row_number().over(w).cast("bigint").alias("rank"),
    )


@query(
    "bpe_doc_token_counts",
    _bpe_ctes(BPE_MERGES)
    + f""",
    wsym AS (SELECT word,
                    len(list_filter(string_split(seq, chr(1)), x -> x <> ''))::BIGINT AS n_syms
             FROM w{BPE_MERGES + 1}),
    dt AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
           FROM documents)
    SELECT d.doc_id, COUNT(*)::BIGINT AS n_words,
           SUM(w.n_syms)::BIGINT AS n_bpe_tokens
    FROM dt d JOIN wsym w USING (word)
    GROUP BY d.doc_id
    """,
)
def q_bpe_doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens): per-document token counts
    under the TRAINED tokenizer — the real version of the regex
    estimate token budgeting uses (operators/textanalysis.py::
    token_count_bpe_ish). The corpus is never re-segmented: the
    trained merges collapse into one map-only projection over the
    DISTINCT-WORD table (word → symbol count), and each document's
    count is a sum over its words through an equi-join on word —
    at 100 TB that word table is the broadcast/bucketed dimension,
    and the only corpus-sized work is the regexp explode riding the
    scan. Oracle replays training AND counting from scratch."""
    from .operators.textanalysis import BPE_SEP, bpe_apply_merges, bpe_word_table

    merges = _bpe_merges_for(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    wf = bpe_word_table(_spread(docs))
    seq = F.concat(
        F.lit(BPE_SEP),
        F.concat_ws(BPE_SEP + BPE_SEP, F.split(F.col("word"), "")),
        F.lit(BPE_SEP),
    )
    wseq = bpe_apply_merges(wf.select("word", seq.alias("seq")), merges)
    wsym = wseq.select(
        "word",
        F.size(F.expr("filter(split(seq, char(1)), x -> x <> '')"))
        .cast("bigint")
        .alias("n_syms"),
    )
    dt = docs.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("word"),
    )
    return (
        dt.join(wsym, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_syms").cast("bigint").alias("n_bpe_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# THE END-TO-END DATASET-BUILD FLAGSHIP (VERDICT r12 #1): every stage a
# real training-data dump runs, chained in ONE oracle-checked query —
# curate (lang+quality band) → exact+fuzzy dedup (min-id keeper) →
# benchmark decontamination → leakage-safe cluster split → substring
# scrub over the SELECTED set → tokenize under the TRAINED BPE merges →
# budget-pack into bins → hash-shard with stable positions → export the
# dump with a content manifest and VERIFY it. Stage interactions are
# the point (the corpus_scrub_pipeline lesson): gram ownership is
# computed on the selected survivors only, token counts are the REAL
# trained-tokenizer counts of the SCRUBBED text (not the regex estimate
# token_pack_bins uses), and bin/shard assignments derive from those.
# The DuckDB oracle composes the stage CTEs (annotations, decon,
# MinHash, recursive CC, scrub, unrolled BPE, pack/shard windows) into
# one statement, so the hash match certifies the whole chain, not each
# stage alone.
# ---------------------------------------------------------------------------
def _llm_dataset_build_oracle() -> str:
    bpe = _bpe_ctes(BPE_MERGES)
    assert bpe.startswith("WITH ")
    return f"""
    WITH RECURSIVE {_sql_doc_annotations()},
    {_decon_ctes()},
    contaminated AS (SELECT DISTINCT doc_id FROM dhits),
    {_minhash_pairs_ctes()},
    xfp AS (SELECT doc_id,
                   md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS fp
            FROM documents),
    xfreps AS (SELECT fp, MIN(doc_id) AS rep FROM xfp GROUP BY fp),
    edges0 AS (
        SELECT doc_a, doc_b FROM mh_pairs WHERE jaccard >= {JACCARD_THRESHOLD}
        UNION
        SELECT fr.rep AS doc_a, p.doc_id AS doc_b
        FROM xfp p JOIN xfreps fr USING (fp) WHERE p.doc_id <> fr.rep),
    edgesx AS (SELECT doc_a AS u, doc_b AS v FROM edges0
               UNION
               SELECT doc_b AS u, doc_a AS v FROM edges0),
    reach(node, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT reach.node, e.v FROM reach JOIN edgesx e ON e.u = reach.r),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
    sel AS (
        SELECT a.doc_id
        FROM ann a
        JOIN dsplit ds ON ds.doc_id = a.doc_id
        JOIN comp m ON m.node = a.doc_id
        LEFT JOIN contaminated c ON c.doc_id = a.doc_id
        WHERE a.lang_pred = 'en' AND a.quality_score >= {KEEP_MIN_QUALITY}
          AND a.n_tokens BETWEEN {KEEP_MIN_TOKENS} AND {KEEP_MAX_TOKENS}
          AND NOT ds.is_eval AND c.doc_id IS NULL AND m.node = m.component
          AND {sql_hash_bucket("m.component", salt="split")} >= {SPLIT_TEST_PCT}),
    st AS (SELECT d.doc_id, string_split(lower(d.text), ' ') AS toks
           FROM documents d JOIN sel USING (doc_id)),
    sg AS (SELECT doc_id, i AS pos,
                  md5(array_to_string(toks[i : i + {SPAN_GRAM - 1}], ' ')) AS gh
           FROM st, LATERAL (
             SELECT unnest(range(1, greatest(len(toks) - {SPAN_GRAM - 2}, 1))) AS i
           ) u),
    sown AS (SELECT gh, MIN(doc_id) AS owner
             FROM (SELECT DISTINCT gh, doc_id FROM sg)
             GROUP BY gh HAVING COUNT(*) >= 2),
    scut AS (SELECT sg.doc_id, sg.pos FROM sg JOIN sown USING (gh)
             WHERE sg.doc_id <> sown.owner),
    scov AS (SELECT DISTINCT doc_id, pos + o.off AS tp
             FROM scut, LATERAL (
               SELECT unnest(range(0, {SPAN_GRAM})) AS off) o),
    stok AS (SELECT doc_id, i AS tp, toks[i] AS tok
             FROM st, LATERAL (
               SELECT unnest(range(1, len(toks) + 1)) AS i) u),
    skept AS (SELECT stok.doc_id,
                     string_agg(stok.tok, ' ' ORDER BY stok.tp) AS s_text,
                     COUNT(*) AS n_kept
              FROM stok LEFT JOIN scov
                ON stok.doc_id = scov.doc_id AND stok.tp = scov.tp
              WHERE scov.tp IS NULL GROUP BY stok.doc_id),
    scrubbed AS (SELECT st.doc_id, COALESCE(k.s_text, '') AS s_text,
                        COALESCE(k.n_kept, 0)::BIGINT AS n_tokens_kept
                 FROM st LEFT JOIN skept k USING (doc_id)),
    {bpe[len("WITH "):]},
    wsym AS (SELECT word,
                    len(list_filter(string_split(seq, chr(1)), x -> x <> ''))::BIGINT
                      AS n_syms
             FROM w{BPE_MERGES + 1}),
    swords AS (SELECT doc_id,
                      unnest(regexp_extract_all(lower(s_text), '[a-z]+')) AS word
               FROM scrubbed),
    scount AS (SELECT s.doc_id, SUM(w.n_syms)::BIGINT AS n_bpe
               FROM swords s JOIN wsym w USING (word) GROUP BY s.doc_id),
    tokd AS (SELECT sc.doc_id, sc.n_tokens_kept,
                    COALESCE(c.n_bpe, 0)::BIGINT AS n_bpe
             FROM scrubbed sc LEFT JOIN scount c USING (doc_id)),
    hsh AS (SELECT doc_id, n_tokens_kept, n_bpe,
                   CAST('0x' || substr(md5('shard' || CAST(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) AS hv
            FROM tokd),
    shplan AS (SELECT doc_id, n_tokens_kept, n_bpe,
                      hv % {N_TRAIN_SHARDS} AS shard,
                      ROW_NUMBER() OVER (PARTITION BY hv % {N_TRAIN_SHARDS}
                                         ORDER BY hv, doc_id) AS shard_pos,
                      SUM(n_bpe) OVER (PARTITION BY hv % {N_TRAIN_SHARDS}
                                       ORDER BY hv, doc_id
                                       ROWS UNBOUNDED PRECEDING) AS cum
               FROM hsh)
    SELECT doc_id, shard::BIGINT AS shard, shard_pos::BIGINT AS shard_pos,
           ((cum - n_bpe) // {PACK_BUDGET})::BIGINT AS bin,
           n_tokens_kept, n_bpe AS n_bpe_tokens,
           1::BIGINT AS verified
    FROM shplan
    """


def _llm_dataset_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship's pre-export plan — stages 1-7 as one lazy
    DataFrame (doc_id, shard, shard_pos, bin, n_tokens_kept,
    n_bpe_tokens). Split out so tests/test_plan_quality.py can pin the
    whole chain's physical plan (the exported dump's read-back plan is
    just a parquet scan and pins nothing)."""
    from pyspark.sql import Window

    from .operators.clusters import connected_components
    from .operators.sampling import hash_bucket
    from .operators.textanalysis import (
        BPE_SEP,
        annotate_documents,
        bpe_apply_merges,
        bpe_word_table,
        contamination_report,
        scrub_duplicate_spans,
    )

    docs = load_table(spark, sf_dir, "documents")

    # 1-4: the curation decision (shared rules with
    # q_corpus_curation_pipeline, reduced to the selected set)
    ann = annotate_documents(_spread(docs))
    is_bench = hash_bucket("doc_id", salt="eval") < DECON_EVAL_PCT
    contam = (
        contamination_report(
            docs.filter(~is_bench),
            docs.filter(is_bench),
            k=DECON_K,
            df_cap=DECON_DF_CAP,
        )
        .select("doc_id")
        .withColumn("_ct", F.lit(1))
    )
    near = minhash_candidates(
        docs, bucket_cap=MINHASH_BUCKET_CAP, pre_exact_dedup=True
    ).filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    edges = near.unionByName(exact_dup_edges(docs))
    comps = connected_components(edges)
    resolved = (
        docs.select(F.col("doc_id").alias("node"))
        .join(comps, "node", "left")
        .select(
            F.col("node").alias("doc_id"),
            F.coalesce(F.col("component"), F.col("node")).alias("component"),
        )
    )
    sel = (
        ann.join(resolved, "doc_id")
        .join(contam, "doc_id", "left")
        .filter(
            (F.col("lang_pred") == "en")
            & (F.col("quality_score") >= KEEP_MIN_QUALITY)
            & F.col("n_tokens").between(KEEP_MIN_TOKENS, KEEP_MAX_TOKENS)
            & ~is_bench
            & F.col("_ct").isNull()
            & (F.col("doc_id") == F.col("component"))
            & (hash_bucket("component", 100, "split") >= SPLIT_TEST_PCT)
        )
        .select("doc_id")
    )

    # 5: substring scrub over the selected survivors only. The
    # scrubbed corpus is a real stage boundary (it IS the cleaned-text
    # dump) and is consumed three times downstream (word explode +
    # token-count join-back) — materialize it once (localCheckpoint,
    # the CC lineage-truncation tool) instead of re-running
    # curate+dedup+scrub per consumer; at cluster scale this is the
    # checkpoint-to-durable-storage point (SCALING.md "Iterative
    # jobs" posture).
    scrubbed = scrub_duplicate_spans(
        _spread(docs).join(sel, "doc_id"), k=SPAN_GRAM
    ).localCheckpoint()

    # 6: trained-tokenizer counts of the scrubbed text (frozen merges,
    # applied map-only over the distinct-word dimension)
    merges = _bpe_merges_for(spark, sf_dir)
    wf = bpe_word_table(_spread(docs))
    seq = F.concat(
        F.lit(BPE_SEP),
        F.concat_ws(BPE_SEP + BPE_SEP, F.split(F.col("word"), "")),
        F.lit(BPE_SEP),
    )
    wseq = bpe_apply_merges(wf.select("word", seq.alias("seq")), merges)
    wsym = wseq.select(
        "word",
        F.size(F.expr("filter(split(seq, char(1)), x -> x <> '')"))
        .cast("bigint")
        .alias("n_syms"),
    )
    swords = scrubbed.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(scrubbed_text), '[a-z]+', 0)")
        ).alias("word"),
    )
    scount = swords.join(wsym, "word").groupBy("doc_id").agg(
        F.sum("n_syms").cast("bigint").alias("n_bpe")
    )
    tokd = (
        scrubbed.select("doc_id", "n_tokens_kept")
        .join(scount, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens_kept",
            F.coalesce(F.col("n_bpe"), F.lit(0)).cast("bigint").alias("n_bpe"),
        )
    )

    # 7-8: shard plan + budget bins + verified export
    h = tokd.withColumn(
        "hv",
        F.expr(
            "cast(conv(substr(md5(concat('shard', cast(doc_id as string))), 1, 8),"
            " 16, 10) as bigint)"
        ),
    ).withColumn("shard", (F.col("hv") % N_TRAIN_SHARDS).cast("bigint"))
    w = Window.partitionBy("shard").orderBy("hv", "doc_id")
    planned = h.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("bigint").alias("shard_pos"),
        (
            F.sum("n_bpe").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - F.col("n_bpe")
        ).alias("_start"),
        "n_tokens_kept",
        F.col("n_bpe").alias("n_bpe_tokens"),
    ).withColumn(
        "bin", F.expr(f"_start div {PACK_BUDGET}").cast("bigint")
    )
    return planned.select(
        "doc_id", "shard", "shard_pos", "bin", "n_tokens_kept", "n_bpe_tokens"
    )


@query("llm_dataset_build", _llm_dataset_build_oracle())
def q_llm_dataset_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-build flagship: one row per document in the FINAL
    training dump — (doc_id, shard, shard_pos, bin, n_tokens_kept,
    n_bpe_tokens, verified) — produced by the full curation chain and
    read back from the VERIFIED export on disk, so the hash match
    covers what a trainer actually loads.

    Stages (each alone has a green sibling query; the composition is
    what this row certifies — see _llm_dataset_plan for the chain):
    1. curate — annotate_documents; keep en / quality / token band
       (corpus_keep_list rule);
    2. dedup — exact reps + capped MinHash edges -> connected
       components -> min-id keeper (corpus_dedup_pipeline rule);
    3. decontaminate — 4-gram hits vs the benchmark slice drop, and
       the benchmark slice itself is excluded
       (benchmark_decontamination rule);
    4. split — leakage-safe cluster-hash split, train side only:
       near-dups of held-out docs leave with their whole cluster;
    5. scrub — duplicate token spans removed with gram ownership
       computed over the SELECTED SURVIVORS ONLY (the
       corpus_scrub_pipeline interaction: dropping docs re-owns and
       de-shares grams);
    6. tokenize — the TRAINED BPE merges (bpe_train_merges' frozen
       tokenizer) re-encode the SCRUBBED text via the distinct-word
       table: the real token budget, not token_pack_bins' regex
       estimate;
    7. pack — budget-quantized cumulative bins of PACK_BUDGET BPE
       tokens within each shard (token_pack_bins rule, real counts);
    8. shard+export — md5-hash shards with stable in-shard positions
       (training_shard_plan rule), dumped via export_training_shards
       and manifest-VERIFIED; ``verified`` flips to 0 (hash mismatch)
       if the dump on disk disagrees with its manifest.

    Scale shape: every stage keeps its sibling query's posture (capped
    bucket-blocked candidates, O(log d) CC rounds with lineage
    truncation, broadcast benchmark grams, map-only trained-tokenizer
    apply over the word dimension, per-shard windows — never a global
    sort). Corpus rescans are bounded and pinned by
    tests/test_plan_quality.py::
    test_llm_dataset_build_bounded_corpus_rescans. Oracle = all stage
    CTEs (annotations, decon, MinHash, recursive CC, scrub, unrolled
    BPE, pack/shard windows) composed into ONE DuckDB statement."""
    from .sources.export import (
        export_training_shards,
        read_export,
        verify_export,
    )

    final = _llm_dataset_plan(spark, sf_dir)
    out_dir = _run_scoped_index_dir("llm_build") + "/dump"
    export_training_shards(final, out_dir, N_TRAIN_SHARDS, "doc_id")
    ok = 1 if not verify_export(spark, out_dir) else 0
    # manifest-schema read: an empty selected set (over-aggressive
    # curation on a corpus with nothing to keep) yields an EMPTY
    # result, never an inference crash (bench_scale.py r13 finding)
    dump = read_export(spark, out_dir)
    return dump.select(
        "doc_id",
        "shard",
        "shard_pos",
        "bin",
        "n_tokens_kept",
        "n_bpe_tokens",
        F.lit(ok).cast("bigint").alias("verified"),
    )


# ---------------------------------------------------------------------------
# Cross-source near-dup matrix: which sources duplicate each other —
# the corpus-analytics view a curation team reads before deciding
# source priorities (dedup_keep_by_source consumes exactly this
# signal). Rides the production MinHash+LSH pair set; the per-pair
# statistic is MAX(jaccard), order-independent so the float survives
# the cross-engine hash (a float SUM/AVG over an unordered group
# would not).
# ---------------------------------------------------------------------------
@query(
    "near_dup_source_matrix",
    f"""
    WITH {_minhash_pairs_ctes()},
    e AS (SELECT LEAST(da.source, db.source) AS source_a,
                 GREATEST(da.source, db.source) AS source_b,
                 p.jaccard
          FROM mh_pairs p
          JOIN documents da ON da.doc_id = p.doc_a
          JOIN documents db ON db.doc_id = p.doc_b
          WHERE p.jaccard >= {JACCARD_THRESHOLD})
    SELECT source_a, source_b, COUNT(*)::BIGINT AS n_pairs,
           ROUND(MAX(jaccard), 4) AS max_jaccard
    FROM e GROUP BY source_a, source_b
    """,
)
def q_near_dup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source_a, source_b, n_pairs, max_jaccard) over the capped
    pre-exact-dedup MinHash pair set — pair volume is bounded by the
    LSH bucket caps, and the two source lookups join back to the
    documents table on doc_id (at scale: the pairs frame is tiny next
    to the corpus, so both joins broadcast the PAIRS side or shuffle
    only pair rows, never the corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidates(
        docs, bucket_cap=MINHASH_BUCKET_CAP, pre_exact_dedup=True
    ).filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    src = docs.select("doc_id", "source")
    e = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")
            ),
            "doc_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")
            ),
            "doc_b",
        )
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            "jaccard",
        )
    )
    return e.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.max("jaccard"), 4).alias("max_jaccard"),
    )


# ---------------------------------------------------------------------------
# Event funnel: ordered-sequence analytics (view -> click -> purchase
# within a conversion window) — the product-analytics shape
# MATCH_RECOGNIZE serves elsewhere, expressed as strictly-prior window
# maxima so one user-hash shuffle serves the whole funnel. A click
# qualifies iff a view precedes it within FUNNEL_WINDOW_MIN in the
# user's (ts, event_id) event order; a purchase qualifies iff a
# QUALIFIED click precedes it within the window (chained window over
# a window — same partitioning, no extra exchange).
# ---------------------------------------------------------------------------
FUNNEL_WINDOW_MIN = 480  # conversion deadline per step, minutes


@query(
    "event_funnel",
    f"""
    WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
               FROM events),
    q AS (SELECT *, MAX(CASE WHEN event_type = 'view' THEN ts END) OVER w AS prior_view
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
    q2 AS (SELECT *, MAX(CASE WHEN event_type = 'click' AND prior_view IS NOT NULL
                              AND prior_view >= ts - INTERVAL {FUNNEL_WINDOW_MIN} MINUTES
                              THEN ts END) OVER w AS prior_qclick
           FROM q
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
    c AS (SELECT
            COUNT(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS n1,
            COUNT(DISTINCT CASE WHEN event_type = 'click'
                                AND prior_view IS NOT NULL
                                AND prior_view >= ts - INTERVAL {FUNNEL_WINDOW_MIN} MINUTES
                                THEN user_id END) AS n2,
            COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                AND prior_qclick IS NOT NULL
                                AND prior_qclick >= ts - INTERVAL {FUNNEL_WINDOW_MIN} MINUTES
                                THEN user_id END) AS n3
          FROM q2),
    u AS (SELECT 1 AS step_idx, 'view' AS step, n1 AS n_users FROM c
          UNION ALL SELECT 2, 'click', n2 FROM c
          UNION ALL SELECT 3, 'purchase', n3 FROM c)
    SELECT step_idx::BIGINT AS step_idx, step, n_users::BIGINT AS n_users,
           ROUND(n_users / FIRST_VALUE(CAST(n_users AS DOUBLE))
                             OVER (ORDER BY step_idx), 4) AS pct_of_step1
    FROM u
    """,
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(step_idx, step, n_users, pct_of_step1): users reaching each
    funnel step within the FUNNEL_WINDOW_MIN conversion deadline. The
    strictly-prior frame (ROWS ... 1 PRECEDING) makes "after"
    well-defined even on ts ties (event_id breaks them identically in
    both engines); MAX of the prior step's ts = the most recent
    opportunity, so the deadline test is exact. Both chained windows
    and the count-distinct agg share the user_id hash partitioning;
    the final 3-row unpivot + pct window is driver-size."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w1 = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    deadline = F.expr(f"ts - INTERVAL {FUNNEL_WINDOW_MIN} MINUTES")
    q = ev.withColumn(
        "prior_view",
        F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w1),
    )
    click_ok = (
        (F.col("event_type") == "click")
        & F.col("prior_view").isNotNull()
        & (F.col("prior_view") >= deadline)
    )
    q2 = q.withColumn(
        "prior_qclick", F.max(F.when(click_ok, F.col("ts"))).over(w1)
    )
    purchase_ok = (
        (F.col("event_type") == "purchase")
        & F.col("prior_qclick").isNotNull()
        & (F.col("prior_qclick") >= deadline)
    )
    c = q2.agg(
        F.countDistinct(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).alias("n1"),
        F.countDistinct(F.when(click_ok, F.col("user_id"))).alias("n2"),
        F.countDistinct(F.when(purchase_ok, F.col("user_id"))).alias("n3"),
    )
    steps = [("view", "n1"), ("click", "n2"), ("purchase", "n3")]
    u = c.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).cast("bigint").alias("step_idx"),
                        F.lit(name).alias("step"),
                        F.col(col).alias("n_users"),
                    )
                    for i, (name, col) in enumerate(steps)
                ]
            )
        ).alias("s")
    ).select("s.*")
    w_all = Window.orderBy("step_idx")
    return u.select(
        "step_idx",
        "step",
        "n_users",
        F.round(
            F.col("n_users") / F.first(F.col("n_users").cast("double")).over(w_all),
            4,
        ).alias("pct_of_step1"),
    )


# ---------------------------------------------------------------------------
# MERGE INTO (nightly upsert): the write-side complement of
# orders_snapshot_diff — the same deterministic target (bkt<95) and
# source delta (bkt>=5, 90+ repriced) merged into one table with
# WHEN MATCHED → source row, NOT MATCHED BY TARGET → insert,
# NOT MATCHED BY SOURCE → keep; every row labeled with its
# merge_action. The oracle types update-vs-unchanged column-wise
# (IS DISTINCT FROM) while the operator compares md5 fingerprints, so
# the hash match proves fingerprint == column semantics again, this
# time through the merge path.
# ---------------------------------------------------------------------------
@query(
    "orders_merge_upsert",
    f"""
    WITH b AS (SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority,
                      {sql_hash_bucket("o_orderkey", salt="cdc")} AS bkt
               FROM orders),
    t AS (SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
          FROM b WHERE bkt < 95),
    s AS (SELECT o_orderkey, o_orderstatus,
                 CASE WHEN bkt >= 90 THEN o_totalprice + 1.0
                      ELSE o_totalprice END AS o_totalprice,
                 o_orderpriority
          FROM b WHERE bkt >= 5),
    m AS (SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
                 CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
                      ELSE t.o_orderstatus END AS o_orderstatus,
                 CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
                      ELSE t.o_totalprice END AS o_totalprice,
                 CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderpriority
                      ELSE t.o_orderpriority END AS o_orderpriority,
                 CASE WHEN t.o_orderkey IS NULL THEN 'insert'
                      WHEN s.o_orderkey IS NULL THEN 'kept'
                      WHEN t.o_orderstatus IS DISTINCT FROM s.o_orderstatus
                           OR t.o_totalprice IS DISTINCT FROM s.o_totalprice
                           OR t.o_orderpriority IS DISTINCT FROM s.o_orderpriority
                      THEN 'update' ELSE 'unchanged' END AS merge_action
          FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey)
    SELECT o_orderkey::BIGINT AS o_orderkey, o_orderstatus,
           ROUND(o_totalprice, 2) AS o_totalprice, o_orderpriority, merge_action
    FROM m
    """,
)
def q_orders_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/cdc.py::merge_upsert over the snapshot-diff fixture
    split: merged table + per-row merge_action. One equi full-outer
    join on the key (zero-shuffle when both sides are bucketed)."""
    from .operators.cdc import merge_upsert
    from .operators.sampling import hash_bucket

    b = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        *_CDC_COMPARE,
        hash_bucket("o_orderkey", 100, "cdc").alias("bkt"),
    )
    target = b.filter(F.col("bkt") < 95).drop("bkt")
    source = (
        b.filter(F.col("bkt") >= 5)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("bkt") >= 90, F.col("o_totalprice") + F.lit(1.0)
            ).otherwise(F.col("o_totalprice")),
        )
        .drop("bkt")
    )
    m = merge_upsert(target, source, ["o_orderkey"], _CDC_COMPARE)
    return m.withColumn("o_totalprice", F.round("o_totalprice", 2))


# ---------------------------------------------------------------------------
# Incremental materialized-view maintenance (IVM) — the feature real
# warehouses ship by name: keep a persisted (COUNT, SUM) rollup in
# sync with a changing base table by applying only the CHANGED rows'
# group deltas, never recomputing. Composes three existing pieces:
# the snapshot-diff CDC (fingerprint key join), the additive-law
# argument of every *_new_batch index, and integer fixed-point sums
# (float sums would drift from a recompute by reassociation — money
# becomes exact u2 cents first). Churn here: 10% inserts, 5% price
# updates (+137 cents), 3% deletes, overlapping arbitrarily.
# ---------------------------------------------------------------------------
IVM_INS_PCT = 10  # o_orderkey bucket < 10: absent from the old snapshot
IVM_CHG_PCT = 5   # salt 'chg': price bumped in the new snapshot
IVM_DEL_PCT = 3   # salt 'del': dropped from the new snapshot
IVM_BUMP_U2 = 137


@query(
    "rollup_incremental_maintenance",
    f"""
    WITH v1 AS (SELECT o_orderpriority,
                       CAST(round(o_totalprice * 100) AS BIGINT)
                         + CASE WHEN {sql_hash_bucket("o_orderkey", salt="chg")}
                                     < {IVM_CHG_PCT}
                                THEN {IVM_BUMP_U2} ELSE 0 END AS p
                FROM orders
                WHERE {sql_hash_bucket("o_orderkey", salt="del")} >= {IVM_DEL_PCT})
    SELECT o_orderpriority, COUNT(*)::BIGINT AS n_orders,
           SUM(p)::BIGINT AS revenue_u2
    FROM v1 GROUP BY o_orderpriority
    """,
)
def q_rollup_incremental_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A persisted revenue rollup maintained INCREMENTALLY through a
    full churn cycle (operators/cdc.py::maintain_additive_rollup):
    the old snapshot's per-priority (COUNT, SUM-of-cents) view is
    written as a parquet index, the new snapshot differs from it by
    hash-stable inserts/updates/deletes, and the maintained view =
    base + changed-row group deltas. The oracle aggregates the new
    snapshot FROM SCRATCH — the hash match proves delta maintenance
    == recompute, exactly (integer cents; a float SUM could not make
    this claim). Per-refresh cost ∝ churn: change detection shuffles
    (key, fingerprint) pairs, only changed keys rejoin for values,
    and the final merge touches a view of |groups| rows."""
    import os

    from .operators.cdc import maintain_additive_rollup
    from .operators.sampling import hash_bucket
    from .sources.sinks import write_parquet

    b = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("p0"),
        hash_bucket("o_orderkey").alias("b_ins"),
        hash_bucket("o_orderkey", salt="chg").alias("b_chg"),
        hash_bucket("o_orderkey", salt="del").alias("b_del"),
    )
    old = b.filter(F.col("b_ins") >= IVM_INS_PCT).select(
        "o_orderkey", "o_orderpriority", F.col("p0").alias("p")
    )
    new = b.filter(F.col("b_del") >= IVM_DEL_PCT).select(
        "o_orderkey",
        "o_orderpriority",
        (
            F.col("p0")
            + F.when(
                F.col("b_chg") < IVM_CHG_PCT, F.lit(IVM_BUMP_U2)
            ).otherwise(F.lit(0))
        ).alias("p"),
    )

    base = old.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("p").cast("bigint").alias("s"),
    )
    idx_path = os.path.join(_run_scoped_index_dir("ivm"), "rollup")
    write_parquet(base, idx_path)

    maintained = maintain_additive_rollup(
        spark.read.parquet(idx_path),
        old,
        new,
        ["o_orderkey"],
        "o_orderpriority",
        "p",
    )
    return maintained.select(
        "o_orderpriority",
        F.col("n").alias("n_orders"),
        F.col("s").alias("revenue_u2"),
    )


# ---------------------------------------------------------------------------
# Session transcript assembly: the SFT/conversation-data shape — turn
# a user's raw event stream into one ordered sequence string per
# session (the same assembly that turns chat turns into a training
# example, or doc chunks back into a document). Ordered-array
# collection is the engine primitive being exercised:
# array_sort(collect_list(struct(order_keys..., payload))) is the
# deterministic distributed ORDER BY ... STRING_AGG — collect_list
# alone is partition-order-dependent and would flap across runs.
# ---------------------------------------------------------------------------
@query(
    "session_transcripts",
    """
    WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) ts
               FROM events),
    m AS (SELECT *, CASE WHEN LAG(ts) OVER w IS NULL
                          OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                         THEN 1 ELSE 0 END AS new_s
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sid
          FROM m)
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           COUNT(*)::BIGINT AS n_eventos,
           STRING_AGG(event_type, '>' ORDER BY ts, event_id) AS transcript
    FROM s GROUP BY user_id, sid
    """,
)
def q_session_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, session_start, n_eventos, transcript): 30-minute-gap
    sessions with the event-type sequence assembled in (ts, event_id)
    order. Gaps-and-islands windows, the per-session groupBy and the
    in-group ordering all ride ONE user_id hash partitioning; the
    sort happens inside each collected array (bounded by session
    length), never as a global sort."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    m = ev.withColumn(
        "new_s",
        F.when(
            prev.isNull()
            | ((F.col("ts") - prev) >= F.expr("INTERVAL 30 MINUTES")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    s = m.withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        s.groupBy("user_id", "sid")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            F.count(F.lit(1)).alias("n_eventos"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("transcript"),
        )
        .select("user_id", "session_start", "n_eventos", "transcript")
    )


# ---------------------------------------------------------------------------
# Incremental vocabulary maintenance: the token-count index is a
# MERGEABLE aggregate (disjoint doc slices ⇒ per-token n_docs and
# n_occurrences just ADD), so a new ingest never re-tokenizes the
# corpus — the persisted (token, n_docs, n_occurrences) index absorbs
# the batch's partial counts with one union + re-aggregate over rows
# proportional to |vocab| + |batch tokens|, not |corpus text|. The
# oracle is corpus_vocabulary's FULL-RECOMPUTE SQL verbatim, so the
# hash match proves merge == from-scratch (same posture as
# exact_dedup_new_batch / dedup_clusters_new_batch).
# ---------------------------------------------------------------------------
def _token_counts(docs: DataFrame) -> DataFrame:
    """(token, n_docs, n_occurrences) partial-count frame — the
    mergeable unit the vocabulary index persists."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    return toks.groupBy("token").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )


@query(
    "vocab_new_batch",
    f"""
    WITH t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
               FROM documents),
    c AS (SELECT token,
                 COUNT(DISTINCT doc_id)::BIGINT AS n_docs,
                 COUNT(*)::BIGINT AS n_occurrences
          FROM t WHERE token <> '' GROUP BY token),
    r AS (SELECT token, n_docs, n_occurrences,
                 ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, token) AS rank
          FROM c)
    SELECT token, n_docs, n_occurrences, rank::BIGINT AS rank
    FROM r WHERE rank <= {VOCAB_TOP_K}
    """,
)
def q_vocab_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus (90%) token counts written as a parquet index, read
    back, merged with the 10% batch's partial counts (union + one
    sum-groupBy — additive because the doc slices are disjoint), then
    the same TakeOrderedAndProject top-K as corpus_vocabulary. Output
    identical to the full recompute by construction; the oracle says
    so cryptographically."""
    import os

    from pyspark.sql import Window

    from .operators.sampling import hash_bucket
    from .sources.sinks import write_parquet

    docs = load_table(spark, sf_dir, "documents")
    is_new = hash_bucket("doc_id") < NEW_BATCH_PCT
    corpus, batch = docs.filter(~is_new), docs.filter(is_new)

    base = _run_scoped_index_dir("vocab")
    idx_path = os.path.join(base, "vocab_index")
    write_parquet(_token_counts(_spread(corpus)), idx_path)
    idx = spark.read.parquet(idx_path)

    merged = (
        idx.unionByName(_token_counts(batch))
        .groupBy("token")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_occurrences").alias("n_occurrences"),
        )
    )
    topk = merged.orderBy(
        F.col("n_occurrences").desc(), F.col("token").asc()
    ).limit(VOCAB_TOP_K)
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
    return topk.select(
        "token",
        "n_docs",
        "n_occurrences",
        F.row_number().over(w).cast("bigint").alias("rank"),
    )


@query(
    "vocab_forget",
    f"""
    WITH t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
               FROM documents
               WHERE {sql_hash_bucket("doc_id", salt="forget")} >= {FORGET_PCT}),
    c AS (SELECT token,
                 COUNT(DISTINCT doc_id)::BIGINT AS n_docs,
                 COUNT(*)::BIGINT AS n_occurrences
          FROM t WHERE token <> '' GROUP BY token),
    r AS (SELECT token, n_docs, n_occurrences,
                 ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, token) AS rank
          FROM c)
    SELECT token, n_docs, n_occurrences, rank::BIGINT AS rank
    FROM r WHERE rank <= {VOCAB_TOP_K}
    """,
)
def q_vocab_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-index deletion — the forget member of the vocab
    family (vocab_new_batch's additive merge INVERTED, the bm25_forget
    law on the collapsed counts): the full-corpus (token, n_docs,
    n_occurrences) index persists, the stable {FORGET_PCT}%
    forget-list is re-tokenized (cost ∝ deleted slice — the
    cms_forget posture), its partial counts NEGATE into the index with
    one sum-groupBy, and tokens whose occurrence count reaches 0 leave
    the vocabulary. Disjointness makes the subtraction exact: kept ∪
    deleted partition the corpus, so per-token counts over the slices
    add — and therefore subtract. Same top-{VOCAB_TOP_K} report;
    oracle = the full recompute over the kept corpus, hash match
    proves subtraction == rebuild."""
    import os

    from pyspark.sql import Window

    from .operators.sampling import hash_bucket
    from .sources.sinks import write_parquet

    docs = load_table(spark, sf_dir, "documents")
    is_del = hash_bucket("doc_id", salt="forget") < FORGET_PCT

    base = _run_scoped_index_dir("vocab_forget")
    idx_path = os.path.join(base, "vocab_index")
    write_parquet(_token_counts(_spread(docs)), idx_path)
    idx = spark.read.parquet(idx_path)

    neg = _token_counts(docs.filter(is_del)).select(
        "token",
        (-F.col("n_docs")).alias("n_docs"),
        (-F.col("n_occurrences")).alias("n_occurrences"),
    )
    maintained = (
        idx.unionByName(neg)
        .groupBy("token")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("n_occurrences").cast("bigint").alias("n_occurrences"),
        )
        .filter(F.col("n_occurrences") > 0)
    )
    topk = maintained.orderBy(
        F.col("n_occurrences").desc(), F.col("token").asc()
    ).limit(VOCAB_TOP_K)
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
    return topk.select(
        "token",
        "n_docs",
        "n_occurrences",
        F.row_number().over(w).cast("bigint").alias("rank"),
    )


# ---------------------------------------------------------------------------
# Sampling family completion: exact per-stratum quotas and weighted
# sampling without replacement — the two corpus-mixing shapes
# hash_sample / temperature_sample don't cover.
# ---------------------------------------------------------------------------
QUOTA_K = 10  # docs kept per language stratum
WSAMPLE_K = 50  # weighted sample size
TFIDF_TOP = 3  # top terms kept per document


@query(
    "stratified_quota_sample",
    f"""
    WITH h AS (SELECT doc_id, lang,
                      CAST('0x' || substr(md5('quota' || CAST(doc_id AS VARCHAR)), 1, 8)
                           AS BIGINT) AS hv
               FROM documents),
    r AS (SELECT doc_id, lang,
                 ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rk
          FROM h)
    SELECT doc_id, lang, rk::BIGINT AS rk
    FROM r WHERE rk <= {QUOTA_K}
    """,
)
def q_stratified_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY {QUOTA_K} docs per language (fewer iff the stratum is
    smaller) — quota sampling where temperature/hash sampling only hit
    the budget in expectation. Membership = the {QUOTA_K} smallest key
    hashes per stratum: deterministic, stable under re-partitioning,
    and incremental-friendly (a new doc displaces at most one). One
    shuffle on the stratum key; per-stratum rank windows in parallel —
    at 100 TB swap the full-stratum window for a per-partition top-K
    + merge if strata are huge (the TakeOrdered trick, per key)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        "lang",
        F.expr(
            "cast(conv(substr(md5(concat('quota', cast(doc_id as string))), 1, 8),"
            " 16, 10) as bigint)"
        ).alias("hv"),
    )
    w = Window.partitionBy("lang").orderBy("hv", "doc_id")
    return (
        h.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= QUOTA_K)
        .select("doc_id", "lang", "rk")
    )


@query(
    "weighted_sample_topk",
    f"""
    WITH h AS (SELECT doc_id, n_chars,
                      (CAST('0x' || substr(md5('wsample' || CAST(doc_id AS VARCHAR)), 1, 8)
                            AS BIGINT) + 1) / 4294967296.0 AS u
               FROM documents),
    k AS (SELECT doc_id, n_chars,
                 CAST(floor(pow(u, 1.0 / n_chars) * 1000000000.0) AS BIGINT) AS key_u9
          FROM h),
    r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY key_u9 DESC, doc_id) AS rk
          FROM k)
    SELECT doc_id, n_chars, key_u9, rk::BIGINT AS rk
    FROM r WHERE rk <= {WSAMPLE_K}
    """,
)
def q_weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-RES): key = u^(1/w) with u a stable hash fraction and w =
    n_chars, top-{WSAMPLE_K} keys win — inclusion probability ∝
    weight, membership a pure function of the data (A-RES with rand()
    is the textbook version; the hash makes it replayable). The key is
    ranked as floor(key·1e9) micro-units so the ordering is integer
    (cross-engine-exact given identical doubles — the logit_u6
    precedent); top-K via orderBy+limit → TakeOrderedAndProject, the
    rank window rides the {WSAMPLE_K} survivors."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        "n_chars",
        (
            (
                F.expr(
                    "cast(conv(substr(md5(concat('wsample', cast(doc_id as string))),"
                    " 1, 8), 16, 10) as bigint)"
                )
                + F.lit(1)
            )
            / F.lit(4294967296.0)
        ).alias("u"),
    )
    k = h.select(
        "doc_id",
        "n_chars",
        F.floor(
            F.pow("u", F.lit(1.0) / F.col("n_chars")) * F.lit(1000000000.0)
        )
        .cast("bigint")
        .alias("key_u9"),
    )
    topk = k.orderBy(F.col("key_u9").desc(), F.col("doc_id").asc()).limit(
        WSAMPLE_K
    )
    w = Window.orderBy(F.col("key_u9").desc(), F.col("doc_id").asc())
    return topk.select(
        "doc_id",
        "n_chars",
        "key_u9",
        F.row_number().over(w).cast("bigint").alias("rk"),
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms per document: the text-analytics staple the
# vocabulary table feeds — term weight = tf · ln(N/df). The document
# frequency table is the SAME mergeable aggregate vocab_new_batch
# maintains incrementally; at scale the df side is the persisted
# index, not a recompute. Weight emitted as integer micro-units so
# the per-doc ranking is integer arithmetic (logit_u6 precedent —
# cross-engine ROUND on doubles flips boundary rows, floor on
# identical doubles cannot).
# ---------------------------------------------------------------------------
@query(
    "doc_tfidf_top_terms",
    f"""
    WITH t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
               FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*)::BIGINT AS tf
           FROM t WHERE token <> '' GROUP BY doc_id, token),
    df AS (SELECT token, COUNT(DISTINCT doc_id)::BIGINT AS df
           FROM t WHERE token <> '' GROUP BY token),
    n AS (SELECT COUNT(*)::DOUBLE AS n_docs FROM documents),
    s AS (SELECT tf.doc_id, tf.token,
                 CAST(floor(tf.tf * ln(n.n_docs / df.df) * 1000000.0) AS BIGINT)
                   AS tfidf_u6
          FROM tf JOIN df USING (token) CROSS JOIN n),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf_u6 DESC, token) AS rk
          FROM s)
    SELECT doc_id, token, tfidf_u6, rk::BIGINT AS rk
    FROM r WHERE rk <= {TFIDF_TOP}
    """,
)
def q_doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TFIDF_TOP} distinguishing terms per document by tf·idf.
    One explode feeds BOTH aggregates (tf per (doc,token), df per
    token); the df table joins back on the token key (shuffle carries
    (token, df) pairs — at scale this is the persisted vocabulary
    index, broadcast if it fits); the per-doc rank window is bounded
    by document length. ln via each engine's libm on identical
    doubles; ranking is on the integer micro-units."""
    from pyspark.sql import Window

    docs = _spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    s = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.floor(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")) * F.lit(1000000.0)
            )
            .cast("bigint")
            .alias("tfidf_u6"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf_u6").desc(), F.col("token"))
    return (
        s.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= TFIDF_TOP)
        .select("doc_id", "token", "tfidf_u6", "rk")
    )


# ---------------------------------------------------------------------------
# Percentile winsorization: the standard training-feature cleanup —
# clip a numeric feature at its exact p1/p99 so outliers can't blow
# up normalization. Two-pass shape: one percentile aggregate collapses
# to a single broadcast row (the sanctioned one-row cross join), then
# the clip is pure map-side codegen over the fact — the same plan at
# 100 TB, where the percentile pass swaps to approx_percentile
# (t-digest, mergeable) per the priority_price_percentiles note.
# ---------------------------------------------------------------------------
@query(
    "winsorized_prices",
    """
    WITH q AS (SELECT quantile_cont(o_totalprice, 0.01) AS lo,
                      quantile_cont(o_totalprice, 0.99) AS hi
               FROM orders)
    SELECT o_orderkey,
           ROUND(o_totalprice, 2) AS price,
           ROUND(LEAST(GREATEST(o_totalprice, lo), hi), 2) AS price_clipped,
           (CASE WHEN o_totalprice < lo OR o_totalprice > hi
                 THEN 1 ELSE 0 END)::BIGINT AS clipped
    FROM orders CROSS JOIN q
    """,
)
def q_winsorized_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_orderkey, price, price_clipped, clipped): exact-percentile
    clip bounds (Spark percentile == DuckDB quantile_cont) broadcast
    as one row; LEAST/GREATEST clipping stays inside the scan's
    whole-stage codegen."""
    orders = load_table(spark, sf_dir, "orders")
    q = orders.agg(
        F.expr("percentile(o_totalprice, 0.01)").alias("lo"),
        F.expr("percentile(o_totalprice, 0.99)").alias("hi"),
    )
    return orders.crossJoin(F.broadcast(q)).select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        F.round(
            F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi")), 2
        ).alias("price_clipped"),
        (
            (F.col("o_totalprice") < F.col("lo"))
            | (F.col("o_totalprice") > F.col("hi"))
        )
        .cast("bigint")
        .alias("clipped"),
    )


# ---------------------------------------------------------------------------
# Waiting suppliers (TPC-H Q21 shape, adapted to this schema: "late" =
# shipped > 90 days after order date): suppliers who were the SOLE
# late shipper on multi-supplier orders. The oracle states the
# textbook correlated EXISTS / NOT EXISTS; the engine runs the
# DECORRELATED form — one grouped pass computing per-order
# (distinct suppliers, distinct late suppliers), joined back — so the
# hash match proves the rewrite that makes Q21 tractable at scale
# (correlated per-row subqueries re-scan lineitem per candidate; the
# decorrelated plan scans it a bounded number of times).
# ---------------------------------------------------------------------------
WAITING_TOP = 10


@query(
    "waiting_suppliers",
    f"""
    WITH l AS (SELECT l.l_orderkey, l.l_suppkey,
                      (l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) AS late
               FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    late AS (SELECT * FROM l WHERE late),
    w AS (SELECT l1.l_suppkey AS suppkey, COUNT(*)::BIGINT AS numwait
          FROM late l1
          WHERE EXISTS (SELECT 1 FROM l l2
                        WHERE l2.l_orderkey = l1.l_orderkey
                          AND l2.l_suppkey <> l1.l_suppkey)
            AND NOT EXISTS (SELECT 1 FROM late l3
                            WHERE l3.l_orderkey = l1.l_orderkey
                              AND l3.l_suppkey <> l1.l_suppkey)
          GROUP BY l1.l_suppkey),
    r AS (SELECT suppkey, numwait,
                 ROW_NUMBER() OVER (ORDER BY numwait DESC, suppkey) AS rank
          FROM w)
    SELECT suppkey, numwait, rank::BIGINT AS rank
    FROM r WHERE rank <= {WAITING_TOP}
    """,
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{WAITING_TOP} sole-late-shipper counts. Decorrelated: one
    per-order aggregate (n_supp, n_late_supp) replaces both correlated
    subqueries — EXISTS(other supplier) == n_supp >= 2, NOT
    EXISTS(other LATE supplier) == n_late_supp == 1 for a late row.
    Both the aggregate and the join-back key on l_orderkey, so the
    partitioning is reused; top-K via TakeOrderedAndProject."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ).alias("late"),
    )
    per_order = l.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    cand = (
        l.filter(F.col("late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    w = cand.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.count(F.lit(1)).alias("numwait")
    )
    topk = w.orderBy(F.col("numwait").desc(), F.col("suppkey").asc()).limit(
        WAITING_TOP
    )
    win = Window.orderBy(F.col("numwait").desc(), F.col("suppkey").asc())
    return topk.select(
        "suppkey",
        "numwait",
        F.row_number().over(win).cast("bigint").alias("rank"),
    )


# ---------------------------------------------------------------------------
# Small-quantity revenue per brand (TPC-H Q17 shape): lineitems below
# 30% of their part's average quantity. Second correlated-subquery
# rewrite demo (next to waiting_suppliers' EXISTS pair): the oracle
# states the textbook correlated scalar subquery (re-aggregates
# lineitem per probed part); the engine runs the decorrelated form —
# ONE per-part average joined back — which scans lineitem twice total
# instead of once per part. Per-part avg is deterministic cross-engine
# because quantities are integral (exact double sums in any order).
# ---------------------------------------------------------------------------
Q17_QTY_FRACTION = 0.3


@query(
    "small_quantity_revenue",
    f"""
    SELECT p.p_brand,
           COUNT(*)::BIGINT AS n_lines,
           ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_quantity < {Q17_QTY_FRACTION} * (
        SELECT AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey)
    GROUP BY p.p_brand
    """,
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(p_brand, n_lines, avg_yearly) over below-threshold lineitems.
    Decorrelated: per-part AVG(l_quantity) computed once (groupBy) and
    equi-joined back; the part dim is broadcast. Both lineitem passes
    and the join key on l_partkey — AQE reuses the partitioning."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    avg_qty = li.groupBy("l_partkey").agg(
        F.avg("l_quantity").alias("_avg_qty")
    )
    small = li.join(avg_qty, "l_partkey").filter(
        F.col("l_quantity") < F.lit(Q17_QTY_FRACTION) * F.col("_avg_qty")
    )
    return (
        small.join(F.broadcast(part), small.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
        )
    )


# ---------------------------------------------------------------------------
# Set-operation retention: INTERSECT / EXCEPT as first-class operators
# (SURVEY §2.6 covers UNION; these are its distinct-set siblings,
# planned by Spark as semi-/anti-join + distinct aggregates). Customer
# retention across a date split: retained = active-early ∩
# active-late, churned = active-early ∖ active-late.
# ---------------------------------------------------------------------------
RETENTION_SPLIT = "1998-01-01"


# ---------------------------------------------------------------------------
# Anomaly detection — per-user z-score outliers with EXACT INTEGER
# arithmetic end to end. The standard z-test compares float mean/std,
# which can never survive a cross-engine hash (unordered float sums);
# here values are fixed-point (the fixture's 2dp money-like values →
# exact u2 integers) and the test is algebraically cleared of
# divisions:  |v−μ| > k·σ  ⇔  (v·n − Σx)² > k²·(n·Σx² − (Σx)²),
# every term an int64 (bounds documented in the docstring). The
# (n, Σx, Σx²) row is a MERGEABLE sufficient-statistics index — the
# HLL/CMS/histogram posture for moments: per-batch triples add, so a
# standing index supports incremental outlier scoring for free.
# ---------------------------------------------------------------------------
ZSCORE_K = 3


@query(
    "user_value_outliers",
    f"""
    WITH e AS (SELECT user_id, event_id,
                      CAST(round(value * 100) AS BIGINT) AS v
               FROM events),
    s AS (SELECT user_id, COUNT(*)::BIGINT AS n,
                 SUM(v)::BIGINT AS sx,
                 SUM(v * v)::BIGINT AS sxx
          FROM e GROUP BY user_id),
    f AS (SELECT e.user_id,
                 CASE WHEN (e.v * s.n - s.sx) * (e.v * s.n - s.sx)
                           > {ZSCORE_K * ZSCORE_K} * (s.n * s.sxx - s.sx * s.sx)
                      THEN 1 ELSE 0 END AS is_out
          FROM e JOIN s USING (user_id)),
    o AS (SELECT user_id, SUM(is_out)::BIGINT AS n_outliers
          FROM f GROUP BY user_id)
    SELECT s.user_id, s.n AS n_events,
           (s.sx // s.n)::BIGINT AS mean_u2,
           o.n_outliers
    FROM s JOIN o USING (user_id)
    """,
)
def q_user_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user |z| > {ZSCORE_K} outlier counts over events.value,
    integer-exact: values become u2 fixed-point ints (2dp data —
    round(v·100) is >1e10 ulps from any .5 boundary, so both engines
    land the same integer), and the z-test runs as
    (v·n − Σx)² > {ZSCORE_K}²·(n·Σx² − (Σx)²) — the float-free
    algebraic form (σ=0 groups flag nothing, by construction, no
    division-by-zero arm). Output (user_id, n_events, mean_u2 [floor],
    n_outliers), all bigint.

    int64 bounds: with v ≤ V·100 µ-units and n events per user, the
    largest term is k²·n·Σx² ≤ k²·n²·V²·1e4 — safe through
    n·V ≈ 3·10⁷ (e.g. 30k events/user at V=1000); past that, cast the
    four aggregate terms to DECIMAL(38,0) (Spark) / HUGEINT (DuckDB)
    — same exactness, wider box.

    Scale shape: the (n, Σx, Σx²) row is a mergeable sufficient-
    statistics index (per-batch triples ADD — the moments analogue of
    the histogram/CMS index family), built with one user-keyed
    aggregate; the flag join and the outlier count reuse the same
    user_id partitioning, so the whole query is one partitioning
    end-to-end. Only (user_id, int) pairs shuffle."""
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "user_id",
        "event_id",
        F.expr("cast(round(value * 100) as bigint)").alias("v"),
    )
    s = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("sx"),
        F.sum(F.expr("v * v")).cast("bigint").alias("sxx"),
    )
    k2 = ZSCORE_K * ZSCORE_K
    f = e.join(s, "user_id").select(
        "user_id",
        F.expr(
            f"CASE WHEN (v * n - sx) * (v * n - sx)"
            f" > {k2} * (n * sxx - sx * sx) THEN 1 ELSE 0 END"
        ).alias("is_out"),
    )
    o = f.groupBy("user_id").agg(
        F.sum("is_out").cast("bigint").alias("n_outliers")
    )
    return s.join(o, "user_id").select(
        "user_id",
        F.col("n").alias("n_events"),
        F.expr("sx div n").cast("bigint").alias("mean_u2"),
        "n_outliers",
    )


@query(
    "weekly_cohort_retention",
    """
    WITH act AS (SELECT DISTINCT user_id,
                        date_trunc('week', CAST(ts AS TIMESTAMP))::DATE AS wk
                 FROM events),
    coh AS (SELECT user_id, MIN(wk) AS cwk FROM act GROUP BY user_id),
    sizes AS (SELECT cwk, COUNT(*)::BIGINT AS cohort_size
              FROM coh GROUP BY cwk),
    j AS (SELECT coh.cwk, (date_diff('day', coh.cwk, act.wk) // 7) AS off,
                 act.user_id
          FROM act JOIN coh USING (user_id)),
    g AS (SELECT cwk, off, COUNT(DISTINCT user_id)::BIGINT AS n_users
          FROM j GROUP BY cwk, off)
    SELECT strftime(g.cwk, '%Y-%m-%d') AS cohort_week,
           g.off::BIGINT AS offset_weeks,
           g.n_users,
           s.cohort_size,
           ((g.n_users * 1000000) // s.cohort_size)::BIGINT AS rate_ppm
    FROM g JOIN sizes s USING (cwk)
    """,
)
def q_weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic cohort-retention matrix (cohort week × week offset
    → users still active, as a parts-per-million integer rate): the
    product-analytics report next to event_funnel and
    customer_retention_setops' two-period split. All-integer output —
    weeks are Monday-truncated dates on both engines, the offset is an
    exact integer division of a days-diff that is always a multiple
    of 7, and the rate is integer ppm (n·1e6 div size), so nothing
    float ever crosses the hash.

    Scale shape: the distinct-(user, week) pass and the per-user
    cohort MIN share the user_id hash partitioning (one exchange
    serves both), the cohort join is user-keyed, and only the final
    (cohort, offset) aggregate — whose cardinality is weeks², not
    events — reshuffles; the tiny per-cohort sizes table broadcasts.
    Nothing beyond (user_id, date) pairs ever rides a shuffle."""
    events = load_table(spark, sf_dir, "events")
    act = (
        events.select(
            "user_id",
            F.date_trunc("week", F.col("ts")).cast("date").alias("wk"),
        )
        .distinct()
    )
    coh = act.groupBy("user_id").agg(F.min("wk").alias("cwk"))
    sizes = coh.groupBy("cwk").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    j = act.join(coh, "user_id").select(
        "cwk",
        F.expr("datediff(wk, cwk) div 7").alias("off"),
        "user_id",
    )
    g = j.groupBy("cwk", "off").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )
    return g.join(F.broadcast(sizes), "cwk").select(
        F.date_format("cwk", "yyyy-MM-dd").alias("cohort_week"),
        F.col("off").cast("bigint").alias("offset_weeks"),
        "n_users",
        "cohort_size",
        F.expr("(n_users * 1000000) div cohort_size")
        .cast("bigint")
        .alias("rate_ppm"),
    )


@query(
    "customer_retention_setops",
    f"""
    WITH early AS (SELECT o_custkey FROM orders
                   WHERE o_orderdate < TIMESTAMP '{RETENTION_SPLIT} 00:00:00'),
    late AS (SELECT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '{RETENTION_SPLIT} 00:00:00'),
    retained AS (SELECT o_custkey FROM early INTERSECT SELECT o_custkey FROM late),
    churned AS (SELECT o_custkey FROM early EXCEPT SELECT o_custkey FROM late)
    SELECT 'retained' AS status, COUNT(*)::BIGINT AS n_customers FROM retained
    UNION ALL
    SELECT 'churned', COUNT(*)::BIGINT FROM churned
    """,
)
def q_customer_retention_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(status, n_customers) via DataFrame intersect()/exceptAll-free
    except(): both plan as hash semi/anti joins over the distinct key
    sets — the key-only shuffle payload a retention job wants at
    scale (never the order rows)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    )
    split = F.lit(RETENTION_SPLIT + " 00:00:00").cast("timestamp_ntz")
    early = orders.filter(F.col("o_orderdate") < split).select("o_custkey")
    late = orders.filter(F.col("o_orderdate") >= split).select("o_custkey")
    retained = early.intersect(late)
    churned = early.distinct().subtract(late)
    return retained.agg(
        F.lit("retained").alias("status"),
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
    ).unionByName(
        churned.agg(
            F.lit("churned").alias("status"),
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        )
    )


# ---------------------------------------------------------------------------
# Recursive CTE month spine (Spark 4's WITH RECURSIVE — SPARK-24497):
# the warehouse calendar-dimension utility, shaped for how Spark
# EXECUTES recursion: each recursive step is a sequential driver
# round (~0.1-0.2 s of scheduling latency regardless of data), so the
# recursion walks the COARSE grain (years — depth ≈ 7 here) and a
# set-oriented explode(sequence(...)) expands each year to months in
# one batch op. The naive month-per-step recursion measured 11.8 s
# for an 80-row spine — 80 sequential rounds of pure overhead — vs
# ~1 s for this shape; at any corpus size the depth stays O(years).
# Months with zero orders surface as explicit 0 rows, which a plain
# GROUP BY can never emit.
# ---------------------------------------------------------------------------
@query(
    "order_month_spine",
    """
    WITH RECURSIVE years(y) AS (
        SELECT date_trunc('year', (SELECT MIN(o_orderdate) FROM orders))
        UNION ALL
        SELECT y + INTERVAL 1 YEAR FROM years
        WHERE y < date_trunc('year', (SELECT MAX(o_orderdate) FROM orders))
    ),
    spine AS (SELECT unnest(generate_series(y, y + INTERVAL 11 MONTH,
                                            INTERVAL 1 MONTH)) AS m
              FROM years),
    bounded AS (SELECT m FROM spine
                WHERE m BETWEEN (SELECT date_trunc('month', MIN(o_orderdate))
                                 FROM orders)
                            AND (SELECT date_trunc('month', MAX(o_orderdate))
                                 FROM orders)),
    per_month AS (SELECT date_trunc('month', o_orderdate) AS m,
                         COUNT(*)::BIGINT AS n
                  FROM orders GROUP BY 1)
    SELECT strftime(s.m, '%Y-%m') AS mes,
           COALESCE(p.n, 0)::BIGINT AS n_orders
    FROM bounded s LEFT JOIN per_month p ON s.m = p.m
    """,
)
def q_order_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(mes, n_orders) for EVERY month between the first and last
    order — native WITH RECURSIVE on both engines over the year
    grain, explode(sequence(...)) down to months, bounds-filtered.
    The tiny spine broadcasts into the left join against the one
    per-month aggregate of orders."""
    orders = load_table(spark, sf_dir, "orders")
    # bounds collected ONCE (two scalars — the tiny-model pattern, like
    # the PQ codebooks): inlining them as literals keeps the recursive
    # step from re-running the MIN/MAX subquery every round
    lo, hi = orders.agg(
        F.date_trunc("month", F.min("o_orderdate")),
        F.date_trunc("month", F.max("o_orderdate")),
    ).first()
    lo_s, hi_s = str(lo), str(hi)
    spine = spark.sql(
        f"""
        WITH RECURSIVE years(y) AS (
            SELECT date_trunc('year', TIMESTAMP '{lo_s}')
            UNION ALL
            SELECT y + INTERVAL 1 YEAR FROM years
            WHERE y < date_trunc('year', TIMESTAMP '{hi_s}')
        )
        SELECT explode(sequence(y, y + INTERVAL 11 MONTHS,
                                INTERVAL 1 MONTH)) AS m
        FROM years
        """
    )
    bounded = spine.filter(
        F.col("m").between(F.lit(lo_s).cast("timestamp_ntz"),
                           F.lit(hi_s).cast("timestamp_ntz"))
    )
    per_month = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        F.broadcast(bounded.select("m"))
        .join(per_month, "m", "left")
        .select(
            F.date_format("m", "yyyy-MM").alias("mes"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Referential-integrity audit: the cross-TABLE data-quality complement
# of quality_profile's per-column audit — orphan foreign keys counted
# with broadcast/anti joins, one row per relationship. An ingest gate
# at 100 TB runs exactly this before promoting a snapshot: every
# check is an anti-join whose shuffle carries only the key column,
# and dims (nation, part at fixture ratios) broadcast.
# ---------------------------------------------------------------------------
@query(
    "referential_integrity_audit",
    """
    SELECT 'lineitem.l_orderkey->orders' AS check_name,
           (SELECT COUNT(*) FROM lineitem)::BIGINT AS n_rows,
           (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
             ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderkey IS NULL)::BIGINT AS n_orphans
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           (SELECT COUNT(*) FROM orders)::BIGINT,
           (SELECT COUNT(*) FROM orders o LEFT JOIN customer c
             ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey IS NULL)::BIGINT
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           (SELECT COUNT(*) FROM customer)::BIGINT,
           (SELECT COUNT(*) FROM customer c LEFT JOIN nation n
             ON c.c_nationkey = n.n_nationkey
            WHERE n.n_nationkey IS NULL)::BIGINT
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           (SELECT COUNT(*) FROM lineitem)::BIGINT,
           (SELECT COUNT(*) FROM lineitem l LEFT JOIN part p
             ON l.l_partkey = p.p_partkey
            WHERE p.p_partkey IS NULL)::BIGINT
    UNION ALL
    SELECT 'embeddings.vec_id->documents',
           (SELECT COUNT(*) FROM embeddings)::BIGINT,
           (SELECT COUNT(*) FROM embeddings e LEFT JOIN documents d
             ON e.vec_id = d.doc_id
            WHERE d.doc_id IS NULL)::BIGINT
    """,
)
def q_referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(check_name, n_rows, n_orphans) per FK relationship — each
    orphan count is an anti-join on the key projection only."""
    from .operators.joins import anti_join

    def check(name: str, fact: DataFrame, fk: str, dim: DataFrame, pk: str):
        orphans = anti_join(
            fact.select(fk), dim.select(F.col(pk).alias(fk)), [fk]
        )
        return (
            fact.agg(F.count(F.lit(1)).alias("n_rows"))
            .crossJoin(orphans.agg(F.count(F.lit(1)).alias("n_orphans")))
            .select(
                F.lit(name).alias("check_name"),
                F.col("n_rows").cast("bigint"),
                F.col("n_orphans").cast("bigint"),
            )
        )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    checks = [
        check("lineitem.l_orderkey->orders", li, "l_orderkey", orders, "o_orderkey"),
        check("orders.o_custkey->customer", orders, "o_custkey", cust, "c_custkey"),
        check("customer.c_nationkey->nation", cust, "c_nationkey", nation, "n_nationkey"),
        check("lineitem.l_partkey->part", li, "l_partkey", part, "p_partkey"),
        check("embeddings.vec_id->documents", emb, "vec_id", docs, "doc_id"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


# ---------------------------------------------------------------------------
# VARIANT semi-structured path (Spark 4 VariantType): parse the JSON
# props ONCE into the binary variant encoding, then every access is a
# typed O(1) field get — at 100 TB the parse-per-access of
# get_json_object (events_json_extract keeps that classic path) is
# the difference between one Jackson pass and one per extracted
# field, and variant columns persist to parquet for shredded reads.
# Same analytics as the JSON twin + a typed-presence count, so the
# DuckDB JSON oracle checks the whole variant pipeline end-to-end.
# ---------------------------------------------------------------------------
@query(
    "events_variant_extract",
    """
    WITH e AS (SELECT event_type, value,
                      CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
               FROM events)
    SELECT event_type,
           COUNT(*)::BIGINT AS n_eventos,
           COUNT(k)::BIGINT AS n_with_k,
           ROUND(AVG(k), 4) AS k_medio,
           ROUND(SUM(CASE WHEN k > 50 THEN value ELSE 0 END), 2) AS valor_k_alto
    FROM e GROUP BY event_type
    """,
)
def q_events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_json → variant_get: the props string becomes one binary
    VARIANT value per row; ``try_variant_get(v, '$.k', 'int')`` is a
    typed field access on the encoded form (no re-parse, null on
    type/path miss). Aggregates identical to events_json_extract's
    oracle, so the hash match verifies the variant encode/decode
    round-trip, not just the JSON semantics."""
    from .operators.aggregate import sum_if

    events = load_table(spark, sf_dir, "events")
    e = events.withColumn("_v", F.parse_json("props")).withColumn(
        "k", F.try_variant_get("_v", "$.k", "int")
    )
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_eventos"),
        F.count("k").alias("n_with_k"),
        F.round(F.avg("k"), 4).alias("k_medio"),
        F.round(sum_if(F.col("value"), F.col("k") > 50), 2).alias(
            "valor_k_alto"
        ),
    )


# ---------------------------------------------------------------------------
# Grouped-aggregate pandas UDF (ArrowAggregatePython): the third Arrow
# eval mode after scalar pandas UDFs (ann_two_stage_rerank_udf) and
# mapInPandas (multimodal) — per-group Series → scalar in Python,
# Arrow-batched per group. The medians have an exact SQL twin
# (percentile == numpy interpolated median), so the oracle hash
# checks the Arrow grouped path bit-for-bit; a custom Python-only
# estimator (trimmed scorer, scipy stat) plugs into exactly this
# slot. Partial aggregation does NOT apply to grouped pandas UDFs —
# every row shuffles to its group (plan-visible) — so at 100 TB keep
# these for group-bounded data or pre-reduced inputs, never raw-fact
# medians (percentile_approx is that path).
# ---------------------------------------------------------------------------
@query(
    "priority_median_pandas_agg",
    """
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS mediana,
           COUNT(*)::BIGINT AS pedidos
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_priority_median_pandas_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority median via a GROUPED_AGG pandas UDF, hash-matched
    against DuckDB quantile_cont (numpy's interpolated median is the
    same estimator)."""
    @F.pandas_udf("double")
    def _median(v: pd.Series) -> float:
        import numpy as np

        return float(np.median(v))

    # JVM aggregates cannot mix with grouped pandas UDFs in one agg
    # (INVALID_PANDAS_UDF_PLACEMENT) — the count rides the same Arrow
    # group as a second pandas UDF
    @F.pandas_udf("long")
    def _n(v: pd.Series) -> int:
        return len(v)

    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(_median("o_totalprice"), 4).alias("mediana"),
        _n("o_totalprice").alias("pedidos"),
    )


# ---------------------------------------------------------------------------
# Co-grouped applyInPandas (FlatMapCoGroupsInPandas): the fourth and
# last Arrow eval mode (scalar UDF: rerank; mapInPandas: multimodal;
# grouped agg: median). Per-user distribution drift between two
# deterministic event halves as a Kolmogorov–Smirnov statistic — the
# training-data monitoring question "did this user/source's value
# distribution shift between snapshots". Both halves of one user
# arrive as two aligned pandas frames in one Python call; the oracle
# recomputes the KS sup-distance in pure SQL (per-value cumulative
# counts), so the co-grouped Arrow path is hash-checked bit-for-bit
# (micro-unit floor, integer-division-exact CDFs).
# ---------------------------------------------------------------------------
# One cogrouped key's two frames must fit a single pandas call; fail
# loudly instead of OOMing (each row ~16 B in the value frame — 5M
# rows ≈ 80 MB per call, comfortable; tune per executor memory).
DRIFT_KS_MAX_ROWS_PER_KEY = 5_000_000


@query(
    "user_value_drift_ks",
    f"""
    WITH t AS (SELECT user_id, value,
                      CASE WHEN {sql_hash_bucket("event_id", salt="drift")} < 50
                           THEN 'a' ELSE 'b' END AS side
               FROM events),
    p AS (SELECT user_id, value,
                 SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS ca,
                 SUM(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS cb
          FROM t GROUP BY user_id, value),
    n AS (SELECT user_id, SUM(ca) AS na, SUM(cb) AS nb FROM p GROUP BY user_id),
    c AS (SELECT p.user_id, value,
                 SUM(ca) OVER (PARTITION BY p.user_id ORDER BY value) AS cuma,
                 SUM(cb) OVER (PARTITION BY p.user_id ORDER BY value) AS cumb,
                 na, nb
          FROM p JOIN n USING (user_id)),
    d AS (SELECT user_id, na, nb,
                 MAX(abs(cuma / CAST(na AS DOUBLE) - cumb / CAST(nb AS DOUBLE)))
                   AS ks
          FROM c WHERE na > 0 AND nb > 0 GROUP BY user_id, na, nb)
    SELECT user_id, na::BIGINT AS n_a, nb::BIGINT AS n_b,
           CAST(floor(ks * 1000000.0) AS BIGINT) AS ks_u6
    FROM d
    """,
)
def q_user_value_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, n_a, n_b, ks_u6): KS sup-distance between the two
    hash-split halves of each user's value distribution. cogroup
    shuffles each side once on user_id and hands BOTH frames of one
    key to a single Arrow call — the join-free alignment that
    two-snapshot comparisons want (vs materializing a values join).
    Users missing either half are dropped (KS undefined). SCALE GUARD:
    one key's full history must fit a single pandas cogroup call, so
    the kernel fails LOUDLY past DRIFT_KS_MAX_ROWS_PER_KEY instead of
    OOMing an executor — past that, pre-bin and use the pure-JVM
    user_value_drift_psi twin below."""
    from .operators.sampling import hash_bucket

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value"
    )
    side_a = hash_bucket("event_id", 100, "drift") < 50
    a = events.filter(side_a).select("user_id", "value")
    b = events.filter(~side_a).select("user_id", "value")

    def ks(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if len(left) + len(right) > DRIFT_KS_MAX_ROWS_PER_KEY:
            raise ValueError(
                "user_value_drift_ks: one key carries "
                f"{len(left) + len(right)} rows, past the single-"
                f"cogroup-call guard ({DRIFT_KS_MAX_ROWS_PER_KEY}). "
                "A pathological key's full history must fit one pandas "
                "call — pre-bin and use user_value_drift_psi (pure-JVM "
                "histogram PSI) for keys at this volume, or raise the "
                "guard if executor memory allows."
            )
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {"user_id": [], "n_a": [], "n_b": [], "ks_u6": []}
            ).astype({"user_id": "int64", "n_a": "int64", "n_b": "int64",
                      "ks_u6": "int64"})
        if "value" not in left.columns or "value" not in right.columns:
            # Catalyst prunes cogroup INPUT columns when no downstream
            # consumer reads a value-derived output (e.g. a bare
            # count()). Row multiplicity is value-independent here
            # (one row iff both sides non-empty), so emit it with a
            # placeholder statistic — observationally identical for
            # every plan that triggers the pruning.
            return pd.DataFrame(
                {
                    "user_id": [int(left["user_id"].iloc[0])],
                    "n_a": [len(left)],
                    "n_b": [len(right)],
                    "ks_u6": [0],
                }
            )
        va = np.sort(left["value"].to_numpy())
        vb = np.sort(right["value"].to_numpy())
        pts = np.unique(np.concatenate([va, vb]))
        cdfa = np.searchsorted(va, pts, side="right") / len(va)
        cdfb = np.searchsorted(vb, pts, side="right") / len(vb)
        d = float(np.max(np.abs(cdfa - cdfb)))
        uid = int(left["user_id"].iloc[0])
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_a": [len(va)],
                "n_b": [len(vb)],
                "ks_u6": [int(np.floor(d * 1000000.0))],
            }
        )

    return a.groupBy("user_id").cogroup(b.groupBy("user_id")).applyInPandas(
        ks, "user_id long, n_a long, n_b long, ks_u6 long"
    )


# ---------------------------------------------------------------------------
# PSI drift — the pure-JVM twin of user_value_drift_ks (whose own
# docstring names this as what a no-Python pipeline would run): per
# user, Population Stability Index between the two hash-split halves
# over B fixed-width value bins. Everything is whole-stage-codegen
# SQL — zero Python stages, plan-asserted — and fully oracle-checked.
#
# Determinism engineering: (a) the per-user PSI is a FLOAT SUM, which
# over an unordered group would not survive the cross-engine hash —
# so bins are collected as a sorted array and folded SEQUENTIALLY
# (aggregate HOF / list_sum over list(... ORDER BY bin)): identical
# addition order, identical doubles; (b) bins empty on BOTH sides all
# contribute the same closed-form smoothing term, so they are COUNTED
# (B - bins_present) instead of materialized — no user×B grid join;
# (c) Laplace smoothing (c+1)/(n+B) keeps every log argument an exact
# ratio of integers, so the only cross-engine float risk is ln()'s
# final ulp (the doc_tfidf_top_terms precedent), absorbed by the
# micro-unit floor.
# ---------------------------------------------------------------------------
DRIFT_PSI_BINS = 10
DRIFT_PSI_ALERT_U6 = 200_000  # the conventional PSI > 0.2 'major shift'


@query(
    "user_value_drift_psi",
    f"""
    WITH t AS (SELECT user_id, value,
                      CASE WHEN {sql_hash_bucket("event_id", salt="drift")} < 50
                           THEN 'a' ELSE 'b' END AS side
               FROM events),
    g AS (SELECT MIN(value) AS vmin, MAX(value) AS vmax FROM t),
    bb AS (SELECT user_id, side,
                  CASE WHEN vmax = vmin THEN 0
                       ELSE CAST(LEAST(FLOOR((value - vmin) * {DRIFT_PSI_BINS}.0
                                             / (vmax - vmin)),
                                       {DRIFT_PSI_BINS - 1}) AS INT) END AS bin
           FROM t CROSS JOIN g),
    p AS (SELECT user_id, bin,
                 SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END)::BIGINT AS ca,
                 SUM(CASE WHEN side = 'b' THEN 1 ELSE 0 END)::BIGINT AS cb
          FROM bb GROUP BY user_id, bin),
    u AS (SELECT user_id,
                 SUM(ca)::BIGINT AS na, SUM(cb)::BIGINT AS nb,
                 COUNT(*)::BIGINT AS nbins,
                 list({{'ca': ca, 'cb': cb}} ORDER BY bin) AS bins
          FROM p GROUP BY user_id),
    s AS (SELECT user_id, na, nb,
                 list_sum(list_transform(bins, x ->
                     ((x.ca + 1) / CAST(na + {DRIFT_PSI_BINS} AS DOUBLE)
                      - (x.cb + 1) / CAST(nb + {DRIFT_PSI_BINS} AS DOUBLE))
                     * ln(((x.ca + 1) * (nb + {DRIFT_PSI_BINS}))
                          / CAST((x.cb + 1) * (na + {DRIFT_PSI_BINS}) AS DOUBLE))))
                 + ({DRIFT_PSI_BINS} - nbins)
                   * ((1.0 / (na + {DRIFT_PSI_BINS}) - 1.0 / (nb + {DRIFT_PSI_BINS}))
                      * ln((nb + {DRIFT_PSI_BINS})
                           / CAST(na + {DRIFT_PSI_BINS} AS DOUBLE))) AS psi
          FROM u WHERE na > 0 AND nb > 0)
    SELECT user_id, na AS n_a, nb AS n_b,
           CAST(FLOOR(psi * 1000000.0) AS BIGINT) AS psi_u6,
           (CAST(FLOOR(psi * 1000000.0) AS BIGINT)
            >= {DRIFT_PSI_ALERT_U6})::BIGINT AS drifted
    FROM s
    """,
)
def q_user_value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, n_a, n_b, psi_u6, drifted): per-user PSI over
    {DRIFT_PSI_BINS} fixed-width global bins between the same two
    hash-split halves user_value_drift_ks compares — histogram
    pre-aggregation first, so at 100 TB the statistic rides
    \\|users\\|×B pre-binned counts (mergeable across ingests) instead
    of shipping every event row across an Arrow boundary. Two
    shuffles total: (user,bin) counts, then the per-user sorted-bin
    fold. Users missing either half are dropped (PSI undefined, KS
    parity); drifted = psi ≥ 0.2 in micro-units."""
    from .operators.sampling import hash_bucket

    B = DRIFT_PSI_BINS
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value"
    )
    t = events.select(
        "user_id",
        "value",
        F.when(hash_bucket("event_id", 100, "drift") < 50, "a")
        .otherwise("b")
        .alias("side"),
    )
    g = t.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    bb = t.crossJoin(F.broadcast(g)).select(
        "user_id",
        "side",
        F.when(F.col("vmax") == F.col("vmin"), F.lit(0))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("value") - F.col("vmin"))
                    * float(B)
                    / (F.col("vmax") - F.col("vmin"))
                ),
                F.lit(B - 1),
            ).cast("int")
        )
        .alias("bin"),
    )
    p = bb.groupBy("user_id", "bin").agg(
        F.sum(F.when(F.col("side") == "a", 1).otherwise(0))
        .cast("bigint")
        .alias("ca"),
        F.sum(F.when(F.col("side") == "b", 1).otherwise(0))
        .cast("bigint")
        .alias("cb"),
    )
    u = p.groupBy("user_id").agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
        F.count(F.lit(1)).cast("bigint").alias("nbins"),
        F.array_sort(
            F.collect_list(F.struct("bin", "ca", "cb"))
        ).alias("bins"),
    )
    term = (
        f"(x.ca + 1) / cast(na + {B} as double)"
        f" - (x.cb + 1) / cast(nb + {B} as double)"
    )
    lg = (
        f"ln(((x.ca + 1) * (nb + {B}))"
        f" / cast((x.cb + 1) * (na + {B}) as double))"
    )
    empty = (
        f"(1.0D / (na + {B}) - 1.0D / (nb + {B}))"
        f" * ln((nb + {B}) / cast(na + {B} as double))"
    )
    psi = F.expr(
        f"aggregate(bins, 0D, (acc, x) -> acc + ({term}) * ({lg}))"
        f" + ({B} - nbins) * ({empty})"
    )
    s = u.filter((F.col("na") > 0) & (F.col("nb") > 0)).select(
        "user_id", "na", "nb", psi.alias("psi")
    )
    psi_u6 = F.floor(F.col("psi") * 1000000.0).cast("bigint")
    return s.select(
        F.col("user_id"),
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        psi_u6.alias("psi_u6"),
        (psi_u6 >= F.lit(DRIFT_PSI_ALERT_U6)).cast("bigint").alias("drifted"),
    )


# ---------------------------------------------------------------------------
# Co-located (bucketed) big-big join — the physical-layout lever for
# joins where NEITHER side broadcasts: both tables written bucketed on
# the join key once at ingest, every subsequent join skips its
# exchanges entirely. At 100 TB this is the difference between a
# nightly orders⋈customer costing two full shuffles and costing none;
# the PREPARES fixture is the ingest-time write, the timed body is
# the recurring query (the amortization the bucketing buys), and the
# plan test pins ZERO exchanges below the join.
# ---------------------------------------------------------------------------
_BUCKETED_JOIN_CACHE: dict[str, tuple[str, str]] = {}


def _prepare_bucketed_join(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write orders and customer as external tables bucketed (8) on
    the customer key — memoized per (process, sf_dir); run-scoped
    names/locations so concurrent sessions never collide."""
    got = _BUCKETED_JOIN_CACHE.get(sf_dir)
    if got is not None:
        return got
    import hashlib
    import os
    import tempfile

    from .sources.sinks import write_bucketed_table

    tag = hashlib.md5(f"{sf_dir}:{os.getpid()}".encode()).hexdigest()[:10]
    base = tempfile.mkdtemp(prefix=f"hubsit_bucketed_{tag}_")
    t_orders, t_cust = f"orders_bkt_{tag}", f"customer_bkt_{tag}"
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    write_bucketed_table(
        orders, t_orders, "o_custkey", n_buckets=8, sort_col="o_custkey",
        path=os.path.join(base, "orders"),
    )
    write_bucketed_table(
        cust, t_cust, "c_custkey", n_buckets=8, sort_col="c_custkey",
        path=os.path.join(base, "customer"),
    )
    _BUCKETED_JOIN_CACHE[sf_dir] = (t_orders, t_cust)
    return t_orders, t_cust


PREPARES["bucketed_segment_revenue"] = _prepare_bucketed_join


@query(
    "bucketed_segment_revenue",
    """
    SELECT c_mktsegment,
           COUNT(*)::BIGINT AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS receita
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_bucketed_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per market segment through a ZERO-SHUFFLE big-big join:
    both sides pre-bucketed (8) on the customer key, so the sort-merge
    join reads co-located buckets directly — no exchange below the
    join, plan-asserted; the only shuffle is the final segment
    aggregate. The oracle joins the raw tables, proving the bucketed
    layout changed nothing. The PREPARES write is the once-per-ingest
    cost; this query is the shape every later consumer pays. The MERGE
    hint pins the at-scale strategy: at fixture scale the dim fits a
    broadcast so Catalyst would pick BHJ and the layout never
    exercises — at 100 TB neither side broadcasts and this co-located
    sort-merge (buckets pre-sorted on the key, so not even a Sort
    node) is exactly what runs."""
    t_orders, t_cust = _prepare_bucketed_join(spark, sf_dir)
    orders = spark.table(t_orders)
    cust = spark.table(t_cust).hint("merge")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("receita"),
    )


# ---------------------------------------------------------------------------
# Continuous drift: the STREAMING deployment shape of the PSI monitor
# (streaming/drift.py) verified in batch — per-day value histograms
# scored against a frozen reference distribution. The histogram is
# additive, so the same builder runs as a stateful streaming windowed
# agg (watermark + late data) and as this batch query; the reference
# bounds/histogram are collected ONCE (literal model, like codebooks)
# because a monitor must not let its reference drift with the data it
# judges. Oracle recomputes bounds, reference, per-window histograms
# and the full-B-bin sequential PSI fold from scratch.
# ---------------------------------------------------------------------------
WDRIFT_BINS = 10


@query(
    "windowed_drift_psi",
    f"""
    WITH t AS (SELECT time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)) AS tb,
                      value
               FROM events),
    g AS (SELECT MIN(value) AS vmin, MAX(value) AS vmax,
                 COUNT(*)::BIGINT AS nr FROM t),
    b AS (SELECT tb,
                 CASE WHEN vmax = vmin THEN 0
                      ELSE CAST(LEAST(GREATEST(FLOOR((value - vmin) * {WDRIFT_BINS}.0
                                                     / (vmax - vmin)), 0),
                                      {WDRIFT_BINS - 1}) AS INT) END AS bin
          FROM t CROSS JOIN g),
    ref AS (SELECT bin, COUNT(*)::BIGINT AS r FROM b GROUP BY bin),
    refg AS (SELECT t2.bin, COALESCE(ref.r, 0) AS r
             FROM (SELECT unnest(range({WDRIFT_BINS})) AS bin) t2
             LEFT JOIN ref ON ref.bin = t2.bin),
    cur AS (SELECT tb, bin, COUNT(*)::BIGINT AS c FROM b GROUP BY tb, bin),
    wins AS (SELECT tb, SUM(c)::BIGINT AS n_cur FROM cur GROUP BY tb),
    grid AS (SELECT w.tb, w.n_cur, rg.bin, rg.r, COALESCE(cur.c, 0) AS c
             FROM wins w CROSS JOIN refg rg
             LEFT JOIN cur ON cur.tb = w.tb AND cur.bin = rg.bin),
    folded AS (SELECT tb, n_cur,
                      list({{'c': c, 'r': r}} ORDER BY bin) AS lst
               FROM grid GROUP BY tb, n_cur),
    s AS (SELECT tb, n_cur,
                 list_sum(list_transform(lst, x ->
                     ((x.c + 1) / CAST(n_cur + {WDRIFT_BINS} AS DOUBLE)
                      - (x.r + 1) / CAST(g.nr + {WDRIFT_BINS} AS DOUBLE))
                     * ln(((x.c + 1) * (g.nr + {WDRIFT_BINS}))
                          / CAST((x.r + 1) * (n_cur + {WDRIFT_BINS}) AS DOUBLE))))
                 AS psi
          FROM folded CROSS JOIN g)
    SELECT strftime(tb, '%Y-%m-%d %H:%M:%S') AS window_start,
           n_cur,
           CAST(FLOOR(psi * 1000000.0) AS BIGINT) AS psi_u6,
           (CAST(FLOOR(psi * 1000000.0) AS BIGINT) >= {DRIFT_PSI_ALERT_U6})::BIGINT
             AS drifted
    FROM s
    """,
)
def q_windowed_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(window_start, n_cur, psi_u6, drifted): each day's value
    histogram scored by PSI against the frozen whole-corpus reference
    — which calendar days deviate from the norm. The builder pair
    (streaming/drift.py::windowed_value_histogram + psi_vs_reference)
    is streaming-ready: pass a readStream frame + watermark and the
    SAME code becomes the continuous monitor; reference bounds and
    histogram are collected literals (the model), per-window current
    counts ride a map lookup so the window side ships only non-empty
    bins."""
    from .streaming.drift import (
        psi_vs_reference,
        value_bin_expr,
        windowed_value_histogram,
    )

    events = load_table(spark, sf_dir, "events")
    gb = events.agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    ).collect()[0]
    vmin, vmax = float(gb["vmin"]), float(gb["vmax"])
    ref_rows = (
        events.select(
            value_bin_expr("value", vmin, vmax, WDRIFT_BINS).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("r"))
        .collect()
    )
    reference = [0] * WDRIFT_BINS
    for r in ref_rows:
        reference[int(r["bin"])] = int(r["r"])
    hist = windowed_value_histogram(
        events, "ts", "1 day", "value", vmin, vmax, WDRIFT_BINS
    )
    # assume_merged: windowed_value_histogram's groupBy key IS
    # (window, bin), so rows are unique — skip the defensive merge
    # shuffle and keep the monitor's 2-exchange plan (plan-pinned).
    return psi_vs_reference(
        hist,
        reference,
        ("window_start",),
        WDRIFT_BINS,
        DRIFT_PSI_ALERT_U6,
        assume_merged=True,
    )


# ---------------------------------------------------------------------------
# PCA embedding reduction (distributed Spark ML fit #3, after the
# KMeans coarse quantizer and the LogisticRegression quality model):
# project 64-dim embeddings onto the top PCA_K principal components —
# the dense-rotation compression that PRECEDES quantization in real
# vector pipelines (OPQ ≈ PCA rotation + PQ). Rows-only by
# construction like ann_kmeans_ivf_recall: a distributed eigen-
# decomposition has no cross-engine twin (component signs/order are
# solver-specific); the quality bounds live in pytest — PCA
# reconstruction must beat the mean-only baseline and capture a
# minimum variance share. The OUTPUT is driver-canonicalizable by
# contract (VERDICT r7 #1): scalar columns only — the md5 signature
# of the rounded reduced vector (the embedding_quantize pattern)
# instead of a raw array<float> the gate's canonicalizer cannot hash.
# ---------------------------------------------------------------------------
PCA_K = 16


@query("embedding_pca_reduce")
def q_embedding_pca_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, reduced_sig, energy_kept_u6, recon_err_u6): distributed
    Spark ML PCA fit → k×64 component matrix collected as rounded,
    sign-canonicalized LITERALS (operators/similarity.py::
    pca_components, the PQ-codebook model contract) → map-only
    literal-matmul projection (pca_project_expr, zero Python / zero
    shuffles). Per vector: md5 signature of the 6dp reduced vector,
    kept-energy share |r|²/|x|² in micro-units, and mean reconstruction
    error (|x|²-|r|²)/dim in micro-units — exact via Pythagoras for an
    orthonormal-projection, no second matmul. The 64→16 cut is 4×
    storage before any quantization; ann_opq_adc_topk chains PQ after
    this rotation for the full compression stack. Rows-only by
    construction (the fit); projection/energy bounds in
    tests/test_ext_operators.py. Hash-grade verification: fresh-JVM
    two-session determinism pin + a pure-Python bit-for-bit replay of
    every energy_kept_u6/recon_err_u6 from the component literals
    (tests/test_rows_only_verification.py; subspace optimality vs
    numpy eigendecomposition in test_ext_operators.py)."""
    from .operators.similarity import pca_components, pca_project_expr

    emb = load_table(spark, sf_dir, "embeddings")
    pc = pca_components(emb, PCA_K)
    dim = len(pc[0])
    v = "cast(embedding as array<double>)"
    out = emb.select(
        "vec_id",
        pca_project_expr(pc).alias("r"),
        F.expr(
            f"aggregate(transform({v}, x -> x * x), 0D, (acc, w) -> acc + w)"
        ).alias("tot"),
    )
    kept = "aggregate(transform(r, x -> x * x), 0D, (acc, w) -> acc + w)"
    return out.select(
        "vec_id",
        F.md5(F.concat_ws(",", F.col("r").cast("array<string>"))).alias(
            "reduced_sig"
        ),
        F.expr(f"cast(floor(1000000.0D * {kept} / tot) as bigint)").alias(
            "energy_kept_u6"
        ),
        F.expr(
            f"cast(floor(greatest(0D, tot - {kept}) * 1000000.0D / {dim}D) "
            "as bigint)"
        ).alias("recon_err_u6"),
    )


# ---------------------------------------------------------------------------
# Composed compression stack (OPQ shape): rotate → PQ encode → ADC
# top-k, the full pipeline a real vector store runs. Two variants:
#
# - ann_rot_pq_adc_topk: deterministic Hadamard rotation (entries
#   ±0.125, exact in binary) — the structured-rotation + PQ recipe.
#   Because the rotation is a data-independent literal, the ENTIRE
#   stack (rotate, codebook train, encode, asymmetric search) is
#   recomputed from scratch by the DuckDB oracle and hash-matched —
#   the composition (sign/order/rounding subtleties of chaining a
#   rotation into quantization) is what the hash covers.
# - ann_opq_adc_topk: PCA-fitted rotation with eigenvalue allocation
#   (round-robin component deal, Ge et al. CVPR'13 §4) — the OPQ
#   initialization proper. The fit is a distributed Spark ML job →
#   rows-only by construction (same posture as ann_pq_trained_recall);
#   pytest pins quantization MSE below the unrotated path and recall
#   floors.
#
# Determinism design: a rotation stage ROUNDS its output, so the
# downstream codebook averages sit on a decimal lattice — label-means
# of lattice values land exactly ON round-half boundaries for ~1/n of
# coordinates, where Spark (BigDecimal HALF_UP on the shortest-repr
# decimal) and DuckDB (double-multiply std::round) disagree by 1 ulp.
# The float PQ chain is therefore NOT composable cross-engine after a
# rounded rotation; this stack instead switches to exact int64
# micro-units right at the rotation (operators/similarity.py
# project_u6_expr + pq_*_u6 family): one measure-zero-boundary round
# of a continuous dot product, then floor-of-average centroids and
# pure integer distances — bitwise engine-independent with zero
# rounding anywhere downstream, which is exactly what the oracle hash
# proves.
# ---------------------------------------------------------------------------
def _rot_pq_u6_oracle() -> str:
    """Full DuckDB rebuild of the Hadamard → micro-unit PQ → ADC
    stack: literal ±0.125 rotation rows, rot coords as
    round(dot·1e6)::BIGINT, floor-of-average integer centroids,
    exact-int64 encode + asymmetric distances, top-{ANN_K}."""
    from .operators.similarity import (
        EMBED_DIM,
        PQ_M,
        PQ_SUB_DIM,
        U6,
        hadamard_rotation,
    )

    rows = ", ".join(
        f"({j + 1}, [" + ", ".join(str(x) for x in row) + "])"
        for j, row in enumerate(hadamard_rotation())
    )
    cb_selects = " UNION ALL ".join(
        f"SELECT {s} AS s, label, ["
        + ", ".join(
            f"CAST(FLOOR(AVG(rot[{s * PQ_SUB_DIM + i + 1}])) AS BIGINT)"
            for i in range(PQ_SUB_DIM)
        )
        + "] AS centroid FROM rotu GROUP BY label"
        for s in range(PQ_M)
    )
    sq = (
        f"(x.rot[CAST(y.s * {PQ_SUB_DIM} AS INT) + CAST(i AS INT)]"
        f" - y.centroid[CAST(i AS INT)])"
    )
    return f"""
    WITH hm(j, hrow) AS (SELECT * FROM (VALUES {rows}) AS t(j, hrow)),
    rotu AS (SELECT e.vec_id, e.label,
                    list(CAST(ROUND(list_sum(list_transform(range(1, {EMBED_DIM + 1}),
                         i -> CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)
                              * hm.hrow[CAST(i AS INT)])) * {U6}.0, 0) AS BIGINT)
                         ORDER BY hm.j) AS rot
             FROM embeddings e CROSS JOIN hm
             GROUP BY e.vec_id, e.label),
    cb AS ({cb_selects}),
    lab AS (SELECT s, label, centroid,
                   ROW_NUMBER() OVER (PARTITION BY s ORDER BY label) - 1 AS k
            FROM cb),
    scored AS (SELECT x.vec_id, y.s, y.k,
                      list_sum(list_transform(range(1, {PQ_SUB_DIM + 1}),
                            i -> {sq} * {sq})) AS d
               FROM rotu x, lab y),
    ranked AS (SELECT vec_id, s, k, d,
                      ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                         ORDER BY d, k) AS rn
               FROM scored),
    chosen AS (SELECT vec_id, s, k AS code FROM ranked WHERE rn = 1),
    qv AS (SELECT vec_id AS query_id, rot FROM rotu
           WHERE vec_id < {ANN_QUERY_LIMIT}),
    adc AS (SELECT x.query_id, ch.vec_id AS neighbor_id,
                   CAST(SUM(list_sum(list_transform(range(1, {PQ_SUB_DIM + 1}),
                         i -> (x.rot[CAST(ch.s * {PQ_SUB_DIM} AS INT) + CAST(i AS INT)]
                               - y.centroid[CAST(i AS INT)])
                              * (x.rot[CAST(ch.s * {PQ_SUB_DIM} AS INT) + CAST(i AS INT)]
                                 - y.centroid[CAST(i AS INT)])))) AS BIGINT) AS adc_u
            FROM qv x
            JOIN chosen ch ON x.query_id <> ch.vec_id
            JOIN lab y ON y.s = ch.s AND y.k = ch.code
            GROUP BY x.query_id, ch.vec_id),
    rk AS (SELECT query_id, neighbor_id, adc_u,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY adc_u, neighbor_id) AS rank
           FROM adc)
    SELECT query_id, neighbor_id, adc_u, rank::BIGINT AS rank
    FROM rk WHERE rank <= {ANN_K}
    """


def _rot_pq_topk(
    spark: SparkSession,
    sf_dir: str,
    components: list[list[float]],
    k: int = ANN_K,
) -> DataFrame:
    """Shared Spark body for both rotation variants: project onto
    literal ``components`` straight into int64 micro-units, train
    floor-of-average integer codebooks on the ROTATED corpus, encode,
    then exact-int64 asymmetric top-{ANN_K} with broadcast rotated
    queries. One shuffle (codebook groupBy) + one window; the ADC scan
    is map-only over (vec_id, 8 codes). At 100 TB the rotated
    micro-unit corpus is written once at ingest (map-only) and only
    the codes table is ever scanned at query time."""
    from pyspark.sql import Window

    from .operators.similarity import (
        pq_adc_u6_dist_expr,
        pq_codebooks_floor_u6,
        pq_encode_u6_exprs,
        project_u6_expr,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    rot = _spread(emb).select(
        "vec_id", "label", project_u6_expr(components, "embedding").alias("rot")
    )
    cb = pq_codebooks_floor_u6(rot, vec_col="rot")
    codes, _ = pq_encode_u6_exprs(cb, vec_col="rot")
    corpus_codes = rot.select("vec_id", codes.alias("codes"))
    q = rot.filter(F.col("vec_id") < ANN_QUERY_LIMIT).select(
        F.col("vec_id").alias("query_id"), F.col("rot").alias("q_vec")
    )
    pairs = corpus_codes.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        pq_adc_u6_dist_expr(cb).alias("adc_u"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_u").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "adc_u",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


@query("ann_rot_pq_adc_topk", _rot_pq_u6_oracle())
def q_ann_rot_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hadamard-rotation → PQ → ADC top-k, FULLY hash-checked: the
    oracle rebuilds the rotation (literal ±0.125 Hadamard rows —
    operators/similarity.py::hadamard_rotation), the micro-unit
    rotated corpus, the integer codebooks, every code assignment, and
    the exact-int64 asymmetric distances from scratch in SQL — so the
    cross-engine hash pins the whole rotate→quantize composition, not
    just one stage. The rotation is orthonormal, so ADC distances
    approximate the SAME original-space L2 geometry as the unrotated
    ann_pq_adc_topk path (adc_u ≈ L2²·1e12) while decorrelating
    coordinates before the per-subspace quantizer."""
    from .operators.similarity import hadamard_rotation

    return _rot_pq_topk(spark, sf_dir, hadamard_rotation())


@query("ann_opq_adc_topk")  # rows-only by construction: PCA fit (see docstring)
def q_ann_opq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ-initialization ANN: full-rank PCA rotation (Spark ML fit,
    sign-canonicalized literal components) with eigenvalue allocation
    — components dealt round-robin across the PQ subspaces so each
    codebook sees a balanced slice of the variance spectrum
    (operators/similarity.py::opq_balance_components) — then the same
    micro-unit PQ encode → ADC top-k body as ann_rot_pq_adc_topk.
    Closes the docstring promise at embedding_pca_reduce: the full
    rotate→quantize compression stack in one query. No DuckDB oracle
    BY CONSTRUCTION (the distributed eigensolver fit, same posture as
    ann_pq_trained_recall); pytest pins the OPQ quantization MSE below
    the unrotated AND the contiguous-slice PCA paths plus recall
    floors, and plan tests forbid cartesians. Hash-grade verification:
    fresh-JVM two-session determinism pin + the ann_rot_pq_adc_topk-
    precedent numpy int64 replica (every adc_u bit-for-bit from the
    collected OPQ components) in tests/test_rows_only_verification.py."""
    from .operators.similarity import (
        EMBED_DIM,
        opq_balance_components,
        pca_components,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    comps = pca_components(emb, EMBED_DIM)
    return _rot_pq_topk(spark, sf_dir, opq_balance_components(comps))



# ---------------------------------------------------------------------------
# Duplicate-cluster size histogram: the curation dashboard number —
# "how duplicated is this corpus" as a count-of-counts over the same
# exact∪MinHash duplicate graph. Singletons included (cluster_size=1
# = unique docs), dedup rate derivable as 1 - Σkeepers/Σdocs. Two
# nested aggregations ride the clustering output; the heavy lifting
# is the shared CC pass dedup_clusters already pins.
# ---------------------------------------------------------------------------
@query(
    "dedup_cluster_size_histogram",
    f"""
    WITH RECURSIVE {_minhash_pairs_ctes()},
    fp AS (SELECT doc_id,
                  md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS fp
           FROM documents),
    freps AS (SELECT fp, MIN(doc_id) AS rep FROM fp GROUP BY fp),
    edges0 AS (
        SELECT doc_a, doc_b FROM mh_pairs WHERE jaccard >= {JACCARD_THRESHOLD}
        UNION
        SELECT f.rep AS doc_a, p.doc_id AS doc_b
        FROM fp p JOIN freps f USING (fp) WHERE p.doc_id <> f.rep),
    edges AS (SELECT doc_a AS u, doc_b AS v FROM edges0
              UNION
              SELECT doc_b AS u, doc_a AS v FROM edges0),
    reach(node, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT reach.node, e.v FROM reach JOIN edges e ON e.u = reach.r),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
    sizes AS (SELECT component, COUNT(*) AS cluster_size FROM comp
              GROUP BY component)
    SELECT cluster_size::BIGINT AS cluster_size,
           COUNT(*)::BIGINT AS n_clusters,
           (cluster_size * COUNT(*))::BIGINT AS n_docs
    FROM sizes GROUP BY cluster_size
    """,
)
def q_dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cluster_size, n_clusters, n_docs): count-of-counts over the
    duplicate clusters, singletons included."""
    from .operators.clusters import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    near = minhash_candidates(
        docs, bucket_cap=MINHASH_BUCKET_CAP, pre_exact_dedup=True
    ).filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    edges = near.unionByName(exact_dup_edges(docs))
    clusters = dedup_clusters(docs, edges)  # (component, n_members, keeper)
    return clusters.groupBy(
        F.col("n_members").cast("bigint").alias("cluster_size")
    ).agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1))).cast("bigint").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# Key-skew diagnosis: the report you run BEFORE choosing a salting
# strategy — the top heavy keys, their row share, and the derived
# salt factor that brings each under the per-task row target.
# Completes the skew family's detect→mitigate story next to
# salted_event_totals / salted_priority_join.
# ---------------------------------------------------------------------------
SKEW_TOP = 10
SKEW_TARGET_ROWS = 500  # per-task row target at fixture scale


@query(
    "event_user_skew_report",
    f"""
    WITH c AS (SELECT user_id AS key_value, COUNT(*)::BIGINT AS n_rows
               FROM events GROUP BY user_id),
    t AS (SELECT SUM(n_rows) AS total FROM c),
    r AS (SELECT key_value, n_rows,
                 ROW_NUMBER() OVER (ORDER BY n_rows DESC, key_value) AS rank
          FROM c)
    SELECT rank::BIGINT AS rank, key_value, n_rows,
           ROUND(n_rows / CAST(t.total AS DOUBLE), 6) AS row_share,
           CAST(ceil(n_rows / {SKEW_TARGET_ROWS}.0) AS BIGINT) AS salt_factor
    FROM r CROSS JOIN t WHERE rank <= {SKEW_TOP}
    """,
)
def q_event_user_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/skew.py::key_skew_report over events.user_id."""
    from .operators.skew import key_skew_report

    events = load_table(spark, sf_dir, "events")
    return key_skew_report(
        events, "user_id", top=SKEW_TOP, target_rows_per_task=SKEW_TARGET_ROWS
    )


# ---------------------------------------------------------------------------
# Driver-visible rows for the I/O maintenance ops (previously
# pytest-only; VERDICT r7 #6): each query performs the REAL
# side-effecting round-trip in a run-private directory and emits the
# oracle-checkable read-back facts. The hash match covers what SQL
# can re-derive (shard membership, row counts); byte-level assertions
# (file counts, manifest tamper detection, crash recovery) stay in
# tests/test_export_manifest.py and tests/test_bucketing_partitioning.py.
# ---------------------------------------------------------------------------
EXPORT_SHARDS = 8


@query(
    "export_manifest_roundtrip",
    f"""
    SELECT {sql_hash_bucket("doc_id", EXPORT_SHARDS, "shard")}::BIGINT AS shard,
           COUNT(*)::BIGINT AS n_rows,
           1::BIGINT AS verified
    FROM documents GROUP BY 1
    """,
)
def q_export_manifest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full export→manifest→re-read→verify round-trip: documents
    (id/source/lang projection) hash-sharded into {EXPORT_SHARDS}
    parquet shards with an order-independent content manifest
    (sources/export.py), then verify_export re-reads the dump and
    checks every shard. Output: one row per shard (shard, n_rows,
    verified) — the oracle independently recomputes shard membership
    and counts from the source table, so a hash match proves the dump
    on disk holds exactly the rows the table says it should; verified
    flips to 0 (hash mismatch vs the oracle's constant 1) if the
    manifest check finds ANY problem."""
    from pyspark.sql.types import LongType, StructField, StructType

    from .sources.export import export_training_shards, verify_export

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang"
    )
    out_dir = _run_scoped_index_dir("export") + "/dump"
    export_training_shards(docs, out_dir, EXPORT_SHARDS, "doc_id")
    ok = 1 if not verify_export(spark, out_dir) else 0
    dump = spark.read.parquet(out_dir)
    return dump.groupBy(F.col("_shard").cast("bigint").alias("shard")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.lit(ok).cast("bigint").alias("verified"),
    )


@query(
    "compaction_roundtrip",
    """
    SELECT COUNT(*)::BIGINT AS n_rows,
           1::BIGINT AS rows_preserved,
           1::BIGINT AS files_reduced
    FROM orders
    """,
)
def q_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full fragment→compact→read-back round-trip: orders written as
    64 deliberately small files, compacted via
    sources/compaction.py::compact_parquet (crash-recoverable
    verify-before-swap), then re-read. One row: (n_rows,
    rows_preserved, files_reduced) — n_rows hash-matches the oracle's
    source count only if the compacted directory still holds every
    row; the two flags flip to 0 on row loss or a rewrite that failed
    to shrink the file count."""
    from .sources.compaction import compact_parquet, parquet_file_stats

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    path = _run_scoped_index_dir("compact") + "/orders"
    orders.repartition(64).write.parquet(path)
    n_before = parquet_file_stats(path)[0]
    n_src = orders.count()
    compact_parquet(spark, path)
    n_after = parquet_file_stats(path)[0]
    back = spark.read.parquet(path)
    n_back = back.count()
    return spark.range(1).select(
        F.lit(n_back).cast("bigint").alias("n_rows"),
        F.lit(1 if n_back == n_src else 0).cast("bigint").alias("rows_preserved"),
        F.lit(1 if n_after < n_before else 0).cast("bigint").alias("files_reduced"),
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval — lexical top-k search over the corpus for a
# fixed query set (the retrieval-side sibling of semantic ANN search:
# retrieval-based decontamination and eval-mining run exactly this).
# Builder + scoring formula: operators/textanalysis.py::bm25_scores
# (Okapi BM25, Lucene idf). Determinism: the per-(query,doc) term sum
# folds a token-sorted array sequentially (PSI precedent), every
# subexpression of the contribution is parenthesized identically on
# both engines (BM25_CONTRIB_SQL is the shared text), and ranking is
# on the micro-unit floor with doc_id tie-break.
# ---------------------------------------------------------------------------
from .operators.sketches import (  # noqa: E402 — section-local import
    CMS_DEPTH,
    CMS_WIDTH,
    duckdb_cms_bucket_sql,
)
from .operators.textanalysis import BM25_CONTRIB_SQL  # noqa: E402

BM25_QUERY_SET = [
    ("q0", "spark"),
    ("q0", "table"),
    ("q1", "hash"),
    ("q1", "join"),
    ("q1", "fast"),
    ("q2", "vector"),
    ("q2", "scan"),
    ("q2", "merge"),
]
BM25_TOP = 10
_BM25_VALUES = ", ".join(f"('{q}', '{t}')" for q, t in BM25_QUERY_SET)


def _bm25_oracle(src: str = "documents", prelude: str = "") -> str:
    """From-scratch BM25 SQL over table/CTE ``src`` (``prelude``: extra
    leading CTEs, e.g. the forget-flow keep-list). src="documents"
    with no prelude renders the byte-identical text the hash-certified
    bm25_search family has always used."""
    return f"""
    WITH {prelude}tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
                 FROM {src}),
    t AS (SELECT doc_id, token FROM tok WHERE token <> ''),
    tf AS (SELECT doc_id, token, COUNT(*)::DOUBLE AS tf
           FROM t GROUP BY doc_id, token),
    dl AS (SELECT doc_id, COUNT(*)::DOUBLE AS dl FROM t GROUP BY doc_id),
    dfreq AS (SELECT token, COUNT(DISTINCT doc_id)::DOUBLE AS df
              FROM t GROUP BY token),
    stats AS (SELECT (SELECT COUNT(*)::DOUBLE FROM {src}) AS n_docs,
                     (SELECT COUNT(*)::DOUBLE FROM t)
                       / (SELECT COUNT(*)::DOUBLE FROM {src}) AS avgdl),
    q AS (SELECT * FROM (VALUES {_BM25_VALUES}) v(query_id, token)),
    contrib AS (SELECT query_id, tf.doc_id, tf.token, {BM25_CONTRIB_SQL} AS w
                FROM tf JOIN q USING (token) JOIN dfreq USING (token)
                JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats),
    s AS (SELECT query_id, doc_id,
                 CAST(floor(list_sum(list(w ORDER BY token)) * 1000000.0)
                      AS BIGINT) AS score_u6
          FROM contrib GROUP BY query_id, doc_id),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY score_u6 DESC, doc_id) AS rk
          FROM s)
    SELECT query_id, doc_id, score_u6, rk::BIGINT AS rk
    FROM r WHERE rk <= {BM25_TOP}
    """


_BM25_ORACLE = _bm25_oracle()


def _bm25_ranked(scores: DataFrame) -> DataFrame:
    """Two-phase salted top-{BM25_TOP} over (query_id, doc_id, score):
    phase 1 ranks within (query_id, salt), phase 2 over the <= salts*k
    survivors — same ordering both phases (score_u6 DESC, doc_id), so
    the result is identical to one global window (what the oracle
    runs) with no task ever sorting a whole query's match list."""
    from pyspark.sql import Window

    s = scores.select(
        "query_id",
        "doc_id",
        F.floor(F.col("score") * 1000000.0).cast("bigint").alias("score_u6"),
    )
    salted = s.withColumn("salt", F.col("doc_id") % 8)
    w1 = Window.partitionBy("query_id", "salt").orderBy(
        F.col("score_u6").desc(), F.col("doc_id")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score_u6").desc(), F.col("doc_id")
    )
    return (
        salted.withColumn("rk1", F.row_number().over(w1))
        .filter(F.col("rk1") <= BM25_TOP)
        .withColumn("rk", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rk") <= BM25_TOP)
        .select("query_id", "doc_id", "score_u6", "rk")
    )


def _bm25_qterms(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        BM25_QUERY_SET, "query_id string, token string"
    )


@query("bm25_search", _BM25_ORACLE)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{BM25_TOP} documents per query by BM25. The query set is a
    broadcast literal; scoring is operators/textanalysis.py::
    bm25_scores (see its docstring for the shuffle layout — tf/df
    aggregates only; df is the persisted-vocabulary posture at scale).
    The final per-query top-k is TWO-PHASE (per-salt top-k, then
    global top-k over ≤ salts·k survivors) so no single task ever
    sorts a whole query's match list — the window-skew posture for a
    query set whose matches are corpus-sized. Both phases share the
    ordering (score_u6 DESC, doc_id), so phase 2's result is
    identical to a single global window, which is what the oracle
    runs."""
    from .operators.textanalysis import bm25_scores

    docs = _spread(load_table(spark, sf_dir, "documents"))
    return _bm25_ranked(bm25_scores(docs, _bm25_qterms(spark)))


_TERM_INDEX_CACHE: dict[str, str] = {}


def _prepare_term_index(spark: SparkSession, sf_dir: str) -> str:
    """Write-time half of bm25_search_indexed, memoized per (process,
    sf_dir): materialize corpus_term_stats — tf / dl / dfreq / the
    1-row stats — as four parquet tables, the standing SEARCH INDEX a
    retrieval deployment maintains per ingest (the vocabulary-index
    posture, extended with per-(doc,token) tf and doc lengths).
    Run-scoped path so concurrent sessions never race."""
    got = _TERM_INDEX_CACHE.get(sf_dir)
    if got is not None:
        return got
    import hashlib
    import os
    import tempfile

    from .operators.textanalysis import corpus_term_stats
    from .sources.sinks import write_parquet

    tag = hashlib.md5(f"{sf_dir}:{os.getpid()}".encode()).hexdigest()[:10]
    base = tempfile.mkdtemp(prefix=f"hubsit_term_index_{tag}_")
    docs = _spread(load_table(spark, sf_dir, "documents"))
    tf, dl, dfreq, stats = corpus_term_stats(docs)
    # "raw" = the EXACT-INTEGER corpus totals behind stats' derived
    # doubles — the mergeable/subtractable form bm25_forget needs
    # (avgdl cannot be exactly un-divided back into n_toks)
    raw = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs")).crossJoin(
        F.broadcast(
            dl.agg(
                F.coalesce(F.sum("dl_l"), F.lit(0))
                .cast("bigint")
                .alias("n_toks")
            )
        )
    )
    for name, df in [
        ("tf", tf),
        ("dl", dl),
        ("dfreq", dfreq),
        ("stats", stats),
        ("raw", raw),
    ]:
        write_parquet(df, os.path.join(base, name))
    _TERM_INDEX_CACHE[sf_dir] = base
    return base


PREPARES["bm25_search_indexed"] = _prepare_term_index


@query("bm25_search_indexed", _BM25_ORACLE)
def q_bm25_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as bm25_search, zero query-time corpus passes: the
    term-stats index (tf/dl/dfreq/stats) was materialized at ingest
    (PREPARES), so the timed query is index-scan -> broadcast term
    join -> fold -> two-phase top-k — the amortized per-query cost of
    a standing search index, the posture bm25_search's docstring
    promises at 100 TB. The oracle recomputes every statistic from the
    raw corpus, proving the materialization changed nothing."""
    import os

    from .operators.textanalysis import bm25_scores

    base = _prepare_term_index(spark, sf_dir)
    term_stats = tuple(
        spark.read.parquet(os.path.join(base, name))
        for name in ["tf", "dl", "dfreq", "stats"]
    )
    scores = bm25_scores(None, _bm25_qterms(spark), term_stats=term_stats)
    return _bm25_ranked(scores)


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters — constant-state frequency estimation
# over the event stream's user key (operators/sketches.py for the
# posture: the shuffle carries tasks·depth·width counters, never the
# key space). The registered query reports the top-N users by
# ESTIMATED count next to their exact counts, so the sketch's one-
# sided error (est ≥ exact, bounded overcount) is visible — and
# oracle-checked exactly, because the DuckDB twin rebuilds the
# identical md5-salted sketch (integer-only comparison).
# ---------------------------------------------------------------------------
CMS_TOP = 20
_CMS_BUCKET_OF_I = duckdb_cms_bucket_sql("user_id", "i", CMS_WIDTH)
_CMS_BUCKET_OF_KI = duckdb_cms_bucket_sql("k.user_id", "d.i", CMS_WIDTH)

# Shared by heavy_hitters_cms AND cms_new_batch: the incremental
# variant's oracle is the full recompute VERBATIM — counter grids are
# elementwise-additive over disjoint event slices, so merged == from-
# scratch exactly, and the hash match proves it (the vocab_new_batch
# posture).
def _cms_oracle(src: str = "events", prelude: str = "") -> str:
    """Full-recompute CMS heavy-hitter SQL over table/CTE ``src``
    (``prelude``: extra leading CTEs). src="events" with no prelude
    renders the byte-identical text heavy_hitters_cms/cms_new_batch
    were hash-certified with."""
    return f"""
    WITH {prelude}d AS (SELECT unnest(range({CMS_DEPTH})) AS i),
    counters AS (SELECT i, {_CMS_BUCKET_OF_I} AS bucket, COUNT(*)::BIGINT AS c
                 FROM {src} CROSS JOIN d GROUP BY i, bucket),
    keys AS (SELECT DISTINCT user_id FROM {src}),
    est AS (SELECT k.user_id, MIN(c.c)::BIGINT AS est_count
            FROM keys k CROSS JOIN d
            JOIN counters c ON c.i = d.i AND c.bucket = {_CMS_BUCKET_OF_KI}
            GROUP BY k.user_id),
    exact AS (SELECT user_id, COUNT(*)::BIGINT AS exact_count
              FROM {src} GROUP BY user_id),
    r AS (SELECT e.user_id, e.est_count, x.exact_count,
                 (e.est_count - x.exact_count)::BIGINT AS overcount,
                 ROW_NUMBER() OVER (ORDER BY e.est_count DESC, e.user_id)
                   AS rk
          FROM est e JOIN exact x USING (user_id))
    SELECT user_id, est_count, exact_count, overcount, rk::BIGINT AS rk
    FROM r WHERE rk <= {CMS_TOP}
    """


_CMS_ORACLE = _cms_oracle()


@query("heavy_hitters_cms", _CMS_ORACLE)
def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{CMS_TOP} heavy-hitter users from a depth×width count-min
    sketch of events.user_id, with exact counts alongside. The probe
    candidate set here is the table's own distinct keys (one key
    shuffle — at scale the candidates come from the sketch's paired
    heavy-hitter stream or an external watchlist, and the sketch
    itself never shuffles keys). overcount = est − exact ≥ 0 is the
    sketch's collision bias, pinned exactly by the oracle."""
    from .operators.sketches import cms_counters

    events = load_table(spark, sf_dir, "events").select("user_id")
    return _cms_heavy_hitter_report(events, cms_counters(events, "user_id"))


# ---------------------------------------------------------------------------
# Hybrid retrieval (query-by-example): more-like-this BM25 + embedding
# cosine, fused by reciprocal-rank fusion (Cormack et al. 2009). The
# composite a retrieval-backed curation pipeline actually runs — pure
# lexical misses paraphrases, pure semantic misses rare exact terms;
# RRF needs no score calibration because it consumes only RANKS, which
# also makes the fusion ALL-INTEGER here (1e9 div (60+rank), exact on
# both engines) — the float surfaces are confined to the two source
# rankings, each already determinism-pinned (BM25_CONTRIB_SQL fold;
# dot/norm sequential folds == DuckDB list_dot_product).
# vec_id ≡ doc_id per the fixture contract semantic_decontamination
# already relies on.
# ---------------------------------------------------------------------------
HYBRID_QUERY_DOCS = [0, 1, 2]  # dense-from-0 doc keys: valid at every SF
HYBRID_MLT_TERMS = 5
HYBRID_K = 10
RRF_C = 60
_HYBRID_DOCS_IN = ", ".join(str(d) for d in HYBRID_QUERY_DOCS)


_HYBRID_ORACLE = f"""
    WITH t0 AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
                FROM documents),
    t AS (SELECT doc_id, token FROM t0 WHERE token <> ''),
    tf AS (SELECT doc_id, token, COUNT(*)::DOUBLE AS tf
           FROM t GROUP BY doc_id, token),
    dl AS (SELECT doc_id, COUNT(*)::DOUBLE AS dl FROM t GROUP BY doc_id),
    dfreq AS (SELECT token, COUNT(DISTINCT doc_id)::DOUBLE AS df
              FROM t GROUP BY token),
    stats AS (SELECT (SELECT COUNT(*)::DOUBLE FROM documents) AS n_docs,
                     (SELECT COUNT(*)::DOUBLE FROM t)
                       / (SELECT COUNT(*)::DOUBLE FROM documents) AS avgdl),
    qw AS (SELECT tf.doc_id AS query_doc, tf.token,
                  CAST(floor((tf.tf * ln(stats.n_docs / dfreq.df))
                             * 1000000.0) AS BIGINT) AS w_u6
           FROM tf JOIN dfreq USING (token) CROSS JOIN stats
           WHERE tf.doc_id IN ({_HYBRID_DOCS_IN})),
    qsel AS (SELECT query_doc, token FROM (
               SELECT query_doc, token,
                      ROW_NUMBER() OVER (PARTITION BY query_doc
                                         ORDER BY w_u6 DESC, token) AS trk
               FROM qw) WHERE trk <= {HYBRID_MLT_TERMS}),
    contrib AS (SELECT qsel.query_doc, tf.doc_id, tf.token,
                       {BM25_CONTRIB_SQL} AS w
                FROM tf JOIN qsel USING (token) JOIN dfreq USING (token)
                JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats
                WHERE tf.doc_id <> qsel.query_doc),
    lex AS (SELECT query_doc, doc_id,
                   CAST(floor(list_sum(list(w ORDER BY token)) * 1000000.0)
                        AS BIGINT) AS score_u6
            FROM contrib GROUP BY query_doc, doc_id),
    lexr AS (SELECT query_doc, doc_id, lex_rk FROM (
               SELECT query_doc, doc_id,
                      ROW_NUMBER() OVER (PARTITION BY query_doc
                                         ORDER BY score_u6 DESC, doc_id)
                        AS lex_rk
               FROM lex) WHERE lex_rk <= {HYBRID_K}),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    qv AS (SELECT vec_id AS query_doc, v FROM e
           WHERE vec_id IN ({_HYBRID_DOCS_IN})),
    cos AS (SELECT qv.query_doc, e.vec_id AS doc_id,
                   CAST(floor((list_dot_product(qv.v, e.v)
                         / (sqrt(list_dot_product(qv.v, qv.v))
                            * sqrt(list_dot_product(e.v, e.v))))
                        * 1000000.0) AS BIGINT) AS cos_u6
            FROM qv JOIN e ON e.vec_id <> qv.query_doc),
    semr AS (SELECT query_doc, doc_id, sem_rk FROM (
               SELECT query_doc, doc_id,
                      ROW_NUMBER() OVER (PARTITION BY query_doc
                                         ORDER BY cos_u6 DESC, doc_id)
                        AS sem_rk
               FROM cos) WHERE sem_rk <= {HYBRID_K}),
    fused AS (SELECT COALESCE(l.query_doc, s.query_doc) AS query_doc,
                     COALESCE(l.doc_id, s.doc_id) AS doc_id,
                     (COALESCE(1000000000 // ({RRF_C} + l.lex_rk), 0)
                      + COALESCE(1000000000 // ({RRF_C} + s.sem_rk), 0))
                       ::BIGINT AS rrf_u9,
                     COALESCE(l.lex_rk, 0)::BIGINT AS lex_rk,
                     COALESCE(s.sem_rk, 0)::BIGINT AS sem_rk
              FROM lexr l FULL OUTER JOIN semr s
                ON l.query_doc = s.query_doc AND l.doc_id = s.doc_id),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_doc
                                       ORDER BY rrf_u9 DESC, doc_id) AS rk
          FROM fused)
    SELECT query_doc, doc_id, rrf_u9, lex_rk, sem_rk, rk::BIGINT AS rk
    FROM r WHERE rk <= {HYBRID_K}
    """


@query("hybrid_rrf_search", _HYBRID_ORACLE)
def q_hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid top-{HYBRID_K} per query document: (a) LEXICAL — the
    query doc's top-{HYBRID_MLT_TERMS} tf·idf terms (the
    doc_tfidf_top_terms weighting) feed operators/textanalysis.py::
    bm25_scores as a more-like-this query; (b) SEMANTIC — exact cosine
    from the query doc's embedding (vec_id ≡ doc_id), the tiny query
    side broadcast so the corpus never shuffles; (c) FUSION —
    rrf_u9 = Σ 1e9 div ({RRF_C}+rank) over the sources that ranked the
    doc (0-rank = absent), integer-exact. Self-matches excluded from
    both sources. Each source ranking is two-phase salted top-k
    (the bm25_search posture); the fusion full-outer join and final
    rank touch ≤ 2·{HYBRID_K} rows per query."""
    from pyspark.sql import Window

    from .operators.similarity import dot_expr, norm_expr
    from .operators.textanalysis import bm25_scores, corpus_term_stats, rrf_fuse

    docs = _spread(load_table(spark, sf_dir, "documents"))

    # ONE corpus pass (explode → tf) shared by MLT term selection and
    # the BM25 scoring below — dl/df/avgdl derive from tf
    term_stats = corpus_term_stats(docs)
    tf, _dl, dfreq, st = term_stats

    # (a) lexical: MLT term selection on the query docs only
    qw = (
        tf.filter(F.col("doc_id").isin(HYBRID_QUERY_DOCS))
        .join(dfreq, "token")
        .crossJoin(F.broadcast(st.select("n_docs")))
        .select(
            F.col("doc_id").alias("query_doc"),
            "token",
            F.floor(
                (
                    F.col("tf_l").cast("double")
                    * F.log(F.col("n_docs") / F.col("df_l").cast("double"))
                )
                * F.lit(1000000.0)
            )
            .cast("bigint")
            .alias("w_u6"),
        )
    )
    wt = Window.partitionBy("query_doc").orderBy(
        F.col("w_u6").desc(), F.col("token")
    )
    qterms = (
        qw.withColumn("trk", F.row_number().over(wt))
        .filter(F.col("trk") <= HYBRID_MLT_TERMS)
        .select(F.col("query_doc").alias("query_id"), "token")
    )
    lex = (
        bm25_scores(docs, F.broadcast(qterms), term_stats=term_stats)
        .filter(F.col("doc_id") != F.col("query_id"))
        .select(
            F.col("query_id").alias("query_doc"),
            "doc_id",
            F.floor(F.col("score") * 1000000.0).cast("bigint").alias("s_u6"),
        )
    )

    lexr = _hybrid_two_phase_topk(lex, "s_u6", "lex_rk")

    # (b) semantic: broadcast query vectors, map-side cosine
    emb = _spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding", norm_expr("embedding").alias("nrm")
    )
    qv = emb.filter(F.col("vec_id").isin(HYBRID_QUERY_DOCS)).select(
        F.col("vec_id").alias("query_doc"),
        F.col("embedding").alias("qvec"),
        F.col("nrm").alias("qn"),
    )
    cos = (
        emb.crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != F.col("query_doc"))
        .select(
            "query_doc",
            F.col("vec_id").alias("doc_id"),
            F.floor(
                (dot_expr("qvec", "embedding") / (F.col("qn") * F.col("nrm")))
                * F.lit(1000000.0)
            )
            .cast("bigint")
            .alias("cos_u6"),
        )
    )
    semr = _hybrid_two_phase_topk(cos, "cos_u6", "sem_rk")
    return _hybrid_fuse(lexr, semr)


def _hybrid_two_phase_topk(scored, score_col, rank_name):
    """Two-phase salted per-query top-{HYBRID_K} (shared by the
    from-scratch and indexed hybrid queries): same ordering both
    phases, so the result equals one global window with no task ever
    sorting a whole query's match list."""
    from pyspark.sql import Window

    salted = scored.withColumn("salt", F.col("doc_id") % 8)
    w1 = Window.partitionBy("query_doc", "salt").orderBy(
        F.col(score_col).desc(), F.col("doc_id")
    )
    w2 = Window.partitionBy("query_doc").orderBy(
        F.col(score_col).desc(), F.col("doc_id")
    )
    return (
        salted.withColumn("rk1", F.row_number().over(w1))
        .filter(F.col("rk1") <= HYBRID_K)
        .withColumn(rank_name, F.row_number().over(w2))
        .filter(F.col(rank_name) <= HYBRID_K)
        .select("query_doc", "doc_id", rank_name)
    )


def _hybrid_fuse(lexr, semr):
    """All-integer RRF fusion + final rank over ≤ 2·{HYBRID_K} rows
    per query (shared tail of both hybrid queries)."""
    from pyspark.sql import Window

    from .operators.textanalysis import rrf_fuse

    fused = rrf_fuse(lexr, semr, "lex_rk", "sem_rk", RRF_C)
    wf = Window.partitionBy("query_doc").orderBy(
        F.col("rrf_u9").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("rk", F.row_number().over(wf).cast("bigint"))
        .filter(F.col("rk") <= HYBRID_K)
        .select("query_doc", "doc_id", "rrf_u9", "lex_rk", "sem_rk", "rk")
    )


_EMB_NORM_INDEX_CACHE: dict[str, str] = {}


def _prepare_embedding_norm_index(spark: SparkSession, sf_dir: str) -> str:
    """Persist (vec_id, embedding, nrm) — the corpus-side vector table
    with norms precomputed ONCE at ingest (the write-time half of the
    semantic source in hybrid_rrf_indexed), memoized per (process,
    sf_dir)."""
    got = _EMB_NORM_INDEX_CACHE.get(sf_dir)
    if got is not None:
        return got
    import hashlib
    import os
    import tempfile

    from .operators.similarity import norm_expr
    from .sources.sinks import write_parquet

    tag = hashlib.md5(f"{sf_dir}:{os.getpid()}".encode()).hexdigest()[:10]
    base = tempfile.mkdtemp(prefix=f"hubsit_emb_norm_{tag}_")
    emb = _spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding", norm_expr("embedding").alias("nrm")
    )
    write_parquet(emb, os.path.join(base, "norms"))
    _EMB_NORM_INDEX_CACHE[sf_dir] = base
    return base


def _prepare_hybrid_indexes(spark: SparkSession, sf_dir: str):
    """Both standing indexes the indexed hybrid query probes."""
    return (
        _prepare_term_index(spark, sf_dir),
        _prepare_embedding_norm_index(spark, sf_dir),
    )


PREPARES["hybrid_rrf_indexed"] = _prepare_hybrid_indexes


@query("hybrid_rrf_indexed", _HYBRID_ORACLE)
def q_hybrid_rrf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as hybrid_rrf_search with ZERO query-time corpus
    passes — the amortized posture of a standing retrieval deployment
    (the bm25_search_indexed contract extended to the whole hybrid
    stack): the LEXICAL side probes the materialized term index
    (tf/dl/dfreq/stats — MLT term selection reads the query docs' tf
    rows from the index, never a tokenizer) and the SEMANTIC side
    reads the (vec_id, embedding, nrm) norm index, so neither side
    re-tokenizes text or re-norms vectors (plan-pinned: no Generate,
    no documents scan, no sqrt-fold over the corpus). Fusion tail
    shared verbatim. The oracle recomputes every statistic from the
    raw corpus — materialization changed nothing, cryptographically."""
    import os

    from pyspark.sql import Window

    from .operators.textanalysis import bm25_scores

    term_base, emb_base = _prepare_hybrid_indexes(spark, sf_dir)
    tf, dl, dfreq, st = (
        spark.read.parquet(os.path.join(term_base, name))
        for name in ["tf", "dl", "dfreq", "stats"]
    )
    term_stats = (tf, dl, dfreq, st)

    qw = (
        tf.filter(F.col("doc_id").isin(HYBRID_QUERY_DOCS))
        .join(dfreq, "token")
        .crossJoin(F.broadcast(st.select("n_docs")))
        .select(
            F.col("doc_id").alias("query_doc"),
            "token",
            F.floor(
                (
                    F.col("tf_l").cast("double")
                    * F.log(F.col("n_docs") / F.col("df_l").cast("double"))
                )
                * F.lit(1000000.0)
            )
            .cast("bigint")
            .alias("w_u6"),
        )
    )
    wt = Window.partitionBy("query_doc").orderBy(
        F.col("w_u6").desc(), F.col("token")
    )
    qterms = (
        qw.withColumn("trk", F.row_number().over(wt))
        .filter(F.col("trk") <= HYBRID_MLT_TERMS)
        .select(F.col("query_doc").alias("query_id"), "token")
    )
    lex = (
        bm25_scores(None, F.broadcast(qterms), term_stats=term_stats)
        .filter(F.col("doc_id") != F.col("query_id"))
        .select(
            F.col("query_id").alias("query_doc"),
            "doc_id",
            F.floor(F.col("score") * 1000000.0).cast("bigint").alias("s_u6"),
        )
    )
    lexr = _hybrid_two_phase_topk(lex, "s_u6", "lex_rk")

    emb = spark.read.parquet(os.path.join(emb_base, "norms"))
    qv = emb.filter(F.col("vec_id").isin(HYBRID_QUERY_DOCS)).select(
        F.col("vec_id").alias("query_doc"),
        F.col("embedding").alias("qvec"),
        F.col("nrm").alias("qn"),
    )
    from .operators.similarity import dot_expr

    cos = (
        emb.crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != F.col("query_doc"))
        .select(
            "query_doc",
            F.col("vec_id").alias("doc_id"),
            F.floor(
                (dot_expr("qvec", "embedding") / (F.col("qn") * F.col("nrm")))
                * F.lit(1000000.0)
            )
            .cast("bigint")
            .alias("cos_u6"),
        )
    )
    semr = _hybrid_two_phase_topk(cos, "cos_u6", "sem_rk")
    return _hybrid_fuse(lexr, semr)


def _cms_heavy_hitter_report(events: DataFrame, counters: DataFrame) -> DataFrame:
    """Shared report stage of the CMS queries: probe the grid with the
    stream's distinct keys, pair estimates with exact counts, rank
    top-{CMS_TOP} by estimate (TakeOrderedAndProject via top_k)."""
    from .operators.reshape import top_k
    from .operators.sketches import cms_estimate

    est = cms_estimate(events.distinct(), counters, "user_id")
    exact = events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_count")
    )
    r = est.join(exact, "user_id").select(
        "user_id",
        "est_count",
        "exact_count",
        (F.col("est_count") - F.col("exact_count"))
        .cast("bigint")
        .alias("overcount"),
    )
    ranked = top_k(
        r, [], [F.col("est_count").desc(), F.col("user_id")], CMS_TOP, "rk"
    )
    return ranked.select(
        "user_id",
        "est_count",
        "exact_count",
        "overcount",
        F.col("rk").cast("bigint").alias("rk"),
    )


@query("cms_new_batch", _CMS_ORACLE)
def q_cms_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental sketch maintenance: the corpus slice's counter grid
    (events with event_id hash bucket >= {NEW_BATCH_PCT}) is written as
    a parquet index, read back, and merged with the new batch's grid —
    union + one sum-groupBy over <= 2·depth·width rows, because counter
    grids are elementwise-ADDITIVE over disjoint slices (the HLL-index
    posture for frequencies: each ingest sketches only its batch). The
    heavy-hitter report then runs on the merged grid; output is
    identical to heavy_hitters_cms' full recompute BY CONSTRUCTION,
    and the oracle (the full-recompute SQL verbatim) says so
    cryptographically."""
    import os

    from .operators.sampling import hash_bucket
    from .operators.sketches import cms_counters
    from .sources.sinks import write_parquet

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    is_new = hash_bucket("event_id") < NEW_BATCH_PCT
    corpus = events.filter(~is_new).select("user_id")
    batch = events.filter(is_new).select("user_id")

    idx_path = os.path.join(_run_scoped_index_dir("cms"), "cms_grid")
    write_parquet(cms_counters(corpus, "user_id"), idx_path)
    idx = spark.read.parquet(idx_path)

    merged = (
        idx.unionByName(cms_counters(batch, "user_id"))
        .groupBy("row_i", "bucket")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )
    return _cms_heavy_hitter_report(events.select("user_id"), merged)


# ---------------------------------------------------------------------------
# Exact phrase search — the third retrieval mode next to BM25 (bag of
# terms) and embedding cosine (semantic): find every positional
# occurrence of a literal token sequence. Rides the SAME positional
# gram stage the substring-dedup family shares
# (operators/textanalysis.py::_doc_grams — map-only explode, grams
# keyed by md5 like every exact-match key in the repo), so at 100 TB
# the (gh, doc, pos) table is the persisted positional inverted index
# and a phrase probe is one broadcast equi-join against it — the
# corpus is gram-hashed once per ingest, never per query.
# ---------------------------------------------------------------------------
PHRASE_LEN = 2  # tokens per phrase (gram width of the probe index)
PHRASE_SET = [("p0", "hash join"), ("p1", "table scan"), ("p2", "row batch")]
_PHRASE_VALUES = ", ".join(f"('{p}', '{t}')" for p, t in PHRASE_SET)


@query(
    "phrase_search",
    f"""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
               FROM documents),
    g AS (SELECT doc_id, i AS pos,
                 md5(array_to_string(toks[i : i + {PHRASE_LEN - 1}], ' ')) AS gh
          FROM t, LATERAL (
            SELECT unnest(range(1, greatest(len(toks) - {PHRASE_LEN - 2}, 1)))
                     AS i
          ) u),
    p AS (SELECT phrase_id, md5(lower(phrase)) AS gh
          FROM (VALUES {_PHRASE_VALUES}) v(phrase_id, phrase))
    SELECT p.phrase_id, g.doc_id,
           COUNT(*)::BIGINT AS n_hits,
           MIN(g.pos)::BIGINT AS first_pos
    FROM g JOIN p USING (gh)
    GROUP BY p.phrase_id, g.doc_id
    """,
)
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document containing each literal {PHRASE_LEN}-token
    phrase, with occurrence count and first position. The phrase
    table is a broadcast literal hashed with the same md5 the gram
    stage uses, so the probe is a broadcast hash equi-join on gh —
    no text comparison, no pairwise stage; the per-(phrase, doc)
    aggregate partial-combines map-side. Output is the full match
    list (compose with reshape.top_k for ranked retrieval); docs
    shorter than the phrase emit nothing on both engines."""
    from .operators.textanalysis import _doc_grams

    docs = _spread(load_table(spark, sf_dir, "documents"))
    grams = _doc_grams(docs, PHRASE_LEN)
    phrases = spark.createDataFrame(
        PHRASE_SET, "phrase_id string, phrase string"
    ).select("phrase_id", F.md5(F.lower("phrase")).alias("gh"))
    return (
        grams.join(F.broadcast(phrases), "gh")
        .groupBy("phrase_id", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hits"),
            F.min("pos").cast("bigint").alias("first_pos"),
        )
        .select("phrase_id", "doc_id", "n_hits", "first_pos")
    )


@query("bm25_new_batch", _BM25_ORACLE)
def q_bm25_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental term-index maintenance: the corpus slice's term
    stats (docs with doc_id hash bucket >= {NEW_BATCH_PCT}) are
    persisted as a parquet index, read back, and merged with the new
    batch's stats — every component is ADDITIVE over disjoint doc
    slices (tf and dl rows are per-doc: plain union; df and the
    (n_docs, n_toks) totals: union + sum), so the merged index equals
    corpus_term_stats over the full corpus exactly, ingest cost ∝
    batch. BM25 then runs on the merged index; the oracle (the
    from-scratch SQL verbatim) proves merge == recompute
    cryptographically — the vocab_new_batch posture extended to the
    whole search index."""
    import os

    from .operators.sampling import hash_bucket
    from .operators.textanalysis import bm25_scores, corpus_term_stats
    from .sources.sinks import write_parquet

    docs = load_table(spark, sf_dir, "documents")
    is_new = hash_bucket("doc_id") < NEW_BATCH_PCT
    corpus, batch = docs.filter(~is_new), docs.filter(is_new)

    def _raw_parts(slice_docs):
        tf, dl, dfreq, _stats = corpus_term_stats(_spread(slice_docs))
        raw = slice_docs.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs")
        ).crossJoin(
            F.broadcast(
                dl.agg(F.sum("dl_l").cast("bigint").alias("n_toks"))
            )
        )
        return tf, dl, dfreq, raw

    base = _run_scoped_index_dir("bm25")
    for name, df in zip(
        ["tf", "dl", "dfreq", "raw"], _raw_parts(corpus), strict=True
    ):
        write_parquet(df, os.path.join(base, name))
    idx = {
        name: spark.read.parquet(os.path.join(base, name))
        for name in ["tf", "dl", "dfreq", "raw"]
    }
    b_tf, b_dl, b_dfreq, b_raw = _raw_parts(batch)

    tf = idx["tf"].unionByName(b_tf)  # per-doc rows, slices disjoint
    dl = idx["dl"].unionByName(b_dl)
    dfreq = (
        idx["dfreq"]
        .unionByName(b_dfreq)
        .groupBy("token")
        .agg(F.sum("df_l").cast("bigint").alias("df_l"))
    )
    stats = (
        idx["raw"]
        .unionByName(b_raw)
        .agg(
            F.sum("n_docs").cast("double").alias("n_docs"),
            F.sum("n_toks").cast("double").alias("n_toks"),
        )
        .select("n_docs", (F.col("n_toks") / F.col("n_docs")).alias("avgdl"))
    )
    scores = bm25_scores(
        None, _bm25_qterms(spark), term_stats=(tf, dl, dfreq, stats)
    )
    return _bm25_ranked(scores)


CMS_GROUP_TOP = 5


@query(
    "heavy_hitters_by_type",
    f"""
    WITH d AS (SELECT unnest(range({CMS_DEPTH})) AS i),
    counters AS (SELECT event_type, i, {_CMS_BUCKET_OF_I} AS bucket,
                        COUNT(*)::BIGINT AS c
                 FROM events CROSS JOIN d GROUP BY event_type, i, bucket),
    keys AS (SELECT DISTINCT event_type, user_id FROM events),
    est AS (SELECT k.event_type, k.user_id, MIN(c.c)::BIGINT AS est_count
            FROM keys k CROSS JOIN d
            JOIN counters c ON c.event_type = k.event_type AND c.i = d.i
                           AND c.bucket = {_CMS_BUCKET_OF_KI}
            GROUP BY k.event_type, k.user_id),
    exact AS (SELECT event_type, user_id, COUNT(*)::BIGINT AS exact_count
              FROM events GROUP BY event_type, user_id),
    r AS (SELECT e.event_type, e.user_id, e.est_count, x.exact_count,
                 (e.est_count - x.exact_count)::BIGINT AS overcount,
                 ROW_NUMBER() OVER (PARTITION BY e.event_type
                                    ORDER BY e.est_count DESC, e.user_id)
                   AS rk
          FROM est e JOIN exact x USING (event_type, user_id))
    SELECT event_type, user_id, est_count, exact_count, overcount,
           rk::BIGINT AS rk
    FROM r WHERE rk <= {CMS_GROUP_TOP}
    """,
)
def q_heavy_hitters_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type top-{CMS_GROUP_TOP} heavy-hitter users from
    PER-GROUP count-min grids built in one pass (operators/sketches.py
    ::cms_counters_grouped — the multi-tenant sketch: one grid per
    type, shared row hashes, output ≤ |types|·depth·width counter rows
    so the whole grid table still broadcasts for the probe). Exact
    counts ride alongside and the one-sided overcount stays visible
    per group. The per-type ranking window partitions on the group
    key (bounded by that type's distinct users — the candidate list,
    not the stream). Same md5-reproducible construction as
    heavy_hitters_cms, so the grouped sketch is fully
    hash-oracle-checked."""
    from pyspark.sql import Window

    from .operators.reshape import top_k
    from .operators.sketches import cms_counters_grouped, cms_estimate_grouped

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    grid = cms_counters_grouped(ev, "user_id", ["event_type"])
    # broadcast=True: event_type is an enum-small code column, so the
    # grid is ≤ |types|·depth·width rows — assert that instead of
    # paying the auto-guard's probe (one extra grid evaluation)
    est = cms_estimate_grouped(
        ev.distinct(), grid, "user_id", ["event_type"], broadcast=True
    )
    exact = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_count")
    )
    r = est.join(exact, ["event_type", "user_id"]).select(
        "event_type",
        "user_id",
        "est_count",
        "exact_count",
        (F.col("est_count") - F.col("exact_count"))
        .cast("bigint")
        .alias("overcount"),
    )
    ranked = top_k(
        r,
        ["event_type"],
        [F.col("est_count").desc(), F.col("user_id")],
        CMS_GROUP_TOP,
        "rk",
    )
    return ranked.select(
        "event_type",
        "user_id",
        "est_count",
        "exact_count",
        "overcount",
        F.col("rk").cast("bigint").alias("rk"),
    )


# ---------------------------------------------------------------------------
# Right-to-be-forgotten across the STANDING indexes (r11 verdict #2):
# a GDPR deletion pass hits every persisted index, not just cluster
# labels (dedup_clusters_forget) and IVF cells (ann_forget_topk). The
# three new forget flows invert each index family's merge law:
#   - bm25_forget: the term index is ADDITIVE over disjoint doc
#     slices (bm25_new_batch), so deletion is the inverse — tf/dl
#     rows are per-doc (anti-join deletes), df and the integer totals
#     subtract. Everything derives from the INDEX itself (tf rows are
#     the postings), zero re-tokenization of any text.
#   - scrub_forget: the gram-ownership law is owner = min(doc_id), so
#     deleting an owner must TRANSFER ownership to the next surviving
#     doc holding the gram (the dedup_clusters_forget cut-vertex
#     analogue). That next-min is not derivable from a collapsed
#     (gh, df, owner) row, so the persisted form here is the
#     POSITIONAL POSTINGS (gh, doc_id, pos) — the same table
#     phrase_search probes — from which ownership re-derives with one
#     groupBy after the anti-join delete; corpus text is re-read only
#     by the inherent rewrite stage, never re-grammed (plan-pinned).
#   - cms_forget: counter grids are elementwise-additive, so deletion
#     subtracts the deleted slice's grid (sketch the 5% slice, negate,
#     sum) — the only family whose forget cost is ∝ deleted slice
#     with NO index row deletes at all.
# Oracle for all three = the full recompute on the kept slice
# (dedup_clusters_forget precedent): the hash match proves
# index-edit == rebuild-from-scratch, cryptographically.
# No reference counterpart (the pandas reference has no persisted
# indexes; /root/reference/src/etl_pipeline.py rebuilds per run).
# ---------------------------------------------------------------------------
_FORGET_KEPT_DOCS = (
    "kept AS (SELECT * FROM documents "
    f"WHERE {sql_hash_bucket('doc_id', salt='forget')} >= {FORGET_PCT}),\n    "
)
_FORGET_KEPT_EVENTS = (
    "ev AS (SELECT * FROM events "
    f"WHERE {sql_hash_bucket('event_id', salt='forget')} >= {FORGET_PCT}),\n    "
)

PREPARES["bm25_forget"] = _prepare_term_index


@query("bm25_forget", _bm25_oracle(src="kept", prelude=_FORGET_KEPT_DOCS))
def q_bm25_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 search after deleting the stable {FORGET_PCT}% forget-list
    from the STANDING term index (the bm25_search_indexed fixture,
    PREPARES): tf/dl rows of deleted docs anti-join away; per-token df
    subtracts the deleted docs' postings count (derived from the tf
    index itself — tf rows ARE the postings, so no deleted text is
    ever re-tokenized, and tokens whose df hits 0 leave the
    vocabulary); the exact-integer (n_docs, n_toks) totals subtract
    the deleted counts before the one avgdl division. Search then runs
    on the edited index; the oracle rebuilds everything from the kept
    corpus from scratch — the hash match proves subtraction ==
    rebuild. The only touch of the documents table is a doc_id-column
    scan for the forget-list (no text, no tokenizer; plan-pinned)."""
    import os

    from .operators.sampling import hash_bucket
    from .operators.textanalysis import bm25_scores, term_stats_forget

    base = _prepare_term_index(spark, sf_dir)
    tf, dl, dfreq, raw = (
        spark.read.parquet(os.path.join(base, name))
        for name in ["tf", "dl", "dfreq", "raw"]
    )
    docs = load_table(spark, sf_dir, "documents")
    deleted = docs.filter(
        hash_bucket("doc_id", salt="forget") < FORGET_PCT
    ).select("doc_id")
    scores = bm25_scores(
        None,
        _bm25_qterms(spark),
        term_stats=term_stats_forget(tf, dl, dfreq, raw, deleted),
    )
    return _bm25_ranked(scores)


_POSTINGS_INDEX_CACHE: dict[str, str] = {}


def _prepare_postings_index(spark: SparkSession, sf_dir: str) -> str:
    """Persist the FULL-corpus positional gram postings (doc_id, pos,
    gh) — the standing substring/phrase index (the table phrase_search
    probes), memoized per (process, sf_dir)."""
    got = _POSTINGS_INDEX_CACHE.get(sf_dir)
    if got is not None:
        return got
    import hashlib
    import os
    import tempfile

    from .operators.textanalysis import _doc_grams
    from .sources.sinks import write_parquet

    tag = hashlib.md5(f"{sf_dir}:{os.getpid()}".encode()).hexdigest()[:10]
    base = tempfile.mkdtemp(prefix=f"hubsit_postings_index_{tag}_")
    docs = _spread(load_table(spark, sf_dir, "documents"))
    write_parquet(
        _doc_grams(docs, SPAN_GRAM), os.path.join(base, "postings")
    )
    _POSTINGS_INDEX_CACHE[sf_dir] = base
    return base


PREPARES["scrub_forget"] = _prepare_postings_index


def _scrub_forget_oracle() -> str:
    from .operators.sampling import sql_hash_bucket

    return f"""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
               FROM documents
               WHERE {sql_hash_bucket("doc_id", salt="forget")} >= {FORGET_PCT}),
    g AS (SELECT doc_id, i AS pos,
                 md5(array_to_string(toks[i : i + {SPAN_GRAM - 1}], ' ')) AS gh
          FROM t, LATERAL (
            SELECT unnest(range(1, greatest(len(toks) - {SPAN_GRAM - 2}, 1))) AS i
          ) u),
    own AS (SELECT gh, MIN(doc_id) AS owner
            FROM (SELECT DISTINCT gh, doc_id FROM g)
            GROUP BY gh HAVING COUNT(*) >= 2),
    cut AS (SELECT g.doc_id, g.pos FROM g JOIN own USING (gh)
            WHERE g.doc_id <> own.owner),
    cov AS (SELECT DISTINCT doc_id, pos + o.off AS tp
            FROM cut, LATERAL (
              SELECT unnest(range(0, {SPAN_GRAM})) AS off) o),
    tok AS (SELECT doc_id, i AS tp, toks[i] AS tok
            FROM t, LATERAL (
              SELECT unnest(range(1, len(toks) + 1)) AS i) u),
    kept AS (SELECT tok.doc_id,
                    string_agg(tok.tok, ' ' ORDER BY tok.tp) AS scrubbed_text,
                    COUNT(*) AS n_kept
             FROM tok LEFT JOIN cov
               ON tok.doc_id = cov.doc_id AND tok.tp = cov.tp
             WHERE cov.tp IS NULL GROUP BY tok.doc_id)
    SELECT t.doc_id,
           COALESCE(k.scrubbed_text, '') AS scrubbed_text,
           COALESCE(k.n_kept, 0)::BIGINT AS n_tokens_kept,
           (len(t.toks) - COALESCE(k.n_kept, 0))::BIGINT AS n_tokens_removed
    FROM t LEFT JOIN kept k USING (doc_id)
    """


@query("scrub_forget", _scrub_forget_oracle())
def q_scrub_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring scrub of the surviving corpus after deleting the
    stable {FORGET_PCT}% forget-list from the standing positional
    postings index (PREPARES fixture — the phrase_search table):
    deleted docs' postings anti-join away, then per-gram ownership
    RE-DERIVES from the surviving postings with one distinct+groupBy —
    a gram whose owner was deleted transfers to the min surviving
    holder (the cut-vertex analogue dedup_clusters_forget handles for
    cluster keepers), and a gram left with one holder stops cutting at
    all. The rewrite (shared apply_cut_positions tail) re-reads kept
    text — inherent to producing text output — but nothing is ever
    re-GRAMMED: the plan contains no gram-slice/md5-gram stage
    (plan-pinned). Oracle = from-scratch scrub of the kept corpus."""
    import os

    from .operators.sampling import hash_bucket
    from .operators.textanalysis import scrub_from_postings

    base = _prepare_postings_index(spark, sf_dir)
    postings = spark.read.parquet(os.path.join(base, "postings"))
    docs = load_table(spark, sf_dir, "documents")
    is_del = hash_bucket("doc_id", salt="forget") < FORGET_PCT
    deleted = docs.filter(is_del).select("doc_id")
    surviving = postings.join(deleted, "doc_id", "left_anti")
    return scrub_from_postings(docs.filter(~is_del), surviving, SPAN_GRAM)


_CMS_GRID_CACHE: dict[str, str] = {}


def _prepare_cms_grid(spark: SparkSession, sf_dir: str) -> str:
    """Persist the FULL event stream's count-min grid (≤ depth·width
    rows), memoized per (process, sf_dir) — the standing sketch the
    streaming cms_grid_sink maintains incrementally."""
    got = _CMS_GRID_CACHE.get(sf_dir)
    if got is not None:
        return got
    import hashlib
    import os
    import tempfile

    from .operators.sketches import cms_counters
    from .sources.sinks import write_parquet

    tag = hashlib.md5(f"{sf_dir}:{os.getpid()}".encode()).hexdigest()[:10]
    base = tempfile.mkdtemp(prefix=f"hubsit_cms_grid_{tag}_")
    events = load_table(spark, sf_dir, "events").select("user_id")
    write_parquet(cms_counters(events, "user_id"), os.path.join(base, "grid"))
    _CMS_GRID_CACHE[sf_dir] = base
    return base


PREPARES["cms_forget"] = _prepare_cms_grid


@query("cms_forget", _cms_oracle(src="ev", prelude=_FORGET_KEPT_EVENTS))
def q_cms_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter report after deleting the stable {FORGET_PCT}% of
    events (by event_id hash) from the standing count-min grid
    (PREPARES fixture): the deleted slice is re-sketched (cost ∝
    slice), its grid NEGATED, and the two grids summed elementwise —
    the additive merge law run backwards; zero-valued cells drop so
    the edited grid is row-identical to a kept-slice rebuild. The
    report probes with the kept stream's keys; the oracle recomputes
    sketch and exact counts from the kept events from scratch — the
    hash match proves grid subtraction == rebuild (estimates AND
    collision overcounts identical)."""
    import os

    from .operators.sampling import hash_bucket
    from .operators.sketches import cms_forget_grid

    base = _prepare_cms_grid(spark, sf_dir)
    grid = spark.read.parquet(os.path.join(base, "grid"))
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id"
    )
    is_del = hash_bucket("event_id", salt="forget") < FORGET_PCT
    merged = cms_forget_grid(
        grid, events.filter(is_del).select("user_id"), "user_id"
    )
    return _cms_heavy_hitter_report(
        events.filter(~is_del).select("user_id"), merged
    )


# ---------------------------------------------------------------------------
# Mergeable quantile index (r11 verdict #6): the HLL/CMS persisted-
# index posture for PERCENTILES. GK / t-digest / approx_percentile
# sketches are mergeable but not reproducibly so across engines (no
# hash oracle); a fixed-bin integer histogram is BOTH — per-batch
# counts are exact integers over disjoint slices (union + sum == full
# recompute, cryptographically checkable) — at the cost of fixed
# resolution (bin width). Bounds are LITERALS frozen at deployment
# (the drift-monitor lesson; out-of-range values clamp into edge bins)
# and chosen dyadic (1000/256 = 3.90625, exactly representable) so the
# edge arithmetic is float-exact everywhere. Quantile selection is
# all-integer: cum·100 ≥ p·N picks exactly the bin holding the
# ⌈p·N/100⌉-th smallest value.
# ---------------------------------------------------------------------------
QHIST_BINS = 256
QHIST_LO = 0.0
QHIST_HI = 1000.0
QHIST_PCTS = [1, 5, 25, 50, 75, 90, 95, 99]
_QHIST_W = (QHIST_HI - QHIST_LO) / QHIST_BINS  # 3.90625, dyadic-exact


@query(
    "quantiles_new_batch",
    f"""
    WITH b AS (SELECT CAST(LEAST(GREATEST(FLOOR((value - {QHIST_LO!r}) * {float(QHIST_BINS)!r}
                                                / ({QHIST_HI!r} - {QHIST_LO!r})), 0),
                                 {QHIST_BINS - 1}) AS INT) AS bin
               FROM events),
    h AS (SELECT bin, COUNT(*)::BIGINT AS cnt FROM b GROUP BY bin),
    n AS (SELECT SUM(cnt)::BIGINT AS n_rows FROM h),
    c AS (SELECT bin, SUM(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)::BIGINT
                 AS cum_rows FROM h),
    p AS (SELECT unnest([{", ".join(str(p) for p in QHIST_PCTS)}])::BIGINT AS pct),
    hit AS (SELECT p.pct, c.bin, c.cum_rows FROM p CROSS JOIN c CROSS JOIN n
            WHERE c.cum_rows * 100 >= p.pct * n.n_rows),
    sel AS (SELECT pct, MIN(bin) AS bin FROM hit GROUP BY pct)
    SELECT sel.pct, sel.bin::BIGINT AS bin, c.cum_rows, n.n_rows,
           CAST(FLOOR(({QHIST_LO!r} + ((sel.bin + 1) * {_QHIST_W!r})) * 1000000.0)
                AS BIGINT) AS approx_hi_u6
    FROM sel JOIN c USING (bin) CROSS JOIN n
    """,
)
def q_quantiles_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentiles of events.value from a persisted mergeable
    histogram index: the corpus slice's {QHIST_BINS}-bin histogram is
    written as a parquet index, read back, and the new batch's
    histogram merges in with one sum-groupBy over ≤ 2·{QHIST_BINS}
    rows (exact integer counts over disjoint slices — merged == full
    recompute, and the oracle, the from-scratch SQL over ALL events,
    proves it cryptographically). Quantile selection and the report
    run on ≤ {QHIST_BINS}-row tables: the cumulative window and the
    pct probe are bounded by the INDEX size, never the data — at
    100 TB per-ingest histograms stream in (the cms_grid_sink shape)
    and a quantile query never touches a raw value again. approx_hi_u6
    is the selected bin's upper edge (true quantile ≤ approx < true +
    {_QHIST_W}); tighter needs more bins, not a different algorithm."""
    import os

    from .operators.sampling import hash_bucket
    from .operators.sketches import histogram_quantiles, value_histogram
    from .sources.sinks import write_parquet

    events = load_table(spark, sf_dir, "events").select("event_id", "value")
    is_new = hash_bucket("event_id") < NEW_BATCH_PCT
    corpus = events.filter(~is_new)
    batch = events.filter(is_new)

    base = _run_scoped_index_dir("qhist")
    idx_path = os.path.join(base, "quantile_hist")
    write_parquet(
        value_histogram(corpus, "value", QHIST_LO, QHIST_HI, QHIST_BINS),
        idx_path,
    )
    idx = spark.read.parquet(idx_path)
    merged = (
        idx.unionByName(
            value_histogram(batch, "value", QHIST_LO, QHIST_HI, QHIST_BINS)
        )
        .groupBy("bin")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    return histogram_quantiles(
        merged, QHIST_PCTS, QHIST_LO, QHIST_HI, QHIST_BINS
    )


# ---------------------------------------------------------------------------
# LM-based quality filtering (CCNet, Wenzek et al. 2020): train a small
# unigram LM on a trusted slice, score every document, keep what the
# model finds natural — THE workhorse web-corpus filter next to the
# C4/Gopher heuristics (doc_quality) and the trained classifier
# (doc_quality_trained_model). Filtering happens in LOG space
# (avg-NLL ≤ threshold ⇔ perplexity ≤ e^threshold), so exp() never
# runs — the doc_quality_logit z≥0 trick; each token contribution is
# tf · ln of one exact-integer smoothed ratio (the PMI trick) and the
# per-doc sum folds token-sorted (BM25/PSI precedent).
# ---------------------------------------------------------------------------
LM_TRAIN_PCT = 50  # doc_id hash bucket (salt 'lm') >= 50 trains the LM
DOC_NLL_KEEP_U6 = 3402000  # ≈ fixture median avg-NLL in micro-units


@query(
    "doc_unigram_nll",
    f"""
    WITH lmd AS (SELECT text FROM documents
                 WHERE {sql_hash_bucket("doc_id", salt="lm")} >= {LM_TRAIN_PCT}),
    lt0 AS (SELECT unnest(string_split(lower(text), ' ')) AS token FROM lmd),
    lt AS (SELECT token FROM lt0 WHERE token <> ''),
    cw AS (SELECT token, COUNT(*)::BIGINT AS c_w FROM lt GROUP BY token),
    tot AS (SELECT COALESCE(SUM(c_w), 0)::BIGINT AS lm_n,
                   COUNT(*)::BIGINT AS lm_v FROM cw),
    t0 AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
           FROM documents),
    t AS (SELECT doc_id, token FROM t0 WHERE token <> ''),
    tf AS (SELECT doc_id, token, COUNT(*)::BIGINT AS tf_l
           FROM t GROUP BY doc_id, token),
    c AS (SELECT tf.doc_id, tf.token, tf.tf_l,
                 CAST(tf.tf_l AS DOUBLE)
                   * ln(CAST((COALESCE(cw.c_w, 0) + 1) AS DOUBLE)
                        / CAST((tot.lm_n + tot.lm_v) AS DOUBLE)) AS w
          FROM tf LEFT JOIN cw USING (token) CROSS JOIN tot),
    s AS (SELECT doc_id, SUM(tf_l)::BIGINT AS n_tokens,
                 list_sum(list(w ORDER BY token)) AS sum_logp
          FROM c GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(s.n_tokens, 0)::BIGINT AS n_tokens,
           CASE WHEN s.n_tokens > 0
                THEN CAST(FLOOR(((-s.sum_logp) / s.n_tokens) * 1000000.0)
                          AS BIGINT)
                ELSE NULL END AS avg_nll_u6,
           (CASE WHEN s.n_tokens > 0
                      AND CAST(FLOOR(((-s.sum_logp) / s.n_tokens)
                                     * 1000000.0) AS BIGINT)
                          <= {DOC_NLL_KEEP_U6}
                 THEN 1 ELSE 0 END)::BIGINT AS keep
    FROM documents d LEFT JOIN s USING (doc_id)
    """,
)
def q_doc_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average negative log-likelihood under an add-one
    unigram LM trained on the stable {LM_TRAIN_PCT}% hash slice
    (operators/textanalysis.py::unigram_logprob_scores — see its
    docstring for the shuffle layout and determinism contract), with
    keep = avg_nll_u6 ≤ {DOC_NLL_KEEP_U6} (log-space perplexity
    filtering; lower NLL = the LM finds the text more natural).
    Token-less docs emit (n_tokens=0, NULL, keep=0) via the left
    join. At 100 TB the LM counts table is the persisted vocabulary
    index with probabilities — scoring is one equi-join on token plus
    a map-side fold, and the trusted train slice is a fixed reference
    corpus, not a re-sample per run."""
    from .operators.sampling import hash_bucket
    from .operators.textanalysis import unigram_logprob_scores

    docs = load_table(spark, sf_dir, "documents")
    lm_docs = docs.filter(
        hash_bucket("doc_id", salt="lm") >= LM_TRAIN_PCT
    )
    s = unigram_logprob_scores(_spread(docs), lm_docs)
    avg_u6 = F.floor(
        ((-F.col("sum_logp")) / F.col("n_tokens")) * F.lit(1000000.0)
    ).cast("bigint")
    scored = s.select(
        "doc_id",
        "n_tokens",
        F.when(F.col("n_tokens") > 0, avg_u6).alias("avg_nll_u6"),
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0))
            .cast("bigint")
            .alias("n_tokens"),
            "avg_nll_u6",
            F.when(
                (F.col("n_tokens") > 0)
                & (F.col("avg_nll_u6") <= DOC_NLL_KEEP_U6),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("keep"),
        )
    )


@query(
    "quantiles_forget",
    f"""
    WITH b AS (SELECT CAST(LEAST(GREATEST(FLOOR((value - {QHIST_LO!r}) * {float(QHIST_BINS)!r}
                                                / ({QHIST_HI!r} - {QHIST_LO!r})), 0),
                                 {QHIST_BINS - 1}) AS INT) AS bin
               FROM events
               WHERE {sql_hash_bucket("event_id", salt="forget")} >= {FORGET_PCT}),
    h AS (SELECT bin, COUNT(*)::BIGINT AS cnt FROM b GROUP BY bin),
    n AS (SELECT SUM(cnt)::BIGINT AS n_rows FROM h),
    c AS (SELECT bin, SUM(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)::BIGINT
                 AS cum_rows FROM h),
    p AS (SELECT unnest([{", ".join(str(p) for p in QHIST_PCTS)}])::BIGINT AS pct),
    hit AS (SELECT p.pct, c.bin, c.cum_rows FROM p CROSS JOIN c CROSS JOIN n
            WHERE c.cum_rows * 100 >= p.pct * n.n_rows),
    sel AS (SELECT pct, MIN(bin) AS bin FROM hit GROUP BY pct)
    SELECT sel.pct, sel.bin::BIGINT AS bin, c.cum_rows, n.n_rows,
           CAST(FLOOR(({QHIST_LO!r} + ((sel.bin + 1) * {_QHIST_W!r})) * 1000000.0)
                AS BIGINT) AS approx_hi_u6
    FROM sel JOIN c USING (bin) CROSS JOIN n
    """,
)
def q_quantiles_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion for the quantile index — the cms_forget law on the
    histogram: the full-stream {QHIST_BINS}-bin histogram persists,
    the stable {FORGET_PCT}% forget-list is re-binned (cost ∝ slice),
    negated and summed in (zeroed bins drop), and percentiles report
    from the maintained index. With this, EVERY standing index family
    in the engine has a certified forget inverse (clusters, IVF, BM25
    term stats, gram ownership, CMS grids, vocabulary, moments-by-
    algebra, and value histograms). Oracle = the from-scratch
    histogram-quantile SQL over kept events."""
    import os

    from .operators.sampling import hash_bucket
    from .operators.sketches import histogram_quantiles, value_histogram
    from .sources.sinks import write_parquet

    events = load_table(spark, sf_dir, "events").select("event_id", "value")
    is_del = hash_bucket("event_id", salt="forget") < FORGET_PCT

    base = _run_scoped_index_dir("qhist_forget")
    idx_path = os.path.join(base, "quantile_hist")
    write_parquet(
        value_histogram(events, "value", QHIST_LO, QHIST_HI, QHIST_BINS),
        idx_path,
    )
    idx = spark.read.parquet(idx_path)
    neg = value_histogram(
        events.filter(is_del), "value", QHIST_LO, QHIST_HI, QHIST_BINS
    ).select("bin", (-F.col("cnt")).alias("cnt"))
    maintained = (
        idx.unionByName(neg)
        .groupBy("bin")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        .filter(F.col("cnt") > 0)
    )
    return histogram_quantiles(
        maintained, QHIST_PCTS, QHIST_LO, QHIST_HI, QHIST_BINS
    )


@query(
    "quantiles_by_type",
    f"""
    WITH b AS (SELECT event_type,
                      CAST(LEAST(GREATEST(FLOOR((value - {QHIST_LO!r}) * {float(QHIST_BINS)!r}
                                                / ({QHIST_HI!r} - {QHIST_LO!r})), 0),
                                 {QHIST_BINS - 1}) AS INT) AS bin
               FROM events),
    h AS (SELECT event_type, bin, COUNT(*)::BIGINT AS cnt
          FROM b GROUP BY event_type, bin),
    c AS (SELECT event_type, bin,
                 SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
                                ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_rows,
                 SUM(cnt) OVER (PARTITION BY event_type)::BIGINT AS n_rows
          FROM h),
    p AS (SELECT unnest([{", ".join(str(p) for p in QHIST_PCTS)}])::BIGINT AS pct),
    hit AS (SELECT c.event_type, p.pct, c.bin, c.cum_rows, c.n_rows
            FROM c CROSS JOIN p
            WHERE c.cum_rows * 100 >= p.pct * c.n_rows),
    sel AS (SELECT event_type, pct, MIN(bin) AS bin
            FROM hit GROUP BY event_type, pct)
    SELECT sel.event_type, sel.pct, sel.bin::BIGINT AS bin,
           c.cum_rows, c.n_rows,
           CAST(FLOOR(({QHIST_LO!r} + ((sel.bin + 1) * {_QHIST_W!r})) * 1000000.0)
                AS BIGINT) AS approx_hi_u6
    FROM sel JOIN c ON sel.event_type = c.event_type AND sel.bin = c.bin
    """,
)
def q_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type percentiles from per-group mergeable histograms
    (operators/sketches.py::value_histogram_grouped /
    histogram_quantiles_grouped — the cms_counters_grouped pattern
    applied to the quantile index, closing the grouped-sibling gap in
    the sketch family): one pass builds every group's {QHIST_BINS}-bin
    integer histogram (output ≤ |types|·bins rows, shuffle carries
    histograms, never values), and selection windows PARTITION BY the
    group key — each group's ≤ {QHIST_BINS}-row cumulative pass runs
    in parallel, no cross-group sort. Same frozen dyadic bounds and
    all-integer selection as quantiles_new_batch, so every output
    column hash-checks exactly."""
    from .operators.sketches import (
        histogram_quantiles_grouped,
        value_histogram_grouped,
    )

    events = load_table(spark, sf_dir, "events")
    hist = value_histogram_grouped(
        events, "value", ["event_type"], QHIST_LO, QHIST_HI, QHIST_BINS
    )
    return histogram_quantiles_grouped(
        hist, QHIST_PCTS, ["event_type"], QHIST_LO, QHIST_HI, QHIST_BINS
    )


# ---------------------------------------------------------------------------
# Moments-index lifecycle as driver rows (VERDICT r12 #3/#4): the
# (key, n, Σx, Σx²) sufficient-statistics family — built inline by
# q_user_value_outliers and maintained by streaming/sketches.py::
# moments_sink — gets the same batch-twin treatment as its CMS /
# histogram siblings: a persisted index absorbs a new batch (additive
# merge) and serves the z-test without re-reading history, and the
# forget inverse (triples subtract exactly) reports over the kept
# stream. Both oracles recompute from scratch, so the hash match
# proves merged == recompute and subtracted == rebuilt.
# ---------------------------------------------------------------------------
def _moments_outlier_oracle(events_filter: str, probe_filter: str) -> str:
    """The user_value_outliers oracle shape, parameterized: moments
    from ``events_filter`` rows, outliers counted over the
    ``probe_filter`` slice (left join + 0 for probe-less users)."""
    return f"""
    WITH e AS (SELECT user_id, event_id,
                      CAST(round(value * 100) AS BIGINT) AS v
               FROM events{events_filter}),
    s AS (SELECT user_id, COUNT(*)::BIGINT AS n,
                 SUM(v)::BIGINT AS sx,
                 SUM(v * v)::BIGINT AS sxx
          FROM e GROUP BY user_id),
    p AS (SELECT * FROM e{probe_filter}),
    f AS (SELECT p.user_id,
                 CASE WHEN (p.v * s.n - s.sx) * (p.v * s.n - s.sx)
                           > {ZSCORE_K * ZSCORE_K} * (s.n * s.sxx - s.sx * s.sx)
                      THEN 1 ELSE 0 END AS is_out
          FROM p JOIN s USING (user_id)),
    o AS (SELECT user_id, SUM(is_out)::BIGINT AS n_outliers
          FROM f GROUP BY user_id)
    SELECT s.user_id, s.n AS n_events,
           (s.sx // s.n)::BIGINT AS mean_u2,
           COALESCE(o.n_outliers, 0)::BIGINT AS n_outliers
    FROM s LEFT JOIN o USING (user_id)
    """


@query(
    "moments_new_batch",
    _moments_outlier_oracle(
        "",
        f" WHERE {sql_hash_bucket('event_id')} < {NEW_BATCH_PCT}",
    ),
)
def q_moments_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental anomaly scoring from a persisted moments index: the
    corpus slice's per-user (n, Σx, Σx²) triples are written as a
    parquet index, the stable {NEW_BATCH_PCT}% new batch merges in
    with one sum-groupBy over rows ∝ distinct keys (triples over
    disjoint slices ADD — operators/sketches.py::moments_merge), and
    the new batch's events are z-test-scored against the MERGED
    moments (the exact posture of the streaming moments_sink +
    read_moments pair, as a hash-checkable batch twin). Output one row
    per user: (n_events, mean_u2 floor, n_outliers among the new
    batch's events). Oracle recomputes the moments from ALL events
    from scratch — the hash match proves merge == recompute. At
    100 TB per-ingest triples stream in and scoring never re-reads
    history: the timed body reads only index rows + the batch."""
    import os

    from .operators.sampling import hash_bucket
    from .operators.sketches import (
        moments_merge,
        moments_triples,
        moments_ztest_flags,
    )
    from .sources.sinks import write_parquet

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    is_new = hash_bucket("event_id") < NEW_BATCH_PCT
    corpus, batch = events.filter(~is_new), events.filter(is_new)

    base = _run_scoped_index_dir("moments")
    idx_path = os.path.join(base, "moments_idx")
    write_parquet(moments_triples(corpus, "user_id", "value"), idx_path)
    idx = spark.read.parquet(idx_path)
    merged = moments_merge(idx, moments_triples(batch, "user_id", "value"))

    flags = moments_ztest_flags(batch, merged, "user_id", "value", ZSCORE_K)
    o = flags.groupBy("key").agg(
        F.sum("is_out").cast("bigint").alias("n_outliers")
    )
    return merged.join(o, "key", "left").select(
        F.col("key").alias("user_id"),
        F.col("n").alias("n_events"),
        F.expr("sx div n").cast("bigint").alias("mean_u2"),
        F.coalesce(F.col("n_outliers"), F.lit(0))
        .cast("bigint")
        .alias("n_outliers"),
    )


@query(
    "moments_forget",
    _moments_outlier_oracle(
        f" WHERE {sql_hash_bucket('event_id', salt='forget')} >= {FORGET_PCT}",
        "",
    ),
)
def q_moments_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion for the moments index — the missing forget VERDICT r12
    #3 names: sufficient statistics are exact integer sums, so the
    stable {FORGET_PCT}% forget-list is re-tripled (cost ∝ slice),
    NEGATED and summed in, and keys whose count reaches 0 drop
    (operators/sketches.py::moments_forget). The kept stream is then
    z-test-scored against the maintained index. Oracle recomputes
    moments AND outliers from the kept events from scratch — the hash
    match proves subtraction == rebuild, row-identically. With this,
    every additive index family (CMS, histogram, vocabulary, BM25
    terms, moments) carries the same certified forget law; HLL, the
    one non-invertible sketch, gets a documented partition-scoped
    REBUILD contract instead (operators/aggregate.py::
    hll_forget_rebuild, pytest-pinned)."""
    import os

    from .operators.sampling import hash_bucket
    from .operators.sketches import (
        moments_forget,
        moments_triples,
        moments_ztest_flags,
    )
    from .sources.sinks import write_parquet

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    is_del = hash_bucket("event_id", salt="forget") < FORGET_PCT

    base = _run_scoped_index_dir("moments_forget")
    idx_path = os.path.join(base, "moments_idx")
    write_parquet(moments_triples(events, "user_id", "value"), idx_path)
    idx = spark.read.parquet(idx_path)
    maintained = moments_forget(
        idx, events.filter(is_del), "user_id", "value"
    )

    kept = events.filter(~is_del)
    flags = moments_ztest_flags(kept, maintained, "user_id", "value", ZSCORE_K)
    o = flags.groupBy("key").agg(
        F.sum("is_out").cast("bigint").alias("n_outliers")
    )
    return maintained.join(o, "key", "left").select(
        F.col("key").alias("user_id"),
        F.col("n").alias("n_events"),
        F.expr("sx div n").cast("bigint").alias("mean_u2"),
        F.coalesce(F.col("n_outliers"), F.lit(0))
        .cast("bigint")
        .alias("n_outliers"),
    )


# ---------------------------------------------------------------------------
# Collocation mining — top adjacent token pairs by pointwise mutual
# information, the corpus-analysis step that induces multi-word
# vocabulary entries (the token-level complement of bpe_pair_counts,
# which counts symbol pairs INSIDE words). Determinism: PMI is
# ln(p_ab / (p_a·p_b)) = ln of ONE exact ratio of integer counts —
# the PSI smoothing trick — so the only cross-engine float risk is a
# single ln absorbed by the micro-unit floor; the ratio's numerator/
# denominator are computed as double PRODUCTS (not bigint — c_ab·Nt²
# overflows int64 past ~sf1) in identical parenthesized order.
# ---------------------------------------------------------------------------
PMI_MIN_COUNT = 5  # rare-pair cutoff: PMI is unstable below this
PMI_TOP = 40


@query(
    "token_pmi_pairs",
    f"""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
               FROM documents),
    bg AS (SELECT toks[i] AS a, toks[i + 1] AS b
           FROM t, LATERAL (
             SELECT unnest(range(1, greatest(len(toks), 1))) AS i
           ) u
           WHERE toks[i] <> '' AND toks[i + 1] <> ''),
    cab AS (SELECT a, b, COUNT(*)::BIGINT AS c_ab FROM bg GROUP BY a, b),
    tok AS (SELECT unnest(toks) AS w FROM t),
    cu AS (SELECT w, COUNT(*)::BIGINT AS c_w FROM tok WHERE w <> ''
           GROUP BY w),
    n AS (SELECT (SELECT COUNT(*)::DOUBLE FROM tok WHERE w <> '') AS n_tok,
                 (SELECT COUNT(*)::DOUBLE FROM bg) AS n_bg),
    s AS (SELECT cab.a, cab.b, cab.c_ab,
                 CAST(floor(ln((CAST(cab.c_ab AS DOUBLE) * (n.n_tok * n.n_tok))
                               / (n.n_bg * (CAST(ua.c_w AS DOUBLE)
                                            * CAST(ub.c_w AS DOUBLE))))
                            * 1000000.0) AS BIGINT) AS pmi_u6
          FROM cab JOIN cu ua ON ua.w = cab.a
                   JOIN cu ub ON ub.w = cab.b
          CROSS JOIN n
          WHERE cab.c_ab >= {PMI_MIN_COUNT}),
    r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY pmi_u6 DESC, a, b) AS rk
          FROM s)
    SELECT a, b, c_ab, pmi_u6, rk::BIGINT AS rk
    FROM r WHERE rk <= {PMI_TOP}
    """,
)
def q_token_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PMI_TOP} adjacent-token collocations by PMI (pairs seen
    ≥ {PMI_MIN_COUNT} times). One pass builds positional bigrams
    (token array bound to a column before the HOF indexes it — the
    re-evaluation rule), a second explode counts unigrams; both
    aggregates partial-combine map-side and the scalars (N_tokens,
    N_bigrams) ride a broadcast row. The two unigram joins hit the
    (small) vocabulary table — the persisted-vocab posture at scale.
    Global top-k is TakeOrderedAndProject via reshape.top_k."""
    from .operators.reshape import top_k

    docs = _spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.expr("split(lower(text), ' ')").alias("toks")
    )
    bg = toks.select(
        F.explode(
            F.expr(
                "CASE WHEN size(toks) >= 2 THEN "
                "transform(sequence(1, size(toks) - 1), "
                "i -> struct(toks[i - 1] AS a, toks[i] AS b)) "
                "ELSE array() END"
            )
        ).alias("p")
    ).select("p.a", "p.b").filter((F.col("a") != "") & (F.col("b") != ""))
    cab = bg.groupBy("a", "b").agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
    tok = toks.select(F.explode("toks").alias("w")).filter(F.col("w") != "")
    cu = tok.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("c_w"))
    n = tok.agg(F.count(F.lit(1)).cast("double").alias("n_tok")).crossJoin(
        F.broadcast(bg.agg(F.count(F.lit(1)).cast("double").alias("n_bg")))
    )
    s = (
        cab.filter(F.col("c_ab") >= PMI_MIN_COUNT)
        .join(cu.withColumnRenamed("w", "a").withColumnRenamed("c_w", "c_a"), "a")
        .join(cu.withColumnRenamed("w", "b").withColumnRenamed("c_w", "c_b"), "b")
        .crossJoin(F.broadcast(n))
        .select(
            "a",
            "b",
            "c_ab",
            F.floor(
                F.expr(
                    "ln((cast(c_ab as double) * (n_tok * n_tok))"
                    " / (n_bg * (cast(c_a as double) * cast(c_b as double))))"
                )
                * F.lit(1000000.0)
            )
            .cast("bigint")
            .alias("pmi_u6"),
        )
    )
    ranked = top_k(
        s, [], [F.col("pmi_u6").desc(), F.col("a"), F.col("b")], PMI_TOP, "rk"
    )
    return ranked.select(
        "a", "b", "c_ab", "pmi_u6", F.col("rk").cast("bigint").alias("rk")
    )


# ---------------------------------------------------------------------------
# Theta/KMV distinct sketches — the set-algebra member of the sketch
# family (operators/theta.py). HLL answers per-group distinct counts
# but has NO intersection or difference; the KMV bottom-k sample
# supports exact-law union merge (mergeable standing index / rollup
# without re-scan) plus estimated INTERSECTION (returning customers)
# and A-NOT-B (churned customers). Everything below compares
# exact-integer against a DuckDB replica that rebuilds the identical
# md5-hash sketch — including the estimator arithmetic (single IEEE
# double division + floor on both engines).
# ---------------------------------------------------------------------------
from .operators.theta import (  # noqa: E402 — section-local import
    THETA_K,
    THETA_M,
    duckdb_theta_estimate,
    duckdb_theta_of,
    duckdb_theta_sketch_sql,
    theta_estimate,
    theta_rollup,
    theta_set_ops,
    theta_sketch,
    theta_union,
)

_THETA_MONTH_SPARK = "date_format(o_orderdate, 'yyyy-MM')"
_THETA_MONTH_DUCK = "strftime(o_orderdate, '%Y-%m')"


def _theta_month_sketch_cte(src: str = "orders") -> str:
    """Shared DuckDB CTE: per-month KMV sketch over o_custkey."""
    return duckdb_theta_sketch_sql(src, _THETA_MONTH_DUCK, "month", "o_custkey")


def _theta_distinct_oracle(src: str = "orders", prelude: str = "") -> str:
    """Full-recompute per-month estimate report. Shared VERBATIM by
    theta_distinct_customers and theta_new_batch: bottom-k union-merge
    over disjoint slices == from-scratch bottom-k EXACTLY (every one of
    the k smallest hashes of A∪B is among the k smallest of its own
    side), so the incremental query hash-matches the full recompute —
    the vocab_new_batch posture for distinct sketches."""
    est = duckdb_theta_estimate("hs")
    return f"""
    WITH {prelude}sk AS MATERIALIZED ({_theta_month_sketch_cte(src)}),
    ex AS (SELECT {_THETA_MONTH_DUCK} AS month,
                  COUNT(DISTINCT o_custkey)::BIGINT AS exact_distinct
           FROM {src} GROUP BY 1)
    SELECT sk.month, {est} AS est_distinct,
           len(sk.hs)::BIGINT AS k_kept, ex.exact_distinct,
           ({est} - ex.exact_distinct)::BIGINT AS err
    FROM sk JOIN ex USING (month)
    """


_THETA_DISTINCT_ORACLE = _theta_distinct_oracle()


def _theta_month_sketch(spark: SparkSession, sf_dir: str, prefilter="auto") -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.expr(_THETA_MONTH_SPARK).alias("month"), "o_custkey"
    )
    return theta_sketch(orders, ["month"], "o_custkey", prefilter=prefilter)


def _theta_distinct_report(spark: SparkSession, sf_dir: str, sk: DataFrame) -> DataFrame:
    exact = (
        load_table(spark, sf_dir, "orders")
        .select(F.expr(_THETA_MONTH_SPARK).alias("month"), "o_custkey")
        .groupBy("month")
        .agg(F.countDistinct("o_custkey").cast("bigint").alias("exact_distinct"))
    )
    return (
        theta_estimate(sk)
        .join(exact, "month")
        .select(
            "month",
            "est_distinct",
            F.expr("cast(size(hs) as bigint)").alias("k_kept"),
            "exact_distinct",
            (F.col("est_distinct") - F.col("exact_distinct"))
            .cast("bigint")
            .alias("err"),
        )
    )


@query("theta_distinct_customers", _THETA_DISTINCT_ORACLE)
def q_theta_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-month distinct-customer KMV sketch ({THETA_K} minimum 60-bit
    md5 hashes) with the unbiased estimate next to the exact count.
    The build is the only raw-data pass (map-side HLL-probe prefilter
    caps its shuffle at ~8k hashes per group, operators/theta.py); the
    standing index is one ≤k array per month. err = est − exact is the
    estimator's signed error, pinned exactly by the oracle rebuilding
    the identical sketch."""
    return _theta_distinct_report(
        spark, sf_dir, _theta_month_sketch(spark, sf_dir)
    )


_THETA_PAIRS_ORACLE = f"""
    WITH sk AS MATERIALIZED ({_theta_month_sketch_cte()}),
    rk AS (SELECT month, hs, ROW_NUMBER() OVER (ORDER BY month) AS mrk FROM sk),
    p AS (SELECT a.month AS month_a, b.month AS month_b, a.hs AS ha, b.hs AS hb
          FROM rk a JOIN rk b ON b.mrk = a.mrk + 1),
    w AS (SELECT month_a, month_b, ha, hb,
                 least({duckdb_theta_of('ha')}, {duckdb_theta_of('hb')}) AS th
          FROM p),
    n AS (SELECT month_a, month_b, th,
                 len(list_filter(list_intersect(ha, hb), x -> x < th))::BIGINT AS n_and,
                 len(list_filter(ha, x -> x < th AND NOT list_contains(hb, x)))::BIGINT AS n_anb
          FROM w),
    mc AS (SELECT DISTINCT {_THETA_MONTH_DUCK} AS month, o_custkey FROM orders),
    xc AS (SELECT n.month_a, n.month_b,
                  COUNT(*) FILTER (WHERE b.o_custkey IS NOT NULL)::BIGINT AS exact_returning,
                  COUNT(*) FILTER (WHERE b.o_custkey IS NULL)::BIGINT AS exact_churned
           FROM n
           JOIN mc a ON a.month = n.month_a
           LEFT JOIN mc b ON b.month = n.month_b AND b.o_custkey = a.o_custkey
           GROUP BY n.month_a, n.month_b)
    SELECT n.month_a, n.month_b,
           CAST(floor((n_and::DOUBLE * {THETA_M}::DOUBLE) / th::DOUBLE) AS BIGINT)
             AS est_returning,
           xc.exact_returning,
           CAST(floor((n_anb::DOUBLE * {THETA_M}::DOUBLE) / th::DOUBLE) AS BIGINT)
             AS est_churned,
           xc.exact_churned
    FROM n JOIN xc USING (month_a, month_b)
    """


@query("theta_returning_customers", _THETA_PAIRS_ORACLE)
def q_theta_returning_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-month customer-retention estimates from sketch set
    algebra ALONE: est_returning = theta INTERSECTION of the two
    monthly sketches (|A∩B| — the op HLL cannot express), est_churned
    = theta A-NOT-B (|A\\B|). At 100 TB both are array ops over the
    ≤k-element standing index — no raw-data pass, no distinct-key
    shuffle; the exact_* columns (one distinct (month, cust) self-join
    on the fixture) exist to pin the estimators against truth. Month
    pairing is rank-based (month, next-month) over the ~80-row sketch
    index."""
    from pyspark.sql import Window

    # stage boundary: the sketch index (~80 rows × ≤k array) feeds the
    # a-side, b-side, AND the pair frame — materialize it once so the
    # raw-orders build pipeline is not re-planned per consumer (in a
    # real pipeline this is the persisted index theta_new_batch reads)
    sk = _theta_month_sketch(spark, sf_dir).localCheckpoint()
    # the sketch index is ~80 rows — a single-partition rank window
    # over it is driver-trivial (the raw data never sees a window)
    rk = sk.withColumn("mrk", F.row_number().over(Window.orderBy("month")))
    a = rk.select("month", "mrk", "hs")
    b = rk.select("month", (F.col("mrk") - 1).alias("mrk"), "hs")
    pairs = theta_set_ops(a, b, F.expr("a_mrk = b_mrk")).select(
        F.col("a_month").alias("month_a"),
        F.col("b_month").alias("month_b"),
        F.col("est_intersect").alias("est_returning"),
        F.col("est_a_not_b").alias("est_churned"),
    )

    mc = (
        load_table(spark, sf_dir, "orders")
        .select(F.expr(_THETA_MONTH_SPARK).alias("month"), "o_custkey")
        .distinct()
    )
    xa = mc.select(F.col("month").alias("month_a"), "o_custkey")
    xb = mc.select(
        F.col("month").alias("_xb_month"), F.col("o_custkey").alias("_bc")
    )
    xc = (
        pairs.select("month_a", "month_b")
        .join(xa, "month_a")
        .join(
            xb,
            (F.col("_xb_month") == F.col("month_b"))
            & (F.col("_bc") == F.col("o_custkey")),
            "left",
        )
        .groupBy("month_a", "month_b")
        .agg(
            F.count(F.when(F.col("_bc").isNotNull(), 1)).cast("bigint").alias("exact_returning"),
            F.count(F.when(F.col("_bc").isNull(), 1)).cast("bigint").alias("exact_churned"),
        )
    )
    return pairs.join(xc, ["month_a", "month_b"]).select(
        "month_a",
        "month_b",
        "est_returning",
        "exact_returning",
        "est_churned",
        "exact_churned",
    )


_THETA_ROLLUP_ORACLE = f"""
    WITH sk AS MATERIALIZED ({_theta_month_sketch_cte()}),
    u AS (SELECT substr(month, 1, 4) AS year, unnest(hs) AS h FROM sk),
    d AS (SELECT DISTINCT year, h FROM u),
    r AS (SELECT year, h, ROW_NUMBER() OVER (PARTITION BY year ORDER BY h) AS hrk
          FROM d),
    ysk AS (SELECT year, list(h ORDER BY h) AS hs FROM r WHERE hrk <= {THETA_K}
            GROUP BY year),
    ex AS (SELECT substr({_THETA_MONTH_DUCK}, 1, 4) AS year,
                  COUNT(DISTINCT o_custkey)::BIGINT AS exact_distinct
           FROM orders GROUP BY 1)
    SELECT ysk.year, {duckdb_theta_estimate('hs')} AS est_distinct,
           ex.exact_distinct
    FROM ysk JOIN ex USING (year)
    """


@query("theta_year_rollup", _THETA_ROLLUP_ORACLE)
def q_theta_year_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly distinct-customer estimates obtained by MERGING the 12
    monthly sketches (bottom-k of the union of samples — the exact
    merge law), NOT by re-scanning orders: the OLAP rollup a mergeable
    sketch index exists for. At 100 TB the year estimate costs 12
    array merges per year; the exact_distinct column is the fixture
    truth pin."""
    sk = _theta_month_sketch(spark, sf_dir)
    yr = theta_rollup(
        sk.withColumn("year", F.substring("month", 1, 4)).select("year", "hs"),
        ["year"],
    )
    exact = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.expr(f"substr({_THETA_MONTH_SPARK}, 1, 4)").alias("year"),
            "o_custkey",
        )
        .groupBy("year")
        .agg(F.countDistinct("o_custkey").cast("bigint").alias("exact_distinct"))
    )
    return (
        theta_estimate(yr)
        .join(exact, "year")
        .select("year", "est_distinct", "exact_distinct")
    )


@query("theta_new_batch", _THETA_DISTINCT_ORACLE)
def q_theta_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the monthly theta index: the corpus
    slice's sketches (o_orderkey hash bucket >= {NEW_BATCH_PCT}) are
    persisted as a parquet index, read back, and union-merged with the
    new batch's sketches — a full-outer join over index rows plus one
    array merge per month, never a re-scan of the corpus. Output is
    identical to theta_distinct_customers' full recompute BY THE MERGE
    LAW (bottom-k of combined samples == bottom-k of the union), and
    the oracle — the full-recompute SQL verbatim — certifies it
    cryptographically."""
    import os

    from .operators.sampling import hash_bucket
    from .sources.sinks import write_parquet

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.expr(_THETA_MONTH_SPARK).alias("month"), "o_custkey"
    )
    is_new = hash_bucket("o_orderkey") < NEW_BATCH_PCT
    corpus = orders.filter(~is_new)
    batch = orders.filter(is_new)

    idx_path = os.path.join(_run_scoped_index_dir("theta"), "theta_months")
    write_parquet(
        theta_sketch(corpus, ["month"], "o_custkey", prefilter=False), idx_path
    )
    idx = spark.read.parquet(idx_path)

    merged = theta_union(
        idx, theta_sketch(batch, ["month"], "o_custkey", prefilter=False), ["month"]
    )
    return _theta_distinct_report(spark, sf_dir, merged)


# ---------------------------------------------------------------------------
# PageRank — the centrality member of the graph family (connected
# components = identity, label propagation = attribute spread,
# PageRank = influence score). All-integer micro-unit arithmetic
# (operators/clusters.py::page_rank) makes the fixed-iteration run
# exactly reproducible in a DuckDB oracle of unrolled MATERIALIZED
# CTEs — no float tolerance anywhere.
# ---------------------------------------------------------------------------
PR_ITER = 3
PR_TOP = 25
PR_INIT = 1_000_000
PR_BASE = 150_000  # init·(100−85) div 100


def _pagerank_oracle() -> str:
    rounds = []
    prev = "r0"
    for i in range(1, PR_ITER + 1):
        rounds.append(
            f"r{i} AS MATERIALIZED (SELECT e.dst AS node, "
            f"({PR_BASE} + (85 * SUM({prev}.r // deg.d)) // 100)::BIGINT AS r "
            f"FROM e JOIN {prev} ON {prev}.node = e.src "
            f"JOIN deg ON deg.src = e.src GROUP BY e.dst)"
        )
        prev = f"r{i}"
    return f"""
    WITH raw AS MATERIALIZED (
      SELECT DISTINCT 'S' || CAST(l_suppkey AS VARCHAR) AS a,
             'C' || CAST(o_custkey AS VARCHAR) AS b
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    e AS MATERIALIZED (SELECT a AS src, b AS dst FROM raw
                       UNION ALL SELECT b AS src, a AS dst FROM raw),
    deg AS MATERIALIZED (SELECT src, COUNT(*)::BIGINT AS d FROM e GROUP BY src),
    r0 AS MATERIALIZED (SELECT src AS node, {PR_INIT}::BIGINT AS r FROM deg),
    {", ".join(rounds)},
    ranked AS (SELECT node, r AS rank_u6,
                      ROW_NUMBER() OVER (ORDER BY r DESC, node) AS rk
               FROM {prev})
    SELECT node, rank_u6, rk::BIGINT AS rk FROM ranked WHERE rk <= {PR_TOP}
    """


@query("supplier_customer_pagerank", _pagerank_oracle())
def q_supplier_customer_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PR_TOP} nodes of the symmetrized supplier↔customer
    co-purchase graph by {PR_ITER}-iteration integer PageRank.
    The edge list (distinct supplier→customer pairs through
    lineitem⋈orders, both directions so no node dangles) materializes
    once; each iteration is one join shuffle + one agg shuffle with
    per-iteration-flat lineage (operators/clusters.py::page_rank).
    rank_u6 is exact-integer on both engines — the oracle unrolls the
    {PR_ITER} rounds as MATERIALIZED CTEs and hash-matches with zero
    tolerance."""
    from .operators.clusters import page_rank
    from .operators.reshape import top_k

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    raw = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("a"),
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("b"),
        )
        .distinct()
    )
    edges = raw.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        raw.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    pr = page_rank(edges, n_iter=PR_ITER, init_u6=PR_INIT)
    ranked = top_k(
        pr, [], [F.col("rank_u6").desc(), F.col("node")], PR_TOP, "rk"
    )
    return ranked.select(
        "node", "rank_u6", F.col("rk").cast("bigint").alias("rk")
    )


# ---------------------------------------------------------------------------
# Triangle counting — graph cohesion (market-basket triads over the
# co-purchased-parts graph). Fourth graph-family member: CC answers
# reachability, label propagation spreads attributes, PageRank scores
# influence, triangles measure local DENSITY (clustering coefficient).
# Exact-integer end to end, so the oracle hash-matches the whole
# report including the micro-unit clustering coefficient.
# ---------------------------------------------------------------------------
TRI_TOP = 20
# support pruning: an edge needs >= 2 co-purchase orders. The classic
# market-basket lever AND the scale lever: one-off co-occurrences are
# combinatorial noise that grows ~linearly with order volume, while
# repeat pairs are the stationary signal (~4k edges at every fixture
# SF) — at 100 TB you never triangle-count the unpruned co-occurrence
# graph.
TRI_MIN_SUPPORT = 2


_TRIANGLE_ORACLE = f"""
    WITH op AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    e AS MATERIALIZED (
      SELECT u, v FROM (
        SELECT a.pk AS u, b.pk AS v, COUNT(*) AS c
        FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY 1, 2)
      WHERE c >= {TRI_MIN_SUPPORT}),
    deg AS MATERIALIZED (
      SELECT node, COUNT(*)::BIGINT AS degree FROM (
        SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
      GROUP BY node),
    t AS MATERIALIZED (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1
      JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
    corners AS (
      SELECT node, COUNT(*)::BIGINT AS tri FROM (
        SELECT a AS node FROM t UNION ALL
        SELECT b AS node FROM t UNION ALL
        SELECT c AS node FROM t)
      GROUP BY node),
    r AS (
      SELECT deg.node, COALESCE(corners.tri, 0)::BIGINT AS tri_count, deg.degree,
             (CASE WHEN deg.degree >= 2
                   THEN (2 * COALESCE(corners.tri, 0) * 1000000)
                        // (deg.degree * (deg.degree - 1))
                   ELSE 0 END)::BIGINT AS cc_u6,
             ROW_NUMBER() OVER (ORDER BY COALESCE(corners.tri, 0) DESC, deg.node)
               AS rk
      FROM deg LEFT JOIN corners USING (node))
    SELECT node AS part_key, tri_count, degree, cc_u6, rk::BIGINT AS rk
    FROM r WHERE rk <= {TRI_TOP}
    """


@query("copurchase_triangles", _TRIANGLE_ORACLE)
def q_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TRI_TOP} parts by triangle participation in the
    SUPPORT-PRUNED co-purchased-parts graph (edge = two parts sharing
    ≥ {TRI_MIN_SUPPORT} orders — repeat pairs are the market-basket
    signal, one-off co-occurrences the noise that would grow linearly
    with order volume), with exact degree and integer-micro-unit
    clustering coefficient cc_u6 = (2·tri·10⁶) div (deg·(deg−1)).
    The operator (operators/clusters.py::triangle_count) orients each
    edge low-degree→high-degree so wedge fan-out is arboricity-bounded
    (a hub's quadratic pair blow-up never materializes); every
    triangle is found exactly once at its min-rank corner. The edge
    build is ONE lineitem scan: baskets partial-aggregate map-side and
    pairs expand JVM-side from each order's sorted distinct-part array
    (bounded by basket size — no self-join, no second scan), then one
    support-count groupBy."""
    from .operators.clusters import triangle_count
    from .operators.reshape import top_k

    # basket-array pair expansion: ONE lineitem scan, baskets
    # partial-aggregate map-side (bounded by basket size), pairs
    # explode JVM-side from the sorted distinct-part array — no
    # self-join, no second scan
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    pair = F.expr(
        "inline(flatten(transform(parts, (x, i) -> "
        "transform(slice(parts, i + 2, size(parts) - i - 1), "
        "y -> struct(x as u, y as v)))))"
    )
    # stage boundary: the pruned edge list (~4k rows) feeds degrees,
    # orientation, wedges AND the close join — materialize once so the
    # basket pipeline is not re-executed per consumer
    edges = (
        baskets.select(pair)
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= TRI_MIN_SUPPORT)
        .select("u", "v")
        .localCheckpoint()
    )
    tc = triangle_count(edges)
    r = tc.select(
        F.col("node").alias("part_key"),
        "tri_count",
        "degree",
        F.expr(
            "cast(case when degree >= 2 then "
            "(2 * tri_count * 1000000) div (degree * (degree - 1)) "
            "else 0 end as bigint)"
        ).alias("cc_u6"),
    )
    ranked = top_k(
        r, [], [F.col("tri_count").desc(), F.col("part_key")], TRI_TOP, "rk"
    )
    return ranked.select(
        "part_key", "tri_count", "degree", "cc_u6",
        F.col("rk").cast("bigint").alias("rk"),
    )


# ---------------------------------------------------------------------------
# Association rules — the market-basket sibling of copurchase_triangles:
# directed pair rules a→b scored by support / confidence / lift, all in
# integer micro-units (confidence = (supp_ab·10⁶) div supp_a, lift =
# (supp_ab·N·10⁶) div (supp_a·supp_b)), so the whole report is
# hash-exact cross-engine. Supports are DISTINCT-ORDER counts (a part
# repeated within one order counts once).
# ---------------------------------------------------------------------------
RULES_TOP = 20
RULES_MIN_SUPPORT = 2


_RULES_ORACLE = f"""
    WITH op AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    supp AS MATERIALIZED (
      SELECT pk, COUNT(*)::BIGINT AS s FROM op GROUP BY pk),
    n AS (SELECT COUNT(DISTINCT ok)::BIGINT AS n_orders FROM op),
    pairs AS MATERIALIZED (
      SELECT a.pk AS u, b.pk AS v, COUNT(*)::BIGINT AS s_ab
      FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2 HAVING COUNT(*) >= {RULES_MIN_SUPPORT}),
    rules AS (
      SELECT u AS ant, v AS cons, s_ab FROM pairs
      UNION ALL
      SELECT v AS ant, u AS cons, s_ab FROM pairs),
    scored AS (
      SELECT r.ant, r.cons, r.s_ab AS supp_pair,
             ((r.s_ab * 1000000) // sa.s)::BIGINT AS conf_u6,
             ((r.s_ab * n.n_orders * 1000000) // (sa.s * sb.s))::BIGINT AS lift_u6
      FROM rules r
      JOIN supp sa ON sa.pk = r.ant
      JOIN supp sb ON sb.pk = r.cons
      CROSS JOIN n),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY lift_u6 DESC, ant, cons) AS rk
      FROM scored)
    SELECT ant, cons, supp_pair, conf_u6, lift_u6, rk::BIGINT AS rk
    FROM ranked WHERE rk <= {RULES_TOP}
    """


@query("copurchase_rules", _RULES_ORACLE)
def q_copurchase_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{RULES_TOP} association rules part→part by LIFT over orders
    with ≥ {RULES_MIN_SUPPORT} co-purchases — support / confidence /
    lift in exact integer micro-units. The basket pass is one
    per-order self-join on the distinct (order, part) projection
    (bounded by basket size, support groupBy partial-aggregates
    map-side); the part-support table joins back twice (antecedent +
    consequent) and N is a broadcast scalar — the Apriori level-2
    report an analytics engine owes its basket data."""
    from .operators.reshape import top_k

    op = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    supp = op.groupBy("pk").agg(F.count(F.lit(1)).cast("bigint").alias("s"))
    n = op.agg(F.countDistinct("ok").cast("bigint").alias("n_orders"))
    b = op.select(F.col("ok"), F.col("pk").alias("pb"))
    pairs = (
        op.join(b, (op["ok"] == b["ok"]) & (op["pk"] < b["pb"]))
        .groupBy(F.col("pk").alias("u"), F.col("pb").alias("v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("s_ab"))
        .filter(F.col("s_ab") >= RULES_MIN_SUPPORT)
    )
    rules = pairs.select(
        F.col("u").alias("ant"), F.col("v").alias("cons"), "s_ab"
    ).unionByName(
        pairs.select(F.col("v").alias("ant"), F.col("u").alias("cons"), "s_ab")
    )
    scored = (
        rules.join(supp.select(F.col("pk").alias("ant"), F.col("s").alias("_sa")), "ant")
        .join(supp.select(F.col("pk").alias("cons"), F.col("s").alias("_sb")), "cons")
        .crossJoin(F.broadcast(n))
        .select(
            "ant",
            "cons",
            F.col("s_ab").alias("supp_pair"),
            F.expr("cast((s_ab * 1000000) div _sa as bigint)").alias("conf_u6"),
            F.expr(
                "cast((s_ab * n_orders * 1000000) div (_sa * _sb) as bigint)"
            ).alias("lift_u6"),
        )
    )
    ranked = top_k(
        scored,
        [],
        [F.col("lift_u6").desc(), F.col("ant"), F.col("cons")],
        RULES_TOP,
        "rk",
    )
    return ranked.select(
        "ant", "cons", "supp_pair", "conf_u6", "lift_u6",
        F.col("rk").cast("bigint").alias("rk"),
    )


# ---------------------------------------------------------------------------
# LOCF gap-fill — last-observation-carried-forward over a (nation ×
# month) spine: the time-series repair every reporting pipeline needs
# when a dimension goes quiet for a period. Exercises IGNORE NULLS
# running windows (F.last(ignorenulls=True) == DuckDB last_value(x
# IGNORE NULLS)); revenue is exact integer cents so the fill is
# hash-identical cross-engine.
# ---------------------------------------------------------------------------


_LOCF_ORACLE = """
    WITH months AS MATERIALIZED (
      SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS m FROM orders),
    rev AS MATERIALIZED (
      SELECT n.n_name AS nation, strftime(o.o_orderdate, '%Y-%m') AS m,
             SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))::BIGINT AS rev_c
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2),
    spine AS (SELECT n_name AS nation, m FROM nation CROSS JOIN months),
    filled AS (
      SELECT s.nation, s.m AS month, rev.rev_c,
             last_value(rev.rev_c IGNORE NULLS) OVER (
               PARTITION BY s.nation ORDER BY s.m
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf
      FROM spine s LEFT JOIN rev ON rev.nation = s.nation AND rev.m = s.m)
    SELECT nation, month,
           COALESCE(locf, 0)::BIGINT AS rev_filled_c,
           (CASE WHEN rev_c IS NOT NULL THEN 'obs'
                 WHEN locf IS NOT NULL THEN 'locf'
                 ELSE 'none' END) AS fill_src
    FROM filled
    """


@query("nation_month_locf", _LOCF_ORACLE)
def q_nation_month_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue per nation over the FULL observed-month spine,
    gaps repaired by last-observation-carried-forward: one IGNORE
    NULLS running window per nation (partitioned — no global sort),
    integer-cent revenue so the filled series hash-matches DuckDB's
    last_value(IGNORE NULLS) exactly. fill_src labels each cell
    obs / locf / none (nation quiet since the epoch). The spine is
    |nations|×|months| (a broadcast cross of two tiny dims)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_format("o_orderdate", "yyyy-MM").alias("m"),
        )
        .agg(
            F.sum(F.expr("cast(floor(o_totalprice * 100) as bigint)"))
            .cast("bigint")
            .alias("rev_c")
        )
    )
    months = orders.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("m")
    ).distinct()
    spine = nation.select(F.col("n_name").alias("nation")).crossJoin(
        F.broadcast(months)
    )
    w = (
        Window.partitionBy("nation")
        .orderBy("m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        spine.join(rev, ["nation", "m"], "left")
        .withColumn("locf", F.last("rev_c", ignorenulls=True).over(w))
    )
    return filled.select(
        "nation",
        F.col("m").alias("month"),
        F.coalesce(F.col("locf"), F.lit(0)).cast("bigint").alias("rev_filled_c"),
        F.when(F.col("rev_c").isNotNull(), F.lit("obs"))
        .when(F.col("locf").isNotNull(), F.lit("locf"))
        .otherwise(F.lit("none"))
        .alias("fill_src"),
    )


# ---------------------------------------------------------------------------
# Manifest bloom point lookup — the third file-skipping mode of the
# versioned table after min/max range pruning (versioned_pruned_read)
# and Z-order clustering (versioned_zorder_read): per-file bloom
# filters skip files on POINT lookups over a HASH-SCATTERED key, where
# every file's min/max span covers the whole domain and range stats
# can prune nothing.
# ---------------------------------------------------------------------------
BLOOM_PROBE_KEYS = [7, 1234, 4321]


@query(
    "versioned_bloom_read",
    f"""
    SELECT o_orderkey, o_orderpriority,
           CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c
    FROM orders WHERE o_orderkey IN ({", ".join(str(k) for k in BLOOM_PROBE_KEYS)})
    """,
)
def q_versioned_bloom_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter file skipping end-to-end: orders is committed
    HASH-scattered on o_orderkey (every file spans ~the whole key
    range — min/max stats are useless for a point probe) with
    per-file blooms in the manifest; each probe key is read back
    through `read_version(point=(o_orderkey, k))`, which drops every
    file whose bloom proves the key absent (files-read <
    files-in-manifest pinned in pytest). Oracle = the plain IN-list
    select, so the hash match proves bloom skipping loses no rows
    (false positives only, never negatives). Commit cost rides inside
    the timed query (the versioned_pruned_read posture)."""
    from functools import reduce

    from .sources.versioned import commit_version, read_version

    root = _run_scoped_index_dir("versioned_bloom")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.expr("cast(floor(o_totalprice * 100) as bigint)").alias("price_c"),
    )
    commit_version(
        orders.repartition(8, "o_orderkey"), root, bloom_cols=["o_orderkey"]
    )
    probes = [
        read_version(spark, root, point=("o_orderkey", k))
        for k in BLOOM_PROBE_KEYS
    ]
    return reduce(lambda a, b: a.unionByName(b), probes).select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        "o_orderpriority",
        "price_c",
    )


_THETA_KEPT_ORDERS = (
    "kept AS (SELECT * FROM orders "
    f"WHERE {sql_hash_bucket('o_custkey', salt='forget')} >= {FORGET_PCT}), "
)


@query("theta_forget", _theta_distinct_oracle(src="kept", prelude=_THETA_KEPT_ORDERS))
def q_theta_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten on the theta index — the REBUILD-FROM-KEPT
    contract (KMV has no algebraic inverse: a deleted hash below θ
    cannot be replaced from above θ, the same non-invertibility as
    HLL; the A-NOT-B estimator answers "how much would deleting remove"
    at index cost, this query performs the actual deletion): the
    standing monthly index is persisted, the stable {FORGET_PCT}% of
    customers (by o_custkey hash) are deleted, ONLY the affected
    months' sketches rebuild from their kept rows (cost ∝
    kept-of-affected; untouched months' index rows pass through
    byte-identical), and the maintained index's report hash-matches
    the oracle's from-scratch recompute over kept orders."""
    import os

    from .operators.sampling import hash_bucket
    from .sources.sinks import write_parquet

    orders = load_table(spark, sf_dir, "orders").select(
        F.expr(_THETA_MONTH_SPARK).alias("month"), "o_custkey"
    )
    idx_path = os.path.join(_run_scoped_index_dir("theta_forget"), "theta_months")
    write_parquet(theta_sketch(orders, ["month"], "o_custkey", prefilter=False), idx_path)
    idx = spark.read.parquet(idx_path)

    is_del = hash_bucket("o_custkey", salt="forget") < FORGET_PCT
    kept = orders.filter(~is_del)
    affected = orders.filter(is_del).select("month").distinct()
    untouched = idx.join(affected, "month", "left_anti")
    rebuilt = theta_sketch(
        kept.join(F.broadcast(affected), "month"), ["month"], "o_custkey",
        prefilter=False,
    )
    merged = untouched.unionByName(rebuilt)

    exact = kept.groupBy("month").agg(
        F.countDistinct("o_custkey").cast("bigint").alias("exact_distinct")
    )
    return (
        theta_estimate(merged)
        .join(exact, "month")
        .select(
            "month",
            "est_distinct",
            F.expr("cast(size(hs) as bigint)").alias("k_kept"),
            "exact_distinct",
            (F.col("est_distinct") - F.col("exact_distinct"))
            .cast("bigint")
            .alias("err"),
        )
    )


# ---------------------------------------------------------------------------
# TextRank keyword extraction — PageRank COMPOSED over the token
# co-occurrence graph (Mihalcea & Tarau 2004): adjacent-token bigrams
# with corpus support become symmetric edges, the integer PageRank
# operator ranks tokens by graph centrality. The composition query:
# both pieces (bigram support counting, page_rank) already exist —
# this is what an engine's operators are FOR.
# ---------------------------------------------------------------------------
TEXTRANK_TOP = 20
TEXTRANK_MIN_COOC = 5


def _textrank_oracle() -> str:
    rounds = []
    prev = "r0"
    for i in range(1, PR_ITER + 1):
        rounds.append(
            f"r{i} AS MATERIALIZED (SELECT e.dst AS node, "
            f"({PR_BASE} + (85 * SUM({prev}.r // deg.d)) // 100)::BIGINT AS r "
            f"FROM e JOIN {prev} ON {prev}.node = e.src "
            f"JOIN deg ON deg.src = e.src GROUP BY e.dst)"
        )
        prev = f"r{i}"
    return f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, tok, pos FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok,
               generate_subscripts(string_split(lower(text), ' '), 1) AS pos
        FROM documents) WHERE tok <> ''),
    bg AS (SELECT a.tok AS w1, b.tok AS w2, COUNT(*)::BIGINT AS c
           FROM toks a JOIN toks b
             ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
           WHERE a.tok <> b.tok
           GROUP BY 1, 2),
    und AS (SELECT DISTINCT least(w1, w2) AS a, greatest(w1, w2) AS b
            FROM bg WHERE c >= {TEXTRANK_MIN_COOC}),
    e AS MATERIALIZED (SELECT a AS src, b AS dst FROM und
                       UNION ALL SELECT b AS src, a AS dst FROM und),
    deg AS MATERIALIZED (SELECT src, COUNT(*)::BIGINT AS d FROM e GROUP BY src),
    r0 AS MATERIALIZED (SELECT src AS node, {PR_INIT}::BIGINT AS r FROM deg),
    {", ".join(rounds)},
    ranked AS (SELECT node AS token, r AS rank_u6,
                      ROW_NUMBER() OVER (ORDER BY r DESC, node) AS rk
               FROM {prev})
    SELECT token, rank_u6, rk::BIGINT AS rk FROM ranked WHERE rk <= {TEXTRANK_TOP}
    """


@query("textrank_keywords", _textrank_oracle())
def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TEXTRANK_TOP} corpus keywords by TextRank: adjacent-token
    bigrams with ≥ {TEXTRANK_MIN_COOC} corpus occurrences form a
    symmetric co-occurrence graph (direction is irrelevant to
    centrality — and symmetry is also what satisfies page_rank's
    no-dangling contract by construction), ranked by the {PR_ITER}-
    iteration integer PageRank operator. One token scan builds the
    bigram counts (map-side partials); the graph is vocabulary-sized,
    so everything past the scan is index algebra. Exact-integer
    cross-engine (the supplier_customer_pagerank arithmetic verbatim)."""
    from .operators.clusters import page_rank
    from .operators.reshape import top_k

    docs = load_table(spark, sf_dir, "documents").select("text")
    toks = docs.select(
        F.split(F.lower(F.col("text")), " ").alias("toks")
    )
    bg = (
        toks.select(
            F.expr(
                "inline(CASE WHEN size(toks) >= 2 THEN "
                "transform(sequence(1, size(toks) - 1), "
                "i -> struct(toks[i - 1] AS w1, toks[i] AS w2)) "
                "ELSE array() END)"
            )
        )
        .filter((F.col("w1") != "") & (F.col("w2") != "") & (F.col("w1") != F.col("w2")))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .filter(F.col("c") >= TEXTRANK_MIN_COOC)
    )
    und = bg.select(
        F.least("w1", "w2").alias("a"), F.greatest("w1", "w2").alias("b")
    ).distinct()
    edges = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    pr = page_rank(edges, n_iter=PR_ITER, init_u6=PR_INIT)
    ranked = top_k(
        pr, [], [F.col("rank_u6").desc(), F.col("node")], TEXTRANK_TOP, "rk"
    )
    return ranked.select(
        F.col("node").alias("token"), "rank_u6",
        F.col("rk").cast("bigint").alias("rk"),
    )


# ---------------------------------------------------------------------------
# LSH quality evaluation — recall of the PRODUCTION MinHash config
# (pre-exact-dedup + bucket cap) against exact n-gram-Jaccard ground
# truth over the same representative set, banded by similarity: the
# textbook S-curve measurement (recall must rise toward 1 as jaccard
# → 1; the 0.3-0.5 band is BELOW the banding threshold and low recall
# there is the designed behavior, not a bug). A curation pipeline
# runs exactly this report before trusting its dedup settings.
# ---------------------------------------------------------------------------


_RECALL_BANDS_ORACLE = f"""
    WITH {_minhash_pairs_ctes()},
    tsh AS (SELECT doc_id,
                   list_transform(sh, s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)) AS th
            FROM sh),
    inv AS (SELECT doc_id, len(th) AS n, unnest(th) AS s FROM tsh),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb,
                     COUNT(*) AS n_inter
              FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id, a.n, b.n),
    truth AS (SELECT doc_a, doc_b,
                     ROUND(n_inter / CAST(na + nb - n_inter AS DOUBLE), 6) AS j
              FROM inter
              WHERE ROUND(n_inter / CAST(na + nb - n_inter AS DOUBLE), 6)
                    >= {JACCARD_THRESHOLD}),
    fl AS (SELECT CAST(ROUND(t.j * 1000000) AS BIGINT) AS j_u6,
                  (CASE WHEN mh.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS found
           FROM truth t
           LEFT JOIN (SELECT DISTINCT doc_a, doc_b FROM mh_pairs) mh
             ON mh.doc_a = t.doc_a AND mh.doc_b = t.doc_b),
    banded AS (SELECT (CASE WHEN j_u6 >= 900000 THEN '0.9+'
                            WHEN j_u6 >= 700000 THEN '0.7-0.9'
                            WHEN j_u6 >= 500000 THEN '0.5-0.7'
                            ELSE '0.3-0.5' END) AS band, found
               FROM fl),
    g AS (SELECT band, COUNT(*)::BIGINT AS n_truth,
                 SUM(found)::BIGINT AS n_found
          FROM banded GROUP BY band
          UNION ALL
          SELECT 'all', COUNT(*)::BIGINT, SUM(found)::BIGINT FROM banded)
    SELECT band, n_truth, n_found,
           ((n_found * 1000000) // n_truth)::BIGINT AS recall_u6
    FROM g
    """


@query("minhash_recall_bands", _RECALL_BANDS_ORACLE)
def q_minhash_recall_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH recall by similarity band: ground truth = exact n-gram
    Jaccard ≥ {JACCARD_THRESHOLD} over the exact-dup REPRESENTATIVE
    set (the same population the production LSH signs), found = truth
    pairs the banded+capped MinHash surfaced. recall_u6 rises toward
    10⁶ as jaccard → 1 (the S-curve contract); the sub-threshold
    0.3-0.5 band is allowed to miss. Ground truth costs one
    inverted-index intersection — this report is how a pipeline
    VALIDATES its dedup config on a sample before trusting it at
    100 TB (run it on a hash-sample there; here the fixture IS the
    sample)."""
    from .operators.dedup import (
        exact_dup_representatives,
        minhash_candidates,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    reps = exact_dup_representatives(docs)
    truth = ngram_jaccard_pairs(reps, JACCARD_THRESHOLD).select(
        "doc_a",
        "doc_b",
        F.expr("cast(round(jaccard * 1000000) as bigint)").alias("j_u6"),
    )
    cand = (
        minhash_candidates(docs, bucket_cap=MINHASH_BUCKET_CAP, pre_exact_dedup=True)
        .select("doc_a", "doc_b")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    fl = truth.join(cand, ["doc_a", "doc_b"], "left").select(
        "j_u6", F.coalesce(F.col("_hit"), F.lit(0)).alias("found")
    )
    banded = fl.select(
        F.when(F.col("j_u6") >= 900000, "0.9+")
        .when(F.col("j_u6") >= 700000, "0.7-0.9")
        .when(F.col("j_u6") >= 500000, "0.5-0.7")
        .otherwise("0.3-0.5")
        .alias("band"),
        "found",
    )
    per_band = banded.groupBy("band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_truth"),
        F.sum("found").cast("bigint").alias("n_found"),
    )
    overall = banded.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_truth"),
        F.sum("found").cast("bigint").alias("n_found"),
    ).select(F.lit("all").alias("band"), "n_truth", "n_found")
    return per_band.unionByName(overall).select(
        "band",
        "n_truth",
        "n_found",
        F.expr("cast((n_found * 1000000) div n_truth as bigint)").alias("recall_u6"),
    )


# ---------------------------------------------------------------------------
# Personalized PageRank — "customers who bought X also ended up around
# Y": random walk with restart from each seed part over the
# support-pruned co-purchase graph. The RECOMMENDATION member of the
# graph family (global PageRank = influence, PPR = affinity to a
# seed); association rules score direct pairs, PPR scores multi-hop
# affinity. Exact-integer, unrolled-CTE oracle.
# ---------------------------------------------------------------------------
PPR_SEEDS = 3
PPR_TOP = 10


def _ppr_oracle() -> str:
    rounds = []
    prev = "r0"
    for i in range(1, PR_ITER + 1):
        rounds.append(
            f"""sp{i} AS MATERIALIZED (
              SELECT r.seed, e.dst AS node,
                     ((85 * SUM(r.r // deg.d)) // 100)::BIGINT AS s
              FROM e JOIN {prev} r ON r.node = e.src
              JOIN deg ON deg.src = e.src GROUP BY r.seed, e.dst),
            r{i} AS MATERIALIZED (
              SELECT COALESCE(sp.seed, rs.seed) AS seed,
                     COALESCE(sp.node, rs.node) AS node,
                     (COALESCE(sp.s, 0) + COALESCE(rs.b, 0))::BIGINT AS r
              FROM sp{i} sp FULL OUTER JOIN restart rs
                ON rs.seed = sp.seed AND rs.node = sp.node)"""
        )
        prev = f"r{i}"
    return f"""
    WITH op AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    und AS MATERIALIZED (
      SELECT u, v FROM (
        SELECT a.pk AS u, b.pk AS v, COUNT(*) AS c
        FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY 1, 2)
      WHERE c >= {TRI_MIN_SUPPORT}),
    e AS MATERIALIZED (SELECT u AS src, v AS dst FROM und
                       UNION ALL SELECT v AS src, u AS dst FROM und),
    deg AS MATERIALIZED (SELECT src, COUNT(*)::BIGINT AS d FROM e GROUP BY src),
    innodes AS (SELECT DISTINCT src AS node FROM e),
    seeds AS MATERIALIZED (
      SELECT pk AS seed FROM (
        SELECT op.pk, COUNT(*) AS c FROM op JOIN innodes ON innodes.node = op.pk
        GROUP BY op.pk ORDER BY c DESC, op.pk LIMIT {PPR_SEEDS})),
    restart AS (SELECT seed, seed AS node, {PR_BASE}::BIGINT AS b FROM seeds),
    r0 AS (SELECT seed, seed AS node, {PR_INIT}::BIGINT AS r FROM seeds),
    {", ".join(rounds)},
    ranked AS (SELECT seed, node, r AS rank_u6,
                      ROW_NUMBER() OVER (PARTITION BY seed
                                         ORDER BY r DESC, node) AS rk
               FROM {prev} WHERE node <> seed)
    SELECT seed, node AS related_part, rank_u6, rk::BIGINT AS rk
    FROM ranked WHERE rk <= {PPR_TOP}
    """


@query("related_parts_ppr", _ppr_oracle())
def q_related_parts_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PPR_TOP} related parts for each of the {PPR_SEEDS}
    highest-support parts, by {PR_ITER}-hop personalized PageRank over
    the support-pruned co-purchase graph (operators/clusters.py::
    personalized_page_rank — restart mass returns to the seed, so
    scores measure affinity TO that seed; the rank frontier stays
    within {PR_ITER} hops of the seeds, not |seeds|×|V|). Seeds are
    restricted to parts present in the pruned graph. Exact-integer,
    hash-matched against the unrolled per-seed CTE oracle."""
    from .operators.clusters import personalized_page_rank
    from .operators.reshape import top_k

    op = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    b = op.select(F.col("ok"), F.col("pk").alias("pb"))
    und = (
        op.join(b, (op["ok"] == b["ok"]) & (op["pk"] < b["pb"]))
        .groupBy(F.col("pk").alias("u"), F.col("pb").alias("v"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= TRI_MIN_SUPPORT)
        .select("u", "v")
    )
    edges = und.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionByName(
        und.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    innodes = edges.select(F.col("src").alias("pk")).distinct()
    # the 3-row seed frame seeds BOTH the rank vector and the restart
    # term of every iteration — materialize it so the support-count
    # pipeline is not re-planned per round (the returned plan carries
    # zero raw scans, pinned in tests)
    seeds = (
        op.join(innodes, "pk")
        .groupBy("pk")
        .agg(F.count(F.lit(1)).alias("_c"))
        .orderBy(F.col("_c").desc(), F.col("pk"))
        .limit(PPR_SEEDS)
        .select(F.col("pk").alias("seed"))
        .localCheckpoint()
    )
    pr = personalized_page_rank(edges, seeds, n_iter=PR_ITER)
    ranked = top_k(
        pr.filter(F.col("node") != F.col("seed")),
        ["seed"],
        [F.col("rank_u6").desc(), F.col("node")],
        PPR_TOP,
        "rk",
    )
    return ranked.select(
        "seed",
        F.col("node").alias("related_part"),
        "rank_u6",
        F.col("rk").cast("bigint").alias("rk"),
    )


# ---------------------------------------------------------------------------
# Embedding-centroid drift — the SEMANTIC member of the drift family
# (user_value_drift_psi / user_value_drift_ks / windowed_drift_psi
# watch scalar distributions; this watches where each label's
# embedding mass SITS): per label, the squared L2 distance between
# the two cohorts' centroids. Elements quantize to exact int64
# micro-units BEFORE summing, so the centroid sums are
# order-independent integers and the whole report hash-matches with
# no sorted-fold gymnastics (the float-SUM trap from the verify
# gotchas, sidestepped instead of worked around).
# ---------------------------------------------------------------------------


_CENTROID_DRIFT_ORACLE = f"""
    WITH q AS (
      SELECT label,
             ({sql_hash_bucket("vec_id", salt="cdrift")} < 50) AS in_a,
             generate_subscripts(embedding, 1) AS dim,
             CAST(floor(unnest(embedding::DOUBLE[]) * 1000000.0) AS BIGINT) AS v_u6
      FROM embeddings),
    s AS (SELECT label, dim,
                 SUM(CASE WHEN in_a THEN v_u6 ELSE 0 END)::BIGINT AS sa,
                 SUM(CASE WHEN in_a THEN 1 ELSE 0 END)::BIGINT AS na,
                 SUM(CASE WHEN NOT in_a THEN v_u6 ELSE 0 END)::BIGINT AS sb,
                 SUM(CASE WHEN NOT in_a THEN 1 ELSE 0 END)::BIGINT AS nb
          FROM q GROUP BY label, dim),
    d AS (SELECT label, na, nb,
                 ((sa // na) - (sb // nb)) AS dd
          FROM s WHERE na > 0 AND nb > 0)
    SELECT label, MIN(na)::BIGINT AS n_a, MIN(nb)::BIGINT AS n_b,
           SUM(dd * dd)::BIGINT AS l2sq_u12
    FROM d GROUP BY label
    """


@query("embedding_centroid_drift", _CENTROID_DRIFT_ORACLE)
def q_embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label squared L2 distance between the centroids of two
    stable hash cohorts of the embedding corpus (A = vec_id bucket
    < 50) — the drift monitor for a re-embedded or re-crawled corpus:
    a jump in l2sq_u12 for a label means its semantic mass moved.
    One explode pass (vec, dim, micro-unit value), one (label, dim)
    sum — integer partial aggregates all the way; centroids are
    floor-averages (sum div n), distance is Σ(Δdim)², both
    engine-exact. At 100 TB this is the map-side-combine shape: the
    shuffle carries |labels|·|dims| integer triples, never vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    from .operators.sampling import hash_bucket

    q = emb.select(
        "label",
        (hash_bucket("vec_id", 100, salt="cdrift") < 50).alias("in_a"),
        F.expr(
            "inline(transform(embedding, (x, i) -> "
            "struct(i + 1 as dim, cast(floor(cast(x as double) * 1000000.0) as bigint) as v_u6)))"
        ),
    )
    s = q.groupBy("label", "dim").agg(
        F.sum(F.when(F.col("in_a"), F.col("v_u6")).otherwise(0)).cast("bigint").alias("sa"),
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("bigint").alias("na"),
        F.sum(F.when(~F.col("in_a"), F.col("v_u6")).otherwise(0)).cast("bigint").alias("sb"),
        F.sum(F.when(~F.col("in_a"), 1).otherwise(0)).cast("bigint").alias("nb"),
    )
    d = s.filter((F.col("na") > 0) & (F.col("nb") > 0)).select(
        "label", "na", "nb",
        F.expr("(sa div na) - (sb div nb)").alias("dd"),
    )
    return d.groupBy("label").agg(
        F.min("na").cast("bigint").alias("n_a"),
        F.min("nb").cast("bigint").alias("n_b"),
        F.sum(F.expr("dd * dd")).cast("bigint").alias("l2sq_u12"),
    )


# ---------------------------------------------------------------------------
# Mixture budgeting — integer WATERFILL of a total token budget across
# sources: every source keeps its tokens up to a common cap c chosen
# so allocations sum to (at most) the budget; small sources pass
# through whole, big sources are capped at the level. The planning
# step of data mixing (corpus_temperature_sample then EXECUTES a
# mixture at row level; this decides the per-source budgets). Exact
# integer algorithm: rank sources by token count ascending, find the
# first rank r where prefix_{r-1} + t_r·(n−r+1) ≥ B, then
# c = (B − prefix_{r-1}) div (n−r+1) with the remainder spread one
# token each to the first `rem` capped sources in rank order — fully
# window/prefix-sum expressible, no iteration, engine-exact.
# ---------------------------------------------------------------------------
WATERFILL_BUDGET_PCT = 60  # budget = 60% of total corpus tokens


_WATERFILL_ORACLE = f"""
    WITH t0 AS (SELECT source, unnest(string_split(lower(text), ' ')) AS tok
                FROM documents),
    ts AS (SELECT source, COUNT(*)::BIGINT AS t
           FROM t0 WHERE tok <> '' GROUP BY source),
    tot AS (SELECT SUM(t)::BIGINT AS total,
                   ((SUM(t) * {WATERFILL_BUDGET_PCT}) // 100)::BIGINT AS b,
                   COUNT(*)::BIGINT AS n
            FROM ts),
    rk AS (SELECT source, t,
                  ROW_NUMBER() OVER (ORDER BY t, source) AS r,
                  COALESCE(SUM(t) OVER (ORDER BY t, source
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING), 0)::BIGINT AS prefix
           FROM ts),
    pick AS (SELECT MIN(rk.r) AS r0 FROM rk CROSS JOIN tot
             WHERE rk.prefix + rk.t * (tot.n - rk.r + 1) >= tot.b),
    lvl AS (SELECT CASE WHEN pick.r0 IS NULL THEN NULL
                        ELSE (tot.b - rk.prefix) // (tot.n - rk.r + 1) END AS c,
                   CASE WHEN pick.r0 IS NULL THEN 0
                        ELSE (tot.b - rk.prefix) % (tot.n - rk.r + 1) END AS rem,
                   pick.r0 AS r0
            FROM pick LEFT JOIN rk ON rk.r = pick.r0 CROSS JOIN tot)
    SELECT rk.source, rk.t AS tokens,
           (CASE WHEN lvl.r0 IS NULL OR rk.r < lvl.r0 THEN rk.t
                 ELSE LEAST(rk.t, lvl.c
                            + (CASE WHEN rk.r - lvl.r0 < lvl.rem
                                    THEN 1 ELSE 0 END)) END)::BIGINT
             AS alloc,
           (CASE WHEN lvl.r0 IS NOT NULL AND rk.r >= lvl.r0
                 THEN 1 ELSE 0 END)::BIGINT AS capped
    FROM rk CROSS JOIN lvl
    """


@query("source_token_waterfill", _WATERFILL_ORACLE)
def q_source_token_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token allocation under a {WATERFILL_BUDGET_PCT}%-of-
    corpus budget by integer waterfill: sources below the water level
    keep everything, sources above are capped at the common level,
    remainder tokens spread one-each in rank order — the deterministic
    budget plan a mixture sampler then executes. One token-count agg
    (map-side partials), one |sources|-row window pass, two broadcast
    scalars; everything past the scan is index-sized. Engine-exact
    (pure integer div/mod; pure-Python waterfill reference in
    pytest)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    tok = docs.select(
        "source",
        F.expr(
            "size(filter(split(lower(text), ' '), x -> x <> ''))"
        ).alias("_nt"),
    )
    ts = tok.groupBy("source").agg(F.sum("_nt").cast("bigint").alias("t"))
    tot = ts.agg(
        F.sum("t").cast("bigint").alias("total"),
        F.expr(f"cast((sum(t) * {WATERFILL_BUDGET_PCT}) div 100 as bigint)").alias("b"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    w = Window.orderBy("t", "source")
    rk = ts.select(
        "source",
        "t",
        F.row_number().over(w).alias("r"),
        F.coalesce(
            F.sum("t").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
        )
        .cast("bigint")
        .alias("prefix"),
    ).crossJoin(F.broadcast(tot))
    pick = rk.filter(
        F.expr("prefix + t * (n - r + 1) >= b")
    ).agg(F.min("r").alias("r0"))
    lvl = (
        F.broadcast(pick)
        .join(rk.withColumnRenamed("r", "_r"), F.expr("_r = r0"), "left")
        .select(
            "r0",
            F.expr(
                "case when r0 is null then null else (b - prefix) div (n - r0 + 1) end"
            ).alias("c"),
            F.expr(
                "case when r0 is null then 0 else (b - prefix) % (n - r0 + 1) end"
            ).alias("rem"),
        )
    )
    return rk.crossJoin(F.broadcast(lvl)).select(
        "source",
        F.col("t").alias("tokens"),
        F.expr(
            "cast(case when r0 is null or r < r0 then t "
            "else least(t, c + (case when r - r0 < rem then 1 else 0 end)) end as bigint)"
        ).alias("alloc"),
        F.expr(
            "cast(case when r0 is not null and r >= r0 then 1 else 0 end as bigint)"
        ).alias("capped"),
    )


# ---------------------------------------------------------------------------
# HITS hubs & authorities — the dual-score graph member: PageRank
# (supplier_customer_pagerank) collapses the supplier↔customer graph
# into ONE symmetrized influence score; HITS keeps the direction and
# scores both SIDES of the bipartite relation at once — hub quality
# of suppliers ("supplies the well-connected customers") and
# authority of customers ("buys from the well-connected suppliers").
# All-integer fixed-point (operators/clusters.py::hits_scores), so
# the oracle unrolls the rounds as MATERIALIZED CTEs and
# hash-matches with zero tolerance — the page_rank convention.
# ---------------------------------------------------------------------------
HITS_ITER = 2
HITS_TOP = 15


def _hits_oracle() -> str:
    rounds = []
    prev = "h0"
    for i in range(1, HITS_ITER + 1):
        rounds.append(
            f"a{i} AS MATERIALIZED (SELECT raw.dst AS node, "
            f"SUM({prev}.s)::BIGINT AS s FROM raw "
            f"JOIN {prev} ON {prev}.node = raw.src GROUP BY raw.dst)"
        )
        rounds.append(
            f"h{i} AS MATERIALIZED (SELECT raw.src AS node, "
            f"SUM(a{i}.s)::BIGINT AS s FROM raw "
            f"JOIN a{i} ON a{i}.node = raw.dst GROUP BY raw.src)"
        )
        prev = f"h{i}"
    return f"""
    WITH raw AS MATERIALIZED (
      SELECT DISTINCT 'S' || CAST(l_suppkey AS VARCHAR) AS src,
             'C' || CAST(o_custkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    h0 AS (SELECT DISTINCT src AS node, 1::BIGINT AS s FROM raw),
    {", ".join(rounds)},
    ra AS (SELECT node, s, ROW_NUMBER() OVER (ORDER BY s DESC, node) AS rk
           FROM a{HITS_ITER}),
    rh AS (SELECT node, s, ROW_NUMBER() OVER (ORDER BY s DESC, node) AS rk
           FROM h{HITS_ITER})
    SELECT 'authority' AS role, node, s AS score, rk::BIGINT AS rk
    FROM ra WHERE rk <= {HITS_TOP}
    UNION ALL
    SELECT 'hub' AS role, node, s AS score, rk::BIGINT AS rk
    FROM rh WHERE rk <= {HITS_TOP}
    """


@query("supplier_customer_hits", _hits_oracle())
def q_supplier_customer_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{HITS_TOP} hubs (suppliers) and authorities (customers) of
    the DIRECTED supplier→customer graph by {HITS_ITER}-round integer
    HITS. The distinct edge list (lineitem⋈orders) materializes once;
    each round is two join+agg shuffles with per-round-flat lineage
    (operators/clusters.py::hits_scores — see its docstring for the
    no-normalization exactness argument and int64 magnitude bound).
    The oracle unrolls the rounds as MATERIALIZED CTEs; scores are
    pure int64 sums, hash-matched with zero tolerance."""
    from .operators.clusters import hits_scores
    from .operators.reshape import top_k

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    auth, hubs = hits_scores(edges, n_iter=HITS_ITER)
    ra = top_k(auth, [], [F.col("score").desc(), F.col("node")], HITS_TOP, "rk")
    rh = top_k(hubs, [], [F.col("score").desc(), F.col("node")], HITS_TOP, "rk")
    return (
        ra.select(F.lit("authority").alias("role"), "node", "score", "rk")
        .unionByName(
            rh.select(F.lit("hub").alias("role"), "node", "score", "rk")
        )
        .select("role", "node", "score", F.col("rk").cast("bigint").alias("rk"))
    )


# ---------------------------------------------------------------------------
# BFS hop distance — the reachability-DISTANCE graph member: CC says
# "same island?", PPR scores affinity, bfs_hops says "how far?". The
# query measures the blast radius of the hottest parts: hop distance
# from the 3 highest-support parts (the PPR seed set, verbatim) over
# the support-pruned co-purchase graph. Frontier BFS — each round
# expands only nodes FIRST reached last round against the
# once-materialized edge frame; exact integer distances, unrolled-CTE
# oracle.
# ---------------------------------------------------------------------------
BFS_MAX_HOPS = 3


def _bfs_oracle() -> str:
    rounds = []
    for i in range(1, BFS_MAX_HOPS + 1):
        rounds.append(
            f"""n{i} AS MATERIALIZED (
              SELECT DISTINCT e.dst AS node
              FROM e JOIN f{i - 1} ON e.src = f{i - 1}.node),
            f{i} AS MATERIALIZED (
              SELECT n{i}.node FROM n{i}
              LEFT JOIN v{i - 1} ON v{i - 1}.node = n{i}.node
              WHERE v{i - 1}.node IS NULL),
            v{i} AS MATERIALIZED (
              SELECT node, dist FROM v{i - 1}
              UNION ALL SELECT node, {i} FROM f{i})"""
        )
    return f"""
    WITH op AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    und AS MATERIALIZED (
      SELECT u, v FROM (
        SELECT a.pk AS u, b.pk AS v, COUNT(*) AS c
        FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY 1, 2)
      WHERE c >= {TRI_MIN_SUPPORT}),
    e AS MATERIALIZED (SELECT u AS src, v AS dst FROM und
                       UNION ALL SELECT v AS src, u AS dst FROM und),
    innodes AS (SELECT DISTINCT src AS node FROM e),
    seeds AS MATERIALIZED (
      SELECT pk AS node FROM (
        SELECT op.pk, COUNT(*) AS c FROM op JOIN innodes ON innodes.node = op.pk
        GROUP BY op.pk ORDER BY c DESC, op.pk LIMIT {PPR_SEEDS})),
    f0 AS (SELECT node FROM seeds),
    v0 AS (SELECT node, 0 AS dist FROM seeds),
    {", ".join(rounds)}
    SELECT node AS part_key, dist::BIGINT AS dist FROM v{BFS_MAX_HOPS}
    """


@query("part_hops_bfs", _bfs_oracle())
def q_part_hops_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance (≤ {BFS_MAX_HOPS}) from the {PPR_SEEDS}
    highest-support parts over the support-pruned co-purchase graph —
    multi-source frontier BFS (operators/clusters.py::bfs_hops: round
    i expands only nodes FIRST reached in round i−1 against the
    once-materialized edge frame, anti-joins visited; work per round
    ∝ the frontier's edge cut). Seed selection is the related_parts_ppr
    contract verbatim, so the two queries compose: PPR scores the
    affinity of what BFS proves reachable. Exact-integer distances,
    hash-matched against the unrolled-CTE oracle."""
    from .operators.clusters import bfs_hops

    op = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    b = op.select(F.col("ok"), F.col("pk").alias("pb"))
    und = (
        op.join(b, (op["ok"] == b["ok"]) & (op["pk"] < b["pb"]))
        .groupBy(F.col("pk").alias("u"), F.col("pb").alias("v"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= TRI_MIN_SUPPORT)
        .select("u", "v")
    )
    edges = und.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionByName(
        und.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    innodes = edges.select(F.col("src").alias("pk")).distinct()
    seeds = (
        op.join(innodes, "pk")
        .groupBy("pk")
        .agg(F.count(F.lit(1)).alias("_c"))
        .orderBy(F.col("_c").desc(), F.col("pk"))
        .limit(PPR_SEEDS)
        .select(F.col("pk").alias("node"))
    )
    return bfs_hops(edges, seeds, max_hops=BFS_MAX_HOPS).select(
        F.col("node").alias("part_key"), "dist"
    )


# ---------------------------------------------------------------------------
# DSIR importance weights — the data-SELECTION member of the mixture
# family (Xie et al. 2023): source_token_waterfill budgets whole
# sources, corpus_temperature_sample executes a mixture row-level;
# DSIR scores each INDIVIDUAL document by how target-like its hashed
# bigram distribution is, so resampling by the weights shifts a raw
# crawl toward a high-quality reference domain without training a
# classifier. Same exactness discipline as doc_unigram_nll: every
# bucket contribution is tf · ln of one exact-int64 smoothed ratio,
# per-doc sums fold bucket-sorted.
# ---------------------------------------------------------------------------
DSIR_TGT_MIN_CHARS = 300  # target corpus = long docs (fixture median ~311)


def _dsir_oracle() -> str:
    from .operators.textanalysis import DSIR_BUCKETS

    b = DSIR_BUCKETS
    toks = "list_filter(string_split(lower(text), ' '), x -> x <> '')"
    bg = (
        "unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1), "
        "i -> t[i] || ' ' || t[i+1]))"
    )
    bucket = f"(CAST('0x' || substr(md5('dsir' || bg), 1, 8) AS BIGINT) % {b})"
    return f"""
    WITH tg0 AS (SELECT {toks} AS t FROM documents
                 WHERE n_chars >= {DSIR_TGT_MIN_CHARS}),
    tg AS (SELECT {bg} AS bg FROM tg0),
    ct AS (SELECT {bucket} AS bucket, COUNT(*)::BIGINT AS c_t
           FROM tg GROUP BY 1),
    db0 AS (SELECT doc_id, {toks} AS t FROM documents),
    db AS (SELECT doc_id, {bg} AS bg FROM db0),
    tf AS (SELECT doc_id, {bucket} AS bucket, COUNT(*)::BIGINT AS tf_l
           FROM db GROUP BY 1, 2),
    cr AS (SELECT bucket, SUM(tf_l)::BIGINT AS c_r FROM tf GROUP BY bucket),
    tot AS (SELECT (SELECT COALESCE(SUM(c_t), 0) FROM ct)::BIGINT AS n_t,
                   (SELECT COALESCE(SUM(c_r), 0) FROM cr)::BIGINT AS n_r),
    c AS (SELECT tf.doc_id, tf.bucket, tf.tf_l,
                 CAST(tf.tf_l AS DOUBLE) * ln(
                   CAST((COALESCE(ct.c_t, 0) + 1) * (tot.n_r + {b}) AS DOUBLE)
                   / CAST((cr.c_r + 1) * (tot.n_t + {b}) AS DOUBLE)) AS w
          FROM tf JOIN cr USING (bucket) LEFT JOIN ct USING (bucket)
          CROSS JOIN tot),
    s AS (SELECT doc_id, SUM(tf_l)::BIGINT AS n_bigrams,
                 list_sum(list(w ORDER BY bucket)) AS logw
          FROM c GROUP BY doc_id)
    SELECT d.doc_id, COALESCE(s.n_bigrams, 0)::BIGINT AS n_bigrams,
           CASE WHEN s.n_bigrams > 0
                THEN CAST(FLOOR(s.logw * 1000000.0) AS BIGINT) END AS logw_u6,
           (CASE WHEN s.n_bigrams > 0
                      AND CAST(FLOOR(s.logw * 1000000.0) AS BIGINT) >= 0
                 THEN 1 ELSE 0 END)::BIGINT AS keep
    FROM documents d LEFT JOIN s USING (doc_id)
    """


@query("dsir_doc_weights", _dsir_oracle())
def q_dsir_doc_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance log-weight toward the long-doc
    target slice (n_chars ≥ {DSIR_TGT_MIN_CHARS}), hashed-bigram
    features (operators/textanalysis.py::dsir_logweights — see its
    docstring for the smoothing, exactness and persisted-index
    posture). keep = logw_u6 ≥ 0 (more target-like than raw-like);
    bigram-less docs report (0, NULL, 0) via the left join. The raw
    corpus explodes ONCE (raw bucket counts derive from the per-doc
    tf table); at 100 TB both count tables are standing
    vocabulary-style indexes and scoring a new crawl batch is one
    equi-join on bucket."""
    from .operators.sampling import hash_bucket  # noqa: F401 (family import)
    from .operators.textanalysis import dsir_logweights

    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("n_chars") >= DSIR_TGT_MIN_CHARS)
    s = dsir_logweights(_spread(docs), target)
    logw_u6 = F.floor(F.col("logw") * F.lit(1000000.0)).cast("bigint")
    scored = s.select(
        "doc_id",
        "n_bigrams",
        F.when(F.col("n_bigrams") > 0, logw_u6).alias("logw_u6"),
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias("n_bigrams"),
            "logw_u6",
            F.when(
                F.col("n_bigrams").isNotNull()
                & (F.col("n_bigrams") > 0)
                & (F.col("logw_u6") >= 0),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# nDCG@k — the ORDER-aware retrieval metric next to ann_recall_at_k's
# set-overlap: recall treats a method that returns the right 5
# neighbors in the wrong order as perfect; nDCG discounts each hit by
# its position, so misordering costs score. Graded relevance derives
# from the exact brute-force ranking (rank 1 → rel 3, 2-3 → 2,
# 4-5 → 1); the position discounts 1/log2(r+1) are PRECOMPUTED
# integer micro-constants baked identically into both engines, so the
# whole metric is exact-integer (dcg·10⁶ div idcg) with no float log
# at query time.
# ---------------------------------------------------------------------------
_NDCG_REL_BY_RANK = {1: 3, 2: 2, 3: 2, 4: 1, 5: 1}
_NDCG_W_U6 = {
    r: int(1_000_000 / __import__("math").log2(r + 1)) for r in range(1, 6)
}
_NDCG_REL_CASE = (
    "CASE brank "
    + " ".join(f"WHEN {r} THEN {g}" for r, g in _NDCG_REL_BY_RANK.items())
    + " ELSE 0 END"
)
_NDCG_W_CASE = (
    "CASE arank "
    + " ".join(f"WHEN {r} THEN {w}" for r, w in _NDCG_W_U6.items())
    + " ELSE 0 END"
)


def _ndcg_oracle() -> str:
    from .workload import ORACLES

    return f"""
    WITH brute AS ({ORACLES["ann_bruteforce_topk"]}),
    lsh AS ({ORACLES["ann_lsh_topk"]}),
    ivf AS ({ORACLES["ann_ivf_topk"]}),
    ivf2 AS ({ORACLES["ann_ivf_nprobe_topk"]}),
    gains AS (SELECT query_id, neighbor_id, rank AS brank,
                     ({_NDCG_REL_CASE.replace("brank", "rank")})::BIGINT AS rel
              FROM brute),
    idcg AS (SELECT query_id,
                    SUM(rel * ({_NDCG_W_CASE.replace("arank", "brank")}))::BIGINT
                      AS idcg_u6
             FROM gains GROUP BY query_id),
    approx AS (SELECT 'lsh' AS method, query_id, neighbor_id, rank AS arank
               FROM lsh
               UNION ALL
               SELECT 'ivf', query_id, neighbor_id, rank FROM ivf
               UNION ALL
               SELECT 'ivf2', query_id, neighbor_id, rank FROM ivf2),
    dcg AS (SELECT a.method, a.query_id,
                   SUM(COALESCE(g.rel, 0) * ({_NDCG_W_CASE}))::BIGINT AS dcg_u6
            FROM approx a LEFT JOIN gains g
              ON g.query_id = a.query_id AND g.neighbor_id = a.neighbor_id
            GROUP BY a.method, a.query_id)
    SELECT d.method, d.query_id, d.dcg_u6, i.idcg_u6,
           ((d.dcg_u6 * 1000000) // i.idcg_u6)::BIGINT AS ndcg_u6
    FROM dcg d JOIN idcg i USING (query_id)
    """


@query("retrieval_ndcg_at_k", _ndcg_oracle())
def q_retrieval_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(method, query) nDCG@{ANN_K} of the LSH/IVF/IVF-nprobe ANN
    paths against graded relevance derived from the exact brute-force
    ranking — the order-aware companion to ann_recall_at_k (recall
    can't see misordering; nDCG discounts every hit by its returned
    position). Exact-integer: relevance grades and the 1/log2(r+1)
    position discounts are shared literal micro-constants, ndcg_u6 =
    (dcg·10⁶) div idcg. The ~100-row exact answer materializes once
    and feeds both the gain join and the per-query IDCG."""
    brute = q_ann_bruteforce_topk(spark, sf_dir).select("query_id", "neighbor_id", "rank")
    try:
        brute = brute.localCheckpoint(eager=False)
    except Exception:
        brute = brute.cache()
    rel_case = _NDCG_REL_CASE.replace("brank", "rank").replace("WHEN", "when")
    gains = brute.select(
        "query_id",
        "neighbor_id",
        F.col("rank").alias("brank"),
        F.expr(f"cast(({rel_case}) as bigint)").alias("rel"),
    )
    idcg = gains.groupBy("query_id").agg(
        F.expr(
            f"cast(sum(rel * ({_NDCG_W_CASE.replace('arank', 'brank')})) as bigint)"
        ).alias("idcg_u6")
    )
    approx = (
        q_ann_lsh_topk(spark, sf_dir)
        .select(F.lit("lsh").alias("method"), "query_id", "neighbor_id",
                F.col("rank").alias("arank"))
        .unionByName(
            q_ann_ivf_topk(spark, sf_dir).select(
                F.lit("ivf").alias("method"), "query_id", "neighbor_id",
                F.col("rank").alias("arank"))
        )
        .unionByName(
            q_ann_ivf_nprobe_topk(spark, sf_dir).select(
                F.lit("ivf2").alias("method"), "query_id", "neighbor_id",
                F.col("rank").alias("arank"))
        )
    )
    dcg = (
        approx.join(
            gains.select("query_id", "neighbor_id", "rel"),
            ["query_id", "neighbor_id"],
            "left",
        )
        .groupBy("method", "query_id")
        .agg(
            F.expr(
                f"cast(sum(coalesce(rel, 0) * ({_NDCG_W_CASE})) as bigint)"
            ).alias("dcg_u6")
        )
    )
    return dcg.join(idcg, "query_id").select(
        "method",
        "query_id",
        "dcg_u6",
        "idcg_u6",
        F.expr("cast((dcg_u6 * 1000000) div idcg_u6 as bigint)").alias("ndcg_u6"),
    )


# ---------------------------------------------------------------------------
# Prefix-filtered Jaccard join — the set-similarity SCALE technique
# (AllPairs/PPJoin principle): same exact answer as
# ngram_jaccard_pairs, but candidates generate from each document's
# p = n − ⌈τ·n⌉ + 1 globally-RAREST shingles instead of the full
# inverted index, so boilerplate shingles (the O(m²) reducer killers
# the df-cap lever mitigates lossily) drop out of candidate
# generation entirely — with ZERO recall loss. The oracle is the
# exhaustive all-pairs SQL VERBATIM: a hash match certifies
# losslessness cryptographically.
# ---------------------------------------------------------------------------


@query(
    "jaccard_prefix_filtered",
    f"""
    WITH sh AS (SELECT doc_id,
                       list_transform({_sql_shingles()},
                                      s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)) AS sh
                FROM documents),
    inv AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM sh),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb,
                     COUNT(*) AS n_inter
              FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id, a.n, b.n)
    SELECT doc_a, doc_b,
           ROUND(n_inter / CAST(na + nb - n_inter AS DOUBLE), 6) AS jaccard
    FROM inter
    WHERE ROUND(n_inter / CAST(na + nb - n_inter AS DOUBLE), 6) >= {JACCARD_THRESHOLD}
    """,
)
def q_jaccard_prefix_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard ≥ {JACCARD_THRESHOLD} pairs computed via PREFIX
    FILTERING (operators/dedup.py::jaccard_prefix_filter_pairs — see
    its docstring for the losslessness proof and the hot-shingle
    argument). The oracle is ngram_jaccard_pairs' exhaustive
    all-pairs SQL verbatim, so the hash match proves the pruned
    candidate generator loses nothing. Verification is
    candidate-bounded: candidates join one side's postings then
    equi-join the other on (doc, shingle) — never the full
    shared-shingle pair expansion."""
    from .operators.dedup import jaccard_prefix_filter_pairs

    docs = load_table(spark, sf_dir, "documents")
    return jaccard_prefix_filter_pairs(docs, 3, 10)


# ---------------------------------------------------------------------------
# Blocked fuzzy name matching — the record-linkage / catalog-dedup
# primitive the text-dedup family lacks: shingle Jaccard needs
# documents, SimHash needs long token streams; SHORT names (product
# titles, clinic names, merchant strings) dedupe by edit distance.
# Two-phase at scale: exact-dedup the name column FIRST (fuzzy work ∝
# distinct names, never rows), block candidates on a shared word,
# verify with exact Levenshtein — never the quadratic all-pairs
# distance join.
# ---------------------------------------------------------------------------
FUZZY_MAX_DIST = 3


@query(
    "part_name_fuzzy_matches",
    f"""
    WITH d AS (SELECT p_name, COUNT(*)::BIGINT AS n_parts
               FROM part GROUP BY p_name),
    t AS (SELECT p_name AS n, unnest(string_split(p_name, ' ')) AS k FROM d),
    tt AS (SELECT n, k FROM t WHERE k <> ''),
    c AS (SELECT DISTINCT a.n AS name_a, b.n AS name_b
          FROM tt a JOIN tt b ON a.k = b.k AND a.n < b.n),
    v AS (SELECT name_a, name_b, levenshtein(name_a, name_b)::BIGINT AS dist
          FROM c)
    SELECT v.name_a, v.name_b, v.dist,
           da.n_parts AS n_parts_a, db.n_parts AS n_parts_b
    FROM v JOIN d da ON da.p_name = v.name_a
           JOIN d db ON db.p_name = v.name_b
    WHERE v.dist <= {FUZZY_MAX_DIST}
    """,
)
def q_part_name_fuzzy_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-dedup candidates: part-name pairs sharing ≥1 word with
    Levenshtein ≤ {FUZZY_MAX_DIST} (operators/joins.py::
    blocked_fuzzy_self_join — see its docstring for the blocking
    contract and hot-block lever), annotated with how many catalog
    rows carry each name. The name table exact-dedups FIRST, so the
    fuzzy phase runs over |distinct names| (64 at every fixture SF
    while the part table grows 100×) — the property that makes edit
    distance affordable at 100 TB. Exact-integer distances;
    cross-engine levenshtein verified by the hash match."""
    from .operators.joins import blocked_fuzzy_self_join

    part = load_table(spark, sf_dir, "part")
    d = part.groupBy("p_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts")
    )
    m = blocked_fuzzy_self_join(d, "p_name", FUZZY_MAX_DIST)
    da = d.select(F.col("p_name").alias("name_a"), F.col("n_parts").alias("n_parts_a"))
    db = d.select(F.col("p_name").alias("name_b"), F.col("n_parts").alias("n_parts_b"))
    return (
        m.join(F.broadcast(da), "name_a")
        .join(F.broadcast(db), "name_b")
        .select("name_a", "name_b", "dist", "n_parts_a", "n_parts_b")
    )


# ---------------------------------------------------------------------------
# Hard-negative mining — the TRAINING-DATA side of the ANN family:
# retrieval/embedding models train on (anchor, positive, negative)
# triplets where the negatives are HARD — high-similarity wrong-label
# neighbors straight from the top-k pool (random negatives are too
# easy and teach nothing). One exact top-k pass over the anchor set
# feeds both roles: positive = best same-label neighbor, negatives =
# top different-label neighbors.
# ---------------------------------------------------------------------------
CONTRASTIVE_POOL = 10  # neighbor pool per anchor (2× ANN_K)
CONTRASTIVE_NEG = 3    # hard negatives kept per anchor


@query(
    "contrastive_training_pairs",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {ANN_QUERY_LIMIT}),
    p AS (SELECT q.query_id, e.vec_id AS neighbor_id, ROUND({_COS_SQL}, 9) AS cosine
          FROM q JOIN e ON e.vec_id <> q.query_id),
    r AS (SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id) AS rank
          FROM p),
    c AS (SELECT r.query_id, r.neighbor_id, r.rank,
                 ea.label AS alabel, en.label AS nlabel
          FROM r JOIN embeddings ea ON ea.vec_id = r.query_id
                 JOIN embeddings en ON en.vec_id = r.neighbor_id
          WHERE r.rank <= {CONTRASTIVE_POOL}),
    pos AS (SELECT query_id, neighbor_id AS pos_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rank) AS pr
            FROM c WHERE alabel = nlabel),
    p1 AS (SELECT query_id, pos_id FROM pos WHERE pr = 1),
    neg AS (SELECT query_id, neighbor_id AS neg_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rank)
                     AS neg_rank
            FROM c WHERE alabel <> nlabel)
    SELECT n.query_id AS anchor_id, p1.pos_id, n.neg_id,
           n.neg_rank::BIGINT AS neg_rank
    FROM neg n JOIN p1 USING (query_id)
    WHERE n.neg_rank <= {CONTRASTIVE_NEG}
    """,
)
def q_contrastive_training_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(anchor, positive, hard-negative) triplets for contrastive
    embedding training: one exact top-{CONTRASTIVE_POOL} pass per
    anchor (the verified brute_force_topk path — broadcast query set,
    9dp pre-rank rounding) feeds both roles — positive = best
    SAME-label neighbor, negatives = top-{CONTRASTIVE_NEG}
    DIFFERENT-label neighbors (hard by construction: they sit at the
    top of the similarity ranking, exactly where the model is wrong).
    Anchors with no same-label neighbor in the pool drop via the
    inner join. Ranks come from the already-hash-verified scoring
    path, so the triplet table is exact-integer; at 100 TB the top-k
    pass swaps to the IVF/LSH retrieval the ANN family provides —
    the mining joins are pool-sized either way."""
    emb = load_table(spark, sf_dir, "embeddings")
    from pyspark.sql import Window

    cand = brute_force_topk(
        emb, emb.filter(F.col("vec_id") < ANN_QUERY_LIMIT), CONTRASTIVE_POOL
    )
    lab = emb.select("vec_id", "label")
    c = (
        cand.join(
            F.broadcast(lab.select(F.col("vec_id").alias("query_id"),
                                   F.col("label").alias("alabel"))),
            "query_id",
        )
        .join(
            lab.select(F.col("vec_id").alias("neighbor_id"),
                       F.col("label").alias("nlabel")),
            "neighbor_id",
        )
        .select("query_id", "neighbor_id", "rank", "alabel", "nlabel")
    )
    wq = Window.partitionBy("query_id").orderBy("rank")
    p1 = (
        c.filter(F.col("alabel") == F.col("nlabel"))
        .withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") == 1)
        .select("query_id", F.col("neighbor_id").alias("pos_id"))
    )
    neg = (
        c.filter(F.col("alabel") != F.col("nlabel"))
        .withColumn("neg_rank", F.row_number().over(wq))
        .filter(F.col("neg_rank") <= CONTRASTIVE_NEG)
        .select("query_id", F.col("neighbor_id").alias("neg_id"), "neg_rank")
    )
    return neg.join(p1, "query_id").select(
        F.col("query_id").alias("anchor_id"),
        "pos_id",
        "neg_id",
        F.col("neg_rank").cast("bigint").alias("neg_rank"),
    )


# ---------------------------------------------------------------------------
# Epoch shuffle plan — reproducible per-epoch global shuffling, the
# training-loader op rand() cannot give you: a retried task, a
# re-run, or a different partitioning must produce the SAME epoch
# order (else runs aren't comparable and resume-from-step is
# impossible). Position derives from the row's own key: per epoch,
# shard = md5(epoch‖doc) % S (map-only), order within shard = the
# hash itself — so there is never a GLOBAL sort, shards shuffle
# independently (the 100 TB posture: one writer per shard), and a
# different epoch salt is a statistically fresh permutation.
# ---------------------------------------------------------------------------
SHUFFLE_EPOCHS = 3
SHUFFLE_SHARDS = 8


@query(
    "epoch_shuffle_plan",
    f"""
    WITH d AS (SELECT doc_id FROM documents),
    ed AS (SELECT e.epoch, d.doc_id,
                  CAST('0x' || substr(md5('ep' || e.epoch::VARCHAR || ':'
                                           || d.doc_id::VARCHAR), 1, 8)
                       AS BIGINT) AS h
           FROM d CROSS JOIN (SELECT unnest(range({SHUFFLE_EPOCHS})) AS epoch) e),
    s AS (SELECT epoch::BIGINT AS epoch, doc_id, (h % {SHUFFLE_SHARDS}) AS shard, h
          FROM ed)
    SELECT epoch, doc_id, shard::BIGINT AS shard,
           ROW_NUMBER() OVER (PARTITION BY epoch, shard
                              ORDER BY h, doc_id)::BIGINT AS pos
    FROM s
    """,
)
def q_epoch_shuffle_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch (shard, position) for every document over
    {SHUFFLE_EPOCHS} epochs and {SHUFFLE_SHARDS} shards — the
    deterministic training-shuffle plan: shard assignment is a
    map-only hash of (epoch salt ‖ doc_id), within-shard order is the
    hash itself via a PARTITIONED window (never a global sort — each
    shard orders independently, which is exactly how S parallel
    shard writers consume it), and every epoch is a fresh
    permutation that reproduces bit-identically on retry or
    re-partitioning (the hash_sample/md5 discipline; rand() breaks
    all of this). Exact-integer throughout."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    ed = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(SHUFFLE_EPOCHS - 1))).alias("epoch"),
    ).select(
        F.col("epoch").cast("bigint").alias("epoch"),
        "doc_id",
        F.expr(
            "cast(conv(substr(md5(concat('ep', cast(epoch as string), ':', "
            "cast(doc_id as string))), 1, 8), 16, 10) as bigint)"
        ).alias("h"),
    )
    w = Window.partitionBy("epoch", "shard").orderBy("h", "doc_id")
    return (
        ed.withColumn("shard", (F.col("h") % SHUFFLE_SHARDS).cast("bigint"))
        .select(
            "epoch",
            "doc_id",
            "shard",
            F.row_number().over(w).cast("bigint").alias("pos"),
        )
    )


# ---------------------------------------------------------------------------
# Feature Information Value — the screening step BEFORE fitting the
# quality model (doc_quality_logit / _trained_model fit weights; IV
# ranks which features deserve weights at all): quintile-bucket each
# candidate feature, weight-of-evidence per bucket
# WOE = ln(pct_good / pct_bad), IV = Σ (pct_good − pct_bad) · WOE.
# Add-one smoothing makes every WOE an ln of one exact-int64 ratio
# (the PMI trick); the per-feature IV folds the ≤5 bucket
# contributions bucket-sorted. ntile ordering is fully tie-broken by
# doc_id, so buckets are engine-identical.
# ---------------------------------------------------------------------------
IV_BUCKETS = 5


def _iv_oracle() -> str:
    q = IV_BUCKETS
    return f"""
    WITH f0 AS (
      SELECT doc_id,
             len(string_split(lower(text), ' ')) AS n_tokens,
             (length(text) - (len(string_split(lower(text), ' ')) - 1))
               / CAST(len(string_split(lower(text), ' ')) AS DOUBLE)
               AS mean_word_len,
             length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
               / CAST(length(text) AS DOUBLE) AS punct_ratio,
             (CASE WHEN {{score}} >= 0.7 THEN 1 ELSE 0 END) AS good
      FROM documents),
    u AS (SELECT doc_id, good, 'n_tokens' AS feature,
                 CAST(n_tokens AS DOUBLE) AS val FROM f0
          UNION ALL
          SELECT doc_id, good, 'mean_word_len', mean_word_len FROM f0
          UNION ALL
          SELECT doc_id, good, 'punct_ratio', punct_ratio FROM f0),
    b AS (SELECT feature, good,
                 NTILE({q}) OVER (PARTITION BY feature
                                  ORDER BY val, doc_id) AS bucket
          FROM u),
    g AS (SELECT feature, bucket,
                 SUM(good)::BIGINT AS n_good,
                 (COUNT(*) - SUM(good))::BIGINT AS n_bad
          FROM b GROUP BY feature, bucket),
    t AS (SELECT feature, SUM(n_good)::BIGINT AS gt, SUM(n_bad)::BIGINT AS bt
          FROM g GROUP BY feature),
    w AS (SELECT g.feature, g.bucket, g.n_good, g.n_bad,
                 ln(CAST((g.n_good + 1) * (t.bt + {q}) AS DOUBLE)
                    / CAST((g.n_bad + 1) * (t.gt + {q}) AS DOUBLE)) AS woe,
                 (CAST(g.n_good + 1 AS DOUBLE) / (t.gt + {q})
                  - CAST(g.n_bad + 1 AS DOUBLE) / (t.bt + {q}))
                 * ln(CAST((g.n_good + 1) * (t.bt + {q}) AS DOUBLE)
                      / CAST((g.n_bad + 1) * (t.gt + {q}) AS DOUBLE)) AS contrib
          FROM g JOIN t USING (feature)),
    iv AS (SELECT feature,
                  CAST(FLOOR(list_sum(list(contrib ORDER BY bucket))
                             * 1000000.0) AS BIGINT) AS iv_u6
           FROM w GROUP BY feature)
    SELECT w.feature, w.bucket::BIGINT AS bucket, w.n_good, w.n_bad,
           CAST(FLOOR(w.woe * 1000000.0) AS BIGINT) AS woe_u6, iv.iv_u6
    FROM w JOIN iv USING (feature)
    """


def _iv_score_sql() -> str:
    """The doc_quality score expression inline (DuckDB twin of
    operators/textanalysis.py::quality_score) — shared shape with the
    doc_quality oracle."""
    toks = "string_split(lower(text), ' ')"
    sw = "[" + ", ".join(f"'{w}'" for w in sorted(STOPWORDS_ALL)) + "]"
    stop = f"len(list_filter({toks}, x -> list_contains({sw}, x)))"
    mwl = f"(length(text) - (len({toks}) - 1)) / CAST(len({toks}) AS DOUBLE)"
    punct = (
        "length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))"
        " / CAST(length(text) AS DOUBLE)"
    )
    return (
        f"ROUND(LEAST({stop} / CAST(len({toks}) AS DOUBLE) * 4.0, 1.0) * 0.4"
        f" + (CASE WHEN {mwl} >= 3 AND {mwl} <= 10 THEN 1.0 ELSE 0.0 END) * 0.3"
        f" + (1.0 - LEAST({punct} * 5.0, 1.0)) * 0.3, 4)"
    )


@query("quality_feature_iv", _iv_oracle().replace("{score}", _iv_score_sql()))
def q_quality_feature_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information Value screening of 3 candidate quality features
    against an above-median-quality target (quality_score ≥ 0.7 —
    the fixture median, so the split is balanced at every SF):
    quintile buckets
    (ntile fully tie-broken by doc_id — engine-identical), per-bucket
    WOE_u6 = ⌊10⁶·ln(pct_good/pct_bad)⌋ with add-one smoothing (each
    WOE is ln of ONE exact-int64 ratio), per-feature IV folded
    bucket-sorted. The step before fitting: IV ranks which features
    deserve model weights (rule of thumb: <0.02 useless, >0.3
    strong). One corpus scan feeds the unpivot; everything after is
    (features×buckets)-sized."""
    from pyspark.sql import Window

    from .operators.textanalysis import quality_features, quality_score

    q = IV_BUCKETS
    docs = load_table(spark, sf_dir, "documents")
    f = quality_features("text")
    f0 = docs.select(
        "doc_id",
        f["n_tokens"].cast("double").alias("n_tokens"),
        f["mean_word_len"].alias("mean_word_len"),
        f["punct_ratio"].alias("punct_ratio"),
        (quality_score("text") >= 0.7).cast("int").alias("good"),
    )
    u = None
    for feat in ("n_tokens", "mean_word_len", "punct_ratio"):
        part = f0.select(
            "doc_id", "good", F.lit(feat).alias("feature"),
            F.col(feat).alias("val"),
        )
        u = part if u is None else u.unionByName(part)
    w_nt = Window.partitionBy("feature").orderBy("val", "doc_id")
    b = u.select("feature", "good", F.ntile(q).over(w_nt).alias("bucket"))
    g = b.groupBy("feature", "bucket").agg(
        F.sum("good").cast("bigint").alias("n_good"),
        (F.count(F.lit(1)) - F.sum("good")).cast("bigint").alias("n_bad"),
    )
    t = g.groupBy("feature").agg(
        F.sum("n_good").cast("bigint").alias("gt"),
        F.sum("n_bad").cast("bigint").alias("bt"),
    )
    ln_ratio = (
        f"ln(cast((n_good + 1) * (bt + {q}) as double)"
        f" / cast((n_bad + 1) * (gt + {q}) as double))"
    )
    w = g.join(t, "feature").select(
        "feature", "bucket", "n_good", "n_bad",
        F.expr(ln_ratio).alias("woe"),
        F.expr(
            f"(cast(n_good + 1 as double) / (gt + {q})"
            f" - cast(n_bad + 1 as double) / (bt + {q})) * ({ln_ratio})"
        ).alias("contrib"),
    )
    iv = w.groupBy("feature").agg(
        F.expr(
            "cast(floor(aggregate(transform(array_sort("
            "collect_list(struct(bucket, contrib))), p -> p.contrib),"
            " 0D, (acc, x) -> acc + x) * 1000000.0) as bigint)"
        ).alias("iv_u6")
    )
    return w.join(iv, "feature").select(
        "feature",
        F.col("bucket").cast("bigint").alias("bucket"),
        "n_good",
        "n_bad",
        F.floor(F.col("woe") * 1000000.0).cast("bigint").alias("woe_u6"),
        "iv_u6",
    )


# ---------------------------------------------------------------------------
# DSIR at ingest — the frozen-index inference shape: the target/raw
# bucket-count tables are PERSISTED parquet indexes (additive, the
# BM25-term-index maintenance law) and each new crawl batch scores
# with one explode + one equi-join on bucket; the reference corpora
# are never rescanned. The batch can contain bigrams no reference
# ever saw — both count joins go LEFT with +1 smoothing.
# ---------------------------------------------------------------------------
DSIR_NEW_PCT = 10  # doc_id hash bucket (salt 'dsirnb') < 10 → the new batch


def _dsir_new_batch_oracle() -> str:
    from .operators.sampling import sql_hash_bucket
    from .operators.textanalysis import DSIR_BUCKETS

    b = DSIR_BUCKETS
    toks = "list_filter(string_split(lower(text), ' '), x -> x <> '')"
    bg = (
        "unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1), "
        "i -> t[i] || ' ' || t[i+1]))"
    )
    bucket = f"(CAST('0x' || substr(md5('dsir' || bg), 1, 8) AS BIGINT) % {b})"
    is_new = f"{sql_hash_bucket('doc_id', salt='dsirnb')} < {DSIR_NEW_PCT}"
    return f"""
    WITH corpus AS (SELECT doc_id, text, n_chars FROM documents
                    WHERE NOT ({is_new})),
    batch AS (SELECT doc_id, text FROM documents WHERE {is_new}),
    tg0 AS (SELECT {toks} AS t FROM corpus
            WHERE n_chars >= {DSIR_TGT_MIN_CHARS}),
    tg AS (SELECT {bg} AS bg FROM tg0),
    ct AS (SELECT {bucket} AS bucket, COUNT(*)::BIGINT AS c_t
           FROM tg GROUP BY 1),
    cr0 AS (SELECT {toks} AS t FROM corpus),
    crb AS (SELECT {bg} AS bg FROM cr0),
    cr AS (SELECT {bucket} AS bucket, COUNT(*)::BIGINT AS c_r
           FROM crb GROUP BY 1),
    bt0 AS (SELECT doc_id, {toks} AS t FROM batch),
    bt AS (SELECT doc_id, {bg} AS bg FROM bt0),
    tf AS (SELECT doc_id, {bucket} AS bucket, COUNT(*)::BIGINT AS tf_l
           FROM bt GROUP BY 1, 2),
    tot AS (SELECT (SELECT COALESCE(SUM(c_t), 0) FROM ct)::BIGINT AS n_t,
                   (SELECT COALESCE(SUM(c_r), 0) FROM cr)::BIGINT AS n_r),
    c AS (SELECT tf.doc_id, tf.bucket, tf.tf_l,
                 CAST(tf.tf_l AS DOUBLE) * ln(
                   CAST((COALESCE(ct.c_t, 0) + 1) * (tot.n_r + {b}) AS DOUBLE)
                   / CAST((COALESCE(cr.c_r, 0) + 1) * (tot.n_t + {b}) AS DOUBLE))
                   AS w
          FROM tf LEFT JOIN cr USING (bucket) LEFT JOIN ct USING (bucket)
          CROSS JOIN tot),
    s AS (SELECT doc_id, SUM(tf_l)::BIGINT AS n_bigrams,
                 list_sum(list(w ORDER BY bucket)) AS logw
          FROM c GROUP BY doc_id)
    SELECT d.doc_id, COALESCE(s.n_bigrams, 0)::BIGINT AS n_bigrams,
           CASE WHEN s.n_bigrams > 0
                THEN CAST(FLOOR(s.logw * 1000000.0) AS BIGINT) END AS logw_u6,
           (CASE WHEN s.n_bigrams > 0
                      AND CAST(FLOOR(s.logw * 1000000.0) AS BIGINT) >= 0
                 THEN 1 ELSE 0 END)::BIGINT AS keep
    FROM batch d LEFT JOIN s USING (doc_id)
    """


@query("dsir_new_batch", _dsir_new_batch_oracle())
def q_dsir_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights for a NEW crawl batch (doc_id hash
    bucket < {DSIR_NEW_PCT}, salt 'dsirnb') scored against PERSISTED
    target/raw bucket-count indexes built from the corpus slice and
    written to parquet — the inference shape: the batch explodes
    once and scores via one equi-join on bucket; the corpus is never
    re-exploded in the scoring path (plan-pinned). Indexes are
    additive (dsir_bucket_counts), so ingest maintenance is the BM25
    term-index law: gram the batch, sum-merge. Oracle recomputes
    distributions + scores from scratch, so the hash match proves
    frozen-index scoring == the from-scratch definition."""
    import os

    from .operators.sampling import hash_bucket
    from .operators.textanalysis import (
        dsir_bucket_counts,
        dsir_score_against_counts,
    )
    from .sources.sinks import write_parquet

    docs = load_table(spark, sf_dir, "documents")
    is_new = hash_bucket("doc_id", salt="dsirnb") < DSIR_NEW_PCT
    corpus, batch = docs.filter(~is_new), docs.filter(is_new)

    idx_dir = _run_scoped_index_dir("dsir")
    tgt_path = os.path.join(idx_dir, "dsir_target_counts")
    raw_path = os.path.join(idx_dir, "dsir_raw_counts")
    write_parquet(
        dsir_bucket_counts(
            corpus.filter(F.col("n_chars") >= DSIR_TGT_MIN_CHARS), out_col="c_t"
        ),
        tgt_path,
    )
    write_parquet(dsir_bucket_counts(corpus, out_col="c_r"), raw_path)
    tgt = spark.read.parquet(tgt_path)
    raw = spark.read.parquet(raw_path)

    s = dsir_score_against_counts(batch, tgt, raw)
    logw_u6 = F.floor(F.col("logw") * F.lit(1000000.0)).cast("bigint")
    scored = s.select(
        "doc_id",
        "n_bigrams",
        F.when(F.col("n_bigrams") > 0, logw_u6).alias("logw_u6"),
    )
    return (
        batch.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias("n_bigrams"),
            "logw_u6",
            F.when(
                F.col("n_bigrams").isNotNull()
                & (F.col("n_bigrams") > 0)
                & (F.col("logw_u6") >= 0),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR forget — the newest standing index gets the same
# right-to-be-forgotten inverse as every sibling (CMS grid, BM25
# terms, vocabulary, quantile histogram): bucket counts are additive,
# so deletion is exact subtraction of the deleted docs' gram counts —
# cost ∝ deleted docs, never the corpus; zeroed buckets drop so the
# maintained index is row-identical to a rebuild from kept docs.
# ---------------------------------------------------------------------------
DSIR_FORGET_PCT = 5  # corpus docs with hash bucket (salt 'dsirfg') < 5 deleted


def _dsir_forget_oracle() -> str:
    from .operators.sampling import sql_hash_bucket
    from .operators.textanalysis import DSIR_BUCKETS

    b = DSIR_BUCKETS
    toks = "list_filter(string_split(lower(text), ' '), x -> x <> '')"
    bg = (
        "unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1), "
        "i -> t[i] || ' ' || t[i+1]))"
    )
    bucket = f"(CAST('0x' || substr(md5('dsir' || bg), 1, 8) AS BIGINT) % {b})"
    is_new = f"{sql_hash_bucket('doc_id', salt='dsirnb')} < {DSIR_NEW_PCT}"
    is_del = f"{sql_hash_bucket('doc_id', salt='dsirfg')} < {DSIR_FORGET_PCT}"
    return f"""
    WITH kept AS (SELECT doc_id, text FROM documents
                  WHERE NOT ({is_new}) AND NOT ({is_del})),
    k0 AS (SELECT {toks} AS t FROM kept),
    kb AS (SELECT {bg} AS bg FROM k0)
    SELECT {bucket} AS bucket, COUNT(*)::BIGINT AS c_r FROM kb GROUP BY 1
    """


@query("dsir_forget", _dsir_forget_oracle())
def q_dsir_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten on the persisted DSIR raw-count index:
    the corpus index (written to parquet, read back) minus the
    deleted slice's own gram counts — one explode over the DELETED
    docs only plus a left join over index rows; zero-count buckets
    drop. The oracle rebuilds from kept docs from scratch, so the
    hash match proves maintained-minus == rebuilt (the additive-index
    forget law shared with CMS/BM25/vocabulary/histogram)."""
    import os

    from .operators.sampling import hash_bucket
    from .operators.textanalysis import dsir_bucket_counts
    from .sources.sinks import write_parquet

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(~(hash_bucket("doc_id", salt="dsirnb") < DSIR_NEW_PCT))
    deleted = corpus.filter(hash_bucket("doc_id", salt="dsirfg") < DSIR_FORGET_PCT)

    idx_path = os.path.join(_run_scoped_index_dir("dsirfg"), "dsir_raw_counts")
    write_parquet(dsir_bucket_counts(corpus, out_col="c_r"), idx_path)
    idx = spark.read.parquet(idx_path)

    dc = dsir_bucket_counts(deleted, out_col="c_d")
    return (
        idx.join(dc, "bucket", "left")
        .select(
            "bucket",
            (F.col("c_r") - F.coalesce(F.col("c_d"), F.lit(0)))
            .cast("bigint")
            .alias("c_r"),
        )
        .filter(F.col("c_r") > 0)
    )


# ---------------------------------------------------------------------------
# Link prediction — the MISSING-edge member of the graph family: PPR
# ranks nodes around a seed, association rules score observed pairs;
# link prediction scores pairs that SHARE neighbors but never
# co-occurred — "bought X also bought Y, but X and Y were never in
# one basket yet". Common-neighbor count is exact-integer;
# Adamic-Adar folds 1/ln(deg) center-sorted (float-sum discipline).
# ---------------------------------------------------------------------------
LINKPRED_TOP = 25


_LINKPRED_ORACLE = f"""
    WITH op AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    e AS MATERIALIZED (
      SELECT u, v FROM (
        SELECT a.pk AS u, b.pk AS v, COUNT(*) AS c
        FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY 1, 2)
      WHERE c >= {TRI_MIN_SUPPORT}),
    sym AS (SELECT u AS z, v AS n FROM e UNION ALL SELECT v AS z, u AS n FROM e),
    deg AS (SELECT z, COUNT(*)::BIGINT AS d FROM sym GROUP BY z),
    adj AS (SELECT sym.z, sym.n, deg.d FROM sym JOIN deg USING (z)),
    w AS (SELECT a.n AS u, b.n AS v, a.z, a.d
          FROM adj a JOIN adj b ON a.z = b.z AND a.n < b.n),
    ow AS (SELECT w.u, w.v, w.z, w.d FROM w
           LEFT JOIN e ON e.u = w.u AND e.v = w.v
           WHERE e.u IS NULL),
    s AS (SELECT u, v, COUNT(*)::BIGINT AS cn,
                 list_sum(list(1.0 / ln(CAST(d AS DOUBLE)) ORDER BY z)) AS aa
          FROM ow GROUP BY u, v),
    r AS (SELECT u, v, cn,
                 CAST(FLOOR(aa * 1000000.0) AS BIGINT) AS aa_u6,
                 ROW_NUMBER() OVER (
                   ORDER BY cn DESC, CAST(FLOOR(aa * 1000000.0) AS BIGINT) DESC,
                            u, v) AS rk
          FROM s)
    SELECT u AS part_a, v AS part_b, cn, aa_u6, rk::BIGINT AS rk
    FROM r WHERE rk <= {LINKPRED_TOP}
    """


@query("copurchase_link_prediction", _LINKPRED_ORACLE)
def q_copurchase_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{LINKPRED_TOP} predicted missing edges of the
    support-pruned co-purchase graph by (common neighbors,
    Adamic-Adar) — operators/clusters.py::link_prediction_scores (see
    its docstring for the wedge-minus-edge candidate generation, the
    ln(deg) > 0 guarantee and the hub_cap lever; the fixture graph is
    support-pruned so no cap is needed here). aa_u6 floors the
    center-sorted fold; ranking ties break (cn, aa_u6, u, v) —
    fully deterministic, hash-matched."""
    from .operators.clusters import link_prediction_scores
    from .operators.reshape import top_k

    op = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    b = op.select(F.col("ok"), F.col("pk").alias("pb"))
    edges = (
        op.join(b, (op["ok"] == b["ok"]) & (op["pk"] < b["pb"]))
        .groupBy(F.col("pk").alias("u"), F.col("pb").alias("v"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= TRI_MIN_SUPPORT)
        .select("u", "v")
        .localCheckpoint()
    )
    s = link_prediction_scores(edges).select(
        "u", "v", "cn",
        F.floor(F.col("aa") * 1000000.0).cast("bigint").alias("aa_u6"),
    )
    ranked = top_k(
        s, [],
        [F.col("cn").desc(), F.col("aa_u6").desc(), F.col("u"), F.col("v")],
        LINKPRED_TOP, "rk",
    )
    return ranked.select(
        F.col("u").alias("part_a"), F.col("v").alias("part_b"),
        "cn", "aa_u6", F.col("rk").cast("bigint").alias("rk"),
    )


# ---------------------------------------------------------------------------
# k-core — the dense-subgraph graph member: triangles measure LOCAL
# density, the k-core is the maximal subgraph where EVERY member
# keeps ≥ k ties (the engagement/robustness cut: parts that stay
# strongly co-purchased even after fringe products peel away).
# Fixed peeling rounds keep it declarative and the oracle an
# unrolled CTE chain; convergence at fixture scale is pinned in
# pytest by an extra-round equality.
# ---------------------------------------------------------------------------
KCORE_K = 3
KCORE_ROUNDS = 4


def _kcore_oracle() -> str:
    rounds = []
    prev = "e0"
    for i in range(1, KCORE_ROUNDS + 1):
        rounds.append(
            f"""d{i} AS MATERIALIZED (
              SELECT node, COUNT(*)::BIGINT AS d FROM (
                SELECT u AS node FROM {prev}
                UNION ALL SELECT v AS node FROM {prev})
              GROUP BY node),
            k{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE d >= {KCORE_K}),
            e{i} AS MATERIALIZED (
              SELECT e.u, e.v FROM {prev} e
              JOIN k{i} a ON a.node = e.u
              JOIN k{i} b ON b.node = e.v)"""
        )
        prev = f"e{i}"
    return f"""
    WITH op AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    e0 AS MATERIALIZED (
      SELECT u, v FROM (
        SELECT a.pk AS u, b.pk AS v, COUNT(*) AS c
        FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY 1, 2)
      WHERE c >= {TRI_MIN_SUPPORT}),
    {", ".join(rounds)}
    SELECT node AS part_key, COUNT(*)::BIGINT AS degree FROM (
      SELECT u AS node FROM {prev} UNION ALL SELECT v AS node FROM {prev})
    GROUP BY node
    """


@query("copurchase_kcore", _kcore_oracle())
def q_copurchase_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KCORE_K}-core of the support-pruned co-purchase graph after
    {KCORE_ROUNDS} peeling rounds (operators/clusters.py::kcore_peel
    — see its docstring for the convergence and cluster-scale notes):
    parts that stay ≥{KCORE_K}-way co-purchased even after fringe
    products cascade away, with their in-core degree. Exact-integer;
    the oracle unrolls the peel as MATERIALIZED CTEs."""
    from .operators.clusters import kcore_peel

    op = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    b = op.select(F.col("ok"), F.col("pk").alias("pb"))
    edges = (
        op.join(b, (op["ok"] == b["ok"]) & (op["pk"] < b["pb"]))
        .groupBy(F.col("pk").alias("u"), F.col("pb").alias("v"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= TRI_MIN_SUPPORT)
        .select("u", "v")
    )
    return kcore_peel(edges, KCORE_K, KCORE_ROUNDS).select(
        F.col("node").alias("part_key"), "degree"
    )


# ---------------------------------------------------------------------------
# Forecast backtest — the baseline every demand-forecasting pipeline
# must beat, evaluated the honest way: walk-forward over history.
# Two baselines per nation (naive-1 = last month, seasonal-naive-12 =
# same month last year) scored by MAE and MAPE over the months where
# both actual and forecast exist. Exact integer cents end to end
# (abs-diff, div means, per-row integer MAPE terms) — hash-exact.
# ---------------------------------------------------------------------------


_FORECAST_ORACLE = """
    WITH months AS MATERIALIZED (
      SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS m FROM orders),
    rev AS MATERIALIZED (
      SELECT n.n_name AS nation, strftime(o.o_orderdate, '%Y-%m') AS m,
             SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))::BIGINT AS rev_c
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2),
    spine AS (SELECT n_name AS nation, m FROM nation CROSS JOIN months),
    s AS (SELECT sp.nation, sp.m, rev.rev_c,
                 LAG(rev.rev_c, 1) OVER (PARTITION BY sp.nation ORDER BY sp.m)
                   AS f1,
                 LAG(rev.rev_c, 12) OVER (PARTITION BY sp.nation ORDER BY sp.m)
                   AS f12
          FROM spine sp LEFT JOIN rev ON rev.nation = sp.nation
                                     AND rev.m = sp.m),
    u AS (SELECT nation, 'naive1' AS model, rev_c, f1 AS fc FROM s
          UNION ALL
          SELECT nation, 'snaive12', rev_c, f12 FROM s),
    e AS (SELECT nation, model,
                 abs(rev_c - fc)::BIGINT AS ae,
                 ((abs(rev_c - fc) * 1000000) // rev_c)::BIGINT AS pe_u6
          FROM u WHERE rev_c IS NOT NULL AND fc IS NOT NULL AND rev_c > 0)
    SELECT nation, model, COUNT(*)::BIGINT AS n_eval,
           (SUM(ae) // COUNT(*))::BIGINT AS mae_c,
           (SUM(pe_u6) // COUNT(*))::BIGINT AS mape_u6
    FROM e GROUP BY nation, model
    """


@query("monthly_forecast_backtest", _FORECAST_ORACLE)
def q_monthly_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward backtest of the two forecasting baselines over
    monthly nation revenue: naive-1 (last month's value) and
    seasonal-naive-12 (same month last year), scored by MAE (integer
    cents) and MAPE (micro-units, per-row integer terms) over months
    where both actual and forecast exist. Lags run over the FULL
    nation×month spine so a quiet month shifts the forecast origin
    honestly instead of silently skipping (the LOCF spine
    discipline). The report a pipeline reads before shipping any
    fancier model — if it can't beat snaive12, it doesn't ship."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(nat, cust["c_nationkey"] == nat["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            F.date_format("o_orderdate", "yyyy-MM").alias("m"),
            F.expr("cast(floor(o_totalprice * 100) as bigint)").alias("p_c"),
        )
        .groupBy("nation", "m")
        .agg(F.sum("p_c").cast("bigint").alias("rev_c"))
    )
    months = orders.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("m")
    ).distinct()
    spine = nat.select(F.col("n_name").alias("nation")).crossJoin(
        F.broadcast(months)
    )
    w = Window.partitionBy("nation").orderBy("m")
    s = (
        spine.join(rev, ["nation", "m"], "left")
        .select(
            "nation", "m", "rev_c",
            F.lag("rev_c", 1).over(w).alias("f1"),
            F.lag("rev_c", 12).over(w).alias("f12"),
        )
    )
    u = s.select(
        "nation", F.lit("naive1").alias("model"), "rev_c", F.col("f1").alias("fc")
    ).unionByName(
        s.select(
            "nation", F.lit("snaive12").alias("model"), "rev_c",
            F.col("f12").alias("fc"),
        )
    )
    e = u.filter(
        F.col("rev_c").isNotNull() & F.col("fc").isNotNull() & (F.col("rev_c") > 0)
    ).select(
        "nation", "model",
        F.expr("cast(abs(rev_c - fc) as bigint)").alias("ae"),
        F.expr("cast((abs(rev_c - fc) * 1000000) div rev_c as bigint)").alias("pe_u6"),
    )
    return e.groupBy("nation", "model").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        F.expr("cast(sum(ae) div count(1) as bigint)").alias("mae_c"),
        F.expr("cast(sum(pe_u6) div count(1) as bigint)").alias("mape_u6"),
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival — the censoring-aware statistical family
# nothing else in the registry covers: time from a customer's FIRST
# order to their first order containing a returned item, with
# administrative censoring at a 365-day follow-up window (~8% of
# customers censor at every fixture SF, so the estimator's whole
# point — censored rows leave the risk set without counting as
# events — is exercised, not vacuous). Weekly granularity bounds the
# step count (≤53). Survival stays in LOG space (the NLL/logit
# discipline — exp never runs): ln S(w) = Σ_{w'≤w} ln((n−d)/n),
# every term an ln of one exact-int64 ratio, the prefix folded
# week-sorted per output row (bounded T² with T ≤ 53).
# ---------------------------------------------------------------------------
KM_HORIZON_DAYS = 365
KM_CENSOR_WEEK = KM_HORIZON_DAYS // 7


_KM_ORACLE = f"""
    WITH ro AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS ok FROM lineitem WHERE l_returnflag = 'R'),
    o AS (SELECT o_custkey, o_orderdate, (ro.ok IS NOT NULL) AS has_r
          FROM orders LEFT JOIN ro ON ro.ok = orders.o_orderkey),
    c AS (SELECT o_custkey, MIN(o_orderdate) AS t0,
                 MIN(CASE WHEN has_r THEN o_orderdate END) AS ev
          FROM o GROUP BY o_custkey),
    dur AS (SELECT o_custkey,
                   CASE WHEN ev IS NOT NULL
                             AND datediff('day', t0, ev) <= {KM_HORIZON_DAYS}
                        THEN datediff('day', t0, ev) // 7
                        ELSE {KM_CENSOR_WEEK} END AS week,
                   CASE WHEN ev IS NOT NULL
                             AND datediff('day', t0, ev) <= {KM_HORIZON_DAYS}
                        THEN 1 ELSE 0 END AS evt
            FROM c),
    cw AS (SELECT week, COUNT(*)::BIGINT AS c_all,
                  SUM(evt)::BIGINT AS d
           FROM dur GROUP BY week),
    tot AS (SELECT SUM(c_all)::BIGINT AS n_total FROM cw),
    rk AS (SELECT cw.week, cw.d,
                  (tot.n_total
                   - COALESCE(SUM(cw.c_all) OVER (ORDER BY cw.week
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0))::BIGINT AS n
           FROM cw CROSS JOIN tot),
    t AS (SELECT week, n, d,
                 CASE WHEN n > d
                      THEN ln(CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE)) END
                   AS term
          FROM rk WHERE d > 0)
    SELECT a.week::BIGINT AS week, a.n AS n_risk, a.d AS n_events,
           CASE WHEN MAX(CASE WHEN b.term IS NULL THEN 1 ELSE 0 END) = 1
                THEN NULL
                ELSE CAST(FLOOR(list_sum(list(b.term ORDER BY b.week))
                                * 1000000.0) AS BIGINT) END AS ln_s_u6
    FROM t a JOIN t b ON b.week <= a.week
    GROUP BY a.week, a.n, a.d
    """


@query("customer_return_survival_km", _KM_ORACLE)
def q_customer_return_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier curve (log space) of weeks from first order to
    first returned-item order under a {KM_HORIZON_DAYS}-day follow-up
    — per event week: the risk-set size, the event count and
    ln S(w)·10⁶ (survival never exponentiates — thresholds compare in
    log space, the NLL discipline). Censored customers leave the
    risk set at week {KM_CENSOR_WEEK} without counting as events —
    the thing a plain ECDF gets wrong. Risk sets come from ONE
    integer cumulative window over the per-week counts; the ≤53-step
    prefix folds week-sorted per output row. At 100 TB the per-week
    count table is the only aggregate over raw data — everything
    after is ≤53 rows."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    ro = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("ok"))
        .distinct()
    )
    o = orders.join(ro, orders["o_orderkey"] == ro["ok"], "left").select(
        "o_custkey", "o_orderdate", F.col("ok").isNotNull().alias("has_r")
    )
    c = o.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("t0"),
        F.min(F.when(F.col("has_r"), F.col("o_orderdate"))).alias("ev"),
    )
    in_window = F.col("ev").isNotNull() & (
        F.datediff("ev", "t0") <= KM_HORIZON_DAYS
    )
    dur = c.select(
        F.when(in_window, F.expr("datediff(ev, t0) div 7"))
        .otherwise(F.lit(KM_CENSOR_WEEK))
        .alias("week"),
        F.when(in_window, F.lit(1)).otherwise(F.lit(0)).alias("evt"),
    )
    cw = dur.groupBy("week").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_all"),
        F.sum("evt").cast("bigint").alias("d"),
    )
    tot = cw.agg(F.sum("c_all").cast("bigint").alias("n_total"))
    wcum = Window.orderBy("week").rowsBetween(Window.unboundedPreceding, -1)
    rk = cw.crossJoin(F.broadcast(tot)).select(
        "week",
        "d",
        (
            F.col("n_total")
            - F.coalesce(F.sum("c_all").over(wcum), F.lit(0))
        )
        .cast("bigint")
        .alias("n"),
    )
    t = rk.filter(F.col("d") > 0).select(
        "week", "n", "d",
        F.when(
            F.col("n") > F.col("d"),
            F.expr("ln(cast(n - d as double) / cast(n as double))"),
        ).alias("term"),
    )
    a = t.select(F.col("week").alias("a_week"), F.col("n").alias("n_risk"),
                 F.col("d").alias("n_events"))
    b = t.select(F.col("week").alias("b_week"), F.col("term"))
    return (
        a.join(b, F.col("b_week") <= F.col("a_week"))
        .groupBy("a_week", "n_risk", "n_events")
        .agg(
            F.expr(
                "case when max(case when term is null then 1 else 0 end) = 1 "
                "then null else cast(floor(aggregate(transform(array_sort("
                "collect_list(struct(b_week, term))), p -> p.term), 0D, "
                "(acc, x) -> acc + x) * 1000000.0) as bigint) end"
            ).alias("ln_s_u6")
        )
        .select(
            F.col("a_week").cast("bigint").alias("week"),
            "n_risk", "n_events", "ln_s_u6",
        )
    )


# ---------------------------------------------------------------------------
# CUSUM change-point detection — the sequential-detection statistical
# family (Page 1954): the monitor a pipeline runs over a daily KPI to
# catch a persistent level shift long before a point-outlier rule
# fires. Exact-integer throughout via the prefix identity
#   S⁺_t = P_t − min(0, min_{j≤t} P_j),  P_t = Σ_{i≤t}(x_i − μ − k)
# (and symmetrically for the downward side), so the recurrence
# max(0, S_{t-1} + drift) becomes ONE running sum + ONE running min —
# plain integer window functions, no iterative fold at all.
# ---------------------------------------------------------------------------

_CUSUM_ORACLE = """
    WITH d AS MATERIALIZED (
      SELECT o_orderdate AS day,
             SUM(CAST(floor(o_totalprice * 100) AS BIGINT))::BIGINT AS rev_c
      FROM orders GROUP BY 1),
    g1 AS (SELECT (SUM(rev_c) // COUNT(*))::BIGINT AS mu_c FROM d),
    g AS (SELECT g1.mu_c,
                 (SUM(abs(d.rev_c - g1.mu_c)) // COUNT(*))::BIGINT AS mad_c
          FROM d CROSS JOIN g1 GROUP BY g1.mu_c),
    p AS (SELECT d.day, d.rev_c, g.mad_c,
                 SUM(d.rev_c - g.mu_c - g.mad_c // 2)
                   OVER (ORDER BY d.day)::BIGINT AS p_t,
                 SUM(g.mu_c - g.mad_c // 2 - d.rev_c)
                   OVER (ORDER BY d.day)::BIGINT AS q_t
          FROM d CROSS JOIN g),
    s AS (SELECT day, rev_c, mad_c,
                 (p_t - LEAST(0, MIN(p_t) OVER (ORDER BY day)))::BIGINT
                   AS s_pos_c,
                 (q_t - LEAST(0, MIN(q_t) OVER (ORDER BY day)))::BIGINT
                   AS s_neg_c
          FROM p)
    SELECT CAST(day AS VARCHAR) AS day, rev_c, s_pos_c, s_neg_c,
           (CASE WHEN s_pos_c > 5 * mad_c OR s_neg_c > 5 * mad_c
                 THEN 1 ELSE 0 END)::BIGINT AS alarm
    FROM s
    """


@query("daily_revenue_cusum", _CUSUM_ORACLE)
def q_daily_revenue_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM over daily order revenue (integer cents),
    parameterized by the series' OWN dispersion: reference level
    μ = mean daily revenue, allowance k = MAD/2 and alarm threshold
    h = 5·MAD where MAD = mean absolute deviation around μ (integer;
    MAD ≈ 0.8σ, so k ≈ 0.4σ / h ≈ 4σ — the textbook tuning). A
    persistent level shift beyond the allowance accumulates and
    alarms while noise-scale wander decays back to zero. The
    max(0, ·) recurrence is rewritten as running-sum − min(0,
    running-min) (Page's prefix identity), so the whole detector is
    integer window arithmetic. At 100 TB the day-aggregate is the
    only pass over raw data; the windows order ≤ #calendar-days rows
    (bounded, single partition by design — like the forecast
    spine)."""
    from pyspark.sql import Window

    d = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            F.expr("cast(sum(cast(floor(o_totalprice * 100) as bigint)) as bigint)")
            .alias("rev_c")
        )
    )
    g1 = d.agg(F.expr("cast(sum(rev_c) div count(1) as bigint)").alias("mu_c"))
    g = (
        d.crossJoin(F.broadcast(g1))
        .groupBy("mu_c")
        .agg(
            F.expr("cast(sum(abs(rev_c - mu_c)) div count(1) as bigint)")
            .alias("mad_c")
        )
    )
    wday = Window.orderBy("day")
    p = d.crossJoin(F.broadcast(g)).select(
        "day", "rev_c", "mad_c",
        F.sum(
            F.col("rev_c") - F.col("mu_c") - F.expr("mad_c div 2")
        ).over(wday).cast("bigint").alias("p_t"),
        F.sum(
            F.col("mu_c") - F.expr("mad_c div 2") - F.col("rev_c")
        ).over(wday).cast("bigint").alias("q_t"),
    )
    s = p.select(
        "day", "rev_c", "mad_c",
        (F.col("p_t") - F.least(F.lit(0), F.min("p_t").over(wday)))
        .cast("bigint").alias("s_pos_c"),
        (F.col("q_t") - F.least(F.lit(0), F.min("q_t").over(wday)))
        .cast("bigint").alias("s_neg_c"),
    )
    return s.select(
        F.col("day").cast("string").alias("day"),
        "rev_c", "s_pos_c", "s_neg_c",
        F.when(
            (F.col("s_pos_c") > 5 * F.col("mad_c"))
            | (F.col("s_neg_c") > 5 * F.col("mad_c")),
            F.lit(1),
        ).otherwise(F.lit(0)).cast("bigint").alias("alarm"),
    )


# ---------------------------------------------------------------------------
# Revenue concentration — the inequality-metrics statistical family:
# per-nation Gini coefficient and top-decile share of customer
# lifetime revenue. Exact integers end to end: the rank-sum Gini
# identity G = (2·Σi·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx) over ascending-sorted
# integer cents needs only one window rank + one aggregate, and the
# final micro-unit quotient is an INTEGRAL division in widened
# arithmetic (Spark decimal(38,0) `div` == DuckDB HUGEINT `//`), so
# the Σi·x term can exceed int64 without losing hash-exactness.
# ---------------------------------------------------------------------------

_GINI_ORACLE = """
    WITH x AS MATERIALIZED (
      SELECT n.n_name AS nation, c.c_custkey,
             COALESCE(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT)), 0)
               ::BIGINT AS rev_c
      FROM customer c
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    r AS (SELECT nation, rev_c,
                 ROW_NUMBER() OVER (PARTITION BY nation
                                    ORDER BY rev_c, c_custkey) AS i,
                 COUNT(*) OVER (PARTITION BY nation) AS n_w
          FROM x),
    a AS (SELECT nation, COUNT(*)::BIGINT AS n_cust,
                 SUM(CAST(rev_c AS HUGEINT)) AS s0,
                 SUM(CAST(i AS HUGEINT) * rev_c) AS s1,
                 SUM(CASE WHEN i > n_w - (n_w + 9) // 10
                          THEN CAST(rev_c AS HUGEINT) ELSE 0 END) AS top_sum
          FROM r GROUP BY nation)
    SELECT nation, n_cust, CAST(s0 AS BIGINT) AS total_rev_c,
           CAST(((2 * s1 - (n_cust + 1) * s0) * 1000000)
                // (n_cust * s0) AS BIGINT) AS gini_u6,
           CAST((top_sum * 1000000) // s0 AS BIGINT) AS top_decile_u6
    FROM a
    """


@query("nation_revenue_gini", _GINI_ORACLE)
def q_nation_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation revenue concentration: Gini coefficient (micro-
    units) and top-decile revenue share of customer lifetime revenue,
    customers with no orders included at zero (they ARE inequality).
    Rank-sum identity over ascending (rev, custkey) order — ties
    permute equal values, so Σi·x is order-invariant and hash-exact.
    Widened integral arithmetic (decimal(38,0) `div` / HUGEINT `//`)
    keeps Σi·x exact far past int64. At 100 TB: one customer-level
    aggregate (the only raw pass), one per-nation window rank over
    customers (shuffle by nation — salting lever documented for a
    skewed tenant column), one per-nation fold."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    x = (
        cust.join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy(F.col("n_name").alias("nation"), "c_custkey")
        .agg(
            F.expr(
                "cast(coalesce(sum(cast(floor(o_totalprice * 100) as bigint)), 0)"
                " as bigint)"
            ).alias("rev_c")
        )
    )
    wn = Window.partitionBy("nation")
    r = x.select(
        "nation", "rev_c",
        F.row_number().over(wn.orderBy("rev_c", "c_custkey")).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n_w"),
    )
    a = r.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cust"),
        F.expr("sum(cast(rev_c as decimal(38,0)))").alias("s0"),
        F.expr("sum(cast(i as decimal(38,0)) * rev_c)").alias("s1"),
        F.expr(
            "sum(case when i > n_w - (n_w + 9) div 10 "
            "then cast(rev_c as decimal(38,0)) else cast(0 as decimal(38,0)) end)"
        ).alias("top_sum"),
    )
    return a.select(
        "nation", "n_cust",
        F.expr("cast(s0 as bigint)").alias("total_rev_c"),
        F.expr(
            "cast((2 * s1 - (n_cust + 1) * s0) * 1000000 div (n_cust * s0) "
            "as bigint)"
        ).alias("gini_u6"),
        F.expr("cast(top_sum * 1000000 div s0 as bigint)").alias("top_decile_u6"),
    )


# ---------------------------------------------------------------------------
# Markov transition matrix — the SEQUENCE member of the behavioral
# family (funnels count one fixed path; sessions bound paths in time;
# this measures ALL observed next-step dynamics): per (from, to)
# event-type pair, the transition count and probability estimated from
# each user's time-ordered event stream. Exact integers end to end:
# the probability is an integral micro-unit division of two counts.
# ---------------------------------------------------------------------------

def _markov_oracle(events_filter: str = "") -> str:
    """The transition-matrix oracle, parameterized by an events
    predicate so the incremental/forget twins share the exact
    definition (their hash match then proves maintained == recomputed
    from the filtered stream)."""
    return f"""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts, event_id,
                      event_type
               FROM events{events_filter}),
    t AS (SELECT event_type AS from_type,
                 LEAD(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS to_type
          FROM e),
    c AS (SELECT from_type, to_type, COUNT(*)::BIGINT AS n_trans
          FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2)
    SELECT from_type, to_type, n_trans,
           CAST(n_trans * 1000000
                // SUM(n_trans) OVER (PARTITION BY from_type)
                AS BIGINT) AS p_u6
    FROM c
    """


_MARKOV_ORACLE = """
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts, event_id,
                      event_type
               FROM events),
    t AS (SELECT event_type AS from_type,
                 LEAD(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS to_type
          FROM e),
    c AS (SELECT from_type, to_type, COUNT(*)::BIGINT AS n_trans
          FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2)
    SELECT from_type, to_type, n_trans,
           CAST(n_trans * 1000000
                // SUM(n_trans) OVER (PARTITION BY from_type)
                AS BIGINT) AS p_u6
    FROM c
    """


@query("event_markov_transitions", _MARKOV_ORACLE)
def q_event_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: lead() within (user ORDER BY ts, event_id) pairs each
    event with its successor, one (from, to) aggregate counts them,
    and p_u6 = n·10⁶ div Σn over the from-row — integral division, so
    the row is hash-exact cross-engine. Tie-safe: event_id breaks
    equal timestamps, making the per-user order total. At 100 TB: one
    shuffle by user for the sequence window (the sessionization
    partitioning, reusable across both), then everything downstream is
    |event_types|²-sized."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    c = t.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trans")
    )
    return c.select(
        "from_type",
        "to_type",
        "n_trans",
        F.expr(
            "cast(n_trans * 1000000 div "
            "sum(n_trans) over (partition by from_type) as bigint)"
        ).alias("p_u6"),
    )


# ---------------------------------------------------------------------------
# RFM segmentation — the classic BI customer-scoring grid (recency /
# frequency / monetary quintiles), aggregated to the 125-cell segment
# table a dashboard consumes. NTILE is engine-identical once the sort
# is total (metric + custkey tie-break): both Spark and DuckDB give
# the first (n mod k) buckets the extra row.
# ---------------------------------------------------------------------------

_RFM_ORACLE = """
    WITH c AS (
      SELECT o_custkey, COUNT(*)::BIGINT AS f_orders,
             SUM(CAST(floor(o_totalprice * 100) AS BIGINT))::BIGINT AS m_c,
             MAX(CAST(o_orderdate AS DATE)) AS last_d
      FROM orders GROUP BY 1),
    g AS (SELECT MAX(last_d) AS gmax FROM c),
    s AS (SELECT o_custkey, f_orders, m_c,
                 date_diff('day', last_d, gmax) AS rec_days
          FROM c, g),
    t AS (SELECT *,
                 NTILE(5) OVER (ORDER BY rec_days DESC, o_custkey) AS r_score,
                 NTILE(5) OVER (ORDER BY f_orders, o_custkey) AS f_score,
                 NTILE(5) OVER (ORDER BY m_c, o_custkey) AS m_score
          FROM s)
    SELECT CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
             || CAST(m_score AS VARCHAR) AS segment,
           r_score::BIGINT AS r_score, f_score::BIGINT AS f_score,
           m_score::BIGINT AS m_score,
           COUNT(*)::BIGINT AS n_cust,
           SUM(m_c)::BIGINT AS monetary_c,
           SUM(f_orders)::BIGINT AS n_orders,
           MIN(rec_days)::BIGINT AS min_recency_days,
           MAX(rec_days)::BIGINT AS max_recency_days
    FROM t GROUP BY 1, 2, 3, 4
    """


@query("customer_rfm_segments", _RFM_ORACLE)
def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile segmentation: per buying customer, recency (days
    since last order, anchored at the corpus max date — a broadcast
    scalar), frequency (order count) and monetary (lifetime cents);
    NTILE(5) on each with a custkey tie-break so the bucketing is a
    total order both engines replay identically; grouped to the
    (r,f,m) segment grid. The three NTILE windows are global sorts
    over the CUSTOMER-LEVEL aggregate (not the fact table) — at
    100 TB swap them for approx-quantile boundary broadcasts
    (winsorized_prices precedent); the orders scan stays the only
    full pass."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    c = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("f_orders"),
        F.expr(
            "cast(sum(cast(floor(o_totalprice * 100) as bigint)) as bigint)"
        ).alias("m_c"),
        F.max(F.to_date("o_orderdate")).alias("last_d"),
    )
    # the customer aggregate feeds both the anchor-date scalar and the
    # scoring pass: materialize it once (|customers|-sized) so the
    # orders scan under it runs once
    c = c.localCheckpoint(eager=False)
    g = c.agg(F.max("last_d").alias("gmax"))
    s = c.crossJoin(F.broadcast(g)).select(
        "o_custkey", "f_orders", "m_c",
        F.datediff("gmax", "last_d").cast("bigint").alias("rec_days"),
    )
    t = s.select(
        "*",
        F.ntile(5).over(
            Window.orderBy(F.col("rec_days").desc(), "o_custkey")
        ).cast("bigint").alias("r_score"),
        F.ntile(5).over(Window.orderBy("f_orders", "o_custkey"))
        .cast("bigint").alias("f_score"),
        F.ntile(5).over(Window.orderBy("m_c", "o_custkey"))
        .cast("bigint").alias("m_score"),
    )
    return (
        t.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cust"),
            F.sum("m_c").cast("bigint").alias("monetary_c"),
            F.sum("f_orders").cast("bigint").alias("n_orders"),
            F.min("rec_days").cast("bigint").alias("min_recency_days"),
            F.max("rec_days").cast("bigint").alias("max_recency_days"),
        )
        .select(
            F.concat(
                F.col("r_score").cast("string"),
                F.col("f_score").cast("string"),
                F.col("m_score").cast("string"),
            ).alias("segment"),
            "r_score", "f_score", "m_score", "n_cust", "monetary_c",
            "n_orders", "min_recency_days", "max_recency_days",
        )
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit — the forensic member of the data-quality
# family (quality_profile counts nulls, referential_integrity_audit
# counts orphans; this tests whether a money column's leading-digit
# distribution is consistent with organic data). Expected shares are
# the nine fixed Benford constants floor(10⁶·log₁₀(1+1/d)) — literals
# in BOTH engines, so every output cell is an exact integer.
# ---------------------------------------------------------------------------

_BENFORD_EXP_U6 = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
    6: 66946, 7: 57991, 8: 51152, 9: 45757,
}

_BENFORD_CASE = (
    "CASE digit "
    + " ".join(f"WHEN {d} THEN {u}" for d, u in _BENFORD_EXP_U6.items())
    + " END"
)

_BENFORD_ORACLE = f"""
    WITH v AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
               FROM orders WHERE o_totalprice > 0),
    d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
                   AS digit
          FROM v),
    c AS (SELECT digit, COUNT(*)::BIGINT AS n_orders FROM d GROUP BY 1)
    SELECT digit, n_orders,
           CAST(n_orders * 1000000 // SUM(n_orders) OVER ()
                AS BIGINT) AS obs_u6,
           CAST({_BENFORD_CASE} AS BIGINT) AS exp_u6,
           CAST(abs(n_orders * 1000000 // SUM(n_orders) OVER ()
                    - {_BENFORD_CASE}) AS BIGINT) AS dev_u6
    FROM c
    """


@query("benford_price_audit", _BENFORD_ORACLE)
def q_benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading-digit distribution of order totals vs Benford's law:
    digit = first character of the integer cents, observed share in
    micro-units (integral division), expected share from the fixed
    constant table, deviation = |obs − exp|. One scan, one 9-row
    aggregate, one tiny window — nothing downstream of the scan grows
    with the data."""
    v = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.expr("cast(floor(o_totalprice * 100) as bigint)").alias("cents")
        )
    )
    c = (
        v.select(
            F.expr(
                "cast(substr(cast(cents as string), 1, 1) as bigint)"
            ).alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )
    return c.select(
        "digit",
        "n_orders",
        F.expr(
            "cast(n_orders * 1000000 div sum(n_orders) over () as bigint)"
        ).alias("obs_u6"),
        F.expr(f"cast({_BENFORD_CASE} as bigint)").alias("exp_u6"),
        F.expr(
            "cast(abs(n_orders * 1000000 div sum(n_orders) over () "
            f"- {_BENFORD_CASE}) as bigint)"
        ).alias("dev_u6"),
    )


# ---------------------------------------------------------------------------
# Peak concurrency — the INTERVAL member of the sessionization family
# (session_30m builds the intervals; this asks the capacity question:
# how many were open AT ONCE?). Classic sweep line: each per-day
# effective interval emits a +1/−1 point, a per-day ordered running
# sum traces the concurrency curve, MAX is the answer. Sessions
# crossing midnight are SPLIT at day boundaries first, so the window
# partitions by day — per-day parallelism, no global sort, and the
# carry-over is handled by construction. MAX over the running sum is
# permutation-safe at tied (ts, delta) points: equal deltas commute,
# so the set of prefix sums is order-invariant.
# ---------------------------------------------------------------------------

_PEAK_ORACLE = """
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts FROM events),
    m AS (SELECT *, CASE WHEN LAG(ts) OVER w IS NULL
                          OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                         THEN 1 ELSE 0 END AS new_s
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    s0 AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
           FROM m),
    s AS (SELECT user_id, sid, MIN(ts) AS a0, MAX(ts) AS b0
          FROM s0 GROUP BY 1, 2),
    d AS (SELECT a0, b0,
                 UNNEST(generate_series(CAST(a0 AS DATE), CAST(b0 AS DATE),
                                        INTERVAL 1 DAY))::DATE AS day
          FROM s),
    eff AS (SELECT day,
                   GREATEST(a0, CAST(day AS TIMESTAMP)) AS a,
                   LEAST(b0, CAST(day AS TIMESTAMP) + INTERVAL 1 DAY
                             - INTERVAL 1 MICROSECOND) AS b
            FROM d),
    p AS (SELECT day, a AS ts, 1 AS delta FROM eff
          UNION ALL
          SELECT day, b AS ts, -1 AS delta FROM eff),
    r AS (SELECT day, delta,
                 SUM(delta) OVER (PARTITION BY day ORDER BY ts, delta DESC
                                  ROWS UNBOUNDED PRECEDING) AS run
          FROM p)
    SELECT strftime(day, '%Y-%m-%d') AS day,
           MAX(run)::BIGINT AS peak_concurrent,
           (COUNT(*) // 2)::BIGINT AS n_active_sessions
    FROM r GROUP BY 1
    """


@query("peak_concurrent_sessions", _PEAK_ORACLE)
def q_peak_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per day: how many 30-minute sessions were open simultaneously
    at the busiest instant, and how many touched the day at all.
    Sessions come from the same F.session_window op session_30m pins;
    each is split at midnight (explode over its date sequence) so the
    sweep-line window partitions BY DAY — days order independently in
    parallel, nothing global. At 100 TB: one user-key shuffle for the
    sessions, one day-key shuffle for the sweep; points per day =
    2·sessions, never raw events."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.min("ts").alias("a0"), F.max("ts").alias("b0"))
        .drop("w", "user_id")
    )
    eff = s.select(
        F.explode(F.sequence(F.to_date("a0"), F.to_date("b0"))).alias("day"),
        "a0", "b0",
    ).select(
        "day",
        F.greatest(F.col("a0"), F.expr("cast(day as timestamp_ntz)")).alias("a"),
        F.least(
            F.col("b0"),
            F.expr(
                "cast(day as timestamp_ntz) + interval 1 day"
                " - interval 1 microsecond"
            ),
        ).alias("b"),
    )
    # both sweep points of an interval emit from ONE row (explode of a
    # 2-struct array), so the session build — and the events scan under
    # it — runs once, not once per union branch
    p = eff.select(
        "day",
        F.explode(
            F.array(
                F.struct(F.col("a").alias("ts"), F.lit(1).alias("delta")),
                F.struct(F.col("b").alias("ts"), F.lit(-1).alias("delta")),
            )
        ).alias("e"),
    ).select("day", "e.ts", "e.delta")
    r = p.select(
        "day",
        "delta",
        F.expr(
            "sum(delta) over (partition by day order by ts asc, delta desc "
            "rows unbounded preceding)"
        ).alias("run"),
    )
    return r.groupBy(F.date_format("day", "yyyy-MM-dd").alias("day")).agg(
        F.max("run").cast("bigint").alias("peak_concurrent"),
        F.expr("cast(count(1) div 2 as bigint)").alias("n_active_sessions"),
    )


# ---------------------------------------------------------------------------
# Functional-dependency audit — the PROFILING-DISCOVERY member of the
# data-quality family (quality_profile measures columns in isolation,
# referential_integrity_audit checks cross-table keys; this tests
# WITHIN-table column determinism, the Metanome/FD-discovery shape):
# for each declared candidate "lhs -> rhs", how many lhs values map to
# more than one distinct rhs. A clean FD is a normalization/dedup
# invariant; a violated one quantifies denormalization noise.
# ---------------------------------------------------------------------------

_FD_CANDIDATES = [
    ("orders", "o_custkey", "o_orderpriority"),
    ("orders", "o_custkey", "o_orderstatus"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("customer", "c_custkey", "c_mktsegment"),
    ("part", "p_brand", "p_type"),
    ("documents", "source", "lang"),
    ("nation", "n_nationkey", "n_name"),
]


def _fd_branch_sql(table: str, lhs: str, rhs: str) -> str:
    return f"""
    SELECT '{table}: {lhs} -> {rhs}' AS check_name,
           COUNT(*)::BIGINT AS n_groups,
           CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations,
           MAX(k)::BIGINT AS max_rhs_card,
           CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS violation_pct_u6
    FROM (SELECT {lhs}, COUNT(DISTINCT {rhs})::BIGINT AS k
          FROM {table} GROUP BY {lhs})
    """


_FD_ORACLE = "\nUNION ALL\n".join(
    _fd_branch_sql(t, l, r) for t, l, r in _FD_CANDIDATES
)


@query("functional_dependency_audit", _FD_ORACLE)
def q_functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per candidate FD: lhs-group count, number of lhs values
    with >1 distinct rhs, the widest rhs fan-out, and the violation
    rate in micro-units (integral division). Each branch is one
    groupBy(lhs)+countDistinct then a scalar fold — map-side partial
    aggregation throughout, branches union to a |candidates|-row
    result. At 100 TB each candidate costs one key shuffle of its own
    table; candidates over the same table share the scan via Spark's
    plan-level reuse."""
    from functools import reduce

    branches = []
    for table, lhs, rhs in _FD_CANDIDATES:
        g = (
            load_table(spark, sf_dir, table)
            .groupBy(lhs)
            .agg(F.countDistinct(rhs).cast("bigint").alias("k"))
        )
        branches.append(
            g.agg(
                F.lit(f"{table}: {lhs} -> {rhs}").alias("check_name"),
                F.count(F.lit(1)).cast("bigint").alias("n_groups"),
                F.expr(
                    "cast(sum(case when k > 1 then 1 else 0 end) as bigint)"
                ).alias("n_violations"),
                F.max("k").cast("bigint").alias("max_rhs_card"),
                F.expr(
                    "cast(sum(case when k > 1 then 1 else 0 end) * 1000000 "
                    "div count(1) as bigint)"
                ).alias("violation_pct_u6"),
            )
        )
    return reduce(lambda a, b: a.unionAll(b), branches)


# ---------------------------------------------------------------------------
# Simpson diversity — the COMPOSITION-SUMMARY member of the corpus
# family (corpus_composition lists the per-(source,lang) cells; this
# collapses each source to one diversity number): Gini–Simpson index
# 1 − Σ(c/N)² as the exact integer (N² − Σc²)·10⁶ div N², plus the
# dominant language and its share. Zero transcendentals — unlike a
# Shannon entropy, every cell is integer arithmetic, so the row is
# hash-exact with no float-fold discipline needed.
# ---------------------------------------------------------------------------

_DIVERSITY_ORACLE = """
    WITH c AS (SELECT source, lang, COUNT(*)::BIGINT AS n
               FROM documents GROUP BY 1, 2),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                       ORDER BY n DESC, lang) AS rk
          FROM c),
    a AS (SELECT source, SUM(n)::BIGINT AS n_docs,
                 COUNT(*)::BIGINT AS n_langs,
                 SUM(CAST(n AS HUGEINT) * n) AS sq,
                 MAX(CASE WHEN rk = 1 THEN lang END) AS top_lang,
                 MAX(CASE WHEN rk = 1 THEN n ELSE 0 END)::BIGINT AS top_n
          FROM r GROUP BY source)
    SELECT source, n_docs, n_langs, top_lang,
           CAST(top_n * 1000000 // n_docs AS BIGINT) AS top_share_u6,
           CAST((CAST(n_docs AS HUGEINT) * n_docs - sq) * 1000000
                // (CAST(n_docs AS HUGEINT) * n_docs) AS BIGINT)
             AS simpson_u6
    FROM a
    """


@query("source_lang_diversity", _DIVERSITY_ORACLE)
def q_source_lang_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language diversity: Gini–Simpson index in exact
    integer micro-units (widened arithmetic — Spark decimal(38,0)
    `div` == DuckDB HUGEINT `//` — so Σc² survives far past int64),
    language count, and the dominant language with its share (ties
    broken by language name through a row_number window). One corpus
    scan to the (source, lang) cell table; everything after is
    cell-table-sized."""
    from pyspark.sql import Window

    c = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    r = c.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("source").orderBy(F.col("n").desc(), "lang")
        ),
    )
    a = r.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
        F.expr("sum(cast(n as decimal(38,0)) * n)").alias("sq"),
        F.max(F.when(F.col("rk") == 1, F.col("lang"))).alias("top_lang"),
        F.max(F.when(F.col("rk") == 1, F.col("n")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("top_n"),
    )
    return a.select(
        "source", "n_docs", "n_langs", "top_lang",
        F.expr("cast(top_n * 1000000 div n_docs as bigint)").alias(
            "top_share_u6"
        ),
        F.expr(
            "cast((cast(n_docs as decimal(38,0)) * n_docs - sq) * 1000000 "
            "div (cast(n_docs as decimal(38,0)) * n_docs) as bigint)"
        ).alias("simpson_u6"),
    )


# ---------------------------------------------------------------------------
# EWMA smoothing — the SMOOTHING member of the time-series family
# (rolling_7d_revenue averages uniformly, daily_revenue_cusum detects
# level shifts, monthly_forecast_backtest scores forecasts; this
# tracks the level itself with exponentially decaying memory). The
# geometric weights are truncated at K=10 lags and kept RATIONAL
# (2^(K-1-i)), so the weighted average is one integral division of
# two exact int64 sums — an infinite-memory float recurrence would
# never hash cross-engine; a 10-lag tail of halving weights carries
# 99.9% of its mass.
# ---------------------------------------------------------------------------

_EWMA_K = 10


def _ewma_terms(engine: str) -> "tuple[str, str]":
    lag = "LAG(rev_c, {i}) OVER (ORDER BY day)" if engine == "duck" else (
        "lag(rev_c, {i}) over (order by day)"
    )
    num, den = [], []
    for i in range(_EWMA_K):
        w = 1 << (_EWMA_K - 1 - i)
        t = lag.format(i=i) if i else "rev_c"
        num.append(f"CASE WHEN {t} IS NULL THEN 0 ELSE {t} * {w} END")
        den.append(f"CASE WHEN {t} IS NULL THEN 0 ELSE {w} END")
    return " + ".join(num), " + ".join(den)


_EWMA_NUM_D, _EWMA_DEN_D = _ewma_terms("duck")

_EWMA_ORACLE = f"""
    WITH d AS MATERIALIZED (
      SELECT o_orderdate AS day,
             SUM(CAST(floor(o_totalprice * 100) AS BIGINT))::BIGINT AS rev_c
      FROM orders GROUP BY 1),
    s AS (SELECT day, rev_c,
                 ({_EWMA_NUM_D})::BIGINT AS num,
                 ({_EWMA_DEN_D})::BIGINT AS den
          FROM d)
    SELECT CAST(day AS VARCHAR) AS day, rev_c,
           (num // den)::BIGINT AS ewma_c,
           (rev_c - num // den)::BIGINT AS dev_c
    FROM s
    """


@query("daily_revenue_ewma", _EWMA_ORACLE)
def q_daily_revenue_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily revenue with
    rational halving weights truncated at 10 lags: num/den fold only
    the lags that EXIST (series head renormalizes instead of decaying
    from zero), ewma = num div den integral, dev = actual − smoothed.
    Same scale posture as CUSUM: the day-aggregate is the only raw
    pass; the lag window orders ≤ #calendar-days rows."""
    num, den = _ewma_terms("spark")
    d = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            F.expr(
                "cast(sum(cast(floor(o_totalprice * 100) as bigint)) as bigint)"
            ).alias("rev_c")
        )
    )
    s = d.select(
        "day", "rev_c",
        F.expr(f"cast({num} as bigint)").alias("num"),
        F.expr(f"cast({den} as bigint)").alias("den"),
    )
    return s.select(
        F.col("day").cast("string").alias("day"),
        "rev_c",
        F.expr("cast(num div den as bigint)").alias("ewma_c"),
        F.expr("cast(rev_c - num div den as bigint)").alias("dev_c"),
    )


# ---------------------------------------------------------------------------
# Theil–Sen robust trend — the TREND member of the time-series family
# (EWMA tracks level, CUSUM detects shifts; this estimates the slope,
# outlier-robustly): median of all pairwise slopes over the daily
# revenue series, next to the OLS slope for contrast. Day gaps use
# real calendar distance. Both medians of integer slopes interpolate
# at most one exact half, so 2·median is an exact int64 in both
# engines; the OLS slope is one integral division in widened
# arithmetic. Pair count is (#days choose 2) — calendar-bounded, so
# the quadratic blowup NEVER grows with row count, only with the
# series length.
# ---------------------------------------------------------------------------

_THEILSEN_ORACLE = """
    WITH d AS MATERIALIZED (
      SELECT o_orderdate AS day,
             SUM(CAST(floor(o_totalprice * 100) AS BIGINT))::BIGINT AS rev_c
      FROM orders GROUP BY 1),
    x AS (SELECT rev_c,
                 date_diff('day', (SELECT MIN(day) FROM d), day)::BIGINT AS x
          FROM d),
    p AS (SELECT (b.rev_c - a.rev_c) * 1000000 // (b.x - a.x) AS slope_u6
          FROM x a JOIN x b ON a.x < b.x),
    ols AS (SELECT COUNT(*)::HUGEINT AS n,
                   SUM(CAST(x AS HUGEINT)) AS sx,
                   SUM(CAST(rev_c AS HUGEINT)) AS sy,
                   SUM(CAST(x AS HUGEINT) * rev_c) AS sxy,
                   SUM(CAST(x AS HUGEINT) * x) AS sxx
            FROM x)
    SELECT (SELECT COUNT(*) FROM d)::BIGINT AS n_days,
           (SELECT COUNT(*) FROM p)::BIGINT AS n_pairs,
           (SELECT CAST(quantile_cont(slope_u6, 0.5) * 2 AS BIGINT) FROM p)
             AS sen_slope2_u6,
           (SELECT CAST((n * sxy - sx * sy) * 1000000
                        // (n * sxx - sx * sx) AS BIGINT) FROM ols)
             AS ols_slope_u6
    """


@query("daily_revenue_theilsen", _THEILSEN_ORACLE)
def q_daily_revenue_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen median slope (micro-units/day, reported doubled so
    the half-interpolating median stays integral) and the OLS slope
    over daily revenue vs calendar distance from the first day. The
    all-pairs self-join runs distributed but is bounded by the
    calendar (≤ ~10⁷ pairs for 10 years of days regardless of data
    volume); exact-percentile median buffers slopes per-group — the
    approx_percentile swap is the documented 100 TB lever if the
    series were ever unbounded."""
    d = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            F.expr(
                "cast(sum(cast(floor(o_totalprice * 100) as bigint)) as bigint)"
            ).alias("rev_c")
        )
        # the day series feeds five consumers (anchor, both pair
        # sides, OLS, n_days): materialize the ≤ #calendar-days rows
        # once so the orders scan under it runs once
        .localCheckpoint(eager=False)
    )
    m = d.agg(F.min("day").alias("d0"))
    x = d.crossJoin(F.broadcast(m)).select(
        "rev_c", F.datediff("day", "d0").cast("bigint").alias("x")
    )
    # fan the probe side across cores: the day series materializes on
    # a couple of partitions, and without this the |days|²/2 pair
    # expansion (and the percentile's pre-aggregation) would run on
    # ONE task — slope generation is embarrassingly parallel
    a = x.select(F.col("rev_c").alias("ra"), F.col("x").alias("xa")).repartition(32)
    b = x.select(F.col("rev_c").alias("rb"), F.col("x").alias("xb"))
    p = a.join(F.broadcast(b), F.col("xa") < F.col("xb")).select(
        F.expr("(rb - ra) * 1000000 div (xb - xa)").alias("slope_u6")
    )
    ols = x.agg(
        F.expr("cast(count(1) as decimal(38,0))").alias("n"),
        F.expr("sum(cast(x as decimal(38,0)))").alias("sx"),
        F.expr("sum(cast(rev_c as decimal(38,0)))").alias("sy"),
        F.expr("sum(cast(x as decimal(38,0)) * rev_c)").alias("sxy"),
        F.expr("sum(cast(x as decimal(38,0)) * x)").alias("sxx"),
    )
    # doubled median by RANK SELECTION, not the percentile aggregate:
    # the hash-buffered exact percentile merges ~|days|²/2 longs on one
    # reducer (~3× slower measured); a distributed sort + two rank
    # picks gives the identical value (lower+upper rank elements; an
    # odd count picks the middle twice). n_pairs is CLOSED FORM —
    # days are distinct, so the xa<xb join yields exactly n·(n−1)/2 —
    # which keeps the rank thresholds in-plan (no driver collect).
    from pyspark.sql import Window

    nd = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    ndp = nd.select(
        "n_days",
        F.expr("n_days * (n_days - 1) div 2").alias("n_pairs"),
    )
    r = p.select(
        "slope_u6",
        F.row_number().over(Window.orderBy("slope_u6")).alias("rk"),
    ).crossJoin(F.broadcast(ndp))
    stats = r.agg(
        F.max("n_pairs").cast("bigint").alias("n_pairs"),
        F.expr(
            "cast(sum(case when rk = (n_pairs + 1) div 2 then slope_u6 "
            "else 0 end) + sum(case when rk = n_pairs div 2 + 1 then "
            "slope_u6 else 0 end) as bigint)"
        ).alias("sen_slope2_u6"),
    )
    return (
        nd.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(ols))
        .select(
            "n_days", "n_pairs", "sen_slope2_u6",
            F.expr(
                "cast((n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx) "
                "as bigint)"
            ).alias("ols_slope_u6"),
        )
    )


# ---------------------------------------------------------------------------
# Pareto frontier (skyline) — the MULTI-OBJECTIVE member of the
# ranking family (top_customers ranks one measure, price_banding
# buckets one; this keeps the rows no other row beats on BOTH axes):
# per brand, the parts where no cheaper-or-equal part has more size.
# Two windows replace the textbook quadratic NOT EXISTS self-join:
# the strictly-cheaper running max (a range frame ending 1 PRECEDING,
# identical semantics both engines) and the same-price group max —
# a part survives iff it beats the first and ties the second.
# ---------------------------------------------------------------------------

_SKYLINE_ORACLE = """
    WITH p AS (SELECT p_brand, p_partkey, p_size,
                      CAST(floor(p_retailprice * 100) AS BIGINT) AS price_c
               FROM part),
    w AS (SELECT *,
                 MAX(p_size) OVER (PARTITION BY p_brand ORDER BY price_c
                                   RANGE BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS cheaper_max,
                 MAX(p_size) OVER (PARTITION BY p_brand, price_c)
                   AS sameprice_max
          FROM p)
    SELECT p_brand, p_partkey, price_c, p_size::BIGINT AS p_size
    FROM w
    WHERE (cheaper_max IS NULL OR cheaper_max < p_size)
      AND p_size = sameprice_max
    """


@query("brand_price_size_skyline", _SKYLINE_ORACLE)
def q_brand_price_size_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand skyline minimizing price and maximizing size: a part
    is dominated iff a strictly cheaper part is at least as large, or
    an equal-priced part is strictly larger (equal price AND size ties
    both survive — neither dominates). Both windows PARTITION BY
    brand, so brands order independently in parallel — the classic
    quadratic skyline self-join never appears, and the sort is the
    only shuffle. At 100 TB the same two-window plan runs per
    partition key; an unpartitioned skyline first reduces per
    partition (local frontier), then merges frontiers — documented in
    SCALING.md."""
    p = load_table(spark, sf_dir, "part").select(
        "p_brand", "p_partkey", "p_size",
        F.expr("cast(floor(p_retailprice * 100) as bigint)").alias("price_c"),
    )
    w = p.select(
        "*",
        F.expr(
            "max(p_size) over (partition by p_brand order by price_c "
            "range between unbounded preceding and 1 preceding)"
        ).alias("cheaper_max"),
        F.expr(
            "max(p_size) over (partition by p_brand, price_c)"
        ).alias("sameprice_max"),
    )
    return w.filter(
        (F.col("cheaper_max").isNull() | (F.col("cheaper_max") < F.col("p_size")))
        & (F.col("p_size") == F.col("sameprice_max"))
    ).select(
        "p_brand", "p_partkey", "price_c",
        F.col("p_size").cast("bigint").alias("p_size"),
    )


# ---------------------------------------------------------------------------
# Weighted shortest distance — the WEIGHTED member of the graph
# family (part_hops_bfs counts hops; this sums a real edge cost):
# multi-source Bellman-Ford over the support-pruned co-purchase
# graph, edge weight = 10⁶ div support (strong affinity = short
# edge), seeds = the PPR/BFS seed rule verbatim so the three
# reachability queries compose. Exact integer costs; the oracle
# unrolls the rounds as full-relaxation CTEs (the delta iterate
# equals the full iterate round for round).
# ---------------------------------------------------------------------------
BF_MAX_ROUNDS = 3


def _bellman_oracle() -> str:
    rounds = []
    for i in range(1, BF_MAX_ROUNDS + 1):
        rounds.append(
            f"""r{i} AS MATERIALIZED (
              SELECT e.dst AS node, MIN(v{i - 1}.cost + e.w) AS cand
              FROM e JOIN v{i - 1} ON e.src = v{i - 1}.node GROUP BY 1),
            v{i} AS MATERIALIZED (
              SELECT node, MIN(cost)::BIGINT AS cost FROM (
                SELECT node, cost FROM v{i - 1}
                UNION ALL SELECT node, cand AS cost FROM r{i})
              GROUP BY node)"""
        )
    return f"""
    WITH op AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    und AS MATERIALIZED (
      SELECT u, v, (1000000 // c)::BIGINT AS w FROM (
        SELECT a.pk AS u, b.pk AS v, COUNT(*)::BIGINT AS c
        FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY 1, 2)
      WHERE c >= {TRI_MIN_SUPPORT}),
    e AS MATERIALIZED (SELECT u AS src, v AS dst, w FROM und
                       UNION ALL SELECT v AS src, u AS dst, w FROM und),
    innodes AS (SELECT DISTINCT src AS node FROM e),
    seeds AS MATERIALIZED (
      SELECT pk AS node FROM (
        SELECT op.pk, COUNT(*) AS c FROM op JOIN innodes ON innodes.node = op.pk
        GROUP BY op.pk ORDER BY c DESC, op.pk LIMIT {PPR_SEEDS})),
    v0 AS (SELECT node, 0 AS cost FROM seeds),
    {", ".join(rounds)}
    SELECT node AS part_key, cost FROM v{BF_MAX_ROUNDS}
    """


@query("part_weighted_distance", _bellman_oracle())
def q_part_weighted_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min affinity-weighted distance (≤ {BF_MAX_ROUNDS} edges) from
    the {PPR_SEEDS} highest-support parts — delta-relaxation
    Bellman-Ford (operators/clusters.py::bellman_ford_costs): round i
    relaxes only nodes improved in round i−1 against the
    once-materialized weighted edge frame; work per round ∝ the
    improved set's edge cut. Same graph, pruning and seeds as
    copurchase_triangles / related_parts_ppr / part_hops_bfs, so the
    family composes into one reachability report."""
    from .operators.clusters import bellman_ford_costs

    op = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    b = op.select(F.col("ok"), F.col("pk").alias("pb"))
    und = (
        op.join(b, (op["ok"] == b["ok"]) & (op["pk"] < b["pb"]))
        .groupBy(F.col("pk").alias("u"), F.col("pb").alias("v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
        .filter(F.col("_c") >= TRI_MIN_SUPPORT)
        .select("u", "v", F.expr("cast(1000000 div _c as bigint)").alias("w"))
    )
    edges = und.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "w"
    ).unionByName(
        und.select(F.col("v").alias("src"), F.col("u").alias("dst"), "w")
    )
    innodes = edges.select(F.col("src").alias("pk")).distinct()
    seeds = (
        op.join(innodes, "pk")
        .groupBy("pk")
        .agg(F.count(F.lit(1)).alias("_c"))
        .orderBy(F.col("_c").desc(), F.col("pk"))
        .limit(PPR_SEEDS)
        .select(F.col("pk").alias("node"))
    )
    return bellman_ford_costs(edges, seeds, max_rounds=BF_MAX_ROUNDS).select(
        F.col("node").alias("part_key"), "cost"
    )


# ---------------------------------------------------------------------------
# Markov index lifecycle — a DIFFERENT maintenance law than the
# additive families (CMS/BM25/moments just sum): transition counts
# depend on ADJACENCY, so an event inserted mid-stream rewires its
# neighbors' edges. The honest incremental contract is the
# affected-key rebuild (the span-scrub ownership-transfer precedent):
# subtract the AFFECTED USERS' old contribution, add their new one —
# cost ∝ the affected users' events (a pruned read under a
# user-partitioned layout), never the corpus. Insert and forget are
# the SAME law with different slices.
# ---------------------------------------------------------------------------


def _markov_counts(ev: DataFrame) -> DataFrame:
    """(from_type, to_type, n) transition counts of one event frame —
    the maintained index's row shape."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def _markov_maintain(
    idx: DataFrame, old: DataFrame, new: DataFrame
) -> DataFrame:
    """index − old + new via one sum-groupBy; zero-count edges drop so
    the maintained table is row-identical to a rebuild."""
    merged = (
        idx.select("from_type", "to_type", "n")
        .unionByName(old.select("from_type", "to_type", (-F.col("n")).alias("n")))
        .unionByName(new.select("from_type", "to_type", "n"))
        .groupBy("from_type", "to_type")
        .agg(F.sum("n").cast("bigint").alias("n_trans"))
        .filter(F.col("n_trans") > 0)
    )
    return merged.select(
        "from_type", "to_type", "n_trans",
        F.expr(
            "cast(n_trans * 1000000 div "
            "sum(n_trans) over (partition by from_type) as bigint)"
        ).alias("p_u6"),
    )


@query("markov_new_batch", _markov_oracle())
def q_markov_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest maintenance for the transition index: the corpus slice's
    counts persist as parquet; the stable {NEW_BATCH_PCT}% batch —
    which interleaves IN TIME with history, the hard case — names its
    affected users, whose old-corpus contribution is subtracted and
    whose merged-stream contribution re-counted. Oracle recomputes
    the matrix over ALL events from scratch: the hash match proves
    affected-key maintenance == full recompute."""
    import os

    from .operators.sampling import hash_bucket
    from .sources.sinks import write_parquet

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    is_new = hash_bucket("event_id") < NEW_BATCH_PCT
    corpus, batch = events.filter(~is_new), events.filter(is_new)

    base = _run_scoped_index_dir("markov")
    idx_path = os.path.join(base, "markov_idx")
    write_parquet(_markov_counts(corpus), idx_path)
    idx = spark.read.parquet(idx_path)

    # batch rows all belong to affected users by definition, so the
    # merged affected stream is (affected users' history) ∪ batch —
    # materialize both once: the returned plan reads the index, the
    # batch and the affected slice, never the corpus again
    batch = batch.localCheckpoint(eager=False)
    affected = batch.select("user_id").distinct()
    corpus_aff = corpus.join(affected, "user_id", "left_semi").localCheckpoint(
        eager=False
    )
    old = _markov_counts(corpus_aff)
    new = _markov_counts(corpus_aff.unionByName(batch))
    return _markov_maintain(idx, old, new)


@query(
    "markov_forget",
    _markov_oracle(
        f" WHERE {sql_hash_bucket('event_id', salt='forget')} >= {FORGET_PCT}"
    ),
)
def q_markov_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion for the transition index — the adjacency twist: a
    deleted mid-stream event doesn't just remove its own edges, it
    SPLICES its neighbors together, so per-edge subtraction would be
    wrong. Same affected-key law as ingest: subtract the deleted
    events' users' full old contribution, re-count them over the KEPT
    stream. Oracle recomputes from kept events from scratch — the
    hash match proves maintained == rebuilt, row-identically."""
    import os

    from .operators.sampling import hash_bucket
    from .sources.sinks import write_parquet

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    is_del = hash_bucket("event_id", salt="forget") < FORGET_PCT

    base = _run_scoped_index_dir("markov_forget")
    idx_path = os.path.join(base, "markov_idx")
    write_parquet(_markov_counts(events), idx_path)
    idx = spark.read.parquet(idx_path)

    # the affected slice (all of the affected users' events, deleted
    # rows included) materializes once; old counts read it whole, new
    # counts read its kept subset — the corpus is never re-scanned
    affected = events.filter(is_del).select("user_id").distinct()
    events_aff = events.join(affected, "user_id", "left_semi").localCheckpoint(
        eager=False
    )
    old = _markov_counts(events_aff)
    new = _markov_counts(events_aff.filter(~is_del))
    return _markov_maintain(idx, old, new)


# ---------------------------------------------------------------------------
# Zipf fit — the STATISTICAL-LAW member of the corpus-analysis family
# (corpus_vocabulary lists the head; this tests whether the head
# OBEYS the rank-frequency power law a natural corpus must — a wildly
# non-Zipfian slope flags synthetic/spammy text): OLS of
# ln(frequency) on ln(rank) over the top terms. Determinism: every
# ln is of ONE exact integer and quantizes to micro-units BEFORE any
# sum, so all regression sums are exact integers (order-free) in
# widened arithmetic — the regression is DEFINED on the quantized
# points.
# ---------------------------------------------------------------------------
ZIPF_TOP_R = 500

_ZIPF_ORACLE = f"""
    WITH t AS (SELECT unnest(string_split(lower(text), ' ')) AS token
               FROM documents),
    c AS (SELECT token, COUNT(*)::BIGINT AS n_occ
          FROM t WHERE token <> '' GROUP BY token),
    r AS (SELECT n_occ,
                 ROW_NUMBER() OVER (ORDER BY n_occ DESC, token) AS rank
          FROM c),
    q AS (SELECT CAST(FLOOR(1000000 * ln(rank)) AS HUGEINT) AS x,
                 CAST(FLOOR(1000000 * ln(n_occ)) AS HUGEINT) AS y,
                 n_occ
          FROM r WHERE rank <= {ZIPF_TOP_R}),
    a AS (SELECT COUNT(*)::HUGEINT AS n, MAX(n_occ)::BIGINT AS c_max,
                 SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * y) AS sxy, SUM(x * x) AS sxx
          FROM q)
    SELECT CAST(n AS BIGINT) AS n_terms, c_max,
           CAST((n * sxy - sx * sy) * 1000000
                // (n * sxx - sx * sx) AS BIGINT) AS slope_u6,
           CAST((sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx)
                // (n * (n * sxx - sx * sx)) AS BIGINT) AS intercept_u6
    FROM a
    """


@query("corpus_zipf_fit", _ZIPF_ORACLE)
def q_corpus_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf slope of the top-{ZIPF_TOP_R} vocabulary: x = ⌊10⁶·ln r⌋,
    y = ⌊10⁶·ln c⌋ per term (each ln takes one exact integer — the
    PMI/IV discipline — and floors before summing, so the OLS sums
    are order-free exact integers), slope and intercept as integral
    micro-unit divisions in decimal(38,0). A natural-language corpus
    lands near slope −10⁶ (the law); the intercept estimates
    ln(c_max). Top-K via TakeOrderedAndProject — the full vocabulary
    never funnels through one partition; everything after the token
    groupBy is {ZIPF_TOP_R} rows."""
    from pyspark.sql import Window

    docs = _spread(load_table(spark, sf_dir, "documents"))
    counts = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occ"))
    )
    topk = counts.orderBy(F.col("n_occ").desc(), F.col("token").asc()).limit(
        ZIPF_TOP_R
    )
    w = Window.orderBy(F.col("n_occ").desc(), F.col("token").asc())
    q = topk.select(
        "n_occ", F.row_number().over(w).cast("bigint").alias("rank")
    ).select(
        "n_occ",
        F.expr(
            "cast(floor(1000000 * ln(cast(rank as double))) as decimal(38,0))"
        ).alias("x"),
        F.expr(
            "cast(floor(1000000 * ln(cast(n_occ as double))) as decimal(38,0))"
        ).alias("y"),
    )
    a = q.agg(
        F.expr("cast(count(1) as decimal(38,0))").alias("n"),
        F.max("n_occ").cast("bigint").alias("c_max"),
        F.expr("sum(x)").alias("sx"),
        F.expr("sum(y)").alias("sy"),
        F.expr("sum(x * y)").alias("sxy"),
        F.expr("sum(x * x)").alias("sxx"),
    )
    return a.select(
        F.expr("cast(n as bigint)").alias("n_terms"),
        "c_max",
        F.expr(
            "cast((n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx) "
            "as bigint)"
        ).alias("slope_u6"),
        F.expr(
            "cast((sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx) "
            "div (n * (n * sxx - sx * sx)) as bigint)"
        ).alias("intercept_u6"),
    )


# ---------------------------------------------------------------------------
# Reciprocal best match — the DECISION step of record linkage (the
# fuzzy join emits candidates; a merge decision needs pairs that pick
# EACH OTHER): a name's best match is its lowest-distance candidate
# (name tie-break), and a link is kept only when mutual — the
# bioinformatics "reciprocal best hit" rule, which kills the
# hub-name-absorbs-everything failure of one-sided best matching.
# ---------------------------------------------------------------------------

_RBM_ORACLE = f"""
    WITH d AS (SELECT p_name, COUNT(*)::BIGINT AS n_parts
               FROM part GROUP BY p_name),
    t AS (SELECT p_name AS n, unnest(string_split(p_name, ' ')) AS k FROM d),
    tt AS (SELECT n, k FROM t WHERE k <> ''),
    c AS (SELECT DISTINCT a.n AS name_a, b.n AS name_b
          FROM tt a JOIN tt b ON a.k = b.k AND a.n < b.n),
    v AS (SELECT name_a, name_b, levenshtein(name_a, name_b)::BIGINT AS dist
          FROM c WHERE levenshtein(name_a, name_b) <= {FUZZY_MAX_DIST}),
    s AS (SELECT name_a AS n, name_b AS m, dist FROM v
          UNION ALL SELECT name_b, name_a, dist FROM v),
    b AS (SELECT n, m, dist,
                 ROW_NUMBER() OVER (PARTITION BY n ORDER BY dist, m) AS rk
          FROM s),
    best AS (SELECT n, m, dist FROM b WHERE rk = 1)
    SELECT x.n AS name_a, x.m AS name_b, x.dist,
           da.n_parts AS n_parts_a, db.n_parts AS n_parts_b
    FROM best x JOIN best y ON y.n = x.m AND y.m = x.n
    JOIN d da ON da.p_name = x.n JOIN d db ON db.p_name = x.m
    WHERE x.n < x.m
    """


@query("part_name_reciprocal_best", _RBM_ORACLE)
def q_part_name_reciprocal_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-best fuzzy links over the blocked candidate set: the
    symmetrized candidate table ranks per name by (dist, name), rank-1
    rows self-join on the reversed pair, canonical a<b survives. All
    work downstream of the |distinct names| fuzzy phase — the linkage
    decision costs one window + one equi-self-join over best rows."""
    from pyspark.sql import Window

    from .operators.joins import blocked_fuzzy_self_join

    part = load_table(spark, sf_dir, "part")
    d = part.groupBy("p_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts")
    )
    v = blocked_fuzzy_self_join(d, "p_name", FUZZY_MAX_DIST)
    s = v.select(
        F.col("name_a").alias("n"), F.col("name_b").alias("m"), "dist"
    ).unionByName(
        v.select(
            F.col("name_b").alias("n"), F.col("name_a").alias("m"), "dist"
        )
    )
    best = (
        s.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("n").orderBy("dist", "m")
            ),
        )
        .filter(F.col("rk") == 1)
        .drop("rk")
        .localCheckpoint(eager=False)
    )
    y = best.select(
        F.col("n").alias("yn"), F.col("m").alias("ym")
    )
    mutual = best.join(
        y, (F.col("yn") == F.col("m")) & (F.col("ym") == F.col("n")), "left_semi"
    ).filter(F.col("n") < F.col("m"))
    da = d.select(F.col("p_name").alias("n"), F.col("n_parts").alias("n_parts_a"))
    db = d.select(F.col("p_name").alias("m"), F.col("n_parts").alias("n_parts_b"))
    return (
        mutual.join(F.broadcast(da), "n")
        .join(F.broadcast(db), "m")
        .select(
            F.col("n").alias("name_a"), F.col("m").alias("name_b"), "dist",
            "n_parts_a", "n_parts_b",
        )
    )


# ---------------------------------------------------------------------------
# Chi-square independence — the CATEGORICAL member of the statistical-
# test family (KS/PSI compare numeric distributions, the z-test scores
# points; this asks whether two categorical columns are associated at
# all): segment × order-priority contingency table, χ² and Cramér's V.
# Every cell's term is (oN − rc)²·10⁶ div (N·r·c) — one integral
# division of exact widened integers, quantized per cell BEFORE the
# order-free integer sum (the Zipf discipline).
# ---------------------------------------------------------------------------

_CHI2_ORACLE = """
    WITH j AS (SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri
               FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
    o AS (SELECT seg, pri, COUNT(*)::BIGINT AS obs FROM j GROUP BY 1, 2),
    r AS (SELECT seg, SUM(obs)::BIGINT AS r_tot FROM o GROUP BY seg),
    c AS (SELECT pri, SUM(obs)::BIGINT AS c_tot FROM o GROUP BY pri),
    n AS (SELECT SUM(obs)::BIGINT AS n_tot,
                 COUNT(DISTINCT seg)::BIGINT AS n_seg,
                 COUNT(DISTINCT pri)::BIGINT AS n_pri
          FROM o),
    t AS (SELECT (CAST(o.obs AS HUGEINT) * n.n_tot
                  - CAST(r.r_tot AS HUGEINT) * c.c_tot) AS d,
                 CAST(n.n_tot AS HUGEINT) * r.r_tot * c.c_tot AS e
          FROM o JOIN r USING (seg) JOIN c USING (pri) CROSS JOIN n),
    q AS (SELECT SUM(CAST(d * d * 1000000 // e AS BIGINT))::BIGINT
                   AS chi2_u6
          FROM t)
    SELECT n.n_tot AS n_rows,
           ((n.n_seg - 1) * (n.n_pri - 1))::BIGINT AS dof,
           q.chi2_u6,
           CAST(q.chi2_u6 // (n.n_tot * LEAST(n.n_seg - 1, n.n_pri - 1))
                AS BIGINT) AS cramers_v2_u6
    FROM n CROSS JOIN q
    """


@query("segment_priority_chi2", _CHI2_ORACLE)
def q_segment_priority_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² independence of market segment vs order priority: one
    broadcast-dim join to the contingency cells, marginals from the
    cell table (never a second raw pass), per-cell quantized terms
    summed as exact integers, Cramér's V² in micro-units on top.
    Everything downstream of the cell groupBy is |segments×priorities|
    rows."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    o = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("obs"))
        .localCheckpoint(eager=False)
    )
    r = o.groupBy("seg").agg(F.sum("obs").cast("bigint").alias("r_tot"))
    c = o.groupBy("pri").agg(F.sum("obs").cast("bigint").alias("c_tot"))
    n = o.agg(
        F.sum("obs").cast("bigint").alias("n_tot"),
        F.countDistinct("seg").cast("bigint").alias("n_seg"),
        F.countDistinct("pri").cast("bigint").alias("n_pri"),
    )
    t = (
        o.join(F.broadcast(r), "seg")
        .join(F.broadcast(c), "pri")
        .crossJoin(F.broadcast(n))
        .select(
            F.expr(
                "cast(obs as decimal(38,0)) * n_tot "
                "- cast(r_tot as decimal(38,0)) * c_tot"
            ).alias("d"),
            F.expr("cast(n_tot as decimal(38,0)) * r_tot * c_tot").alias("e"),
        )
    )
    q = t.agg(
        F.expr("cast(sum(cast(d * d * 1000000 div e as bigint)) as bigint)")
        .alias("chi2_u6")
    )
    return (
        n.crossJoin(F.broadcast(q))
        .select(
            F.col("n_tot").alias("n_rows"),
            F.expr("cast((n_seg - 1) * (n_pri - 1) as bigint)").alias("dof"),
            "chi2_u6",
            F.expr(
                "cast(chi2_u6 div (n_tot * least(n_seg - 1, n_pri - 1)) "
                "as bigint)"
            ).alias("cramers_v2_u6"),
        )
    )


# ---------------------------------------------------------------------------
# Cohort LTV curve — the MONEY member of the cohort family
# (weekly_cohort_retention counts who comes BACK; this accumulates
# what they're WORTH): customers grouped by first-order month, revenue
# accumulated by months-since-cohort. The curve a growth team reads
# payback periods off. Exact integers: cents, month ages via
# calendar arithmetic, cumulative sums over an age-ordered window
# PARTITIONED by cohort.
# ---------------------------------------------------------------------------

_LTV_ORACLE = """
    WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
                      CAST(floor(o_totalprice * 100) AS BIGINT) AS rev_c
               FROM orders),
    c AS (SELECT o_custkey, MIN(date_trunc('month', d)) AS cm FROM o
          GROUP BY 1),
    sz AS (SELECT cm, COUNT(*)::BIGINT AS cohort_n FROM c GROUP BY cm),
    a AS (SELECT c.cm, ((EXTRACT(YEAR FROM o.d) - EXTRACT(YEAR FROM c.cm)) * 12
                        + (EXTRACT(MONTH FROM o.d) - EXTRACT(MONTH FROM c.cm)))
                         ::BIGINT AS age_m,
                 o.rev_c
          FROM o JOIN c USING (o_custkey)),
    g AS (SELECT cm, age_m, SUM(rev_c)::BIGINT AS rev_c FROM a GROUP BY 1, 2),
    w AS (SELECT cm, age_m, rev_c,
                 SUM(rev_c) OVER (PARTITION BY cm ORDER BY age_m
                                  ROWS UNBOUNDED PRECEDING)::BIGINT
                   AS cum_rev_c
          FROM g)
    SELECT strftime(w.cm, '%Y-%m') AS cohort_month, w.age_m, sz.cohort_n,
           w.rev_c, w.cum_rev_c,
           (w.cum_rev_c // sz.cohort_n)::BIGINT AS cum_ltv_c
    FROM w JOIN sz USING (cm)
    """


@query("cohort_ltv_curve", _LTV_ORACLE)
def q_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative lifetime value per (first-order-month cohort, months
    since cohort): cohort assignment is one customer-level aggregate
    joined back (the raw pass), month ages are exact calendar
    arithmetic, and the running sum partitions BY COHORT so cohorts
    accumulate in parallel. cum_ltv_c = cumulative cents per cohort
    member (integral division). At 100 TB the join back is the only
    fact-sized work; the curve table is |cohorts × ages|."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.expr("cast(floor(o_totalprice * 100) as bigint)").alias("rev_c"),
    )
    c = o.groupBy("o_custkey").agg(
        F.min(F.trunc("d", "month")).alias("cm")
    ).localCheckpoint(eager=False)
    sz = c.groupBy("cm").agg(F.count(F.lit(1)).cast("bigint").alias("cohort_n"))
    a = o.join(c, "o_custkey").select(
        "cm",
        F.expr(
            "cast((year(d) - year(cm)) * 12 + (month(d) - month(cm)) "
            "as bigint)"
        ).alias("age_m"),
        "rev_c",
    )
    g = a.groupBy("cm", "age_m").agg(F.sum("rev_c").cast("bigint").alias("rev_c"))
    w = g.select(
        "cm", "age_m", "rev_c",
        F.sum("rev_c")
        .over(
            Window.partitionBy("cm")
            .orderBy("age_m")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .cast("bigint")
        .alias("cum_rev_c"),
    )
    return w.join(sz, "cm").select(
        F.date_format("cm", "yyyy-MM").alias("cohort_month"),
        "age_m", "cohort_n", "rev_c", "cum_rev_c",
        F.expr("cast(cum_rev_c div cohort_n as bigint)").alias("cum_ltv_c"),
    )


# ---------------------------------------------------------------------------
# Trimmed mean — the ROBUST-LOCATION member of the statistical family
# (winsorized_prices CLIPS tails to the fence; this DROPS them):
# per-nation mean lineitem price after discarding the lowest and
# highest 10% by rank. Rank-based, so the whole statistic is exact
# integer arithmetic — no percentile interpolation anywhere — and the
# (price, orderkey, linenumber) tie-break makes the drop set
# engine-identical.
# ---------------------------------------------------------------------------
TRIM_PCT = 10


_TRIMMED_ORACLE = f"""
    WITH l AS (SELECT n.n_name AS nation,
                      CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS p_c,
                      l.l_orderkey, l.l_linenumber
               FROM lineitem l
               JOIN orders o ON o.o_orderkey = l.l_orderkey
               JOIN customer c ON c.c_custkey = o.o_custkey
               JOIN nation n ON n.n_nationkey = c.c_nationkey),
    r AS (SELECT nation, p_c,
                 ROW_NUMBER() OVER (PARTITION BY nation
                                    ORDER BY p_c, l_orderkey, l_linenumber)
                   AS rk,
                 COUNT(*) OVER (PARTITION BY nation) AS n_w
          FROM l),
    k AS (SELECT nation, p_c, n_w, (n_w * {TRIM_PCT}) // 100 AS cut
          FROM r WHERE rk > (n_w * {TRIM_PCT}) // 100
                   AND rk <= n_w - (n_w * {TRIM_PCT}) // 100)
    SELECT nation, MAX(n_w)::BIGINT AS n_items,
           COUNT(*)::BIGINT AS n_kept,
           (SUM(p_c) // COUNT(*))::BIGINT AS trimmed_mean_c,
           MIN(p_c) AS kept_min_c, MAX(p_c) AS kept_max_c
    FROM k GROUP BY nation
    """


@query("nation_trimmed_mean_price", _TRIMMED_ORACLE)
def q_nation_trimmed_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation {TRIM_PCT}%-trimmed mean of lineitem prices: rank
    within nation with a total tie-break, drop ⌊n·{TRIM_PCT}/100⌋ from
    each end, integer mean of the keeps. The rank window partitions by
    nation (parallel); broadcast dims route lineitem to its nation in
    one fact pass. Rank-based trimming needs no percentile
    interpolation — every output cell is exact."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber",
        F.expr("cast(floor(l_extendedprice * 100) as bigint)").alias("p_c"),
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    l = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .select(F.col("n_name").alias("nation"), "p_c", "l_orderkey", "l_linenumber")
    )
    wn = Window.partitionBy("nation")
    r = l.select(
        "nation", "p_c",
        F.row_number()
        .over(wn.orderBy("p_c", "l_orderkey", "l_linenumber"))
        .alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n_w"),
    )
    k = r.filter(
        (F.col("rk") > F.expr(f"(n_w * {TRIM_PCT}) div 100"))
        & (F.col("rk") <= F.expr(f"n_w - (n_w * {TRIM_PCT}) div 100"))
    )
    return k.groupBy("nation").agg(
        F.max("n_w").cast("bigint").alias("n_items"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.expr("cast(sum(p_c) div count(1) as bigint)").alias("trimmed_mean_c"),
        F.min("p_c").alias("kept_min_c"),
        F.max("p_c").alias("kept_max_c"),
    )


# ---------------------------------------------------------------------------
# Event-stream hygiene — the INGEST-GATE member of the data-quality
# family for the events table (referential_integrity_audit checks
# keys, quality_profile checks columns; this checks STREAM
# plausibility): arrival-order inversions, duplicate event ids,
# missing types, negative values — the four checks a streaming ingest
# promotes or quarantines a batch on.
# ---------------------------------------------------------------------------

_HYGIENE_ORACLE = """
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts, event_id,
                      event_type, value
               FROM events),
    n AS (SELECT COUNT(*)::BIGINT AS n_total FROM e),
    ooo AS (SELECT COUNT(*)::BIGINT AS bad FROM (
              SELECT CASE WHEN ts < LAG(ts) OVER (PARTITION BY user_id
                                                  ORDER BY event_id)
                          THEN 1 ELSE 0 END AS inv
              FROM e) WHERE inv = 1),
    dup AS (SELECT COALESCE(SUM(c - 1), 0)::BIGINT AS bad FROM (
              SELECT COUNT(*)::BIGINT AS c FROM e GROUP BY event_id)
            WHERE c > 1),
    mt AS (SELECT COUNT(*)::BIGINT AS bad FROM e
           WHERE event_type IS NULL OR event_type = ''),
    neg AS (SELECT COUNT(*)::BIGINT AS bad FROM e
            WHERE value IS NULL OR value < 0),
    u AS (SELECT 'arrival_order_inversions' AS check_name, bad FROM ooo
          UNION ALL SELECT 'duplicate_event_ids', bad FROM dup
          UNION ALL SELECT 'null_or_empty_type', bad FROM mt
          UNION ALL SELECT 'null_or_negative_value', bad FROM neg)
    SELECT u.check_name, u.bad AS n_bad, n.n_total,
           CAST(u.bad * 1000000 // n.n_total AS BIGINT) AS bad_pct_u6
    FROM u CROSS JOIN n
    """


@query("event_stream_hygiene", _HYGIENE_ORACLE)
def q_event_stream_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four stream-plausibility counters in a handful of aggregates:
    event-time inversions against ARRIVAL order (lag over event_id per
    user — the check that catches a producer whose clock jumped),
    duplicate event ids (excess occurrences), missing types, negative
    or null values. One row per check with the rate in micro-units.
    Each check is one key shuffle at most; the union is 4 rows."""
    from .operators.profile import event_stream_hygiene_audit

    return event_stream_hygiene_audit(
        load_table(spark, sf_dir, "events").select(
            "user_id", "ts", "event_id", "event_type", "value"
        )
    )


# ---------------------------------------------------------------------------
# ORC round-trip — the third columnar format edge next to the parquet
# sink (S7) and the PBI CSV dialect (S5): some downstreams (Hive
# ecosystems) mandate ORC, and Spark writes/reads it natively. The
# timed body is the honest write+read+aggregate round-trip; the
# oracle aggregates the source directly, so the hash match proves the
# format preserved every value bit-for-bit.
# ---------------------------------------------------------------------------

_ORC_ORACLE = """
    SELECT o_orderstatus,
           COUNT(*)::BIGINT AS n_orders,
           SUM(CAST(floor(o_totalprice * 100) AS BIGINT))::BIGINT AS rev_c,
           strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_day,
           strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_day
    FROM orders GROUP BY o_orderstatus
    """


@query("export_orc_roundtrip", _ORC_ORACLE)
def q_export_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders to ORC (zlib, the Hive default), read it back and
    aggregate per status — counts, integer cents, date range. A value
    the format mangled (timestamp precision, decimal rounding) would
    break the hash. Scale posture: format edges are map-only; the
    aggregate is the usual one-shuffle."""
    import os

    orc_dir = os.path.join(_run_scoped_index_dir("orc"), "orders_orc")
    load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice", "o_orderdate"
    ).write.mode("overwrite").format("orc").save(orc_dir)
    back = spark.read.format("orc").load(orc_dir)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.expr(
            "cast(sum(cast(floor(o_totalprice * 100) as bigint)) as bigint)"
        ).alias("rev_c"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_day"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_day"),
    )


# ---------------------------------------------------------------------------
# Pack utilization — the QA report over token_pack_bins' plan (the
# packing step says where docs go; this says how well the bins fill —
# the number a training-throughput owner watches): per shard, bin
# count, token totals and fill rate vs budget, plus the tail (max
# overshoot: a doc can straddle its bin boundary by design, since
# bins quantize START offsets).
# ---------------------------------------------------------------------------

_PACK_UTIL_ORACLE = f"""
    WITH t AS (SELECT doc_id,
                      (doc_id % {PACK_SHARDS}) AS shard,
                      len(regexp_extract_all(lower(text),
                                             '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT
                        AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, shard, n_tokens,
                 SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum
          FROM t),
    b AS (SELECT shard, ((cum - n_tokens) // {PACK_BUDGET}) AS bin,
                 COUNT(*)::BIGINT AS n_docs, SUM(n_tokens)::BIGINT AS toks
          FROM c GROUP BY 1, 2)
    SELECT shard::BIGINT AS shard,
           COUNT(*)::BIGINT AS n_bins,
           SUM(n_docs)::BIGINT AS n_docs,
           SUM(toks)::BIGINT AS n_tokens,
           CAST(SUM(toks) * 1000000 // (COUNT(*) * {PACK_BUDGET}) AS BIGINT)
             AS fill_pct_u6,
           MAX(toks)::BIGINT AS max_bin_tokens,
           MIN(toks)::BIGINT AS min_bin_tokens
    FROM b GROUP BY shard
    """


@query("pack_utilization_report", _PACK_UTIL_ORACLE)
def q_pack_utilization_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard packing QA: bins, docs, tokens, fill rate vs the
    {PACK_BUDGET}-token budget (integral micro-units) and the
    min/max bin loads. Same shard-partitioned cumsum as
    token_pack_bins (no global sort), one extra |bins|-sized
    aggregate on top."""
    from pyspark.sql import Window

    from .operators.textanalysis import token_count_bpe_ish

    docs = _spread(load_table(spark, sf_dir, "documents"))
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        token_count_bpe_ish("text").cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    b = (
        t.select(
            "shard",
            "n_tokens",
            F.floor(
                (F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_BUDGET
            ).alias("bin"),
        )
        .groupBy("shard", "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("toks"),
        )
    )
    return b.groupBy(F.col("shard").cast("bigint").alias("shard")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("toks").cast("bigint").alias("n_tokens"),
        F.expr(
            f"cast(sum(toks) * 1000000 div (count(1) * {PACK_BUDGET}) as bigint)"
        ).alias("fill_pct_u6"),
        F.max("toks").cast("bigint").alias("max_bin_tokens"),
        F.min("toks").cast("bigint").alias("min_bin_tokens"),
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility — the TOKENIZER-QA member of the text family
# (bpe_doc_token_counts counts one doc at a time; this reports the
# per-language ratios a tokenizer is judged on): subword tokens per
# whitespace word (fertility — high values mean the tokenizer
# fragments that language) and characters per subword token.
# ---------------------------------------------------------------------------

_FERTILITY_ORACLE = """
    WITH d AS (SELECT lang,
                      len(regexp_extract_all(lower(text),
                                             '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT
                        AS n_sub,
                      len(list_filter(string_split(lower(text), ' '),
                                      x -> x <> ''))::BIGINT AS n_words,
                      length(text)::BIGINT AS n_chars
               FROM documents)
    SELECT lang, COUNT(*)::BIGINT AS n_docs,
           SUM(n_sub)::BIGINT AS n_subwords,
           SUM(n_words)::BIGINT AS n_words,
           CAST(SUM(n_sub) * 1000000 // SUM(n_words) AS BIGINT)
             AS fertility_u6,
           CAST(SUM(n_chars) * 1000000 // SUM(n_sub) AS BIGINT)
             AS chars_per_token_u6
    FROM d GROUP BY lang
    """


@query("tokenizer_fertility", _FERTILITY_ORACLE)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language fertility of the BPE-ish tokenizer: subword count
    (the token_count_bpe_ish regex), whitespace word count and char
    count fold map-side into per-language sums; both ratios are
    integral micro-unit divisions. One scan, |langs| output rows."""
    from .operators.textanalysis import token_count_bpe_ish

    docs = _spread(load_table(spark, sf_dir, "documents"))
    d = docs.select(
        "lang",
        token_count_bpe_ish("text").cast("bigint").alias("n_sub"),
        F.size(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).cast("bigint").alias("n_words"),
        F.length("text").cast("bigint").alias("n_chars"),
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_sub").cast("bigint").alias("n_subwords"),
        F.sum("n_words").cast("bigint").alias("n_words"),
        F.expr("cast(sum(n_sub) * 1000000 div sum(n_words) as bigint)").alias(
            "fertility_u6"
        ),
        F.expr("cast(sum(n_chars) * 1000000 div sum(n_sub) as bigint)").alias(
            "chars_per_token_u6"
        ),
    )


# ---------------------------------------------------------------------------
# Boilerplate fraction — the INTER-document repetition member of the
# dedup family (doc_repetition measures repetition INSIDE a doc;
# duplicate_text_spans finds exact shared substrings; this scores how
# much of a doc is made of corpus-COMMON shingles — navigation chrome,
# license headers, templates — the CCNet/RefinedWeb boilerplate
# signal): a shingle is boilerplate when its document frequency
# reaches BP_MIN_DF documents — the absolute-count convention of the
# line-dedup/CCNet family (a template shared by 5 documents is
# boilerplate whether the corpus holds 10³ or 10⁹ docs; a RELATIVE
# threshold goes silent as the corpus grows) — and a doc's score is
# the fraction of its distinct shingles that are boilerplate.
# ---------------------------------------------------------------------------
BP_MIN_DF = 5


_BOILERPLATE_ORACLE = f"""
    WITH g AS (SELECT doc_id, unnest({_sql_shingles('text', 3)}) AS gram
               FROM documents),
    df AS (SELECT gram, COUNT(*)::BIGINT AS df FROM g GROUP BY gram),
    j AS (SELECT g.doc_id,
                 CASE WHEN df.df >= {BP_MIN_DF} THEN 1 ELSE 0 END AS is_bp
          FROM g JOIN df USING (gram))
    SELECT doc_id, COUNT(*)::BIGINT AS n_grams,
           CAST(SUM(is_bp) AS BIGINT) AS n_boilerplate,
           CAST(SUM(is_bp) * 1000000 // COUNT(*) AS BIGINT)
             AS boilerplate_u6
    FROM j GROUP BY doc_id
    """


@query("doc_boilerplate_fraction", _BOILERPLATE_ORACLE)
def q_doc_boilerplate_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc boilerplate score: distinct 3-word shingles explode
    once, the shingle→document-frequency table aggregates them once,
    and the equi-join back tags each doc shingle as boilerplate when
    df ≥ {BP_MIN_DF} (the absolute-count convention — a shared
    template is boilerplate at any corpus size). The df table is the postings-table shuffle shape every
    dedup sibling uses; nothing is quadratic. At 100 TB the df table
    is a standing index maintained additively like BM25 terms."""
    from .operators.dedup import shingles_from_text

    docs = _spread(load_table(spark, sf_dir, "documents"))
    g = docs.select(
        "doc_id", F.explode(shingles_from_text("text", 3)).alias("gram")
    ).localCheckpoint(eager=False)
    df = g.groupBy("gram").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    j = g.join(df, "gram").select(
        "doc_id",
        F.when(F.col("df") >= BP_MIN_DF, 1).otherwise(0).alias("is_bp"),
    )
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        F.sum("is_bp").cast("bigint").alias("n_boilerplate"),
        F.expr("cast(sum(is_bp) * 1000000 div count(1) as bigint)").alias(
            "boilerplate_u6"
        ),
    )


# ---------------------------------------------------------------------------
# Funnel latency — the HOW-FAST companion to event_funnel's how-many:
# per converting user, the time from the most recent qualifying view
# to their FIRST qualified click, summarized as exact rank-based
# percentiles (percentile_disc convention: the value at rank
# ⌈p·n⌉ — a real element, no interpolation, hence exact integers).
# ---------------------------------------------------------------------------

_FUNNEL_LAT_ORACLE = f"""
    WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) ts
               FROM events),
    q AS (SELECT *, MAX(CASE WHEN event_type = 'view' THEN ts END) OVER w
                      AS prior_view
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
    c AS (SELECT user_id, ts, event_id,
                 epoch_us(ts) - epoch_us(prior_view) AS lat_us
          FROM q
          WHERE event_type = 'click' AND prior_view IS NOT NULL
            AND prior_view >= ts - INTERVAL {{win}} MINUTES),
    f AS (SELECT user_id, lat_us,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM c),
    l AS (SELECT user_id, lat_us::BIGINT AS lat_us FROM f WHERE rn = 1),
    r AS (SELECT lat_us,
                 ROW_NUMBER() OVER (ORDER BY lat_us, user_id) AS rk,
                 COUNT(*) OVER () AS n
          FROM l)
    SELECT MAX(n)::BIGINT AS n_converters,
           MIN(lat_us)::BIGINT AS min_lat_us,
           MAX(CASE WHEN rk = (n * 50 + 99) // 100 THEN lat_us END)::BIGINT
             AS p50_lat_us,
           MAX(CASE WHEN rk = (n * 90 + 99) // 100 THEN lat_us END)::BIGINT
             AS p90_lat_us,
           MAX(lat_us)::BIGINT AS max_lat_us,
           (SUM(lat_us) // MAX(n))::BIGINT AS mean_lat_us
    FROM r
    """.replace("{win}", str(FUNNEL_WINDOW_MIN))


@query("funnel_conversion_latency", _FUNNEL_LAT_ORACLE)
def q_funnel_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→click conversion latency: the event_funnel qualifying rule
    verbatim (strictly-prior frame, deadline test), first qualified
    click per user, then exact discrete percentiles by rank over the
    |converters|-row latency table. Micros end to end — no division
    until the final integral mean."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w1 = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    q = ev.select(
        "*",
        F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w1)
        .alias("prior_view"),
    )
    c = q.filter(
        (F.col("event_type") == "click")
        & F.col("prior_view").isNotNull()
        & (
            F.col("prior_view")
            >= F.col("ts") - F.expr(f"interval {FUNNEL_WINDOW_MIN} minutes")
        )
    ).select(
        "user_id", "ts", "event_id",
        F.expr(
            "unix_micros(cast(ts as timestamp)) "
            "- unix_micros(cast(prior_view as timestamp))"
        ).alias("lat_us"),
    )
    f = c.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ),
    )
    l = f.filter(F.col("rn") == 1).select(
        "user_id", F.col("lat_us").cast("bigint").alias("lat_us")
    )
    r = l.select(
        "lat_us",
        F.row_number().over(Window.orderBy("lat_us", "user_id")).alias("rk"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    return r.agg(
        F.max("n").cast("bigint").alias("n_converters"),
        F.min("lat_us").cast("bigint").alias("min_lat_us"),
        F.expr(
            "cast(max(case when rk = (n * 50 + 99) div 100 then lat_us end) "
            "as bigint)"
        ).alias("p50_lat_us"),
        F.expr(
            "cast(max(case when rk = (n * 90 + 99) div 100 then lat_us end) "
            "as bigint)"
        ).alias("p90_lat_us"),
        F.max("lat_us").cast("bigint").alias("max_lat_us"),
        F.expr("cast(sum(lat_us) div max(n) as bigint)").alias("mean_lat_us"),
    )


# ---------------------------------------------------------------------------
# Median/MAD outliers — the ROBUST twin of user_value_outliers' mean
# z-test (one 10000× fat-finger event drags a user's mean AND sigma,
# masking itself; the median and the median-absolute-deviation don't
# move): per user, median event value, MAD, and the count of events
# beyond 3·MAD. Rank-based lower medians (the value at rank
# ⌈n/2⌉) keep every number an exact integer — two ranked passes, no
# interpolation — and the flag comparison is pure integer arithmetic.
# ---------------------------------------------------------------------------
MAD_K = 3


_MAD_ORACLE = f"""
    WITH e AS (SELECT user_id, event_id,
                      CAST(round(value * 100) AS BIGINT) AS v
               FROM events),
    r1 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY v, event_id) AS rk,
                     COUNT(*) OVER (PARTITION BY user_id) AS n
           FROM e),
    med AS (SELECT user_id, MAX(CASE WHEN rk = (n + 1) // 2 THEN v END)
                              ::BIGINT AS med_c
            FROM r1 GROUP BY user_id),
    d AS (SELECT e.user_id, e.event_id, e.v, med.med_c,
                 abs(e.v - med.med_c) AS ad
          FROM e JOIN med USING (user_id)),
    r2 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY ad, event_id) AS rk,
                     COUNT(*) OVER (PARTITION BY user_id) AS n
           FROM d),
    mad AS (SELECT user_id, MAX(CASE WHEN rk = (n + 1) // 2 THEN ad END)
                              ::BIGINT AS mad_c
            FROM r2 GROUP BY user_id)
    SELECT d.user_id, MAX(r2.n)::BIGINT AS n_events,
           MAX(d.med_c)::BIGINT AS median_c, MAX(mad.mad_c)::BIGINT AS mad_c,
           CAST(SUM(CASE WHEN d.ad > {MAD_K} * mad.mad_c THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM d JOIN mad USING (user_id)
           JOIN r2 ON r2.user_id = d.user_id AND r2.event_id = d.event_id
    GROUP BY d.user_id
    """


@query("user_value_mad_outliers", _MAD_ORACLE)
def q_user_value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user robust outlier counts: lower median of integer cents
    (rank ⌈n/2⌉ with event_id tie-break), MAD as the lower median of
    absolute deviations, flag |x − med| > {MAD_K}·MAD. Two
    user-partitioned rank windows on the SAME key partitioning (one
    shuffle reused), everything exact integers. The robust sibling of
    user_value_outliers — certified against the same events."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id",
        F.expr("cast(round(value * 100) as bigint)").alias("v"),
    )
    wu = Window.partitionBy("user_id")
    r1 = e.select(
        "*",
        F.row_number().over(wu.orderBy("v", "event_id")).alias("rk"),
        F.count(F.lit(1)).over(wu).alias("n"),
    )
    med = r1.groupBy("user_id").agg(
        F.expr("cast(max(case when rk = (n + 1) div 2 then v end) as bigint)")
        .alias("med_c")
    )
    d = e.join(med, "user_id").select(
        "user_id", "event_id", "v", "med_c",
        F.abs(F.col("v") - F.col("med_c")).alias("ad"),
    )
    # r2 feeds both the MAD aggregate and the final flag join —
    # materialize the windowed frame once instead of re-running the
    # rank window (and the events scan under it) per consumer
    r2 = d.select(
        "*",
        F.row_number().over(wu.orderBy("ad", "event_id")).alias("rk"),
        F.count(F.lit(1)).over(wu).alias("n"),
    ).localCheckpoint(eager=False)
    mad = r2.groupBy("user_id").agg(
        F.expr("cast(max(case when rk = (n + 1) div 2 then ad end) as bigint)")
        .alias("mad_c")
    )
    return (
        r2.join(mad, "user_id")
        .groupBy("user_id")
        .agg(
            F.max("n").cast("bigint").alias("n_events"),
            F.max("med_c").cast("bigint").alias("median_c"),
            F.max("mad_c").cast("bigint").alias("mad_c"),
            F.expr(
                f"cast(sum(case when ad > {MAD_K} * mad_c then 1 else 0 end) "
                "as bigint)"
            ).alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# Forecast interval coverage — the UNCERTAINTY member of the
# forecasting family (monthly_forecast_backtest scores point error;
# this asks whether a split-conformal interval actually covers):
# calibration months (first ⌈2n/3⌉ of the month spine) supply the
# naive/seasonal forecast residuals, whose discrete rank-⌈p·n⌉
# quantiles become the [lo, hi] interval offsets; the held-out
# months report empirical coverage. Everything rank-based and
# integer — the conformal guarantee (coverage ≥ nominal up to
# discreteness) is testable arithmetic, not a float approximation.
# ---------------------------------------------------------------------------

_FC_INTERVAL_ORACLE = """
    WITH rev AS (
      SELECT n.n_name AS nation, strftime(o.o_orderdate, '%Y-%m') AS m,
             SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))::BIGINT AS rev_c
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2),
    months AS (SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS m FROM orders),
    mr AS (SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS rk,
                  COUNT(*) OVER () AS n
           FROM months),
    cut AS (SELECT MAX(CASE WHEN rk = (2 * n + 2) // 3 THEN m END) AS cutoff
            FROM mr),
    spine AS (SELECT n.n_name AS nation, months.m
              FROM nation n CROSS JOIN months),
    s AS (SELECT spine.nation, spine.m, rev.rev_c,
                 LAG(rev.rev_c, 1) OVER w AS f1,
                 LAG(rev.rev_c, 12) OVER w AS f12
          FROM spine LEFT JOIN rev USING (nation, m)
          WINDOW w AS (PARTITION BY spine.nation ORDER BY spine.m)),
    u AS (SELECT nation, m, rev_c, 'naive1' AS model, f1 AS fc FROM s
          UNION ALL
          SELECT nation, m, rev_c, 'snaive12', f12 FROM s),
    v AS (SELECT u.*, cut.cutoff FROM u CROSS JOIN cut
          WHERE u.rev_c IS NOT NULL AND u.fc IS NOT NULL),
    calq AS (SELECT model, r AS res,
                    ROW_NUMBER() OVER (PARTITION BY model ORDER BY r) AS rk,
                    COUNT(*) OVER (PARTITION BY model) AS n
             FROM (SELECT model, rev_c - fc AS r FROM v WHERE m <= cutoff)),
    q AS (SELECT model, MAX(n)::BIGINT AS n_cal,
                 MAX(CASE WHEN rk = (n * 10 + 99) // 100 THEN res END)
                   ::BIGINT AS lo_c,
                 MAX(CASE WHEN rk = (n * 90 + 99) // 100 THEN res END)
                   ::BIGINT AS hi_c
          FROM calq GROUP BY model),
    ev AS (SELECT v.model, v.rev_c - v.fc AS r FROM v WHERE v.m > v.cutoff)
    SELECT q.model, q.n_cal, COUNT(*)::BIGINT AS n_eval, q.lo_c, q.hi_c,
           CAST(SUM(CASE WHEN ev.r BETWEEN q.lo_c AND q.hi_c
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
           CAST(SUM(CASE WHEN ev.r BETWEEN q.lo_c AND q.hi_c
                         THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS coverage_u6
    FROM ev JOIN q USING (model)
    GROUP BY q.model, q.n_cal, q.lo_c, q.hi_c
    """


@query("forecast_interval_coverage", _FC_INTERVAL_ORACLE)
def q_forecast_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal check of the backtest's two baselines: pooled
    calibration residuals (months up to the ⌈2n/3⌉ cutoff) give
    discrete p10/p90 offsets; held-out months report how often the
    actual lands inside. Same spine/lag discipline as the backtest;
    the quantile table is 2 rows and broadcasts onto the eval slice."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            F.date_format("o_orderdate", "yyyy-MM").alias("m"),
            F.expr("cast(floor(o_totalprice * 100) as bigint)").alias("p_c"),
        )
        .groupBy("nation", "m")
        .agg(F.sum("p_c").cast("bigint").alias("rev_c"))
    )
    months = orders.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("m")
    ).distinct().localCheckpoint(eager=False)
    mr = months.select(
        "m",
        F.row_number().over(Window.orderBy("m")).alias("rk"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    cut = mr.agg(
        F.expr("max(case when rk = (2 * n + 2) div 3 then m end)").alias("cutoff")
    )
    spine = nat.select(F.col("n_name").alias("nation")).crossJoin(
        F.broadcast(months)
    )
    w = Window.partitionBy("nation").orderBy("m")
    s = spine.join(rev, ["nation", "m"], "left").select(
        "nation", "m", "rev_c",
        F.lag("rev_c", 1).over(w).alias("f1"),
        F.lag("rev_c", 12).over(w).alias("f12"),
    )
    u = s.select(
        "nation", "m", "rev_c", F.lit("naive1").alias("model"),
        F.col("f1").alias("fc"),
    ).unionByName(
        s.select(
            "nation", "m", "rev_c", F.lit("snaive12").alias("model"),
            F.col("f12").alias("fc"),
        )
    )
    v = (
        u.filter(F.col("rev_c").isNotNull() & F.col("fc").isNotNull())
        .crossJoin(F.broadcast(cut))
        .localCheckpoint(eager=False)
    )
    calq = v.filter(F.col("m") <= F.col("cutoff")).select(
        "model", (F.col("rev_c") - F.col("fc")).alias("res")
    ).select(
        "model", "res",
        F.row_number().over(
            Window.partitionBy("model").orderBy("res")
        ).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("model")).alias("n"),
    )
    q = calq.groupBy("model").agg(
        F.max("n").cast("bigint").alias("n_cal"),
        F.expr(
            "cast(max(case when rk = (n * 10 + 99) div 100 then res end) "
            "as bigint)"
        ).alias("lo_c"),
        F.expr(
            "cast(max(case when rk = (n * 90 + 99) div 100 then res end) "
            "as bigint)"
        ).alias("hi_c"),
    )
    ev = v.filter(F.col("m") > F.col("cutoff")).select(
        "model", (F.col("rev_c") - F.col("fc")).alias("r")
    )
    return (
        ev.join(F.broadcast(q), "model")
        .groupBy("model", "n_cal", "lo_c", "hi_c")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval"),
            F.expr(
                "cast(sum(case when r between lo_c and hi_c then 1 else 0 end) "
                "as bigint)"
            ).alias("n_covered"),
            F.expr(
                "cast(sum(case when r between lo_c and hi_c then 1 else 0 end) "
                "* 1000000 div count(1) as bigint)"
            ).alias("coverage_u6"),
        )
        .select(
            "model", "n_cal", "n_eval", "lo_c", "hi_c", "n_covered",
            "coverage_u6",
        )
    )


# ---------------------------------------------------------------------------
# Degree assortativity — the MIXING-PATTERN member of the graph
# family (triangles measure local cohesion; this asks whether hubs
# attach to hubs or to leaves — the single number that most shapes
# how the co-purchase graph percolates): Pearson correlation of
# endpoint degrees over the symmetrized edge list. Symmetrization
# makes the two marginals IDENTICAL, so Pearson's sqrt cancels:
# r = (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²) — one integral micro-unit
# division of exact widened integers, no transcendentals at all.
# ---------------------------------------------------------------------------

_ASSORT_ORACLE = f"""
    WITH op AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    und AS MATERIALIZED (
      SELECT u, v FROM (
        SELECT a.pk AS u, b.pk AS v, COUNT(*) AS c
        FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY 1, 2)
      WHERE c >= {TRI_MIN_SUPPORT}),
    e AS (SELECT u AS src, v AS dst FROM und
          UNION ALL SELECT v, u FROM und),
    deg AS (SELECT src AS node, COUNT(*)::BIGINT AS d FROM e GROUP BY 1),
    p AS (SELECT da.d AS x, db.d AS y
          FROM e JOIN deg da ON da.node = e.src
                 JOIN deg db ON db.node = e.dst),
    a AS (SELECT COUNT(*)::HUGEINT AS m,
                 SUM(CAST(x AS HUGEINT)) AS sx,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx,
                 SUM(CAST(x AS HUGEINT) * y) AS sxy
          FROM p)
    SELECT (SELECT COUNT(*) FROM deg)::BIGINT AS n_nodes,
           CAST(m / 2 AS BIGINT) AS n_edges,
           CAST((m * sxy - sx * sx) * 1000000
                // (m * sxx - sx * sx) AS BIGINT) AS assortativity_u6
    FROM a
    """


@query("copurchase_assortativity", _ASSORT_ORACLE)
def q_copurchase_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the support-pruned co-purchase graph
    (same graph as triangles/PPR/BFS): degrees from the symmetrized
    edge list, one broadcast-degree join onto the edges, one widened
    integer fold. Negative values = hub-and-spoke mixing (hubs attach
    to leaves), positive = core-periphery. Everything after the
    basket expansion is edge-table-sized."""
    op = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    b = op.select(F.col("ok"), F.col("pk").alias("pb"))
    und = (
        op.join(b, (op["ok"] == b["ok"]) & (op["pk"] < b["pb"]))
        .groupBy(F.col("pk").alias("u"), F.col("pb").alias("v"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= TRI_MIN_SUPPORT)
        .select("u", "v")
    )
    e = und.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionByName(
        und.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    ).localCheckpoint(eager=False)
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    ).localCheckpoint(eager=False)
    da = deg.select(F.col("node").alias("src"), F.col("d").alias("x"))
    db = deg.select(F.col("node").alias("dst"), F.col("d").alias("y"))
    p = e.join(F.broadcast(da), "src").join(F.broadcast(db), "dst")
    a = p.agg(
        F.expr("cast(count(1) as decimal(38,0))").alias("m"),
        F.expr("sum(cast(x as decimal(38,0)))").alias("sx"),
        F.expr("sum(cast(x as decimal(38,0)) * x)").alias("sxx"),
        F.expr("sum(cast(x as decimal(38,0)) * y)").alias("sxy"),
    )
    n = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    return n.crossJoin(F.broadcast(a)).select(
        "n_nodes",
        F.expr("cast(m / 2 as bigint)").alias("n_edges"),
        F.expr(
            "cast((m * sxy - sx * sx) * 1000000 div (m * sxx - sx * sx) "
            "as bigint)"
        ).alias("assortativity_u6"),
    )


# ---------------------------------------------------------------------------
# Lorenz deciles — the CURVE the Gini coefficient summarizes
# (nation_revenue_gini reports the area number; this reports the ten
# points a dashboard actually plots): per nation, customers ascend by
# lifetime revenue into NTILE(10) deciles, each row giving the
# decile's share and the cumulative share below-and-including it.
# ---------------------------------------------------------------------------

_LORENZ_ORACLE = """
    WITH x AS MATERIALIZED (
      SELECT n.n_name AS nation, c.c_custkey,
             COALESCE(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT)), 0)
               ::BIGINT AS rev_c
      FROM customer c
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    t AS (SELECT nation, rev_c,
                 NTILE(10) OVER (PARTITION BY nation
                                 ORDER BY rev_c, c_custkey) AS decile
          FROM x),
    g AS (SELECT nation, decile, COUNT(*)::BIGINT AS n_cust,
                 SUM(rev_c)::BIGINT AS rev_c
          FROM t GROUP BY 1, 2),
    w AS (SELECT *,
                 SUM(rev_c) OVER (PARTITION BY nation ORDER BY decile
                                  ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_c,
                 SUM(rev_c) OVER (PARTITION BY nation)::BIGINT AS tot_c
          FROM g)
    SELECT nation, decile::BIGINT AS decile, n_cust, rev_c,
           CAST(rev_c * 1000000 // tot_c AS BIGINT) AS share_u6,
           CAST(cum_c * 1000000 // tot_c AS BIGINT) AS cum_share_u6
    FROM w
    """


@query("nation_lorenz_deciles", _LORENZ_ORACLE)
def q_nation_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ten Lorenz-curve points per nation over customer lifetime
    revenue (zero-order customers included at zero, the
    nation_revenue_gini population verbatim — the two queries plot and
    summarize the SAME curve): total-order NTILE(10), decile
    aggregate, nation-partitioned cumulative share in integral
    micro-units. Windows order customer-level rows only."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    x = (
        cust.join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy(F.col("n_name").alias("nation"), "c_custkey")
        .agg(
            F.expr(
                "cast(coalesce(sum(cast(floor(o_totalprice * 100) as bigint)), 0)"
                " as bigint)"
            ).alias("rev_c")
        )
    )
    t = x.select(
        "nation", "rev_c",
        F.ntile(10).over(
            Window.partitionBy("nation").orderBy("rev_c", "c_custkey")
        ).cast("bigint").alias("decile"),
    )
    g = t.groupBy("nation", "decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cust"),
        F.sum("rev_c").cast("bigint").alias("rev_c"),
    )
    wn = Window.partitionBy("nation")
    w = g.select(
        "*",
        F.sum("rev_c").over(
            wn.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
        ).cast("bigint").alias("cum_c"),
        F.sum("rev_c").over(wn).cast("bigint").alias("tot_c"),
    )
    return w.select(
        "nation", "decile", "n_cust", "rev_c",
        F.expr("cast(rev_c * 1000000 div tot_c as bigint)").alias("share_u6"),
        F.expr("cast(cum_c * 1000000 div tot_c as bigint)").alias(
            "cum_share_u6"
        ),
    )


# ---------------------------------------------------------------------------
# Grouped OLS — regression PER KEY as a pure aggregate (theilsen/zipf
# fit one global line; real feature pipelines fit thousands of
# per-segment lines in one pass): quantity-on-discount slope per part
# type, the "does a deeper discount move volume for THIS category"
# table. Five widened integer sums per group, one integral division —
# a grouped regression with zero iterations and zero floats.
# ---------------------------------------------------------------------------

_ELASTICITY_ORACLE = """
    WITH j AS (SELECT p.p_type AS ptype,
                      CAST(round(l.l_discount * 100) AS BIGINT) AS d_pct,
                      CAST(l.l_quantity AS BIGINT) AS qty
               FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    a AS (SELECT ptype, COUNT(*)::HUGEINT AS n,
                 SUM(CAST(d_pct AS HUGEINT)) AS sx,
                 SUM(CAST(qty AS HUGEINT)) AS sy,
                 SUM(CAST(d_pct AS HUGEINT) * qty) AS sxy,
                 SUM(CAST(d_pct AS HUGEINT) * d_pct) AS sxx
          FROM j GROUP BY ptype)
    SELECT ptype, CAST(n AS BIGINT) AS n_items,
           CAST((n * sxy - sx * sy) * 1000000
                // (n * sxx - sx * sx) AS BIGINT) AS slope_u6,
           CAST((sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx)
                // (n * (n * sxx - sx * sx)) AS BIGINT) AS intercept_u6
    FROM a WHERE n * sxx - sx * sx <> 0
    """


@query("discount_quantity_elasticity", _ELASTICITY_ORACLE)
def q_discount_quantity_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part-type OLS of quantity on discount points: one broadcast
    dim join, five map-side integer sums per group, slope and
    intercept as integral micro-unit divisions (degenerate
    zero-variance groups drop). The grouped-regression shape — every
    group fits in the same single shuffle an ordinary aggregate
    costs."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr("cast(round(l_discount * 100) as bigint)").alias("d_pct"),
        F.expr("cast(l_quantity as bigint)").alias("qty"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"]).select(
        F.col("p_type").alias("ptype"), "d_pct", "qty"
    )
    a = j.groupBy("ptype").agg(
        F.expr("cast(count(1) as decimal(38,0))").alias("n"),
        F.expr("sum(cast(d_pct as decimal(38,0)))").alias("sx"),
        F.expr("sum(cast(qty as decimal(38,0)))").alias("sy"),
        F.expr("sum(cast(d_pct as decimal(38,0)) * qty)").alias("sxy"),
        F.expr("sum(cast(d_pct as decimal(38,0)) * d_pct)").alias("sxx"),
    )
    return a.filter(F.expr("n * sxx - sx * sx <> 0")).select(
        "ptype",
        F.expr("cast(n as bigint)").alias("n_items"),
        F.expr(
            "cast((n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx) "
            "as bigint)"
        ).alias("slope_u6"),
        F.expr(
            "cast((sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx) "
            "div (n * (n * sxx - sx * sx)) as bigint)"
        ).alias("intercept_u6"),
    )


# ---------------------------------------------------------------------------
# Bounce rate — the QUALITY number over the sessionization family
# (session_30m builds sessions, peak_concurrent_sessions measures
# load; this measures engagement): per session-start day, how many
# sessions were single-event bounces.
# ---------------------------------------------------------------------------

_BOUNCE_ORACLE = """
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts FROM events),
    m AS (SELECT *, CASE WHEN LAG(ts) OVER w IS NULL
                          OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                         THEN 1 ELSE 0 END AS new_s
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    s0 AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
           FROM m),
    s AS (SELECT user_id, sid, MIN(ts) AS a0, COUNT(*)::BIGINT AS n_ev
          FROM s0 GROUP BY 1, 2)
    SELECT strftime(CAST(a0 AS DATE), '%Y-%m-%d') AS day,
           COUNT(*)::BIGINT AS n_sessions,
           CAST(SUM(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           CAST(SUM(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS bounce_u6
    FROM s GROUP BY 1
    """


@query("daily_bounce_rate", _BOUNCE_ORACLE)
def q_daily_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per start-day bounce rate of 30-minute sessions (the same
    F.session_window op the family shares): single-event sessions over
    all sessions, integral micro-units. One user-key shuffle for the
    session build, one day aggregate."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.min("ts").alias("a0"), F.count(F.lit(1)).cast("bigint").alias("n_ev"))
        .drop("w", "user_id")
    )
    return s.groupBy(
        F.date_format(F.to_date("a0"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.expr(
            "cast(sum(case when n_ev = 1 then 1 else 0 end) as bigint)"
        ).alias("n_bounces"),
        F.expr(
            "cast(sum(case when n_ev = 1 then 1 else 0 end) * 1000000 "
            "div count(1) as bigint)"
        ).alias("bounce_u6"),
    )


# ---------------------------------------------------------------------------
# Day-of-week seasonality — the CALENDAR member of the time-series
# family (LOCF fills gaps, the backtest scores models; this measures
# the weekly rhythm those models must beat): revenue share per
# weekday vs the uniform 1/7, as a seasonality index. Weekday comes
# from PURE DATE ARITHMETIC — days since a known Monday, mod 7 —
# because the engines' dayofweek()/strftime conventions differ
# (Sunday=1 vs Sunday=0) while integer datediff does not.
# ---------------------------------------------------------------------------

_DOW_ANCHOR = "1990-01-01"  # a Monday; fixture dates all follow it
_DOW_NAMES = (
    "CASE dow WHEN 0 THEN 'Mon' WHEN 1 THEN 'Tue' WHEN 2 THEN 'Wed' "
    "WHEN 3 THEN 'Thu' WHEN 4 THEN 'Fri' WHEN 5 THEN 'Sat' "
    "WHEN 6 THEN 'Sun' END"
)

_DOW_ORACLE = f"""
    WITH o AS (SELECT date_diff('day', DATE '{_DOW_ANCHOR}',
                                CAST(o_orderdate AS DATE)) % 7 AS dow,
                      CAST(floor(o_totalprice * 100) AS BIGINT) AS rev_c
               FROM orders),
    g AS (SELECT dow, COUNT(*)::BIGINT AS n_orders,
                 SUM(rev_c)::BIGINT AS rev_c
          FROM o GROUP BY dow)
    SELECT dow::BIGINT AS dow, {_DOW_NAMES} AS dow_name, n_orders, rev_c,
           CAST(rev_c * 1000000 // SUM(rev_c) OVER () AS BIGINT) AS share_u6,
           CAST(rev_c * 7000000 // SUM(rev_c) OVER () AS BIGINT) AS index_u6
    FROM g
    """


@query("dow_revenue_seasonality", _DOW_ORACLE)
def q_dow_revenue_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday revenue profile: dow = datediff from the {_DOW_ANCHOR}
    Monday mod 7 (convention-free across engines), revenue share and
    the ×7 seasonality index in integral micro-units (10⁶ = exactly
    uniform). One scan, a 7-row aggregate, a tiny window."""
    o = load_table(spark, sf_dir, "orders").select(
        F.expr(
            f"datediff(to_date(o_orderdate), date'{_DOW_ANCHOR}') % 7"
        ).alias("dow"),
        F.expr("cast(floor(o_totalprice * 100) as bigint)").alias("rev_c"),
    )
    g = o.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("rev_c").cast("bigint").alias("rev_c"),
    )
    return g.select(
        F.col("dow").cast("bigint").alias("dow"),
        F.expr(_DOW_NAMES).alias("dow_name"),
        "n_orders",
        "rev_c",
        F.expr("cast(rev_c * 1000000 div sum(rev_c) over () as bigint)").alias(
            "share_u6"
        ),
        F.expr("cast(rev_c * 7000000 div sum(rev_c) over () as bigint)").alias(
            "index_u6"
        ),
    )


# ---------------------------------------------------------------------------
# Point-in-time SCD2 probe — the READ side of scd2_priority_history
# (building the dimension is half the pattern; the Kimball payoff is
# joining facts to the version that was CURRENT at fact time): each
# shipment joins its customer's priority segment valid at ship date.
# Spark-first shape: equi-join on the customer key (fan-out = that
# customer's few segments), then the [valid_from, valid_to) range
# filter — never a blind non-equi join. A fact dated BEFORE the
# customer's first segment has no valid dimension row and drops (the
# Kimball "unknown member" case — this fixture's synthetic ship dates
# can precede the order date); everything else matches EXACTLY one
# segment, the conservation law the test pins.
# ---------------------------------------------------------------------------

_SCD2_PIT_ORACLE = """
    WITH o AS (SELECT o_custkey, o_orderkey,
                      o_orderpriority AS priority,
                      CAST(o_orderdate AS DATE) AS d
               FROM orders),
    s AS (SELECT *, CASE WHEN LAG(priority) OVER
                      (PARTITION BY o_custkey ORDER BY d, o_orderkey)
                      IS DISTINCT FROM priority THEN 1 ELSE 0 END AS chg
          FROM o),
    g AS (SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                                   ORDER BY d, o_orderkey
                                   ROWS UNBOUNDED PRECEDING) AS seg
          FROM s),
    dim AS (SELECT o_custkey, seg, priority, MIN(d) AS vf
            FROM g GROUP BY o_custkey, seg, priority),
    dim2 AS (SELECT o_custkey, priority, vf,
                    COALESCE(LEAD(vf) OVER (PARTITION BY o_custkey
                                            ORDER BY seg),
                             DATE '9999-12-31') AS vt
             FROM dim),
    f AS (SELECT o.o_custkey, CAST(l.l_shipdate AS DATE) AS ship_d,
                 CAST(l.l_quantity AS BIGINT) AS qty,
                 CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS price_c
          FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
    SELECT d.priority AS priority_at_ship,
           COUNT(*)::BIGINT AS n_items,
           SUM(f.qty)::BIGINT AS total_qty,
           SUM(f.price_c)::BIGINT AS total_price_c
    FROM f JOIN dim2 d ON d.o_custkey = f.o_custkey
                      AND f.ship_d >= d.vf AND f.ship_d < d.vt
    GROUP BY 1
    """


@query("scd2_point_in_time_shipments", _SCD2_PIT_ORACLE)
def q_scd2_point_in_time_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipment volume by the priority that was CURRENT for the
    customer at ship time: the scd2_priority_history dimension
    verbatim ([valid_from, valid_to) half-open intervals, 9999-12-31
    sentinel), probed by lineitem ship dates through an equi-join on
    the customer key with the range test as a post-filter; facts
    predating the customer's history drop (unknown member). One
    customer-keyed shuffle each side; the fan-out is bounded by
    segments-per-customer, never |dim|."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("d"),
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    s = o.withColumn(
        "chg",
        F.when(
            F.lag("priority").over(w).eqNullSafe(F.col("priority")), F.lit(0)
        ).otherwise(F.lit(1)),
    )
    g = s.withColumn(
        "seg", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    dim = g.groupBy("o_custkey", "seg", "priority").agg(F.min("d").alias("vf"))
    dim2 = dim.select(
        "o_custkey", "priority", "vf",
        F.coalesce(
            F.lead("vf").over(Window.partitionBy("o_custkey").orderBy("seg")),
            F.lit("9999-12-31").cast("date"),
        ).alias("vt"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.to_date("l_shipdate").alias("ship_d"),
        F.expr("cast(l_quantity as bigint)").alias("qty"),
        F.expr("cast(floor(l_extendedprice * 100) as bigint)").alias("price_c"),
    )
    okeys = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    f = li.join(okeys, li["l_orderkey"] == okeys["o_orderkey"]).select(
        "o_custkey", "ship_d", "qty", "price_c"
    )
    j = f.join(
        dim2,
        (f["o_custkey"] == dim2["o_custkey"])
        & (F.col("ship_d") >= F.col("vf"))
        & (F.col("ship_d") < F.col("vt")),
    )
    return j.groupBy(F.col("priority").alias("priority_at_ship")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum("qty").cast("bigint").alias("total_qty"),
        F.sum("price_c").cast("bigint").alias("total_price_c"),
    )


# ---------------------------------------------------------------------------
# Order inter-arrival — the REPURCHASE-CADENCE member of the
# behavioral family (RFM scores recency once; this measures the whole
# gap distribution): per market segment, discrete percentiles of the
# days between a customer's consecutive orders. The number a
# replenishment/retention team sets reminder windows by.
# ---------------------------------------------------------------------------

_INTERARRIVAL_ORACLE = """
    WITH o AS (SELECT c.c_mktsegment AS segment, o.o_custkey,
                      CAST(o.o_orderdate AS DATE) AS d, o.o_orderkey
               FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
    g AS (SELECT segment, o_custkey,
                 date_diff('day',
                           LAG(d) OVER (PARTITION BY o_custkey
                                        ORDER BY d, o_orderkey),
                           d)::BIGINT AS gap_d
          FROM o),
    l AS (SELECT segment, gap_d FROM g WHERE gap_d IS NOT NULL),
    r AS (SELECT segment, gap_d,
                 ROW_NUMBER() OVER (PARTITION BY segment
                                    ORDER BY gap_d) AS rk,
                 COUNT(*) OVER (PARTITION BY segment) AS n
          FROM l)
    SELECT segment, MAX(n)::BIGINT AS n_gaps,
           MIN(gap_d)::BIGINT AS min_gap_d,
           MAX(CASE WHEN rk = (n * 50 + 99) // 100 THEN gap_d END)::BIGINT
             AS p50_gap_d,
           MAX(CASE WHEN rk = (n * 90 + 99) // 100 THEN gap_d END)::BIGINT
             AS p90_gap_d,
           MAX(gap_d)::BIGINT AS max_gap_d,
           (SUM(gap_d) // MAX(n))::BIGINT AS mean_gap_d
    FROM r GROUP BY segment
    """


@query("segment_order_interarrival", _INTERARRIVAL_ORACLE)
def q_segment_order_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days between consecutive orders per customer (lag within the
    customer's date-ordered stream, orderkey tie-break), summarized
    per segment at exact discrete rank-⌈p·n⌉ percentiles. The lag
    window keys by customer, the percentile window by segment —
    both natural partitionings, no global sort; the gap ordering
    inside a segment is value-based, so equal gaps permute freely
    without touching any output."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.to_date("o_orderdate").alias("d")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    o = orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]).select(
        F.col("c_mktsegment").alias("segment"), "o_custkey", "d", "o_orderkey"
    )
    wl = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    l = o.select(
        "segment",
        F.datediff("d", F.lag("d").over(wl)).cast("bigint").alias("gap_d"),
    ).filter(F.col("gap_d").isNotNull())
    ws = Window.partitionBy("segment")
    r = l.select(
        "segment", "gap_d",
        F.row_number().over(ws.orderBy("gap_d")).alias("rk"),
        F.count(F.lit(1)).over(ws).alias("n"),
    )
    return r.groupBy("segment").agg(
        F.max("n").cast("bigint").alias("n_gaps"),
        F.min("gap_d").cast("bigint").alias("min_gap_d"),
        F.expr(
            "cast(max(case when rk = (n * 50 + 99) div 100 then gap_d end) "
            "as bigint)"
        ).alias("p50_gap_d"),
        F.expr(
            "cast(max(case when rk = (n * 90 + 99) div 100 then gap_d end) "
            "as bigint)"
        ).alias("p90_gap_d"),
        F.max("gap_d").cast("bigint").alias("max_gap_d"),
        F.expr("cast(sum(gap_d) div max(n) as bigint)").alias("mean_gap_d"),
    )
