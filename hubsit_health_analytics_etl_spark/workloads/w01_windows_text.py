"""Time windows over events; language-ID / quality / curation / repetition / PII-scrub text analysis.

Mechanical split of the former single-file EXT workload (VERDICT r13
#2); registration ORDER is load-bearing — modules import in sequence
via ``workloads/__init__.py`` so the ``@query`` registry is unchanged.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403


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
    from ..operators.textanalysis import annotate_documents

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
    from ..operators.textanalysis import annotate_documents

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
    from ..operators.dedup import _spread
    from ..operators.textanalysis import repetition_fraction, token_count_ws

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
    from ..operators.dedup import _spread
    from ..operators.textanalysis import pii_scrub

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


