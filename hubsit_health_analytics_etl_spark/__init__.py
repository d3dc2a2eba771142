"""PySpark-native analytics engine with the query/data-processing
capabilities of Brenezes/HubSit-Health-Analytics-ETL.

The reference (/root/reference) is a single-machine eager pandas ETL
(src/etl_pipeline.py) plus one upstream PySpark pseudonymization job
(src/Criptografia.py). This package re-expresses every operator it
implements (SURVEY.md §2) as schema-agnostic, distributed-safe PySpark
DataFrame builders, and extends them with the large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, time windows) the reference lacks.

Design stance (SURVEY.md §7.0):
- DataFrame API everywhere; zero row-at-a-time Python UDFs in the core.
- All "now"-dependent logic takes an explicit ``as_of`` literal.
- Every operator is registered as a named query in ``__spark_entry__``
  with a DuckDB oracle twin.
"""

__version__ = "0.1.0"

# Lazy top-level API (PEP 562): the common entry points importable as
# `from hubsit_health_analytics_etl_spark import run_pipeline, ...`
# without paying the pyspark import chain until first attribute use.
_EXPORTS = {
    # session / pipeline
    "get_spark": ".session",
    "run_pipeline": ".etl.appointments",
    "preprocess": ".etl.appointments",
    "gerar_tabelas": ".etl.appointments",
    "gerar_relatorio_completo": ".etl.relatorio",
    # sources / sinks
    "read_csv_tolerant": ".sources.csv_tolerant",
    "read_optional_csv": ".sources.csv_tolerant",
    "load_table": ".sources.parquet",
    "write_parquet": ".sources.sinks",
    "write_csv_pbi": ".sources.sinks",
    # dedup / similarity
    "exact_dedup": ".operators.dedup",
    "minhash_candidates": ".operators.dedup",
    "simhash32": ".operators.dedup",
    "ngram_jaccard_pairs": ".operators.dedup",
    "dedup_clusters": ".operators.clusters",
    "connected_components": ".operators.clusters",
    "winnowed_fingerprints": ".operators.textanalysis",
    "winnow_candidate_pairs": ".operators.textanalysis",
    "brute_force_topk": ".operators.similarity",
    "lsh_bucket_topk": ".operators.similarity",
    "ivf_topk": ".operators.similarity",
    "kmeans_centroids": ".operators.similarity",
    # joins
    "lookup_join": ".operators.joins",
    "anti_join": ".operators.joins",
    "asof_join_backward": ".operators.asof",
    "range_join": ".operators.rangejoin",
    # sampling / skew
    "hash_sample": ".operators.sampling",
    "train_test_split": ".operators.sampling",
    "salted_agg": ".operators.skew",
    # streaming
    "tumbling_agg": ".streaming.windows",
    "sliding_agg": ".streaming.windows",
    "session_agg": ".streaming.windows",
    "streaming_exact_dedup": ".streaming.dedup",
    "streaming_dedup_by_fingerprint": ".streaming.dedup",
    "upsert_sink": ".streaming.sinks",
    "interval_join": ".streaming.joins",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name: str):
    if name in _EXPORTS:
        import importlib

        mod = importlib.import_module(_EXPORTS[name], __name__)
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))
