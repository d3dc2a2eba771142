"""Synthetic corpus source — Spark 4 Python Data Source API.

`spark.read.format("synthetic_docs").option("rows", N)` generates a
deterministic documents-shaped corpus DISTRIBUTED (each input
partition generates its own slice in the executor — no driver
materialization, no stored fixture), which is how you load-test a
100 TB pipeline shape without 100 TB of storage: the generator is the
scan. Determinism: every field is a pure function of doc_id (md5-
seeded), so two reads — or a retried task — produce identical rows.

This is the engine-extension face of SURVEY §2.1's source family: the
same DataSource V2 surface a real connector (warehouse export, feed
API) plugs into, exercised end-to-end through Spark's planner rather
than mocked.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"
_LANGS = ["en", "es", "de", "fr"]
_WORDS = [
    "data", "model", "spark", "query", "join", "filter", "token",
    "vector", "index", "batch", "stream", "shard", "merge", "scan",
]


def _h(doc_id: int, salt: str) -> int:
    """Stable integer from (salt, doc_id) — same md5 trick as
    operators/sampling.hash_bucket, driver- and executor-agnostic."""
    return int(
        hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()[:8], 16
    )


def synth_row(doc_id: int, vocab: int = 0, words_max: int = 24) -> tuple:
    """One deterministic documents-shaped row. ``vocab=0`` (default)
    keeps the legacy 14-word lexicon; ``vocab=N`` draws from an
    N-word synthetic lexicon instead — the scale-stress knob
    (bench_scale.py): a tiny lexicon makes every doc a near-dup of
    every other, which is a spam-corpus stress case, while a few
    thousand words reproduces a realistic near-dup RATE that should
    stay flat as the corpus grows."""
    n_words = 5 + _h(doc_id, "len") % max(1, words_max - 4)
    if vocab:
        # ~1/3 English stopwords so lang-ID / quality / BPE behave
        # like a real corpus (an all-synthetic lexicon classifies as
        # no language and a curation pipeline selects nothing)
        _SW = ["the", "and", "of", "to", "in", "is", "that", "a"]
        words = [
            _SW[_h(doc_id * 1000 + i, "sw") % len(_SW)]
            if _h(doc_id * 1000 + i, "mix") % 3 == 0
            else f"w{_h(doc_id * 1000 + i, 'w') % vocab}"
            for i in range(n_words)
        ]
    else:
        words = [
            _WORDS[_h(doc_id * 1000 + i, "w") % len(_WORDS)]
            for i in range(n_words)
        ]
    # a controlled exact-dup rate at ANY vocab: ~10% of docs clone a
    # smaller doc's text verbatim (pure function of doc_id, so the
    # rate is scale-invariant by construction)
    if vocab and doc_id and _h(doc_id, "dup") % 10 == 0:
        src_row = synth_row(_h(doc_id, "dupof") % doc_id, vocab, words_max)
        return (doc_id,) + src_row[1:]
    # ... and a ~10% NEAR-clone rate (source text with one word
    # mutated) so LSH near-dup work is realistic and scale-invariant
    if vocab and doc_id and _h(doc_id, "dup") % 10 == 5:
        src_id = _h(doc_id, "nearof") % doc_id
        src = synth_row(src_id, vocab, words_max)
        toks = src[1].split(" ")
        toks[_h(doc_id, "pos") % len(toks)] = f"w{_h(doc_id, 'mut') % vocab}"
        text = " ".join(toks)
        return (doc_id, text, src[2], src[3], len(text))
    text = " ".join(words)
    lang = _LANGS[_h(doc_id, "lang") % len(_LANGS)]
    source = f"src{_h(doc_id, 'src') % 5}"
    return (doc_id, text, lang, source, len(text))


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.vocab = int(options.get("vocab", 0))
        self.words_max = int(options.get("words_max", 24))

    def partitions(self):
        per = max(1, -(-self.rows // self.n_parts))  # ceil
        return [
            _Slice(i, min(i + per, self.rows))
            for i in range(0, self.rows, per)
        ]

    def read(self, partition: _Slice):
        for doc_id in range(partition.start, partition.end):
            yield synth_row(doc_id, self.vocab, self.words_max)


class SyntheticDocsDataSource(DataSource):
    """format("synthetic_docs"): options rows (default 1000),
    partitions (default 8 — at scale, one per target task), vocab
    (0 = legacy 14-word lexicon; N = N-word synthetic lexicon with a
    scale-invariant ~10% exact-clone rate) and words_max."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the synthetic_docs format."""
    spark.dataSource.register(SyntheticDocsDataSource)
