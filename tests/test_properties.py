"""Property-based tests (hypothesis): engine expression builders vs
independent Python reference implementations, evaluated in one
DataFrame batch per property run."""

from __future__ import annotations

import math
import re
import unicodedata

import pytest
import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_normalize_key(s: str) -> str:
    s = s.upper()
    s = "".join(
        c for c in unicodedata.normalize("NFD", s) if not unicodedata.combining(c)
    )
    s = re.sub(r"[^A-Z0-9 ]", "", s)
    return re.sub(r" +", " ", s.strip())


@given(
    st.lists(
        st.text(
            alphabet="aáàâãbcçdeéêfgihíjklmnñoóôõpqrstuúüvwxyzAÁBCÇ -_.123!  ",
            max_size=30,
        ),
        min_size=1,
        max_size=30,
    )
)
@SET
def test_normalize_key_matches_python_reference(spark, texts):
    from hubsit_health_analytics_etl_spark.functions.text import normalize_key

    df = spark.createDataFrame([(t,) for t in texts], "v string")
    got = [r[0] for r in df.select(normalize_key("v").alias("o")).collect()]
    assert got == [_py_normalize_key(t) for t in texts]


@given(
    st.lists(
        st.one_of(st.none(), st.floats(min_value=-50, max_value=200, allow_nan=False)),
        min_size=1,
        max_size=40,
    )
)
@SET
def test_band_matches_pd_cut_semantics(spark, values):
    from hubsit_health_analytics_etl_spark.functions.case import band

    bins = [0, 13, 18, 40, 60, 120]
    labels = ["0-12", "13-17", "18-39", "40-59", "60+"]

    def ref(v):
        if v is None:
            return "Indefinido"
        for lo, hi, lab in zip(bins[:-1], bins[1:], labels):
            if lo <= v < hi:
                return lab
        return "Indefinido"

    df = spark.createDataFrame([(v,) for v in values], "v double")
    got = [r[0] for r in df.select(band("v", bins, labels).alias("o")).collect()]
    assert got == [ref(v) for v in values]


@given(
    st.lists(
        st.decimals(
            min_value=0, max_value=9_999_999, places=2, allow_nan=False
        ),
        min_size=1,
        max_size=25,
    )
)
@SET
def test_currency_roundtrip_property(spark, amounts):
    """Format any 2dp amount as 'R$ 1.234,56' (thousands dots) and the
    parser must recover it exactly."""
    from hubsit_health_analytics_etl_spark.functions.text import currency_to_double

    def br_format(d) -> str:
        s = f"{d:,.2f}"  # 1,234.56
        return "R$ " + s.replace(",", "§").replace(".", ",").replace("§", ".")

    rows = [(br_format(a),) for a in amounts]
    df = spark.createDataFrame(rows, "v string")
    got = [r[0] for r in df.select(currency_to_double("v").alias("o")).collect()]
    assert all(math.isclose(g, float(a), abs_tol=1e-9) for g, a in zip(got, amounts))


@given(st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=50))
@SET
def test_hash_bucket_range_and_stability(spark, keys):
    from hubsit_health_analytics_etl_spark.operators.sampling import hash_bucket

    df = spark.createDataFrame([(k,) for k in set(keys)], "k long")
    a = {r["k"]: r["b"] for r in df.select("k", hash_bucket("k").alias("b")).collect()}
    b = {r["k"]: r["b"] for r in df.select("k", hash_bucket("k").alias("b")).collect()}
    assert a == b  # stable
    assert all(0 <= v < 100 for v in a.values())


@given(
    st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=40),
    st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=500),
            st.integers(min_value=-50, max_value=120),
        ),
        min_size=1,
        max_size=15,
    ),
    st.sampled_from([7, 60, 3600]),
)
@SET
@pytest.mark.slow
def test_range_join_equals_naive_for_random_intervals(spark, points, spans, bucket):
    """range_join == the naive inequality join for arbitrary points,
    interval placements (incl. empty/inverted), and bucket widths."""
    import datetime as dt

    from hubsit_health_analytics_etl_spark.operators.rangejoin import range_join

    base = dt.datetime(2025, 1, 1)
    P = spark.createDataFrame(
        [(i, base + dt.timedelta(seconds=s)) for i, s in enumerate(points)],
        "pid long, ts timestamp",
    )
    I = spark.createDataFrame(
        [
            (j, base + dt.timedelta(seconds=a), base + dt.timedelta(seconds=a + d))
            for j, (a, d) in enumerate(spans)
        ],
        "iid long, w_start timestamp, w_end timestamp",
    )
    got = {
        (r.pid, r.iid)
        for r in range_join(P, I, "ts", "w_start", "w_end", bucket_sec=bucket).collect()
    }
    naive = {
        (r.pid, r.iid)
        for r in P.join(
            I, (F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end"))
        ).collect()
    }
    assert got == naive


def _py_winnow(text: str, k: int = 4, w: int = 8) -> set[int]:
    import hashlib

    toks = text.lower().split(" ")
    n_grams = max(len(toks) - k + 1, 1)
    grams = [" ".join(toks[i : i + k]) for i in range(n_grams)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams]
    n_win = max(len(hs) - w + 1, 1)
    return {min(hs[i : i + w]) for i in range(n_win)}


@given(
    st.lists(
        st.text(alphabet="abc defg hij", min_size=0, max_size=60),
        min_size=1,
        max_size=12,
    )
)
@SET
def test_winnowed_fingerprints_match_python_reference(spark, texts):
    from hubsit_health_analytics_etl_spark.operators.textanalysis import (
        winnowed_fingerprints,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: set(r.fingerprints) for r in winnowed_fingerprints(df).collect()
    }
    assert got == {i: _py_winnow(t) for i, t in enumerate(texts)}


@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from("ab @.-09xyz"),
            min_size=1,
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
@SET
def test_pii_scrub_is_idempotent_and_token_preserving(spark, texts):
    """Scrubbing is a fixed point: scrub(scrub(x)) == scrub(x) (the
    replacement tokens never re-match a pattern), and a clean text is
    returned byte-identical."""
    from hubsit_health_analytics_etl_spark.operators.textanalysis import (
        pii_scrub,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    once = pii_scrub(docs)
    twice = pii_scrub(
        once.select("doc_id", F.col("scrubbed").alias("text"))
    )
    a = {r.doc_id: r.scrubbed for r in once.collect()}
    b = {r.doc_id: (r.scrubbed, r.n_email, r.n_phone) for r in twice.collect()}
    for i, t in enumerate(texts):
        assert b[i][0] == a[i]          # fixed point
        assert b[i][1] == 0 and b[i][2] == 0  # nothing left to find


@given(
    st.lists(
        st.text(alphabet=st.sampled_from("abc "), min_size=1, max_size=80),
        min_size=1,
        max_size=8,
    )
)
@SET
def test_repetition_fraction_bounds_and_python_twin(spark, texts):
    """0 ≤ frac < 1 always, and the Spark expression equals a direct
    Python recomputation of 1 - distinct/total over positional
    n-grams."""
    from hubsit_health_analytics_etl_spark.operators.textanalysis import (
        repetition_fraction,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: r.d2
        for r in docs.select(
            "doc_id", repetition_fraction("text", 2).alias("d2")
        ).collect()
    }
    for i, t in enumerate(texts):
        toks = t.lower().split(" ")
        n = max(len(toks) - 1, 1)
        grams = [" ".join(toks[j : j + 2]) for j in range(n)]
        expect = round(1.0 - len(set(grams)) / len(grams), 4)
        assert 0.0 <= got[i] < 1.0
        assert abs(got[i] - expect) < 1e-9


@given(
    st.lists(  # target rows: (key, s, v)
        st.tuples(
            st.integers(0, 15),
            st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
            st.one_of(st.none(), st.integers(0, 5).map(float)),
        ),
        max_size=20,
        unique_by=lambda t: t[0],
    ),
    st.lists(  # source rows
        st.tuples(
            st.integers(0, 15),
            st.one_of(st.none(), st.sampled_from(["a", "b", "x"])),
            st.one_of(st.none(), st.integers(0, 5).map(float)),
        ),
        max_size=20,
        unique_by=lambda t: t[0],
    ),
)
@SET
def test_merge_upsert_matches_python_model(spark, target_rows, source_rows):
    """merge_upsert == the dict-model merge (source row wins whole,
    unmatched target kept) with exact action typing, across random
    null patterns."""
    from hubsit_health_analytics_etl_spark.operators.cdc import merge_upsert

    schema = "k int, s string, v double"
    target = spark.createDataFrame(target_rows, schema)
    source = spark.createDataFrame(source_rows, schema)
    got = {
        r["k"]: (r["s"], r["v"], r["merge_action"])
        for r in merge_upsert(target, source, ["k"]).collect()
    }

    t, s_ = {r[0]: r[1:] for r in target_rows}, {r[0]: r[1:] for r in source_rows}
    exp = {}
    for k in set(t) | set(s_):
        if k not in t:
            exp[k] = (*s_[k], "insert")
        elif k not in s_:
            exp[k] = (*t[k], "kept")
        elif s_[k] == t[k]:
            exp[k] = (*s_[k], "unchanged")
        else:
            exp[k] = (*s_[k], "update")
    assert got == exp


@given(
    st.lists(  # orders: (custkey, day, orderkey-suffix, priority)
        st.tuples(
            st.integers(1, 3),
            st.integers(1, 20),
            st.integers(0, 99),
            st.sampled_from(["1-URGENT", "2-HIGH", "3-LOW"]),
        ),
        min_size=1,
        max_size=25,
    )
)
@SET
def test_scd2_islands_match_python_model(spark, rows):
    """The SCD2 gaps-and-islands build == a sequential scan model:
    per customer, ordered by (date, orderkey), runs of equal priority
    collapse to one row with the next run's start as valid_to."""
    import datetime

    from hubsit_health_analytics_etl_spark import workload as w

    data = [
        (
            ck,
            1000 * ck + i,  # unique orderkey, ordered by insertion
            prio,
            datetime.datetime(2024, 1, day),
            100.0,
            "F",
        )
        for i, (ck, day, _sfx, prio) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "o_custkey long, o_orderkey long, o_orderpriority string,"
        " o_orderdate timestamp_ntz, o_totalprice double, o_orderstatus string",
    )
    import tempfile

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(f"{d}/orders.parquet")
    # multiset compare: alternating priorities within one day create
    # several runs sharing (custkey, valid_from, priority)
    got = sorted(
        (
            r["o_custkey"],
            r["valid_from"],
            r["priority"],
            r["valid_to"],
            r["n_orders"],
            r["is_current"],
        )
        for r in w.QUERIES["scd2_priority_history"](spark, d).collect()
    )

    exp = []
    bycust: dict = {}
    for ck, okey, prio, dt, _p, _s in data:
        bycust.setdefault(ck, []).append((dt.date(), okey, prio))
    for ck, evs in bycust.items():
        evs.sort()
        runs = []  # (prio, start_date, n)
        for dte, _ok, prio in evs:
            if runs and runs[-1][0] == prio:
                runs[-1][2] += 1
            else:
                runs.append([prio, dte, 1])
        for i, (prio, start, n) in enumerate(runs):
            vt = (
                runs[i + 1][1].isoformat() if i + 1 < len(runs) else "9999-12-31"
            )
            exp.append(
                (ck, start.isoformat(), prio, vt, n, 1 if i + 1 == len(runs) else 0)
            )
    assert got == sorted(exp)


@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=8),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=1, max_value=6),
)
@settings(max_examples=60, deadline=None)
def test_bpe_sentinel_replace_equals_symbol_list_merge(words, k):
    """The theorem the whole BPE oracle design rests on: with every
    symbol WRAPPED in sentinels, a single string ``replace(␁a␁␁b␁ →
    ␁ab␁)`` equals the textbook symbol-list greedy merge (leftmost,
    non-overlapping, restart AFTER the merged token) — including on
    self-overlapping runs ('aaaa') and suffix-sharing symbols. The two
    weaker encodings FAIL this test: space-delimited consumes the next
    match's boundary; terminator-only lets the pattern match a longer
    symbol's suffix (falsified at words=['aab','aaab'], k=2 — the bug
    this test caught in the shipped encoding). Random 2-letter corpora
    and k merge rounds; training decisions (pair counts + (count desc,
    pair asc) argmax) replayed independently per representation."""
    SEP = "\x01"
    from collections import Counter

    freq = Counter(words)

    # representation A: symbol lists, textbook merge
    seqs_l = {w: list(w) for w in freq}
    # representation B: sentinel-terminated strings, replace() merge
    seqs_s = {w: "".join(SEP + c + SEP for c in w) for w in freq}

    for _ in range(k):
        counts = Counter()
        for w, n in freq.items():
            s = seqs_l[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += n
        # the string side must see the SAME pair statistics
        counts_s = Counter()
        for w, n in freq.items():
            toks = [x for x in seqs_s[w].split(SEP) if x]
            for i in range(len(toks) - 1):
                counts_s[(toks[i], toks[i + 1])] += n
        assert counts == counts_s
        if not counts:
            break
        (a, b), _n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0] + "\n" + kv[0][1])
        )
        for w in freq:
            s, out, i = seqs_l[w], [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs_l[w] = out
            seqs_s[w] = seqs_s[w].replace(
                SEP + a + SEP + SEP + b + SEP, SEP + a + b + SEP
            )

    for w in freq:
        assert [x for x in seqs_s[w].split(SEP) if x] == seqs_l[w], w


@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=300),
    st.integers(min_value=0, max_value=300),
)
@SET
def test_theta_merge_law_holds_for_any_split(spark, values, cut):
    """KMV merge law as a property: for ANY value multiset and ANY
    split point, merge(sketch(A), sketch(B)) must equal
    sketch(A ∪ B) array-for-array, and an unsaturated sketch must BE
    the exact distinct hash set (estimate == true distinct count)."""
    import hashlib

    from hubsit_health_analytics_etl_spark.operators.theta import (
        THETA_K,
        theta_estimate,
        theta_sketch,
        theta_union,
    )

    cut = min(cut, len(values))
    rows = [("g", v) for v in values]
    df = spark.createDataFrame(rows, "g string, v bigint")
    full = theta_sketch(df, ["g"], "v", prefilter=False)

    def side(slice_rows):
        # an empty slice yields an empty sketch table (the group is
        # absent from that side — the full-outer merge must cope)
        if not slice_rows:
            return full.limit(0)
        sdf = spark.createDataFrame(slice_rows, "g string, v bigint")
        return theta_sketch(sdf, ["g"], "v", prefilter=False)

    sa, sb = side(rows[:cut]), side(rows[cut:])
    merged = {r["g"]: list(r["hs"]) for r in theta_union(sa, sb, ["g"]).collect()}
    want = {r["g"]: list(r["hs"]) for r in full.collect()}
    assert merged == want

    # exact regime: unsaturated == the true distinct hash set
    distinct = {
        int(hashlib.md5(f"theta{v}".encode()).hexdigest()[:15], 16)
        for v in values
    }
    est = {r["g"]: r["est_distinct"] for r in theta_estimate(full).collect()}
    if len(distinct) < THETA_K:
        assert want["g"] == sorted(distinct)
        assert est["g"] == len(distinct)
    else:
        assert want["g"] == sorted(distinct)[:THETA_K]


@given(
    sets=st.lists(
        st.frozensets(st.integers(min_value=0, max_value=40),
                      min_size=1, max_size=12),
        min_size=2, max_size=8,
    ),
    tau_num=st.integers(min_value=1, max_value=9),
)
@settings(max_examples=200, deadline=None)
def test_prefix_filter_lemma_candidates_cover_all_qualifying_pairs(
    sets, tau_num
):
    """The mathematical lemma jaccard_prefix_filter_pairs rests on,
    pinned independently of Spark: for ANY family of sets, ANY global
    (df, element) order and τ = tau_num/10, every pair with
    J ≥ τ shares at least one element in BOTH prefixes of length
    p = n − ⌈τ·n⌉ + 1 — so the blocked candidate set is a superset of
    the answer (losslessness), including at the τ boundary."""
    tau_den = 10
    df = {}
    for s in sets:
        for x in s:
            df[x] = df.get(x, 0) + 1
    order = {x: (c, x) for x, c in df.items()}

    def prefix(s):
        n = len(s)
        p = n - -(-tau_num * n // tau_den) + 1  # n - ceil(tau*n) + 1
        return set(sorted(s, key=lambda x: order[x])[:max(p, 0)])

    for i, a in enumerate(sets):
        for b in sets[i + 1:]:
            inter = len(a & b)
            if inter == 0:
                continue
            jac = inter / len(a | b)
            if jac * tau_den >= tau_num:
                assert prefix(a) & prefix(b), (
                    a, b, jac, prefix(a), prefix(b)
                )


def _py_cc(edges, nodes):
    """Union-find reference: node -> min-id component."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


@given(
    st.lists(  # base edges over a small node universe
        st.tuples(st.integers(0, 11), st.integers(0, 11)),
        max_size=18,
    ),
    st.lists(st.tuples(st.integers(0, 14), st.integers(0, 14)), max_size=8),
    st.sets(st.integers(0, 17), max_size=12),  # removal CANDIDATES
)
@SET
@pytest.mark.slow
def test_splice_cluster_edges_equals_full_cc_random_graphs(
    spark, base, added, rm_seed
):
    """splice == from-scratch CC over the edited edge set, for random
    base graphs, random additions (possibly touching brand-new nodes),
    and random removals (bridges included) — the general law the
    crafted test samples once."""
    from hubsit_health_analytics_etl_spark.operators.clusters import (
        connected_components,
        splice_cluster_edges,
    )

    canon = lambda es: sorted(
        {(min(a, b), max(a, b)) for a, b in es if a != b}
    )
    base_e = canon(base)
    added_e = canon(added)
    # removals: a pseudo-random subset of the base edges
    removed_e = [e for i, e in enumerate(base_e) if (e[0] * 7 + e[1] + i) % 3 in rm_seed or i in rm_seed]
    base_nodes = sorted({n for e in base_e for n in e} | set(range(12)))
    new_nodes = sorted({n for e in added_e for n in e} - set(base_nodes))

    if base_e:
        bdf = spark.createDataFrame(base_e, "doc_a long, doc_b long")
    else:
        bdf = spark.createDataFrame([], "doc_a long, doc_b long")
    labels = (
        spark.createDataFrame([(n,) for n in base_nodes], "node long")
        .join(connected_components(bdf), "node", "left")
        .selectExpr("node", "coalesce(component, node) as component")
    )
    adf = (
        spark.createDataFrame(added_e, "doc_a long, doc_b long")
        if added_e
        else spark.createDataFrame([], "doc_a long, doc_b long")
    )
    rdf = (
        spark.createDataFrame(removed_e, "doc_a long, doc_b long")
        if removed_e
        else spark.createDataFrame([], "doc_a long, doc_b long")
    )
    ndf = (
        spark.createDataFrame([(n,) for n in new_nodes], "node long")
        if new_nodes
        else None
    )
    got = {
        r["node"]: r["component"]
        for r in splice_cluster_edges(labels, bdf, adf, rdf, ndf).collect()
    }
    edited = (set(base_e) - set(removed_e)) | set(added_e)
    want = _py_cc(edited, set(base_nodes) | set(new_nodes))
    assert got == want


def _py_capped_pairs(posts, cap):
    """Reference: pairs co-bucketed in any (band, key) bucket of size
    2..cap. posts = iterable of (doc_id, band_idx, band_key)."""
    from collections import defaultdict

    buckets = defaultdict(set)
    for d, b, k in posts:
        buckets[(b, k)].add(d)
    out = set()
    for ids in buckets.values():
        if 2 <= len(ids) <= cap:
            ids = sorted(ids)
            for i, a in enumerate(ids):
                for b2 in ids[i + 1:]:
                    out.add((a, b2))
    return out


_POST = st.tuples(
    st.integers(0, 9), st.integers(0, 2), st.sampled_from("pqr")
)


@given(
    st.lists(_POST, max_size=25),  # standing postings
    st.lists(
        st.tuples(st.integers(100, 105), st.integers(0, 2), st.sampled_from("pqr")),
        max_size=10,
    ),  # batch postings (disjoint id space)
    st.integers(2, 4),  # cap
    st.sets(st.integers(0, 9), max_size=4),  # deleted doc ids
)
@SET
def test_cap_retraction_and_underflow_laws_random(
    spark, standing, batch, cap, deleted
):
    """The two cap-transition operators against a pure-Python capped
    pair model, over random postings:

    INGEST — capped pairs of the union restricted to standing docs
    == standing pairs − retractions (sizes only grow, so retraction
    is the only transition; exact equality).

    DELETION — reinstated candidates sit between the two capped sets:
    every pair newly generable after the deletion is produced, and
    nothing outside the post-deletion capped set is (re-emission of
    still-generable pairs is documented and allowed)."""
    from hubsit_health_analytics_etl_spark.operators.dedup import (
        bucket_underflow_candidates,
        capped_pair_retractions,
    )

    standing = sorted(set(standing))
    batch = sorted(set(batch))
    sdf = (
        spark.createDataFrame(standing, "doc_id long, band_idx int, band_key string")
        if standing
        else spark.createDataFrame([], "doc_id long, band_idx int, band_key string")
    )
    sizes = sdf.groupBy("band_idx", "band_key").count().withColumnRenamed("count", "n")
    std_pairs = _py_capped_pairs(standing, cap)
    pdf = (
        spark.createDataFrame(sorted(std_pairs), "doc_a long, doc_b long")
        if std_pairs
        else spark.createDataFrame([], "doc_a long, doc_b long")
    )

    # ingest law
    bdf = (
        spark.createDataFrame(batch, "doc_id long, band_idx int, band_key string")
        if batch
        else spark.createDataFrame([], "doc_id long, band_idx int, band_key string")
    )
    got_rm = {
        (r["doc_a"], r["doc_b"])
        for r in capped_pair_retractions(sdf, sizes, bdf, pdf, cap).collect()
    }
    union_pairs = _py_capped_pairs(standing + batch, cap)
    want_rm = std_pairs - union_pairs
    assert got_rm == want_rm

    # deletion law
    surv = [p for p in standing if p[0] not in deleted]
    dropped = [p for p in standing if p[0] in deleted]
    vdf = (
        spark.createDataFrame(surv, "doc_id long, band_idx int, band_key string")
        if surv
        else spark.createDataFrame([], "doc_id long, band_idx int, band_key string")
    )
    ddf = (
        spark.createDataFrame(dropped, "doc_id long, band_idx int, band_key string")
        if dropped
        else spark.createDataFrame([], "doc_id long, band_idx int, band_key string")
    )
    got_add = {
        (r["doc_a"], r["doc_b"])
        for r in bucket_underflow_candidates(vdf, sizes, ddf, cap).collect()
    }
    surv_pairs = _py_capped_pairs(surv, cap)
    surv_std = {p for p in std_pairs if p[0] not in deleted and p[1] not in deleted}
    want_new = surv_pairs - surv_std
    assert want_new <= got_add <= surv_pairs
