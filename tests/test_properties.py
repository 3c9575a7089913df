"""Property-based tests (hypothesis) for the semantics that must hold
for ANY input, not just the fixtures: LWW merge invariants and
canonical row-hash stability.  The reference establishes correctness
only end-to-end against a live lab (SURVEY.md §5); these pin the
algebraic properties the validation and streaming paths rely on."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from cassandra_data_migration_spark.streaming.lww import lww_merge

mutations = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # pk — few keys → collisions
        st.integers(min_value=0, max_value=1000),  # writetime
        st.integers(min_value=0, max_value=9),  # payload
    ),
    min_size=1,
    max_size=12,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, _writetime long, v long")


@settings(max_examples=8, deadline=None)
@given(cur=mutations, inc=mutations)
def test_lww_merge_keeps_one_newest_row_per_key(spark, cur, inc):
    merged = lww_merge(_df(spark, cur), _df(spark, inc), ["k"]).collect()
    keys = [r.k for r in merged]
    assert len(keys) == len(set(keys))  # exactly one row per pk
    best = {}
    for k, wt, _ in cur + inc:
        best[k] = max(best.get(k, -1), wt)
    assert {r.k: r._writetime for r in merged} == best  # winner = max wt


@settings(max_examples=5, deadline=None)
@given(cur=mutations, inc=mutations)
def test_lww_merge_is_idempotent(spark, cur, inc):
    once = lww_merge(_df(spark, cur), _df(spark, inc), ["k"])
    twice = lww_merge(once, _df(spark, inc), ["k"])
    a = sorted((r.k, r._writetime) for r in once.collect())
    b = sorted((r.k, r._writetime) for r in twice.collect())
    assert a == b  # re-delivering a batch never changes the store


def test_canonical_hash_is_column_order_independent(spark):
    from pyspark.sql import functions as F

    from cassandra_data_migration_spark.functions.hashing import row_md5

    df_ab = spark.createDataFrame([(1, "x")], "a int, b string")
    df_ba = spark.createDataFrame([("x", 1)], "b string, a int")
    h1 = df_ab.select(row_md5(df_ab).alias("h")).first().h
    h2 = df_ba.select(row_md5(df_ba).alias("h")).first().h
    assert h1 == h2  # sorted-name canonicalization

    # NULL and empty string must hash differently (tombstone vs empty)
    df_null = spark.createDataFrame([(1, None)], "a int, b string")
    df_empty = spark.createDataFrame([(1, "")], "a int, b string")
    hn = df_null.select(row_md5(df_null).alias("h")).first().h
    he = df_empty.select(row_md5(df_empty).alias("h")).first().h
    assert hn != he


def test_retry_collapse_is_idempotent(spark):
    """Survivors are pairwise > tolerance apart, so a second pass
    keeps every survivor — the cleanup is safe to re-run."""
    from cassandra_data_migration_spark.operators.windows import retry_collapse
    from cassandra_data_migration_spark.sources.tables import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    once = retry_collapse(events, tolerance_sec=120)
    twice = retry_collapse(once, tolerance_sec=120)
    assert once.count() == twice.count()
    a = {r["event_id"] for r in once.collect()}
    b = {r["event_id"] for r in twice.collect()}
    assert a == b


def test_zorder_key_is_injective_on_the_domain(spark):
    """Bit interleaving is a bijection from (x, y) ∈ [0,256)² onto its
    z-curve image — no two cells collide."""
    from cassandra_data_migration_spark.operators.layout import zorder_key

    df = (
        spark.range(64)
        .selectExpr("id % 8 AS x", "id div 8 AS y")
        .withColumn("z", zorder_key(["x", "y"], bits=3))
    )
    rows = df.collect()
    assert len({r["z"] for r in rows}) == 64
    assert all(0 <= r["z"] < 64 for r in rows)


rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),  # key
        st.integers(min_value=-100, max_value=100),  # payload
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


@settings(max_examples=6, deadline=None)
@given(rows=rows_strategy)
def test_merkle_digest_additive_over_disjoint_splits(spark, rows):
    # digest(A ∪ B) = (digest(A) + digest(B)) mod 2^60 for disjoint
    # A, B — the property that makes the leaf digests incrementally
    # maintainable (streaming/merkle.py) and partition-order-free
    from cassandra_data_migration_spark.operators.merkle import (
        TOKEN_SPACE,
        range_digests,
    )

    df = spark.createDataFrame(rows, "k long, v long")
    a = df.filter("k % 2 = 0")
    b = df.filter("k % 2 = 1")

    def leaves(d):
        return {
            r["bucket"]: (r["n_rows"], r["digest"])
            for r in range_digests(d, "k", ["k", "v"], depth=1).collect()
        }

    la, lb, lu = leaves(a), leaves(b), leaves(df)
    for bucket in set(la) | set(lb):
        na, da = la.get(bucket, (0, 0))
        nb, db = lb.get(bucket, (0, 0))
        assert lu[bucket] == (na + nb, (da + db) % TOKEN_SPACE)


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),   # group
            st.integers(min_value=0, max_value=999),  # id
            st.integers(min_value=1, max_value=50),   # weight > 0
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: (t[0], t[1]),
    )
)
def test_weighted_sample_subset_and_cap(spark, rows):
    from cassandra_data_migration_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    df = spark.createDataFrame(rows, "g long, i long, w long")
    out = weighted_sample_per_group(df, "g", "i", "w", k=3).collect()
    chosen = {(r["g"], r["i"]) for r in out}
    assert chosen <= {(g, i) for g, i, _ in rows}
    from collections import Counter

    per_group = Counter(g for g, _ in chosen)
    sizes = Counter(g for g, _, _ in rows)
    for g, n in per_group.items():
        assert n == min(3, sizes[g])  # exactly k (or all) per group


@settings(max_examples=6, deadline=None)
@given(
    ops=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),    # key
            st.integers(min_value=0, max_value=100),  # ts
            st.sampled_from(["I", "U", "D"]),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_cdc_apply_replay_and_reference(spark, ops):
    from cassandra_data_migration_spark.operators.windows import cdc_apply

    rows = [(k, t, i, op) for i, (k, t, op) in enumerate(ops)]
    df = spark.createDataFrame(rows, "k long, ts long, seq long, op string")
    out = {
        r["k"]: (r["ts"], r["seq"], r["op"])
        for r in cdc_apply(df, ["k"], ts_col="ts", tiebreak_col="seq").collect()
    }
    # pure-python reference: latest (ts, seq) per key, drop deletes
    best = {}
    for k, t, i, op in rows:
        if k not in best or (t, i) > (best[k][0], best[k][1]):
            best[k] = (t, i, op)
    expected = {k: v for k, v in best.items() if v[2] != "D"}
    assert out == expected


# --- WARC container (sources/warc.py) --------------------------------------

warc_records = st.lists(
    st.tuples(
        st.sampled_from(["response", "request", "metadata"]),
        st.binary(min_size=0, max_size=200),
        st.booleans(),  # attach an HTTP envelope?
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=25, deadline=None)
@given(recs=warc_records, compress=st.booleans())
def test_warc_container_roundtrips_any_payload(recs, compress):
    """build→parse is the identity on (type, payload) for ARBITRARY
    payload bytes — including ones full of CRLF / header-like noise —
    because record framing is Content-Length, not delimiters."""
    from cassandra_data_migration_spark.sources.warc import (
        build_warc,
        parse_warc_stream,
    )
    import gzip as _gzip
    import io as _io

    built = [
        {
            "record_id": f"<urn:p:{i}>",
            "warc_type": typ,
            "target_uri": f"http://x.example/{i}",
            "payload": payload,
            **(
                {"http_status": 200, "http_content_type": "text/plain"}
                if (http and typ == "response")
                else {}
            ),
        }
        for i, (typ, payload, http) in enumerate(recs)
    ]
    raw = build_warc(built, compress=compress)
    if compress:
        raw = _gzip.GzipFile(fileobj=_io.BytesIO(raw)).read()
    parsed = list(parse_warc_stream(raw))
    assert [(p["record_id"], p["warc_type"], p["payload"]) for p in parsed] \
        == [(b["record_id"], b["warc_type"], b["payload"]) for b in built]


# --- HTML strip chain (operators/text.py) ----------------------------------

html_fragments = st.lists(
    st.sampled_from(
        [
            "plain words ",
            "<p>", "</p>", "<div class='x'>", "</div>", "<br>",
            "<script>var a = '<p>not text</p>';</script>",
            "<style>p::before { content: '<'; }</style>",
            "<head><title>t</title></head>",
            "<!-- a comment -->",
            "&amp;", "&lt;", "&gt;", "&nbsp;", "&quot;", "&#39;",
            "tail text", "  ", "UPPER <B>bold</B>",
        ]
    ),
    min_size=1,
    max_size=8,
).map("".join)


@settings(max_examples=10, deadline=None)
@given(html=html_fragments)
def test_html_strip_spark_equals_duckdb_twin(spark, html):
    """The Spark chain and its generated SQL twin agree on arbitrary
    compositions of tags/entities/boilerplate — the property that
    makes html_extract's oracle trustworthy."""
    import duckdb

    from cassandra_data_migration_spark.operators.text import (
        html_strip_sql,
        html_to_text,
    )

    got_spark = (
        spark.createDataFrame([(html,)], "h string")
        .select(html_to_text("h").alias("t"))
        .first()["t"]
    )
    lit = "'" + html.replace("'", "''") + "'"
    got_duck = duckdb.sql(f"SELECT {html_strip_sql(lit)}").fetchone()[0]
    assert got_spark == got_duck


# ---- substring_dup_spans vs a pure-Python suffix-scan reference ----

corpus = st.lists(
    st.lists(
        st.integers(min_value=0, max_value=3),  # tiny alphabet → collisions
        min_size=1,
        max_size=12,
    ),
    min_size=1,
    max_size=6,
)


def _dup_coverage_reference(docs: list[list[int]], k: int):
    """Brute-force: every k-gram occurrence counted corpus-wide; the
    union of duplicated k-gram intervals per doc."""
    from collections import Counter

    grams = Counter()
    for toks in docs:
        for i in range(len(toks) - k + 1):
            grams[tuple(toks[i : i + k])] += 1
    out = {}
    for d, toks in enumerate(docs):
        hits = [
            i
            for i in range(len(toks) - k + 1)
            if grams[tuple(toks[i : i + k])] >= 2
        ]
        spans = []
        for i in hits:
            if spans and i <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], i + k - 1)
            else:
                spans.append([i, i + k - 1])
        out[d] = (len(spans), sum(e - s + 1 for s, e in spans))
    return out


@settings(max_examples=8, deadline=None)
@given(docs=corpus)
def test_substring_dup_spans_matches_bruteforce(spark, docs):
    from cassandra_data_migration_spark.operators.dedup import (
        substring_dup_spans,
    )

    k = 3
    rows = [(i, " ".join(f"t{t}" for t in toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_dup_spans"], r["dup_tokens"])
        for r in substring_dup_spans(df, k=k).collect()
    }
    assert got == _dup_coverage_reference(docs, k)


# ---- triangle_counts vs itertools brute force ----

edge_sets = st.sets(
    st.tuples(
        st.integers(min_value=0, max_value=6),
        st.integers(min_value=0, max_value=6),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None)
@given(raw=edge_sets)
def test_triangle_counts_matches_bruteforce(spark, raw):
    from itertools import combinations

    from cassandra_data_migration_spark.operators.graph import triangle_counts

    und = {(min(a, b), max(a, b)) for a, b in raw}
    df = spark.createDataFrame(sorted(und), "a long, b long")
    got = {
        r["v"]: (r["degree"], r["n_triangles"])
        for r in triangle_counts(df).collect()
    }
    verts = sorted({v for e in und for v in e})
    tri_of = {v: 0 for v in verts}
    for x, y, z in combinations(verts, 3):
        if (
            (x, y) in und and (y, z) in und and (x, z) in und
        ):
            tri_of[x] += 1
            tri_of[y] += 1
            tri_of[z] += 1
    deg_of = {v: sum(1 for e in und if v in e) for v in verts}
    assert got == {v: (deg_of[v], tri_of[v]) for v in verts}
