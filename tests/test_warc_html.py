"""WARC ingestion + HTML extraction (sources/warc.py, text.html_to_text)."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F


def test_warc_build_parse_roundtrip_plain_and_gz(tmp_path):
    from cassandra_data_migration_spark.sources.warc import (
        build_warc,
        parse_warc_stream,
    )

    recs = [
        {
            "record_id": "<urn:doc:1>",
            "warc_type": "response",
            "target_uri": "http://a.example/x",
            "warc_date": "2024-01-01T00:00:00Z",
            "http_status": 200,
            "http_content_type": "text/html",
            "payload": b"<html><body>hi</body></html>",
        },
        {
            "record_id": "<urn:doc:2>",
            "warc_type": "request",
            "target_uri": "http://a.example/x",
            "payload": b"GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n",
        },
        {   # body containing CRLFCRLF must not confuse the splitter
            "record_id": "<urn:doc:3>",
            "warc_type": "response",
            "target_uri": "http://a.example/y",
            "http_status": 404,
            "http_content_type": "text/plain",
            "payload": b"tricky\r\n\r\nbody\r\n\r\nwith blanks",
        },
    ]
    raw = build_warc(recs, compress=False)
    parsed = list(parse_warc_stream(raw))
    assert [p["record_id"] for p in parsed] == [r["record_id"] for r in recs]
    assert parsed[0]["http_status"] == 200
    assert parsed[0]["payload"] == recs[0]["payload"]  # headers split off
    assert parsed[1]["http_status"] is None            # request: untouched
    assert parsed[1]["payload"] == recs[1]["payload"]
    assert parsed[2]["http_status"] == 404
    assert parsed[2]["payload"] == recs[2]["payload"]

    gz = build_warc(recs, compress=True)
    # per-record gzip members: the stream decompresses as one, and
    # slicing off the first member still yields a valid gzip stream
    assert gzip.decompress(gz) == raw
    assert gz.count(b"\x1f\x8b\x08") >= 3


def test_read_warc_distributed(spark, tmp_path):
    from cassandra_data_migration_spark.sources.warc import (
        build_warc,
        read_warc,
    )

    for i in range(3):
        recs = [
            {
                "record_id": f"<urn:f{i}:r{j}>",
                "warc_type": "response",
                "target_uri": f"http://ex.org/{i}/{j}",
                "http_status": 200,
                "http_content_type": "text/html",
                "payload": f"<p>doc {i}-{j}</p>".encode(),
            }
            for j in range(5)
        ]
        (tmp_path / f"f{i}.warc.gz").write_bytes(build_warc(recs))
    df = read_warc(spark, str(tmp_path) + "/*.warc.gz")
    rows = df.collect()
    assert len(rows) == 15
    assert {r["file"] for r in rows} == {"f0.warc.gz", "f1.warc.gz", "f2.warc.gz"}
    assert all(r["http_status"] == 200 for r in rows)
    body = {bytes(r["payload"]).decode() for r in rows}
    assert "<p>doc 2-4</p>" in body


def test_html_to_text_strips_boilerplate(spark):
    from cassandra_data_migration_spark.operators.text import html_to_text

    html = (
        '<html><head><title>T</title><style>p {color: red}</style></head>'
        "<body><script>if (1 < 2) { alert('x'); }</script>"
        "<h1>Head&nbsp;line</h1><br><p>a &amp;&amp; b &lt;tag&gt;</p>"
        "<!-- secret comment --><div>end  \t text</div></body></html>"
    )
    out = (
        spark.createDataFrame([(html,)], "h string")
        .select(html_to_text("h").alias("t"))
        .first()["t"]
    )
    assert out == "Head line a && b <tag> end text"
    assert "secret" not in out and "color" not in out and "alert" not in out


def test_html_strip_sql_twin_matches_spark(spark):
    import duckdb

    from cassandra_data_migration_spark.operators.text import (
        html_strip_sql,
        html_to_text,
    )

    cases = [
        "<html><head><script>var a=1;</script></head><body>x</body></html>",
        "plain text, no markup",
        "<p>multi</p><p>para</p><br/><b>bold</b>",
        "entities &amp; more &quot;q&quot; &#39;s&#39; &nbsp;done",
        "<STYLE>upper case</STYLE><SCRIPT>s</SCRIPT>visible",
    ]
    sdf = spark.createDataFrame([(c,) for c in cases], "h string")
    spark_out = [r["t"] for r in sdf.select(html_to_text("h").alias("t")).collect()]
    con = duckdb.connect()
    duck_out = [
        con.execute(f"SELECT {html_strip_sql(_q(c))}").fetchone()[0]
        for c in cases
    ]
    assert spark_out == duck_out


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def test_blocklist_filter_suffix_and_pattern_semantics(spark):
    from cassandra_data_migration_spark.operators.web import blocklist_filter

    rows = [
        (1, "https://www.ok.example.com/a"),
        (2, "https://bad.example.com/b"),        # exact domain block
        (3, "https://sub.deep.bad.example.com/c"),  # parent-suffix block
        (4, "https://fine.example.org/d"),
        (5, "https://anything.evil/e"),          # whole-TLD block
        (6, "https://www.ok.example.com/tracked?ref=spam"),  # pattern
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = blocklist_filter(
        df,
        blocked_domains=["bad.example.com", "evil"],
        blocked_patterns=[r"ref=spam"],
    )
    assert {r["doc_id"] for r in out.collect()} == {1, 4}


def test_blocklist_filter_probe_is_broadcast(spark):
    import contextlib
    import io

    from cassandra_data_migration_spark.operators.web import blocklist_filter

    df = spark.createDataFrame(
        [(i, f"https://h{i}.example.com/x") for i in range(100)],
        "doc_id long, url string",
    )
    out = blocklist_filter(df, ["example.net"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # the blocklist probe must broadcast; the corpus never shuffles its
    # payload columns for the suffix check
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_psi_drift_identical_snapshots_is_zero(spark):
    from cassandra_data_migration_spark.operators.quality import psi_drift

    df = spark.createDataFrame(
        [(float(v),) for v in range(0, 500, 7)], "value double"
    )
    rows = psi_drift(df, df, "value").collect()
    assert len(rows) == 10
    assert all(r["psi_term"] == 0.0 for r in rows)
    assert abs(sum(r["share_a"] for r in rows) - 1.0) < 1e-4


def test_psi_drift_detects_shift_and_clamps(spark):
    from cassandra_data_migration_spark.operators.quality import psi_drift

    a = spark.createDataFrame([(float(v),) for v in range(100)], "value double")
    # shifted + out-of-range values clamp into edge buckets
    b = spark.createDataFrame(
        [(float(v),) for v in range(400, 520, 2)] + [(-50.0,), (9999.0,)],
        "value double",
    )
    rows = {r["bucket"]: r for r in psi_drift(a, b, "value").collect()}
    psi = sum(r["psi_term"] for r in rows.values())
    assert psi > 0.25  # clearly-drifted distributions score high
    assert rows[0]["n_b"] == 1 and rows[9]["n_b"] >= 1  # clamped rows landed
