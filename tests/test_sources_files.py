"""S4-S8: COPY/DSBulk-style CSV & JSON staging round-trips."""

from __future__ import annotations

from cassandra_data_migration_spark.sources import files
from cassandra_data_migration_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_csv_round_trip_preserves_rows(spark, tmp_path):
    nation = load_table(spark, SF_SMOKE, "nation")
    path = str(tmp_path / "nation_csv")
    files.csv_export(nation, path, delimiter="|", null_value="\\N")
    back = files.csv_import(
        spark, path, schema=nation.schema, delimiter="|", null_value="\\N"
    )
    assert sorted(map(str, back.collect())) == sorted(map(str, nation.collect()))


def test_csv_gzip_compression(spark, tmp_path):
    import glob

    nation = load_table(spark, SF_SMOKE, "nation")
    path = str(tmp_path / "nation_gz")
    files.csv_export(nation, path, compression="gzip", single_file=True)
    gz = glob.glob(f"{path}/*.csv.gz")
    assert len(gz) == 1
    back = files.csv_import(spark, path, schema=nation.schema)
    assert back.count() == nation.count()


def test_json_round_trip(spark, tmp_path):
    region = load_table(spark, SF_SMOKE, "region")
    path = str(tmp_path / "region_json")
    files.json_export(region, path)
    back = files.json_import(spark, path, schema=region.schema)
    assert sorted(map(str, back.collect())) == sorted(map(str, region.collect()))


def test_orc_round_trip_lossless_and_partitioned(spark, tmp_path):
    from cassandra_data_migration_spark.sources.files import orc_export, orc_import
    from cassandra_data_migration_spark.sources.tables import load_table

    s = load_table(spark, "/root/testdata/sf0.001", "supplier")
    p = str(tmp_path / "orc")
    orc_export(s, p, partition_cols=["s_nationkey"])
    back = orc_import(spark, p).select(*s.columns)
    assert back.count() == s.count()
    # values survive byte-for-byte (partition column comes back typed)
    assert s.exceptAll(back.select(*[back[c].cast(t.dataType) for c, t in
        zip(back.columns, [s.schema[c] for c in back.columns])])).count() == 0


def test_binary_import_reads_raw_files(spark, tmp_path):
    # binaryFile ingest: one row per file, exact payload bytes, glob
    # filter pushed to the listing
    payloads = {"a.img": b"\x00\x01IMG", "b.img": b"\xffDATA", "skip.txt": b"nope"}
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)
    df = files.binary_import(spark, str(tmp_path), glob="*.img")
    rows = {r.path.rsplit("/", 1)[-1]: bytes(r.content) for r in df.collect()}
    assert rows == {"a.img": payloads["a.img"], "b.img": payloads["b.img"]}
    # payload flows into the multimodal feature extractor unchanged
    from cassandra_data_migration_spark.operators import multimodal

    feats = multimodal.extract_features(
        df.selectExpr("length(path) AS doc_id", "content AS payload")
    )
    assert feats.count() == 2


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    from cassandra_data_migration_spark.sources.tables import (
        load_partitioned,
        load_table,
        write_partitioned,
    )

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "event_type", "value"
    )
    p = str(tmp_path / "ev_part")
    write_partitioned(ev, p, ["event_type"])
    back = load_partitioned(spark, p).filter("event_type = 'click'")
    assert back.count() == ev.filter("event_type = 'click'").count()
    # pruning is visible in the plan: the predicate lands in
    # PartitionFilters, not PushedFilters over data columns
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters", 1
    )[1].split("\n", 1)[0]


def test_paged_fetch_streams_bounded_pages(spark):
    from cassandra_data_migration_spark.sources.tables import load_table, paged_fetch

    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey")
    pages = list(paged_fetch(orders, page_size=64))
    assert all(len(p) <= 64 for p in pages)
    assert all(len(p) == 64 for p in pages[:-1])  # only the tail is short
    fetched = sorted(r.o_orderkey for p in pages for r in p)
    expected = sorted(r.o_orderkey for r in orders.collect())
    assert fetched == expected


def test_fixed_width_roundtrip_types_and_negative_money(spark, tmp_path):
    from cassandra_data_migration_spark.sources.files import (
        fixed_width_export,
        fixed_width_import,
    )

    df = spark.createDataFrame(
        [(1, "alpha", -12.5), (42, "name with spaces", 0.0), (7, "b", 9.99)],
        "id long, name string, bal double",
    )
    p = str(tmp_path / "fw")
    fixed_width_export(
        df, p, "%6d%-20s%12.2f", ["id", "name", "bal"], line_width=38
    )
    back = fixed_width_import(
        spark,
        p,
        [
            ("id", 1, 6, "bigint"),
            ("name", 7, 20, "string"),
            ("bal", 27, 12, "double"),
        ],
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_fixed_width_overflow_fails_loudly(spark, tmp_path):
    """printf WIDENS an overflowing field, shifting every later byte
    range — with line_width pinned the export must fail, not emit a
    silently mis-aligned file (ADVICE r4)."""
    import pytest

    from cassandra_data_migration_spark.sources.files import (
        fixed_width_export,
    )

    df = spark.createDataFrame(
        [(1, "ok", 1.0), (2, "this name is far too long for field", 2.0)],
        "id long, name string, bal double",
    )
    with pytest.raises(Exception, match="fixed-width overflow"):
        fixed_width_export(
            df,
            str(tmp_path / "fw_bad"),
            "%6d%-20s%12.2f",
            ["id", "name", "bal"],
            line_width=38,
        )


def test_fixed_width_import_preserves_leading_spaces(spark, tmp_path):
    """String fields are left-aligned: only right padding is stripped,
    so data-significant LEADING spaces survive the roundtrip; numeric
    fields still trim both edges before the cast (ADVICE r4)."""
    from cassandra_data_migration_spark.sources.files import (
        fixed_width_export,
        fixed_width_import,
    )

    df = spark.createDataFrame(
        [(1, "  indented", 5.0), (2, "plain", -1.25)],
        "id long, name string, bal double",
    )
    p = str(tmp_path / "fw_lead")
    fixed_width_export(
        df, p, "%6d%-20s%12.2f", ["id", "name", "bal"], line_width=38
    )
    back = fixed_width_import(
        spark,
        p,
        [
            ("id", 1, 6, "bigint"),
            ("name", 7, 20, "string"),
            ("bal", 27, 12, "double"),
        ],
    )
    got = {r["id"]: (r["name"], r["bal"]) for r in back.collect()}
    assert got[1] == ("  indented", 5.0)
    assert got[2] == ("plain", -1.25)
