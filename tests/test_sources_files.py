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
