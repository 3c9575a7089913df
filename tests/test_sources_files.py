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
