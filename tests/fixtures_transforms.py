"""Named transform used by the properties custom.class test."""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_flag(df: DataFrame) -> DataFrame:
    return df.withColumn("migrated_flag", F.lit(True))
