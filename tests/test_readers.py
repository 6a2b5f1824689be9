"""Reader tests: explicit-schema CSV, corrupt-record quarantine."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from nyc_bikeshare_datawarehouse_spark.sources.readers import read_csv, split_corrupt

SCHEMA = T.StructType([
    T.StructField("id", T.IntegerType()),
    T.StructField("v", T.DoubleType()),
])


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,v\n1,1.5\nnot_an_int,2.5\n3,oops\n4,4.5\n")
    return str(p)


def test_explicit_schema_read(spark, csv_file):
    df = read_csv(spark, csv_file, schema=SCHEMA)
    assert df.schema == SCHEMA
    assert df.count() == 4  # bad cells null out, rows survive


def test_capture_corrupt_quarantines(spark, csv_file):
    df = read_csv(spark, csv_file, schema=SCHEMA, capture_corrupt=True)
    clean, quarantined = split_corrupt(df)
    # PERMISSIVE: rows with any unparseable cell carry the raw line
    assert clean.count() == 2
    bad = {r["_corrupt_record"] for r in quarantined.collect()}
    assert bad == {"not_an_int,2.5", "3,oops"}
    # partially-parseable cells still surface alongside the raw line
    assert {r["v"] for r in quarantined.collect()} == {2.5, None}


def test_capture_corrupt_requires_schema(spark, csv_file):
    with pytest.raises(ValueError, match="schema"):
        read_csv(spark, csv_file, capture_corrupt=True)
