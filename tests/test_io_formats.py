"""read_table/write_table: format routing, round-trips, partitioned
writes with partition pruning."""

import pytest

from recipys_spark.sources.io import _path_format, read_table, write_table

SF = "/root/testdata/sf0.001"


def _sorted_rows(df, keys=("event_id",)):
    return [tuple(r) for r in df.orderBy(*keys).collect()]


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


def test_path_format_routing():
    assert _path_format("/x/t.parquet", None) == "parquet"
    assert _path_format("/x/t.orc/", None) == "orc"
    assert _path_format("/x/t.csv", None) == "csv"
    assert _path_format("/x/t.jsonl", None) == "json"
    assert _path_format("/x/whatever", None) == "parquet"  # default
    assert _path_format("/x/t.csv", "json") == "json"  # explicit wins


@pytest.mark.parametrize("suffix", ["orc", "json", "csv"])
def test_roundtrip_exact(spark, events, tmp_path_factory, suffix):
    path = str(tmp_path_factory.mktemp("io") / f"events.{suffix}")
    write_table(events, path)
    back = read_table(spark, path, schema=events.schema)
    assert back.schema == events.schema
    assert _sorted_rows(back) == _sorted_rows(events)


def test_partitioned_write_prunes(spark, events, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("io") / "events_part.parquet")
    write_table(events, path, partition_by=["event_type"])
    back = read_table(spark, path)
    one = back.where(back.event_type == "purchase")
    plan = one._jdf.queryExecution().executedPlan().toString()
    # hive-style partition filter never reaches the data scan as a
    # post-scan Filter: pruning happens at file listing
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    expect = events.where(events.event_type == "purchase").count()
    assert one.count() == expect


def test_csv_reader_without_schema_infers(spark, events, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("io") / "small.csv")
    write_table(events.select("event_id", "user_id", "value").limit(50), path)
    back = read_table(spark, path)
    assert back.count() == 50
    assert dict(back.dtypes)["value"] == "double"
