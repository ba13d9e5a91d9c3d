"""DDL + IO round-trips: create/list/drop tables, partitioned writes,
bucketed tables (shuffle-free joins), csv/json round-trips."""

from __future__ import annotations

import shutil
import tempfile

import pytest

import ibis_spark as ib


@pytest.fixture(scope="module")
def con(spark):
    return ib.connect(spark)


def test_create_list_drop_view(con):
    t = con.memtable({"x": [1, 2]})
    con.create_table("ddl_view_smoke", t)
    assert "ddl_view_smoke" in con.list_tables()
    assert con.table("ddl_view_smoke").df.count() == 2
    con.drop_view("ddl_view_smoke")
    assert "ddl_view_smoke" not in con.list_tables()


def test_partitioned_parquet_prunes(con, spark):
    t = con.memtable({"k": ["a", "a", "b"], "v": [1, 2, 3]})
    d = tempfile.mkdtemp(prefix="ibis_spark_part_")
    try:
        t.to_parquet(d, partition_by="k")
        back = con.read_parquet(d)
        pruned = back.filter(back.k == "a")
        plan = pruned.explain("formatted")
        assert pruned.df.count() == 2
        # partition filter must reach the scan, not a post-scan Filter
        assert "PartitionFilters" in plan and "isnotnull(k" in plan
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_bucketed_table_join_no_shuffle(con, spark):
    big = con.memtable({"k": list(range(100)), "v": [float(i) for i in range(100)]})
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        con.create_table("bkt_a", big, temp=False, bucket_by="k", num_buckets=4, sort_by="k")
        con.create_table("bkt_b", big, temp=False, bucket_by="k", num_buckets=4, sort_by="k")
        a = con.table("bkt_a")
        b = con.table("bkt_b")
        j = a.join(b, [("k", "k")])
        plan = j.explain("formatted")
        assert j.df.count() == 100
        # bucketed co-located join: no Exchange feeding the SortMergeJoin
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        con.spark.sql("DROP TABLE IF EXISTS bkt_a")
        con.spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_insert_and_list_databases(con):
    t = con.memtable({"x": [1, 2]})
    con.create_table("ins_smoke", t, temp=False)
    try:
        con.insert("ins_smoke", con.memtable({"x": [3]}))
        assert con.table("ins_smoke").df.count() == 3
        assert "default" in con.list_databases()
    finally:
        con.spark.sql("DROP TABLE IF EXISTS ins_smoke")


def test_csv_json_roundtrip(con):
    t = con.memtable({"a": [1, 2], "b": ["x", "y"]})
    d1 = tempfile.mkdtemp(prefix="ibis_spark_csv_")
    d2 = tempfile.mkdtemp(prefix="ibis_spark_json_")
    try:
        t.to_csv(d1, header=True)
        t.to_json(d2)
        back_csv = con.read_csv(d1)
        back_json = con.read_json(d2)
        assert back_csv.df.count() == 2
        assert sorted(r.b for r in back_json.df.collect()) == ["x", "y"]
    finally:
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)


def test_to_pyarrow_batches_streams(con, spark):
    import pyarrow as pa

    from ibis_spark.expr.table import Table

    df = spark.range(0, 10_000, 1, 8).selectExpr("id", "id * 2 AS dbl")
    t = Table(df)
    reader = t.to_pyarrow_batches(chunk_size=512)
    # contract: a streaming RecordBatchReader, not a materialized Table
    assert isinstance(reader, pa.RecordBatchReader)
    total = 0
    seen_ids = []
    for batch in reader:
        assert batch.num_rows <= 512
        total += batch.num_rows
        seen_ids.extend(batch.column("id").to_pylist())
    assert total == 10_000
    assert sorted(seen_ids) == list(range(10_000))


def test_to_pyarrow_batches_empty(con, spark):
    from ibis_spark.expr.table import Table

    df = spark.range(0, 10).filter("id < 0")
    reader = Table(df).to_pyarrow_batches()
    assert reader.read_all().num_rows == 0


def test_backend_catalog_surface(con):
    t = con.memtable({"x": [1, 2, 3]})
    con.create_view("cat_t", t)
    assert "cat_t" in list(con.tables)
    assert con.tables.cat_t.count() == 3
    assert con.tables["cat_t"].count() == 3
    assert str(dict(con.get_schema("cat_t").items())["x"]) == "int64"
    assert con.current_database == "default"
    assert con.current_catalog == "spark_catalog"
    assert con.list_catalogs() == ["spark_catalog"]
    assert con.version.startswith("4.")
    assert con.execute(t.x.sum()) == 6
    assert con.has_operation("StringLength")
    assert con.has_operation("asof_join")
    assert not con.has_operation("NoSuchOperation")
    con.create_database("tmp_db_x", force=True)
    assert "tmp_db_x" in con.list_databases()
    con.drop_database("tmp_db_x", force=True)
    assert type(type(con).from_connection(con.spark)).__name__ == "Backend"


def test_create_table_schema_only(con):
    t = con.create_table("schema_only_t", schema={"a": "int64", "b": "string"})
    assert t.columns == ["a", "b"]
    assert t.count() == 0
