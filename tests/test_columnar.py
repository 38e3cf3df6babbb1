"""ORC round-trip + pushdown gates; Avro module-gating (SURVEY §2
sources breadth)."""

from __future__ import annotations

import contextlib
import io as pyio
import tempfile

import pytest
from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.sources import columnar


def plan_of(df) -> str:
    buf = pyio.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def orc_path(spark, sf_small):
    docs = fio.load_table(spark, sf_small, "documents")
    path = tempfile.mkdtemp(prefix="fvs_orc_") + "/docs"
    columnar.write_orc(docs, path)
    return path


def test_orc_round_trip_exact(spark, sf_small, orc_path):
    docs = fio.load_table(spark, sf_small, "documents")
    back = columnar.read_orc(spark, orc_path)
    assert back.schema == docs.schema
    assert back.count() == docs.count()
    a = {r.doc_id: r.text for r in docs.collect()}
    b = {r.doc_id: r.text for r in back.collect()}
    assert a == b


def test_orc_filter_pushdown_reaches_scan(spark, orc_path):
    df = columnar.read_orc(spark, orc_path).where(F.col("doc_id") < 10)
    plan = plan_of(df)
    assert "PushedFilters" in plan and "LessThan(doc_id,10)" in plan, plan


def test_orc_partitioned_write_prunes(spark, sf_small):
    docs = fio.load_table(spark, sf_small, "documents")
    path = tempfile.mkdtemp(prefix="fvs_orc_part_") + "/docs"
    columnar.write_orc(docs, path, partition_by="lang")
    df = columnar.read_orc(spark, path).where(F.col("lang") == "en")
    plan = plan_of(df)
    assert "PartitionFilters" in plan and "lang" in plan, plan
    n_en = docs.where(F.col("lang") == "en").count()
    assert df.count() == n_en


def test_avro_gated_or_round_trips(spark, sf_small):
    if not columnar.avro_available(spark):
        with pytest.raises(NotImplementedError, match="spark-avro"):
            columnar.read_avro(spark, "/tmp/whatever.avro")
        return
    docs = fio.load_table(spark, sf_small, "documents")
    path = tempfile.mkdtemp(prefix="fvs_avro_") + "/docs"
    docs.write.mode("overwrite").format("avro").save(path)
    back = columnar.read_avro(spark, path)
    assert back.count() == docs.count()


def test_to_parquet_lands_columnar(spark, sf_small):
    docs = fio.load_table(spark, sf_small, "documents")
    path = tempfile.mkdtemp(prefix="fvs_land_") + "/docs"
    columnar.to_parquet(docs, path)
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    plan = plan_of(back.select("doc_id").where(F.col("doc_id") < 5))
    assert "ReadSchema: struct<doc_id:bigint>" in plan, plan
