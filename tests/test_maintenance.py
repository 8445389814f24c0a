"""File-layout assertions for the maintenance operators (the
content-neutrality is oracle-checked; the LAYOUT effect is what these
verify)."""

import glob
import os


def test_compaction_reduces_file_count(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from data_pipeline_spark_spark.catalog import load

    frag = str(tmp_path / "frag")
    compacted = str(tmp_path / "compact")
    d = load(spark, sf_dir, "documents")
    d.repartition(32).write.parquet(frag)
    assert len(glob.glob(os.path.join(frag, "*.parquet"))) == 32
    spark.read.parquet(frag).coalesce(2).write.parquet(compacted)
    assert len(glob.glob(os.path.join(compacted, "*.parquet"))) == 2
    assert (
        spark.read.parquet(compacted).count() == d.count()
    ), "compaction must be content-neutral"


def test_schema_evolution_backfills_nulls(spark, sf_dir):
    from data_pipeline_spark_spark.operators.maintenance import schema_evolution

    df = schema_evolution(spark, sf_dir)
    assert "o_priority_rank" in df.columns
    # old batch rows surface with NULL in the new column
    assert df.filter(df.o_priority_rank.isNull()).count() > 0
    assert df.filter(df.o_priority_rank.isNotNull()).count() > 0
