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


def test_dynamic_overwrite_touches_only_target_partition(spark, sf_dir, tmp_path):
    """partitionOverwriteMode=dynamic must replace exactly the
    partitions present in the corrected batch: the target day's files
    are rewritten, every other day's files stay byte-identical
    (same paths, sizes, and mtimes)."""
    from pyspark.sql import functions as F

    from data_pipeline_spark_spark.catalog import load

    e = load(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"),
        F.round(F.col("value") * 1000).cast("bigint").alias("mv"),
    )
    root = str(tmp_path / "dynpart")
    e.write.partitionBy("day").mode("overwrite").parquet(root)

    days = sorted(d for d in os.listdir(root) if d.startswith("day="))
    assert len(days) >= 2
    target, untouched = days[0], days[1:]
    before = {
        d: {
            f: (os.path.getsize(p), os.path.getmtime(p))
            for f in os.listdir(os.path.join(root, d))
            if not f.startswith((".", "_"))
            for p in [os.path.join(root, d, f)]
        }
        for d in untouched
    }
    target_day = target.split("=", 1)[1]

    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            e.filter(F.col("day") == target_day)
            .withColumn("mv", F.col("mv") * 2)
            .write.partitionBy("day")
            .mode("overwrite")
            .parquet(root)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)

    after = {
        d: {
            f: (os.path.getsize(p), os.path.getmtime(p))
            for f in os.listdir(os.path.join(root, d))
            if not f.startswith((".", "_"))
            for p in [os.path.join(root, d, f)]
        }
        for d in untouched
    }
    assert after == before, "non-target partitions were rewritten"
    # and the target day really was corrected
    got = (
        spark.read.parquet(root)
        .filter(F.col("day") == target_day)
        .agg(F.sum("mv"))
        .collect()[0][0]
    )
    want = 2 * (
        e.filter(F.col("day") == target_day).agg(F.sum("mv")).collect()[0][0]
    )
    assert got == want
