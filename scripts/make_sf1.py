"""Build a local sf1-equivalent fixture decade at /tmp/dps_sf1
(r11 VERDICT ask #5: the cross-SF evidence stopped at sf0.1; this
adds the third decade so scripts/scaling_probe.py can report
sf0.01 → sf0.1 → sf1 growth factors).

Construction — 10 structure-preserving replicas of the official
sf0.1 tables, NOT naive row duplication:

- ``documents`` (5k → 50k): replica ``r`` shifts every token by
  ``7·r`` positions through the sorted corpus vocabulary (a
  whole-stage-codegen ``transform`` over a literal map). Token
  frequency profile, doc-length distribution, and WITHIN-replica
  duplicate/near-dup structure are preserved exactly; a doc and its
  rotation share tokens only by coincidence, so cross-replica pair
  density matches the random-pair baseline — the pair rungs see a
  true 10× corpus, not a 10×-denser duplicate cluster (that regime
  is scaling_probe --dense's job).
- ``embeddings`` (2k → 20k): replica ``r`` applies an isometry
  (roll coordinates by ``r``, flip signs by ``r``'s bit pattern) —
  norms and within-replica dot products are bit-preserved, replicas
  are mutually decorrelated.
- ``lineitem/orders/customer/part/supplier`` (600k → 6M, …): key
  columns get per-replica offsets consistently across fact and
  dimension tables, so every join fans out exactly as at sf0.1.
- ``events`` (100k → 1M): event_id/user_id offsets, timestamps
  unchanged (10× users, same per-user series shape).
- ``nation``/``region``: copied — TPC-H dimensions do not scale.

Deterministic (no RNG anywhere). Reuses a complete build via the
_SUCCESS marker of the last-written table. ~1 min on local[32].

Usage: python scripts/make_sf1.py   # prints the fixture dir
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(
    os.environ.get("TMPDIR", "/tmp"), "dps_sf1"
)
REPS = 10

# per-replica key offsets = the sf0.1 cardinality of each key space
OFFSETS = {
    "o_orderkey": 150_000,
    "l_orderkey": 150_000,
    "o_custkey": 15_000,
    "c_custkey": 15_000,
    "p_partkey": 20_000,
    "l_partkey": 20_000,
    "s_suppkey": 1_000,
    "l_suppkey": 1_000,
    "event_id": 100_000,
    "user_id": 1_500,
    "doc_id": 5_000,
    "vec_id": 2_000,
}

REPLICATED = ("customer", "supplier", "part", "orders", "lineitem", "events")
COPIED = ("nation", "region")


def _done() -> bool:
    return os.path.exists(
        os.path.join(OUT, "embeddings.parquet", "_SUCCESS")
    )


def build(spark) -> str:
    import shutil

    import numpy as np
    from pyspark.sql import functions as F

    from data_pipeline_spark_spark.catalog import load

    if _done():
        return OUT
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)

    def reps_of(df, keys):
        parts = []
        for r in range(REPS):
            cols = [
                (F.col(c) + r * OFFSETS[c]).alias(c) if c in keys else c
                for c in df.columns
            ]
            parts.append(df.select(*cols))
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    for t in COPIED:
        load(spark, SRC, t).write.mode("overwrite").parquet(
            os.path.join(OUT, f"{t}.parquet")
        )
    for t in REPLICATED:
        df = load(spark, SRC, t)
        keyed = [c for c in df.columns if c in OFFSETS]
        reps_of(df, keyed).write.mode("overwrite").parquet(
            os.path.join(OUT, f"{t}.parquet")
        )

    # documents: vocabulary-rotation replicas
    docs = load(spark, SRC, "documents")
    vocab = sorted(
        r[0]
        for r in docs.select(
            F.explode(F.split("text", " ")).alias("t")
        )
        .distinct()
        .collect()
    )
    V = len(vocab)
    parts = []
    for r in range(REPS):
        if r == 0:
            parts.append(docs)
            continue
        pairs = []
        for j, tok in enumerate(vocab):
            pairs.extend([F.lit(tok), F.lit(vocab[(j + 7 * r) % V])])
        rot = F.create_map(*pairs)
        text = F.array_join(
            F.transform(F.split("text", " "), lambda t: rot[t]), " "
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + r * OFFSETS["doc_id"]).alias("doc_id"),
                text.alias("text"),
                "lang",
                "source",
            ).withColumn("n_chars", F.length("text").cast("long"))
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(os.path.join(OUT, "documents.parquet"))

    # embeddings: isometric replicas built driver-side (2k × 64 floats)
    emb = load(spark, SRC, "embeddings").orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in emb], dtype=np.int64)
    labels = np.array([r.label for r in emb], dtype=np.int32)
    E = np.array([r.embedding for r in emb], dtype=np.float32)
    dim = E.shape[1]
    rows = []
    for r in range(REPS):
        signs = np.array(
            [(-1.0 if (r >> (c % 8)) & 1 else 1.0) for c in range(dim)],
            dtype=np.float32,
        )
        Er = np.roll(E, r, axis=1) * signs
        for i in range(len(ids)):
            rows.append(
                (
                    int(ids[i] + r * OFFSETS["vec_id"]),
                    [float(x) for x in Er[i]],
                    int(labels[i]),
                )
            )
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(4).write.mode("overwrite").parquet(
        os.path.join(OUT, "embeddings.parquet")
    )
    return OUT


def main() -> None:
    from data_pipeline_spark_spark.session import get_spark

    spark = get_spark("make-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    print(build(spark))
    spark.stop()


if __name__ == "__main__":
    main()
