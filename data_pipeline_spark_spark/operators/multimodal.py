"""Multimodal columns: opaque binary payloads + typed metadata.

EXT tier (north-star): image/audio/video as `binary` columns with a
metadata struct, processed by Arrow-batched `mapInPandas` operators.
The decode step itself (JPEG/PNG/audio codecs) is STUBBED — the
codec libraries are not in this container — behind
``decode_image_stub``; everything Spark-side (schema, batch shape,
partitioning, UDF signatures) is real and tested, so swapping the
stub for PIL/torchvision is a one-function change.

Scale notes: binary payloads make rows wide — keep
spark.sql.files.maxPartitionBytes moderate so tasks stay balanced,
process with mapInPandas (one Arrow batch of payloads at a time, no
per-row pickling), and never groupBy on payload bytes (fingerprint
first, shuffle digests).
"""

from __future__ import annotations

from collections.abc import Iterator

import hashlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import fan_out, load
from ..registry import query


def real_codecs_enabled() -> bool:
    """The real-codec path is an EXPLICIT opt-in (DPS_REAL_CODECS=1),
    not an import probe: keyed on import success, an environment that
    happens to have Pillow installed would silently decode any payload
    that parses as an image and diverge from the sha256-arithmetic
    oracle — environment-dependent correctness, the worst kind
    (ADVICE r7). Production sets the flag; oracle-checked runs never
    do."""
    import os

    return os.environ.get("DPS_REAL_CODECS") == "1"


def decode_image_stub(payload: bytes) -> dict:
    """Image decode with a gated real-codec path.

    With DPS_REAL_CODECS=1 and a decodable payload, return the
    codec's true size/mode — the operator is production-real where
    explicitly enabled. Otherwise fall back to a deterministic fake
    derived from the payload digest, so the pipeline has varying
    values to aggregate and the DuckDB oracle (pure sha256
    arithmetic) stays exact regardless of which libraries the
    container ships."""
    if real_codecs_enabled():
        try:
            import io

            from PIL import Image  # not in this container; guarded

            with Image.open(io.BytesIO(payload)) as im:
                return {
                    "width": im.width,
                    "height": im.height,
                    "mode": im.mode,
                }
        except Exception:
            pass
    digest = hashlib.sha256(payload).digest()
    return {
        "width": 64 + digest[0] % 192,   # fake 64..255 px
        "height": 64 + digest[1] % 192,
        "mode": "RGB" if digest[2] % 2 == 0 else "L",
    }


def attach_payload(df: DataFrame) -> DataFrame:
    """Synthesize a binary payload column from text (the fixtures have
    no real media); in production this column comes from the source."""
    return df.withColumn("payload", F.encode(F.col("text"), "UTF-8"))


def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas operator: binary payload batch → decoded feature
    batch. One Arrow batch in, one out; no driver involvement."""
    for pdf in batches:
        meta = pdf["payload"].map(lambda p: decode_image_stub(bytes(p)))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len),
                "width": meta.map(lambda m: m["width"]),
                "height": meta.map(lambda m: m["height"]),
                "mode": meta.map(lambda m: m["mode"]),
            }
        )


@query(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS payload_fp,
           CASE WHEN octet_length(encode(text)) > 256 THEN 'large'
                ELSE 'small' END AS size_class
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column: byte length,
    content fingerprint, size class — all JVM-side, payload never
    leaves the executor."""
    d = attach_payload(load(spark, sf_dir, "documents"))
    n_bytes = F.octet_length(F.col("payload")).cast("bigint")
    return d.select(
        "doc_id",
        n_bytes.alias("n_bytes"),
        F.md5(F.col("text")).alias("payload_fp"),
        F.when(n_bytes > 256, "large").otherwise("small").alias("size_class"),
    )


# The stub decode is a pure function of sha256(payload), so the whole
# pipeline IS SQL-expressible: DuckDB's sha256() hashes the same UTF-8
# bytes, and digest byte i is the hex pair at 2i — extracted with
# strpos over the hex alphabet. Width/height sums stay exact bigints
# (an avg would re-open the Spark-vs-DuckDB double-ROUND gap).
_HEXVAL_A = "(strpos('0123456789abcdef', substr(hx, {p}, 1)) - 1)"


def _digest_byte(i: int) -> str:
    """SQL expression for sha256-digest byte ``i`` of column ``hx``."""
    hi = _HEXVAL_A.format(p=2 * i + 1)
    lo = _HEXVAL_A.format(p=2 * i + 2)
    return f"({hi} * 16 + {lo})"


_DECODE_SQL = f"""
    WITH h AS (
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             sha256(text) AS hx
      FROM documents
    ),
    b AS (
      SELECT n_bytes,
             {_digest_byte(0)} AS b0,
             {_digest_byte(1)} AS b1,
             {_digest_byte(2)} AS b2
      FROM h
    )
    SELECT CASE WHEN b2 % 2 = 0 THEN 'RGB' ELSE 'L' END AS mode,
           COUNT(*) AS n_items,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(SUM(64 + b0 % 192) AS BIGINT) AS sum_width,
           CAST(SUM(64 + b1 % 192) AS BIGINT) AS sum_height
    FROM b
    GROUP BY mode
"""


@query("multimodal_decode", oracle=_DECODE_SQL)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode pipeline: payload → mapInPandas(decode_batch) →
    per-item features → aggregate by decoded mode. The stub decode is
    a deterministic function of the payload's sha256 digest, so the
    DuckDB oracle replays it in SQL (digest-byte extraction from the
    hex form) — the mapInPandas plumbing gets a full value-hash
    check, not just a rows-only run. Width/height are summed as exact
    bigints; a rounded avg would hit the cross-engine double-ROUND
    boundary gap (see verify-skill gotchas)."""
    d = attach_payload(fan_out(load(spark, sf_dir, "documents"))).select("doc_id", "payload")
    decoded = d.mapInPandas(
        decode_batch,
        schema="doc_id long, n_bytes long, width int, height int, mode string",
    )
    return decoded.groupBy("mode").agg(
        F.count("*").alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum("width").alias("sum_width"),
        F.sum("height").alias("sum_height"),
    )


def resize_stub(payload: bytes, target: int) -> bytes:
    """Stand-in for a real image resize (PIL thumbnail → bytes).
    Deterministic fake: truncate/pad the payload to `target` bytes so
    output sizes are exact and testable. Swap for a codec call in
    production."""
    if len(payload) >= target:
        return payload[:target]
    return payload + b"\x00" * (target - len(payload))


_RESIZE_SQL = """
    SELECT CAST(128 AS BIGINT) AS bytes_out,
           COUNT(*) AS n_items,
           CAST(SUM(octet_length(encode(text))) AS BIGINT)
             AS total_bytes_in,
           CAST(MIN(octet_length(encode(text))) AS BIGINT)
             AS min_bytes_in,
           CAST(MAX(octet_length(encode(text))) AS BIGINT)
             AS max_bytes_in
    FROM documents
"""


@query("multimodal_resize", oracle=_RESIZE_SQL)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pipeline: payload batch → mapInPandas(resize) → new
    binary column + before/after sizes, aggregated per size class.
    The Spark-side contract (binary in, binary out, Arrow-batched,
    schema-declared) is exactly what a PIL/torchvision resize needs;
    only the stub body changes. The stub truncates-or-pads every
    payload to exactly 128 bytes, so the oracle is a single-group
    exact-integer aggregate over input byte lengths."""
    target = 128
    d = attach_payload(fan_out(load(spark, sf_dir, "documents"))).select(
        "doc_id", "payload"
    )

    def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(lambda p: resize_stub(bytes(p), target))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "bytes_in": pdf["payload"].map(len),
                    "bytes_out": resized.map(len),
                }
            )

    out = d.mapInPandas(
        resize_batch, schema="doc_id long, bytes_in long, bytes_out long"
    )
    return out.groupBy("bytes_out").agg(
        F.count("*").alias("n_items"),
        F.sum("bytes_in").alias("total_bytes_in"),
        F.min("bytes_in").alias("min_bytes_in"),
        F.max("bytes_in").alias("max_bytes_in"),
    )


# DuckDB has no BLOB substring, so frame chunks are compared via the
# payload's hex form: byte range [fi*16, fi*16+16) = hex chars
# [fi*32+1, +32]. Spark counts distinct 64-bit sha256 prefixes of the
# chunks; distinct prefixes == distinct chunks barring a 2^-64
# collision, so the counts agree.
_FRAME_SQL = """
    WITH f AS (
      SELECT doc_id,
             hex(encode(text)) AS hx,
             octet_length(encode(text)) // 16 AS n_frames
      FROM documents
    )
    SELECT doc_id,
           COUNT(*) AS n_sampled_frames,
           CAST(COUNT(DISTINCT substr(hx, fi * 32 + 1, 32)) AS BIGINT)
             AS n_distinct_frames
    FROM f, unnest(range(0, n_frames, 4)) AS t(fi)
    GROUP BY doc_id
"""


@query("multimodal_frame_sample", oracle=_FRAME_SQL)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video-like payloads: each payload is treated
    as a frame container (fixed 16-byte frames for the stub); every
    k-th frame is emitted as its own row — the one-payload-in,
    many-rows-out shape (mapInPandas, not a scalar UDF, precisely
    because the cardinality changes). Deterministic: frame digests
    derive from payload bytes, so the oracle replays the stride-4
    sampling with a lateral range() and compares per-doc frame
    counts."""
    frame_size, stride = 16, 4
    d = attach_payload(fan_out(load(spark, sf_dir, "documents"))).select(
        "doc_id", "payload"
    )

    def sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = max(len(raw) // frame_size, 0)
                for fi in range(0, n_frames, stride):
                    chunk = raw[fi * frame_size : (fi + 1) * frame_size]
                    rows.append(
                        (
                            int(doc_id),
                            fi,
                            hashlib.sha256(chunk).hexdigest()[:16],
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_fp"]
            )

    frames = d.mapInPandas(
        sample_batch, schema="doc_id long, frame_idx int, frame_fp string"
    )
    return frames.groupBy("doc_id").agg(
        F.count("*").alias("n_sampled_frames"),
        F.countDistinct("frame_fp").alias("n_distinct_frames"),
    )


_FEAT_DIM = 8


def feature_extract_stub(payload: bytes) -> list[float]:
    """Stand-in for a real visual/audio feature extractor (CLIP/VGG
    embedding, mel-spectrogram stats). Deterministic fake: 8 floats
    in [0, 1) derived from the payload digest, so downstream plumbing
    (array column, norms, similarity join) computes over real varying
    vectors. Replace the body with a model call in production:

        raise NotImplementedError("vision models not available in this container")
    """
    digest = hashlib.sha256(payload).digest()
    return [digest[i] / 255.0 for i in range(_FEAT_DIM)]


def feature_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas operator: binary payload batch → feature-vector
    batch. The expensive step (the model forward pass) sees one Arrow
    batch of payloads at a time — at scale this is where a GPU stage
    slots in, with spark.task.resource.gpu.amount pinning tasks to
    devices; the DataFrame contract does not change."""
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "feature": pdf["payload"].map(
                    lambda p: feature_extract_stub(bytes(p))
                ),
            }
        )


# Float parity argument, term by term: the stub's digest[i]/255.0 is
# a Python double narrowed to float32 by Arrow; the oracle's
# CAST(b_i/255.0 AS FLOAT) narrows the same double the same way.
# Spark multiplies float*float in f32; DuckDB's FLOAT*FLOAT product is
# exact in f64 (≤48 significand bits) so its single narrowing equals
# the JVM's — no double-rounding gap. Both engines then fold the
# identical f64 addends left-to-right (Spark's F.aggregate and SQL's
# left-assoc +), so sqrt sees a bit-identical sum. ROUND(…, 4) is
# safe: k/255 sits ≥1.9e-7 from every 4-decimal half-boundary while
# f32 error is ≤6e-8.
_FEAT_X = ",\n             ".join(
    f"CAST({_digest_byte(i)} / 255.0 AS FLOAT) AS x{i}"
    for i in range(_FEAT_DIM)
)
_FEAT_CHAIN = " + ".join(
    f"CAST(x{i} * x{i} AS DOUBLE)" for i in range(_FEAT_DIM)
)
_FEAT_SQL = f"""
    WITH h AS (SELECT doc_id, sha256(text) AS hx FROM documents),
    x AS (
      SELECT doc_id,
             {_FEAT_X}
      FROM h
    )
    SELECT doc_id,
           ROUND(sqrt({_FEAT_CHAIN}), 4) AS l2_norm,
           ROUND(CAST(x0 AS DOUBLE), 4) AS f0
    FROM x
    ORDER BY doc_id
"""


@query("multimodal_feature_extract", oracle=_FEAT_SQL)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction pipeline — the bridge from opaque media
    bytes to the embedding operators: payload → mapInPandas(model
    stub) → array<float> column → JVM-side L2 norms and a top-value
    summary per feature dimension. Completes the multimodal ladder
    (meta → decode → resize/frame-sample → feature-extract); the
    extracted arrays are exactly the shape `sim_search` /
    `embedding_quantize` consume. The stub derives features from
    sha256, so the oracle replays the digest→float32→norm pipeline
    in SQL with bit-exact float parity (see `_FEAT_SQL`)."""
    d = attach_payload(fan_out(load(spark, sf_dir, "documents"))).select(
        "doc_id", "payload"
    )
    feats = d.mapInPandas(
        feature_batch, schema="doc_id long, feature array<float>"
    )
    # the L2 fold is functions/vector.py's norm_f32sq() over the RAW
    # float array: the oracle's CAST(x*x AS DOUBLE) addends are
    # f32-narrowed squares (DuckDB FLOAT*FLOAT yields FLOAT), so the
    # Spark fold must square in f32 too — norm(as_double_array(·))
    # squares in f64 and differs by up to half an f32 ulp per addend
    # (r17 advisor finding; the r16 'value-identical' dedup into the
    # similarity family's double-norm was NOT value-identical).
    from ..functions.vector import norm_f32sq

    norm = norm_f32sq(F.col("feature"))
    return (
        feats.select(
            "doc_id",
            F.round(norm, 4).alias("l2_norm"),
            F.round(F.element_at("feature", 1).cast("double"), 4).alias("f0"),
        )
        .orderBy("doc_id")
    )


@query(
    "multimodal_arrow_scan",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_payloads,
           CAST(SUM(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT)
             AS total_bytes,
           CAST(MAX(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT)
             AS max_bytes,
           CAST(SUM(CASE WHEN octet_length(encode(text)) % 2 = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_even
    FROM documents
    """,
)
def multimodal_arrow_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-copy payload scan via ``mapInArrow``: each task receives
    raw ``pyarrow.RecordBatch`` objects and reduces binary payload
    sizes WITHOUT materializing pandas Series — the lowest-overhead
    Python hook Spark offers, and the right one when the per-batch
    work is a vectorized pyarrow.compute call (pandas conversion would
    copy every payload buffer just to measure it). Completes the
    Python-boundary ladder: scalar pandas UDF ([[udf_surface]]),
    applyInPandas ([[udf_grouped_zscore]], [[dedup_semantic]],
    [[ts_downsample_lttb]]), mapInPandas ([[multimodal_decode]]),
    applyInPandasWithState (streaming), and mapInArrow (here).

    Each batch emits ONE partial-summary row (count/sum/max/even-count
    are all mergeable), so the final JVM aggregation shuffles one row
    per Arrow batch — the same partial-agg contract as any map-side
    combine, at any corpus size."""
    import pyarrow as pa
    import pyarrow.compute as pc

    d = attach_payload(fan_out(load(spark, sf_dir, "documents"))).select(
        "payload"
    )

    def batch_stats(batches):
        for batch in batches:
            lens = pc.binary_length(batch.column(0))
            lens64 = pc.cast(lens, pa.int64())
            n = len(batch)
            if n == 0:
                continue
            even = pc.sum(
                pc.cast(
                    pc.equal(pc.bit_wise_and(lens64, pa.scalar(1, pa.int64())),
                             pa.scalar(0, pa.int64())),
                    pa.int64(),
                )
            ).as_py()
            yield pa.RecordBatch.from_pydict(
                {
                    "n_payloads": pa.array([n], pa.int64()),
                    "total_bytes": pa.array(
                        [pc.sum(lens64).as_py()], pa.int64()
                    ),
                    "max_bytes": pa.array(
                        [pc.max(lens64).as_py()], pa.int64()
                    ),
                    "n_even": pa.array([even], pa.int64()),
                }
            )

    partial = d.mapInArrow(
        batch_stats,
        "n_payloads long, total_bytes long, max_bytes long, n_even long",
    )
    return partial.agg(
        F.sum("n_payloads").cast("bigint").alias("n_payloads"),
        F.sum("total_bytes").cast("bigint").alias("total_bytes"),
        F.max("max_bytes").cast("bigint").alias("max_bytes"),
        F.sum("n_even").cast("bigint").alias("n_even"),
    )


# ---------------------------------------------------------------------------
# multimodal_phash_near_dup — perceptual-hash near-duplicate detection
# ---------------------------------------------------------------------------

#: Average-hash geometry: the payload byte stream is "resized" to
#: this many cells (the 8×8 grid of the classic image aHash), one
#: threshold bit per cell.
_PH_CELLS = 64

#: Default LSH band count over the 64-bit hash (the registered keys
#: resolve theirs via [[resolve_phash_bands]]). With b bands and a
#: hamming threshold ≤ b−1, the banded join is EXACT by pigeonhole:
#: ≤ b−1 differing bits cannot touch all b bands, so every
#: qualifying pair shares at least one identical band — zero recall
#: loss, unlike probabilistic MinHash banding.
_PH_BANDS = 8

#: Semantic near-dup radius of the REGISTERED phash keys: report
#: pairs at hamming ≤ this, at EVERY corpus size. MUST stay < the
#: smallest band count [[resolve_phash_bands]] can pick (4) so each
#: resolver choice certifies it by pigeonhole — the band count is
#: then a pure plan knob that never changes the result, and the
#: static oracles stay exact at any SF (r16 self-review fix: the
#: earlier maxh = bands−1 coupling made the key's radius shrink
#: 7 → 3 when the resolver switched at 1 600 items while the oracle
#: stayed at 7 — query and oracle disagreed above the grading
#: fixture). The planted fixture pairs sit at hamming ≤ 3.
_PH_MAXH = 3

#: Candidate-density budget for [[resolve_phash_bands]]: expected
#: band-join candidates per item under a uniform-hash model,
#: bands·n/2^(64/bands). 50 sits an order under the measured sf1
#: cliff (the 8-band form at ~50k docs ≈ 1.6k candidates/item,
#: 35.7 s superlinear with one skewed band bucket = one straggler
#: task — SCALE.md r15) and an order over the healthy sf0.01 shape
#: (~20/item).
_PH_DENSITY = 50


def resolve_phash_bands(n_items: int) -> int:
    """Resolve the band count for [[phash_near_dup_pairs]] from the
    hashed-population size — the r15 verdict's missing wiring: the
    8-band form's 2^8 band alphabet saturates at ~50k docs (one
    skewed bucket, quadratic candidates) while 4×16-bit bands stay
    sparse, and nothing selected between them.

    Contract (same shape as the graph family's [[_bcast_pinned]]
    size resolution): the band count is a pure PLAN knob — both
    choices certify the fixed semantic radius [[_PH_MAXH]] = 3 by
    pigeonhole (≤ 3 differing bits cannot touch all 4, let alone all
    8, bands), so the resolver never changes the result, only the
    candidate density. Prefer 8 narrow bands (finer buckets, fewer
    verify calls per item at small n) while the expected candidate
    density 8·n/2^8 stays under [[_PH_DENSITY]] — i.e. n ≤ 1 600 —
    then 4×16-bit bands, whose 2^16 alphabet stays under budget to
    ~800k docs. Past that the scale knob is a 128-bit hash
    (_PH_CELLS), not fewer bands: radius ≤ 1 (2 bands) is useless
    for near-dup work."""
    if 8 * n_items <= _PH_DENSITY * (1 << 8):
        return 8
    return 4

#: Deterministic near-dup planting: every _PH_PLANT_MODth payload
#: gets a companion with two single-byte edits at the quarter and
#: half positions, offset into a disjoint id space. The fixture's
#: synthetic word-salad texts have near-uniform byte statistics and
#: length-shifted organic near-dups (hamming ~27-37, measured), so
#: without planting the key would be vacuous — the planting is part
#: of the QUERY (the oracle replays it identically), giving the
#: banded join real recall targets at every SF.
_PH_PLANT_MOD = 25
_PH_PLANT_OFFSET = 1_000_000

#: Byte value of hex digit pair at 0-based byte offset p of column
#: ``hx`` (uppercase hex in BOTH engines: Spark hex(binary) and
#: DuckDB hex(blob)); {instr} is instr/strpos.
_PH_HEXA = "0123456789ABCDEF"


def _ph_byte(instr: str, p: str) -> str:
    hi = f"({instr}('{_PH_HEXA}', substr(hx, CAST(2*({p})+1 AS INT), 1)) - 1)"
    lo = f"({instr}('{_PH_HEXA}', substr(hx, CAST(2*({p})+2 AS INT), 1)) - 1)"
    return f"({hi} * 16 + {lo})"


_PH_PLANT_SQL = f"""
      SELECT doc_id + {_PH_PLANT_OFFSET} AS doc_id,
             substr(text, 1, length(text)//4 - 1) || 'Z' ||
             substr(text, length(text)//4 + 1,
                    length(text)//2 - length(text)//4 - 1) || 'Z' ||
             substr(text, length(text)//2 + 1) AS text
      FROM base WHERE doc_id % {_PH_PLANT_MOD} = 0
"""

#: The full CTE chain through the verified pair set — shared by the
#: near-dup key's oracle and [[multimodal_phash_dedup_apply]]'s
#: transitive-closure oracle (one definition of the candidate graph).
_PH_CTES = f"""base AS (
      SELECT doc_id, text FROM documents
      WHERE octet_length(encode(text)) >= {_PH_CELLS}
    ),
    u AS (
      -- the byte-length gate re-applies AFTER planting: a planted
      -- companion can shrink below the hash's {_PH_CELLS}-byte
      -- minimum when the edit replaces a multi-byte character with
      -- 'Z' (r16 self-review — the Spark side's phash64 has always
      -- enforced this on its payload input; all-ASCII fixtures never
      -- exercise it, non-ASCII corpora would)
      SELECT doc_id, text FROM (
        SELECT doc_id, text FROM base
        UNION ALL
        {_PH_PLANT_SQL}
      ) WHERE octet_length(encode(text)) >= {_PH_CELLS}
    ),
    h AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             CAST(octet_length(encode(text)) AS BIGINT) AS t
      FROM u
    ),
    cellsums AS (
      SELECT doc_id, t,
        list_transform(range({_PH_CELLS}), c ->
          list_sum(list_transform(
            range(c*t//{_PH_CELLS}, (c+1)*t//{_PH_CELLS}),
            p -> {_ph_byte("strpos", "p")}))) AS cells
      FROM h
    ),
    bits AS (
      SELECT doc_id,
        list_transform(range({_PH_CELLS}), c ->
          CASE WHEN cells[CAST(c+1 AS INT)] * t >
                    list_sum(cells) *
                    ((c+1)*t//{_PH_CELLS} - c*t//{_PH_CELLS})
               THEN 1 ELSE 0 END) AS b
      FROM cellsums
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
        CAST(list_sum(list_transform(range({_PH_CELLS}), i ->
          CASE WHEN a.b[CAST(i+1 AS INT)] != b2.b[CAST(i+1 AS INT)]
               THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
      FROM bits a JOIN bits b2 ON a.doc_id < b2.doc_id
    )
"""

_PH_SQL = f"""
    WITH {_PH_CTES}
    SELECT * FROM pairs WHERE hamming <= {_PH_MAXH}
    ORDER BY hamming, doc_a, doc_b
"""


def phash64(df: DataFrame) -> DataFrame:
    """64-bit byte-stream average-hash over a binary ``payload``
    column: hex the payload once (let-bound as a real column — the
    per-byte lambdas reference it ~2·T times, and re-inlining
    hex(payload) would re-hex the payload PER BYTE, the r14 HOF
    cliff class), "resize" the byte stream to {cells} position cells
    with exact integer boundaries floor(c·T/{cells}), sum each
    cell's byte values in one O(T) pass, then threshold each cell
    against the global mean with the cross-multiplied exact compare
    ``cell_sum · T > total · cell_width``. Returns
    ``(doc_id, b array<int>)`` — the classic image aHash with "pixel
    luminance" = payload byte; swapping in a real decoded-thumbnail
    grid is the same one-column change as the other codec stubs.

    ``cells`` and ``hx`` are each referenced ≥ 2 times downstream,
    which is exactly the CollapseProject survival condition
    (SCALE.md r14 audit); the global total is folded from the
    64-element ``cells`` array, not the byte stream, so referencing
    it per cell is O({cells}²) worst-case on a tiny array, not
    O(T²) on the payload.

    Payloads shorter than {cells} bytes are EXCLUDED here (not just
    in the registered key): a width-0 cell would make Spark's
    INCLUSIVE sequence(a, a−1) generate a descending 2-element list
    where the oracle's half-open range(a, a) is empty — silently
    divergent garbage bits instead of an error (r15 review)."""
    c = _PH_CELLS
    df = df.filter(F.expr(f"octet_length(payload) >= {c}"))
    h = df.select(
        "doc_id",
        F.expr("hex(payload)").alias("hx"),
        F.expr("CAST(octet_length(payload) AS BIGINT)").alias("t"),
    )
    cells = h.select(
        "doc_id",
        "t",
        F.expr(
            f"transform(sequence(0, {c - 1}), c ->"
            f" aggregate(sequence(c*t div {c}, (c+1)*t div {c} - 1),"
            f" CAST(0 AS BIGINT), (a, p) -> a + {_ph_byte('instr', 'p')}))"
        ).alias("cells"),
    )
    return cells.select(
        "doc_id",
        F.expr(
            f"transform(sequence(0, {c - 1}), c ->"
            f" IF(element_at(cells, CAST(c+1 AS INT)) * t >"
            f"    aggregate(cells, CAST(0 AS BIGINT), (a, s) -> a + s)"
            f"    * ((c+1)*t div {c} - c*t div {c}), 1, 0))"
        ).alias("b"),
    )


def phash_near_dup_pairs(
    bits: DataFrame,
    bands: int = _PH_BANDS,
    maxh: int | None = None,
) -> DataFrame:
    """Exact banded hamming self-join over a ``(doc_id, b)`` hash
    frame: bucket each hash's ``bands`` disjoint bit slices, join on
    (band_id, band_val), verify hamming in-row, report pairs at
    hamming ≤ ``maxh`` (default ``bands − 1``, the largest threshold
    the pigeonhole exactness proof covers: ≤ bands−1 differing bits
    cannot touch all bands, so every qualifying pair shares an
    identical band — zero recall loss).

    ``bands`` is THE scale knob (the candidate-density bound, same
    finding as the r12 MinHash pair-rung note): band values draw
    from a 2^(64/bands) alphabet, and once the corpus saturates it,
    candidate pairs grow quadratically per bucket — measured on the
    fixture's byte-stat-concentrated hashes at sf1 (~50k docs), the
    8-band/8-bit form generates ~39M candidates (35.7 s) while
    4 bands of 16 bits (threshold ≤ 3) keeps buckets sparse. Pick
    the widest band (fewest bands) whose pigeonhole threshold still
    covers the hamming radius you need; the planted fixture pairs
    sit at hamming ≤ 3, inside even the 4-band guarantee.

    verify-then-dedup: hamming is a cheap in-row fold, so it runs
    per CANDIDATE (a pair sharing k bands verifies k times) and the
    filter lands BEFORE the dedup shuffle — deduping first would
    shuffle every candidate row carrying both 64-int hash arrays
    (measured ~800k candidates ≈ 0.8 GB of array payload at sf0.1,
    14.4 s end-to-end vs 1.9 s this way); after the filter only true
    near-dup rows (3 longs each) reach an exchange."""
    if maxh is None:
        maxh = bands - 1
    if maxh >= bands:
        raise ValueError(
            f"maxh={maxh} needs > {maxh} bands for exact recall"
        )
    w = _PH_CELLS // bands
    bframe = bits.select(
        "doc_id",
        "b",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), g ->"
                f" aggregate(slice(b, g*{w} + 1, {w}), 0,"
                f" (a, x) -> a*2 + x))"
            )
        ).alias("band_id", "band_val"),
    )
    a, b2 = bframe.alias("a"), bframe.alias("b2")
    ham = F.expr(
        "CAST(aggregate(zip_with(a.b, b2.b, (x, y) -> IF(x != y, 1, 0)),"
        " 0, (acc, v) -> acc + v) AS BIGINT)"
    )
    return (
        a.join(
            b2,
            (F.col("a.band_id") == F.col("b2.band_id"))
            & (F.col("a.band_val") == F.col("b2.band_val"))
            & (F.col("a.doc_id") < F.col("b2.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b2.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= maxh)
        .dropDuplicates(["doc_a", "doc_b"])
        .orderBy("hamming", "doc_a", "doc_b")
    )


@query("multimodal_phash_near_dup", oracle=_PH_SQL)
def multimodal_phash_near_dup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Perceptual-hash near-duplicate pairs over the multimodal
    payload column — the similarity operator the multimodal family
    was missing (plumbing existed: meta/decode/resize/frame_sample;
    nothing compared payloads). Real-world shape: aHash/pHash over
    decoded thumbnails, then a banded hamming self-join — the
    standard image-dedup pass in a multimodal training pipeline.
    Here the "image" is the payload byte stream itself (codec-free,
    same stub discipline as [[decode_image_stub]]), which preserves
    every distributed property of the real thing: per-item O(T)
    hashing, tiny fixed-width hashes, band-bucketed candidate
    generation, exact hamming verify.

    Recall is EXACT at the fixed radius (hamming ≤ {maxh} at every
    corpus size): {maxh} differing bits over {cells} bits in ≥ 4
    disjoint slices must leave ≥ 1 slice untouched (pigeonhole), so
    the band join misses nothing — an LSH with a proof instead of a
    probability. `bands` resolves from the hashed-population count
    via [[resolve_phash_bands]] (r16, closing the r15 saturation
    finding): {bands} narrow bands while the corpus keeps the
    expected candidate density under budget (n ≤ 1 600, which holds
    at the sf0.01 grading fixture's 505 items), 4×16-bit bands once
    the 2^8 band alphabet would saturate — a pure plan choice; both
    certify radius {maxh}, so the result (and the static oracle)
    is band-count-independent at any SF. Planted near-dups
    (two single-byte edits at quarter/half positions of every
    {mod}th payload, id-offset by {off}) make the key non-vacuous on
    the synthetic fixture (organic near-dups are length-shifted and
    land at hamming 27+ under position cells — measured, SCALE.md
    r15); the oracle replays the identical planting, hashing, and
    brute-force O(n²) pair scan, while the Spark side goes through
    the banded join — same fixed point, different asymptotics.

    Scale: hashing is one O(T)/payload in-row pass (no shuffle);
    candidates shuffle on (band_id, band_val) — bands·n rows of
    (long, int) — never payloads; the hamming verify runs on joined
    64-int arrays before any exchange. Band width WAS the one
    unwired scale knob (8-band: 35.7 s superlinear at sf1's ~50k
    docs, one saturated bucket = one straggler; 4×16-bit: 1.58 s
    linear — measured, SCALE.md r15); [[resolve_phash_bands]] now
    selects it from the population count, with a probe straddling
    the 1 600-item switch pinned in tests (the r15 graph-cap
    lesson: auto thresholds get straddling evidence).

    Reference parity note: the reference pipeline has no multimodal
    surface at all (its payloads are EEG CSVs); this extends the
    engine's LLM-training-data tier."""
    bits = phash64(_ph_population(spark, sf_dir)).localCheckpoint(
        eager=False
    )
    # the count is a driver-side scalar fold over the checkpointed
    # hash frame (the pagerank-node-count class) — it materializes
    # the checkpoint the band join reads anyway
    return phash_near_dup_pairs(
        bits, bands=resolve_phash_bands(bits.count()), maxh=_PH_MAXH
    )


@query("multimodal_phash_near_dup_4band", oracle=_PH_SQL)
def multimodal_phash_near_dup_4band(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """[[multimodal_phash_near_dup]] with the band count PINNED at 4
    — the arm [[resolve_phash_bands]] selects above 1,600 hashed
    items, which the sf0.01 grading fixture (505 items → 8 bands)
    never reaches, so without this twin the 4×16-bit plan had only
    builder-side evidence (bit-equality unit tests + an sf0.1
    side-by-side), never a driver CORRECTNESS row (r16 verdict ask
    #6). The oracle is the SAME static ``_PH_SQL``: 4 disjoint
    16-bit slices still certify the fixed radius hamming ≤ 3 by
    pigeonhole, so the band count is a pure plan knob and both arms
    share one fixed point — a driver-graded proof of exactly the
    resolver contract ('changes the PLAN, never the ANSWER')."""
    bits = phash64(_ph_population(spark, sf_dir)).localCheckpoint(
        eager=False
    )
    return phash_near_dup_pairs(bits, bands=4, maxh=_PH_MAXH)


def _ph_population(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashed payload population (eligible fixture docs + the
    planted near-dup companions) — factored so the pair key and
    [[multimodal_phash_dedup_apply]] hash EXACTLY the same items
    (twin of the oracle's ``u`` CTE inside [[_PH_CTES]])."""
    d = load(spark, sf_dir, "documents")
    base = d.filter(
        F.expr(f"octet_length(encode(text, 'UTF-8')) >= {_PH_CELLS}")
    ).select("doc_id", "text")
    planted = base.filter(
        F.col("doc_id") % _PH_PLANT_MOD == 0
    ).select(
        (F.col("doc_id") + _PH_PLANT_OFFSET).alias("doc_id"),
        F.expr(
            "concat(substr(text, 1, length(text) div 4 - 1), 'Z',"
            " substr(text, length(text) div 4 + 1,"
            "        length(text) div 2 - length(text) div 4 - 1), 'Z',"
            " substr(text, length(text) div 2 + 1))"
        ).alias("text"),
    )
    # fan_out before the O(T)/payload hash: the fixture parquet is a
    # single unsplittable row group, so without it the whole hash
    # stage runs in ONE task (measured 6.4 s single-task vs sub-second
    # spread at sf0.1); on a cluster the scan parallelizes and this
    # is a cheap round-robin
    return fan_out(base.unionByName(planted)).withColumn(
        "payload", F.encode(F.col("text"), "UTF-8")
    )


multimodal_phash_near_dup.__doc__ = (
    multimodal_phash_near_dup.__doc__.replace("{maxh}", str(_PH_MAXH))
    .replace("{cells}", str(_PH_CELLS))
    .replace("{bands}", str(_PH_BANDS))
    .replace("{mod}", str(_PH_PLANT_MOD))
    .replace("{off}", str(_PH_PLANT_OFFSET))
)

phash64.__doc__ = phash64.__doc__.replace("{cells}", str(_PH_CELLS))


# ---------------------------------------------------------------------------
# multimodal_scene_segments — temporal segmentation over the frame stream
# ---------------------------------------------------------------------------

#: Frame geometry shared with [[multimodal_frame_sample]] (16-byte
#: frames) and the boundary threshold on the |Δ luminance-sum|
#: between consecutive frames — 100 gives the fixture real texture
#: (mean ~5 segments of ~18 frames, range 1–15 at sf0.01; measured
#: while landing the key, not assumed).
_SCENE_FRAME_B = 16
_SCENE_TAU = 100

_SCENE_SQL = f"""
    WITH h AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             CAST(octet_length(encode(text)) AS BIGINT) AS t
      FROM documents
      WHERE octet_length(encode(text)) >= {_SCENE_FRAME_B}
    ),
    f AS (
      SELECT doc_id, t // {_SCENE_FRAME_B} AS nf,
        list_transform(range(t // {_SCENE_FRAME_B}), fr ->
          list_sum(list_transform(
            range(fr * {_SCENE_FRAME_B}, (fr + 1) * {_SCENE_FRAME_B}),
            p -> {_ph_byte("strpos", "p")}))) AS ft
      FROM h
    ),
    b AS (
      SELECT doc_id, nf,
        CASE WHEN nf >= 2 THEN COALESCE(list_sum(
          list_transform(range(1, CAST(nf AS INT)), fr ->
            CASE WHEN abs(list_extract(ft, CAST(fr + 1 AS INT))
                          - list_extract(ft, CAST(fr AS INT)))
                      > {_SCENE_TAU} THEN 1 ELSE 0 END)), 0)
        ELSE 0 END AS n_boundaries,
        CASE WHEN nf >= 2 THEN COALESCE(list_sum(
          list_transform(range(1, CAST(nf AS INT)), fr ->
            CASE WHEN abs(list_extract(ft, CAST(fr + 1 AS INT))
                          - list_extract(ft, CAST(fr AS INT)))
                      > {_SCENE_TAU} THEN fr ELSE 0 END)), 0)
        ELSE 0 END AS boundary_checksum
      FROM f
    )
    SELECT doc_id,
           CAST(nf AS BIGINT) AS n_frames,
           CAST(n_boundaries + 1 AS BIGINT) AS n_segments,
           CAST(boundary_checksum AS BIGINT) AS boundary_checksum,
           CAST((1000 * nf) // (n_boundaries + 1) AS BIGINT)
             AS mean_seg_len_milli
    FROM b
    ORDER BY doc_id
"""


@query("multimodal_scene_segments", oracle=_SCENE_SQL)
def multimodal_scene_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot/scene-boundary segmentation over the video-like frame
    stream: consecutive-frame luminance-sum deltas above a threshold
    cut the payload into segments — the temporal-structure operator
    completing the multimodal family ([[multimodal_frame_sample]]
    samples the stream, [[multimodal_phash_near_dup]] compares
    whole payloads; this finds structure WITHIN one payload: the
    standard pre-step before per-scene captioning or keyframe
    selection in a multimodal training pipeline). Same stub
    convention as the codec siblings: "frame" = {_SCENE_FRAME_B}
    payload bytes, "luminance" = byte sum; a real decoder swaps into
    the same column without touching the plan.

    Exactness: frame features are exact integer byte sums off the
    ONE let-bound hex column (the [[phash64]] discipline — re-hexing
    per frame is the O(T²) cliff); boundaries are integer compares;
    the segment-length summary is integer milli-division. The
    nf == 1 guard is load-bearing: Spark's INCLUSIVE sequence(1, 0)
    is a descending 2-list where DuckDB's half-open range(1, 1) is
    empty (the phash64 r15 review lesson, same trap one row up).

    Plan: shuffle-free in-row HOFs over a projected scan (the
    winnow/gopher class) — per-doc cost O(bytes), zero exchanges at
    any corpus size."""
    fb, tau = _SCENE_FRAME_B, _SCENE_TAU
    # fan_out BEFORE the per-byte work: the fixture parquet is one
    # unsplittable row group, so without it the O(bytes)/doc feature
    # pass runs on ONE core (the phash64 r15 cliff — measured here
    # too: 13.6 s → ~2 s at sf0.1)
    d = fan_out(load(spark, sf_dir, "documents")).withColumn(
        "payload", F.encode("text", "UTF-8")
    )
    h = d.filter(F.expr(f"octet_length(payload) >= {fb}")).select(
        "doc_id",
        F.expr("hex(payload)").alias("hx"),
        F.expr("CAST(octet_length(payload) AS BIGINT)").alias("t"),
    )
    f = h.select(
        "doc_id",
        F.expr(f"t div {fb}").alias("nf"),
        F.expr(
            f"transform(sequence(0, CAST(t div {fb} AS INT) - 1), fr ->"
            f" aggregate(sequence(fr * {fb}, (fr + 1) * {fb} - 1),"
            f" CAST(0 AS BIGINT), (a, p) -> a + {_ph_byte('instr', 'p')}))"
        ).alias("ft"),
    )
    delta = (
        f"abs(element_at(ft, CAST(fr + 1 AS INT))"
        f" - element_at(ft, CAST(fr AS INT))) > {tau}"
    )
    b = f.select(
        "doc_id",
        "nf",
        F.expr(
            f"IF(nf >= 2, aggregate(sequence(1, CAST(nf AS INT) - 1),"
            f" CAST(0 AS BIGINT), (a, fr) -> a + IF({delta}, 1, 0)), 0)"
        ).alias("n_boundaries"),
        F.expr(
            f"IF(nf >= 2, aggregate(sequence(1, CAST(nf AS INT) - 1),"
            f" CAST(0 AS BIGINT), (a, fr) -> a + IF({delta}, fr, 0)), 0)"
        ).alias("boundary_checksum"),
    )
    return b.select(
        "doc_id",
        F.col("nf").cast("bigint").alias("n_frames"),
        (F.col("n_boundaries") + 1).cast("bigint").alias("n_segments"),
        F.col("boundary_checksum").cast("bigint").alias(
            "boundary_checksum"
        ),
        F.expr("(1000 * nf) div (n_boundaries + 1)")
        .cast("bigint")
        .alias("mean_seg_len_milli"),
    ).orderBy("doc_id")


multimodal_scene_segments.__doc__ = multimodal_scene_segments.__doc__.replace(
    "{_SCENE_FRAME_B}", str(_SCENE_FRAME_B)
)


# ---------------------------------------------------------------------------
# multimodal_phash_dedup_apply — pairs → components → keep/drop decisions
# ---------------------------------------------------------------------------

_PH_APPLY_SQL = f"""
    WITH RECURSIVE {_PH_CTES},
    fpairs AS (
      SELECT doc_a, doc_b FROM pairs WHERE hamming <= {_PH_MAXH}
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM fpairs
      UNION ALL
      SELECT doc_b, doc_a FROM fpairs
    ),
    walk(doc, node) AS (
      SELECT src, src FROM (SELECT DISTINCT src FROM edges)
      UNION
      SELECT w.doc, e.dst FROM walk w JOIN edges e ON w.node = e.src
    ),
    membership AS (
      SELECT doc AS doc_id, MIN(node) AS cluster_id
      FROM walk GROUP BY doc
    ),
    pop AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items FROM u)
    SELECT pop.n_items,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM fpairs) AS n_pairs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM membership)
             AS n_in_clusters,
           (SELECT CAST(COUNT(DISTINCT cluster_id) AS BIGINT)
            FROM membership) AS n_clusters,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM membership
            WHERE doc_id <> cluster_id) AS n_dropped,
           pop.n_items
             - (SELECT COUNT(*) FROM membership
                WHERE doc_id <> cluster_id) AS n_kept,
           (SELECT CAST(COALESCE(SUM(doc_id), 0) AS BIGINT)
            FROM membership WHERE doc_id <> cluster_id)
             AS dropped_checksum
    FROM pop
"""


@query("multimodal_phash_dedup_apply", oracle=_PH_APPLY_SQL)
def multimodal_phash_dedup_apply(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The multimodal dedup loop CLOSED: perceptual-hash near-dup
    pairs ([[multimodal_phash_near_dup]]) → transitive closure →
    min-id canonical keep/drop decisions with a dropped-id checksum
    — pairs alone cannot be applied (A~B, B~C chains need
    components), so this is the operator a pipeline actually
    executes to shrink an image corpus. Composes two existing
    machineries verbatim: the banded hamming candidate graph and
    [[dedup_cluster]]'s now-shared [[min_label_components]] loop —
    the text-dedup and image-dedup paths run the SAME closure code.

    Exactness: the pair set is the graded phash key's own; the
    closure oracle is the same WITH RECURSIVE walk as
    [[dedup_cluster]]'s; every report column is an exact integer
    (the dropped-id checksum pins WHICH payloads were dropped, not
    just how many).

    Plan: the phash stages unchanged — including the r16 band-width
    auto-resolution ([[resolve_phash_bands]] on the same item count
    this report already takes, so the apply key inherits the pair
    key's sf1 saturation fix) — then the min-label loop runs on the
    PAIR population only (nodes = ids appearing in some pair —
    cluster state is near-dup-population-sized, never
    corpus-sized), one report row at the end."""
    bits = phash64(_ph_population(spark, sf_dir)).localCheckpoint(
        eager=False
    )
    n_items = bits.count()
    pairs = phash_near_dup_pairs(
        bits, bands=resolve_phash_bands(n_items), maxh=_PH_MAXH
    ).select("doc_a", "doc_b")
    pairs = pairs.localCheckpoint(eager=False)
    from .dedup import min_label_components

    memb = min_label_components(pairs).localCheckpoint(eager=False)
    n_pairs = pairs.count()
    rep = memb.agg(
        F.count("*").cast("bigint").alias("n_in_clusters"),
        F.countDistinct("cluster_id").cast("bigint").alias(
            "n_clusters"
        ),
        # coalesce: SUM over an empty membership frame is NULL while
        # the oracle's COUNT(*) is 0 — an empty pair set must report
        # n_dropped = 0 / n_kept = n_items, not NULLs (r16
        # self-review, confirmed live)
        F.coalesce(
            F.sum(
                F.when(F.col("doc_id") != F.col("cluster_id"), 1)
                .otherwise(0)
            ),
            F.lit(0),
        ).cast("bigint").alias("n_dropped"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("doc_id") != F.col("cluster_id"),
                    F.col("doc_id"),
                ).otherwise(0)
            ),
            F.lit(0),
        ).cast("bigint").alias("dropped_checksum"),
    )
    return rep.select(
        F.lit(n_items).cast("bigint").alias("n_items"),
        F.lit(n_pairs).cast("bigint").alias("n_pairs"),
        "n_in_clusters",
        "n_clusters",
        "n_dropped",
        (F.lit(n_items) - F.col("n_dropped"))
        .cast("bigint")
        .alias("n_kept"),
        "dropped_checksum",
    )
