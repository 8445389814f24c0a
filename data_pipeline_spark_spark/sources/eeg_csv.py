"""EEG session-CSV → partitioned-parquet ingest, Spark-first.

Re-expresses the reference's ETL app (reference
spark-apps/sparkle-v9.py:77-141, with the metadata handling of
sparkle-v5.py:49-102) with its four bugs fixed (SURVEY.md §4):

1. append-only-new: the reference re-read the whole curated store,
   union'd the new batch and APPENDED — duplicating everything on
   every run (sparkle-v9.py:128-138). We append only the new batch
   and make re-runs no-ops via a processed-file ledger.
2. unionByName everywhere (the reference's positional union at
   sparkle-v9.py:130 breaks on column reorder).
3. real patient metadata (v5 semantics, sparkle-v5.py:65-102) with
   the v9 performance approach (schema from header probe, no
   inference — sparkle-v9.py:92-102; inference was "REALLY slow",
   sparkle-v7.py:14).
4. the 8 metadata/header rows are skipped on the full read (v9 left
   them in as null-ish rows, sparkle-v9.py:105).

Pipeline per file:
    probe (≤8 rows, driver-side)  → metadata dict + header
    schema build (all-double, v9) → full schema-explicit CSV scan
    prelude skip                  → ×1e5 timestamp decode
    Year/Month/Day derivation     → partitioned append write
    ledger update + schema-registry JSON export

Scale: the per-file probe reads 8 rows; the full scan is a single
schema-explicit distributed CSV read; the write is shuffle-free
(partitionBy fan-out at the task level). Many files ingest in one
run; each file's scan parallelizes across its blocks.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schema_rules import fold_supercategories

PRELUDE_ROWS = 8  # 6 metadata rows + supercategory row + header row
META_KEYS = (
    "File",
    "PatientName",
    "PatientID",
    "PatientBirthDate",
    "TestDate",
    "TestTime",
)


@dataclass
class SessionHeader:
    metadata: dict[str, str]
    columns: list[str]
    supercategories: dict[str, list[str]]


# ---------------------------------------------------------------------------
# probe (driver-side, ≤8 rows — reference sparkle-v9.py:92-93 pattern)
# ---------------------------------------------------------------------------


def probe_header(spark: SparkSession, path: str) -> SessionHeader:
    """Read the 8-row prelude of one session file: key/value metadata
    (rows 1-6), super-category row (7), header row (8) — reference
    sparkle-v5.py:49-68 / sparkle-v9.py:92-93.

    Local files take a plain ``open()`` fast path: the prelude is 8
    short lines, and launching a Spark job per probe turns a staging
    dir of N files into N scheduler round-trips (~50-100 ms each —
    the streaming path probes EVERY staged file each trigger, r8
    review). Non-local URIs (s3://, hdfs://) keep the bounded
    spark.read.text probe."""
    if os.path.exists(path):
        lines = []
        with open(path, "r", encoding="utf-8") as fh:
            for _ in range(PRELUDE_ROWS):
                line = fh.readline()
                if not line:  # EOF — same short-file shape as limit()
                    break
                lines.append(line.rstrip("\n"))
    else:
        raw = (
            spark.read.schema("value string")
            .option("lineSep", "\n")
            .text(path)
            .limit(PRELUDE_ROWS)
            .collect()
        )
        # universal-newlines parity with the local open() branch: a
        # CRLF file read with lineSep='\n' leaves a trailing \r on
        # every line, which would smuggle a \r-suffixed last header
        # column into the curated store (r16 self-review)
        lines = [r.value.rstrip("\r") for r in raw]
    meta: dict[str, str] = {}
    for line in lines[:6]:
        key, _, value = line.partition(",")
        if key in META_KEYS:
            meta[key] = value.strip()
    supercat_row = lines[6].split(",") if len(lines) > 6 else []
    header_row = lines[7].split(",") if len(lines) > 7 else []
    return SessionHeader(
        metadata=meta,
        columns=header_row,
        supercategories=fold_supercategories(supercat_row, header_row),
    )


def build_schema(columns: list[str]) -> T.StructType:
    """All-double schema from the header names (the v9 approach,
    reference sparkle-v9.py:100-102): signal files are numeric; typed
    metadata enters as literal columns, not by casting the scan."""
    return T.StructType([T.StructField(c, T.DoubleType(), True) for c in columns])


# ---------------------------------------------------------------------------
# per-file curated read
# ---------------------------------------------------------------------------


def decode_clock(col):
    """×1e5 ClockDateTime decode (reference sparkle-v9.py:114-118),
    with reference bug #5 fixed: the raw value is unix_seconds/1e5
    (random_generator.py:48), and (s/1e5)*1e5 can land up to ~2.4e-7
    BELOW the integer (double ulp at 1e9 magnitude). The reference's
    plain double→timestamp cast truncates, decoding ~1 in 500
    timestamps one second early (found by hypothesis,
    tests/test_properties.py::test_ts_codec_roundtrip). The encoding
    is integer-second resolution by construction (1 Hz), so
    round-to-nearest-second is the faithful inverse."""
    import pyspark.sql.functions as F

    return F.timestamp_seconds(F.round(col * F.lit(1e5), 0).cast("long"))


def _parse_ref_date(value: str | None):
    """Reference dates are 'Y/M/D' strings; curated type is date.
    try_to_date, not to_date: Spark 4 defaults to ANSI mode, where
    to_date RAISES on malformed input — one 'PatientBirthDate,unknown'
    row would abort the whole ingest run instead of landing as the
    null the curated schema already allows."""
    if not value:
        return F.lit(None).cast("date")
    return F.try_to_date(F.lit(value), "y/M/d")


def read_session(spark: SparkSession, path: str, header: SessionHeader | None = None) -> DataFrame:
    """One session file → curated DataFrame (raw signals + typed
    patient metadata + decoded Timestamp + Year/Month/Day)."""
    if header is None:
        header = probe_header(spark, path)
    schema = build_schema(header.columns)
    df = spark.read.schema(schema).option("header", "false").csv(path)
    # Prelude skip: the 8 prelude rows parse as all-null ClockDateTime
    # under the double schema (string keys don't cast); data rows always
    # carry a ClockDateTime. Declarative, distributed, no zipWithIndex.
    df = df.filter(F.col("ClockDateTime").isNotNull())

    meta = header.metadata
    df = (
        df.withColumn("PatientName", F.lit(meta.get("PatientName", "")).cast("string"))
        .withColumn("PatientID", F.lit(meta.get("PatientID", "")).cast("string"))
        .withColumn("PatientBirthDate", _parse_ref_date(meta.get("PatientBirthDate")))
        .withColumn("TestDate", _parse_ref_date(meta.get("TestDate")))
        .withColumn("TestTime", F.lit(meta.get("TestTime", "")).cast("string"))
    )
    # The load-bearing ×1e5 decode (see decode_clock for the
    # truncation bug this avoids).
    df = df.withColumn("Timestamp", decode_clock(F.col("ClockDateTime")))
    return (
        df.withColumn("Year", F.year("Timestamp"))
        .withColumn("Month", F.month("Timestamp"))
        .withColumn("Day", F.dayofmonth("Timestamp"))
    )


# ---------------------------------------------------------------------------
# batch ingest with ledger idempotency
# ---------------------------------------------------------------------------


def _ledger_path(output_dir: str) -> str:
    return os.path.join(output_dir, "_ingest_ledger.json")


def _read_ledger(output_dir: str) -> set[str]:
    try:
        with open(_ledger_path(output_dir)) as f:
            return set(json.load(f))
    except (FileNotFoundError, json.JSONDecodeError):
        return set()


def _write_ledger(output_dir: str, processed: set[str]) -> None:
    """Atomic replace: writing in place with mode 'w' truncates
    first, so a crash mid-dump would leave an empty/partial JSON that
    _read_ledger treats as 'nothing processed' — the next run would
    re-append EVERY file, not just the one in flight (r8 review).
    Temp-file + os.replace keeps the crash window at the documented
    single in-flight file."""
    os.makedirs(output_dir, exist_ok=True)
    target = _ledger_path(output_dir)
    tmp = target + ".tmp"
    with open(tmp, "w") as f:
        json.dump(sorted(processed), f, indent=1)
    os.replace(tmp, target)


def export_schema_registry(df: DataFrame, output_dir: str, run_id: str | None = None) -> str:
    """Serialize the curated schema as [{Name, Type}] JSON beside the
    table (reference write_schema_to_s3, sparkle-v9.py:31-61) — the
    registry the catalog layer reads instead of re-crawling."""
    run_id = run_id or time.strftime("%Y%m%d-%H%M%S")
    reg_dir = os.path.join(output_dir, "_schema_registry")
    os.makedirs(reg_dir, exist_ok=True)
    out = os.path.join(reg_dir, f"schema-{run_id}.json")
    payload = [
        {"Name": f.name, "Type": f.dataType.simpleString()} for f in df.schema.fields
    ]
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    return out


def list_input_files(input_dir: str) -> list[str]:
    return sorted(
        os.path.join(input_dir, f)
        for f in os.listdir(input_dir)
        if f.endswith(".csv")
    )


def ingest(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    run_id: str | None = None,
) -> int:
    """Ingest every unprocessed CSV in input_dir into the curated
    partitioned-parquet store. Returns the number of files ingested.

    Idempotent: a processed-file ledger replaces the reference's
    .OK-sentinel + move-to-processed choreography
    (lambda-initiator-v2.py:27-69, sparkle-v9.py:19-29); re-running
    over the same staging dir is a no-op (empty-input guard — the v5
    fix, reference sparkle-v5.py:43-46).

    Crash-safety contract: each file is appended and THEN ledgered,
    one file at a time, bounding the damage to the single in-flight
    file. A crash mid-write is clean (job-uncommitted output lives
    only in ignored _temporary paths), but a crash in the window
    AFTER the append job commits and BEFORE the ledger write lands
    leaves that one file's rows committed, and the re-run appends
    them again — at-least-once, one-file duplicate window, by design.
    Strict exactly-once across arbitrary crash points goes through the
    streaming checkpoint path (streaming/ingest.py), where the
    checkpoint commits file progress transactionally."""
    files = list_input_files(input_dir)
    processed = _read_ledger(output_dir)
    todo = [f for f in files if os.path.basename(f) not in processed]
    if not todo:
        return 0

    data_dir = os.path.join(output_dir, "data")
    schema_df: DataFrame | None = None
    done: list[str] = []
    for path in todo:
        df = read_session(spark, path)
        df.write.partitionBy("Year", "Month", "Day").mode("append").parquet(data_dir)
        processed.add(os.path.basename(path))
        _write_ledger(output_dir, processed)
        done.append(os.path.basename(path))
        empty = df.limit(0)
        schema_df = (
            empty
            if schema_df is None
            else schema_df.unionByName(empty, allowMissingColumns=True)
        )
    export_schema_registry(schema_df, output_dir, run_id=run_id)
    append_ingest_log(output_dir, run_id or "batch", done)
    return len(todo)


def append_ingest_log(output_dir: str, run_id: str, files: list[str]) -> str:
    """Append one line per ingested file to the run log (reference
    lambda-initiator-v2.py:47-65 logged filenames + timestamp to a
    CSV log on every trigger)."""
    # NOT underscore-prefixed: Hadoop's hidden-file filter silently
    # excludes _*/.* paths from reads, and the log must be scannable.
    log_path = os.path.join(output_dir, "ingest-log.csv")
    stamp = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open(log_path, "a") as f:
        for name in files:
            f.write(f"{stamp},{run_id},{name}\n")
    return log_path


def register_curated(spark: SparkSession, output_dir: str, view: str = "eeg") -> DataFrame:
    """Catalog sync: expose the curated store to SQL (replaces the
    reference's Glue crawler step, emr-no-vpc.py:159-169)."""
    df = spark.read.parquet(os.path.join(output_dir, "data"))
    df.createOrReplaceTempView(view)
    return df


# ---------------------------------------------------------------------------
# wide → tidy (the 100 TB query layout, SURVEY.md §7 step 5)
# ---------------------------------------------------------------------------


def melt_signals(df: DataFrame, signal_cols: list[str]) -> DataFrame:
    """Unpivot the wide signal columns into
    (Timestamp, PatientID, channel, value) long format.

    6k-wide rows defeat whole-stage codegen
    (spark.sql.codegen.maxFields default 100); the long format keeps
    every downstream plan narrow, at the cost of ×n_channels rows —
    which parquet run-length + dictionary encoding absorbs. Uses the
    built-in unpivot (ids stay typed; no stack() string-building)."""
    return df.unpivot(
        ids=["Timestamp", "PatientID"],
        values=signal_cols,
        variableColumnName="channel",
        valueColumnName="value",
    )
