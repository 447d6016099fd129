"""Schema-enforced readers/sinks with retry & fallback policy.

Parity targets (SURVEY.md §2.1):
- S1/S3 ``fetchCDCMerchants`` / ``HalalService.initialize``: JSON
  sources with 3 retries, exponential 2/4/8 s backoff, hard timeout,
  degrading to an EMPTY table rather than failing the pipeline
  (reference: src/data/merchants.ts:41-85,
  src/services/halalService.ts:17-71).
- S2 ``fetchWithProxy``: ordered fallback routes, empty-result
  sentinel after the last one (src/utils/proxyUtils.ts:3-76).
- S7/S8 CSV sink/source with quote-escaping (``""``) and header row
  (src/services/dataManager.ts:190-240,279-300).
- S9 JSON sink (dataManager.ts:303-305).
- S10 backup-source fallback with field remap LAT→latitude
  (src/App.tsx:34-71,127-132).

Design: the engine never does per-row I/O — a "source" is a function
that produces a DataFrame (file scan, pre-landed API snapshot, ...);
the policy wrappers here add the reference's resilience semantics
around whole-DataFrame acquisition. All reads take an explicit
StructType (schema-on-read is banned at the boundary, SURVEY.md §1.3).
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_json_source(
    spark: SparkSession,
    path: str,
    schema: StructType,
    multiline: bool = False,
    corrupt_col: str | None = None,
) -> DataFrame:
    """JSON source with enforced schema (gzip transparent via codec —
    the reference's gzip endpoint handling, merchants.ts:47-58, is a
    format concern Spark's reader owns).

    ``corrupt_col``: when set, malformed records land as a row with
    every schema field NULL and the raw line captured in this column
    (PERMISSIVE + columnNameOfCorruptRecord) — the quarantine pattern:
    at 100 TB one bad upstream line must neither kill the job
    (FAILFAST) nor vanish silently (plain permissive). Filter
    ``corrupt_col IS NOT NULL`` into a quarantine sink, the rest is
    the clean feed. The reference's analogue is its warn-and-continue
    on malformed API rows (externalData.ts:534-537)."""
    read_schema = schema
    if corrupt_col is not None:
        from pyspark.sql.types import StringType, StructField

        read_schema = StructType(
            list(schema.fields) + [StructField(corrupt_col, StringType())]
        )
    r = spark.read.schema(read_schema).option(
        "multiLine", "true" if multiline else "false"
    )
    if corrupt_col is not None:
        r = r.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_col
        )
    return r.json(path)


def read_csv_source(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    multiline: bool = True,
) -> DataFrame:
    """CSV source, header row, RFC-quoted fields — replaces the
    reference's hand-rolled quoted-field state machine
    (dataManager.ts:203-240) with the native reader.

    ``multiline=True`` parses quoted embedded newlines (the sink emits
    them, dataManager.ts:291 quoting rules) at the cost of making each
    file non-splittable. At 100 TB scale, land CSV WITHOUT embedded
    newlines (or convert to parquet at the bronze boundary) and pass
    ``multiline=False`` so the scan parallelizes per-block."""
    return (
        spark.read.schema(schema)
        .option("header", "true" if header else "false")
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", "true" if multiline else "false")
        .csv(path)
    )


def write_csv_sink(df: DataFrame, path: str, header: bool = True) -> None:
    """CSV sink with ``""`` quote-escaping for fields containing
    quotes/commas/newlines (dataManager.ts:279-300 semantics)."""
    (
        df.write.mode("overwrite")
        .option("header", "true" if header else "false")
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )


def write_json_sink(df: DataFrame, path: str) -> None:
    """JSON-lines sink (dataManager.ts:303-305; pretty-printing is a
    display concern, not a storage one)."""
    df.write.mode("overwrite").json(path)


def read_columnar_source(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
) -> DataFrame:
    """Columnar source (parquet or ORC) with enforced schema — the
    bronze/silver interchange formats. Both carry column statistics
    and support predicate pushdown + column pruning at the scan, so a
    filtered 2-column projection over a 16-column table reads only
    those columns' pages/stripes (asserted in tests). Schema-on-read
    stays banned at the boundary (SURVEY.md §1.3): the declared schema
    is enforced, not inferred."""
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported columnar format {fmt!r}")
    return spark.read.schema(schema).format(fmt).load(path)


def write_columnar_sink(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> None:
    """Columnar sink (parquet or ORC). ``partition_by`` writes
    hive-style directory partitions — the 100 TB layout lever that
    turns partition-key predicates into directory pruning (zero I/O
    for excluded partitions) instead of row-level filtering."""
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported columnar format {fmt!r}")
    w = df.write.mode("overwrite").format(fmt)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if compression:
        w = w.option("compression", compression)
    w.save(path)


def read_text_corpus(
    spark: SparkSession,
    path: str,
    glob: str = "*.txt",
    whole_files: bool = True,
) -> DataFrame:
    """Raw-text corpus source → the engine's ``documents`` shape
    (doc_id, text, lang, source, n_chars), so every dedup / quality /
    token query runs unchanged on ingested files.

    ``whole_files=True`` (default): one document per file; ``doc_id``
    is the xxhash64 of the file path (stable across reruns and
    re-partitioning — the property the deterministic split/sample
    queries require of keys). ``False``: one document per line;
    ``doc_id`` hashes (path, line text), so byte-identical repeated
    lines within one file share an id — by construction they are
    exact duplicates, which the exact-dedup tier collapses anyway.

    ``source`` is the file's parent directory name (the crawl-shard /
    domain-bucket convention); ``lang`` is the engine's own n-gram
    marker heuristic (functions/text.py:111). Scale shape: a pure
    file-scan projection — text never touches the driver, lang-id and
    lengths are codegen expressions, and file listing is Spark's
    distributed InMemoryFileIndex, not an os.walk."""
    from cdc_makanmana_spark.functions.text import language_id

    raw = (
        spark.read.option("pathGlobFilter", glob)
        .option("wholetext", "true" if whole_files else "false")
        .text(path)
        .select(F.col("value").alias("text"), F.col("_metadata.file_path").alias("__fp"))
    )
    doc_key = (
        F.col("__fp") if whole_files else F.concat_ws("\x00", "__fp", "text")
    )
    return raw.select(
        F.xxhash64(doc_key).alias("doc_id"),
        "text",
        language_id("text").alias("lang"),
        F.element_at(F.split("__fp", "/"), -2).alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )


def with_retries(
    acquire: Callable[[], DataFrame],
    empty_schema: StructType,
    spark: SparkSession,
    retries: int = 3,
    backoff_s: tuple[float, ...] = (2.0, 4.0, 8.0),
    on_attempt: Callable[[int, Exception], None] | None = None,
) -> DataFrame:
    """Retry policy around whole-table acquisition: ``retries``
    attempts with exponential backoff, then degrade to an EMPTY
    DataFrame with the declared schema (halalService.ts:17-71: the app
    keeps serving with halal data absent; proxyUtils.ts:63-75: empty
    sentinel). Failures never propagate — per-source error isolation
    is the contract (externalData.ts:534-537)."""
    for attempt in range(retries):
        try:
            return acquire()
        except Exception as e:  # noqa: BLE001 — degradation is the spec
            if on_attempt:
                on_attempt(attempt, e)
            if attempt < retries - 1:
                time.sleep(backoff_s[min(attempt, len(backoff_s) - 1)])
    return spark.createDataFrame([], empty_schema)


def load_with_fallback(
    primary: Callable[[], DataFrame],
    backup: Callable[[], DataFrame],
    remap: dict[str, str] | None = None,
    defaults: dict[str, object] | None = None,
) -> DataFrame:
    """Source preference chain (S10): primary source, else backup with
    field remap (``{"LAT": "latitude"}``) and literal defaults for
    columns the backup lacks (App.tsx:47-53,127-132). "Failed" means
    raised OR produced zero rows — the reference treats an empty API
    response as a miss (App.tsx:108-125)."""
    try:
        df = primary()
        if not df.isEmpty():
            return df
    except Exception:  # noqa: BLE001 — fallback is the spec
        pass
    df = backup()
    for old, new in (remap or {}).items():
        df = df.withColumnRenamed(old, new)
    for col, val in (defaults or {}).items():
        if col in df.columns:
            df = df.withColumn(col, F.coalesce(F.col(col), F.lit(val)))
        else:
            df = df.withColumn(col, F.lit(val))
    return df
