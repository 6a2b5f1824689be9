"""Sources: parquet/CSV scans, literal frames, empty frames.

Covers the reference's source surface (SURVEY §2.1):
- CSV scan with inferred schema  (reference etl.py:54-56)  -> `read_csv`
  with an *explicit* schema preferred; inference is opt-in because it costs
  an extra full pass over the data and produces run-dependent types.
- CSV scan string-typed          (reference etl.py:122-124) -> `read_csv`
  with header only.
- Glob/pattern scan              (reference etl.py:53-54)   -> native glob in
  the path; one scan instead of a Python per-month loop, so Catalyst sees a
  single plan and can prune partitions.
- Literal in-memory source       (reference etl.py:42,164)  -> `literal_frame`.
- Empty-frame source             (reference etl.py:108-109 used an empty RDD;
  idiomatic Spark is `createDataFrame([], schema)`)         -> `empty_frame`.

At 100 TB the only interesting source is columnar parquet: explicit schemas
(schema-on-read, no inference pass), predicate pushdown and column pruning
reach the scan, and file listing parallelizes on the driver.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: Canonical table names of the driver corpus (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """Parquet scan. Schema-on-read by default; pass `schema` to assert a
    contract (mismatches fail at analysis, not mid-job)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_parquet_evolved(spark: SparkSession, *paths: str) -> DataFrame:
    """Schema-evolution read over parquet written at different pipeline
    versions: `mergeSchema` unions the footer schemas (new columns null-
    filled in old files) instead of trusting one random file's footer —
    the lake norm when a column was added mid-history. Type CONFLICTS
    (same name, different type) still fail at analysis, which is the
    behavior you want; widen explicitly before writing. mergeSchema
    costs a footer read per file at planning — fine nightly, so prefer
    pinning an explicit contract schema on hot paths."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """ORC scan — same contract as `read_parquet` (schema-on-read unless
    a contract schema is pinned). ORC carries the same columnar
    pushdown/pruning machinery in Spark (PushedFilters + ReadSchema in
    the scan node, tested), so warehouse migrations from Hive/ORC lakes
    keep their scan characteristics."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    capture_corrupt: bool = False,
) -> DataFrame:
    """JSON-lines scan — the interchange format most raw text corpora
    arrive in. ALWAYS pass `schema` at scale: inference runs a full extra
    pass over the data before the real read. `capture_corrupt=True` adds
    a `_corrupt_record` column and keeps malformed lines (PERMISSIVE)
    for a quarantine split instead of failing the job mid-scan; like
    read_csv it REQUIRES an explicit schema then — relying on inference
    to surface _corrupt_record costs a full extra pass at scale and made
    the two readers' contracts inconsistent."""
    if capture_corrupt and schema is None:
        raise ValueError("capture_corrupt=True requires an explicit schema")
    reader = spark.read
    if schema is not None:
        if capture_corrupt:
            if isinstance(schema, str):
                schema = T.StructType.fromDDL(schema)
            schema = schema.add("_corrupt_record", T.StringType())
        reader = reader.schema(schema)
    if capture_corrupt:
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", "_corrupt_record"
        )
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    infer: bool = False,
    sep: str = ",",
    timestamp_format: str | None = None,
    capture_corrupt: bool = False,
) -> DataFrame:
    """CSV scan. Explicit schema >> inference (inference = extra full pass,
    reference etl.py:56 did this per month).

    `capture_corrupt=True` (requires a schema) parses in PERMISSIVE mode
    and lands unparseable lines in a `_corrupt_record` column instead of
    nulling them silently or failing the job — at 100 TB some malformed
    rows are a certainty, and quarantining beats either extreme."""
    reader = spark.read.option("header", str(header).lower()).option("sep", sep)
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    if capture_corrupt:
        if schema is None:
            raise ValueError("capture_corrupt requires an explicit schema")
        schema = T.StructType(
            list(schema.fields) + [T.StructField("_corrupt_record", T.StringType(), True)]
        )
        reader = (
            reader.option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
        )
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Partition a capture_corrupt read into (clean, quarantined).

    Spark disallows plans that read only `_corrupt_record` from a raw
    CSV scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN — column pruning can reduce
    e.g. a post-filter count() to exactly that), so the parsed frame is
    cached first, per the documented workaround. The cache holds one
    parsed copy of the input for the duration of the quarantine flow."""
    from pyspark.sql import functions as F

    df = df.cache()
    corrupt = F.col("_corrupt_record").isNotNull()
    return df.filter(~corrupt).drop("_corrupt_record"), df.filter(corrupt)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-corpus table: `{sf_dir}/{name}.parquet`.

    `events.ts` is stored as parquet TIMESTAMP(NANOS). Spark ≥4.1 reads it
    natively as TIMESTAMP_NTZ (µs truncation, same floor DuckDB applies);
    older Sparks reject it ([PARQUET_TYPE_ILLEGAL]) unless the
    `nanosAsLong` legacy conf is on, in which case ts arrives as a raw ns
    long. `_load_events` handles both, normalizing to a UTC TIMESTAMP so
    downstream date-part/window semantics are version-independent."""
    # Date-part semantics (hour/day/dow) must not depend on whatever zone
    # the *caller's* session was built with — pin UTC (runtime-settable).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Older Sparks need the legacy conf to read TIMESTAMP(NANOS) at all
    # (as a raw ns long); Spark ≥4.1 ignores/removes it and reads NTZ
    # natively. Set it when settable, then branch on the dtype we got.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # ns since epoch → floor to µs (matches DuckDB's ns→µs cast).
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Native NTZ read: wall-clock equals the UTC instant (corpus is UTC);
    # cast under the pinned-UTC session for dtype parity with the old path.
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def load_tables(spark: SparkSession, sf_dir: str, names: Iterable[str] | None = None) -> dict[str, DataFrame]:
    """Load several corpus tables as a dict keyed by table name."""
    return {n: load_table(spark, sf_dir, n) for n in (names or TESTDATA_TABLES)}


def literal_frame(spark: SparkSession, rows: Sequence, schema: T.StructType) -> DataFrame:
    """In-memory literal table (reference etl.py:42,164: station schema,
    weather-type lookup). Small static dims — always broadcast-joinable."""
    return spark.createDataFrame(list(rows), schema)


def empty_frame(spark: SparkSession, schema: T.StructType) -> DataFrame:
    """Empty typed frame as a union seed (reference etl.py:108-109 built this
    from an empty RDD; this is the DataFrame-native form)."""
    return spark.createDataFrame([], schema)


def read_text(
    spark: SparkSession,
    path: str,
    whole_file: bool = False,
    line_sep: str | None = None,
) -> DataFrame:
    """Raw text scan — one row per line (`value` string), or one row per
    FILE with `wholetext` (the shape a document-per-file corpus lands
    in before tokenization). `line_sep` overrides the newline delimiter
    for corpora using e.g. NUL- or record-separator framing. Splittable
    per-line at scale (files split on block boundaries); wholetext is
    NOT splittable — one task per file, so shard large corpora into
    many files before reading whole.

    GOTCHA (PySpark 4, tested): the options MUST ride the `.text()`
    keywords — `DataFrameReader.text()` re-applies its own keyword
    defaults last, so a prior `.option("wholetext", "true")` is
    silently overridden back to False."""
    return spark.read.text(path, wholetext=whole_file, lineSep=line_sep)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """Opaque-binary ingest via Spark's built-in `binaryFile` source —
    the entry point of the multimodal column pipeline
    (functions/multimodal.py): each matched file becomes one row
    (path, modificationTime, length, content binary). `glob` filters by
    pathGlobFilter (e.g. "*.png") at LISTING time — non-matching files
    are never opened. Files load whole into `content`: bound per-file
    size (spark.sql.sources.binaryFile.maxLength caps at ~2 GB) and
    rely on many-files parallelism, not intra-file splits. Use
    modificationTime-insensitive projections in deterministic
    pipelines."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
