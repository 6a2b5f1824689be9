"""Manifest-based snapshot versioning — Iceberg-lite time travel.

The reference's warehouse story is load-then-serve (stage_redshift.py's
COPY + post-load checks); production tables additionally need "read the
table AS OF snapshot N" for reproducible training runs and audits. This
module implements the minimal sound core of the Iceberg/Delta idea with
nothing but parquet + JSON sidecars:

- every snapshot is a MANIFEST: an explicit list of immutable data
  files. Readers never list directories — they read exactly the files
  the manifest names, so a reader of snapshot N is isolated from any
  concurrent writer appending snapshot N+1 (new files are invisible
  until the next manifest lands).
- appends REUSE the previous snapshot's files and add new ones: an
  append of D rows costs O(D) writes regardless of table size, and
  every historical snapshot stays readable forever (until expired).
- manifest files start with `_`, which Spark's parquet reader skips
  (the sidecar-marker rule, streaming/sketches.py `_last_batch_id`) —
  so the data directory stays directly scannable as "latest" too.

Scale: the manifest is O(files), not O(rows); reads are plain
`spark.read.parquet(*files)` so column pruning / predicate pushdown /
AQE all apply unchanged. File listing here uses the local filesystem
(the sandbox has no object store); on a real cluster the two
`os.listdir`/`os.path.exists` sites swap for the Hadoop FileSystem API
with the manifest write made atomic via rename — the read protocol is
unchanged.
"""

from __future__ import annotations

import json
import os
import shutil
import urllib.parse

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

#: directory-name prefix for partition MIRROR columns: write_snapshot
#: partitions on a `__pt_<col>` COPY of each partition column so the
#: original stays inside the data files (Spark's writer strips partition
#: columns from file content; manifest readers read explicit leaf files,
#: where Hive-style partition inference never runs — the mirror keeps
#: every snapshot readable as plain files under the recorded schema,
#: whatever spec wrote it)
_PT_PREFIX = "__pt_"


def _manifest_path(base_dir: str, version: int) -> str:
    return os.path.join(base_dir, f"_manifest_v{version}.json")


def _stat_value(v):
    """JSON-safe zone-map bound: numerics/bools verbatim, anything else
    (dates, timestamps, decimals) via str() — ISO text order = value
    order for the temporal types, so string comparison stays sound."""
    return v if v is None or isinstance(v, (int, float, bool)) else str(v)


def _lt(a, b):
    """Comparison that refuses cross-type guesses: None = unknown (the
    caller must treat it as 'cannot prune')."""
    try:
        return bool(a < b)
    except TypeError:
        return None


#: bloom-filter geometry: m bits / k hashes. ~4096 bits with 5 hashes
#: holds ~400 distinct values per file at ~2% FPR — 512 bytes of
#: manifest per (file, column), and a false positive only costs an
#: unnecessary file read, never correctness.
_BLOOM_BITS = 4096
_BLOOM_HASHES = 5


def _bloom_bit_py(value: str, seed: int, m: int = _BLOOM_BITS) -> int:
    """Bit position of `value` under hash family `seed` — the PYTHON
    side of the bloom contract. MUST stay bit-identical to
    _bloom_bit_col (pinned in tests/test_sinks.py): md5 of
    "<seed>:<value-as-string>", first 8 hex chars as an int, mod m.
    md5 (not Spark's xxhash64) because the prune side runs driver-only
    Python where Spark's hash is unavailable."""
    import hashlib

    return int(hashlib.md5(f"{seed}:{value}".encode()).hexdigest()[:8], 16) % m


def _bloom_bit_col(col, seed: int, m: int = _BLOOM_BITS) -> F.Column:
    """Spark twin of _bloom_bit_py (same md5-prefix family)."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), col.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % m).cast("int")


def _bloom_might_contain(bitmap_b64: str, value, m: int, k: int) -> bool:
    import base64

    bits = base64.b64decode(bitmap_b64)
    for seed in range(k):
        # _spark_str, not str(): the write side hashed the Spark string
        # cast ('true', not 'True') — a form mismatch here is a FALSE
        # NEGATIVE, the one bloom failure mode that loses rows
        b = _bloom_bit_py(_spark_str(value), seed, m)
        if not (bits[b // 8] >> (b % 8)) & 1:
            return False
    return True


def _leaf_files(d: str) -> list[str]:
    """All committed parquet leaves under `d`, recursively — partitioned
    writes nest files under __pt_<col>=<value>/ directories."""
    out = []
    for root, _dirs, fs in os.walk(d):
        out.extend(
            os.path.join(root, f)
            for f in fs
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
    return sorted(out)


def _pt_values(path: str, data_dir: str) -> dict[str, str]:
    """Partition values encoded in `path`'s directory segments (STRING
    form, Hive-escaped by Spark's writer — unescaped here)."""
    vals: dict[str, str] = {}
    rel = os.path.relpath(path, data_dir)
    for seg in rel.split(os.sep)[:-1]:
        if "=" in seg:
            k, v = seg.split("=", 1)
            if k.startswith(_PT_PREFIX):
                vals[k[len(_PT_PREFIX):]] = urllib.parse.unquote(v)
    return vals


def latest_version(base_dir: str) -> int:
    """Highest committed snapshot version, 0 if none."""
    base_dir = os.path.abspath(base_dir)
    if not os.path.isdir(base_dir):
        return 0
    vs = [
        int(f[len("_manifest_v"):-len(".json")])
        for f in os.listdir(base_dir)
        if f.startswith("_manifest_v") and f.endswith(".json")
    ]
    return max(vs, default=0)


def manifest_metadata(base_dir: str, version: int | None = None) -> dict:
    """The caller-supplied metadata dict committed with a snapshot
    ({} if none / no snapshots). Because metadata rides the manifest,
    it is ATOMIC with the commit — the property the streaming sink's
    replay guard depends on."""
    if version is None:
        version = latest_version(base_dir)
    mp = _manifest_path(base_dir, version)
    if version == 0 or not os.path.exists(mp):
        return {}
    with open(mp) as fh:
        return json.load(fh).get("metadata", {})


def last_metadata_value(base_dir: str, key: str, default=None):
    """The `key` metadata of the NEWEST manifest that carries it —
    scanning back past manifests committed without the key. The
    streaming sink's replay guard needs this, not `manifest_metadata`:
    an interleaved non-stream `write_snapshot` to the same base_dir
    (no batch_id metadata) would otherwise reset the guard to its
    default and let a replayed micro-batch double-append. Stream batch
    ids are monotone in commit order, so newest-carrying == max.

    Cost: O(1) manifest reads for stream-only tables (the newest
    manifest carries the key), but degrades toward O(history) small-file
    reads on a long-lived table with frequent non-stream interleaves and
    no keep_last retention — run `expire_snapshots` periodically on such
    tables, or accept the scan (manifests are tiny JSON)."""
    base_dir = os.path.abspath(base_dir)
    for v in range(latest_version(base_dir), 0, -1):
        mp = _manifest_path(base_dir, v)
        if not os.path.exists(mp):
            continue
        with open(mp) as fh:
            md = json.load(fh).get("metadata", {})
        if key in md:
            # an explicit null (rollback_to's "no batches seen as of the
            # target" marker) STOPS the scan-back — continuing past it
            # would resurrect a rolled-back value — and resolves to the
            # caller's default, same as a key never written.
            return md[key] if md[key] is not None else default
    return default


def write_snapshot(
    df: DataFrame,
    base_dir: str,
    mode: str = "append",
    metadata: dict | None = None,
    partition_by: list[str] | None = None,
    stats_for: list[str] | None = None,
    bloom_for: list[str] | None = None,
) -> int:
    """Commit `df` as a new snapshot and return its version.

    mode="append": the new manifest = previous manifest's files + the
    files just written (snapshot semantics of an INSERT INTO).
    mode="overwrite": the new manifest lists only the new files (a
    REPLACE TABLE) — previous snapshots remain readable because their
    files are never touched.

    `metadata` (JSON-serializable dict) is stored IN the manifest, so
    it commits atomically with the snapshot — e.g. the streaming
    sink's source batch id, read back via `manifest_metadata` to make
    replayed micro-batches idempotent.

    `partition_by` lays this COMMIT's files out partitioned by the named
    columns (mirror-column trick, see _PT_PREFIX) and records each
    file's partition values in the manifest, enabling manifest-level
    partition pruning in `read_snapshot(where=...)`. Partition-SPEC
    EVOLUTION is per-commit, the Iceberg rule: the spec applies to the
    files it wrote, never retroactively — a table can hold spec-v1
    (say, unpartitioned) files and spec-v2 (month-partitioned) files
    side by side; old files stay readable unchanged and pruning simply
    can't skip files whose spec lacks the pruned column (conservative
    inclusion). The manifest carries the full spec history
    (partition_specs + current_spec).

    `stats_for` records per-FILE min/max ZONE MAPS for the named
    columns in the manifest (one extra Spark job grouped by
    input_file_name over the just-written commit — O(new data), never
    the table). `read_snapshot(where_range=...)` then skips files whose
    [min, max] cannot intersect the predicate — the Iceberg
    column-stats / parquet row-group-stats idea lifted to the manifest,
    where it prunes before ANY footer is opened. Zone maps are only as
    selective as the layout: cluster first (repartitionByRange on the
    stat column) or the per-file ranges all overlap and nothing skips.
    Values are stored verbatim for numerics and as strings otherwise
    (dates/timestamps via str() — ISO order = value order).

    `bloom_for` records a per-file BLOOM FILTER for the named columns —
    the skipping member for EQUALITY predicates on high-cardinality
    UNCLUSTERED columns, where zone maps are inert (every file's
    [min, max] spans the domain). `read_snapshot(where={col: v})`
    consults it: a file whose bloom says "absent" is skipped (no false
    negatives — the Spark-side and Python-side hash families are the
    same md5-prefix construction, parity-pinned in tests; false
    positives just read a file the row filter then empties). Values
    hash by their Spark string cast — intended for integer/string key
    columns; float keys are discouraged (string-form mismatch risk).
    Cost: one O(commit) job per bloom column + ~512 manifest bytes per
    (file, column)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown snapshot mode: {mode!r}")
    partition_by = list(partition_by or [])
    stats_for = list(stats_for or [])
    bloom_for = list(bloom_for or [])
    missing = [c for c in partition_by if c not in df.columns]
    if missing:
        raise ValueError(f"partition_by columns not in dataframe: {missing}")
    missing = [c for c in bloom_for if c not in df.columns]
    if missing:
        raise ValueError(f"bloom_for columns not in dataframe: {missing}")
    missing = [c for c in stats_for if c not in df.columns]
    if missing:
        raise ValueError(f"stats_for columns not in dataframe: {missing}")
    # absolute from here on: manifests store these paths verbatim, and a
    # relative base_dir would make spark.read.parquet(*files) resolve
    # against Spark's default FS / working dir, which can differ from
    # the Python cwd that listed them
    base_dir = os.path.abspath(base_dir)
    prev = latest_version(base_dir)
    version = prev + 1
    data_dir = os.path.join(base_dir, f"v{version}")
    if os.path.isdir(data_dir):  # torn uncommitted write from a dead run
        shutil.rmtree(data_dir)
    if partition_by:
        writer = df
        for c in partition_by:
            writer = writer.withColumn(_PT_PREFIX + c, F.col(c).cast("string"))
        writer.write.mode("overwrite").partitionBy(
            *[_PT_PREFIX + c for c in partition_by]
        ).parquet(data_dir)
    else:
        df.write.mode("overwrite").parquet(data_dir)
    new_files = _leaf_files(data_dir)
    files = list(new_files)
    schema = df.schema
    # spec history: reuse the prior spec version when the column list
    # matches, else append a new spec (evolution)
    prev_manifest = None
    if prev > 0 and os.path.exists(_manifest_path(base_dir, prev)):
        with open(_manifest_path(base_dir, prev)) as fh:
            prev_manifest = json.load(fh)
    specs = list(prev_manifest.get("partition_specs", [])) if prev_manifest else []
    spec_id = next(
        (s["spec_id"] for s in specs if s["columns"] == partition_by), None
    )
    if spec_id is None:
        spec_id = len(specs) + 1
        specs.append({"spec_id": spec_id, "columns": partition_by})
    # zone maps: ONE job over the just-written commit, grouped by
    # physical file — O(new data), never the table; the collect is
    # O(files) driver state (bounded like every manifest operation)
    col_stats: dict[str, dict] = {}
    if stats_for and new_files:
        aggs = []
        for c in stats_for:
            aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
        rows = (
            df.sparkSession.read.parquet(data_dir)
            .groupBy(F.input_file_name().alias("__f"))
            .agg(*aggs)
            .collect()
        )
        for r in rows:
            # input_file_name returns a URI; normalize to the os path
            # _leaf_files produced
            p = os.path.abspath(
                urllib.parse.unquote(urllib.parse.urlparse(r["__f"]).path)
            )
            col_stats[p] = {
                c: [_stat_value(r[f"__mn_{c}"]), _stat_value(r[f"__mx_{c}"])]
                for c in stats_for
            }
    # bloom filters: one O(commit) job per column — explode the k bit
    # positions per row, distinct (file, bit), fold into a bitmap
    # driver-side. The distinct bounds the collect at m bits per file.
    col_blooms: dict[str, dict] = {}
    if bloom_for and new_files:
        import base64

        scan = df.sparkSession.read.parquet(data_dir)
        for c in bloom_for:
            rows = (
                scan.filter(F.col(c).isNotNull())
                .select(
                    F.input_file_name().alias("__f"),
                    F.explode(
                        F.array(*[
                            _bloom_bit_col(F.col(c), seed)
                            for seed in range(_BLOOM_HASHES)
                        ])
                    ).alias("__b"),
                )
                .distinct()
                .groupBy("__f")
                .agg(F.collect_set("__b").alias("__bits"))
                .collect()
            )
            for r in rows:
                p = os.path.abspath(
                    urllib.parse.unquote(urllib.parse.urlparse(r["__f"]).path)
                )
                bm = bytearray(_BLOOM_BITS // 8)
                for b in r["__bits"]:
                    bm[b // 8] |= 1 << (b % 8)
                col_blooms.setdefault(p, {})[c] = {
                    "m": _BLOOM_BITS,
                    "k": _BLOOM_HASHES,
                    "bits": base64.b64encode(bytes(bm)).decode(),
                }
    file_meta = {
        f: {
            "pt": _pt_values(f, data_dir),
            "spec_id": spec_id,
            **({"stats": col_stats[f]} if f in col_stats else {}),
            **({"bloom": col_blooms[f]} if f in col_blooms else {}),
        }
        for f in new_files
    }
    row_filters: list = []
    if mode == "append" and prev > 0:
        files = prev_manifest["files"] + files
        # prior files keep their own recorded partition values/spec;
        # legacy manifests without file_meta contribute nothing (their
        # files are then never prunable — conservative). Entries that
        # predate the field-id history are tagged with the schema that
        # was current when they were written (= the previous current —
        # sound because pre-history commits can only be add-only).
        _, prev_cur0 = _schemas_of(prev_manifest)
        carried = {
            f: {**meta, "sid": _file_sid(meta, prev_cur0)}
            for f, meta in prev_manifest.get("file_meta", {}).items()
        }
        file_meta = {**carried, **file_meta}
        # merge-on-read delete filters ride appends (their recorded file
        # lists never include this commit's new files, so appended rows
        # are not filtered); an overwrite rewrites content post-filter,
        # so filters reset — which is how compaction materializes them
        row_filters = list(prev_manifest.get("row_filters", []))
        # add-only schema evolution: the recorded schema is the previous
        # schema plus any NEW fields this append introduces — so an
        # append missing an old column keeps it readable (NULL for the
        # new files) and an append adding a column backfills NULLs for
        # the old files; a type change is refused like any table format
        prev_schema = StructType.fromJson(prev_manifest["schema"])
        merged = list(prev_schema.fields)
        by_name = {f.name: f for f in merged}
        for f in schema.fields:
            if f.name not in by_name:
                merged.append(f)
            elif by_name[f.name].dataType != f.dataType:
                raise ValueError(
                    f"append changes column '{f.name}' from "
                    f"{by_name[f.name].dataType} to {f.dataType} — "
                    "type evolution is not supported (add-only; use "
                    "alter_column_type for widenings)"
                )
        schema = StructType(merged)
    # field-id schema history (r15 evolution support): every name is
    # assigned an id ONCE and ids are never reused — matching by id is
    # what makes rename/widen/drop (rename_column/alter_column_type/
    # drop_column) metadata-only and resurrection-proof. A commit whose
    # fields match the previous current schema reuses its entry.
    if prev_manifest is not None:
        prev_schemas, prev_cur = _schemas_of(prev_manifest)
        prev_fields = _schema_fields(prev_schemas, prev_cur)
        by_fid = {f["name"]: f for f in prev_fields}
        next_id = max(f["id"] for s in prev_schemas for f in s["fields"]) + 1
        fields = []
        for f in schema.fields:
            p = by_fid.get(f.name)
            if p is not None:
                # append mode validated type equality above; overwrite
                # (REPLACE TABLE) keeps the id under the replaced type
                t = f.dataType.jsonValue() if mode == "overwrite" else p["type"]
                fields.append({"id": p["id"], "name": f.name, "type": t})
            else:
                fields.append(
                    {"id": next_id, "name": f.name, "type": f.dataType.jsonValue()}
                )
                next_id += 1
        schemas = list(prev_schemas)
        if fields == prev_fields:
            cur_sid = prev_cur
        else:
            cur_sid = max(s["schema_id"] for s in schemas) + 1
            schemas.append({"schema_id": cur_sid, "fields": fields})
    else:
        fields = [
            {"id": i + 1, "name": f.name, "type": f.dataType.jsonValue()}
            for i, f in enumerate(schema.fields)
        ]
        schemas = [{"schema_id": 1, "fields": fields}]
        cur_sid = 1
    for f in new_files:
        file_meta[f]["sid"] = cur_sid
    # last: the manifest IS the commit point — written to a temp name
    # and renamed, so a crash mid-write leaves no half-manifest that
    # latest_version() would count as committed (os.replace is atomic
    # on POSIX; v{version}/ stays an invisible orphan either way)
    mp = _manifest_path(base_dir, version)
    with open(mp + ".tmp", "w") as fh:
        json.dump(
            {
                "version": version,
                "files": files,
                "schema": schema.jsonValue(),
                "metadata": metadata or {},
                "partition_specs": specs,
                "current_spec": spec_id,
                "file_meta": file_meta,
                "row_filters": row_filters,
                "schemas": schemas,
                "current_schema": cur_sid,
            },
            fh,
        )
    os.replace(mp + ".tmp", mp)
    return version


def _spark_str(v) -> str:
    """`v` in the string form Spark's cast/partition-directory encoding
    produces — NOT Python str(): Spark renders booleans lowercase
    ('true'/'false' vs Python's 'True'). This is the form the bloom
    hash input (_bloom_bit_col casts to string), the __pt_ directory
    values, and the string-compare predicate fallback must all share —
    a mismatch turns manifest PRUNING into silent row loss for the DML
    paths (r14 review finding). Floats are deliberately NOT handled
    (Java Double.toString switches to scientific notation at 1e7,
    Python at 1e16 — no portable string form); float predicates get a
    native comparison branch and are excluded from string-form pruning
    instead."""
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _delete_pred(schema: StructType, where: dict | None,
                 where_range: dict | None) -> F.Column:
    """The conjunctive predicate (TRUE on matching rows) shared by
    delete/update copy-on-write rewrites, the merge-on-read read path,
    AND read_snapshot's row filters (one construction — the three
    sites diverging is exactly the bug class the r14 review caught).
    Equality terms compare natively when the python type matches the
    column type (parquet pushdown survives, and float equality avoids
    the unportable Java-vs-Python double string forms); the string-cast
    fallback uses the Spark string form (_spark_str). Range terms are
    plain bounds. DML callers must wrap the result in
    ~coalesce(pred, FALSE): SQL DELETE/UPDATE keeps NULL-predicate
    rows."""
    ftypes = {f.name: f.dataType.typeName() for f in schema.fields}
    for k in list(where or {}) + list(where_range or {}):
        if k not in ftypes:
            raise ValueError(f"predicate column {k!r} not in table schema")
    pred = F.lit(True)
    for k, v in (where or {}).items():
        if (isinstance(v, bool) and ftypes[k] == "boolean") or (
            isinstance(v, int)
            and not isinstance(v, bool)
            and ftypes[k] in ("byte", "short", "integer", "long")
        ) or (isinstance(v, str) and ftypes[k] == "string") or (
            isinstance(v, float) and ftypes[k] in ("double", "float")
        ):
            pred = pred & (F.col(k) == F.lit(v))
        else:
            pred = pred & (F.col(k).cast("string") == _spark_str(v))
    for k, bounds in (where_range or {}).items():
        lo, hi = bounds
        if lo is not None:
            pred = pred & (F.col(k) >= F.lit(lo))
        if hi is not None:
            pred = pred & (F.col(k) <= F.lit(hi))
    return pred


def _schemas_of(manifest: dict) -> tuple[list[dict], int]:
    """The manifest's field-id schema history as
    ([{"schema_id", "fields": [{"id", "name", "type"}]}], current_id) —
    synthesized positionally (ids 1..n, schema_id 1) for manifests
    written before r15's evolution support, so every reader/writer can
    assume ids exist. The synthesis is stable because a legacy
    manifest's column ORDER is fixed in its recorded schema."""
    if "schemas" in manifest:
        return manifest["schemas"], manifest["current_schema"]
    fields = [
        {"id": i + 1, "name": f["name"], "type": f["type"]}
        for i, f in enumerate(manifest["schema"]["fields"])
    ]
    return [{"schema_id": 1, "fields": fields}], 1


def _schema_fields(schemas: list[dict], sid: int) -> list[dict]:
    for s in schemas:
        if s["schema_id"] == sid:
            return s["fields"]
    raise ValueError(f"manifest references unknown schema_id {sid}")


def _fields_struct(fields: list[dict]) -> StructType:
    """Spark StructType for a field-id schema entry (all nullable — the
    table format's columns are nullable by construction: evolution
    backfills NULLs)."""
    return StructType.fromJson(
        {
            "type": "struct",
            "fields": [
                {
                    "name": f["name"],
                    "type": f["type"],
                    "nullable": True,
                    "metadata": {},
                }
                for f in fields
            ],
        }
    )


def _schema_keys(manifest: dict) -> dict:
    """The evolution keys a derived manifest (DML/rollback/MoR commit)
    must carry forward verbatim — empty for legacy manifests, which
    stay legacy until an evolution op or a new write_snapshot commit
    upgrades them."""
    if "schemas" not in manifest:
        return {}
    return {
        "schemas": manifest["schemas"],
        "current_schema": manifest["current_schema"],
    }


def _file_sid(meta_entry: dict | None, default_sid: int) -> int:
    if meta_entry is None:
        return default_sid
    return meta_entry.get("sid", default_sid)


def _written_name(
    schemas: list[dict], sid: int, current_fields: list[dict], col: str
) -> str | None:
    """The name column `col` (a CURRENT-schema name) had when a file
    tagged `sid` was written — None when that file's schema never had
    the field (added later / re-added after a drop: different id, so
    the file contributes NULLs and pruning may skip it for non-null
    predicates)."""
    fid = next((f["id"] for f in current_fields if f["name"] == col), None)
    if fid is None:
        return None
    return next(
        (f["name"] for f in _schema_fields(schemas, sid) if f["id"] == fid),
        None,
    )


def _map_to_fields(
    df: DataFrame, written: list[dict], current: list[dict]
) -> DataFrame:
    """Project a frame read under its WRITTEN schema onto the CURRENT
    schema by FIELD ID — the Iceberg name-mapping rule: renames follow
    the id (never the name, which is what makes rename safe instead of
    silently NULLing the column), widened types cast up, fields the
    written schema lacks backfill NULL, and dropped-then-re-added names
    do NOT resurrect old data (the re-add got a fresh id)."""
    by_id = {f["id"]: f for f in written}
    cols = []
    for f in current:
        w = by_id.get(f["id"])
        tgt = _fields_struct([f])[0].dataType
        if w is None:
            cols.append(F.lit(None).cast(tgt).alias(f["name"]))
        elif w["name"] == f["name"] and w["type"] == f["type"]:
            cols.append(F.col(f["name"]))
        else:
            cols.append(F.col(w["name"]).cast(tgt).alias(f["name"]))
    return df.select(*cols)


#: widenings the ALTER COLUMN TYPE path accepts — value-preserving
#: casts only (the Iceberg/parquet promotion lattice; float→double is
#: exact because every float IS a double)
_WIDENINGS = {
    ("byte", "short"), ("byte", "integer"), ("byte", "long"),
    ("short", "integer"), ("short", "long"),
    ("integer", "long"), ("integer", "double"),
    ("long", "double"),
    ("float", "double"),
}


def _filter_columns(manifest: dict) -> set[str]:
    """Column names referenced by LIVE merge-on-read row filters —
    evolution on these is refused (the recorded predicates replay by
    name at read time; compact first to materialize them)."""
    out: set[str] = set()
    for flt in manifest.get("row_filters", []):
        out |= set(flt.get("where", {}))
        out |= set(flt.get("where_range", {}))
    return out


def _validate_mor_values(where: dict | None, where_range: dict | None) -> None:
    """Merge-on-read predicates commit INTO the manifest and replay at
    read time — values must be JSON-native (shared by the MoR delete
    and MoR update paths)."""
    bad = [
        v
        for v in list((where or {}).values())
        + [b for bounds in (where_range or {}).values() for b in bounds]
        if v is not None and not isinstance(v, (int, float, str, bool))
    ]
    if bad:
        raise ValueError(
            "merge-on-read predicate values must be JSON-native "
            f"(int/float/str/bool), got {bad!r}"
        )


def _read_files(spark: SparkSession, manifest: dict, files: list[str]) -> DataFrame:
    """Read `files` under the manifest's recorded schema, applying any
    MERGE-ON-READ row filters (delete_where strategy="merge-on-read").

    Each filter records the file set it was committed against — the
    Iceberg sequence-number rule flattened to explicit lists: a filter
    applies only to files that existed at its commit, so rows appended
    AFTER a delete are never filtered by it. Files are grouped by the
    exact subset of filters that apply (≤ #filters + 1 groups, each one
    scan + NOT(pred) filters), then unioned — no input_file_name()
    string matching on the row path, and the per-group filters still
    push down. Tables with no filters take the single-scan fast path."""
    schema = StructType.fromJson(manifest["schema"])
    if not files:
        return spark.createDataFrame([], schema)
    filters = manifest.get("row_filters", [])
    schemas, cur = _schemas_of(manifest)
    cur_fields = _schema_fields(schemas, cur)
    fm = manifest.get("file_meta", {})
    fsets = [set(flt["files"]) for flt in filters]
    # group by (written schema, applicable-filter subset): files written
    # under an older schema read under THAT schema and project onto the
    # current one by FIELD ID (rename/widen/drop evolution —
    # _map_to_fields), then the filters (current names) apply. Group
    # count ≤ #schemas × (#filters + 1), each one pushed-down scan.
    groups: dict[tuple[int, tuple[int, ...]], list[str]] = {}
    for f in files:
        fkey = tuple(i for i, s in enumerate(fsets) if f in s)
        groups.setdefault((_file_sid(fm.get(f), cur), fkey), []).append(f)
    if list(groups) == [(cur, ())]:
        return spark.read.schema(schema).parquet(*files)
    parts = []
    for sid, fkey in sorted(groups):
        if sid == cur:
            part = spark.read.schema(schema).parquet(*groups[(sid, fkey)])
        else:
            written = _schema_fields(schemas, sid)
            part = _map_to_fields(
                spark.read.schema(_fields_struct(written)).parquet(
                    *groups[(sid, fkey)]
                ),
                written,
                cur_fields,
            )
        for i in fkey:
            pred = _delete_pred(
                schema, filters[i].get("where"), filters[i].get("where_range")
            )
            part = part.filter(~F.coalesce(pred, F.lit(False)))
        parts.append(part)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def read_snapshot(
    spark: SparkSession,
    base_dir: str,
    version: int | None = None,
    where: dict | None = None,
    where_range: dict | None = None,
) -> DataFrame:
    """Read the table AS OF `version` (default: latest). Reads exactly
    the manifest's file list — never a directory scan — UNDER THE
    MANIFEST'S RECORDED SCHEMA: that is what makes column-ADD schema
    evolution work (an append that introduced a column reads older
    files with NULLs in it, the Iceberg/Delta rule), and what keeps a
    snapshot's schema stable instead of depending on which file Spark
    happens to sample first. Reading an OLD version likewise shows only
    the columns that version knew (newer files never appear in its
    manifest, so no projection is needed).

    `where` ({column: value}) is MANIFEST-LEVEL equality pruning: files
    whose recorded partition values contradict it are never opened (the
    Iceberg split-planning rule), and files whose per-file BLOOM filter
    (write_snapshot bloom_for) says the value is absent are skipped
    too — partitions cover low-cardinality layout columns, blooms cover
    high-cardinality unclustered keys. Values compare in STRING form
    (the directory encoding / the bloom hash input). Files without the
    relevant metadata — older-spec files after a partition-spec
    evolution, bloom-less commits, or any legacy manifest without
    file_meta — are conservatively INCLUDED, so the result is always
    correct; the matching row filter is applied to the frame as well,
    making `where` purely an I/O optimization.

    `where_range` ({column: (lo, hi)}, either bound None for open) is
    the ZONE-MAP analog over the per-file min/max stats recorded by
    `write_snapshot(stats_for=...)`: a file is skipped when its
    recorded [min, max] cannot intersect [lo, hi]. Files without stats
    for the column (not requested at write time, legacy commits, or a
    type the bounds can't compare against) are conservatively included,
    and the row filter is applied as well — same correctness contract
    as `where`."""
    base_dir = os.path.abspath(base_dir)
    if version is None:
        version = latest_version(base_dir)
    mp = _manifest_path(base_dir, version)
    if not os.path.exists(mp):
        raise ValueError(f"no snapshot v{version} under {base_dir}")
    with open(mp) as fh:
        manifest = json.load(fh)
    files = manifest["files"]
    schema = StructType.fromJson(manifest["schema"])
    if where or where_range:
        files = prune_files(manifest, where, where_range)
    # empty commits / fully-pruned reads rebuild the empty frame from
    # the recorded schema; merge-on-read row filters (if any) apply to
    # exactly the files they were committed against (_read_files)
    df = _read_files(spark, manifest, files)
    if where or where_range:
        # the ONE predicate construction shared with the DML paths
        # (_delete_pred): native comparisons reach the parquet reader as
        # pushed filters + row-group stat prunes (manifest pruning bounds
        # the FILE set, pushdown then bounds the row groups INSIDE each
        # kept file — ADVICE r13); the string fallback uses the Spark
        # string form. Three inline copies of this dispatch diverging is
        # the bug class the r14 review caught.
        df = df.filter(_delete_pred(schema, where, where_range))
    return df


def prune_files(
    manifest: dict, where: dict | None = None, where_range: dict | None = None
) -> list[str]:
    """The manifest's file list under `where` partition pruning and/or
    `where_range` zone-map pruning — exposed separately so tests and
    planners can count skipped files without reading anything."""
    fm = manifest.get("file_meta", {})
    schemas, cur = _schemas_of(manifest)
    cur_fields = _schema_fields(schemas, cur)
    multi = len(schemas) > 1

    def keep(f: str) -> bool:
        meta = fm.get(f)
        if meta is None:  # legacy manifest — never prunable
            return True
        pt = meta.get("pt", {})
        blooms = meta.get("bloom", {})
        sid = _file_sid(meta, cur)
        for k, v in (where or {}).items():
            if multi:
                # schema evolution: the file's pt/bloom/stats metadata is
                # keyed by the name the column had WHEN WRITTEN — map the
                # current predicate name through the field id
                k = _written_name(schemas, sid, cur_fields, k)
                if k is None:
                    # the file's schema never had this field: every row
                    # reads NULL there, so a non-null equality matches
                    # nothing — skip the file (sound for read AND for the
                    # DML paths: a file with no matching rows carries
                    # over verbatim)
                    if v is not None:
                        return False
                    continue
            # string-form pruning must use the SPARK string form
            # (_spark_str): the pt directory values and the bloom hash
            # input are Spark casts, and Python str(True) = 'True' would
            # wrongly prune every boolean match — which the DML paths
            # then turn into silent row loss (r14 review finding).
            # Floats have NO portable string form (Java vs Python sci
            # notation) — conservatively unprunable; their row filters
            # compare natively instead.
            if isinstance(v, float):
                continue
            if k in pt and pt[k] != _spark_str(v):
                return False
            bl = blooms.get(k)
            if bl is not None and not _bloom_might_contain(
                bl["bits"], v, bl["m"], bl["k"]
            ):
                return False
        st = meta.get("stats", {})
        for k, (lo, hi) in (where_range or {}).items():
            if multi:
                k = _written_name(schemas, sid, cur_fields, k)
                if k is None:
                    # field absent from the file's schema → all NULL,
                    # and NULL is never inside a bounded range
                    if lo is not None or hi is not None:
                        return False
                    continue
            if k not in st:
                continue  # no zone map for this column — conservative
            mn, mx = st[k]
            if mn is None or mx is None:
                continue  # all-NULL file or unknown bounds
            if (hi is not None and _lt(hi, mn)) or (lo is not None and _lt(mx, lo)):
                return False  # _lt None (type mismatch) keeps the file
        return True

    return [f for f in manifest["files"] if keep(f)]


def read_increment(
    spark: SparkSession,
    base_dir: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Rows APPENDED after `from_version` (exclusive) up to `to_version`
    (inclusive, default latest) — the Iceberg incremental-scan / Delta
    table-changes primitive: the file-set difference of the two
    manifests, so consumption is O(delta files) with no content diff and
    no full-table read (q_snapshot_diff's full-outer classifier is the
    content-level sibling for when rows CHANGE; this is the fast path
    for append-only feeds — each nightly pipeline run reads exactly the
    files new since its last consumed version).

    Sound only across APPEND commits: an overwrite / compaction / merge
    rewrites the file set, and file subtraction across it would
    misreport rewritten old rows as new — every step in the span is
    checked to be append (files superset of its parent) and the
    function REFUSES otherwise; re-baseline from that snapshot. The
    increment is read under `to_version`'s recorded schema, so a
    column-add evolution inside the span yields the evolved view of the
    new files (old columns NULL where the appending writer omitted
    them)."""
    base_dir = os.path.abspath(base_dir)
    if to_version is None:
        to_version = latest_version(base_dir)
    if not 0 < from_version <= to_version:
        raise ValueError(
            f"need 0 < from_version <= to_version, got {from_version}..{to_version}"
        )
    manifests: dict[int, dict] = {}
    for v in range(from_version, to_version + 1):
        mp = _manifest_path(base_dir, v)
        if not os.path.exists(mp):
            raise ValueError(f"no snapshot v{v} under {base_dir} (expired?)")
        with open(mp) as fh:
            manifests[v] = json.load(fh)
    for v in range(from_version + 1, to_version + 1):
        if not set(manifests[v - 1]["files"]) <= set(manifests[v]["files"]):
            raise ValueError(
                f"increment spans a non-append commit at v{v} (overwrite/"
                "compaction/merge rewrote the file set) — re-baseline from it"
            )
        # a merge-on-read delete keeps the file set (superset holds
        # trivially) but changes row visibility: file subtraction would
        # return pre-delete rows for files appended earlier in the span
        if manifests[v - 1].get("row_filters", []) != manifests[v].get(
            "row_filters", []
        ):
            raise ValueError(
                f"increment spans a merge-on-read delete at v{v} — "
                "re-baseline from it"
            )
    base_files = set(manifests[from_version]["files"])
    new_files = [
        f
        for f in manifests[to_version]["files"]
        if f not in base_files
    ]
    schema = StructType.fromJson(manifests[to_version]["schema"])
    if not new_files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*new_files)


def merge_into_snapshot(
    spark: SparkSession,
    base_dir: str,
    updates: DataFrame,
    key: str,
    deletes: DataFrame | None = None,
) -> int:
    """MERGE INTO for the manifest table format — the upsert the
    Iceberg-lite story lacked (r11 verdict #8): SCD1 semantics (matched
    keys take the update row wholesale, unmatched keys insert, optional
    delete-by-key via `deletes`), committed as ONE new overwrite
    snapshot. Version N stays readable after the merge (time travel
    across an upsert), the commit point is the manifest rename, so a
    crash mid-merge leaves the table at N with no torn state, and the
    streaming sink's scan-back batch-id guard is unaffected (this
    manifest carries no batch_id).

    Copy-on-write strategy, like Delta/Iceberg CoW: the merge result is
    rewritten wholesale. At 100 TB scope the rewrite to the partitions
    containing touched keys (sinks.overwrite_partitions pattern) and
    keep the manifest as the union of untouched + rewritten files; the
    read protocol here would not change. An empty table (no snapshot
    yet) treats the merge as the initial commit.

    If the table has streaming commits, their max batch id is carried
    onto the merge manifest (the compact_snapshot rule): the merge
    result reflects those batches, and a later retention sweep must not
    let a replayed micro-batch double-append."""
    from nyc_bikeshare_datawarehouse_spark.operators.merge import merge_upsert

    base_dir = os.path.abspath(base_dir)
    if latest_version(base_dir) == 0:
        merged = updates
    else:
        merged = merge_upsert(read_snapshot(spark, base_dir), updates, key)
    if deletes is not None:
        merged = merged.join(deletes.select(key), key, "left_anti")
    last_bid = last_metadata_value(base_dir, "batch_id")
    metadata = {"batch_id": last_bid} if last_bid is not None else None
    return write_snapshot(merged, base_dir, mode="overwrite", metadata=metadata)


def compact_snapshot(
    spark: SparkSession,
    base_dir: str,
    target_files: int = 1,
    metadata: dict | None = None,
    cluster_by: list[str] | None = None,
    stats_for: list[str] | None = None,
) -> int:
    """OPTIMIZE / small-file compaction for the manifest table format:
    rewrite the CURRENT snapshot's row multiset into `target_files`
    files and commit it as a new overwrite snapshot. Long-lived append
    tables accumulate one file set per micro-batch/commit (the
    streaming sink appends per batch); scan cost becomes
    O(files) task-scheduling overhead, and at 100 TB footer-reads alone
    dominate — compaction is how every table format (Iceberg rewrite,
    Delta OPTIMIZE) pays that debt back. Content is unchanged (pytest
    pins multiset equality via checksum), historical snapshots keep
    reading their original files (immutable — expire reclaims them
    later), and the commit point is the manifest rename, so a crashed
    compaction changes nothing. At scale, partition the rewrite
    (compact one partition's files per commit) instead of one global
    repartition; the manifest protocol is unchanged.

    `metadata` passes through to the compaction manifest — the
    streaming sink uses it to CARRY the last batch_id forward, so a
    retention sweep that expires the original data commit cannot reset
    the replay guard (the compaction rewrites exactly the state those
    batches produced, so re-asserting their id is truthful).

    `cluster_by` makes this OPTIMIZE-with-clustering (Delta ZORDER-lite,
    1-D): the rewrite is repartitionByRange + sortWithinPartitions on
    the named columns, so per-file value ranges become disjoint — the
    layout zone maps need to be selective. Append-heavy tables
    accumulate files whose ranges all overlap (every micro-batch spans
    the keyspace), which leaves `where_range` pruning inert; a
    clustered compaction is how the table earns its skipping back.
    `stats_for` defaults to `cluster_by` so the fresh layout's zone
    maps land in the same commit (pass explicitly to record more)."""
    current = read_snapshot(spark, base_dir)
    if cluster_by:
        rewritten = current.repartitionByRange(
            target_files, *cluster_by
        ).sortWithinPartitions(*cluster_by)
    else:
        rewritten = current.repartition(target_files)
    return write_snapshot(
        rewritten,
        base_dir,
        mode="overwrite",
        metadata=metadata,
        stats_for=stats_for if stats_for is not None else cluster_by,
    )


def delete_where(
    spark: SparkSession,
    base_dir: str,
    where: dict | None = None,
    where_range: dict | None = None,
    stats_for: list[str] | None = None,
    strategy: str = "copy-on-write",
) -> tuple[int, int, int]:
    """Row-level DELETE for the manifest table format — copy-on-write of
    the AFFECTED FILES ONLY (the r13 verdict's missing Iceberg-lite
    capability; reference analog: the truncate-and-load DELETE FROM in
    stage_redshift.py:38-48, generalized to predicates).

    The predicate is the same (where, where_range) language as
    `read_snapshot`: equality on `where` keys AND range on `where_range`
    bounds, all conjunctive. A row is deleted when EVERY condition is
    true (SQL DELETE semantics — NULL comparisons keep the row).

    Copy-on-write bounded by the manifest's own skipping metadata:
    `prune_files` (partition values + zone maps + blooms) first selects
    the files that MIGHT hold matching rows — only those are re-read and
    rewritten without the matching rows; every other file is carried
    into the new manifest VERBATIM (same path, no I/O). That makes a
    point delete on a partitioned/clustered/bloomed table O(affected
    files), not O(table) — the reason the skipping metadata pays for
    itself on the write path too. Rewritten files lose their partition
    layout and per-file metadata unless `stats_for` re-records zone maps
    (conservative inclusion keeps correctness either way; a later
    clustered compaction re-earns the skipping).

    Historical snapshots keep reading the original files (immutable;
    retention reclaims them); the commit point is the manifest rename.
    The streaming replay guard's batch id is carried forward like
    compaction/merge: the delete rewrites exactly the state those
    batches produced, so re-asserting their id is truthful.

    strategy="merge-on-read" (r14) is the Iceberg-v2 equality-delete
    sibling: NO data I/O at commit — the manifest gains a row filter
    recording the predicate AND the file set it was committed against
    (the sequence-number scoping rule flattened to explicit lists), and
    every read applies NOT(pred) to exactly those files (_read_files).
    Rows appended after the delete are never filtered by it; the next
    compaction/overwrite materializes the filters and clears them. The
    write is O(manifest) regardless of how many files hold matching
    rows — the right strategy for frequent point deletes on a 100 TB
    table whose files are large; copy-on-write remains right when
    deletes are rare and read amplification matters more. MoR predicate
    values must be JSON-native (int/float/str/bool): they commit into
    the manifest and replay at read time.

    Returns (version, n_files_rewritten, n_files_kept) —
    (version, 0, n_files) for merge-on-read."""
    if strategy not in ("copy-on-write", "merge-on-read"):
        raise ValueError(f"unknown delete strategy: {strategy!r}")
    base_dir = os.path.abspath(base_dir)
    prev = latest_version(base_dir)
    if prev == 0:
        raise ValueError(f"no snapshot under {base_dir}")
    with open(_manifest_path(base_dir, prev)) as fh:
        manifest = json.load(fh)
    schema = StructType.fromJson(manifest["schema"])
    if not where and not where_range:
        raise ValueError("delete_where needs a predicate (where/where_range)")
    for k in list(where or {}) + list(where_range or {}):
        if k not in schema.fieldNames():
            raise ValueError(f"predicate column {k!r} not in table schema")
    version = prev + 1
    last_bid = last_metadata_value(base_dir, "batch_id")

    if strategy == "merge-on-read":
        _validate_mor_values(where, where_range)
        filters = list(manifest.get("row_filters", []))
        filters.append(
            {
                "where": dict(where or {}),
                "where_range": {
                    k: [lo, hi] for k, (lo, hi) in (where_range or {}).items()
                },
                "files": manifest["files"],
            }
        )
        mp = _manifest_path(base_dir, version)
        with open(mp + ".tmp", "w") as fh:
            json.dump(
                {
                    "version": version,
                    "files": manifest["files"],
                    "schema": manifest["schema"],
                    "metadata": {
                        "delete_where": {
                            "strategy": "merge-on-read",
                            "where": {k: str(v) for k, v in (where or {}).items()},
                            "where_range": {
                                k: [_stat_value(lo), _stat_value(hi)]
                                for k, (lo, hi) in (where_range or {}).items()
                            },
                        },
                        **({"batch_id": last_bid} if last_bid is not None else {}),
                    },
                    "partition_specs": manifest.get("partition_specs", []),
                    "current_spec": manifest.get("current_spec", 1),
                    "file_meta": manifest.get("file_meta", {}),
                    "row_filters": filters,
                    **_schema_keys(manifest),
                },
                fh,
            )
        os.replace(mp + ".tmp", mp)
        return version, 0, len(manifest["files"])

    candidates = prune_files(manifest, where, where_range)
    cand_set = set(candidates)
    kept = [f for f in manifest["files"] if f not in cand_set]
    new_files: list[str] = []
    col_stats: dict[str, dict] = {}
    if candidates:
        # read THROUGH any existing merge-on-read filters: a CoW rewrite
        # of a file must not resurrect rows an earlier MoR delete hid
        df = _read_files(spark, manifest, candidates)
        # conjunctive delete predicate — NULL-safe: DELETE removes rows
        # where the predicate is TRUE; NULL/FALSE rows survive
        pred = _delete_pred(schema, where, where_range)
        surviving = df.filter(~F.coalesce(pred, F.lit(False)))
        data_dir = os.path.join(base_dir, f"v{version}")
        if os.path.isdir(data_dir):  # torn uncommitted write from a dead run
            shutil.rmtree(data_dir)
        surviving.write.mode("overwrite").parquet(data_dir)
        new_files = _leaf_files(data_dir)
        if stats_for and new_files:
            aggs = []
            for c in stats_for:
                aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
            rows = (
                spark.read.schema(schema).parquet(data_dir)
                .groupBy(F.input_file_name().alias("__f"))
                .agg(*aggs)
                .collect()
            )
            for r in rows:
                p = os.path.abspath(
                    urllib.parse.unquote(urllib.parse.urlparse(r["__f"]).path)
                )
                col_stats[p] = {
                    c: [_stat_value(r[f"__mn_{c}"]), _stat_value(r[f"__mx_{c}"])]
                    for c in stats_for
                }
    spec_id = manifest.get("current_spec", 1)
    _, _cur_sid = _schemas_of(manifest)
    prev_meta = manifest.get("file_meta", {})
    file_meta = {f: prev_meta[f] for f in kept if f in prev_meta}
    for f in new_files:
        # rewrites read through _read_files (current names), so the new
        # files carry the CURRENT schema id
        file_meta[f] = {
            "pt": {},
            "spec_id": spec_id,
            "sid": _cur_sid,
            **({"stats": col_stats[f]} if f in col_stats else {}),
        }
    # existing MoR filters survive for the files they still cover; the
    # rewritten files are NEW paths (absent from every filter's list)
    # whose content was already read through the filters above. Entries
    # covering no kept file are dropped.
    kept_set = set(kept)
    row_filters = [
        flt
        for flt in manifest.get("row_filters", [])
        if kept_set & set(flt["files"])
    ]
    mp = _manifest_path(base_dir, version)
    with open(mp + ".tmp", "w") as fh:
        json.dump(
            {
                "version": version,
                "files": kept + new_files,
                "schema": manifest["schema"],
                "metadata": {
                    "delete_where": {
                        "where": {k: str(v) for k, v in (where or {}).items()},
                        "where_range": {
                            k: [_stat_value(lo), _stat_value(hi)]
                            for k, (lo, hi) in (where_range or {}).items()
                        },
                        "files_rewritten": len(candidates),
                        "files_kept": len(kept),
                    },
                    **({"batch_id": last_bid} if last_bid is not None else {}),
                },
                "partition_specs": manifest.get("partition_specs", []),
                "current_spec": spec_id,
                "file_meta": file_meta,
                "row_filters": row_filters,
                **_schema_keys(manifest),
            },
            fh,
        )
    os.replace(mp + ".tmp", mp)
    return version, len(candidates), len(kept)


def update_where(
    spark: SparkSession,
    base_dir: str,
    set_values: dict,
    where: dict | None = None,
    where_range: dict | None = None,
    stats_for: list[str] | None = None,
    strategy: str = "copy-on-write",
) -> tuple[int, int, int]:
    """Row-level UPDATE ... SET for the manifest table format — the
    remaining DML member (append = INSERT, merge_into_snapshot = MERGE,
    delete_where = DELETE CoW/MoR, rollback_to = rollback). Semantics:
    rows where the (where, where_range) predicate is TRUE take every
    `set_values` literal; NULL/FALSE rows keep their values — the SQL
    UPDATE rule, same NULL treatment as delete_where.

    Copy-on-write bounded exactly like delete_where: `prune_files`
    selects the files that might hold matching rows, only those are
    re-read (THROUGH any merge-on-read filters) and rewritten with
    CASE WHEN pred THEN literal ELSE col END per SET column; every
    other file carries into the new manifest verbatim. Kept files'
    skipping metadata stays valid (their rows are untouched); rewritten
    files drop theirs unless `stats_for` re-records zone maps — and a
    SET column's old stats would be wrong anyway, so conservative
    inclusion is the only sound default. Schema is unchanged by
    construction (a SET value must cast to the existing column type;
    new columns are schema evolution, not UPDATE).

    strategy="merge-on-read" (r14) is UPDATE as the Iceberg-v2
    delete-plus-insert: ONE commit whose manifest (a) adds the delete
    row filter scoped to the pre-commit files and (b) appends new data
    files holding ONLY the matching rows with SET applied — data I/O is
    O(matching rows), not O(affected files), strictly cheaper than CoW
    when matches are sparse inside big files. The updated copies live
    in files outside the filter's scope, so reads see exactly the
    post-update multiset; compaction materializes as usual. MoR
    predicate values must be JSON-native (the delete-filter rule).

    Returns (version, n_files_rewritten, n_files_kept) —
    merge-on-read returns (version, 0, n_files_prev) and its I/O is
    the matching rows only."""
    if strategy not in ("copy-on-write", "merge-on-read"):
        raise ValueError(f"unknown update strategy: {strategy!r}")
    base_dir = os.path.abspath(base_dir)
    prev = latest_version(base_dir)
    if prev == 0:
        raise ValueError(f"no snapshot under {base_dir}")
    with open(_manifest_path(base_dir, prev)) as fh:
        manifest = json.load(fh)
    schema = StructType.fromJson(manifest["schema"])
    if not set_values:
        raise ValueError("update_where needs at least one SET column")
    if not where and not where_range:
        raise ValueError("update_where needs a predicate (where/where_range)")
    for k in (
        list(where or {}) + list(where_range or {}) + list(set_values)
    ):
        if k not in schema.fieldNames():
            raise ValueError(f"column {k!r} not in table schema")

    if strategy == "merge-on-read":
        _validate_mor_values(where, where_range)
        version = prev + 1
        pred = F.coalesce(
            _delete_pred(schema, where, where_range), F.lit(False)
        )
        types = {f.name: f.dataType for f in schema.fields}
        candidates = prune_files(manifest, where, where_range)
        matching = _read_files(spark, manifest, candidates).filter(pred)
        updated = matching.select(
            *[
                F.lit(set_values[c]).cast(types[c]).alias(c)
                if c in set_values
                else F.col(c)
                for c in schema.fieldNames()
            ]
        )
        data_dir = os.path.join(base_dir, f"v{version}")
        if os.path.isdir(data_dir):  # torn uncommitted write from a dead run
            shutil.rmtree(data_dir)
        updated.write.mode("overwrite").parquet(data_dir)
        new_files = _leaf_files(data_dir)
        spec_id = manifest.get("current_spec", 1)
        _, _cur_sid = _schemas_of(manifest)
        file_meta = dict(manifest.get("file_meta", {}))
        for f in new_files:
            file_meta[f] = {"pt": {}, "spec_id": spec_id, "sid": _cur_sid}
        filters = list(manifest.get("row_filters", []))
        # Scope the row filter to the SAME file set the re-inserted
        # updated rows were built from (candidates), not the whole
        # manifest: equivalent under correct pruning, and a pruning
        # false-negative then degrades to a missed update instead of
        # silent row LOSS (row hidden by a wider filter but never
        # re-inserted).
        filters.append(
            {
                "where": dict(where or {}),
                "where_range": {
                    k: [lo, hi] for k, (lo, hi) in (where_range or {}).items()
                },
                "files": candidates,
            }
        )
        last_bid = last_metadata_value(base_dir, "batch_id")
        mp = _manifest_path(base_dir, version)
        with open(mp + ".tmp", "w") as fh:
            json.dump(
                {
                    "version": version,
                    "files": manifest["files"] + new_files,
                    "schema": manifest["schema"],
                    "metadata": {
                        "update_where": {
                            "strategy": "merge-on-read",
                            "set": {
                                k: _stat_value(v) for k, v in set_values.items()
                            },
                            "where": {k: str(v) for k, v in (where or {}).items()},
                            "where_range": {
                                k: [_stat_value(lo), _stat_value(hi)]
                                for k, (lo, hi) in (where_range or {}).items()
                            },
                        },
                        **({"batch_id": last_bid} if last_bid is not None else {}),
                    },
                    "partition_specs": manifest.get("partition_specs", []),
                    "current_spec": spec_id,
                    "file_meta": file_meta,
                    "row_filters": filters,
                    **_schema_keys(manifest),
                },
                fh,
            )
        os.replace(mp + ".tmp", mp)
        return version, 0, len(manifest["files"])

    candidates = prune_files(manifest, where, where_range)
    cand_set = set(candidates)
    kept = [f for f in manifest["files"] if f not in cand_set]
    version = prev + 1
    new_files: list[str] = []
    col_stats: dict[str, dict] = {}
    if candidates:
        df = _read_files(spark, manifest, candidates)
        pred = F.coalesce(
            _delete_pred(schema, where, where_range), F.lit(False)
        )
        types = {f.name: f.dataType for f in schema.fields}
        updated = df.select(
            *[
                F.when(pred, F.lit(set_values[c]).cast(types[c]))
                .otherwise(F.col(c))
                .alias(c)
                if c in set_values
                else F.col(c)
                for c in schema.fieldNames()
            ]
        )
        data_dir = os.path.join(base_dir, f"v{version}")
        if os.path.isdir(data_dir):  # torn uncommitted write from a dead run
            shutil.rmtree(data_dir)
        updated.write.mode("overwrite").parquet(data_dir)
        new_files = _leaf_files(data_dir)
        if stats_for and new_files:
            aggs = []
            for c in stats_for:
                aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
            rows = (
                spark.read.schema(schema).parquet(data_dir)
                .groupBy(F.input_file_name().alias("__f"))
                .agg(*aggs)
                .collect()
            )
            for r in rows:
                p = os.path.abspath(
                    urllib.parse.unquote(urllib.parse.urlparse(r["__f"]).path)
                )
                col_stats[p] = {
                    c: [_stat_value(r[f"__mn_{c}"]), _stat_value(r[f"__mx_{c}"])]
                    for c in stats_for
                }
    spec_id = manifest.get("current_spec", 1)
    _, _cur_sid = _schemas_of(manifest)
    prev_meta = manifest.get("file_meta", {})
    file_meta = {f: prev_meta[f] for f in kept if f in prev_meta}
    for f in new_files:
        file_meta[f] = {
            "pt": {},
            "spec_id": spec_id,
            "sid": _cur_sid,
            **({"stats": col_stats[f]} if f in col_stats else {}),
        }
    kept_set = set(kept)
    row_filters = [
        flt
        for flt in manifest.get("row_filters", [])
        if kept_set & set(flt["files"])
    ]
    last_bid = last_metadata_value(base_dir, "batch_id")
    mp = _manifest_path(base_dir, version)
    with open(mp + ".tmp", "w") as fh:
        json.dump(
            {
                "version": version,
                "files": kept + new_files,
                "schema": manifest["schema"],
                "metadata": {
                    "update_where": {
                        "set": {k: _stat_value(v) for k, v in set_values.items()},
                        "where": {k: str(v) for k, v in (where or {}).items()},
                        "where_range": {
                            k: [_stat_value(lo), _stat_value(hi)]
                            for k, (lo, hi) in (where_range or {}).items()
                        },
                        "files_rewritten": len(candidates),
                        "files_kept": len(kept),
                    },
                    **({"batch_id": last_bid} if last_bid is not None else {}),
                },
                "partition_specs": manifest.get("partition_specs", []),
                "current_spec": spec_id,
                "file_meta": file_meta,
                "row_filters": row_filters,
                **_schema_keys(manifest),
            },
            fh,
        )
    os.replace(mp + ".tmp", mp)
    return version, len(candidates), len(kept)


def rollback_to(base_dir: str, version: int) -> int:
    """Roll the table back to snapshot `version` by committing a NEW
    manifest that re-points at the old manifest's exact file list — the
    Iceberg rollback rule: nothing is deleted, history stays linear and
    fully readable (the undone snapshots remain time-travelable), and
    retention alone governs when any file actually expires. Because the
    rollback commit REFERENCES the old files, a later
    `expire_snapshots` keeps them live automatically (live-set union
    over surviving manifests).

    The streaming replay guard rolls back WITH the data, atomically in
    the same manifest: the new commit re-asserts the batch id that was
    current AS OF the target version (scan-back from `version`), so a
    source replaying batches after that id re-applies them onto the
    rolled-back state instead of being skipped as already-seen — exactly
    the recovery semantics an at-least-once sink needs after an
    operator-error rollback. No Spark session required: this is pure
    manifest arithmetic, O(1) data I/O."""
    base_dir = os.path.abspath(base_dir)
    last = latest_version(base_dir)
    mp = _manifest_path(base_dir, version)
    if version <= 0 or not os.path.exists(mp):
        raise ValueError(f"no snapshot v{version} under {base_dir} (expired?)")
    with open(mp) as fh:
        target = json.load(fh)
    # replay guard AS OF the target: newest batch_id carried by any
    # manifest <= version (same scan-back as last_metadata_value, bounded)
    bid = None
    for v in range(version, 0, -1):
        p = _manifest_path(base_dir, v)
        if not os.path.exists(p):
            continue
        with open(p) as fh:
            md = json.load(fh).get("metadata", {})
        if "batch_id" in md:
            bid = md["batch_id"]
            break
    new_version = last + 1
    nmp = _manifest_path(base_dir, new_version)
    with open(nmp + ".tmp", "w") as fh:
        json.dump(
            {
                "version": new_version,
                "files": target["files"],
                "schema": target["schema"],
                "metadata": {
                    "rollback_of": version,
                    # always present, explicitly null when no manifest at
                    # or below the target carried one: last_metadata_value
                    # scans back past manifests WITHOUT the key, so
                    # omitting it here would let the scan reach the UNDONE
                    # commits and return a rolled-back batch id — a
                    # replaying source would then skip those batches,
                    # silently losing their rows on recovery.
                    "batch_id": bid,
                },
                "partition_specs": target.get("partition_specs", []),
                "current_spec": target.get("current_spec", 1),
                "file_meta": target.get("file_meta", {}),
                # merge-on-read filters are part of the rolled-back
                # state: restoring v without them would resurrect rows
                # a MoR delete before v had hidden
                "row_filters": target.get("row_filters", []),
                **_schema_keys(target),
            },
            fh,
        )
    os.replace(nmp + ".tmp", nmp)
    return new_version


def _evolve_schema(base_dir: str, new_fields: list[dict], metadata: dict) -> int:
    """Commit a METADATA-ONLY schema change: a new manifest with the
    same file list and a new current schema entry appended to the
    field-id history. Pure manifest arithmetic — zero data I/O, which
    is the whole point of field-id evolution at 100 TB (a rename must
    never rewrite a table). Shared by rename/widen/drop."""
    base_dir = os.path.abspath(base_dir)
    prev = latest_version(base_dir)
    if prev == 0:
        raise ValueError(f"no snapshot under {base_dir}")
    with open(_manifest_path(base_dir, prev)) as fh:
        manifest = json.load(fh)
    schemas, cur = _schemas_of(manifest)
    schemas = list(schemas)
    new_sid = max(s["schema_id"] for s in schemas) + 1
    schemas.append({"schema_id": new_sid, "fields": new_fields})
    # legacy upgrade rides the same commit: files written before the
    # history existed are tagged with the schema that was current
    # (= the synthesized schema 1 for a legacy manifest)
    file_meta = {
        f: {**meta, "sid": _file_sid(meta, cur)}
        for f, meta in manifest.get("file_meta", {}).items()
    }
    version = prev + 1
    mp = _manifest_path(base_dir, version)
    with open(mp + ".tmp", "w") as fh:
        json.dump(
            {
                "version": version,
                "files": manifest["files"],
                "schema": _fields_struct(new_fields).jsonValue(),
                "metadata": metadata,
                "partition_specs": manifest.get("partition_specs", []),
                "current_spec": manifest.get("current_spec", 1),
                "file_meta": file_meta,
                "row_filters": manifest.get("row_filters", []),
                "schemas": schemas,
                "current_schema": new_sid,
            },
            fh,
        )
    os.replace(mp + ".tmp", mp)
    return version


def _evolution_guard(manifest: dict, col: str, op: str) -> None:
    """Shared refusals for rename/widen/drop of `col`.

    Live MoR row filters replay their predicates BY NAME at read time,
    so evolving a referenced column would silently decouple the filter
    from the data — compact first (materializes and clears filters).
    The CURRENT partition spec's columns name the layout future writes
    must produce; evolving one would dangle the spec (historical specs
    are fine — per-file pt values map through written names)."""
    if col in _filter_columns(manifest):
        raise ValueError(
            f"cannot {op} column {col!r}: referenced by a live "
            "merge-on-read row filter — compact_snapshot first"
        )
    specs = manifest.get("partition_specs", [])
    cur_spec = manifest.get("current_spec", 1)
    for s in specs:
        if s["spec_id"] == cur_spec and col in s.get("columns", []):
            raise ValueError(
                f"cannot {op} column {col!r}: it is a current "
                "partition-spec column — evolve the spec first "
                "(commit with a different partition_by)"
            )


def rename_column(base_dir: str, old: str, new: str) -> int:
    """RENAME COLUMN for the manifest table format — field-id mapped,
    the Iceberg rule (reference analog: the create_tables.sql DDL
    lifecycle): a metadata-only commit appends a schema entry where the
    field keeps its ID under the new name. Files written before the
    rename are read under their own written schema and projected onto
    the current one BY ID (_map_to_fields), so the renamed column's
    historical data stays fully populated — the failure mode this
    design exists to prevent is Spark's name-based parquet matching
    silently returning NULL for every pre-rename file. Old snapshots
    time-travel under their own names; appends after the rename write
    the new name. Zero data I/O."""
    base_dir = os.path.abspath(base_dir)
    prev = latest_version(base_dir)
    if prev == 0:
        raise ValueError(f"no snapshot under {base_dir}")
    with open(_manifest_path(base_dir, prev)) as fh:
        manifest = json.load(fh)
    schemas, cur = _schemas_of(manifest)
    fields = _schema_fields(schemas, cur)
    names = [f["name"] for f in fields]
    if old not in names:
        raise ValueError(f"column {old!r} not in table schema")
    if new in names:
        raise ValueError(f"column {new!r} already exists")
    _evolution_guard(manifest, old, "rename")
    new_fields = [
        {**f, "name": new} if f["name"] == old else f for f in fields
    ]
    return _evolve_schema(
        base_dir, new_fields, {"rename_column": {"from": old, "to": new}}
    )


def alter_column_type(base_dir: str, col: str, new_type: str) -> int:
    """ALTER COLUMN TYPE (widening only) for the manifest table format:
    a metadata-only commit recording the new type under the same field
    id. Only value-preserving promotions are accepted (_WIDENINGS —
    int→long, long→double, float→double, …): reads cast old files UP,
    which is lossless, while a narrowing would corrupt silently.
    Old snapshots keep their own type; zero data I/O."""
    base_dir = os.path.abspath(base_dir)
    prev = latest_version(base_dir)
    if prev == 0:
        raise ValueError(f"no snapshot under {base_dir}")
    with open(_manifest_path(base_dir, prev)) as fh:
        manifest = json.load(fh)
    schemas, cur = _schemas_of(manifest)
    fields = _schema_fields(schemas, cur)
    f = next((f for f in fields if f["name"] == col), None)
    if f is None:
        raise ValueError(f"column {col!r} not in table schema")
    old_type = f["type"] if isinstance(f["type"], str) else None
    if (old_type, new_type) not in _WIDENINGS:
        raise ValueError(
            f"cannot alter column {col!r} from {f['type']} to "
            f"{new_type!r}: only value-preserving widenings are "
            f"supported ({sorted(_WIDENINGS)})"
        )
    _evolution_guard(manifest, col, "widen")
    new_fields = [
        {**g, "type": new_type} if g["name"] == col else g for g in fields
    ]
    return _evolve_schema(
        base_dir,
        new_fields,
        {"alter_column_type": {"column": col, "from": old_type, "to": new_type}},
    )


def drop_column(base_dir: str, col: str) -> int:
    """DROP COLUMN for the manifest table format: a metadata-only
    commit whose schema entry omits the field. The data stays in the
    files (old snapshots read it; retention governs physical life), and
    re-adding the same NAME later allocates a FRESH field id, so the
    dropped column's historical values are never resurrected into the
    new column — the field-id guarantee name-based formats can't make.
    Zero data I/O."""
    base_dir = os.path.abspath(base_dir)
    prev = latest_version(base_dir)
    if prev == 0:
        raise ValueError(f"no snapshot under {base_dir}")
    with open(_manifest_path(base_dir, prev)) as fh:
        manifest = json.load(fh)
    schemas, cur = _schemas_of(manifest)
    fields = _schema_fields(schemas, cur)
    if col not in [f["name"] for f in fields]:
        raise ValueError(f"column {col!r} not in table schema")
    if len(fields) == 1:
        raise ValueError("cannot drop the only column")
    _evolution_guard(manifest, col, "drop")
    new_fields = [f for f in fields if f["name"] != col]
    return _evolve_schema(
        base_dir, new_fields, {"drop_column": {"column": col}}
    )


def expire_snapshots(base_dir: str, keep_from: int) -> list[int]:
    """Drop manifests below `keep_from` and delete data files no
    surviving manifest references (plus any v{n} directory left empty).
    Returns expired versions."""
    base_dir = os.path.abspath(base_dir)
    last = latest_version(base_dir)
    if keep_from > last:
        raise ValueError(
            f"keep_from={keep_from} would expire the CURRENT snapshot "
            f"(latest is v{last}) — refusing, like any table format"
        )
    expired = [
        v
        for v in range(1, min(keep_from, last + 1))
        if os.path.exists(_manifest_path(base_dir, v))
    ]
    live: set[str] = set()
    for v in range(keep_from, last + 1):
        mp = _manifest_path(base_dir, v)
        if os.path.exists(mp):
            with open(mp) as fh:
                live.update(json.load(fh)["files"])
    for v in expired:
        with open(_manifest_path(base_dir, v)) as fh:
            for f in json.load(fh)["files"]:
                if f not in live and os.path.exists(f):
                    os.remove(f)
        os.remove(_manifest_path(base_dir, v))
    # long-lived tables: reap v{n} dirs the dead-file sweep emptied
    # (parquet writes leave _SUCCESS/.crc sidecars no manifest names).
    # RECURSIVE emptiness check — a partitioned commit nests its files
    # under __pt_*=*/ subdirs, where a top-level listdir sees no
    # .parquet and would reap a directory that still holds live files
    # (e.g. a later snapshot still referencing them).
    for v in expired:
        d = os.path.join(base_dir, f"v{v}")
        if os.path.isdir(d) and not _leaf_files(d):
            shutil.rmtree(d)
    return expired
