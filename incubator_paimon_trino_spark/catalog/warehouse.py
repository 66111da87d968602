"""WarehouseCatalog — the lake-table catalog the reference implements as a
Trino connector, re-expressed Spark-first.

Layout (one directory tree, no services):

    warehouse/
      <db>.db/
        <table>/
          schema/schema-<id>.json       # full schema history (evolution by field id)
          snapshot/snapshot-<v>.json    # one manifest per commit
          snapshot/LATEST               # pointer file
          data/c<v>-*.parquet           # immutable data files per commit

Reference parity map (SURVEY §2.A):
- A14 list/describe            → ``list_databases/list_tables/describe``
- A15 CREATE/DROP SCHEMA       → ``create_database/drop_database``
- A16 CREATE TABLE (+PK/partitions/options) → ``create_table``
- A17 RENAME/DROP TABLE        → ``rename_table/drop_table``
- A18 ADD/RENAME/DROP COLUMN   → ``add_column/rename_column/drop_column``
  (field-id mapping: files written under old schemas stay readable)
- A19 SET PROPERTIES           → ``set_options``
- A11/A12 time travel          → ``read_table(version_as_of=, timestamp_as_of=)``
- A13 system tables            → ``read_table("t$snapshots")`` etc.
- A9 merge-on-read             → PK tables merged at read (see
  ``operators/merge_on_read.py``)
- beyond reference: a write path (``insert_into``, ``delete_where``) — the
  reference is read-only and relies on external writers
  (``SimpleTableTestHelper.java:46-53``); our engine writes its own snapshots.

Scale notes: manifests list full live-file sets (simple, atomic); at real
scale these become delta manifests + metadata compaction, which changes the
manifest reader only — the table/commit model is unchanged. Data files are
written by Spark executors in parallel; only the (tiny) JSON commit is
driver-side, matching Paimon's coordinator-side commit protocol.
"""

from __future__ import annotations

import dataclasses
import datetime as _dt
import uuid
import glob
import os
import re
import shutil
import time
import warnings

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_paimon_trino_spark.catalog.metadata import (
    COMMIT_APPEND,
    COMMIT_COMPACT,
    COMMIT_OVERWRITE,
    KIND_COL,
    SEQ_COL,
    CommitConflictError,
    Field,
    Snapshot,
    TableSchema,
    _parse_type as _meta_parse_type,
    load_snapshots,
    read_json,
    write_json_atomic,
)
from incubator_paimon_trino_spark.catalog.file_index import (
    SUFFIX as _FIDX_SUFFIX,
    _split_cols,
    build_file_indexes,
    index_specs as _file_index_specs,
    prune_files_by_index,
)
from incubator_paimon_trino_spark.catalog.scan import (
    _HIVE_NULL,
    collect_file_stats,
    partition_values,
    prune_files,
)
from incubator_paimon_trino_spark.functions.types import (
    castable_ddl,
    char_length,
    paimon_to_spark,
    spark_to_paimon,
    timestamp_precision,
)

_SYSTEM_SUFFIXES = (
    "snapshots",
    "schemas",
    "files",
    "options",
    "audit_log",
    "tags",
    "partitions",
    "manifests",
    "consumers",
    "statistics",
    "branches",
    "ro",
)

#: Deletion-vector provenance columns (never user-visible: appended by
#: ``_read_files(with_pos=True)`` and consumed/dropped by ``_dv_apply``).
_DV_FILE = "__dv_file"
_DV_POS = "__dv_pos"


class WarehouseCatalog:
    def __init__(self, warehouse: str, spark: SparkSession, commit_user: str = "spark-graft"):
        self.warehouse = os.path.abspath(warehouse)
        self.spark = spark
        self.commit_user = commit_user
        try:
            # TIME columns need Spark 4.1's flag; runtime-settable, so turn
            # it on for catalogs attached to externally-built sessions too.
            spark.conf.set("spark.sql.timeType.enabled", "true")
        except Exception as e:
            # The one silently tolerable shape is a session that forbids
            # modifying the conf (static/immutable config — the known Spark
            # error codes below). Anything else would make TIME support
            # silently depend on which session built the catalog, so warn.
            # (An unknown key doesn't raise: runtime conf accepts arbitrary
            # keys, and TIME DDL then fails loudly later in types.py.)
            msg = str(e)
            if not (
                "CANNOT_MODIFY_CONFIG" in msg
                or "Cannot modify the value" in msg
                or "is a static config" in msg
            ):
                warnings.warn(
                    f"could not enable spark.sql.timeType.enabled "
                    f"({type(e).__name__}: {msg}); "
                    "TIME columns will be unavailable in this session"
                )
        else:
            if spark.conf.get("spark.sql.timeType.enabled", "false") != "true":
                warnings.warn(
                    "spark.sql.timeType.enabled did not take effect; "
                    "TIME columns will be unavailable in this session"
                )
        os.makedirs(self.warehouse, exist_ok=True)

    # ------------------------------------------------------------------ paths
    def _db_dir(self, db: str) -> str:
        return os.path.join(self.warehouse, f"{db}.db")

    def _table_dir(self, db: str, table: str) -> str:
        """Branch-aware: ``t$branch_<name>`` addresses the branch's own
        metadata namespace (snapshot/schema/manifest/data dirs under
        ``<table>/branch/<name>/``) — Paimon's branch addressing syntax.
        Every (db, table) method then works on branches unchanged."""
        base, _, br = table.partition("$branch_")
        d = os.path.join(self._db_dir(db), base)
        return os.path.join(d, "branch", br) if br else d

    # ------------------------------------------------------------ databases
    def create_database(self, db: str, ignore_if_exists: bool = False) -> None:
        d = self._db_dir(db)
        if os.path.exists(d):
            if ignore_if_exists:
                return
            raise ValueError(f"database {db!r} already exists")
        os.makedirs(d)

    def drop_database(self, db: str, cascade: bool = False) -> None:
        d = self._db_dir(db)
        if not os.path.exists(d):
            raise ValueError(f"database {db!r} does not exist")
        if os.listdir(d) and not cascade:
            raise ValueError(f"database {db!r} is not empty")
        shutil.rmtree(d)

    def list_databases(self) -> list[str]:
        return sorted(
            e[: -len(".db")] for e in os.listdir(self.warehouse) if e.endswith(".db")
        )

    def list_tables(self, db: str) -> list[str]:
        d = self._db_dir(db)
        if not os.path.exists(d):
            raise ValueError(f"database {db!r} does not exist")
        return sorted(e for e in os.listdir(d) if os.path.isdir(os.path.join(d, e)))

    # ---------------------------------------------------------------- tables
    def create_table(
        self,
        db: str,
        table: str,
        columns: list[tuple[str, str]],
        primary_key: list[str] | None = None,
        partitioned_by: list[str] | None = None,
        options: dict[str, str] | None = None,
    ) -> None:
        """CREATE TABLE with PK / partition keys / Paimon-style options.

        ``columns`` is [(name, spark_type_ddl)] or
        [(name, spark_type_ddl, comment)] — the optional per-column comment
        surfaces through ``information_schema.columns`` (Trino's columns
        metadata carries comment/default — ``TrinoMetadataBase.java:271-287``).
        Option keys use the reference's underscore mangling (``file_format``,
        ``bucket_key``, ``changelog_producer`` —
        ``TrinoTableOptionUtils.java:130-135``).
        """
        if "$" in table:
            # `$` is branch/system addressing (t$branch_b, t$snapshots) —
            # branches are created with create_branch, never CREATE TABLE
            raise ValueError(f"invalid table name {table!r} ('$' is reserved)")
        tdir = self._table_dir(db, table)
        if not os.path.exists(self._db_dir(db)):
            raise ValueError(f"database {db!r} does not exist")
        if os.path.exists(tdir):
            raise ValueError(f"table {db}.{table} already exists")
        primary_key = list(primary_key or [])
        partitioned_by = list(partitioned_by or [])
        names = [c[0] for c in columns]
        lowered = [n.lower() for n in names]
        dups = sorted({n for n in lowered if lowered.count(n) > 1})
        if dups:
            raise ValueError(f"duplicate column names {dups}")
        from incubator_paimon_trino_spark.operators.merge_on_read import RESERVED_INTERNAL

        reserved = sorted(set(lowered) & {r.lower() for r in RESERVED_INTERNAL})
        if reserved:
            # the system/merge scaffolding columns would silently shadow a
            # user column of the same name at read time
            raise ValueError(f"column name(s) {reserved} are reserved (system columns)")
        for c in columns:
            # validate with the READ-path parser so an unparseable type (e.g.
            # array<char(5)> — Spark 4 refuses nested char in a schema) fails
            # HERE, not on every later read of an unreadable table
            try:
                _meta_parse_type(c[1])
            except Exception as ex:
                raise ValueError(f"column {c[0]!r}: unsupported type {c[1]!r}: {ex}") from ex
        for k in primary_key + partitioned_by:
            if k not in names:
                raise ValueError(f"key column {k!r} not in columns {names}")
        options = _canonical_options(options)
        _validate_table_options(
            names,
            primary_key,
            options,
            types={c[0]: c[1] for c in columns},
            partition_keys=partitioned_by,
        )
        fields = [
            Field(i, c[0], c[1], comment=(c[2] if len(c) > 2 else None))
            for i, c in enumerate(columns)
        ]
        schema = TableSchema(
            schema_id=0,
            fields=fields,
            primary_key=primary_key,
            partition_keys=partitioned_by,
            options=options,
            highest_field_id=len(fields) - 1,
        )
        self._write_schema(tdir, schema)
        os.makedirs(os.path.join(tdir, "snapshot"), exist_ok=True)
        os.makedirs(os.path.join(tdir, "data"), exist_ok=True)

    def drop_table(self, db: str, table: str) -> None:
        tdir = self._table_dir(db, table)
        if not os.path.exists(tdir):
            raise ValueError(f"table {db}.{table} does not exist")
        shutil.rmtree(tdir)

    def rename_table(self, db: str, table: str, new_table: str) -> None:
        src, dst = self._table_dir(db, table), self._table_dir(db, new_table)
        if not os.path.exists(src):
            raise ValueError(f"table {db}.{table} does not exist")
        if os.path.exists(dst):
            raise ValueError(f"table {db}.{new_table} already exists")
        os.replace(src, dst)

    # ------------------------------------------------------- schema history
    def _write_schema(self, tdir: str, schema: TableSchema) -> None:
        write_json_atomic(
            os.path.join(tdir, "schema", f"schema-{schema.schema_id}.json"), schema.to_json()
        )

    def _schema(self, tdir: str, schema_id: int) -> TableSchema:
        return TableSchema.from_json(
            read_json(os.path.join(tdir, "schema", f"schema-{schema_id}.json"))
        )

    def _latest_schema(self, tdir: str) -> TableSchema:
        ids = [
            int(os.path.basename(p)[len("schema-") : -len(".json")])
            for p in glob.glob(os.path.join(tdir, "schema", "schema-*.json"))
        ]
        if not ids:
            raise ValueError(f"not a table directory: {tdir}")
        return self._schema(tdir, max(ids))

    def schema_of(self, db: str, table: str) -> TableSchema:
        return self._latest_schema(self._table_dir(db, table))

    def describe(self, db: str, table: str) -> list[tuple[str, str]]:
        s = self.schema_of(db, table)
        return [(f.name, f.type) for f in s.fields]

    # ---------------------------------------------------- schema evolution
    def add_column(
        self, db: str, table: str, name: str, type_ddl: str, comment: str | None = None
    ) -> None:
        tdir = self._table_dir(db, table)
        s = self._latest_schema(tdir)
        if any(f.name.lower() == name.lower() for f in s.fields):
            raise ValueError(f"column {name!r} already exists")
        _check_not_reserved(name)  # same reservation CREATE TABLE enforces
        # fail at DDL time on a type the READ-path parser rejects — a bad
        # string written into the schema JSON would otherwise brick every
        # subsequent read
        try:
            _meta_parse_type(type_ddl)
        except Exception as ex:
            raise ValueError(f"column {name!r}: unsupported type {type_ddl!r}: {ex}") from ex
        s.highest_field_id += 1
        s.fields.append(Field(s.highest_field_id, name, type_ddl, comment=comment))
        s.schema_id += 1
        self._write_schema(tdir, s)

    def rename_column(self, db: str, table: str, name: str, new_name: str) -> None:
        tdir = self._table_dir(db, table)
        s = self._latest_schema(tdir)
        if any(f.name.lower() == new_name.lower() for f in s.fields):
            raise ValueError(f"column {new_name!r} already exists")
        # renaming INTO a reserved name would let the write scaffolding
        # (merge columns, the curve-clustering key, the index build's file
        # alias) silently overwrite the user's column — same guard as CREATE
        _check_not_reserved(new_name)
        f = s.field_by_name(name)
        if f.name in s.primary_key or f.name in s.partition_keys:
            s.primary_key = [new_name if k == f.name else k for k in s.primary_key]
            s.partition_keys = [new_name if k == f.name else k for k in s.partition_keys]
        for single in ("bucket_key", "sequence_field", "rowkind_field"):
            # single-column options follow the rename — a stale sequence_field
            # or rowkind_field would silently break every later merge/write
            if s.options.get(single) == f.name:
                s.options[single] = new_name
        for opt in (
            "file_index_bloom_filter_columns",
            "file_index_bitmap_columns",
            "clustering_columns",
        ):
            cols = _split_cols(s.options.get(opt))
            if f.name in cols:
                # column-list options follow the rename (sidecar entries are
                # keyed by field id, so existing indexes keep working; a stale
                # clustering list would brick every subsequent insert)
                s.options[opt] = ",".join(new_name if c == f.name else c for c in cols)
        for pre, suf in (("fields.", ".aggregate-function"), ("fields_", "_aggregate_function")):
            # structured aggregate keys are ADDRESSED BY column name — a
            # rename must move the key or the aggregation engine silently
            # stops combining the renamed column
            old_key = f"{pre}{f.name}{suf}"
            if old_key in s.options:
                s.options[f"{pre}{new_name}{suf}"] = s.options.pop(old_key)
        f.name = new_name  # field id unchanged — old files remain readable
        s.schema_id += 1
        self._write_schema(tdir, s)

    def drop_column(self, db: str, table: str, name: str) -> None:
        tdir = self._table_dir(db, table)
        s = self._latest_schema(tdir)
        f = s.field_by_name(name)
        if f.name in s.primary_key or f.name in s.partition_keys:
            raise ValueError(f"cannot drop key column {name!r}")
        for single in ("bucket_key", "sequence_field", "rowkind_field"):
            if s.options.get(single) == f.name:
                raise ValueError(f"cannot drop {single} column {name!r}")
        for opt in (
            "file_index_bloom_filter_columns",
            "file_index_bitmap_columns",
            "clustering_columns",
        ):
            if f.name in _split_cols(s.options.get(opt)):
                # dropping a column an option still names would brick every
                # later write/build that resolves the list
                raise ValueError(
                    f"cannot drop column {name!r} while the {opt} option names "
                    "it; update the option first"
                )
        for pre, suf in (("fields.", ".aggregate-function"), ("fields_", "_aggregate_function")):
            # the aggregate spec dies with its column (leaving it would poison
            # the next set_options validation with an unknown-column error)
            s.options.pop(f"{pre}{f.name}{suf}", None)
        s.fields = [x for x in s.fields if x.id != f.id]
        s.schema_id += 1
        self._write_schema(tdir, s)

    def set_options(self, db: str, table: str, options: dict[str, str]) -> None:
        tdir = self._table_dir(db, table)
        s = self._latest_schema(tdir)
        incoming = _canonical_options(options)
        was_dv = s.options.get("deletion_vectors_enabled", "").strip().lower() == "true"
        now_dv = incoming.get("deletion_vectors_enabled", "").strip().lower()
        if now_dv and (now_dv == "true") != was_dv and self._latest_snapshot(tdir) is not None:
            # DV mode cannot flip on a table with history, in EITHER
            # direction: turning it ON leaves already-committed superseded
            # rows unmarked (the merge-free read would resurrect them);
            # turning it OFF hands the files to merge-on-read, which knows
            # nothing about the DV index — every vector-deleted row (deletes
            # are pure metadata, no -D data row exists) would reappear.
            raise ValueError(
                "deletion-vectors.enabled cannot be toggled on a table with "
                "existing snapshots (history written under one mode is "
                "unreadable under the other); recreate the table instead"
            )
        s.options.update(incoming)
        _validate_table_options(
            [f.name for f in s.fields],
            s.primary_key,
            s.options,
            types={f.name: f.type for f in s.fields},
            partition_keys=s.partition_keys,
        )
        s.schema_id += 1
        self._write_schema(tdir, s)

    # -------------------------------------------------------------- commits
    def _snapshots(self, tdir: str) -> list[Snapshot]:
        # module-level in metadata.py since r8: the manifest-driven streaming
        # source's driver worker (a separate Python process, no session)
        # plans from the same resolution
        return load_snapshots(tdir)

    def _publish_snapshot(
        self, tdir: str, snap: Snapshot, new_files: list[dict], base_manifests: list[str]
    ) -> None:
        """Commit point: write ONE delta manifest with this commit's files,
        then the snapshot JSON referencing ``base_manifests + [it]``.

        The exclusive snapshot write is the atomic publish (loser of a
        concurrent race gets CommitConflictError and retries); the manifest
        name carries a per-attempt nonce so racing writers at the same
        version never clobber each other's manifest before one wins."""
        import uuid

        os.makedirs(os.path.join(tdir, "manifest"), exist_ok=True)
        mname = f"manifest-{snap.snapshot_id}-{uuid.uuid4().hex[:8]}.json"
        mpath = os.path.join(tdir, "manifest", mname)
        write_json_atomic(mpath, {"files": new_files})
        snap.manifests = [*base_manifests, mname]
        try:
            write_json_atomic(
                os.path.join(tdir, "snapshot", f"snapshot-{snap.snapshot_id}.json"),
                snap.to_json(),
                exclusive=True,
            )
        except CommitConflictError:
            if os.path.exists(mpath):  # don't leak the loser's manifest
                os.remove(mpath)
            raise
        write_json_atomic(
            os.path.join(tdir, "snapshot", "LATEST"), {"snapshot_id": snap.snapshot_id}
        )

    def _gc_manifests(self, tdir: str) -> None:
        """Delete manifest files no remaining snapshot references.

        Only manifests at versions <= the newest surviving snapshot are
        eligible: a concurrent committer writes its manifest (at latest+1)
        BEFORE publishing its snapshot, and GC'ing that window would corrupt
        the winning commit."""
        snaps = self._snapshots(tdir)
        live = {m for s in snaps for m in s.manifests}
        horizon = snaps[-1].snapshot_id if snaps else 0
        for p in glob.glob(os.path.join(tdir, "manifest", "manifest-*.json")):
            name = os.path.basename(p)
            m = re.match(r"manifest-(\d+)-", name)
            in_flight = m is None or int(m.group(1)) > horizon
            if name not in live and not in_flight:
                os.remove(p)

    def _latest_snapshot(self, tdir: str) -> Snapshot | None:
        snaps = self._snapshots(tdir)
        return snaps[-1] if snaps else None

    def latest_snapshot_id(self, db: str, table: str) -> int:
        """The current tip snapshot id (0 for an empty table) — the position
        a consumer checkpoints after fully processing the table's backlog
        (metadata-only: one snapshot-dir listing, no data read)."""
        snap = self._latest_snapshot(self._table_dir(db, table))
        return snap.snapshot_id if snap else 0

    @staticmethod
    def _staging_dir(tdir: str, version: int, stale_after_s: int = 24 * 3600) -> str:
        """Fresh per-attempt staging path. The nonce keeps concurrent
        writers racing on one version from colliding on errorifexists, and
        a crashed writer's leftovers never block the version — instead they
        are garbage-collected here once older than ``stale_after_s`` (no
        live writer holds a staging dir for a day)."""
        now = time.time()
        for old in glob.glob(os.path.join(tdir, ".staging-*")):
            try:
                if now - os.path.getmtime(old) > stale_after_s:
                    shutil.rmtree(old, ignore_errors=True)
            except OSError:
                pass
        return os.path.join(tdir, f".staging-c{version}-{uuid.uuid4().hex[:8]}")

    def _finalize_commit(self, tdir: str, staging: str, version: int, ext: str) -> list[str]:
        """Move one commit's staged output into the table's data layout:
        ``data/<partition dirs>/c<version>-<filename>``.

        Partition dirs stay LAST (standard hive layout) so Catalyst's
        directory inference — and with it listing-level partition pruning —
        works for any mix of commits in one scan; the commit id lives in the
        FILE NAME, not a directory. The per-file rename is the commit's
        driver-side finalization (the same move Spark's own file committer
        performs); data bytes are written once, by executors, in parallel."""
        final: list[str] = []
        for p in glob.glob(os.path.join(staging, "**", f"*.{ext}"), recursive=True):
            rel_dir = os.path.relpath(os.path.dirname(p), staging)
            if "_bucket=" in rel_dir:
                # dynamic-bucket writes stage through a hive `_bucket=N`
                # partitionBy column; the final layout uses Paimon's plain
                # `bucket-N` directory instead — a non-k=v segment, so
                # Catalyst's partition inference never surfaces a _bucket
                # column to readers (it only parses k=v dirs)
                rel_dir = os.sep.join(
                    f"bucket-{seg.split('=', 1)[1]}" if seg.startswith("_bucket=") else seg
                    for seg in rel_dir.split(os.sep)
                )
            dest_dir = os.path.join(tdir, "data") if rel_dir == "." else os.path.join(
                tdir, "data", rel_dir
            )
            os.makedirs(dest_dir, exist_ok=True)
            dest = os.path.join(dest_dir, f"c{version}-{os.path.basename(p)}")
            os.replace(p, dest)
            final.append(dest)
        shutil.rmtree(staging)
        return final

    def _write_avro_fallback(self, out: DataFrame, staging: str, schema: TableSchema) -> dict[str, int]:
        """AVRO write without the spark-avro module: ``mapInArrow`` tasks
        encode standard Avro object container files (``formats/avro_ocf``,
        null codec — readable by any stock Avro reader) straight into the
        staging dir, one file per (task, hive partition dir), named
        ``part-<task>-...`` so bucket recording keeps working. Partition
        values are hive-escaped exactly as the read side's two-layer
        url-decode expects. Correctness fallback, not a speed path —
        per-row Python encode; the JVM writer is preferred when present."""
        from incubator_paimon_trino_spark.formats.avro_ocf import (
            OcfWriter,
            encode_batch,
            record_schema,
        )

        part_keys = list(schema.partition_keys)
        ddl_of = {f.name: f.type for f in schema.fields}
        ddl_of[SEQ_COL], ddl_of[KIND_COL] = "bigint", "string"
        avro_fields = [(c, ddl_of[c]) for c in out.columns if c not in part_keys]
        aschema = record_schema(avro_fields)
        hive_null = _HIVE_NULL

        def write_task(batches):
            # Task side of a v1-committer-style protocol (the JVM writers
            # get this from the Hadoop output committer; mapInArrow has
            # none): each task ATTEMPT writes everything under a private
            # .attempt-<id> dir and only REPORTS its finished files — the
            # DRIVER promotes exactly the files of the one successful
            # attempt per partition that collect() returns. A crashed /
            # failed / speculative-loser attempt leaves only its private
            # dir (swept below); a crash mid-iterator can never surface a
            # truncated or duplicate committed file, and there is no
            # partial-promotion window at all.
            import os as _os
            import urllib.parse as _up
            import uuid as _uuid

            import pyarrow as pa
            from pyspark import TaskContext

            ctx = TaskContext.get()
            tid = ctx.partitionId()
            att = ctx.taskAttemptId()
            tmp = _os.path.join(staging, f".attempt-{att}")
            writers: dict[tuple, tuple] = {}
            avro_names = [c for c, _ in avro_fields]

            def writer_for(key):
                w = writers.get(key)
                if w is None:
                    segs = [
                        f"{k}={hive_null if v is None else _up.quote(str(v), safe='')}"
                        for k, v in zip(part_keys, key)
                    ]
                    name = f"part-{tid:05d}-{_uuid.uuid4().hex}.c000.avro"
                    _os.makedirs(_os.path.join(tmp, *segs), exist_ok=True)
                    fh = open(_os.path.join(tmp, *segs, name), "wb")
                    w = writers[key] = (fh, OcfWriter(fh, aschema), segs, name)
                return w

            for batch in batches:
                # split by hive partition tuple (order-preserving take), then
                # encode each slice as one numpy-vectorized block run; the
                # per-row closure path remains for nested-typed schemas
                if part_keys:
                    keys = list(zip(*(batch.column(k).to_pylist() for k in part_keys)))
                    by_key: dict[tuple, list] = {}
                    for i, k in enumerate(keys):
                        by_key.setdefault(k, []).append(i)
                    groups = [(k, batch.take(idxs)) for k, idxs in by_key.items()]
                else:
                    groups = [((), batch)]
                for key, sub in groups:
                    w = writer_for(key)
                    enc = encode_batch(sub.select(avro_names), aschema)
                    if enc is not None:
                        w[1].write_encoded(*enc)
                    else:
                        for row in sub.to_pylist():
                            w[1].write(row)
            rels, rows_per = [], []
            for fh, ocf, segs, name in writers.values():
                ocf.close()
                fh.close()
                rels.append("/".join(list(segs) + [name]))
                rows_per.append(ocf.count_written)
            yield pa.record_batch(
                {
                    "attempt": pa.array([att] * len(rels), type=pa.int64()),
                    "rel": pa.array(rels, type=pa.string()),
                    "rows": pa.array(rows_per, type=pa.int64()),
                }
            )

        os.makedirs(staging, exist_ok=True)
        reported = out.mapInArrow(
            write_task, "attempt bigint, rel string, rows bigint"
        ).collect()
        counts: dict[str, int] = {}
        for r in reported:  # driver-side commit: promote ONLY reported files
            segs = r["rel"].split("/")
            dest_dir = os.path.join(staging, *segs[:-1]) if len(segs) > 1 else staging
            os.makedirs(dest_dir, exist_ok=True)
            os.replace(
                os.path.join(staging, f".attempt-{r['attempt']}", *segs),
                os.path.join(dest_dir, segs[-1]),
            )
            counts[segs[-1]] = r["rows"]
        # sweep losers'/failed attempts' private dirs before finalize globs
        for d in glob.glob(os.path.join(staging, ".attempt-*")):
            shutil.rmtree(d, ignore_errors=True)
        return counts

    def _read_avro_fallback(self, paths: list[str], old: TableSchema, is_pk: bool) -> DataFrame:
        """Batch-read avro data files without the spark-avro module, via the
        ``paimon_avro`` Python DataSource (``formats/avro_batch``): one
        Arrow-decode task per file, hive partition values injected from the
        path (what ``basePath`` directory inference does for native
        readers). Output columns are the WRITING schema's names/storage
        types — ``_read_files`` maps them by field id like any format."""
        import json as _json

        from incubator_paimon_trino_spark.catalog.scan import partition_values
        from incubator_paimon_trino_spark.formats.avro_batch import (
            PaimonAvroBatchSource,
        )
        from incubator_paimon_trino_spark.streaming.manifest_source import (
            _storage_ddl,
        )

        self.spark.dataSource.register(PaimonAvroBatchSource)
        part = set(old.partition_keys)
        data_fields = [
            (f.name, _storage_ddl(f.type)) for f in old.fields if f.name not in part
        ]
        if is_pk:
            data_fields += [(SEQ_COL, "bigint"), (KIND_COL, "string")]
        part_fields = [
            (f.name, _storage_ddl(f.type)) for f in old.fields if f.name in part
        ]
        # bin-pack small files into read tasks (~64 MiB) — one Python task
        # per tiny file would make startup dominate many-small-file tables
        target = 64 * 1024 * 1024
        tasks: list[list[dict]] = []
        size = 0
        for p in sorted(paths):
            spec = {
                "path": p,
                "parts": [
                    (k, ddl, partition_values(p).get(k)) for k, ddl in part_fields
                ],
            }
            sz = os.path.getsize(p) if os.path.exists(p) else target
            if not tasks or size + sz > target:
                tasks.append([spec])
                size = sz
            else:
                tasks[-1].append(spec)
                size += sz
        ddl = ", ".join(f"`{n}` {t}" for n, t in data_fields + part_fields)
        return (
            self.spark.read.format("paimon_avro")
            .option("schema_ddl", ddl)
            .option("data_fields", _json.dumps(data_fields))
            .option("part_fields", _json.dumps(part_fields))
            .option("files", _json.dumps(tasks))
            .load()
        )

    def _commit_files(
        self,
        tdir: str,
        paths: list[str],
        ext: str,
        schema: TableSchema,
        fallback_counts: dict[str, int] | None = None,
    ) -> list[dict]:
        """Manifest entries for the files one commit just wrote.

        Footer-only stats pass: row counts (no second execution of the input
        plan) + per-column min/max/null-count keyed by field id, the input
        to manifest-level file skipping at read time (catalog/scan.py).
        Avro has no pyarrow footer reader: counts come from the write tasks
        themselves when the OCF fallback wrote the files
        (``fallback_counts``, keyed by staged basename — finalize only
        prefixes ``c<version>-``), else one spark job counts rows per file
        (gated path; pruning simply never drops avro files).
        """
        avro_counts: dict[str, int] = {}
        if ext == "avro" and fallback_counts is not None:
            for p in paths:
                base = re.sub(r"^c\d+-", "", os.path.basename(p))
                c = fallback_counts.get(base)
                if c is None:  # unreported file: count it rather than crash
                    from incubator_paimon_trino_spark.formats.avro_ocf import (
                        count_records,
                    )

                    c = count_records(p)
                avro_counts[os.path.realpath(p)] = c
        elif ext == "avro" and paths:
            try:
                import urllib.parse as _up

                # input_file_name() returns a percent-encoded URI — unquote
                # it or any path needing encoding (spaces, hive-escaped
                # partition values) misses the realpath lookup → count 0
                avro_counts = {
                    os.path.realpath(_up.unquote(r.f.removeprefix("file:"))): r.asDict()["count"]
                    for r in self.spark.read.format("avro")
                    .load(paths)
                    .groupBy(F.input_file_name().alias("f"))
                    .count()
                    .collect()
                }
            except Exception as ex:
                if "Failed to find data source" not in str(ex):
                    raise
                # no spark-avro module: counts from OCF BLOCK HEADERS only
                # (no row decode — each block fronts its record count)
                from incubator_paimon_trino_spark.formats.avro_ocf import (
                    count_records,
                )

                avro_counts = {os.path.realpath(p): count_records(p) for p in paths}
        return [
            {
                "path": os.path.relpath(p, tdir),
                "schema_id": schema.schema_id,
                "format": ext,
                **collect_file_stats(
                    p, ext, schema, record_count=avro_counts.get(os.path.realpath(p))
                ),
            }
            for p in sorted(paths)
        ]

    def insert_into(
        self,
        db: str,
        table: str,
        df: DataFrame,
        overwrite: bool = False,
        row_kind: str | None = None,
    ) -> int:
        """Commit ``df`` as a new snapshot; returns the snapshot id.

        PK tables tag rows with ``(_seq, _row_kind)`` (FIXTURES.md F1):
        ``_seq`` = snapshot id (commit-level sequencing, like Paimon's default
        sequence number), ``_row_kind`` = 'I' or 'D' — either uniform via the
        ``row_kind`` argument or per-row via an existing ``_row_kind`` column.
        Executors write the parquet in parallel; the driver then commits the
        manifest with an atomic rename.
        """
        tdir = self._table_dir(db, table)
        schema = self._latest_schema(tdir)
        prev = self._latest_snapshot(tdir)
        version = (prev.snapshot_id if prev else 0) + 1

        expected = [f.name for f in schema.fields]
        have = list(df.columns)
        extra = [c for c in have if c not in expected + [KIND_COL]]
        missing = [c for c in expected if c not in have]
        if extra or missing:
            raise ValueError(f"schema mismatch: extra={extra} missing={missing} expected={expected}")
        out = df.select(*expected, *([KIND_COL] if KIND_COL in have else []))
        # CHAR(n) columns store the rtrimmed canonical form: CHAR comparison
        # treats trailing blanks as insignificant (the reference keeps CHAR a
        # distinct Trino type, TrinoTypeUtils.java:77-81), so canonical
        # storage makes plain equality, min/max file stats, and groupBy keys
        # all behave CHAR-correctly with zero read-time cost.
        for f_ in schema.fields:
            n_chars = char_length(f_.type)
            if n_chars is not None:
                # rtrim to canonical storage; values longer than the
                # declared length (after trim) are a type error, as in the
                # reference engine — raised executor-side mid-write
                trimmed = F.rtrim(F.col(f_.name))
                out = out.withColumn(
                    f_.name,
                    F.when(
                        trimmed.isNull() | (F.length(trimmed) <= n_chars), trimmed
                    ).otherwise(
                        F.raise_error(
                            F.concat(
                                F.lit(
                                    f"value too long for column {f_.name!r} "
                                    f"char({n_chars}): '"
                                ),
                                F.col(f_.name),
                                F.lit("'"),
                            )
                        )
                    ),
                )
            tp = timestamp_precision(f_.type)
            if tp is not None and tp < 6:
                # declared-precision canonical storage (the CHAR-rtrim move
                # for the reference's TIMESTAMP ladder): a TIMESTAMP(0/3)
                # column never stores — so never surfaces — sub-precision
                # digits, and footer stats/predicates see the same values.
                # date_trunc returns session-TZ TimestampType; with the
                # session pinned to UTC the ntz round-trip is value-exact.
                unit = "SECOND" if tp == 0 else "MILLISECOND"
                out = out.withColumn(
                    f_.name,
                    F.date_trunc(unit, F.col(f_.name)).cast("timestamp_ntz"),
                )

        if schema.primary_key:
            rk_field = schema.options.get("rowkind_field")
            if rk_field and KIND_COL not in out.columns and row_kind is None:
                # rowkind.field (Paimon CoreOption): the row kind comes from a
                # DATA column's CDC literal — +I/I/+U keep the row, -D deletes
                # it — so raw CDC feeds ingest without a synthetic _row_kind
                # column. UPDATE_BEFORE (-U) images are DROPPED at ingestion
                # (the upsert-sink convention): a DataFrame is unordered, so a
                # -U/+U pair for one key in one batch has no arrival order —
                # treating -U as a delete would let the commit-level
                # delete-last tie-break erase the key the paired +U upserts.
                # The +U alone IS the state change under latest-wins merging.
                # The column itself stays stored as data; an unknown literal
                # fails the write loudly, executor-side.
                lit = F.upper(F.trim(F.col(rk_field)))
                out = out.filter(
                    lit.isNull() | ~lit.isin("-U", "UPDATE_BEFORE")
                ).withColumn(
                    KIND_COL,
                    F.when(lit.isin("+I", "I", "INSERT", "+U", "UPDATE_AFTER"), F.lit("I"))
                    .when(lit.isin("-D", "D", "DELETE"), F.lit("D"))
                    .otherwise(
                        F.raise_error(
                            F.concat(
                                F.lit(f"invalid rowkind in column {rk_field!r}: '"),
                                F.coalesce(F.col(rk_field), F.lit("NULL")),
                                F.lit("' (use +I/-D/+U/-U)"),
                            )
                        )
                    ),
                )
            if KIND_COL not in out.columns:
                out = out.withColumn(KIND_COL, F.lit(row_kind or "I"))
            # sequence_field (Paimon CoreOption, surfaced through the
            # reference's DDL property reflection): merge order comes from a
            # USER column — out-of-order ingestion (e.g. CDC with event
            # timestamps) merges by business time, not arrival time. Default
            # stays commit-id sequencing.
            out = out.withColumn(SEQ_COL, _sequence_expr(schema, version))
            # count field-aggregates store PARTIAL counts (0/1 per raw row):
            # merge sums partials, so compaction's materialized totals stay
            # additive under later merges instead of collapsing back to 1.
            if schema.options.get("merge_engine") == "aggregation":
                for c, func in _field_aggregate_specs(schema.options).items():
                    if func == "count":
                        ftype = schema.field_by_name(c).type
                        # only RAW +I rows re-partial to 0/1: a -D retraction
                        # row carries the accumulated total it must subtract
                        # wholesale (delete_where writes the merged row back
                        # as -D) — re-partialing it would retract only 1
                        out = out.withColumn(
                            c,
                            F.when(F.col(KIND_COL) == "D", F.col(c))
                            .otherwise(
                                F.when(F.col(c).isNotNull(), F.lit(1)).otherwise(F.lit(0))
                            )
                            .cast(ftype),
                        )
            # ignore-delete (Paimon CoreOption): -D records are DISCARDED at
            # write time — they never enter the changelog, so merge engines
            # that reject retraction (first-row) accept raw CDC feeds, and
            # $audit/streams consistently never see the dropped deletes.
            # delete_where refuses loudly instead of no-opping (below).
            if schema.options.get("ignore_delete", "").strip().lower() == "true":
                out = out.filter(F.col(KIND_COL) != "D")
        elif KIND_COL in out.columns or row_kind not in (None, "I"):
            raise ValueError("row kinds require a primary-key table")

        #: (index name, newly marked, cumulative marks, files written) —
        #: set for every DV-table commit; None on non-DV tables.
        dv_index: tuple[str, int, int, list[str]] | None = None
        dv_cached: DataFrame | None = None
        if self._dv_enabled(schema):
            pk = schema.primary_key
            # the batch plan feeds four actions on this path (duplicate-key
            # probe, mark-scan join, emptiness probe, physical write) and for
            # UPDATE/DELETE it is itself a full merged read — persist so it
            # materializes once (unpersisted after the write; a write-time
            # exception leaves one LRU-evictable entry behind, never growth)
            out = out.persist()
            dv_cached = out
            try:
                # DV mode has no read-time merge to disambiguate two versions
                # of one key inside a single commit — reject duplicates
                # loudly instead of writing a file whose extra version can
                # never be marked (Paimon's writer dedups in its LSM
                # memtable; a batch DataFrame has no arrival order).
                dup = (
                    out.filter(F.col(KIND_COL) != "D")
                    .groupBy(*pk)
                    .count()
                    .filter(F.col("count") > 1)
                    .limit(1)
                    .collect()
                )
                if dup:
                    raise ValueError(
                        "deletion-vectors table: batch carries multiple insert "
                        f"rows for one primary key (e.g. {dict(zip(pk, dup[0][:len(pk)]))}); "
                        "pre-merge the batch to one row per key"
                    )
                if not overwrite and prev is not None and prev.files:
                    dv_index = self._dv_build(tdir, schema, prev, out, version)
                else:
                    name = self._dv_write_inline(tdir, version, {})
                    dv_index = (name, 0, 0, [name])
            except BaseException:
                dv_cached.unpersist()
                raise
            # F1 tie-break (+I and -D of one key in one commit → deleted):
            # the delete also cancels the batch's own insert. -D rows are
            # then dropped from the physical write — a DV table records
            # deletion ONLY as vectors, never as -D data rows (which also
            # means changelog readers of a DV table see inserts only).
            d_keys = out.filter(F.col(KIND_COL) == "D").select(*pk).dropDuplicates()
            out = out.filter(F.col(KIND_COL) != "D").join(d_keys, pk, "left_anti")

        # bucketing (reference options bucket/bucket_key — A16): hash-
        # repartition on the bucket key so each commit writes exactly
        # `bucket` files per partition, co-locating equal keys. Joins between
        # two tables bucketed the same way then shuffle far less data (and
        # with storage-partitioned-join-aware readers, not at all).
        n_buckets = int(schema.options.get("bucket", "0") or 0)
        bucket_key = schema.options.get("bucket_key") or (
            schema.primary_key[0] if schema.primary_key else None
        )
        dyn_index_delta: str | None = None
        if n_buckets > 0 and bucket_key:
            out = out.repartition(n_buckets, F.col(bucket_key))
        elif n_buckets == -1:
            # dynamic bucket mode (bucket = -1): stable key→bucket from the
            # maintained index, new keys fill buckets up to target-row-num
            out, dyn_index_delta = self._dynamic_bucket_assign(tdir, schema, out, version)
            out = out.repartition(F.col("_bucket"))
        elif schema.options.get("clustering_columns"):
            # clustering.columns (Paimon append-table clustering): range-
            # partition + sort the commit on the clustering key so each file
            # covers a NARROW key range — manifest min/max skipping then
            # prunes point/range predicates to a handful of files instead of
            # every file overlapping the whole domain. The range exchange is
            # per-commit and sampling-based (Spark's RangePartitioner), so
            # cost stays proportional to the commit, not the table.
            cluster_cols = _split_cols(schema.options["clustering_columns"])
            for c in cluster_cols:
                if c not in expected:
                    raise ValueError(f"clustering column {c!r} not a table column")
            # clustering_partitions pins the range-bucket count (file count
            # per commit); default lets Spark/AQE size buckets by volume —
            # right at scale, but a tiny commit then collapses to one file
            # and min/max pruning has nothing to skip.
            n_ranges = int(schema.options.get("clustering_partitions", "0") or 0)
            w_strategy = schema.options.get("clustering_strategy", "").strip().lower()
            if w_strategy in ("zorder", "hilbert"):
                # curve-keyed write clustering: every commit's files become
                # tight boxes in ALL clustering dimensions (same key as the
                # matching compaction strategy; the commit-local min/max agg
                # costs one scalar job over the commit, not the table)
                key_of = self._zorder_expr if w_strategy == "zorder" else self._hilbert_expr
                zc = "_zorder_key"
                out = out.withColumn(zc, key_of(out, schema, cluster_cols))
                out = (
                    out.repartitionByRange(n_ranges, F.col(zc))
                    if n_ranges > 0
                    else out.repartitionByRange(F.col(zc))
                )
                out = out.sortWithinPartitions(zc).drop(zc)
            else:
                range_cols = [F.col(c) for c in cluster_cols]
                out = (
                    out.repartitionByRange(n_ranges, *range_cols)
                    if n_ranges > 0
                    else out.repartitionByRange(*range_cols)
                )
                out = out.sortWithinPartitions(*cluster_cols)

        fmt = schema.options.get("file_format", "PARQUET").upper()
        if fmt not in ("ORC", "PARQUET", "AVRO"):
            raise ValueError(f"unsupported file_format {fmt!r} (have PARQUET, ORC, AVRO)")
        ext = {"ORC": "orc", "AVRO": "avro", "PARQUET": "parquet"}[fmt]
        if dv_index is not None and out.isEmpty():
            # pure-DV commit (a DELETE with nothing to insert): the snapshot
            # is metadata only — writing an empty part file would add a
            # zero-row data file per delete forever
            final_paths, new_files = [], []
        else:
            staging = self._staging_dir(tdir, version)
            fb_counts: dict[str, int] | None = None
            writer = out.write.mode("errorifexists")
            part_cols = list(schema.partition_keys)
            if "_bucket" in out.columns:
                # dynamic bucket: the bucket id rides as the INNERMOST hive
                # partitionBy layer; _finalize_commit renames `_bucket=N` to
                # Paimon's plain `bucket-N` so readers never see the column
                part_cols.append("_bucket")
            if part_cols:
                writer = writer.partitionBy(*part_cols)
            if fmt == "ORC":
                writer.orc(staging)
            elif fmt == "PARQUET":
                writer.parquet(staging)
            else:
                # Paimon's third file format (FileFormatType —
                # TrinoTableOptionUtils.java:96,111-112). Spark's avro data
                # source is an external module; when absent, fall back to
                # the pure-Python OCF writer (formats/avro_ocf.py — r9,
                # closing the last format gap) — executors encode standard
                # Avro container files, one per (task, partition dir).
                try:
                    writer.format("avro").save(staging)
                except Exception as ex:  # AnalysisException: Failed to find data source
                    if "Failed to find data source" not in str(ex):
                        raise
                    fb_counts = self._write_avro_fallback(out, staging, schema)
            final_paths = self._finalize_commit(tdir, staging, version, ext)
            new_files = self._commit_files(tdir, final_paths, ext, schema, fb_counts)
            # file-index sidecars (bloom / bitmap) for the new files, BEFORE
            # the publish below — a reader must never resolve a snapshot whose
            # sidecars are still being written (missing sidecar = file kept,
            # so it would only lose skipping, but build-then-publish keeps the
            # invariant simple). A crash here leaves finalized-but-unpublished
            # files + sidecars: remove_orphan_files debris, as before.
            build_file_indexes(self.spark, final_paths, schema)
        if dv_cached is not None:
            dv_cached.unpersist()
        if n_buckets > 0 and bucket_key:
            _record_buckets(new_files, schema, bucket_key, n_buckets)
        elif n_buckets == -1:
            _record_dynamic_buckets(new_files)
        n = sum(e["record_count"] for e in new_files)
        fresh = overwrite or prev is None
        files = new_files if fresh else prev.files + new_files
        base_manifests = [] if fresh else list(prev.manifests)
        if not fresh and prev.files and not prev.manifests:
            # legacy snapshot with inline files: fold them into this commit's
            # manifest so the delta chain is complete from here on
            new_files = prev.files + new_files
        snap = Snapshot(
            snapshot_id=version,
            schema_id=schema.schema_id,
            commit_user=self.commit_user,
            commit_identifier=version,
            commit_kind=COMMIT_OVERWRITE if overwrite else COMMIT_APPEND,
            timestamp_ms=int(time.time() * 1000),
            files=files,
            record_count=(0 if overwrite else (prev.record_count if prev else 0))
            + n
            - (dv_index[1] if dv_index else 0),
        )
        if dv_index is not None:
            # the index landed BEFORE this publish (inside _dv_build) — a
            # reader must never resolve snapshot N without its deletions
            snap.dv = dv_index[0]
            snap.dv_marks = dv_index[2]
        # exclusive publish = the commit point: if a concurrent writer already
        # produced this snapshot id, fail with CommitConflictError rather
        # than clobbering their manifest (caller re-reads and retries, like
        # Paimon's optimistic commit loop). The loser's data files must not
        # linger in data/ — they're unreferenced by any manifest, but the
        # streaming reader globs the directory and would see them.
        try:
            self._publish_snapshot(tdir, snap, new_files, base_manifests)
        except CommitConflictError:
            for p in final_paths:
                if os.path.exists(p):
                    os.remove(p)
                _rm_sidecar(p)
            if dv_index is not None:
                # remove every index file THIS commit wrote (manifest +
                # new shards); carried-forward shards belong to the winner
                for idx_name in dv_index[3]:
                    try:
                        os.remove(os.path.join(tdir, "index", idx_name))
                    except FileNotFoundError:
                        pass
            if dyn_index_delta is not None:
                # the loser's key→bucket assignments must not linger: the
                # winner (or the retry) re-assigns with ITS view of the
                # index, and two deltas for one key would race the lookup
                shutil.rmtree(dyn_index_delta, ignore_errors=True)
            self._prune_empty_dirs(os.path.join(tdir, "data"))
            raise

        # Post-commit maintenance driven by CoreOptions the reference
        # surfaces as DDL properties (TrinoTableOptionUtils.java:51-135) —
        # executable here, not just stored:
        # full-compaction.delta-commits: rewrite the live set every N commits
        # (bounds file count and manifest-chain length without manual ops).
        # Maintenance is BEST-EFFORT: the insert above already committed, so
        # a maintenance-time conflict (concurrent writer won the next
        # version) must not surface as a failure of a succeeded commit —
        # the next commit simply triggers it again.
        delta_commits = int(schema.options.get("full_compaction_delta_commits", "0") or 0)
        if delta_commits > 0 and version % delta_commits == 0:
            # side effect only: the return value stays the id of the commit
            # that wrote ``df`` (callers tag it / read_incremental around it);
            # surfacing the compaction snapshot here would hand them a
            # full-rewrite COMPACT delta instead of their insert.
            try:
                self.compact(db, table)
            except CommitConflictError:
                pass
        # snapshot.num-retained.max: cap history length at commit time
        # (Paimon's automatic expiration), keeping tagged snapshots.
        # Best-effort like compaction above: two concurrent committers can
        # race on overlapping doomed sets, and a maintenance OSError must
        # not surface as a failure of the ALREADY-SUCCEEDED insert (the
        # caller's retry loop would double-write the data).
        retained = int(schema.options.get("snapshot_num_retained_max", "0") or 0)
        if retained > 0:
            try:
                self.expire_snapshots(db, table, keep_last=retained)
            except OSError:
                pass
        # snapshot.time-retained: the AGE dimension of Paimon's automatic
        # expiration — history older than the window expires at commit time,
        # with snapshot.num-retained.min as the retention floor (default 1:
        # the live snapshot always survives). Same best-effort contract.
        window = schema.options.get("snapshot_time_retained")
        if window:
            floor = int(schema.options.get("snapshot_num_retained_min", "1") or 1)
            try:
                self.expire_snapshots(
                    db,
                    table,
                    keep_last=max(1, floor),
                    older_than_ms=int(time.time() * 1000 - _parse_duration_ms(window)),
                )
            except OSError:
                pass
        # partition.expiration-time: Paimon's commit-time partition
        # retention — partitions older than now − window leave the live set
        # in a metadata-only follow-up commit. Same best-effort contract
        # (a conflicting concurrent committer simply triggers it again).
        p_window = schema.options.get("partition_expiration_time")
        if p_window and schema.partition_keys:
            try:
                self.expire_partitions(db, table, expiration_time=p_window)
            except (OSError, CommitConflictError):
                pass
        # tag.automatic-creation = process-time (Paimon's auto tags): the
        # FIRST commit of each creation period names its snapshot after the
        # period start ('2026-08-16' daily / '2026-08-16 14' hourly), giving
        # retention-proof daily/hourly savepoints with zero operator action.
        # Best-effort; later commits in the same period see the tag exists.
        if schema.options.get("tag_automatic_creation", "").strip().lower() == "process-time":
            period = schema.options.get("tag_creation_period", "daily").strip().lower()
            now = _dt.datetime.now(_dt.timezone.utc)
            name = now.strftime("%Y-%m-%d") if period == "daily" else now.strftime("%Y-%m-%d %H")
            if name not in self._tags(tdir):
                try:
                    self.create_tag(db, table, name, snapshot_id=version)
                except (OSError, ValueError):
                    pass  # concurrent committer tagged this period first
        return version

    def insert_with_retries(
        self,
        db: str,
        table: str,
        df: DataFrame,
        max_retries: int = 3,
        **kwargs,
    ) -> int:
        """Paimon's optimistic commit loop: re-run the write on a snapshot-id
        race. Each attempt re-reads the latest snapshot, so the retry commits
        on top of the concurrent winner (data is re-written — file names
        embed the commit id, so a stale attempt's files can't be adopted)."""
        attempt = 0
        while True:
            try:
                return self.insert_into(db, table, df, **kwargs)
            except CommitConflictError:
                attempt += 1
                if attempt > max_retries:
                    raise

    def delete_where(self, db: str, table: str, condition) -> int:
        """DELETE: -D changelog rows for matching keys on PK tables; on
        append tables, a partition-scoped predicate drops whole partitions
        as one metadata-only commit (``drop_partitions``).

        The reference has no DELETE (negative finding, SURVEY §2.A) — data
        changes arrive via external writers. We go further: a delete is just
        an anti-commit, merged away at read time.
        """
        schema = self.schema_of(db, table)
        if not schema.primary_key:
            # append tables: partition-predicate DELETE drops whole
            # partitions metadata-only (drop_partitions validates the
            # predicate is partition-scoped and raises otherwise)
            stats = self.drop_partitions(db, table, condition)
            if stats["snapshot"] is not None:
                return stats["snapshot"]
            prev = self._latest_snapshot(self._table_dir(db, table))
            return prev.snapshot_id if prev else 0
        if schema.partition_keys and set(schema.partition_keys) <= set(schema.primary_key):
            # partition-drop FAST PATH for PK tables whose partition keys are
            # part of the key: every version of a key then lives in ONE
            # partition (the key pins the partition value), so dropping whole
            # partitions is exactly row deletion — metadata-only, no -D rows,
            # no retraction semantics involved (works on first-row /
            # unconfigured partial-update / ignore-delete tables too). A
            # predicate touching non-partition columns falls through to the
            # row-level -D path below.
            try:
                stats = self.drop_partitions(db, table, condition)
            except ValueError as ex:
                if "partition columns" not in str(ex):
                    raise
            else:
                if stats["snapshot"] is not None:
                    return stats["snapshot"]
                prev = self._latest_snapshot(self._table_dir(db, table))
                return prev.snapshot_id if prev else 0
        if schema.options.get("ignore_delete", "").strip().lower() == "true":
            # the write path would silently drop every -D row this DELETE
            # produces — a "successful" no-op; refuse instead
            raise ValueError(
                "DELETE is not supported on an ignore-delete table "
                "(ignore-delete discards -D records at write time)"
            )
        if schema.options.get("merge_engine") == "first-row":
            # first-row keeps the EARLIEST insert and ignores every later
            # row including retractions (merge_on_read filters -D out before
            # picking) — a "successful" DELETE would be a silent no-op, so
            # reject it, matching Paimon's first-row retraction rejection
            raise ValueError(
                "DELETE is not supported on first-row merge-engine tables "
                "(first-row ignores retractions; the key would remain visible)"
            )
        if schema.options.get("merge_engine") == "partial-update":
            # Paimon's partial-update delete contract: a -D needs one of the
            # three configured handlings, else every later READ would raise —
            # fail the DELETE itself instead of poisoning the table
            has_groups = bool(_sequence_group_specs(schema.options))
            rrod = (
                schema.options.get("partial_update_remove_record_on_delete", "")
                .strip()
                .lower()
                == "true"
            )
            if not has_groups and not rrod:
                raise ValueError(
                    "DELETE on a partial-update table requires 'ignore-delete', "
                    "'partial-update.remove-record-on-delete', or sequence groups "
                    "(the engine has no rule for what a bare delete outranks)"
                )
        # use_fallback=False on every internal physical/write read: fallback-
        # branch is a SCAN-TIME option (Paimon serves missing partitions from
        # the branch at read time only) — a DML/maintenance path that read
        # main ∪ fallback would commit the branch's rows as MAIN data files,
        # permanently shadowing later fallback updates.
        doomed = (
            self.read_table(f"{db}.{table}", pad_char=False, use_fallback=False)
            .filter(condition)
        )
        return self.insert_into(db, table, doomed, row_kind="D")

    def update_where(self, db: str, table: str, condition, assignments: dict) -> int:
        """UPDATE: upsert re-written rows for matching keys (PK tables only).

        ``assignments`` maps column name → Column expression (or literal).
        On a PK table an update is just a fresh +I commit — the deduplicate
        merge engine makes the higher-sequence row win at read time, so no
        read-modify-write of data files happens (the LSM way). The reference
        has no UPDATE at all (negative finding, SURVEY §2.A).
        """
        schema = self.schema_of(db, table)
        if not schema.primary_key:
            raise ValueError("update_where requires a primary-key table")
        bad = set(assignments) & set(schema.primary_key)
        if bad:
            raise ValueError(f"cannot update primary-key columns {sorted(bad)}")
        seq_field = schema.options.get("sequence_field")
        if seq_field and seq_field not in assignments:
            # with a sequence_field, merge order is the BUSINESS column: a
            # rewritten row carrying the same sequence value ties with the
            # row it replaces and max_by picks arbitrarily — the update
            # could silently not apply. Make the caller advance it.
            raise ValueError(
                f"UPDATE on a sequence_field table must assign a new value to "
                f"{seq_field!r} (merge order is the sequence column; an equal "
                "value ties with the old row nondeterministically)"
            )
        if schema.options.get("merge_engine") == "first-row":
            raise ValueError(
                "UPDATE is not supported on first-row merge-engine tables "
                "(the earliest insert wins; the rewritten row would be ignored)"
            )
        # use_fallback=False: scan-time option, see delete_where
        updated = (
            self.read_table(f"{db}.{table}", pad_char=False, use_fallback=False)
            .filter(condition)
        )
        for col, expr in assignments.items():
            if col not in [f.name for f in schema.fields]:
                raise ValueError(f"unknown column {col!r}")
            updated = updated.withColumn(col, expr if isinstance(expr, Column) else F.lit(expr))
        # explicit kind: an UPDATE rewrites matched rows as upserts — it must
        # never re-derive kinds from a rowkind.field data column (stored op
        # values are feed history, and a stored '-D' would turn the update
        # into a silent delete; a NULL would crash the write)
        return self.insert_into(db, table, updated, row_kind="I")

    def merge_into(
        self,
        db: str,
        table: str,
        source: DataFrame,
        on: list[str],
        when_matched: str | None = "update",
        when_not_matched: str | None = "insert",
    ) -> int:
        """MERGE INTO (Delta/Iceberg-style upsert) in ONE atomic commit.

        - ``when_matched="update"``: source row replaces the target row
          (full-row upsert — the new +I outranks the old sequence).
        - ``when_matched="delete"``: matching target keys get -D rows.
        - ``when_not_matched="insert"``: source rows with no target match
          become +I rows.

        All clauses land in a single snapshot via per-row ``_row_kind``, so
        readers see the merge atomically (time travel shows before/after,
        never a half-merge). Trino's Paimon connector has no MERGE (the
        engine-level write tests are skipped —
        ``TestTrinoDistributedQuery.java:69-77``); this is capability beyond
        the reference, matching Paimon's own Spark writer surface.

        Scale: the matched/not-matched split is one left join of source
        against the merged target keys — target keys project to the PK
        columns only, so the join input is narrow; with a broadcast-sized
        source the fact table never shuffles.
        """
        schema = self.schema_of(db, table)
        if not schema.primary_key:
            raise ValueError("merge_into requires a primary-key table")
        if sorted(on) != sorted(schema.primary_key):
            raise ValueError(f"merge keys {on} must equal the primary key {schema.primary_key}")
        if when_matched not in ("update", "delete", None):
            raise ValueError(f"when_matched must be 'update', 'delete', or None, got {when_matched!r}")
        if when_not_matched not in ("insert", None):
            raise ValueError(f"when_not_matched must be 'insert' or None, got {when_not_matched!r}")

        # use_fallback=False: scan-time option, see delete_where
        target = self.read_table(f"{db}.{table}", pad_char=False, use_fallback=False)
        target_keys = target.select(*on)
        pieces = []
        if when_matched == "update":
            pieces.append(
                source.join(target_keys, on, "left_semi").withColumn(KIND_COL, F.lit("I"))
            )
        elif when_matched == "delete":
            pieces.append(
                target.join(source.select(*on), on, "left_semi").withColumn(KIND_COL, F.lit("D"))
            )
        if when_not_matched == "insert":
            pieces.append(
                source.join(target_keys, on, "left_anti").withColumn(KIND_COL, F.lit("I"))
            )
        if not pieces:
            raise ValueError("merge_into with no clauses is a no-op")
        out = pieces[0]
        for p in pieces[1:]:
            out = out.unionByName(p)
        return self.insert_into(db, table, out)

    @staticmethod
    def _prune_empty_dirs(root: str) -> None:
        """Remove commit directories that hold no data files anymore — only
        Spark write markers (_SUCCESS, .crc) — bottom-up, so a future commit
        of the same version can write its directory fresh."""
        for dirpath, dirnames, filenames in os.walk(root, topdown=False):
            if dirpath == root:
                continue
            data = [f for f in filenames if f.endswith((".parquet", ".orc", ".avro"))]
            leftover_dirs = [d for d in dirnames if os.path.exists(os.path.join(dirpath, d))]
            if not data and not leftover_dirs:
                for f in filenames:
                    os.remove(os.path.join(dirpath, f))
                os.rmdir(dirpath)

    def _tags(self, tdir: str) -> dict:
        path = os.path.join(tdir, "snapshot", "TAGS")
        return read_json(path) if os.path.exists(path) else {}

    def create_tag(self, db: str, table: str, tag: str, snapshot_id: int | None = None) -> None:
        """Name a snapshot (Paimon tags): a durable pointer that survives
        snapshot expiration of *other* versions and reads back via
        ``read_table(tag=...)`` or the ``$tags`` system table."""
        tdir = self._table_dir(db, table)
        snaps = {s.snapshot_id for s in self._snapshots(tdir)}
        if snapshot_id is None:
            snapshot_id = max(snaps) if snaps else None
        if snapshot_id not in snaps:
            raise ValueError(f"no snapshot {snapshot_id} (have {sorted(snaps)})")
        tags = self._tags(tdir)
        if tag in tags:
            raise ValueError(f"tag {tag!r} already exists (-> snapshot {tags[tag]})")
        tags[tag] = snapshot_id
        write_json_atomic(os.path.join(tdir, "snapshot", "TAGS"), tags)

    def delete_tag(self, db: str, table: str, tag: str) -> None:
        tdir = self._table_dir(db, table)
        tags = self._tags(tdir)
        if tag not in tags:
            raise ValueError(f"no tag {tag!r}")
        dependent = [
            b for b, m in self._branches(tdir).items() if m.get("from_tag") == tag
        ]
        if dependent:
            # the tag pins the seed snapshot's files against expiry; removing
            # it would let main expiry delete data the branch still reads
            raise ValueError(
                f"tag {tag!r} seeds branch(es) {dependent} — delete the "
                "branch(es) first"
            )
        del tags[tag]
        write_json_atomic(os.path.join(tdir, "snapshot", "TAGS"), tags)

    def rollback_to(self, db: str, table: str, snapshot_id: int) -> None:
        """Roll the table back to ``snapshot_id``: later snapshots are
        dropped and their files (unreferenced by any survivor) deleted.
        The next commit continues from the restored version."""
        tdir = self._table_dir(db, table)
        snaps = self._snapshots(tdir)
        ids = [s.snapshot_id for s in snaps]
        if snapshot_id not in ids:
            raise ValueError(f"no snapshot {snapshot_id} (have {ids})")
        kept = [s for s in snaps if s.snapshot_id <= snapshot_id]
        doomed = [s for s in snaps if s.snapshot_id > snapshot_id]
        tags = self._tags(tdir)
        stale = [t for t, sid in tags.items() if sid > snapshot_id]
        dependent = [
            (t, b)
            for t in stale
            for b, m in self._branches(tdir).items()
            if m.get("from_tag") == t
        ]
        if dependent:
            raise ValueError(
                f"rollback would discard tag(s) seeding branch(es) "
                f"{sorted(set(b for _, b in dependent))} — delete the "
                "branch(es) first"
            )
        live = {f["path"] for s in kept for f in s.files}
        dead = {f["path"] for s in doomed for f in s.files} - live
        dead = {p for p in dead if not _shared_data_path(p)}  # see expire
        dead -= self._externally_pinned(tdir)  # fast-forwarded into main
        for rel in sorted(dead):
            p = os.path.join(tdir, rel)
            if os.path.exists(p):
                os.remove(p)
            _rm_sidecar(p)  # the colocated file-index dies with its data file
        for s_ in doomed:
            os.remove(os.path.join(tdir, "snapshot", f"snapshot-{s_.snapshot_id}.json"))
        self._gc_dv_indexes(tdir, kept, doomed)
        self._prune_empty_dirs(os.path.join(tdir, "data"))
        for t in stale:
            del tags[t]
        write_json_atomic(os.path.join(tdir, "snapshot", "TAGS"), tags)
        write_json_atomic(os.path.join(tdir, "snapshot", "LATEST"), {"snapshot_id": snapshot_id})
        # the rolled-back snapshots' manifests sit ABOVE the restored horizon,
        # where _gc_manifests must presume in-flight writers — but THESE ids
        # were just deleted by us, so reap them explicitly or every rollback
        # permanently accretes dead manifest JSONs referencing deleted files
        live_manifests = {m for s in kept for m in s.manifests}
        for s_ in doomed:
            for mname in s_.manifests:
                if mname not in live_manifests:
                    try:
                        os.remove(os.path.join(tdir, "manifest", mname))
                    except FileNotFoundError:
                        pass
        self._gc_manifests(tdir)

    # ------------------------------------------------------------- consumers
    _CONSUMER_ID_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9_.\-]{0,99}$")
    _CONSUMER_POS_RE = re.compile(r"^pos-(\d+)\.json$")

    def _consumer_positions(self, cdir: str) -> list[int]:
        """Position markers in one consumer's directory. A file vanishing
        mid-listing (concurrent prune/reset) is a consistent earlier state,
        not an error — listdir is the only read, and names carry the data."""
        try:
            names = os.listdir(cdir)
        except FileNotFoundError:
            return []
        out = []
        for fn in names:
            m = self._CONSUMER_POS_RE.match(fn)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _consumers(self, tdir: str) -> dict[str, dict]:
        """consumer_id → {"next_snapshot": int, "updated_ms": int}.

        Layout: ``<table>/consumer/<id>/pos-<n>.json`` — each advance CREATES
        a new position marker (exclusive link) and prunes lower ones; the
        consumer's position is the MAX marker. Creation-not-overwrite makes
        concurrent advances race-safe by construction: positions are
        monotone (max wins), a slower writer can never rewind a faster one,
        and no read-modify-write of shared state exists to tear. Metadata
        rides inside the marker file; a marker deleted between listdir and
        read (concurrent prune) still yields its position from the NAME.
        """
        croot = os.path.join(tdir, "consumer")
        out: dict[str, dict] = {}
        try:
            ids = sorted(os.listdir(croot))
        except FileNotFoundError:
            return out
        for cid in ids:
            cdir = os.path.join(croot, cid)
            positions = self._consumer_positions(cdir)
            if not positions:
                continue
            top = positions[-1]
            marker = os.path.join(cdir, f"pos-{top}.json")
            try:
                meta = read_json(marker) or {}
            except FileNotFoundError:
                meta = {}  # pruned between listdir and read — name carries the position
            # liveness = max(written timestamp, marker mtime): a caught-up
            # stream's same-position re-advance can only TOUCH the existing
            # marker (exclusive create refuses a rewrite), so mtime is the
            # signal that keeps consumer.expiration-time from reaping a live
            # consumer that simply has nothing new to consume
            try:
                mtime_ms = int(os.path.getmtime(marker) * 1000)
            except OSError:
                mtime_ms = 0
            out[cid] = {
                "next_snapshot": top,
                "updated_ms": max(int(meta.get("updated_ms", 0)), mtime_ms),
            }
        return out

    def consumer_progress(self, db: str, table: str, consumer_id: str) -> int | None:
        """The consumer's NEXT snapshot to consume, or None if unregistered.
        Direct single-directory listing — O(this consumer), not O(all)."""
        if not self._CONSUMER_ID_RE.match(consumer_id or ""):
            # same validation as the write path — an unchecked id would be
            # joined into the filesystem path ('../snapshot' traverses out)
            raise ValueError(f"invalid consumer_id {consumer_id!r}")
        cdir = os.path.join(self._table_dir(db, table), "consumer", consumer_id)
        positions = self._consumer_positions(cdir)
        return positions[-1] if positions else None

    def advance_consumer(
        self, db: str, table: str, consumer_id: str, next_snapshot: int,
        strict: bool = True,
    ) -> None:
        """Record that ``consumer_id`` has consumed everything BELOW
        ``next_snapshot`` (Paimon's consumer-id progress: the stored value is
        the next snapshot the consumer will read, and snapshot expiration
        keeps every snapshot at or above the smallest registered position —
        see ``expire_snapshots``).

        Advancement is explicit — call it at your checkpoint/commit points
        (Paimon advances on streaming checkpoint completion). Moving a
        consumer BACKWARD requires ``reset_consumer`` (an accidental stale
        advance must not silently rewind retention protection); concurrent
        advances settle on the highest position (monotone max-wins markers),
        never on whichever writer happened to land last.

        ``strict=False`` turns a backward/stale advance into a NO-OP instead
        of an error — the streaming-sink mode: an at-least-once replay (or a
        batch whose rows all pre-date the consumer's position) recomputes an
        old tip, and a checkpoint must absorb that silently rather than
        crash-loop the stream; the position only ever moves forward either
        way."""
        if not self._CONSUMER_ID_RE.match(consumer_id or ""):
            raise ValueError(f"invalid consumer_id {consumer_id!r}")
        if next_snapshot < 1:
            raise ValueError("next_snapshot must be >= 1")
        tdir = self._table_dir(db, table)
        cdir = os.path.join(tdir, "consumer", consumer_id)
        positions = self._consumer_positions(cdir)
        cur = positions[-1] if positions else None
        if cur is not None and next_snapshot < cur:
            if not strict:
                return  # stale tip from a replayed batch: position holds
            raise ValueError(
                f"consumer {consumer_id!r} is at {cur}; advance to "
                f"{next_snapshot} would move it backward — use "
                "reset_consumer to rewind deliberately"
            )
        try:
            write_json_atomic(
                os.path.join(cdir, f"pos-{int(next_snapshot)}.json"),
                {"updated_ms": int(time.time() * 1000)},
                exclusive=True,
            )
        except CommitConflictError:
            # another worker recorded the same position — idempotent for the
            # POSITION, but the caller just proved LIVENESS: touch the marker
            # so consumer.expiration-time sees a caught-up stream that keeps
            # checkpointing at an unchanged tip as active, not abandoned
            # (expiry reads max(updated_ms, marker mtime))
            try:
                os.utime(os.path.join(cdir, f"pos-{int(next_snapshot)}.json"))
            except OSError:
                pass  # marker pruned by a concurrent faster advance: fine
        # best-effort prune of superseded markers (a marker that vanishes
        # under a concurrent pruner is success, and max-wins is unaffected)
        for p in positions:
            if p < next_snapshot:
                try:
                    os.remove(os.path.join(cdir, f"pos-{p}.json"))
                except FileNotFoundError:
                    pass

    def reset_consumer(
        self, db: str, table: str, consumer_id: str, next_snapshot: int | None = None
    ) -> None:
        """``CALL sys.reset_consumer``: pin the consumer to ``next_snapshot``
        (any direction), or DELETE the consumer when ``next_snapshot`` is
        omitted — Paimon's procedure of the same name. Resetting while the
        consumer's job is live is an operational error (Paimon requires
        stopping the job first); a concurrent advance can out-race the reset.
        """
        if not self._CONSUMER_ID_RE.match(consumer_id or ""):
            raise ValueError(f"invalid consumer_id {consumer_id!r}")
        tdir = self._table_dir(db, table)
        cdir = os.path.join(tdir, "consumer", consumer_id)
        positions = self._consumer_positions(cdir)
        if next_snapshot is None:
            if not positions:
                raise ValueError(f"no consumer {consumer_id!r}")
        elif next_snapshot < 1:
            raise ValueError("next_snapshot must be >= 1")
        else:
            write_json_atomic(
                os.path.join(cdir, f"pos-{int(next_snapshot)}.json"),
                {"updated_ms": int(time.time() * 1000)},
            )
        for p in positions:
            if next_snapshot is None or p != next_snapshot:
                try:
                    os.remove(os.path.join(cdir, f"pos-{p}.json"))
                except FileNotFoundError:
                    pass
        if next_snapshot is None:
            try:
                os.rmdir(cdir)
            except OSError:
                pass  # non-empty (racing advance) or already gone

    # -------------------------------------------------------------- branches
    _BRANCH_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9_\-]{0,63}$")

    def _externally_pinned(self, tdir: str) -> set[str]:
        """Branch-local ``data/...`` paths that the PARENT main chain still
        references through fast_forward grafts (main manifest entries of the
        form ``branch/<name>/data/...``).

        A branch sees those files as exclusively owned (plain ``data/``
        paths pass ``_shared_data_path``), so branch-side
        ``expire_snapshots``/``rollback_to`` after a fast_forward would
        otherwise delete data files main's live snapshots and time travel
        still read — the mirror of the ``delete_branch`` guard. Derived from
        main's actual manifests rather than a sticky flag so the pin releases
        itself once main's own expiry drops the grafted snapshots.
        Metadata-only: O(main snapshot manifests), no data file is read.
        """
        norm = os.path.normpath(tdir)
        parent = os.path.dirname(norm)
        if os.path.basename(parent) != "branch":
            return set()  # not a branch dir — main is never pinned this way
        prefix = f"branch/{os.path.basename(norm)}/"
        main_dir = os.path.dirname(parent)
        pinned: set[str] = set()
        for s in self._snapshots(main_dir):
            for f in s.files:
                p = f["path"].replace(os.sep, "/")
                if p.startswith(prefix):
                    pinned.add(os.path.normpath(p[len(prefix):]))
        return pinned

    def _branches(self, tdir: str) -> dict[str, dict]:
        broot = os.path.join(tdir, "branch")
        out: dict[str, dict] = {}
        try:
            names = sorted(os.listdir(broot))
        except FileNotFoundError:
            return out
        for b in names:
            p = os.path.join(broot, b, "BRANCH.json")
            if os.path.exists(p):
                out[b] = read_json(p)
        return out

    def create_branch(
        self, db: str, table: str, branch: str, from_tag: str | None = None
    ) -> None:
        """Paimon branches (``CALL sys.create_branch``): an independent
        snapshot chain over the same table. ``from_tag`` seeds the branch at
        the tagged snapshot (the tag pins the shared data files against main
        expiry); omitted → an empty branch carrying only the schema.

        Metadata-only at any scale: the seed is ONE rewritten manifest whose
        entries point at the parent's immutable data files (``../../data``)
        — no data is copied, 100 TB branches in milliseconds. Branch commits
        write their own ``data/`` under the branch dir; every catalog
        operation (insert/read/compact/changelog/...) works on a branch via
        the ``t$branch_<name>`` address because the branch IS a table dir.
        """
        if not self._BRANCH_NAME_RE.match(branch or ""):
            raise ValueError(f"invalid branch name {branch!r}")
        tdir = self._table_dir(db, table)
        self._latest_schema(tdir)  # main table must exist
        bdir = os.path.join(tdir, "branch", branch)
        if os.path.exists(bdir):
            raise ValueError(f"branch {branch!r} already exists")
        seed_id = 0
        if from_tag is not None:
            tags = self._tags(tdir)
            if from_tag not in tags:
                raise ValueError(f"no tag {from_tag!r} (have {sorted(tags)})")
            seed_id = tags[from_tag]
        os.makedirs(os.path.join(bdir, "schema"))
        for sp in glob.glob(os.path.join(tdir, "schema", "schema-*.json")):
            shutil.copy2(sp, os.path.join(bdir, "schema", os.path.basename(sp)))
        if seed_id:
            snap = next(
                s for s in self._snapshots(tdir) if s.snapshot_id == seed_id
            )
            if snap.dv:
                # the seeded snapshot's deletion vectors travel with it —
                # basename matching makes the ../../ path rewrite moot;
                # a sharded index copies manifest + shard files
                from incubator_paimon_trino_spark.catalog.dv_index import (
                    copy_index_files,
                )

                copy_index_files(tdir, bdir, snap.dv)
            shared = [
                {**f, "path": os.path.join("..", "..", f["path"])} for f in snap.files
            ]
            mname = f"manifest-{seed_id}-seed.json"
            write_json_atomic(
                os.path.join(bdir, "manifest", mname), {"files": shared}
            )
            seeded = dataclasses.replace(snap, files=[], manifests=[mname])
            write_json_atomic(
                os.path.join(bdir, "snapshot", f"snapshot-{seed_id}.json"),
                seeded.to_json(),
            )
            write_json_atomic(
                os.path.join(bdir, "snapshot", "LATEST"), {"snapshot_id": seed_id}
            )
        write_json_atomic(
            os.path.join(bdir, "BRANCH.json"),
            {
                "from_tag": from_tag,
                "from_snapshot": seed_id,
                "created_ms": int(time.time() * 1000),
            },
        )

    def list_branches(self, db: str, table: str) -> list[str]:
        return sorted(self._branches(self._table_dir(db, table)))

    def delete_branch(self, db: str, table: str, branch: str) -> None:
        """Drop the branch and its own data files. Refused while MAIN still
        references files under the branch dir (a fast-forwarded branch's
        commits become part of main's history — deleting them would corrupt
        the main table)."""
        tdir = self._table_dir(db, table)
        bdir = os.path.join(tdir, "branch", branch)
        if not os.path.isdir(bdir):
            raise ValueError(f"no branch {branch!r}")
        prefix = os.path.join("branch", branch) + os.sep
        for s in self._snapshots(tdir):
            if any(f["path"].startswith(prefix) for f in s.files):
                raise ValueError(
                    f"branch {branch!r} was fast-forwarded into main "
                    f"(snapshot {s.snapshot_id} references its files); "
                    "expire main history past it before deleting the branch"
                )
        shutil.rmtree(bdir)

    def fast_forward(self, db: str, table: str, branch: str) -> int:
        """``CALL sys.fast_forward``: make main's history continue with the
        branch's commits. Main snapshots AFTER the branch point are replaced
        (Paimon's contract — the diverged main commits are discarded); the
        branch's commits are grafted on by manifest rewrite, sharing the
        branch's immutable data files in place. Returns the new main tip.

        Metadata-only: per grafted snapshot, one manifest write with paths
        rewritten (inherited ``../../data`` entries → main-relative, branch-
        local entries → ``branch/<name>/data``); no data file moves.
        """
        tdir = self._table_dir(db, table)
        bdir = os.path.join(tdir, "branch", branch)
        meta = self._branches(tdir).get(branch)
        if meta is None:
            raise ValueError(f"no branch {branch!r}")
        base = int(meta.get("from_snapshot", 0))
        branch_new = [s for s in self._snapshots(bdir) if s.snapshot_id > base]
        main_snaps = self._snapshots(tdir)
        main_tip = main_snaps[-1].snapshot_id if main_snaps else 0
        if main_tip > base:
            if base == 0:
                raise ValueError(
                    f"cannot fast_forward empty-seeded branch {branch!r} over "
                    f"a main history (main tip {main_tip}); branch from a tag"
                )
            # tags above the branch point are about to be discarded with the
            # diverged main history — refuse if another branch depends on one
            tags = self._tags(tdir)
            for other, ometa in self._branches(tdir).items():
                otag = ometa.get("from_tag")
                if other != branch and otag in tags and tags[otag] > base:
                    raise ValueError(
                        f"fast_forward would discard tag {otag!r} that "
                        f"branch {other!r} was created from"
                    )
            self.rollback_to(db, table, base)
        import uuid as _uuid

        tip = base
        for s in branch_new:
            rewritten = []
            for f in s.files:
                p = f["path"]
                up = os.path.join("..", "..") + os.sep
                new_p = (
                    os.path.normpath(p) if p.startswith(up) else os.path.join("branch", branch, p)
                )
                # normpath("../../data/x") == "../../data/x"; strip the ../..
                if new_p.startswith(up):
                    new_p = new_p[len(up):]
                rewritten.append({**f, "path": new_p})
            mname = f"manifest-{s.snapshot_id}-ff{_uuid.uuid4().hex[:8]}.json"
            write_json_atomic(
                os.path.join(tdir, "manifest", mname), {"files": rewritten}
            )
            if s.dv:
                # grafted snapshots keep their DV index: copy it into main's
                # namespace (apply matches on basenames, so the stored
                # branch-relative path keys stay valid as-is); sharded
                # indexes copy manifest + shards, already-present files
                # (shards shared across grafted snapshots) copy once
                from incubator_paimon_trino_spark.catalog.dv_index import (
                    copy_index_files,
                )

                copy_index_files(bdir, tdir, s.dv)
            grafted = dataclasses.replace(s, files=[], manifests=[mname])
            write_json_atomic(
                os.path.join(tdir, "snapshot", f"snapshot-{s.snapshot_id}.json"),
                grafted.to_json(),
            )
            tip = s.snapshot_id
        if tip != base or main_tip > base:
            write_json_atomic(
                os.path.join(tdir, "snapshot", "LATEST"), {"snapshot_id": tip}
            )
        # observability only — the maintenance guard (_externally_pinned)
        # derives from main's live manifests, so it self-releases when main
        # expiry drops the grafted snapshots; this flag does not
        write_json_atomic(
            os.path.join(bdir, "BRANCH.json"),
            {**meta, "fast_forwarded_ms": int(time.time() * 1000)},
        )
        return tip

    def read_cdc(self, name: str, from_snapshot: int, to_snapshot: int) -> DataFrame:
        """CDC view of ``(from_snapshot, to_snapshot]``: one row per changed
        primary key with ``_change`` in {'+I', '-U', '+U', '-D'} — the
        UPDATE_BEFORE/UPDATE_AFTER changelog Paimon's changelog-producer
        modes emit, derived here by diffing the two merged states.

        Plan: two merged reads + one full outer join co-partitioned on the
        PK. At 100 TB the join input is two merged table states — for
        incremental pipelines prefer ``read_incremental`` (raw delta rows)
        when upsert pairing isn't needed; this method is the semantic
        completion for consumers that must see before/after images.
        """
        db, _, table = name.partition(".")
        schema = self.schema_of(db, table)
        if not schema.primary_key:
            raise ValueError("read_cdc requires a primary-key table")
        if from_snapshot > to_snapshot:
            raise ValueError(f"from_snapshot {from_snapshot} > to_snapshot {to_snapshot}")
        pk = schema.primary_key
        value_cols = [f.name for f in schema.fields if f.name not in pk]
        old = self.read_table(name, version_as_of=from_snapshot) if from_snapshot else None
        new = self.read_table(name, version_as_of=to_snapshot)
        if old is None:
            return new.withColumn("_change", F.lit("+I"))
        from pyspark.sql import types as _T

        # comparison twin of each value column: Spark's eqNullSafe rejects
        # MAP types (no defined ordering), so maps compare via their sorted
        # entry arrays — canonical regardless of internal map order. (Maps
        # nested INSIDE structs/arrays would still be rejected by Spark;
        # top-level map value columns are the supported surface.)
        by_type = {f.name: f.dataType for f in new.schema.fields}
        cmp_col = lambda c: (  # noqa: E731
            F.sort_array(F.map_entries(F.col(c))).alias(c)
            if isinstance(by_type[c], _T.MapType)
            else F.col(c).alias(c)
        )
        cmp_struct = F.struct(*[cmp_col(c) for c in value_cols])
        o = old.select(*pk, F.struct(*value_cols).alias("_old"), cmp_struct.alias("_oldc"))
        n = new.select(*pk, F.struct(*value_cols).alias("_new"), cmp_struct.alias("_newc"))
        # materialize once: four classification branches below would other-
        # wise re-run the two merged reads and the join per branch
        j = o.join(n, pk, "full_outer").localCheckpoint()
        inserts = j.filter(F.col("_old").isNull() & F.col("_new").isNotNull()).select(
            *pk, *[F.col(f"_new.{c}").alias(c) for c in value_cols], F.lit("+I").alias("_change")
        )
        deletes = j.filter(F.col("_new").isNull() & F.col("_old").isNotNull()).select(
            *pk, *[F.col(f"_old.{c}").alias(c) for c in value_cols], F.lit("-D").alias("_change")
        )
        changed = j.filter(
            F.col("_old").isNotNull()
            & F.col("_new").isNotNull()
            # null-safe: plain != returns NULL when a struct field is null,
            # silently dropping e.g. a null->3 update from the changelog
            & ~F.col("_oldc").eqNullSafe(F.col("_newc"))
        )
        before = changed.select(
            *pk, *[F.col(f"_old.{c}").alias(c) for c in value_cols], F.lit("-U").alias("_change")
        )
        after = changed.select(
            *pk, *[F.col(f"_new.{c}").alias(c) for c in value_cols], F.lit("+U").alias("_change")
        )
        return inserts.unionByName(before).unionByName(after).unionByName(deletes)

    def table_changelog(
        self,
        name: str,
        from_snapshot: int = 0,
        to_snapshot: int | None = None,
        producer: str | None = None,
        consumer_id: str | None = None,
    ) -> DataFrame:
        """The table's changelog for ``(from_snapshot, to_snapshot]`` under a
        ``changelog_producer`` mode (the reference surfaces this enum as a DDL
        option — ``TrinoTableOptionUtils.java:94-107`` — without executing
        it; executable here):

        - ``input``           — the writer's own rows are the changelog:
          raw (+I/-D) records per commit, no merge, no join.
        - ``lookup`` / ``full-compaction`` — complete retraction-aware
          changelog: per-commit diff of merged states, emitting
          +I / -U / +U / -D (the UPDATE_BEFORE/AFTER stream).
        - ``none`` (default)  — no before-images are available: same diff
          but without the -U rows, matching Paimon's contract that a
          ``none`` table cannot provide complete changelogs downstream.

        Every row carries ``_snapshot`` (the commit that produced it) and
        ``_change``. One ``read_cdc`` (two merged reads + a co-partitioned
        full-outer join) per commit in the range — bound history with
        ``expire_snapshots``; for a raw-speed tail without pairing use
        ``read_incremental``/``read_changelog_stream``.
        """
        db, _, table = name.partition(".")
        tdir = self._table_dir(db, table)
        schema = self._latest_schema(tdir)
        if producer is None:
            producer = schema.options.get("changelog_producer", "none")
        if producer not in ("input", "lookup", "full-compaction", "none"):
            raise ValueError(f"unknown changelog_producer {producer!r}")
        if producer == "input" and self._dv_enabled(schema):
            # a DV table's deletes are pure metadata — the writer's own rows
            # contain NO -D records, so an 'input' changelog would silently
            # drop every delete downstream. The diff producers read merged
            # (DV-applied) states and emit the full retraction stream.
            raise ValueError(
                "changelog_producer='input' cannot represent deletes on a "
                "deletion-vectors table (deletes write no data rows); use "
                "producer='lookup' or 'full-compaction'"
            )
        if consumer_id is not None:
            # resume from the consumer's recorded NEXT snapshot (Paimon's
            # consumer-id option): next=k means everything below k is consumed
            # → range starts after k-1. An explicit from_snapshot wins (a
            # manual replay); advancement stays explicit via advance_consumer
            # at the caller's commit points — a plan-time auto-advance would
            # mark rows consumed before the lazy DataFrame ever executes.
            if from_snapshot == 0:
                nxt = self.consumer_progress(db, table, consumer_id)
                if nxt is not None:
                    from_snapshot = nxt - 1
        snaps = [s.snapshot_id for s in self._snapshots(tdir)]
        snap_ids = set(snaps)
        tip = snaps[-1] if snaps else 0
        hi = to_snapshot if to_snapshot is not None else tip
        ids = [s for s in snaps if from_snapshot < s <= hi]
        if from_snapshot > 0 and from_snapshot >= tip and from_snapshot not in snap_ids:
            # a position AT or AHEAD of the tip is not expired — the caller
            # simply has nothing new (e.g. a consumer that saved tip+1, or
            # polls after a full-history rewrite): empty range, not an error
            ids = []
        elif from_snapshot > 0 and from_snapshot not in snap_ids:
            # an EXPIRED start position must fail loudly (Paimon errors too):
            # the nearest-survivor collapse below is only sound for gaps
            # strictly inside the range — widening the FIRST diff would
            # re-deliver changes the caller already consumed
            raise ValueError(
                f"from_snapshot {from_snapshot} has been expired (surviving: "
                f"{sorted(snap_ids)}); resume from a surviving snapshot or "
                "re-bootstrap with from_snapshot=0"
            )

        if producer == "input":
            if not schema.primary_key:
                raise ValueError("changelog_producer=input needs a primary-key table; "
                                 "append-only tables stream raw rows via read_incremental")
            if schema.options.get("sequence_field"):
                # _seq carries business time, not the commit id — raw rows
                # can't be attributed to snapshots; diff-based producers can.
                raise ValueError(
                    "changelog_producer=input is incompatible with "
                    "sequence_field (rows carry business sequence, not "
                    "commit ids) — use producer='lookup' or 'none'"
                )
            # per-commit FILE-SET diffs, not a _seq filter over the latest
            # live set: compaction re-stamps every live row with its own id
            # (a _seq filter would re-emit the whole table for the compact
            # commit and return EMPTY for pre-compaction ranges whose raw
            # rows left the live set). Snapshot JSONs keep full per-version
            # file lists, so the diff works at any point in history; COMPACT
            # commits emit nothing (Paimon's input producer contract —
            # rewrites are not writer input).
            all_snaps = self._snapshots(tdir)
            by_id = {s.snapshot_id: s for s in all_snaps}
            prev_id = max((x for x in snap_ids if x <= from_snapshot), default=0)
            prev_paths = {f["path"] for f in by_id[prev_id].files} if prev_id else set()
            change = F.when(F.col(KIND_COL) == "D", "-D").otherwise("+I")
            parts = []
            # a from_snapshot=0 re-bootstrap whose earliest SURVIVING snapshot
            # is a COMPACT commit (expire keeps last N, so this happens) must
            # emit that commit's file set as the +I baseline — skipping it
            # like an in-range compaction would silently drop every row the
            # compaction first surfaces from the changelog
            bootstrap = prev_id == 0
            for s_id in ids:
                s = by_id[s_id]
                added = [f for f in s.files if f["path"] not in prev_paths]
                prev_paths = {f["path"] for f in s.files}
                emit_compact_baseline = bootstrap and s.commit_kind == COMMIT_COMPACT
                bootstrap = False
                if (s.commit_kind == COMMIT_COMPACT and not emit_compact_baseline) or not added:
                    continue
                raw = self._read_files(tdir, schema, dataclasses.replace(s, files=added))
                parts.append(
                    raw.select(
                        *[f.name for f in schema.fields],
                        F.lit(s_id).cast("bigint").alias("_snapshot"),
                        change.alias("_change"),
                    )
                )
            if not parts:
                # "long", not "bigint": StructType.add parses JSON type names
                empty = schema.spark_schema().add("_snapshot", "long").add("_change", "string")
                return self.spark.createDataFrame([], empty)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out

        parts = []
        for s_id in ids:
            # diff against the NEAREST surviving predecessor: with expired
            # history (incl. mid-history gaps where only a tagged snapshot
            # survives) this collapses the missing commits into one correct
            # diff — a full +I bootstrap would drop -D rows and re-emit
            # unchanged rows; prev=0 degrades to the full initial image.
            prev = max((x for x in snap_ids if x < s_id), default=0)
            diff = self.read_cdc(name, prev, s_id)
            parts.append(diff.withColumn("_snapshot", F.lit(s_id).cast("bigint")))
        if not parts:
            empty = schema.spark_schema().add("_change", "string").add("_snapshot", "long")
            return self.spark.createDataFrame([], empty)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if producer == "none":
            out = out.filter(F.col("_change") != "-U")
        return out

    def expire_partitions(
        self,
        db: str,
        table: str,
        older_than: str | None = None,
        expiration_time: str | None = None,
        partition_column: str | None = None,
        dry_run: bool = False,
    ) -> dict:
        """Paimon's partition expiration (``partition.expiration-time``
        CoreOption / ``CALL sys.expire_partitions``): drop WHOLE partitions
        whose partition value is older than a cutoff, as one METADATA-ONLY
        commit — no data file is read or rewritten, the expired entries just
        leave the live file list (snapshot isolation keeps them
        time-travelable until snapshot expiration deletes the bytes). At
        100 TB this is the retention mechanism for date-partitioned fact
        tables: O(live files) driver work on manifest entries, zero data IO.

        Cutoff forms: ``older_than`` is an absolute literal compared against
        the partition value in the COLUMN'S OWN type (dates ISO, integrals
        numeric, strings lexicographic — Paimon's timestamp-formatter
        patterns 'yyyy-MM-dd'/'yyyyMMdd' order correctly as strings);
        ``expiration_time`` is Paimon's relative form ('7 d': cutoff =
        now − duration, inherently wall-clock). Values STRICTLY BELOW the
        cutoff expire; null partition values never expire (conservative
        keep). ``partition_column`` defaults to the first partition key —
        Paimon likewise formats the leading partition field.

        The commit is OVERWRITE-kind with a fresh single manifest (doubles
        as metadata compaction); the manifest STREAM emits nothing for it —
        no files are added, matching Paimon's no-changelog contract for
        expiration. DV metadata carries forward: marks pointing at dropped
        files are dangling-but-harmless (the anti-join never sees those
        paths again).
        """
        tdir = self._table_dir(db, table)
        schema = self._latest_schema(tdir)
        if not schema.partition_keys:
            raise ValueError("expire_partitions requires a partitioned table")
        col = partition_column or schema.partition_keys[0]
        if col not in schema.partition_keys:
            raise ValueError(
                f"partition_column {col!r} is not a partition key {schema.partition_keys}"
            )
        ddl = next(f.type for f in schema.fields if f.name == col)
        if older_than is not None:
            # absolute form: the user named a literal in the column's own
            # type — compare in that domain
            cutoff = _typed_partition_cutoff(older_than, ddl)
            parse = lambda raw: _typed_partition_cutoff(raw, ddl)  # noqa: E731
        elif expiration_time is not None:
            # relative form ('7 d', and the auto partition.expiration-time
            # commit hook): the cutoff is wall-clock, so only DATE-LIKE
            # partition values may expire. Paimon skips values its
            # timestamp-formatter cannot parse; comparing a raw int/string
            # against a yyyyMMdd-sized cutoff instead would silently expire
            # an ENTIRE non-date partition set (e.g. int region ids) on the
            # next commit. Compare in DATE space; unparseable values are
            # kept by the loop's conservative-keep.
            ms = _parse_duration_ms(expiration_time)
            cut_dt = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None) - _dt.timedelta(
                milliseconds=ms
            )
            t = ddl.strip().lower()
            if t.startswith("timestamp"):
                cutoff = cut_dt
                parse = lambda raw: _typed_partition_cutoff(raw, ddl)  # noqa: E731
            else:
                cutoff = cut_dt.date()
                parse = _date_like_partition_value
        else:
            raise ValueError("expire_partitions needs older_than or expiration_time")
        prev = self._latest_snapshot(tdir)
        if prev is None:
            return {"expired_partitions": 0, "expired_files": 0, "snapshot": None}
        keep, drop, gone_parts = [], [], set()
        for e in prev.files:
            raw = partition_values(e["path"]).get(col)
            try:
                v = None if raw is None else parse(raw)
            except (ValueError, TypeError):
                v = None  # unparseable partition value: conservative keep
            if v is not None and v < cutoff:
                drop.append(e)
                gone_parts.add(raw)
            else:
                keep.append(e)
        if not drop or dry_run:
            return {
                "expired_partitions": len(gone_parts),
                "expired_files": len(drop),
                "snapshot": None,
            }
        version = self._overwrite_live_set(tdir, schema, prev, keep)
        return {
            "expired_partitions": len(gone_parts),
            "expired_files": len(drop),
            "snapshot": version,
        }

    def _overwrite_live_set(self, tdir: str, schema: TableSchema, prev, keep: list[dict]) -> int:
        """Publish a METADATA-ONLY commit whose live set is ``keep`` — the
        shared tail of partition expiration and partition-predicate DELETE.
        OVERWRITE-kind (replaces the accumulated manifest chain with one
        fresh manifest, which doubles as metadata compaction); no data file
        is read, written, or removed — dropped entries stay time-travelable
        until snapshot expiration reclaims the bytes. DV metadata carries
        forward (marks pointing at dropped files are dangling-but-harmless)."""
        version = prev.snapshot_id + 1
        snap = Snapshot(
            snapshot_id=version,
            schema_id=schema.schema_id,
            commit_user=self.commit_user,
            commit_identifier=version,
            commit_kind=COMMIT_OVERWRITE,
            timestamp_ms=int(time.time() * 1000),
            files=keep,
            record_count=sum(e["record_count"] for e in keep),
        )
        if prev.dv is not None:
            snap.dv = prev.dv
            snap.dv_marks = prev.dv_marks
        self._publish_snapshot(tdir, snap, keep, [])
        return version

    def drop_partitions(self, db: str, table: str, condition) -> dict:
        """DELETE whole partitions by a partition-column predicate — the
        append-table DELETE (Paimon's drop-partition overwrite; PK tables
        delete by key through ``delete_where``'s -D rows instead).

        The predicate is evaluated BY SPARK over one row per live partition
        (metadata-sized: distinct partition tuples from the manifest
        entries, typed with the partition columns' own types), so every
        predicate form Spark can evaluate works — =, IN, ranges, AND/OR —
        with exact engine semantics, never a Python re-implementation. A
        predicate referencing any non-partition column fails loudly: a
        row-level DELETE on an append table would need rewrites this engine
        deliberately refuses (matching Paimon's append-table contract).
        The commit is the metadata-only ``_overwrite_live_set`` — zero data
        IO at any scale.
        """
        tdir = self._table_dir(db, table)
        schema = self._latest_schema(tdir)
        pkeys = schema.partition_keys
        if not pkeys:
            raise ValueError(
                "DELETE on a table without a primary key requires a partition "
                "predicate on a partitioned table (append tables delete whole "
                "partitions; row-level deletes need a primary key)"
            )
        prev = self._latest_snapshot(tdir)
        if prev is None:
            return {"deleted_partitions": 0, "deleted_files": 0, "snapshot": None}
        by_tuple: dict[tuple, list[dict]] = {}
        for e in prev.files:
            vals = partition_values(e["path"])
            by_tuple.setdefault(tuple(vals.get(k) for k in pkeys), []).append(e)
        raw_cols = [f"_raw_{i}" for i in range(len(pkeys))]
        ddl_of = {f.name: f.type for f in schema.fields}
        raw_df = self.spark.createDataFrame(
            [tuple(t) for t in sorted(by_tuple, key=str)],
            ", ".join(f"{c} string" for c in raw_cols),
        )
        typed = raw_df.select(
            *raw_cols,
            *[
                F.col(c).cast(castable_ddl(ddl_of[k])).alias(k)
                for c, k in zip(raw_cols, pkeys)
            ],
        )
        try:
            doomed_rows = typed.filter(condition).collect()  # one row per partition
        except Exception as ex:
            if "UNRESOLVED_COLUMN" in str(ex) or "cannot be resolved" in str(ex):
                raise ValueError(
                    "DELETE on an append table must reference partition columns "
                    f"only ({pkeys}); for row-level deletes use a primary-key table"
                ) from ex
            raise
        doomed = {tuple(r[c] for c in raw_cols) for r in doomed_rows}
        if not doomed:
            return {"deleted_partitions": 0, "deleted_files": 0, "snapshot": None}
        keep = [e for t, es in by_tuple.items() if t not in doomed for e in es]
        n_files = sum(len(by_tuple[t]) for t in doomed)
        version = self._overwrite_live_set(tdir, schema, prev, keep)
        return {
            "deleted_partitions": len(doomed),
            "deleted_files": n_files,
            "snapshot": version,
        }

    def expire_snapshots(
        self, db: str, table: str, keep_last: int = 1, older_than_ms: int | None = None
    ) -> dict:
        """Expire all but the newest ``keep_last`` snapshots and delete data
        files no surviving snapshot references — Paimon's snapshot
        expiration (``snapshot.num-retained.*`` options), the operation that
        bounds a lake table's storage over time.

        ``older_than_ms`` adds Paimon's AGE dimension (``snapshot.
        time-retained`` / the procedure's ``older_than``): only snapshots
        committed BEFORE the cutoff expire, so ``keep_last`` becomes the
        retention floor (num-retained.min) instead of the exact count —
        recent history survives regardless of count, old history goes
        regardless of recency pressure.

        Time travel to an expired version then fails with the same "no
        snapshot" error as a never-existing version. The live view is
        untouched: the newest snapshot's file list survives by construction.
        Metadata-only planning — the file diff is computed from manifests;
        data files are deleted, never read.
        """
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        tdir = self._table_dir(db, table)
        snaps = self._snapshots(tdir)
        tagged = set(self._tags(tdir).values())
        # registered consumers pin retention (Paimon's consumer mechanism):
        # every snapshot at or above the smallest recorded next-position
        # survives, and so does its immediate predecessor — the changelog
        # diff for snapshot k needs k-1 as its baseline. Stale consumers
        # are released manually with reset_consumer, or automatically here
        # when the table sets consumer.expiration-time (Paimon's consumer
        # expiration): a consumer that has not advanced within the window
        # is deleted and stops pinning — an abandoned checkpoint must not
        # hold a 100 TB table's history forever.
        consumers = self._consumers(tdir)
        exp_opt = self._latest_schema(tdir).options.get("consumer_expiration_time")
        dead_consumers = 0
        if exp_opt:
            stale_before = time.time() * 1000 - _parse_duration_ms(exp_opt)
            for cid, meta in list(consumers.items()):
                updated = int(meta.get("updated_ms", 0) or 0)
                # updated_ms == 0 means the marker's metadata could not be
                # read — the _consumers docstring's concurrent-advance race
                # (position survives via the file NAME). That consumer is
                # ACTIVE, not stale: deleting it would unregister a live
                # stream and expire snapshots underneath it. Skip; a truly
                # abandoned consumer reports a real, old timestamp.
                if updated and updated < stale_before:
                    shutil.rmtree(os.path.join(tdir, "consumer", cid), ignore_errors=True)
                    del consumers[cid]
                    dead_consumers += 1
        min_next = min(
            (int(c["next_snapshot"]) for c in consumers.values()), default=None
        )
        doomed = [
            s
            for s in snaps[:-keep_last]
            if s.snapshot_id not in tagged
            and (min_next is None or s.snapshot_id < min_next - 1)
            and (older_than_ms is None or s.timestamp_ms < older_than_ms)
        ]
        kept = [s for s in snaps if s not in doomed]
        if not doomed:
            return {
                "expired_snapshots": 0,
                "deleted_files": 0,
                "expired_consumers": dead_consumers,
            }
        live = {f["path"] for s in kept for f in s.files}
        dead = {f["path"] for s in doomed for f in s.files} - live
        # files OUTSIDE this chain's namespace are shared, not owned: a
        # branch's inherited "../../data" entries belong to the parent table,
        # and a fast-forwarded "branch/<n>/data" entry is reclaimed by
        # delete_branch — expiring metadata must never delete either
        dead = {p for p in dead if not _shared_data_path(p)}
        # the mirror direction: this chain may BE a fast-forwarded branch
        # whose local data/ files main's grafted manifests still reference
        dead -= self._externally_pinned(tdir)
        # a concurrent expirer may be deleting an overlapping doomed set:
        # a file already gone is SUCCESS for this pass, not an error
        for rel in sorted(dead):
            p = os.path.join(tdir, rel)
            try:
                os.remove(p)
            except FileNotFoundError:
                pass
            _rm_sidecar(p)  # the colocated file-index dies with its data file
        for s in doomed:
            try:
                os.remove(os.path.join(tdir, "snapshot", f"snapshot-{s.snapshot_id}.json"))
            except FileNotFoundError:
                pass
        self._prune_empty_dirs(os.path.join(tdir, "data"))
        self._gc_manifests(tdir)
        self._gc_dv_indexes(tdir, kept, doomed)
        return {
            "expired_snapshots": len(doomed),
            "deleted_files": len(dead),
            "expired_consumers": dead_consumers,
        }

    @staticmethod
    def _gc_dv_indexes(tdir: str, kept: list[Snapshot], doomed: list[Snapshot]) -> None:
        """Reap deletion-vector index files owned by expired/rolled-back
        snapshots (nonce-named per commit; a kept snapshot referencing the
        same name — fast-forward copies keep names, and SHARD files carry
        forward across commits by design — pins it). Liveness is resolved
        to the full file set (manifest + shards), so a shard still listed
        by any kept snapshot's manifest survives its writer's expiry."""
        from incubator_paimon_trino_spark.catalog.dv_index import index_file_names

        live: set[str] = set()
        for s in kept:
            if s.dv:
                live.update(index_file_names(tdir, s.dv))
                live.add(s.dv)
        for s in doomed:
            if not s.dv:
                continue
            for name in index_file_names(tdir, s.dv) + [s.dv]:
                if name not in live:
                    try:
                        os.remove(os.path.join(tdir, "index", name))
                    except FileNotFoundError:
                        pass

    def remove_orphan_files(
        self, db: str, table: str, older_than_ms: int | None = None, dry_run: bool = False
    ) -> dict:
        """Delete data files no snapshot references (Paimon's
        ``CALL sys.remove_orphan_files``): the leftovers of a writer that
        crashed between finalizing its files into ``data/`` and publishing
        its snapshot, plus stale ``.staging-*`` attempt directories. Regular
        commits never need this — conflict losers clean up after themselves —
        but crash debris would otherwise sit in the directory forever (only
        the snapshot manifest, not the listing, defines the table; the
        streaming changelog path globs by commit id, so debris at an already-
        published id would also be misread there).

        Two safety guards, both required:
        - files whose ``c<N>-`` commit id exceeds the latest PUBLISHED
          snapshot are in-flight (a live writer finalizes at latest+1 before
          publishing) and are never touched, same horizon rule as
          ``_gc_manifests``;
        - files modified at/after ``older_than_ms`` (epoch millis; default
          now − 24 h, Paimon's default) are kept, so a same-id race with a
          slow publisher can't be swept mid-commit.

        Metadata-only planning: the referenced set comes from every
        snapshot's manifests (tagged snapshots persist as snapshot files, so
        tags are covered); data files are deleted, never read.
        """
        tdir = self._table_dir(db, table)
        cutoff = (
            older_than_ms if older_than_ms is not None else (time.time() - 24 * 3600) * 1000
        )
        snaps = self._snapshots(tdir)
        horizon = snaps[-1].snapshot_id if snaps else 0
        # manifests store relpath-native separators; normalize to "/" so the
        # membership test below matches on Windows too (else every referenced
        # file misses the set and becomes deletable — GC data loss)
        referenced = {f["path"].replace("\\", "/") for s in snaps for f in s.files}
        deleted = kept_in_flight = 0
        for p in glob.glob(os.path.join(tdir, "data", "**", "*.*"), recursive=True):
            if not os.path.isfile(p):
                continue
            rel = os.path.relpath(p, tdir)
            if rel.replace(os.sep, "/") in referenced:
                continue
            if p.endswith(_FIDX_SUFFIX):
                # a file-index sidecar is live iff ITS DATA FILE is referenced
                # (the sidecar itself never appears in manifests); an orphaned
                # one falls through to the same horizon + mtime rules as its
                # data file — its basename starts with the same c<N>- id
                if rel[: -len(_FIDX_SUFFIX)].replace(os.sep, "/") in referenced:
                    continue
            m = re.match(r"c(\d+)-", os.path.basename(p))
            if m is None or int(m.group(1)) > horizon:
                kept_in_flight += 1
                continue
            if os.path.getmtime(p) * 1000 >= cutoff:
                kept_in_flight += 1
                continue
            deleted += 1
            if not dry_run:
                os.remove(p)
        staging_removed = 0
        day_ago = (time.time() - 24 * 3600) * 1000
        for d in glob.glob(os.path.join(tdir, ".staging-*")):
            # In-flight rule for staging dirs: above the snapshot horizon the
            # dir may belong to a LIVE writer (writers finalize at latest+1
            # before publishing), so a caller-supplied aggressive older_than
            # must not sweep it — but a writer that crashed during a table's
            # FIRST commit also sits above the horizon forever, so instead of
            # immortality those dirs get a hard 24 h mtime floor (no live
            # writer holds a staging dir for a day — _staging_dir contract).
            # At/below the horizon the caller's cutoff applies as-is.
            sm = re.match(r"\.staging-c(\d+)-", os.path.basename(d))
            above = sm is None or int(sm.group(1)) > horizon
            eff_cutoff = min(cutoff, day_ago) if above else cutoff
            try:
                if os.path.getmtime(d) * 1000 < eff_cutoff:
                    staging_removed += 1
                    if not dry_run:
                        shutil.rmtree(d, ignore_errors=True)
                else:
                    kept_in_flight += 1
            except OSError:
                pass
        # DV index files follow the same lifecycle rules: a writer links its
        # dv-<version>-<nonce>.json BEFORE publishing, so an unreferenced one
        # above the horizon may belong to a live commit (kept), while one
        # at/below the horizon lost its race/crashed and is debris
        from incubator_paimon_trino_spark.catalog.dv_index import index_file_names

        live_dv: set[str] = set()
        for s in snaps:
            if s.dv:
                live_dv.update(index_file_names(tdir, s.dv))
                live_dv.add(s.dv)
        dv_removed = 0
        for p in sorted(
            glob.glob(os.path.join(tdir, "index", "dv-*.json"))
            + glob.glob(os.path.join(tdir, "index", "dvm-*.json"))
        ):
            name = os.path.basename(p)
            if name in live_dv:
                continue
            dm = re.match(r"dvm?-(\d+)-", name)
            if dm is None or int(dm.group(1)) > horizon or os.path.getmtime(p) * 1000 >= cutoff:
                kept_in_flight += 1
                continue
            dv_removed += 1
            if not dry_run:
                try:
                    os.remove(p)
                except FileNotFoundError:
                    pass
        if not dry_run:
            self._prune_empty_dirs(os.path.join(tdir, "data"))
        return {
            "deleted_files": deleted,
            "deleted_staging_dirs": staging_removed,
            "deleted_dv_indexes": dv_removed,
            "skipped_in_flight": kept_in_flight,
        }

    def rebuild_file_index(self, db: str, table: str, force: bool = False) -> dict:
        """Backfill file-index sidecars for live data files missing them.

        A table that enables ``file-index.*`` options AFTER writing history
        (set_options) indexes only its post-enable commits — earlier files
        stay probe-unknown (kept on every scan) until compaction rewrites
        them or this maintenance op backfills in place. ``force=True``
        rebuilds every live sidecar (e.g. after changing items/fpp sizing).

        One distributed pass over only the missing files (same build job a
        commit runs); idempotent; metadata untouched, so no new snapshot.
        Shared entries (a branch's inherited ``../../data`` files) are
        skipped — their sidecars belong to the parent table's lifecycle.
        """
        tdir = self._table_dir(db, table)
        schema = self._latest_schema(tdir)
        if not _file_index_specs(schema):
            raise ValueError(
                f"{db}.{table} has no file-index options; set "
                "file-index.bloom-filter.columns / file-index.bitmap.columns first"
            )
        snap = self._latest_snapshot(tdir)
        # group by WRITING schema: a renamed column's physical name inside an
        # old file differs from the current one (_read_files maps by field id
        # for the same reason) — reading old files by the current name would
        # produce all-NULL columns and an all-empty sidecar that then FALSELY
        # drops the file on every probe
        todo: dict[int, list[str]] = {}
        skipped = 0
        for e in snap.files if snap else []:
            if e.get("format", "parquet") != "parquet" or _shared_data_path(e["path"]):
                skipped += 1
                continue
            p = os.path.join(tdir, e["path"])
            if force or not os.path.exists(p + _FIDX_SUFFIX):
                todo.setdefault(e["schema_id"], []).append(p)
        built = 0
        spec_fids = {s.fid for s in _file_index_specs(schema)}
        for sid, paths in sorted(todo.items()):
            ws = self._schema(tdir, sid) if sid != schema.schema_id else schema
            read_names = {f.id: f.name for f in ws.fields if f.id in spec_fids}
            if len(read_names) < len(spec_fids):
                # an indexed column added AFTER these files were written: the
                # files can't contain it, and a probe on it never matches
                # their rows anyway — skip rather than half-index
                skipped += len(paths)
                continue
            built += build_file_indexes(self.spark, paths, schema, read_names=read_names)
        return {"built": built, "skipped": skipped}

    def _grid_cells(self, df: DataFrame, schema: TableSchema, order_by: list[str]):
        """Per-column grid cells for the space-filling-curve keys.

        Each column maps to a cell on a 2^bits equal-width grid between its
        own min/max (ONE scalar agg over the compaction input — the rewrite
        reads everything anyway). NULLs and degenerate (constant / all-null)
        columns land in cell 0 — they cluster together at the low end, which
        is exactly the min/max-stats-friendly placement. Equal-width (not
        equal-frequency) cells: heavy skew degrades clustering quality,
        never correctness — the same trade Paimon's byte-slice keys make.
        Returns (cell Columns, bits per column).
        """
        k = len(order_by)
        bits = min(16, 60 // k)  # ≤ 60 total: the key must stay a positive bigint
        cells = 1 << bits
        by_name = {f.name: f for f in schema.fields}

        def as_double(name: str):
            d = by_name[name].type.lower()
            if d == "date":
                return F.unix_date(F.col(name)).cast("double")
            if d.startswith("timestamp"):
                # ntz → ltz shift is a constant offset: monotonic, grid-safe
                return F.unix_micros(F.col(name).cast("timestamp_ltz")).cast("double")
            if _zorderable_ddl(d):
                return F.col(name).cast("double")
            raise ValueError(
                f"zorder column {name!r} has type {by_name[name].type!r}; "
                "numeric, date, or timestamp required (strings have no "
                "grid embedding — use strategy='order' for a leading string)"
            )

        nums = [as_double(c) for c in order_by]
        row = df.agg(
            *[a for i, n in enumerate(nums) for a in (F.min(n).alias(f"lo{i}"), F.max(n).alias(f"hi{i}"))]
        ).first()
        out = []
        for j, n in enumerate(nums):
            lo, hi = row[f"lo{j}"], row[f"hi{j}"]
            if lo is None or hi is None or lo == hi:
                out.append(F.lit(0).cast("bigint"))  # constant/all-null column
                continue
            cell = (
                F.least(
                    F.lit(cells - 1),
                    F.greatest(
                        F.lit(0),
                        F.width_bucket(n, F.lit(float(lo)), F.lit(float(hi)), F.lit(cells)) - 1,
                    ),
                )
                .cast("bigint")
            )
            out.append(F.coalesce(cell, F.lit(0).cast("bigint")))
        return out, bits

    def _zorder_expr(self, df: DataFrame, schema: TableSchema, order_by: list[str]):
        """Morton (Z-order) key over ``order_by`` as built-in expressions:
        the grid cells' bits interleave into one BIGINT via shift/and/or
        expressions, so the whole key stays inside whole-stage codegen."""
        cells, bits = self._grid_cells(df, schema, order_by)
        k = len(cells)
        z = F.lit(0).cast("bigint")
        for j, cell in enumerate(cells):
            for i in range(bits):
                z = z.bitwiseOR(
                    F.shiftleft(F.shiftright(cell, i).bitwiseAND(F.lit(1)), i * k + j)
                )
        return z

    def _hilbert_expr(self, df: DataFrame, schema: TableSchema, order_by: list[str]):
        """Hilbert-curve key over ``order_by`` (Paimon ``order_strategy =>
        'hilbert'``): same grid as zorder, but cells map to their distance
        along the Hilbert curve — every curve step moves ONE grid cell in
        ONE dimension (no Morton jumps), so file boxes are tighter for the
        same sort. The bit transform has no shift/or closed form, so the key
        is an Arrow-batched pandas_udf over numpy (vectorized per batch,
        maintenance-path only — the rewrite's shuffle dominates it)."""
        from pyspark.sql.functions import pandas_udf

        cells, bits = self._grid_cells(df, schema, order_by)

        def _hkey(*cols):  # no annotations: varargs type hints unsupported
            import numpy as np
            import pandas as pd

            from incubator_paimon_trino_spark.functions.hilbert import hilbert_index

            arr = np.stack([c.to_numpy(dtype="int64") for c in cols], axis=1)
            return pd.Series(hilbert_index(arr, bits))

        return pandas_udf(_hkey, "bigint")(*cells)

    def compact(
        self,
        db: str,
        table: str,
        order_by: list[str] | None = None,
        strategy: str = "order",
    ) -> int:
        """Rewrite the table's live data into one fresh commit (COMPACT kind).

        The LSM analogue of Paimon's compaction: many small per-commit files
        (and, for PK tables, accumulated changelog rows) collapse into the
        merged state written once. Reads before/after are equivalent; history
        stays time-travelable because old snapshots keep their file lists.

        ``order_by`` is Paimon's sort compaction (``CALL sys.compact(...,
        order_strategy => 'order', order_by => cols)``): the rewrite is
        range-partitioned + sorted on the given columns so every output file
        covers a narrow key range and manifest min/max skipping prunes
        range predicates to a handful of files. On bucketed tables the
        bucket layout is preserved and sorting happens within buckets.

        ``strategy='zorder'`` (Paimon ``order_strategy => 'zorder'``) sorts by
        the interleaved-bit Morton code of ALL ``order_by`` columns instead of
        lexicographically: per-file min/max become tight boxes in EVERY
        dimension, so predicates on any subset of the columns prune — a
        trailing-column predicate under lexicographic order prunes nothing.
        Columns normalize to a 2^bits equal-width grid between their min/max
        (one scalar agg; ``width_bucket``), bits interleave as built-in
        bitwise expressions — everything whole-stage-codegen, no UDF.

        ``strategy='hilbert'`` (Paimon ``order_strategy => 'hilbert'``) sorts
        by the Hilbert-curve distance over the same grid — each curve step
        moves one cell in one dimension (no Morton power-of-two jumps), so
        file boxes are tighter for the same rewrite cost; the key is an
        Arrow-batched numpy transform (``functions/hilbert.py``).
        """
        if strategy not in ("order", "zorder", "hilbert"):
            raise ValueError(
                f"unknown compaction strategy {strategy!r} (have order, zorder, hilbert)"
            )
        if strategy in ("zorder", "hilbert") and (not order_by or len(order_by) < 2):
            raise ValueError(
                f"{strategy} needs >= 2 order_by columns (a single column is "
                "plain sort compaction — use strategy='order')"
            )
        tdir = self._table_dir(db, table)
        schema = self._latest_schema(tdir)
        prev = self._latest_snapshot(tdir)
        if prev is None:
            raise ValueError(f"nothing to compact in {db}.{table}")
        # merged view, STORAGE form — re-storing padded CHAR bytes would
        # break the rtrimmed-canonical invariant predicates and stats rely
        # on; use_fallback=False — compaction rewrites THIS branch's files
        # only (fallback is a scan-time option; committing the fallback
        # branch's rows as main data would permanently shadow the branch)
        merged = self.read_table(f"{db}.{table}", pad_char=False, use_fallback=False)
        version = prev.snapshot_id + 1

        out = merged
        if schema.primary_key:
            # sequence_field tables keep BUSINESS sequence numbers through
            # compaction — stamping the commit id here would let a later
            # business-older insert (large user sequence) overwrite the
            # compacted state, inverting the sequence_field contract.
            out = out.withColumn(KIND_COL, F.lit("I")).withColumn(
                SEQ_COL, _sequence_expr(schema, version)
            )
        if order_by:
            known = {f.name for f in schema.fields}
            bad = [c for c in order_by if c not in known]
            if bad:
                raise ValueError(f"order_by columns not in table: {bad}")
        n_buckets = int(schema.options.get("bucket", "0") or 0)
        bucket_key = schema.options.get("bucket_key") or (
            schema.primary_key[0] if schema.primary_key else None
        )
        # size the rewrite by data volume, not input file count — the whole
        # point of compaction is collapsing many small files, so target
        # ~128 MB outputs (Paimon's target-file-size default).
        target = 128 * 1024 * 1024
        total = sum(f.get("size_bytes", 0) for f in prev.files)
        n_parts = max(1, -(-total // target))
        zcol = "_zorder_key"
        curved = bool(order_by) and strategy in ("zorder", "hilbert")
        if curved:
            key_of = self._zorder_expr if strategy == "zorder" else self._hilbert_expr
            out = out.withColumn(zcol, key_of(out, schema, order_by))
            sort_keys = [F.col(zcol)]
        else:
            sort_keys = [F.col(c) for c in order_by or []]
        if n_buckets > 0 and bucket_key:
            out = out.repartition(n_buckets, F.col(bucket_key))
            if sort_keys:
                out = out.sortWithinPartitions(*sort_keys)
        elif n_buckets == -1:
            # dynamic bucket: re-attach each key's stable bucket from the
            # index (compaction introduces no new keys — every key is
            # already assigned) so the rewrite preserves the bucket layout
            out, _ = self._dynamic_bucket_assign(tdir, schema, out, version)
            out = out.repartition(F.col("_bucket"))
            if sort_keys:
                out = out.sortWithinPartitions(*sort_keys)
        elif sort_keys:
            # honor the table's clustering_partitions pin if set (same knob
            # as write clustering); else size range buckets by volume
            pinned = int(schema.options.get("clustering_partitions", "0") or 0)
            out = out.repartitionByRange(pinned or n_parts, *sort_keys)
            out = out.sortWithinPartitions(*sort_keys)
        else:
            out = out.repartition(n_parts)
        if curved:
            # the curve key ordered the shuffle + sort; it must not land in
            # the files (narrow projection preserves the partition-local sort)
            out = out.drop(zcol)
        staging = self._staging_dir(tdir, version)
        writer = out.write.mode("errorifexists")
        part_cols = list(schema.partition_keys)
        if "_bucket" in out.columns:
            part_cols.append("_bucket")  # finalize renames to bucket-N dirs
        if part_cols:
            writer = writer.partitionBy(*part_cols)
        fmt = schema.options.get("file_format", "PARQUET").upper()
        if fmt not in ("PARQUET", "ORC", "AVRO"):
            raise ValueError(f"unsupported file_format {fmt!r} (have PARQUET, ORC, AVRO)")
        ext = {"ORC": "orc", "AVRO": "avro", "PARQUET": "parquet"}[fmt]
        fb_counts: dict[str, int] | None = None
        try:
            writer.format(ext).save(staging)
        except Exception as ex:
            if ext != "avro" or "Failed to find data source" not in str(ex):
                raise
            fb_counts = self._write_avro_fallback(out, staging, schema)  # module-less
        final_paths = self._finalize_commit(tdir, staging, version, ext)
        files = self._commit_files(tdir, final_paths, ext, schema, fb_counts)
        for e in files:
            # provenance marker: $ro serves exactly the files a compaction
            # wrote. Entry metadata CARRIES FORWARD through later commits'
            # accumulated file lists, so the read-optimized state survives
            # expiry of the COMPACT snapshot JSON itself, and an OVERWRITE
            # (which replaces the whole live set) clears it naturally.
            e["source"] = "compact"
        build_file_indexes(self.spark, final_paths, schema)
        if n_buckets > 0 and bucket_key:
            _record_buckets(files, schema, bucket_key, n_buckets)
        elif n_buckets == -1:
            _record_dynamic_buckets(files)
        n = sum(e["record_count"] for e in files)
        snap = Snapshot(
            snapshot_id=version,
            schema_id=schema.schema_id,
            commit_user=self.commit_user,
            commit_identifier=version,
            commit_kind=COMMIT_COMPACT,
            timestamp_ms=int(time.time() * 1000),
            files=files,  # replaces the live set
            record_count=n,
        )
        # compaction rewrites the live set → one fresh manifest, no bases:
        # this is also the METADATA compaction that keeps long histories'
        # manifest chains short. Exclusive publish = the commit point
        # (CommitConflictError on a concurrent racer, like insert_into);
        # a losing compactor's rewritten files must not linger in data/.
        try:
            self._publish_snapshot(tdir, snap, files, [])
        except CommitConflictError:
            for p in final_paths:
                if os.path.exists(p):
                    os.remove(p)
                _rm_sidecar(p)
            self._prune_empty_dirs(os.path.join(tdir, "data"))
            raise
        return version

    def analyze(self, db: str, table: str) -> dict:
        """ANALYZE TABLE: per-column min/max/null-count/NDV into the table
        metadata — the statistics input the reference never provides to its
        engine (``getTableProperties`` returns empty,
        ``TrinoMetadataBase.java:132-136``); a documented free improvement.
        """
        from pyspark.sql import types as _T  # noqa: PLC0415

        # storage form: ANALYZE min/max must agree with the manifest's
        # file stats (both describe the stored bytes), and the rpad
        # projection would be pure overhead on a full-table scan;
        # use_fallback=False — the stats describe THIS branch's files
        df = self.read_table(f"{db}.{table}", pad_char=False, use_fallback=False)
        aggs = [F.count(F.lit(1)).alias("__rows")]  # one pass, not count()+agg
        scalar_cols = []
        for f in df.schema.fields:
            c = f.name
            aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"))
            if isinstance(f.dataType, (_T.MapType, _T.ArrayType, _T.StructType)):
                # maps are unorderable (min/max/NDV throw DATATYPE_MISMATCH)
                # and array/struct extremes are meaningless as stats — a
                # complex column records null_count only, like Paimon's
                # colstats, instead of making the whole table unanalyzable
                continue
            scalar_cols.append(c)
            aggs += [
                F.min(c).cast("string").alias(f"{c}__min"),
                F.max(c).cast("string").alias(f"{c}__max"),
                F.approx_count_distinct(c).alias(f"{c}__ndv"),
            ]
        row = df.agg(*aggs).collect()[0].asDict()
        tdir = self._table_dir(db, table)
        snap = self._latest_snapshot(tdir)
        stats = {
            "row_count": int(row["__rows"] or 0),
            # which version the stats describe (staleness is observable), and
            # the live byte size from commit metadata — the CBO input sql()
            # uses for its broadcast decision (see _broadcast_by_stats)
            "snapshot_id": snap.snapshot_id if snap else 0,
            "total_size_bytes": sum(f.get("size_bytes", 0) for f in (snap.files if snap else [])),
            "columns": {},
        }
        for f in df.schema.fields:
            scalar = f.name in scalar_cols
            stats["columns"][f.name] = {
                "min": row[f"{f.name}__min"] if scalar else None,
                "max": row[f"{f.name}__max"] if scalar else None,
                "null_count": int(row[f"{f.name}__nulls"] or 0),
                "ndv": int(row[f"{f.name}__ndv"] or 0) if scalar else 0,
            }
        write_json_atomic(os.path.join(tdir, "stats.json"), stats)
        return stats

    def stats_of(self, db: str, table: str) -> dict | None:
        p = os.path.join(self._table_dir(db, table), "stats.json")
        return read_json(p) if os.path.exists(p) else None

    def _broadcast_by_stats(self, db: str, table: str, df: DataFrame) -> DataFrame:
        """Statistics → plan decision (the CBO input the reference never
        provides — ``getTableProperties`` returns empty,
        ``TrinoMetadataBase.java:132-136``): a table whose ANALYZE-recorded
        byte size fits under ``spark.sql.autoBroadcastJoinThreshold`` gets a
        broadcast hint, so joins against it plan as BroadcastHashJoin at
        COMPILE time. Spark's own size estimate cannot see through the
        merge-on-read plan (a groupBy's output defaults to a huge estimate),
        so for PK tables AQE would otherwise only discover the broadcast at
        runtime, after a wasted shuffle-write of the big side.

        Staleness guard: stats describe ``stats.snapshot_id``; if the table
        has grown since (live commit-metadata size now over 4x the recorded
        size), the hint is withheld rather than broadcasting a formerly-small
        table that is no longer small.
        """
        st = self.stats_of(db, table)
        if not st:
            return df
        thr = _parse_byte_conf(
            self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        )
        size = int(st.get("total_size_bytes", 0) or 0)
        if thr <= 0 or size <= 0 or size > thr:
            return df
        snap = self._latest_snapshot(self._table_dir(db, table))
        if snap is not None and snap.snapshot_id != st.get("snapshot_id"):
            live = sum(f.get("size_bytes", 0) for f in snap.files)
            if live > 4 * size or live > thr:
                return df
        return df.hint("broadcast")

    # ---------------------------------------------------------------- reads
    def _pin_snapshot(
        self,
        tdir: str,
        version_as_of: int | None,
        timestamp_as_of: int | None,
        tag: str | None,
    ) -> Snapshot | None:
        """Resolve the snapshot a read is pinned to (A11/A12 semantics)."""
        if tag is not None:
            if version_as_of is not None or timestamp_as_of is not None:
                raise ValueError("tag is mutually exclusive with version/timestamp pins")
            version_as_of = self._tags(tdir).get(tag)
            if version_as_of is None:
                raise ValueError(f"no tag {tag!r} on {tdir}")

        # A12 session-property time travel: Trino's `scan_snapshot_id` /
        # `scan_timestamp_millis` session props are copied into dynamic table
        # options on every read (TrinoSessionProperties.java:36-77,
        # TrinoTableHandle.java:128-142). Spark's session-scoped equivalent
        # is spark.conf; explicit per-read arguments win over session props.
        if version_as_of is None and timestamp_as_of is None:
            conf_ver = self.spark.conf.get("spark.paimon.scan.snapshot-id", None)
            conf_ts = self.spark.conf.get("spark.paimon.scan.timestamp-millis", None)
            if conf_ver is not None:
                version_as_of = int(conf_ver)
            elif conf_ts is not None:
                timestamp_as_of = int(conf_ts)

        snaps = self._snapshots(tdir)
        if version_as_of is not None:
            match = [s for s in snaps if s.snapshot_id == version_as_of]
            if not match:
                raise ValueError(f"no snapshot {version_as_of} (have {[s.snapshot_id for s in snaps]})")
            snap = match[0]
        elif timestamp_as_of is not None:
            older = [s for s in snaps if s.timestamp_ms <= timestamp_as_of]
            if not older:
                raise ValueError(f"no snapshot at or before {timestamp_as_of}")
            snap = older[-1]
        else:
            snap = snaps[-1] if snaps else None
        return snap

    def _dynamic_bucket_assign(
        self, tdir: str, schema: TableSchema, out: DataFrame, version: int
    ) -> tuple[DataFrame, str | None]:
        """Dynamic bucket mode (Paimon ``bucket = -1`` on PK tables): every
        key gets a STABLE bucket from a maintained key→bucket index; new keys
        fill buckets sequentially so each holds at most
        ``dynamic-bucket.target-row-num`` keys — bucket count GROWS with the
        table instead of being fixed at DDL time (the fixed-bucket
        resize/rescale problem this mode exists to avoid).

        The index lives as parquet under ``index/dynamic-bucket/`` — written
        and read by Spark jobs, never materialized on the driver (Paimon's
        writers load it into task memory; at 100 TB ours stays a distributed
        hash join of the batch against the index). Assignment of new keys is
        the two-pass global-rank recipe (per-partition row_number + broadcast
        offsets — no single-task sort): bucket = (existing_keys + rank) //
        target. Exact bucket composition is not replay-deterministic (rank
        partitioning isn't), but the INVARIANTS queries rely on are: one
        bucket per key, stable across commits, ≤ target keys per bucket.

        Returns ``out`` with a ``_bucket`` column (the writer turns it into
        Paimon's ``bucket-N`` directory layer) and the index-delta directory
        this commit wrote (for conflict cleanup), or None if no new keys.
        """
        from pyspark.sql import Window

        pk = schema.primary_key
        target = int(schema.options.get("dynamic_bucket_target_row_num", "2000000") or 0)
        if target <= 0:
            raise ValueError("dynamic-bucket.target-row-num must be a positive integer")
        idx_dir = os.path.join(tdir, "index", "dynamic-bucket")
        idx_ddl = ", ".join(f"{k} {schema.field_by_name(k).type}" for k in pk) + ", _bucket int"
        idx_files = glob.glob(os.path.join(idx_dir, "*", "*.parquet"))
        if idx_files:
            idx = self.spark.read.schema(idx_ddl).parquet(*idx_files)
        else:
            idx = self.spark.createDataFrame([], idx_ddl)
        keys = out.select(*pk).dropDuplicates()
        looked_up = keys.join(idx, pk, "left").persist()
        try:
            # n0 = TOTAL keys ever assigned (cumulative fill position), not
            # just this batch's matches: bucket b holds exactly the keys
            # whose global assignment index fell in [b·target, (b+1)·target)
            n0 = idx.count()
            new_keys = looked_up.filter(F.col("_bucket").isNull()).select(*pk)
            delta_dir: str | None = None
            if new_keys.isEmpty():
                amap = looked_up.filter(F.col("_bucket").isNotNull())
            else:
                tagged = new_keys.withColumn("_pid", F.spark_partition_id()).persist()
                try:
                    counts = {r._pid: r["count"] for r in tagged.groupBy("_pid").count().collect()}
                    off, acc = {}, 0
                    for pid in sorted(counts):
                        off[pid] = acc
                        acc += counts[pid]
                    off_col = F.element_at(
                        F.create_map(
                            *[F.lit(x) for kv in sorted(off.items()) for x in kv]
                        ),
                        F.col("_pid"),
                    )
                    w = Window.partitionBy("_pid").orderBy(*pk)
                    assigned = (
                        tagged.withColumn(
                            "_rank", F.row_number().over(w) - 1 + off_col
                        )
                        .withColumn(
                            "_bucket",
                            ((F.col("_rank") + F.lit(n0)) / F.lit(target)).cast("int"),
                        )
                        .select(*pk, "_bucket")
                    )
                    delta_dir = os.path.join(idx_dir, f"commit-{version}-{uuid.uuid4().hex[:8]}")
                    assigned.write.parquet(delta_dir)
                finally:
                    tagged.unpersist()
                written = self.spark.read.schema(idx_ddl).parquet(delta_dir)
                amap = looked_up.filter(F.col("_bucket").isNotNull()).unionByName(written)
            # every batch key now has a bucket; the join is PK-equi and the
            # assignment side is exactly this batch's keys (small relative
            # to the table), so Catalyst broadcast/shuffle-hash picks apply
            return out.join(amap, pk, "inner"), delta_dir
        finally:
            looked_up.unpersist()

    def _bucket_prune(self, schema: TableSchema, predicate: list | None, files: list[dict]) -> list[dict]:
        """Hash-bucket file skipping for point lookups (Paimon's bucket
        pruning): an equality/IN predicate on the bucket key touches only
        ``pmod(murmur3(v), n)`` — at 100 TB a PK point query opens 1/n of
        the files BEFORE min/max stats even run. Files without recorded
        bucket info (pre-bucketing commits, layout drift) are kept."""
        pinned = _bucket_prune_values(predicate, schema)
        if pinned is None or not any("bucket" in e for e in files):
            return files
        fid, values = pinned
        if schema.primary_key:
            # on a PK table only PK columns are version-stable — a value
            # column can change across versions of one key, scattering them
            # over buckets, so pruning on it would drop history pre-merge
            pk_ids = {schema.field_by_name(k).id for k in schema.primary_key}
            if fid not in pk_ids:
                return files
        layouts = {
            e["bucket_n"]
            for e in files
            # bucket_n <= 0 = dynamic layout: the id came from the index,
            # not a hash — pmod(hash(v), n) says nothing about it
            if "bucket" in e and e.get("bucket_fid") == fid and e.get("bucket_n", 0) > 0
        }
        if not layouts:
            return files
        ddl = next(f.type for f in schema.fields if f.id == fid)
        # one tiny driver-side job evaluates Spark's own hash → no chance of
        # a Python reimplementation drifting from the JVM partitioner
        exprs = [
            F.pmod(F.hash(F.lit(v).cast(ddl)), F.lit(n)).alias(f"b_{n}_{i}")
            for n in sorted(layouts)
            for i, v in enumerate(values)
        ]
        row = self.spark.range(1).select(*exprs).collect()[0].asDict()
        allowed = {
            (n, row[f"b_{n}_{i}"]) for n in sorted(layouts) for i in range(len(values))
        }
        return [
            e
            for e in files
            if "bucket" not in e
            or e.get("bucket_fid") != fid
            or (e["bucket_n"], e["bucket"]) in allowed
        ]

    def scan_plan(
        self,
        name: str,
        predicate: list | None = None,
        version_as_of: int | None = None,
        timestamp_as_of: int | None = None,
        tag: str | None = None,
        limit: int | None = None,
    ) -> list[dict]:
        """The ``newScan().plan()`` equivalent: manifest entries a read with
        this predicate must touch, after min/max + partition-value skipping
        (``catalog/scan.py``). Metadata-only — no data file is opened.

        ``limit`` mirrors ``readBuilder.withLimit`` via the reference's
        applyLimit guard (``TrinoMetadataBase.java:418-445``): the file list
        is truncated only when every predicate column is a partition key whose
        value fully decides each surviving file (so kept files contain ONLY
        matching rows) and the table is append-only (merge-on-read could
        collapse rows, under-producing). Never "guaranteed" — callers must
        still re-apply the row limit, as the Trino engine does."""
        db, _, table = name.partition(".")
        tdir = self._table_dir(db, table)
        schema = self._latest_schema(tdir)
        snap = self._pin_snapshot(tdir, version_as_of, timestamp_as_of, tag)
        if snap is None:
            return []
        files = self._pruned_files(tdir, schema, snap, predicate)
        if limit is not None and _limit_pushable(schema, predicate, files):
            files = _limit_file_prefix(files, limit)
        return files

    def split_weights(
        self, name: str, predicate: list | None = None, min_weight: float = 0.05
    ) -> list[dict]:
        """``scan_plan`` entries with the reference's split weights attached:
        ``clamp(rowCount / maxRowCount, minimumSplitWeight, 1.0)`` where
        maxRowCount is the largest split's row count — the exact formula and
        0.05 default of ``common/TrinoSplitManagerBase.java:50-63`` and the
        ``minimum_split_weight`` session property
        (``common/TrinoSessionProperties.java:57-59``). Weights let a
        scheduler pack many small splits per task without starving large
        ones; in Spark the analogous knob is ``files.maxPartitionBytes``
        bin-packing, but the weights are exposed for parity and for
        task-sizing diagnostics. A file without footer stats weighs 1.0
        (conservative: never under-schedule an unknown split).
        """
        if not 0.0 < min_weight <= 1.0:
            raise ValueError(f"min_weight must be in (0, 1], got {min_weight}")
        files = self.scan_plan(name, predicate=predicate)
        counts = [f.get("record_count") for f in files]
        max_rc = max((c for c in counts if c), default=0)
        out = []
        for f, rc in zip(files, counts):
            w = 1.0 if rc is None or max_rc == 0 else min(max(rc / max_rc, min_weight), 1.0)
            out.append({**f, "split_weight": round(w, 6)})
        return out

    def _pruned_files(
        self, tdir: str, schema: TableSchema, snap: Snapshot, predicate: list | None
    ) -> list[dict]:
        """The predicate-pruned manifest entries — the shared prune behind
        ``scan_plan`` and ``metadata_row_count`` (already-loaded metadata in,
        so the metadata fast paths don't re-read snapshot/schema JSON)."""
        files = snap.files
        if predicate:
            # same CHAR(n) pad-insensitive normalization as read_table — a
            # padded literal must not prune files holding the rtrimmed form
            char_cols = {f.name for f in schema.fields if char_length(f.type) is not None}
            if char_cols:
                from incubator_paimon_trino_spark.functions.predicates import (
                    normalize_char_domains,
                )

                predicate = normalize_char_domains(predicate, char_cols)
            files = prune_files(files, predicate, schema, lambda sid: self._schema(tdir, sid))
            files = self._bucket_prune(schema, predicate, files)
            files = prune_files_by_index(self.spark, tdir, files, predicate, schema)
        return files

    def scan_pruned_by_keys(
        self,
        name: str,
        column: str,
        keys: DataFrame,
        max_keys: int = 1024,
        predicate: list | None = None,
    ) -> DataFrame:
        """Dynamic FILE pruning — the file-level twin of dynamic partition
        pruning (the reference's own unimplemented TODO,
        ``common/TrinoSplitManagerBase.java:38-39``): before scanning
        ``name``, collect the build side's DISTINCT join keys and push them
        as an IN-domain through every file-skipping rung — manifest min/max,
        bucket pruning, and the bloom/bitmap file-index sidecars — so an
        equi-join against a small dimension opens only the fact files that
        can hold a matching key.

        The collect is bounded by ``max_keys`` (LIMIT max_keys+1; above the
        bound the plain scan returns unchanged): the build side being tiny is
        the same smallness contract that makes it the broadcast side of the
        join, so the driver holds at most ``max_keys`` scalars. NULL keys are
        dropped — they never match an equi-join.
        """
        from incubator_paimon_trino_spark.functions.predicates import ColumnDomain

        vals = [
            r[0]
            for r in keys.select(column)
            .where(F.col(column).isNotNull())
            .distinct()
            .limit(max_keys + 1)
            .collect()
        ]
        if not vals or len(vals) > max_keys:
            return self.read_table(name, predicate=predicate)
        dom = [ColumnDomain(column, in_values=vals)] + list(predicate or [])
        return self.read_table(name, predicate=dom)

    def read_table(
        self,
        name: str,
        version_as_of: int | None = None,
        timestamp_as_of: int | None = None,
        with_system_columns: bool = False,
        tag: str | None = None,
        predicate: list | None = None,
        limit: int | None = None,
        pad_char: bool = True,
        use_fallback: bool = True,
    ) -> DataFrame:
        """Read ``db.table`` (or ``db.table$system``) as a DataFrame.

        ``pad_char=False`` (internal) returns CHAR columns in their
        rtrimmed STORAGE form instead of the user-facing n-padded form:
        the write paths (compaction must not re-store padded bytes) and
        DML condition evaluation (an unpadded literal in an UPDATE/DELETE
        condition must keep matching, as before r9) read through this.

        - ``version_as_of=n``    — pin snapshot n (``FOR VERSION AS OF`` /
          ``scan.snapshot-id`` — ``TrinoMetadata.java:102-108``)
        - ``timestamp_as_of=ms`` — latest snapshot with commit ts ≤ ms
          (``FOR TIMESTAMP AS OF`` / ``scan.timestamp-millis`` — ``:82-100``)
        - PK tables are merged-on-read unless ``with_system_columns`` (which
          exposes the raw changelog incl. ``_seq``/``_row_kind``).
        - ``predicate=[ColumnDomain...]`` — the pushed filter (A4/A5): files
          the conjunction cannot match are skipped at the manifest
          (``scan_plan``), and the full predicate is re-applied to the
          merged rows, mirroring the reference's pushed-then-re-applied
          ``executeFilter()`` contract.
        - ``limit=n`` — pushed to the manifest under the A8 guard
          (``TrinoMetadataBase.java:418-445``: partition-only filters,
          append-only table) so a LIMIT 10 on a million-file table opens a
          handful of files; always re-applied as ``df.limit(n)`` because the
          pushdown is never "guaranteed".
        """
        db, _, rest = name.partition(".")
        table, _, suffix = rest.partition("$")
        if suffix.startswith("branch_"):
            # t$branch_b reads the branch; t$branch_b$snapshots etc. compose
            br, _, sub = suffix.partition("$")
            table, suffix = f"{table}${br}", sub
        if suffix:
            return self._system_table(db, table, suffix)
        tdir = self._table_dir(db, table)
        schema = self._latest_schema(tdir)
        fb = schema.options.get("scan_fallback_branch")
        if (
            use_fallback
            and fb
            and "$branch_" not in table  # branch reads never re-fall-back
            and version_as_of is None
            and timestamp_as_of is None
            and tag is None
            and not with_system_columns
            and schema.partition_keys
        ):
            # scan.fallback-branch (Paimon CoreOption): partitions absent
            # from the CURRENT branch are served from the fallback branch —
            # the batch/stream dual-write pattern where main backfills
            # partitions the streaming branch hasn't produced yet (or vice
            # versa). Composition: the main read (fallback disabled) union
            # the branch read left-semi-joined to the missing partitions —
            # the partition diff is manifest metadata, the semi join is a
            # broadcast of partition tuples, and each side runs its own
            # full merge independently (sound: the partition sets are
            # disjoint by construction, and partitioned PK tables co-locate
            # a key's versions within its partition).
            return self._fallback_branch_union(
                db, table, fb, schema, predicate, limit, pad_char
            )
        snap = self._pin_snapshot(tdir, version_as_of, timestamp_as_of, tag)
        if predicate:
            # CHAR(n) predicate literals are pad-insensitive (stored form is
            # rtrimmed — see insert_into)
            char_cols = {f.name for f in schema.fields if char_length(f.type) is not None}
            if char_cols:
                from incubator_paimon_trino_spark.functions.predicates import (
                    normalize_char_domains,
                )

                predicate = normalize_char_domains(predicate, char_cols)
        if snap is not None and predicate:
            pruned = prune_files(
                snap.files, predicate, schema, lambda sid: self._schema(tdir, sid)
            )
            pruned = self._bucket_prune(schema, predicate, pruned)
            # file-index probe (bloom/bitmap sidecars) — the rung after
            # min/max and bucket pruning: equality/IN on indexed columns
            # drops files whose sidecar proves the value(s) absent
            pruned = prune_files_by_index(self.spark, tdir, pruned, predicate, schema)
            snap = dataclasses.replace(snap, files=pruned)
        if snap is not None and limit is not None and _limit_pushable(schema, predicate, snap.files):
            snap = dataclasses.replace(snap, files=_limit_file_prefix(snap.files, limit))

        if snap is None or not snap.files:
            empty = schema.spark_schema()
            if schema.primary_key and with_system_columns:
                from pyspark.sql import types as T

                empty = empty.add(SEQ_COL, T.LongType()).add(KIND_COL, T.StringType())
            return self.spark.createDataFrame([], empty)

        dv_mode = self._dv_enabled(schema) and not with_system_columns
        # dv_marks == 0 (every DV commit records the cumulative count in
        # the snapshot) skips the whole anti-join + position columns in
        # O(1) — most DV-table snapshots carry no marks at all. None =
        # legacy snapshot without the count: assume marks (old behavior).
        has_dv = bool(dv_mode and snap.dv and snap.dv_marks != 0)
        df = self._read_files(tdir, schema, snap, with_pos=has_dv)
        if dv_mode:
            # deletion-vector read: scan − DV IS the merged state (every
            # superseded row version is position-marked at write time and
            # -D rows are never stored), so the whole merge-on-read
            # groupBy/shuffle disappears — filters and projections push
            # straight into the file scan. The marks side is a Spark read
            # of the committed index (r8: never a driver dict — see
            # _dv_apply_distributed). with_system_columns still exposes
            # the raw unfiltered changelog view, like non-DV tables.
            if has_dv:
                df = self._dv_apply_distributed(df, tdir, snap)
            df = df.select(*[f.name for f in schema.fields])
        elif (
            schema.primary_key
            and not with_system_columns
            and snap.files
            and all(e.get("source") == "compact" for e in snap.files)
        ):
            # FULLY-COMPACTED fast path (r10, found by bench_lake: the
            # merge was 7.6x a raw scan): when every live file is
            # compaction output and nothing was committed since, the
            # stored rows ARE the merged state — unique keys, no -D rows —
            # so the whole groupBy/shuffle disappears and filters and
            # projections push straight into the file scan. Zero
            # staleness, unlike $ro: this is the pinned snapshot's own
            # live set. Later appends add non-compact files and the
            # condition goes false.
            df = df.select(*[f.name for f in schema.fields])
        elif schema.primary_key and not with_system_columns:
            from incubator_paimon_trino_spark.operators.merge_on_read import merge_on_read

            aggs = _field_aggregate_specs(schema.options)
            col_names = {f.name for f in schema.fields}
            default_agg = None
            if "default" in aggs and "default" not in col_names:
                # fields.default-aggregate-function (a real column named
                # 'default' outranks the fallback reading — DDL-validated)
                default_agg = aggs.pop("default")
            seq_field = schema.options.get("sequence_field")
            if (
                schema.options.get("merge_engine") == "aggregation"
                and seq_field
                and seq_field not in aggs
                and seq_field not in schema.primary_key
            ):
                # the sequence column orders merges — it must NEVER default
                # to the numeric 'sum' (two inserts ts=100,101 would merge
                # to ts=201, and compaction would re-stamp rows with that
                # garbage sequence, silently outranking later real inserts)
                aggs[seq_field] = "last_value"
            for c in _collect_distinct_cols(schema.options):
                if aggs.get(c) == "collect":  # DDL-validated; internal variant name
                    aggs[c] = "collect_distinct"
            # retraction-free proof from the manifest: every live file's
            # parquet footer showed _row_kind min==max=='I' (collect_file_
            # stats records `all_inserts`; absent = unknown = assume
            # retractions). O(live files) driver work on metadata already in
            # hand; unlocks the one-struct-per-key fast paths in the order-
            # sensitive replay aggregates. Compaction rewrites everything as
            # 'I', so tables return to the fast path after compaction.
            no_d = all(e.get("all_inserts") is True for e in snap.files)
            merge_kwargs = dict(
                primary_key=schema.primary_key,
                merge_engine=schema.options.get("merge_engine", "deduplicate"),
                field_aggregates=aggs,
                sequence_groups=_sequence_group_specs(schema.options) or None,
                nested_keys=_nested_key_specs(schema.options) or None,
                default_aggregate=default_agg,
                no_retractions=no_d,
                remove_record_on_delete=(
                    schema.options.get("partial_update_remove_record_on_delete", "")
                    .strip()
                    .lower()
                    == "true"
                ),
                ignore_retract=_ignore_retract_cols(schema.options) or None,
            )
            split = self._delta_base_split(tdir, schema, snap)
            if split is not None:
                # DELTA-vs-BASE merge (r10, found by bench_lake: the full
                # merge was 7.6x a raw scan): compaction output has unique
                # keys and no -D rows, so only keys TOUCHED since the last
                # compaction need the merge at all. The base splits on a
                # broadcast of the (small, manifest-counted) delta's keys:
                # untouched base rows pass through scan-direct, touched
                # ones join the delta in the merge — the groupBy shuffles
                # the delta's key set, not the table.
                base, delta = split
                user_cols = [f.name for f in schema.fields]
                dkeys = F.broadcast(
                    delta.select(
                        *[F.col(k).alias(f"_dk_{k}") for k in schema.primary_key]
                    ).distinct()
                )
                # null-safe equality: the split must group exactly like the
                # full merge's groupBy (which puts null keys in one group)
                cond = None
                for k in schema.primary_key:
                    c = base[k].eqNullSafe(dkeys[f"_dk_{k}"])
                    cond = c if cond is None else cond & c
                untouched = base.join(dkeys, cond, "left_anti")
                touched = base.join(dkeys, cond, "left_semi")
                merged = merge_on_read(touched.unionByName(delta), **merge_kwargs)
                df = untouched.select(*user_cols).unionByName(
                    merged.select(*user_cols)
                )
            else:
                df = merge_on_read(df, **merge_kwargs)
            # schema column order (merge_on_read returns PK-first) so reads
            # before/after the first commit and across tables are positional-
            # union safe
            df = df.select(*[f.name for f in schema.fields])
        elif not with_system_columns:
            df = df.select(*[f.name for f in schema.fields])
        if predicate:
            from incubator_paimon_trino_spark.functions.predicates import apply_tuple_domain

            df = apply_tuple_domain(df, predicate)
        if limit is not None:
            df = df.limit(limit)  # engine re-limits — pushdown is a hint (A8)
        if not with_system_columns and pad_char:
            # CHAR(n) padded OUTPUT (r9 — retires the last §1.3 fidelity
            # delta, TrinoTypeUtils.java:77-90): storage stays the rtrimmed
            # canonical form (equality, file stats, groupBy keys, and the
            # pad-insensitive predicate normalization above all work on
            # it), and the declared length pads back on only at the very
            # END of the read — after predicates, which were normalized to
            # the storage form. A CHAR(3) 'ab' now reads as 'ab ', like
            # the reference. System-column views (changelog/audit) and
            # internal pad_char=False reads (compaction, DML condition
            # evaluation) stay in storage form — declared metadata lives
            # in the catalog.
            df = _pad_char_columns(df, schema)
        return df

    def _fallback_branch_union(
        self,
        db: str,
        table: str,
        fb: str,
        schema: TableSchema,
        predicate: list | None,
        limit: int | None,
        pad_char: bool,
    ) -> DataFrame:
        """``scan.fallback-branch`` composition (see read_table): main read ∪
        (branch read ⋉ missing partitions). Metadata-only partition diff; the
        semi join broadcasts one row per missing partition. Fallback
        partitions whose partition value is NULL are never served (a semi
        join cannot match null keys) — documented conservative gap."""
        known = self._branches(self._table_dir(db, table))
        if fb not in known:
            raise ValueError(
                f"scan.fallback-branch {fb!r}: no such branch on {db}.{table} "
                f"(have {sorted(known)})"
            )
        pkeys = list(schema.partition_keys)
        main_df = self.read_table(
            f"{db}.{table}", predicate=predicate, pad_char=pad_char, use_fallback=False
        )
        bdir = self._table_dir(db, f"{table}$branch_{fb}")
        bsnap = self._latest_snapshot(bdir)
        out = main_df
        if bsnap is not None and bsnap.files:
            tdir = self._table_dir(db, table)
            msnap = self._latest_snapshot(tdir)
            part_of = lambda e: tuple(partition_values(e["path"]).get(k) for k in pkeys)  # noqa: E731
            cur = {part_of(e) for e in (msnap.files if msnap else [])}
            missing = sorted({part_of(e) for e in bsnap.files} - cur, key=str)
            missing = [t for t in missing if all(v is not None for v in t)]
            if missing:
                fb_df = self.read_table(
                    f"{db}.{table}$branch_{fb}", predicate=predicate, pad_char=pad_char
                )
                ddl_of = {f.name: f.type for f in schema.fields}
                raw_cols = [f"_raw_{i}" for i in range(len(pkeys))]
                mdf = self.spark.createDataFrame(
                    missing, ", ".join(f"{c} string" for c in raw_cols)
                ).select(
                    *[
                        F.col(c).cast(castable_ddl(ddl_of[k])).alias(k)
                        for c, k in zip(raw_cols, pkeys)
                    ]
                )
                fb_df = fb_df.join(F.broadcast(mdf), pkeys, "left_semi")
                out = main_df.unionByName(fb_df)
        if limit is not None:
            out = out.limit(limit)
        return out

    def _read_files(
        self, tdir: str, schema: TableSchema, snap: Snapshot, with_pos: bool = False
    ) -> DataFrame:
        """Union snapshot files, mapping columns by FIELD ID per file schema.

        Files are grouped by the schema they were written under; each group is
        read with that schema, columns renamed old→current by field id,
        dropped fields discarded, added fields filled with NULL — then
        unioned. This is exactly the reference's evolution contract (A18):
        rename must not orphan data.

        ``with_pos`` appends the file provenance columns the deletion-vector
        machinery joins on: ``__dv_file`` (``_metadata.file_path``) and
        ``__dv_pos`` (``_metadata.row_index`` — the row's ordinal within its
        file, Spark's native row-position metadata; no shuffle, no window).
        """
        # group ALSO by resolved data root: a branch snapshot mixes files it
        # inherited from the parent table ("../../data/...") with its own
        # commits ("data/..."), and Catalyst's partition-directory inference
        # needs basePath to be each file's OWN data root (partition dir
        # values are URL-quoted at write time, so "/data/" cannot appear
        # inside a partition segment — rsplit is unambiguous)
        groups: dict[tuple[int, str, str], list[str]] = {}
        for f in snap.files:
            full = os.path.normpath(os.path.join(tdir, f["path"]))
            root = full.rsplit(f"{os.sep}data{os.sep}", 1)[0] + f"{os.sep}data"
            key = (f["schema_id"], f.get("format", "parquet"), root)
            groups.setdefault(key, []).append(full)
        current = {f.id: f for f in schema.fields}
        parts: list[DataFrame] = []
        is_pk = bool(schema.primary_key)
        for (sid, fmt, root), paths in sorted(groups.items()):
            old = self._schema(tdir, sid)
            # Partition columns come from Catalyst's directory inference: the
            # data/<k=v>/c<commit>-<file> layout keeps k=v dirs LAST for every
            # commit, so a plan mixing commits is still one consistent scan
            # node AND partition predicates prune at the file listing
            # (PartitionFilters) — the reference's "enforced" partition
            # domain behavior (TrinoMetadataBase.java:363-376) for free.
            # .format().load(list) — DataFrameReader.orc() has no varargs
            # (its 2nd positional is mergeSchema), unlike .parquet().
            try:
                df = (
                    self.spark.read.option("basePath", root)
                    .schema(_physical_schema(old, is_pk))
                    .format(fmt)
                    .load(paths)
                )
            except Exception as ex:
                if fmt != "avro" or "Failed to find data source" not in str(ex):
                    raise
                if with_pos:
                    # unreachable from DV paths (DV requires parquet at
                    # create time) — loud beats a missing-_metadata trace
                    raise ValueError(
                        "positional (row_index) reads need the native "
                        "parquet/orc readers; avro has none"
                    ) from ex
                df = self._read_avro_fallback(paths, old, is_pk)
            if sid == schema.schema_id and not schema.partition_keys:
                # no evolution between write and read (the common case):
                # the physical schema IS the current schema — skip the
                # per-column cast/alias projection, which was pure py4j
                # chatter (bench_lake r10: plan BUILD was half the DV
                # read's wall time, dominated by expression round trips).
                # Partitioned tables keep the projection: directory
                # inference appends partition columns at the END, so the
                # select also restores declared column order there.
                if with_pos:
                    df = df.withColumns(
                        {
                            _DV_FILE: F.col("_metadata.file_path"),
                            _DV_POS: F.col("_metadata.row_index"),
                        }
                    )
                parts.append(df)
                continue
            cols = []
            for fid, cur in sorted(current.items()):
                old_field = next((of for of in old.fields if of.id == fid), None)
                # castable_ddl: TIMESTAMP(p) declarations cast as their
                # timestamp_ntz storage type (Spark's cast parser refuses
                # precision suffixes)
                if old_field is None:
                    cols.append(F.lit(None).cast(castable_ddl(cur.type)).alias(cur.name))
                else:
                    cols.append(
                        F.col(old_field.name).cast(castable_ddl(cur.type)).alias(cur.name)
                    )
            if is_pk:
                cols += [F.col(SEQ_COL), F.col(KIND_COL)]
            if with_pos:
                cols += [
                    F.col("_metadata.file_path").alias(_DV_FILE),
                    F.col("_metadata.row_index").alias(_DV_POS),
                ]
            parts.append(df.select(*cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # ------------------------------------------------ metadata aggregation
    def metadata_row_count(self, name: str, predicate: list | None = None) -> int | None:
        """COUNT(*) answered from MANIFESTS alone, or None when only a scan
        can answer exactly. The reference pushes no aggregation at all (no
        ``applyAggregation`` in ``common/TrinoMetadataBase.java`` — its
        count(*) reads every row); here a count over a million-file table
        is a metadata read when:

        - append-only table, predicate absent or partition-only with every
          surviving file EXACTLY decided by its partition values (the A8
          ``_limit_pushable`` guard — same soundness condition), and every
          manifest entry carries a footer record count; or
        - deletion-vector PK table with no predicate: ``record_count`` is
          maintained as the LIVE row count (inserts + upserts − marks), so
          the snapshot answers in O(1).

        Merge-on-read PK tables (without DV) return None — merging changes
        the count, so only the merged plan is exact.
        """
        db, _, table = name.partition(".")
        tdir = self._table_dir(db, table)
        schema = self._latest_schema(tdir)
        snap = self._latest_snapshot(tdir)
        if snap is None:
            return 0
        if schema.primary_key:
            if self._dv_enabled(schema) and not predicate:
                return int(snap.record_count)
            return None
        # the SHARED prune (scan_plan's), not a re-implementation: it applies
        # the same CHAR(n) pad-insensitive domain normalization as read_table
        # (a padded literal must prune to the rtrimmed stored form, not to
        # zero files — a silent wrong 0). Its extra bucket pruning is
        # harmless here: bucket keys are non-partition columns, which
        # _limit_pushable rejects below before any count is summed.
        files = self._pruned_files(tdir, schema, snap, predicate)
        if not _limit_pushable(schema, predicate, files):
            return None
        counts = [f.get("record_count") for f in files]
        if any(c is None for c in counts):
            return None  # a file without footer stats → only the scan knows
        return int(sum(counts))

    def count_star(self, name: str, predicate: list | None = None) -> DataFrame:
        """One-row ``cnt`` DataFrame: the metadata count when manifests can
        answer exactly (no file opened), else the regular scan plan."""
        n = self.metadata_row_count(name, predicate)
        if n is not None:
            return self.spark.createDataFrame([(n,)], "cnt bigint")
        return self.read_table(name, predicate=predicate).agg(
            F.count(F.lit(1)).alias("cnt")
        )

    #: column DDL prefixes whose manifest min/max are EXACT by construction —
    #: strings/binary are excluded because parquet writers may truncate long
    #: values' footer min/max (the same distrust as scan.py's _MAX_STR_STAT
    #: guard; a truncated max is merely loose for pruning but WRONG as an
    #: answer), and complex types never carry stats.
    _MINMAX_EXACT_TYPES = (
        "tinyint", "smallint", "int", "integer", "bigint", "long", "short",
        "byte", "float", "double", "real", "decimal", "date", "timestamp",
        "boolean",
    )

    def metadata_min_max(
        self, name: str, columns: list[str], predicate: list | None = None
    ) -> dict[str, dict] | None:
        """MIN(col)/MAX(col)/COUNT(col) answered from MANIFESTS alone, or
        None when only a scan is exact — the completion of the r6 metadata
        aggregation (``metadata_row_count`` above): the per-file min/max/
        null-count stats that already drive scan pruning are summable into
        the exact global extremes under the soundness conditions

        - append-only table (merge-on-read and DV marks change live values a
          file's footer cannot see), with the predicate absent or
          partition-only and EXACTLY decided per surviving file — the same
          A8 ``_limit_pushable`` guard as the count pushdown;
        - every requested column has a numeric/date/timestamp/boolean/decimal
          type (``_MINMAX_EXACT_TYPES`` — string footer stats may be
          writer-truncated, so they prune but never answer) and EVERY
          surviving file carries a stats entry for it (one stats-missing
          file → the scan knows, we don't), or is a partition column (exact
          values live in the path, no footer involved);
        - a file that is provably all-null for the column (stats present,
          min/max None) contributes nothing to MIN/MAX and zero to
          COUNT(col) — matching SQL's null-ignoring aggregates.

        Returns ``{column: {"min", "max", "count"}}`` with min/max in the
        normalized manifest representation (ints/floats native; decimals and
        date/timestamps as their canonical strings — ``scan._norm``'s form);
        min/max are None when every row is null. The reference pushes no
        aggregation at all (no ``applyAggregation`` in
        ``common/TrinoMetadataBase.java``); engines it plugs into answer
        these from stats, and at 100 TB this is a metadata read replacing a
        full-column scan.
        """
        from incubator_paimon_trino_spark.catalog.scan import (
            _key,
            _norm,
            partition_values,
        )

        db, _, table = name.partition(".")
        tdir = self._table_dir(db, table)
        schema = self._latest_schema(tdir)
        if schema.primary_key:
            return None
        snap = self._latest_snapshot(tdir)
        if snap is None:
            return {c: {"min": None, "max": None, "count": 0} for c in columns}
        files = self._pruned_files(tdir, schema, snap, predicate)
        if not _limit_pushable(schema, predicate, files):
            return None
        parts = set(schema.partition_keys)
        out: dict[str, dict] = {}
        for col in columns:
            f = schema.field_by_name(col)  # KeyError on unknown = caller bug
            col = f.name  # canonical spelling (field_by_name is case-insensitive)
            is_part = col in parts
            if not is_part and not f.type.lower().startswith(self._MINMAX_EXACT_TYPES):
                # footer-stat types only; PARTITION columns bypass the gate —
                # their values live exactly in the path, no footer involved
                return None
            lo = hi = None
            cnt = 0
            for e in files:
                total = e.get("record_count")
                if total is None:
                    return None
                if total == 0:
                    continue  # empty file (no rows, often no stats): nothing
                if is_part:
                    pv = partition_values(e["path"])
                    if col not in pv:
                        return None  # renamed path column → not exact
                    raw = pv[col]
                    if raw is None:
                        continue  # hive null partition: all rows null
                    try:
                        flo = fhi = _norm(raw, f.type)
                    except (TypeError, ValueError, ArithmeticError):
                        return None
                    if flo is None:
                        return None
                    if flo != flo:
                        # NaN hive partition value ('col=NaN' path): same
                        # poisoning as the footer-stats branch below — NaN
                        # compares False against everything, so the _key fold
                        # would keep/drop it order-dependently while Spark's
                        # scan ranks NaN as the MAX. Only the scan is exact.
                        return None
                    fcnt = total
                else:
                    s = (e.get("stats") or {}).get(str(f.id))
                    if s is None or s.get("nulls") is None:
                        return None  # stats-missing file → only the scan knows
                    flo, fhi = s.get("min"), s.get("max")
                    fcnt = total - int(s["nulls"])
                    if flo is None:
                        if fcnt != 0:
                            return None  # values exist but no extremes recorded
                        continue  # provably all-null file
                    if flo != flo or fhi != fhi:
                        # NaN-poisoned footer stat (Spark's writer propagates
                        # NaN into max): NaN compares False against everything,
                        # making the fold order-dependent, and engines disagree
                        # on NaN's place in MIN/MAX — only the scan is exact
                        return None
                cnt += fcnt
                if lo is None or _key(flo, f.type) < _key(lo, f.type):
                    lo = flo
                if hi is None or _key(fhi, f.type) > _key(hi, f.type):
                    hi = fhi
            out[col] = {"min": lo, "max": hi, "count": cnt}
        return out

    def column_extremes(
        self, name: str, columns: list[str], predicate: list | None = None
    ) -> DataFrame:
        """One-row DataFrame ``min_<c>, max_<c>, count_<c>`` per requested
        column: manifest-answered when ``metadata_min_max`` can (no data file
        opened — plan pinned scan-free in ``tests/test_plan_quality.py``),
        else the regular scan plan's aggregate. Both paths produce the
        table's declared column types, so callers can't tell which answered
        — except by the plan."""
        import datetime as _dt
        import decimal as _dec

        db, _, table = name.partition(".")
        schema = self.schema_of(db, table)
        # canonical spellings up front: both paths then agree on output names
        # (the metadata dict is keyed canonically; Spark aggs are case-
        # insensitive but alias with whatever string they were given)
        columns = [schema.field_by_name(c).name for c in columns]
        meta = self.metadata_min_max(name, columns, predicate)
        if meta is None:
            df = self.read_table(name, predicate=predicate)
            aggs = []
            for c in columns:
                aggs += [
                    F.min(c).alias(f"min_{c}"),
                    F.max(c).alias(f"max_{c}"),
                    F.count(c).cast("bigint").alias(f"count_{c}"),
                ]
            return df.agg(*aggs)

        def revive(v, ddl: str):
            # normalized manifest form → Python value Spark maps to the type
            if v is None:
                return None
            d = ddl.lower()
            if d == "date":
                return _dt.date.fromisoformat(v)
            if d.startswith("timestamp"):
                return _dt.datetime.fromisoformat(v)
            if d.startswith("decimal"):
                return _dec.Decimal(v)
            if d in ("float", "double", "real"):
                return float(v)
            return v

        from pyspark.sql import types as T

        row, fields = [], []
        spark_t = {f.name: t for f, t in zip(schema.fields, schema.spark_schema().fields)}
        for c in columns:
            f = schema.field_by_name(c)
            t = spark_t[c].dataType
            row += [revive(meta[c]["min"], f.type), revive(meta[c]["max"], f.type),
                    int(meta[c]["count"])]
            fields += [
                T.StructField(f"min_{c}", t),
                T.StructField(f"max_{c}", t),
                T.StructField(f"count_{c}", T.LongType(), nullable=False),
            ]
        return self.spark.createDataFrame([tuple(row)], T.StructType(fields))

    # ---------------------------------------------------- deletion vectors
    # Paimon's ``deletion-vectors.enabled`` (DV mode): instead of merging
    # row versions at read time, each commit MARKS the positions of the
    # rows it supersedes in older files; a read is then scan − DV — no
    # merge shuffle at all. The reference connector inherits this from
    # Paimon core at scan time; here it is executable end-to-end: writes
    # pay a key lookup against the live files (Paimon's lookup compaction
    # cost), reads drop the whole merge-on-read exchange.

    @staticmethod
    def _dv_enabled(schema: TableSchema) -> bool:
        return (
            bool(schema.primary_key)
            and schema.options.get("deletion_vectors_enabled", "").strip().lower() == "true"
        )

    def _dv_vectors(self, tdir: str, snap: Snapshot | None) -> dict[str, list[int]]:
        """TEST/DEBUG utility: the snapshot's cumulative deletion vectors
        as a driver dict {rel-or-base path → sorted positions}, either
        format. NEVER on a read, stream, or commit path (pinned by
        monkeypatch in tests/test_deletion_vectors.py and
        tests/test_dv_stream.py) — a sharded index is O(live deleted rows).
        Missing/absent → {} (nothing deleted)."""
        from incubator_paimon_trino_spark.catalog.dv_index import (
            load_index_meta,
            mark_file_names,
        )

        meta = load_index_meta(tdir, snap.dv if snap else None)
        if meta is None:
            return {}
        if meta["kind"] == "inline":
            return meta["vectors"]
        out: dict[str, list[int]] = {}
        for name in mark_file_names(tdir, snap.dv):
            try:
                doc = read_json(os.path.join(tdir, "index", name))
            except FileNotFoundError:
                continue
            out.update(doc.get("vectors", {}))
        return out

    def _dv_marks_df(self, tdir: str, dv_name: str | None) -> DataFrame | None:
        """The index's marks as a Spark-read DataFrame (file basename,
        position) — the ONE way marks reach any read/stream plan. Inline or
        sharded, the mark-bearing files share the ``{"vectors": ...}``
        document shape, so both formats flow through the same
        ``explode_dv_index_text`` pipeline: an inline index parses as one
        executor task of O(index) (bounded by the inline threshold), a
        sharded one as many small per-bucket parse tasks. None = no marks
        (no index, or reaped by expiry)."""
        from incubator_paimon_trino_spark.catalog.dv_index import mark_file_names

        paths = [
            os.path.join(tdir, "index", n) for n in mark_file_names(tdir, dv_name)
        ]
        paths = [p for p in paths if os.path.exists(p)]
        if not paths:
            return None
        return explode_dv_index_text(
            self.spark.read.format("text").option("wholetext", "true").load(paths)
        )

    #: delta-vs-base merge gate: the delta's keys broadcast to split the
    #: base, so the delta must be broadcast-sized (manifest record counts
    #: decide driver-side, no job)
    _DELTA_BROADCAST_ROWS = 2_000_000

    def _delta_base_split(
        self, tdir: str, schema: TableSchema, snap: Snapshot
    ) -> "tuple[DataFrame, DataFrame] | None":
        """(base DataFrame, delta DataFrame) when the snapshot's live set
        splits into compaction output (``source == "compact"`` — unique
        keys, no -D rows, the materialized merge) plus a BROADCAST-SIZED
        delta of later commits; None otherwise (no compact base, no delta,
        or a delta too large to broadcast — callers then run the full
        merge). The decision costs no job: manifest record counts bound the
        delta's key count."""
        compact_files = [e for e in snap.files if e.get("source") == "compact"]
        delta_files = [e for e in snap.files if e.get("source") != "compact"]
        if not compact_files or not delta_files:
            return None
        counts = [e.get("record_count") for e in delta_files]
        if any(c is None for c in counts) or sum(counts) > self._DELTA_BROADCAST_ROWS:
            return None
        base = self._read_files(tdir, schema, dataclasses.replace(snap, files=compact_files))
        delta = self._read_files(tdir, schema, dataclasses.replace(snap, files=delta_files))
        return base, delta

    def _dv_apply_distributed(self, df: DataFrame, tdir: str, snap: Snapshot) -> DataFrame:
        """Drop DV-marked rows with the marks side read BY SPARK from the
        snapshot's committed index (``_dv_marks_df``): the anti-join side
        never transits the driver (O(1) driver memory), and the join
        strategy is left to AQE — a small index broadcasts (the common
        case, marks bounded by deletions since the last compaction), a
        large one shuffles. A sharded index reads as many small per-bucket
        parse tasks; an index reaped by expiry reads as no-marks."""
        marks = self._dv_marks_df(tdir, snap.dv) if snap.dv else None
        df = df.withColumn(_DV_FILE, F.element_at(F.split(F.col(_DV_FILE), "/"), -1))
        if marks is not None:
            if snap.dv_marks is not None and snap.dv_marks <= 2_000_000:
                # the snapshot records the cumulative mark count, so the
                # broadcast decision costs no job — a JSON-parsed side has
                # no stats, and without the hint AQE sort-merge-joined a
                # 23k-mark index against the scan (bench_lake r10: the
                # join was 2/3 of the DV read's 3x overhead)
                marks = F.broadcast(marks)
            df = df.join(marks, [_DV_FILE, _DV_POS], "left_anti")
        return df.drop(_DV_FILE, _DV_POS)

    def _dv_build(
        self,
        tdir: str,
        schema: TableSchema,
        prev: Snapshot,
        batch: DataFrame,
        version: int,
    ) -> tuple[str, int, int, list[str]]:
        """Find the rows this commit supersedes and publish the commit's DV
        index; returns (index name, newly marked, cumulative marks, files
        this commit wrote — the conflict-cleanup set).

        The mark scan is fully distributed: live files are read with native
        row positions (``_metadata.row_index``), prev's marks drop the
        already-dead rows via the same distributed anti-join every read
        uses, and a LEFT SEMI join against the batch's DISTINCT keys finds
        the superseded positions. What happens to the hits then depends on
        the CUMULATIVE size (decided from ``prev.dv_marks`` + a distributed
        count — never a parse):

        - at or under ``dv-index.inline-threshold``: collect (bounded by
          the threshold) and fold into one inline JSON — the legacy format,
          O(threshold) driver memory by construction;
        - above it (or once sharded): executors write per-bucket shard
          files for ONLY the touched buckets; untouched buckets carry
          forward by name. No mark set ever reaches the driver — the last
          O(live deleted rows) driver bound of the DV design is gone.
        """
        from incubator_paimon_trino_spark.catalog.dv_index import (
            inline_threshold,
            is_sharded,
            load_index_meta,
        )

        pk = schema.primary_key
        keys = batch.select(*pk).dropDuplicates().persist()
        try:
            # Bound the mark scan by the BATCH's key range (r9 — previously
            # claimed, now executed): the lead PK's min/max over the batch
            # prunes the live files through the same manifest min/max
            # machinery every read uses, so a point DELETE on a huge table
            # opens only the files whose key range admits its keys — not
            # the table. One scalar agg over the (already persisted) batch.
            lead = pk[0]
            lo, hi = keys.agg(F.min(lead), F.max(lead)).collect()[0]
            scan_snap = prev
            if lo is None and keys.isEmpty():
                # empty batch (e.g. a DELETE matching nothing): no key can
                # supersede anything — skip the scan outright
                scan_snap = dataclasses.replace(prev, files=[])
            elif lo is not None:
                from incubator_paimon_trino_spark.functions.predicates import (
                    ColumnDomain,
                    Range,
                )

                pruned = prune_files(
                    prev.files,
                    [ColumnDomain(lead, ranges=[Range(low=lo, high=hi)])],
                    schema,
                    lambda sid: self._schema(tdir, sid),
                )
                scan_snap = dataclasses.replace(prev, files=pruned)
            if scan_snap.files:
                old = self._read_files(tdir, schema, scan_snap, with_pos=True)
                old = old.withColumn(
                    _DV_FILE, F.element_at(F.split(F.col(_DV_FILE), "/"), -1)
                )
                prev_marks = self._dv_marks_df(tdir, prev.dv) if prev.dv else None
                if prev_marks is not None:
                    old = old.join(prev_marks, [_DV_FILE, _DV_POS], "left_anti")
                hits = old.join(keys, pk, "left_semi").select(
                    _DV_FILE, F.col(_DV_POS).cast("bigint").alias(_DV_POS)
                )
            else:  # no live file's key range admits any batch key
                hits = self.spark.createDataFrame(
                    [], f"{_DV_FILE} string, {_DV_POS} bigint"
                )
            hits = hits.persist()
        finally:
            keys.unpersist()
        try:
            n_hits = hits.count()
            prev_meta = load_index_meta(tdir, prev.dv)
            prev_count = prev.dv_marks
            if prev_count is None:
                prev_count = (
                    0
                    if prev_meta is None
                    else (
                        prev_meta["marks"]
                        if prev_meta["marks"] is not None
                        # legacy inline without a recorded count: the dict
                        # is already parsed, size it directly
                        else sum(len(ps) for ps in prev_meta["vectors"].values())
                    )
                )
            sharded = is_sharded(prev.dv) or (
                prev_count + n_hits > inline_threshold(schema.options)
            )
            if not sharded:
                return self._dv_fold_inline(tdir, prev, prev_meta, hits, n_hits, version)
            return self._dv_write_shards(
                tdir, schema, prev_meta, hits, n_hits, prev_count, version
            )
        finally:
            hits.unpersist()

    def _dv_fold_inline(
        self,
        tdir: str,
        prev: Snapshot,
        prev_meta: dict | None,
        hits: DataFrame,
        n_hits: int,
        version: int,
    ) -> tuple[str, int, int, list[str]]:
        """Inline-format commit: cumulative marks ≤ threshold by the
        caller's decision, so collecting the new hits and folding them into
        the prior parsed dict is bounded driver work (the docstring
        contract: the dict survives only here, and only under the
        threshold). Marks of files no longer live are dropped."""
        prev_vec = prev_meta["vectors"] if prev_meta else {}
        base_to_rel = {
            os.path.basename(f["path"].replace("\\", "/")): f["path"]
            for f in prev.files
        }
        merged: dict[str, set[int]] = {
            rel: set(ps)
            for rel, ps in prev_vec.items()
            if os.path.basename(rel.replace("\\", "/")) in base_to_rel
        }
        for r in hits.collect():
            merged.setdefault(base_to_rel[r[0]], set()).add(int(r[1]))
        vectors = {rel: sorted(ps) for rel, ps in sorted(merged.items())}
        total = sum(len(ps) for ps in vectors.values())
        name = self._dv_write_inline(tdir, version, vectors)
        return name, n_hits, total, [name]

    def _dv_write_inline(self, tdir: str, version: int, vectors: dict[str, list[int]]) -> str:
        """Write an inline cumulative DV index for ``version`` BEFORE the
        snapshot publish (readers must never see the snapshot without its
        vectors). Nonce-named so racing committers at one version can't
        cross-wire: each snapshot references exactly the file its own
        writer produced."""
        name = f"dv-{version}-{uuid.uuid4().hex[:8]}.json"
        write_json_atomic(
            os.path.join(tdir, "index", name),
            {"vectors": vectors, "marks": sum(len(ps) for ps in vectors.values())},
        )
        return name

    def _dv_write_shards(
        self,
        tdir: str,
        schema: TableSchema,
        prev_meta: dict | None,
        hits: DataFrame,
        n_hits: int,
        prev_count: int,
        version: int,
    ) -> tuple[str, int, int, list[str]]:
        """Sharded-format commit: EXECUTORS write one ``{"vectors": ...}``
        document per touched bucket (marks hashed by data-file basename);
        untouched buckets carry their prior shard files forward BY NAME, so
        consumers diff two snapshots with a metadata-only name compare. The
        driver handles only bucket ids (≤ ``dv-index.buckets``) and file
        renames — never marks.

        Rewrite set per bucket = prior marks of that bucket ∪ new hits:
        prior marks come from reading ONLY the touched buckets' shard files
        (or the one prior inline file on the threshold-crossing commit).
        Liveness filtering is deliberately skipped — a dead file's marks
        anti-join against nothing (harmless) and compaction resets the
        index wholesale; filtering would force reading every bucket every
        commit."""
        from incubator_paimon_trino_spark.catalog.dv_index import index_buckets

        k = index_buckets(schema.options)
        nonce = uuid.uuid4().hex[:8]
        bucket = F.pmod(F.crc32(F.encode(F.col(_DV_FILE), "UTF-8")), F.lit(k)).cast("int")
        carried: dict[int, list[str]] = {}
        base: DataFrame | None = None
        if prev_meta is None:
            touched = None  # no prior marks: every hit bucket gets written
        elif prev_meta["kind"] == "inline":
            # threshold-crossing commit: rewrite ALL prior marks into shards
            touched = None
            if prev_meta["vectors"]:
                base = self._dv_marks_df(tdir, prev_meta["name"])
        elif prev_meta["buckets"] != k:
            # bucket-count change: full rewrite under the new k (consumers
            # see every bucket as touched and diff executor-side — correct,
            # just not incremental for this one commit)
            touched = None
            base = self._dv_marks_df(tdir, prev_meta["name"])
        else:
            touched = sorted(
                r[0] for r in hits.select(bucket.alias("_b")).distinct().collect()
            )
            carried = {
                b: names
                for b, names in prev_meta["shards"].items()
                if b not in set(touched)
            }
            prior_paths = [
                os.path.join(tdir, "index", n)
                for b in touched
                for n in prev_meta["shards"].get(b, [])
            ]
            prior_paths = [p for p in prior_paths if os.path.exists(p)]
            if prior_paths:
                base = explode_dv_index_text(
                    self.spark.read.format("text")
                    .option("wholetext", "true")
                    .load(prior_paths)
                )
        rewrite = hits if base is None else hits.unionByName(base)
        # Bound each shard DOCUMENT (it aggregates into one JSON string, so
        # one buffer): buckets whose rewrite exceeds max-marks-per-shard
        # split into sub-shards by data-file hash — the manifest lists a
        # LIST of files per bucket and every reader unions marks across
        # them, so sub-splitting is invisible downstream. Per-file
        # granularity floor: one data file's marks stay in one document,
        # bounded by that file's row count. The per-bucket sizing pass is
        # K rows on the driver.
        from incubator_paimon_trino_spark.catalog.dv_index import max_marks_per_shard

        max_marks = max_marks_per_shard(schema.options)
        rewrite = rewrite.withColumn("_b", bucket).persist()
        try:
            sizes = {
                r["_b"]: r["n"]
                for r in rewrite.groupBy("_b").agg(F.count("*").alias("n")).collect()
            }
            subs_of = {b: -(-n // max_marks) for b, n in sizes.items()}
            over = {b: s for b, s in subs_of.items() if s > 1}
            if over:
                # flat map lookup, not a nested WHEN per oversized bucket
                # (a wide bulk delete could otherwise build a K-deep CASE)
                sub_count = F.coalesce(
                    F.element_at(
                        F.create_map(
                            *[x for b, s in sorted(over.items()) for x in (F.lit(b), F.lit(s))]
                        ),
                        F.col("_b"),
                    ),
                    F.lit(1),
                )
                sub_expr = F.pmod(
                    F.crc32(F.encode(F.col(_DV_FILE), "UTF-8")), sub_count
                )
            else:
                sub_expr = F.lit(0)
            docs = (
                rewrite.withColumn("_s", sub_expr.cast("int"))
                .groupBy("_b", "_s", _DV_FILE)
                .agg(F.sort_array(F.collect_set(_DV_POS)).alias("_ps"))
                .groupBy("_b", "_s")
                .agg(
                    F.to_json(
                        F.struct(
                            F.map_from_entries(
                                F.sort_array(
                                    F.collect_list(
                                        F.struct(F.col(_DV_FILE), F.col("_ps"))
                                    )
                                )
                            ).alias("vectors")
                        )
                    ).alias("value")
                )
            )
            staging = os.path.join(tdir, "index", f".staging-dv-{version}-{nonce}")
            docs.write.partitionBy("_b", "_s").text(staging)
        finally:
            rewrite.unpersist()
        written: list[str] = []
        shards: dict[int, list[str]] = dict(carried)
        for sdir in sorted(glob.glob(os.path.join(staging, "_b=*", "_s=*"))):
            b = int(os.path.basename(os.path.dirname(sdir)).split("=", 1)[1])
            s = int(os.path.basename(sdir).split("=", 1)[1])
            parts = sorted(glob.glob(os.path.join(sdir, "part-*")))
            # one row per (bucket, sub) in `docs` → exactly one part file
            assert len(parts) == 1, f"expected one doc for bucket {b}/{s}: {parts}"
            name = f"dv-{version}-{nonce}-b{b}-s{s}.json"
            os.replace(parts[0], os.path.join(tdir, "index", name))
            written.append(name)
            if b in carried:
                raise AssertionError(f"bucket {b} both carried and rewritten")
            shards.setdefault(b, []).append(name)
        shutil.rmtree(staging, ignore_errors=True)
        total = prev_count + n_hits  # hits are strictly new (pre-filtered)
        manifest = f"dvm-{version}-{nonce}.json"
        write_json_atomic(
            os.path.join(tdir, "index", manifest),
            {
                "format": "sharded",
                "buckets": k,
                "marks": total,
                "shards": {str(b): names for b, names in sorted(shards.items())},
            },
        )
        written.append(manifest)
        return manifest, n_hits, total, written

    # -------------------------------------------------------- system tables
    def _system_table(self, db: str, table: str, suffix: str) -> DataFrame:
        """``table$suffix`` resolution (A13) — reference test reads
        ``t2$snapshots`` (``TestTrinoITCase.java:284-289``)."""
        if suffix not in _SYSTEM_SUFFIXES:
            raise ValueError(f"unknown system table suffix {suffix!r}; have {_SYSTEM_SUFFIXES}")
        tdir = self._table_dir(db, table)
        if suffix == "audit_log":
            # changelog view with the row kind exposed as `rowkind` (Paimon's
            # `table$audit_log`); append-only tables surface all rows as +I.
            schema = self._latest_schema(tdir)
            df = self.read_table(f"{db}.{table}", with_system_columns=True)
            if schema.primary_key:
                return df.select(
                    F.col(KIND_COL).alias("rowkind"), *[f.name for f in schema.fields]
                )
            return df.select(
                F.lit("I").alias("rowkind"), *[f.name for f in schema.fields]
            )
        if suffix == "ro":
            # Paimon's read-optimized table (`t$ro`): serve the latest FULLY
            # COMPACTED state — compaction already materialized the merge, so
            # the read is a raw file scan with ZERO merge-on-read cost, at
            # the price of staleness (rows committed after the last
            # compaction are invisible). A never-compacted table has no
            # compacted state: empty result, same as Paimon's level-max read.
            schema = self._latest_schema(tdir)
            user_cols = [f.name for f in schema.fields]
            # the CURRENT snapshot's compaction-written files (provenance
            # marker set by compact()) ARE the read-optimized state: entry
            # metadata carries forward through later appends, so $ro
            # survives expiry of the COMPACT snapshot JSON itself; an
            # OVERWRITE/TRUNCATE replaces the whole live set — no marked
            # files remain, so serving pre-overwrite compacted rows (a
            # correctness bug, not staleness) is impossible by construction.
            # Never/not-yet-recompacted states are empty, like Paimon's
            # max-level read of a level-0-only table.
            snap = self._pin_snapshot(tdir, None, None, None)
            ro_files = [e for e in (snap.files if snap else []) if e.get("source") == "compact"]
            if not ro_files:
                return self.spark.createDataFrame([], schema.spark_schema())
            df = self._read_files(tdir, schema, dataclasses.replace(snap, files=ro_files))
            return _pad_char_columns(df.select(*user_cols), schema)
        if suffix == "snapshots":
            rows = [
                (
                    s.snapshot_id,
                    s.schema_id,
                    s.commit_user,
                    s.commit_identifier,
                    s.commit_kind,
                    s.timestamp_ms,
                    s.record_count,
                )
                for s in self._snapshots(tdir)
            ]
            return self.spark.createDataFrame(
                rows,
                "snapshot_id bigint, schema_id bigint, commit_user string, "
                "commit_identifier bigint, commit_kind string, timestamp_ms bigint, "
                "record_count bigint",
            )
        if suffix == "schemas":
            rows = []
            for p in sorted(glob.glob(os.path.join(tdir, "schema", "schema-*.json"))):
                s = TableSchema.from_json(read_json(p))
                rows.append(
                    (
                        s.schema_id,
                        ",".join(f"{f.name} {f.type}" for f in s.fields),
                        ",".join(s.primary_key),
                        ",".join(s.partition_keys),
                    )
                )
            return self.spark.createDataFrame(
                rows, "schema_id bigint, fields string, primary_key string, partition_keys string"
            )
        if suffix == "tags":
            rows = sorted(self._tags(tdir).items())
            return self.spark.createDataFrame(rows, "tag string, snapshot_id bigint")
        if suffix == "branches":
            # Paimon's `table$branches`: one row per branch with its seed
            rows = [
                (
                    b,
                    m.get("from_tag"),
                    int(m.get("from_snapshot", 0)),
                    int(m.get("created_ms", 0)),
                )
                for b, m in sorted(self._branches(tdir).items())
            ]
            return self.spark.createDataFrame(
                rows,
                "branch_name string, from_tag string, "
                "from_snapshot bigint, created_ms bigint",
            )
        if suffix == "consumers":
            # Paimon's `table$consumers`: one row per registered consumer id
            # with the next snapshot it will consume (these positions pin
            # snapshot retention — see expire_snapshots).
            rows = [
                (cid, int(c["next_snapshot"]), int(c.get("updated_ms", 0)))
                for cid, c in sorted(self._consumers(tdir).items())
            ]
            return self.spark.createDataFrame(
                rows, "consumer_id string, next_snapshot_id bigint, updated_ms bigint"
            )
        if suffix == "statistics":
            # Paimon's `table$statistics`: the latest ANALYZE result —
            # snapshot-level rollup plus one row per column (colstat). NULL
            # snapshot_id means the table was never analyzed.
            st = self.stats_of(db, table)
            srows = []
            if st:
                for col, cs in sorted(st.get("columns", {}).items()):
                    srows.append(
                        (
                            int(st.get("snapshot_id", 0)) or None,
                            int(st.get("row_count", 0)),
                            int(st.get("total_size_bytes", 0)),
                            col,
                            cs.get("min"),
                            cs.get("max"),
                            int(cs.get("null_count", 0)),
                            int(cs.get("ndv", 0)),
                        )
                    )
            return self.spark.createDataFrame(
                srows,
                "snapshot_id bigint, row_count bigint, total_size_bytes bigint, "
                "column_name string, min string, max string, "
                "null_count bigint, ndv bigint",
            )
        if suffix == "files":
            # Paimon's `table$files`: one row per live data file with its
            # partition, format and footer stats (record_count / size).
            snap = self._latest_snapshot(tdir)
            schema = self._latest_schema(tdir)
            rows = []
            for f in snap.files if snap else []:
                pv = partition_values(f["path"])
                part = "/".join(
                    f"{k}={'null' if pv.get(k) is None else pv[k]}"
                    for k in schema.partition_keys
                )
                rows.append(
                    (
                        part,
                        f["path"],
                        f.get("format", "parquet"),
                        f["schema_id"],
                        f.get("record_count", 0),
                        f.get("size_bytes", 0),
                    )
                )
            return self.spark.createDataFrame(
                rows,
                "partition string, path string, file_format string, "
                "schema_id bigint, record_count bigint, file_size_in_bytes bigint",
            )
        if suffix == "partitions":
            # Paimon's `table$partitions`: per-partition rollup of the live
            # files (record_count, file_count, bytes, last snapshot that
            # touched the partition — recovered from the commit-dir prefix
            # `c{N}-` file-name prefix, so no extra manifest state is needed).
            snap = self._latest_snapshot(tdir)
            schema = self._latest_schema(tdir)
            snap_ts = {s.snapshot_id: s.timestamp_ms for s in self._snapshots(tdir)}
            agg: dict[str, list] = {}
            for f in snap.files if snap else []:
                pv = partition_values(f["path"])
                part = "/".join(
                    f"{k}={'null' if pv.get(k) is None else pv[k]}"
                    for k in schema.partition_keys
                )
                p = "/" + f["path"].replace("\\", "/")
                # new layout names files `c{N}-*`; fall back to the legacy
                # `data/c{N}/...` commit-directory layout (still readable)
                m = re.search(r"/c(\d+)-[^/]*$", p) or re.search(r"/c(\d+)/", p)
                commit = int(m.group(1)) if m else 0
                cur = agg.setdefault(part, [0, 0, 0, 0])
                cur[0] += f.get("record_count", 0)
                cur[1] += 1
                cur[2] += f.get("size_bytes", 0)
                cur[3] = max(cur[3], commit)
            rows = [
                (part, rc, fc, sz, snap_ts.get(last))
                for part, (rc, fc, sz, last) in sorted(agg.items())
            ]
            return self.spark.createDataFrame(
                rows,
                "partition string, record_count bigint, file_count bigint, "
                "file_size_in_bytes bigint, last_update_ms bigint",
            )
        if suffix == "manifests":
            # Paimon's `table$manifests`: the delta-manifest chain of the
            # current snapshot — one row per manifest with what it added.
            snap = self._latest_snapshot(tdir)
            rows = []
            for m in snap.manifests if snap else []:
                entries = read_json(os.path.join(tdir, "manifest", m))["files"]
                rows.append(
                    (
                        m,
                        len(entries),
                        sum(e.get("record_count", 0) for e in entries),
                        sum(e.get("size_bytes", 0) for e in entries),
                    )
                )
            return self.spark.createDataFrame(
                rows,
                "manifest_name string, num_added_files bigint, "
                "added_record_count bigint, added_size_bytes bigint",
            )
        # options
        s = self._latest_schema(tdir)
        return self.spark.createDataFrame(
            sorted(s.options.items()), "key string, value string"
        )

    def snapshots(self, db: str, table: str) -> DataFrame:
        return self._system_table(db, table, "snapshots")

    def read_incremental_by_timestamp(self, name: str, from_ms: int, to_ms: int) -> DataFrame:
        """Paimon's ``incremental-between-timestamp`` — rows committed AFTER
        ``from_ms`` up to and including ``to_ms`` (epoch millis). Each bound
        resolves to the newest snapshot committed at or before it (no
        snapshot at/before from_ms → the table's beginning), then delegates
        to the id-based delta — the same metadata-only file-set difference.
        """
        if to_ms < from_ms:
            raise ValueError(f"to_ms {to_ms} precedes from_ms {from_ms}")
        db, _, table = name.partition(".")
        snaps = self._snapshots(self._table_dir(db, table))

        def at_or_before(ms: int) -> int:
            ids = [s.snapshot_id for s in snaps if s.timestamp_ms <= ms]
            return max(ids) if ids else 0

        return self.read_incremental(name, at_or_before(from_ms), at_or_before(to_ms))

    def read_incremental(
        self, name: str, from_snapshot: int | str, to_snapshot: int | str
    ) -> DataFrame:
        """Rows committed in snapshots ``(from_snapshot, to_snapshot]`` —
        Paimon's ``incremental-between`` scan, the batch twin of the
        changelog stream. Either bound may be a TAG NAME (Paimon's
        ``incremental-between-tags``): tags pin their snapshot through
        expiration, so tag-to-tag deltas stay readable after the raw ids
        between them are gone.

        Data files are immutable and manifests accumulate them, so the delta
        is a pure file-set difference: no data is read to compute it, and
        the scan touches only the delta files (at 100 TB an incremental
        consumer reads GBs, not the table). PK tables keep ``(_seq,
        _row_kind)`` so consumers can apply upserts/deletes downstream.
        """
        db, _, table = name.partition(".")
        tdir = self._table_dir(db, table)
        if isinstance(from_snapshot, str) or isinstance(to_snapshot, str):
            tags = self._tags(tdir)

            def resolve(v):
                if isinstance(v, int):
                    return v
                if v not in tags:
                    raise ValueError(f"no tag {v!r} (have {sorted(tags)})")
                return int(tags[v])

            from_snapshot, to_snapshot = resolve(from_snapshot), resolve(to_snapshot)
        if self._dv_enabled(self._latest_schema(tdir)):
            # same hazard as the 'input' changelog: a DV delete commits no
            # data rows, so the raw file delta would silently omit deletes a
            # consumer's docstring-promised _row_kind application needs —
            # use read_cdc/table_changelog(producer='lookup'), whose diff of
            # DV-applied merged states emits the -D retractions
            raise ValueError(
                "read_incremental cannot represent deletes on a deletion-"
                "vectors table (deletes write no data rows); use read_cdc or "
                "table_changelog(producer='lookup') for the retraction stream"
            )
        if from_snapshot > to_snapshot:
            raise ValueError(f"from_snapshot {from_snapshot} > to_snapshot {to_snapshot}")
        snaps = {s.snapshot_id: s for s in self._snapshots(tdir)}
        if to_snapshot not in snaps:
            raise ValueError(f"no snapshot {to_snapshot} (have {sorted(snaps)})")
        if from_snapshot and from_snapshot not in snaps:
            raise ValueError(f"no snapshot {from_snapshot} (have {sorted(snaps)})")
        schema = self._latest_schema(tdir)
        base = {f["path"] for f in snaps[from_snapshot].files} if from_snapshot else set()
        delta = [f for f in snaps[to_snapshot].files if f["path"] not in base]
        snap = snaps[to_snapshot]
        if not delta:
            empty = _physical_schema(schema, bool(schema.primary_key))
            return self.spark.createDataFrame([], empty)
        pruned = dataclasses.replace(snap, files=delta)
        return self._read_files(tdir, schema, pruned)

    # ------------------------------------------------------------------ SQL
    _TABLE_REF = re.compile(
        r"\b(?P<db>[A-Za-z_]\w*)\.(?P<tbl>[A-Za-z_]\w*)(?:\$(?P<sys>\w+))?"
        r"(?:\s+FOR\s+(?:VERSION\s+AS\s+OF\s+(?P<ver>\d+|'[^']*')"
        r"|TIMESTAMP\s+AS\s+OF\s+(?P<ts>\d+|'[^']*')))?",
        re.IGNORECASE,
    )

    _INSERT_RE = re.compile(
        r"^\s*INSERT\s+(INTO|OVERWRITE)\s+(?P<db>[A-Za-z_]\w*)\.(?P<tbl>[A-Za-z_]\w*(?:\$branch_\w+)?)"
        r"(?:\s*\((?P<cols>\s*[A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*\s*)\))?"
        r"\s+(?P<rest>.+)$",
        re.IGNORECASE | re.DOTALL,
    )
    _DELETE_RE = re.compile(
        r"^\s*DELETE\s+FROM\s+(?P<db>[A-Za-z_]\w*)\.(?P<tbl>[A-Za-z_]\w*(?:\$branch_\w+)?)"
        r"(?:\s+WHERE\s+(?P<where>.+))?\s*$",
        re.IGNORECASE | re.DOTALL,
    )
    _TRUNCATE_RE = re.compile(
        r"^\s*TRUNCATE\s+TABLE\s+(?P<db>[A-Za-z_]\w*)\.(?P<tbl>[A-Za-z_]\w*(?:\$branch_\w+)?)\s*$",
        re.IGNORECASE,
    )
    _UPDATE_RE = re.compile(
        r"^\s*UPDATE\s+(?P<db>[A-Za-z_]\w*)\.(?P<tbl>[A-Za-z_]\w*(?:\$branch_\w+)?)\s+SET\s+(?P<sets>.+?)\s+WHERE\s+(?P<where>.+)$",
        re.IGNORECASE | re.DOTALL,
    )

    _DDL_RES = {
        "show_create": re.compile(
            r"^\s*SHOW\s+CREATE\s+TABLE\s+(?P<db>[A-Za-z_]\w*)\.(?P<tbl>[A-Za-z_]\w*)\s*$", re.I),
        "call_proc": re.compile(
            r"^\s*CALL\s+sys\.(?P<proc>[A-Za-z_]\w*)\s*\((?P<args>[^)]*)\)\s*$", re.I),
        "create_schema": re.compile(r"^\s*CREATE\s+(SCHEMA|DATABASE)\s+(IF\s+NOT\s+EXISTS\s+)?(?P<db>[A-Za-z_]\w*)\s*$", re.I),
        "drop_schema": re.compile(r"^\s*DROP\s+(SCHEMA|DATABASE)\s+(?P<db>[A-Za-z_]\w*)(?P<cascade>\s+CASCADE)?\s*$", re.I),
        "create_table": re.compile(
            r"^\s*CREATE\s+TABLE\s+(?P<db>[A-Za-z_]\w*)\.(?P<tbl>[A-Za-z_]\w*)\s*"
            r"\((?P<cols>.+?)\)\s*(WITH\s*\((?P<props>.+)\))?\s*$", re.I | re.S),
        "ctas": re.compile(
            r"^\s*CREATE\s+TABLE\s+(?P<db>[A-Za-z_]\w*)\.(?P<tbl>[A-Za-z_]\w*)\s*"
            r"(?:WITH\s*\((?P<props>.+?)\)\s*)?AS\s+(?P<select>.+)$", re.I | re.S),
        "drop_table": re.compile(r"^\s*DROP\s+TABLE\s+(?P<db>[A-Za-z_]\w*)\.(?P<tbl>[A-Za-z_]\w*)\s*$", re.I),
        "rename_table": re.compile(
            r"^\s*ALTER\s+TABLE\s+(?P<db>[A-Za-z_]\w*)\.(?P<tbl>[A-Za-z_]\w*)\s+RENAME\s+TO\s+(?P<new>[A-Za-z_]\w*)\s*$", re.I),
        "add_column": re.compile(
            r"^\s*ALTER\s+TABLE\s+(?P<db>[A-Za-z_]\w*)\.(?P<tbl>[A-Za-z_]\w*)\s+ADD\s+COLUMN\s+(?P<col>[A-Za-z_]\w*)\s+(?P<type>.+?)\s*$", re.I),
        "rename_column": re.compile(
            r"^\s*ALTER\s+TABLE\s+(?P<db>[A-Za-z_]\w*)\.(?P<tbl>[A-Za-z_]\w*)\s+RENAME\s+COLUMN\s+(?P<col>[A-Za-z_]\w*)\s+TO\s+(?P<new>[A-Za-z_]\w*)\s*$", re.I),
        "drop_column": re.compile(
            r"^\s*ALTER\s+TABLE\s+(?P<db>[A-Za-z_]\w*)\.(?P<tbl>[A-Za-z_]\w*)\s+DROP\s+COLUMN\s+(?P<col>[A-Za-z_]\w*)\s*$", re.I),
        "set_props": re.compile(
            r"^\s*ALTER\s+TABLE\s+(?P<db>[A-Za-z_]\w*)\.(?P<tbl>[A-Za-z_]\w*)\s+SET\s+PROPERTIES\s+(?P<props>.+)$", re.I | re.S),
        "show_schemas": re.compile(
            r"^\s*SHOW\s+(SCHEMAS|DATABASES)"
            r"(?:\s+LIKE\s+'(?P<like>[^']*)'(?:\s+ESCAPE\s+'(?P<esc>.)')?)?\s*$",
            re.I,
        ),
        "show_tables": re.compile(
            r"^\s*SHOW\s+TABLES\s+(FROM|IN)\s+(?P<db>[A-Za-z_]\w*)"
            r"(?:\s+LIKE\s+'(?P<like>[^']*)'(?:\s+ESCAPE\s+'(?P<esc>.)')?)?\s*$",
            re.I,
        ),
        "show_columns": re.compile(
            r"^\s*(SHOW\s+COLUMNS\s+(FROM|IN)|DESC(?:RIBE)?(?:\s+TABLE)?)"
            r"\s+(?P<db>[A-Za-z_]\w*)\.(?P<tbl>[A-Za-z_]\w*)\s*$", re.I),
        "analyze": re.compile(
            r"^\s*ANALYZE\s+(?:TABLE\s+)?(?P<db>[A-Za-z_]\w*)\.(?P<tbl>[A-Za-z_]\w*)"
            r"(?:\s+COMPUTE\s+STATISTICS)?\s*$", re.I),
    }

    @staticmethod
    def _parse_props(txt: str) -> dict:
        out = {}
        for part in _split_top_level(txt):
            k, _, v = part.partition("=")
            v = v.strip()
            if len(v) >= 2 and v[0] == v[-1] and v[0] in "'\"":
                # quoted value: drop delimiters, unescape doubled quotes
                # (SHOW CREATE TABLE emits '' for a literal ')
                v = v[1:-1].replace(v[0] * 2, v[0])
            out[k.strip().lower()] = v
        return out

    def _sql_ddl(self, query: str):
        """DDL statement surface (SURVEY A14-A19): the reference exposes
        exactly these through Trino SQL (``TestTrinoITCase.java:327-501``).
        Returns a (possibly empty) result DataFrame, or None if not DDL."""
        R = self._DDL_RES
        ok = lambda: self.spark.createDataFrame([(True,)], "ok boolean")  # noqa: E731
        if m := R["create_schema"].match(query):
            self.create_database(m.group("db"), ignore_if_exists=bool(m.group(2)))
            return ok()
        if m := R["drop_schema"].match(query):
            self.drop_database(m.group("db"), cascade=bool(m.group("cascade")))
            return ok()
        if m := R["create_table"].match(query):
            cols, pk, parts = [], [], []
            for c in _split_top_level(m.group("cols")):
                name, _, type_ddl = c.strip().partition(" ")
                type_ddl, comment = _split_col_comment(type_ddl.strip())
                cols.append((name, type_ddl) if comment is None else (name, type_ddl, comment))
            options = self._parse_props(m.group("props") or "")
            if "primary_key" in options:
                pk = [x.strip() for x in options.pop("primary_key").split(",")]
            if "partitioned_by" in options:
                parts = [x.strip() for x in options.pop("partitioned_by").split(",")]
            self.create_table(m.group("db"), m.group("tbl"), cols,
                              primary_key=pk, partitioned_by=parts, options=options)
            return ok()
        if m := R["ctas"].match(query):
            # CTAS — beyond the read-only reference (its engine-level
            # testCreateTableAsSelect is skipped), but the natural write-side
            # completion of the DDL surface: column types come from the
            # SELECT's Spark schema via the A20 type mapping.
            df = self.sql(m.group("select"))
            options = self._parse_props(m.group("props") or "")
            pk = [x.strip() for x in options.pop("primary_key").split(",")] \
                if "primary_key" in options else []
            parts = [x.strip() for x in options.pop("partitioned_by").split(",")] \
                if "partitioned_by" in options else []
            cols = [(f.name, spark_to_paimon(f.dataType)) for f in df.schema.fields]
            self.create_table(m.group("db"), m.group("tbl"), cols,
                              primary_key=pk, partitioned_by=parts, options=options)
            try:
                self.insert_into(m.group("db"), m.group("tbl"), df)
            except BaseException:
                # atomic CTAS: a failed load must not leave a created-but-
                # empty table behind — but only drop if NO commit was ever
                # published (a concurrent writer may have raced us onto the
                # fresh table and succeeded; dropping then would destroy its
                # committed snapshot, not our debris)
                try:
                    if not self._snapshots(self._table_dir(m.group("db"), m.group("tbl"))):
                        self.drop_table(m.group("db"), m.group("tbl"))
                except Exception:
                    pass
                raise
            return ok()
        if m := R["drop_table"].match(query):
            self.drop_table(m.group("db"), m.group("tbl"))
            return ok()
        if m := R["rename_table"].match(query):
            self.rename_table(m.group("db"), m.group("tbl"), m.group("new"))
            return ok()
        if m := R["add_column"].match(query):
            # same COMMENT handling as CREATE TABLE columns — the comment
            # must never be stored as part of the type string (an embedded
            # COMMENT breaks char/varchar parsing on the next read)
            type_ddl, comment = _split_col_comment(m.group("type"))
            self.add_column(m.group("db"), m.group("tbl"), m.group("col"),
                            type_ddl, comment=comment)
            return ok()
        if m := R["rename_column"].match(query):
            self.rename_column(m.group("db"), m.group("tbl"), m.group("col"), m.group("new"))
            return ok()
        if m := R["drop_column"].match(query):
            self.drop_column(m.group("db"), m.group("tbl"), m.group("col"))
            return ok()
        if m := R["set_props"].match(query):
            self.set_options(m.group("db"), m.group("tbl"), self._parse_props(m.group("props")))
            return ok()
        if m := R["show_schemas"].match(query):
            dbs = self.list_databases()
            if m.group("like") is not None:
                rx = _sql_like_to_regex(m.group("like"), m.group("esc"))
                dbs = [d for d in dbs if rx.fullmatch(d)]
            return self.spark.createDataFrame([(d,) for d in dbs], "schema string")
        if m := R["show_tables"].match(query):
            tables = self.list_tables(m.group("db"))
            if m.group("like") is not None:
                # SQL LIKE over table names, with ESCAPE (the Trino surface:
                # ``testShowTablesLikeWithEscape``,
                # common-test/TestTrinoDistributedQuery.java:841): % and _
                # are wildcards unless preceded by the escape character.
                rx = _sql_like_to_regex(m.group("like"), m.group("esc"))
                tables = [t for t in tables if rx.fullmatch(t)]
            return self.spark.createDataFrame(
                [(t,) for t in tables], "table string")
        if m := R["show_columns"].match(query):
            return self.spark.createDataFrame(
                self.describe(m.group("db"), m.group("tbl")), "column string, type string")
        if m := R["show_create"].match(query):
            return self.spark.createDataFrame(
                [(self.show_create_table(m.group("db"), m.group("tbl")),)],
                "create_table string",
            )
        if m := R["call_proc"].match(query):
            return self._call_procedure(m.group("proc").lower(), m.group("args") or "")
        if m := R["analyze"].match(query):
            st = self.analyze(m.group("db"), m.group("tbl"))
            return self.spark.createDataFrame(
                [(int(st["row_count"]), int(st["snapshot_id"]), len(st["columns"]))],
                "row_count bigint, snapshot_id bigint, columns_analyzed int",
            )
        return None

    def show_create_table(self, db: str, table: str) -> str:
        """Reconstruct the CREATE TABLE statement (SHOW CREATE TABLE —
        ``TestTrinoITCase.java:315-331``) from the current schema: columns,
        primary_key / partitioned_by, and every stored option, in the same
        WITH-property syntax ``sql()`` accepts back (round-trippable)."""
        schema = self.schema_of(db, table)
        cols = ",\n  ".join(
            f"{f.name} {f.type}"
            # `is not None`: an explicit empty-string comment must round-trip
            + (" COMMENT '{}'".format(f.comment.replace("'", "''"))
               if f.comment is not None else "")
            for f in schema.fields
        )
        props = dict(schema.options)
        if schema.primary_key:
            props["primary_key"] = ",".join(schema.primary_key)
        if schema.partition_keys:
            props["partitioned_by"] = ",".join(schema.partition_keys)
        with_clause = ""
        if props:
            body = ",\n  ".join(
                "{} = '{}'".format(k, str(v).replace("'", "''"))
                for k, v in sorted(props.items())
            )
            with_clause = f"\nWITH (\n  {body}\n)"
        return f"CREATE TABLE {db}.{table} (\n  {cols}\n){with_clause}"

    def _call_procedure(self, proc: str, raw_args: str) -> DataFrame:
        """``CALL sys.<proc>(...)`` — the maintenance-procedure surface
        Paimon exposes to Spark (sys.compact, sys.expire_snapshots,
        sys.rollback, sys.create_tag, sys.delete_tag); the reference's
        Trino build predates procedures, so this is executable parity with
        the lake feature set its DDL options describe."""
        # Paimon procedures accept both positional and named (``key => value``)
        # arguments; partition the raw tokens into the two forms first.
        pos: list[str] = []
        named: dict[str, str] = {}
        for tok in _split_top_level(raw_args):
            tok = tok.strip()
            if not tok:
                continue
            m = re.fullmatch(r"([A-Za-z_]\w*)\s*=>\s*(.+)", tok, re.DOTALL)
            if m:
                named[m.group(1).lower()] = m.group(2).strip().strip("'\"")
            else:
                pos.append(tok.strip("'\""))

        _ALLOWED_NAMED = {
            "compact": {"table", "order_strategy", "order_by", "partitions"},
            "expire_snapshots": {"table", "retain_last", "older_than"},
            "expire_partitions": {
                "table",
                "older_than",
                "expiration_time",
                "partition_column",
                "timestamp_formatter",
                "dry_run",
            },
            "rollback": {"table", "version", "snapshot"},
            "rollback_to_timestamp": {"table", "timestamp"},
            "create_tag_from_timestamp": {"table", "tag", "timestamp"},
            "create_tag": {"table", "tag", "snapshot"},
            "delete_tag": {"table", "tag"},
            "remove_orphan_files": {"table", "older_than", "dry_run"},
            "rebuild_file_index": {"table", "force"},
            "reset_consumer": {"table", "consumer_id", "next_snapshot_id"},
            "analyze": {"table"},
            "create_branch": {"table", "branch", "tag"},
            "delete_branch": {"table", "branch"},
            "fast_forward": {"table", "branch"},
        }
        if proc in _ALLOWED_NAMED:
            unknown = set(named) - _ALLOWED_NAMED[proc]
            if unknown:
                raise ValueError(
                    f"sys.{proc}: unknown named argument(s) {sorted(unknown)}; "
                    f"accepted: {sorted(_ALLOWED_NAMED[proc])}"
                )

        _cursor = [0]

        def take(name: str, default: str | None = None) -> str | None:
            """Named wins; else the NEXT unconsumed positional; else default.
            Binding is cursor-order — each call consumes one positional — so
            a mixed call (``table => 'db.t', 'v1'``) binds remaining
            positionals to the remaining parameters in call order."""
            if name in named:
                return named[name]
            if _cursor[0] < len(pos):
                v = pos[_cursor[0]]
                _cursor[0] += 1
                return v
            return default

        def no_leftovers() -> None:
            """Excess positional arguments must fail, not vanish: a silently
            dropped sort column or trailing token means the procedure did
            something other than what the caller wrote."""
            if _cursor[0] < len(pos):
                raise ValueError(
                    f"sys.{proc}: unexpected extra positional argument(s) "
                    f"{pos[_cursor[0]:]}"
                )

        def split_name(name: str | None) -> tuple[str, str]:
            if not name:
                raise ValueError(f"sys.{proc}: missing table argument")
            db, _, tbl = name.partition(".")
            if not tbl:
                raise ValueError(f"procedure table argument must be db.table, got {name!r}")
            return db, tbl

        ok = lambda **kw: self.spark.createDataFrame(  # noqa: E731
            [tuple(kw.values())], ", ".join(f"{k} string" for k in kw)
        )
        if proc == "compact":
            db, tbl = split_name(take("table"))
            strategy = named.get("order_strategy", "order").lower()
            if strategy not in ("order", "zorder", "hilbert", "none"):
                raise ValueError(
                    f"sys.compact: order_strategy {strategy!r} not supported "
                    "(have 'order' [lexicographic sort-compaction], 'zorder' "
                    "[Morton-interleaved multi-column clustering], 'hilbert' "
                    "[Hilbert-curve clustering], 'none')"
                )
            if "partitions" in named:
                raise ValueError(
                    "sys.compact: partition-scoped compaction is not supported; "
                    "omit `partitions` to compact the whole table"
                )
            if "order_by" in named:
                order_by = [c.strip() for c in named["order_by"].split(",") if c.strip()]
                no_leftovers()  # positional sort columns alongside a named
                # order_by would be silently shadowed — reject instead
            else:
                order_by = [a for a in pos[_cursor[0]:] if a] or None
                _cursor[0] = len(pos)
            if strategy == "none" and order_by:
                raise ValueError("sys.compact: order_by given but order_strategy => 'none'")
            if "order_strategy" in named and strategy != "none" and not order_by:
                # the caller explicitly asked for sort-compaction; silently
                # compacting unsorted would not be what they requested
                raise ValueError(
                    f"sys.compact: order_strategy => '{strategy}' requires "
                    "order_by (sort columns); omit order_strategy for plain "
                    "compaction"
                )
            v = self.compact(
                db,
                tbl,
                order_by=order_by,
                strategy=strategy if strategy in ("zorder", "hilbert") else "order",
            )
            return ok(result=f"compacted to snapshot {v}")
        if proc == "expire_snapshots":
            db, tbl = split_name(take("table"))
            keep = int(take("retain_last", "1"))
            older = named.get("older_than")  # epoch millis (Paimon procedure arg)
            no_leftovers()
            stats = self.expire_snapshots(
                db, tbl, keep_last=keep, older_than_ms=int(older) if older else None
            )
            return ok(result=f"expired {stats['expired_snapshots']} snapshots, "
                             f"deleted {stats['deleted_files']} files")
        if proc == "expire_partitions":
            db, tbl = split_name(take("table"))
            older = named.get("older_than")
            exp = named.get("expiration_time")
            pcol = named.get("partition_column")
            named.pop("timestamp_formatter", None)  # accepted: ordering IS the format contract
            dry = (named.get("dry_run") or "false").strip().lower() == "true"
            no_leftovers()
            stats = self.expire_partitions(
                db, tbl, older_than=older, expiration_time=exp,
                partition_column=pcol, dry_run=dry,
            )
            return ok(
                result=f"expired {stats['expired_partitions']} partitions "
                f"({stats['expired_files']} files)"
            )
        if proc == "rollback":
            db, tbl = split_name(take("table"))
            snap = named.get("version") or named.get("snapshot") or take("version")
            if snap is None:
                raise ValueError("sys.rollback: missing snapshot/version argument")
            no_leftovers()
            self.rollback_to(db, tbl, int(snap))
            return ok(result=f"rolled back to snapshot {snap}")
        if proc in ("rollback_to_timestamp", "create_tag_from_timestamp"):
            # both procedures resolve an epoch-millis cutoff to the newest
            # snapshot committed at or before it (Paimon's contract)
            db, tbl = split_name(take("table"))
            ts = named.get("timestamp") or take("timestamp")
            if ts is None:
                raise ValueError(f"sys.{proc}: missing timestamp argument")
            snaps = self._snapshots(self._table_dir(db, tbl))
            ids = [s.snapshot_id for s in snaps if s.timestamp_ms <= int(ts)]
            if not ids:
                raise ValueError(
                    f"sys.{proc}: no snapshot at or before timestamp {ts} "
                    f"(earliest is {min((s.timestamp_ms for s in snaps), default=None)})"
                )
            target = max(ids)
            if proc == "rollback_to_timestamp":
                no_leftovers()
                self.rollback_to(db, tbl, target)
                return ok(result=f"rolled back to snapshot {target}")
            tag = named.get("tag") or take("tag")
            if tag is None:
                raise ValueError("sys.create_tag_from_timestamp: missing tag argument")
            no_leftovers()
            self.create_tag(db, tbl, tag, snapshot_id=target)
            return ok(result=f"tag {tag} created at snapshot {target}")
        if proc == "create_tag":
            db, tbl = split_name(take("table"))
            tag = take("tag")
            if tag is None:
                raise ValueError("sys.create_tag: missing tag argument")
            snap_s = take("snapshot")
            no_leftovers()
            self.create_tag(db, tbl, tag, snapshot_id=int(snap_s) if snap_s else None)
            return ok(result=f"tag {tag} created")
        if proc == "delete_tag":
            db, tbl = split_name(take("table"))
            tag = take("tag")
            if tag is None:
                raise ValueError("sys.delete_tag: missing tag argument")
            no_leftovers()
            self.delete_tag(db, tbl, tag)
            return ok(result=f"tag {tag} deleted")
        if proc == "remove_orphan_files":
            db, tbl = split_name(take("table"))
            older = take("older_than")
            no_leftovers()
            dry = named.get("dry_run", "false").strip().lower() in ("true", "1", "yes")
            stats = self.remove_orphan_files(
                db, tbl, older_than_ms=int(older) if older else None, dry_run=dry
            )
            return ok(
                result=f"removed {stats['deleted_files']} orphan files, "
                f"{stats['deleted_staging_dirs']} staging dirs "
                f"(skipped {stats['skipped_in_flight']} in-flight)"
            )
        if proc == "rebuild_file_index":
            db, tbl = split_name(take("table"))
            force = (take("force", "false") or "").strip().lower() in ("true", "1", "yes")
            no_leftovers()
            stats = self.rebuild_file_index(db, tbl, force=force)
            return ok(
                result=f"built {stats['built']} file-index sidecars "
                f"(skipped {stats['skipped']} shared/non-parquet files)"
            )
        if proc == "reset_consumer":
            # Paimon's sys.reset_consumer: pin to next_snapshot_id, or DELETE
            # the consumer (releasing its retention pin) when omitted
            db, tbl = split_name(take("table"))
            cid = take("consumer_id")
            if cid is None:
                raise ValueError("sys.reset_consumer: missing consumer_id argument")
            nxt = take("next_snapshot_id")
            no_leftovers()
            self.reset_consumer(db, tbl, cid, next_snapshot=int(nxt) if nxt else None)
            return ok(
                result=f"consumer {cid} "
                + (f"reset to next snapshot {nxt}" if nxt else "deleted")
            )
        if proc == "analyze":
            db, tbl = split_name(take("table"))
            no_leftovers()
            st = self.analyze(db, tbl)
            return ok(
                result=f"analyzed {st['row_count']} rows at snapshot "
                f"{st['snapshot_id']} ({len(st['columns'])} columns)"
            )
        if proc == "create_branch":
            db, tbl = split_name(take("table"))
            br = take("branch")
            if br is None:
                raise ValueError("sys.create_branch: missing branch argument")
            tag = take("tag")
            no_leftovers()
            self.create_branch(db, tbl, br, from_tag=tag)
            return ok(
                result=f"branch {br} created"
                + (f" from tag {tag}" if tag else " (empty)")
            )
        if proc == "delete_branch":
            db, tbl = split_name(take("table"))
            br = take("branch")
            if br is None:
                raise ValueError("sys.delete_branch: missing branch argument")
            no_leftovers()
            self.delete_branch(db, tbl, br)
            return ok(result=f"branch {br} deleted")
        if proc == "fast_forward":
            db, tbl = split_name(take("table"))
            br = take("branch")
            if br is None:
                raise ValueError("sys.fast_forward: missing branch argument")
            no_leftovers()
            tip = self.fast_forward(db, tbl, br)
            return ok(result=f"fast-forwarded main to snapshot {tip} from branch {br}")
        raise ValueError(
            f"unknown procedure sys.{proc} (have compact, expire_snapshots, "
            "expire_partitions, rollback, create_tag, delete_tag, "
            "remove_orphan_files, reset_consumer, analyze, create_branch, "
            "delete_branch, fast_forward)"
        )

    _MERGE_RE = re.compile(
        r"^\s*MERGE\s+INTO\s+(?P<db>[A-Za-z_]\w*)\.(?P<tbl>[A-Za-z_]\w*(?:\$branch_\w+)?)"
        r"\s+USING\s+(?P<src>\(.*\)|[A-Za-z_]\w*\.[A-Za-z_]\w*)\s*(?:(?:AS\s+)?(?!ON\b)[A-Za-z_]\w*\s*)?"
        r"\s+ON\s+(?P<on>.+?)\s+(?P<clauses>WHEN\s+.+?)\s*$",
        re.IGNORECASE | re.DOTALL,
    )

    def _sql_merge(self, m) -> int:
        """``MERGE INTO t USING s ON <pk equality> WHEN MATCHED THEN
        UPDATE SET * | DELETE / WHEN NOT MATCHED THEN INSERT *`` — the
        whole-row merge form (Paimon's Spark MERGE surface); column-level
        SET lists are not parsed (use ``merge_into``/``update_where``)."""
        src = m.group("src").strip()
        if src.startswith("("):
            source = self.sql(src[1:-1])  # facade views are storage-form
        else:
            # storage form, like the target read inside merge_into — a
            # padded source vs rtrimmed target would never match CHAR keys
            source = self.read_table(src, pad_char=False)
        keys = []
        for conj in re.split(r"\s+AND\s+", m.group("on").strip(), flags=re.IGNORECASE):
            eq = re.fullmatch(
                r"\s*(?:[A-Za-z_]\w*\.)?([A-Za-z_]\w*)\s*=\s*(?:[A-Za-z_]\w*\.)?([A-Za-z_]\w*)\s*",
                conj,
            )
            if not eq or eq.group(1).lower() != eq.group(2).lower():
                raise ValueError(f"MERGE ON must be PK equality conjuncts, got {conj!r}")
            keys.append(eq.group(1))
        clauses = m.group("clauses")
        when_matched = None
        if re.search(r"WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*", clauses, re.IGNORECASE):
            when_matched = "update"
        elif re.search(r"WHEN\s+MATCHED\s+THEN\s+DELETE", clauses, re.IGNORECASE):
            when_matched = "delete"
        when_not_matched = (
            "insert"
            if re.search(r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT", clauses, re.IGNORECASE)
            else None
        )
        return self.merge_into(
            m.group("db"), m.group("tbl"), source, keys,
            when_matched=when_matched, when_not_matched=when_not_matched,
        )

    def _sql_dml(self, query: str):
        """INSERT INTO/OVERWRITE, DELETE FROM, UPDATE on lake tables —
        write statements the read-only reference never had. Returns the
        snapshot id of the commit, or None if ``query`` is not DML."""
        m = self._INSERT_RE.match(query)
        if m:
            df = self.sql(m.group("rest"))
            db, tbl = m.group("db"), m.group("tbl")
            schema = self._latest_schema(self._table_dir(db, tbl))
            expected = [(f.name, f.type) for f in schema.fields]
            names = [n for n, _ in expected]
            listed = [c.strip() for c in (m.group("cols") or "").split(",") if c.strip()]
            # the arity/rebind logic below sees only data columns: a rider
            # _row_kind changelog column from the source query is not part of
            # the positional binding and must not trip the arity check
            data_cols = [c for c in df.columns if c != KIND_COL]
            if KIND_COL in df.columns:
                # move the rider last so the positional toDF rebinds below
                # map data columns 1:1 regardless of where it appeared
                df = df.select(*data_cols, KIND_COL)
            if listed:
                # explicit column list: bind the SELECT/VALUES positionally to
                # the listed columns, fill the rest with typed NULLs
                unknown = [c for c in listed if c not in names]
                if unknown:
                    raise ValueError(f"INSERT column(s) {unknown} not in {names}")
                if len(listed) != len(data_cols):
                    raise ValueError(
                        f"INSERT lists {len(listed)} column(s) but the query "
                        f"produces {len(data_cols)}"
                    )
                df = df.toDF(*listed, *([KIND_COL] if KIND_COL in df.columns else []))
                for n, tp in expected:
                    if n not in listed:
                        df = df.withColumn(n, F.lit(None).cast(paimon_to_spark(tp)))
            elif set(data_cols) != set(names):
                # no column list and names don't line up (e.g. a VALUES tuple
                # with synthetic col1/col2 names): SQL INSERT is positional
                if len(data_cols) != len(names):
                    raise ValueError(
                        f"INSERT arity mismatch: table has {len(names)} "
                        f"column(s), query produces {len(data_cols)}"
                    )
                df = df.toDF(*names, *([KIND_COL] if KIND_COL in df.columns else []))
            # coerce to the declared types (SQL assignment casts; a VALUES
            # integer literal lands in a BIGINT column, etc.); an explicit
            # _row_kind changelog column rides along untouched
            df = df.select(
                *[F.col(n).cast(paimon_to_spark(t)).alias(n) for n, t in expected],
                *([KIND_COL] if KIND_COL in df.columns else []),
            )
            return self.insert_into(
                db, tbl, df, overwrite=m.group(1).upper() == "OVERWRITE"
            )
        m = self._MERGE_RE.match(query)
        if m:
            return self._sql_merge(m)
        m = self._DELETE_RE.match(query)
        if m:
            cond = F.expr(m.group("where")) if m.group("where") else F.lit(True)
            return self.delete_where(m.group("db"), m.group("tbl"), cond)
        m = self._TRUNCATE_RE.match(query)
        if m:
            # TRUNCATE = an overwrite commit with zero rows: works on both
            # PK and append-only tables (DELETE is PK-only), and history
            # stays time-travelable — the pre-truncate snapshots keep their
            # file lists until expiration.
            from pyspark.sql import types as _T

            schema = self._latest_schema(self._table_dir(m.group("db"), m.group("tbl")))
            empty = self.spark.createDataFrame(
                [],
                _T.StructType(
                    [_T.StructField(f.name, paimon_to_spark(f.type)) for f in schema.fields]
                ),
            )
            return self.insert_into(m.group("db"), m.group("tbl"), empty, overwrite=True)
        m = self._UPDATE_RE.match(query)
        if m:
            assignments = {}
            for part in _split_top_level(m.group("sets")):
                col, _, expr = part.partition("=")
                assignments[col.strip()] = F.expr(expr.strip())
            return self.update_where(
                m.group("db"), m.group("tbl"), F.expr(m.group("where")), assignments
            )
        return None

    #: information_schema relations (Trino builds these from the connector's
    #: listSchemaNames/listTables/streamTableColumns —
    #: ``common/TrinoMetadataBase.java:271-287``).
    _INFO_SCHEMA_RELATIONS = ("schemata", "tables", "columns")

    def information_schema(self, relation: str) -> DataFrame:
        """Queryable ``information_schema`` relation as a DataFrame.

        Metadata-only: rows come from the catalog's schema JSONs — no data
        file is opened, so this stays O(#tables) at any data scale (the same
        property the reference gets by answering from ``TrinoMetadataBase``
        handles rather than scans).
        """
        rel = relation.lower()
        if rel == "schemata":
            rows = [(db,) for db in sorted(self.list_databases())]
            return self.spark.createDataFrame(rows, "schema_name string")
        if rel == "tables":
            rows = [
                (db, t, "BASE TABLE")
                for db in sorted(self.list_databases())
                for t in sorted(self.list_tables(db))
            ]
            return self.spark.createDataFrame(
                rows, "table_schema string, table_name string, table_type string"
            )
        if rel == "columns":
            rows = []
            for db in sorted(self.list_databases()):
                for t in sorted(self.list_tables(db)):
                    s = self.schema_of(db, t)
                    pk = set(s.primary_key or ())
                    for i, f in enumerate(s.fields, 1):
                        # PK columns are NOT NULL by definition in Paimon
                        nullable = f.nullable and f.name not in pk
                        rows.append(
                            # column_default is always NULL — Paimon has no
                            # column defaults; Trino's connector columns view
                            # carries the slot anyway, in the SQL-standard
                            # order ordinal_position, column_default,
                            # is_nullable, data_type
                            # (common/TrinoMetadataBase.java:271-287)
                            (db, t, f.name, i, None,
                             "YES" if nullable else "NO", f.type, f.comment)
                        )
            return self.spark.createDataFrame(
                rows,
                "table_schema string, table_name string, column_name string, "
                "ordinal_position int, column_default string, "
                "is_nullable string, data_type string, comment string",
            )
        raise ValueError(
            f"unknown information_schema relation {relation!r}; "
            f"have {self._INFO_SCHEMA_RELATIONS}"
        )

    _INFO_SCHEMA_REF = re.compile(
        r"\binformation_schema\.(schemata|tables|columns)\b", re.IGNORECASE
    )

    def sql(self, query: str) -> DataFrame:
        """Run SQL over lake tables — the Trino entry-point surface (SURVEY
        §3.1/§3.2) on Spark SQL.

        ``db.table`` references (plus ``db.table$snapshots``-style system
        tables — A13 — and ``FOR VERSION AS OF n`` / ``FOR TIMESTAMP AS OF
        ts`` time travel — A11) are resolved through the catalog: each
        becomes a temp view over the catalog's DataFrame (merge-on-read,
        snapshot-pinned, etc.) and the query text is rewritten to the view
        name. Spark SQL then plans the query exactly as Trino's engine
        would plan over connector handles — pushdowns reach the parquet
        scan through the view.

        Dotted names that do not resolve in the catalog (e.g. alias.column
        references) are left untouched. Timestamps accept epoch-millis or a
        quoted ``'YYYY-MM-DD HH:MM:SS'`` literal (UTC).
        """
        ddl = self._sql_ddl(query)
        if ddl is not None:
            return ddl
        dml = self._sql_dml(query)
        if dml is not None:
            return self.spark.createDataFrame([(dml,)], "snapshot_id bigint")

        # information_schema.<rel> references resolve to metadata views
        quoted0 = _quoted_spans(query)
        if any(
            not any(a <= m.start() < b for a, b in quoted0)
            for m in self._INFO_SCHEMA_REF.finditer(query)
        ):
            referenced = {
                m.group(1).lower()
                for m in self._INFO_SCHEMA_REF.finditer(query)
                if not any(a <= m.start() < b for a, b in quoted0)
            }
            for rel in referenced:
                # build only what the query names — the columns view reads
                # every table's schema JSON, too costly to create eagerly
                self.information_schema(rel).createOrReplaceTempView(
                    f"information_schema__{rel}"
                )
            pieces, last0 = [], 0
            for m in self._INFO_SCHEMA_REF.finditer(query):
                if any(a <= m.start() < b for a, b in quoted0):
                    continue
                pieces.append(query[last0 : m.start()])
                pieces.append(f"information_schema__{m.group(1).lower()}")
                last0 = m.end()
            query = "".join(pieces) + query[last0:]

        dbs = set(self.list_databases())
        quoted = _quoted_spans(query)
        out, last = [], 0
        for m in self._TABLE_REF.finditer(query):
            if any(a <= m.start() < b for a, b in quoted):
                continue  # inside a string literal — not a table reference
            db, tbl, sys_sfx = m.group("db"), m.group("tbl"), m.group("sys")
            if db not in dbs or tbl not in self.list_tables(db):
                continue
            ver_raw = m.group("ver")
            ver = tag = None
            if ver_raw is not None:
                if ver_raw.startswith("'"):
                    # Paimon accepts tag names in VERSION AS OF travel
                    tag = ver_raw.strip("'")
                else:
                    ver = int(ver_raw)
            ts_raw = m.group("ts")
            ts = None
            if ts_raw is not None:
                if ts_raw.startswith("'"):
                    dt = _dt.datetime.fromisoformat(ts_raw.strip("'"))
                    ts = int(dt.replace(tzinfo=_dt.timezone.utc).timestamp() * 1000)
                else:
                    ts = int(ts_raw)
            view = f"{db}__{tbl}"
            name = f"{db}.{tbl}"
            if sys_sfx:
                view += f"__{sys_sfx}"
                name += f"${sys_sfx}"
            if ver is not None:
                view += f"__v{ver}"
            if tag is not None:
                view += "__tag_" + re.sub(r"\W", "_", tag)
            if ts is not None:
                view += f"__t{ts}"
            # STORAGE-form views (pad_char=False): Spark SQL has no CHAR
            # comparator, so a padded view would make WHERE c = 'ab' on a
            # CHAR(5) column silently match nothing — the worst failure
            # mode. Storage-form views keep every comparison/group/join
            # over char columns pad-insensitive with unpadded literals
            # (the pre-r9 facade semantics); the reference-faithful PADDED
            # surface is the API read (read_table), hash-gated by
            # lake_char_padded_read. Documented in functions/types.py.
            df = self.read_table(
                name, version_as_of=ver, timestamp_as_of=ts, tag=tag, pad_char=False
            )
            if sys_sfx is None and ver is None and tag is None and ts is None:
                # plain current-version reads get the ANALYZE-stats broadcast
                # decision (time-travel/system reads describe other versions)
                df = self._broadcast_by_stats(db, tbl, df)
            df.createOrReplaceTempView(view)
            out.append(query[last : m.start()])
            out.append(view)
            last = m.end()
        return self.spark.sql("".join(out) + query[last:])


def explode_dv_index_text(df: DataFrame, ver_col=None) -> DataFrame:
    """(file basename, position) marks from wholetext DV index JSON rows —
    the ONE parse/explode pipeline shared by the batch DV read
    (``_dv_apply_distributed``), the retraction stream's marks side, and
    its resume baseline (``streaming/changelog.py``), so no two paths can
    disagree on path normalization. ``ver_col`` (optional expression) rides
    along as ``_dv_ver``. An index that does not parse fails LOUDLY —
    silently exploding nothing would drop deletes."""
    carry = ["_dv_ver"] if ver_col is not None else []
    head = [ver_col.alias("_dv_ver")] if ver_col is not None else []
    parsed = F.from_json("value", "vectors map<string, array<bigint>>")
    return (
        df.select(*head, parsed.alias("_vecs"))
        .filter(
            F.assert_true(
                F.col("_vecs.vectors").isNotNull(),
                F.concat(F.lit("unreadable DV index: "), F.input_file_name()),
            ).isNull()
        )
        .select(*carry, F.explode("_vecs.vectors").alias("_rel", "_ps"))
        .select(
            *carry,
            F.element_at(
                F.split(F.regexp_replace("_rel", r"\\", "/"), "/"), -1
            ).alias(_DV_FILE),
            F.explode("_ps").alias(_DV_POS),
        )
    )


def partition_column_expr(pname: str, type_ddl: str) -> Column:
    """Rebuild hive partition column ``pname`` from ``input_file_name()``.

    Two escape layers: input_file_name returns a URI (its own %XX encoding)
    wrapping the hive-escaped dir name. Decode twice, each time shielding
    literal '+' (legal in both layers) from url_decode's plus-means-space.
    Used by both the batch read path and the changelog stream reader, so
    partitioned tables never depend on Spark's directory inference (which
    cannot see manifest-selected file subsets)."""
    raw = F.regexp_extract(F.input_file_name(), "/" + re.escape(pname) + "=([^/]*)/", 1)
    shield = lambda c: F.regexp_replace(c, r"\+", "%2B")  # noqa: E731
    decoded = F.url_decode(shield(F.url_decode(shield(raw))))
    return (
        F.when(raw == F.lit(_HIVE_NULL), F.lit(None))
        .otherwise(decoded)
        .cast(castable_ddl(type_ddl))
    )


def _record_dynamic_buckets(files: list[dict]) -> None:
    """Stamp dynamic-bucket manifest entries from their ``bucket-N`` path
    segment. ``bucket_n = -1`` marks the layout as index-assigned: the hash
    pruner must skip these (bucket id is NOT hash-derivable from a key —
    that is the whole point of dynamic mode), so only ``$files``/maintenance
    consumers read the stamp."""
    for e in files:
        m = re.search(r"(?:^|/)bucket-(\d+)/", e["path"].replace("\\", "/"))
        if m:
            e["bucket"] = int(m.group(1))
            e["bucket_n"] = -1


def _record_buckets(files: list[dict], schema: TableSchema, bucket_key: str, n: int) -> None:
    """Stamp each manifest entry with the hash bucket its file holds.

    ``repartition(n, col)`` gives the write stage exactly n tasks; the task
    index survives in the ``part-NNNNN`` file-name component (one write
    stage, hive partitioning doesn't renumber), so bucket id = part index.
    Recording (bucket, n, key-field-id) per FILE makes pruning robust to
    later bucket-count/key changes — each file is judged against the layout
    it was written under."""
    fid = schema.field_by_name(bucket_key).id
    for e in files:
        m = re.search(r"-part-(\d+)-", os.path.basename(e["path"]))
        if m and int(m.group(1)) < n:
            e["bucket"] = int(m.group(1))
            e["bucket_n"] = n
            e["bucket_fid"] = fid


def _bucket_prune_values(predicate: list | None, schema: TableSchema) -> tuple[int, list] | None:
    """Equality/IN values on a column usable for bucket pruning, as
    (field_id, values) — None when the predicate doesn't pin the column."""
    for d in predicate or []:
        if d.null_allowed or d.is_null is True or d.ranges:
            continue
        try:
            fid = schema.field_by_name(d.column).id
        except KeyError:
            continue
        if d.op == "=" and d.in_values is None:
            return fid, [d.value]
        if d.in_values is not None and d.op is None:
            return fid, list(d.in_values)
    return None


#: column types a sequence_field may have — merge order needs a total order
#: that survives the bigint/micros encoding in ``_sequence_expr``.
_SEQ_FIELD_TYPE_RE = re.compile(r"^(tinyint|smallint|int(eger)?|bigint|long|timestamp(_ntz)?)\b")


def _sequence_expr(schema: TableSchema, version: int):
    """The ``_seq`` value for a commit: the configured sequence_field column
    (business-time merge order) or the snapshot id (Paimon's default
    commit-level sequencing). Timestamps encode as epoch micros so sub-second
    ordering survives; type validity is enforced at CREATE/ALTER time."""
    seq_field = schema.options.get("sequence_field")
    if not seq_field:
        return F.lit(version).cast("bigint")
    t = schema.field_by_name(seq_field).type.strip().lower()
    if t.startswith("timestamp"):
        return F.unix_micros(F.col(seq_field).cast("timestamp_ltz"))
    return F.col(seq_field).cast("bigint")


#: The reference surfaces every Paimon CoreOption as a DDL property with
#: `.`/`-` mangled to `_` (``TrinoTableOptionUtils.convertOptionKey``,
#: ``common/TrinoTableOptionUtils.java:130-135``); unknown-but-valid keys
#: pass through as stored metadata. The seven enum-typed options
#: (``TrinoTableOptionUtils.java:94-128``) are validated against their value
#: sets at DDL time, exactly as the reference's typed properties reject a bad
#: value in CREATE TABLE rather than at first read/write.
_ENUM_OPTIONS: dict[str, tuple[str, ...]] = {
    # CoreOptions.FileFormatType
    "file_format": ("orc", "parquet", "avro"),
    # CoreOptions.MergeEngine
    "merge_engine": ("deduplicate", "partial-update", "aggregation", "first-row"),
    # CoreOptions.ChangelogProducer
    "changelog_producer": ("none", "input", "full-compaction", "lookup"),
    # clustering.strategy (Paimon append-table write clustering)
    "clustering_strategy": ("order", "zorder", "hilbert"),
    # CoreOptions.StartupMode
    "scan_mode": (
        "default", "latest-full", "full", "latest", "compacted-full",
        "from-timestamp", "from-snapshot", "from-snapshot-full", "incremental",
    ),
    # CoreOptions.LogConsistency
    "log_consistency": ("transactional", "eventual"),
    # CoreOptions.TagCreationMode / TagCreationPeriod (watermark mode needs
    # a stream watermark this batch writer doesn't carry — rejected at DDL)
    "tag_automatic_creation": ("none", "process-time"),
    "tag_creation_period": ("daily", "hourly"),
    # CoreOptions.LogChangelogMode
    "log_changelog_mode": ("auto", "all", "upsert"),
    # CoreOptions.StreamingReadMode
    "streaming_read_mode": ("log", "file"),
}


def _sql_like_to_regex(pattern: str, escape: str | None) -> re.Pattern:
    """Compile a SQL LIKE pattern (``%``/``_`` wildcards, optional ESCAPE
    character) to an anchored regex. An escaped wildcard is a literal; an
    escaped escape character is a literal escape character; a trailing
    escape with nothing to escape is an error (SQL semantics)."""
    out: list[str] = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if escape and ch == escape:
            if i + 1 >= len(pattern):
                raise ValueError(f"LIKE pattern ends with escape character: {pattern!r}")
            out.append(re.escape(pattern[i + 1]))
            i += 2
            continue
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
        i += 1
    return re.compile("".join(out))


def _shared_data_path(rel: str) -> bool:
    """True for manifest entries whose file lives OUTSIDE this snapshot
    chain's own ``data/`` dir: a branch's inherited parent files
    (``../../data/...``) and main entries grafted from a fast-forwarded
    branch (``branch/<name>/data/...``). Shared files are never deleted by
    this chain's expire/rollback — the parent's expiry (tag-pinned) and
    ``delete_branch`` own their lifecycle."""
    return rel.startswith("..") or rel.startswith("branch" + os.sep) or rel.startswith("branch/")


def _zorderable_ddl(ddl: str) -> bool:
    """Types with a monotonic grid embedding for the Morton key (see
    ``_zorder_expr``): numerics, date, timestamp. Strings have none."""
    d = ddl.lower()
    return (
        d
        in (
            "tinyint", "smallint", "int", "integer", "bigint", "long",
            "short", "byte", "float", "double", "real",
        )
        or d.startswith("decimal")
        or d == "date"
        or d.startswith("timestamp")
    )


def _check_not_reserved(name: str) -> None:
    """Reject a (new) column name the internal scaffolding owns — shared by
    CREATE TABLE, ADD COLUMN, and RENAME COLUMN so no DDL path can smuggle
    one in (the write paths would silently overwrite the user's column)."""
    from incubator_paimon_trino_spark.operators.merge_on_read import RESERVED_INTERNAL

    if name.lower() in {r.lower() for r in RESERVED_INTERNAL}:
        raise ValueError(f"column name {name!r} is reserved (system columns)")


def _rm_sidecar(data_path: str) -> None:
    """Remove a data file's colocated file-index sidecar, if any. Called
    wherever the data file itself is deleted — colocation makes the sidecar's
    lifecycle exactly the data file's, so no GC pass tracks them separately."""
    try:
        os.remove(data_path + _FIDX_SUFFIX)
    except FileNotFoundError:
        pass


def _pad_char_columns(df: DataFrame, schema: TableSchema) -> DataFrame:
    """User-facing CHAR(n) output form: storage stays rtrimmed-canonical,
    the declared length pads on at the very end of the read (shared by
    ``read_table`` and ``$ro`` so the padding contract has ONE home)."""
    for f_ in schema.fields:
        n_chars = char_length(f_.type)
        if n_chars is not None:
            df = df.withColumn(f_.name, F.rpad(F.col(f_.name), n_chars, " "))
    return df


def _parse_duration_ms(v: str) -> int:
    """Paimon/Flink TimeUtils-style durations: ``100``/``100 ms``/``30 s``/
    ``30 seconds``/``10 min``/``2 hours``/``1 d`` (unit optional = millis;
    full words, abbreviations, and plurals all accepted, like
    ``TimeUtils.parseDuration``)."""
    s = str(v).strip().lower()
    m = re.fullmatch(r"(\d+)\s*([a-z]*)", s)
    if m is None:
        raise ValueError(f"unparseable duration {v!r} (use e.g. '100 ms', '30 s', '1 d')")
    n = int(m.group(1))
    unit_word = m.group(2)
    units = {
        "": 1, "ms": 1, "msec": 1, "milli": 1, "millisecond": 1,
        "s": 1000, "sec": 1000, "second": 1000,
        "m": 60_000, "min": 60_000, "minute": 60_000,
        "h": 3_600_000, "hr": 3_600_000, "hour": 3_600_000,
        "d": 86_400_000, "day": 86_400_000,
    }
    unit = units.get(unit_word)
    if unit is None and unit_word.endswith("s"):
        # plural of a PLURALIZABLE word only ('seconds', 'mins', 'hrs');
        # a blanket strip would wrong-accept typos, possibly at wild
        # magnitudes ('30 ss', '500 mss')
        base = unit_word[:-1]
        if base in ("sec", "second", "min", "minute", "hr", "hour", "day",
                    "msec", "milli", "millisecond"):
            unit = units.get(base)
    if unit is None:
        raise ValueError(f"unparseable duration {v!r} (use e.g. '100 ms', '30 s', '1 d')")
    return n * unit


def _parse_byte_conf(v) -> int:
    """Spark size-conf values: plain bytes, or ``10485760b`` / ``10MB`` /
    ``1g``-style suffixed strings; -1 disables."""
    s = str(v).strip().lower()
    m = re.match(r"^(-?\d+)\s*(b|k|kb|m|mb|g|gb|t|tb)?$", s)
    if not m:
        return -1
    n = int(m.group(1))
    mult = {
        None: 1, "b": 1, "k": 1024, "kb": 1024, "m": 1024**2, "mb": 1024**2,
        "g": 1024**3, "gb": 1024**3, "t": 1024**4, "tb": 1024**4,
    }[m.group(2)]
    return n * mult


def _canonical_options(options: dict[str, str] | None) -> dict[str, str]:
    """Mangle option keys to the reference's DDL spelling: `.` and `-` → `_`
    (``TrinoTableOptionUtils.convertOptionKey``,
    ``common/TrinoTableOptionUtils.java:130-135``), so Paimon-native dotted
    keys (``snapshot.num-retained.max``) and mangled ones
    (``snapshot_num_retained_max``) address the SAME stored option — without
    this a dotted spelling would be stored but silently ignored by every
    consumer, and enum validation could be bypassed. Structured
    ``fields.<name>.aggregate-function`` keys keep their dotted namespace
    (the column name may itself contain the characters being mangled)."""
    out: dict[str, str] = {}
    for k, v in (options or {}).items():
        kk = k.strip()
        if kk.startswith("fields.") and (
            kk.endswith(".aggregate-function")
            or kk.endswith(".sequence-group")
            or kk.endswith(".distinct")
            or kk.endswith(".nested-key")
            or kk.endswith(".ignore-retract")
        ):
            pass  # dotted structured key: kept verbatim (column case preserved)
        elif m := re.fullmatch(r"fields[._](.+)[._]ignore[-_]retract", kk):
            mid = m.group(1).replace(".", "_").replace("-", "_")
            kk = f"fields_{mid}_ignore_retract"
        elif m := re.fullmatch(r"fields[._](.+)[._]nested[-_]key", kk):
            mid = m.group(1).replace(".", "_").replace("-", "_")
            kk = f"fields_{mid}_nested_key"
        elif m := re.fullmatch(r"fields[._](.+)[._]sequence[-_]group", kk):
            mid = m.group(1).replace(".", "_").replace("-", "_")
            kk = f"fields_{mid}_sequence_group"
        elif m := re.fullmatch(r"fields[._](.+)[._]distinct", kk):
            mid = m.group(1).replace(".", "_").replace("-", "_")
            kk = f"fields_{mid}_distinct"
        elif m := re.fullmatch(r"fields[._](.+)[._]aggregate[-_]function", kk):
            # any other separator mix (pure-mangled or hybrid like
            # ``fields.MyCol.aggregate_function``): normalize separators to
            # the mangled spelling but do NOT lower() — the middle is a
            # column name, and folding its case would resolve
            # ``fields_MyCol_aggregate_function`` to a nonexistent column
            # while the dotted spelling preserves case
            mid = m.group(1).replace(".", "_").replace("-", "_")
            kk = f"fields_{mid}_aggregate_function"
        else:
            kk = kk.lower().replace(".", "_").replace("-", "_")
        if kk in _ENUM_OPTIONS:
            # normalize enum VALUES too: consumers compare exactly, so a
            # validated-but-unnormalized 'First-Row' would pass CREATE and
            # then crash (or silently diverge) at first read/write
            v = v.strip().lower()
        if kk in out and out[kk] != v:
            raise ValueError(f"conflicting spellings for option {kk!r}")
        out[kk] = v
    return out


def _validate_table_options(
    names: list[str],
    primary_key: list[str],
    options: dict[str, str],
    types: dict[str, str] | None = None,
    partition_keys: list[str] | None = None,
) -> None:
    """Option-coherence checks shared by CREATE TABLE and SET PROPERTIES —
    validating only at create would let ALTER re-introduce the silently-
    ignored states these errors exist to prevent. Unknown option KEYS pass
    through (the reference reflects the full CoreOptions surface; storing an
    option our engine does not consume is valid metadata, not an error)."""
    from incubator_paimon_trino_spark.operators.merge_on_read import FIELD_AGGREGATES

    for key, allowed in _ENUM_OPTIONS.items():
        val = options.get(key)
        if val is not None and val.strip().lower() not in allowed:
            raise ValueError(f"invalid {key} {val!r}; allowed values: {allowed}")

    specs = _field_aggregate_specs(options)
    if specs and options.get("merge_engine") != "aggregation":
        raise ValueError(
            "fields.<name>.aggregate-function requires merge_engine='aggregation' "
            "(otherwise the configured aggregates would be silently ignored)"
        )
    if specs and not primary_key:
        raise ValueError("fields.<name>.aggregate-function requires a primary-key table")
    for col, func in specs.items():
        if col == "default" and "default" not in names:
            # Paimon's fields.default-aggregate-function: the fallback for
            # unspecified value columns (a real column named 'default'
            # outranks this reading). Container functions need a typed
            # column and cannot be a table-wide fallback.
            if func not in FIELD_AGGREGATES:
                raise ValueError(
                    f"unknown default aggregate-function {func!r}; have {FIELD_AGGREGATES}"
                )
            if func in ("collect", "merge_map", "nested_update", "count"):
                raise ValueError(
                    f"default aggregate-function cannot be {func!r} (container "
                    "functions need a typed ARRAY/MAP column; count needs the "
                    "write path's per-column 0/1 partials)"
                )
            continue
        if col not in names:
            raise ValueError(f"aggregate-function on unknown column {col!r}")
        if col in primary_key:
            raise ValueError(f"aggregate-function on primary-key column {col!r}")
        if func not in FIELD_AGGREGATES:
            raise ValueError(
                f"unknown aggregate-function {func!r} for {col!r}; have {FIELD_AGGREGATES}"
            )
        if types is not None and func in ("collect", "merge_map", "nested_update"):
            t = types.get(col, "").strip().lower()
            want = "array<struct" if func == "nested_update" else (
                "array" if func == "collect" else "map"
            )
            if not re.match(want.replace("<", r"\s*<\s*"), t):
                raise ValueError(
                    f"aggregate-function {func!r} requires an {want.upper()}<...> "
                    f"column; {col!r} is {t!r}"
                )
    for col, keys in _nested_key_specs(options).items():
        if specs.get(col) != "nested_update":
            raise ValueError(
                f"fields.{col}.nested-key requires aggregate-function "
                "'nested_update' on that column"
            )
        if types is not None:
            fields = _struct_field_names(types.get(col, ""))
            if fields is not None:
                missing = sorted(set(keys) - set(fields))
                if missing:
                    raise ValueError(
                        f"nested-key field(s) {missing} not in {col!r}'s row type "
                        f"(has {fields})"
                    )
    for col in _collect_distinct_cols(options):
        if specs.get(col) != "collect":
            raise ValueError(
                f"fields.{col}.distinct requires aggregate-function 'collect' on that "
                "column (distinct is the collect aggregate's switch)"
            )
    for col in _ignore_retract_cols(options):
        if options.get("merge_engine") != "aggregation":
            raise ValueError(
                f"fields.{col}.ignore-retract requires merge_engine='aggregation'"
            )
        if col not in names:
            raise ValueError(f"ignore-retract on unknown column {col!r}")
        if col in primary_key:
            raise ValueError(f"ignore-retract on primary-key column {col!r}")
    sgroups = _sequence_group_specs(options)
    if sgroups:
        if options.get("merge_engine") != "partial-update":
            raise ValueError(
                "fields.<seq>.sequence-group requires merge_engine='partial-update' "
                "(otherwise the configured groups would be silently ignored)"
            )
        if not primary_key:
            raise ValueError("fields.<seq>.sequence-group requires a primary-key table")
        if (
            options.get("partial_update_remove_record_on_delete", "").strip().lower()
            == "true"
        ):
            # Paimon rejects the combination: with groups configured the
            # merge routes through the sequence-group engine and
            # remove-record-on-delete would be SILENTLY ignored — the
            # state this validation layer exists to prevent
            raise ValueError(
                "partial-update.remove-record-on-delete cannot be combined with "
                "sequence groups (deletes then retract per group; the option "
                "would be silently ignored)"
            )
        seen_members: dict[str, str] = {}
        for g, members in sgroups.items():
            if g not in names:
                raise ValueError(f"sequence-group column {g!r} not in columns {names}")
            if g in primary_key:
                raise ValueError(f"sequence-group column {g!r} must not be a primary-key column")
            if not members:
                raise ValueError(f"sequence-group for {g!r} has no member columns")
            if types is not None:
                t = types.get(g, "").strip().lower()
                if not _SEQ_FIELD_TYPE_RE.match(t):
                    raise ValueError(
                        f"sequence-group column {g!r} has type {t!r}; an integral or "
                        "timestamp column is required (group merge order)"
                    )
            for m in members:
                if m not in names:
                    raise ValueError(f"sequence-group member {m!r} not in columns {names}")
                if m in primary_key:
                    raise ValueError(f"sequence-group member {m!r} must not be a primary-key column")
                if m in sgroups:
                    raise ValueError(
                        f"column {m!r} is both a sequence-group column and a member "
                        "(a group's seq already travels with its members)"
                    )
                if m in seen_members:
                    raise ValueError(
                        f"column {m!r} belongs to two sequence groups "
                        f"({seen_members[m]!r} and {g!r}); membership must be disjoint"
                    )
                seen_members[m] = g
    p_exp = options.get("partition_expiration_time")
    if p_exp:
        _parse_duration_ms(p_exp)  # malformed duration fails at DDL, not first commit
        if partition_keys is not None and not partition_keys:
            raise ValueError(
                "partition.expiration-time requires a partitioned table "
                "(there is no partition value to age out)"
            )
        if partition_keys and types:
            # the relative cutoff is a wall-clock DATE: the leading partition
            # column must be able to hold one (date/timestamp natively;
            # int/string by Paimon's yyyyMMdd / yyyy-MM-dd formatter
            # conventions — non-date-like VALUES are then skipped at expire
            # time). A float/bool/binary partition column can never age out,
            # so the option would be a silent no-op — reject at DDL.
            lead = partition_keys[0]
            t = (types.get(lead) or "").strip().lower()
            ok = t in ("date", "tinyint", "smallint", "int", "integer", "bigint") or t.startswith(
                ("timestamp", "string", "varchar", "char")
            )
            if not ok:
                raise ValueError(
                    f"partition.expiration-time needs a date-like leading partition "
                    f"column; {lead!r} is {t!r} (use date/timestamp, or int/string "
                    "holding yyyyMMdd / yyyy-MM-dd values)"
                )
    b_raw = options.get("bucket")
    if b_raw is not None:
        try:
            b = int(b_raw)
        except ValueError:
            raise ValueError(f"invalid bucket {b_raw!r}; an integer (-1 = dynamic) required")
        if b < -1:
            raise ValueError(f"invalid bucket {b}; use a positive count or -1 (dynamic)")
        if b == -1:
            # dynamic bucket mode: key→bucket comes from the maintained
            # index, so only PK tables qualify and the bucket key IS the
            # primary key (Paimon's dynamic-bucket contract)
            if not primary_key:
                raise ValueError("bucket = -1 (dynamic) requires a primary-key table")
            if options.get("bucket_key"):
                raise ValueError(
                    "bucket = -1 (dynamic) uses the primary key as the bucket "
                    "key; bucket-key must not be set"
                )
            if options.get("file_format", "parquet").strip().lower() == "avro":
                raise ValueError(
                    "bucket = -1 (dynamic) requires PARQUET or ORC (the "
                    "module-less avro fallback writer cannot partition by "
                    "the bucket layer)"
                )
    tn = options.get("dynamic_bucket_target_row_num")
    if tn is not None and (not str(tn).strip().isdigit() or int(tn) <= 0):
        raise ValueError(f"dynamic-bucket.target-row-num must be a positive integer, got {tn!r}")
    rrod = options.get("partial_update_remove_record_on_delete", "").strip().lower()
    if rrod and rrod not in ("true", "false"):
        raise ValueError(
            f"invalid partial-update.remove-record-on-delete {rrod!r}; use true/false"
        )
    if rrod == "true" and options.get("merge_engine") != "partial-update":
        raise ValueError(
            "partial-update.remove-record-on-delete requires "
            "merge_engine='partial-update'"
        )
    ig = options.get("ignore_delete", "").strip().lower()
    if ig and ig not in ("true", "false"):
        raise ValueError(f"invalid ignore-delete {ig!r}; use true/false")
    if ig == "true" and not primary_key:
        raise ValueError(
            "ignore-delete requires a primary-key table (append tables "
            "have no delete records to ignore)"
        )
    dv = options.get("deletion_vectors_enabled", "").strip().lower()
    if dv and dv not in ("true", "false"):
        raise ValueError(f"invalid deletion-vectors.enabled {dv!r}; use true/false")
    if dv == "true":
        # Paimon's deletion-vector mode: reads skip the merge entirely, so
        # the invariants that make "scan minus DV = merged state" true must
        # hold — latest-commit-wins ordering (deduplicate, no business-time
        # sequence) over a primary key.
        if not primary_key:
            raise ValueError("deletion-vectors.enabled requires a primary-key table")
        if options.get("merge_engine", "deduplicate") != "deduplicate":
            raise ValueError(
                "deletion-vectors.enabled requires merge_engine='deduplicate' "
                "(value-combining engines still need read-time merging, which "
                "DV mode's merge-free read skips)"
            )
        if options.get("sequence_field"):
            raise ValueError(
                "deletion-vectors.enabled is incompatible with sequence_field: "
                "vectors mark OLDER COMMITS' rows as superseded, but a business"
                "-time sequence lets an older commit outrank a newer one"
            )
        if options.get("file_format", "parquet").strip().lower() != "parquet":
            # the mark scan reads native row positions via
            # _metadata.row_index, which Spark provides for parquet only
            # (ORC/Avro raise FIELD_NOT_FOUND at the second commit)
            raise ValueError(
                "deletion-vectors.enabled requires file_format='PARQUET' "
                "(row positions come from _metadata.row_index, which Spark "
                "exposes for parquet scans only)"
            )
    seq_field = options.get("sequence_field")
    if seq_field and seq_field not in names:
        raise ValueError(f"sequence_field {seq_field!r} not in columns {names}")
    if seq_field and seq_field in primary_key:
        # a sequence column inside the key can never advance for a given key:
        # every rewrite ties with the row it replaces (merge order undefined),
        # and UPDATE becomes impossible (it must advance the sequence but may
        # not assign PK columns — two contradictory errors with no escape)
        raise ValueError(
            f"sequence_field {seq_field!r} must not be a primary-key column "
            "(key equality pins the sequence, so merge order between row "
            "versions would be undefined and UPDATE impossible)"
        )
    if seq_field and specs.get(seq_field) not in (None, "last_value", "first_value"):
        raise ValueError(
            f"sequence_field {seq_field!r} cannot carry aggregate-function "
            f"{specs[seq_field]!r}: the sequence column orders merges and a "
            "value-combining aggregate (sum/product/...) would produce a "
            "garbage sequence that outranks later real inserts"
        )
    if seq_field and types is not None:
        t = types.get(seq_field, "").strip().lower()
        if not _SEQ_FIELD_TYPE_RE.match(t):
            raise ValueError(
                f"sequence_field {seq_field!r} has type {t!r}; an integral or "
                "timestamp column is required (non-numeric values would cast "
                "to NULL and make merge order undefined)"
            )
    for dur_opt in ("consumer_expiration_time", "snapshot_time_retained"):
        dur = options.get(dur_opt)
        if dur is not None:
            _parse_duration_ms(dur)  # unparseable must fail at DDL, not at expire
    rk_field = options.get("rowkind_field")
    if rk_field:
        if not primary_key:
            raise ValueError("rowkind.field requires a primary-key table (row kinds drive merges)")
        if rk_field not in names:
            raise ValueError(f"rowkind.field {rk_field!r} not in columns {names}")
        if types is not None:
            t = types.get(rk_field, "").strip().lower()
            if not (t == "string" or t.startswith("varchar") or t.startswith("char")):
                raise ValueError(
                    f"rowkind.field {rk_field!r} has type {t!r}; a string column "
                    "holding +I/-D/+U/-U literals is required"
                )
    w_strategy = options.get("clustering_strategy", "").strip().lower()
    if w_strategy in ("zorder", "hilbert"):
        zcols = _split_cols(options.get("clustering_columns"))
        if len(zcols) < 2:
            raise ValueError(
                f"clustering.strategy='{w_strategy}' needs >= 2 clustering.columns "
                "(one column is plain range clustering — use 'order')"
            )
        if types is not None:
            bad_z = [c for c in zcols if not _zorderable_ddl(types.get(c, ""))]
            if bad_z:
                raise ValueError(
                    f"clustering.strategy='{w_strategy}' on column(s) {bad_z} — "
                    "numeric, date, or timestamp required (strings have no "
                    "grid embedding)"
                )
    if any(k.startswith("file_index_") for k in options):
        # file-index coherence: resolve the specs against a synthetic schema
        # so CREATE/ALTER fail loudly (unknown column, unsupported type,
        # partition/value-column misuse raise inside index_specs) instead of
        # storing an option every write would silently skip
        tmp = TableSchema(
            schema_id=0,
            fields=[Field(i, n, (types or {}).get(n, "string")) for i, n in enumerate(names)],
            primary_key=list(primary_key),
            partition_keys=list(partition_keys or []),
            options=options,
        )
        if _file_index_specs(tmp):
            fmt = options.get("file_format", "parquet").strip().lower()
            if fmt != "parquet":
                raise ValueError(
                    "file-index options require file_format='PARQUET' (the "
                    "index build reads the written files with pyarrow/Spark "
                    "parquet; ORC/AVRO files would silently never be indexed)"
                )


def _field_aggregate_specs(options: dict[str, str]) -> dict[str, str]:
    """Parse Paimon's ``fields.<name>.aggregate-function`` option keys
    (aggregation merge engine, CoreOptions surfaced via A16 DDL props).
    The reference's mangled DDL spelling ``fields_<name>_aggregate_function``
    (TrinoTableOptionUtils.convertOptionKey) is accepted too — fixed
    prefix/suffix make the column name unambiguous even with underscores;
    conflicting spellings for one column raise."""
    out: dict[str, str] = {}
    for pre, suf in (("fields.", ".aggregate-function"), ("fields_", "_aggregate_function")):
        for k, v in options.items():
            if k.startswith(pre) and k.endswith(suf) and len(k) > len(pre) + len(suf):
                col = k[len(pre) : -len(suf)]
                if col in out and out[col] != v:
                    raise ValueError(
                        f"conflicting aggregate-function spellings for column {col!r}"
                    )
                out[col] = v
    return out


def _date_like_partition_value(raw) -> "_dt.date":
    """A partition value as a date, accepting ONLY Paimon's timestamp-
    formatter shapes — 'yyyy-MM-dd' (ISO) and 'yyyyMMdd' (the integral
    convention). Anything else raises, which relative partition expiration
    turns into a conservative keep — a region id 1..25 must never compare
    against a wall-clock cutoff."""
    s = str(raw).strip()
    if re.fullmatch(r"\d{4}-\d{2}-\d{2}", s):
        return _dt.date.fromisoformat(s)
    if re.fullmatch(r"\d{8}", s):
        return _dt.datetime.strptime(s, "%Y%m%d").date()
    raise ValueError(f"partition value {raw!r} is not date-like (yyyy-MM-dd / yyyyMMdd)")


def _typed_partition_cutoff(v: str, ddl: str):
    """Parse a hive-path partition value (or a user cutoff literal) into the
    partition column's own comparison domain. Strings stay strings —
    Paimon's timestamp-formatter patterns ('yyyy-MM-dd', 'yyyyMMdd') order
    lexicographically, which is exactly the formatter contract."""
    t = ddl.strip().lower()
    if t in ("tinyint", "smallint", "int", "integer", "bigint"):
        return int(v)
    if t == "date":
        return _dt.date.fromisoformat(v)
    if t.startswith("timestamp"):
        return _dt.datetime.fromisoformat(v)
    return str(v)


def _sequence_group_specs(options: dict[str, str]) -> dict[str, list[str]]:
    """Parse Paimon's ``fields.<seq-col>.sequence-group=<a,b,...>`` option
    keys (partial-update merge engine's multi-stream sequence groups). Same
    dual-spelling contract as ``_field_aggregate_specs``; the VALUE is a
    comma-separated member column list, whitespace-tolerant."""
    out: dict[str, list[str]] = {}
    for pre, suf in (("fields.", ".sequence-group"), ("fields_", "_sequence_group")):
        for k, v in (options or {}).items():
            if k.startswith(pre) and k.endswith(suf) and len(k) > len(pre) + len(suf):
                col = k[len(pre) : -len(suf)]
                members = [m.strip() for m in v.split(",") if m.strip()]
                if col in out and out[col] != members:
                    raise ValueError(f"conflicting sequence-group spellings for column {col!r}")
                out[col] = members
    return out


def _nested_key_specs(options: dict[str, str]) -> dict[str, list[str]]:
    """Parse ``fields.<col>.nested-key=<k1,k2,...>`` (the nested_update
    aggregate's upsert key). Same dual-spelling contract as the other
    structured fields.* options."""
    out: dict[str, list[str]] = {}
    for pre, suf in (("fields.", ".nested-key"), ("fields_", "_nested_key")):
        for k, v in (options or {}).items():
            if k.startswith(pre) and k.endswith(suf) and len(k) > len(pre) + len(suf):
                col = k[len(pre) : -len(suf)]
                keys = [m.strip() for m in v.split(",") if m.strip()]
                if col in out and out[col] != keys:
                    raise ValueError(f"conflicting nested-key spellings for column {col!r}")
                out[col] = keys
    return out


def _struct_field_names(array_struct_ddl: str) -> list[str] | None:
    """Field names of an ``array<struct<...>>`` DDL string, or None when the
    type is not that shape. Top-level-comma split — names only (the full
    type is enforced by Spark at read time; this guards DDL typos early)."""
    t = array_struct_ddl.strip().lower()
    m = re.fullmatch(r"array\s*<\s*struct\s*<(.*)>\s*>", t, re.DOTALL)
    if m is None:
        return None
    inner, depth, part, names = m.group(1), 0, [], []
    for ch in inner:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            names.append("".join(part))
            part = []
        else:
            part.append(ch)
    names.append("".join(part))
    return [n.strip().split(":")[0].split()[0] for n in names if n.strip()]


def _fields_bool_cols(options: dict[str, str], dotted: str, mangled: str) -> set[str]:
    """Columns whose ``fields.<col>.<dotted>=true`` (or mangled spelling) —
    shared by the distinct and ignore-retract switches. A non-boolean value
    raises (silent ignore would drop the user's intent)."""
    out: set[str] = set()
    for pre, suf in (("fields.", f".{dotted}"), ("fields_", f"_{mangled}")):
        for k, v in (options or {}).items():
            if k.startswith(pre) and k.endswith(suf) and len(k) > len(pre) + len(suf):
                col = k[len(pre) : -len(suf)]
                vv = v.strip().lower()
                if vv not in ("true", "false"):
                    raise ValueError(f"invalid fields.{col}.{dotted} {v!r}; use true/false")
                if vv == "true":
                    out.add(col)
    return out


def _collect_distinct_cols(options: dict[str, str]) -> set[str]:
    """``fields.<col>.distinct=true`` (collect aggregate's distinct switch)."""
    return _fields_bool_cols(options, "distinct", "distinct")


def _ignore_retract_cols(options: dict[str, str]) -> set[str]:
    """``fields.<col>.ignore-retract=true`` (Paimon CoreOption): the column's
    -D rows contribute nothing and never raise, whatever the function's
    native retraction class."""
    return _fields_bool_cols(options, "ignore-retract", "ignore_retract")


def _limit_pushable(schema: TableSchema, predicate: list | None, files: list[dict]) -> bool:
    """A8 guard (``TrinoMetadataBase.java:418-445``): a scan-level LIMIT is
    sound only when partition values alone EXACTLY decide every surviving
    file — every predicate column is a partition key present in each file's
    path whose value (and the domain's literals) normalize cleanly, so the
    kept files contain ONLY matching rows — and no merge-on-read can
    collapse rows afterwards. Any conservative keep (unparseable value,
    truncated >=64-char string, renamed path column) disables the pushdown:
    counting a maybe-matching file toward the stop test could starve the
    limit."""
    from incubator_paimon_trino_spark.catalog.scan import _norm

    if schema.primary_key:
        return False
    domains = list(predicate or [])
    cols = {d.column for d in domains}
    if not cols:
        return True
    if not cols <= set(schema.partition_keys):
        return False
    ddls = {c: schema.field_by_name(c).type for c in cols}
    def decided(v, ddl) -> bool:
        try:
            return _norm(v, ddl) is not None
        except (TypeError, ValueError):
            return False  # _norm raises on type mismatches (scan.py contract)

    for d in domains:
        lits = ([d.value] if d.op is not None else []) + list(d.in_values or []) + [
            b for r in d.ranges for b in (r.low, r.high) if b is not None
        ]
        if any(lit is not None and not decided(lit, ddls[d.column]) for lit in lits):
            return False
    for e in files:
        pv = partition_values(e["path"])
        if not cols <= set(pv):
            return False  # renamed/missing partition path column → not exact
        for c in cols:
            if pv[c] is not None and not decided(pv[c], ddls[c]):
                return False  # value the pruner could not decide exactly
    return True


def _limit_file_prefix(files: list[dict], limit: int) -> list[dict]:
    """Shortest manifest prefix whose KNOWN record counts reach ``limit``
    (unknown counts add rows but never count toward the stop test, so the
    truncation can only keep extra files — never starve the limit)."""
    out: list[dict] = []
    acc = 0
    for e in files:
        out.append(e)
        acc += e.get("record_count") or 0
        if acc >= limit:
            break
    return out


def _physical_schema(schema: TableSchema, is_pk: bool, exclude: set[str] | None = None):
    """Schema of the bytes actually in a data file: table schema minus
    hive-layout partition columns (they live in the path), plus the PK
    changelog system columns."""
    from pyspark.sql import types as T

    full = schema.spark_schema()
    s = T.StructType([f for f in full.fields if f.name not in (exclude or set())])
    if is_pk:
        s = s.add(SEQ_COL, T.LongType()).add(KIND_COL, T.StringType())
    return s


def _split_col_comment(type_ddl: str) -> tuple[str, str | None]:
    """Split an optional trailing ``COMMENT 'text'`` (Trino column DDL) off a
    type string; ``''`` doubles as an escaped quote. Used by CREATE TABLE and
    ALTER TABLE ADD COLUMN so the comment is stored as field metadata, never
    as part of the type."""
    cm = re.match(r"(?is)^(.*?)\s+COMMENT\s+'((?:[^']|'')*)'\s*$", type_ddl)
    if cm:
        return cm.group(1).strip(), cm.group(2).replace("''", "'")
    return type_ddl, None


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested in parentheses or quotes (UPDATE SET list)."""
    parts, depth, quote, cur = [], 0, None, []
    for ch in s:
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p for p in (x.strip() for x in parts) if p]


def _quoted_spans(sql: str) -> list[tuple[int, int]]:
    """[start, end) spans of single-quoted string literals ('' escapes)."""
    spans, i, n = [], 0, len(sql)
    while i < n:
        if sql[i] == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            spans.append((i, min(j + 1, n)))
            i = j + 1
        else:
            i += 1
    return spans


def _file_row_count(path: str, ext: str) -> int:
    """Row count from the file footer — no data read, no plan re-execution."""
    if ext == "parquet":
        import pyarrow.parquet as pq

        return pq.ParquetFile(path).metadata.num_rows
    import pyarrow.orc as orc

    return orc.ORCFile(path).nrows
