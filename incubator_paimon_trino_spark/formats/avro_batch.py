"""Batch read of avro data files without the spark-avro module.

``paimon_avro`` — a Python DataSource (batch) over ``formats/avro_ocf``:
one read task per file, Arrow batches out, hive partition values injected
from the path (the directory inference Spark's native readers get from
``basePath`` — a Python source must supply them itself). Used by
``warehouse._read_files`` ONLY when the JVM module is absent.

Positional reads (r11, VERDICT r10 item 5 — deletion vectors on avro):
``with_pos`` makes the reader SYNTHESIZE the two provenance columns the DV
machinery needs — ``__dv_file`` (the file path) and ``__dv_pos`` (the row's
ordinal within its file). The OCF decode walks the container's blocks in
order and each block header carries its record count, so the running
ordinal is exact by the Avro spec's own framing — the fallback twin of
parquet's native ``_metadata.row_index``."""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class PaimonAvroBatchSource(DataSource):
    """Options: ``schema_ddl`` (output schema), ``data_fields`` /
    ``part_fields`` (JSON [(name, storage ddl)] — file-borne vs
    path-borne columns), ``files`` (JSON list of read TASKS, each a LIST
    of {path, parts: [(name, ddl, raw)]} — the caller bin-packs small
    files so per-task Python startup doesn't dominate many-small-file
    tables, the same trade the manifest stream's split packing makes)."""

    @classmethod
    def name(cls) -> str:
        return "paimon_avro"

    def schema(self) -> str:
        return self.options["schema_ddl"]

    def reader(self, schema) -> "_AvroBatchReader":
        return _AvroBatchReader(self.options)


class _AvroBatchReader(DataSourceReader):
    def __init__(self, opts) -> None:
        self.files = json.loads(opts["files"])
        self.data_fields = [tuple(f) for f in json.loads(opts["data_fields"])]
        self.part_fields = [tuple(f) for f in json.loads(opts["part_fields"])]
        self.with_pos = opts.get("with_pos", "").lower() == "true"

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(f) for f in self.files]

    def read(self, partition: InputPartition) -> Iterator:
        import pyarrow as pa

        from incubator_paimon_trino_spark.formats.avro_ocf import read_ocf_arrow
        from incubator_paimon_trino_spark.streaming.manifest_source import (
            _arrow_type,
            _typed_partition_value,
        )

        for spec in partition.value:
            table = read_ocf_arrow(spec["path"], self.data_fields)
            n = table.num_rows
            if n == 0:
                continue
            raw_parts = {k: raw for k, _ddl, raw in spec["parts"]}
            cols, names = [], []
            for name, ddl in self.data_fields:
                cols.append(table.column(name))
                names.append(name)
            for name, ddl in self.part_fields:
                at = _arrow_type(ddl)
                v = _typed_partition_value(raw_parts.get(name), ddl)
                cols.append(pa.array([v] * n, type=at))
                names.append(name)
            if self.with_pos:
                import numpy as np

                # running row ordinal within THIS file: read_ocf_arrow
                # decodes the container's blocks in order, so arange over
                # the decoded table is the block-header running count
                cols.append(pa.array([spec["path"]] * n, type=pa.string()))
                names.append("__dv_file")
                cols.append(pa.array(np.arange(n, dtype=np.int64)))
                names.append("__dv_pos")
            yield from pa.table(dict(zip(names, cols))).to_batches()
