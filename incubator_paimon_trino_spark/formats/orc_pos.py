"""Positional ORC batch reads for deletion vectors (r11).

Spark's native ORC reader has no ``_metadata.row_index`` (that column is
parquet-only), which is why DV previously refused ORC at create time.
``paimon_orc_pos`` — a Python DataSource (batch) over ``pyarrow.orc`` —
closes the gap the same way the avro source does: one read task per file
group, the file read IN ORDER with ``__dv_pos`` synthesized as the running
row ordinal and ``__dv_file`` as the path, hive partition values injected
from the path. Used ONLY for ``with_pos`` reads of ORC tables (plain ORC
scans keep Spark's native vectorized reader); both readers consume the
same standard ORC files Spark's writer produces.
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class PaimonOrcPositionalSource(DataSource):
    """Options mirror ``paimon_avro``: ``schema_ddl`` (output), ``data_fields``
    / ``part_fields`` (JSON [(name, storage ddl)]), ``files`` (JSON list of
    read tasks, each a list of {path, parts})."""

    @classmethod
    def name(cls) -> str:
        return "paimon_orc_pos"

    def schema(self) -> str:
        return self.options["schema_ddl"]

    def reader(self, schema) -> "_OrcPosReader":
        return _OrcPosReader(self.options)


class _OrcPosReader(DataSourceReader):
    def __init__(self, opts) -> None:
        self.files = json.loads(opts["files"])
        self.data_fields = [tuple(f) for f in json.loads(opts["data_fields"])]
        self.part_fields = [tuple(f) for f in json.loads(opts["part_fields"])]

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(f) for f in self.files]

    def read(self, partition: InputPartition) -> Iterator:
        import numpy as np
        import pyarrow as pa
        import pyarrow.orc as po

        from incubator_paimon_trino_spark.streaming.manifest_source import (
            _arrow_type,
            _typed_partition_value,
        )

        for spec in partition.value:
            f = po.ORCFile(spec["path"])
            present = set(f.schema.names)
            wanted = [n for n, _ in self.data_fields if n in present]
            table = f.read(columns=wanted)
            n = table.num_rows
            if n == 0:
                continue
            raw_parts = {k: raw for k, _ddl, raw in spec["parts"]}
            cols, names = [], []
            for name, ddl in self.data_fields:
                at = _arrow_type(ddl)
                if name in present:
                    col = table.column(name)
                    if isinstance(col, pa.ChunkedArray):
                        col = col.combine_chunks()
                    cols.append(col.cast(at) if col.type != at else col)
                else:  # same-schema group: only a corrupt file lacks a column
                    cols.append(pa.nulls(n, type=at))
                names.append(name)
            for name, ddl in self.part_fields:
                at = _arrow_type(ddl)
                v = _typed_partition_value(raw_parts.get(name), ddl)
                cols.append(pa.array([v] * n, type=at))
                names.append(name)
            # running row ordinal: ORCFile.read preserves stripe/row order,
            # the positional contract DV marks are written against
            cols.append(pa.array([spec["path"]] * n, type=pa.string()))
            names.append("__dv_file")
            cols.append(pa.array(np.arange(n, dtype=np.int64)))
            names.append("__dv_pos")
            yield from pa.table(dict(zip(names, cols))).to_batches()
