"""Avro source/sink (reference: core/sources/AvroInputSource.scala:14-35 /
AvroOutputSource.scala, schema via ``WITH AVRO 'file.avsc'``).

fastavro is the fast path when importable; otherwise the vendored
pure-Python codec (avro_codec.py — Apache Avro 1.11 binary spec) decodes
and encodes Object Container Files, so Avro works in this sandbox too.
The Ray-side plumbing mirrors the other sources: read_binary_files →
per-batch decode in map_batches; encode per batch → .avro container."""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import ray.data as rd


def _fastavro():
    try:
        import fastavro

        return fastavro
    except ImportError:
        return None


def read_avro(path: str, schema_path: Optional[str] = None) -> rd.Dataset:
    """Avro OCF file(s) → Dataset. Each input file decodes in one map task
    (Avro blocks are not splittable without an index; fine for the
    many-files layout Kafka dumps use)."""

    def decode(batch: pa.Table) -> pa.Table:
        import io

        fastavro = _fastavro()
        rows = []
        for blob in batch.column("bytes").to_pylist():
            if fastavro is not None:
                rows.extend(fastavro.reader(io.BytesIO(blob)))
            else:
                from .avro_codec import read_ocf

                rows.extend(read_ocf(blob)[1])
        return pa.Table.from_pylist(rows)

    return rd.read_binary_files(path).map_batches(
        decode, batch_format="pyarrow")


def write_avro(ds: rd.Dataset, path: str, schema: dict) -> int:
    """Dataset → one Avro OCF file (driver-side collect: the Avro sink is
    the small-export path; the lake's native format is parquet)."""
    fastavro = _fastavro()
    count = 0
    records = []
    for batch in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        records.extend(batch.to_pylist())
        count += len(batch)
    if fastavro is not None:
        with open(path, "wb") as out:
            fastavro.writer(out, fastavro.parse_schema(schema), records)
    else:
        from .avro_codec import write_ocf

        with open(path, "wb") as out:
            out.write(write_ocf(records, schema))
    return count
