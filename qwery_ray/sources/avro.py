"""Avro source/sink — gated behind fastavro (reference:
core/sources/AvroInputSource.scala / AvroOutputSource.scala, schema via
``WITH AVRO 'file.avsc'``).

fastavro is not available in this sandbox, so the codec raises a clear
ImportError at use; the Ray-side plumbing (read_binary_files → decode
map_batches; encode per batch → .avro container) is real and mirrors the
other sources."""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import ray.data as rd


def _require_fastavro():
    try:
        import fastavro  # noqa: F401

        return fastavro
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise ImportError(
            "Avro support requires the 'fastavro' package (not installed in "
            "this environment). Parquet covers the schema'd-binary role "
            "(SURVEY.md §2.3).") from exc


def read_avro(path: str, schema_path: Optional[str] = None) -> rd.Dataset:
    fastavro = _require_fastavro()

    def decode(batch: pa.Table) -> pa.Table:
        rows = []
        for blob in batch.column("bytes").to_pylist():
            import io

            rows.extend(fastavro.reader(io.BytesIO(blob)))
        return pa.Table.from_pylist(rows)

    return rd.read_binary_files(path).map_batches(
        decode, batch_format="pyarrow")


def write_avro(ds: rd.Dataset, path: str, schema: dict) -> int:
    fastavro = _require_fastavro()
    count = 0
    with open(path, "wb") as out:
        parsed = fastavro.parse_schema(schema)
        records = []
        for batch in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            records.extend(batch.to_pylist())
            count += len(batch)
        fastavro.writer(out, parsed, records)
    return count
