"""Input sources: path/name → ray.data.Dataset.

Mirrors the reference's two-layer device×format factory
(core/devices/SourceUrlParser.scala `findInputSource`/`guessInputSourceFormat`,
core/sources/DelimitedInputSource.scala delimiter auto-detection) as a single
resolver over Ray Data's native readers. Format comes from an explicit hint
(`WITH CSV`, `WITH DELIMITER ';'`, ...) else the file extension, else a
5-line sniff — same precedence as the reference.
"""

from __future__ import annotations

import gzip
import os
from typing import Optional

import pyarrow as pa
import pyarrow.csv as pacsv
import ray.data as rd

_EXT_FORMAT = {
    ".parquet": "parquet", ".pq": "parquet",
    ".csv": "csv", ".tsv": "tsv", ".psv": "psv",
    ".json": "json", ".jsonl": "json", ".ndjson": "json",
    ".txt": "text",
}

_DELIMS = {"csv": ",", "tsv": "\t", "psv": "|"}


def _strip_gz(path: str) -> tuple[str, bool]:
    if path.endswith(".gz"):
        return path[:-3], True
    return path, False


def detect_format(path: str, hints: dict) -> str:
    if hints.get("format"):
        return hints["format"]
    if hints.get("delimiter"):
        return "csv"
    base, _ = _strip_gz(path)
    ext = os.path.splitext(base)[1].lower()
    return _EXT_FORMAT.get(ext, "csv")


def _open_head(path: str, n: int = 5) -> list[str]:
    """First n lines for delimiter sniffing (DelimitedInputSource.scala:36-57)."""
    opener = gzip.open if path.endswith(".gz") else open
    lines = []
    with opener(path, "rt", errors="replace") as f:
        for _ in range(n):
            line = f.readline()
            if not line:
                break
            if line.strip():
                lines.append(line.rstrip("\n"))
    return lines

def sniff_delimiter(path: str) -> str:
    """Pick the candidate delimiter splitting sample lines into the most
    (and consistent) columns — the reference's autodetect heuristic."""
    lines = _open_head(path)
    if not lines:
        return ","
    best, best_cols = ",", 1
    for cand in (",", "\t", "|", ";"):
        counts = [line.count(cand) for line in lines]
        if min(counts) >= 1 and len(set(counts)) == 1 and counts[0] + 1 > best_cols:
            best, best_cols = cand, counts[0] + 1
    return best


def _csv_header(path: str, delim: str) -> list[str]:
    lines = _open_head(path, 1)
    if not lines:
        return []
    table = pacsv.read_csv(
        pa.py_buffer((lines[0] + "\n").encode()),
        parse_options=pacsv.ParseOptions(delimiter=delim),
    )
    return table.column_names


def read_source(path: str, hints: Optional[dict] = None, *,
                all_strings: bool = True, columns: Optional[list[str]] = None,
                **ray_kwargs) -> rd.Dataset:
    """Resolve a path to a Dataset.

    ``all_strings=True`` reproduces the reference's CSV model (every CSV value
    is a string; math happens via lenient casts — SURVEY.md §1.2). Parquet and
    JSON keep their native types.
    """
    hints = dict(hints or {})
    fmt = detect_format(path, hints)
    if fmt == "parquet":
        return rd.read_parquet(path, columns=columns, **ray_kwargs)
    if fmt == "json":
        ds = rd.read_json(path, **ray_kwargs)
        # nested objects flatten to dotted column names, mirroring the
        # reference's JSON model (core/util/JSONSupport.scala parseColumns:
        # JsObject → "a.b" → v)
        return ds.map_batches(flatten_structs, batch_format="pyarrow")
    if fmt == "text":
        return rd.read_text(path, **ray_kwargs)
    if fmt in ("csv", "tsv", "psv", "delimited"):
        delim = hints.get("delimiter") or _DELIMS.get(fmt)
        sample_path = path
        if os.path.isdir(path):
            entries = sorted(os.listdir(path))
            sample_path = os.path.join(path, entries[0]) if entries else path
        if delim is None:
            delim = sniff_delimiter(sample_path)
        parse_options = pacsv.ParseOptions(delimiter=delim)
        convert_options = None
        if all_strings and os.path.exists(sample_path) and not os.path.isdir(sample_path):
            names = _csv_header(sample_path, delim)
            convert_options = pacsv.ConvertOptions(
                column_types={n: pa.string() for n in names})
        return rd.read_csv(path, parse_options=parse_options,
                           convert_options=convert_options, **ray_kwargs)
    if fmt == "fixed":
        return read_fixed_width(path, hints, **ray_kwargs)
    raise ValueError(f"unsupported input format {fmt!r} for {path}")


def flatten_structs(batch: pa.Table) -> pa.Table:
    """Recursively expand struct columns into dotted leaf columns."""
    changed = True
    while changed:
        changed = False
        cols, names = [], []
        for name in batch.column_names:
            col = batch.column(name)
            if pa.types.is_struct(col.type):
                combined = col.combine_chunks() if isinstance(
                    col, pa.ChunkedArray) else col
                for field in col.type:
                    names.append(f"{name}.{field.name}")
                    cols.append(combined.field(field.name))
                changed = True
            else:
                names.append(name)
                cols.append(col)
        if changed:
            batch = pa.table(dict(zip(names, cols)))
    return batch


def read_fixed_width(path: str, hints: dict, **ray_kwargs) -> rd.Dataset:
    """Fixed-width text: hints['widths'] = [(name, width), ...]
    (reference core/sources/FixedWidthInputSource.scala:9-34; `name^width`
    field specs, README.md:592-605). Slicing is vectorized per batch."""
    import pyarrow.compute as pc

    widths = hints.get("widths")
    if not widths:
        raise ValueError("fixed-width input requires widths hint [(name, width), ...]")

    def slice_batch(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        cols, names = [], []
        offset = 0
        for name, width in widths:
            cols.append(pc.utf8_trim_whitespace(
                pc.utf8_slice_codeunits(text, offset, offset + width)))
            names.append(name)
            offset += width
        return pa.table(dict(zip(names, cols)))

    return rd.read_text(path, **ray_kwargs).map_batches(
        slice_batch, batch_format="pyarrow")
