"""Input sources: path/name → ray.data.Dataset.

Mirrors the reference's two-layer device×format factory
(core/devices/SourceUrlParser.scala `findInputSource`/`guessInputSourceFormat`,
core/sources/DelimitedInputSource.scala delimiter auto-detection) as a single
resolver over Ray Data's native readers. Format comes from an explicit hint
(`WITH CSV`, `WITH DELIMITER ';'`, ...) else the file extension, else a
5-line sniff — same precedence as the reference.
"""

from __future__ import annotations

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

# ------------------------------------------------------- source registry
# name (URL scheme like "kafka"/"memory", or a format name) → factory
# fn(path, hints, *, columns=None, **ray_kwargs) -> ray.data.Dataset.
# Mirrors the reference's pluggable device factory hook
# (core/devices/InputDeviceFactory.scala:24-27 `add(prefix, factory)`):
# a registered scheme/format takes precedence over the built-in resolver.
_SOURCE_REGISTRY: dict = {}


def register_source(name: str, factory) -> None:
    """Register a custom reader for a URL scheme or format name."""
    _SOURCE_REGISTRY[name.lower()] = factory


def unregister_source(name: str) -> None:
    _SOURCE_REGISTRY.pop(name.lower(), None)


def _url_scheme(path: str) -> Optional[str]:
    if "://" in path:
        return path.split("://", 1)[0].lower()
    return None


def _filesystem_for(path: str):
    """(filesystem, fs-relative path) via pyarrow.fs — remote URLs
    (s3://, hdfs://, ...) resolve through Arrow's filesystem layer instead
    of crashing in local-only open()/os.path code. Unknown schemes fall
    back to fsspec when available."""
    from pyarrow import fs as pafs

    if "://" not in path:
        return pafs.LocalFileSystem(), path
    try:
        return pafs.FileSystem.from_uri(path)
    except (pa.ArrowInvalid, OSError, ValueError):
        try:
            import fsspec

            scheme, rest = path.split("://", 1)
            return pafs.PyFileSystem(
                pafs.FSSpecHandler(fsspec.filesystem(scheme))), rest
        except Exception:
            raise ValueError(
                f"cannot resolve filesystem for {path!r}; register a "
                f"custom reader with register_source('{_url_scheme(path)}', "
                f"factory)")


def source_exists(path: str) -> bool:
    """Existence check through pyarrow.fs (works for any resolvable URL;
    globs are deferred to the reader)."""
    if "*" in path:
        return True
    from pyarrow import fs as pafs

    try:
        filesystem, rel = _filesystem_for(path)
    except ValueError:
        return False
    try:
        return filesystem.get_file_info(rel).type != pafs.FileType.NotFound
    except OSError:
        return False


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
    if not ext and "://" not in path and os.path.isdir(path):
        # extension-less directory: sniff the first data file anywhere
        # below (hive-partitioned layouts nest files one level per key)
        for dirpath, _dirs, files in os.walk(path):
            for name in sorted(files):
                fext = os.path.splitext(_strip_gz(name)[0])[1].lower()
                if fext in _EXT_FORMAT:
                    return _EXT_FORMAT[fext]
    return _EXT_FORMAT.get(ext, "csv")


def _open_head(path: str, n: int = 5) -> list[str]:
    """First n lines for delimiter sniffing (DelimitedInputSource.scala:36-57).
    Reads through pyarrow.fs so URL paths (s3://, memory://, ...) sniff the
    same way local files do."""
    import io

    filesystem, rel = _filesystem_for(path)
    lines = []
    # open_input_stream auto-decompresses by extension (.gz included)
    with filesystem.open_input_stream(rel) as raw:
        data = raw.read(1 << 20)  # 1 MiB is ample for 5 sample lines
    for line in io.TextIOWrapper(io.BytesIO(data), errors="replace"):
        if line.strip():
            lines.append(line.rstrip("\n"))
        if len(lines) >= n:
            break
    return lines

def _sample_file(path: str) -> Optional[str]:
    """A concrete sample file for sniffing: the path itself, or the first
    file inside when it is a directory; None when nothing readable exists.
    Resolves through pyarrow.fs so URL directories work too."""
    from pyarrow import fs as pafs

    if "*" in path:
        return None
    try:
        filesystem, rel = _filesystem_for(path)
        info = filesystem.get_file_info(rel)
    except (ValueError, OSError):
        return None
    if info.type == pafs.FileType.NotFound:
        return None
    if info.type == pafs.FileType.Directory:
        entries = sorted(
            f.path for f in filesystem.get_file_info(pafs.FileSelector(rel))
            if f.type == pafs.FileType.File)
        if not entries:
            return None
        scheme = _url_scheme(path)
        return f"{scheme}://{entries[0]}" if scheme else entries[0]
    return path


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
    if hints.get("lake"):
        # FROM '<lake_dir>' WITH LAKE [VERSION n | CHANGES VERSION a [TO b]]
        # — committed lake snapshot (or the change data feed between two
        # retained snapshots) through the manifest, never raw partition
        # files mid-commit
        from ..cdc.engine import CDCLakeEngine

        eng = CDCLakeEngine.open(path)
        if hints.get("lake_changes_from") is not None:
            ds = eng.changes(hints["lake_changes_from"],
                             hints.get("lake_changes_to"))
        else:
            ds = eng.dataset(version=hints.get("lake_version"))
        if columns:
            ds = ds.select_columns(columns)
        return ds
    fmt = detect_format(path, hints)
    sniff_path = path  # original (possibly URL) path for header sniffing
    # registered custom sources take precedence: by explicit format hint,
    # then by URL scheme (the reference's InputDeviceFactory.add contract)
    scheme = _url_scheme(path)
    factory = _SOURCE_REGISTRY.get(fmt) or \
        (scheme and _SOURCE_REGISTRY.get(scheme))
    if factory:
        return factory(path, hints, columns=columns, **ray_kwargs)
    if scheme and scheme not in ("file", "local"):
        # remote URL on a built-in format: hand Ray the resolved filesystem
        filesystem, rel = _filesystem_for(path)
        ray_kwargs.setdefault("filesystem", filesystem)
        path = rel
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
        sample_path = _sample_file(sniff_path)
        if delim is None:
            delim = sniff_delimiter(sample_path)
        parse_options = pacsv.ParseOptions(delimiter=delim)
        convert_options = None
        if all_strings and sample_path is not None:
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


def sniff_column_names(path: str, hints: Optional[dict] = None) -> list[str]:
    """Column names a source WOULD expose, read from its header — the
    fallback when a Dataset over an empty (header-only) file reports no
    schema (Ray 2.49 `ds.schema()` is None when every block is empty)."""
    hints = dict(hints or {})
    fmt = detect_format(path, hints)
    if fmt in ("csv", "tsv", "psv", "delimited"):
        sample = _sample_file(path)
        if sample is None:
            return []
        delim = hints.get("delimiter") or _DELIMS.get(fmt) \
            or sniff_delimiter(sample)
        return _csv_header(sample, delim)
    if fmt == "fixed":
        return [name for name, _ in (hints.get("widths") or [])]
    if fmt == "text":
        return ["text"]
    return []


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


def _sqlite_factory(path: str, hints: dict, *, columns=None, **ray_kwargs):
    """Built-in registry entry: ``sqlite:///abs/path.db?table=t`` (optional
    ``&partition_col=c&num_partitions=N`` for the parallel read) — the SQL
    surface of the DBAPI/JDBC parity layer (see sources/dbapi.py)."""
    import sqlite3
    from urllib.parse import parse_qs, urlsplit

    from .dbapi import read_sql, read_sql_partitioned

    parts = urlsplit(path)
    db = parts.path
    qs = {k: v[0] for k, v in parse_qs(parts.query).items()}
    table = qs.get("table")
    if not table:
        raise ValueError(
            "sqlite source needs ?table=<name> (optionally "
            "&partition_col=<col>&num_partitions=<n>)")

    def factory(_db=db):
        return sqlite3.connect(_db)

    if qs.get("partition_col"):
        ds = read_sql_partitioned(
            table, factory, partition_col=qs["partition_col"],
            num_partitions=int(qs.get("num_partitions", "16")),
            columns=columns)
    else:
        cols = ", ".join(columns) if columns else "*"
        ds = read_sql(f"SELECT {cols} FROM {table}", factory)
    return ds


register_source("sqlite", _sqlite_factory)
