"""qwery_ray — a Ray-Data-native data-processing / CDC-ingest engine.

A from-scratch rebuild of the query and ETL capabilities of
ldaniels528/qwery (reference at /root/reference, studied not copied) on
idiomatic Ray Data: SQL statements compile to lazy Dataset pipelines of
vectorized Arrow batch transforms; the CDC specialization replays a
binlog/WAL-style change-event tail into a partitioned Parquet lake with
last-writer-wins semantics, exactly-once manifest commits and
checkpoint/resume (see qwery_ray.cdc).
"""

import os as _os

# polars is used for vectorized hashing/group-max inside Ray worker tasks;
# left unset it spawns a machine-wide thread pool PER WORKER (n_workers ×
# n_cores threads = oversubscription). One thread per task slot is correct —
# Ray provides the process-level parallelism. Must be set before the first
# polars import anywhere in the process.
_os.environ.setdefault("POLARS_MAX_THREADS", "1")


def _stub_fsspec_http() -> None:
    """Ray's path resolution probes ``fsspec.implementations.http`` on every
    read; without aiohttp that import fails, and with CONCURRENT driver
    threads (multi-writer OCC, pipelined map threads) the repeatedly failing
    import races — a half-initialized module in sys.modules turns the
    ModuleNotFoundError Ray catches into a bare ImportError it does not.
    Install a stub module with a sentinel HTTPFileSystem class so the probe
    succeeds deterministically (nothing is ever an instance of it)."""
    import sys as _sys

    try:
        import fsspec.implementations.http  # noqa: F401
        return
    except ImportError:
        pass
    import types as _types

    try:
        import fsspec.implementations as _fi
    except ImportError:
        return
    mod = _types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # sentinel only
        pass

    mod.HTTPFileSystem = HTTPFileSystem  # type: ignore[attr-defined]
    _sys.modules["fsspec.implementations.http"] = mod
    _fi.http = mod  # type: ignore[attr-defined]


_stub_fsspec_http()

from .engine.session import QweryEngine

__version__ = "0.1.0"
__all__ = ["QweryEngine"]
