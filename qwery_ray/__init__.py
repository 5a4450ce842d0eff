"""qwery_ray — a Ray-Data-native data-processing / CDC-ingest engine.

A from-scratch rebuild of the query and ETL capabilities of
ldaniels528/qwery (reference at /root/reference, studied not copied) on
idiomatic Ray Data: SQL statements compile to lazy Dataset pipelines of
vectorized Arrow batch transforms; the CDC specialization replays a
binlog/WAL-style change-event tail into a partitioned Parquet lake with
last-writer-wins semantics, exactly-once manifest commits and
checkpoint/resume (see qwery_ray.cdc).
"""

from .engine.session import QweryEngine

__version__ = "0.1.0"
__all__ = ["QweryEngine"]
