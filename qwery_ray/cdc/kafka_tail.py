"""Kafka wire adapters for the EventTail/EventSink registry.

Parity target: the reference's Kafka devices
(core/devices/KafkaInputDevice.scala:14-90 — consumer with poll/seek/
getSize over partition offsets; KafkaOutputDevice.scala:9-36 — producer
publishing one record per row). Here the same wire behavior plugs into the
:mod:`qwery_ray.cdc.tail` registry as ``kafka://`` scheme factories, so
``replay(events="kafka://broker:9092/topic", ...)`` and
``INSERT INTO 'kafka://broker:9092/topic' ...`` work like any other tail.

Mapping onto the EventTail contract:

- **LSN**: the broker's (partition, offset) pair IS the ordering
  authority, exactly as offsets order the reference's consumer stream.
  With P partitions, ``lsn = offset * P + partition`` — unique, monotone
  within each partition, and stable across re-reads (a tail is a log).
  Any ``lsn`` field inside a payload is OVERWRITTEN by the derived value.
- **Per-key ordering**: the sink publishes each row with the payload's
  ``key`` column (when present) as the Kafka message key, so one key
  always lands in one partition and per-key order survives — the same
  guarantee the engine's LWW combiner needs.
- **Payload**: message values are UTF-8 JSON objects, one per row
  (columns = object keys). This is the lingua franca the reference's text
  layer speaks; binary formats can layer on by registering a different
  scheme.

``confluent_kafka`` is imported lazily inside the client helpers — the
module (and its registry hookup) is importable without the package; only
actually constructing a consumer/producer requires it. Tests exercise the
full wire protocol against an in-memory mock client (the sandbox has no
broker); see tests/test_kafka_tail.py.
"""

from __future__ import annotations

import json
from urllib.parse import parse_qs, urlparse

import pyarrow as pa
import ray.data as rd

from .tail import EventSink, EventTail, register_sink, register_tail


def _clients():
    """The confluent-kafka client classes (lazy; tests monkeypatch this)."""
    try:
        import confluent_kafka
    except ImportError as e:  # pragma: no cover - depends on environment
        raise ImportError(
            "kafka:// tails/sinks need the optional confluent-kafka "
            "package (pip install confluent-kafka)") from e
    return confluent_kafka


def _parse(url: str) -> tuple[str, str, dict]:
    """kafka://host1:9092,host2:9093/topic?group=g → (servers, topic, opts)."""
    u = urlparse(url)
    servers = u.netloc
    topic = u.path.lstrip("/")
    if not servers or not topic:
        raise ValueError(
            f"kafka URL must be kafka://bootstrap-servers/topic — got {url!r}")
    opts = {k: v[-1] for k, v in parse_qs(u.query).items()}
    return servers, topic, opts


class KafkaTail(EventTail):
    """Consumer-side adapter: poll/seek over a topic's partition offsets
    (KafkaInputDevice.scala:14-90 parity — seek/getSize map to
    ``get_watermark_offsets`` + assigned reads; reads are repeatable)."""

    def __init__(self, url: str):
        self.url = url
        self.servers, self.topic, self.opts = _parse(url)
        self._consumer = None
        self._nparts = None

    # -- client plumbing ---------------------------------------------------
    def _client(self):
        if self._consumer is None:
            ck = _clients()
            self._consumer = ck.Consumer({
                "bootstrap.servers": self.servers,
                "group.id": self.opts.get("group", "qwery-tail"),
                "enable.auto.commit": False,
                "auto.offset.reset": "earliest",
            })
        return self._consumer

    def _partitions(self) -> list[int]:
        meta = self._client().list_topics(self.topic)
        parts = sorted(meta.topics[self.topic].partitions)
        self._nparts = len(parts)
        return parts

    def _watermarks(self) -> list[tuple[int, int, int]]:
        """[(partition, earliest, latest)] — latest is the NEXT offset."""
        ck = _clients()
        con = self._client()
        out = []
        for p in self._partitions():
            lo, hi = con.get_watermark_offsets(
                ck.TopicPartition(self.topic, p))
            out.append((p, lo, hi))
        return out

    # -- EventTail contract --------------------------------------------------
    def lsn_range(self) -> tuple[int, int]:
        wm = self._watermarks()
        nparts = len(wm)
        lsns_lo = [lo * nparts + p for p, lo, hi in wm if hi > lo]
        lsns_hi = [(hi - 1) * nparts + p for p, lo, hi in wm if hi > lo]
        if not lsns_lo:
            raise ValueError(f"kafka topic {self.topic!r} has no events yet")
        return min(lsns_lo), max(lsns_hi)

    def dataset(self, lo: int, hi: int) -> rd.Dataset:
        ck = _clients()
        con = self._client()
        wm = self._watermarks()
        nparts = len(wm)
        rows: list[dict] = []
        for p, earliest, latest in wm:
            # lsn = o*P + p in (lo, hi]  ⇔  o in (floor((lo-p)/P), (hi-p)//P]
            o_lo = max(earliest, (lo - p) // nparts + 1)
            o_hi = min(latest - 1, (hi - p) // nparts)
            if o_hi < o_lo:
                continue
            tp = ck.TopicPartition(self.topic, p, o_lo)
            con.assign([tp])
            con.seek(tp)
            remaining = o_hi - o_lo + 1
            while remaining > 0:
                msg = con.poll(timeout=float(self.opts.get("timeout", 10)))
                if msg is None:
                    break  # span under-delivered: retryable (log semantics)
                if msg.error():
                    raise RuntimeError(f"kafka poll error: {msg.error()}")
                if msg.offset() > o_hi:
                    break
                payload = json.loads(msg.value())
                payload["lsn"] = msg.offset() * nparts + msg.partition()
                rows.append(payload)
                remaining -= 1
        if not rows:
            return rd.from_arrow(pa.table({"lsn": pa.array([], pa.int64())}))
        return rd.from_arrow(pa.Table.from_pylist(rows))


class KafkaSink(EventSink):
    """Producer-side adapter (KafkaOutputDevice.scala:9-36 parity): one
    JSON message per row, keyed by the payload's ``key`` column when
    present so per-key order survives partitioning; one flush per batch."""

    def __init__(self, url: str):
        self.url = url
        self.servers, self.topic, self.opts = _parse(url)
        self._producer = None

    def _client(self):
        if self._producer is None:
            ck = _clients()
            self._producer = ck.Producer(
                {"bootstrap.servers": self.servers})
        return self._producer

    def publish(self, table: pa.Table) -> int:
        prod = self._client()
        has_key = table.schema.get_field_index("key") >= 0
        for row in table.to_pylist():
            key = str(row["key"]).encode() if has_key else None
            prod.produce(self.topic, value=json.dumps(row).encode(),
                         key=key)
        prod.flush()
        return table.num_rows


register_tail("kafka", KafkaTail)
register_sink("kafka", KafkaSink)
