"""kafka:// EventTail/EventSink against an in-memory mock confluent-kafka
client (the sandbox has no broker — the mock implements the exact client
surface the adapter uses: Consumer assign/seek/poll/watermarks/metadata,
Producer produce/flush, keyed partitioning with per-partition offsets)."""

import json

import pyarrow as pa
import pytest


# ------------------------------------------------------------- mock client
class _Msg:
    def __init__(self, topic, partition, offset, value, key):
        self._t, self._p, self._o = topic, partition, offset
        self._v, self._k = value, key

    def error(self):
        return None

    def value(self):
        return self._v

    def key(self):
        return self._k

    def offset(self):
        return self._o

    def partition(self):
        return self._p


class _Broker:
    """topic → list of per-partition message lists."""

    def __init__(self, partitions=1):
        self.topics: dict[str, list[list[_Msg]]] = {}
        self.partitions = partitions

    def ensure(self, topic):
        return self.topics.setdefault(
            topic, [[] for _ in range(self.partitions)])

    def produce(self, topic, value, key):
        parts = self.ensure(topic)
        p = (hash(key) % len(parts)) if key is not None else 0
        parts[p].append(_Msg(topic, p, len(parts[p]), value, key))


class MockTopicPartition:
    def __init__(self, topic, partition, offset=-1):
        self.topic, self.partition, self.offset = topic, partition, offset


def make_mock_module(broker):
    class MockConsumer:
        def __init__(self, conf):
            self.conf = conf
            self._assigned = None
            self._pos = 0

        def list_topics(self, topic):
            parts = broker.ensure(topic)

            class _T:
                partitions = {i: None for i in range(len(parts))}

            class _M:
                topics = {topic: _T()}

            return _M()

        def get_watermark_offsets(self, tp):
            msgs = broker.ensure(tp.topic)[tp.partition]
            return (0, len(msgs))

        def assign(self, tps):
            self._assigned = tps[0]

        def seek(self, tp):
            self._assigned = tp
            self._pos = tp.offset

        def poll(self, timeout=None):
            tp = self._assigned
            msgs = broker.ensure(tp.topic)[tp.partition]
            if self._pos >= len(msgs):
                return None
            m = msgs[self._pos]
            self._pos += 1
            return m

    class MockProducer:
        def __init__(self, conf):
            self.conf = conf

        def produce(self, topic, value, key=None):
            broker.produce(topic, value, key)

        def flush(self):
            pass

    class MockKafka:
        Consumer = MockConsumer
        Producer = MockProducer
        TopicPartition = MockTopicPartition

    return MockKafka()


@pytest.fixture()
def broker3(monkeypatch):
    """3-partition mock broker wired into the adapter's client hook."""
    import qwery_ray.cdc.kafka_tail as kt

    b = _Broker(partitions=3)
    monkeypatch.setattr(kt, "_clients", lambda: make_mock_module(b))
    return b


@pytest.mark.usefixtures("ray_session")
class TestKafkaAdapters:
    URL = "kafka://broker1:9092,broker2:9092/events"

    def test_registry_resolution(self, broker3):
        from qwery_ray.cdc.kafka_tail import KafkaSink, KafkaTail
        from qwery_ray.cdc.tail import resolve_sink, resolve_tail, sink_scheme

        assert isinstance(resolve_tail(self.URL), KafkaTail)
        assert isinstance(resolve_sink(self.URL), KafkaSink)
        assert sink_scheme(self.URL) == "kafka"

    def test_bad_urls(self, broker3):
        from qwery_ray.cdc.kafka_tail import _parse

        with pytest.raises(ValueError, match="kafka URL"):
            _parse("kafka://hostonly:9092")
        with pytest.raises(ValueError, match="kafka URL"):
            _parse("kafka:///topic-no-host")

    def test_publish_then_tail_roundtrip(self, broker3):
        from qwery_ray.cdc.tail import resolve_sink, resolve_tail

        sink = resolve_sink(self.URL)
        tbl = pa.table({
            "key": pa.array([f"k{i % 5}" for i in range(20)]),
            "v": pa.array(range(20), pa.int64()),
        })
        assert sink.publish(tbl) == 20

        tail = resolve_tail(self.URL)
        lo, hi = tail.lsn_range()
        got = tail.dataset(lo - 1, hi).to_pandas()
        assert len(got) == 20
        assert sorted(got["v"]) == list(range(20))
        # derived lsn is unique and the broker's (offset, partition) order
        assert got["lsn"].is_unique
        # per-key order preserved: same key → same partition → v ascending
        for _, grp in got.groupby("key"):
            assert grp.sort_values("lsn")["v"].is_monotonic_increasing

    def test_span_reads_are_bounded_and_repeatable(self, broker3):
        from qwery_ray.cdc.tail import resolve_sink, resolve_tail

        sink = resolve_sink(self.URL)
        sink.publish(pa.table({
            "key": pa.array([f"k{i}" for i in range(12)]),
            "v": pa.array(range(12), pa.int64()),
        }))
        tail = resolve_tail(self.URL)
        lo, hi = tail.lsn_range()
        mid = (lo + hi) // 2
        a1 = tail.dataset(lo - 1, mid).to_pandas()
        a2 = tail.dataset(lo - 1, mid).to_pandas()  # repeatable
        b = tail.dataset(mid, hi).to_pandas()
        assert a1["lsn"].tolist() == a2["lsn"].tolist()
        assert set(a1["v"]) | set(b["v"]) == set(range(12))
        assert not set(a1["lsn"]) & set(b["lsn"])
        assert a1["lsn"].max() <= mid < b["lsn"].min()

    def test_empty_topic_raises(self, broker3):
        from qwery_ray.cdc.tail import resolve_tail

        with pytest.raises(ValueError, match="no events"):
            resolve_tail("kafka://b:9092/empty-topic").lsn_range()

    def test_payload_lsn_is_overwritten_by_broker_order(self, broker3):
        from qwery_ray.cdc.tail import resolve_sink, resolve_tail

        sink = resolve_sink(self.URL)
        sink.publish(pa.table({
            "key": pa.array(["a", "a"]),
            "lsn": pa.array([999, 111], pa.int64()),  # payload lies
            "v": pa.array([1, 2], pa.int64()),
        }))
        tail = resolve_tail(self.URL)
        lo, hi = tail.lsn_range()
        got = tail.dataset(lo - 1, hi).to_pandas().sort_values("lsn")
        # broker order (publish order), not the payload's fake lsns
        assert got["v"].tolist() == [1, 2]
        assert got["lsn"].max() < 111

    def test_replay_through_kafka_tail(self, broker3, tmp_path):
        """Flagship integration: the exactly-once CDC replay consuming a
        kafka:// tail end-to-end (mocked wire, real engine)."""
        import numpy as np

        from qwery_ray.cdc.engine import CDCLakeEngine
        from qwery_ray.cdc.tail import resolve_sink

        rng = np.random.default_rng(5)
        n = 400
        paths = [f"src/f{int(x)}.py" for x in rng.integers(0, 60, n)]
        events = pa.table({
            # kafka message key = the LWW key → per-key order preserved
            "key": pa.array([f"org/r:{p}" for p in paths]),
            "repo": pa.array(["org/r"] * n),
            "path": pa.array(paths),
            "op": pa.array(["upsert"] * n),
            "content": pa.array([f"payload-{i}" for i in range(n)]),
        })
        resolve_sink(self.URL).publish(events)

        lake = str(tmp_path / "lake")
        eng = CDCLakeEngine(lake, num_partitions=4)
        man = eng.replay(self.URL, chunk_lsns=500)
        total = sum(int(p["rows"]) for p in man["partitions"].values())
        assert total == 60  # distinct keys survive (LWW upserts)
        # re-replay: exactly-once — watermark & txns unchanged
        man2 = eng.replay(self.URL, chunk_lsns=500)
        assert man2["watermark_lsn"] == man["watermark_lsn"]
        assert man2["committed_txns"] == man["committed_txns"]
