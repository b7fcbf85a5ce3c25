"""Kafka wire protocol (sources/kafka_protocol.py): codec vectors,
record-batch round-trips, and the client state machine against a
scripted broker — the same transport-injection strategy as the AMQP
and NSQ protocol tests (no broker in this container)."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given
from hypothesis import strategies as st

from rabbit_data_pipeline_spark.sources.kafka_protocol import (
    API_FETCH,
    API_LIST_OFFSETS,
    API_METADATA,
    API_PRODUCE,
    API_VERSIONS,
    EARLIEST,
    ByteReader,
    KafkaClient,
    KafkaProtocolError,
    crc32c,
    decode_record_batches,
    enc_varint,
    encode_record_batch,
    drain_to_queue_dir,
)


# ---------------------------------------------------------------- crc32c

def test_crc32c_check_value():
    # the canonical CRC-32C check vector
    assert crc32c(b"123456789") == 0xE3069283


def test_crc32c_empty_and_zeroes():
    assert crc32c(b"") == 0
    # 32 zero bytes — published Castagnoli vector (RFC 3720 B.4)
    assert crc32c(bytes(32)) == 0x8A9136AA


# ---------------------------------------------------------------- varint

@pytest.mark.parametrize(
    ("n", "wire"),
    [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"), (150, b"\xac\x02")],
)
def test_varint_vectors(n, wire):
    assert enc_varint(n) == wire
    assert ByteReader(wire).varint() == n


@given(st.integers(min_value=-(2**62), max_value=2**62))
def test_varint_roundtrip(n):
    assert ByteReader(enc_varint(n)).varint() == n


# ---------------------------------------------------------------- batches

def test_record_batch_roundtrip_with_headers_and_nulls():
    records = [
        (b"k1", b"v1", [("h", b"x"), ("hn", None)]),
        (None, b"tombstone-key-null"),
        (b"k3", None),  # null value = tombstone
    ]
    buf = encode_record_batch(records, base_timestamp_ms=1723600000000, base_offset=7)
    batches = decode_record_batches(buf)
    assert len(batches) == 1
    b = batches[0]
    assert b.base_offset == 7
    assert [r.offset for r in b.records] == [7, 8, 9]
    assert [r.key for r in b.records] == [b"k1", None, b"k3"]
    assert [r.value for r in b.records] == [b"v1", b"tombstone-key-null", None]
    assert b.records[0].headers == (("h", b"x"), ("hn", None))
    assert all(r.timestamp_ms == 1723600000000 for r in b.records)


def test_concatenated_batches_and_truncated_tail():
    b1 = encode_record_batch([(b"a", b"1")], base_offset=0)
    b2 = encode_record_batch([(b"b", b"2")], base_offset=1)
    # broker truncates the record set at max_bytes: partial batch is skipped
    out = decode_record_batches(b1 + b2 + b2[: len(b2) // 2])
    assert [bb.base_offset for bb in out] == [0, 1]
    assert out[1].records[0].value == b"2"


def test_corrupt_crc_raises():
    buf = bytearray(encode_record_batch([(b"k", b"v")]))
    buf[-1] ^= 0xFF  # flip a bit inside the CRC-covered span
    with pytest.raises(KafkaProtocolError, match="crc"):
        decode_record_batches(bytes(buf))


def test_compressed_batch_rejected_loudly():
    buf = bytearray(encode_record_batch([(b"k", b"v")]))
    # attributes live right after base_offset(8)+len(4)+epoch(4)+magic(1)+crc(4)
    attr_pos = 8 + 4 + 4 + 1 + 4
    buf[attr_pos : attr_pos + 2] = struct.pack(">h", 1)  # gzip bit
    covered = bytes(buf[attr_pos:])
    buf[8 + 4 + 4 + 1 : attr_pos] = struct.pack(">I", crc32c(covered))
    with pytest.raises(KafkaProtocolError, match="compressed"):
        decode_record_batches(bytes(buf))


# ---------------------------------------------------------------- scripted broker

def _enc_str(s):
    b = s.encode()
    return struct.pack(">h", len(b)) + b


def _resp(corr: int, body: bytes) -> bytes:
    payload = struct.pack(">i", corr) + body
    return struct.pack(">i", len(payload)) + payload


class ScriptedBroker:
    """Transport double: parses each request enough to route on api_key
    and replies from a canned script, dribbling bytes in odd-sized
    chunks so the client's reassembly is exercised."""

    def __init__(self):
        self.requests: list[tuple[int, int, int]] = []  # (api_key, version, corr)
        self._out = bytearray()
        self.produced: list[bytes] = []
        self.log: list[tuple[bytes | None, bytes | None]] = [
            (b"k0", b"v0"),
            (b"k1", b"v1"),
            (b"k2", b"v2"),
        ]

    def sendall(self, data: bytes) -> None:
        r = ByteReader(data)
        r.i32()  # size
        api_key, version, corr = r.i16(), r.i16(), r.i32()
        r.string()  # client_id
        self.requests.append((api_key, version, corr))
        self._out += self._respond(api_key, corr, r)

    def recv(self, n: int) -> bytes:
        take = min(n, 7, len(self._out))  # 7-byte dribble: frames split mid-field
        chunk = bytes(self._out[:take])
        del self._out[:take]
        return chunk

    def _respond(self, api_key: int, corr: int, r: ByteReader) -> bytes:
        if api_key == API_VERSIONS:
            body = struct.pack(">hi", 0, 2) + struct.pack(">hhh", 0, 0, 9) + struct.pack(">hhh", 1, 0, 13)
            return _resp(corr, body)
        if api_key == API_METADATA:
            body = (
                struct.pack(">i", 1) + struct.pack(">i", 1) + _enc_str("broker1")
                + struct.pack(">i", 9092) + struct.pack(">h", -1)  # null rack
                + struct.pack(">i", 1)  # controller_id
                + struct.pack(">i", 1)  # one topic
                + struct.pack(">h", 0) + _enc_str("events") + b"\x00"
                + struct.pack(">i", 1)  # one partition
                + struct.pack(">hii", 0, 0, 1)  # err, pid, leader
                + struct.pack(">i", 1) + struct.pack(">i", 1)  # replicas [1]
                + struct.pack(">i", 1) + struct.pack(">i", 1)  # isr [1]
            )
            return _resp(corr, body)
        if api_key == API_LIST_OFFSETS:
            body = (
                struct.pack(">i", 1) + _enc_str("events") + struct.pack(">i", 1)
                + struct.pack(">ihqq", 0, 0, -1, 0)  # partition, err, ts, offset=0
            )
            return _resp(corr, body)
        if api_key == API_PRODUCE:
            r.string()  # transactional_id (null -> None)
            r.i16()  # acks
            r.i32()  # timeout
            r.i32()  # topic count
            r.string()
            r.i32()  # partition count
            r.i32()  # partition
            self.produced.append(r.nbytes() or b"")
            body = (
                struct.pack(">i", 1) + _enc_str("events") + struct.pack(">i", 1)
                + struct.pack(">ihqq", 0, 0, len(self.log), -1)
                + struct.pack(">i", 0)  # throttle
            )
            return _resp(corr, body)
        if api_key == API_FETCH:
            r.i32(); r.i32(); r.i32(); r.i32(); r.i8()
            r.i32(); r.string(); r.i32(); r.i32()
            fetch_offset = r.i64()
            remaining = self.log[fetch_offset:]
            record_set = (
                encode_record_batch(remaining, base_offset=fetch_offset, base_timestamp_ms=1723600000000)
                if remaining
                else b""
            )
            body = (
                struct.pack(">i", 0)  # throttle
                + struct.pack(">i", 1) + _enc_str("events") + struct.pack(">i", 1)
                + struct.pack(">ihqq", 0, 0, len(self.log), len(self.log))
                + struct.pack(">i", 0)  # no aborted txns
                + struct.pack(">i", len(record_set)) + record_set
            )
            return _resp(corr, body)
        raise AssertionError(f"unexpected api_key {api_key}")


def test_api_versions_and_metadata():
    broker = ScriptedBroker()
    c = KafkaClient(broker)
    vers = c.api_versions()
    assert vers[API_PRODUCE] == (0, 9) and vers[API_FETCH] == (0, 13)
    md = c.metadata(["events"])
    assert md.brokers == ((1, "broker1", 9092),)
    assert md.topics[0].name == "events"
    assert md.topics[0].partitions[0].leader == 1


def test_produce_then_fetch_roundtrip():
    broker = ScriptedBroker()
    c = KafkaClient(broker)
    base = c.produce("events", 0, [(b"k9", b"v9")], base_timestamp_ms=1723600001000)
    assert base == 3  # appended at the end of the scripted log
    # what went over the wire is a valid, CRC-checked v2 batch
    sent = decode_record_batches(broker.produced[0])
    assert sent[0].records[0].key == b"k9"
    got = c.fetch("events", 0, offset=1)
    assert [r.value for r in got.records] == [b"v1", b"v2"]
    assert got.high_watermark == 3


def test_fetch_from_earliest_via_list_offsets():
    broker = ScriptedBroker()
    c = KafkaClient(broker)
    assert c.list_offsets("events", 0, EARLIEST) == 0


def test_correlation_mismatch_fails_loud():
    class BadBroker(ScriptedBroker):
        def _respond(self, api_key, corr, r):
            return super()._respond(api_key, corr + 1, r)

    c = KafkaClient(BadBroker())
    with pytest.raises(KafkaProtocolError, match="correlation"):
        c.api_versions()


def test_acks_zero_sends_and_expects_no_response():
    broker = ScriptedBroker()

    def no_reply(api_key, corr, r):
        # consume the produce payload like the real handler, reply nothing
        r.string(); r.i16(); r.i32(); r.i32(); r.string(); r.i32(); r.i32()
        broker.produced.append(r.nbytes() or b"")
        return b""

    broker._respond = no_reply
    c = KafkaClient(broker)
    assert c.produce("events", 0, [(b"k", b"v")], acks=0) is None
    assert broker.produced


def test_broker_error_code_raises_named_error():
    class ErrBroker(ScriptedBroker):
        def _respond(self, api_key, corr, r):
            if api_key == API_LIST_OFFSETS:
                body = (
                    struct.pack(">i", 1) + _enc_str("events") + struct.pack(">i", 1)
                    + struct.pack(">ihqq", 0, 3, -1, -1)
                )
                return _resp(corr, body)
            return super()._respond(api_key, corr, r)

    c = KafkaClient(ErrBroker())
    with pytest.raises(KafkaProtocolError, match="UNKNOWN_TOPIC_OR_PARTITION"):
        c.list_offsets("events", 0)


# ---------------------------------------------------------------- bridge

def test_drain_to_queue_dir_feeds_stream_substrate(spark, tmp_path):
    """End-to-end minus the socket: scripted broker → drain → queue-dir
    JSONL → the same (key,value,topic,ts) schema every stream source
    in this repo reads."""
    broker = ScriptedBroker()
    c = KafkaClient(broker)
    qdir = str(tmp_path / "q")
    n = drain_to_queue_dir(c, "events", 0, qdir, max_records=100)
    assert n == 3
    from rabbit_data_pipeline_spark.sources.stream import MESSAGE_SCHEMA

    df = spark.read.schema(MESSAGE_SCHEMA).json(qdir)
    rows = {r["key"]: r for r in df.collect()}
    assert set(rows) == {"k0", "k1", "k2"}
    assert rows["k1"]["value"] == "v1"
    assert rows["k1"]["topic"] == "events"
    assert (rows["k1"]["ts"].year, rows["k1"]["ts"].month, rows["k1"]["ts"].day) == (2024, 8, 14)
