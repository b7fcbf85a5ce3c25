"""Kafka wire protocol — codecs + minimal produce/fetch client.

Reference parity: src/Sources/Kafka.php consumes via rdkafka
(bootstrap brokers, topic, group knobs) and src/Sinks/Kafka.php
produces. The Spark-native path (sources/stream.py kafka_stream) needs
a spark-sql-kafka jar this container cannot fetch, so — like the AMQP
and NSQ peers (amqp_protocol.py / nsq_protocol.py) — this module
implements the broker protocol natively from the PUBLIC spec
(https://kafka.apache.org/protocol) over any socket-like transport:

  envelope  = [int32 size][payload]; request payload starts with
              header v1 (api_key i16, api_version i16, correlation i32,
              client_id nullable-string), responses echo the
              correlation id.
  APIs      : ApiVersions v0, Metadata v1, ListOffsets v1, Produce v3,
              Fetch v4 — all pre-flexible versions, so no tagged
              fields; every broker since 0.11 serves them, and 0.11+
              is also the floor for the v2 record-batch format below.
  batches   : RecordBatch magic v2 — the CRC32C-protected format
              (Castagnoli, implemented here table-driven in stdlib)
              with zigzag-varint record bodies and header arrays.

The transport is injected (anything with ``sendall``/``recv``), so the
codec and the request/response state machine are fully unit-tested
against scripted byte streams in this broker-less container, and the
same class speaks to a real broker the moment a host:port is
reachable. Spark-side ingestion stays the queue-dir substrate
(sources/stream.py): ``drain_to_queue_dir`` bridges fetched records in
as (key,value,topic,ts) JSONL files that Structured Streaming tails —
the protocol client feeds the corpus, the engine's plan is unchanged.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

API_PRODUCE = 0
API_FETCH = 1
API_LIST_OFFSETS = 2
API_METADATA = 3
API_VERSIONS = 18

EARLIEST = -2
LATEST = -1

# the error codes this client can actually encounter on its five APIs
ERROR_NAMES = {
    0: "NONE",
    1: "OFFSET_OUT_OF_RANGE",
    3: "UNKNOWN_TOPIC_OR_PARTITION",
    5: "LEADER_NOT_AVAILABLE",
    6: "NOT_LEADER_OR_FOLLOWER",
    7: "REQUEST_TIMED_OUT",
    35: "UNSUPPORTED_VERSION",
}


class KafkaProtocolError(RuntimeError):
    pass


# ---------------------------------------------------------------- crc32c

def _make_crc32c_table() -> list[int]:
    poly = 0x82F63B78  # Castagnoli, reflected
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        table.append(c)
    return table


_CRC32C_TABLE = _make_crc32c_table()


def crc32c(data: bytes, crc: int = 0) -> int:
    """CRC-32C (check value of b'123456789' is 0xE3069283)."""
    crc ^= 0xFFFFFFFF
    for b in data:
        crc = _CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


# ---------------------------------------------------------------- primitives

def enc_varint(n: int) -> bytes:
    """Zigzag varint (Kafka record fields are signed)."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_str(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode()
    return struct.pack(">h", len(b)) + b


def _enc_bytes(b: bytes | None) -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


class ByteReader:
    def __init__(self, data: bytes | memoryview) -> None:
        self.data = memoryview(data)
        self.pos = 0

    def remaining(self) -> int:
        return len(self.data) - self.pos

    def take(self, n: int) -> memoryview:
        if self.remaining() < n:
            raise KafkaProtocolError(f"truncated: need {n}, have {self.remaining()}")
        v = self.data[self.pos : self.pos + n]
        self.pos += n
        return v

    def _unpack(self, fmt: str, size: int):
        return struct.unpack(fmt, self.take(size))[0]

    def i8(self) -> int:
        return self._unpack(">b", 1)

    def i16(self) -> int:
        return self._unpack(">h", 2)

    def i32(self) -> int:
        return self._unpack(">i", 4)

    def i64(self) -> int:
        return self._unpack(">q", 8)

    def u32(self) -> int:
        return self._unpack(">I", 4)

    def varint(self) -> int:
        z, shift = 0, 0
        while True:
            b = self.take(1)[0]
            z |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 70:
                raise KafkaProtocolError("varint too long")
        return (z >> 1) ^ -(z & 1)

    def string(self) -> str | None:
        n = self.i16()
        return None if n < 0 else bytes(self.take(n)).decode()

    def nbytes(self) -> bytes | None:
        n = self.i32()
        return None if n < 0 else bytes(self.take(n))


# ---------------------------------------------------------------- records

@dataclass(frozen=True)
class KafkaRecord:
    offset: int
    timestamp_ms: int
    key: bytes | None
    value: bytes | None
    headers: tuple[tuple[str, bytes | None], ...] = ()


@dataclass(frozen=True)
class RecordBatch:
    base_offset: int
    records: tuple[KafkaRecord, ...] = field(default_factory=tuple)


def encode_record_batch(
    records: list[tuple[bytes | None, bytes | None]]
    | list[tuple[bytes | None, bytes | None, list[tuple[str, bytes | None]]]],
    base_timestamp_ms: int = 0,
    base_offset: int = 0,
) -> bytes:
    """RecordBatch magic v2, uncompressed. ``records`` is a list of
    (key, value) or (key, value, headers) tuples; all records share
    ``base_timestamp_ms`` (per-record deltas stay 0 — the producer
    side of this client stamps batches, not rows, like the reference
    sink's batch flush)."""
    if not records:
        raise ValueError("empty record batch")
    body = bytearray()
    for i, rec in enumerate(records):
        key, value = rec[0], rec[1]
        headers = rec[2] if len(rec) > 2 else []
        rb = bytearray()
        rb += b"\x00"  # record attributes
        rb += enc_varint(0)  # timestamp delta
        rb += enc_varint(i)  # offset delta
        rb += enc_varint(-1 if key is None else len(key))
        if key is not None:
            rb += key
        rb += enc_varint(-1 if value is None else len(value))
        if value is not None:
            rb += value
        rb += enc_varint(len(headers))
        for hk, hv in headers:
            hkb = hk.encode()
            rb += enc_varint(len(hkb))
            rb += hkb
            rb += enc_varint(-1 if hv is None else len(hv))
            if hv is not None:
                rb += hv
        body += enc_varint(len(rb))
        body += rb
    n = len(records)
    # attributes .. records: the CRC32C-covered span
    covered = (
        struct.pack(">hiqqqhii", 0, n - 1, base_timestamp_ms, base_timestamp_ms, -1, -1, -1, n)
        + bytes(body)
    )
    # partition_leader_epoch + magic + crc + covered
    after_length = struct.pack(">ibI", -1, 2, crc32c(covered)) + covered
    return struct.pack(">qi", base_offset, len(after_length)) + after_length


def decode_record_batches(buf: bytes, verify_crc: bool = True) -> list[RecordBatch]:
    """Parse a fetch-response record set: zero or more concatenated v2
    batches; a truncated trailing batch (the broker cuts at
    max_bytes) is skipped, per spec."""
    out: list[RecordBatch] = []
    r = ByteReader(buf)
    while r.remaining() >= 12:
        base_offset = r.i64()
        batch_len = r.i32()
        if r.remaining() < batch_len:
            break  # partial trailing batch
        br = ByteReader(r.take(batch_len))
        br.i32()  # partition_leader_epoch
        magic = br.i8()
        if magic != 2:
            raise KafkaProtocolError(f"unsupported batch magic {magic} (need v2)")
        crc = br.u32()
        covered = bytes(br.data[br.pos :])
        if verify_crc and crc32c(covered) != crc:
            raise KafkaProtocolError(f"batch crc mismatch at offset {base_offset}")
        attributes = br.i16()
        if attributes & 0x07:
            raise KafkaProtocolError(
                f"compressed batch (codec {attributes & 7}) — this client produces/consumes uncompressed"
            )
        br.i32()  # last_offset_delta
        base_ts = br.i64()
        br.i64()  # max_timestamp
        br.i64()  # producer_id
        br.i16()  # producer_epoch
        br.i32()  # base_sequence
        n = br.i32()
        recs = []
        for _ in range(n):
            rlen = br.varint()
            rr = ByteReader(br.take(rlen))
            rr.i8()  # record attributes
            ts_delta = rr.varint()
            off_delta = rr.varint()
            klen = rr.varint()
            key = bytes(rr.take(klen)) if klen >= 0 else None
            vlen = rr.varint()
            value = bytes(rr.take(vlen)) if vlen >= 0 else None
            headers = []
            for _ in range(rr.varint()):
                hklen = rr.varint()
                hk = bytes(rr.take(hklen)).decode()
                hvlen = rr.varint()
                hv = bytes(rr.take(hvlen)) if hvlen >= 0 else None
                headers.append((hk, hv))
            recs.append(
                KafkaRecord(
                    offset=base_offset + off_delta,
                    timestamp_ms=base_ts + ts_delta,
                    key=key,
                    value=value,
                    headers=tuple(headers),
                )
            )
        out.append(RecordBatch(base_offset=base_offset, records=tuple(recs)))
    return out


# ---------------------------------------------------------------- requests

def _header(api_key: int, api_version: int, correlation_id: int, client_id: str) -> bytes:
    return struct.pack(">hhi", api_key, api_version, correlation_id) + _enc_str(client_id)


def encode_api_versions_request(correlation_id: int, client_id: str = "rdps") -> bytes:
    return _frame(_header(API_VERSIONS, 0, correlation_id, client_id))


def encode_metadata_request(
    correlation_id: int, topics: list[str] | None, client_id: str = "rdps"
) -> bytes:
    body = bytearray(_header(API_METADATA, 1, correlation_id, client_id))
    if topics is None:
        body += struct.pack(">i", -1)  # null array = all topics
    else:
        body += struct.pack(">i", len(topics))
        for t in topics:
            body += _enc_str(t)
    return _frame(bytes(body))


def encode_list_offsets_request(
    correlation_id: int,
    topic: str,
    partition: int,
    timestamp: int = EARLIEST,
    client_id: str = "rdps",
) -> bytes:
    body = (
        _header(API_LIST_OFFSETS, 1, correlation_id, client_id)
        + struct.pack(">i", -1)  # replica_id
        + struct.pack(">i", 1)
        + _enc_str(topic)
        + struct.pack(">i", 1)
        + struct.pack(">iq", partition, timestamp)
    )
    return _frame(body)


def encode_produce_request(
    correlation_id: int,
    topic: str,
    partition: int,
    record_set: bytes,
    acks: int = -1,
    timeout_ms: int = 30000,
    client_id: str = "rdps",
) -> bytes:
    body = (
        _header(API_PRODUCE, 3, correlation_id, client_id)
        + _enc_str(None)  # transactional_id
        + struct.pack(">hi", acks, timeout_ms)
        + struct.pack(">i", 1)
        + _enc_str(topic)
        + struct.pack(">i", 1)
        + struct.pack(">i", partition)
        + _enc_bytes(record_set)
    )
    return _frame(body)


def encode_fetch_request(
    correlation_id: int,
    topic: str,
    partition: int,
    fetch_offset: int,
    max_wait_ms: int = 500,
    min_bytes: int = 1,
    max_bytes: int = 1 << 20,
    client_id: str = "rdps",
) -> bytes:
    body = (
        _header(API_FETCH, 4, correlation_id, client_id)
        + struct.pack(">iiiib", -1, max_wait_ms, min_bytes, max_bytes, 0)
        + struct.pack(">i", 1)
        + _enc_str(topic)
        + struct.pack(">i", 1)
        + struct.pack(">iqi", partition, fetch_offset, max_bytes)
    )
    return _frame(body)


def _frame(payload: bytes) -> bytes:
    return struct.pack(">i", len(payload)) + payload


# ---------------------------------------------------------------- responses

@dataclass(frozen=True)
class PartitionMetadata:
    partition: int
    leader: int
    error_code: int


@dataclass(frozen=True)
class TopicMetadata:
    name: str
    error_code: int
    partitions: tuple[PartitionMetadata, ...]


@dataclass(frozen=True)
class MetadataResponse:
    brokers: tuple[tuple[int, str, int], ...]  # (node_id, host, port)
    controller_id: int
    topics: tuple[TopicMetadata, ...]


def decode_api_versions_response(body: ByteReader) -> dict[int, tuple[int, int]]:
    err = body.i16()
    _raise_on(err, "ApiVersions")
    return {body.i16(): (body.i16(), body.i16()) for _ in range(body.i32())}


def decode_metadata_response(body: ByteReader) -> MetadataResponse:
    brokers = []
    for _ in range(body.i32()):
        node, host, port = body.i32(), body.string(), body.i32()
        body.string()  # rack
        brokers.append((node, host or "", port))
    controller = body.i32()
    topics = []
    for _ in range(body.i32()):
        terr = body.i16()
        name = body.string() or ""
        body.i8()  # is_internal
        parts = []
        for _ in range(body.i32()):
            perr = body.i16()
            pid = body.i32()
            leader = body.i32()
            for _ in range(body.i32()):
                body.i32()  # replicas
            for _ in range(body.i32()):
                body.i32()  # isr
            parts.append(PartitionMetadata(pid, leader, perr))
        topics.append(TopicMetadata(name, terr, tuple(parts)))
    return MetadataResponse(tuple(brokers), controller, tuple(topics))


def decode_list_offsets_response(body: ByteReader) -> int:
    if body.i32() != 1:
        raise KafkaProtocolError("expected one topic in ListOffsets response")
    body.string()
    if body.i32() != 1:
        raise KafkaProtocolError("expected one partition in ListOffsets response")
    body.i32()  # partition
    _raise_on(body.i16(), "ListOffsets")
    body.i64()  # timestamp
    return body.i64()


def decode_produce_response(body: ByteReader) -> int:
    """Returns the base offset assigned to the produced batch."""
    if body.i32() != 1:
        raise KafkaProtocolError("expected one topic in Produce response")
    body.string()
    if body.i32() != 1:
        raise KafkaProtocolError("expected one partition in Produce response")
    body.i32()  # partition
    _raise_on(body.i16(), "Produce")
    base_offset = body.i64()
    body.i64()  # log_append_time
    return base_offset


@dataclass(frozen=True)
class FetchResult:
    high_watermark: int
    batches: tuple[RecordBatch, ...]

    @property
    def records(self) -> list[KafkaRecord]:
        return [r for b in self.batches for r in b.records]


def decode_fetch_response(body: ByteReader) -> FetchResult:
    body.i32()  # throttle_time
    if body.i32() != 1:
        raise KafkaProtocolError("expected one topic in Fetch response")
    body.string()
    if body.i32() != 1:
        raise KafkaProtocolError("expected one partition in Fetch response")
    body.i32()  # partition
    _raise_on(body.i16(), "Fetch")
    hw = body.i64()
    body.i64()  # last_stable_offset
    for _ in range(body.i32()):  # aborted transactions
        body.i64()
        body.i64()
    record_set = body.nbytes() or b""
    return FetchResult(hw, tuple(decode_record_batches(record_set)))


def _raise_on(error_code: int, context: str) -> None:
    if error_code:
        name = ERROR_NAMES.get(error_code, str(error_code))
        raise KafkaProtocolError(f"{context}: broker error {name} ({error_code})")


# ---------------------------------------------------------------- client

class KafkaClient:
    """Single-connection produce/fetch client over an injected
    transport. One in-flight request at a time (the reference's
    rdkafka source is likewise a serial poll loop per consumer);
    correlation ids are still checked so a desynced stream fails loud
    instead of mis-attributing a response."""

    def __init__(self, transport, client_id: str = "rdps", recv_bytes: int = 65536) -> None:
        self.transport = transport
        self.client_id = client_id
        self._recv_bytes = recv_bytes
        self._corr = 0
        self._buf = bytearray()

    def _next_corr(self) -> int:
        self._corr += 1
        return self._corr

    def _read_response(self, expect_corr: int) -> ByteReader:
        while True:
            if len(self._buf) >= 4:
                (size,) = struct.unpack(">i", self._buf[:4])
                if len(self._buf) >= 4 + size:
                    payload = bytes(self._buf[4 : 4 + size])
                    del self._buf[: 4 + size]
                    r = ByteReader(payload)
                    corr = r.i32()
                    if corr != expect_corr:
                        raise KafkaProtocolError(
                            f"correlation mismatch: sent {expect_corr}, got {corr}"
                        )
                    return r
            chunk = self.transport.recv(self._recv_bytes)
            if not chunk:
                raise KafkaProtocolError("connection closed by peer")
            self._buf.extend(chunk)

    def api_versions(self) -> dict[int, tuple[int, int]]:
        c = self._next_corr()
        self.transport.sendall(encode_api_versions_request(c, self.client_id))
        return decode_api_versions_response(self._read_response(c))

    def metadata(self, topics: list[str] | None = None) -> MetadataResponse:
        c = self._next_corr()
        self.transport.sendall(encode_metadata_request(c, topics, self.client_id))
        return decode_metadata_response(self._read_response(c))

    def list_offsets(self, topic: str, partition: int, timestamp: int = EARLIEST) -> int:
        c = self._next_corr()
        self.transport.sendall(
            encode_list_offsets_request(c, topic, partition, timestamp, self.client_id)
        )
        return decode_list_offsets_response(self._read_response(c))

    def produce(
        self,
        topic: str,
        partition: int,
        records: list,
        acks: int = -1,
        timeout_ms: int = 30000,
        base_timestamp_ms: int = 0,
    ) -> int | None:
        """Returns the assigned base offset (None with acks=0 — the
        broker sends no response at all in that mode, per spec)."""
        batch = encode_record_batch(records, base_timestamp_ms=base_timestamp_ms)
        c = self._next_corr()
        self.transport.sendall(
            encode_produce_request(c, topic, partition, batch, acks, timeout_ms, self.client_id)
        )
        if acks == 0:
            return None
        return decode_produce_response(self._read_response(c))

    def fetch(
        self,
        topic: str,
        partition: int,
        offset: int,
        max_wait_ms: int = 500,
        min_bytes: int = 1,
        max_bytes: int = 1 << 20,
    ) -> FetchResult:
        c = self._next_corr()
        self.transport.sendall(
            encode_fetch_request(c, topic, partition, offset, max_wait_ms, min_bytes, max_bytes, self.client_id)
        )
        return decode_fetch_response(self._read_response(c))


def connect_client(host: str, port: int, client_id: str = "rdps", timeout: float = 10.0) -> KafkaClient:
    """Real-socket entry point — usable the moment a broker is
    reachable; everything above it is transport-agnostic and tested."""
    import socket

    sock = socket.create_connection((host, port), timeout=timeout)
    return KafkaClient(sock, client_id=client_id)


def drain_to_queue_dir(
    client: KafkaClient,
    topic: str,
    partition: int,
    queue_dir: str,
    start_offset: int | None = None,
    max_records: int = 10000,
) -> int:
    """Bridge a partition into the queue-dir stream substrate
    (sources/stream.py): fetch from ``start_offset`` (default:
    earliest) to the high watermark or ``max_records``, write one
    JSONL file with the repo-wide (key,value,topic,ts) message schema
    that kafka_stream/queue_dir Structured Streaming sources tail.
    Returns records written."""
    import time as _time

    from rabbit_data_pipeline_spark.sources.stream import queue_dir_publish

    offset = client.list_offsets(topic, partition, EARLIEST) if start_offset is None else start_offset
    rows: list[dict] = []
    while len(rows) < max_records:
        result = client.fetch(topic, partition, offset)
        if not result.batches:
            break
        for rec in result.records:
            if len(rows) >= max_records:
                break
            rows.append(
                {
                    "key": (rec.key or b"").decode("utf-8", "replace"),
                    "value": (rec.value or b"").decode("utf-8", "replace"),
                    "topic": topic,
                    "ts": _time.strftime(
                        "%Y-%m-%dT%H:%M:%S", _time.gmtime(rec.timestamp_ms / 1000.0)
                    ),
                }
            )
            offset = rec.offset + 1
        if offset >= result.high_watermark:
            break
    if rows:
        queue_dir_publish(queue_dir, rows, topic=topic)
    return len(rows)
