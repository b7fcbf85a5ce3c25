"""NSQ TCP wire protocol (V2) — encoder/decoder + consumer loop.

Reference parity: src/Sources/Nsq.php subscribes via the rabbit/nsq
client (SUB topic:channel, rdy, timeout knobs) and FINs each handled
message; src/Sinks/Nsq.php publishes. This module implements the same
protocol natively from the PUBLIC spec
(https://nsq.io/clients/tcp_protocol_spec.html) over any socket-like
transport:

  frame   = [4-byte BE size][4-byte BE frame type][data]
            (size counts the type word + data)
  types   : 0 response ("OK", "_heartbeat_", IDENTIFY json),
            1 error, 2 message
  message = [8-byte BE int64 ns timestamp][2-byte BE uint16 attempts]
            [16-byte ascii id][body]

The transport is injected (anything with ``sendall``/``recv``), so the
codec and the consumer state machine — handshake, RDY flow control,
heartbeat NOPs, FIN/REQ acks — are fully unit-tested against scripted
byte streams in this broker-less container, and the same class speaks
to a real nsqd the moment a host:port is reachable. Spark-side
ingestion stays the queue-dir substrate (sources/stream.py nsq_stream):
``drain_to_queue_dir`` bridges a live subscription into that substrate
as (key,value,topic,ts) JSONL files, which Structured Streaming tails
exactly like every other stream source in this repo — the protocol
client feeds the corpus, the engine's plan shape is unchanged.
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass
from typing import Any, Callable, Iterator

MAGIC_V2 = b"  V2"

FRAME_RESPONSE = 0
FRAME_ERROR = 1
FRAME_MESSAGE = 2

_HEARTBEAT = b"_heartbeat_"


# ---------------------------------------------------------------- encode

def encode_identify(opts: dict[str, Any]) -> bytes:
    body = json.dumps(opts, separators=(",", ":")).encode()
    return b"IDENTIFY\n" + struct.pack(">I", len(body)) + body


def encode_sub(topic: str, channel: str) -> bytes:
    _check_name(topic)
    _check_name(channel)
    return f"SUB {topic} {channel}\n".encode()


def encode_rdy(count: int) -> bytes:
    return f"RDY {int(count)}\n".encode()


def encode_fin(message_id: bytes | str) -> bytes:
    return b"FIN " + _id_bytes(message_id) + b"\n"


def encode_req(message_id: bytes | str, timeout_ms: int = 0) -> bytes:
    return b"REQ " + _id_bytes(message_id) + f" {int(timeout_ms)}\n".encode()


def encode_touch(message_id: bytes | str) -> bytes:
    return b"TOUCH " + _id_bytes(message_id) + b"\n"


def encode_nop() -> bytes:
    return b"NOP\n"


def encode_cls() -> bytes:
    return b"CLS\n"


def encode_pub(topic: str, body: bytes) -> bytes:
    _check_name(topic)
    return f"PUB {topic}\n".encode() + struct.pack(">I", len(body)) + body


def encode_dpub(topic: str, defer_ms: int, body: bytes) -> bytes:
    _check_name(topic)
    return f"DPUB {topic} {int(defer_ms)}\n".encode() + struct.pack(">I", len(body)) + body


def encode_mpub(topic: str, bodies: list[bytes]) -> bytes:
    _check_name(topic)
    payload = struct.pack(">I", len(bodies)) + b"".join(
        struct.pack(">I", len(b)) + b for b in bodies
    )
    return f"MPUB {topic}\n".encode() + struct.pack(">I", len(payload)) + payload


def _check_name(name: str) -> None:
    # spec: [.a-zA-Z0-9_-] (1..64), optional #ephemeral suffix
    base = name[:-10] if name.endswith("#ephemeral") else name
    if not (1 <= len(base) <= 64) or not all(
        c.isalnum() or c in "._-" for c in base
    ):
        raise ValueError(f"invalid NSQ name: {name!r}")


def _id_bytes(message_id: bytes | str) -> bytes:
    b = message_id.encode() if isinstance(message_id, str) else bytes(message_id)
    if len(b) != 16:
        raise ValueError(f"NSQ message id must be 16 bytes, got {len(b)}")
    return b


# ---------------------------------------------------------------- decode

@dataclass(frozen=True)
class NsqMessage:
    timestamp_ns: int
    attempts: int
    message_id: str
    body: bytes


@dataclass(frozen=True)
class Frame:
    frame_type: int
    data: bytes

    @property
    def is_heartbeat(self) -> bool:
        return self.frame_type == FRAME_RESPONSE and self.data == _HEARTBEAT

    def message(self) -> NsqMessage:
        if self.frame_type != FRAME_MESSAGE:
            raise ValueError(f"frame type {self.frame_type} is not a message")
        if len(self.data) < 26:
            raise ValueError(f"message frame too short: {len(self.data)} bytes")
        ts, attempts = struct.unpack(">qH", self.data[:10])
        return NsqMessage(
            timestamp_ns=ts,
            attempts=attempts,
            message_id=self.data[10:26].decode("ascii"),
            body=self.data[26:],
        )


class FrameDecoder:
    """Incremental decoder: feed() arbitrary byte chunks (TCP does not
    respect frame boundaries), iterate complete frames."""

    def __init__(self) -> None:
        self._buf = bytearray()

    def feed(self, chunk: bytes) -> list[Frame]:
        self._buf.extend(chunk)
        out: list[Frame] = []
        while True:
            if len(self._buf) < 8:
                return out
            (size,) = struct.unpack(">I", self._buf[:4])
            if size < 4:
                raise ValueError(f"invalid NSQ frame size {size}")
            if len(self._buf) < 4 + size:
                return out
            (ftype,) = struct.unpack(">I", self._buf[4:8])
            data = bytes(self._buf[8 : 4 + size])
            del self._buf[: 4 + size]
            out.append(Frame(ftype, data))


def encode_frame(frame_type: int, data: bytes) -> bytes:
    """Server-side frame encoding — used by tests to script an nsqd
    and by the loopback fake in the pipeline plumbing tests."""
    return struct.pack(">II", 4 + len(data), frame_type) + data


def encode_message_frame(
    timestamp_ns: int, attempts: int, message_id: str, body: bytes
) -> bytes:
    data = struct.pack(">qH", timestamp_ns, attempts) + _id_bytes(message_id) + body
    return encode_frame(FRAME_MESSAGE, data)


# ---------------------------------------------------------------- consumer

class NsqProtocolError(RuntimeError):
    pass


class NsqConsumer:
    """SUB-side state machine over an injected transport.

    Matches the reference consumer's knobs (src/Sources/Nsq.php run():
    ``rdy`` credit and per-message handling with auto-FIN): handshake =
    magic + IDENTIFY + SUB + RDY(rdy); then each message frame is
    yielded, FIN'd (or REQ'd when the handler raises), and the RDY
    credit replenished one-for-one; ``_heartbeat_`` frames are answered
    with NOP (nsqd disconnects a client that misses two heartbeats).
    """

    def __init__(
        self,
        transport,
        topic: str,
        channel: str,
        rdy: int = 1,
        identify: dict[str, Any] | None = None,
        recv_bytes: int = 65536,
    ) -> None:
        self.transport = transport
        self.topic = topic
        self.channel = channel
        self.rdy = max(1, int(rdy))
        self.identify = {"client_id": "rdps", "user_agent": "rdps/1.0", **(identify or {})}
        self._decoder = FrameDecoder()
        self._recv_bytes = recv_bytes
        self._pending: list[Frame] = []

    # -- plumbing

    def _send(self, payload: bytes) -> None:
        self.transport.sendall(payload)

    def _next_frame(self) -> Frame:
        while not self._pending:
            chunk = self.transport.recv(self._recv_bytes)
            if not chunk:
                raise NsqProtocolError("connection closed by peer")
            self._pending.extend(self._decoder.feed(chunk))
        return self._pending.pop(0)

    def _expect_ok(self, context: str) -> None:
        while True:
            f = self._next_frame()
            if f.is_heartbeat:
                self._send(encode_nop())
                continue
            if f.frame_type == FRAME_ERROR:
                raise NsqProtocolError(f"{context}: {f.data.decode(errors='replace')}")
            if f.frame_type == FRAME_RESPONSE:
                return  # "OK" or the IDENTIFY negotiation json
            raise NsqProtocolError(f"{context}: unexpected frame type {f.frame_type}")

    # -- lifecycle

    def handshake(self) -> None:
        self._send(MAGIC_V2)
        self._send(encode_identify(self.identify))
        self._expect_ok("IDENTIFY")
        self._send(encode_sub(self.topic, self.channel))
        self._expect_ok("SUB")
        self._send(encode_rdy(self.rdy))

    def messages(
        self,
        max_messages: int | None = None,
        handler: Callable[[NsqMessage], None] | None = None,
        requeue_delay_ms: int = 1000,
    ) -> Iterator[NsqMessage]:
        """Yield messages, acking each: FIN on success, REQ when the
        handler raises (the reference's error path re-queues). RDY
        credit is replenished per ack so the in-flight window stays at
        ``rdy``."""
        n = 0
        while max_messages is None or n < max_messages:
            f = self._next_frame()
            if f.is_heartbeat:
                self._send(encode_nop())
                continue
            if f.frame_type == FRAME_ERROR:
                raise NsqProtocolError(f.data.decode(errors="replace"))
            if f.frame_type == FRAME_RESPONSE:
                continue  # late OK (e.g. for a CLS in flight)
            msg = f.message()
            try:
                if handler is not None:
                    handler(msg)
            except Exception:
                self._send(encode_req(msg.message_id, requeue_delay_ms))
            else:
                self._send(encode_fin(msg.message_id))
                yield msg
                n += 1
            self._send(encode_rdy(self.rdy))
        self._send(encode_cls())


def connect_consumer(
    host: str, port: int, topic: str, channel: str, rdy: int = 1, timeout: float = 5.0
) -> NsqConsumer:
    """Real-socket entry point — usable the moment an nsqd is
    reachable; everything above it is transport-agnostic and tested."""
    import socket

    sock = socket.create_connection((host, port), timeout=timeout)
    c = NsqConsumer(sock, topic, channel, rdy=rdy)
    c.handshake()
    return c


def drain_to_queue_dir(
    consumer: NsqConsumer, queue_dir: str, max_messages: int, topic: str | None = None
) -> int:
    """Bridge a live subscription into the queue-dir stream substrate
    (sources/stream.py): one JSONL file per drain with the repo-wide
    (key,value,topic,ts) message schema, which nsq_stream/queue_dir
    Structured Streaming sources then tail. Returns messages written."""
    import time as _time

    from rabbit_data_pipeline_spark.sources.stream import queue_dir_publish

    rows = []
    for m in consumer.messages(max_messages=max_messages):
        rows.append(
            {
                "key": m.message_id,
                "value": m.body.decode("utf-8", "replace"),
                "topic": topic or consumer.topic,
                "ts": _time.strftime(
                    "%Y-%m-%dT%H:%M:%S", _time.gmtime(m.timestamp_ns / 1e9)
                ),
            }
        )
    if rows:
        queue_dir_publish(queue_dir, rows, topic=topic or consumer.topic)
    return len(rows)
