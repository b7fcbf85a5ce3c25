"""AMQP 0-9-1 wire protocol — frame/method codec + consumer/publisher.

Reference parity: src/Sources/Amqp.php consumes a queue and
src/Sinks/Amqp.php publishes, both via php-amqplib. This module speaks
the same protocol natively from the PUBLIC spec (amqp0-9-1.pdf /
RabbitMQ's errata dialect for field tables) over any socket-like
transport:

  frame   = [octet type][short channel][long size][payload][0xCE]
  types   : 1 method, 2 content header, 3 content body, 8 heartbeat
  method  = [short class-id][short method-id][spec-typed args]
  content = header frame (class-id, body size, property flags+props)
            followed by body frames up to the negotiated frame-max

Args are encoded by declarative per-method specs (the spec's own arg
tables), with AMQP's bit-packing rule: consecutive bit args share one
octet. The transport is injected, so the codec and both state machines
— connection handshake (start/tune/open), channel open, queue declare,
qos/consume/deliver/ack, publish with content framing — are fully
unit-tested against scripted byte streams in this broker-less
container and speak to a real RabbitMQ the moment a host:port is
reachable. Spark-side ingestion stays the queue-dir substrate
(sources/stream.py amqp_stream): ``drain_to_queue_dir`` bridges a live
subscription into it as the repo-wide (key,value,topic,ts) message
schema.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Any, Iterator

PROTOCOL_HEADER = b"AMQP\x00\x00\x09\x01"

FRAME_METHOD = 1
FRAME_HEADER = 2
FRAME_BODY = 3
FRAME_HEARTBEAT = 8
FRAME_END = 0xCE


class AmqpProtocolError(RuntimeError):
    pass


# ------------------------------------------------------------ primitives

def _enc_shortstr(s: str) -> bytes:
    b = s.encode("utf-8")
    if len(b) > 255:
        raise ValueError("shortstr > 255 bytes")
    return bytes([len(b)]) + b


def _enc_longstr(b: bytes | str) -> bytes:
    if isinstance(b, str):
        b = b.encode("utf-8")
    return struct.pack(">I", len(b)) + b


def _enc_field_value(v: Any) -> bytes:
    # RabbitMQ dialect type tags (the 0-9-1 errata)
    if isinstance(v, bool):
        return b"t" + bytes([1 if v else 0])
    if isinstance(v, int):
        return b"l" + struct.pack(">q", v)
    if isinstance(v, float):
        return b"d" + struct.pack(">d", v)
    if isinstance(v, str):
        return b"S" + _enc_longstr(v)
    if isinstance(v, bytes):
        return b"S" + _enc_longstr(v)
    if isinstance(v, dict):
        return b"F" + _enc_table(v)
    if isinstance(v, (list, tuple)):
        body = b"".join(_enc_field_value(x) for x in v)
        return b"A" + struct.pack(">I", len(body)) + body
    if v is None:
        return b"V"
    raise ValueError(f"unsupported field-table value type {type(v).__name__}")


def _enc_table(t: dict[str, Any]) -> bytes:
    body = b"".join(_enc_shortstr(k) + _enc_field_value(v) for k, v in t.items())
    return struct.pack(">I", len(body)) + body


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise AmqpProtocolError("truncated payload")
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b

    def octet(self) -> int:
        return self.take(1)[0]

    def short(self) -> int:
        return struct.unpack(">H", self.take(2))[0]

    def long(self) -> int:
        return struct.unpack(">I", self.take(4))[0]

    def longlong(self) -> int:
        return struct.unpack(">Q", self.take(8))[0]

    def shortstr(self) -> str:
        return self.take(self.octet()).decode("utf-8")

    def longstr(self) -> bytes:
        return self.take(self.long())

    def table(self) -> dict[str, Any]:
        size = self.long()
        end = self.pos + size
        out: dict[str, Any] = {}
        while self.pos < end:
            k = self.shortstr()
            out[k] = self._field_value()
        if self.pos != end:
            raise AmqpProtocolError("field table overrun")
        return out

    def _field_value(self) -> Any:
        tag = self.take(1)
        if tag == b"t":
            return bool(self.octet())
        if tag == b"b":
            return struct.unpack(">b", self.take(1))[0]
        if tag == b"I":
            return struct.unpack(">i", self.take(4))[0]
        if tag == b"l":
            return struct.unpack(">q", self.take(8))[0]
        if tag == b"f":
            return struct.unpack(">f", self.take(4))[0]
        if tag == b"d":
            return struct.unpack(">d", self.take(8))[0]
        if tag == b"S":
            return self.longstr().decode("utf-8", "replace")
        if tag == b"x":
            return self.longstr()
        if tag == b"F":
            return self.table()
        if tag == b"A":
            size = self.long()
            end = self.pos + size
            arr = []
            while self.pos < end:
                arr.append(self._field_value())
            return arr
        if tag == b"T":
            return self.longlong()
        if tag == b"V":
            return None
        raise AmqpProtocolError(f"unknown field-table tag {tag!r}")


# ------------------------------------------------------------ method specs

# (class_id, method_id) -> (name, [(arg_name, type)...]); type "bit"s
# consecutive in the list share octets per the spec's packing rule.
METHODS: dict[tuple[int, int], tuple[str, list[tuple[str, str]]]] = {
    (10, 10): ("connection.start", [("version_major", "octet"), ("version_minor", "octet"),
                                    ("server_properties", "table"), ("mechanisms", "longstr"),
                                    ("locales", "longstr")]),
    (10, 11): ("connection.start-ok", [("client_properties", "table"), ("mechanism", "shortstr"),
                                       ("response", "longstr"), ("locale", "shortstr")]),
    (10, 30): ("connection.tune", [("channel_max", "short"), ("frame_max", "long"),
                                   ("heartbeat", "short")]),
    (10, 31): ("connection.tune-ok", [("channel_max", "short"), ("frame_max", "long"),
                                      ("heartbeat", "short")]),
    (10, 40): ("connection.open", [("virtual_host", "shortstr"), ("reserved_1", "shortstr"),
                                   ("reserved_2", "bit")]),
    (10, 41): ("connection.open-ok", [("reserved_1", "shortstr")]),
    (10, 50): ("connection.close", [("reply_code", "short"), ("reply_text", "shortstr"),
                                    ("class_id", "short"), ("method_id", "short")]),
    (10, 51): ("connection.close-ok", []),
    (20, 10): ("channel.open", [("reserved_1", "shortstr")]),
    (20, 11): ("channel.open-ok", [("reserved_1", "longstr")]),
    (20, 40): ("channel.close", [("reply_code", "short"), ("reply_text", "shortstr"),
                                 ("class_id", "short"), ("method_id", "short")]),
    (20, 41): ("channel.close-ok", []),
    (50, 10): ("queue.declare", [("reserved_1", "short"), ("queue", "shortstr"),
                                 ("passive", "bit"), ("durable", "bit"), ("exclusive", "bit"),
                                 ("auto_delete", "bit"), ("no_wait", "bit"),
                                 ("arguments", "table")]),
    (50, 11): ("queue.declare-ok", [("queue", "shortstr"), ("message_count", "long"),
                                    ("consumer_count", "long")]),
    (50, 20): ("queue.bind", [("reserved_1", "short"), ("queue", "shortstr"),
                              ("exchange", "shortstr"), ("routing_key", "shortstr"),
                              ("no_wait", "bit"), ("arguments", "table")]),
    (50, 21): ("queue.bind-ok", []),
    (60, 10): ("basic.qos", [("prefetch_size", "long"), ("prefetch_count", "short"),
                             ("global_", "bit")]),
    (60, 11): ("basic.qos-ok", []),
    (60, 20): ("basic.consume", [("reserved_1", "short"), ("queue", "shortstr"),
                                 ("consumer_tag", "shortstr"), ("no_local", "bit"),
                                 ("no_ack", "bit"), ("exclusive", "bit"), ("no_wait", "bit"),
                                 ("arguments", "table")]),
    (60, 21): ("basic.consume-ok", [("consumer_tag", "shortstr")]),
    (60, 40): ("basic.publish", [("reserved_1", "short"), ("exchange", "shortstr"),
                                 ("routing_key", "shortstr"), ("mandatory", "bit"),
                                 ("immediate", "bit")]),
    (60, 60): ("basic.deliver", [("consumer_tag", "shortstr"), ("delivery_tag", "longlong"),
                                 ("redelivered", "bit"), ("exchange", "shortstr"),
                                 ("routing_key", "shortstr")]),
    (60, 80): ("basic.ack", [("delivery_tag", "longlong"), ("multiple", "bit")]),
}
_BY_NAME = {name: (cm, spec) for cm, (name, spec) in METHODS.items()}

_ENCODERS = {
    "octet": lambda v: bytes([int(v or 0)]),
    "short": lambda v: struct.pack(">H", int(v or 0)),
    "long": lambda v: struct.pack(">I", int(v or 0)),
    "longlong": lambda v: struct.pack(">Q", int(v or 0)),
    "shortstr": lambda v: _enc_shortstr(v or ""),
    "longstr": lambda v: _enc_longstr(v if v is not None else b""),
    "table": lambda v: _enc_table(v or {}),
}


def encode_method(name: str, args: dict[str, Any] | None = None, channel: int = 0) -> bytes:
    """One complete method frame for ``name`` (e.g. 'basic.consume')."""
    (class_id, method_id), spec = _BY_NAME[name]
    args = args or {}
    payload = bytearray(struct.pack(">HH", class_id, method_id))
    bit_acc, bit_n = 0, 0
    for arg_name, typ in spec:
        if typ == "bit":
            if args.get(arg_name):
                bit_acc |= 1 << bit_n
            bit_n += 1
            if bit_n == 8:
                payload.append(bit_acc)
                bit_acc, bit_n = 0, 0
            continue
        if bit_n:
            payload.append(bit_acc)
            bit_acc, bit_n = 0, 0
        payload.extend(_ENCODERS[typ](args.get(arg_name)))
    if bit_n:
        payload.append(bit_acc)
    return encode_frame(FRAME_METHOD, channel, bytes(payload))


@dataclass(frozen=True)
class Method:
    name: str
    channel: int
    args: dict[str, Any] = field(default_factory=dict)


def decode_method(channel: int, payload: bytes) -> Method:
    r = _Reader(payload)
    class_id, method_id = r.short(), r.short()
    entry = METHODS.get((class_id, method_id))
    if entry is None:
        raise AmqpProtocolError(f"unknown method {class_id}.{method_id}")
    name, spec = entry
    args: dict[str, Any] = {}
    bit_acc, bit_n = 0, 0
    for arg_name, typ in spec:
        if typ == "bit":
            if bit_n == 0:
                bit_acc = r.octet()
            args[arg_name] = bool(bit_acc & (1 << bit_n))
            bit_n = (bit_n + 1) % 8
            continue
        bit_n = 0
        if typ == "octet":
            args[arg_name] = r.octet()
        elif typ == "short":
            args[arg_name] = r.short()
        elif typ == "long":
            args[arg_name] = r.long()
        elif typ == "longlong":
            args[arg_name] = r.longlong()
        elif typ == "shortstr":
            args[arg_name] = r.shortstr()
        elif typ == "longstr":
            args[arg_name] = r.longstr()
        elif typ == "table":
            args[arg_name] = r.table()
    return Method(name, channel, args)


# ------------------------------------------------------------ frames

def encode_frame(frame_type: int, channel: int, payload: bytes) -> bytes:
    return struct.pack(">BHI", frame_type, channel, len(payload)) + payload + bytes([FRAME_END])


def encode_heartbeat() -> bytes:
    return encode_frame(FRAME_HEARTBEAT, 0, b"")


# Basic-class content-header property flags, in spec bit order.
_BASIC_PROPS: list[tuple[str, int, str]] = [
    ("content_type", 15, "shortstr"), ("content_encoding", 14, "shortstr"),
    ("headers", 13, "table"), ("delivery_mode", 12, "octet"),
    ("priority", 11, "octet"), ("correlation_id", 10, "shortstr"),
    ("reply_to", 9, "shortstr"), ("expiration", 8, "shortstr"),
    ("message_id", 7, "shortstr"), ("timestamp", 6, "longlong"),
    ("type", 5, "shortstr"), ("user_id", 4, "shortstr"),
    ("app_id", 3, "shortstr"), ("cluster_id", 2, "shortstr"),
]


def encode_content_header(
    body_size: int, properties: dict[str, Any] | None = None, channel: int = 1
) -> bytes:
    props = properties or {}
    flags = 0
    body = bytearray()
    for name, bit, typ in _BASIC_PROPS:
        if name in props and props[name] is not None:
            flags |= 1 << bit
            body.extend(_ENCODERS[typ](props[name]))
    payload = struct.pack(">HHQH", 60, 0, body_size, flags) + bytes(body)
    return encode_frame(FRAME_HEADER, channel, payload)


def decode_content_header(payload: bytes) -> tuple[int, dict[str, Any]]:
    r = _Reader(payload)
    class_id, _weight = r.short(), r.short()
    if class_id != 60:
        raise AmqpProtocolError(f"content header for class {class_id}, expected basic(60)")
    body_size = r.longlong()
    flags = r.short()
    props: dict[str, Any] = {}
    for name, bit, typ in _BASIC_PROPS:
        if flags & (1 << bit):
            if typ == "shortstr":
                props[name] = r.shortstr()
            elif typ == "octet":
                props[name] = r.octet()
            elif typ == "table":
                props[name] = r.table()
            elif typ == "longlong":
                props[name] = r.longlong()
    return body_size, props


@dataclass(frozen=True)
class RawFrame:
    frame_type: int
    channel: int
    payload: bytes


class FrameDecoder:
    """Incremental frame decoder: feed arbitrary TCP chunks, iterate
    complete frames; validates the 0xCE frame-end octet."""

    def __init__(self) -> None:
        self._buf = bytearray()

    def feed(self, chunk: bytes) -> list[RawFrame]:
        self._buf.extend(chunk)
        out: list[RawFrame] = []
        while True:
            if len(self._buf) < 7:
                return out
            ftype, channel, size = struct.unpack(">BHI", self._buf[:7])
            if len(self._buf) < 8 + size:
                return out
            if self._buf[7 + size] != FRAME_END:
                raise AmqpProtocolError("missing frame-end octet")
            payload = bytes(self._buf[7 : 7 + size])
            del self._buf[: 8 + size]
            out.append(RawFrame(ftype, channel, payload))


# ------------------------------------------------------------ messages

@dataclass(frozen=True)
class AmqpMessage:
    delivery_tag: int
    exchange: str
    routing_key: str
    body: bytes
    properties: dict[str, Any]
    redelivered: bool = False


class AmqpClient:
    """Connection + channel-1 state machine over an injected transport.

    Consumer path mirrors src/Sources/Amqp.php (declare queue, qos
    prefetch, basic.consume, ack after handling); publisher path
    mirrors src/Sinks/Amqp.php (basic.publish + content header/body
    frames split at the negotiated frame-max)."""

    def __init__(
        self,
        transport,
        virtual_host: str = "/",
        username: str = "guest",
        password: str = "guest",
        recv_bytes: int = 65536,
    ) -> None:
        self.transport = transport
        self.virtual_host = virtual_host
        self.username = username
        self.password = password
        self.frame_max = 131072
        self._decoder = FrameDecoder()
        self._pending: list[RawFrame] = []
        self._recv_bytes = recv_bytes

    # -- plumbing

    def _send(self, b: bytes) -> None:
        self.transport.sendall(b)

    def _next_frame(self) -> RawFrame:
        while not self._pending:
            chunk = self.transport.recv(self._recv_bytes)
            if not chunk:
                raise AmqpProtocolError("connection closed by peer")
            self._pending.extend(self._decoder.feed(chunk))
        return self._pending.pop(0)

    def _next_method(self) -> Method:
        while True:
            f = self._next_frame()
            if f.frame_type == FRAME_HEARTBEAT:
                self._send(encode_heartbeat())
                continue
            if f.frame_type != FRAME_METHOD:
                raise AmqpProtocolError(f"expected method frame, got type {f.frame_type}")
            return decode_method(f.channel, f.payload)

    def _expect(self, name: str) -> Method:
        m = self._next_method()
        if m.name in ("connection.close", "channel.close"):
            raise AmqpProtocolError(
                f"{m.name}: {m.args.get('reply_code')} {m.args.get('reply_text')}"
            )
        if m.name != name:
            raise AmqpProtocolError(f"expected {name}, got {m.name}")
        return m

    # -- lifecycle

    def handshake(self) -> None:
        """Protocol header → start/start-ok (PLAIN) → tune/tune-ok →
        open/open-ok → channel.open."""
        self._send(PROTOCOL_HEADER)
        start = self._expect("connection.start")
        mechanisms = start.args["mechanisms"].split()
        if b"PLAIN" not in mechanisms:
            raise AmqpProtocolError(f"server offers no PLAIN auth: {mechanisms}")
        self._send(
            encode_method(
                "connection.start-ok",
                {
                    "client_properties": {"product": "rdps", "version": "1.0"},
                    "mechanism": "PLAIN",
                    "response": b"\x00" + self.username.encode() + b"\x00" + self.password.encode(),
                    "locale": "en_US",
                },
            )
        )
        tune = self._expect("connection.tune")
        if tune.args["frame_max"]:
            self.frame_max = min(self.frame_max, tune.args["frame_max"])
        self._send(
            encode_method(
                "connection.tune-ok",
                {
                    "channel_max": tune.args["channel_max"],
                    "frame_max": self.frame_max,
                    "heartbeat": tune.args["heartbeat"],
                },
            )
        )
        self._send(encode_method("connection.open", {"virtual_host": self.virtual_host}))
        self._expect("connection.open-ok")
        self._send(encode_method("channel.open", channel=1))
        self._expect("channel.open-ok")

    def declare_queue(self, queue: str, durable: bool = True) -> dict[str, Any]:
        self._send(
            encode_method("queue.declare", {"queue": queue, "durable": durable}, channel=1)
        )
        return self._expect("queue.declare-ok").args

    def consume(self, queue: str, prefetch: int = 64, consumer_tag: str = "rdps") -> None:
        self._send(encode_method("basic.qos", {"prefetch_count": prefetch}, channel=1))
        self._expect("basic.qos-ok")
        self._send(
            encode_method(
                "basic.consume", {"queue": queue, "consumer_tag": consumer_tag}, channel=1
            )
        )
        self._expect("basic.consume-ok")

    def messages(self, max_messages: int | None = None) -> Iterator[AmqpMessage]:
        """Reassemble deliver → header → body-frames into messages;
        ack each after it is yielded (at-least-once, like the
        reference's explicit ack on success)."""
        n = 0
        while max_messages is None or n < max_messages:
            m = self._next_method()
            if m.name in ("connection.close", "channel.close"):
                raise AmqpProtocolError(f"{m.name}: {m.args.get('reply_text')}")
            if m.name != "basic.deliver":
                continue
            hdr = self._next_frame()
            if hdr.frame_type != FRAME_HEADER:
                raise AmqpProtocolError("basic.deliver not followed by content header")
            body_size, props = decode_content_header(hdr.payload)
            body = bytearray()
            while len(body) < body_size:
                bf = self._next_frame()
                if bf.frame_type == FRAME_HEARTBEAT:
                    self._send(encode_heartbeat())
                    continue
                if bf.frame_type != FRAME_BODY:
                    raise AmqpProtocolError("expected content body frame")
                body.extend(bf.payload)
            msg = AmqpMessage(
                delivery_tag=m.args["delivery_tag"],
                exchange=m.args["exchange"],
                routing_key=m.args["routing_key"],
                body=bytes(body),
                properties=props,
                redelivered=m.args["redelivered"],
            )
            yield msg
            self._send(encode_method("basic.ack", {"delivery_tag": msg.delivery_tag}, channel=1))
            n += 1

    def publish(
        self,
        exchange: str,
        routing_key: str,
        body: bytes,
        properties: dict[str, Any] | None = None,
    ) -> None:
        self._send(
            encode_method(
                "basic.publish", {"exchange": exchange, "routing_key": routing_key}, channel=1
            )
        )
        self._send(encode_content_header(len(body), properties, channel=1))
        # body split at frame-max minus the 8 octets of frame overhead
        chunk = self.frame_max - 8
        for off in range(0, len(body), chunk):
            self._send(encode_frame(FRAME_BODY, 1, body[off : off + chunk]))
        if not body:
            pass  # zero-length body: header frame alone carries size 0


def connect_client(
    host: str, port: int = 5672, timeout: float = 5.0, **kwargs: Any
) -> AmqpClient:
    """Real-socket entry point — usable against a live RabbitMQ;
    everything above is transport-agnostic and tested."""
    import socket

    sock = socket.create_connection((host, port), timeout=timeout)
    c = AmqpClient(sock, **kwargs)
    c.handshake()
    return c


def drain_to_queue_dir(
    client: AmqpClient, queue_dir: str, max_messages: int, topic: str = "amqp"
) -> int:
    """Bridge a live subscription into the queue-dir stream substrate
    (sources/stream.py amqp_stream) as (key,value,topic,ts) rows."""
    import time as _time

    from rabbit_data_pipeline_spark.sources.stream import queue_dir_publish

    rows = []
    for m in client.messages(max_messages=max_messages):
        ts = m.properties.get("timestamp")
        rows.append(
            {
                "key": m.properties.get("message_id", str(m.delivery_tag)),
                "value": m.body.decode("utf-8", "replace"),
                "topic": m.routing_key or topic,
                "ts": _time.strftime(
                    "%Y-%m-%dT%H:%M:%S", _time.gmtime(ts if ts else _time.time())
                ),
            }
        )
    if rows:
        queue_dir_publish(queue_dir, rows, topic=topic)
    return len(rows)
