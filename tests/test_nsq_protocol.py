"""NSQ V2 wire protocol (sources/nsq_protocol.py) against the public
spec's byte layout — command encodings, incremental frame decoding
across arbitrary TCP chunk boundaries, and the consumer state machine
(handshake / RDY credit / heartbeat NOP / FIN / REQ-on-error) driven
by a scripted in-memory nsqd."""

from __future__ import annotations

import json
import struct

import pytest

from rabbit_data_pipeline_spark.sources.nsq_protocol import (
    FRAME_ERROR,
    FRAME_MESSAGE,
    FRAME_RESPONSE,
    MAGIC_V2,
    FrameDecoder,
    NsqConsumer,
    NsqProtocolError,
    encode_fin,
    encode_frame,
    encode_identify,
    encode_message_frame,
    encode_mpub,
    encode_nop,
    encode_pub,
    encode_rdy,
    encode_req,
    encode_sub,
)

MSG_ID = "0123456789abcdef"


# ---------------------------------------------------------------- encode

def test_command_encodings_exact_bytes():
    assert encode_sub("events", "etl") == b"SUB events etl\n"
    assert encode_rdy(5) == b"RDY 5\n"
    assert encode_fin(MSG_ID) == b"FIN 0123456789abcdef\n"
    assert encode_req(MSG_ID, 1500) == b"REQ 0123456789abcdef 1500\n"
    assert encode_nop() == b"NOP\n"
    body = b'{"x":1}'
    assert encode_pub("t1", body) == b"PUB t1\n" + struct.pack(">I", len(body)) + body


def test_identify_encoding():
    raw = encode_identify({"client_id": "c1"})
    assert raw.startswith(b"IDENTIFY\n")
    (size,) = struct.unpack(">I", raw[9:13])
    assert json.loads(raw[13:]) == {"client_id": "c1"} and size == len(raw) - 13


def test_mpub_encoding_nested_sizes():
    raw = encode_mpub("t", [b"aa", b"bbb"])
    assert raw.startswith(b"MPUB t\n")
    (total,) = struct.unpack(">I", raw[7:11])
    payload = raw[11:]
    assert total == len(payload)
    (count,) = struct.unpack(">I", payload[:4])
    assert count == 2
    (s1,) = struct.unpack(">I", payload[4:8])
    assert payload[8 : 8 + s1] == b"aa"


def test_invalid_names_and_ids_rejected():
    with pytest.raises(ValueError):
        encode_sub("bad topic", "ch")  # space not in [.a-zA-Z0-9_-]
    with pytest.raises(ValueError):
        encode_sub("x" * 65, "ch")
    encode_sub("ok#ephemeral", "ch")  # ephemeral suffix allowed
    with pytest.raises(ValueError):
        encode_fin("short-id")


# ---------------------------------------------------------------- decode

def test_frame_decoder_split_across_chunks():
    """TCP does not respect frame boundaries: one frame fed a byte at
    a time, then two frames in one chunk."""
    m = encode_message_frame(1_700_000_000_000_000_000, 2, MSG_ID, b"payload")
    dec = FrameDecoder()
    got = []
    for i in range(len(m)):
        got.extend(dec.feed(m[i : i + 1]))
    assert len(got) == 1
    msg = got[0].message()
    assert (msg.timestamp_ns, msg.attempts, msg.message_id, msg.body) == (
        1_700_000_000_000_000_000,
        2,
        MSG_ID,
        b"payload",
    )
    two = encode_frame(FRAME_RESPONSE, b"OK") + encode_frame(FRAME_ERROR, b"E_BAD_TOPIC")
    frames = dec.feed(two)
    assert [f.frame_type for f in frames] == [FRAME_RESPONSE, FRAME_ERROR]


def test_heartbeat_detection_and_malformed_frames():
    dec = FrameDecoder()
    (hb,) = dec.feed(encode_frame(FRAME_RESPONSE, b"_heartbeat_"))
    assert hb.is_heartbeat
    with pytest.raises(ValueError):
        FrameDecoder().feed(struct.pack(">II", 2, 0))  # size < 4 is invalid
    short = FrameDecoder().feed(encode_frame(FRAME_MESSAGE, b"x" * 10))[0]
    with pytest.raises(ValueError):
        short.message()


# ---------------------------------------------------------------- consumer

class ScriptedNsqd:
    """Transport double: replies are scripted; every byte the client
    sends is recorded for assertion."""

    def __init__(self, replies: list[bytes]):
        self.sent = bytearray()
        self._replies = list(replies)

    def sendall(self, b: bytes) -> None:
        self.sent.extend(b)

    def recv(self, n: int) -> bytes:
        return self._replies.pop(0) if self._replies else b""


def _handshake_replies() -> list[bytes]:
    return [encode_frame(FRAME_RESPONSE, b"OK"), encode_frame(FRAME_RESPONSE, b"OK")]


def test_consumer_handshake_sends_magic_identify_sub_rdy():
    server = ScriptedNsqd(_handshake_replies())
    c = NsqConsumer(server, "events", "etl", rdy=3)
    c.handshake()
    sent = bytes(server.sent)
    assert sent.startswith(MAGIC_V2)
    assert b"IDENTIFY\n" in sent
    assert sent.index(b"IDENTIFY\n") < sent.index(b"SUB events etl\n") < sent.index(b"RDY 3\n")


def test_consumer_fins_messages_and_nops_heartbeats():
    m1 = encode_message_frame(1_000, 1, MSG_ID, b"a")
    m2 = encode_message_frame(2_000, 1, "fedcba9876543210", b"b")
    # heartbeat arrives mid-stream; m2 is split across two recv() chunks
    server = ScriptedNsqd(
        _handshake_replies()
        + [m1, encode_frame(FRAME_RESPONSE, b"_heartbeat_"), m2[:11], m2[11:]]
    )
    c = NsqConsumer(server, "t", "ch", rdy=2)
    c.handshake()
    got = list(c.messages(max_messages=2))
    assert [m.body for m in got] == [b"a", b"b"]
    sent = bytes(server.sent)
    assert encode_fin(MSG_ID) in sent and encode_fin("fedcba9876543210") in sent
    assert encode_nop() in sent  # heartbeat answered
    assert sent.endswith(b"CLS\n")
    assert sent.count(b"RDY 2\n") == 3  # handshake + one replenish per ack


def test_consumer_requeues_on_handler_error():
    bad = encode_message_frame(1, 1, MSG_ID, b"poison")
    good = encode_message_frame(2, 1, "fedcba9876543210", b"fine")
    server = ScriptedNsqd(_handshake_replies() + [bad + good])
    c = NsqConsumer(server, "t", "ch")
    c.handshake()

    def handler(m):
        if m.body == b"poison":
            raise RuntimeError("boom")

    got = list(c.messages(max_messages=1, handler=handler, requeue_delay_ms=500))
    assert [m.body for m in got] == [b"fine"]
    sent = bytes(server.sent)
    assert encode_req(MSG_ID, 500) in sent  # poison REQ'd, not FIN'd
    assert encode_fin(MSG_ID) not in sent


def test_consumer_error_frame_raises():
    server = ScriptedNsqd([encode_frame(FRAME_ERROR, b"E_INVALID")])
    c = NsqConsumer(server, "t", "ch")
    with pytest.raises(NsqProtocolError, match="E_INVALID"):
        c.handshake()


def test_consumer_real_socketpair_roundtrip():
    """Same state machine over a genuine OS socket (socketpair): the
    scripted-transport tests aren't hiding a sockets-only bug."""
    import socket
    import threading

    cli, srv = socket.socketpair()
    msg = encode_message_frame(5_000, 1, MSG_ID, b"over-tcp")

    def nsqd():
        srv.recv(65536)  # magic+identify (may arrive with sub/rdy)
        srv.sendall(encode_frame(FRAME_RESPONSE, b"OK"))
        srv.sendall(encode_frame(FRAME_RESPONSE, b"OK"))
        srv.sendall(msg)
        while True:
            try:
                if not srv.recv(65536):
                    break
            except OSError:
                break
        srv.close()

    t = threading.Thread(target=nsqd, daemon=True)
    t.start()
    c = NsqConsumer(cli, "t", "ch")
    c.handshake()
    got = list(c.messages(max_messages=1))
    assert got[0].body == b"over-tcp"
    cli.close()
    t.join(timeout=5)


def test_drain_to_queue_dir_bridges_to_stream_schema(tmp_path):
    """Protocol → queue-dir substrate: drained messages land as the
    repo-wide (key,value,topic,ts) JSONL that nsq_stream tails."""
    m1 = encode_message_frame(1_700_000_000_000_000_000, 1, MSG_ID, b"hello")
    server = ScriptedNsqd(_handshake_replies() + [m1])
    c = NsqConsumer(server, "events", "etl")
    c.handshake()
    from rabbit_data_pipeline_spark.sources.nsq_protocol import drain_to_queue_dir

    n = drain_to_queue_dir(c, str(tmp_path), max_messages=1)
    assert n == 1
    files = list(tmp_path.glob("*.json"))
    assert len(files) == 1
    rec = json.loads(files[0].read_text().strip())
    assert rec["key"] == MSG_ID
    assert rec["value"] == "hello"
    assert rec["topic"] == "events"
    assert rec["ts"] == "2023-11-14T22:13:20"
