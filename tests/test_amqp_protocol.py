"""AMQP 0-9-1 wire protocol (sources/amqp_protocol.py) against the
public spec's byte layout — field-table and method codecs, bit
packing, content framing, and the client state machine (handshake /
declare / qos / consume / deliver-reassembly / ack / publish) driven
by a scripted in-memory broker."""

from __future__ import annotations

import json
import struct

import pytest

from rabbit_data_pipeline_spark.sources.amqp_protocol import (
    FRAME_BODY,
    FRAME_HEADER,
    FRAME_METHOD,
    PROTOCOL_HEADER,
    AmqpClient,
    AmqpProtocolError,
    FrameDecoder,
    _enc_table,
    _Reader,
    decode_content_header,
    decode_method,
    encode_content_header,
    encode_frame,
    encode_heartbeat,
    encode_method,
)


# ---------------------------------------------------------------- codec

def test_field_table_roundtrip():
    t = {
        "bool": True,
        "int": 42,
        "neg": -7,
        "float": 1.5,
        "str": "héllo",
        "nested": {"a": 1},
        "arr": [1, "two", False],
        "void": None,
    }
    raw = _enc_table(t)
    assert _Reader(raw).table() == t


def test_method_encode_exact_bytes_basic_ack():
    raw = encode_method("basic.ack", {"delivery_tag": 3}, channel=1)
    # frame: type=1, channel=1, size=13 (2+2 class/method + 8 tag + 1 bit octet)
    assert raw[:7] == struct.pack(">BHI", FRAME_METHOD, 1, 13)
    assert raw[7:11] == struct.pack(">HH", 60, 80)
    assert raw[11:19] == struct.pack(">Q", 3)
    assert raw[19] == 0  # multiple=False
    assert raw[20] == 0xCE


def test_bit_packing_shares_one_octet():
    raw = encode_method(
        "queue.declare",
        {"queue": "q1", "durable": True, "auto_delete": True},
        channel=1,
    )
    m = decode_method(1, raw[7:-1])
    assert m.name == "queue.declare"
    assert m.args["durable"] and m.args["auto_delete"]
    assert not m.args["passive"] and not m.args["exclusive"] and not m.args["no_wait"]
    # 5 bits must occupy exactly ONE octet between queue name and table
    # payload = 2+2 ids + 2 ticket + (1+2) shortstr + 1 bits + 4 empty table
    assert len(raw) == 7 + 4 + 2 + 3 + 1 + 4 + 1


def test_method_roundtrip_deliver():
    raw = encode_method(
        "basic.deliver",
        {
            "consumer_tag": "ct",
            "delivery_tag": 9,
            "redelivered": True,
            "exchange": "ex",
            "routing_key": "rk",
        },
        channel=1,
    )
    m = decode_method(1, raw[7:-1])
    assert m.args == {
        "consumer_tag": "ct",
        "delivery_tag": 9,
        "redelivered": True,
        "exchange": "ex",
        "routing_key": "rk",
    }


def test_content_header_roundtrip_props():
    props = {
        "content_type": "application/json",
        "delivery_mode": 2,
        "headers": {"k": "v"},
        "timestamp": 1700000000,
        "message_id": "m-1",
    }
    raw = encode_content_header(1234, props, channel=1)
    size, got = decode_content_header(raw[7:-1])
    assert size == 1234 and got == props


def test_frame_decoder_chunks_and_frame_end():
    f1 = encode_method("basic.qos-ok", channel=1)
    f2 = encode_heartbeat()
    dec = FrameDecoder()
    got = []
    blob = f1 + f2
    for i in range(len(blob)):
        got.extend(dec.feed(blob[i : i + 1]))
    assert [g.frame_type for g in got] == [FRAME_METHOD, 8]
    bad = bytearray(encode_heartbeat())
    bad[-1] = 0x00  # corrupt frame-end octet
    with pytest.raises(AmqpProtocolError, match="frame-end"):
        FrameDecoder().feed(bytes(bad))


# ---------------------------------------------------------------- client

class ScriptedBroker:
    def __init__(self, replies: list[bytes]):
        self.sent = bytearray()
        self._replies = list(replies)

    def sendall(self, b: bytes) -> None:
        self.sent.extend(b)

    def recv(self, n: int) -> bytes:
        return self._replies.pop(0) if self._replies else b""


def _handshake_replies() -> list[bytes]:
    return [
        encode_method(
            "connection.start",
            {
                "version_major": 0,
                "version_minor": 9,
                "server_properties": {"product": "scripted"},
                "mechanisms": b"PLAIN AMQPLAIN",
                "locales": b"en_US",
            },
        ),
        encode_method(
            "connection.tune", {"channel_max": 0, "frame_max": 4096, "heartbeat": 60}
        ),
        encode_method("connection.open-ok", {"reserved_1": ""}),
        encode_method("channel.open-ok", {"reserved_1": b""}, channel=1),
    ]


def test_client_handshake_negotiates_plain_and_frame_max():
    broker = ScriptedBroker(_handshake_replies())
    c = AmqpClient(broker, virtual_host="/vh", username="u", password="p")
    c.handshake()
    assert c.frame_max == 4096  # min(client default, server tune)
    sent = bytes(broker.sent)
    assert sent.startswith(PROTOCOL_HEADER)
    start_ok = decode_method(0, _first_method_payload(sent[len(PROTOCOL_HEADER):]))
    assert start_ok.name == "connection.start-ok"
    assert start_ok.args["mechanism"] == "PLAIN"
    assert start_ok.args["response"] == b"\x00u\x00p"


def _first_method_payload(blob: bytes) -> bytes:
    dec = FrameDecoder()
    return dec.feed(blob)[0].payload


def test_client_consume_reassembles_split_body_and_acks():
    body = b"x" * 300
    deliver = encode_method(
        "basic.deliver",
        {"consumer_tag": "rdps", "delivery_tag": 7, "redelivered": False,
         "exchange": "", "routing_key": "events"},
        channel=1,
    )
    header = encode_content_header(len(body), {"message_id": "m7"}, channel=1)
    b1 = encode_frame(FRAME_BODY, 1, body[:100])
    b2 = encode_frame(FRAME_BODY, 1, body[100:])
    broker = ScriptedBroker(
        _handshake_replies()
        + [
            encode_method("queue.declare-ok",
                          {"queue": "events", "message_count": 1, "consumer_count": 0},
                          channel=1),
            encode_method("basic.qos-ok", channel=1),
            encode_method("basic.consume-ok", {"consumer_tag": "rdps"}, channel=1),
            deliver + header + b1,  # header rides with deliver; body split
            b2,
        ]
    )
    c = AmqpClient(broker)
    c.handshake()
    assert c.declare_queue("events")["queue"] == "events"
    c.consume("events", prefetch=16)
    got = list(c.messages(max_messages=1))
    assert got[0].body == body
    assert got[0].properties == {"message_id": "m7"}
    assert got[0].delivery_tag == 7
    # the ack for tag 7 must be on the wire
    acks = [
        decode_method(f.channel, f.payload)
        for f in FrameDecoder().feed(bytes(broker.sent)[len(PROTOCOL_HEADER):])
        if f.frame_type == FRAME_METHOD
    ]
    assert any(m.name == "basic.ack" and m.args["delivery_tag"] == 7 for m in acks)


def test_client_publish_splits_body_at_frame_max():
    broker = ScriptedBroker(_handshake_replies())
    c = AmqpClient(broker)
    c.handshake()
    broker.sent.clear()
    body = b"y" * 10000  # frame_max 4096 → chunks of 4088
    c.publish("", "events", body, {"content_type": "text/plain"})
    frames = FrameDecoder().feed(bytes(broker.sent))
    assert decode_method(frames[0].channel, frames[0].payload).name == "basic.publish"
    size, props = decode_content_header(frames[1].payload)
    assert size == 10000 and props == {"content_type": "text/plain"}
    body_frames = [f for f in frames if f.frame_type == FRAME_BODY]
    assert [len(f.payload) for f in body_frames] == [4088, 4088, 10000 - 2 * 4088]
    assert b"".join(f.payload for f in body_frames) == body


def test_client_error_on_connection_close():
    replies = _handshake_replies()[:1] + [
        encode_method(
            "connection.close",
            {"reply_code": 403, "reply_text": "ACCESS_REFUSED", "class_id": 0, "method_id": 0},
        )
    ]
    c = AmqpClient(ScriptedBroker(replies))
    with pytest.raises(AmqpProtocolError, match="ACCESS_REFUSED"):
        c.handshake()


def test_client_real_socketpair_roundtrip():
    """Same state machine over a genuine OS socket."""
    import socket
    import threading

    cli, srv = socket.socketpair()
    deliver = encode_method(
        "basic.deliver",
        {"consumer_tag": "rdps", "delivery_tag": 1, "redelivered": False,
         "exchange": "", "routing_key": "rk"},
        channel=1,
    )
    header = encode_content_header(5, {}, channel=1)
    bodyf = encode_frame(FRAME_BODY, 1, b"hello")

    def broker():
        srv.recv(65536)  # protocol header (+ maybe more)
        for reply in _handshake_replies():
            srv.sendall(reply)
        srv.sendall(deliver + header + bodyf)
        while True:
            try:
                if not srv.recv(65536):
                    break
            except OSError:
                break
        srv.close()

    t = threading.Thread(target=broker, daemon=True)
    t.start()
    c = AmqpClient(cli)
    c.handshake()
    got = list(c.messages(max_messages=1))
    assert got[0].body == b"hello"
    cli.close()
    t.join(timeout=5)


def test_drain_to_queue_dir_bridges_to_stream_schema(tmp_path):
    from rabbit_data_pipeline_spark.sources.amqp_protocol import drain_to_queue_dir

    deliver = encode_method(
        "basic.deliver",
        {"consumer_tag": "rdps", "delivery_tag": 11, "redelivered": False,
         "exchange": "", "routing_key": "events"},
        channel=1,
    )
    body = b"payload-1"
    header = encode_content_header(
        len(body), {"message_id": "m11", "timestamp": 1700000000}, channel=1
    )
    broker = ScriptedBroker(
        _handshake_replies() + [deliver + header + encode_frame(FRAME_BODY, 1, body)]
    )
    c = AmqpClient(broker)
    c.handshake()
    n = drain_to_queue_dir(c, str(tmp_path), max_messages=1)
    assert n == 1
    files = list(tmp_path.glob("*.json"))
    rec = json.loads(files[0].read_text().strip())
    assert rec == {
        "key": "m11",
        "value": "payload-1",
        "topic": "events",
        "ts": "2023-11-14T22:13:20",
    }
