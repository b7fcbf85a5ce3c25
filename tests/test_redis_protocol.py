"""RESP2 protocol (pipeline/redis_protocol.py): codec vectors, the
reply state machine against scripted byte streams, and the full chain
RESP client → RedisLockBackend → task_lock — the same
transport-injection strategy as the AMQP/NSQ/Kafka protocol tests."""

from __future__ import annotations

import pytest

from rabbit_data_pipeline_spark.pipeline.locks import RedisLockBackend, TaskLocked, task_lock
from rabbit_data_pipeline_spark.pipeline.redis_protocol import (
    RedisProtocolError,
    RedisReplyError,
    ReplyDecoder,
    RespClient,
    encode_command,
)


# ---------------------------------------------------------------- encode

def test_encode_command_vectors():
    assert encode_command("PING") == b"*1\r\n$4\r\nPING\r\n"
    assert (
        encode_command("SET", "k", "v", "EX", 30, "NX")
        == b"*6\r\n$3\r\nSET\r\n$1\r\nk\r\n$1\r\nv\r\n$2\r\nEX\r\n$2\r\n30\r\n$2\r\nNX\r\n"
    )
    assert encode_command("GET", b"\x00bin\xff") == b"*2\r\n$3\r\nGET\r\n$5\r\n\x00bin\xff\r\n"


def test_encode_rejects_bool_and_objects():
    with pytest.raises(TypeError):
        encode_command("SET", "k", True)
    with pytest.raises(TypeError):
        encode_command("SET", "k", object())


# ---------------------------------------------------------------- decode

def test_decoder_all_reply_kinds():
    d = ReplyDecoder()
    out = d.feed(b"+OK\r\n:42\r\n$3\r\nfoo\r\n$-1\r\n*2\r\n:1\r\n$1\r\na\r\n*-1\r\n")
    err = d.feed(b"-ERR boom\r\n")
    assert out == ["OK", 42, b"foo", None, [1, b"a"], None]
    assert isinstance(err[0], RedisReplyError) and "boom" in str(err[0])


def test_decoder_handles_arbitrary_chunking():
    wire = b"*3\r\n$3\r\nfoo\r\n:7\r\n+PONG\r\n$2\r\nhi\r\n"
    for chunk_size in (1, 2, 3, 5, 7):
        d = ReplyDecoder()
        out = []
        for i in range(0, len(wire), chunk_size):
            out.extend(d.feed(wire[i : i + chunk_size]))
        assert out == [[b"foo", 7, "PONG"], b"hi"]


def test_decoder_unknown_type_byte_raises():
    with pytest.raises(RedisProtocolError):
        ReplyDecoder().feed(b"!weird\r\n")


def test_decoder_missing_bulk_terminator_raises():
    with pytest.raises(RedisProtocolError):
        ReplyDecoder().feed(b"$3\r\nfooXX")


# ---------------------------------------------------------------- scripted server

class ScriptedRedis:
    """Transport double implementing just enough of a redis server:
    parses complete commands, keeps a dict with NX/EX semantics, and
    dribbles replies in 3-byte chunks to exercise reassembly."""

    def __init__(self):
        self.store: dict[str, bytes] = {}
        self.expiry: dict[str, int] = {}
        self._parser = ReplyDecoder()  # commands are RESP arrays too
        self._out = bytearray()

    def sendall(self, data: bytes) -> None:
        for cmd in self._parser.feed(data):
            args = [a.decode() if isinstance(a, bytes) else str(a) for a in cmd]
            self._out += self._dispatch(args)

    def recv(self, n: int) -> bytes:
        take = min(n, 3, len(self._out))
        chunk = bytes(self._out[:take])
        del self._out[:take]
        return chunk

    def _dispatch(self, args: list[str]) -> bytes:
        op = args[0].upper()
        if op == "PING":
            return b"+PONG\r\n"
        if op == "SET":
            name, value, rest = args[1], args[2], [a.upper() for a in args[3:]]
            if "NX" in rest and name in self.store:
                return b"$-1\r\n"
            self.store[name] = value.encode()
            if "EX" in rest:
                self.expiry[name] = int(args[3 + rest.index("EX") + 1])
            return b"+OK\r\n"
        if op == "GET":
            v = self.store.get(args[1])
            return b"$-1\r\n" if v is None else b"$%d\r\n%s\r\n" % (len(v), v)
        if op == "DEL":
            n = sum(1 for k in args[1:] if self.store.pop(k, None) is not None)
            return b":%d\r\n" % n
        if op == "TTL":
            return b":%d\r\n" % self.expiry.get(args[1], -1)
        return b"-ERR unknown command '%s'\r\n" % op.encode()


def test_client_set_nx_semantics_match_redis_py():
    c = RespClient(ScriptedRedis())
    assert c.ping()
    assert c.set("k", "v1", nx=True, ex=30) is True
    assert c.set("k", "v2", nx=True) is None  # NX blocked -> None, like redis-py
    assert c.get("k") == b"v1"
    assert c.ttl("k") == 30
    assert c.delete("k") == 1
    assert c.set("k", "v3", nx=True) is True


def test_client_error_reply_raises_at_the_command():
    c = RespClient(ScriptedRedis())
    with pytest.raises(RedisReplyError, match="unknown command"):
        c.command("FLUSHEVERYTHING")
    assert c.ping()  # the stream stays in sync after an error


# ---------------------------------------------------------------- full chain

def test_resp_client_drives_redis_lock_backend():
    """The reference rlock protocol end-to-end minus the socket:
    SET NX EX via the wire codec, contention blocked, DEL releases."""
    server = ScriptedRedis()
    be = RedisLockBackend(RespClient(server))
    assert be.acquire("nightly-sync", ttl=30)
    assert not be.acquire("nightly-sync", ttl=30)  # single flight
    assert server.expiry["rdps-lock:nightly-sync"] == 30  # TTL reached the server
    be.release("nightly-sync")
    assert be.acquire("nightly-sync", ttl=30)


def test_task_lock_context_over_wire_backend():
    be = RedisLockBackend(RespClient(ScriptedRedis()))
    with task_lock("job", timeout=10, backend=be):
        with pytest.raises(TaskLocked):
            with task_lock("job", timeout=10, backend=be):
                pass
    with task_lock("job", timeout=10, backend=be):  # released on exit
        pass
