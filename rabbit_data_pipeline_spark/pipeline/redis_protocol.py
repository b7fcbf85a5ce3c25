"""Redis RESP2 wire protocol — codec + minimal client for locks.

Reference parity: the reference takes its single-flight locks from
Redis (src/Message.php getLock/deleteLock, src/Scheduler.php:101
rlock — SET key NX EX / DEL). ``pipeline/locks.py RedisLockBackend``
implements that protocol over any injected redis-py-shaped client;
this module supplies a real one from the PUBLIC spec
(https://redis.io/docs/reference/protocol-spec/) over any socket-like
transport, completing the chain: RESP codec → client → lock backend →
task_lock, with no third-party redis package.

  requests = RESP arrays of bulk strings: *<n>\\r\\n then per arg
             $<len>\\r\\n<bytes>\\r\\n
  replies  = +simple / -error / :integer / $bulk (−1 null) /
             *array (−1 null), recursively for arrays

The transport is injected (anything with ``sendall``/``recv``) so the
codec and reply state machine are fully unit-tested against scripted
byte streams in this redis-less container — the same strategy as the
AMQP/NSQ/Kafka protocol clients in sources/ — and ``connect_client``
speaks to a real server the moment a host:port is reachable.
"""

from __future__ import annotations

from typing import Any

CRLF = b"\r\n"


class RedisProtocolError(RuntimeError):
    pass


class RedisReplyError(RuntimeError):
    """A ``-ERR ...`` reply from the server (wrong type, NOAUTH, ...)."""


# ---------------------------------------------------------------- encode

def encode_command(*args: str | bytes | int | float) -> bytes:
    """Client → server: always a flat array of bulk strings."""
    out = bytearray(b"*%d\r\n" % len(args))
    for a in args:
        if isinstance(a, bytes):
            b = a
        elif isinstance(a, bool):  # bool is an int subclass; be explicit
            raise TypeError("bool is not a Redis argument; encode intent explicitly")
        elif isinstance(a, (int, float, str)):
            b = str(a).encode()
        else:
            raise TypeError(f"unsupported Redis argument type {type(a).__name__}")
        out += b"$%d\r\n" % len(b)
        out += b
        out += CRLF
    return bytes(out)


# ---------------------------------------------------------------- decode

class ReplyDecoder:
    """Incremental RESP2 reply parser: feed() arbitrary chunks, pop
    complete replies. Nested arrays are handled recursively; an
    incomplete reply leaves the buffer untouched until more bytes
    arrive (TCP does not respect reply boundaries)."""

    def __init__(self) -> None:
        self._buf = bytearray()

    def feed(self, chunk: bytes) -> list[Any]:
        self._buf.extend(chunk)
        out = []
        while True:
            parsed = self._try_parse(0)
            if parsed is None:
                return out
            value, end = parsed
            del self._buf[:end]
            out.append(value)

    def _try_parse(self, pos: int) -> tuple[Any, int] | None:
        """Parse one reply at ``pos``; None when incomplete. Errors are
        returned as RedisReplyError VALUES (raised by the client at the
        command that caused them, not mid-parse — an error reply to
        command N must not poison command N+1's bytes)."""
        nl = self._buf.find(CRLF, pos)
        if nl < 0:
            return None
        kind = self._buf[pos : pos + 1]
        line = bytes(self._buf[pos + 1 : nl])
        after = nl + 2
        if kind == b"+":
            return line.decode(), after
        if kind == b"-":
            return RedisReplyError(line.decode()), after
        if kind == b":":
            return int(line), after
        if kind == b"$":
            n = int(line)
            if n == -1:
                return None, after  # null bulk string
            if len(self._buf) < after + n + 2:
                return None
            if bytes(self._buf[after + n : after + n + 2]) != CRLF:
                raise RedisProtocolError("bulk string not CRLF-terminated")
            return bytes(self._buf[after : after + n]), after + n + 2
        if kind == b"*":
            n = int(line)
            if n == -1:
                return None, after  # null array
            items = []
            for _ in range(n):
                sub = self._try_parse(after)
                if sub is None:
                    return None
                value, after = sub
                items.append(value)
            return items, after
        raise RedisProtocolError(f"unknown RESP type byte {kind!r}")


# ---------------------------------------------------------------- client

class RespClient:
    """Minimal synchronous client exposing exactly the redis-py surface
    ``RedisLockBackend`` consumes — ``set(name, value, nx=, ex=)`` and
    ``delete(name)`` — plus the generic ``command`` for everything
    else. One in-flight command at a time (the lock protocol is
    strictly request/reply)."""

    def __init__(self, transport, recv_bytes: int = 65536) -> None:
        self.transport = transport
        self._decoder = ReplyDecoder()
        self._pending: list[Any] = []
        self._recv_bytes = recv_bytes

    def command(self, *args: str | bytes | int | float) -> Any:
        self.transport.sendall(encode_command(*args))
        while not self._pending:
            chunk = self.transport.recv(self._recv_bytes)
            if not chunk:
                raise RedisProtocolError("connection closed by peer")
            self._pending.extend(self._decoder.feed(chunk))
        reply = self._pending.pop(0)
        if isinstance(reply, RedisReplyError):
            raise reply
        return reply

    # -- redis-py-compatible surface (what RedisLockBackend calls)

    def set(
        self,
        name: str,
        value: str | bytes,
        nx: bool = False,
        ex: int | None = None,
    ):
        """SET — returns True on +OK, None when NX blocked the write
        (the server replies null bulk), matching redis-py."""
        args: list[Any] = ["SET", name, value]
        if ex is not None:
            args += ["EX", int(ex)]
        if nx:
            args.append("NX")
        reply = self.command(*args)
        return True if reply == "OK" else None

    def delete(self, *names: str) -> int:
        return int(self.command("DEL", *names))

    def get(self, name: str) -> bytes | None:
        return self.command("GET", name)

    def ping(self) -> bool:
        return self.command("PING") == "PONG"

    def ttl(self, name: str) -> int:
        return int(self.command("TTL", name))


def connect_client(
    host: str,
    port: int = 6379,
    password: str | None = None,
    db: int = 0,
    timeout: float = 5.0,
) -> RespClient:
    """Real-socket entry point: AUTH + SELECT, then hand the client to
    ``RedisLockBackend`` / ``set_lock_backend`` for reference-parity
    multi-driver locking. Everything above it is transport-agnostic
    and tested."""
    import socket

    sock = socket.create_connection((host, port), timeout=timeout)
    client = RespClient(sock)
    if password is not None:
        client.command("AUTH", password)
    if db:
        client.command("SELECT", db)
    return client
