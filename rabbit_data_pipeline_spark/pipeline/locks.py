"""Single-flight task locks, pluggable backend.

The reference uses Redis NX locks (Message.php getLock/deleteLock,
Scheduler.php:101 rlock) because many coroutine workers race on the
same task. Here Spark's driver owns orchestration, so the DEFAULT
backend is a local lock file — correct for one driver. The reference's
multi-process deployment shape maps to ``RedisLockBackend`` (SET NX EX
/ DEL — the exact rlock protocol) over any redis-py-compatible client;
the client is injected, so the redis package itself is never imported
here (works with a fake in tests, real redis in production).
``pipeline/redis_protocol.py`` provides a real client speaking RESP2
natively over a socket — ``RedisLockBackend(connect_client(host))`` is
the full reference deployment shape with zero dependencies.
"""

from __future__ import annotations

import contextlib
import os
import tempfile
import time


class TaskLocked(RuntimeError):
    pass


class FileLockBackend:
    """O_EXCL lock file + mtime-based TTL expiry (holder crashed →
    steal, like Redis EX expiry). One driver / shared filesystem."""

    def __init__(self, lock_dir: str | None = None):
        self.lock_dir = lock_dir or os.path.join(tempfile.gettempdir(), "rdps-locks")

    def _path(self, name: str) -> str:
        return os.path.join(self.lock_dir, f"{name}.lock")

    def acquire(self, name: str, ttl: float) -> bool:
        os.makedirs(self.lock_dir, exist_ok=True)
        path = self._path(name)
        now = time.time()
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            try:
                if now - os.path.getmtime(path) > ttl:
                    os.unlink(path)
                    fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                else:
                    return False
            except FileNotFoundError:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.write(fd, str(now).encode())
        os.close(fd)
        return True

    def release(self, name: str) -> None:
        with contextlib.suppress(FileNotFoundError):
            os.unlink(self._path(name))


class RedisLockBackend:
    """Reference rlock protocol (Scheduler.php:101 / Message.php
    getLock): ``SET key value NX EX ttl`` to acquire, ``DEL`` to
    release. ``client`` is any object with redis-py's ``set(name,
    value, nx=, ex=)`` and ``delete(name)`` — injected, never imported
    here."""

    def __init__(self, client, prefix: str = "rdps-lock:"):
        self.client = client
        self.prefix = prefix

    def acquire(self, name: str, ttl: float) -> bool:
        # redis-py returns True on set, None when NX blocks it
        return bool(
            self.client.set(self.prefix + name, str(time.time()), nx=True, ex=max(1, int(ttl)))
        )

    def release(self, name: str) -> None:
        self.client.delete(self.prefix + name)


_default_backend = None


def set_lock_backend(backend) -> None:
    """Install a process-wide default backend (e.g. RedisLockBackend
    for multi-driver deployments). ``None`` restores the file
    default."""
    global _default_backend
    _default_backend = backend


@contextlib.contextmanager
def task_lock(
    name: str,
    timeout: float | None = None,
    lock_dir: str | None = None,
    backend=None,
):
    """NX-style single-flight lock: acquire or fail fast (reference
    warns '$key is running' and skips). ``timeout=None`` disables
    locking — matching the reference default (lock: null). Backend
    resolution: explicit arg → process default (set_lock_backend) →
    file lock in ``lock_dir``."""
    if timeout is None:
        yield
        return
    be = backend or _default_backend or FileLockBackend(lock_dir)
    if not be.acquire(name, timeout):
        raise TaskLocked(f"{name} is running")
    try:
        yield
    finally:
        be.release(name)
