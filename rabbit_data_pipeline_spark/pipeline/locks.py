"""Single-flight task locks.

The reference uses Redis NX locks (Message.php getLock/deleteLock,
Scheduler.php:101 rlock) because many coroutine workers race on the
same task. Here Spark's driver owns orchestration, so a local file
lock is sufficient — on a multi-driver deployment this would map to a
shared store (e.g. a DynamoDB/ZK lock), behind this same interface.
"""

from __future__ import annotations

import contextlib
import os
import tempfile
import time


class TaskLocked(RuntimeError):
    pass


@contextlib.contextmanager
def task_lock(name: str, timeout: float | None = None, lock_dir: str | None = None):
    """NX-style lock: acquire or fail fast (reference warns '$key is
    running' and skips). ``timeout=None`` disables locking — matching
    the reference default (lock: null)."""
    if timeout is None:
        yield
        return
    lock_dir = lock_dir or os.path.join(tempfile.gettempdir(), "rdps-locks")
    os.makedirs(lock_dir, exist_ok=True)
    path = os.path.join(lock_dir, f"{name}.lock")
    now = time.time()
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        # expired lock (holder crashed) → steal, like Redis EX expiry
        try:
            if now - os.path.getmtime(path) > timeout:
                os.unlink(path)
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            else:
                raise TaskLocked(f"{name} is running")
        except FileNotFoundError:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    try:
        os.write(fd, str(now).encode())
        os.close(fd)
        yield
    finally:
        with contextlib.suppress(FileNotFoundError):
            os.unlink(path)
