"""Crash-safe persistent-compilation-cache writes.

jax's file-system cache (jax/_src/lru_cache.py ``LRUCache.put``) writes an
entry with a plain ``write_bytes`` straight to its FINAL path. Two real
failure modes follow, both observed in this project's CI:

* a crash / SIGTERM mid-write leaves a TRUNCATED ``*-cache`` file;
* a concurrent process (the 2-process multihost launcher, a parallel CLI
  stage) calls ``get`` while the writer is mid-``write_bytes`` and reads a
  partial file — ``put``'s exists-check-then-write has no cross-process
  exclusion for the entry file itself.

Either way the next ``get`` hands truncated bytes to XLA's executable
deserializer, which SEGFAULTS the process inside
``compilation_cache.get_executable_and_time`` (no checksum protects the
payload). ``harden_compilation_cache`` swaps the final write for the
standard atomic pattern — temp file in the same directory + fsync +
``os.replace`` — so a reader can only ever observe a complete entry and a
killed writer leaves no entry at all.

This patches a jax-internal class, so every access is feature-guarded: if
the internals moved, the patch silently does nothing and the cache keeps
jax's stock behavior (best-effort, like the cache itself).
"""
from __future__ import annotations

import contextlib
import os
import tempfile
import time
import warnings


def _atomic_put(self, key: str, val: bytes, _lru) -> None:
    """Reimplementation of ``LRUCache.put`` with an atomic final write.
    Mirrors jax 0.9's semantics: empty-key error, oversize warn+skip,
    first-writer-wins, eviction bookkeeping under the directory lock."""
    if not key:
        raise ValueError('key cannot be empty')
    if self.eviction_enabled and len(val) > self.max_size:
        warnings.warn(
            'Cache value for key {0!r} of size {1} bytes exceeds the '
            'maximum cache size of {2} bytes'.format(
                key, len(val), self.max_size))
        return

    cache_path = self.path / '{0}{1}'.format(key, _lru._CACHE_SUFFIX)

    if self.eviction_enabled:
        self.lock.acquire(timeout=self.lock_timeout_secs)
    try:
        if cache_path.exists():
            return
        self._evict_if_needed(additional_size=len(val))

        # the tmp name must not match the *-cache glob eviction scans for
        fd, tmp = tempfile.mkstemp(dir=str(self.path), prefix='.put-')
        try:
            with os.fdopen(fd, 'wb') as f:
                f.write(val)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, str(cache_path))
        except BaseException:
            with contextlib.suppress(OSError):
                os.unlink(tmp)
            raise

        if self.eviction_enabled:
            timestamp = time.time_ns().to_bytes(8, 'little')
            atime_path = self.path / '{0}{1}'.format(key,
                                                     _lru._ATIME_SUFFIX)
            atime_path.write_bytes(timestamp)
    finally:
        if self.eviction_enabled:
            self.lock.release()


def harden_compilation_cache() -> None:
    """Idempotently patch ``jax._src.lru_cache.LRUCache.put`` with the
    atomic write. Safe to call before or after cache initialization (the
    class is patched, not an instance). No-op when the jax internals this
    relies on are absent, or for non-local cache paths (``gs://`` etc.,
    where mkstemp/os.replace do not apply — those backends are not used
    here)."""
    try:
        from jax._src import lru_cache as _lru
    except Exception:       # pragma: no cover - jax internals moved
        return
    cls = getattr(_lru, 'LRUCache', None)
    if cls is None or getattr(cls.put, '_fplx_atomic', False):
        return
    for attr in ('_CACHE_SUFFIX', '_ATIME_SUFFIX'):
        if not hasattr(_lru, attr):    # pragma: no cover - internals moved
            return
    stock_put = cls.put

    def put(self, key, val):
        path = getattr(self, 'path', None)
        local = path is not None and os.path.isdir(str(path))
        if not (local and hasattr(self, 'eviction_enabled')
                and hasattr(self, '_evict_if_needed')):
            return stock_put(self, key, val)   # pragma: no cover
        return _atomic_put(self, key, val, _lru)

    put._fplx_atomic = True
    cls.put = put
