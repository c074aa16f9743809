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

A third failure mode needs no file corruption at all: jaxlib 0.9's
XLA:CPU cannot round-trip MULTI-DEVICE (SPMD mesh) executables through
the cache — ``executable.serialize()`` segfaults outright, and when a
write does land, deserializing the COMPLETE bytes segfaults the next
run's ``get`` (both reproduced on the 8-device mesh CLI train step;
single-device entries have been fine across rounds).
``harden_compilation_cache`` therefore also installs an SPMD-on-CPU
guard: cache puts/gets for cpu-backend executables spanning more than
one device are skipped (a clean cache miss — the program recompiles in
seconds), while single-device entries keep caching normally. TPU
programs are untouched.

This patches jax internals, so every access is feature-guarded: if the
internals moved, the patches silently do nothing and the cache keeps
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


def cpu_microarch_tag() -> str:
    """Fingerprint of the host CPU's feature flags. XLA:CPU executables are
    AOT-compiled for the compile machine's exact features (avx512/amx/...)
    and jax's persistent-cache key does NOT include them — loading an entry
    written on a different microarch can crash the deserializer. Callers
    that cache CPU executables across processes key the cache DIRECTORY by
    this tag (e.g. the test suite's /tmp/jaxcache-cpu-<tag>)."""
    import hashlib
    flags = ''
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if line.startswith('flags'):
                    flags = ' '.join(sorted(line.split(':', 1)[1].split()))
                    break
    except OSError:  # pragma: no cover - non-Linux fallback
        import platform
        flags = platform.processor() or platform.machine()
    return hashlib.sha1(flags.encode()).hexdigest()[:10]


def _install_spmd_cpu_guard() -> None:
    """Idempotently wrap ``compilation_cache.{get,put}_executable_and_time``
    to skip the persistent cache for multi-device executables on the cpu
    backend (jaxlib 0.9's XLA:CPU segfaults both serializing and
    deserializing them). ``jax._src.compiler`` resolves both names as
    module attributes at call time, so module-level rebinding is
    sufficient."""
    try:
        from jax._src import compilation_cache as _cc
    except Exception:   # pragma: no cover - jax internals moved
        return
    if getattr(_cc, '_fplx_spmd_cpu_guard', False):
        return
    stock_get = getattr(_cc, 'get_executable_and_time', None)
    stock_put = getattr(_cc, 'put_executable_and_time', None)
    if stock_get is None or stock_put is None:  # pragma: no cover
        return

    def get_executable_and_time(cache_key, compile_options, backend,
                                executable_devices):
        if getattr(backend, 'platform', '') == 'cpu':
            try:
                multi = len(executable_devices) > 1
            except Exception:
                multi = True    # unknown span: stay out of the deserializer
            if multi:
                return None, None   # clean miss; cpu recompiles in seconds
        return stock_get(cache_key, compile_options, backend,
                         executable_devices)

    def put_executable_and_time(cache_key, module_name, executable, backend,
                                compile_time):
        if getattr(backend, 'platform', '') == 'cpu':
            try:
                multi = len(executable.local_devices()) > 1
            except Exception:
                multi = True    # unknown span: stay out of the serializer
            if multi:
                return
        return stock_put(cache_key, module_name, executable, backend,
                         compile_time)

    _cc.get_executable_and_time = get_executable_and_time
    _cc.put_executable_and_time = put_executable_and_time
    _cc._fplx_spmd_cpu_guard = True


def harden_compilation_cache() -> None:
    """Idempotently patch ``jax._src.lru_cache.LRUCache.put`` with the
    atomic write and install the SPMD-on-CPU cache guard. Safe to call
    before or after cache initialization (the class is patched, not an
    instance). No-op when the jax internals this relies on are absent, or
    for non-local cache paths (``gs://`` etc., where mkstemp/os.replace do
    not apply — those backends are not used here)."""
    _install_spmd_cpu_guard()
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
