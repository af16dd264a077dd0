"""Python binding for the native dsaring shared-memory ring buffer.

This is the PSRDADA-client layer of the rebuild (SURVEY.md L1/C3): a
capture process writes fixed-size 4R4I voltage blocks into shared
memory; the beamformer process connects, reads the text header once
(the DADA-header analog), then streams blocks with either in-order or
skip-to-latest semantics, with dropped/skipped counters surfaced in the
per-block metrics.

The native library (ingest/native/ring_buffer.cpp) is compiled on first
use with the system compiler into the package directory; no pip install
step is required.
"""

from __future__ import annotations

import ctypes
import fcntl
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent / "native"
_SRC = _NATIVE_DIR / "ring_buffer.cpp"
_BUILD_LOCK = threading.Lock()

_lib = None


def _so_path() -> Path:
    """Where to place the compiled library: the package dir when
    writable, else a per-user cache dir (read-only installs)."""
    if os.access(_NATIVE_DIR, os.W_OK):
        return _NATIVE_DIR / "libdsaring.so"
    cache = Path(
        os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache")
    ) / "dsabf"
    cache.mkdir(parents=True, exist_ok=True)
    return cache / "libdsaring.so"


def _build_library() -> Path:
    """Compile the native ring on first use.

    Producer (`dsabf simulate`) and consumer (`dsabf run`) commonly
    start concurrently in separate processes, so cross-process safety
    matters: an fcntl lock file serializes builds between processes
    (the threading.Lock only covers threads in one process), and the
    compiler writes to a per-pid temp published with an atomic
    os.replace."""
    so = _so_path()
    with _BUILD_LOCK:
        if so.exists() and so.stat().st_mtime >= _SRC.stat().st_mtime:
            return so
        lock_path = so.with_suffix(".lock")
        with open(lock_path, "w") as lock_f:
            fcntl.flock(lock_f, fcntl.LOCK_EX)
            try:
                # Another process may have built it while we waited.
                if so.exists() and so.stat().st_mtime >= _SRC.stat().st_mtime:
                    return so
                tmp = so.with_suffix(f".so.tmp.{os.getpid()}")
                cmd = [
                    os.environ.get("CXX", "g++"),
                    "-O2", "-std=c++17", "-shared", "-fPIC",
                    str(_SRC), "-o", str(tmp), "-lrt", "-pthread",
                ]
                subprocess.run(cmd, check=True, capture_output=True,
                               text=True)
                os.replace(tmp, so)
            finally:
                fcntl.flock(lock_f, fcntl.LOCK_UN)
        return so


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(str(_build_library()))
    u64, i64, vp, cp = (ctypes.c_uint64, ctypes.c_int64, ctypes.c_void_p,
                        ctypes.c_char_p)
    lib.dsaring_create.restype = vp
    lib.dsaring_create.argtypes = [cp, u64, u64, u64]
    lib.dsaring_connect.restype = vp
    lib.dsaring_connect.argtypes = [cp]
    lib.dsaring_close.argtypes = [vp]
    lib.dsaring_destroy.argtypes = [cp]
    lib.dsaring_destroy.restype = ctypes.c_int
    for fn in ("nbufs", "bufsz", "hdrsz", "dropped", "skipped", "w_head",
               "r_tail", "readers"):
        f = getattr(lib, f"dsaring_{fn}")
        f.restype = u64
        f.argtypes = [vp]
    lib.dsaring_write_header.restype = ctypes.c_int
    lib.dsaring_write_header.argtypes = [vp, cp, u64]
    lib.dsaring_read_header.restype = cp
    lib.dsaring_read_header.argtypes = [vp]
    lib.dsaring_open_write.restype = vp
    lib.dsaring_open_write.argtypes = [vp]
    lib.dsaring_commit_write.restype = ctypes.c_int
    lib.dsaring_commit_write.argtypes = [vp]
    lib.dsaring_drop_write.argtypes = [vp]
    lib.dsaring_set_eod.argtypes = [vp]
    lib.dsaring_eod.restype = ctypes.c_int
    lib.dsaring_eod.argtypes = [vp]
    lib.dsaring_open_read.restype = vp
    lib.dsaring_open_read.argtypes = [vp, i64, ctypes.c_int,
                                      ctypes.POINTER(u64)]
    lib.dsaring_release_read.restype = ctypes.c_int
    lib.dsaring_release_read.argtypes = [vp]
    _lib = lib
    return lib


class RingBuffer:
    """Handle on a dsaring shared-memory segment.

    One process creates (the producer), others connect.  Single
    producer / single consumer.
    """

    def __init__(self, name: str, *, create: bool = False, nbufs: int = 8,
                 bufsz: int = 0, hdrsz: int = 4096,
                 connect_timeout_s: float = 0.0):
        self._lib = _load()
        self.name = name
        self._owner = create
        if create:
            if bufsz <= 0:
                raise ValueError("bufsz required when creating a ring")
            self._h = self._lib.dsaring_create(name.encode(), nbufs, bufsz,
                                               hdrsz)
        else:
            # The producer may not have created the segment yet (process
            # start order is not guaranteed): poll up to the timeout.
            import time as _time

            deadline = _time.monotonic() + connect_timeout_s
            while True:
                self._h = self._lib.dsaring_connect(name.encode())
                if self._h or _time.monotonic() >= deadline:
                    break
                _time.sleep(0.05)
        if not self._h:
            raise OSError(
                f"dsaring: could not {'create' if create else 'connect to'} "
                f"ring {name!r}"
            )

    # -- properties ---------------------------------------------------
    @property
    def nbufs(self) -> int:
        return self._lib.dsaring_nbufs(self._h)

    @property
    def bufsz(self) -> int:
        return self._lib.dsaring_bufsz(self._h)

    @property
    def dropped(self) -> int:
        return self._lib.dsaring_dropped(self._h)

    @property
    def skipped(self) -> int:
        return self._lib.dsaring_skipped(self._h)

    @property
    def n_written(self) -> int:
        return self._lib.dsaring_w_head(self._h)

    @property
    def n_read(self) -> int:
        return self._lib.dsaring_r_tail(self._h)

    @property
    def readers(self) -> int:
        """Best-effort count of open handles that have read from this
        ring (advisory: crashed readers leak it).  The scan commands
        use it to warn before attaching a SECOND consumer to the
        single-consumer cursor."""
        return self._lib.dsaring_readers(self._h)

    # -- header -------------------------------------------------------
    def write_header(self, text: str) -> None:
        data = text.encode()
        if self._lib.dsaring_write_header(self._h, data, len(data)) != 0:
            raise ValueError("header larger than ring header area")

    def read_header(self, timeout_s: float = 5.0) -> str:
        import time

        deadline = time.monotonic() + timeout_s
        while True:
            p = self._lib.dsaring_read_header(self._h)
            if p is not None:
                return p.decode()
            if time.monotonic() >= deadline:
                raise TimeoutError("no header committed on ring")
            time.sleep(0.01)

    # -- producer -----------------------------------------------------
    def write_block(self, block: np.ndarray) -> bool:
        """Copy one block into the ring.  Returns False (and counts a
        drop) if the consumer has fallen nbufs behind."""
        flat = np.ascontiguousarray(block).reshape(-1).view(np.uint8)
        if flat.nbytes != self.bufsz:
            raise ValueError(f"block is {flat.nbytes} B, ring bufsz {self.bufsz}")
        slot = self._lib.dsaring_open_write(self._h)
        if not slot:
            self._lib.dsaring_drop_write(self._h)
            return False
        ctypes.memmove(slot, flat.ctypes.data, flat.nbytes)
        self._lib.dsaring_commit_write(self._h)
        return True

    def set_eod(self) -> None:
        self._lib.dsaring_set_eod(self._h)

    # -- consumer -----------------------------------------------------
    def read_block(
        self,
        out: Optional[np.ndarray] = None,
        *,
        timeout_s: float = 1.0,
        latest: bool = False,
    ) -> Optional[Tuple[int, np.ndarray]]:
        """Read one block (copied into ``out`` or a fresh array).

        Returns (seq, array) or None on timeout / end-of-data.
        ``latest=True`` applies the skip-ahead overrun policy.
        """
        seq = ctypes.c_uint64()
        timeout_us = -1 if timeout_s is None else int(timeout_s * 1e6)
        p = self._lib.dsaring_open_read(self._h, timeout_us,
                                        1 if latest else 0,
                                        ctypes.byref(seq))
        if not p:
            return None
        if out is None:
            out = np.empty(self.bufsz, dtype=np.uint8)
        flat = out.reshape(-1).view(np.uint8)
        if flat.nbytes != self.bufsz:
            raise ValueError(f"out is {flat.nbytes} B, ring bufsz {self.bufsz}")
        ctypes.memmove(flat.ctypes.data, p, self.bufsz)
        self._lib.dsaring_release_read(self._h)
        return int(seq.value), out

    def eod(self) -> bool:
        return bool(self._lib.dsaring_eod(self._h))

    # -- lifecycle ----------------------------------------------------
    def close(self) -> None:
        if self._h:
            self._lib.dsaring_close(self._h)
            self._h = None

    def destroy(self) -> None:
        self.close()
        self._lib.dsaring_destroy(self.name.encode())

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if self._owner:
            self.destroy()
        else:
            self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
