"""ctypes bindings for the native host I/O engine (libthrifty_io.so).

The library is built lazily with ``make`` on first import (g++ only, no
external dependencies).  Every entry point has a pure-Python fallback in
thrifty_tpu.io, so the package works without a toolchain; importing this
module raises ImportError when the library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libthrifty_io.so")


def _build():
    subprocess.run(
        ["make", "-C", _DIR, "lib"],
        check=True, capture_output=True, timeout=120)


def _load():
    if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH)
            < os.path.getmtime(os.path.join(_DIR, "thrifty_io.cpp"))):
        try:
            _build()
        except Exception as e:  # noqa: BLE001 -- any build failure
            raise ImportError(
                "libthrifty_io.so unavailable and build failed: "
                "{}".format(e)) from e
    lib = ctypes.CDLL(_LIB_PATH)

    lib.ttpu_b64_decode.restype = ctypes.c_int
    lib.ttpu_b64_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64]
    lib.ttpu_b64_encode.restype = ctypes.c_int
    lib.ttpu_b64_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64]
    lib.ttpu_b64_decode_batch.restype = ctypes.c_int64
    lib.ttpu_b64_decode_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int]
    lib.ttpu_card_scan.restype = ctypes.c_int64
    lib.ttpu_card_scan.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    lib.ttpu_card_scan_mt.restype = ctypes.c_int64
    lib.ttpu_card_scan_mt.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
    lib.ttpu_count_newlines.restype = ctypes.c_int64
    lib.ttpu_count_newlines.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.ttpu_raw_to_iq.restype = None
    lib.ttpu_raw_to_iq.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
    lib.ttpu_copy_rows.restype = None
    lib.ttpu_copy_rows.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
    lib.ttpu_unfold.restype = None
    lib.ttpu_unfold.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_uint8]
    lib.ttpu_ring_new.restype = ctypes.c_void_p
    lib.ttpu_ring_new.argtypes = [ctypes.c_int64]
    lib.ttpu_ring_free.argtypes = [ctypes.c_void_p]
    lib.ttpu_ring_close.argtypes = [ctypes.c_void_p]
    lib.ttpu_ring_write.restype = ctypes.c_int64
    lib.ttpu_ring_write.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    lib.ttpu_ring_read.restype = ctypes.c_int64
    lib.ttpu_ring_read.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    lib.ttpu_ring_write_reserve.restype = ctypes.c_int64
    lib.ttpu_ring_write_reserve.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]
    lib.ttpu_ring_write_commit.restype = None
    lib.ttpu_ring_write_commit.argtypes = [
        ctypes.c_void_p, ctypes.c_int64]
    lib.ttpu_ring_base.restype = ctypes.c_void_p
    lib.ttpu_ring_base.argtypes = [ctypes.c_void_p]
    lib.ttpu_ring_read_unfold.restype = ctypes.c_int64
    lib.ttpu_ring_read_unfold.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
    lib.ttpu_ring_overflows.restype = ctypes.c_uint64
    lib.ttpu_ring_overflows.argtypes = [ctypes.c_void_p]
    lib.ttpu_ring_histogram.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    return lib


_lib = _load()


def num_threads():
    return min(os.cpu_count() or 1, 16)


def b64decode_batch(encoded_strings):
    """Decode a list of equal-length base64 strings -> [n, k] uint8."""
    n = len(encoded_strings)
    if n == 0:
        return np.zeros((0, 0), dtype=np.uint8)
    joined = "\n".join(encoded_strings).encode("ascii")
    offsets = np.zeros(n, dtype=np.int64)
    lens = np.asarray([len(s) for s in encoded_strings], dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=offsets[1:])
    # Decoded size of the first payload determines the block size.
    probe = np.zeros((lens[0] // 4 + 2) * 3, dtype=np.uint8)
    got = _lib.ttpu_b64_decode(
        encoded_strings[0].encode("ascii"), int(lens[0]),
        probe.ctypes.data, probe.size)
    if got < 0:
        raise ValueError("invalid base64 payload")
    out = np.empty((n, got), dtype=np.uint8)
    status = np.empty(n, dtype=np.uint8)
    bad = _lib.ttpu_b64_decode_batch(
        joined, offsets.ctypes.data, lens.ctypes.data, n,
        out.ctypes.data, got, status.ctypes.data, num_threads())
    if bad:
        raise ValueError(
            "inconsistent block sizes in .card file (row {})".format(
                int(np.argmax(status))))
    return out


def b64decode_batch_tolerant(encoded_strings):
    """Decode base64 strings -> ([n_ok, k] uint8, keep mask [n]).

    Junk rows (invalid characters or a decoded size different from the
    probed block size) are dropped via the mask instead of failing.
    """
    n = len(encoded_strings)
    if n == 0:
        return np.zeros((0, 0), dtype=np.uint8), np.zeros(0, dtype=bool)
    # errors='replace': junk lines can carry non-ASCII bytes (already
    # U+FFFD after the text-mode read); '?' is not valid base64, so
    # such rows are flagged bad instead of crashing the whole batch.
    joined = "\n".join(encoded_strings).encode("ascii", "replace")
    offsets = np.zeros(n, dtype=np.int64)
    lens = np.asarray([len(s) for s in encoded_strings], dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=offsets[1:])
    probe = np.zeros((int(lens.max()) // 4 + 2) * 3, dtype=np.uint8)
    # Probe the block size from the DOMINANT-BY-BYTES base64 length: a
    # junk head row that happens to be valid (shorter) base64 must not
    # set the size and silently drop every real block in the batch,
    # even if short junk rows outnumber real rows in a tiny batch
    # (real capture rows are kilobytes; byte mass is the robust vote).
    # If no modal-length row decodes, fall back to any decodable row.
    uniq, counts = np.unique(lens, return_counts=True)
    modal = int(uniq[np.lexsort((uniq, uniq * counts))[-1]])
    got = -1
    for pass_modal in (True, False):
        for r in range(n):
            if pass_modal != (int(lens[r]) == modal):
                continue
            got = _lib.ttpu_b64_decode(
                encoded_strings[r].encode("ascii"), int(lens[r]),
                probe.ctypes.data, probe.size)
            if got > 0:
                break
        if got > 0:
            break
    if got <= 0:
        return np.zeros((0, 0), dtype=np.uint8), np.zeros(n, dtype=bool)
    out = np.empty((n, got), dtype=np.uint8)
    status = np.empty(n, dtype=np.uint8)
    _lib.ttpu_b64_decode_batch(
        joined, offsets.ctypes.data, lens.ctypes.data, n,
        out.ctypes.data, got, status.ctypes.data, num_threads())
    keep = status == 0
    # One shared junk cap counting EVERY dropped row (undecodable
    # characters and wrong-size alike) against the total row count --
    # the same accounting as the pure-Python fallback, so heavily
    # corrupted (or genuinely mixed-size) captures fail loudly in both
    # paths instead of passing in one and raising in the other.
    if int(np.sum(~keep)) > max(2, 0.1 * n) and keep.any():
        raise ValueError("inconsistent block sizes in .card file")
    return out[keep], keep


def b64encode(data: np.ndarray) -> str:
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = ctypes.create_string_buffer((data.size + 2) // 3 * 4 + 1)
    got = _lib.ttpu_b64_encode(data.ctypes.data, data.size, out, len(out))
    if got < 0:
        raise ValueError("encode buffer too small")
    return out.value.decode("ascii")


def card_scan(text: bytes, max_blocks: int = None):
    """Scan .card text -> (timestamps, indices, payload_offsets, lens)."""
    if max_blocks is None:
        max_blocks = _lib.ttpu_count_newlines(text, len(text)) + 1
    ts = np.empty(max_blocks, dtype=np.float64)
    idx = np.empty(max_blocks, dtype=np.int64)
    offs = np.empty(max_blocks, dtype=np.int64)
    lens = np.empty(max_blocks, dtype=np.int64)
    n = _lib.ttpu_card_scan_mt(
        text, len(text), ts.ctypes.data, idx.ctypes.data,
        offs.ctypes.data, lens.ctypes.data, max_blocks, num_threads())
    return ts[:n], idx[:n], offs[:n], lens[:n]


def parse_card_bytes(text: bytes):
    """Full .card parse: text -> (timestamps, indices, raw [B, 2N])."""
    ts, idx, offs, lens = card_scan(text)
    n = len(ts)
    if n == 0:
        return ts, idx, np.zeros((0, 0), dtype=np.uint8)
    n_total = n
    if not np.all(lens == lens[0]):
        # Junk rows that happen to look like base64 (e.g. a bare word)
        # have the wrong payload length; keep the DOMINANT-BY-BYTES
        # length (the same byte-mass vote as the tolerant batch
        # decoder and the pure-Python fallback -- a plain count mode
        # could tie-break onto short junk and drop every real block).
        vals, counts = np.unique(lens, return_counts=True)
        keep = lens == vals[np.lexsort((vals, vals * counts))[-1]]
        if np.sum(~keep) > max(2, 0.1 * n_total):
            raise ValueError("inconsistent block sizes in .card file")
        ts, idx, offs, lens = ts[keep], idx[keep], offs[keep], lens[keep]
        n = len(ts)
    # Probe the decoded block size from the first row that decodes
    # cleanly (early rows could still be junk lines).
    probe = np.zeros((int(lens[0]) // 4 + 2) * 3, dtype=np.uint8)
    got = -1
    for r in range(n):
        got = _lib.ttpu_b64_decode(
            text[offs[r]:offs[r] + lens[r]], int(lens[r]),
            probe.ctypes.data, probe.size)
        if got > 0:
            break
    if got <= 0:
        raise ValueError("invalid base64 payload")
    out = np.empty((n, got), dtype=np.uint8)
    status = np.empty(n, dtype=np.uint8)
    bad = _lib.ttpu_b64_decode_batch(
        text, offs.ctypes.data, lens.ctypes.data, n,
        out.ctypes.data, got, status.ctypes.data, num_threads())
    if bad:
        # Junk rows that survived the scan's cheap checks: drop them.
        keep = status == 0
        ts, idx, out = ts[keep], idx[keep], out[keep]
    return ts, idx, out


def raw_to_iq_f32(raw: np.ndarray) -> np.ndarray:
    """uint8 [..., 2N] -> complex64 [..., N] via the native LUT."""
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    out = np.empty(raw.shape, dtype=np.float32)
    _lib.ttpu_raw_to_iq(raw.ctypes.data, out.ctypes.data, raw.size,
                        num_threads())
    return out.view(np.complex64)


def unfold(stream: np.ndarray, block_bytes: int, history_bytes: int,
           num_blocks: int, fill: int = 128,
           out: np.ndarray = None) -> np.ndarray:
    """Overlap-save unfold of a raw byte stream into blocks.

    ``out`` (optional): preallocated [num_blocks, block_bytes] uint8
    C-contiguous destination.  Reusing warm buffers matters on hosts
    where first-touch page faults bound fresh-allocation bandwidth
    (measured ~200 MB/s faulting vs ~13 GB/s warm here).
    """
    stream = np.ascontiguousarray(stream, dtype=np.uint8)
    if not 0 <= history_bytes < block_bytes:
        raise ValueError("history_bytes must be in [0, block_bytes)")
    if out is None:
        out = np.empty((num_blocks, block_bytes), dtype=np.uint8)
    else:
        if (out.dtype != np.uint8 or not out.flags.c_contiguous
                or out.shape != (num_blocks, block_bytes)):
            raise ValueError("out must be C-contiguous uint8 "
                             "[num_blocks, block_bytes]")
    _lib.ttpu_unfold(stream.ctypes.data, stream.size, out.ctypes.data,
                     block_bytes, history_bytes, num_blocks,
                     np.uint8(fill))
    return out


def copy_rows(src: np.ndarray, src_offset: int, out: np.ndarray,
              src_stride: int) -> None:
    """Parallel strided row gather: ``out[r] = src[src_offset +
    r*src_stride :][:row_bytes]`` for each row of ``out``.

    The mmap ingest hot copy: overlap-save rows straight from the page
    cache into the warm buffer pool, split across threads (one memcpy
    stream is bound by a single core's copy bandwidth).  Caller
    guarantees every row lies within ``src``.
    """
    if out.dtype != np.uint8 or not out.flags.c_contiguous:
        raise ValueError("out must be C-contiguous uint8")
    num_rows, row_bytes = out.shape
    if src_offset < 0 or src_offset + (num_rows - 1) * src_stride \
            + row_bytes > src.size:
        raise ValueError("row range exceeds source buffer")
    _lib.ttpu_copy_rows(src.ctypes.data + src_offset, out.ctypes.data,
                        row_bytes, src_stride, num_rows, num_threads())


class RingBuffer:
    """Blocking byte ring buffer with backpressure accounting."""

    def __init__(self, capacity: int):
        self.capacity = int(capacity)
        self._ring = _lib.ttpu_ring_new(capacity)

    def write(self, data: np.ndarray) -> int:
        data = np.ascontiguousarray(data, dtype=np.uint8)
        return _lib.ttpu_ring_write(self._ring, data.ctypes.data, data.size)

    def write_view(self, max_len: int):
        """Reserve a contiguous writable span INSIDE ring memory.

        Returns a writable memoryview (or None once closed) for the
        producer to ``stream.readinto()`` directly -- one copy from
        the kernel into the ring instead of kernel -> scratch bytes ->
        ring.  Call :meth:`commit` with the bytes actually filled
        before the next ``write_view``.  Single producer only; blocks
        while the ring is full (counted as an overflow stall).
        """
        off = ctypes.c_int64(0)
        n = _lib.ttpu_ring_write_reserve(self._ring, max_len,
                                         ctypes.byref(off))
        if n == 0:
            return None
        base = _lib.ttpu_ring_base(self._ring)
        buf = (ctypes.c_ubyte * n).from_address(base + off.value)
        # The view must keep the RingBuffer (and thus the C buffer)
        # alive: from_address carries no ownership, so without this a
        # ring GC'd while a view is outstanding would leave the view
        # pointing into freed heap memory.
        buf._owner = self
        # ctypes views carry format '<B'; cast to plain 'B' so slice
        # assignment and readinto() accept it.
        return memoryview(buf).cast("B")

    def commit(self, n: int) -> None:
        _lib.ttpu_ring_write_commit(self._ring, n)

    def read(self, n: int, out: np.ndarray = None) -> np.ndarray:
        """Read up to ``n`` bytes (blocking until data or close).

        ``out`` (optional): reusable uint8 destination of size >= n;
        the returned array is a view into it (valid until the next
        read into the same buffer).
        """
        if out is None or out.size < n:
            out = np.empty(n, dtype=np.uint8)
        got = _lib.ttpu_ring_read(self._ring, out.ctypes.data, n)
        return out[:got]

    def read_unfold(self, out: np.ndarray, history_bytes: int,
                    threads: int = None):
        """Fused read + overlap-save unfold straight from ring memory.

        ``out``: C-contiguous uint8 [max_blocks, block_bytes].  Blocks
        until ``max_blocks`` full blocks are available or the ring is
        closed.  Row 0's history region is left untouched (splice the
        previous batch's tail over it); rows 1+ carry their history
        from the stream, so ``history_bytes`` must be <= the per-block
        advance.  Returns (n_blocks, bytes_read); bytes_read < the
        full request signals end-of-stream.
        """
        if (out.dtype != np.uint8 or not out.flags.c_contiguous
                or out.ndim != 2):
            raise ValueError("out must be C-contiguous uint8 2-D")
        block_bytes = out.shape[1]
        if history_bytes > block_bytes - history_bytes:
            raise ValueError("read_unfold requires history <= advance")
        if out.shape[0] * (block_bytes - history_bytes) > self.capacity:
            raise ValueError("read_unfold batch exceeds ring capacity")
        if threads is None:
            # Single-threaded by default: unlike the mmap path's bulk
            # row gather, each ring read copies only one batch (~5 MB)
            # and runs against a live producer -- measured on the
            # 4-core dev host, 3 copy threads LOWERED throughput
            # (0.61e9 vs 1.13e9 samples/s median, interleaved A/B;
            # spawn overhead + producer contention).  The knob exists
            # for many-core deployment hosts.
            threads = 1
        got = ctypes.c_int64(0)
        blocks = _lib.ttpu_ring_read_unfold(
            self._ring, out.ctypes.data, block_bytes, history_bytes,
            out.shape[0], ctypes.byref(got), threads)
        return int(blocks), int(got.value)

    def close(self):
        _lib.ttpu_ring_close(self._ring)

    @property
    def overflows(self) -> int:
        return int(_lib.ttpu_ring_overflows(self._ring))

    def histogram(self) -> np.ndarray:
        out = np.zeros(8, dtype=np.uint64)
        _lib.ttpu_ring_histogram(self._ring, out.ctypes.data)
        return out

    def __del__(self):
        try:
            _lib.ttpu_ring_free(self._ring)
        except Exception:  # noqa: BLE001 -- interpreter teardown
            pass
