"""Transparent decompression for IBU input streams.

Equivalent of the reference's niffler integration
(``/root/reference/src/io/reader.rs:348-357,392-401``): the first bytes of the
stream are sniffed for compression magic and the stream is transparently
wrapped. Supported formats match the reference README (gzip + zstd,
``README.md:152-159``); like the reference, compression is **read-side only**.

Host-side by design: decompression is inherently serial byte-stream work that
belongs on the CPU before records are batched to the device.
"""

from __future__ import annotations

import gzip
import io
from typing import BinaryIO

from ibu_tpu.errors import CompressionError

GZIP_MAGIC = b"\x1f\x8b"
ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"

try:  # optional, mirrors the reference's feature gate on niffler
    import zstandard as _zstd  # type: ignore

    _HAVE_ZSTD = True
except ImportError:  # pragma: no cover - depends on environment
    _zstd = None
    _HAVE_ZSTD = False


class _PeekableStream(io.RawIOBase):
    """Wraps a possibly non-seekable stream, replaying sniffed magic bytes."""

    def __init__(self, prefix: bytes, inner: BinaryIO):
        self._prefix = prefix
        self._inner = inner

    def readable(self) -> bool:
        return True

    def readinto(self, b) -> int:
        if self._prefix:
            n = min(len(b), len(self._prefix))
            b[:n] = self._prefix[:n]
            self._prefix = self._prefix[n:]
            return n
        data = self._inner.read(len(b))
        if not data:
            return 0
        b[: len(data)] = data
        return len(data)

    def close(self) -> None:
        try:
            self._inner.close()
        finally:
            super().close()


def sniff_compression(magic: bytes) -> str | None:
    """Classify a stream prefix: ``"gzip"``, ``"zstd"``, or ``None`` (plain)."""
    if magic[:2] == GZIP_MAGIC:
        return "gzip"
    if magic[:4] == ZSTD_MAGIC:
        return "zstd"
    return None


class _ChainClosing:
    """Delegate reads to a decompressor, but close the WHOLE stream chain.

    ``gzip.GzipFile.close()`` (and zstd's reader, depending on version)
    does not close the file object it wraps, which leaks the underlying
    file descriptor — one per compressed file opened, until the process
    hits its fd limit.
    """

    def __init__(self, stream, *also_close):
        self._stream = stream
        self._also_close = also_close

    def read(self, n: int = -1) -> bytes:
        return self._stream.read(n)

    def close(self) -> None:
        try:
            self._stream.close()
        finally:
            for s in self._also_close:
                try:
                    s.close()
                except Exception:
                    pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def wrap_decompress(stream: BinaryIO) -> BinaryIO:
    """Sniff ``stream``'s magic and return a transparently-decompressing reader.

    Works on non-seekable streams (stdin, pipes) by buffering the sniffed
    prefix. Plain streams are returned with the prefix replayed. Closing
    the returned reader closes the full chain down to ``stream``.
    """
    prefix = stream.read(4) or b""
    kind = sniff_compression(prefix)
    replayed: BinaryIO = io.BufferedReader(
        _PeekableStream(prefix, stream), buffer_size=1 << 20
    )
    if kind is None:
        return replayed
    if kind == "gzip":
        gz = gzip.GzipFile(fileobj=replayed, mode="rb")
        return _ChainClosing(gz, replayed)  # type: ignore[return-value]
    if kind == "zstd":
        if not _HAVE_ZSTD:
            raise CompressionError(
                "zstd-compressed input but the 'zstandard' module is unavailable"
            )
        zr = _zstd.ZstdDecompressor().stream_reader(replayed)
        return _ChainClosing(zr, replayed)  # type: ignore[return-value]
    raise CompressionError(f"unknown compression kind {kind!r}")


def open_decompressed(path: str) -> BinaryIO:
    """Open ``path`` for reading with transparent gzip/zstd decompression."""
    try:
        raw = open(path, "rb")
    except OSError as e:
        from ibu_tpu.errors import IbuIoError

        raise IbuIoError(e) from e
    return wrap_decompress(raw)
