"""Transparent compression for IBU streams.

Read side is the equivalent of the reference's niffler integration
(``/root/reference/src/io/reader.rs:348-357,392-401``): the first bytes of the
stream are sniffed for compression magic and the stream is transparently
wrapped. Supported formats match the reference README (gzip + zstd,
``README.md:152-159``).

Write side is an additive capability: the reference writer is plain-file-only
(``writer.rs:556-559`` always opens an uncompressed ``File``), but since the
readers sniff magic bytes anyway, compressed output roundtrips for free.
:func:`wrap_compress` / :func:`open_compressed` provide gzip/zstd encoders,
and :meth:`ibu_tpu.io.writer.Writer.from_path` exposes them via its
``compression`` argument (default stays plain for parity).

Host-side by design: (de)compression is inherently serial byte-stream work
that belongs on the CPU before records are batched to the device.
"""

from __future__ import annotations

import gzip
import io
import zlib
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

#: exception types a torn/corrupt compressed stream raises from ``read()``:
#: gzip raises ``EOFError`` (truncated member), ``zlib.error`` (corrupt
#: deflate data) or ``gzip.BadGzipFile`` (bad CRC/length trailer, bad
#: member header — an OSError subclass, so catch THIS tuple before any
#: ``except OSError``), zstd raises ``zstandard.ZstdError``. Consumers map
#: these to :class:`CompressionError` — the reference's ``Niffler``
#: variant (``/root/reference/src/error.rs:69-70``).
DECOMPRESSION_ERRORS: tuple[type[BaseException], ...] = (
    EOFError,
    zlib.error,
    gzip.BadGzipFile,
) + ((_zstd.ZstdError,) if _HAVE_ZSTD else ())


class _PeekableStream(io.RawIOBase):
    """Wraps a possibly non-seekable stream, replaying sniffed magic bytes."""

    def __init__(self, prefix: bytes, inner: BinaryIO):
        self._prefix = prefix
        self._inner = inner

    @property
    def name(self):
        """The wrapped stream's filesystem name, when it has one — lets
        :meth:`ibu_tpu.io.reader.Reader.clone` identify plain disk files
        beneath the sniffing wrapper."""
        return getattr(self._inner, "name", None)

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
    """Classify a stream prefix: ``"gzip"``, ``"zstd"``, or ``None`` (plain).

    >>> sniff_compression(GZIP_MAGIC + b"\\x08\\x00")
    'gzip'
    >>> sniff_compression(ZSTD_MAGIC)
    'zstd'
    >>> sniff_compression(b"IBU!") is None
    True
    """
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

    @property
    def name(self):
        """The underlying stream's filesystem name, when it has one —
        lets :meth:`ibu_tpu.io.reader.Reader.clone` re-open path-backed
        decompression chains (matching the reference's universal
        ``derive(Clone)`` on ``Reader<R: Clone>``, ``reader.rs:90``)."""
        for s in self._also_close:
            n = getattr(s, "name", None)
            if n is not None:
                return n
        return getattr(self._stream, "name", None)

    def read(self, n: int = -1) -> bytes:
        return self._stream.read(n)

    def write(self, data) -> int:
        # Encoders consume the full input per call but disagree on the
        # return value: zstandard < 0.23 returns COMPRESSED bytes flushed
        # (0 when buffered — would spin Writer._write_all forever),
        # >= 0.23 returns bytes read. Report full consumption ourselves.
        self._stream.write(data)
        return len(data)

    def flush(self) -> None:
        flush = getattr(self._stream, "flush", None)
        if flush is not None:
            flush()

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


class _ZstdFrameReader:
    """zstd decoder that DETECTS truncation.

    ``ZstdDecompressor.stream_reader`` reports a clean EOF when the
    underlying stream tears mid-frame (decode stops at the last whole
    block), silently truncating the record stream — a torn archive whose
    tear lands on a 24-byte boundary would pass every validity check.
    Decoding through ``decompressobj`` tracks frame completion (``.eof``),
    so input ending mid-frame raises ``ZstdError`` instead of masquerading
    as end-of-data. Handles multi-frame streams (frames restart via
    ``unused_data``) and verifies content checksums when frames carry them
    (ours do — see :func:`wrap_compress`).
    """

    #: input slice fed per decompress call. A call's output is bounded by
    #: (slice / ~5 B per RLE block) × 128 KB max block size, so slice size
    #: bounds the worst-case transient on highly compressible data (e.g.
    #: all-zero records): 16 KB ⇒ ≤ ~400 MB once, after which the burst
    #: detector drops to 1 KB slices (≤ ~26 MB) permanently. 16 KB keeps
    #: ~96% of the decompressor's peak throughput on normal packed-record
    #: payloads (measured; 1 KB costs 3.6×).
    _SLICE = 1 << 14
    _SLICE_SMALL = 1 << 10
    _BURST_LIMIT = 4 << 20

    def __init__(self, inner: BinaryIO):
        import collections

        self._inner = inner
        self._dctx = _zstd.ZstdDecompressor()
        self._obj = self._dctx.decompressobj()
        self._mid_frame = False  # bytes fed into the current frame?
        self._parts = collections.deque()
        self._avail = 0
        self._pending = b""  # compressed bytes read but not yet fed
        self._raw_eof = False
        self._slice = self._SLICE

    def _fill(self, want: int) -> None:
        while self._avail < want:
            if not self._pending:
                self._pending = self._inner.read(1 << 18) or b""
                if not self._pending:
                    if self._raw_eof:
                        return
                    self._raw_eof = True
                    if self._mid_frame and not self._obj.eof:
                        raise _zstd.ZstdError(
                            "zstd stream truncated: input ended mid-frame"
                        )
                    return
            data, self._pending = (
                self._pending[: self._slice],
                self._pending[self._slice :],
            )
            while data:
                out = self._obj.decompress(data)
                if out:
                    self._parts.append(out)
                    self._avail += len(out)
                    if len(out) > self._BURST_LIMIT:
                        # highly compressible stream: shrink input slices
                        # so one call can't materialize GBs (zero-bombs)
                        self._slice = self._SLICE_SMALL
                self._mid_frame = True
                if self._obj.eof:
                    data = self._obj.unused_data
                    self._obj = self._dctx.decompressobj()
                    self._mid_frame = False
                else:
                    data = b""

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            out = []
            while True:
                self._fill(1 << 20)
                if not self._parts:
                    return b"".join(out)
                out.extend(self._parts)
                self._parts.clear()
                self._avail = 0
        self._fill(n)
        # assemble exactly n bytes from the deque — no whole-tail re-join
        out = []
        need = n
        while need and self._parts:
            part = self._parts.popleft()
            if len(part) <= need:
                out.append(part)
                need -= len(part)
            else:
                out.append(part[:need])
                self._parts.appendleft(part[need:])
                need = 0
        got = b"".join(out)
        self._avail -= len(got)
        return got

    def close(self) -> None:
        self._inner.close()


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
        zr = _ZstdFrameReader(replayed)
        return _ChainClosing(zr, replayed)  # type: ignore[return-value]
    raise CompressionError(f"unknown compression kind {kind!r}")


def as_buffered(stream) -> io.BufferedReader:
    """Ensure ``stream`` supports buffered line iteration.

    Plain streams from :func:`open_decompressed` already are
    :class:`io.BufferedReader`; bare ``read()``-only objects (e.g.
    :class:`_ChainClosing` decompression chains) sit under an empty-prefix
    :class:`_PeekableStream`, which adapts them to the raw-IO interface
    with the same close-the-whole-chain semantics. Closing the result
    closes the full chain either way.
    """
    if isinstance(stream, io.BufferedReader):
        return stream
    return io.BufferedReader(
        _PeekableStream(b"", stream), buffer_size=1 << 20
    )


def open_decompressed(path: str) -> BinaryIO:
    """Open ``path`` for reading with transparent gzip/zstd decompression."""
    try:
        raw = open(path, "rb")
    except OSError as e:
        from ibu_tpu.errors import IbuIoError

        raise IbuIoError(e) from e
    return wrap_decompress(raw)


def reopen_decompressed_at(path: str, pos: int) -> BinaryIO:
    """Fresh decompression chain over ``path``, fast-forwarded to ``pos``
    DECOMPRESSED bytes.

    The clone primitive for path-backed compressed readers: compressed
    streams have no byte-position mapping to the file, so an independent
    read position costs re-decompressing the prefix — O(pos), documented
    on :meth:`ibu_tpu.io.reader.Reader.clone`. A stream that ends before
    ``pos`` (the file changed underneath) raises :class:`CompressionError`.
    """
    s = open_decompressed(path)
    try:
        skipped = 0
        while skipped < pos:
            chunk = s.read(min(1 << 20, pos - skipped))
            if not chunk:
                raise CompressionError(
                    f"{path}: stream ended at {skipped} decompressed bytes "
                    f"while cloning a reader positioned at {pos} (file "
                    "changed since the original open?)"
                )
            skipped += len(chunk)
    except BaseException:
        s.close()
        raise
    return s


# -- write side (additive; the reference is read-side only) -----------------

#: file-extension → compression kind, used by ``compression="auto"``.
EXTENSION_KINDS = {".gz": "gzip", ".zst": "zstd", ".zstd": "zstd"}


def infer_compression(path: str) -> str | None:
    """Classify ``path`` by extension: ``"gzip"``, ``"zstd"``, or ``None``.

    >>> infer_compression("data.ibu.gz")
    'gzip'
    >>> infer_compression("data.IBU.ZST")
    'zstd'
    >>> infer_compression("data.ibu") is None
    True
    """
    lower = path.lower()
    for ext, kind in EXTENSION_KINDS.items():
        if lower.endswith(ext):
            return kind
    return None


def wrap_compress(
    stream: BinaryIO,
    kind: str,
    level: int | None = None,
    threads: int = -1,
) -> BinaryIO:
    """Wrap ``stream`` in a gzip or zstd encoder.

    Closing the returned writer finalizes the compressed frame and closes
    the full chain down to ``stream``. ``level`` is the codec's native
    compression level (gzip 0-9, zstd 1-22); ``None`` uses each codec's
    default. ``threads`` is the zstd worker-thread count (``-1`` = all
    cores, the default: frames stay standard and decode everywhere, and
    compression is the CPU bottleneck of a compressed write at GB/s
    targets — measured 2.6x even on a 2-core VM; gzip has no threaded
    mode and ignores it).
    """
    if kind == "gzip":
        # level 6 (zlib's default) rather than GzipFile's 9: records are
        # high-entropy packed words, so 9 costs ~3x CPU for ~0% extra ratio
        gz = gzip.GzipFile(
            fileobj=stream, mode="wb", compresslevel=6 if level is None else level
        )
        return _ChainClosing(gz, stream)  # type: ignore[return-value]
    if kind == "zstd":
        if not _HAVE_ZSTD:
            raise CompressionError(
                "zstd output requested but the 'zstandard' module is unavailable"
            )
        # content checksum (4 bytes/frame): lets readers detect bit-level
        # corruption inside a completed frame, matching gzip's CRC32
        cctx = _zstd.ZstdCompressor(
            level=3 if level is None else level,
            write_checksum=True,
            threads=threads,
        )
        zw = cctx.stream_writer(stream)
        return _ChainClosing(zw, stream)  # type: ignore[return-value]
    raise CompressionError(
        f"unknown compression kind {kind!r} (expected 'gzip' or 'zstd')"
    )


def open_compressed(
    path: str,
    compression: str | None = "auto",
    level: int | None = None,
    threads: int = -1,
) -> BinaryIO:
    """Open ``path`` for writing with optional gzip/zstd compression.

    ``compression`` is ``"gzip"``, ``"zstd"``, ``None`` (plain), or
    ``"auto"`` (default) which infers from the extension (``.gz``,
    ``.zst``/``.zstd``; anything else is plain). ``threads`` is the zstd
    worker count (see :func:`wrap_compress`).
    """
    if compression == "auto":
        compression = infer_compression(path)
    try:
        raw = open(path, "wb")
    except OSError as e:
        from ibu_tpu.errors import IbuIoError

        raise IbuIoError(e) from e
    if compression is None:
        return raw
    try:
        return wrap_compress(raw, compression, level, threads)
    except Exception:
        raw.close()
        raise
