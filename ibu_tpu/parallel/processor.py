"""Processor protocols for the parallel engines.

The reference's extension point is ``ParallelProcessor`` with a per-record
callback (``/root/reference/src/parallel.rs:100-189``). A per-record Python
callback cannot be the hot path on any hardware, so this framework defines a
**batch-first** protocol as the primary interface and keeps the per-record
protocol for parity:

* :class:`ParallelProcessor` — reference-parity: ``process_record`` +
  ``on_batch_complete`` + ``set_tid``/``get_tid`` defaults
  (``parallel.rs:117,162-189``). Used by the host-thread engine.
* :class:`BatchProcessor` — TPU-first: ``process_batch(records)`` receives a
  numpy structured-array view of up to ``BATCH_SIZE`` records. The host
  engine hands batches to it directly; the device engine converts batches to
  device columns and runs a jitted update. A ``BatchProcessor`` that defines
  jax-traceable ``init_state`` / ``update_state`` / ``reduce_spec`` can be
  lowered onto a device mesh (see :mod:`ibu_tpu.parallel.device`), where
  ``on_batch_complete``'s shared-memory merge becomes a ``psum`` collective.
"""

from __future__ import annotations

from ibu_tpu.constructs.record import Record


class ParallelProcessor:
    """Reference-parity per-record processor (ref ``parallel.rs:100-189``).

    Subclasses must be cheaply copyable via :meth:`clone` (default: a shallow
    ``copy``), mirroring the reference's ``Send + Clone`` bound. Thread-local
    accumulation happens in ``process_record``; merging into shared state
    happens in ``on_batch_complete``.
    """

    def process_record(self, record: Record) -> None:
        raise NotImplementedError

    def on_batch_complete(self) -> None:
        """Called after each batch; merge thread-local state into shared state
        here (ref ``parallel.rs:162-164``). Default: no-op."""

    def set_tid(self, tid: int) -> None:
        """Default no-op, like the reference (``parallel.rs:179-183``)."""
        self._tid = tid

    def get_tid(self) -> int | None:
        return getattr(self, "_tid", None)

    def clone(self) -> "ParallelProcessor":
        """Deep copy by default — the analogue of Rust's derived ``Clone``,
        where owned fields (thread-local accumulators) are duplicated.

        Override when the processor holds intentionally-shared state (the
        reference's ``Arc<Mutex<…>>`` pattern): copy the thread-local parts
        and carry the shared references over. A shallow copy would silently
        share accumulators between workers and race.
        """
        import copy

        return copy.deepcopy(self)


class BatchProcessor:
    """Batch-first processor: the framework's primary extension point.

    ``process_batch`` receives a numpy structured array (zero-copy view of
    the mmap) of up to ``BATCH_SIZE`` records. Implementations should do
    vectorized numpy / jax work — this releases the GIL and keeps the hot
    loop out of Python. ``on_batch_complete`` retains the reference's merge
    semantics.
    """

    def process_batch(self, records) -> None:
        raise NotImplementedError

    def on_batch_complete(self) -> None:
        """Merge point after each batch. Default: no-op."""

    def set_tid(self, tid: int) -> None:
        self._tid = tid

    def get_tid(self) -> int | None:
        return getattr(self, "_tid", None)

    def clone(self) -> "BatchProcessor":
        """Deep copy by default; override to share global state (see
        :meth:`ParallelProcessor.clone`)."""
        import copy

        return copy.deepcopy(self)
