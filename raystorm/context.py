"""Job-scoped output accumulator — the ``FlameContext.output`` analog.

The reference collects job output in a synchronized ``StringBuilder``
(``/root/reference/src/cis5550/flame/FlameContextImpl.java:11-25``):
``output(s)`` appends a line (newline-joined, nulls ignored), and the
submitter receives either the joined text or the literal
``"(job produced no output)"`` when the job never called it
(``FlameContext.java:16-22``).  Jobs use it for human-readable progress
and report lines (e.g. ``CrawlQualityAnalyzer.java:27-55``).

Ray-native shape: a zero-CPU actor holds the buffer so the driver *and*
any task/actor in the job can append — a ``JobOutput`` handle is
serializable (it carries only the actor handle) and may be captured by
``map_batches`` callables.  ``output()`` blocks until the buffer holds
the line, exactly like the reference's synchronized ``StringBuilder``
append: when a stage (or the whole job) finishes, every line it emitted
is already visible to ``lines()``/``value()``.  Appends from one caller
stay ordered; cross-worker interleaving is arrival order, matching the
synchronized StringBuilder's semantics under concurrency.

Never calls ``ray.init`` — the session is owned by the caller
(driver contract; see CLAUDE.md invariants).
"""

from __future__ import annotations

import ray

NO_OUTPUT = "(job produced no output)"


@ray.remote(num_cpus=0)
class _OutputBuffer:
    """The shared line buffer. num_cpus=0: never competes with stages."""

    def __init__(self):
        self._lines: list[str] = []

    def append(self, s) -> None:
        if s is not None:
            self._lines.append(str(s))

    def lines(self) -> list[str]:
        return list(self._lines)


class JobOutput:
    """Accumulates job output lines; readable once at job end.

    >>> out = JobOutput()
    >>> out.output("Total pages crawled: 42")
    >>> out.value()
    'Total pages crawled: 42'

    Pass the handle into a stage to emit from workers::

        out = JobOutput()
        def stage(batch, out=out):
            out.output(f"saw {batch.num_rows} rows")
            return batch
        ds.map_batches(stage, batch_format="pyarrow")
    """

    def __init__(self):
        self._buf = _OutputBuffer.remote()

    def output(self, s) -> None:
        """Append one line (``None`` is ignored).

        Blocks until the buffer actor applied the append — the
        reference's ``synchronized`` semantics — so output emitted by a
        completed stage is always visible to a subsequent ``value()``.
        """
        if s is not None:
            ray.get(self._buf.append.remote(s))

    def lines(self) -> list[str]:
        return ray.get(self._buf.lines.remote())

    def value(self) -> str:
        """Joined output, or the reference's no-output message."""
        lines = self.lines()
        return "\n".join(lines) if lines else NO_OUTPUT
