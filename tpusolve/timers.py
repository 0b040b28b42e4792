"""Named phase timers with cross-run CSV export.

Mirrors the reference's timer subsystem: an ordered list of
``(name, seconds)`` pairs appended at each lifecycle phase
(ref: src/HypreSystem.h:230, emit sites throughout src/HypreSystem.cpp),
a pretty-printed summary table (src/HypreSystem.cpp:880-889), and
accumulation of repeated test runs into a CSV profile
(src/HypreSystem.cpp:847-878 ``retrieve_timers``; writer src/main.cpp:195-216).

Timer *names* are kept identical to the reference so profiles are directly
comparable.  The reference fences each span with ``MPI_Barrier``; under SPMD
the analog is blocking on device results, so ``Timer`` calls
``jax.block_until_ready`` on an optional fence value.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax


class Timers:
    """Ordered collection of named wall-clock spans (duplicates allowed)."""

    def __init__(self) -> None:
        self.entries: list[tuple[str, float]] = []

    def add(self, name: str, seconds: float) -> None:
        self.entries.append((name, float(seconds)))

    @contextmanager
    def span(self, name: str):
        """Time a block.  Yields a fence: call it on device values so the
        span includes async device work (the SPMD analog of the reference's
        barrier-fenced ``std::chrono`` spans)."""
        start = time.perf_counter()
        try:
            yield _fence
        finally:
            self.add(name, time.perf_counter() - start)

    def total(self) -> float:
        return sum(t for _, t in self.entries)

    def summarize(self) -> str:
        """Rank-0-style summary table (ref: src/HypreSystem.cpp:880-889)."""
        lines = ["", "Timing summary:", f"    {'Description':40s} Time (s)"]
        lines.append("    " + "-" * 50)
        for name, secs in self.entries:
            lines.append(f"    {name:40s} {secs:10.6f}")
        lines.append("    " + "-" * 50)
        lines.append(f"    {'Total':40s} {self.total():10.6f}")
        return "\n".join(lines)

    def as_dict(self) -> dict[str, float]:
        """Accumulate duplicate names by summing, preserving first-seen order
        (matches ``retrieve_timers`` accumulation semantics)."""
        out: dict[str, float] = {}
        for name, secs in self.entries:
            out[name] = out.get(name, 0.0) + secs
        return out


def _fence(*values):
    for v in values:
        jax.block_until_ready(v)
    return values[0] if len(values) == 1 else values


class CsvProfile:
    """Cross-test CSV accumulation: one header row of timer names, one data
    row per test (ref: src/main.cpp:195-216)."""

    def __init__(self) -> None:
        self.names: list[str] = []
        self.rows: list[dict[str, float]] = []

    def append(self, timers: Timers) -> None:
        d = timers.as_dict()
        for name in d:
            if name not in self.names:
                self.names.append(name)
        self.rows.append(d)

    def write(self, path: str) -> None:
        with open(path, "w") as fh:
            fh.write(", ".join(self.names) + "\n")
            for row in self.rows:
                fh.write(", ".join(f"{row.get(n, 0.0):.6f}" for n in self.names) + "\n")
