"""Profiling helpers.

The reference has only wall-clock meters (``avion/utils/meters.py``);
here we add structured tracing on top of the duty-cycle meters:

- ``trace(logdir)``: context manager around ``jax.profiler`` capturing
  a device trace viewable in TensorBoard / Perfetto.
- ``annotate(name)``: host-side named region (shows up in traces).
- ``step_timer`` lives in ``core/meters.py`` (data vs compute split).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str, *, create_perfetto_link: bool = False) -> Iterator[None]:
    import jax

    try:
        jax.profiler.start_trace(logdir,
                                 create_perfetto_link=create_perfetto_link)
        started = True
    except Exception as e:  # some backends lack profiler support
        print(f"[profiling] trace unavailable: {e}")
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    import jax

    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:
        yield


@contextlib.contextmanager
def wallclock(label: str, sink=print) -> Iterator[None]:
    t0 = time.perf_counter()
    yield
    sink(f"[{label}] {time.perf_counter() - t0:.3f}s")
