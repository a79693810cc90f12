r"""
Tracing and profiling
=====================

Observability helpers (SURVEY.md section 5.1).  The reference's only
profiler-like facility is the PME auto-tuner's benchmark-grid pattern
(``/root/reference/src/mdhelper/openmm/utility.py:59-317``); here that
pattern generalizes to device-kernel autotuning, plus thin wrappers
over ``jax.profiler`` for trace capture and a stage timer for the
streaming pipeline.
"""

import contextlib
import logging
import time
from typing import Callable, Iterable

import jax

__all__ = ["Timer", "trace", "benchmark_grid"]


class Timer:
    """Accumulating wall-clock timer for named pipeline stages.

    Usage::

        timer = Timer()
        with timer("read"):
            ...
        with timer("update"):
            ...
        print(timer.report())
    """

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, stage: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            self.totals[stage] = self.totals.get(stage, 0.0) + elapsed
            self.counts[stage] = self.counts.get(stage, 0) + 1

    def report(self) -> str:
        lines = [
            f"  {stage:<24} {self.totals[stage]:10.4f} s "
            f"({self.counts[stage]:>6} calls)"
            for stage in sorted(
                self.totals, key=self.totals.get, reverse=True
            )
        ]
        return "pipeline stage timings:\n" + "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str, *, host_profile: bool = False):
    """Capture a ``jax.profiler`` trace (viewable in XProf/TensorBoard)
    around a block of analysis work."""

    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logging.info(f"Wrote device trace to {log_dir}.")


def benchmark_grid(
    build: Callable[..., Callable],
    configs: Iterable[dict],
    *args,
    warmup: int = 1,
    repeats: int = 3,
) -> tuple[dict, list[tuple[float, dict]]]:
    """Benchmark a grid of kernel configurations and pick the fastest —
    the PME-tuner pattern applied to (e.g.) Pallas tile sizes.

    Parameters
    ----------
    build : callable
        ``build(**config)`` returns a jitted callable to time.
    configs : iterable of `dict`
        Configurations to sweep.
    *args
        Arguments passed to each built callable.
    warmup, repeats : `int`
        Warmup runs (compile) and timed repeats (median taken).

    Returns
    -------
    best : `dict`
        The fastest configuration.
    ranking : `list`
        ``(median_seconds, config)`` pairs, fastest first.
    """

    ranking = []
    for config in configs:
        fn = build(**config)
        try:
            for _ in range(warmup):
                jax.block_until_ready(fn(*args))
            times = []
            for _ in range(repeats):
                start = time.perf_counter()
                jax.block_until_ready(fn(*args))
                times.append(time.perf_counter() - start)
            times.sort()
            ranking.append((times[len(times) // 2], dict(config)))
        except Exception as exc:  # config may be infeasible (VMEM, ...)
            logging.debug(f"config {config} failed: {exc}")
    if not ranking:
        raise RuntimeError("No benchmark configuration succeeded.")
    ranking.sort(key=lambda pair: pair[0])
    return ranking[0][1], ranking
