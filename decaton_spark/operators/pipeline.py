"""T13 — processor chaining.

Reference: ``ProcessorsBuilder.thenProcess`` assembles an ordered
processor list; ``context.push`` walks it
(``processor/.../runtime/ProcessorsBuilder.java:110-141``,
``ProcessingContextImpl.java:104-170``).

Spark-first form: a pipeline is a composition of DataFrame
transformations — Catalyst fuses the whole chain into one plan, so
chaining is free (no per-stage materialization).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


class Pipeline:
    """Ordered composition of ``DataFrame -> DataFrame`` stages."""

    def __init__(self) -> None:
        self._stages: list[tuple[str, Callable[[DataFrame], DataFrame]]] = []

    def then_process(self, fn: Callable[[DataFrame], DataFrame], name: str | None = None) -> "Pipeline":
        self._stages.append((name or fn.__name__, fn))
        return self

    def apply(self, df: DataFrame) -> DataFrame:
        for _, fn in self._stages:
            df = df.transform(fn)
        return df

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.apply(df)

    @property
    def stage_names(self) -> list[str]:
        return [n for n, _ in self._stages]
