"""Dynamic properties — Decaton's reloadable config plane.

Reference: 14 dynamic properties with change listeners
(``processor/.../runtime/ProcessorProperties.java:56-272``,
``Property.java:38-66``, ``DynamicProperty.java:31-115``), supplied
statically (``StaticPropertySupplier``) or from a watched file
(``centraldogma/.../CentralDogmaPropertySupplier.java:83-120``,
``docs/dynamic-property-configuration.adoc``).

Spark mapping: reloadable values are re-read per microbatch inside
``foreachBatch`` (see Subscription.config_supplier); structural ones
need a query restart — the same split the reference makes in
``PartitionContexts.maybeHandlePropertyReload`` (``:260-283``).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from typing import Any

# property-name → (default, reloadable) — mirrors ProcessorProperties
PROPERTY_DEFS: dict[str, tuple[Any, bool]] = {
    "decaton.ignore.keys": ([], True),
    "decaton.processing.rate.per.partition": (-1, True),
    "decaton.partition.concurrency": (1, False),  # → shuffle partitions
    "decaton.max.pending.records": (10_000, True),  # → maxOffsetsPerTrigger
    "decaton.commit.interval.ms": (1_000, True),  # subsumed by trigger
    "decaton.group.rebalance.timeout.ms": (1_000, True),  # n/a (checkpoint)
    "decaton.shutdown.timeout.ms": (0, True),
    "decaton.deferred.complete.timeout.ms": (-1, True),  # n/a (sync batches)
    "decaton.per.key.quota.processing.rate": (-1, False),
    "decaton.retry.task.in.legacy.format": (False, False),
    "decaton.task.metadata.as.header": (False, False),
    "decaton.logging.mdc.enabled": (True, True),
    "decaton.client.max.pending.records": (-1, True),
    "decaton.processor.threads.termination.timeout.ms": (-1, True),
}


class StaticPropertySupplier:
    """Fixed values (StaticPropertySupplier.java)."""

    def __init__(self, **props: Any) -> None:
        unknown = set(props) - set(PROPERTY_DEFS)
        if unknown:
            raise KeyError(f"unknown properties: {sorted(unknown)}")
        self._props = props

    def get(self, name: str) -> Any:
        return self._props.get(name, PROPERTY_DEFS[name][0])

    def defines(self, name: str) -> bool:
        return name in self._props

    def snapshot(self) -> dict[str, Any]:
        return {k: self.get(k) for k in PROPERTY_DEFS}


class FilePropertySupplier:
    """Watched-JSON-file supplier (the Central Dogma analog): values are
    re-read on every ``get`` — callers poll once per microbatch, so a
    file edit takes effect at the next trigger."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._mtime = 0.0
        self._cache: dict[str, Any] = {}

    def _load(self) -> None:
        try:
            mtime = os.stat(self.path).st_mtime
        except FileNotFoundError:
            self._cache = {}
            return
        if mtime != self._mtime:
            with open(self.path) as f:
                self._cache = json.load(f)
            self._mtime = mtime

    def get(self, name: str) -> Any:
        self._load()
        return self._cache.get(name, PROPERTY_DEFS[name][0])

    def defines(self, name: str) -> bool:
        self._load()
        return name in self._cache

    def snapshot(self) -> dict[str, Any]:
        self._load()
        return {k: self.get(k) for k in PROPERTY_DEFS}


def chain(*suppliers) -> Callable[[str], Any]:
    """First-supplier-wins lookup across several suppliers — mirrors
    SubscriptionBuilder.properties(supplier...) precedence
    (``ProcessorProperties.Builder.setBySupplier``): the first supplier
    that *defines* the property wins, even when it explicitly sets the
    default value — definedness, not value, decides precedence."""

    def get(name: str) -> Any:
        for s in suppliers:
            if s.defines(name):
                return s.get(name)
        return PROPERTY_DEFS[name][0]

    return get
