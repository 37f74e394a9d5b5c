"""TTL result cache over ``DataFrame.persist`` — the reference's Redis cache
(K4: ``redis_client.set(key, df.to_json(), ex=3600)``,
``Frontend/app.py:126,214,264,303``) re-expressed engine-side.

Spark persistence has no TTL, so the wrapper tracks insertion time and
unpersists lazily on access/sweep. Keys are canonicalized the way the
reference canonicalizes filter dicts for its cache key
(``app.py:137-151``: numpy scalars → python, timestamps → 'YYYY-MM-DD').

Unlike the reference — which calls ``flushall()`` on *every* fetch
(``app.py:153-156``), defeating its own cache — invalidation here is scoped:
``invalidate(key)`` or TTL expiry only.
"""

from __future__ import annotations

import datetime as _dt
import json
import time
from typing import Any

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

DEFAULT_TTL = 3600.0  # reference: ex=3600


def canonical_key(*parts: Any, **filters: Any) -> str:
    """Stable string key from heterogeneous parts (reference app.py:137-151)."""

    def norm(v: Any):
        if hasattr(v, "item"):  # numpy scalar
            return v.item()
        if isinstance(v, (_dt.datetime, _dt.date)):
            return v.strftime("%Y-%m-%d")
        if isinstance(v, (list, tuple)):
            return [norm(x) for x in v]
        if isinstance(v, dict):
            return {k: norm(x) for k, x in sorted(v.items())}
        return v

    return json.dumps([norm(list(parts)), norm(filters)], sort_keys=True)


class TTLCache:
    def __init__(self, ttl: float = DEFAULT_TTL,
                 storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK):
        self.ttl = ttl
        self.storage_level = storage_level
        self._entries: dict[str, tuple[float, DataFrame]] = {}

    def get_or_compute(self, key: str, compute) -> DataFrame:
        self.sweep()
        hit = self._entries.get(key)
        if hit is not None:
            return hit[1]
        df = compute()
        df = df.persist(self.storage_level)
        self._entries[key] = (time.monotonic(), df)
        return df

    def invalidate(self, key: str) -> None:
        hit = self._entries.pop(key, None)
        if hit is not None:
            hit[1].unpersist()

    def sweep(self) -> None:
        now = time.monotonic()
        for key, (t0, df) in list(self._entries.items()):
            if now - t0 > self.ttl:
                df.unpersist()
                del self._entries[key]

    def clear(self) -> None:
        for key in list(self._entries):
            self.invalidate(key)
