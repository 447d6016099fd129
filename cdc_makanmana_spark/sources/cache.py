"""Versioned snapshot cache with TTL (SURVEY.md S4-S6, S12, T1/T6).

Parity target: the reference's localStorage cache — a serialized table
plus ``lastUpdate`` and ``dataVersion`` watermark keys, valid when the
version matches AND age < 24 h (reference:
src/services/dataManager.ts:26-77 ``hasValidCachedData`` /
``saveMerchantsToCache`` / ``loadCachedMerchants``; stats & teardown
:248-276). The engine's version is a parquet table + JSON metadata
sidecar; the stale-while-revalidate flow (App.tsx:102-143) becomes
``load_or_refresh``.

All filesystem bookkeeping (meta sidecar, teardown) goes through the
Hadoop FileSystem API (`cdc_makanmana_spark.fs`), so ``path`` may be a
local dir, ``hdfs://`` or ``s3a://`` URI alike.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession

from cdc_makanmana_spark import fs


class SnapshotCache:
    """Versioned parquet snapshots + ``_cache_meta.json`` sidecar
    (count, last_update epoch-seconds, data_version, version).

    Commit protocol (see ``fs.mark_committed``): each ``save`` writes
    ``{path}/_staging_v{n}``, renames to ``{path}/v{n}``, stamps
    ``v{n}/_COMMITTED`` LAST, then updates the sidecar. Readers require
    the marker, so a crash anywhere mid-save leaves the previous
    committed snapshot live — the round-1 in-place overwrite could tear
    the only copy. The old version is kept until the next save commits
    (reader isolation for lazy plans already handed out).

    Version dirs written BEFORE the marker protocol are invisible to
    these readers; migrate once with ``fs.adopt_unmarked_versions``."""

    def __init__(self, spark: SparkSession, path: str, data_version: str, ttl_hours: float = 24.0):
        self.spark = spark
        self.path = path.rstrip("/")
        self.data_version = data_version
        self.ttl_hours = ttl_hours

    @property
    def _meta_path(self) -> str:
        return f"{self.path}/_cache_meta.json"

    def _read_meta(self) -> dict | None:
        raw = fs.read_text(self.spark, self._meta_path)
        return json.loads(raw) if raw is not None else None

    def _version_numbers(self) -> list[int]:
        return [n for n, _ in fs.list_versions(self.spark, self.path)]

    def _current_path(self) -> str | None:
        """Newest committed snapshot dir (sidecar-preferred), or None."""
        meta = self._read_meta()
        preferred = (
            f"v{meta['version']}" if meta is not None and "version" in meta else None
        )
        return fs.newest_committed(self.spark, self.path, preferred)

    def is_fresh(self, now_s: float | None = None) -> bool:
        """Version match AND age < TTL (dataManager.ts:32-51) AND a
        committed snapshot actually resolvable — a sidecar that outlived
        its version dirs (legacy layout, manual cleanup) must report
        stale so ``load_or_refresh`` falls through to refresh instead of
        crash-looping in ``load``. ``now_s`` injectable for tests."""
        meta = self._read_meta()
        if meta is None or meta.get("data_version") != self.data_version:
            return False
        age_h = ((now_s or time.time()) - meta["last_update_s"]) / 3600.0
        return age_h < self.ttl_hours and self._current_path() is not None

    def save(self, df: DataFrame, now_s: float | None = None) -> int:
        """Write snapshot + watermark metadata (S5). Returns row count
        (counted once, reused for the stats surface)."""
        version = max(self._version_numbers(), default=0) + 1
        staged = f"{self.path}/_staging_v{version}"
        final = f"{self.path}/v{version}"
        df.write.mode("overwrite").parquet(staged)
        if not fs.rename(self.spark, staged, final):
            raise IOError(
                f"snapshot commit rename failed: {staged} -> {final} "
                "(staged data left in place)"
            )
        fs.mark_committed(self.spark, final)
        n = self.spark.read.parquet(final).count()
        fs.write_text(
            self.spark,
            self._meta_path,
            json.dumps(
                {
                    "count": n,
                    "last_update_s": now_s or time.time(),
                    "data_version": self.data_version,
                    "version": version,
                }
            ),
        )
        # Keep one prior COMMITTED version (reader isolation for lazy
        # plans already handed out); sweep everything older than it,
        # committed or torn. Counting torn dirs toward the keep-window
        # would evict the real prior version while retaining garbage
        # (the verdict-cache vacuum's committed-only rule, mirrored).
        committed = [
            v
            for v in self._version_numbers()
            if fs.is_committed(self.spark, f"{self.path}/v{v}")
        ]
        floor_v = committed[-2] if len(committed) >= 2 else version
        for stale in self._version_numbers():
            if stale < floor_v or stale not in committed:
                fs.delete(self.spark, f"{self.path}/v{stale}", recursive=True)
        return n

    def load(self, version: int | None = None) -> DataFrame:
        """Read the cached snapshot (S4); raises if never committed.

        ``version`` time-travels to a specific committed snapshot
        (versions survive until pruned by subsequent saves — the same
        read-your-history lever a transaction-log table format sells).
        Raises ``FileNotFoundError`` for a missing or torn
        (uncommitted) version."""
        if version is not None:
            candidate = f"{self.path}/v{version}"
            if not fs.is_committed(self.spark, candidate):
                raise FileNotFoundError(
                    f"no committed snapshot v{version} under {self.path} "
                    f"(committed: {self.versions()})"
                )
            return self.spark.read.parquet(candidate)
        current = self._current_path()
        if current is None:
            raise FileNotFoundError(f"no committed snapshot under {self.path}")
        return self.spark.read.parquet(current)

    def versions(self) -> list[int]:
        """Committed snapshot versions available for time travel."""
        return [
            n
            for n in self._version_numbers()
            if fs.is_committed(self.spark, f"{self.path}/v{n}")
        ]

    def load_or_refresh(self, refresh, now_s: float | None = None) -> DataFrame:
        """Stale-while-revalidate entry (T6/EP2): serve the fresh
        snapshot, else run ``refresh()`` (the bronze→silver job), cache
        its output, and serve that."""
        if self.is_fresh(now_s):
            return self.load()
        df = refresh()
        self.save(df, now_s)
        return self.load()

    def info(self, now_s: float | None = None) -> dict:
        """Cache stats (S12 ``getCacheInfo``): count, age, version,
        freshness — from metadata, no table scan."""
        meta = self._read_meta()
        if meta is None:
            return {"exists": False}
        return {
            "exists": True,
            "count": meta["count"],
            "age_hours": ((now_s or time.time()) - meta["last_update_s"]) / 3600.0,
            "data_version": meta["data_version"],
            "fresh": self.is_fresh(now_s),
        }

    def clear(self) -> None:
        """Teardown (S12 ``clearCache``)."""
        fs.delete(self.spark, self.path, recursive=True)
