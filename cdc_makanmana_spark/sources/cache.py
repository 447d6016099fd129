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
    """Parquet snapshot + ``_cache_meta.json`` sidecar (count,
    last_update epoch-seconds, data_version)."""

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

    def is_fresh(self, now_s: float | None = None) -> bool:
        """Version match AND age < TTL (dataManager.ts:32-51). ``now_s``
        injectable for deterministic tests."""
        meta = self._read_meta()
        if meta is None or meta.get("data_version") != self.data_version:
            return False
        age_h = ((now_s or time.time()) - meta["last_update_s"]) / 3600.0
        return age_h < self.ttl_hours

    def save(self, df: DataFrame, now_s: float | None = None) -> int:
        """Write snapshot + watermark metadata (S5). Returns row count
        (counted once, reused for the stats surface)."""
        df.write.mode("overwrite").parquet(self.path)
        n = self.spark.read.parquet(self.path).count()
        fs.write_text(
            self.spark,
            self._meta_path,
            json.dumps(
                {
                    "count": n,
                    "last_update_s": now_s or time.time(),
                    "data_version": self.data_version,
                }
            ),
        )
        return n

    def load(self) -> DataFrame:
        """Read the cached snapshot (S4); raises if absent."""
        return self.spark.read.parquet(self.path)

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
