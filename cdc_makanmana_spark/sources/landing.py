"""Bronze landing job: snapshot acquisition through the retry/fallback
chain, committed to a versioned bronze directory (SURVEY.md S1-S3, S10).

Parity targets: the reference's snapshot acquisition —
``fetchCDCMerchants`` (gzip JSON endpoint, 3 retries, exponential
backoff, src/data/merchants.ts:41-85) behind the ordered proxy-route
chain with an empty-result sentinel after the last route
(src/utils/proxyUtils.ts:3-76) — and the versioned cache commit it
lands into (src/services/dataManager.ts:26-77).

Spark-first shape: a "route" is any zero-arg callable producing a
DataFrame. In production that's a reader over an ``https://`` landing
endpoint or a gateway-mounted object-store prefix; in this offline
sandbox the tests drive the identical policy with ``file:`` fixtures —
a missing path raises exactly like a dead endpoint, an empty file
replays the reference's empty-API-response miss. The policy layer is
what's under test; the transport is a URI scheme.

Commit protocol (object-store-safe, all metadata ops through
``cdc_makanmana_spark.fs``):

1. write the annotated snapshot to ``{bronze}/_staging_v{n}``, where
   n = max(existing ``v*`` directories, sidecar version) + 1 — derived
   from BOTH so a crash that leaves v{n} on disk with a stale sidecar
   can never cause version reuse;
2. rename to ``{bronze}/v{n}`` (atomic on HDFS; a copy on raw S3 —
   which is why readers never trust the directory alone);
3. write ``v{n}/_COMMITTED`` — the marker is the LAST data-side step,
   so a torn copy from a crash mid-(2) is never marker-stamped;
4. write the ``_landing_meta.json`` sidecar pointing at v{n};
5. prune versions older than ``keep_versions`` (lineage/rollback
   window, like the reference's single-slot cache generalized to N).

Readers resolve through the sidecar but REQUIRE the commit marker; if
the sidecar dangles (crash between 3 and 4) they fall back to the
newest marker-stamped version — a crash at any step leaves the
previous committed snapshot live, never a half-landed one.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from cdc_makanmana_spark import fs


class LandingResult:
    """Outcome of one landing run (progress-callback friendly)."""

    __slots__ = ("version", "route", "count", "path", "degraded")

    def __init__(self, version: int, route: int, count: int, path: str, degraded: bool):
        self.version = version
        self.route = route  # index of the route that served, -1 if none
        self.count = count
        self.path = path
        self.degraded = degraded  # True when every route failed/empty

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return (
            f"LandingResult(version={self.version}, route={self.route}, "
            f"count={self.count}, degraded={self.degraded})"
        )


class LandingJob:
    """Acquire-through-fallback, then land bronze with lineage columns.

    ``routes``: ordered preference chain of zero-arg callables returning
    a DataFrame. A route "misses" when it raises OR returns zero rows
    (the reference treats an empty API response as a miss,
    App.tsx:108-125). Each route gets ``retries`` attempts with
    ``backoff_s`` sleeps between them (merchants.ts:66-71); when the
    whole chain misses, the job lands an EMPTY snapshot rather than
    failing — per-source degradation is the contract
    (halalService.ts:17-71, externalData.ts:534-537).
    """

    def __init__(
        self,
        spark: SparkSession,
        routes: Sequence[Callable[[], DataFrame]],
        schema: StructType,
        bronze_path: str,
        retries: int = 3,
        backoff_s: tuple[float, ...] = (2.0, 4.0, 8.0),
        keep_versions: int = 3,
        on_attempt: Callable[[int, int, Exception | None], None] | None = None,
    ):
        if not routes:
            raise ValueError("LandingJob needs at least one route")
        self.spark = spark
        self.routes = list(routes)
        self.schema = schema
        self.bronze_path = bronze_path.rstrip("/")
        self.retries = retries
        self.backoff_s = backoff_s
        self.keep_versions = keep_versions
        self.on_attempt = on_attempt  # (route_idx, attempt_idx, exc|None=empty)

    # ---- acquisition ------------------------------------------------------

    def acquire(self) -> tuple[DataFrame, int]:
        """Walk the route chain; returns (snapshot, route_idx) or an
        empty sentinel with route_idx=-1 after the last route."""
        for ri, route in enumerate(self.routes):
            for attempt in range(self.retries):
                try:
                    df = route()
                    if df.isEmpty():
                        # empty response = miss; no backoff needed, the
                        # route answered — move on (proxyUtils.ts:63-75)
                        if self.on_attempt:
                            self.on_attempt(ri, attempt, None)
                        break
                    return df, ri
                except Exception as e:  # noqa: BLE001 — degradation is the spec
                    if self.on_attempt:
                        self.on_attempt(ri, attempt, e)
                    if attempt < self.retries - 1:
                        time.sleep(self.backoff_s[min(attempt, len(self.backoff_s) - 1)])
        return self.spark.createDataFrame([], self.schema), -1

    # ---- landing ----------------------------------------------------------

    @property
    def _meta_path(self) -> str:
        return f"{self.bronze_path}/_landing_meta.json"

    def _read_meta(self) -> dict | None:
        raw = fs.read_text(self.spark, self._meta_path)
        return json.loads(raw) if raw is not None else None

    def _version_numbers(self) -> list[int]:
        return [n for n, _ in fs.list_versions(self.spark, self.bronze_path)]

    def _next_version(self) -> int:
        """max(existing v* dirs, sidecar version) + 1 — NOT sidecar+1
        alone: after a crash between the v{n} rename and the sidecar
        write, the sidecar still says n-1 while v{n} exists, and
        sidecar+1 would try to commit INTO the existing v{n} (raising
        forever on local fs, silently nesting on HDFS)."""
        meta = self._read_meta()
        highest = max(
            max(self._version_numbers(), default=0),
            meta["version"] if meta else 0,
        )
        return highest + 1

    def land(self, now_s: float | None = None) -> LandingResult:
        """One acquisition cycle → one committed bronze version."""
        df, route = self.acquire()
        now = now_s or time.time()
        version = self._next_version()

        staged = f"{self.bronze_path}/_staging_v{version}"
        final = f"{self.bronze_path}/v{version}"
        annotated = df.withColumn(
            "_landed_at", F.lit(now).cast("double")
        ).withColumn("_source_route", F.lit(route))
        annotated.write.mode("overwrite").parquet(staged)
        fs.mkdirs(self.spark, self.bronze_path)
        if not fs.rename(self.spark, staged, final):
            # Fail CLOSED but keep the staged data: deleting it on a
            # racy/transient rename failure would destroy the only copy
            # of the freshly-acquired snapshot.
            raise IOError(
                f"bronze commit rename failed: {staged} -> {final} "
                "(staged data left in place)"
            )
        fs.mark_committed(self.spark, final)
        count = self.spark.read.parquet(final).count()
        fs.write_text(
            self.spark,
            self._meta_path,
            json.dumps(
                {
                    "version": version,
                    "route": route,
                    "count": count,
                    "landed_at_s": now,
                }
            ),
        )
        self._prune(version)
        return LandingResult(version, route, count, final, degraded=route < 0)

    def _prune(self, current: int) -> None:
        floor = current - self.keep_versions
        for name in fs.list_names(self.spark, self.bronze_path, dirs_only=True):
            if name.startswith("v") and name[1:].isdigit() and int(name[1:]) <= floor:
                fs.delete(self.spark, f"{self.bronze_path}/{name}")

    def read_bronze(self) -> DataFrame | None:
        """Current committed snapshot: sidecar-resolved, but only a
        marker-stamped version counts — a torn v{n} from a crashed
        commit (or a sidecar written just before the crash on a store
        where rename is a copy) is skipped in favor of the newest
        version that carries ``_COMMITTED``. None if nothing has ever
        fully committed."""
        meta = self._read_meta()
        preferred = f"v{meta['version']}" if meta is not None else None
        current = fs.newest_committed(self.spark, self.bronze_path, preferred)
        return self.spark.read.parquet(current) if current else None
