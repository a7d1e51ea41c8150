"""Named parquet checkpoints with a cache policy — the Spark rendering of
the reference's Reservoir ``cache_set`` execution policy
(``data_storage.py:154-161``):

  * name ∉ cache_set      → pass the (lazy) DataFrame through untouched
  * cached & fingerprint fresh → read the parquet checkpoint
  * else                  → write checkpoint (zstd parquet), read it back

Cache invalidation is by explicit fingerprint (content hash / source mtime
composed by the caller) stored in a small manifest JSON next to the data —
Spark has no native mtime story (SURVEY §7 hard-point 7; reference
invalidates on source mtime at metadata.py:43-56).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_nc_manifest.json"


class CheckpointCache:
    def __init__(self, root: str | Path, cache_set: set[str] | None = None,
                 compression: str = "zstd"):
        self.root = Path(root)
        self.cache_set = set(cache_set or ())
        self.compression = compression
        self.root.mkdir(parents=True, exist_ok=True)

    def _dir(self, name: str) -> Path:
        return self.root / name

    def path_for(self, name: str) -> Path:
        """Public location of a named checkpoint (exists iff materialized)."""
        return self._dir(name)

    def is_cached(self, name: str, fingerprint: str | None = None) -> bool:
        d = self._dir(name)
        mf = d / MANIFEST
        if not mf.exists():
            return False
        meta = json.loads(mf.read_text())
        return fingerprint is None or meta.get("fingerprint") == fingerprint

    def materialize(self, spark: SparkSession, name: str, df: DataFrame,
                    fingerprint: str = "", partition_by: list[str] | None = None) -> DataFrame:
        """Apply the cache policy to one named transform."""
        if name not in self.cache_set:
            return df
        d = self._dir(name)
        if self.is_cached(name, fingerprint or None):
            return spark.read.parquet(str(d / "data"))
        if d.exists():  # stale / corrupt → rebuild (reference repairs likewise)
            shutil.rmtree(d)
        writer = df.write.mode("overwrite").option("compression", self.compression)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(str(d / "data"))
        (d / MANIFEST).write_text(
            json.dumps({"name": name, "fingerprint": fingerprint})
        )
        return spark.read.parquet(str(d / "data"))

    def cached_names(self) -> list[str]:
        return sorted(
            p.name for p in self.root.iterdir()
            if p.is_dir() and (p / MANIFEST).exists()
        )

    def invalidate(self, name: str) -> None:
        d = self._dir(name)
        if d.exists():
            shutil.rmtree(d)
