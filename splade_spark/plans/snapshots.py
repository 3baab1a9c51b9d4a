"""Snapshot manifest + per-partition lineage for the resumable
index-build DAG (north rule).

On a real cluster this is an Iceberg catalog: every stage commit is
an Iceberg snapshot and resume = start from the last committed one
(SURVEY.md §1.6). Iceberg jars are not in the sandbox, so the same
contract is implemented as parquet directories plus an atomically
rewritten JSON manifest (write-temp + os.replace): a stage/key is
visible iff its manifest entry exists, so a killed job re-runs only
uncommitted keys. ``use_iceberg()`` flips to real Iceberg when the
runtime has it on the classpath.

The reference has no resume at all (force_new / full reload,
indexing/inverted_index.py:23-46); the lineage rows here are the
per-partition metrics the north rule requires.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field


def use_iceberg(spark) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: B018
        return True
    except Exception:
        return False


@dataclass
class Manifest:
    index_dir: str
    snapshots: list[dict] = field(default_factory=list)

    @property
    def path(self) -> str:
        return os.path.join(self.index_dir, "_manifest.json")

    @classmethod
    def load(cls, index_dir: str) -> "Manifest":
        m = cls(index_dir)
        if os.path.exists(m.path):
            with open(m.path) as f:
                m.snapshots = json.load(f)["snapshots"]
        return m

    def committed(self, stage: str) -> set[str]:
        return {s["key"] for s in self.snapshots if s["stage"] == stage}

    def commit(
        self,
        stage: str,
        key: str,
        rows: int = -1,
        bytes_: int = -1,
        wall_ms: int = -1,
        partition_id: int = -1,
    ) -> int:
        snapshot_id = len(self.snapshots) + 1
        self.snapshots.append(
            {
                "snapshot_id": snapshot_id,
                "stage": stage,
                "key": key,
                "partition_id": partition_id,
                "rows": rows,
                "bytes": bytes_,
                "wall_ms": wall_ms,
                "ts": time.time(),
            }
        )
        os.makedirs(self.index_dir, exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"snapshots": self.snapshots}, f, indent=1)
        os.replace(tmp, self.path)  # atomic commit
        return snapshot_id

    def lineage_rows(self) -> list[dict]:
        return list(self.snapshots)

    def retract(
        self, stage: str, reason: str = "", keys: set[str] | None = None
    ) -> int:
        """Remove a stage's commits (so its steps re-run on the next
        finalize) while RECORDING the retraction as its own lineage
        snapshot — the Iceberg analog is replacing the table's current
        snapshot pointer with a new one; history stays queryable.
        ``keys`` narrows the retraction to specific commit keys (e.g.
        one bmp layout variant) instead of the whole stage."""
        keep = [
            s
            for s in self.snapshots
            if s["stage"] != stage or (keys is not None and s["key"] not in keys)
        ]
        removed = len(self.snapshots) - len(keep)
        self.snapshots = keep
        return self.commit("retract", f"{stage}:{reason}", rows=removed)


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total
