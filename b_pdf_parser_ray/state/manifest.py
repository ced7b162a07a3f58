"""Per-partition lineage manifests → idempotent resume.

The north rule requires "resumable from checkpoint with per-partition
lineage + metrics".  For a batch pipeline this means (ray_guide.md
'Sources & sinks'): one output directory per input shard, written atomically
(temp + rename), plus a small manifest recording what was done; a restarted
job skips shards whose manifest says ``done``.

The reference has no resume at all (SURVEY.md §4 'Checkpoint / resume') —
rerun reprocesses everything; this module is the designed replacement.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Dict, List, Optional


class ManifestStore:
    """Tiny filesystem checkpoint store: one JSON manifest per partition.

    Swap the directory for an object-store prefix on a real cluster; the
    write is atomic via same-directory rename, so a partition is either
    fully recorded or absent — a partial write never reads as complete.
    """

    def __init__(self, root: str):
        self.root = os.path.join(root, "_manifests")
        os.makedirs(self.root, exist_ok=True)

    def _path(self, partition_id: str) -> str:
        safe = partition_id.replace("/", "_")
        return os.path.join(self.root, f"{safe}.json")

    def is_done(self, partition_id: str) -> bool:
        p = self._path(partition_id)
        if not os.path.exists(p):
            return False
        try:
            with open(p) as f:
                return json.load(f).get("status") == "done"
        except (json.JSONDecodeError, OSError):
            return False

    def record(
        self, partition_id: str, metrics: Dict[str, object], status: str = "done"
    ) -> None:
        """``status='failed'`` records the attempt (lineage + error) without
        marking the partition complete — ``is_done`` stays False, so a
        restarted job retries exactly the failed shards."""
        payload = {"partition_id": partition_id, "status": status, **metrics}
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(payload, f)
            os.replace(tmp, self._path(partition_id))
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    def load(self, partition_id: str) -> Optional[Dict[str, object]]:
        p = self._path(partition_id)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def all_manifests(self) -> List[Dict[str, object]]:
        out = []
        for name in sorted(os.listdir(self.root)):
            if name.endswith(".json"):
                with open(os.path.join(self.root, name)) as f:
                    out.append(json.load(f))
        return out
