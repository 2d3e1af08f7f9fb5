"""S5 checkpoint / lineage manifest (SURVEY.md §2.1 S5, §4 checkpoint row).

Ray Data has no built-in resumable sink, so resumability is explicit
(BASELINE.json north_rule: "resumable from checkpoint with per-partition
lineage + metrics"):

- the resume unit is the output partition ``part = hash(conv_id) % n_parts``
  (stable across reruns — a conversation always lands in the same part);
- each committed part has one JSON manifest entry
  ``{part, rows, checksum, extractor_version, n_parts, salt_chunk, input}``
  written via write-to-temp + ``os.replace`` (atomic on POSIX) only AFTER
  the part's parquet directory has been moved into the final output root;
- on restart, committed parts are filtered out before extraction, so a
  rerun re-does only the missing parts; re-moving an orphaned part dir
  (crash between move and manifest write) replaces it with identical
  deterministic content (D1 keeps the operation idempotent).
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass


@dataclass
class PartMeta:
    part: int
    rows: int
    checksum: int
    extractor_version: str
    n_parts: int
    salt_chunk: int
    input: str


class Manifest:
    def __init__(self, manifest_dir: str) -> None:
        self.dir = manifest_dir
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, part: int) -> str:
        return os.path.join(self.dir, f"part-{part:05d}.json")

    def committed_parts(self) -> set[int]:
        out = set()
        for name in os.listdir(self.dir):
            if name.startswith("part-") and name.endswith(".json"):
                out.add(int(name[5:-5]))
        return out

    def read(self, part: int) -> PartMeta:
        with open(self._path(part)) as f:
            return PartMeta(**json.load(f))

    def commit(self, meta: PartMeta) -> None:
        tmp = self._path(meta.part) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta.__dict__, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._path(meta.part))


def promote_part(staging_root: str, final_root: str, part: int) -> str:
    """Atomically move staging/part=k -> final/part=k (replace if an
    orphan from a crashed run exists). Returns the final part dir."""
    src = os.path.join(staging_root, f"part={part}")
    dst = os.path.join(final_root, f"part={part}")
    os.makedirs(final_root, exist_ok=True)
    if os.path.exists(dst):
        shutil.rmtree(dst)
    os.replace(src, dst)
    return dst
