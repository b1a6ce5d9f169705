"""Row-accounting counters with the reference's invariant.

The reference tracks per-buffer stats {Buffered, Pending, Committed, Failed}
with the invariant Accepted == Failed + Committed + Buffered
(/root/reference/row/row.go:45-104, etl/etl.go:23-35). Here the engine's
batching is Ray Data's job, so "buffered" only exists transiently inside a
commit; the durable invariant recorded in the manifest lineage is
events_in == valid + quarantined and valid == rows_written(+dedup_collapsed).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class RowStats:
    accepted: int = 0
    committed: int = 0
    failed: int = 0
    buffered: int = 0

    def accept(self, n: int) -> None:
        self.accepted += n
        self.buffered += n

    def commit(self, n: int) -> None:
        self.committed += n
        self.buffered -= n

    def fail(self, n: int) -> None:
        self.failed += n
        self.buffered -= n

    def check_invariant(self) -> bool:
        return self.accepted == self.failed + self.committed + self.buffered


@dataclass
class CommitStats:
    """Per-commit lineage, aggregated from per-shard apply results and
    persisted in the manifest ("per-partition rows/sec and lineage metrics",
    BASELINE.json north_star)."""

    commit_id: str = ""
    segments: list = field(default_factory=list)
    events_in: int = 0
    valid: int = 0
    quarantined: int = 0
    rows_written: int = 0
    deletes: int = 0
    wall_sec: float = 0.0
    per_partition: dict = field(default_factory=dict)  # part -> {rows, sec, rows_per_sec}

    def to_json(self) -> dict:
        return {
            "commit_id": self.commit_id,
            "segments": self.segments,
            "events_in": self.events_in,
            "valid": self.valid,
            "quarantined": self.quarantined,
            "rows_written": self.rows_written,
            "deletes": self.deletes,
            "wall_sec": round(self.wall_sec, 3),
            "events_per_sec": round(self.events_in / self.wall_sec, 1)
            if self.wall_sec > 0
            else None,
            "per_partition": self.per_partition,
        }
