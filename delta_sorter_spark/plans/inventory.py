"""Partition inventory and rewrite planning (reference A5/C1/O4).

Folds the active Add actions into per-partition rewrite groups keyed by the
sorted ``(column, value)`` pairs — the reference's
``get_active_add_actions_by_partitions`` BTreeMap fold (lib.rs:258-296),
including the ``__nopart__`` key for unpartitioned tables (lib.rs:273-274).
Groups are scheduled largest-estimated-bytes first (lib.rs:313).

Pure metadata: at 100 TB this is O(#files) driver work on the log state, no
Spark job.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from delta_sorter_spark.sources.delta_log import AddAction

NO_PARTITION_KEY = "__nopart__"


@dataclass
class RewriteGroup:
    """One partition's worth of files to (maybe) rewrite
    (reference RewriteGroup, lib.rs:128-141)."""

    partition_key: str
    partition_values: dict[str, str | None]
    files: list[AddAction] = field(default_factory=list)

    @property
    def estimated_bytes(self) -> int:
        return sum(a.size for a in self.files)

    @property
    def num_rows(self) -> int:
        return sum((a.stats or {}).get("numRecords", 0) for a in self.files)


def partition_key_of(add: AddAction) -> str:
    if not add.partition_values:
        return NO_PARTITION_KEY
    parts = [
        f"{k}={'null' if v is None else v}" for k, v in sorted(add.partition_values.items())
    ]
    return "/".join(parts)


def group_by_partition(adds: list[AddAction]) -> list[RewriteGroup]:
    """Groups ordered largest-first (the reference's scheduling heuristic,
    lib.rs:313: sort by estimated_bytes desc)."""
    groups: dict[str, RewriteGroup] = {}
    for add in adds:
        key = partition_key_of(add)
        grp = groups.get(key)
        if grp is None:
            grp = groups[key] = RewriteGroup(
                partition_key=key, partition_values=dict(add.partition_values)
            )
        grp.files.append(add)
    return sorted(groups.values(), key=lambda g: g.estimated_bytes, reverse=True)
