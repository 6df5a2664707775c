"""Background maintenance policy: one call folding the table's three
maintenance verbs into a safe, idempotent pass.

The reference runs its cleanup inline with the load (consumed temp
objects deleted post-load, ``etl.py:202-213``); a 100 TB table instead
wants maintenance on a CADENCE, decoupled from ingest latency:

* **compaction** — pruned merges add files over time;
  :meth:`SnapshotTable.compact_files` already no-ops below its per-bucket
  threshold, so running it every pass costs one manifest read.
* **snapshot expiry** — bounded time travel: keep the last N versions
  (plus tags), delete orphans. Single-owner, like the other verbs.
* **tombstone vacuum** — rewrites only tombstone-bearing files (row-group
  stats pick them; a clean table is a no-op), but it is SEMANTICALLY
  destructive — a vacuumed tombstone can no longer veto a replay — so it
  is the only verb gated by more than a threshold: it runs when the
  policy can prove a safe LSN watermark and at most every
  ``vacuum_every`` passes.

Watermark derivation: when the table records ``_lsn`` zone maps
(``stats_cols=['_lsn']`` — cheap, the stats come off parquet footers the
writer already produces), the manifest's per-file max is the table's max
applied LSN, O(files) driver work and no scan. Tables without ``_lsn``
stats must pass an explicit watermark (the stream's committed offset) —
the policy never guesses.

THE WATERMARK CONTRACT: vacuum at watermark W asserts "no event with
``lsn <= W - slack`` can EVER arrive again" — including exact replayed
duplicates, because a vacuumed tombstone cannot veto a replayed
pre-delete update (the key re-inserts, silently wrong). Size
``vacuum_slack_lsn`` to the source's full lateness+replay bound; for a
feed that can replay arbitrarily old events (e.g. a reprocessed backlog),
disable vacuum and rely on retention-time policies instead.

Wiring: ``ChangelogTailer(maintenance=policy, maintenance_every=N)`` runs
the pass inside ``foreachBatch`` every N applied epochs — between
commits, so the single-owner constraint of expiry/compaction holds by
construction (the stream owns the table).
"""

from __future__ import annotations

from typing import Any

from data_hub_ejp_xml_pipeline_spark.table.snapshot_table import (
    LSN_COL,
    SnapshotTable,
)


class MaintenancePolicy:
    def __init__(
        self,
        table: SnapshotTable,
        max_files_per_bucket: int | None = None,
        keep_snapshots: int = 4,
        vacuum_slack_lsn: int | None = None,
        vacuum_every: int = 4,
        states: tuple = (),
    ):
        """``vacuum_slack_lsn``: the caller's max-lateness bound in LSN
        units (None disables vacuum entirely). ``vacuum_every``: run the
        (full-rewrite) vacuum only every this-many passes.

        ``states``: sidecar states attached to the same pipeline (SCD2 /
        IVM / secondary index / DLQ / dedup-on-ingest — anything with a
        ``maintained_tables() -> {name: SnapshotTable}``). Every pass
        compacts files and expires snapshots on each of those tables too
        — they are ledgered SnapshotTables that otherwise accumulate
        files and manifests forever. Content-preserving only: no vacuum
        and no semantic fold (the index's postings ``compact()`` stays an
        explicit, batch_id-carrying call)."""
        self.table = table
        self.max_files_per_bucket = max_files_per_bucket
        self.keep_snapshots = keep_snapshots
        self.vacuum_slack_lsn = vacuum_slack_lsn
        self.vacuum_every = max(1, vacuum_every)
        self.states = tuple(states)
        self._passes = 0
        self._last_vacuum_cutoff: int | None = None

    def derived_watermark(self) -> int | None:
        """Max applied LSN off the manifest's ``_lsn`` zone maps — None
        when any file lacks the stat (never guess from partial stats: the
        unstatted file might hold the max)."""
        files = self.table.manifest()["files"]
        if not files:
            return None
        maxes = [(f.get("col_stats") or {}).get(LSN_COL) for f in files]
        if any(m is None for m in maxes):
            return None
        return max(m[1] for m in maxes)

    def run(self, watermark_lsn: int | None = None) -> dict[str, Any]:
        """One maintenance pass; every step is independently idempotent,
        so a crash mid-pass just leaves the rest for the next one."""
        self._passes += 1
        out: dict[str, Any] = {"pass": self._passes}
        c = self.table.compact_files(
            max_files_per_bucket=self.max_files_per_bucket
        )
        out["compacted"] = c.applied
        e = self.table.expire_snapshots(keep_last=self.keep_snapshots)
        out["expired_manifests"] = e["removed_manifests"]
        out["removed_files"] = e["removed_files"]
        out["vacuumed"] = False
        if (
            self.vacuum_slack_lsn is not None
            and self._passes % self.vacuum_every == 0
        ):
            wm = (
                watermark_lsn
                if watermark_lsn is not None
                else self.derived_watermark()
            )
            if wm is not None:
                cutoff = wm - self.vacuum_slack_lsn
                # vacuum probes + rewrites the tombstone-bearing files —
                # only pay that (and the replay-safety erosion) when the
                # cutoff actually ADVANCED since the last one
                if cutoff > 0 and (
                    self._last_vacuum_cutoff is None
                    or cutoff > self._last_vacuum_cutoff
                ):
                    v = self.table.vacuum_tombstones(older_than_lsn=cutoff)
                    self._last_vacuum_cutoff = cutoff
                    out["vacuumed"] = v.applied
                    out["vacuum_cutoff_lsn"] = cutoff
        if self.states:
            st: dict[str, Any] = {}
            for state in self.states:
                for name, t in state.maintained_tables().items():
                    c = t.compact_files(
                        max_files_per_bucket=self.max_files_per_bucket
                    )
                    e = t.expire_snapshots(keep_last=self.keep_snapshots)
                    st[name] = {
                        "compacted": c.applied,
                        "expired_manifests": e["removed_manifests"],
                        "removed_files": e["removed_files"],
                    }
            out["states"] = st
        return out
