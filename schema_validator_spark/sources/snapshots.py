"""Snapshot-pinned table reads + drift-across-commits (Iceberg semantics).

The north rule targets Iceberg tables with snapshot pinning so drift can
be measured ACROSS COMMITS.  This container has no Iceberg runtime jars
(and no network to fetch them — documented blocker), so this module
implements the load-bearing subset of the Iceberg table spec over plain
parquet, with the same contract a real catalog would give us:

* a table is a directory of immutable data files plus an append-only
  chain of JSON snapshot manifests (`snapshots/N.json`), each listing
  exactly the data files visible at that commit;
* commits are atomic (manifest written to a temp name, then rename —
  the same single-atomic-swap idea as Iceberg's metadata pointer);
* reads PIN a snapshot: the file list comes from the manifest, so a
  later commit can never change what an open query sees (time travel);
* `drift_across_commits` runs the PSI drift check between two pinned
  snapshots — the "compare distribution at commit A vs commit B" check
  the reference's fixtures motivate (SURVEY.md §2.0).

Swapping in real Iceberg is a constructor change: `read_table(...,
fmt='table')` + `VERSION AS OF` replace `SnapshotTable.read`; every
operator downstream is DataFrame-in/DataFrame-out and does not care.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    """A parquet table with Iceberg-style snapshot manifests."""

    def __init__(self, path: str):
        self.path = path
        self._meta = os.path.join(path, "snapshots")
        os.makedirs(self._meta, exist_ok=True)

    # -- commit ------------------------------------------------------------

    def commit(self, df: DataFrame, *, mode: str = "append") -> int:
        """Write df's rows as new immutable data files and commit a new
        snapshot.  ``append`` layers onto the parent snapshot's files;
        ``overwrite`` starts the visible set fresh (old files stay on
        disk — historical snapshots still read them: time travel).

        Concurrency: the commit point is ``os.link(tmp, N.json)``, which
        FAILS if snapshot N already exists — the same optimistic CAS idea
        as Iceberg's metadata-pointer swap (rename would silently replace
        a concurrent winner's manifest, losing its commit).  On conflict
        the manifest is rebuilt against the new parent and retried; the
        data files, written once under a unique directory, are reused.
        """
        import uuid

        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        data_dir = os.path.join(self.path, "data", uuid.uuid4().hex[:12])
        df.write.mode("overwrite").parquet(data_dir)
        files = sorted(
            os.path.join(data_dir, f)
            for f in os.listdir(data_dir)
            if f.endswith(".parquet")
        )
        while True:
            parent = self.current_snapshot_id()
            sid = parent + 1
            if mode == "overwrite" or parent == 0:
                visible = files
            else:
                try:
                    visible = self._manifest(parent)["files"] + files
                except ValueError:
                    # parent was an abandoned commit claim that _manifest
                    # just reclaimed — recompute against the real head
                    continue
            manifest = {
                "snapshot_id": sid,
                "parent_id": parent or None,
                "operation": mode,
                "timestamp_ms": int(time.time() * 1000),
                "files": visible,
            }
            final = os.path.join(self._meta, f"{sid}.json")
            tmp = os.path.join(self._meta, f".tmp-{uuid.uuid4().hex[:12]}")
            with open(tmp, "w") as f:
                json.dump(manifest, f)
            try:
                os.link(tmp, final)  # atomic create-if-absent = commit point
                os.unlink(tmp)
                return sid
            except FileExistsError:
                os.unlink(tmp)
                continue  # lost the race: recompute against the new parent
            except OSError:
                # Filesystem without hardlinks (NFS/FUSE/object-store
                # mounts): claim the slot with O_CREAT|O_EXCL (same
                # create-if-absent CAS), then atomically replace the empty
                # claim with the manifest.  Readers that catch the tiny
                # claim->replace window retry (see _manifest).
                try:
                    os.close(os.open(final, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
                except FileExistsError:
                    os.unlink(tmp)
                    continue
                os.replace(tmp, final)
                return sid

    # -- metadata ----------------------------------------------------------

    def current_snapshot_id(self) -> int:
        ids = self.snapshot_ids()
        return ids[-1] if ids else 0

    def snapshot_ids(self) -> list[int]:
        return sorted(
            int(f[:-5])
            for f in os.listdir(self._meta)
            if f.endswith(".json") and not f.endswith(".tmp")
        )

    def _manifest(self, snapshot_id: int) -> dict:
        p = os.path.join(self._meta, f"{snapshot_id}.json")
        if not os.path.exists(p):
            raise ValueError(
                f"snapshot {snapshot_id} does not exist "
                f"(have: {self.snapshot_ids()})"
            )
        # the no-hardlink commit path has a tiny claim->replace window in
        # which the manifest file exists but is still empty — retry briefly
        for _ in range(50):
            with open(p) as f:
                body = f.read()
            if body:
                return json.loads(body)
            time.sleep(0.02)
        # still empty: either a commit is genuinely in flight, or its owner
        # died between claim and replace.  Reclaim dead claims (empty AND
        # old) so one crash can never wedge the table forever; 30 s is
        # orders of magnitude above the claim->replace window (two
        # syscalls), and a reclaimed slot just gets re-claimed via the
        # same O_EXCL CAS by the next committer.
        try:
            st = os.stat(p)
            if st.st_size == 0 and time.time() - st.st_mtime > 30:
                os.unlink(p)
                raise ValueError(
                    f"snapshot {snapshot_id} was an abandoned commit claim "
                    "(reclaimed)"
                )
        except FileNotFoundError:
            pass  # owner finished or another reader reclaimed it
        raise ValueError(f"snapshot {snapshot_id} manifest empty (commit in flight?)")

    def history(self) -> list[dict]:
        return [self._manifest(i) for i in self.snapshot_ids()]

    # -- read --------------------------------------------------------------

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        """Read the table AS OF a snapshot (default: current).  The file
        list is pinned by the manifest — later commits are invisible."""
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id()
        files = self._manifest(sid)["files"]
        if not files:
            raise ValueError(f"snapshot {sid} has no data files")
        return spark.read.parquet(*files)

    def read_appended(
        self,
        spark: SparkSession,
        since_snapshot: int,
        as_of: int | None = None,
    ) -> DataFrame:
        """Incremental scan: ONLY the data files appended after
        ``since_snapshot`` (up to ``as_of``, default current).

        This is the Iceberg incremental-read idea: because data files are
        immutable and manifests list them, the delta between two commits
        is a FILE-LIST difference — no row comparison, no shuffle, no
        full-table scan.  The natural input for incremental validation:
        each run validates exactly the rows new since its checkpoint.
        """
        to_sid = as_of if as_of is not None else self.current_snapshot_id()
        old = set(self._manifest(since_snapshot)["files"])
        new_files = [f for f in self._manifest(to_sid)["files"] if f not in old]
        if not new_files:
            # zero new data is the routine steady state of an incremental
            # pipeline — return an empty frame with the table's schema
            # (limit(0) prunes the scan), don't make callers try/except it
            return self.read(spark, since_snapshot).limit(0)
        return spark.read.parquet(*new_files)

    def drop(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)


def validate_appended(
    spark: SparkSession,
    table: SnapshotTable,
    engine,
    since_snapshot: int,
    *,
    as_of: int | None = None,
):
    """Incremental validation: run the engine over ONLY the rows added
    after ``since_snapshot`` (file-pruned manifest delta — each run costs
    the size of the delta, not the table).  Returns the engine's
    ValidationResult for the delta rows."""
    return engine.run(table.read_appended(spark, since_snapshot, as_of=as_of))


def drift_across_commits(
    spark: SparkSession,
    table: SnapshotTable,
    value_col: str,
    snapshot_a: int,
    snapshot_b: int,
    *,
    n_buckets: int = 10,
) -> DataFrame:
    """Quantile-edge PSI of ``value_col`` between two pinned snapshots —
    one row (baseline, current, psi); baseline edges from snapshot A."""
    from pyspark.sql import functions as F

    from ..operators.drift import psi_quantile_df

    a = table.read(spark, snapshot_a).select(
        F.lit(f"snap{snapshot_a}").alias("_commit"), F.col(value_col)
    )
    b = table.read(spark, snapshot_b).select(
        F.lit(f"snap{snapshot_b}").alias("_commit"), F.col(value_col)
    )
    return psi_quantile_df(
        a.unionByName(b), value_col, "_commit",
        f"snap{snapshot_a}", f"snap{snapshot_b}", n_buckets=n_buckets,
    )


def dedup_appended(
    spark: SparkSession,
    table: SnapshotTable,
    text_col: str,
    since_snapshot: int,
    *,
    id_col: str = "doc_id",
    as_of: int | None = None,
):
    """Incremental exact dedup: of the rows APPENDED after
    ``since_snapshot``, keep only those whose content hash is (a) absent
    from the existing corpus and (b) the first occurrence within the
    delta itself (ties by lowest id).

    This is how a production pipeline ingests a new crawl without
    re-deduping the whole corpus: the existing side reduces to a
    DISTINCT-hash index (one narrow column off a manifest-pinned file
    list), the delta anti-joins it, and a within-delta min-id pass
    finishes the job.  Cost scales with |delta| + |distinct corpus
    hashes| — never with corpus rows; at 10^12 docs the hash index is
    the thing you'd persist/bucket between runs (write it with
    sources.io.write_bucketed on the hash to make this anti-join
    zero-Exchange too, the referential.py shape).

    Returns the surviving delta rows (original columns).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    delta = table.read_appended(spark, since_snapshot, as_of=as_of)
    existing = (
        table.read(spark, since_snapshot)
        .select(F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256).alias("_h"))
        .distinct()
    )
    hashed = delta.withColumn(
        "_h", F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256)
    )
    fresh = hashed.join(existing, "_h", "left_anti")
    w = Window.partitionBy("_h").orderBy(F.col(id_col).asc())
    return (
        fresh.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_h")
    )
