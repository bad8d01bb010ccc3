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


from contextlib import contextmanager


@contextmanager
def _stats_friendly_timestamps(spark: SparkSession):
    """Spark's default parquet timestamp encoding is INT96, which carries
    NO min/max statistics in the footer — an INT96 column can never be
    pruned.  Snapshot-table data files are written as TIMESTAMP_MICROS
    (the modern encoding Iceberg mandates) so footer stats exist for
    :func:`collect_file_stats`; values read back identically."""
    key = "spark.sql.parquet.outputTimestampType"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


class SnapshotTable:
    """A parquet table with Iceberg-style snapshot manifests."""

    def __init__(self, path: str):
        # Absolute from the start: manifest entries are compared against
        # the ABSOLUTE decoded paths input_file_name() yields (see
        # _affected_files); a relative table path would store relative
        # manifest paths and make every "which files did this MERGE /
        # DELETE touch?" set-difference silently miss all of them.
        self.path = os.path.abspath(path)
        self._meta = os.path.join(self.path, "snapshots")
        os.makedirs(self._meta, exist_ok=True)

    # -- commit ------------------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        *,
        mode: str = "append",
        stats_cols: list[str] | None = None,
    ) -> int:
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

        ``stats_cols`` attaches per-file column min/max/null-count stats
        to the manifest (read from the parquet FOOTERS the writer already
        produced — no extra Spark job, exactly how Iceberg gets them),
        enabling file-level data skipping via :meth:`read_range`.
        """
        import uuid

        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        data_dir = os.path.join(self.path, "data", uuid.uuid4().hex[:12])
        with _stats_friendly_timestamps(df.sparkSession):
            df.write.mode("overwrite").parquet(data_dir)
        files = sorted(
            os.path.join(data_dir, f)
            for f in os.listdir(data_dir)
            if f.endswith(".parquet")
        )
        new_stats = collect_file_stats(files, stats_cols) if stats_cols else {}
        while True:
            parent = self.current_snapshot_id()
            sid = parent + 1
            if mode == "overwrite" or parent == 0:
                visible = files
                parent_stats = {}
            else:
                try:
                    pm = self._manifest(parent)
                    visible = pm["files"] + files
                    parent_stats = pm.get("stats", {})
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
                "stats": {**parent_stats, **new_stats},
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

    def commit_clustered(
        self,
        df: DataFrame,
        cluster_cols: list[str],
        n_files: int,
        *,
        stats_cols: list[str] | None = None,
        mode: str = "append",
    ) -> int:
        """Commit with data files CLUSTERED on ``cluster_cols``:
        range-partition into ``n_files`` files and sort within each, so
        per-file min/max ranges are tight and near-disjoint — the write
        layout that makes :meth:`read_range`'s file skipping effective
        (Iceberg's sorted write / rewrite_data_files sort strategy).

        For multi-dimensional skipping, cluster on a Z-order key
        (:func:`schema_validator_spark.functions.zorder.zorder_key`) and
        keep stats on the raw dimensions.  Stats default to the cluster
        columns.  One range-exchange over the delta being committed —
        never the whole table.
        """
        clustered = df.repartitionByRange(
            n_files, *cluster_cols
        ).sortWithinPartitions(*cluster_cols)
        return self.commit(
            clustered, mode=mode, stats_cols=stats_cols or list(cluster_cols)
        )

    def candidate_files(
        self,
        col: str,
        lo=None,
        hi=None,
        snapshot_id: int | None = None,
    ) -> list[str]:
        """The data files that MIGHT hold rows with ``lo <= col <= hi``,
        judged purely from manifest stats (metadata-scale — no Spark job,
        no file opens).  Files without stats for ``col`` are kept (never
        prune on missing information); all-null files are skipped (a
        range predicate can't match NULL)."""
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id()
        m = self._manifest(sid)
        stats = m.get("stats", {})
        lo_c, hi_c = _stat_val(lo), _stat_val(hi)
        out = []
        for f in m["files"]:
            cs = stats.get(f, {}).get("cols", {}).get(col)
            if cs is None:
                out.append(f)
                continue
            if cs.get("all_null"):
                continue
            if lo_c is not None and cs["max"] < lo_c:
                continue
            if hi_c is not None and cs["min"] > hi_c:
                continue
            out.append(f)
        return out

    def read_range(
        self,
        spark: SparkSession,
        col: str,
        lo=None,
        hi=None,
        snapshot_id: int | None = None,
    ) -> DataFrame:
        """Range scan with file-level data skipping: read ONLY the files
        whose manifest stats intersect [lo, hi], then apply the exact row
        predicate (which Spark additionally pushes into the parquet
        row-group reader).  Result is row-identical to filtering a full
        snapshot read; cost scales with the matching files.  On a
        :meth:`commit_clustered` layout a narrow range touches
        O(1) files out of however many the table holds."""
        from pyspark.sql import functions as F

        files = self.candidate_files(col, lo, hi, snapshot_id=snapshot_id)
        if not files:
            base = self.read(spark, snapshot_id).limit(0)
        else:
            base = spark.read.parquet(*files)
        c = F.col(col)
        if lo is not None:
            base = base.filter(c >= F.lit(lo))
        if hi is not None:
            base = base.filter(c <= F.lit(hi))
        return base

    def drop(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)

    # -- maintenance primitives --------------------------------------------

    def _write_data(self, df: DataFrame) -> list[str]:
        """Write df as a new immutable data-file set, return the paths."""
        import uuid

        data_dir = os.path.join(self.path, "data", uuid.uuid4().hex[:12])
        with _stats_friendly_timestamps(df.sparkSession):
            df.write.mode("overwrite").parquet(data_dir)
        return sorted(
            os.path.join(data_dir, f)
            for f in os.listdir(data_dir)
            if f.endswith(".parquet")
        )

    def _commit_files(
        self,
        files: list[str],
        operation: str,
        parent: int,
        new_stats: dict | None = None,
    ) -> int:
        """Commit an EXPLICIT visible-file set computed against ``parent``
        (the copy-on-write maintenance commit).  Unlike ``commit``'s
        append loop, a maintenance rewrite cannot be silently rebased onto
        a different parent — the rewritten files were derived from
        parent's data — so a lost CAS race raises instead of retrying;
        the caller re-runs the whole operation against the new head
        (Iceberg's serializable copy-on-write semantics)."""
        import uuid

        sid = parent + 1
        # stats for files carried by reference survive the rewrite; stats
        # for rewritten (dropped) files fall away with them
        parent_stats = self._manifest(parent).get("stats", {}) if parent else {}
        kept = set(files)
        stats = {f: s for f, s in parent_stats.items() if f in kept}
        stats.update(new_stats or {})
        manifest = {
            "snapshot_id": sid,
            "parent_id": parent or None,
            "operation": operation,
            "timestamp_ms": int(time.time() * 1000),
            "files": files,
            "stats": stats,
        }
        final = os.path.join(self._meta, f"{sid}.json")
        tmp = os.path.join(self._meta, f".tmp-{uuid.uuid4().hex[:12]}")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        try:
            os.link(tmp, final)
            os.unlink(tmp)
            return sid
        except FileExistsError:
            os.unlink(tmp)
            raise ValueError(
                f"concurrent commit beat {operation} at snapshot {sid}; "
                "re-run the maintenance operation against the new head"
            ) from None
        except OSError:
            try:
                os.close(os.open(final, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
            except FileExistsError:
                os.unlink(tmp)
                raise ValueError(
                    f"concurrent commit beat {operation} at snapshot {sid}; "
                    "re-run the maintenance operation against the new head"
                ) from None
            os.replace(tmp, final)
            return sid


def _stat_val(v):
    """Normalize a stats / predicate value into a JSON-comparable scalar:
    numbers and strings pass through; datetimes become epoch seconds
    (tz-aware first converted to UTC).  Returns None for None and for
    types we don't know how to compare (callers must then keep the file:
    never prune on information we can't interpret)."""
    import datetime as dt

    if v is None or isinstance(v, bool):
        return None if v is None else int(v)
    if isinstance(v, (int, float, str)):
        return v
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return (v - dt.datetime(1970, 1, 1)).total_seconds()
    if isinstance(v, dt.date):
        return (v - dt.date(1970, 1, 1)).days * 86400.0
    return None


def collect_file_stats(files: list[str], cols: list[str]) -> dict:
    """Per-file column stats from the parquet FOOTERS (pyarrow metadata
    read — bytes per file, no data scan, no Spark job; this is where
    Iceberg's manifests get their bounds too).  Returns
    ``{file: {"rows": n, "cols": {col: {"min", "max", "nulls"} |
    {"all_null": True}}}}``; a column is omitted for a file whose footer
    carries no usable statistics (readers must treat that as
    unprunable)."""
    import pyarrow.parquet as pq

    out = {}
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {
            md.schema.column(i).path: i
            for i in range(md.num_columns)
        }
        fstats: dict = {"rows": md.num_rows, "cols": {}}
        for c in cols:
            i = idx.get(c)
            if i is None:
                continue
            mins, maxs, nulls, usable = [], [], 0, True
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                s = g.column(i).statistics
                if s is None:
                    usable = False
                    break
                nulls += s.null_count or 0
                if not s.has_min_max:
                    # an all-null row group legitimately has no min/max;
                    # anything else means unknown -> unusable
                    if (s.null_count or 0) != g.num_rows:
                        usable = False
                        break
                    continue
                mn, mx = _stat_val(s.min), _stat_val(s.max)
                if mn is None or mx is None:
                    usable = False
                    break
                mins.append(mn)
                maxs.append(mx)
            if not usable:
                continue
            if not mins:
                fstats["cols"][c] = {"all_null": True, "nulls": nulls}
            else:
                fstats["cols"][c] = {
                    "min": min(mins), "max": max(maxs), "nulls": nulls,
                }
        out[f] = fstats
    return out


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


def _local_path(col):
    """input_file_name() returns a file: URI; manifests store plain paths."""
    from pyspark.sql import functions as F

    return F.url_decode(F.regexp_replace(col, "^file:(//)?", ""))


def _affected_files(
    spark: SparkSession, files: list[str], touch_filter
) -> list[str]:
    """The subset of data files containing at least one row matching
    ``touch_filter`` (a Column, or a fn(DataFrame)->DataFrame narrowing).
    This is the file-pruning half of copy-on-write: untouched files are
    carried into the next snapshot BY REFERENCE — at 10^12 rows a MERGE
    touching one repo rewrites that repo's files, not the table.  The
    collect is bounded by #files (manifest-scale metadata)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(*files).withColumn(
        "_file", _local_path(F.input_file_name())
    )
    touched = touch_filter(df) if callable(touch_filter) else df.filter(touch_filter)
    return sorted(r["_file"] for r in touched.select("_file").distinct().collect())


def _untouched_files(files: list[str], affected: list[str]) -> list[str]:
    """``files`` minus ``affected``, compared as ABSOLUTE paths:
    _affected_files yields absolute decoded paths (input_file_name), but
    a manifest written by a pre-normalization table (or hand-built)
    may hold relative entries — naive set-difference would then keep
    every affected file and duplicate its rows into the new snapshot."""
    hit = {os.path.abspath(f) for f in affected}
    return [f for f in files if os.path.abspath(f) not in hit]


def merge_upsert(
    spark: SparkSession,
    table: SnapshotTable,
    source: DataFrame,
    key_cols: list[str],
) -> int:
    """MERGE INTO with copy-on-write file pruning (Iceberg MERGE
    semantics over the manifest stand-in): target rows whose key appears
    in ``source`` are replaced by the source row (matched -> update all
    columns), source keys absent from the target are inserted, and ONLY
    the data files that contain a matched key are rewritten — every
    other file moves into the new snapshot untouched, by reference.

    ``source`` must carry the target's schema and at most one row per
    key (ambiguous multi-row updates raise, as SQL MERGE does).
    Historical snapshots still see the pre-merge rows: time travel.
    """
    from pyspark.sql import functions as F

    parent = table.current_snapshot_id()
    files = table._manifest(parent)["files"] if parent else []
    dup = (
        source.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1).limit(1).collect()
    )
    if dup:
        raise ValueError(
            f"MERGE source has multiple rows for key {tuple(dup[0][c] for c in key_cols)}"
        )
    keys = source.select(*key_cols).distinct()

    def _touched(df):
        return df.join(F.broadcast(keys), key_cols, "left_semi")

    affected = _affected_files(spark, files, _touched) if files else []
    untouched = _untouched_files(files, affected)
    if affected:
        kept_old = spark.read.parquet(*affected).join(
            F.broadcast(keys), key_cols, "left_anti"
        )
        rewritten = kept_old.unionByName(source.select(*kept_old.columns))
    else:
        rewritten = source
    new_files = table._write_data(rewritten)
    return table._commit_files(untouched + new_files, "merge", parent)


def delete_where(
    spark: SparkSession,
    table: SnapshotTable,
    predicate,
) -> int:
    """Row-level DELETE with copy-on-write file pruning: only files
    containing at least one matching row are rewritten (without the
    matched rows); all other files carry over by reference.  NULL
    predicate results keep the row (SQL DELETE deletes only where the
    predicate is TRUE)."""
    from pyspark.sql import functions as F

    parent = table.current_snapshot_id()
    files = table._manifest(parent)["files"] if parent else []
    if not files:
        return parent  # empty table: nothing to delete
    affected = _affected_files(spark, files, predicate)
    untouched = _untouched_files(files, affected)
    if not affected:
        return parent  # no-op delete: nothing matched, no new snapshot
    survivors = spark.read.parquet(*affected).filter(
        ~F.coalesce(predicate, F.lit(False))
    )
    new_files = table._write_data(survivors)
    return table._commit_files(untouched + new_files, "delete", parent)


def compact_table(
    spark: SparkSession,
    table: SnapshotTable,
    *,
    target_files: int,
) -> int:
    """Bin-pack compaction (Iceberg rewrite_data_files): rewrite the
    current snapshot's many small files as ``target_files`` files,
    committing a row-identical 'replace' snapshot.  Historical snapshots
    keep reading the old files — compaction never breaks time travel
    (old files are reclaimed only by expire_snapshots)."""
    parent = table.current_snapshot_id()
    df = table.read(spark, parent).repartition(target_files)
    new_files = table._write_data(df)
    return table._commit_files(new_files, "replace", parent)


def expire_snapshots(table: SnapshotTable, *, keep_last: int) -> list[str]:
    """Expire all but the newest ``keep_last`` snapshots and delete every
    data file no surviving snapshot references (the GC half of
    compaction).  Returns the deleted file paths.  Metadata-scale only:
    set arithmetic over manifests, no Spark job."""
    ids = table.snapshot_ids()
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    drop_ids = ids[:-keep_last]
    if not drop_ids:
        return []
    keep_ids = ids[-keep_last:]
    referenced: set[str] = set()
    for sid in keep_ids:
        referenced.update(table._manifest(sid)["files"])
    doomed: set[str] = set()
    for sid in drop_ids:
        doomed.update(table._manifest(sid)["files"])
    removed = sorted(doomed - referenced)
    for f in removed:
        try:
            os.unlink(f)
        except FileNotFoundError:
            pass
    for sid in drop_ids:
        os.unlink(os.path.join(table._meta, f"{sid}.json"))
    return removed


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
