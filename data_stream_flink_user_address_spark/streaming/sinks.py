"""Keyed upsert sinks -- Spark re-expression of reference Sink/MongoSink.java.

Reference semantics (``Sink/MongoSink.java:44-63``): per record,
``updateOne({key: doc[key]}, {$set: doc}, upsert=true)`` -- last-write-wins
keyed upsert, idempotent per key, no transactions.  Three instances:
userAddress (key userId), userCountByState (key state), userCountByCountry
(key country) -- ``Main.java:170-179``.

Spark mapping: ``writeStream.foreachBatch`` with a per-batch keyed merge.
The default store here is a self-contained parquet key-value table
(read-merge-rewrite, atomic per bucket directory); on a real deployment
the same interface fronts Delta ``MERGE`` or the Mongo Spark connector --
the batch-level dedup logic is identical.

Micro-batch retries replay a batch: the merge is idempotent per key, so
at-least-once delivery converges exactly like the reference's upsert.
"""

from __future__ import annotations

import json
import os
import uuid
import warnings

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


# Filesystems whose ``rename`` is copy+delete (or otherwise cannot
# atomically refuse an existing destination), so the write-temp-then-
# publish commit arbiter in TransactionalKeyedUpsertSink._publish is NOT
# safe against concurrent writers there.  Delta Lake solves the same
# problem with a LogStore per scheme (S3SingleDriverLogStore etc.); this
# sink supports local (hard-link publish) and HDFS-like atomic-rename
# stores, and warns -- rather than silently corrupting -- elsewhere.
NON_ATOMIC_RENAME_SCHEMES = frozenset(
    {"s3", "s3a", "s3n", "gs", "oss", "cos", "cosn", "swift"}
)


def latest_per_key(df: DataFrame, key: str, order_col: str | None) -> DataFrame:
    """Collapse a batch to one row per key (last-write-wins).

    ``order_col`` defines "last"; None means any row may win (matches the
    reference's nondeterministic per-record ordering across parallel
    sink subtasks).
    """
    if order_col is None:
        return df.dropDuplicates([key])
    w = Window.partitionBy(key).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


class KeyedUpsertSink:
    """Parquet-backed keyed upsert table (MongoSink.java analogue).

    ``path`` holds the table hash-bucketed by key into ``n_buckets``
    partition directories (``__bucket=k/``).  ``apply`` merges a batch:
    new keys inserted, existing keys overwritten ($set-with-upsert
    semantics).  Only the buckets containing the batch's keys are read
    (partition pruning) and rewritten (dynamic partition overwrite) --
    per-batch cost is O(touched buckets), not O(table), which is what
    keeps a continuously-upserting sink viable as the keyed table grows.

    Durability limits (by design, matching the reference's
    no-transactions Mongo sink): SINGLE writer on a LOCAL/HDFS-like
    filesystem only.  ``_read_raw`` probes bucket dirs via
    ``os.listdir``, so ``path`` must be driver-visible; and dynamic
    partition overwrite is atomic per bucket directory but not across
    buckets -- a crash mid-commit can leave some touched buckets new and
    others old (replaying the batch converges, since the merge is
    idempotent per key).  For multi-writer or crash-transactional
    deployments swap this class for Delta ``MERGE`` behind the same
    ``apply(df)`` interface.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str,
        order_col: str | None = None,
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.path = path
        self.key = key
        self.order_col = order_col
        self.n_buckets = n_buckets

    def _bucket(self):
        return F.pmod(F.xxhash64(F.col(self.key)), F.lit(self.n_buckets))

    def _read_raw(self) -> DataFrame | None:
        if not os.path.isdir(self.path) or not any(
            e.startswith("__bucket=") for e in os.listdir(self.path)
        ):
            return None
        return self.spark.read.parquet(self.path)

    def read(self) -> DataFrame | None:
        """Current table contents (without the internal bucket column)."""
        raw = self._read_raw()
        return None if raw is None else raw.drop("__bucket")

    def apply(self, batch_df: DataFrame) -> None:
        incoming = latest_per_key(batch_df, self.key, self.order_col).withColumn(
            "__bucket", self._bucket()
        )
        current = self._read_raw()
        if current is None:
            merged = incoming
        else:
            touched = [r[0] for r in incoming.select("__bucket").distinct().collect()]
            # partition pruning: only touched bucket dirs are scanned
            survivors = (
                current.filter(F.col("__bucket").isin(touched))
                .join(incoming.select(self.key), on=self.key, how="left_anti")
            )
            # new batch wins on key collision (MongoSink $set upsert).
            # allowMissingColumns: a stored table written under an older
            # schema (e.g. pre-__run/__epoch pipeline layouts) may lack
            # columns the incoming batch now carries -- survivors get
            # NULL there instead of failing the first post-upgrade batch
            # with AnalysisException; writers that compare such columns
            # must treat NULL as "legacy row" (see
            # plans/pipeline.py:_merge_window_counts).
            merged = incoming.unionByName(survivors, allowMissingColumns=True)
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__bucket")
            .parquet(self.path)
        )

    def foreach_batch(self):
        """Adapter for ``writeStream.foreachBatch``."""

        def fn(batch_df: DataFrame, epoch_id: int) -> None:
            self.apply(batch_df)

        return fn


class TransactionalKeyedUpsertSink:
    """Keyed upsert table with an atomic commit log (Delta-MERGE-shaped).

    Same ``apply(df)`` / ``read()`` / ``foreach_batch()`` surface and
    MongoSink.java:44-63 upsert semantics as :class:`KeyedUpsertSink`,
    but the two durability limits of the parquet-directory store are
    fixed:

    - **Cross-bucket crash atomicity.**  A commit is the atomic creation
      of one manifest file ``_log/{version}.json`` listing every data
      file of every bucket at that version.  Data files are written
      FIRST under a fresh ``data/txn-*/`` directory; a crash before the
      log entry appears leaves only unreferenced orphans -- readers
      still see the previous version in full.  (The parquet store's
      dynamic partition overwrite was atomic per bucket but not across
      buckets.)
    - **Path abstraction + multi-writer.**  All metadata I/O goes
      through the Hadoop ``FileSystem`` API resolved from the path (no
      ``os.listdir``), so the table works on any Hadoop-addressable
      store.  The commit arbiter is write-temp-then-publish (Delta
      HDFSLogStore pattern): the manifest body is fully written and
      closed as ``_log/.tmp-*`` FIRST, then published to
      ``_log/{version}.json`` by an atomic fail-if-exists move -- a
      POSIX hard link on local filesystems (``rename(2)`` silently
      replaces, ``link(2)`` atomically fails on an existing target) and
      ``FileSystem.rename`` elsewhere (atomic no-overwrite on HDFS).
      Multi-writer safety therefore requires a scheme with one of those
      primitives: ``file`` and ``hdfs``-like stores qualify; object
      stores whose rename is copy+delete (``s3a``, ``gs``, ... -- see
      ``NON_ATOMIC_RENAME_SCHEMES``) do not, and ``_publish`` emits a
      ``RuntimeWarning`` there (single-writer use remains safe; Delta
      solves the same gap with a per-scheme ``LogStore``).
      Of two concurrent writers exactly one wins; the loser re-reads
      the winner's manifest and retries its merge on top -- optimistic
      concurrency, the same protocol as Delta Lake's transaction log.
      A manifest is therefore never visible half-written; as defense in
      depth readers also skip an unparsable/empty newest log entry
      (e.g. one produced by a crashed foreign writer) and fall back to
      the newest parsable version.

    Manifests store data-file paths RELATIVE to the table root, so the
    table survives being moved/renamed or addressed through a different
    filesystem prefix (absolute entries from older manifests are still
    resolved for compatibility).

    Scale shape is unchanged: a batch reads and rewrites only the
    buckets its keys hash to (the manifest carries the untouched
    buckets' file lists forward), so per-batch cost is O(touched
    buckets) however large the table grows.  Old versions' files stay
    until :meth:`vacuum`, which only reclaims unreferenced files older
    than its retention window -- protecting both readers pinned to a
    just-replaced version and in-flight writers whose data is written
    before their commit.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str,
        order_col: str | None = None,
        n_buckets: int = 16,
        max_commit_retries: int = 10,
    ):
        self.spark = spark
        self.path = path.rstrip("/")
        self.key = key
        self.order_col = order_col
        self.n_buckets = n_buckets
        self.max_commit_retries = max_commit_retries
        self._warned_non_atomic_scheme = False

    # -- Hadoop FS plumbing -------------------------------------------------

    def _jpath(self, p: str):
        return self.spark._jvm.org.apache.hadoop.fs.Path(p)

    def _fs(self):
        return self._jpath(self.path).getFileSystem(
            self.spark._jsc.hadoopConfiguration()
        )

    @property
    def _log_dir(self) -> str:
        return f"{self.path}/_log"

    def _list_versions(self, fs) -> list[int]:
        """Committed version numbers, newest first (tmp files excluded)."""
        log = self._jpath(self._log_dir)
        if not fs.exists(log):
            return []
        versions = []
        for st in fs.listStatus(log):
            name = st.getPath().getName()
            if name.endswith(".json") and not name.startswith("."):
                try:
                    versions.append(int(name[: -len(".json")]))
                except ValueError:
                    continue
        return sorted(versions, reverse=True)

    def _current_version(self, fs) -> int | None:
        versions = self._list_versions(fs)
        return versions[0] if versions else None

    def _read_manifest(self, fs, version: int) -> dict:
        stream = fs.open(self._jpath(f"{self._log_dir}/{version:020d}.json"))
        try:
            body = self.spark._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()
        return json.loads(body)

    def _try_read_manifest(self, fs, version: int) -> dict | None:
        """None instead of raising on an empty/truncated/corrupt entry."""
        try:
            return self._read_manifest(fs, version)
        except (json.JSONDecodeError, ValueError):
            return None

    def _latest_valid_manifest(self, fs) -> tuple[int | None, dict | None]:
        """(version, manifest) of the newest PARSABLE log entry.

        The publish protocol never exposes a half-written manifest, but
        a crashed foreign writer using direct create() could; skipping
        to the next parsable version keeps the table readable instead
        of wedging every read on a JSONDecodeError.
        """
        for v in self._list_versions(fs):
            m = self._try_read_manifest(fs, v)
            if m is not None:
                return v, m
        return None, None

    def _resolve(self, f: str) -> str:
        """Manifest entry -> readable path (entries are table-relative;
        absolute URIs from older manifests pass through unchanged)."""
        if "://" in f or f.startswith(("/", "file:")):
            return f
        return f"{self.path}/{f}"

    def _publish(self, fs, tmp: str, target_str: str) -> bool:
        """Atomically move the fully-written tmp manifest to its final
        name iff no file exists there; False when a concurrent writer
        already owns the version.  Genuine I/O errors propagate."""
        jvm = self.spark._jvm
        target = self._jpath(target_str)
        if fs.exists(target):
            fs.delete(self._jpath(tmp), False)
            return False
        if fs.getScheme() == "file":
            # POSIX hard link: the one local-FS primitive that
            # atomically fails if the destination already exists
            # (rename(2) silently replaces; create(overwrite=false) is
            # check-then-create in Hadoop's RawLocalFileSystem).
            src = jvm.java.io.File(self._jpath(tmp).toUri().getPath()).toPath()
            dst = jvm.java.io.File(target.toUri().getPath()).toPath()
            try:
                jvm.java.nio.file.Files.createLink(dst, src)
            except Exception as e:
                fs.delete(self._jpath(tmp), False)
                if "FileAlreadyExists" in str(e) or fs.exists(target):
                    return False
                raise
            fs.delete(self._jpath(tmp), False)
            return True
        # HDFS and friends: rename refuses an existing destination.
        # That guarantee does NOT hold on object stores where rename is
        # copy+delete (S3A, GCS, ...) -- two racing writers could both
        # "publish" and the last copy silently wins.  Single-writer use
        # is still safe; warn so multi-writer deployments know to front
        # the log with an external arbiter (Delta LogStore pattern).
        if fs.getScheme() in NON_ATOMIC_RENAME_SCHEMES and not self._warned_non_atomic_scheme:
            self._warned_non_atomic_scheme = True
            warnings.warn(
                f"TransactionalKeyedUpsertSink at {self.path}: filesystem "
                f"scheme '{fs.getScheme()}' does not provide atomic "
                f"fail-if-exists rename; concurrent writers may corrupt the "
                f"commit log. Safe schemes: file (hard-link publish), hdfs "
                f"and other atomic-rename stores. See NON_ATOMIC_RENAME_SCHEMES.",
                RuntimeWarning,
                stacklevel=2,
            )
        try:
            renamed = fs.rename(self._jpath(tmp), target)
        except Exception as e:
            if "FileAlreadyExists" in str(e) or fs.exists(target):
                fs.delete(self._jpath(tmp), False)
                return False
            raise
        if not renamed:
            fs.delete(self._jpath(tmp), False)
        return renamed

    def _try_commit(self, fs, version: int, manifest: dict) -> bool:
        """Write-temp-then-publish ``_log/{version}.json``; False on a
        lost commit race.  The manifest body is complete and closed
        BEFORE it becomes visible under its final name, so readers can
        never observe a partial entry."""
        fs.mkdirs(self._jpath(self._log_dir))
        tmp = f"{self._log_dir}/.tmp-{uuid.uuid4().hex}.json"
        out = fs.create(self._jpath(tmp), True)
        try:
            out.write(bytearray(json.dumps(manifest).encode("utf-8")))
        finally:
            out.close()
        target = f"{self._log_dir}/{version:020d}.json"
        return self._publish(fs, tmp, target)

    # -- table surface ------------------------------------------------------

    def _bucket(self):
        return F.pmod(F.xxhash64(F.col(self.key)), F.lit(self.n_buckets))

    def read(self) -> DataFrame | None:
        """Current committed contents (None before the first commit)."""
        fs = self._fs()
        _, manifest = self._latest_valid_manifest(fs)
        if manifest is None:
            return None
        files = [self._resolve(f) for fl in manifest["buckets"].values() for f in fl]
        return self.spark.read.parquet(*files)

    def _write_data(self, merged: DataFrame, touched: list[int]) -> dict[str, list[str]]:
        """Write touched buckets' merged rows; return bucket -> new
        files as TABLE-RELATIVE paths (the manifest must survive the
        table directory moving or being addressed via another prefix)."""
        txn_name = f"txn-{uuid.uuid4().hex}"
        merged.write.partitionBy("__bucket").parquet(f"{self.path}/data/{txn_name}")
        fs = self._fs()
        out: dict[str, list[str]] = {}
        for b in touched:
            bdir = self._jpath(f"{self.path}/data/{txn_name}/__bucket={b}")
            if not fs.exists(bdir):
                continue  # bucket lost every row to the LWW collapse
            out[str(b)] = [
                f"data/{txn_name}/__bucket={b}/{st.getPath().getName()}"
                for st in fs.listStatus(bdir)
                if st.getPath().getName().endswith(".parquet")
            ]
        return out

    def apply(self, batch_df: DataFrame) -> None:
        incoming = latest_per_key(batch_df, self.key, self.order_col).withColumn(
            "__bucket", self._bucket()
        )
        # bounded collect: <= n_buckets values (same note as KeyedUpsertSink)
        touched = [int(r[0]) for r in incoming.select("__bucket").distinct().collect()]
        if not touched:
            return
        incoming = incoming.localCheckpoint()  # one computation across retries
        fs = self._fs()
        for _ in range(self.max_commit_retries):
            versions = self._list_versions(fs)
            _, base_manifest = self._latest_valid_manifest(fs)
            old_buckets: dict[str, list[str]] = (
                {} if base_manifest is None else base_manifest["buckets"]
            )
            old_files = [
                self._resolve(f)
                for b, fl in old_buckets.items()
                if int(b) in touched
                for f in fl
            ]
            if old_files:
                survivors = (
                    self.spark.read.parquet(*old_files)
                    .join(incoming.select(self.key), on=self.key, how="left_anti")
                    .withColumn("__bucket", self._bucket())
                )
                # allowMissingColumns: same legacy-schema tolerance as
                # KeyedUpsertSink.apply -- survivors from a table
                # persisted under an older column set read as NULL in
                # the new columns rather than failing the union
                merged = incoming.unionByName(survivors, allowMissingColumns=True)
            else:
                merged = incoming
            new_files = self._write_data(merged, touched)
            buckets = {
                b: fl for b, fl in old_buckets.items() if int(b) not in touched
            }
            buckets.update(new_files)
            # next version counts PAST the newest listed entry even if it
            # was unparsable -- never reuse a claimed version number
            next_version = versions[0] + 1 if versions else 0
            if self._try_commit(fs, next_version, {"version": next_version, "buckets": buckets}):
                return
            # lost the race: another writer committed next_version; re-merge
            # against their table state (the orphaned data files are
            # unreferenced and reclaimed by vacuum)
        raise RuntimeError(
            f"TransactionalKeyedUpsertSink: commit contention exceeded "
            f"{self.max_commit_retries} retries at {self.path}"
        )

    def vacuum(self, retain_seconds: float = 3600.0) -> int:
        """Delete data files not referenced by the current manifest, and
        superseded log entries, PROVIDED they are older than
        ``retain_seconds`` (Delta ``VACUUM ... RETAIN``-style age guard);
        returns the number of data files removed.

        The retention window is the safety mechanism: a reader pinned to
        a just-replaced version finishes its scan, and an in-flight
        concurrent writer -- whose data files exist BEFORE its commit by
        design -- cannot have its pre-commit files reclaimed from under
        it.  ``retain_seconds=0`` reclaims everything unreferenced
        immediately and is only safe with all readers and writers
        quiesced."""
        import time

        fs = self._fs()
        version, manifest = self._latest_valid_manifest(fs)
        if manifest is None:
            return 0
        live = set()
        for fl in manifest["buckets"].values():
            for f in fl:
                live.add(f)
                live.add(self._resolve(f))
        cutoff_ms = (time.time() - retain_seconds) * 1000.0
        removed = 0
        data_dir = self._jpath(f"{self.path}/data")
        if fs.exists(data_dir):
            for txn in fs.listStatus(data_dir):
                for st in fs.listStatus(txn.getPath()):
                    if st.isDirectory():
                        for leaf in fs.listStatus(st.getPath()):
                            p = leaf.getPath()
                            rel = f"data/{txn.getPath().getName()}/{st.getPath().getName()}/{p.getName()}"
                            if (
                                p.getName().endswith(".parquet")
                                and rel not in live
                                and p.toString() not in live
                                and leaf.getModificationTime() < cutoff_ms
                            ):
                                fs.delete(p, False)
                                removed += 1
        current_name = f"{version:020d}.json"
        for st in fs.listStatus(self._jpath(self._log_dir)):
            name = st.getPath().getName()
            if name == current_name:
                continue
            is_old_version = name.endswith(".json") and not name.startswith(".")
            is_stale_tmp = name.startswith(".tmp-")
            if (is_old_version or is_stale_tmp) and st.getModificationTime() < cutoff_ms:
                fs.delete(st.getPath(), False)
        return removed

    def foreach_batch(self):
        """Adapter for ``writeStream.foreachBatch``."""

        def fn(batch_df: DataFrame, epoch_id: int) -> None:
            self.apply(batch_df)

        return fn


def upsert_foreach_batch(
    spark: SparkSession,
    path: str,
    key: str,
    order_col: str | None = None,
    transactional: bool = False,
):
    """One-call ``foreachBatch`` function factory (K1 instances K2-K4)."""
    cls = TransactionalKeyedUpsertSink if transactional else KeyedUpsertSink
    return cls(spark, path, key, order_col).foreach_batch()


def console_sink(df: DataFrame, **options):
    """K5 -- reference's System.out.println debug sink (Main.java:147,164)."""
    return df.writeStream.format("console").options(**options)
