package graft.sinks

import graft.ops.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** s39 — a minimal snapshot-isolated table format over the parquet lake:
  * the commit-log layer (Iceberg/Delta shape) that q131's compaction
  * planning, q148's manifest diff, and s35's incremental refresh would
  * actually run AGAINST at 100 TB, reduced to its load-bearing core:
  *
  *   - DATA lives as immutable parquet files, written once, never
  *     rewritten — a commit only writes NEW files plus log rows;
  *   - each SNAPSHOT owns its full manifest list (snapshot_id → the
  *     exact file set + per-file row counts), so any historical state
  *     is reconstructible from the log alone — time travel is "read
  *     the files snapshot N lists", nothing else;
  *   - the CURRENT pointer advances by an atomic conditional swap
  *     inside one transaction (the s35 ledger discipline): a commit
  *     declares the parent snapshot it built on, and the swap succeeds
  *     only if the pointer still equals that parent — a concurrent or
  *     stale committer gets a clean REJECT (optimistic concurrency,
  *     exactly Iceberg's commit protocol), never a half-visible table.
  *
  * The s39 query drives the full lifecycle: two committed snapshots
  * (epoch-0 slice, then append), one INJECTED stale-parent commit that
  * must be rejected, then a time-travel read of snapshot 1 next to the
  * current read of snapshot 2 — both censuses hashed against the
  * oracle's from-scratch recompute over `orders`, so a commit that
  * loses files, a manifest that leaks the other epoch's rows, or a
  * swap that let the stale commit through all fail the gate.
  *
  * Scale shape: the log is METADATA (snapshots × files rows through one
  * JDBC hop — the DuckDbLive bounded-export contract); data files never
  * move after write, and a time-travel read plans a plain parquet scan
  * of the listed files (all Catalyst pushdowns intact). Reference
  * anchor: the commit cadence + CHECKPOINT lifecycle of
  * `DatabaseWriter.cs:357-464` is this protocol's single-writer
  * degenerate case.
  */
object SnapshotLog {

  private val Cutoff = "2001-07-15"

  /** Create the empty commit log: snapshot 0 is the empty table and the
    * current pointer starts there.
    */
  private[graft] def initLog(dbFile: String): Unit =
    DuckDbLive.withConnection(dbFile) { c =>
      DuckDbLive.execute(
        c,
        """CREATE TABLE snapshots(
          |snapshot_id BIGINT PRIMARY KEY, parent_id BIGINT NOT NULL)""".stripMargin)
      DuckDbLive.execute(
        c,
        """CREATE TABLE manifests(
          |snapshot_id BIGINT NOT NULL, path VARCHAR NOT NULL,
          |n_rows BIGINT NOT NULL)""".stripMargin)
      DuckDbLive.execute(
        c,
        "CREATE TABLE current(pin BIGINT PRIMARY KEY CHECK (pin = 0), snapshot_id BIGINT NOT NULL)")
      DuckDbLive.execute(c, "INSERT INTO current VALUES (0, 0)")
      DuckDbLive.execute(c, "INSERT INTO snapshots VALUES (0, 0)")
    }

  /** Commit `snapshotId` whose manifest list is `files`, built on
    * `expectedParent`. TRANSACTIONAL + OPTIMISTIC: the conditional
    * pointer swap (`UPDATE current .. WHERE snapshot_id = parent`)
    * runs in the same transaction as the snapshot + manifest inserts,
    * so a stale parent (update count 0) rolls everything back and
    * returns false — and a RACING committer that touched the pointer
    * row first surfaces as DuckDB's optimistic-MVCC write-write
    * conflict, which is caught and reported as the same clean reject
    * (the loser retries against the new parent or gives up; it never
    * half-commits). Returns true iff this call advanced the table.
    */
  private[graft] def commit(
      dbFile: String,
      expectedParent: Long,
      snapshotId: Long,
      files: Seq[(String, Long)]): Boolean =
    DuckDbLive.withConnection(dbFile) { c =>
      c.setAutoCommit(false)
      try {
        val swapped = {
          val st = c.createStatement()
          try st.executeUpdate(
            s"""UPDATE current SET snapshot_id = $snapshotId
               WHERE pin = 0 AND snapshot_id = $expectedParent""") == 1
          finally st.close()
        }
        if (swapped) {
          val st = c.createStatement()
          try {
            st.executeUpdate(
              s"INSERT INTO snapshots VALUES ($snapshotId, $expectedParent)")
            files.foreach { case (p, n) =>
              st.executeUpdate(
                s"INSERT INTO manifests VALUES ($snapshotId, '$p', $n)")
            }
          } finally st.close()
          c.commit()
          true
        } else {
          c.rollback()
          false
        }
      } catch {
        case scala.util.control.NonFatal(_) =>
          // racing committer won the pointer row (MVCC write-write
          // conflict) — same clean reject as the stale-parent path
          try c.rollback()
          catch { case scala.util.control.NonFatal(_) => () }
          false
      } finally c.setAutoCommit(true)
    }

  /** Snapshot N's manifest list (path, n_rows) — the full file set. */
  private[graft] def manifest(dbFile: String, snapshotId: Long): Seq[(String, Long)] =
    DuckDbLive.withConnection(dbFile) { c =>
      DuckDbLive
        .queryRows(
          c,
          s"SELECT path, n_rows FROM manifests WHERE snapshot_id = $snapshotId ORDER BY path")
        .map(r => (r(0).toString, r(1).asInstanceOf[Number].longValue))
    }

  private[graft] def currentSnapshot(dbFile: String): Long =
    DuckDbLive.withConnection(dbFile) { c =>
      DuckDbLive
        .queryRows(c, "SELECT snapshot_id FROM current WHERE pin = 0")
        .head.head.asInstanceOf[Number].longValue
    }

  /** List the parquet part files Spark wrote under `dir`, with row
    * counts from the footers (the stats an Iceberg manifest carries).
    */
  private def partFiles(spark: SparkSession, dir: String): Seq[(String, Long)] =
    new java.io.File(dir)
      .listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => (f.getAbsolutePath, spark.read.parquet(f.getAbsolutePath).count()))
      .sortBy(_._1)
      .toSeq

  /** The s39 lifecycle (object scaladoc). Output: one row per committed
    * snapshot — manifest size, time-travel census, currency — plus the
    * injected stale commit's reject flag, all in-hash.
    */
  def snapshotLifecycle(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables
      .orders(spark, dir)
      .select(
        col("o_orderkey"),
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"),
        col("o_orderdate").cast("date").as("d"))

    if (DuckDbLive.available) {
      val base = java.nio.file.Files.createTempDirectory("graft_s39_")
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(base).iterator().asScala.toSeq.reverseIterator
            .foreach(f => java.nio.file.Files.deleteIfExists(f))
        } catch { case scala.util.control.NonFatal(_) => () }))
      val dbFile = s"$base/log.duckdb"
      initLog(dbFile)

      // epoch 0: the pre-cutoff slice, exactly 2 data files (repartition
      // pins the file count; both non-empty at every SF)
      o.filter(col("d") < lit(Cutoff).cast("date"))
        .drop("d")
        .repartition(2)
        .write.parquet(s"$base/b1")
      val files1 = partFiles(spark, s"$base/b1")
      val c1 = commit(dbFile, expectedParent = 0L, snapshotId = 1L, files1)

      // epoch 1: append the rest as 3 new files; snapshot 2's manifest
      // lists the FULL file set (snapshot-owns-its-manifest-list shape)
      o.filter(!(col("d") < lit(Cutoff).cast("date")))
        .drop("d")
        .repartition(3)
        .write.parquet(s"$base/b2")
      val files2 = partFiles(spark, s"$base/b2")
      val c2 = commit(dbFile, expectedParent = 1L, snapshotId = 2L, files1 ++ files2)

      // INJECTED stale commit: a writer that still thinks the table is
      // at snapshot 1 (the retried-job / concurrent-committer failure
      // mode) — the conditional swap must reject it cleanly
      val stale = commit(dbFile, expectedParent = 1L, snapshotId = 3L, files2)
      val conflictRejected = c1 && c2 && !stale &&
        currentSnapshot(dbFile) == 2L

      // time-travel read: reconstruct each snapshot FROM THE LOG ALONE
      // and census the actual parquet read (not the manifest counts) —
      // the hash proves the historical state is bit-reconstructible
      val rows = Seq(1L, 2L).map { snap =>
        val mf = manifest(dbFile, snap)
        val df = spark.read.parquet(mf.map(_._1): _*)
        val agg = df.agg(count(lit(1)), sum(col("cents"))).head()
        (snap, mf.size.toLong, agg.getLong(0), agg.getLong(1),
          snap == currentSnapshot(dbFile), conflictRejected)
      }
      rows
        .toDF("snapshot_id", "n_files", "n_rows", "sum_cents", "is_current",
          "conflict_rejected")
        .orderBy("snapshot_id")
    } else {
      // honest fallback: scratch censuses only; conflict_rejected=false
      // fails the oracle's TRUE, so a missing driver can never pass
      val s1 = o.filter(col("d") < lit(Cutoff).cast("date"))
        .agg(count(lit(1)), sum(col("cents"))).head()
      val s2 = o.agg(count(lit(1)), sum(col("cents"))).head()
      Seq(
        (1L, 2L, s1.getLong(0), s1.getLong(1), false, false),
        (2L, 5L, s2.getLong(0), s2.getLong(1), true, false))
        .toDF("snapshot_id", "n_files", "n_rows", "sum_cents", "is_current",
          "conflict_rejected")
        .orderBy("snapshot_id")
    }
  }

  /** s41 — STREAMING ingest through the commit log: the production path
    * that turns s02's per-epoch parquet appends into SNAPSHOT-ISOLATED
    * table commits (Iceberg/Delta streaming-sink shape). Each micro-batch
    * writes its rows as immutable parquet files, then commits snapshot
    * (epoch+1) on parent epoch with the CUMULATIVE manifest list — read
    * from the log itself, the source of truth for what the table already
    * contains. Exactly-once visibility is the LOG's property, not the
    * source's: the staged replay re-delivers batch-0 rows (file 2), and
    * they append as new data exactly once, while an injected RE-DELIVERED
    * COMMIT (a retried epoch-1 job still claiming parent 1 after the
    * table moved to snapshot 3) is rejected by the conditional swap —
    * its data files would stay invisible orphans, never half-visible
    * table state. Output: per-snapshot time-travel censuses (n_files
    * pinned by the per-batch repartition, rows/cents read from the
    * listed parquet) + currency + the exactly_once flag (all commits
    * landed, retry rejected, pointer at 3).
    *
    * Scale shape: the stream shuffles nothing (map-only projection per
    * batch); commit cost is metadata rows through one JDBC hop; the
    * time-travel reads plan plain parquet scans of the listed files.
    */
  def streamCommits(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val s = graft.streaming.StreamSessions.tuned(spark)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val cents = expr("CAST(floor(value * 100) AS BIGINT)").as("cents")

    if (DuckDbLive.available) {
      val base = java.nio.file.Files.createTempDirectory("graft_s41_")
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(base).iterator().asScala.toSeq.reverseIterator
            .foreach(f => java.nio.file.Files.deleteIfExists(f))
        } catch { case scala.util.control.NonFatal(_) => () }))
      val dbFile = s"$base/log.duckdb"
      initLog(dbFile)

      val staged = graft.streaming.Watermarks.stageBatches(s, dir)
      val schema = s.read.parquet(s"$staged/0.parquet").schema
      val commits = new java.util.concurrent.ConcurrentHashMap[Long, Boolean]()
      val q = s.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$staged/*.parquet")
        .writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .foreachBatch { (b: DataFrame, epoch: Long) =>
          // write-then-commit: files first (2 per epoch, pinned), then
          // the atomic log commit makes them visible — a crash between
          // the two leaves invisible orphans, never a torn table
          val out = s"$base/e$epoch"
          b.select(col("event_id"), col("user_id"), cents)
            .repartition(2)
            .write.parquet(out)
          commits.put(
            epoch,
            commit(dbFile, epoch, epoch + 1, manifest(dbFile, epoch) ++ partFiles(s, out)))
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      // injected RETRY of epoch 1's commit after the table advanced: the
      // swap's parent check (pointer = 3 ≠ 1) must reject it cleanly
      val retry = commit(dbFile, 1L, 2L, manifest(dbFile, 1L) ++ partFiles(s, s"$base/e1"))
      import scala.jdk.CollectionConverters._
      val exactlyOnce = commits.asScala.values.forall(identity) &&
        commits.size == 3 && !retry && currentSnapshot(dbFile) == 3L

      val rows = Seq(1L, 2L, 3L).map { snap =>
        val mf = manifest(dbFile, snap)
        val agg = spark.read.parquet(mf.map(_._1): _*)
          .agg(count(lit(1)), sum(col("cents"))).head()
        (snap, mf.size.toLong, agg.getLong(0), agg.getLong(1),
          snap == currentSnapshot(dbFile), exactlyOnce)
      }
      rows
        .toDF("snapshot_id", "n_files", "n_rows", "sum_cents", "is_current",
          "exactly_once")
        .orderBy("snapshot_id")
    } else {
      // honest fallback: batch censuses only; exactly_once=false fails
      // the oracle's TRUE, so a missing driver can never pass
      val ev = Tables.events(spark, dir)
        .select(cents, graft.ops.TimeCodec.dayInt(col("ts")).as("day"))
      val b0 = ev.filter(col("day") <= graft.streaming.Watermarks.splitDay)
        .agg(count(lit(1)), sum(col("cents"))).head()
      val ba = ev.agg(count(lit(1)), sum(col("cents"))).head()
      val br = ev.filter(col("day") < graft.streaming.Watermarks.replayBefore)
        .agg(count(lit(1)), sum(col("cents"))).head()
      Seq(
        (1L, 2L, b0.getLong(0), b0.getLong(1), false, false),
        (2L, 4L, ba.getLong(0), ba.getLong(1), false, false),
        (3L, 6L, ba.getLong(0) + br.getLong(0), ba.getLong(1) + br.getLong(1), true, false))
        .toDF("snapshot_id", "n_files", "n_rows", "sum_cents", "is_current",
          "exactly_once")
        .orderBy("snapshot_id")
    }
  }

  /** s40 — the INTEGRATION the pieces individually prove: incremental
    * refresh DRIVEN BY the commit log. s35 diffs the corpus against a
    * cutoff to find its delta; at 100 TB the production form diffs two
    * snapshots' MANIFEST LISTS — the files snapshot 2 added over
    * snapshot 1 ARE the delta, no corpus scan decides what changed.
    * Lifecycle: commit snapshot 1 and full-build the maintained view
    * from its manifest; commit snapshot 2 (append); refresh the view by
    * reading ONLY the manifest-diff files through s35's transactionally
    * idempotent ledger apply (`IncrementalRefresh.applyRefresh`);
    * INJECT a re-delivery of the same refresh batch (must be rejected);
    * verify the view per-bucket against a from-scratch aggregate over
    * snapshot 2's full manifest. Refresh cost is |added files| +
    * |view| — history is never re-read, and the decision input is pure
    * log metadata.
    */
  def snapshotRefresh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables
      .orders(spark, dir)
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"),
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast("long").as("bucket"),
        col("o_orderdate").cast("date").as("d"))
    def partials(df: DataFrame): Seq[(Long, Long, Long, Long)] = df
      .withColumn("fp",
        expr("""(o_orderkey * 1000003 + cents * 31 + o_custkey) % 1000000007"""))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"), sum(col("fp")).as("dg"))
      .collect() // bucket-domain-bounded (~80 order-month cells)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

    if (DuckDbLive.available) {
      val base = java.nio.file.Files.createTempDirectory("graft_s40_")
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(base).iterator().asScala.toSeq.reverseIterator
            .foreach(f => java.nio.file.Files.deleteIfExists(f))
        } catch { case scala.util.control.NonFatal(_) => () }))
      val dbFile = s"$base/log.duckdb"
      initLog(dbFile)
      IncrementalRefresh.initStore(dbFile)

      o.filter(col("d") < lit(Cutoff).cast("date")).drop("d")
        .repartition(2).write.parquet(s"$base/b1")
      val files1 = partFiles(spark, s"$base/b1")
      commit(dbFile, 0L, 1L, files1)
      // full build from SNAPSHOT 1's manifest (the log is the source of
      // truth for what the table contains, not the raw fixture)
      val built = IncrementalRefresh.applyRefresh(
        dbFile, 1L,
        partials(spark.read.parquet(manifest(dbFile, 1L).map(_._1): _*)))

      o.filter(!(col("d") < lit(Cutoff).cast("date"))).drop("d")
        .repartition(3).write.parquet(s"$base/b2")
      val files2 = partFiles(spark, s"$base/b2")
      commit(dbFile, 1L, 2L, files1 ++ files2)

      // the refresh delta = manifest(2) \ manifest(1): log metadata only
      val added = manifest(dbFile, 2L).map(_._1)
        .filterNot(manifest(dbFile, 1L).map(_._1).toSet)
      val addedPartials = partials(spark.read.parquet(added: _*))
      val refreshed = IncrementalRefresh.applyRefresh(dbFile, 2L, addedPartials)
      // injected re-delivery of the same refresh batch: ledger rejects
      val redelivered = IncrementalRefresh.applyRefresh(dbFile, 2L, addedPartials)

      // per-bucket from-scratch equality over snapshot 2's full manifest
      val scratch = spark.read.parquet(manifest(dbFile, 2L).map(_._1): _*)
        .withColumn("fp",
          expr("""(o_orderkey * 1000003 + cents * 31 + o_custkey) % 1000000007"""))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"), sum(col("fp")).as("dg"))
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      val viewRows = DuckDbLive.withConnection(dbFile) { c =>
        DuckDbLive
          .queryRows(c, "SELECT bucket, n_rows, sum_cents, dig FROM view_m ORDER BY bucket")
          .map(r => (
            r(0).asInstanceOf[Number].longValue,
            (r(1).asInstanceOf[Number].longValue,
              r(2).asInstanceOf[Number].longValue,
              r(3).asInstanceOf[Number].longValue)))
      }
      val viewOk = built && refreshed && !redelivered &&
        viewRows.toMap == scratch
      Seq((
        added.size.toLong,
        addedPartials.map(_._2).sum,
        viewRows.size.toLong,
        viewRows.map(_._2._1).sum,
        viewRows.map(_._2._2).sum,
        viewOk,
        1L,
        true))
        .toDF("n_files_added", "rows_added", "n_buckets", "n_rows_view",
          "sum_cents_view", "view_ok", "n_redeliveries_rejected", "refresh_live")
        .orderBy("n_files_added")
    } else {
      // honest fallback: from-scratch numbers, refresh_live=false fails
      // the oracle's TRUE
      val nb = o.select(countDistinct(col("bucket"))).head().getLong(0)
      val ra = o.filter(!(col("d") < lit(Cutoff).cast("date"))).count()
      val agg = o.agg(count(lit(1)), sum(col("cents"))).head()
      Seq((3L, ra, nb, agg.getLong(0), agg.getLong(1), false, 0L, false))
        .toDF("n_files_added", "rows_added", "n_buckets", "n_rows_view",
          "sum_cents_view", "view_ok", "n_redeliveries_rejected", "refresh_live")
        .orderBy("n_files_added")
    }
  }
}
