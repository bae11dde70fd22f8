package graft.queries

import graft.model.FeaturesConfig
import graft.ops.Tables
import graft.ops.Ckpt.RichCkpt
import graft.oracle.OracleSql._
import graft.pipeline.Features
import graft.sinks.{DuckDbLive, DuckDbSink}
import graft.streaming.StreamBars
import org.apache.spark.sql.functions._

/** s01-s03 — the sink/streaming capability surface (SURVEY.md §2.3
  * non-SQL operators). s03 has an oracle anyway: the streaming day-bar
  * build must hash-match the BATCH oracle (q04's SQL) — batch-stream
  * parity checked by the driver itself.
  */
object StreamDemos {

  private val cfg = FeaturesConfig()

  /** s69's memoized staging per source dir (the q212Staged pattern,
    * ADVICE r18): dir → temp root holding the engine's parquet export
    * and — when the driver is available — the DuckDB file with BOTH
    * ingested tables. The export + double ingest is the one-time
    * handoff cost; what repeats (and what the bench should time) is
    * the parity CHECK — the two in-DuckDB censuses.
    */
  private val s69Staged =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  val all: Seq[Q] = Seq(
    // O20-O21 + the LIVE appender path (DatabaseWriter.cs:141-212): the
    // flagship features frame goes to parquet + generated DDL (the
    // open-format, 100 TB handoff), then — via the offline-cached public
    // duckdb_jdbc driver (DuckDbLive) — the DDL executes on a real DuckDB
    // file and every row is appended through the NATIVE appender with the
    // reference's flush cadence. The returned facts are READ BACK from the
    // DuckDB table over JDBC, so the hash check proves the full round
    // trip: Spark plan → parquet → appender → DuckDB storage → SQL. The
    // oracle recomputes the same integer-exact census (plus the exact DDL
    // text) from the feature CTEs; `live_appender` is only TRUE when the
    // live sink actually ran.
    Q(
      "s01_duckdb_sink",
      (s, dir) => {
        import s.implicits._
        val out = java.nio.file.Files
          .createTempDirectory("graft_s01_")
          .toAbsolutePath
          .toString
        val df = Features.featuresFull(Tables.events(s, dir), cfg, ordered = false)
        val (ddl, _) = DuckDbSink.write(df, "Features", out)
        val exported = s.read.parquet(out) // float32, ordinal column order
        val (live, facts) =
          if (DuckDbLive.available)
            (true, DuckDbLive.withConnection(s"$out/features.duckdb") { c =>
              DuckDbLive.execute(c, ddl)
              DuckDbLive.appendAll(c, "Features", exported, commitEvery = 500)
              DuckDbLive
                .queryRow(
                  c,
                  """SELECT count(*), count(DISTINCT user_id), min("Day"), max("Day"),
                    |CAST(sum("Time") AS BIGINT),
                    |count(CASE WHEN "Close" > "Open" THEN 1 END)
                    |FROM "Features"""".stripMargin
                )
                .map(_.asInstanceOf[Number].longValue)
            })
          else // honest fallback: the oracle expects TRUE, so a missing
            // driver surfaces as a hash mismatch, not a silent pass
            (false, {
              val r = exported
                .agg(
                  count(lit(1)),
                  countDistinct(col("user_id")),
                  min(col("Day")),
                  max(col("Day")),
                  sum(col("Time")),
                  count(when(col("Close") > col("Open"), 1))
                )
                .head()
              (0 until 6).map(r.getLong)
            })
        Seq((ddl, live, facts(0), facts(1), facts(2), facts(3), facts(4), facts(5)))
          .toDF("ddl", "live_appender", "n_rows", "n_users", "min_day", "max_day", "sum_time", "n_up")
      },
      Some(s"""WITH $featCte,
        f AS (SELECT $featuresSelect FROM feat WHERE rn >= ${cfg.barsRequiredToTrade})
        SELECT '${DuckDbSink.ddlFor(Features.featuresF32Schema, "Features", useFloat32 = false)}' AS ddl,
          TRUE AS live_appender,
          count(*) AS n_rows,
          count(DISTINCT user_id) AS n_users,
          min("Day") AS min_day,
          max("Day") AS max_day,
          CAST(sum("Time") AS BIGINT) AS sum_time,
          count(CASE WHEN CAST("Close" AS REAL) > CAST("Open" AS REAL) THEN 1 END) AS n_up
        FROM f ORDER BY n_rows""")
    ),
    // s02: commit-cadence analog — epoch-batched foreachBatch export with
    // checkpointing. The REAL sink is the per-epoch parquet append inside
    // foreachBatch (swap in any transactional writer there for production;
    // the checkpoint makes each epoch a resumable transaction). The
    // (epoch, rows) summary is demo reporting only, and is verified
    // against a read-back of the written files.
    Q(
      "s02_commit_cadence",
      (outer, dir) => {
        val s = graft.streaming.StreamSessions.tuned(outer)
        import s.implicits._
        import org.apache.spark.sql.streaming.Trigger
        val base = java.nio.file.Files.createTempDirectory("graft_s02_").toAbsolutePath
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        // the staged multi-file replay gives one epoch per file — each
        // epoch is a transaction (append + checkpoint), the commit-cadence
        // analog of CommitEveryRows/CHECKPOINT
        val staged = graft.streaming.Watermarks.stageBatches(s, dir)
        val schema = s.read.parquet(s"$staged/0.parquet").schema
        val epochs = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
        val q = s.readStream
          .schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$staged/*.parquet")
          .writeStream
          .option("checkpointLocation", s"$base/ckpt")
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, epoch: Long) =>
            b.write.mode("append").parquet(s"$base/out")
            epochs.put(epoch, b.count())
            ()
          }
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        import scala.jdk.CollectionConverters._
        // the sink of record is the parquet dir — read it back and require
        // the committed rows to equal the per-epoch counts (exactly-once
        // under AvailableNow with no retries)
        val written = s.read.parquet(s"$base/out").count()
        val reported = epochs.asScala.values.sum
        require(
          written == reported,
          s"s02 sink mismatch: $written rows in parquet vs $reported reported across epochs"
        )
        epochs.asScala.toSeq.sortBy(_._1).toDF("epoch", "n_rows")
      },
      // Deterministic staging (ordered files, maxFilesPerTrigger=1, fresh
      // checkpoint) makes the epoch ledger batch-expressible: epoch i's
      // row count is staged file i's filter over `events`. A dropped or
      // merged epoch (commit-cadence regression) changes the ledger and
      // fails the hash.
      Some(s"""SELECT CAST(0 AS BIGINT) AS epoch,
            (SELECT CAST(count(*) AS BIGINT) FROM events
             WHERE ${dayInt("ts")} <= ${graft.streaming.Watermarks.splitDay}) AS n_rows
          UNION ALL SELECT CAST(1 AS BIGINT),
            (SELECT CAST(count(*) AS BIGINT) FROM events
             WHERE ${dayInt("ts")} > ${graft.streaming.Watermarks.splitDay})
          UNION ALL SELECT CAST(2 AS BIGINT),
            (SELECT CAST(count(*) AS BIGINT) FROM events
             WHERE ${dayInt("ts")} < ${graft.streaming.Watermarks.replayBefore})
          ORDER BY epoch""")
    ),
    // s03: streaming day bars — watermarked tumbling window, verified
    // against the BATCH oracle (parity with q04).
    Q(
      "s03_stream_bars",
      (s, dir) => StreamBars.runDayBars(s, s"$dir/events.parquet"),
      Some(s"WITH $barsCte SELECT * FROM bars ORDER BY user_id, day")
    ),
    // s04: stateful streaming features (flatMapGroupsWithState, day-keyed
    // ring-buffer state) — verified against the BATCH oracle (parity with
    // q18, the flagship pipeline).
    Q(
      "s04_stream_features",
      (s, dir) => graft.streaming.StreamFeatures.runFeatures(s, s"$dir/events.parquet"),
      Some(s"""WITH $featCte SELECT $featuresSelect FROM feat
        WHERE rn >= ${cfg.barsRequiredToTrade} ORDER BY user_id, day""")
    ),
    // s06: telemetry — QueryExecutionListener + accumulator counters (O23).
    // The accumulator's distributed tally must equal the true row count
    // (the reference's committed-rows ≡ actual-rows invariant,
    // `ExporterDatabaseManager.cs:183-185`), and the oracle expects
    // listener_fired = TRUE — both telemetry channels are hash-enforced.
    Q(
      "s06_telemetry",
      (s, dir) => graft.telemetry.Telemetry.instrumentedScan(s, dir),
      Some("""SELECT 'events_scan' AS action,
          CAST(count(*) AS BIGINT) AS rows_counted,
          TRUE AS listener_fired
        FROM events ORDER BY action""")
    ),
    // s07: watermark + late-data handling over a deterministic two-batch
    // replay (semantics asserted against a Scala model in WatermarkSpec).
    Q(
      "s07_watermark_late",
      (s, dir) => graft.streaming.Watermarks.lateDataCounts(s, dir),
      // The three-batch replay is deterministic, so the post-watermark
      // append output IS batch-expressible: day windows whose END is at
      // or before the final watermark (max ts - 1 day) are exactly the
      // finalized-and-emitted set, each source row counted once — the
      // batch-2 replay rows are all late beyond the watermark and
      // contribute nothing (if the stream failed to drop them, append
      // mode would emit duplicate windows and the hash would diverge).
      Some("""WITH wm AS (SELECT max(ts) - INTERVAL 1 DAY AS wm FROM events)
        SELECT user_id,
          CAST(year(d)*10000 + month(d)*100 + day(d) AS BIGINT) AS day,
          CAST(count(*) AS BIGINT) AS n_events
        FROM (SELECT user_id, date_trunc('day', ts) AS d FROM events), wm
        WHERE d + INTERVAL 1 DAY <= wm
        GROUP BY user_id, d ORDER BY user_id, day""")
    ),
    // s08: bucketed co-located join — both sides bucket-aligned on the
    // join key, sort-merge join with zero exchanges (asserted in-row).
    Q(
      "s08_bucketed_join",
      (s, dir) => graft.ops.BucketedJoin.demo(s, dir),
      // Join cardinality + revenue are plain SQL; the oracle expects
      // join_without_shuffle = TRUE, so the zero-exchange bucketed-join
      // assertion is HASH-CHECKED (an exchange sneaking back into the
      // join plan flips the flag and fails the gate). Revenue decimal
      // discipline matches q56: per-term cast to DECIMAL(18,4), exact
      // decimal sum, one final cast to double.
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
          CAST(sum(CAST(l_extendedprice * (1e0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
          TRUE AS join_without_shuffle
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ORDER BY n_rows""")
    ),
    // s09: salted skew join — lineitem⋈orders spread over 8 salts; the
    // oracle is the plain join (salting must not change results).
    Q(
      "s09_salted_join",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir).select("o_orderkey", "o_orderstatus")
        graft.ops.Salting
          .saltedJoin(
            l, o,
            col("l_orderkey"), col("o_orderkey"),
            concat_ws(":", col("l_orderkey"), col("l_linenumber")),
            salts = 8
          )
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("n_rows"),
            sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)"))
              .cast("double")
              .as("revenue")
          )
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(SUM(CAST(l_extendedprice * (1e0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    ),
    // s10: Day-partitioned export + partition-pruned read-back.
    Q(
      "s10_partitioned_export",
      (s, dir) => graft.ops.PartitionedExport.demo(s, dir),
      // The day counts are batch-expressible through the q18 feature CTE
      // chain, and the oracle expects pruned = TRUE — so the in-plan
      // partition-pruning assertion is HASH-CHECKED: if a regression ever
      // makes the read-back scan more than one partition, the Spark side
      // emits false and the gate fails.
      Some(s"""WITH $featCte,
          f AS (SELECT user_id, day FROM feat WHERE rn >= ${cfg.barsRequiredToTrade})
        SELECT CAST(count(DISTINCT day) AS BIGINT) AS n_days,
          CAST(count(*) AS BIGINT) AS rows_total,
          CAST(sum(CASE WHEN day = (SELECT min(day) FROM f) THEN 1 ELSE 0 END) AS BIGINT) AS rows_one_day,
          TRUE AS pruned
        FROM f ORDER BY n_days""")
    ),
    // s11: streaming exact dedup — dropDuplicates over a replayed stream
    // must exactly undo the duplication (oracle = the original table).
    Q(
      "s11_stream_dedup",
      (s, dir) => graft.streaming.Watermarks.streamDedupCounts(s, dir),
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY user_id ORDER BY user_id""")
    ),
    // s13: runtime bloom-filter join — Catalyst's InjectRuntimeFilter
    // builds a bloom filter from the SELECTIVE side of a shuffle join at
    // runtime and pushes it as a semi-filter onto the big side's scan, so
    // at 100 TB the fact table drops non-matching rows BEFORE the shuffle
    // (the AQE-era replacement for hand-rolled pre-join filters; result-
    // transparent, which is exactly what the oracle checks). The demo
    // session disables auto-broadcast to force the shuffle join and
    // zeroes the application-side size threshold (tuned for real
    // clusters, not sf0.1); the query asserts in-row that the filter
    // actually injected into the optimized plan.
    Q(
      "s13_runtime_filter_join",
      (outer, dir) => {
        val s = outer.newSession()
        s.conf.set("spark.sql.session.timeZone", "UTC")
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
        val l = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
        val j = l
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n_rows"),
            sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty")
          )
          .orderBy("o_orderpriority")
        val opt = j.queryExecution.optimizedPlan.toString
        require(
          opt.contains("bloom_filter_agg") || opt.contains("might_contain"),
          "runtime bloom filter did not inject into the join"
        )
        j
      },
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    ),
    // s15: JSONL export round-trip — the training-data interchange
    // format: documents written as JSON lines (the export), read back
    // under a pinned schema (no inference pass), content fidelity proven
    // byte-exactly via md5 against the ORIGINAL table as oracle. At
    // scale this is the map-only export stage of a training pipeline;
    // JSON string escaping must round-trip exactly for the hashes to
    // match.
    Q(
      "s15_jsonl_export",
      (s, dir) => {
        val out = java.nio.file.Files.createTempDirectory("graft_s15_").toAbsolutePath.toString
        val docs = Tables
          .documents(s, dir)
          .select("doc_id", "text", "lang", "source", "n_chars")
        docs.coalesce(4).write.mode("overwrite").json(out)
        s.read
          .schema(docs.schema)
          .json(out)
          .select(col("doc_id"), col("n_chars"), md5(col("text")).as("text_md5"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, n_chars, md5(text) AS text_md5
        FROM documents ORDER BY doc_id""")
    ),
    // s14: streaming IVF cell assignment — codebook trained before the
    // stream, assignment fully map-side (literal argmax, stream-safe),
    // running per-cell census via streaming aggregation state; oracle =
    // the identical batch assignment (stream-batch parity).
    Q(
      "s14_stream_cell_assign",
      (s, dir) => graft.streaming.StreamAssign.cellCensus(s, dir),
      Some(s"""${SimQueries.ivfCtes}
        SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(min(vec_id) AS BIGINT) AS min_vec
        FROM assigned GROUP BY cell ORDER BY cell""")
    ),
    // s12: streaming near-dup clustering — running aggregate keyed by the
    // content fingerprint (q32's minhash), state maintained across
    // micro-batches; oracle = the identical batch group-by (stream-batch
    // parity).
    Q(
      "s12_stream_neardup",
      (s, dir) => graft.streaming.Watermarks.streamNearDupClusters(s, dir),
      Some {
        val sh = shingles("string_split(text, ' ')", 3)
        s"""SELECT fp, rep_doc, n_dups FROM (
          SELECT list_aggregate(list_transform($sh, x -> ${h60("x")}), 'min') AS fp,
                 CAST(min(doc_id) AS BIGINT) AS rep_doc,
                 CAST(count(*) AS BIGINT) AS n_dups
          FROM documents GROUP BY 1)
        ORDER BY rep_doc"""
      }
    ),
    // s16: watermarked STREAM-STREAM inner join (alert stream ⋈ tick
    // stream, equality key + time-range condition so both sides' state is
    // watermark-evicted). The staged batch-2 replay re-delivers batch-0
    // rows far behind the watermark; the join must drop them on input —
    // re-matching them would duplicate every early pair and diverge from
    // the oracle, which is the plain batch join over the ORIGINAL events
    // table (the s07/s11 honesty pattern).
    // s17: streaming exact dedup with BOUNDED state — the production form
    // of s11 (dropDuplicatesWithinWatermark: a year of stream holds a day
    // of keys, not every key ever seen). The staged file-1 replay
    // re-delivers day-26 rows while their originals' dedup state is still
    // live, so the deduped stream must equal the original table.
    Q(
      "s17_stream_dedup_bounded",
      (s, dir) => graft.streaming.Watermarks.streamDedupBoundedCounts(s, dir),
      Some(s"""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
          min(${dayInt("ts")}) AS min_day, max(${dayInt("ts")}) AS max_day
        FROM events GROUP BY user_id ORDER BY user_id""")
    ),
    Q(
      "s16_stream_stream_join",
      (s, dir) => graft.streaming.StreamJoins.alertEnrichment(s, dir),
      Some(s"""WITH a AS (SELECT event_id, user_id, ts FROM events
          WHERE value > ${graft.streaming.StreamJoins.AlertThreshold.toInt}e0),
        p AS (SELECT a.user_id, a.event_id AS a_event_id, t.ts AS t_ts
          FROM events t JOIN a ON t.user_id = a.user_id
            AND t.ts >= a.ts
            AND t.ts <= a.ts + INTERVAL ${graft.streaming.StreamJoins.JoinRangeHours} HOUR)
        SELECT user_id, count(DISTINCT a_event_id) AS n_alerts,
          CAST(count(*) AS BIGINT) AS n_pairs,
          max(${dayInt("t_ts")}) AS last_tick_day
        FROM p GROUP BY user_id ORDER BY user_id""")
    ),
    // s18: STREAM-STATIC broadcast join — the third Structured Streaming
    // join class (stream-stream = s16, stateful dedup = s11/s17): the
    // staged fact replay enriched per micro-batch against the static
    // customer dimension. Stateless — no watermark, no state store; the
    // dim is re-broadcast each trigger (asserted in-row from the final
    // micro-batch's IncrementalExecution plan via broadcast_per_batch).
    // Stateless
    // also means no dedup: the replayed pre-replayBefore slice joins
    // AGAIN, so the oracle mirrors the staged delivery (events UNION ALL
    // the replayed slice) — n_rows counts the duplicates, n_events
    // (distinct) does not, pinning the pass-through semantics.
    Q(
      "s18_stream_static_join",
      (s, dir) => graft.streaming.StreamStaticJoin.segmentEnrichment(s, dir),
      Some(s"""WITH f AS (
          SELECT event_id, user_id, value, ts FROM events
          UNION ALL
          SELECT event_id, user_id, value, ts FROM events
          WHERE ${dayInt("ts")} < ${graft.streaming.Watermarks.replayBefore}),
        p AS (SELECT c.c_mktsegment AS segment, f.event_id, f.user_id, f.value, f.ts
              FROM f JOIN customer c ON f.user_id = c.c_custkey)
        SELECT segment, CAST(count(*) AS BIGINT) AS n_rows,
          count(DISTINCT event_id) AS n_events,
          count(DISTINCT user_id) AS n_users,
          CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
          max(${dayInt("ts")}) AS last_day,
          TRUE AS broadcast_per_batch
        FROM p GROUP BY segment ORDER BY segment""")
    ),
    // s19: dynamic partition pruning — completes the pruning trio (s10
    // static partition pruning, s13 runtime row pruning): the
    // day-partitioned fact table joined to a dim whose day set exists
    // only at runtime must carry a dynamicpruningexpression in its scan's
    // PartitionFilters (scan lists ONLY reachable days — at 100 TB the
    // difference between a year and a handful of days). Asserted in-row
    // and pinned TRUE by the oracle, the s10/s13 discipline.
    Q(
      "s19_dynamic_pruning",
      (s, dir) => graft.ops.DynamicPruning.demo(s, dir),
      Some(s"""WITH hot AS (SELECT DISTINCT ${dayInt("ts")} AS day FROM events
            WHERE event_type = '${graft.ops.DynamicPruning.HotEventType}'
              AND value > ${graft.ops.DynamicPruning.HotValueMin.toInt}e0),
          f AS (SELECT ${dayInt("ts")} AS day, user_id, value FROM events)
        SELECT count(DISTINCT f.day) AS n_days, CAST(count(*) AS BIGINT) AS n_rows,
          count(DISTINCT user_id) AS n_users,
          CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
          TRUE AS dpp_pruned
        FROM f JOIN hot ON f.day = hot.day ORDER BY n_days""")
    ),
    // s20: AQE skew-join rescue — the AUTOMATIC remedy beside s09's
    // manual salting: ~80% of the fact rows collapse onto one join key
    // (k=0), auto-broadcast is disabled (cluster-scale posture, the s13
    // discipline), and AQE's OptimizeSkewedJoin must split the oversized
    // shuffle partition at runtime (SortMergeJoin(skew=true) in the
    // FINAL adaptive plan — only visible after execution, so the demo
    // executes first and folds the flag into the returned row; the
    // oracle pins TRUE). Skew thresholds are set for the fixture scale
    // (8 KB threshold/advisory vs the 256 MB production defaults) —
    // the mechanism, not the numbers, is the demonstration. Splitting
    // duplicates the matching dim rows per chunk, result-transparent:
    // exactly what the oracle hash checks.
    Q(
      "s20_aqe_skew_join",
      (outer, dir) => {
        val s = outer.newSession()
        s.conf.set("spark.sql.session.timeZone", "UTC")
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        // skew detection reads COMPRESSED shuffle bytes (the sf0.001 hot
        // partition is just 640 B — constant columns compress brutally
        // well), so fixed thresholds can't serve every fixture SF; scale
        // them to the input (input/256, floor 256 B) — the production
        // discipline of sizing advisory bytes to data/parallelism, and
        // it bounds the split count at any SF
        val thr = math.max(256L, new java.io.File(s"$dir/events.parquet").length() / 256)
        s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", thr.toString)
        s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", thr.toString)
        s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        import s.implicits._
        def keyed() = Tables
          .events(s, dir)
          .withColumn("k", when(pmod(col("user_id"), lit(4)) === 3, col("user_id")).otherwise(lit(0L)))
        // AQE splits a skewed reduce partition by MAP-INDEX ranges, so
        // the fixture's single-file scan (ONE mapper — local parquet is
        // one row group) is unsplittable however skewed; the round-robin
        // repartition manufactures the multi-mapper input every real
        // fact scan has (thousands of tasks at 100 TB). The dim side
        // materializes (localCheckpoint) because OptimizeSkewedJoin
        // pattern-matches Sort(ShuffleQueryStage) exactly — a distinct's
        // final HashAggregate between them blocks the rewrite (splitting
        // under an aggregate would duplicate rows into it).
        val facts = keyed().repartition(8)
        val dim =
          keyed().select(col("k")).distinct().withColumn("dim_tag", col("k") * 2).ckpt()
        // n_keys comes from the (tiny, materialized) dim side, NOT a
        // count(DISTINCT k) over the join: a distinct would REUSE the
        // join output's hash partitioning, so splitting the skewed
        // partition would cost an extra exchange and AQE (correctly)
        // reverts the rewrite rather than pay it — the audit facet must
        // not change the plan it audits
        val nKeys = dim.count()
        val agg = facts
          .join(dim, "k")
          .agg(
            count(lit(1)).as("n_rows"),
            sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"),
            sum(col("dim_tag")).as("sum_tag")
          )
        // collect() (NOT head(): head executes a separate limited
        // QueryExecution, leaving agg's own adaptive plan unexecuted and
        // the skew flag unreadable) then read the FINAL adaptive plan
        val row = agg.collect()(0)
        val skewSplit = agg.queryExecution.executedPlan.toString.contains("skew=true")
        Seq((row.getLong(0), nKeys, row.getDouble(1), row.getLong(2), skewSplit))
          .toDF("n_rows", "n_keys", "sum_value", "sum_tag", "skew_split")
      },
      Some("""WITH f AS (SELECT CASE WHEN user_id % 4 = 3 THEN user_id ELSE 0 END AS k, value
            FROM events),
          d AS (SELECT DISTINCT k, k * 2 AS dim_tag FROM f)
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
          count(DISTINCT f.k) AS n_keys,
          CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
          CAST(SUM(dim_tag) AS BIGINT) AS sum_tag,
          TRUE AS skew_split
        FROM f JOIN d ON f.k = d.k ORDER BY n_rows""")
    ),
    // s21: streaming SESSION windows — the session-merging state path
    // (q47's sessionization under a watermark; Watermarks.scala scaladoc
    // for the merge/finalize/evict trace). The deterministic replay makes
    // the append output batch-expressible: q47's gaps-and-islands
    // sessions over the original events, kept iff session end
    // (last ts + 2h gap) is at or before the final watermark
    // (max ts − 1 day) — s07's emission rule applied to merged sessions.
    // Late batch-2 replays must be dropped BEFORE state, or re-opened
    // sessions would re-emit and the hash would diverge.
    Q(
      "s21_stream_session_windows",
      (s, dir) => graft.streaming.Watermarks.sessionWindowCounts(s, dir),
      Some("""WITH wm AS (SELECT max(ts) - INTERVAL 1 DAY AS wm FROM events),
        flagged AS (
          SELECT user_id, ts, value,
            CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 2 HOUR
                 THEN 1 ELSE 0 END AS newsess
          FROM events),
        sess AS (
          SELECT *, sum(newsess) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged),
        agg AS (
          SELECT user_id, min(ts) AS session_start,
            max(ts) + INTERVAL 2 HOUR AS session_end,
            CAST(count(*) AS BIGINT) AS n_events,
            CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
          FROM sess GROUP BY user_id, sid)
        SELECT user_id, session_start, n_events, sum_value
        FROM agg, wm WHERE session_end <= wm.wm
        ORDER BY user_id, session_start""")
    ),
    // s22: checkpoint recovery — the stop/restart lifecycle against a
    // real parquet file sink (Recovery.scala scaladoc): run 1 drains
    // generation 0 and stops; generation 1 arrives; a NEW query on the
    // SAME checkpoint resumes. run2_rows folds the resumed query's
    // numInputRows and must equal generation 1 alone (a failed resume
    // reprocesses generation 0 and diverges both the fold and the
    // census); the per-user census over the sink — read through its
    // _spark_metadata commit log — must equal the source exactly once
    // across the restart boundary.
    Q(
      "s22_checkpoint_recovery",
      (s, dir) => graft.streaming.Recovery.checkpointRecoveryCounts(s, dir),
      Some(s"""WITH g AS (SELECT user_id, value,
          CASE WHEN CAST(year(ts)*10000 + month(ts)*100 + day(ts) AS BIGINT)
                 <= ${graft.streaming.Watermarks.splitDay} THEN 0 ELSE 1 END AS gen
        FROM events)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
          CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
          (SELECT CAST(count(*) AS BIGINT) FROM g WHERE gen = 0) AS run1_rows,
          (SELECT CAST(count(*) AS BIGINT) FROM g WHERE gen = 1) AS run2_rows
        FROM g GROUP BY user_id ORDER BY user_id""")
    ),
    // s23: UPDATE output mode (Watermarks.updateModeCounts scaladoc) —
    // completes the output-mode triad. The oracle mirrors the staged
    // three-batch delivery: n_emissions = batches touching the user
    // (per-batch membership from the day splits), n_events_final =
    // count(*) PLUS the replayed slice (no watermark → late rows are
    // accepted into the aggregate, s07's contrast).
    Q(
      "s23_update_mode",
      (s, dir) => graft.streaming.Watermarks.updateModeCounts(s, dir),
      Some(s"""WITH d AS (SELECT user_id,
          CAST(year(ts)*10000 + month(ts)*100 + day(ts) AS BIGINT) AS day
        FROM events)
        SELECT user_id,
          CAST(count(*) + sum(CASE WHEN day < ${graft.streaming.Watermarks.replayBefore}
                                   THEN 1 ELSE 0 END) AS BIGINT) AS n_events_final,
          CAST(max(CASE WHEN day <= ${graft.streaming.Watermarks.splitDay} THEN 1 ELSE 0 END)
             + max(CASE WHEN day > ${graft.streaming.Watermarks.splitDay} THEN 1 ELSE 0 END)
             + max(CASE WHEN day < ${graft.streaming.Watermarks.replayBefore} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_emissions
        FROM d GROUP BY user_id ORDER BY user_id""")
    ),
    // s24: transformWithState / arbitrary-state v2 (StateV2 scaladoc) —
    // the oracle pins the three facets from the same staged delivery:
    // the ValueState count accepts the replay, the MapState day registry
    // is idempotent under it (count(DISTINCT day) — batch-2 days are a
    // subset of batch-0's), and emissions = touched batches per user.
    Q(
      "s24_transform_with_state",
      (s, dir) => graft.streaming.StateV2.transformWithStateCounts(s, dir),
      Some(s"""WITH d AS (SELECT user_id,
          CAST(year(ts)*10000 + month(ts)*100 + day(ts) AS BIGINT) AS day
        FROM events)
        SELECT user_id,
          CAST(count(*) + sum(CASE WHEN day < ${graft.streaming.Watermarks.replayBefore}
                                   THEN 1 ELSE 0 END) AS BIGINT) AS n_events_final,
          CAST(count(DISTINCT day) AS BIGINT) AS n_days_final,
          CAST(max(CASE WHEN day <= ${graft.streaming.Watermarks.splitDay} THEN 1 ELSE 0 END)
             + max(CASE WHEN day > ${graft.streaming.Watermarks.splitDay} THEN 1 ELSE 0 END)
             + max(CASE WHEN day < ${graft.streaming.Watermarks.replayBefore} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_emissions
        FROM d GROUP BY user_id ORDER BY user_id""")
    ),
    // s25: event-time timers (StateV2.timerFinalizedDailyCounts
    // scaladoc) — the oracle is the batch daily census over finalized
    // days only: day end ≤ max(ts) − 24 h (the final watermark), the
    // replay excluded by construction (late rows dropped / guarded).
    Q(
      "s25_timer_finalize",
      (s, dir) => graft.streaming.StateV2.timerFinalizedDailyCounts(s, dir),
      Some("""WITH ev AS (SELECT user_id,
          CAST(year(ts)*10000 + month(ts)*100 + day(ts) AS BIGINT) AS day,
          CAST(floor(epoch(ts) / 86400) AS BIGINT) AS eday,
          CAST(floor(epoch(ts)) AS BIGINT) AS sec
        FROM events),
        wm AS (SELECT max(sec) - 86400 AS wm_sec FROM ev)
        SELECT user_id, day, CAST(count(*) AS BIGINT) AS n_events
        FROM ev, wm WHERE (eday + 1) * 86400 <= wm_sec
        GROUP BY user_id, day ORDER BY user_id, day""")
    ),
    // s26: initial-state bootstrap (StateV2.bootstrappedCounts
    // scaladoc) — the oracle pins the seed asymmetry: the counter
    // includes the un-streamed batch-0 slice (+ replay), the day
    // registry holds ONLY streamed days, emissions = streamed batches
    // touching the user.
    Q(
      "s26_initial_state",
      (s, dir) => graft.streaming.StateV2.bootstrappedCounts(s, dir),
      Some(s"""WITH d AS (SELECT user_id,
          CAST(year(ts)*10000 + month(ts)*100 + day(ts) AS BIGINT) AS day
        FROM events)
        SELECT user_id,
          CAST(count(*) + sum(CASE WHEN day < ${graft.streaming.Watermarks.replayBefore}
                                   THEN 1 ELSE 0 END) AS BIGINT) AS n_events_final,
          CAST(count(DISTINCT CASE WHEN day > ${graft.streaming.Watermarks.splitDay}
                                     OR day < ${graft.streaming.Watermarks.replayBefore}
                                   THEN day END) AS BIGINT) AS n_days_final,
          CAST(max(CASE WHEN day > ${graft.streaming.Watermarks.splitDay} THEN 1 ELSE 0 END)
             + max(CASE WHEN day < ${graft.streaming.Watermarks.replayBefore} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_emissions
        FROM d GROUP BY user_id ORDER BY user_id""")
    ),
    // s27: stream-stream LEFT OUTER join (StreamJoins.alertOuterEnrichment
    // scaladoc) — matched pairs mirror the batch range join
    // unconditionally; null-padded rows exist ONLY for alerts whose
    // match horizon (a_ts + range) fell behind the final watermark
    // with no calm tick inside it — the state-eviction finalization cut
    // the oracle reproduces. The watermark is the MULTI-WATERMARK MIN:
    // each side tracks its own max event time over its FILTERED rows,
    // and the global watermark is the lesser minus the delay — a wm
    // computed from max(ts) over all events is wrong whenever the
    // newest event's value falls in neither side's filter.
    Q(
      "s27_stream_outer_join",
      (s, dir) => graft.streaming.StreamJoins.alertOuterEnrichment(s, dir),
      Some(s"""WITH a AS (SELECT event_id AS a_id, user_id AS u, ts AS a_ts
          FROM events WHERE value > ${graft.streaming.StreamJoins.AlertThreshold}),
        t AS (SELECT event_id AS t_id, user_id AS u, ts AS t_ts
          FROM events WHERE value < ${graft.streaming.StreamJoins.CalmThreshold}),
        m AS (SELECT a.u, a.a_id, t.t_ts FROM a JOIN t ON a.u = t.u
          AND t.t_ts > a.a_ts
          AND t.t_ts <= a.a_ts + INTERVAL ${graft.streaming.StreamJoins.JoinRangeHours} HOUR),
        wm AS (SELECT least((SELECT max(a_ts) FROM a), (SELECT max(t_ts) FROM t))
          - INTERVAL 24 HOUR AS w),
        unm AS (SELECT a.u, a.a_id FROM a, wm
          WHERE a.a_ts + INTERVAL ${graft.streaming.StreamJoins.JoinRangeHours} HOUR < wm.w
            AND NOT EXISTS (SELECT 1 FROM m WHERE m.a_id = a.a_id))
        SELECT user_id,
          CAST(count(CASE WHEN matched THEN 1 END) AS BIGINT) AS n_pairs,
          CAST(count(CASE WHEN NOT matched THEN 1 END) AS BIGINT) AS n_unmatched,
          max(CASE WHEN matched THEN day END) AS last_matched_day
        FROM (SELECT u AS user_id, TRUE AS matched,
                CAST(year(t_ts)*10000 + month(t_ts)*100 + day(t_ts) AS BIGINT) AS day
              FROM m
              UNION ALL SELECT u, FALSE, NULL FROM unm) x
        GROUP BY user_id ORDER BY user_id""")
    ),
    // s28: chained stateful operators (Watermarks.chainedDedupDailyCounts
    // scaladoc) — deliberately the SAME oracle SQL as s25: dedup undoes
    // the replay (the events table is already exactly-once), the window
    // aggregate finalizes days whose end passed max(ts) − 24 h. Three
    // implementations, one semantics, one hash.
    Q(
      "s28_chained_stateful",
      (s, dir) => graft.streaming.Watermarks.chainedDedupDailyCounts(s, dir),
      Some("""WITH ev AS (SELECT user_id,
          CAST(year(ts)*10000 + month(ts)*100 + day(ts) AS BIGINT) AS day,
          CAST(floor(epoch(ts) / 86400) AS BIGINT) AS eday,
          CAST(floor(epoch(ts)) AS BIGINT) AS sec
        FROM events),
        wm AS (SELECT max(sec) - 86400 AS wm_sec FROM ev)
        SELECT user_id, day, CAST(count(*) AS BIGINT) AS n_events
        FROM ev, wm WHERE (eday + 1) * 86400 <= wm_sec
        GROUP BY user_id, day ORDER BY user_id, day""")
    ),
    // s29: Observation API in-flight metrics (df.observe →
    // CollectMetricsExec) — the SQL-native telemetry channel beside
    // s06's accumulator/listener pair: gate metrics collected on the
    // SAME pass as the driving noop write (no second scan), and the
    // emitted row IS Observation.get, so the oracle hash proves the
    // in-flight numbers equal a from-scratch recomputation.
    Q(
      "s29_observe_metrics",
      (s, dir) => graft.telemetry.Telemetry.observedGate(s, dir),
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          CAST(max(len(text)) AS BIGINT) AS max_len,
          CAST(count(*) FILTER (lang IS NULL) AS BIGINT) AS n_null_lang
        FROM documents ORDER BY n_rows""")
    ),
    // s30: streaming CDC upsert into a live DuckDB table — foreachBatch
    // + conditional `ON CONFLICT DO UPDATE .. WHERE (excluded.ts, id) >
    // (current.ts, id)`. Batch 2 of the staged replay re-delivers
    // far-stale rows, so the guard is genuinely exercised: the measured
    // reject count (= distinct users in the replay slice) and the final
    // latest-wins state are both hash-checked; a sink that blindly
    // applied the replay would regress users to old state AND flip the
    // reject count, failing the gate twice over.
    Q(
      "s30_stream_upsert",
      (s, dir) => graft.sinks.DuckDbUpsert.streamUpsertLatest(s, dir),
      Some("""WITH lat AS (
          SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id, value,
            row_number() OVER (PARTITION BY user_id
              ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rk
          FROM events),
        st AS (SELECT count(DISTINCT user_id) AS ns FROM events
          WHERE CAST(year(date_trunc('day', ts))*10000
            + month(date_trunc('day', ts))*100
            + day(date_trunc('day', ts)) AS BIGINT) < 20240106)
        SELECT user_id, ts_us, event_id, value,
          CAST(3 AS BIGINT) AS n_batches,
          CAST((SELECT ns FROM st) AS BIGINT) AS n_stale_rejected,
          TRUE AS upsert_live
        FROM lat WHERE rk = 1 ORDER BY user_id""")
    ),
    // s31: stream-stream FULL OUTER join — both finalization cuts
    // mirrored in the oracle. The watermark is the MULTI-WATERMARK MIN
    // (see s27): least of the two sides' max FILTERED event times minus
    // the delay. Unmatched alerts emit once the watermark passes
    // a_ts + range (s27's rule). Unmatched calm ticks emit once the
    // watermark passes t_ts ALONE: from `t_ts > a_ts` the engine derives
    // the tick side's state watermark as wm itself (a tick only matches
    // alerts strictly before it, so once wm > t_ts no future alert can
    // pair with it) — verified by exact unmatched-id-set equality
    // against the engine's raw join output on the round-10 testdata;
    // the span-subtracted cut (wm − range) under-finalizes and fails
    // the hash. Matched pairs mirror the batch range join
    // unconditionally.
    Q(
      "s31_stream_full_outer",
      (s, dir) => graft.streaming.StreamJoins.alertFullOuterEnrichment(s, dir),
      Some(s"""WITH a AS (SELECT event_id AS a_id, user_id AS u, ts AS a_ts
          FROM events WHERE value > ${graft.streaming.StreamJoins.AlertThreshold}),
        t AS (SELECT event_id AS t_id, user_id AS u, ts AS t_ts
          FROM events WHERE value < ${graft.streaming.StreamJoins.CalmThreshold}),
        m AS (SELECT a.u, a.a_id, t.t_id, t.t_ts FROM a JOIN t ON a.u = t.u
          AND t.t_ts > a.a_ts
          AND t.t_ts <= a.a_ts + INTERVAL ${graft.streaming.StreamJoins.JoinRangeHours} HOUR),
        wm AS (SELECT least((SELECT max(a_ts) FROM a), (SELECT max(t_ts) FROM t))
          - INTERVAL 24 HOUR AS w),
        unma AS (SELECT a.u, a.a_id FROM a, wm
          WHERE a.a_ts + INTERVAL ${graft.streaming.StreamJoins.JoinRangeHours} HOUR < wm.w
            AND NOT EXISTS (SELECT 1 FROM m WHERE m.a_id = a.a_id)),
        unmc AS (SELECT t.u, t.t_id FROM t, wm
          WHERE t.t_ts < wm.w
            AND NOT EXISTS (SELECT 1 FROM m WHERE m.t_id = t.t_id))
        SELECT user_id,
          CAST(count(CASE WHEN kind = 'm' THEN 1 END) AS BIGINT) AS n_pairs,
          CAST(count(CASE WHEN kind = 'a' THEN 1 END) AS BIGINT) AS n_unmatched_alerts,
          CAST(count(CASE WHEN kind = 'c' THEN 1 END) AS BIGINT) AS n_unmatched_calm,
          max(CASE WHEN kind = 'm' THEN day END) AS last_matched_day
        FROM (SELECT u AS user_id, 'm' AS kind,
                CAST(year(t_ts)*10000 + month(t_ts)*100 + day(t_ts) AS BIGINT) AS day
              FROM m
              UNION ALL SELECT u, 'a', NULL FROM unma
              UNION ALL SELECT u, 'c', NULL FROM unmc) x
        GROUP BY user_id ORDER BY user_id""")
    ),
    // s32: multi-sink fanout with per-sink exactly-once (Fanout scaladoc)
    // — foreachBatch feeding TWO stores is NOT atomic; each sink keeps
    // its own committed-batch ledger over idempotent batch-keyed
    // overwrites, a torn fanout is INJECTED (batch 1 commits to the row
    // sink only), and recovery is the ledger diff re-deriving the
    // missing aggregate batch from the ROW SINK's committed copy, never
    // the source. The oracle is the staged-delivery census (events + the
    // batch-2 replay slice — replay rows are real input here, s26's
    // adjustment): both sinks must agree per user AND equal it, the
    // batch count must be 3, and torn_healed must be TRUE — a run where
    // the injection stopped firing fails the hash.
    Q(
      "s32_fanout_sinks",
      (s, dir) => graft.streaming.Fanout.fanoutTwoSinks(s, dir),
      Some(s"""WITH d AS (SELECT user_id,
            CAST(year(ts)*10000 + month(ts)*100 + day(ts) AS BIGINT) AS day
          FROM events)
        SELECT user_id,
          CAST(count(*) + count(*) FILTER (day < ${graft.streaming.Watermarks.replayBefore})
            AS BIGINT) AS a_rows,
          CAST(count(*) + count(*) FILTER (day < ${graft.streaming.Watermarks.replayBefore})
            AS BIGINT) AS b_rows,
          TRUE AS sinks_agree,
          CAST(3 AS BIGINT) AS n_batches,
          TRUE AS torn_healed
        FROM d GROUP BY user_id ORDER BY user_id""")
    ),
    // s33: streaming quantile-sketch maintenance (StreamSketch scaladoc)
    // — q144's mergeable histogram maintained per epoch: each
    // micro-batch reduces to ≤512 sketch cells, the running sketch is
    // the associative cell-wise sum over the epoch ledger, and the
    // oracle is q144's EXACT audit (the batch true order statistic
    // must land inside the stream-maintained bin) + the epoch count.
    // A lost or double-merged epoch shifts k or the bin and fails the
    // hash.
    Q(
      "s33_stream_quantile",
      (s, dir) => graft.streaming.StreamSketch.streamedQuantileSketch(s, dir),
      Some("""WITH c AS (SELECT CAST(floor(value * 100) AS BIGINT) AS v FROM events),
          n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
          byv AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM c GROUP BY v),
          cumv AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM byv),
          hist AS (SELECT v // 100 AS bin, sum(cnt) AS cnt FROM byv GROUP BY 1),
          cumb AS (SELECT bin, CAST(sum(cnt) OVER (ORDER BY bin
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM hist),
          q AS (SELECT unnest([50, 90, 99]) AS p),
          ks AS (SELECT p, CAST((p * n.n + 99) // 100 AS BIGINT) AS k FROM q, n),
          est AS (SELECT p, k, CAST(min(bin) AS BIGINT) AS est_bin
            FROM ks JOIN cumb ON cum >= ks.k GROUP BY p, k),
          tru AS (SELECT p, CAST(min(v) AS BIGINT) AS true_cents
            FROM ks JOIN cumv ON cum >= ks.k GROUP BY p)
        SELECT CAST(est.p AS BIGINT) AS p, est.k,
          CAST(est_bin * 100 AS BIGINT) AS est_lo_cents,
          true_cents,
          CAST(true_cents - est_bin * 100 AS BIGINT) AS err_cents,
          (true_cents // 100 = est_bin) AS contained,
          CAST(2 AS BIGINT) AS n_epochs
        FROM est JOIN tru ON est.p = tru.p ORDER BY est.p""")
    ),
    // s34: IVF maintenance under drift (StreamRefresh scaladoc) — the
    // codebook s14 serves statically is refreshed per epoch from a
    // bounded reservoir (retained Lloyd step), with an assignment-drift
    // metric per epoch. The quantized codebook checksum pins the exact
    // final index state in-hash; the oracle unrolls the identical
    // train→refresh→reassign recurrence as DuckDB CTEs.
    Q(
      "s34_stream_ivf_refresh",
      (s, dir) => graft.streaming.StreamRefresh.refreshLedger(s, dir),
      Some(SimQueries.refreshLedgerSql)
    ),
    // s35: end-to-end incremental refresh (IncrementalRefresh scaladoc)
    // — q148's manifest diff decides WHAT, q134's partial-state merge
    // decides HOW, s30's ledger-guarded conditional apply decides
    // SAFELY, with an INJECTED stale re-delivery the ledger must
    // reject. Oracle = from-scratch recompute equality: the maintained
    // view's rows/sums must hash-equal the scratch aggregate per
    // status, view_ok TRUE, exactly one rejected re-delivery, live.
    Q(
      "s35_incremental_refresh",
      (s, dir) => graft.sinks.IncrementalRefresh.refreshLoop(s, dir),
      Some(s"""WITH o AS (SELECT year(o_orderdate) * 100 + month(o_orderdate) AS bucket,
            (o_orderkey * 1000003
              + CAST(floor(o_totalprice * 100) AS BIGINT) * 31
              + o_custkey) % 1000000007 AS fp,
            CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
            CAST(o_orderdate AS DATE) AS d
          FROM orders),
        m AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cnt_b,
            CAST(sum(fp) AS BIGINT) AS dig_b,
            CAST(sum(cents) AS BIGINT) AS sum_b,
            CAST(count(*) FILTER (d < DATE '2001-07-15') AS BIGINT) AS cnt_a,
            CAST(coalesce(sum(fp) FILTER (d < DATE '2001-07-15'), 0) AS BIGINT) AS dig_a
          FROM o GROUP BY bucket),
        st AS (SELECT *, CASE WHEN cnt_a = 0 THEN 'new'
            WHEN cnt_a = cnt_b AND dig_a = dig_b THEN 'unchanged'
            ELSE 'changed' END AS status FROM m)
        SELECT status, CAST(count(*) AS BIGINT) AS n_buckets,
          CAST(sum(cnt_b) AS BIGINT) AS rows_current,
          CAST(sum(CASE WHEN status <> 'unchanged' THEN cnt_b ELSE 0 END) AS BIGINT)
            AS rows_to_process,
          CAST(sum(cnt_b) AS BIGINT) AS n_rows_view,
          CAST(sum(sum_b) AS BIGINT) AS sum_cents_view,
          TRUE AS view_ok,
          CAST(1 AS BIGINT) AS n_redeliveries_rejected,
          TRUE AS refresh_live
        FROM st GROUP BY status ORDER BY status""")
    ),
    // s36: streaming HLL register maintenance (StreamHll scaladoc) —
    // q170's exact-integer registers kept per epoch (≤64 registers/
    // epoch to the driver), merged register-wise MAX over the epoch
    // ledger; oracle = the from-scratch register recompute over the
    // full corpus (stream ≡ batch) + the epoch count.
    Q(
      "s36_stream_hll",
      (s, dir) => graft.streaming.StreamHll.streamedHllRegisters(s, dir),
      Some(s"""WITH h AS (SELECT doc_id, ${graft.oracle.OracleSql.h60("text")} AS h
            FROM documents),
        b AS (SELECT h // ${1L << 54} AS bucket, h % ${1L << 54} AS rem FROM h),
        r AS (SELECT bucket,
            CASE WHEN rem = 0 THEN CAST(55 AS BIGINT)
                 ELSE CAST(55 - length(bin(rem)) AS BIGINT) END AS rk
          FROM b),
        rw AS (SELECT bucket, CAST(max(rk) AS BIGINT) AS mr FROM r GROUP BY bucket),
        sw AS (SELECT CAST(sum(1::BIGINT << CAST(55 - mr AS INT))
              + (64 - count(*)) * (1::BIGINT << 55) AS BIGINT) AS s_h,
            CAST(count(*) AS BIGINT) AS n_regs FROM rw),
        n AS (SELECT CAST(count(DISTINCT text) AS BIGINT) AS n_exact FROM documents),
        est AS (SELECT ${graft.oracle.OracleSql.hllEstimate("s_h")} AS est_distinct,
            n_regs FROM sw)
        SELECT CAST(64 AS BIGINT) AS m, n.n_exact, est.est_distinct,
          abs(est.est_distinct - n.n_exact) * 10000 // n.n_exact AS err_bp,
          (abs(est.est_distinct - n.n_exact) * 10000 // n.n_exact) <= 3900
            AS within_3sigma,
          est.n_regs AS n_registers_used,
          CAST(2 AS BIGINT) AS n_epochs
        FROM n, est ORDER BY m""")
    ),
    // s37: streaming sequence packing (StreamPack scaladoc) — q175's
    // trainer artifact maintained per epoch: each batch's spans are its
    // own two-level prefix sums shifted by the ≤20-cell per-source
    // token offsets carried from prior epochs; epoch-keyed output
    // partitions (re-delivery rewrites, never double-emits) and a
    // computeIfAbsent offset chain. The union of per-epoch emissions is
    // BIT-EQUAL to batch q175 — the oracle IS q175's.
    Q(
      "s37_stream_packed_windows",
      (s, dir) => graft.streaming.StreamPack.streamedPackedWindows(s, dir),
      Some(TextQueries.packedWindowsOracle)
    ),
    // s38: continuous recall monitoring under refresh (StreamRecall
    // scaladoc) — per epoch, the recall of cell-restricted search under
    // the codebook SERVING that epoch (s34's refresh chain) against the
    // exact within-epoch top-10 for the fixed q174 probe set. The
    // oracle unrolls the identical recurrence (SimQueries.refreshCtes —
    // da0/da1 ARE the serving assignments) plus per-epoch recall CTEs.
    Q(
      "s38_stream_recall_monitor",
      (s, dir) => graft.streaming.StreamRecall.recallLedger(s, dir),
      Some {
        import graft.oracle.OracleSql.{cosine, dot, r6}
        def epochCtes(e: Int, cb: String) =
          s"""pc$e AS (SELECT pid, cell FROM (
              SELECT pr.pid, c.cent_id AS cell,
                row_number() OVER (PARTITION BY pr.pid
                  ORDER BY ${r6(dot("pr.p", "c.cent"))} DESC, c.cent_id) AS rk
              FROM pr, $cb c) WHERE rk <= 2),
          sc$e AS (SELECT pr.pid, a.vec_id,
              ${r6(cosine("a.embedding", "pr.p"))} AS cos, a.cell
            FROM da$e a, pr WHERE a.vec_id <> pr.pid),
          ex$e AS (SELECT pid, vec_id FROM (
              SELECT pid, vec_id,
                row_number() OVER (PARTITION BY pid ORDER BY cos DESC, vec_id) AS rk
              FROM sc$e) WHERE rk <= 10),
          ap$e AS (SELECT pid, vec_id FROM (
              SELECT s.pid, s.vec_id,
                row_number() OVER (PARTITION BY s.pid ORDER BY s.cos DESC, s.vec_id) AS rk
              FROM sc$e s JOIN pc$e p ON s.pid = p.pid AND s.cell = p.cell)
            WHERE rk <= 10),
          r$e AS (SELECT e.pid,
              (CAST(count(a.vec_id) AS BIGINT) * 10000) // 10 AS recall_bp
            FROM ex$e e LEFT JOIN ap$e a ON e.pid = a.pid AND e.vec_id = a.vec_id
            GROUP BY 1)"""
        def epochRow(e: Int, vecs: String) =
          s"""SELECT CAST($e AS BIGINT) AS epoch,
            (SELECT CAST(count(*) AS BIGINT) FROM $vecs) AS n_vecs,
            CAST(count(*) AS BIGINT) AS n_probes,
            CAST(sum(recall_bp) // count(*) AS BIGINT) AS mean_recall_bp,
            CAST(min(recall_bp) AS BIGINT) AS min_recall_bp
          FROM r$e"""
        s"""WITH ${graft.queries.SimQueries.refreshCtes},
          pr AS (SELECT vec_id AS pid, embedding AS p FROM embeddings
            WHERE vec_id >= 100 AND vec_id < 120),
          ${epochCtes(0, "cI")},
          ${epochCtes(1, "cE0")}
          ${epochRow(0, "vecs0")}
          UNION ALL
          ${epochRow(1, "vecs1")}
          ORDER BY epoch"""
      }
    ),
    // s39: snapshot-commit table format (SnapshotLog scaladoc) — the
    // Iceberg-shape commit log the maintenance family (q131/q148/s35)
    // would run against at 100 TB: immutable data files + per-snapshot
    // manifest lists + an atomic conditional current-pointer swap.
    // Lifecycle under test: two committed snapshots, one INJECTED
    // stale-parent commit (must be cleanly rejected — optimistic
    // concurrency), then a TIME-TRAVEL read of snapshot 1 beside the
    // current read of snapshot 2, each census computed from the actual
    // parquet files the log lists. Oracle = from-scratch recompute of
    // both snapshot states over `orders` + the literal manifest sizes
    // (2 and 2+3 — the repartition-pinned file counts) + is_current +
    // conflict_rejected TRUE, all in-hash.
    Q(
      "s39_snapshot_commits",
      (s, dir) => graft.sinks.SnapshotLog.snapshotLifecycle(s, dir),
      Some("""WITH o AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
            CAST(o_orderdate AS DATE) AS d FROM orders),
        s1 AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
          FROM o WHERE d < DATE '2001-07-15'),
        s2 AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
          FROM o)
        SELECT CAST(1 AS BIGINT) AS snapshot_id, CAST(2 AS BIGINT) AS n_files,
          s1.n AS n_rows, s1.s AS sum_cents, FALSE AS is_current,
          TRUE AS conflict_rejected
        FROM s1
        UNION ALL
        SELECT CAST(2 AS BIGINT), CAST(5 AS BIGINT), s2.n, s2.s, TRUE, TRUE
        FROM s2
        ORDER BY snapshot_id""")
    ),
    // s40: manifest-diff-driven incremental refresh (SnapshotLog
    // .snapshotRefresh scaladoc) — the s39+s35 integration: the commit
    // log's manifest diff (snapshot 2 \ snapshot 1) IS the refresh
    // delta (pure metadata — no corpus scan decides what changed), the
    // view full-builds from snapshot 1's manifest, refreshes by reading
    // ONLY the added files through s35's transactionally idempotent
    // ledger apply, rejects an injected re-delivery, and must equal the
    // from-scratch per-bucket aggregate over snapshot 2's manifest.
    Q(
      "s40_snapshot_refresh",
      (s, dir) => graft.sinks.SnapshotLog.snapshotRefresh(s, dir),
      Some("""WITH o AS (SELECT o_orderkey, o_custkey,
            CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
            CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS bucket,
            CAST(o_orderdate AS DATE) AS d FROM orders),
        a AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s,
            CAST(count(DISTINCT bucket) AS BIGINT) AS nb FROM o),
        ad AS (SELECT CAST(count(*) AS BIGINT) AS ra FROM o
            WHERE NOT (d < DATE '2001-07-15'))
        SELECT CAST(3 AS BIGINT) AS n_files_added, ad.ra AS rows_added,
          a.nb AS n_buckets, a.n AS n_rows_view, a.s AS sum_cents_view,
          TRUE AS view_ok, CAST(1 AS BIGINT) AS n_redeliveries_rejected,
          TRUE AS refresh_live
        FROM a, ad ORDER BY n_files_added""")
    ),
    // s41: streaming ingest THROUGH the commit log (SnapshotLog
    // .streamCommits scaladoc) — the s02+s39 integration: each
    // micro-batch writes immutable parquet files then atomically
    // commits snapshot (epoch+1) with the cumulative manifest; an
    // injected retried-epoch commit (stale parent) is rejected, so
    // commit visibility is exactly-once even though the staged source
    // re-delivers batch-0 rows as new data (file 2 of the s07/s11
    // replay). Oracle = from-scratch recompute of all three snapshot
    // states over `events` (cumulative day-slices; snapshot 3 adds the
    // replayed pre-replayBefore rows once more) + the pinned per-epoch
    // file counts + currency + exactly_once TRUE, all in-hash.
    Q(
      "s41_stream_commits",
      (s, dir) => graft.sinks.SnapshotLog.streamCommits(s, dir),
      Some(s"""WITH e AS (SELECT CAST(floor(value * 100) AS BIGINT) AS cents,
            ${dayInt("ts")} AS day FROM events),
        b0 AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
          FROM e WHERE day <= ${graft.streaming.Watermarks.splitDay}),
        ba AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
          FROM e),
        br AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
          FROM e WHERE day < ${graft.streaming.Watermarks.replayBefore})
        SELECT CAST(1 AS BIGINT) AS snapshot_id, CAST(2 AS BIGINT) AS n_files,
          b0.n AS n_rows, b0.s AS sum_cents, FALSE AS is_current,
          TRUE AS exactly_once
        FROM b0
        UNION ALL
        SELECT CAST(2 AS BIGINT), CAST(4 AS BIGINT), ba.n, ba.s, FALSE, TRUE
        FROM ba
        UNION ALL
        SELECT CAST(3 AS BIGINT), CAST(6 AS BIGINT), ba.n + br.n, ba.s + br.s,
          TRUE, TRUE
        FROM ba, br
        ORDER BY snapshot_id""")
    ),
    // s42: snapshot expiration + orphan-file GC (SnapshotLog.expireGc
    // scaladoc) — the maintenance pair that keeps s39's storage bounded:
    // a compaction snapshot strands the pre-compaction files behind
    // history, a rejected commit strands true orphans; expiring
    // snapshots 1–2 makes both unreachable, and GC deletes exactly the
    // 5 expired + 2 orphan files while snapshot 3's census — read from
    // its parquet AFTER the deletions — must still equal the full table.
    // Oracle = from-scratch census over `orders` + the pinned expiry /
    // orphan / live file counts + gc_safe TRUE, all in-hash.
    Q(
      "s42_snapshot_expire_gc",
      (s, dir) => graft.sinks.SnapshotLog.expireGc(s, dir),
      Some("""WITH o AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders)
        SELECT CAST(2 AS BIGINT) AS n_snapshots_expired,
          CAST(2 AS BIGINT) AS n_orphans_deleted,
          CAST(5 AS BIGINT) AS n_expired_files_deleted,
          CAST(2 AS BIGINT) AS n_files_live,
          CAST(count(*) AS BIGINT) AS n_rows,
          CAST(sum(cents) AS BIGINT) AS sum_cents,
          TRUE AS gc_safe
        FROM o ORDER BY n_rows""")
    ),
    // s43: copy-on-write MERGE through the commit log (SnapshotLog
    // .mergeCow scaladoc) — row-level DELETE/UPDATE/INSERT against the
    // snapshot table: affected-file selection is a pure metadata join
    // (per-file partition stats × the delta's buckets → exactly 1 of 4
    // files), only that file is rewritten, the other 3 are carried by
    // path, and the pre-merge state stays time-travelable. Oracle
    // recomputes every count and both censuses from `orders` with the
    // same k%20 predicates and the same 10 synthetic inserts, so an
    // unapplied update, a leaked delete, or wrong pruning moves real
    // integers.
    Q(
      "s43_merge_cow",
      (s, dir) => graft.sinks.SnapshotLog.mergeCow(s, dir),
      Some("""WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
            CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        i AS (SELECT CAST(count(*) AS BIGINT) AS ni,
            CAST(sum(1000000 + 7 * g) AS BIGINT) AS si
          FROM (SELECT unnest(generate_series(0, 9)) AS g)),
        d AS (SELECT CAST(count(*) AS BIGINT) AS nd,
            CAST(COALESCE(sum(cents), 0) AS BIGINT) AS sd FROM o WHERE k % 20 = 6),
        u AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM o WHERE k % 20 = 2),
        b AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s FROM o)
        SELECT CAST(4 AS BIGINT) AS n_files_base,
          CAST(1 AS BIGINT) AS n_files_rewritten,
          CAST(3 AS BIGINT) AS n_files_carried,
          d.nd AS n_deleted, u.nu AS n_updated, i.ni AS n_inserted,
          b.n - d.nd + i.ni AS n_rows,
          b.s - d.sd + 1000 * u.nu + i.si AS sum_cents,
          b.n AS n_rows_pre, b.s AS sum_cents_pre,
          TRUE AS merge_ok
        FROM b, d, u, i ORDER BY n_rows""")
    ),
    // s44: merge-on-read row-level deletes (SnapshotLog.mergeOnRead
    // scaladoc) — the lazy half of the mutation story next to s43's
    // COW: equality-delete files mask dead rows at read time under the
    // SEQUENCE rule (a delete applies only to data files with strictly
    // lower seq — so snapshot 3's update, delete(old)+insert(new) in
    // one commit, doesn't eat its own re-inserted rows), deletes
    // accumulate across snapshots, and the snapshot-4 compaction folds
    // them into rewritten files census-neutrally. All four snapshots'
    // time-travel censuses through the MOR read path are in-hash;
    // oracle recomputes them from `orders` with the same k%20
    // predicates.
    Q(
      "s44_merge_on_read",
      (s, dir) => graft.sinks.SnapshotLog.mergeOnRead(s, dir),
      Some("""WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
            CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        d AS (SELECT CAST(count(*) AS BIGINT) AS nd,
            CAST(COALESCE(sum(cents), 0) AS BIGINT) AS sd FROM o WHERE k % 20 = 6),
        u AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM o WHERE k % 20 = 2),
        b AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s FROM o)
        SELECT CAST(1 AS BIGINT) AS snapshot_id, CAST(4 AS BIGINT) AS n_data_files,
          CAST(0 AS BIGINT) AS n_delete_files, b.n AS n_rows, b.s AS sum_cents,
          TRUE AS mor_ok
        FROM b
        UNION ALL
        SELECT CAST(2 AS BIGINT), CAST(4 AS BIGINT), CAST(1 AS BIGINT),
          b.n - d.nd, b.s - d.sd, TRUE FROM b, d
        UNION ALL
        SELECT CAST(3 AS BIGINT), CAST(5 AS BIGINT), CAST(2 AS BIGINT),
          b.n - d.nd, b.s - d.sd + 1000 * u.nu, TRUE FROM b, d, u
        UNION ALL
        SELECT CAST(4 AS BIGINT), CAST(4 AS BIGINT), CAST(0 AS BIGINT),
          b.n - d.nd, b.s - d.sd + 1000 * u.nu, TRUE FROM b, d, u
        ORDER BY snapshot_id""")
    ),
    // s45: changelog feed between snapshots (SnapshotLog.changelogFeed
    // scaladoc) — Iceberg changelog-scan / Delta CDF computed without
    // per-row tracking: the changed-file set is the manifest diff (log
    // metadata — the 3 carried files are never read), row changes come
    // from one full-outer join of removed-file rows vs added-file rows,
    // and the rows a COW rewrite carries UNCHANGED inside the rewritten
    // file are suppressed as no-ops (emitting them would make every
    // merge look like a table rewrite to consumers — and would move
    // every census here). Oracle recomputes the per-change-type census
    // from `orders` with the same k%20 predicates + the same synthetic
    // inserts.
    Q(
      "s45_changelog_feed",
      (s, dir) => graft.sinks.SnapshotLog.changelogFeed(s, dir),
      Some("""WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
            CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        mxb AS (SELECT CAST(max(k) - (max(k) % 4) AS BIGINT) AS b FROM o),
        ins AS (SELECT mxb.b + 4 * (g.i + 1) + 2 AS k,
            CAST(1000000 + 7 * g.i AS BIGINT) AS cents
          FROM mxb, (SELECT unnest(generate_series(0, 9)) AS i) g)
        SELECT 'delete' AS change_type, CAST(count(*) AS BIGINT) AS n_rows,
          CAST(sum(k) AS BIGINT) AS key_sum,
          CAST(sum(cents) AS BIGINT) AS sum_cents_pre,
          CAST(0 AS BIGINT) AS sum_cents_post,
          CAST(2 AS BIGINT) AS n_files_scanned
        FROM o WHERE k % 20 = 6
        UNION ALL
        SELECT 'insert', CAST(count(*) AS BIGINT), CAST(sum(k) AS BIGINT),
          CAST(0 AS BIGINT), CAST(sum(cents) AS BIGINT), CAST(2 AS BIGINT)
        FROM ins
        UNION ALL
        SELECT 'update', CAST(count(*) AS BIGINT), CAST(sum(k) AS BIGINT),
          CAST(sum(cents) AS BIGINT),
          CAST(sum(cents) + 1000 * count(*) AS BIGINT), CAST(2 AS BIGINT)
        FROM o WHERE k % 20 = 2
        ORDER BY change_type""")
    ),
    // s46: write-audit-publish (SnapshotLog.writeAuditPublish scaladoc)
    // — the WAP quality gate: new data commits to a BRANCH ref, an
    // audit query runs against the staged snapshot through the log
    // (first stage carries corrupted rows — negated cents on k≡3 mod
    // 150 — and fails; the fixed stage passes), and publish is an atomic
    // fast-forward of main's pointer. Main's census DURING staging
    // (snapshot 1 exactly — staged work invisible) and after publish
    // (the clean full table) are both in-hash, as are the bad-row
    // count, publish, and the rejected stale re-publish of the
    // abandoned bad stage.
    Q(
      "s46_write_audit_publish",
      (s, dir) => graft.sinks.SnapshotLog.writeAuditPublish(s, dir),
      Some("""WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
            CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        bad AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM o
            WHERE k % 150 = 3),
        pre AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s FROM o WHERE k % 3 <> 0),
        a AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s FROM o)
        SELECT bad.nb AS n_bad_staged, pre.n AS n_rows_main_staged,
          pre.s AS sum_cents_main_staged, a.n AS n_rows_main_published,
          a.s AS sum_cents_main_published, TRUE AS published,
          TRUE AS stale_publish_rejected, TRUE AS wap_ok
        FROM bad, pre, a ORDER BY n_bad_staged""")
    ),
    // s47: streaming upsert THROUGH the merge-on-read log (SnapshotLog
    // .streamMorUpsert scaladoc) — s30's upsert semantics with the
    // snapshot table as the sink (Delta/Iceberg streaming MERGE, MOR
    // mode): each micro-batch atomically commits an equality-delete
    // file (the batch's keys, masking prior versions under the seq
    // rule) plus a data file (within-batch winners by max event_id).
    // Last-write-wins is BY ARRIVAL: the epoch-2 replay legitimately
    // overwrites newer values for its users — the stale-replay hazard
    // is pinned, not hidden. All three snapshots' upsert states (user
    // count + current-version cents sum) read back through the MOR
    // path; oracle ranks the same delivery multiset by (epoch DESC,
    // event_id DESC).
    Q(
      "s47_stream_mor_upsert",
      (s, dir) => graft.sinks.SnapshotLog.streamMorUpsert(s, dir),
      Some(s"""WITH ev AS (SELECT event_id, user_id,
            CAST(floor(value * 100) AS BIGINT) AS cents,
            ${dayInt("ts")} AS day FROM events),
        del AS (
          SELECT event_id, user_id, cents, 0 AS e FROM ev
          WHERE day <= ${graft.streaming.Watermarks.splitDay}
          UNION ALL
          SELECT event_id, user_id, cents, 1 FROM ev
          WHERE day > ${graft.streaming.Watermarks.splitDay}
          UNION ALL
          SELECT event_id, user_id, cents, 2 FROM ev
          WHERE day < ${graft.streaming.Watermarks.replayBefore}),
        sn AS (SELECT unnest(generate_series(1, 3)) AS s),
        rk AS (SELECT sn.s, d.user_id, d.cents,
            row_number() OVER (PARTITION BY sn.s, d.user_id
              ORDER BY d.e DESC, d.event_id DESC) AS rn
          FROM sn JOIN del d ON d.e < sn.s)
        SELECT CAST(s AS BIGINT) AS snapshot_id,
          CAST(s AS BIGINT) AS n_data_files,
          CAST(s AS BIGINT) AS n_delete_files,
          CAST(count(*) AS BIGINT) AS n_users,
          CAST(sum(cents) AS BIGINT) AS sum_cents, TRUE AS upsert_ok
        FROM rk WHERE rn = 1 GROUP BY s ORDER BY snapshot_id""")
    ),
    // s48: partition-spec evolution (SnapshotLog.partitionEvolution
    // scaladoc) — the table re-partitions WITHOUT rewriting history:
    // snapshot 1's files are bucket k%4, the append lands under k%8,
    // old files carry by path, and the k%8==5 scan plans across BOTH
    // specs via the per-file spec registry (spec-2 pval 5, spec-1 pval
    // 5 mod 4 — mapping the predicate through the coarser transform;
    // the naive same-value mapping would silently miss the old
    // generation's rows and move the census). The pruned read's census
    // must equal the full-table predicate answer — both in-hash.
    Q(
      "s48_partition_evolution",
      (s, dir) => graft.sinks.SnapshotLog.partitionEvolution(s, dir),
      Some("""WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
            CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
            CAST(o_orderdate AS DATE) AS d FROM orders),
        post AS (SELECT * FROM o WHERE NOT (d < DATE '2001-07-15')),
        pre AS (SELECT * FROM o WHERE d < DATE '2001-07-15'),
        nf AS (SELECT CAST(4 + count(DISTINCT k % 8) AS BIGINT) AS t FROM post),
        ns AS (SELECT CAST(
            (CASE WHEN (SELECT count(*) FROM pre WHERE k % 4 = 1) > 0
              THEN 1 ELSE 0 END)
            + (CASE WHEN (SELECT count(*) FROM post WHERE k % 8 = 5) > 0
              THEN 1 ELSE 0 END) AS BIGINT) AS c),
        sel AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(COALESCE(sum(cents), 0) AS BIGINT) AS s FROM o WHERE k % 8 = 5),
        s1 AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s FROM pre)
        SELECT nf.t AS n_files_total, ns.c AS n_files_scanned,
          sel.n AS n_rows_sel, sel.s AS sum_cents_sel,
          s1.n AS n_rows_snap1, s1.s AS sum_cents_snap1,
          TRUE AS evolution_ok
        FROM nf, ns, sel, s1 ORDER BY n_rows_sel""")
    ),
    // s49: POSITION deletes in the MOR path (SnapshotLog
    // .mergeOnReadPositional scaladoc) — Iceberg v2's second delete
    // kind beside s44's equality deletes: (file, row-ordinal) tuples,
    // row identity from Spark's own _metadata.row_index, the ordinal
    // anti-join SCOPED PER FILE, and the asymmetric seq rule (position
    // deletes apply at pseq >= fseq — snapshot 4 masks 4 rows of the
    // data file it commits, the streaming-upsert flush pattern, while
    // equality deletes stay strictly-lower and never eat their own
    // inserts). Snapshot 5's compaction folds BOTH kinds in one
    // census-neutral rewrite of exactly the affected files and drops
    // every delete manifest. All five snapshots' censuses through the
    // v2 read path are in-hash; oracle recomputes them from `orders`
    // with the same k%20 predicates and the same kept-insert set.
    Q(
      "s49_position_deletes",
      (s, dir) => graft.sinks.SnapshotLog.mergeOnReadPositional(s, dir),
      Some("""WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
            CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        d AS (SELECT CAST(count(*) AS BIGINT) AS nd,
            CAST(COALESCE(sum(cents), 0) AS BIGINT) AS sd FROM o WHERE k % 20 = 6),
        u AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM o WHERE k % 20 = 2),
        b AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s FROM o),
        i AS (SELECT CAST(count(*) AS BIGINT) AS ni,
            CAST(sum(1000000 + 7 * g) AS BIGINT) AS si
          FROM (SELECT unnest(generate_series(0, 9)) AS g) WHERE g % 3 <> 0)
        SELECT CAST(1 AS BIGINT) AS snapshot_id,
          CAST(4 AS BIGINT) AS n_data_files,
          CAST(0 AS BIGINT) AS n_eq_delete_files,
          CAST(0 AS BIGINT) AS n_pos_delete_files,
          b.n AS n_rows, b.s AS sum_cents, TRUE AS posmor_ok
        FROM b
        UNION ALL
        SELECT CAST(2 AS BIGINT), CAST(4 AS BIGINT), CAST(0 AS BIGINT),
          CAST(1 AS BIGINT), b.n - d.nd, b.s - d.sd, TRUE FROM b, d
        UNION ALL
        SELECT CAST(3 AS BIGINT), CAST(5 AS BIGINT), CAST(1 AS BIGINT),
          CAST(1 AS BIGINT), b.n - d.nd, b.s - d.sd + 1000 * u.nu, TRUE
        FROM b, d, u
        UNION ALL
        SELECT CAST(4 AS BIGINT), CAST(6 AS BIGINT), CAST(1 AS BIGINT),
          CAST(2 AS BIGINT), b.n - d.nd + i.ni,
          b.s - d.sd + 1000 * u.nu + i.si, TRUE
        FROM b, d, u, i
        UNION ALL
        SELECT CAST(5 AS BIGINT), CAST(5 AS BIGINT), CAST(0 AS BIGINT),
          CAST(0 AS BIGINT), b.n - d.nd + i.ni,
          b.s - d.sd + 1000 * u.nu + i.si, TRUE
        FROM b, d, u, i
        ORDER BY snapshot_id""")
    ),
    // s50: COLUMN evolution through the log (SnapshotLog
    // .columnEvolution scaladoc) — per-file schema ids in the manifest,
    // projection BY FIELD ID: rename (amount → cents, same id 2) reads
    // old files' old physical column; add projects typed NULL for
    // files that predate the field; and the drop-then-reuse-the-name
    // trap (field 3 "disc" dropped, NEW field 4 named "disc") must NOT
    // resurrect the dropped values from schema-2 files that physically
    // carry the name — the in-engine name-based leak probe differs
    // from the by-id census, pinned via evolution_ok. Three snapshots'
    // censuses under their own schemas are in-hash; oracle recomputes
    // from `orders` with the same k%3 slices and disc generation rules.
    Q(
      "s50_column_evolution",
      (s, dir) => graft.sinks.SnapshotLog.columnEvolution(s, dir),
      Some("""WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
            CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        s0 AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s FROM o WHERE k % 3 = 0),
        s1 AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s,
            CAST(sum(k % 5 + 1) AS BIGINT) AS d FROM o WHERE k % 3 = 1),
        s2 AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s,
            CAST(sum(k % 7 + 3) AS BIGINT) AS d FROM o WHERE k % 3 = 2)
        SELECT CAST(1 AS BIGINT) AS snapshot_id, CAST(1 AS BIGINT) AS schema_id,
          CAST(2 AS BIGINT) AS n_files, s0.n AS n_rows, s0.s AS sum_cents,
          CAST(0 AS BIGINT) AS n_disc, CAST(0 AS BIGINT) AS sum_disc,
          TRUE AS evolution_ok
        FROM s0
        UNION ALL
        SELECT CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(4 AS BIGINT),
          s0.n + s1.n, s0.s + s1.s, s1.n, s1.d, TRUE FROM s0, s1
        UNION ALL
        SELECT CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(6 AS BIGINT),
          s0.n + s1.n + s2.n, s0.s + s1.s + s2.s, s2.n, s2.d, TRUE
        FROM s0, s1, s2
        ORDER BY snapshot_id""")
    ),
    // s51: timestamp time travel + rollback (SnapshotLog
    // .snapshotRollback scaladoc) — the recovery surfaces: FOR
    // TIMESTAMP AS OF resolves the newest snapshot with commit-ts <= t
    // through the log (t=2500 → snapshot 2; a pre-table t resolves to
    // nothing, not the empty root), ROLLBACK is a conditional pointer
    // move that rewrites no history (current serves snapshot 1, the
    // abandoned snapshot 3 stays time-travelable, a retry claiming the
    // abandoned head rejects), and the REDO commit diverges forward
    // from the rolled-back head as new files. Censuses of all four
    // reads in-hash; oracle recomputes from `orders` k%3 slices.
    Q(
      "s51_snapshot_rollback",
      (s, dir) => graft.sinks.SnapshotLog.snapshotRollback(s, dir),
      Some("""WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
            CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        s0 AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s FROM o WHERE k % 3 = 0),
        s1 AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s FROM o WHERE k % 3 = 1),
        a AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s FROM o)
        SELECT 'asof_t2500' AS read, CAST(2 AS BIGINT) AS snapshot_id,
          s0.n + s1.n AS n_rows, s0.s + s1.s AS sum_cents,
          TRUE AS rollback_ok
        FROM s0, s1
        UNION ALL
        SELECT 'current_after_rollback', CAST(1 AS BIGINT), s0.n, s0.s, TRUE
        FROM s0
        UNION ALL
        SELECT 'history_snapshot3', CAST(3 AS BIGINT), a.n, a.s, TRUE FROM a
        UNION ALL
        SELECT 'redo_snapshot4', CAST(4 AS BIGINT), s0.n + s1.n,
          s0.s + s1.s, TRUE
        FROM s0, s1
        ORDER BY read""")
    ),
    // s52: per-file MIN/MAX column stats + range data skipping + the
    // clustering rewrite that makes skipping effective (SnapshotLog
    // .statsSkipping scaladoc) — unclustered layout scans ~all files for
    // a range predicate, the explicit-arithmetic-bucket rewrite scans ~1;
    // the oracle recomputes both overlap counts from the same k%4 /
    // (cents-min) div width group arithmetic, and every census (pruned
    // read ≡ direct scan, rewrite census-neutral) is in-hash, so wrong
    // stats, wrong planning, or a lossy rewrite all move real integers.
    Q(
      "s52_stats_skipping",
      (s, dir) => graft.sinks.SnapshotLog.statsSkipping(s, dir),
      Some("""WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
            CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        r AS (SELECT min(cents) AS mn, max(cents) AS mx FROM o),
        p AS (SELECT mn, (mx - mn) // 4 + 1 AS bw FROM r),
        pr AS (SELECT mn, bw, mn + bw // 2 AS lo, mn + bw - 1 AS hi FROM p),
        g1 AS (SELECT k % 4 AS g, min(cents) AS fmn, max(cents) AS fmx
          FROM o GROUP BY 1),
        ov1 AS (SELECT CAST(count(*) AS BIGINT) AS c FROM g1, pr
          WHERE g1.fmx >= pr.lo AND g1.fmn <= pr.hi),
        nf1 AS (SELECT CAST(count(*) AS BIGINT) AS c FROM g1),
        g2 AS (SELECT (cents - mn) // bw AS g, min(cents) AS fmn,
            max(cents) AS fmx FROM o, pr GROUP BY 1),
        ov2 AS (SELECT CAST(count(*) AS BIGINT) AS c FROM g2, pr
          WHERE g2.fmx >= pr.lo AND g2.fmn <= pr.hi),
        nf2 AS (SELECT CAST(count(*) AS BIGINT) AS c FROM g2),
        sel AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(COALESCE(sum(cents), 0) AS BIGINT) AS s
          FROM o, pr WHERE cents BETWEEN pr.lo AND pr.hi),
        b AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s FROM o)
        SELECT nf1.c AS n_files_unclustered, ov1.c AS n_scanned_unclustered,
          nf2.c AS n_files_clustered, ov2.c AS n_scanned_clustered,
          sel.n AS n_sel, sel.s AS sum_sel, b.n AS n_rows, b.s AS sum_cents,
          TRUE AS skip_ok
        FROM nf1, ov1, nf2, ov2, sel, b ORDER BY n_sel""")
    ),
    // s53: metadata tables over the commit log (SnapshotLog
    // .metadataTables scaladoc) — Iceberg's .snapshots/.files/.history
    // surface: per-snapshot file counts, metadata row counts, the
    // entries-diff (files added per commit) and ancestry depth, all from
    // log rows, with the truth audit (n_rows_meta == time-travel read
    // census) in-hash. Oracle recomputes every census from `orders` with
    // the same cumulative k%4 slices; file/added counts are construction
    // constants.
    Q(
      "s53_metadata_tables",
      (s, dir) => graft.sinks.SnapshotLog.metadataTables(s, dir),
      Some("""WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
            CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        s1 AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s FROM o WHERE k % 4 < 2),
        s2 AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s FROM o WHERE k % 4 < 3),
        s3 AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s FROM o)
        SELECT CAST(1 AS BIGINT) AS snapshot_id, CAST(0 AS BIGINT) AS parent_id,
          CAST(1 AS BIGINT) AS depth, CAST(2 AS BIGINT) AS n_files,
          CAST(2 AS BIGINT) AS n_added, s1.n AS n_rows_meta,
          s1.n AS n_rows_read, s1.s AS sum_cents, TRUE AS meta_ok FROM s1
        UNION ALL
        SELECT CAST(2 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT),
          CAST(3 AS BIGINT), CAST(1 AS BIGINT), s2.n, s2.n, s2.s, TRUE FROM s2
        UNION ALL
        SELECT CAST(3 AS BIGINT), CAST(2 AS BIGINT), CAST(3 AS BIGINT),
          CAST(4 AS BIGINT), CAST(1 AS BIGINT), s3.n, s3.n, s3.s, TRUE FROM s3
        ORDER BY snapshot_id""")
    ),
    // s54: snapshot TAGS + retention-aware expiry (SnapshotLog
    // .snapshotTags scaladoc) — a tag pins an audited snapshot through
    // an expire-everything pass (it stays readable through the tag and
    // its files stay reachable), and dropping the tag makes the SAME
    // expiry remove it — retention is the ref, not age. The compaction
    // in snapshot 3 makes the effect measurable at file level (live
    // 4 → 3 → 1), and both reads' censuses are in-hash against the
    // oracle's slice recompute.
    Q(
      "s54_snapshot_tags",
      (s, dir) => graft.sinks.SnapshotLog.snapshotTags(s, dir),
      Some("""WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
            CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        s1 AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s FROM o WHERE k % 4 < 2),
        a AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s FROM o)
        SELECT s1.n AS n_rows_tagged, s1.s AS sum_cents_tagged,
          a.n AS n_rows_current, a.s AS sum_cents_current,
          CAST(1 AS BIGINT) AS n_expired_first,
          CAST(3 AS BIGINT) AS n_live_after_first,
          CAST(1 AS BIGINT) AS n_expired_second,
          CAST(1 AS BIGINT) AS n_live_after_second,
          TRUE AS tags_ok
        FROM s1, a ORDER BY n_rows_tagged""")
    ),
    // s55: writer-side commit constraints (SnapshotLog.commitConstraints
    // scaladoc) — Delta-style CHECK enforcement at the table boundary,
    // validated from the per-file min/max stats the writer already
    // computed (no second data pass): the poisoned staged commit is
    // rejected before the pointer moves (current stays 1, snapshot-1
    // census untouched), the cleaned retry lands as snapshot 2, and the
    // final census — in-hash against the oracle's full recompute —
    // contains no poison.
    Q(
      "s55_commit_constraints",
      (s, dir) => graft.sinks.SnapshotLog.commitConstraints(s, dir),
      Some("""WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
            CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        s1 AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s FROM o WHERE k % 2 = 0),
        a AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s FROM o)
        SELECT s1.n AS n_rows_s1, s1.s AS sum_cents_s1,
          CAST(2 AS BIGINT) AS n_staged_files,
          CAST(2 AS BIGINT) AS n_violating_files,
          a.n AS n_rows_final, a.s AS sum_cents_final,
          TRUE AS constraint_ok
        FROM s1, a ORDER BY n_rows_s1""")
    ),
    // s56: CDC apply (SnapshotLog.cdcApply scaladoc) — the consumer
    // half of s45's changelog feed: a downstream replica maintained
    // incrementally from each commit's manifest diff (changed files +
    // the replica only — unchanged source files never reread). Per
    // step: the change-type counts, the read-boundedness claim
    // (n_files_diff = 2), and the replica-census == source-time-travel-
    // census audit, all in-hash. Oracle: predicate arithmetic over
    // `orders` applied cumulatively (step-2 predicates k%20∈{13,17} are
    // ≡1 mod 4, disjoint from step 1's bucket-2 rewrite, so original
    // cents apply; insert-batch sums are construction constants:
    // Σ(1000000+7i, i<10) = 10000315, Σ(2000000+11i, i<5) = 10000110).
    Q(
      "s56_cdc_apply",
      (s, dir) => graft.sinks.SnapshotLog.cdcApply(s, dir),
      Some("""WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
            CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        d1 AS (SELECT CAST(count(*) AS BIGINT) AS c,
            CAST(sum(cents) AS BIGINT) AS s FROM o WHERE k % 20 = 6),
        u1 AS (SELECT CAST(count(*) AS BIGINT) AS c FROM o WHERE k % 20 = 2),
        d2 AS (SELECT CAST(count(*) AS BIGINT) AS c,
            CAST(sum(cents) AS BIGINT) AS s FROM o WHERE k % 20 = 13),
        u2 AS (SELECT CAST(count(*) AS BIGINT) AS c FROM o WHERE k % 20 = 17),
        b AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s FROM o),
        st2 AS (SELECT b.n - d1.c + 10 AS n,
            b.s - d1.s + 1000 * u1.c + 10000315 AS s FROM b, d1, u1),
        st3 AS (SELECT st2.n - d2.c + 5 AS n,
            st2.s - d2.s + 500 * u2.c + 10000110 AS s FROM st2, d2, u2)
        SELECT CAST(1 AS BIGINT) AS step, d1.c AS n_delete, u1.c AS n_update,
          CAST(10 AS BIGINT) AS n_insert, CAST(2 AS BIGINT) AS n_files_diff,
          st2.n AS replica_rows, st2.s AS replica_cents,
          st2.n AS src_rows, st2.s AS src_cents, TRUE AS apply_ok
        FROM d1, u1, st2
        UNION ALL
        SELECT CAST(2 AS BIGINT), d2.c, u2.c, CAST(5 AS BIGINT),
          CAST(2 AS BIGINT), st3.n, st3.s, st3.n, st3.s, TRUE
        FROM d2, u2, st3
        ORDER BY step""")
    ),
    // s57: z-order clustering + 2-D box skipping (SnapshotLog
    // .zorderSkipping scaladoc) — the two-column sequel to s52: a
    // linear layout (files = x) prunes an (x, y) box only on x and a
    // y-stripe not at all; the z-order rewrite (files = 4×4 blocks of
    // the interleaved key) bounds both dims per file: box 4 → 1 files,
    // stripe 16 → 4. Oracle recomputes scanned counts from the same g
    // arithmetic (actual grouped min/max, so sparse files agree too)
    // and every census from the direct predicate.
    Q(
      "s57_zorder_skipping",
      (s, dir) => graft.sinks.SnapshotLog.zorderSkipping(s, dir),
      Some("""WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
            CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        d AS (SELECT k, cents, k % 16 AS x, cents % 16 AS y FROM o),
        q AS (SELECT * FROM (VALUES
            ('box_xy', 4, 7, 8, 11),
            ('stripe_y', 0, 15, 0, 3)) AS t(qn, xlo, xhi, ylo, yhi)),
        lin AS (SELECT x AS g, min(x) AS mnx, max(x) AS mxx,
            min(y) AS mny, max(y) AS mxy FROM d GROUP BY 1),
        zf AS (SELECT ((x // 8) % 2) * 8 + ((y // 8) % 2) * 4
              + ((x // 4) % 2) * 2 + ((y // 4) % 2) AS g,
            min(x) AS mnx, max(x) AS mxx, min(y) AS mny, max(y) AS mxy
          FROM d GROUP BY 1),
        sel AS (SELECT qn, CAST(count(d.k) AS BIGINT) AS n,
            CAST(COALESCE(sum(cents), 0) AS BIGINT) AS s
          FROM q LEFT JOIN d ON d.x BETWEEN q.xlo AND q.xhi
            AND d.y BETWEEN q.ylo AND q.yhi
          GROUP BY qn),
        scan AS (
          SELECT 'linear' AS layout, qn,
            CAST((SELECT count(*) FROM lin) AS BIGINT) AS n_files,
            CAST(count(lin.g) AS BIGINT) AS n_scanned
          FROM q LEFT JOIN lin ON lin.mxx >= q.xlo AND lin.mnx <= q.xhi
            AND lin.mxy >= q.ylo AND lin.mny <= q.yhi
          GROUP BY qn
          UNION ALL
          SELECT 'zorder', qn,
            CAST((SELECT count(*) FROM zf) AS BIGINT),
            CAST(count(zf.g) AS BIGINT)
          FROM q LEFT JOIN zf ON zf.mxx >= q.xlo AND zf.mnx <= q.xhi
            AND zf.mxy >= q.ylo AND zf.mny <= q.yhi
          GROUP BY qn)
        SELECT scan.layout, scan.qn AS query, scan.n_files, scan.n_scanned,
          sel.n AS n_sel, sel.s AS sum_sel, TRUE AS scan_ok
        FROM scan JOIN sel ON scan.qn = sel.qn
        ORDER BY layout, query""")
    ),
    // s58: small-file bin-packing compaction (SnapshotLog
    // .binpackCompaction scaladoc) — Delta OPTIMIZE / Iceberg binpack:
    // a micro-batched ingest leaves 4 small files per bucket; the plan
    // (pure log metadata: manifest × stats, n_rows < total/6, groups
    // ≥ 2) selects exactly the 8 small files in 2 groups, never the
    // large bucket-2 file; the rewrite lands 9 → 3 files with the
    // large file CARRIED BY PATH, censuses neutral, and snapshot 1
    // still reading as 9 files. Oracle: construction constants + the
    // orders census, compact_ok TRUE.
    Q(
      "s58_binpack_compaction",
      (s, dir) => graft.sinks.SnapshotLog.binpackCompaction(s, dir),
      Some("""WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
            CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
        SELECT CAST(9 AS BIGINT) AS n_files_s1,
          CAST(8 AS BIGINT) AS n_small_planned,
          CAST(2 AS BIGINT) AS n_groups,
          CAST(3 AS BIGINT) AS n_files_s2,
          CAST(9 AS BIGINT) AS n_files_tt1,
          CAST(count(*) AS BIGINT) AS n_rows,
          CAST(sum(cents) AS BIGINT) AS sum_cents,
          TRUE AS compact_ok
        FROM o ORDER BY n_files_s1""")
    ),
    // s59: streaming data-quality monitor (StreamQuality scaladoc) —
    // q193's gates per ingest epoch with a keep-rate floor (500 bp,
    // measured LIVE: epoch 0 trips it at sf0.01 and not at
    // sf0.001/sf0.1); per epoch one map-side census row, nothing
    // carried between epochs. Oracle: the identical gate arithmetic
    // over the doc_id<250 / ≥250 epoch slices (the stageDocBatches
    // split), stream ≡ batch under AvailableNow.
    Q(
      "s59_stream_quality_monitor",
      (s, dir) => graft.streaming.StreamQuality.streamQualityMonitor(s, dir),
      Some(s"""WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS ws,
            CASE WHEN doc_id < 250 THEN 0 ELSE 1 END AS epoch FROM documents),
        f AS (SELECT epoch, lang, CAST(len(ws) AS BIGINT) AS nw,
            CAST(len(list_distinct(ws)) AS BIGINT) AS ndw,
            CAST(list_sum(list_transform(ws, w ->
              ((${graft.oracle.OracleSql.h60("w")} % 64)
                * (${graft.oracle.OracleSql.h60("w")} % 64) * 31
                + (${graft.oracle.OracleSql.h60("w")} % 64) * 7) % 21 - 10))
              AS BIGINT) AS logit
          FROM d),
        g AS (SELECT epoch, lang = 'en' AS f_lang,
            lang = 'en' AND nw BETWEEN 40 AND 90 AS f_len,
            lang = 'en' AND nw BETWEEN 40 AND 90 AND ndw * 100 >= nw * 40
              AS f_rep,
            lang = 'en' AND nw BETWEEN 40 AND 90 AND ndw * 100 >= nw * 40
              AND logit >= 0 AS f_keep
          FROM f),
        e AS (SELECT CAST(epoch AS BIGINT) AS epoch,
            CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(CASE WHEN f_lang THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
            CAST(sum(CASE WHEN f_len THEN 1 ELSE 0 END) AS BIGINT) AS n_len,
            CAST(sum(CASE WHEN f_rep THEN 1 ELSE 0 END) AS BIGINT) AS n_rep,
            CAST(sum(CASE WHEN f_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
          FROM g GROUP BY epoch)
        SELECT epoch, n_docs, n_lang, n_len, n_rep, n_keep,
          CAST(n_keep * 10000 // n_docs AS BIGINT) AS keep_bp,
          n_keep * 10000 // n_docs
            < ${graft.streaming.StreamQuality.KeepFloorBp} AS breach
        FROM e ORDER BY epoch""")
    ),
    // s60: commit retry with rebase (SnapshotLog.commitRetryRebase
    // scaladoc) — the optimistic-concurrency loop of a multi-writer
    // table: writer B's stale-parent commit rejects cleanly, the rebase
    // re-proposes the SAME staged file on the new head (appends are
    // conflict-free by construction; data written once, retries are
    // metadata-only), snapshot 2 = base + A only, snapshot 3 = all
    // three writers' rows. Oracle: census arithmetic + insert-batch
    // constants (A: Σ(3000000+13i, i<10) = 30000585; B:
    // Σ(4000000+17i, i<10) = 40000765).
    Q(
      "s60_commit_retry_rebase",
      (s, dir) => graft.sinks.SnapshotLog.commitRetryRebase(s, dir),
      Some("""WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
            CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        b AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s FROM o)
        SELECT b.n AS n_rows_base, CAST(10 AS BIGINT) AS n_a,
          CAST(10 AS BIGINT) AS n_b,
          TRUE AS first_b_rejected, TRUE AS rebase_committed,
          b.n + 10 AS n_rows_s2, b.n + 20 AS n_rows_s3,
          b.s + 30000585 + 40000765 AS sum_cents_s3,
          TRUE AS retry_ok
        FROM b ORDER BY n_rows_base""")
    ),
    // s61: streaming auto-compaction (SnapshotLog.streamAutoCompact
    // scaladoc) — the maintenance loop fused into the ingest loop:
    // each epoch appends 2 small files through the log; the file-count
    // policy (manifest ≥ 4) trips after epoch 1 and the s58 planner
    // lands a census-neutral compaction as its own commit (4 → 1
    // files); epoch 2's appends arrive on top (3 files). All four
    // snapshots time-travel with their own file counts. Oracle: s41's
    // epoch slices (splitDay / full / replay) + construction-constant
    // file counts.
    Q(
      "s61_stream_autocompact",
      (s, dir) => graft.sinks.SnapshotLog.streamAutoCompact(s, dir),
      Some(s"""WITH e AS (SELECT CAST(floor(value * 100) AS BIGINT) AS cents,
            ${dayInt("ts")} AS day FROM events),
        b0 AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
          FROM e WHERE day <= ${graft.streaming.Watermarks.splitDay}),
        ba AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
          FROM e),
        br AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
          FROM e WHERE day < ${graft.streaming.Watermarks.replayBefore})
        SELECT CAST(1 AS BIGINT) AS snapshot_id, CAST(2 AS BIGINT) AS n_files,
          b0.n AS n_rows, b0.s AS sum_cents, FALSE AS compacted,
          FALSE AS is_current, TRUE AS loop_ok
        FROM b0
        UNION ALL
        SELECT CAST(2 AS BIGINT), CAST(4 AS BIGINT), ba.n, ba.s, FALSE,
          FALSE, TRUE
        FROM ba
        UNION ALL
        SELECT CAST(3 AS BIGINT), CAST(1 AS BIGINT), ba.n, ba.s, TRUE,
          FALSE, TRUE
        FROM ba
        UNION ALL
        SELECT CAST(4 AS BIGINT), CAST(3 AS BIGINT), ba.n + br.n,
          ba.s + br.s, FALSE, TRUE, TRUE
        FROM ba, br
        ORDER BY snapshot_id""")
    ),
    // s62: streaming CDC consumer (SnapshotLog.cdcStreamConsume
    // scaladoc) — s56's replica maintenance as a foreachBatch MERGE
    // loop, one micro-batch per source commit, with batch 2 INJECTED a
    // second time: the apply_log ledger must reject the redelivery
    // (applied=false, censuses frozen at snapshot 3). Oracle: s56's
    // cumulative predicate arithmetic; step 3 mirrors step 2's
    // censuses with applied=FALSE.
    Q(
      "s62_stream_cdc_consume",
      (s, dir) => graft.sinks.SnapshotLog.cdcStreamConsume(s, dir),
      Some("""WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
            CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        d1 AS (SELECT CAST(count(*) AS BIGINT) AS c,
            CAST(sum(cents) AS BIGINT) AS s FROM o WHERE k % 20 = 6),
        u1 AS (SELECT CAST(count(*) AS BIGINT) AS c FROM o WHERE k % 20 = 2),
        d2 AS (SELECT CAST(count(*) AS BIGINT) AS c,
            CAST(sum(cents) AS BIGINT) AS s FROM o WHERE k % 20 = 13),
        u2 AS (SELECT CAST(count(*) AS BIGINT) AS c FROM o WHERE k % 20 = 17),
        b AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s FROM o),
        st2 AS (SELECT b.n - d1.c + 10 AS n,
            b.s - d1.s + 1000 * u1.c + 10000315 AS s FROM b, d1, u1),
        st3 AS (SELECT st2.n - d2.c + 5 AS n,
            st2.s - d2.s + 500 * u2.c + 10000110 AS s FROM st2, d2, u2)
        SELECT CAST(1 AS BIGINT) AS step, CAST(1 AS BIGINT) AS batch_id,
          d1.c AS n_delete, u1.c AS n_update, CAST(10 AS BIGINT) AS n_insert,
          TRUE AS applied, st2.n AS replica_rows, st2.s AS replica_cents,
          st2.n AS src_rows, st2.s AS src_cents,
          TRUE AS apply_ok, TRUE AS consume_ok
        FROM d1, u1, st2
        UNION ALL
        SELECT CAST(2 AS BIGINT), CAST(2 AS BIGINT), d2.c, u2.c,
          CAST(5 AS BIGINT), TRUE, st3.n, st3.s, st3.n, st3.s, TRUE, TRUE
        FROM d2, u2, st3
        UNION ALL
        SELECT CAST(3 AS BIGINT), CAST(2 AS BIGINT), d2.c, u2.c,
          CAST(5 AS BIGINT), FALSE, st3.n, st3.s, st3.n, st3.s, TRUE, TRUE
        FROM d2, u2, st3
        ORDER BY step""")
    ),
    // s63: three-way branch merge (SnapshotLog.branchMerge scaladoc) —
    // the WAP family's missing verb: main and a branch diverge from a
    // common base; the branch's manifest delta replays onto main's
    // head as a metadata-only merge commit (both edits land, census
    // in-hash), and a second branch that rewrote the SAME file main
    // rewrote must be rejected as a conflict with the pointer frozen.
    // Oracle: both edits' predicate arithmetic applied to the base;
    // insert sums are construction constants (Σ(3000000+13i, i<6) =
    // 18000195, Σ(4000000+17i, i<4) = 16000102).
    Q(
      "s63_branch_merge",
      (s, dir) => graft.sinks.SnapshotLog.branchMerge(s, dir),
      Some("""WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
            CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        d7 AS (SELECT CAST(count(*) AS BIGINT) AS c,
            CAST(sum(cents) AS BIGINT) AS s FROM o WHERE k % 20 = 7),
        u11 AS (SELECT CAST(count(*) AS BIGINT) AS c FROM o WHERE k % 20 = 11),
        d8 AS (SELECT CAST(count(*) AS BIGINT) AS c,
            CAST(sum(cents) AS BIGINT) AS s FROM o WHERE k % 20 = 8),
        u0 AS (SELECT CAST(count(*) AS BIGINT) AS c FROM o WHERE k % 20 = 0),
        b AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s FROM o)
        SELECT CAST(1 AS BIGINT) AS n_branch_added,
          CAST(1 AS BIGINT) AS n_branch_removed,
          CAST(1 AS BIGINT) AS n_main_added,
          CAST(1 AS BIGINT) AS n_main_removed,
          TRUE AS merged,
          b.n - d7.c - d8.c + 10 AS n_rows_merged,
          b.s - d7.s - d8.s + 300 * u11.c + 200 * u0.c
            + 18000195 + 16000102 AS sum_cents_merged,
          TRUE AS conflict_rejected, TRUE AS merge_ok
        FROM d7, u11, d8, u0, b
        ORDER BY n_branch_added""")
    ),
    // s64: NDV sketches in the manifest (SnapshotLog.ndvSketchStats
    // scaladoc) — per-file HLL registers persisted as stats metadata at
    // write time, merged per-bucket-max at PLAN time for any file
    // subset (Iceberg puffin shape on q170's exact-integer kernel).
    // Oracle: per-file registers are per-residue registers (file b =
    // k%4=b), merged scope registers equal registers over the scope
    // predicate by the HLL merge property; estimate via the HUGEINT
    // Flajolet formula; exact via count(DISTINCT).
    Q(
      "s64_ndv_sketch_stats",
      (s, dir) => graft.sinks.SnapshotLog.ndvSketchStats(s, dir),
      Some {
        val h = graft.oracle.OracleSql.h60("CAST(cust AS VARCHAR)")
        s"""WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
              CAST(o_custkey AS BIGINT) AS cust FROM orders),
          hh AS (SELECT k % 4 AS f, $h AS h FROM o),
          r AS (SELECT f, h // ${1L << 54} AS bucket,
              CASE WHEN h % ${1L << 54} = 0 THEN CAST(55 AS BIGINT)
                   ELSE CAST(55 - length(bin(h % ${1L << 54})) AS BIGINT)
              END AS rk FROM hh),
          fr AS (SELECT f, bucket, CAST(max(rk) AS BIGINT) AS mr
            FROM r GROUP BY f, bucket),
          sc AS (SELECT * FROM (VALUES ('all', 4), ('b01', 2)) t(scope, nf)),
          sel AS (SELECT sc.scope, sc.nf, fr.f, fr.bucket, fr.mr
            FROM sc JOIN fr ON sc.scope = 'all' OR fr.f < 2),
          mrg AS (SELECT scope, nf, bucket, max(mr) AS mr
            FROM sel GROUP BY 1, 2, 3),
          srows AS (SELECT scope, CAST(count(*) AS BIGINT) AS n_sketch_rows
            FROM sel GROUP BY 1),
          sh AS (SELECT scope, nf,
              ${graft.oracle.OracleSql.hllSH} AS s_h
            FROM mrg GROUP BY 1, 2),
          est AS (SELECT scope, nf,
              ${graft.oracle.OracleSql.hllEstimate("s_h")} AS est_ndv
            FROM sh),
          ex AS (SELECT 'all' AS scope,
              CAST(count(DISTINCT cust) AS BIGINT) AS exact_ndv FROM o
            UNION ALL SELECT 'b01',
              CAST(count(DISTINCT cust) AS BIGINT) FROM o WHERE k % 4 < 2)
          SELECT est.scope, CAST(est.nf AS BIGINT) AS n_files,
            srows.n_sketch_rows, est.est_ndv, ex.exact_ndv,
            abs(est.est_ndv - ex.exact_ndv) * 10000 // ex.exact_ndv AS err_bp,
            TRUE AS regs_match, TRUE AS log_ok
          FROM est JOIN ex ON est.scope = ex.scope
          JOIN srows ON est.scope = srows.scope
          ORDER BY est.scope"""
      }
    ),
    // s65: two-level manifest pruning (SnapshotLog.twoLevelManifest
    // scaladoc) — 16 bucket files in 4 summary-carrying manifest
    // groups; a point query reads 1 group / 4 entry rows / 1 file, a
    // range query 3 / 12 / 7, with plan censuses in-hash and plan_ok
    // pinning planned-scan == direct-predicate census. Oracle: the
    // construction constants + predicate censuses over `orders`.
    Q(
      "s65_two_level_manifest",
      (s, dir) => graft.sinks.SnapshotLog.twoLevelManifest(s, dir),
      Some("""WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
            CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        p AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s FROM o WHERE k % 16 = 5),
        r AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s FROM o
          WHERE k % 16 BETWEEN 6 AND 12)
        SELECT 'point_b5' AS query, CAST(4 AS BIGINT) AS n_groups,
          CAST(1 AS BIGINT) AS n_groups_read,
          CAST(4 AS BIGINT) AS n_entries_read,
          CAST(1 AS BIGINT) AS n_files_scanned,
          p.n AS n_rows, p.s AS sum_cents, TRUE AS plan_ok
        FROM p
        UNION ALL
        SELECT 'range_b6_12', CAST(4 AS BIGINT), CAST(3 AS BIGINT),
          CAST(12 AS BIGINT), CAST(7 AS BIGINT), r.n, r.s, TRUE
        FROM r
        ORDER BY query""")
    ),
    // s66: streaming classifier drift monitor (StreamQuality
    // .classifierDriftMonitor scaladoc) — q189's trainer re-fit per
    // ingest epoch, weight-table delta (Σ|Δwt| + sign flips) as the
    // drift signal, the epoch's own table applied for keep_bp. Oracle:
    // the identical trainer/drift/apply arithmetic per doc_id epoch
    // slice (<250 / ≥250 — the stageDocBatches split), zero-filled
    // 64-slot tables via range(64), epoch 0 diffing the zero table.
    Q(
      "s66_stream_classifier_drift",
      (s, dir) => graft.streaming.StreamQuality.classifierDriftMonitor(s, dir),
      Some {
        val h = graft.oracle.OracleSql.h60("w")
        s"""WITH d AS (SELECT doc_id, text,
              CAST(substring(source, 4) AS BIGINT) AS sn,
              CASE WHEN doc_id < 250 THEN 0 ELSE 1 END AS ep FROM documents),
          t AS (SELECT ep, sn, doc_id, unnest(string_split(text, ' ')) AS w
            FROM d),
          ce AS (SELECT ep, ($h) % 64 AS b,
              CAST(count(*) FILTER (sn < 4) AS BIGINT) AS pos_c,
              CAST(count(*) FILTER (sn >= 16) AS BIGINT) AS neg_c
            FROM t WHERE sn < 4 OR sn >= 16 GROUP BY 1, 2),
          slots AS (SELECT e.ep, s.b
            FROM (SELECT DISTINCT ep FROM d) e,
              (SELECT unnest(range(64)) AS b) s),
          wt AS (SELECT s.ep, s.b,
              CAST(coalesce(((ce.pos_c + 1) * 1000) // (ce.pos_c + ce.neg_c + 2)
                - 500, 0) AS BIGINT) AS wt
            FROM slots s LEFT JOIN ce ON s.ep = ce.ep AND s.b = ce.b),
          chk AS (SELECT ep, CAST(sum(abs(wt)) AS BIGINT) AS wt_abs,
              CAST(sum(wt * (b + 1)) AS BIGINT) AS wt_dot FROM wt GROUP BY 1),
          dl AS (SELECT w1.ep,
              CAST(sum(abs(w1.wt - coalesce(w0.wt, 0))) AS BIGINT) AS delta_abs,
              CAST(count(*) FILTER ((w1.wt > 0 AND coalesce(w0.wt, 0) < 0)
                OR (w1.wt < 0 AND coalesce(w0.wt, 0) > 0)) AS BIGINT)
                AS n_sign_flips
            FROM wt w1 LEFT JOIN wt w0 ON w0.ep = w1.ep - 1 AND w0.b = w1.b
            GROUP BY 1),
          sd AS (SELECT ep,
              CAST(count(*) FILTER (sn < 4) AS BIGINT) AS n_seed_pos,
              CAST(count(*) FILTER (sn >= 16) AS BIGINT) AS n_seed_neg
            FROM t WHERE sn < 4 OR sn >= 16 GROUP BY 1),
          lgd AS (SELECT tw.ep, tw.doc_id, CAST(sum(wt.wt) AS BIGINT) AS logit
            FROM (SELECT ep, doc_id, ($h) % 64 AS b FROM t) tw
            JOIN wt ON wt.ep = tw.ep AND wt.b = tw.b
            GROUP BY 1, 2),
          kp AS (SELECT ep, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(count(*) FILTER (logit >= 0) AS BIGINT) AS n_keep
            FROM lgd GROUP BY 1)
          SELECT CAST(kp.ep + 1 AS BIGINT) AS step, kp.n_docs,
            sd.n_seed_pos, sd.n_seed_neg, chk.wt_abs, chk.wt_dot,
            dl.delta_abs, dl.n_sign_flips,
            (kp.n_keep * 10000) // kp.n_docs AS keep_bp,
            TRUE AS monitor_ok
          FROM kp JOIN sd ON kp.ep = sd.ep JOIN chk ON kp.ep = chk.ep
          JOIN dl ON kp.ep = dl.ep
          ORDER BY step"""
      }
    ),
    // s67: bucket-layout EVOLUTION (SnapshotLog.bucketEvolution
    // scaladoc) — q209's 8-bucket co-located layout rewritten to 16
    // with the transition planned from the log's bucket-spec metadata
    // (s48's cross-spec discipline applied to bucket specs): the join
    // stays exchange-free on BOTH layouts (q209's structural in-query
    // count), the rewrite is census-neutral (in-hash equality), and a
    // reader still pinned to the 8-bucket spec is REJECTED by the
    // guard after the evolution, never silently mis-co-located
    // (adversarial pin in SnapshotLogSpec). Oracle: the join census
    // from the raw tables + the lifecycle's plan constants.
    Q(
      "s67_bucket_evolution",
      (s, dir) => graft.sinks.SnapshotLog.bucketEvolution(s, dir),
      Some("""WITH j AS (SELECT CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
          a AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(cents) AS BIGINT) AS s FROM j)
        SELECT * FROM (
          SELECT CAST(1 AS BIGINT) AS snapshot_id, CAST(8 AS BIGINT) AS n_buckets,
            n AS n_rows, s AS sum_cents, CAST(0 AS BIGINT) AS exchanges_join,
            TRUE AS census_ok, TRUE AS spec_guard_ok FROM a
          UNION ALL
          SELECT CAST(2 AS BIGINT), CAST(16 AS BIGINT), n, s,
            CAST(0 AS BIGINT), TRUE, TRUE FROM a)
        ORDER BY snapshot_id""")
    ),
    // s68: WARM-START classifier drift monitor (StreamQuality
    // .warmStartDriftMonitor scaladoc) — s66's monitor with the
    // previous epoch's label-conditional censuses folded in at
    // PER-LABEL keep budgets before the fit (floor(c·15/16) for the
    // rare positive seed label, floor(c·3/4) for the abundant negative
    // — r18 verdict: a global rate washes out scarce positive evidence
    // at the majority class's rate): drift decays smoothly instead of
    // resetting, and the folded per-label totals (acc_pos/acc_neg)
    // ride the hash so the oracle must replay BOTH integer decays
    // slot-for-slot. Epoch 0 ≡ the cold fit (decay of an empty history
    // is exactly 0 at any rate — continuity pinned in WarmStartSpec).
    // Oracle: the identical fold/fit/drift/apply arithmetic per doc_id
    // epoch slice over zero-filled 64-slot tables.
    Q(
      "s68_warmstart_drift",
      (s, dir) => graft.streaming.StreamQuality.warmStartDriftMonitor(s, dir),
      Some {
        val h = graft.oracle.OracleSql.h60("w")
        s"""WITH d AS (SELECT doc_id, text,
              CAST(substring(source, 4) AS BIGINT) AS sn,
              CASE WHEN doc_id < 250 THEN 0 ELSE 1 END AS ep FROM documents),
          t AS (SELECT ep, sn, doc_id, unnest(string_split(text, ' ')) AS w
            FROM d),
          ce AS (SELECT ep, ($h) % 64 AS b,
              CAST(count(*) FILTER (sn < 4) AS BIGINT) AS pos_c,
              CAST(count(*) FILTER (sn >= 16) AS BIGINT) AS neg_c
            FROM t WHERE sn < 4 OR sn >= 16 GROUP BY 1, 2),
          slots AS (SELECT e.ep, s.b
            FROM (SELECT DISTINCT ep FROM d) e,
              (SELECT unnest(range(64)) AS b) s),
          cez AS (SELECT s.ep, s.b,
              CAST(coalesce(ce.pos_c, 0) AS BIGINT) AS pos_c,
              CAST(coalesce(ce.neg_c, 0) AS BIGINT) AS neg_c
            FROM slots s LEFT JOIN ce ON s.ep = ce.ep AND s.b = ce.b),
          acc AS (
            SELECT 0 AS ep, b, pos_c AS pos_a, neg_c AS neg_a
            FROM cez WHERE ep = 0
            UNION ALL
            SELECT 1, c1.b,
              (c0.pos_c * 15) // 16 + c1.pos_c,
              (c0.neg_c * 3) // 4 + c1.neg_c
            FROM cez c0 JOIN cez c1 ON c0.b = c1.b
            WHERE c0.ep = 0 AND c1.ep = 1),
          wt AS (SELECT ep, b,
              CAST(((pos_a + 1) * 1000) // (pos_a + neg_a + 2) - 500
                AS BIGINT) AS wt
            FROM acc),
          at AS (SELECT ep, CAST(sum(pos_a) AS BIGINT) AS acc_pos,
              CAST(sum(neg_a) AS BIGINT) AS acc_neg FROM acc GROUP BY 1),
          chk AS (SELECT ep, CAST(sum(abs(wt)) AS BIGINT) AS wt_abs,
              CAST(sum(wt * (b + 1)) AS BIGINT) AS wt_dot FROM wt GROUP BY 1),
          dl AS (SELECT w1.ep,
              CAST(sum(abs(w1.wt - coalesce(w0.wt, 0))) AS BIGINT) AS delta_abs,
              CAST(count(*) FILTER ((w1.wt > 0 AND coalesce(w0.wt, 0) < 0)
                OR (w1.wt < 0 AND coalesce(w0.wt, 0) > 0)) AS BIGINT)
                AS n_sign_flips
            FROM wt w1 LEFT JOIN wt w0 ON w0.ep = w1.ep - 1 AND w0.b = w1.b
            GROUP BY 1),
          sd AS (SELECT ep,
              CAST(count(*) FILTER (sn < 4) AS BIGINT) AS n_seed_pos,
              CAST(count(*) FILTER (sn >= 16) AS BIGINT) AS n_seed_neg
            FROM t WHERE sn < 4 OR sn >= 16 GROUP BY 1),
          lgd AS (SELECT tw.ep, tw.doc_id, CAST(sum(wt.wt) AS BIGINT) AS logit
            FROM (SELECT ep, doc_id, ($h) % 64 AS b FROM t) tw
            JOIN wt ON wt.ep = tw.ep AND wt.b = tw.b
            GROUP BY 1, 2),
          kp AS (SELECT ep, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(count(*) FILTER (logit >= 0) AS BIGINT) AS n_keep
            FROM lgd GROUP BY 1)
          SELECT CAST(kp.ep + 1 AS BIGINT) AS step, kp.n_docs,
            sd.n_seed_pos, sd.n_seed_neg, at.acc_pos, at.acc_neg,
            chk.wt_abs, chk.wt_dot, dl.delta_abs, dl.n_sign_flips,
            (kp.n_keep * 10000) // kp.n_docs AS keep_bp,
            TRUE AS warm_ok
          FROM kp JOIN sd ON kp.ep = sd.ep JOIN chk ON kp.ep = chk.ep
          JOIN dl ON kp.ep = dl.ep JOIN at ON kp.ep = at.ep
          ORDER BY step"""
      }
    ),
    // s69: DuckDB BULK-LOAD PARITY — the last driver funnel in the sink
    // story, deleted: s01/s30/s47 ingest through the APPENDER
    // (DuckDbLive.appendAll streams every row through the driver — kept
    // as the O21/O22 cadence demo, inherent to a single-file live
    // sink), but at 100 TB the handoff is the engine's own parquet
    // export bulk-ingested by DuckDB itself (CREATE TABLE AS
    // read_parquet — no row ever crosses the driver). This entry proves
    // the two paths land IDENTICAL tables: both ingest the same export
    // (BIGINT/VARCHAR/DATE columns — the appender's cast paths
    // exercised), and the JDBC read-back compares census + an
    // order-free modular row digest (md5-content per row, summed mod
    // 1e9+7 — the q148 digest class) computed INSIDE DuckDB over each
    // table. parity_ok rides the hash; a missing driver degrades to
    // live_sink=false and fails the oracle's TRUE.
    Q(
      "s69_duckdb_bulk_parity",
      (s, dir) => {
        import s.implicits._
        import graft.sinks.DuckDbLive
        val out = s69Staged.computeIfAbsent(dir, _ => {
          val o = java.nio.file.Files
            .createTempDirectory("graft_s69_").toAbsolutePath.toString
          val df = Tables.orders(s, dir).select(
            col("o_orderkey").cast("long").as("k"),
            expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"),
            col("o_orderstatus").cast("string").as("st"),
            col("o_orderdate").cast("date").as("d"))
          // the engine's own export — the 100 TB handoff artifact
          df.repartition(4).write.parquet(s"$o/export")
          if (DuckDbLive.available) {
            DuckDbLive.withConnection(s"$o/par.duckdb") { c =>
              DuckDbLive.execute(
                c, "CREATE TABLE t_app(k BIGINT, cents BIGINT, st VARCHAR, d DATE)")
              // path 1: the appender (the O21/O22 cadence demo — driver
              // loop). d rides the driver hop as its ISO string: the
              // appender writes DATE via the varchar-with-cast path
              // anyway (DuckDbLive type map), and java.sql.Date decoding
              // through toLocalIterator proved flaky deep into long
              // multi-query suites (r19 bench: suite-only
              // EXPRESSION_DECODING_FAILED on the date field, never
              // reproducible in isolation) — the string form keeps the
              // driver decode to longs+strings with identical storage.
              DuckDbLive.appendAll(
                c,
                "t_app",
                s.read.parquet(s"$o/export").select(
                  col("k"), col("cents"), col("st"),
                  col("d").cast("string").as("d")),
                commitEvery = 1000)
              // path 2: DuckDB bulk-ingests the export — no driver hop
              DuckDbLive.execute(
                c,
                s"""CREATE TABLE t_bulk AS SELECT k, cents, st, d
                   FROM read_parquet('$o/export/*.parquet')""")
            }
          }
          o
        })

        def censusSql(t: String) =
          s"""SELECT count(*), count(DISTINCT st),
             CAST(sum(k) AS BIGINT), CAST(sum(cents) AS BIGINT),
             CAST(sum(CAST(('0x' || substr(md5(
               k || '|' || cents || '|' || st || '|' || CAST(d AS VARCHAR)
             ), 1, 15)) AS BIGINT) % 1000000007) AS BIGINT)
             FROM $t"""

        if (DuckDbLive.available) {
          // the repeating parity CHECK: two in-DuckDB censuses over the
          // staged tables (staging memoized above)
          val (app, bulk) = DuckDbLive.withConnection(s"$out/par.duckdb") { c =>
            (DuckDbLive.queryRow(c, censusSql("t_app"))
               .map(_.asInstanceOf[Number].longValue),
              DuckDbLive.queryRow(c, censusSql("t_bulk"))
                .map(_.asInstanceOf[Number].longValue))
          }
          Seq((app(0), app(1), app(2), app(3), app(4), app == bulk, true))
            .toDF("n_rows", "n_status", "sum_k", "sum_cents", "row_digest",
              "parity_ok", "live_sink")
            .orderBy("n_rows")
        } else {
          // honest fallback: the same census from the export via Spark;
          // parity untestable without the driver → fails the oracle's TRUE
          import graft.ops.Hashing
          val r = s.read.parquet(s"$out/export")
            .agg(
              count(lit(1)), countDistinct(col("st")),
              sum(col("k")), sum(col("cents")),
              sum(pmod(
                Hashing.h60(concat_ws("|",
                  col("k"), col("cents"), col("st"), col("d").cast("string"))),
                lit(1000000007L))))
            .head()
          Seq((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4), false, false))
            .toDF("n_rows", "n_status", "sum_k", "sum_cents", "row_digest",
              "parity_ok", "live_sink")
            .orderBy("n_rows")
        }
      },
      Some {
        val h = graft.oracle.OracleSql.h60(
          "k || '|' || cents || '|' || st || '|' || CAST(d AS VARCHAR)")
        s"""WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
              CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
              o_orderstatus AS st, CAST(o_orderdate AS DATE) AS d FROM orders)
          SELECT CAST(count(*) AS BIGINT) AS n_rows,
            CAST(count(DISTINCT st) AS BIGINT) AS n_status,
            CAST(sum(k) AS BIGINT) AS sum_k,
            CAST(sum(cents) AS BIGINT) AS sum_cents,
            CAST(sum($h % 1000000007) AS BIGINT) AS row_digest,
            TRUE AS parity_ok, TRUE AS live_sink
          FROM o ORDER BY n_rows"""
      }
    ),
    // s70: INCREMENTAL stat maintenance under streaming ingest
    // (StreamHll.streamedNdvMaintenance scaladoc) — each epoch appends
    // its ≤64 register rows into q212's long-form col_ndv table and the
    // planner answers cumulative-NDV questions per epoch by merging the
    // table's rows; history is never rescanned for stats. Per-epoch
    // est-vs-exact err_bp and the persisted merge property (regs_match)
    // ride the hash. Oracle: identical per-step math over cumulative
    // doc_id slices.
    Q(
      "s70_stream_ndv_maintenance",
      (s, dir) => graft.streaming.StreamHll.streamedNdvMaintenance(s, dir),
      Some {
        import graft.oracle.OracleSql.{h60, hllBucket, hllEstimate, hllRank, hllSH}
        val h = h60("text")
        s"""WITH d AS (SELECT doc_id, text,
              CASE WHEN doc_id < 250 THEN 0 ELSE 1 END AS ep FROM documents),
          steps AS (SELECT CAST(unnest([1, 2]) AS BIGINT) AS step),
          cum AS (SELECT t.step, d.text FROM d, steps t WHERE d.ep < t.step),
          nd AS (SELECT CAST(ep + 1 AS BIGINT) AS step,
              CAST(count(*) AS BIGINT) AS n_docs FROM d GROUP BY 1),
          hh AS (SELECT step, $h AS h FROM cum),
          regs AS (SELECT step, ${hllBucket("h")} AS bucket,
              CAST(max(${hllRank("h")}) AS BIGINT) AS mr
            FROM hh GROUP BY 1, 2),
          epcells AS (SELECT DISTINCT ep, ${hllBucket("h")} AS bucket
            FROM (SELECT ep, $h AS h FROM d)),
          st AS (SELECT t.step, CAST(count(*) AS BIGINT) AS n_stat_rows
            FROM epcells e, steps t WHERE e.ep < t.step GROUP BY 1),
          sh AS (SELECT step, $hllSH AS s_h FROM regs GROUP BY 1),
          est AS (SELECT step, ${hllEstimate("s_h")} AS est_ndv FROM sh),
          ex AS (SELECT step, CAST(count(DISTINCT text) AS BIGINT) AS exact_ndv
            FROM cum GROUP BY 1)
          SELECT est.step, nd.n_docs, st.n_stat_rows, est.est_ndv, ex.exact_ndv,
            abs(est.est_ndv - ex.exact_ndv) * 10000 // ex.exact_ndv AS err_bp,
            TRUE AS regs_match, TRUE AS live_stats
          FROM est JOIN nd ON est.step = nd.step
          JOIN st ON est.step = st.step JOIN ex ON est.step = ex.step
          ORDER BY est.step"""
      }
    ),
    // s71: stat STALENESS under deletes — registers can't decrement,
    // so an s49-class position delete marks the affected file's
    // col_ndv rows stale (stat_stale, riding the delete commit) and
    // the estimator recomputes ONLY that file's scope with the masks
    // applied (q215's pruned read); merging a stale scope is REJECTED
    // loudly (SnapshotLogSpec pins the guard). In-hash per snapshot:
    // fresh-path est vs the naive stale-inclusive est vs exact NDV
    // (the prevented over-count measured as naive_err_bp), the fresh
    // stat-row count, the guard flag, and the merge property through
    // the recompute. Full lifecycle + scale shape:
    // SnapshotLog.staleStatsOnDelete scaladoc.
    Q(
      "s71_stale_stats_on_delete",
      (s, dir) => graft.sinks.SnapshotLog.staleStatsOnDelete(s, dir),
      Some {
        import graft.oracle.OracleSql.{h60, hllBucket, hllEstimate, hllRank, hllSH}
        val h = h60("CAST(cust AS VARCHAR)")
        s"""WITH b AS (SELECT CAST(o_custkey AS BIGINT) AS cust FROM orders),
          steps AS (SELECT CAST(unnest([1, 2]) AS BIGINT) AS step),
          lv AS (SELECT t.step, b.cust FROM b, steps t
            WHERE t.step = 1 OR NOT (b.cust % 4 = 2 AND b.cust % 20 >= 10)),
          n AS (SELECT step, CAST(count(*) AS BIGINT) AS n_live_rows,
              CAST(count(DISTINCT cust) AS BIGINT) AS exact_ndv
            FROM lv GROUP BY 1),
          hh AS (SELECT DISTINCT step, $h AS h FROM lv),
          regs AS (SELECT step, ${hllBucket("h")} AS bucket,
              CAST(max(${hllRank("h")}) AS BIGINT) AS mr FROM hh GROUP BY 1, 2),
          est AS (SELECT step, ${hllEstimate("s_h")} AS est_ndv FROM
            (SELECT step, $hllSH AS s_h FROM regs GROUP BY step)),
          nregs AS (SELECT ${hllBucket("h")} AS bucket,
              CAST(max(${hllRank("h")}) AS BIGINT) AS mr
            FROM (SELECT DISTINCT $h AS h FROM b) GROUP BY 1),
          nv AS (SELECT ${hllEstimate("s_h")} AS naive_est_ndv FROM
            (SELECT $hllSH AS s_h FROM nregs)),
          fc AS (SELECT step, CAST(count(*) AS BIGINT) AS n_fresh_stat_rows
            FROM (SELECT DISTINCT t.step, b.cust % 4 AS g,
                ${hllBucket(h)} AS bucket
              FROM b, steps t WHERE t.step = 1 OR b.cust % 4 <> 2)
            GROUP BY 1)
          SELECT n.step, n.n_live_rows, CAST(4 AS BIGINT) AS n_files,
            CAST(CASE WHEN n.step = 1 THEN 0 ELSE 1 END AS BIGINT)
              AS n_stale_files,
            fc.n_fresh_stat_rows, est.est_ndv, nv.naive_est_ndv, n.exact_ndv,
            CAST((CAST(est.est_ndv AS HUGEINT) - n.exact_ndv) * 10000
              // n.exact_ndv AS BIGINT) AS err_bp,
            CAST((CAST(nv.naive_est_ndv AS HUGEINT) - n.exact_ndv) * 10000
              // n.exact_ndv AS BIGINT) AS naive_err_bp,
            TRUE AS regs_match, TRUE AS stale_guard_ok, TRUE AS live_log
          FROM n JOIN est ON n.step = est.step JOIN fc ON n.step = fc.step
          CROSS JOIN nv
          ORDER BY n.step"""
      }
    ),
    // s72: MULTI-LEVEL bucket evolution (8 → 16 → 32) — s67's one hop
    // composed into the production chain: each evolution planned from
    // the log's CURRENT spec, each rewrite reading the previous
    // generation's committed catalog tables, the co-located SMJ
    // exchange-free on EVERY layout (structural count in-hash), every
    // census audited against the plain join, readers accepted exactly
    // while their generation is current, and at the end state BOTH old
    // generations' pinned readers rejected. Full lifecycle + scale
    // shape: SnapshotLog.bucketEvolutionChain scaladoc.
    Q(
      "s72_bucket_evolution_chain",
      (s, dir) => graft.sinks.SnapshotLog.bucketEvolutionChain(s, dir),
      Some("""WITH j AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
            CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
              AS sum_cents
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        g AS (SELECT CAST(unnest([1, 2, 3]) AS BIGINT) AS snapshot_id,
            CAST(unnest([8, 16, 32]) AS BIGINT) AS n_buckets)
        SELECT g.snapshot_id, g.n_buckets, j.n_rows, j.sum_cents,
          CAST(0 AS BIGINT) AS exchanges_join, TRUE AS census_ok,
          TRUE AS accept_ok, TRUE AS final_state_ok
        FROM g CROSS JOIN j ORDER BY snapshot_id""")
    ),
    // s73: COMPACTION HEALS STALE STATS — the stats lifecycle closed:
    // s71's delete leaves one file's sketch rows stale and every
    // estimate paying a pruned-scope recompute scan; the compaction
    // that folds the masks also RE-STATS the new file, the stale
    // markers fall outside the new manifest, and the estimator returns
    // to the pure-metadata path (n_recompute_files 0 → 1 → 0 and the
    // naive merge collapsing back onto the fresh path, both in-hash).
    // Full lifecycle + scale shape:
    // SnapshotLog.staleStatsCompactionRefresh scaladoc.
    Q(
      "s73_stat_refresh_on_compaction",
      (s, dir) => graft.sinks.SnapshotLog.staleStatsCompactionRefresh(s, dir),
      Some {
        import graft.oracle.OracleSql.{h60, hllBucket, hllEstimate, hllRank, hllSH}
        val h = h60("CAST(cust AS VARCHAR)")
        s"""WITH b AS (SELECT CAST(o_custkey AS BIGINT) AS cust FROM orders),
          steps AS (SELECT CAST(unnest([1, 2, 3]) AS BIGINT) AS step),
          lv AS (SELECT t.step, b.cust FROM b, steps t
            WHERE t.step = 1 OR NOT (b.cust % 4 = 2 AND b.cust % 20 >= 10)),
          n AS (SELECT step, CAST(count(*) AS BIGINT) AS n_live_rows,
              CAST(count(DISTINCT cust) AS BIGINT) AS exact_ndv
            FROM lv GROUP BY 1),
          hh AS (SELECT DISTINCT step, $h AS h FROM lv),
          regs AS (SELECT step, ${hllBucket("h")} AS bucket,
              CAST(max(${hllRank("h")}) AS BIGINT) AS mr FROM hh GROUP BY 1, 2),
          est AS (SELECT step, ${hllEstimate("s_h")} AS est_ndv FROM
            (SELECT step, $hllSH AS s_h FROM regs GROUP BY step)),
          nregs AS (SELECT ${hllBucket("h")} AS bucket,
              CAST(max(${hllRank("h")}) AS BIGINT) AS mr
            FROM (SELECT DISTINCT $h AS h FROM b) GROUP BY 1),
          nvall AS (SELECT ${hllEstimate("s_h")} AS v FROM
            (SELECT $hllSH AS s_h FROM nregs)),
          fc12 AS (SELECT step, CAST(count(*) AS BIGINT) AS c
            FROM (SELECT DISTINCT t.step, b.cust % 4 AS g, ${hllBucket(h)} AS bucket
              FROM b, steps t WHERE t.step <= 2 AND (t.step = 1 OR b.cust % 4 <> 2))
            GROUP BY 1),
          fc3 AS (SELECT
            (SELECT c FROM fc12 WHERE step = 2) +
            (SELECT CAST(count(DISTINCT ${hllBucket(h)}) AS BIGINT) FROM b
              WHERE cust % 4 = 2 AND NOT (cust % 20 >= 10)) AS c)
          SELECT n.step, n.n_live_rows, CAST(4 AS BIGINT) AS n_files,
            CAST(CASE WHEN n.step = 2 THEN 1 ELSE 0 END AS BIGINT)
              AS n_stale_files,
            CAST(CASE WHEN n.step = 2 THEN 1 ELSE 0 END AS BIGINT)
              AS n_recompute_files,
            CAST(CASE WHEN n.step = 2 THEN 1 ELSE 0 END AS BIGINT)
              AS n_pos_delete_files,
            CAST(CASE WHEN n.step = 3 THEN (SELECT c FROM fc3)
              ELSE (SELECT c FROM fc12 WHERE step = n.step) END AS BIGINT)
              AS n_fresh_stat_rows,
            est.est_ndv,
            CAST(CASE WHEN n.step = 3 THEN est.est_ndv
              ELSE (SELECT v FROM nvall) END AS BIGINT) AS naive_est_ndv,
            n.exact_ndv,
            CAST((CAST(est.est_ndv AS HUGEINT) - n.exact_ndv) * 10000
              // n.exact_ndv AS BIGINT) AS err_bp,
            CAST((CAST(CASE WHEN n.step = 3 THEN est.est_ndv
                ELSE (SELECT v FROM nvall) END AS HUGEINT) - n.exact_ndv)
              * 10000 // n.exact_ndv AS BIGINT) AS naive_err_bp,
            TRUE AS regs_match, TRUE AS stale_guard_ok, TRUE AS live_log
          FROM n JOIN est ON n.step = est.step
          ORDER BY n.step"""
      }
    ),
    // s74: FREQUENCY-STAT staleness — s71's delete-side contract
    // extended to col_topk/col_cms, where the planner-visible
    // consequence is a WRONG salt decision: after the hot key's rows
    // are purged, the naive stale-inclusive path still reports the
    // dead heavy hitter (naive_salted TRUE vs exact FALSE, in-hash)
    // while the fresh path (fresh files + all three stat families
    // recomputed over only the masked stale file) tracks the truth;
    // the CMS one-sided guarantee survives the recompute and the
    // guarded reader rejects the full scope exactly at snapshot 2.
    // Full lifecycle + scale shape: SnapshotLog.freqStatsStaleness
    // scaladoc.
    Q(
      "s74_freq_stats_staleness",
      (s, dir) => graft.sinks.SnapshotLog.freqStatsStaleness(s, dir),
      Some {
        import graft.oracle.OracleSql.{h60, hllBucket, hllEstimate, hllRank, hllSH}
        val hk = h60("CAST(k AS VARCHAR)")
        val hCell = h60("CAST(r.i AS VARCHAR) || ':' || CAST(k AS VARCHAR)")
        val hProbe = h60("CAST(r.i AS VARCHAR) || ':1'")
        s"""WITH o AS (SELECT CASE WHEN o_orderstatus = 'F' THEN CAST(1 AS BIGINT)
              ELSE CAST(o_orderkey AS BIGINT) END AS k FROM orders),
          og AS (SELECT k, k % 4 AS g FROM o),
          steps AS (SELECT CAST(unnest([1, 2]) AS BIGINT) AS step),
          rws AS (SELECT CAST(unnest([0, 1, 2, 3]) AS BIGINT) AS i),
          nman AS (SELECT CAST(count(*) AS BIGINT) AS n_man FROM o),
          pf AS (SELECT g, k, CAST(count(*) AS BIGINT) AS c FROM og GROUP BY 1, 2),
          tk AS (SELECT g, k, c FROM (SELECT g, k, c, row_number()
              OVER (PARTITION BY g ORDER BY c DESC, k) AS rn FROM pf)
            WHERE rn <= 8),
          lv AS (SELECT t.step, og.k, og.g FROM og, steps t
            WHERE t.step = 1 OR og.k <> 1),
          lk AS (SELECT step, k, g, CAST(count(*) AS BIGINT) AS c
            FROM lv GROUP BY 1, 2, 3),
          cand AS (
            SELECT 1 AS step, k, c FROM tk
            UNION ALL SELECT 2, k, c FROM tk WHERE g <> 1
            UNION ALL SELECT 2, k, c FROM (SELECT k, c, row_number()
                OVER (ORDER BY c DESC, k) AS rn
              FROM (SELECT k, c FROM lk WHERE step = 2 AND g = 1))
              WHERE rn <= 8),
          mg AS (SELECT step, k, CAST(sum(c) AS BIGINT) AS c
            FROM cand GROUP BY 1, 2),
          t1 AS (SELECT step, k AS top1_key, c AS top1_cnt FROM (SELECT step,
              k, c, row_number() OVER (PARTITION BY step ORDER BY c DESC, k)
              AS rn FROM mg) WHERE rn = 1),
          fh AS (SELECT DISTINCT step, $hk AS h FROM lv),
          fregs AS (SELECT step, ${hllBucket("h")} AS bucket,
              CAST(max(${hllRank("h")}) AS BIGINT) AS mr FROM fh GROUP BY 1, 2),
          fnd AS (SELECT step, ${hllEstimate("s_h")} AS ndv FROM
            (SELECT step, $hllSH AS s_h FROM fregs GROUP BY step)),
          nt1 AS (SELECT k AS nk, c AS nc FROM (SELECT k, c, row_number()
              OVER (ORDER BY c DESC, k) AS rn FROM
              (SELECT k, CAST(sum(c) AS BIGINT) AS c FROM tk GROUP BY k))
            WHERE rn = 1),
          nregs AS (SELECT ${hllBucket("h")} AS bucket,
              CAST(max(${hllRank("h")}) AS BIGINT) AS mr
            FROM (SELECT DISTINCT $hk AS h FROM og) GROUP BY 1),
          nnd AS (SELECT ${hllEstimate("s_h")} AS ndv FROM
            (SELECT $hllSH AS s_h FROM nregs)),
          lcells AS (SELECT lk.step, r.i, ($hCell) % 64 AS j,
              CAST(sum(lk.c) AS BIGINT) AS cnt
            FROM lk CROSS JOIN rws r GROUP BY 1, 2, 3),
          ncells AS (SELECT r.i, ($hCell) % 64 AS j,
              CAST(sum(c) AS BIGINT) AS cnt
            FROM (SELECT k, CAST(sum(c) AS BIGINT) AS c FROM pf GROUP BY k)
            CROSS JOIN rws r GROUP BY 1, 2),
          pj AS (SELECT r.i, ($hProbe) % 64 AS j FROM rws r),
          cmsf AS (SELECT s.step, CAST(min(coalesce(lc.cnt, 0)) AS BIGINT) AS v
            FROM steps s CROSS JOIN pj LEFT JOIN lcells lc
              ON lc.step = s.step AND lc.i = pj.i AND lc.j = pj.j
            GROUP BY s.step),
          cmsn AS (SELECT CAST(min(coalesce(nc.cnt, 0)) AS BIGINT) AS v
            FROM pj LEFT JOIN ncells nc ON nc.i = pj.i AND nc.j = pj.j),
          ext AS (SELECT step, k AS exk, c AS exc FROM (SELECT step, k,
              CAST(sum(c) AS BIGINT) AS c, row_number() OVER (PARTITION BY step
                ORDER BY sum(c) DESC, k) AS rn
              FROM lk GROUP BY step, k) WHERE rn = 1),
          exn AS (SELECT step, CAST(count(DISTINCT k) AS BIGINT) AS exndv,
              CAST(count(*) AS BIGINT) AS n_live,
              CAST(coalesce(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS hot
            FROM lv GROUP BY 1),
          d AS (SELECT t1.step, exn.n_live,
              CAST(CASE WHEN t1.step = 2 THEN 1 ELSE 0 END AS BIGINT)
                AS n_stale_files,
              t1.top1_key, t1.top1_cnt, fnd.ndv AS ndv_est,
              CAST(CAST(t1.top1_cnt AS HUGEINT) * 100 * fnd.ndv
                // nman.n_man AS BIGINT) AS skew_x100,
              nt1.nk AS naive_top1_key, nt1.nc AS naive_top1_cnt,
              CAST(CAST(nt1.nc AS HUGEINT) * 100 * nnd.ndv
                // nman.n_man AS BIGINT) AS naive_skew_x100,
              ext.exk AS top1_exact_key, ext.exc AS top1_exact_cnt,
              CAST(CAST(ext.exc AS HUGEINT) * 100 * exn.exndv
                // nman.n_man AS BIGINT) AS exact_skew,
              cmsf.v AS cms_hot_fresh, cmsn.v AS cms_hot_naive, exn.hot
            FROM t1 JOIN fnd ON t1.step = fnd.step
            JOIN ext ON t1.step = ext.step JOIN exn ON t1.step = exn.step
            JOIN cmsf ON t1.step = cmsf.step
            CROSS JOIN nt1 CROSS JOIN nnd CROSS JOIN nman CROSS JOIN cmsn)
          SELECT step, n_live AS n_live_rows, n_stale_files,
            top1_key, top1_cnt, ndv_est, skew_x100, skew_x100 >= 800 AS salted,
            naive_top1_key, naive_top1_cnt, naive_skew_x100,
            naive_skew_x100 >= 800 AS naive_salted,
            top1_exact_key, top1_exact_cnt, exact_skew >= 800 AS exact_salted,
            cms_hot_fresh, cms_hot_naive, hot AS hot_live,
            (cms_hot_fresh >= hot AND cms_hot_naive >= hot) AS cms_ge_ok,
            (skew_x100 >= 800) = (exact_skew >= 800) AS decision_ok,
            TRUE AS stale_guard_ok, TRUE AS live_log
          FROM d ORDER BY step"""
      }
    ),
    // s75: compaction heals ALL THREE stat families — s73 re-stats
    // col_ndv only, so after s74's delete the frequency families stay
    // in the degraded recompute-tax state forever; here the rewrite
    // also records fresh col_topk/col_cms rows for the compacted file,
    // the per-family metadata coverage recovers
    // (n_topk/ndv/cms_rows_fresh dip at snapshot 2 and return at 3),
    // the recompute tax ends (n_recompute_files 0 → 1 → 0), and the
    // naive stale-inclusive path collapses back onto the fresh one
    // (naive_matches_fresh TRUE → FALSE → TRUE) with the healed salt
    // decision matching exact. Full lifecycle + scale shape:
    // SnapshotLog.freqStatsCompactionHeal scaladoc.
    Q(
      "s75_freq_stats_heal_on_compaction",
      (s, dir) => graft.sinks.SnapshotLog.freqStatsCompactionHeal(s, dir),
      Some {
        import graft.oracle.OracleSql.{h60, hllBucket, hllEstimate, hllRank, hllSH}
        val hk = h60("CAST(k AS VARCHAR)")
        val hCell = h60("CAST(r.i AS VARCHAR) || ':' || CAST(k AS VARCHAR)")
        val hProbe = h60("CAST(r.i AS VARCHAR) || ':1'")
        s"""WITH o AS (SELECT CASE WHEN o_orderstatus = 'F' THEN CAST(1 AS BIGINT)
              ELSE CAST(o_orderkey AS BIGINT) END AS k FROM orders),
          og AS (SELECT k, k % 4 AS g FROM o),
          steps AS (SELECT CAST(unnest([1, 2, 3]) AS BIGINT) AS step),
          rws AS (SELECT CAST(unnest([0, 1, 2, 3]) AS BIGINT) AS i),
          nman AS (SELECT t.step, CAST(CASE WHEN t.step = 3
              THEN (SELECT count(*) FROM og WHERE k <> 1)
              ELSE (SELECT count(*) FROM og) END AS BIGINT) AS n_man
            FROM steps t),
          pf AS (SELECT g, k, CAST(count(*) AS BIGINT) AS c FROM og GROUP BY 1, 2),
          tk AS (SELECT g, k, c FROM (SELECT g, k, c, row_number()
              OVER (PARTITION BY g ORDER BY c DESC, k) AS rn FROM pf)
            WHERE rn <= 8),
          lv AS (SELECT t.step, og.k, og.g FROM og, steps t
            WHERE t.step = 1 OR og.k <> 1),
          lk AS (SELECT step, k, g, CAST(count(*) AS BIGINT) AS c
            FROM lv GROUP BY 1, 2, 3),
          rec8 AS (SELECT k, c FROM (SELECT k, c, row_number()
              OVER (ORDER BY c DESC, k) AS rn
            FROM (SELECT k, c FROM lk WHERE step = 2 AND g = 1)) WHERE rn <= 8),
          cand AS (
            SELECT 1 AS step, k, c FROM tk
            UNION ALL SELECT s2.step, k, c FROM tk, (SELECT 2 AS step
              UNION ALL SELECT 3) s2 WHERE g <> 1
            UNION ALL SELECT s2.step, k, c FROM rec8, (SELECT 2 AS step
              UNION ALL SELECT 3) s2),
          mg AS (SELECT step, k, CAST(sum(c) AS BIGINT) AS c
            FROM cand GROUP BY 1, 2),
          t1 AS (SELECT step, k AS top1_key, c AS top1_cnt FROM (SELECT step,
              k, c, row_number() OVER (PARTITION BY step ORDER BY c DESC, k)
              AS rn FROM mg) WHERE rn = 1),
          fh AS (SELECT DISTINCT step, $hk AS h FROM lv),
          fregs AS (SELECT step, ${hllBucket("h")} AS bucket,
              CAST(max(${hllRank("h")}) AS BIGINT) AS mr FROM fh GROUP BY 1, 2),
          fnd AS (SELECT step, ${hllEstimate("s_h")} AS ndv FROM
            (SELECT step, $hllSH AS s_h FROM fregs GROUP BY step)),
          nt1 AS (SELECT k AS nk, c AS nc FROM (SELECT k, c, row_number()
              OVER (ORDER BY c DESC, k) AS rn FROM
              (SELECT k, CAST(sum(c) AS BIGINT) AS c FROM tk GROUP BY k))
            WHERE rn = 1),
          nregs AS (SELECT ${hllBucket("h")} AS bucket,
              CAST(max(${hllRank("h")}) AS BIGINT) AS mr
            FROM (SELECT DISTINCT $hk AS h FROM og) GROUP BY 1),
          nnd AS (SELECT ${hllEstimate("s_h")} AS ndv FROM
            (SELECT $hllSH AS s_h FROM nregs)),
          lcells AS (SELECT lk.step, r.i, ($hCell) % 64 AS j,
              CAST(sum(lk.c) AS BIGINT) AS cnt
            FROM lk CROSS JOIN rws r GROUP BY 1, 2, 3),
          ncells AS (SELECT r.i, ($hCell) % 64 AS j,
              CAST(sum(c) AS BIGINT) AS cnt
            FROM (SELECT k, CAST(sum(c) AS BIGINT) AS c FROM pf GROUP BY k)
            CROSS JOIN rws r GROUP BY 1, 2),
          pj AS (SELECT r.i, ($hProbe) % 64 AS j FROM rws r),
          cmsf AS (SELECT s.step, CAST(min(coalesce(lc.cnt, 0)) AS BIGINT) AS v
            FROM steps s CROSS JOIN pj LEFT JOIN lcells lc
              ON lc.step = s.step AND lc.i = pj.i AND lc.j = pj.j
            GROUP BY s.step),
          cmsn AS (SELECT CAST(min(coalesce(nc.cnt, 0)) AS BIGINT) AS v
            FROM pj LEFT JOIN ncells nc ON nc.i = pj.i AND nc.j = pj.j),
          ntk AS (SELECT CAST(count(*) AS BIGINT) AS a,
              CAST(count(*) FILTER (WHERE g <> 1) AS BIGINT) AS f FROM tk),
          new8 AS (SELECT CAST(least(8, count(*)) AS BIGINT) AS c FROM rec8),
          nnd12 AS (SELECT CAST(count(*) AS BIGINT) AS a,
              CAST(count(*) FILTER (WHERE g <> 1) AS BIGINT) AS f
            FROM (SELECT DISTINCT g, ${hllBucket(hk)} AS bucket FROM og)),
          ndnew AS (SELECT CAST(count(DISTINCT ${hllBucket(hk)}) AS BIGINT) AS c
            FROM og WHERE g = 1 AND k <> 1),
          ncm12 AS (SELECT CAST(count(*) AS BIGINT) AS a,
              CAST(count(*) FILTER (WHERE g <> 1) AS BIGINT) AS f
            FROM (SELECT DISTINCT g, r.i, ($hCell) % 64 AS j
              FROM (SELECT g, k FROM pf) CROSS JOIN rws r)),
          cmnew AS (SELECT CAST(count(*) AS BIGINT) AS c
            FROM (SELECT DISTINCT r.i, ($hCell) % 64 AS j
              FROM (SELECT k FROM og WHERE g = 1 AND k <> 1 GROUP BY k)
              CROSS JOIN rws r)),
          exn AS (SELECT step, CAST(count(DISTINCT k) AS BIGINT) AS exndv,
              CAST(count(*) AS BIGINT) AS n_live,
              CAST(coalesce(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS hot
            FROM lv GROUP BY 1),
          exg AS (SELECT step, CAST(c AS BIGINT) AS exc FROM
            (SELECT step, k, sum(c) AS c, row_number() OVER (PARTITION BY step
              ORDER BY sum(c) DESC, k) AS rn FROM lk GROUP BY step, k)
            WHERE rn = 1),
          d AS (SELECT t1.step, exn.n_live,
              CAST(CASE WHEN t1.step = 2 THEN 1 ELSE 0 END AS BIGINT)
                AS n_recompute_files,
              CAST(CASE WHEN t1.step = 1 THEN ntk.a WHEN t1.step = 2 THEN ntk.f
                ELSE ntk.f + new8.c END AS BIGINT) AS n_topk_rows_fresh,
              CAST(CASE WHEN t1.step = 1 THEN nnd12.a WHEN t1.step = 2
                THEN nnd12.f ELSE nnd12.f + ndnew.c END AS BIGINT)
                AS n_ndv_rows_fresh,
              CAST(CASE WHEN t1.step = 1 THEN ncm12.a WHEN t1.step = 2
                THEN ncm12.f ELSE ncm12.f + cmnew.c END AS BIGINT)
                AS n_cms_rows_fresh,
              t1.top1_key, t1.top1_cnt, fnd.ndv AS ndv_est,
              CAST(CAST(t1.top1_cnt AS HUGEINT) * 100 * fnd.ndv
                // nman.n_man AS BIGINT) AS skew_x100,
              CAST(CASE WHEN t1.step = 3 THEN t1.top1_cnt ELSE nt1.nc END
                AS BIGINT) AS naive_top1_cnt,
              CASE WHEN t1.step = 3 THEN t1.top1_key ELSE nt1.nk END AS nk,
              CAST(CASE WHEN t1.step = 3
                THEN CAST(t1.top1_cnt AS HUGEINT) * 100 * fnd.ndv // nman.n_man
                ELSE CAST(nt1.nc AS HUGEINT) * 100 * nnd.ndv // nman.n_man END
                AS BIGINT) AS naive_skew,
              CAST(CAST(exg.exc AS HUGEINT) * 100 * exn.exndv
                // nman.n_man AS BIGINT) AS exact_skew,
              cmsf.v AS cms_hot_fresh,
              CAST(CASE WHEN t1.step = 3 THEN cmsf.v ELSE cmsn.v END AS BIGINT)
                AS cms_hot_naive,
              exn.hot
            FROM t1 JOIN fnd ON t1.step = fnd.step
            JOIN exn ON t1.step = exn.step JOIN exg ON t1.step = exg.step
            JOIN cmsf ON t1.step = cmsf.step JOIN nman ON t1.step = nman.step
            CROSS JOIN nt1 CROSS JOIN nnd CROSS JOIN cmsn
            CROSS JOIN ntk CROSS JOIN new8 CROSS JOIN nnd12 CROSS JOIN ndnew
            CROSS JOIN ncm12 CROSS JOIN cmnew)
          SELECT step, n_live AS n_live_rows, n_recompute_files,
            n_topk_rows_fresh, n_ndv_rows_fresh, n_cms_rows_fresh,
            top1_key, top1_cnt, ndv_est, skew_x100,
            skew_x100 >= 800 AS salted,
            naive_top1_cnt, naive_skew >= 800 AS naive_salted,
            exact_skew >= 800 AS exact_salted,
            cms_hot_fresh, cms_hot_naive, hot AS hot_live,
            (cms_hot_fresh >= hot AND cms_hot_naive >= hot) AS cms_ge_ok,
            (skew_x100 >= 800) = (exact_skew >= 800) AS decision_ok,
            (nk = top1_key AND naive_top1_cnt = top1_cnt
              AND (naive_skew >= 800) = (skew_x100 >= 800))
              AS naive_matches_fresh,
            TRUE AS stale_guard_ok, TRUE AS live_log
          FROM d ORDER BY step"""
      }
    ),
    // s76: DECISION HISTORY across commits — every planner entry audits
    // its decision within one run; this lifecycle PERSISTS each
    // decision (snapshot, edge, inputs, strategy, audit verdict) as
    // decision_log rows and surfaces the drift-induced FLIP from the
    // persisted rows alone: a uniform key's shuffle decision at
    // snapshot 1 turns salted at snapshot 2 after an appended
    // sentinel-skew delta file (flipped_from_prev FALSE → TRUE, both
    // audits green, all in-hash). Full lifecycle + scale shape:
    // SnapshotLog.decisionHistory scaladoc.
    Q(
      "s76_decision_history",
      (s, dir) => graft.sinks.SnapshotLog.decisionHistory(s, dir),
      Some {
        import graft.oracle.OracleSql.{h60, hllBucket, hllEstimate, hllRank, hllSH}
        val hk = h60("CAST(k AS VARCHAR)")
        s"""WITH fv AS (
            SELECT 1 AS snap, o_orderkey % 4 AS g,
              CAST(o_orderkey AS BIGINT) AS k FROM orders
            UNION ALL SELECT 2, o_orderkey % 4, CAST(o_orderkey AS BIGINT)
              FROM orders
            UNION ALL SELECT 2, 4, CAST(1 AS BIGINT) FROM orders
              WHERE o_orderstatus = 'F'),
          pf AS (SELECT snap, g, k, CAST(count(*) AS BIGINT) AS c
            FROM fv GROUP BY 1, 2, 3),
          tk AS (SELECT snap, g, k, c FROM (SELECT snap, g, k, c, row_number()
              OVER (PARTITION BY snap, g ORDER BY c DESC, k) AS rn FROM pf)
            WHERE rn <= 8),
          mg AS (SELECT snap, k, CAST(sum(c) AS BIGINT) AS c
            FROM tk GROUP BY 1, 2),
          t1 AS (SELECT snap, k AS t1k, c AS t1c FROM (SELECT snap, k, c,
              row_number() OVER (PARTITION BY snap ORDER BY c DESC, k) AS rn
              FROM mg) WHERE rn = 1),
          n AS (SELECT snap, CAST(count(*) AS BIGINT) AS n_rows
            FROM fv GROUP BY 1),
          hh AS (SELECT DISTINCT snap, $hk AS h FROM fv),
          regs AS (SELECT snap, ${hllBucket("h")} AS bucket,
              CAST(max(${hllRank("h")}) AS BIGINT) AS mr FROM hh GROUP BY 1, 2),
          nd AS (SELECT snap, ${hllEstimate("s_h")} AS ndv FROM
            (SELECT snap, $hllSH AS s_h FROM regs GROUP BY snap)),
          d AS (SELECT t1.snap, n.n_rows, nd.ndv, t1.t1k, t1.t1c,
              CAST(CAST(t1.t1c AS HUGEINT) * 100 * nd.ndv
                // n.n_rows AS BIGINT) AS skew
            FROM t1 JOIN n ON t1.snap = n.snap JOIN nd ON t1.snap = nd.snap)
          SELECT CAST(snap AS BIGINT) AS snapshot_id, n_rows, ndv AS ndv_est,
            t1k AS top1_key, t1c AS top1_cnt, skew AS skew_x100,
            CASE WHEN skew >= 800 THEN 'salted' ELSE 'shuffle' END AS strategy,
            TRUE AS audit_ok, CAST(2 AS BIGINT) AS n_log_rows,
            coalesce((CASE WHEN skew >= 800 THEN 'salted' ELSE 'shuffle' END)
              <> lag(CASE WHEN skew >= 800 THEN 'salted' ELSE 'shuffle' END)
              OVER (ORDER BY snap), FALSE) AS flipped_from_prev,
            TRUE AS live_log
          FROM d ORDER BY snapshot_id"""
      }
    )
  )
}
