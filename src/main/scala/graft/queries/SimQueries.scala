package graft.queries

import graft.ops.{FeatureOps, Tables, VectorOps}
import graft.ops.Ckpt.RichCkpt
import graft.oracle.OracleSql._
import org.apache.spark.sql.functions._

/** q22 + q38-q39 — similarity search over the `embeddings` table
  * (vec_id, embedding array<float>, label).
  *
  * q22 is the brute-force baseline: one probe broadcast against the full
  * table — O(n) per probe, embarrassingly parallel, the right plan for a
  * single probe even at 100 TB (no shuffle at all; the scan dominates).
  * q38 restricts candidates to the probe's sign-LSH bucket (the ANN scale
  * path: bucket first, rank inside), q39 is the batch variant — top-k for
  * EVERY vector via the per-bucket self-join, never a cross product.
  */
object SimQueries {

  /** DuckDB replay of graft.ops.IvfKMeans's training recurrence, unrolled
    * as CTEs (shared by q41 and q58): quantized-integer centroid sums so
    * the element-wise means are order-free on both engines.
    */
  private val quantList =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1e6 + 5e-1) AS BIGINT))"

  private[queries] def assignSql(src: String, cents: String): String =
    s"""SELECT vec_id, embedding, cell FROM (
       SELECT e.vec_id, e.embedding, c.cent_id AS cell,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY ${r6(dot("e.embedding", "c.cent"))} DESC, c.cent_id) AS rk
       FROM $src e, $cents c) WHERE rk = 1"""

  private[queries] def updateSql(assigned: String): String =
    s"""SELECT cell AS cent_id, list(v ORDER BY i) AS cent FROM (
       SELECT cell, i, CAST(sum(qx) AS DOUBLE)/(CAST(count(*) AS DOUBLE)*1e6) AS v
       FROM (SELECT cell, unnest(generate_series(1, len(embedding))) AS i,
                    unnest($quantList) AS qx
             FROM $assigned)
       GROUP BY cell, i) GROUP BY cell"""

  /** WITH-chain ending in `assigned` (vec_id, embedding, cell) under the
    * 2-iteration trained codebook `cents2` — append query-specific CTEs.
    * Training folds over `tvecs`, the bounded vec_id ∈ [K, K+TrainLimit)
    * set mirroring IvfKMeans.TrainLimit; the final assignment covers ALL
    * vectors (`vecs`). Shared with s14's streaming-assignment oracle.
    */
  private[queries] val ivfCtes: String = {
    val hi = graft.ops.IvfKMeans.K + graft.ops.IvfKMeans.TrainLimit
    s"""WITH vecs AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 8),
      tvecs AS (SELECT vec_id, embedding FROM embeddings
                WHERE vec_id >= 8 AND vec_id < $hi),
      cents0 AS (SELECT vec_id AS cent_id,
                        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent
                 FROM embeddings WHERE vec_id < 8),
      a0 AS (${assignSql("tvecs", "cents0")}),
      cents1 AS (${updateSql("a0")}),
      a1 AS (${assignSql("tvecs", "cents1")}),
      cents2 AS (${updateSql("a1")}),
      assigned AS (${assignSql("vecs", "cents2")})"""
  }

  /** DuckDB replay of s34's full refresh recurrence (StreamRefresh):
    * the initial codebook trains on the epoch-0 regime only (vec_id ∈
    * [K, 250) — the stream's first file), then each epoch applies one
    * RETAINED Lloyd step over its bounded reservoir (the 2048 lowest
    * vec_ids of the epoch): updated cells take the quantized-integer
    * mean, untouched cells keep their centroid (index-refresh
    * semantics, unlike training's drop-on-empty). Per-epoch ledger row:
    * vectors, arrival-census cells, reservoir-refreshed cells, moved
    * assignments (arrival vs refreshed codebook), drift in bp, and the
    * quantized codebook checksum — the exact final state, no floats.
    */
  /** The refresh recurrence's CTE chain alone (vecs0/vecs1 epoch
    * slices, cI initial codebook, cE0/cE1 per-epoch refreshed
    * codebooks, da/db assignment censuses) — shared by s34's ledger
    * oracle and s38's recall-monitor oracle.
    */
  private[queries] val refreshCtes: String =
    s"""vecs0 AS (SELECT vec_id, embedding FROM embeddings
          WHERE vec_id >= 8 AND vec_id < 250),
      vecs1 AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 250),
      tv AS (SELECT vec_id, embedding FROM embeddings
          WHERE vec_id >= 8 AND vec_id < 250),
      c0 AS (SELECT vec_id AS cent_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent
        FROM embeddings WHERE vec_id < 8),
      a0 AS (${assignSql("tv", "c0")}),
      c1 AS (${updateSql("a0")}),
      a1 AS (${assignSql("tv", "c1")}),
      cI AS (${updateSql("a1")}),
      s0 AS (SELECT vec_id, embedding FROM vecs0 ORDER BY vec_id LIMIT 2048),
      sa0 AS (${assignSql("s0", "cI")}),
      u0 AS (${updateSql("sa0")}),
      cE0 AS (SELECT c.cent_id, coalesce(u.cent, c.cent) AS cent
        FROM cI c LEFT JOIN u0 u ON c.cent_id = u.cent_id),
      s1 AS (SELECT vec_id, embedding FROM vecs1 ORDER BY vec_id LIMIT 2048),
      sa1 AS (${assignSql("s1", "cE0")}),
      u1 AS (${updateSql("sa1")}),
      cE1 AS (SELECT c.cent_id, coalesce(u.cent, c.cent) AS cent
        FROM cE0 c LEFT JOIN u1 u ON c.cent_id = u.cent_id),
      da0 AS (${assignSql("vecs0", "cI")}),
      db0 AS (${assignSql("vecs0", "cE0")}),
      da1 AS (${assignSql("vecs1", "cE0")}),
      db1 AS (${assignSql("vecs1", "cE1")})"""

  private[queries] val refreshLedgerSql: String = {
    val cbQsum = (cents: String) =>
      s"""(SELECT CAST(sum(q) AS BIGINT) FROM (
         SELECT unnest(list_transform(cent,
           x -> CAST(floor(x * 1e6 + 5e-1) AS BIGINT))) AS q FROM $cents))"""
    def epochRow(e: Int, vecs: String, sa: String, after: String) =
      s"""SELECT CAST($e AS BIGINT) AS epoch,
        (SELECT CAST(count(*) AS BIGINT) FROM $vecs) AS n_vecs,
        (SELECT CAST(count(DISTINCT cell) AS BIGINT) FROM da$e) AS n_cells,
        (SELECT CAST(count(DISTINCT cell) AS BIGINT) FROM $sa) AS n_refreshed,
        (SELECT CAST(count(*) AS BIGINT) FROM da$e a JOIN db$e b
           ON a.vec_id = b.vec_id AND a.cell <> b.cell) AS n_moved,
        ((SELECT CAST(count(*) AS BIGINT) FROM da$e a JOIN db$e b
           ON a.vec_id = b.vec_id AND a.cell <> b.cell) * 10000)
          // (SELECT count(*) FROM $vecs) AS drift_bp,
        ${cbQsum(after)} AS cb_qsum"""
    s"""WITH $refreshCtes
    ${epochRow(0, "vecs0", "sa0", "cE0")}
    UNION ALL
    ${epochRow(1, "vecs1", "sa1", "cE1")}
    ORDER BY epoch"""
  }

  /** q67/q178 shared oracle fragment: subspace m's PQ training,
    * encoding, probe slice, and LUT as CTEs (the IvfKMeans recurrence
    * verbatim on the sliced vectors; names suffixed with m).
    */
  private def pqSubCte(m: Int): String = {
    val hi = graft.ops.IvfKMeans.K + graft.ops.IvfKMeans.TrainLimit
    val lo = m * 16 + 1
    val hi2 = (m + 1) * 16
    s"""vecs$m AS (SELECT vec_id, embedding[$lo:$hi2] AS embedding
          FROM embeddings WHERE vec_id >= 8),
      tvecs$m AS (SELECT vec_id, embedding[$lo:$hi2] AS embedding
          FROM embeddings WHERE vec_id >= 8 AND vec_id < $hi),
      cents0_$m AS (SELECT vec_id AS cent_id,
            list_transform(embedding[$lo:$hi2], x -> CAST(x AS DOUBLE)) AS cent
          FROM embeddings WHERE vec_id < 8),
      a0_$m AS (${assignSql(s"tvecs$m", s"cents0_$m")}),
      cents1_$m AS (${updateSql(s"a0_$m")}),
      a1_$m AS (${assignSql(s"tvecs$m", s"cents1_$m")}),
      cents2_$m AS (${updateSql(s"a1_$m")}),
      assigned$m AS (${assignSql(s"vecs$m", s"cents2_$m")}),
      probe$m AS (SELECT embedding FROM vecs$m WHERE vec_id = 100),
      lut$m AS (SELECT c.cent_id, ${r6(dot("p.embedding", "c.cent"))} AS v
          FROM cents2_$m c, probe$m p)"""
  }

  /** q174/q177 shared recall machinery. Exact ground truth is the q22
    * cosine kernel pushed through a SALTED two-level top-k (rank within
    * (probe, vec_id%64), then rank the ≤64·k survivors per probe) so no
    * window partition is ever corpus-sized; recall joins and summaries
    * are k·|probes|-bounded.
    */
  private[graft] def saltedTopK(
      scored: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame =
    saltedTopKRanked(scored, k).select("e_pid", "e_vid")

  /** saltedTopK with the final per-probe rank kept — q213's MRR needs
    * WHERE the true neighbor lands, not just membership.
    */
  private[graft] def saltedTopKRanked(
      scored: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    scored
      .withColumn("salt", pmod(col("vec_id"), lit(64)))
      .withColumn(
        "rk1",
        row_number().over(
          Window.partitionBy("pid", "salt").orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rk1") <= k)
      .withColumn(
        "rk",
        row_number().over(Window.partitionBy("pid").orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rk") <= k)
      .select(col("pid").as("e_pid"), col("vec_id").as("e_vid"), col("rk"))
  }

  /** Per-probe recall of `approx` (a_pid, a_vid) against `exact`
    * (e_pid, e_vid), integer bp at k.
    */
  private[graft] def recallBp(
      exact: org.apache.spark.sql.DataFrame,
      approx: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = exact
    .join(
      broadcast(approx),
      col("e_pid") === col("a_pid") && col("e_vid") === col("a_vid"), "left")
    .groupBy(col("e_pid"))
    .agg(sum(when(col("a_pid").isNotNull, 1L).otherwise(0L)).as("hits"))
    .select(col("e_pid").as("pid"), expr(s"(hits * 10000) div $k").as("recall_bp"))

  /** The summary mean, shared Spark/oracle: `sum(recall_bp) $div
    * count(*)`. A NEGATIVE sum is reachable here — q177's int8−int4
    * delta rows come from two independent rankings (unlike q174's
    * structurally-≥0 P2−P1 candidate-superset delta) — so the two
    * engines' integer-division semantics on negative numerators are
    * load-bearing, not fixture-shadowed: MEASURED (ZeroDenomGuardSpec
    * "negative sums divide identically"), Spark's `div` and DuckDB's
    * `//` BOTH truncate toward zero (-4/3 → -1, -5/20 → 0), so the bare
    * form is cross-engine exact and needs no sign guard. A CASE-based
    * floor guard on one side would itself introduce the q162-class
    * divergence the guard would claim to close.
    */
  private[graft] def meanBpSql(div: String): String =
    s"sum(recall_bp) $div count(*)"

  /** One summary row per method: (mean, min) recall over the probe set
    * with the in-hash acceptance floor.
    */
  private def recallSummary(
      m: String,
      k: Int,
      floorBp: Long,
      rp: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = rp
    .agg(
      count(lit(1)).as("n_probes"),
      expr(meanBpSql("div")).as("mean_recall_bp"),
      min(col("recall_bp")).as("min_recall_bp"))
    .select(
      lit(m).as("method"), lit(k.toLong).as("k"), col("n_probes"),
      col("mean_recall_bp"), col("min_recall_bp"),
      lit(floorBp).as("floor_bp"),
      (col("mean_recall_bp") >= floorBp).as("floor_ok"))

  val all: Seq[Q] = Seq(
    // Brute-force cosine top-5 to probe vec_id=0. Round before ordering so
    // the sort key is the bit-identical rounded double on both engines.
    Q(
      "q22_knn_cosine",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val probe = e.filter(col("vec_id") === 0).select(col("embedding").as("p"))
        e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(probe))
          .select(
            col("vec_id"),
            col("label"),
            FeatureOps.r6(VectorOps.cosine(col("embedding"), col("p"))).as("cos")
          )
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(5)
      },
      Some(s"""WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, label, floor((${cosine("embedding", "p")}) * 1e6 + 5e-1) / 1e6 AS cos
        FROM embeddings, probe WHERE vec_id <> 0
        ORDER BY cos DESC, vec_id LIMIT 5""")
    ),
    // LSH-bucketed k-NN: candidates = probe's sign bucket only. Plane
    // count adapts to corpus size (VectorOps.adaptivePlanes) so the
    // candidate set stays ~16 vectors at any scale.
    Q(
      "q38_knn_lsh",
      (s, dir) => {
        val tbl = Tables.embeddings(s, dir)
        val planes = VectorOps.adaptivePlanes(Tables.rowCount(s, dir, "embeddings"))
        val e = tbl
          .select(col("vec_id"), col("embedding"), VectorOps.signBucket(col("embedding"), planes).as("bkt"))
        val probe = e.filter(col("vec_id") === 0).select(col("embedding").as("p"), col("bkt").as("pbkt"))
        e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(probe))
          .filter(col("bkt") === col("pbkt"))
          .select(
            col("vec_id"),
            FeatureOps.r6(VectorOps.cosine(col("embedding"), col("p"))).as("cos")
          )
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(5)
      },
      Some(s"""WITH be AS (SELECT vec_id, embedding,
            ${signBucketAdaptive("embedding", "(SELECT count(*) FROM embeddings)")} AS bkt
          FROM embeddings),
        probe AS (SELECT embedding AS p, bkt AS pbkt FROM be WHERE vec_id = 0)
        SELECT vec_id, floor((${cosine("embedding", "p")}) * 1e6 + 5e-1) / 1e6 AS cos
        FROM be, probe WHERE vec_id <> 0 AND bkt = pbkt
        ORDER BY cos DESC, vec_id LIMIT 5""")
    ),
    // Batch ANN: top-3 neighbors per vector within its sign bucket.
    Q(
      "q39_ann_bucket_topk",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val tbl = Tables.embeddings(s, dir)
        val planes = VectorOps.adaptivePlanes(Tables.rowCount(s, dir, "embeddings"))
        val e = tbl
          .select(col("vec_id"), col("embedding"), VectorOps.signBucket(col("embedding"), planes).as("bkt"))
        // degenerate-corpus guard (see BucketCap): the CANDIDATE (right)
        // side is capped per bucket so every vector still gets a top-k,
        // drawn from the cap lowest-id members — O(n·cap) pairs, never
        // O(n²); healthy buckets (≤16 here) are untouched.
        val cand = graft.ops.BucketCap.capSide(e, col("bkt"), col("vec_id"), tag = "q39")
        val pairs = e
          .as("a")
          .join(cand.as("b"), col("a.bkt") === col("b.bkt") && col("a.vec_id") =!= col("b.vec_id"))
          .select(
            col("a.vec_id").as("vec_a"),
            col("b.vec_id").as("vec_b"),
            FeatureOps.r6(VectorOps.cosine(col("a.embedding"), col("b.embedding"))).as("cos")
          )
        pairs
          .withColumn(
            "rk",
            row_number().over(
              Window.partitionBy("vec_a").orderBy(col("cos").desc, col("vec_b"))
            ).cast("long")
          )
          .filter(col("rk") <= 3)
          .orderBy("vec_a", "rk")
      },
      Some(s"""WITH be AS (SELECT vec_id, embedding,
            ${signBucketAdaptive("embedding", "(SELECT count(*) FROM embeddings)")} AS bkt
          FROM embeddings),
        pairs AS (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 floor((${cosine("a.embedding", "b.embedding")}) * 1e6 + 5e-1) / 1e6 AS cos
          FROM be a JOIN be b ON a.bkt = b.bkt AND a.vec_id <> b.vec_id),
        ranked AS (
          SELECT *, CAST(row_number() OVER (PARTITION BY vec_a ORDER BY cos DESC, vec_b) AS BIGINT) AS rk
          FROM pairs)
        SELECT vec_a, vec_b, cos, rk FROM ranked WHERE rk <= 3 ORDER BY vec_a, rk""")
    ),
    // IVF ANN with a TRAINED codebook: deterministic Lloyd k-means
    // (graft.ops.IvfKMeans — init = 8 lowest vec_ids, 2 iterations,
    // integer-quantized centroid means so both engines reproduce the
    // recurrence bit-exactly), every vector assigned to its argmax-dot
    // inverted list, probe searches ONLY its cell's list. The scale path:
    // the codebook broadcasts, assignment is a map-side argmax over 8
    // dots, and search touches 1/K of the data.
    Q(
      "q41_knn_ivf",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val cents = graft.ops.IvfKMeans.codebook(s, e)
        val assigned = graft.ops.IvfKMeans
          .assign(e.filter(col("vec_id") >= graft.ops.IvfKMeans.K).select("vec_id", "embedding"), cents)
        val probe = assigned
          .filter(col("vec_id") === 100)
          .select(col("embedding").as("p"), col("cell").as("pcell"))
        assigned
          .crossJoin(broadcast(probe))
          .filter(col("cell") === col("pcell") && col("vec_id") =!= 100)
          .select(col("vec_id"), FeatureOps.r6(VectorOps.cosine(col("embedding"), col("p"))).as("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(5)
      },
      Some(s"""$ivfCtes,
          probe AS (SELECT embedding AS p, cell AS pcell FROM assigned WHERE vec_id = 100)
          SELECT vec_id, ${r6(cosine("embedding", "p"))} AS cos
          FROM assigned, probe WHERE cell = pcell AND vec_id <> 100
          ORDER BY cos DESC, vec_id LIMIT 5""")
    ),
    // IVF multi-probe: the probe searches its nearest P=2 cells instead of
    // 1 — the standard recall knob (a cell boundary can split a probe from
    // its true neighbors; probing the runner-up cell recovers most of that
    // loss for 2/K of the scan cost). Cell ranking reuses the assignment
    // kernel (r6(dot) desc, cent_id tie-break) so both engines pick the
    // same cells; the probe-cell set broadcasts as a 2-row semi-join.
    Q(
      "q58_knn_ivf_multiprobe",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val cents = graft.ops.IvfKMeans.codebook(s, e)
        val vecs = e.filter(col("vec_id") >= graft.ops.IvfKMeans.K).select("vec_id", "embedding")
        val assigned = graft.ops.IvfKMeans.assign(vecs, cents)
        val probeVec = vecs.filter(col("vec_id") === 100)
        val probeCells = graft.ops.IvfKMeans.assignTopP(probeVec, cents, 2).select("cell")
        val probe = probeVec.select(col("embedding").as("p"))
        assigned
          .join(broadcast(probeCells), Seq("cell"), "left_semi")
          .crossJoin(broadcast(probe))
          .filter(col("vec_id") =!= 100)
          .select(col("vec_id"), FeatureOps.r6(VectorOps.cosine(col("embedding"), col("p"))).as("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(5)
      },
      Some(s"""$ivfCtes,
          probe_cells AS (SELECT cell FROM (
            SELECT c.cent_id AS cell,
              row_number() OVER (ORDER BY ${r6(dot("p.embedding", "c.cent"))} DESC, c.cent_id) AS rk
            FROM (SELECT embedding FROM vecs WHERE vec_id = 100) p, cents2 c) WHERE rk <= 2),
          probe AS (SELECT embedding AS p FROM vecs WHERE vec_id = 100)
          SELECT vec_id, ${r6(cosine("embedding", "p"))} AS cos
          FROM assigned, probe
          WHERE cell IN (SELECT cell FROM probe_cells) AND vec_id <> 100
          ORDER BY cos DESC, vec_id LIMIT 5""")
    ),
    // q174: ANN recall@k — the acceptance metric a production ANN index
    // is actually judged by, measured instead of assumed. q38/q41/q58
    // prove each bucketed search equals the oracle's IDENTICAL bucketed
    // search; this measures how much of the EXACT top-k (the q22
    // brute-force kernel) each approximate family recovers, over a
    // fixed 20-probe set (vec_id ∈ [100,120), present at every SF) and
    // a shared universe (vec_id ≥ K, the IVF-assigned set, probe
    // excluded). Integer recall in bp per probe (|approx ∩ exact|·10⁴
    // div k), summarized per method as (mean, min) with an in-hash
    // acceptance floor, plus the per-probe P=2 − P=1 delta row — the
    // measured value of multi-probe, structurally ≥ 0 because the P=2
    // candidate set contains P=1's (min delta rides the hash).
    //
    // Scale shape: exact ground truth scores ride a 20-row probe
    // broadcast (map-side, no shuffle of the corpus) into a SALTED
    // two-level top-k — rank within (probe, vec_id%64) first, then
    // rank the ≤64·k survivors per probe — so no window partition is
    // ever corpus-sized. Approximate sides reuse the production search
    // shapes (bucket/cell-restricted candidates, per-probe windows over
    // bounded buckets). Every recall join is k·|probes|-bounded and
    // broadcast.
    Q(
      "q174_ann_recall",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val kTop = 10
        val K = graft.ops.IvfKMeans.K
        val e = Tables.embeddings(s, dir)
        val vecs = e.filter(col("vec_id") >= K).select("vec_id", "embedding")
        def probesOf(df: org.apache.spark.sql.DataFrame) =
          df.filter(col("vec_id") >= 100 && col("vec_id") < 120)
        val probes = probesOf(vecs).select(col("vec_id").as("pid"), col("embedding").as("p"))

        // EXACT ground truth: q22's kernel, salted two-level top-k
        val scored = vecs
          .crossJoin(broadcast(probes))
          .filter(col("vec_id") =!= col("pid"))
          .select(
            col("pid"), col("vec_id"),
            FeatureOps.r6(VectorOps.cosine(col("embedding"), col("p"))).as("cos"))
        val exact = saltedTopK(scored, kTop)

        // sign-LSH search (q38's shape, per probe)
        val planes = VectorOps.adaptivePlanes(Tables.rowCount(s, dir, "embeddings"))
        val withB = vecs.withColumn("bkt", VectorOps.signBucket(col("embedding"), planes))
        val probeB = probesOf(withB)
          .select(col("vec_id").as("pid"), col("embedding").as("p"), col("bkt").as("pbkt"))
        val lshTop = withB
          .crossJoin(broadcast(probeB))
          .filter(col("bkt") === col("pbkt") && col("vec_id") =!= col("pid"))
          .select(
            col("pid"), col("vec_id"),
            FeatureOps.r6(VectorOps.cosine(col("embedding"), col("p"))).as("cos"))
          .withColumn(
            "rk",
            row_number().over(Window.partitionBy("pid").orderBy(col("cos").desc, col("vec_id"))))
          .filter(col("rk") <= kTop)
          .select(col("pid").as("a_pid"), col("vec_id").as("a_vid"))

        // IVF search (q41/q58's shape) at P=1 and P=2
        val cents = graft.ops.IvfKMeans.codebook(s, e)
        val assigned = graft.ops.IvfKMeans.assign(vecs, cents)
        val pcells = graft.ops.IvfKMeans
          .assignTopP(probesOf(vecs), cents, 2)
          .select(
            col("vec_id").as("pid"), col("embedding").as("p"),
            col("cell").as("pcell"), col("rk").as("prk"))
        // cell-restricted candidates are still ~n/K of the corpus per
        // probe (K=8 fixed), so the ranking rides the SAME salted
        // two-level kernel as the exact side — a plain per-probe window
        // here would hold an entire inverted list in one partition
        def ivfTop(pMax: Int) = saltedTopK(
          assigned
            .join(broadcast(pcells.filter(col("prk") <= pMax)), col("cell") === col("pcell"))
            .filter(col("vec_id") =!= col("pid"))
            .select(
              col("pid"), col("vec_id"),
              FeatureOps.r6(VectorOps.cosine(col("embedding"), col("p"))).as("cos")),
          kTop)
          .select(col("e_pid").as("a_pid"), col("e_vid").as("a_vid"))

        val rLsh = recallBp(exact, lshTop, kTop)
        val rP1 = recallBp(exact, ivfTop(1), kTop)
        val rP2 = recallBp(exact, ivfTop(2), kTop)
        val rDelta = rP1
          .select(col("pid"), col("recall_bp").as("r1"))
          .join(broadcast(rP2.select(col("pid").as("pid2"), col("recall_bp").as("r2"))),
            col("pid") === col("pid2"))
          .select(col("pid"), (col("r2") - col("r1")).as("recall_bp"))

        recallSummary("ivf_p1", kTop, 2000L, rP1)
          .unionAll(recallSummary("ivf_p2", kTop, 3500L, rP2))
          .unionAll(recallSummary("ivf_p2_minus_p1", kTop, 0L, rDelta))
          .unionAll(recallSummary("lsh", kTop, 50L, rLsh))
          .orderBy("method")
      },
      Some(s"""$ivfCtes,
          probes AS (SELECT vec_id AS pid, embedding AS p FROM vecs
            WHERE vec_id >= 100 AND vec_id < 120),
          escored AS (SELECT pid, vec_id,
              ${r6(cosine("embedding", "p"))} AS cos
            FROM vecs, probes WHERE vec_id <> pid),
          exact AS (SELECT pid AS e_pid, vec_id AS e_vid FROM (
              SELECT pid, vec_id,
                row_number() OVER (PARTITION BY pid ORDER BY cos DESC, vec_id) AS rk
              FROM escored) WHERE rk <= 10),
          be AS (SELECT vec_id, embedding,
              ${signBucketAdaptive("embedding", "(SELECT count(*) FROM embeddings)")} AS bkt
            FROM vecs),
          pbe AS (SELECT vec_id AS pid, embedding AS p, bkt AS pbkt FROM be
            WHERE vec_id >= 100 AND vec_id < 120),
          lsh AS (SELECT pid AS a_pid, vec_id AS a_vid FROM (
              SELECT p.pid, b.vec_id,
                row_number() OVER (PARTITION BY p.pid
                  ORDER BY ${r6(cosine("b.embedding", "p.p"))} DESC, b.vec_id) AS rk
              FROM be b JOIN pbe p ON b.bkt = p.pbkt AND b.vec_id <> p.pid)
            WHERE rk <= 10),
          pcells AS (SELECT pid, p, cell, rk AS prk FROM (
              SELECT pr.pid, pr.p, c.cent_id AS cell,
                row_number() OVER (PARTITION BY pr.pid
                  ORDER BY ${r6(dot("pr.p", "c.cent"))} DESC, c.cent_id) AS rk
              FROM probes pr, cents2 c) WHERE rk <= 2),
          ivf1 AS (SELECT pid AS a_pid, vec_id AS a_vid FROM (
              SELECT pc.pid, a.vec_id,
                row_number() OVER (PARTITION BY pc.pid
                  ORDER BY ${r6(cosine("a.embedding", "pc.p"))} DESC, a.vec_id) AS rk
              FROM assigned a JOIN pcells pc
                ON a.cell = pc.cell AND pc.prk <= 1 AND a.vec_id <> pc.pid)
            WHERE rk <= 10),
          ivf2 AS (SELECT pid AS a_pid, vec_id AS a_vid FROM (
              SELECT pc.pid, a.vec_id,
                row_number() OVER (PARTITION BY pc.pid
                  ORDER BY ${r6(cosine("a.embedding", "pc.p"))} DESC, a.vec_id) AS rk
              FROM assigned a JOIN pcells pc
                ON a.cell = pc.cell AND pc.prk <= 2 AND a.vec_id <> pc.pid)
            WHERE rk <= 10),
          r_lsh AS (SELECT e_pid AS pid,
              (CAST(count(a.a_vid) AS BIGINT) * 10000) // 10 AS recall_bp
            FROM exact e LEFT JOIN lsh a ON e.e_pid = a.a_pid AND e.e_vid = a.a_vid
            GROUP BY 1),
          r_p1 AS (SELECT e_pid AS pid,
              (CAST(count(a.a_vid) AS BIGINT) * 10000) // 10 AS recall_bp
            FROM exact e LEFT JOIN ivf1 a ON e.e_pid = a.a_pid AND e.e_vid = a.a_vid
            GROUP BY 1),
          r_p2 AS (SELECT e_pid AS pid,
              (CAST(count(a.a_vid) AS BIGINT) * 10000) // 10 AS recall_bp
            FROM exact e LEFT JOIN ivf2 a ON e.e_pid = a.a_pid AND e.e_vid = a.a_vid
            GROUP BY 1),
          r_delta AS (SELECT r_p1.pid, r_p2.recall_bp - r_p1.recall_bp AS recall_bp
            FROM r_p1 JOIN r_p2 ON r_p1.pid = r_p2.pid),
          summaries AS (
            SELECT 'ivf_p1' AS method, CAST(10 AS BIGINT) AS k,
              CAST(count(*) AS BIGINT) AS n_probes,
              CAST(sum(recall_bp) // count(*) AS BIGINT) AS mean_recall_bp,
              CAST(min(recall_bp) AS BIGINT) AS min_recall_bp,
              CAST(2000 AS BIGINT) AS floor_bp,
              (sum(recall_bp) // count(*)) >= 2000 AS floor_ok FROM r_p1
            UNION ALL
            SELECT 'ivf_p2', CAST(10 AS BIGINT), CAST(count(*) AS BIGINT),
              CAST(sum(recall_bp) // count(*) AS BIGINT),
              CAST(min(recall_bp) AS BIGINT), CAST(3500 AS BIGINT),
              (sum(recall_bp) // count(*)) >= 3500 FROM r_p2
            UNION ALL
            SELECT 'ivf_p2_minus_p1', CAST(10 AS BIGINT), CAST(count(*) AS BIGINT),
              CAST(sum(recall_bp) // count(*) AS BIGINT),
              CAST(min(recall_bp) AS BIGINT), CAST(0 AS BIGINT),
              (sum(recall_bp) // count(*)) >= 0 FROM r_delta
            UNION ALL
            SELECT 'lsh', CAST(10 AS BIGINT), CAST(count(*) AS BIGINT),
              CAST(sum(recall_bp) // count(*) AS BIGINT),
              CAST(min(recall_bp) AS BIGINT), CAST(50 AS BIGINT),
              (sum(recall_bp) // count(*)) >= 50 FROM r_lsh)
          SELECT method, k, n_probes, mean_recall_bp, min_recall_bp, floor_bp, floor_ok
          FROM summaries ORDER BY method"""),
    ),
    // q177: quantization recall@k — the second production question
    // after q174's "which index": at what integer width can the index
    // SERVE? q71 audits the int8 quantizer's saturation; this measures
    // what serving quantized vectors COSTS IN RECALL: top-10 by pure
    // BIGINT dot product over q71-quantized vectors (clamp(floor(
    // x/‖x‖·S + ½), ±S) at S=7 ~ int4 and S=127 ~ int8 — the integer
    // score is exact and order-free, the one ranking on the board with
    // no floats at all) against the exact float-cosine top-10, same
    // probe set/universe/machinery as q174. The int8−int4 delta row is
    // the measured value of each extra bit of width. Scale shape: the
    // quantized arrays are a map-side projection of the same scan, the
    // score fold is zip_with+aggregate in codegen, and the top-k is
    // the shared salted two-level — no new shuffle class anywhere.
    Q(
      "q177_quant_recall",
      (s, dir) => {
        val kTop = 10
        val K = graft.ops.IvfKMeans.K
        val e = Tables.embeddings(s, dir)
        val vecs = e.filter(col("vec_id") >= K).select("vec_id", "embedding")
        val probes = vecs
          .filter(col("vec_id") >= 100 && col("vec_id") < 120)
          .select(col("vec_id").as("pid"), col("embedding").as("p"))
        val exact = saltedTopK(
          vecs
            .crossJoin(broadcast(probes))
            .filter(col("vec_id") =!= col("pid"))
            .select(
              col("pid"), col("vec_id"),
              FeatureOps.r6(VectorOps.cosine(col("embedding"), col("p"))).as("cos")),
          kTop)

        // q71's quantizer (shared kernel) at integer width S: the norm
        // is a precomputed column so quantization stays O(d)/vector
        def quant(df: org.apache.spark.sql.DataFrame, v: String, sc: Long) = df
          .withColumn("nrm", sqrt(VectorOps.dot(col(v), col(v))))
          .withColumn("q", transform(col(v), x => VectorOps.quantize(x, col("nrm"), sc)))
        def quantTop(sc: Long) = {
          val qv = quant(vecs, "embedding", sc).select(col("vec_id"), col("q").as("qa"))
          val qp = quant(probes, "p", sc).select(col("pid"), col("q").as("qb"))
          saltedTopK(
            qv.crossJoin(broadcast(qp))
              .filter(col("vec_id") =!= col("pid"))
              .select(
                col("pid"), col("vec_id"),
                // exact BIGINT dot — associative, partition-order-free
                aggregate(zip_with(col("qa"), col("qb"), (a, b) => a * b), lit(0L), _ + _)
                  .as("cos")),
            kTop)
            .select(col("e_pid").as("a_pid"), col("e_vid").as("a_vid"))
        }

        val r4 = recallBp(exact, quantTop(7L), kTop)
        val r8 = recallBp(exact, quantTop(127L), kTop)
        val rDelta = r4
          .select(col("pid"), col("recall_bp").as("r1"))
          .join(broadcast(r8.select(col("pid").as("pid2"), col("recall_bp").as("r2"))),
            col("pid") === col("pid2"))
          .select(col("pid"), (col("r2") - col("r1")).as("recall_bp"))

        recallSummary("int4", kTop, 4000L, r4)
          .unionAll(recallSummary("int8", kTop, 9000L, r8))
          .unionAll(recallSummary("int8_minus_int4", kTop, 0L, rDelta))
          .orderBy("method")
      },
      Some {
        def qx(v: String, nrmOf: String, sc: Int) =
          s"""list_transform($v, x -> greatest(least(CAST(floor(
            CASE WHEN sqrt(${dot(nrmOf, nrmOf)}) < 1e-12 THEN 0e0
                 ELSE CAST(x AS DOUBLE) / sqrt(${dot(nrmOf, nrmOf)}) * ${sc}e0 + 5e-1
            END) AS BIGINT), $sc), -$sc))"""
        def idot(a: String, b: String) =
          s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(list_zip($a, $b), z -> z[1] * z[2])), (x, y) -> x + y)"""
        def quantCtes(sc: Int, tag: String) =
          s"""qv$tag AS (SELECT vec_id, ${qx("embedding", "embedding", sc)} AS qa FROM vecs),
          qp$tag AS (SELECT pid, ${qx("p", "p", sc)} AS qb FROM probes),
          top$tag AS (SELECT pid AS a_pid, vec_id AS a_vid FROM (
              SELECT qp$tag.pid, qv$tag.vec_id,
                row_number() OVER (PARTITION BY qp$tag.pid
                  ORDER BY ${idot(s"qv$tag.qa", s"qp$tag.qb")} DESC, qv$tag.vec_id) AS rk
              FROM qv$tag, qp$tag WHERE qv$tag.vec_id <> qp$tag.pid)
            WHERE rk <= 10),
          r$tag AS (SELECT e_pid AS pid,
              (CAST(count(a.a_vid) AS BIGINT) * 10000) // 10 AS recall_bp
            FROM exact e LEFT JOIN top$tag a
              ON e.e_pid = a.a_pid AND e.e_vid = a.a_vid
            GROUP BY 1)"""
        s"""WITH vecs AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 8),
          probes AS (SELECT vec_id AS pid, embedding AS p FROM vecs
            WHERE vec_id >= 100 AND vec_id < 120),
          escored AS (SELECT pid, vec_id,
              ${r6(cosine("embedding", "p"))} AS cos
            FROM vecs, probes WHERE vec_id <> pid),
          exact AS (SELECT pid AS e_pid, vec_id AS e_vid FROM (
              SELECT pid, vec_id,
                row_number() OVER (PARTITION BY pid ORDER BY cos DESC, vec_id) AS rk
              FROM escored) WHERE rk <= 10),
          ${quantCtes(7, "4")},
          ${quantCtes(127, "8")},
          rd AS (SELECT r4.pid, r8.recall_bp - r4.recall_bp AS recall_bp
            FROM r4 JOIN r8 ON r4.pid = r8.pid),
          summaries AS (
            SELECT 'int4' AS method, CAST(10 AS BIGINT) AS k,
              CAST(count(*) AS BIGINT) AS n_probes,
              CAST(sum(recall_bp) // count(*) AS BIGINT) AS mean_recall_bp,
              CAST(min(recall_bp) AS BIGINT) AS min_recall_bp,
              CAST(4000 AS BIGINT) AS floor_bp,
              (sum(recall_bp) // count(*)) >= 4000 AS floor_ok FROM r4
            UNION ALL
            SELECT 'int8', CAST(10 AS BIGINT), CAST(count(*) AS BIGINT),
              CAST(sum(recall_bp) // count(*) AS BIGINT),
              CAST(min(recall_bp) AS BIGINT), CAST(9000 AS BIGINT),
              (sum(recall_bp) // count(*)) >= 9000 FROM r8
            UNION ALL
            SELECT 'int8_minus_int4', CAST(10 AS BIGINT), CAST(count(*) AS BIGINT),
              CAST(sum(recall_bp) // count(*) AS BIGINT),
              CAST(min(recall_bp) AS BIGINT), CAST(0 AS BIGINT),
              (sum(recall_bp) // count(*)) >= 0 FROM rd)
          SELECT method, k, n_probes, mean_recall_bp, min_recall_bp, floor_bp, floor_ok
          FROM summaries ORDER BY method"""
      }
    ),
    // Product-quantization ANN (q67): the third ANN family next to
    // sign-LSH (q38/q39) and IVF (q41/q58). Index build: the 64-dim space
    // splits into M=4 subspaces of 16 dims; each subspace trains its own
    // 8-centroid codebook (the IvfKMeans recurrence verbatim on the
    // sliced vectors), and every vector is ENCODED as 4 small codes
    // (argmax rounded-dot per subspace, ties to the lowest cent_id).
    // Search is asymmetric-distance (ADC): the probe collects to the
    // driver (1 row — FAISS-style query prep), a 4×8 lookup table of
    // r6(dot(probe_m, cent_{m,c})) becomes literal CASE expressions, and
    // score(x) = Σ_m lut_m[code_m(x)] in fixed subspace order. The whole
    // search is ONE map-side pass over the encoded table + TakeOrdered —
    // no shuffle, no join; at scale the codes (4 bytes/vector here) are
    // the only thing re-read per query, the PQ memory win. The oracle
    // replays training, encoding, and the LUT join per subspace.
    Q(
      "q67_knn_pq",
      (s, dir) => {
        import s.implicits._
        val M = 4
        val sub = 16
        val K = graft.ops.IvfKMeans.K
        val e = Tables.embeddings(s, dir)
        val cents: Seq[Seq[(Long, Array[Double])]] = (0 until M).map { m =>
          graft.ops.IvfKMeans.codebookSeq(
            s,
            e.select(col("vec_id"), slice(col("embedding"), m * sub + 1, sub).as("embedding"))
          )
        }
        val probe: Array[Float] =
          e.filter(col("vec_id") === 100).select("embedding").as[Array[Float]].head()
        val lut: Seq[Map[Long, Double]] = (0 until M).map { m =>
          val pm = probe.slice(m * sub, (m + 1) * sub)
          cents(m).map { case (cid, c) =>
            cid -> graft.ops.IvfKMeans.r6d(graft.ops.IvfKMeans.dotD(pm, c))
          }.toMap
        }
        // code_m(x): argmax over centroids of r6(dot(x_m, cent)), ties to
        // the lowest cent_id — greatest() over (d, -cent_id, cent_id)
        // structs is that argmax as one expression
        def codeCol(m: Int): org.apache.spark.sql.Column =
          greatest(cents(m).map { case (cid, c) =>
            struct(
              FeatureOps
                .r6(VectorOps.dot(slice(col("embedding"), m * sub + 1, sub), typedLit(c.toSeq)))
                .as("d"),
              lit(-cid).as("negid"),
              lit(cid).as("cid")
            )
          }: _*).getField("cid")
        val encoded = e
          .filter(col("vec_id") >= K && col("vec_id") =!= 100)
          .select(col("vec_id") +: (0 until M).map(m => codeCol(m).as(s"code$m")): _*)
        def lutCol(m: Int): org.apache.spark.sql.Column = {
          val pairs = cents(m).map { case (cid, _) => (cid, lut(m)(cid)) }
          pairs.tail.foldLeft(when(col(s"code$m") === lit(pairs.head._1), lit(pairs.head._2))) {
            case (acc, (cid, v)) => acc.when(col(s"code$m") === lit(cid), lit(v))
          }
        }
        encoded
          .select(col("vec_id"), (lutCol(0) + lutCol(1) + lutCol(2) + lutCol(3)).as("score"))
          .orderBy(col("score").desc, col("vec_id"))
          .limit(5)
      },
      Some {
        s"""WITH ${(0 until 4).map(pqSubCte).mkString(",\n")}
          SELECT a0.vec_id, (l0.v + l1.v + l2.v + l3.v) AS score
          FROM assigned0 a0
            JOIN assigned1 a1 USING (vec_id)
            JOIN assigned2 a2 USING (vec_id)
            JOIN assigned3 a3 USING (vec_id)
            JOIN lut0 l0 ON l0.cent_id = a0.cell
            JOIN lut1 l1 ON l1.cent_id = a1.cell
            JOIN lut2 l2 ON l2.cent_id = a2.cell
            JOIN lut3 l3 ON l3.cent_id = a3.cell
          WHERE a0.vec_id <> 100
          ORDER BY score DESC, vec_id LIMIT 5"""
      }
    ),
    // q178: IVF+PQ — the two index halves composed the way a production
    // vector index actually ships (the FAISS IVFPQ shape): the trained
    // coarse quantizer (q41/q58's IvfKMeans codebook) routes the search
    // to the probe's top-P=2 cells, and within those inverted lists the
    // ranking is q67's asymmetric-distance PQ scoring — 4 subspace
    // codes per vector, probe LUT folded into literal CASE expressions.
    // Raw-subvector codes (q67's encoding) rather than residual codes:
    // the residual refinement is a quantizer-quality knob, while the
    // COMPOSITION — cell-restricted candidate set × code-only scoring —
    // is the structure that buys 2/K of the scan at 4 bytes/vector,
    // which is what this operator pins. Scale shape: codebook + probe
    // cells + LUT are all literal/broadcast index metadata; the scan
    // reads (cell, 4 codes) per row, the semi-join prunes to 2 cells,
    // scoring is map-side CASE arithmetic, TakeOrdered finishes — no
    // shuffle of the corpus anywhere.
    Q(
      "q178_knn_ivfpq",
      (s, dir) => {
        import s.implicits._
        val M = 4
        val sub = 16
        val K = graft.ops.IvfKMeans.K
        val e = Tables.embeddings(s, dir)
        val coarse = graft.ops.IvfKMeans.codebook(s, e)
        val vecs = e.filter(col("vec_id") >= K).select("vec_id", "embedding")
        val assigned = graft.ops.IvfKMeans.assign(vecs, coarse)
        val cents: Seq[Seq[(Long, Array[Double])]] = (0 until M).map { m =>
          graft.ops.IvfKMeans.codebookSeq(
            s,
            e.select(col("vec_id"), slice(col("embedding"), m * sub + 1, sub).as("embedding")))
        }
        val probeVec = vecs.filter(col("vec_id") === 100)
        val probeCells = graft.ops.IvfKMeans.assignTopP(probeVec, coarse, 2).select("cell")
        val probe: Array[Float] =
          e.filter(col("vec_id") === 100).select("embedding").as[Array[Float]].head()
        val lut: Seq[Map[Long, Double]] = (0 until M).map { m =>
          val pm = probe.slice(m * sub, (m + 1) * sub)
          cents(m).map { case (cid, c) =>
            cid -> graft.ops.IvfKMeans.r6d(graft.ops.IvfKMeans.dotD(pm, c))
          }.toMap
        }
        def codeCol(m: Int): org.apache.spark.sql.Column =
          greatest(cents(m).map { case (cid, c) =>
            struct(
              FeatureOps
                .r6(VectorOps.dot(slice(col("embedding"), m * sub + 1, sub), typedLit(c.toSeq)))
                .as("d"),
              lit(-cid).as("negid"),
              lit(cid).as("cid"))
          }: _*).getField("cid")
        val encoded = assigned
          .filter(col("vec_id") =!= 100)
          .select(
            col("vec_id") +: col("cell") +: (0 until M).map(m => codeCol(m).as(s"code$m")): _*)
        def lutCol(m: Int): org.apache.spark.sql.Column = {
          val pairs = cents(m).map { case (cid, _) => (cid, lut(m)(cid)) }
          pairs.tail.foldLeft(when(col(s"code$m") === lit(pairs.head._1), lit(pairs.head._2))) {
            case (acc, (cid, v)) => acc.when(col(s"code$m") === lit(cid), lit(v))
          }
        }
        encoded
          .join(broadcast(probeCells), Seq("cell"), "left_semi")
          .select(col("vec_id"), (lutCol(0) + lutCol(1) + lutCol(2) + lutCol(3)).as("score"))
          .orderBy(col("score").desc, col("vec_id"))
          .limit(5)
      },
      Some(s"""$ivfCtes,
          ${(0 until 4).map(pqSubCte).mkString(",\n")},
          probe_cells AS (SELECT cell FROM (
            SELECT c.cent_id AS cell,
              row_number() OVER (ORDER BY ${r6(dot("p.embedding", "c.cent"))} DESC, c.cent_id) AS rk
            FROM (SELECT embedding FROM vecs WHERE vec_id = 100) p, cents2 c) WHERE rk <= 2)
          SELECT a0.vec_id, (l0.v + l1.v + l2.v + l3.v) AS score
          FROM assigned0 a0
            JOIN assigned1 a1 USING (vec_id)
            JOIN assigned2 a2 USING (vec_id)
            JOIN assigned3 a3 USING (vec_id)
            JOIN assigned coarse ON coarse.vec_id = a0.vec_id
            JOIN lut0 l0 ON l0.cent_id = a0.cell
            JOIN lut1 l1 ON l1.cent_id = a1.cell
            JOIN lut2 l2 ON l2.cent_id = a2.cell
            JOIN lut3 l3 ON l3.cent_id = a3.cell
          WHERE coarse.cell IN (SELECT cell FROM probe_cells) AND a0.vec_id <> 100
          ORDER BY score DESC, vec_id LIMIT 5""")
    ),
    // Dataset-QA: label conflicts among embedding near-duplicates (q76) —
    // pairs of near-identical embeddings (q37's bucketed cosine path)
    // whose class labels DISAGREE: the label-noise probe of an embedding
    // dataset. Same adaptive sign-bucket join as q37, plus the label
    // columns and a label-mismatch filter.
    Q(
      "q76_label_conflicts",
      (s, dir) => {
        val tbl = Tables.embeddings(s, dir)
        val planes = VectorOps.adaptivePlanes(Tables.rowCount(s, dir, "embeddings"))
        val e = tbl.select(
          col("vec_id"),
          col("embedding"),
          col("label").cast("long").as("label"),
          VectorOps.signBucket(col("embedding"), planes).as("bkt")
        )
        val capped = graft.ops.BucketCap.capSide(e, col("bkt"), col("vec_id"), tag = "q76")
        capped
          .as("a")
          .join(e.as("b"), col("a.bkt") === col("b.bkt") && col("a.vec_id") < col("b.vec_id"))
          .select(
            col("a.vec_id").as("vec_a"),
            col("b.vec_id").as("vec_b"),
            col("a.label").as("label_a"),
            col("b.label").as("label_b"),
            FeatureOps.r6(VectorOps.cosine(col("a.embedding"), col("b.embedding"))).as("cos")
          )
          .filter(col("cos") >= 0.3 && col("label_a") =!= col("label_b"))
          .orderBy("vec_a", "vec_b")
      },
      Some(s"""WITH be AS (SELECT vec_id, embedding, CAST(label AS BIGINT) AS label,
            ${signBucketAdaptive("embedding", "(SELECT count(*) FROM embeddings)")} AS bkt
          FROM embeddings)
        SELECT vec_a, vec_b, label_a, label_b, cos FROM (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 a.label AS label_a, b.label AS label_b,
                 floor((${cosine("a.embedding", "b.embedding")}) * 1e6 + 5e-1) / 1e6 AS cos
          FROM be a JOIN be b ON a.bkt = b.bkt AND a.vec_id < b.vec_id)
        WHERE cos >= 3e-1 AND label_a <> label_b ORDER BY vec_a, vec_b""")
    ),
    // Embedding quantization export (q71): L2 norm + int8 quantization
    // (floor(x/‖x‖·127 + ½), clipped to ±127) — the serving-export step
    // of an embedding pipeline, reported as the exact integer SUM of the
    // quantized vector (order-free) + saturation count rather than the
    // array itself (scalar outputs hash-compare robustly across engines).
    // Map-only over a 2-column scan; zero-norm guarded to 0 on both
    // engines (floor(NaN) would cast differently).
    Q(
      "q71_embed_quantize",
      (s, dir) =>
        Tables
          .embeddings(s, dir)
          .withColumn("nrm", sqrt(VectorOps.dot(col("embedding"), col("embedding"))))
          .withColumn("ql", transform(col("embedding"), x => VectorOps.quantize(x, col("nrm"), 127L)))
          .select(
            col("vec_id"),
            FeatureOps.r6(col("nrm")).as("norm"),
            aggregate(col("ql"), lit(0L), (a, b) => a + b).as("sum_q"),
            size(filter(col("ql"), v => abs(v) === lit(127L))).cast("long").as("n_sat")
          )
          .orderBy("vec_id"),
      Some {
        val nrm = s"sqrt(${dot("embedding", "embedding")})"
        val qx = s"""greatest(least(CAST(floor(
            CASE WHEN $nrm < 1e-12 THEN 0e0
                 ELSE CAST(x AS DOUBLE) / $nrm * 127e0 + 5e-1 END) AS BIGINT), 127), -127)"""
        s"""SELECT vec_id, ${r6(nrm)} AS norm,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(embedding, x -> $qx)), (a, b) -> a + b) AS sum_q,
          CAST(len(list_filter(list_transform(embedding, x -> $qx),
            v -> abs(v) = 127)) AS BIGINT) AS n_sat
          FROM embeddings ORDER BY vec_id"""
      }
    ),
    // Per-label embedding centroids (element-wise mean), long format
    // (label, dim, mean) — embedding-space class statistics for corpus
    // curation. Exactness across engines and aggregation orders via the
    // IvfKMeans integer-quantization trick: sum floor(x·1e6 + .5) as
    // BIGINT (exact, order-free), one final IEEE division. Scale shape:
    // posexplode fans each vector into dim rows, then ONE shuffle on the
    // (label, dim) key with map-side partial sums — never collects
    // vectors anywhere.
    Q(
      "q64_label_centroids",
      (s, dir) =>
        Tables
          .embeddings(s, dir)
          .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
          .select(
            col("label").cast("long").as("label"),
            (col("pos") + 1).cast("long").as("i"),
            floor(col("x").cast("double") * lit(1e6) + lit(0.5)).cast("long").as("qx")
          )
          .groupBy("label", "i")
          .agg(
            (sum(col("qx")).cast("double") / (count(lit(1)).cast("double") * lit(1e6))).as("v"),
            count(lit(1)).as("n_vecs")
          )
          .orderBy("label", "i"),
      Some(s"""SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS i,
          CAST(sum(qx) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1e6) AS v,
          CAST(count(*) AS BIGINT) AS n_vecs
        FROM (SELECT label, unnest(generate_series(1, len(embedding))) AS i,
                     unnest($quantList) AS qx
              FROM embeddings)
        GROUP BY label, i ORDER BY label, i""")
    ),
    // Hybrid retrieval fusion (q97): Reciprocal Rank Fusion of the BM25
    // lexical ranking (q92's scored frame, fixed three-term query) and
    // the embedding-cosine ranking against probe vec 0 —
    // rrf = Σ 1/(60 + rank), the standard k=60 form. Each ranker is
    // TRUNCATED to its top-50 by TakeOrdered FIRST, so the global
    // row_number windows that assign ranks run on 50-row frames (a
    // SinglePartition exchange of 50 rows, not a corpus sort) — the
    // textbook way rank fusion stays cheap at 100 TB: fuse bounded
    // lists, never full rankings. Ranks ride r6-rounded sort keys with
    // doc_id tiebreaks, so both engines rank identical sequences; a doc
    // missing from one list contributes 0 from that list.
    Q(
      "q97_rrf_hybrid",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val bmRank = Window.orderBy(col("score").desc, col("doc_id"))
        val bm = TextQueries
          .bm25Scored(s, dir)
          .select(col("doc_id"), col("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(50)
          .withColumn("rank_bm25", row_number().over(bmRank).cast("long"))
        val cosRank = Window.orderBy(col("cos").desc, col("doc_id"))
        val e = Tables.embeddings(s, dir)
        val probe = e.filter(col("vec_id") === 0).select(col("embedding").as("p"))
        val cs = e
          .filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(probe))
          .select(
            col("vec_id").as("doc_id"),
            FeatureOps.r6(VectorOps.cosine(col("embedding"), col("p"))).as("cos")
          )
          .orderBy(col("cos").desc, col("doc_id"))
          .limit(50)
          .withColumn("rank_cos", row_number().over(cosRank).cast("long"))
        bm.select(col("doc_id"), col("rank_bm25"))
          .join(cs.select(col("doc_id"), col("rank_cos")), Seq("doc_id"), "full_outer")
          .select(
            col("doc_id"),
            col("rank_bm25"),
            col("rank_cos"),
            FeatureOps.r6(
              coalesce(lit(1.0) / (lit(60.0) + col("rank_bm25").cast("double")), lit(0.0)) +
                coalesce(lit(1.0) / (lit(60.0) + col("rank_cos").cast("double")), lit(0.0))
            ).as("rrf")
          )
          .orderBy(col("rrf").desc, col("doc_id"))
          .limit(10)
      },
      Some(s"""${TextQueries.bm25Ctes},
        bm AS (SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 50),
        bmr AS (SELECT doc_id,
                  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank_bm25
                FROM bm),
        pr AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
        cs AS (SELECT vec_id AS doc_id, ${r6(cosine("embedding", "p"))} AS cos
               FROM embeddings, pr WHERE vec_id <> 0),
        csl AS (SELECT doc_id, cos FROM cs ORDER BY cos DESC, doc_id LIMIT 50),
        csr AS (SELECT doc_id,
                  CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS BIGINT) AS rank_cos
                FROM csl)
        SELECT doc_id, rank_bm25, rank_cos,
          floor((coalesce(1e0 / (60e0 + CAST(rank_bm25 AS DOUBLE)), 0e0) +
                 coalesce(1e0 / (60e0 + CAST(rank_cos AS DOUBLE)), 0e0)) * 1e6 + 5e-1) / 1e6 AS rrf
        FROM bmr FULL OUTER JOIN csr USING (doc_id)
        ORDER BY rrf DESC, doc_id LIMIT 10""")
    ),
    // q173: embeddings ↔ documents referential integrity — the sync
    // audit an embedding-refresh pipeline (s34's world) runs before
    // serving: every document must have a vector (vec_id ≡ doc_id in
    // this corpus), no vector may be orphaned, dimensions must be
    // uniform, and no vector may be NaN-poisoned or all-zero (both
    // break cosine math silently — a zero norm divides by zero, a NaN
    // propagates through every dot product it touches). Scale shape:
    // two key-shuffled anti joins (conditional-counted in ONE full
    // outer join pass — no pinned broadcast: both tables scale), a
    // map-side dim/NaN/zero profile in the same pass over vectors, and
    // a 1-row verdict with integrity_ok folded in-hash.
    Q(
      "q173_embedding_integrity",
      (s, dir) => {
        val d = Tables
          .documents(s, dir)
          .select(col("doc_id"))
        val e = Tables
          .embeddings(s, dir)
          .select(
            col("vec_id"),
            size(col("embedding")).cast("long").as("dim"),
            expr("exists(embedding, x -> isnan(x))").as("has_nan"),
            (size(expr("filter(embedding, x -> x != CAST(0 AS FLOAT))")) === 0)
              .as("all_zero"))
        d.join(e, col("doc_id") === col("vec_id"), "full_outer")
          .agg(
            sum(when(col("doc_id").isNotNull, 1L).otherwise(0L)).as("n_docs"),
            sum(when(col("vec_id").isNotNull, 1L).otherwise(0L)).as("n_vecs"),
            sum(when(col("doc_id").isNotNull && col("vec_id").isNull, 1L).otherwise(0L))
              .as("n_missing_embedding"),
            sum(when(col("vec_id").isNotNull && col("doc_id").isNull, 1L).otherwise(0L))
              .as("n_orphan_vectors"),
            min(col("dim")).as("dim_min"),
            max(col("dim")).as("dim_max"),
            sum(when(col("has_nan"), 1L).otherwise(0L)).as("n_nan_vectors"),
            sum(when(col("all_zero"), 1L).otherwise(0L)).as("n_zero_vectors"))
          .withColumn("dims_consistent", col("dim_min") === col("dim_max"))
          .withColumn(
            "integrity_ok",
            col("n_missing_embedding") === 0L && col("n_orphan_vectors") === 0L &&
              col("dims_consistent") && col("n_nan_vectors") === 0L &&
              col("n_zero_vectors") === 0L)
          .select(
            col("n_docs"), col("n_vecs"), col("n_missing_embedding"),
            col("n_orphan_vectors"), col("dim_min"), col("dim_max"),
            col("dims_consistent"), col("n_nan_vectors"), col("n_zero_vectors"),
            col("integrity_ok"))
          .orderBy("n_docs")
      },
      Some("""WITH d AS (SELECT doc_id FROM documents),
        e AS (SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
            len(list_filter(embedding, x -> isnan(x))) > 0 AS has_nan,
            len(list_filter(embedding, x -> x <> 0)) = 0 AS all_zero
          FROM embeddings),
        j AS (SELECT * FROM d FULL OUTER JOIN e ON d.doc_id = e.vec_id)
        SELECT
          CAST(count(*) FILTER (doc_id IS NOT NULL) AS BIGINT) AS n_docs,
          CAST(count(*) FILTER (vec_id IS NOT NULL) AS BIGINT) AS n_vecs,
          CAST(count(*) FILTER (doc_id IS NOT NULL AND vec_id IS NULL) AS BIGINT)
            AS n_missing_embedding,
          CAST(count(*) FILTER (vec_id IS NOT NULL AND doc_id IS NULL) AS BIGINT)
            AS n_orphan_vectors,
          CAST(min(dim) AS BIGINT) AS dim_min,
          CAST(max(dim) AS BIGINT) AS dim_max,
          min(dim) = max(dim) AS dims_consistent,
          CAST(count(*) FILTER (has_nan) AS BIGINT) AS n_nan_vectors,
          CAST(count(*) FILTER (all_zero) AS BIGINT) AS n_zero_vectors,
          (count(*) FILTER (doc_id IS NOT NULL AND vec_id IS NULL) = 0
            AND count(*) FILTER (vec_id IS NOT NULL AND doc_id IS NULL) = 0
            AND min(dim) = max(dim)
            AND count(*) FILTER (has_nan) = 0
            AND count(*) FILTER (all_zero) = 0) AS integrity_ok
        FROM j ORDER BY n_docs""")
    ),
    // q181: in-engine text→embedding featurizer + recall audit — the
    // lineage the board never ran END-TO-END (r14 verdict, missing #4):
    // every ANN entry consumes fixture embeddings; here the vectors are
    // GENERATED from `documents` by a deterministic hashed char-3-gram
    // projection (the feature-hashing trick: bucket = h60('em:'||gram)
    // mod 64, sign from the hash's next bit, INTEGER accumulators so
    // both engines sum exactly; float-cast at the end — counts are
    // small ints, exact in float32), then the q174 IVF recall audit
    // runs on those generated vectors: doc → vector → trained codebook
    // → cell-restricted search → measured recall@10, one lineage, no
    // fixture embeddings anywhere. Floors measured at sf0.001/0.01/0.1
    // — P1 mean 5900/5900/5700, P2 mean 7500/7500/8450 (sf0.1's 5000
    // docs are the only SF where the corpus actually grows) — and set
    // just below the worst mean: P1 5600, P2 7400; the P2−P1 delta
    // rides at ≥ 0 (structural: P2's candidate set contains P1's —
    // measured value of the second probe: 1600–2750 bp).
    //
    // Scale shape: featurization is a MAP-SIDE scalar chain (two nested
    // HOFs — md5 once per gram, then 64 integer fold-sums), ckpt'd once
    // so the codebook collects, assignment, probes, and exact side all
    // read the materialized 64-float table instead of re-hashing text;
    // everything downstream reuses q174's audited shapes (TrainLimit
    // codebook, broadcast probe cells, salted two-level exact top-k).
    Q(
      "q181_embed_recall",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val kTop = 10
        val K = graft.ops.IvfKMeans.K
        val emb = Tables
          .documentsSpread(s, dir)
          .filter(length(col("text")) >= 3)
          .select(
            col("doc_id").as("vec_id"),
            // one compiled pass per doc (HashedNgramEmbed) — the
            // composed HOF form it replaces ran the inner fold
            // INTERPRETED once per (gram x slot) and cost ~95 s/run at
            // sf0.1 (measured; HashParitySpec pins bit-equality)
            call_function("graft_embed", col("text"), lit(64)).as("raw"))
          // raw hashed counts are NOT unit-norm, and IVF assigns by max
          // DOT — without normalization every vector lands in the one
          // largest-magnitude centroid's cell (measured: 492/492 in one
          // cell) and the audit trivializes. Production featurizers
          // normalize before indexing; here that's the q71/q177 int8
          // quantizer (the shared cross-engine-exact kernel): unit-
          // normalize, scale to ±127, floor — integer components,
          // exact in float32, cells spread 12–194 across all 8.
          .filter(VectorOps.dot(col("raw"), col("raw")) > 0)
          .withColumn("nrm", sqrt(VectorOps.dot(col("raw"), col("raw"))))
          .select(
            col("vec_id"),
            transform(col("raw"), x => VectorOps.quantize(x, col("nrm"), 127L))
              .cast("array<float>").as("embedding"))
          .ckpt()
        val cents = graft.ops.IvfKMeans.codebook(s, emb)
        val vecs = emb.filter(col("vec_id") >= K)
        val probes = vecs
          .filter(col("vec_id") >= 100 && col("vec_id") < 120)
          .select(col("vec_id").as("pid"), col("embedding").as("p"))
        val exact = saltedTopK(
          vecs
            .crossJoin(broadcast(probes))
            .filter(col("vec_id") =!= col("pid"))
            .select(
              col("pid"), col("vec_id"),
              FeatureOps.r6(VectorOps.cosine(col("embedding"), col("p"))).as("cos")),
          kTop)
        val assigned = graft.ops.IvfKMeans.assign(vecs, cents)
        val pcells = graft.ops.IvfKMeans
          .assignTopP(vecs.filter(col("vec_id") >= 100 && col("vec_id") < 120), cents, 2)
          .select(
            col("vec_id").as("pid"), col("embedding").as("p"),
            col("cell").as("pcell"), col("rk").as("prk"))
        def ivfTop(pMax: Int) = saltedTopK(
          assigned
            .join(broadcast(pcells.filter(col("prk") <= pMax)), col("cell") === col("pcell"))
            .filter(col("vec_id") =!= col("pid"))
            .select(
              col("pid"), col("vec_id"),
              FeatureOps.r6(VectorOps.cosine(col("embedding"), col("p"))).as("cos")),
          kTop)
          .select(col("e_pid").as("a_pid"), col("e_vid").as("a_vid"))
        val rP1 = recallBp(exact, ivfTop(1), kTop)
        val rP2 = recallBp(exact, ivfTop(2), kTop)
        val rDelta = rP1
          .select(col("pid"), col("recall_bp").as("r1"))
          .join(broadcast(rP2.select(col("pid").as("pid2"), col("recall_bp").as("r2"))),
            col("pid") === col("pid2"))
          .select(col("pid"), (col("r2") - col("r1")).as("recall_bp"))
        recallSummary("emb_ivf_p1", kTop, 5600L, rP1)
          .unionAll(recallSummary("emb_ivf_p2", kTop, 7400L, rP2))
          .unionAll(recallSummary("emb_p2_minus_p1", kTop, 0L, rDelta))
          .orderBy("method")
      },
      Some {
        val hi = graft.ops.IvfKMeans.K + graft.ops.IvfKMeans.TrainLimit
        s"""WITH g AS (SELECT doc_id, list_transform(
              list_transform(generate_series(1, len(text) - 2),
                i -> ${h60("'em:' || substr(text, i, 3)")}),
              h -> (h % 64) + 64 * ((h // 64) % 2)) AS gs
            FROM documents WHERE len(text) >= 3),
          e1 AS (SELECT doc_id, j,
              CAST(coalesce(list_sum(list_transform(gs,
                x -> CASE WHEN x = j THEN 1 WHEN x = j + 64 THEN -1 ELSE 0 END)),
                0) AS DOUBLE) AS v
            FROM g, (SELECT unnest(generate_series(0, 63)) AS j) js),
          emb0 AS (SELECT doc_id AS vec_id, list(v ORDER BY j) AS raw
            FROM e1 GROUP BY doc_id),
          emb AS (SELECT vec_id, list_transform(raw,
              x -> CAST(greatest(least(CAST(floor(
                CASE WHEN sqrt(${dot("raw", "raw")}) < 1e-12 THEN 0e0
                     ELSE CAST(x AS DOUBLE) / sqrt(${dot("raw", "raw")}) * 127e0 + 5e-1
                END) AS BIGINT), 127), -127) AS DOUBLE)) AS embedding
            FROM emb0 WHERE ${dot("raw", "raw")} > 0),
          vecs AS (SELECT vec_id, embedding FROM emb WHERE vec_id >= 8),
          tvecs AS (SELECT vec_id, embedding FROM emb
            WHERE vec_id >= 8 AND vec_id < $hi),
          cents0 AS (SELECT vec_id AS cent_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent
            FROM emb WHERE vec_id < 8),
          a0 AS (${assignSql("tvecs", "cents0")}),
          cents1 AS (${updateSql("a0")}),
          a1 AS (${assignSql("tvecs", "cents1")}),
          cents2 AS (${updateSql("a1")}),
          assigned AS (${assignSql("vecs", "cents2")}),
          probes AS (SELECT vec_id AS pid, embedding AS p FROM vecs
            WHERE vec_id >= 100 AND vec_id < 120),
          escored AS (SELECT pid, vec_id,
              ${r6(cosine("embedding", "p"))} AS cos
            FROM vecs, probes WHERE vec_id <> pid),
          exact AS (SELECT pid AS e_pid, vec_id AS e_vid FROM (
              SELECT pid, vec_id,
                row_number() OVER (PARTITION BY pid ORDER BY cos DESC, vec_id) AS rk
              FROM escored) WHERE rk <= 10),
          pcells AS (SELECT pid, p, cell, rk AS prk FROM (
              SELECT pr.pid, pr.p, c.cent_id AS cell,
                row_number() OVER (PARTITION BY pr.pid
                  ORDER BY ${r6(dot("pr.p", "c.cent"))} DESC, c.cent_id) AS rk
              FROM probes pr, cents2 c) WHERE rk <= 2),
          ivf1 AS (SELECT pid AS a_pid, vec_id AS a_vid FROM (
              SELECT pc.pid, a.vec_id,
                row_number() OVER (PARTITION BY pc.pid
                  ORDER BY ${r6(cosine("a.embedding", "pc.p"))} DESC, a.vec_id) AS rk
              FROM assigned a JOIN pcells pc
                ON a.cell = pc.cell AND pc.prk <= 1 AND a.vec_id <> pc.pid)
            WHERE rk <= 10),
          ivf2 AS (SELECT pid AS a_pid, vec_id AS a_vid FROM (
              SELECT pc.pid, a.vec_id,
                row_number() OVER (PARTITION BY pc.pid
                  ORDER BY ${r6(cosine("a.embedding", "pc.p"))} DESC, a.vec_id) AS rk
              FROM assigned a JOIN pcells pc
                ON a.cell = pc.cell AND pc.prk <= 2 AND a.vec_id <> pc.pid)
            WHERE rk <= 10),
          r_p1 AS (SELECT e_pid AS pid,
              (CAST(count(a.a_vid) AS BIGINT) * 10000) // 10 AS recall_bp
            FROM exact e LEFT JOIN ivf1 a ON e.e_pid = a.a_pid AND e.e_vid = a.a_vid
            GROUP BY 1),
          r_p2 AS (SELECT e_pid AS pid,
              (CAST(count(a.a_vid) AS BIGINT) * 10000) // 10 AS recall_bp
            FROM exact e LEFT JOIN ivf2 a ON e.e_pid = a.a_pid AND e.e_vid = a.a_vid
            GROUP BY 1),
          r_delta AS (SELECT r_p1.pid, r_p2.recall_bp - r_p1.recall_bp AS recall_bp
            FROM r_p1 JOIN r_p2 ON r_p1.pid = r_p2.pid),
          summaries AS (
            SELECT 'emb_ivf_p1' AS method, CAST(10 AS BIGINT) AS k,
              CAST(count(*) AS BIGINT) AS n_probes,
              CAST(sum(recall_bp) // count(*) AS BIGINT) AS mean_recall_bp,
              CAST(min(recall_bp) AS BIGINT) AS min_recall_bp,
              CAST(5600 AS BIGINT) AS floor_bp,
              (sum(recall_bp) // count(*)) >= 5600 AS floor_ok FROM r_p1
            UNION ALL
            SELECT 'emb_ivf_p2', CAST(10 AS BIGINT), CAST(count(*) AS BIGINT),
              CAST(sum(recall_bp) // count(*) AS BIGINT),
              CAST(min(recall_bp) AS BIGINT), CAST(7400 AS BIGINT),
              (sum(recall_bp) // count(*)) >= 7400 FROM r_p2
            UNION ALL
            SELECT 'emb_p2_minus_p1', CAST(10 AS BIGINT), CAST(count(*) AS BIGINT),
              CAST(sum(recall_bp) // count(*) AS BIGINT),
              CAST(min(recall_bp) AS BIGINT), CAST(0 AS BIGINT),
              (sum(recall_bp) // count(*)) >= 0 FROM r_delta)
          SELECT method, k, n_probes, mean_recall_bp, min_recall_bp, floor_bp, floor_ok
          FROM summaries ORDER BY method"""
      }
    ),
    // q201: IVF INDEX-QUALITY audit — the health report an index owner
    // reads before trusting search results (FAISS's imbalance_factor +
    // per-list stats): per trained cell, member count, share of the
    // corpus in bp (the balance read-off — one cell holding half the
    // data means probes either scan half the corpus or miss), the
    // summed assignment affinity (quantized r6·1e6 dot with the OWN
    // centroid — the inertia analog under the engine's max-dot
    // assignment), and the WORST member's affinity (min — the vector
    // most likely mis-served by cell-restricted search). Cells the
    // training dropped to empty still report (n_members 0 — the
    // left-join from the codebook side).
    //
    // Scale shape: the codebook is a literal 8-row broadcast leaf
    // (IvfKMeans.codebook); assignment + the affinity re-dot are
    // map-side over the broadcast; ONE cell-keyed partial-agg rollup
    // (8 groups) + a 1-row total crossJoined back. Nothing shuffles
    // but the 8-group census.
    Q(
      "q201_ivf_quality",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val cents = graft.ops.IvfKMeans.codebook(s, e)
        val vecs = e.filter(col("vec_id") >= graft.ops.IvfKMeans.K)
          .select("vec_id", "embedding")
        val assigned = graft.ops.IvfKMeans.assign(vecs, cents)
        val aff = assigned
          .join(broadcast(cents), col("cell") === col("cent_id"))
          .select(
            col("cell"),
            floor(FeatureOps.r6(VectorOps.dot(col("embedding"), col("cent"))) * 1e6 + 0.5)
              .cast("long").as("affq"))
        val roll = aff.groupBy(col("cell"))
          .agg(
            count(lit(1)).as("n_members"),
            sum(col("affq")).as("affinity_qsum"),
            min(col("affq")).as("min_affinity_q"))
        val tot = aff.agg(count(lit(1)).as("t"))
        cents.select(col("cent_id").as("cell"))
          .join(roll, Seq("cell"), "left")
          .crossJoin(broadcast(tot))
          .select(
            col("cell"),
            coalesce(col("n_members"), lit(0L)).as("n_members"),
            expr("coalesce(n_members, 0) * 10000 div t").as("share_bp"),
            coalesce(col("affinity_qsum"), lit(0L)).as("affinity_qsum"),
            coalesce(col("min_affinity_q"), lit(0L)).as("min_affinity_q"))
          .orderBy("cell")
      },
      Some(s"""$ivfCtes,
          aff AS (SELECT a.cell,
              CAST(floor((${r6(dot("a.embedding", "c.cent"))}) * 1e6 + 5e-1)
                AS BIGINT) AS affq
            FROM assigned a JOIN cents2 c ON a.cell = c.cent_id),
          roll AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_members,
              CAST(sum(affq) AS BIGINT) AS affinity_qsum,
              CAST(min(affq) AS BIGINT) AS min_affinity_q
            FROM aff GROUP BY cell),
          tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM aff)
          SELECT c.cent_id AS cell,
            COALESCE(roll.n_members, 0) AS n_members,
            CAST(COALESCE(roll.n_members, 0) * 10000 // tot.t AS BIGINT)
              AS share_bp,
            COALESCE(roll.affinity_qsum, 0) AS affinity_qsum,
            COALESCE(roll.min_affinity_q, 0) AS min_affinity_q
          FROM cents2 c LEFT JOIN roll ON c.cent_id = roll.cell, tot
          ORDER BY cell""")
    ),
    // q207: per-cluster DIVERSITY sampling — q185's trained semantic
    // cells composed with q130's exact-quota selection (the D4 /
    // coverage-first shape, Tirumala et al. 2023 arXiv:2308.12284:
    // after clustering, sample so dense clusters stop dominating the
    // mix while rare clusters keep full representation). Allocation is
    // the capped rule quota_h = min(n_h, 8): dense cells are clipped to
    // the cap, sparse cells keep everything — before_bp/after_bp pin
    // the measured flattening of the cell-share distribution (the
    // diversity claim as integers, not prose). Selection inside a cell
    // is q130's deterministic key — rank by (md5(vec_id), vec_id) —
    // so the sampled SET is engine-portable and rides the hash via the
    // per-cell id-sum.
    //
    // Scale shape: assignment is the map-side broadcast-codebook
    // argmax (cells are index metadata); ONE shuffle on the cell key
    // feeds both the census and the rank window; the quota join is
    // cell-domain-bounded; totals broadcast as a 1-row frame. The
    // per-cell sort is the honest cost of exact quotas (q130's
    // declared relaxation — two-pass hash-threshold — applies here
    // unchanged when cells are corpus-sized).
    Q(
      "q207_cluster_diversity_sample",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.embeddings(s, dir)
        val cents = graft.ops.IvfKMeans.codebook(s, e)
        val vecs = e
          .filter(col("vec_id") >= graft.ops.IvfKMeans.K)
          .select("vec_id", "embedding")
        val rk = row_number()
          .over(Window.partitionBy(col("cell"))
            .orderBy(md5(col("vec_id").cast("string")), col("vec_id")))
          .cast("long")
        val ranked = graft.ops.IvfKMeans.assign(vecs, cents)
          .select(col("vec_id"), col("cell"))
          .withColumn("rk", rk)
          .ckpt() // one cell shuffle, reused by census + selection
        val cen = ranked
          .groupBy("cell")
          .agg(count(lit(1)).as("n_vecs"))
          .withColumn("quota", least(col("n_vecs"), lit(8L)))
        val sel = ranked
          .join(cen.select("cell", "quota"), "cell")
          .filter(col("rk") <= col("quota"))
          .groupBy("cell")
          .agg(sum(col("vec_id")).as("sampled_id_sum"))
        val tot = cen.agg(
          sum(col("n_vecs")).as("nt"), sum(col("quota")).as("qt"))
        cen
          .join(sel, Seq("cell"), "left")
          .crossJoin(broadcast(tot))
          .select(
            col("cell"), col("n_vecs"), col("quota"),
            coalesce(col("sampled_id_sum"), lit(0L)).as("sampled_id_sum"),
            expr("(n_vecs * 10000) div nt").as("before_bp"),
            expr("(quota * 10000) div qt").as("after_bp"))
          .orderBy("cell")
      },
      Some(s"""$ivfCtes,
          r AS (SELECT cell, vec_id,
              CAST(row_number() OVER (PARTITION BY cell
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT) AS rk
            FROM assigned),
          cen AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs
            FROM r GROUP BY cell),
          q AS (SELECT cell, n_vecs,
              CAST(least(n_vecs, 8) AS BIGINT) AS quota FROM cen),
          sel AS (SELECT r.cell, CAST(sum(r.vec_id) AS BIGINT) AS sampled_id_sum
            FROM r JOIN q ON r.cell = q.cell
            WHERE r.rk <= q.quota GROUP BY r.cell),
          tot AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS nt,
              CAST(sum(quota) AS BIGINT) AS qt FROM q)
          SELECT q.cell, q.n_vecs, q.quota,
            COALESCE(sel.sampled_id_sum, 0) AS sampled_id_sum,
            (q.n_vecs * 10000) // tot.nt AS before_bp,
            (q.quota * 10000) // tot.qt AS after_bp
          FROM q LEFT JOIN sel ON q.cell = sel.cell, tot
          ORDER BY q.cell""")
    ),
    // q213: MRR / RANK-POSITION audit — q174 measures how much of the
    // exact top-k each index RECOVERS; this measures WHERE the true
    // nearest neighbor LANDS in each index's ranking, the metric a
    // retrieval stack actually tunes against (recall@10 treats rank 1
    // and rank 10 identically; MRR does not). Per probe: the exact
    // top-1 (q174's salted two-level ground truth at k=1), its rank in
    // the method's ranked top-10, reciprocal rank as floor(10000/rank)
    // — integer-exact — and 0 when the true NN is missed entirely.
    // Summaries per method (probes found, mean/min rr, in-hash floor).
    // Same probe set, universe, and search shapes as q174; note the
    // P=2 rr is NOT structurally ≥ P=1's (extra candidates can only
    // outrank the true NN on r6-rounded ties) — measured, not assumed.
    //
    // Scale shape: identical to q174 — the exact side is one broadcast
    // probe sweep through the salted two-level top-k, every ranked
    // list and rr join is k·|probes|-bounded and broadcast.
    Q(
      "q213_ann_mrr",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val kTop = 10
        val K = graft.ops.IvfKMeans.K
        val e = Tables.embeddings(s, dir)
        val vecs = e.filter(col("vec_id") >= K).select("vec_id", "embedding")
        def probesOf(df: org.apache.spark.sql.DataFrame) =
          df.filter(col("vec_id") >= 100 && col("vec_id") < 120)
        val probes = probesOf(vecs).select(col("vec_id").as("pid"), col("embedding").as("p"))

        // exact top-1 per probe: the true nearest neighbor
        val scored = vecs
          .crossJoin(broadcast(probes))
          .filter(col("vec_id") =!= col("pid"))
          .select(
            col("pid"), col("vec_id"),
            FeatureOps.r6(VectorOps.cosine(col("embedding"), col("p"))).as("cos"))
        val exact1 = saltedTopK(scored, 1)

        // ranked searches — q174's shapes with the rank kept
        val planes = VectorOps.adaptivePlanes(Tables.rowCount(s, dir, "embeddings"))
        val withB = vecs.withColumn("bkt", VectorOps.signBucket(col("embedding"), planes))
        val probeB = probesOf(withB)
          .select(col("vec_id").as("pid"), col("embedding").as("p"), col("bkt").as("pbkt"))
        val lshRanked = withB
          .crossJoin(broadcast(probeB))
          .filter(col("bkt") === col("pbkt") && col("vec_id") =!= col("pid"))
          .select(
            col("pid"), col("vec_id"),
            FeatureOps.r6(VectorOps.cosine(col("embedding"), col("p"))).as("cos"))
          .withColumn(
            "rk",
            row_number().over(Window.partitionBy("pid").orderBy(col("cos").desc, col("vec_id"))))
          .filter(col("rk") <= kTop)
          .select(col("pid").as("a_pid"), col("vec_id").as("a_vid"), col("rk"))

        val cents = graft.ops.IvfKMeans.codebook(s, e)
        val assigned = graft.ops.IvfKMeans.assign(vecs, cents)
        val pcells = graft.ops.IvfKMeans
          .assignTopP(probesOf(vecs), cents, 2)
          .select(
            col("vec_id").as("pid"), col("embedding").as("p"),
            col("cell").as("pcell"), col("rk").as("prk"))
        def ivfRanked(pMax: Int) = saltedTopKRanked(
          assigned
            .join(broadcast(pcells.filter(col("prk") <= pMax)), col("cell") === col("pcell"))
            .filter(col("vec_id") =!= col("pid"))
            .select(
              col("pid"), col("vec_id"),
              FeatureOps.r6(VectorOps.cosine(col("embedding"), col("p"))).as("cos")),
          kTop)
          .select(col("e_pid").as("a_pid"), col("e_vid").as("a_vid"), col("rk"))

        // reciprocal rank per probe: floor(10000/rank), 0 on a miss
        def rrBp(ranked: org.apache.spark.sql.DataFrame) = exact1
          .join(
            broadcast(ranked),
            col("e_pid") === col("a_pid") && col("e_vid") === col("a_vid"), "left")
          .select(
            col("e_pid").as("pid"),
            coalesce(expr("CAST(10000 AS BIGINT) div rk"), lit(0L)).as("rr_bp"))

        def mrrSummary(m: String, floorBp: Long, rp: org.apache.spark.sql.DataFrame) = rp
          .agg(
            count(lit(1)).as("n_probes"),
            sum(when(col("rr_bp") > 0L, 1L).otherwise(0L)).as("n_hit"),
            expr("sum(rr_bp) div count(*)").as("mean_rr_bp"),
            min(col("rr_bp")).as("min_rr_bp"))
          .select(
            lit(m).as("method"), lit(kTop.toLong).as("k"), col("n_probes"),
            col("n_hit"), col("mean_rr_bp"), col("min_rr_bp"),
            lit(floorBp).as("floor_bp"),
            (col("mean_rr_bp") >= floorBp).as("floor_ok"))

        mrrSummary("ivf_p1", 1000L, rrBp(ivfRanked(1)))
          .unionAll(mrrSummary("ivf_p2", 2000L, rrBp(ivfRanked(2))))
          .unionAll(mrrSummary("lsh", 0L, rrBp(lshRanked)))
          .orderBy("method")
      },
      Some(s"""$ivfCtes,
          probes AS (SELECT vec_id AS pid, embedding AS p FROM vecs
            WHERE vec_id >= 100 AND vec_id < 120),
          escored AS (SELECT pid, vec_id,
              ${r6(cosine("embedding", "p"))} AS cos
            FROM vecs, probes WHERE vec_id <> pid),
          exact1 AS (SELECT pid AS e_pid, vec_id AS e_vid FROM (
              SELECT pid, vec_id,
                row_number() OVER (PARTITION BY pid ORDER BY cos DESC, vec_id) AS rk
              FROM escored) WHERE rk <= 1),
          be AS (SELECT vec_id, embedding,
              ${signBucketAdaptive("embedding", "(SELECT count(*) FROM embeddings)")} AS bkt
            FROM vecs),
          pbe AS (SELECT vec_id AS pid, embedding AS p, bkt AS pbkt FROM be
            WHERE vec_id >= 100 AND vec_id < 120),
          lshr AS (SELECT pid AS a_pid, vec_id AS a_vid, rk FROM (
              SELECT p.pid, b.vec_id,
                row_number() OVER (PARTITION BY p.pid
                  ORDER BY ${r6(cosine("b.embedding", "p.p"))} DESC, b.vec_id) AS rk
              FROM be b JOIN pbe p ON b.bkt = p.pbkt AND b.vec_id <> p.pid)
            WHERE rk <= 10),
          pcells AS (SELECT pid, p, cell, rk AS prk FROM (
              SELECT pr.pid, pr.p, c.cent_id AS cell,
                row_number() OVER (PARTITION BY pr.pid
                  ORDER BY ${r6(dot("pr.p", "c.cent"))} DESC, c.cent_id) AS rk
              FROM probes pr, cents2 c) WHERE rk <= 2),
          ivf1r AS (SELECT pid AS a_pid, vec_id AS a_vid, rk FROM (
              SELECT pc.pid, a.vec_id,
                row_number() OVER (PARTITION BY pc.pid
                  ORDER BY ${r6(cosine("a.embedding", "pc.p"))} DESC, a.vec_id) AS rk
              FROM assigned a JOIN pcells pc
                ON a.cell = pc.cell AND pc.prk <= 1 AND a.vec_id <> pc.pid)
            WHERE rk <= 10),
          ivf2r AS (SELECT pid AS a_pid, vec_id AS a_vid, rk FROM (
              SELECT pc.pid, a.vec_id,
                row_number() OVER (PARTITION BY pc.pid
                  ORDER BY ${r6(cosine("a.embedding", "pc.p"))} DESC, a.vec_id) AS rk
              FROM assigned a JOIN pcells pc
                ON a.cell = pc.cell AND pc.prk <= 2 AND a.vec_id <> pc.pid)
            WHERE rk <= 10),
          rr_p1 AS (SELECT e_pid AS pid,
              CAST(coalesce(10000 // a.rk, 0) AS BIGINT) AS rr_bp
            FROM exact1 e LEFT JOIN ivf1r a
              ON e.e_pid = a.a_pid AND e.e_vid = a.a_vid),
          rr_p2 AS (SELECT e_pid AS pid,
              CAST(coalesce(10000 // a.rk, 0) AS BIGINT) AS rr_bp
            FROM exact1 e LEFT JOIN ivf2r a
              ON e.e_pid = a.a_pid AND e.e_vid = a.a_vid),
          rr_lsh AS (SELECT e_pid AS pid,
              CAST(coalesce(10000 // a.rk, 0) AS BIGINT) AS rr_bp
            FROM exact1 e LEFT JOIN lshr a
              ON e.e_pid = a.a_pid AND e.e_vid = a.a_vid),
          summaries AS (
            SELECT 'ivf_p1' AS method, CAST(10 AS BIGINT) AS k,
              CAST(count(*) AS BIGINT) AS n_probes,
              CAST(count(*) FILTER (rr_bp > 0) AS BIGINT) AS n_hit,
              CAST(sum(rr_bp) // count(*) AS BIGINT) AS mean_rr_bp,
              CAST(min(rr_bp) AS BIGINT) AS min_rr_bp,
              CAST(1000 AS BIGINT) AS floor_bp,
              (sum(rr_bp) // count(*)) >= 1000 AS floor_ok FROM rr_p1
            UNION ALL
            SELECT 'ivf_p2', CAST(10 AS BIGINT), CAST(count(*) AS BIGINT),
              CAST(count(*) FILTER (rr_bp > 0) AS BIGINT),
              CAST(sum(rr_bp) // count(*) AS BIGINT),
              CAST(min(rr_bp) AS BIGINT), CAST(2000 AS BIGINT),
              (sum(rr_bp) // count(*)) >= 2000 FROM rr_p2
            UNION ALL
            SELECT 'lsh', CAST(10 AS BIGINT), CAST(count(*) AS BIGINT),
              CAST(count(*) FILTER (rr_bp > 0) AS BIGINT),
              CAST(sum(rr_bp) // count(*) AS BIGINT),
              CAST(min(rr_bp) AS BIGINT), CAST(0 AS BIGINT),
              (sum(rr_bp) // count(*)) >= 0 FROM rr_lsh)
          SELECT method, k, n_probes, n_hit, mean_rr_bp, min_rr_bp,
            floor_bp, floor_ok
          FROM summaries ORDER BY method""")
    )
  )
}
