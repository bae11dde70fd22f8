package graft

import graft.ops.Hashing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native hash kernels (graft_minhash / graft_simhash) must equal the
  * composed md5-based column forms they replaced.
  */
class HashParitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  // "𝒳🦀b" carries two supplementary-plane code points (surrogate pairs in
  // UTF-16) — pins graft_embed/graft_minhash code-POINT gram semantics
  private val vocab = Vector("scan", "join", "filter", "agg", "the", "fast", "row", "key", "ümlaut", "日本", "𝒳🦀b")
  private val docs: Seq[String] =
    (1 to 100).map(_ => Seq.fill(1 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" ")) ++
      Seq("a", "a b", "a b c") // shorter-than-shingle edges

  private def ws = split(col("text"), " ")

  test("graft_minhash == array_min over salted h60 shingles (incl. unicode, short docs)") {
    val composed = array_min(transform(Hashing.shingles(ws, 3), x => Hashing.h60(concat(lit("2:"), x))))
    val native = call_function("graft_minhash", ws, lit(3), lit("2:"))
    val got = docs.toDF("text").select(native, composed).as[(Option[Long], Option[Long])].collect()
    got.foreach { case (n, c) => assert(n == c) }
  }

  test("graft_shingles == the composed transform/slice/concat_ws form (incl. unicode, short docs)") {
    val got = docs
      .toDF("text")
      .select(Hashing.shingles(ws, 3), Hashing.shinglesHof(ws, 3))
      .as[(Seq[String], Seq[String])]
      .collect()
    got.foreach { case (n, c) => assert(n == c) }
  }

  test("graft_jaccard == array_intersect/array_union over distinct shingle sets") {
    val probeWords = split(lit("scan join filter agg the fast row key scan join"), " ")
    val shA = array_distinct(Hashing.shingles(ws, 3))
    val shB = array_distinct(Hashing.shingles(probeWords, 3))
    val composed = size(array_intersect(shA, shB)).cast("double") /
      size(array_union(shA, shB)).cast("double")
    val native = call_function("graft_jaccard", ws, probeWords, lit(3))
    val got = docs.toDF("text").select(native, composed).as[(Double, Double)].collect()
    got.foreach { case (n, c) => assert(n == c || (n.isNaN && c.isNaN)) }
  }

  test("graft_simhash == 16 bit-vote folds over per-word h60") {
    val hs = transform(ws, w => Hashing.h60(w))
    val composed = (0 until 16)
      .map { j =>
        val votes = aggregate(hs, lit(0L), (a, h) => a + (shiftright(h, j).bitwiseAND(lit(1L)) * lit(2L) - lit(1L)))
        when(votes > 0, lit(1L << j)).otherwise(lit(0L))
      }
      .reduce(_ + _)
    val native = call_function("graft_simhash", ws, lit(16))
    val got = docs.toDF("text").select(native, composed).as[(Long, Long)].collect()
    got.foreach { case (n, c) => assert(n == c) }
  }

  test("graft_embed == the composed two-level HOF projection (incl. unicode, short docs)") {
    // q181's featurizer: the compiled one-pass kernel must be
    // bit-identical to the interpreted transform+aggregate form it
    // replaced (which the DuckDB oracle still mirrors) — buckets, signs,
    // short-doc empty vectors, character (not byte) gram semantics
    // the length guard matters: Spark's sequence(1, 0) runs DESCENDING,
    // so an unguarded len-2 stop would fabricate grams on sub-3-char docs
    val composed = expr(
      """transform(sequence(0, 63),
           j -> cast(aggregate(
             case when length(text) >= 3 then transform(
               transform(sequence(1, length(text) - 2),
                 i -> cast(conv(substring(md5(concat('em:', substring(text, i, 3))), 1, 15), 16, 10) as bigint)),
               h -> (h % 64) + 64 * ((h div 64) % 2))
             else cast(array() as array<bigint>) end,
             0L,
             (a, x) -> a + (case when x = j then 1L
                                 when x = j + 64 then -1L
                                 else 0L end)) as double))""")
    val native = call_function("graft_embed", col("text"), lit(64))
    val got = docs.toDF("text")
      .select(native, composed)
      .as[(Seq[Double], Seq[Double])]
      .collect()
    got.foreach { case (n, c) => assert(n == c) }
  }

  test("graft_embed guards degenerate width: d < 1 yields null, not an executor throw") {
    val got = Seq("scan join filter").toDF("text")
      .select(
        call_function("graft_embed", col("text"), lit(0)),
        call_function("graft_embed", col("text"), lit(-3)))
      .as[(Option[Seq[Double]], Option[Seq[Double]])]
      .head()
    assert(got == ((None, None)))
  }
}
