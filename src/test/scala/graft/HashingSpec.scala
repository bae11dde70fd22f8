package graft

import graft.ops.Hashing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** h60 / shingle / minhash semantics vs JVM reference implementations. */
class HashingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Reference: first 15 hex chars of md5, parsed base-16. */
  private def h60Ref(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("h60 equals the md5-prefix reference and is non-negative") {
    val inputs = Seq("abc", "", "the quick brown fox", "1:a b c")
    val got = inputs.toDF("s").select(Hashing.h60(col("s"))).as[Long].collect()
    inputs.zip(got).foreach { case (s, g) =>
      assert(g == h60Ref(s), s"for '$s'")
      assert(g >= 0)
    }
  }

  test("h60Local is bit-identical to the column h60 — q220's driver-side probe lookups depend on it") {
    val inputs = Seq("abc", "", "the quick brown fox", "0:1", "3:999999937", "2:5")
    val viaSpark = inputs.toDF("s").select(Hashing.h60(col("s"))).as[Long].collect()
    inputs.zip(viaSpark).foreach { case (s, g) =>
      assert(Hashing.h60Local(s) == g, s"for '$s'")
    }
  }

  test("shingles produce n-word windows in order") {
    val got = Seq("a b c d e")
      .toDF("text")
      .select(Hashing.shingles(split(col("text"), " "), 3))
      .as[Seq[String]]
      .head()
    assert(got == Seq("a b c", "b c d", "c d e"))
  }

  test("shingles of a short doc are empty, not negative-range") {
    val got = Seq("a b")
      .toDF("text")
      .select(Hashing.shingles(split(col("text"), " "), 3))
      .as[Seq[String]]
      .head()
    assert(got == Seq.empty)
  }

  test("minhash component is the min salted h60 over shingles") {
    val shs = Seq("a b c", "b c d")
    val got = Seq(shs).toDF("sh").select(Hashing.minhash(col("sh"), 2)).as[Long].head()
    assert(got == shs.map(s => h60Ref(s"2:$s")).min)
  }
}
