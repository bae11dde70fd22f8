package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native hashing kernels for the dedup/fingerprint operators.
  *
  * The composed forms (`transform` + `md5` + `substring` + `conv` per
  * shingle, repeated per permutation) evaluate interpreted per element and
  * dominated the bench (q32-q35 ≈ 50s at sf0.1). These kernels compute the
  * same h60 — the integer value of the first 15 hex chars of md5 — straight
  * from the digest bytes in one compiled loop, one digest per shingle.
  *
  * CodegenFallback is deliberate: the per-row entry is one virtual call;
  * all per-element work is compiled Scala. md5 remains the cost floor.
  *
  * Oracle mirrors are unchanged (OracleSql.h60 etc.) — the hash VALUES are
  * identical, verified by HashParitySpec and the driver's DuckDB compare.
  */
object GraftHash {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val space = Array[Byte](' ')

  /** h60 of raw bytes: first 7 digest bytes + high nibble of the 8th —
    * exactly the integer value of the first 15 hex chars of the md5 hex
    * string (60 bits, non-negative).
    */
  def h60(bytes: Array[Byte]): Long = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  def h60(s: UTF8String): Long = h60(s.getBytes)

  private def shingleBytes(
      words: ArrayData,
      start: Int,
      n: Int,
      salt: Array[Byte]
  ): Array[Byte] = {
    var len = salt.length + (n - 1)
    var j = 0
    val parts = new Array[Array[Byte]](n)
    while (j < n) {
      parts(j) = words.getUTF8String(start + j).getBytes
      len += parts(j).length
      j += 1
    }
    val out = new Array[Byte](len)
    var pos = salt.length
    System.arraycopy(salt, 0, out, 0, salt.length)
    j = 0
    while (j < n) {
      if (j > 0) { System.arraycopy(space, 0, out, pos, 1); pos += 1 }
      System.arraycopy(parts(j), 0, out, pos, parts(j).length)
      pos += parts(j).length
      j += 1
    }
    out
  }

  /** min over word n-gram shingles of h60(salt ++ shingle); None when the
    * doc has fewer than n words (mirrors array_min over the guarded
    * shingle list: empty → null).
    */
  def shingleMinhash(words: ArrayData, n: Int, salt: UTF8String): Option[Long] = {
    val total = words.numElements()
    if (total < n) return None
    val saltB = salt.getBytes
    var best = Long.MaxValue
    var i = 0
    val last = total - n
    while (i <= last) {
      val h = h60(shingleBytes(words, i, n, saltB))
      if (h < best) best = h
      i += 1
    }
    Some(best)
  }

  /** SimHash over per-word h60 bit votes: bit j of the result is set iff
    * Σ_words (2·bit_j(h60(word)) − 1) > 0. One digest per word.
    */
  def simhash(words: ArrayData, bits: Int): Long = {
    val n = words.numElements()
    val votes = new Array[Long](bits)
    var i = 0
    while (i < n) {
      val h = h60(words.getUTF8String(i))
      var j = 0
      while (j < bits) {
        votes(j) += ((h >> j) & 1L) * 2L - 1L
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) { if (votes(j) > 0) out |= 1L << j; j += 1 }
    out
  }
}

/** graft_minhash(words array<string>, n int, salt string): bigint —
  * min-h60 over salted n-word shingles; null for docs shorter than n
  * words. ≡ array_min(transform(shingles(words,n), x -> h60(salt||x))).
  */
case class ShingleMinHash(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), IntegerType, StringType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"graft_minhash expects (array<string>, int, string), got $t")
    }

  override def eval(input: InternalRow): Any = {
    val w = first.eval(input)
    val n = second.eval(input)
    val s = third.eval(input)
    if (w == null || n == null || s == null) return null
    GraftHash
      .shingleMinhash(w.asInstanceOf[ArrayData], n.asInstanceOf[Int], s.asInstanceOf[UTF8String])
      .map(java.lang.Long.valueOf)
      .orNull
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** graft_jaccard(wsA array<string>, wsB array<string>, n int): double —
  * Jaccard similarity of the DISTINCT n-word-shingle string sets of two
  * word arrays: |A∩B| / |A∪B|. Exact string-set semantics — identical to
  * size(array_intersect(distinct shingles)) / size(array_union(...)), and
  * to the DuckDB oracle's list_intersect/list_distinct form; NaN when both
  * sets are empty (0/0), matching both composed engines.
  */
case class JaccardShingles(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression
    with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jaccard"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(s"graft_jaccard expects (array<string>, array<string>, int), got $t")
    }

  private def shingleSet(words: ArrayData, n: Int): java.util.HashSet[UTF8String] = {
    val out = new java.util.HashSet[UTF8String]()
    val total = words.numElements()
    var i = 0
    val last = total - n
    while (i <= last) {
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 0
      while (j < n) {
        if (j > 0) parts(2 * j - 1) = UTF8String.fromString(" ")
        parts(2 * j) = words.getUTF8String(i + j)
        j += 1
      }
      out.add(UTF8String.concat(parts: _*))
      i += 1
    }
    out
  }

  override def eval(input: InternalRow): Any = {
    val a = first.eval(input)
    val b = second.eval(input)
    val n = third.eval(input)
    if (a == null || b == null || n == null) return null
    val sa = shingleSet(a.asInstanceOf[ArrayData], n.asInstanceOf[Int])
    val sb = shingleSet(b.asInstanceOf[ArrayData], n.asInstanceOf[Int])
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    val union = sa.size() + sb.size() - inter
    inter.toDouble / union.toDouble
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** graft_shingles(words array<string>, n int): array<string> — the n-word
  * shingle strings (space-joined windows); empty array below n words.
  * ≡ Hashing.shinglesHof (the transform+slice+concat_ws composition),
  * which evaluates its lambda interpreted PER ELEMENT and dominated q60's
  * bench cost; here the whole row is one compiled loop over UTF8String
  * slices (same CodegenFallback rationale as the hash kernels above).
  * Parity with the composed form pinned in HashParitySpec.
  */
case class Shingles(left: Expression, right: Expression)
    extends BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"graft_shingles expects (array<string>, int), got $t")
    }

  override def eval(input: InternalRow): Any = {
    val w = left.eval(input)
    val nv = right.eval(input)
    if (w == null || nv == null) return null
    val words = w.asInstanceOf[ArrayData]
    val n = nv.asInstanceOf[Int]
    val m = words.numElements() - n + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 0
      while (j < n) {
        if (j > 0) parts(2 * j - 1) = space
        parts(2 * j) = words.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concat(parts: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** graft_embed(text string, d int): array<double> — q181's signed
  * hashed char-3-gram projection as ONE compiled pass per document:
  * for each character 3-gram g (all characters, spaces included),
  * h = h60("em:" || g), bucket = h mod d, sign = +1 when (h div d) is
  * even else −1, accumulated into a d-slot integer-valued vector.
  * Bit-identical to the composed HOF form
  *   transform(sequence(0, d-1), j -> aggregate(encoded grams, ...))
  * it replaces (parity pinned in HashParitySpec) — the HOF lambdas are
  * INTERPRETED per (element × slot), which made the featurizer O(d·n)
  * interpreter round-trips per doc and dominated q181's sf0.1 bench at
  * ~95 s/run; this kernel is O(n) with one md5 per gram (~1 s for the
  * same corpus). Mirrors the DuckDB oracle's two-level list_transform
  * exactly (the oracle keeps the composed form — it has no interpreter
  * gap to close).
  */
case class HashedNgramEmbed(left: Expression, right: Expression)
    extends BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_embed"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"graft_embed expects (string, int), got $t")
    }

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    val dv = right.eval(input)
    if (t == null || dv == null) return null
    val d = dv.asInstanceOf[Int]
    // degenerate projection width: null, not a raw executor
    // ArithmeticException / NegativeArraySizeException from h % d
    if (d < 1) return null
    val s = t.asInstanceOf[UTF8String].toString
    val acc = new Array[Double](d)
    // CODE-POINT gram semantics, exactly substring(text, i+1, 3) in both
    // engines' SQL (UTF8String.substringSQL and DuckDB substr count code
    // points); iterating UTF-16 chars would split surrogate pairs and
    // diverge on supplementary-plane text (emoji, rare CJK)
    val n = s.codePointCount(0, s.length)
    var ci = 0 // char offset of the gram's first code point
    var i = 0
    while (i <= n - 3) {
      val end = s.offsetByCodePoints(ci, 3)
      val bytes = ("em:" + s.substring(ci, end))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val h = GraftHash.h60(bytes)
      val b = (h % d).toInt
      acc(b) += (if (((h / d) % 2) == 0L) 1.0 else -1.0)
      ci = s.offsetByCodePoints(ci, 1)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(acc)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** graft_simhash(words array<string>, bits int): bigint — SimHash of the
  * word multiset from per-word h60 bit votes.
  */
case class SimHash(left: Expression, right: Expression)
    extends BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"graft_simhash expects (array<string>, int), got $t")
    }

  override def eval(input: InternalRow): Any = {
    val w = left.eval(input)
    val b = right.eval(input)
    if (w == null || b == null) return null
    GraftHash.simhash(w.asInstanceOf[ArrayData], b.asInstanceOf[Int])
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
