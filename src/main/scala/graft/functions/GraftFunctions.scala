package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of the engine's native expressions as SQL functions.
  *
  * Two entry points, same function set:
  *   - `GraftExtensions` for `spark.sql.extensions=graft.functions.GraftExtensions`
  *     (the SparkSessionExtensions path — cluster deployments);
  *   - `GraftFunctions.register(spark)` for sessions the engine doesn't
  *     build itself (the driver harness creates the SparkSession, so every
  *     query entry registers idempotently before building its plan).
  */
object GraftFunctions {

  type Builder = Seq[Expression] => Expression

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (
      FunctionIdentifier("graft_ema"),
      new ExpressionInfo(classOf[EmaFold].getName, "graft_ema"),
      (es: Seq[Expression]) => EmaFold(es(0), es(1))
    ),
    (
      FunctionIdentifier("graft_autocorr1"),
      new ExpressionInfo(classOf[AutocorrLag1].getName, "graft_autocorr1"),
      (es: Seq[Expression]) => AutocorrLag1(es(0), es(1))
    ),
    (
      FunctionIdentifier("graft_dotf"),
      new ExpressionInfo(classOf[DotF].getName, "graft_dotf"),
      (es: Seq[Expression]) => DotF(es(0), es(1))
    ),
    (
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[ShingleMinHash].getName, "graft_minhash"),
      (es: Seq[Expression]) => ShingleMinHash(es(0), es(1), es(2))
    ),
    (
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash].getName, "graft_simhash"),
      (es: Seq[Expression]) => SimHash(es(0), es(1))
    ),
    (
      FunctionIdentifier("graft_jaccard"),
      new ExpressionInfo(classOf[JaccardShingles].getName, "graft_jaccard"),
      (es: Seq[Expression]) => JaccardShingles(es(0), es(1), es(2))
    ),
    (
      FunctionIdentifier("graft_ema_run"),
      new ExpressionInfo(classOf[EmaRunning].getName, "graft_ema_run"),
      (es: Seq[Expression]) => EmaRunning(es(0), es(1))
    ),
    (
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "graft_shingles"),
      (es: Seq[Expression]) => Shingles(es(0), es(1))
    ),
    (
      FunctionIdentifier("graft_embed"),
      new ExpressionInfo(classOf[HashedNgramEmbed].getName, "graft_embed"),
      (es: Seq[Expression]) => HashedNgramEmbed(es(0), es(1))
    )
  )

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (id, info, builder) =>
      if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
    }
  }
}

/** SparkSessionExtensions injector: `--conf
  * spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
}
