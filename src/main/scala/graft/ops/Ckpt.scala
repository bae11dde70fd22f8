package graft.ops

import org.apache.spark.sql.DataFrame

/** Checkpoint wrapper that makes pre-checkpoint lineages PINNABLE.
  *
  * `localCheckpoint()` truncates lineage, so a plan property proven
  * about a FINAL plan (PlanSpec's global-window budget) is blind to the
  * plan that actually RAN at checkpoint time — the round-11 q166
  * failure mode hid exactly there: its bounded bin-index window
  * executes when the frame is checkpointed and the final plan shows
  * only `Scan ExistingRDD`. Every main-path checkpoint therefore goes
  * through `ckpt()`, which — only while a test has switched recording
  * on — snapshots the executedPlan of the frame being checkpointed, so
  * PlanSpec can run the same boundedness asserts on checkpoint-time
  * lineage, board-wide. When not recording the cost is one volatile
  * read per checkpoint.
  */
object Ckpt {
  @volatile private var rec: Option[java.util.concurrent.ConcurrentLinkedQueue[String]] =
    None

  /** Test hook: start capturing pre-checkpoint executed plans. */
  def startRecording(): Unit =
    rec = Some(new java.util.concurrent.ConcurrentLinkedQueue[String]())

  /** Test hook: stop capturing and return everything recorded since start. */
  def stopRecording(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val out = rec.map(_.asScala.toSeq).getOrElse(Nil)
    rec = None
    out
  }

  implicit final class RichCkpt(private val df: DataFrame) extends AnyVal {

    /** `localCheckpoint()` with a pinnable lineage (see object scaladoc). */
    def ckpt(): DataFrame = {
      rec.foreach(_.add(df.queryExecution.executedPlan.toString))
      df.localCheckpoint()
    }
  }
}
