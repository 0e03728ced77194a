package graft.core

import org.apache.spark.SparkContext
import org.apache.spark.sql.DataFrame
import org.apache.hadoop.fs.Path

/** Lineage-truncation hygiene shared by the iterative operators
  * (`Dedup.connectedComponents`, `Scd.scd2FoldSnapshots`): RELIABLE
  * `checkpoint()` when the session has a checkpoint dir (survives
  * executor loss — required for long iterations on a cluster),
  * `localCheckpoint` otherwise; plus the PeriodicCheckpointer-style
  * cleanup — reliable checkpoints write a full dataset copy each, and
  * Spark only reclaims them GC-driven with cleanCheckpoints=true, so
  * once step N is materialized, step N-1's files back nothing and must
  * be deleted by the operator itself or every call leaks one copy per
  * iteration into the shared dir.
  */
private[graft] object Checkpoints {

  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()

  /** The reliable-checkpoint path backing `df`, if any (None under
    * localCheckpoint — block storage needs no manual delete).
    */
  def pathOf(df: DataFrame): Option[Path] =
    if (df.sparkSession.sparkContext.getCheckpointDir.isEmpty) None
    else df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.flatMap(_.getCheckpointFile).map(new Path(_))

  /** Best-effort delete of a superseded checkpoint — a missed delete is
    * a leak, not a fault.
    */
  def delete(sc: SparkContext, p: Option[Path]): Unit =
    p.foreach { path =>
      try { path.getFileSystem(sc.hadoopConfiguration).delete(path, true); () }
      catch { case _: java.io.IOException => () }
    }
}
