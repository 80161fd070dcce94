package org.apache.spark.graftshim

import org.apache.spark.SparkEnv

/** `DiskBlockManager.localDirs` is `private[spark]`; this package-located
  * shim re-exposes THIS JVM's Spark scratch roots (blockmgr dirs holding
  * shuffle files + localCheckpoint disk blocks) so the bench telemetry
  * can measure the footprint it actually owns — globbing java.io.tmpdir
  * for blockmgr-&#42;/spark-&#42; patterns picks up every CONCURRENT
  * Spark process on the host and contaminates the per-query disk ledger
  * (review r16). Empty when no SparkEnv is live. */
object SparkEnvShim {
  def localDirs: Seq[java.io.File] = {
    val env = SparkEnv.get
    if (env == null) Seq.empty
    else env.blockManager.diskBlockManager.localDirs.toSeq
  }
}
