package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing (SURVEY.md §2.4 extension): classify every
  * document across two corpus versions as added / removed / changed / same
  * by comparing content fingerprints — the operator behind incremental
  * ingestion ("process only what changed since the last crawl") and
  * re-curation budgeting.
  *
  * One hash-partitioned full-outer join on the id — a single shuffle of
  * (id, fingerprint) pairs, never of document payloads, so the diff of a
  * 100 TB corpus moves only ~50 bytes per document. Status is computed
  * null-safely from join-side presence; output is never null. */
object SnapshotDiff {

  /** (idCol, status) for the union of both snapshots' ids, where the
    * frames carry (idCol, fpCol) content fingerprints (e.g. md5 of text).
    *
    * Presence comes from explicit per-side markers, NOT fingerprint
    * nullness — a null fingerprint (null text) is a legitimate value, and
    * inferring presence from it would misclassify such rows (old-only with
    * null fp would read as "added"); fingerprints compare null-safely, so
    * null-vs-value is "changed" and null-vs-null is "same". Ids are
    * assumed unique per snapshot (a duplicated id multiplies through the
    * full-outer join into conflicting status rows — dedupe upstream, e.g.
    * [[Dedup.exactDedup]]). */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
           fpCol: String): DataFrame =
    oldSnap.select(col(idCol).as("__id"), col(fpCol).as("__fp_old"),
        lit(true).as("__in_old"))
      .join(newSnap.select(col(idCol).as("__id"), col(fpCol).as("__fp_new"),
        lit(true).as("__in_new")), Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(!(col("__fp_old") <=> col("__fp_new")), "changed")
          .otherwise("same").as("status"))

  /** Only the rows requiring action (added/removed/changed). */
  def changes(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
              fpCol: String): DataFrame =
    diff(oldSnap, newSnap, idCol, fpCol).filter(col("status") =!= "same")
}
