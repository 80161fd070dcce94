package graft

import graft.queries.{Extensions, Parity}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full registered surface: the t2 parity set (SURVEY §2.3
  * Q1–Q22) plus the extension operators (§2.4 E1–E5). Every entry with a
  * DuckDB-expressible oracle also appears in `oracleSql` with matching
  * column names; approximate operators are rows-only by design.
  */
object SparkEntry {

  private val registry: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = {
    val r = Parity.all ++ Extensions.all
    val dups = r.groupBy(_._1).collect { case (n, xs) if xs.size > 1 => n }
    require(dups.isEmpty,
      s"duplicate query names would silently drop from the driver map: $dups")
    r
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val (_, fn, _) = registry.find(_._1 == "q13_join_agg").get
    fn(spark, "/root/testdata/sf0.001")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (n, fn, _) => n -> fn }.toMap

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for approximate (rows-only) ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
