package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  private def sets: Seq[QuerySet] = Seq(Relational, VcfQueries, LlmQueries)

  private lazy val allQ: Seq[Q] = sets.flatMap(_.all)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.all.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQ.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQ.collect { case Q(n, _, Some(sql)) => n -> sql.trim }.toMap
}
