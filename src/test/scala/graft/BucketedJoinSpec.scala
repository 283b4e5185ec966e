package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The co-located join path for repeated fact-fact joins at scale:
  * bucket both tables on the join key at write time, and the join plans
  * with NO exchange on either side — the 100 TB recipe for the
  * orders⋈lineitem style joins in this engine (SURVEY.md §4).
  */
class BucketedJoinSpec extends AnyFunSuite with SparkSpec {

  test("matching bucketed tables join without a shuffle") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS g_orders_b")
    spark.sql("DROP TABLE IF EXISTS g_lineitem_b")
    // the in-memory catalog forgets tables across JVMs but their
    // warehouse dirs persist — remove orphans or saveAsTable refuses
    Seq("g_orders_b", "g_lineitem_b").foreach { t =>
      val p = java.nio.file.Paths.get(s"/tmp/graft-test-warehouse/$t")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("g_orders_b")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("g_lineitem_b")

    val joined = spark.table("g_lineitem_b")
      .join(spark.table("g_orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").count()
    // disable broadcast so the join must pick a key-partitioned strategy
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join still shuffles:\n$plan")
      // sanity: result matches the unbucketed join
      val expect = spark.read.parquet(s"$dir/lineitem.parquet")
        .join(spark.read.parquet(s"$dir/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expect)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
