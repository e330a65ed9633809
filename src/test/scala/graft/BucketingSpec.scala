package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketed co-located join: the pre-shuffle strategy for repeated
  * big-big joins at warehouse scale (SURVEY "Partitioning & shuffle").
  * Both sides bucketed+sorted on the join key at write time -> the
  * join plans with ZERO exchanges. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  test("bucketed tables join without any exchange") {
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt")
    spark.sql("DROP TABLE IF EXISTS bkt.orders_b")
    spark.sql("DROP TABLE IF EXISTS bkt.lineitem_b")
    graft.sources.Tables.load(spark, dir, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("bkt.orders_b")
    graft.sources.Tables.load(spark, dir, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("bkt.lineitem_b")
    // disable broadcast so the join must pick a shuffle-or-colocated plan
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("bkt.lineitem_b")
        .join(spark.table("bkt.orders_b"),
              col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
             !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join still shuffled:\n$plan")
      // correctness: equals the plain join
      val expected = graft.sources.Tables.load(spark, dir, "lineitem")
        .join(graft.sources.Tables.load(spark, dir, "orders"),
              col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val got = j.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
