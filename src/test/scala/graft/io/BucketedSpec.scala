package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, TestSpark}

/** The scale claim behind [[Bucketed]], asserted on the physical plan: a
  * fact-fact join of two tables bucketed on the join key with equal bucket
  * counts runs with ZERO shuffle exchanges — versus two for plain parquet.
  */
class BucketedSpec extends SparkSpec {

  test("co-bucketed fact-fact join plans with zero shuffle exchanges") {
    val dir = Files.createTempDirectory("bucketed")
    val orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
    val lineitem = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
    Bucketed.writeBucketed(orders, "b_orders", s"$dir/orders",
      bucketCols = Seq("o_orderkey"), nBuckets = 4)
    Bucketed.writeBucketed(lineitem, "b_lineitem", s"$dir/lineitem",
      bucketCols = Seq("l_orderkey"), nBuckets = 4)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.readBucketed(spark, "b_lineitem")
        .join(Bucketed.readBucketed(spark, "b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"))

      // no Exchange on EITHER join key anywhere in the plan: both sides are
      // pre-hashed at write time (plan children print below the join node,
      // so the check must be whole-plan, not a prefix slice)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not shuffle its inputs:\n$plan")

      // same result as the plain-parquet join
      val expected = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val actual = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(actual == expected)

      // and the plain join DOES shuffle both sides (the thing bucketing buys)
      val plainPlan = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
        .queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange hashpartitioning(l_orderkey") &&
        plainPlan.contains("Exchange hashpartitioning(o_orderkey"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("writeBucketed validates inputs") {
    val df = spark.range(1).toDF("id")
    intercept[IllegalArgumentException] {
      Bucketed.writeBucketed(df, "t", "/tmp/x", Seq.empty, 4)
    }
    intercept[IllegalArgumentException] {
      Bucketed.writeBucketed(df, "t", "/tmp/x", Seq("id"), 0)
    }
  }
}
