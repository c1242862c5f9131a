package graft

import graft.functions.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfSkewSpec extends AnyFunSuite {
  import SparkTestSession._

  test("asof join: every event matched to the latest order at-or-before its time") {
    val df = ops.AsOf.eventOrderAsof(spark, sfDir).cache()
    val events = Tables.events(spark, sfDir)
    assert(df.count() == events.count()) // left join: one row per event
    // spot-verify the invariant on a sample: matched order date <= event ts
    val joined = df.join(events.select(col("event_id"), col("ts")), Seq("event_id"))
      .filter(col("ord_date").isNotNull)
    assert(joined.filter(col("ord_date") > col("ts").cast("date")).count() == 0)
    // and no LATER order at-or-before ts exists for the same user
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("od"))
    val better = joined.join(orders,
        joined("user_id") === orders("o_custkey") &&
        orders("od") <= joined("ts").cast("date") &&
        orders("od") > joined("ord_date"))
    assert(better.count() == 0, "found an order newer than the as-of match")
  }

  test("asof join: NULL payload fields survive; null keys never match") {
    import spark.implicits._
    // build with genuine nulls via DataFrame API
    val l = Seq(("a", 1L, 10L), ("b", 2L, 10L)).toDF("lid", "lt", "lk")
      .unionByName(Seq(("c", 3L)).toDF("lid", "lt").withColumn("lk", lit(null).cast("long")))
    val r = Seq(("x1", 1L, 10L), (null, 2L, 10L)).toDF("pay", "rt", "rk")
      .unionByName(Seq(("phantom", 1L)).toDF("pay", "rt").withColumn("rk", lit(null).cast("long")))
    val out = ops.AsOf.asofJoin(l, r, "lk", "rk", "lt", "rt", Seq("pay"))
      .collect().map(row => row.getAs[String]("lid") -> row.getAs[String]("pay")).toMap
    // lid=b at t=2 matches the t=2 right row whose pay IS NULL — the
    // stale t=1 value must not leak through
    assert(out("b") == null, s"stale payload leaked: ${out("b")}")
    assert(out("a") == "x1")
    // null-keyed left row must not match the null-keyed right row
    assert(out("c") == null, s"null keys matched: ${out("c")}")
  }

  test("salted join is row-identical to the plain join") {
    val orders = Tables.orders(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)
    val plain = orders.join(customer, orders("o_custkey") === customer("c_custkey"))
      .select(col("o_orderkey"), col("c_name"))
    val salted = Skew.saltedJoin(orders, customer, "o_custkey", "c_custkey", 8)
      .select(col("o_orderkey"), col("c_name"))
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }
}
