package graft

import org.apache.spark.sql.execution.ExplainMode

/** Plan-audit main: prints a one-line shuffle/join summary (and with
  * `-v` the full formatted plan) for each named query — or all of them.
  * Usage: `runMain graft.Explain [sfDir] [queryName ...] [-v]`.
  * This is the iterate-on-the-plan feedback loop: after a query goes
  * oracle-green, its plan gets audited here before it counts as done.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val verbose = args.contains("-v")
    val rest = args.filterNot(_ == "-v")
    val dir = rest.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (rest.length > 1) rest.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local(8, "graft-explain").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, dir)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      val nEx = "Exchange".r.findAllIn(plan).size
      val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)"
        .r.findAllIn(plan).toSeq.groupBy(identity).map { case (k, v) => s"$k×${v.size}" }
      val scans = "Scan parquet".r.findAllIn(plan).size
      println(s"$n: exchanges=$nEx scans=$scans joins=${joins.mkString(",")}")
      if (verbose) println(plan)
    }
    spark.stop()
  }
}
