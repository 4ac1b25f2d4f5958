package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.BoundedRangeJoinRewrite

/** The optimizer rule that turns a bounded time-range theta-join into
  * a 2-bucket equi-join: same rows out, hash join instead of a
  * nested-loop join. */
class RangeJoinRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def events() = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 3000).map { i =>
      (i.toLong, s"u${rnd.nextInt(20)}", rnd.nextLong(100000L))
    }.toDF("event_id", "user_id", "us")
  }

  test("rewrites the range theta-join to a hash join with identical rows") {
    import org.apache.spark.sql.functions._
    val W = 500L
    val l = events().select(col("user_id").as("lk"), col("us").as("lts"),
      col("event_id").as("lid"))
    val r = events().select(col("user_id").as("rk"), col("us").as("rts"),
      col("event_id").as("rid"))
    def q = l.join(r,
      col("lk") === col("rk") &&
        col("rts") >= col("lts") - W && col("rts") < col("lts"))
      .select(col("lid"), col("rid"))

    // baseline without the rule
    val naive = q.collect().map(x => (x.getLong(0), x.getLong(1))).toSet

    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ BoundedRangeJoinRewrite
    try {
      val rewritten = q
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"range join not rewritten:\n${plan.take(2000)}")
      assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
        plan.take(2000))
      val got = rewritten.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got == naive,
        s"missing=${(naive -- got).take(5)} extra=${(got -- naive).take(5)}")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("leaves non-matching joins untouched") {
    import org.apache.spark.sql.functions._
    val l = events().select(col("user_id").as("lk"), col("us").as("lts"))
    val r = events().select(col("user_id").as("rk"), col("us").as("rts"))
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ BoundedRangeJoinRewrite
    try {
      // plain equi-join: no range pattern, rule must not fire
      val p = l.join(r, col("lk") === col("rk"))
        .queryExecution.optimizedPlan.toString
      assert(!p.contains("__graft_range_bucket"), p.take(1500))
    } finally spark.experimental.extraOptimizations = prev
  }
}
