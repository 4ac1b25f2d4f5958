package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + semantic checks across the whole queries() registry. */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every registered query executes and returns a schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, TestSpark.sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("approx distinct within 5% of exact") {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.lineitem(spark, TestSpark.sf)
    val exact = li.agg(countDistinct(col("l_partkey"))).head.getLong(0)
    val approx = li.agg(approx_count_distinct(col("l_partkey"))).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }
}
