package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Edge-case probe for the vector expression path (scratch main). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.functions.VectorFunctions._

    // mismatched lengths, nulls inside arrays, empty arrays
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),   // 32
      (2L, Array(1.0f, 2.0f), Array(4.0f, 5.0f, 6.0f)),          // 14 (shorter wins)
      (3L, Array.empty[Float], Array(1.0f))                       // 0
    ).toDF("id", "a", "b")
    df.select(col("id"), vecDot(col("a"), col("b")).as("dot")).show()

    val withNull = Seq((4L, Array[java.lang.Float](1.0f, null, 3.0f),
      Array[java.lang.Float](1.0f, 1.0f, 1.0f))).toDF("id", "a", "b")
    withNull.select(col("id"), vecDot(col("a"), col("b")).as("dot")).show()

    // null array → expression is null-safe → null out
    val nullArr = Seq((5L, Option.empty[Array[Float]], Some(Array(1.0f))))
      .toDF("id", "a", "b")
    nullArr.select(col("id"), vecDot(col("a"), col("b")).as("dot")).show()

    // wrong type must fail analysis, not crash at runtime
    try {
      Seq((1L, Array(1.0, 2.0), Array(1.0, 2.0))).toDF("id", "a", "b")
        .select(vecDot(col("a"), col("b"))).collect()
      println("PROBE-FAIL: double arrays accepted")
    } catch {
      case e: Exception => println("typecheck rejects double arrays: " +
        e.getMessage.linesIterator.next())
    }

    // confirm codegen engages (no fallback warnings): big-ish compute
    val n = 20000
    val vecs = spark.range(n).select(col("id"),
      expr("transform(sequence(0, 63), j -> cast(rand(42) as float))").as("v"))
    val t0 = System.nanoTime()
    val s = vecs.select(sum(vecDot(col("v"), col("v")))).head.getDouble(0)
    println(f"codegen path: $n self-dots in ${(System.nanoTime() - t0) / 1e6}%.0f ms (sum=$s%.1f)")
    spark.stop()
  }
}
