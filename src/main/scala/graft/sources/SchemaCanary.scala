package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Testdata-schema drift canary.
  *
  * The driver regenerates the testdata between rounds and has already
  * changed a physical type under the engine once (`events.ts`
  * TIMESTAMP(NANOS) → TIMESTAMP(micros)), which silently broke every
  * ts-arithmetic query until the next full gate run. This canary makes
  * that failure mode loud and immediate: Verify and Bench call
  * [[warnOnDrift]] at startup, which prints ONE line per drifted
  * column/table naming exactly what moved.
  *
  * The expectations are the POST-`Tables.load` engine contract, not
  * the raw parquet footer — e.g. `events.ts` must be LongType epoch-ns
  * AFTER normalization whatever the physical encoding was. Temporal
  * columns accept any of date/timestamp/timestamp_ntz (the engine
  * compares them against temporal literals, so those flips are
  * non-breaking); everything else is pinned to its exact Spark type.
  */
object SchemaCanary {
  private val Temporal = Set("date", "timestamp", "timestamp_ntz")

  /** colName -> acceptable `DataType.simpleString` values, in the
    * expected column order. */
  private val expected: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq(
      "n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq(
      "c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq(
      "s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq(
      "p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq(
      "o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> Temporal, "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq(
      "l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> Temporal),
    "events" -> Seq(
      "event_id" -> Set("bigint"),
      // the one column with a normalization contract: whatever the
      // parquet encoding, Tables.load must surface epoch-ns LongType
      "ts" -> Set("bigint"),
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq(
      "doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq(
      "vec_id" -> Set("bigint"), "embedding" -> Set("array<float>"),
      "label" -> Set("int")))

  /** Drift lines for one table's loaded schema (unit-testable). */
  private[graft] def diff(table: String, actual: StructType): Seq[String] = {
    val exp = expected(table)
    val actualByName = actual.fields.map(f => f.name -> f).toMap
    val missing = exp.collect {
      case (n, _) if !actualByName.contains(n) =>
        s"$table.$n MISSING (expected ${exp.map(_._1).mkString(",")}; " +
          s"got ${actual.fieldNames.mkString(",")})"
    }
    val extra = actual.fieldNames.filterNot(exp.map(_._1).toSet).map(n =>
      s"$table.$n UNEXPECTED new column (${actualByName(n).dataType.simpleString})")
    val changed = exp.collect {
      case (n, ok) if actualByName.contains(n) &&
          !ok.contains(actualByName(n).dataType.simpleString) =>
        s"$table.$n is ${actualByName(n).dataType.simpleString}, engine " +
          s"contract expects ${ok.mkString("|")}"
    }
    missing ++ extra ++ changed
  }

  /** All drift lines across the ten tables as loaded by Tables. */
  def drift(spark: SparkSession, dir: String): Seq[String] =
    Tables.all.flatMap { t =>
      try diff(t, Tables.load(spark, dir, t).schema)
      catch { case e: Throwable =>
        Seq(s"$t UNREADABLE: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }

  /** Startup preamble for Verify/Bench: one loud stderr line per
    * drift (stderr so Bench's single-JSON-line stdout contract is
    * untouched). Never throws — a drifted table must not stop the
    * gate from measuring the untouched ones. */
  def warnOnDrift(spark: SparkSession, dir: String): Unit = {
    val d = drift(spark, dir)
    if (d.isEmpty)
      System.err.println(s"[canary] testdata schemas at $dir match the engine contract")
    else d.foreach(l => System.err.println(s"[canary] SCHEMA DRIFT: $l"))
  }
}
