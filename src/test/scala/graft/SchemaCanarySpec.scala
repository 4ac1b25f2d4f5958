package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SchemaCanary

/** The testdata-schema canary: round 11 lost 28 green entries to a
  * silent events.ts TIMESTAMP(NANOS)→TIMESTAMP(micros) regeneration;
  * this spec pins (a) the live testdata matching the engine contract
  * via Tables' normalization and (b) the canary actually firing on
  * the drift shapes that bit. */
class SchemaCanarySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("live testdata loads drift-free through Tables at the spec SF") {
    val d = SchemaCanary.drift(spark, TestSpark.sf)
    assert(d.isEmpty, s"schema drift against engine contract:\n${d.mkString("\n")}")
  }

  test("a type flip on events.ts is named loudly") {
    // the EXACT r11 failure shape: ts surfacing as a timestamp instead
    // of the normalized epoch-ns long
    val drifted = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val d = SchemaCanary.diff("events", drifted)
    assert(d.size == 1 && d.head.contains("events.ts") &&
      d.head.contains("timestamp_ntz") && d.head.contains("bigint"), d)
  }

  test("missing, renamed, and added columns are all reported") {
    val drifted = StructType(Seq(
      StructField("doc_id", LongType), StructField("body", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType), StructField("mime", StringType)))
    val d = SchemaCanary.diff("documents", drifted)
    assert(d.exists(_.contains("documents.text MISSING")), d)
    assert(d.exists(_.contains("documents.body UNEXPECTED")), d)
    assert(d.exists(_.contains("documents.mime UNEXPECTED")), d)
  }

  test("tolerated temporal flips stay quiet") {
    // date vs timestamp vs timestamp_ntz on orders/lineitem dates is
    // non-breaking (temporal-literal comparisons); the canary must not
    // cry wolf on those
    val date = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", DateType),
      StructField("o_orderpriority", StringType)))
    assert(SchemaCanary.diff("orders", date).isEmpty)
  }
}
