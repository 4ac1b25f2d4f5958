package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL registration path: sketch/vector expressions callable from
  * spark.sql (temp registration on the shared session; the
  * SparkSessionExtensions class wires the same functions at session
  * build time on a cluster). */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sketch functions are callable from SQL") {
    GraftExtensions.registerTemp(spark)
    val row = spark.sql(
      """SELECT
        |  simhash64(array('hello', 'world')) AS sim,
        |  size(minhash64(array('a b c', 'b c d'), 16)) AS n_sig,
        |  size(winnow('some text to fingerprint here', 8, 4)) AS n_fp,
        |  winnow_select(array(9L, 3L, 7L, 5L, 1L), 3) AS ws,
        |  jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
        |  vec_dot(array(cast(1.0 as float), cast(2.0 as float)),
        |          array(cast(3.0 as float), cast(4.0 as float))) AS dot
        |""".stripMargin).head()
    assert(row.getAs[Long]("sim") != 0L)
    assert(row.getAs[Int]("n_sig") == 16)
    assert(row.getAs[Int]("n_fp") > 0)
    // windows of 3 over [9,3,7,5,1]: mins 3, 3, 1 → distinct ascending
    assert(row.getSeq[Long](row.fieldIndex("ws")) == Seq(1L, 3L))
    assert(math.abs(row.getAs[Double]("j") - 0.5) < 1e-12)
    assert(math.abs(row.getAs[Double]("dot") - 11.0) < 1e-12)
  }

  test("round-4 functions are callable from SQL") {
    GraftExtensions.registerTemp(spark)
    // block_top_k: 2-vector corpus block, 1-query block, k=1 →
    // the query's nearest non-self neighbor
    val tk = spark.sql(
      """SELECT explode(block_top_k(
        |  array(named_struct('id', 1L, 'v', array(cast(1.0 as float), cast(0.0 as float)), 'nrm', cast(1.0 as double)),
        |        named_struct('id', 2L, 'v', array(cast(0.0 as float), cast(1.0 as float)), 'nrm', cast(1.0 as double))),
        |  array(named_struct('id', 1L, 'v', array(cast(1.0 as float), cast(0.0 as float)), 'nrm', cast(1.0 as double))),
        |  1)) AS p""".stripMargin).select("p.*").head()
    assert(tk.getAs[Long]("query_id") == 1L && tk.getAs[Long]("neighbor_id") == 2L)

    // hamming_pairs: generator over a 3-member bucket, maxDist 1
    val hp = spark.sql(
      """SELECT hamming_pairs(array(
        |  named_struct('id', 10L, 'sim', 8L),
        |  named_struct('id', 11L, 'sim', 9L),
        |  named_struct('id', 12L, 'sim', 1024L)), 1)""".stripMargin).collect()
    assert(hp.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
      r.getAs[Int]("hamming"))).toSet == Set((10L, 11L, 1)))
  }

  test("round-2 functions are callable from SQL") {
    GraftExtensions.registerTemp(spark)
    val row = spark.sql(
      """SELECT
        |  size(word_shingles(array('a', 'b', 'c', 'd'), 3)) AS n_sh,
        |  marker_counts('the cat and the dog', ' the ', ' cat ') AS mc,
        |  text_stats('hello  world the end').n_words AS nw,
        |  text_stats('hello  world the end').stop_n AS st,
        |  size(block_cos_pairs(
        |    array(struct(1L AS id, array(cast(1.0 as float)) AS v, cast(1.0 as double) AS nrm)),
        |    array(struct(2L AS id, array(cast(1.0 as float)) AS v, cast(1.0 as double) AS nrm)),
        |    false, 0.5)) AS n_pairs
        |""".stripMargin).head()
    assert(row.getAs[Int]("n_sh") == 2)
    assert(row.getAs[scala.collection.Seq[Int]]("mc") == Seq(2, 1))
    assert(row.getAs[Int]("nw") == 4)
    assert(row.getAs[Int]("st") == 1)
    assert(row.getAs[Int]("n_pairs") == 1)
  }

  test("round-9 kernels are callable from SQL") {
    GraftExtensions.registerTemp(spark)
    val row = spark.sql(
      """SELECT
        |  size(word_grams(array('a', 'b', 'c', 'd'), 3)) AS n_g,
        |  md5_simhash60(array('hello', 'world')) AS sim,
        |  size(md5_minhash30(array('a b c', 'b c d'), 16)) AS n_mh,
        |  quantize_int8f(array(cast(0.5 as float), cast(-1.0 as float))) AS q,
        |  md5_plane_sig(array(cast(3.0 as float), cast(-2.0 as float)), 4, 2) AS ps
        |""".stripMargin).head()
    // 4 tokens → 2 positional 3-grams (with multiplicity, ordered)
    assert(row.getAs[Int]("n_g") == 2)
    assert(row.getAs[Long]("sim") != 0L)
    assert(row.getAs[Int]("n_mh") == 16)
    // max |v| = 1.0 → scale 1/127: 0.5 → 64 (floor(63.5+0.5)), -1.0 → -127
    assert(row.getSeq[Float](row.fieldIndex("q")) == Seq(64.0f, -127.0f))
    // 4-bit signature over the md5 plane matrix — deterministic
    val expected = (0 until 4).map { p =>
      val s = 3.0 * graft.operators.Similarity.md5Hyperplane(p, 0) +
        -2.0 * graft.operators.Similarity.md5Hyperplane(p, 1)
      if (s >= 0) 1L << p else 0L
    }.sum
    assert(row.getAs[Long]("ps") == expected)
  }

  test("SQL simhash agrees with the operator API") {
    import org.apache.spark.sql.functions._
    GraftExtensions.registerTemp(spark)
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf).limit(50)
    docs.createOrReplaceTempView("docs_ext")
    val viaSql = spark.sql(
      "SELECT doc_id, simhash64(split(lower(trim(text)), '\\\\s+')) AS s FROM docs_ext")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaApi = docs.select(col("doc_id"),
      graft.operators.Dedup.simhash(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaApi)
  }
}
