package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.functions.GraftFunctions

/** The native codegen'd CosineSimilarity expression must agree exactly with
  * the composed zip_with/aggregate formulation, handle degenerate inputs,
  * and be callable from SQL. */
class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native expression equals composed cosine on the embeddings fixture") {
    GraftFunctions.register(spark)
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") === 1).select("embedding").first().getSeq[Float](0)
    val qArr = q.map(v => s"${v}F").mkString("array(", ", ", ")")
    val both = emb.select(
      col("vec_id"),
      expr(s"cosine_sim(embedding, cast($qArr as array<float>))").as("native"),
      Similarity.cosine(col("embedding"),
        array(q.map(v => lit(v.toDouble)): _*)).as("composed"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"vec ${r.getLong(0)}: native ${r.getDouble(1)} != composed ${r.getDouble(2)}")
    }
  }

  test("zero-norm and empty arrays yield NULL; nulls propagate") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Seq(0.0f, 0.0f), Seq(1.0f, 2.0f)),
      (2L, Seq.empty[Float], Seq(1.0f, 2.0f)),
      (3L, Seq(1.0f, 0.0f), Seq(1.0f, 0.0f))
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), expr("cosine_sim(a, b)").as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got(1L).isEmpty)  // zero norm
    assert(got(2L).isEmpty)  // empty → zero norm
    assert(got(3L).contains(1.0))
    val withNull = spark.sql("SELECT cosine_sim(cast(null as array<float>), array(cast(1.0 as float)))")
    assert(withNull.first().isNullAt(0))
  }

  test("native simhash64 is bit-identical to the HOF composition") {
    GraftFunctions.register(spark)
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val both = docs.select(
      col("doc_id"),
      expr("simhash64(split(text, '\\\\s+'))").as("native"),
      graft.ext.TextAnalysis.simhash64(col("text")).as("hof"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"doc ${r.getLong(0)}: native ${r.getLong(1)} != hof ${r.getLong(2)}")
    }
    // degenerate inputs
    val edge = spark.sql(
      "SELECT simhash64(cast(array() as array<string>)), simhash64(array(cast(null as string))), " +
      "simhash64(cast(null as array<string>))").first()
    assert(!edge.isNullAt(0))  // empty array → all votes 0 → hash 0
    assert(edge.getLong(0) == 0L)
    assert(!edge.isNullAt(1))  // null token hashes like xxhash64(null)
    assert(edge.isNullAt(2))   // null array → null
  }

  test("usable from plain SQL with full codegen") {
    GraftFunctions.register(spark)
    graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("emb_v")
    val top = spark.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS c
        |FROM emb_v a JOIN emb_v b ON b.vec_id = 0
        |ORDER BY c DESC, a.vec_id LIMIT 3""".stripMargin).collect()
    assert(top.head.getLong(0) == 0L && math.abs(top.head.getDouble(1) - 1.0) < 1e-12)
  }
}
