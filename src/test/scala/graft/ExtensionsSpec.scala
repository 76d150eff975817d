package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

/** SQL-surface registration of graft's custom expressions. */
class ExtensionsSpec extends SparkTestBase {

  test("graft_dot callable from SQL after registration") {
    // same builder triple the SparkSessionExtensions path injects
    val (ident, info, builder) = GraftExtensions.graftDot
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb")
    val r = spark.sql(
      """SELECT a.vec_id, graft_dot(a.embedding, b.embedding) AS dot
        |FROM emb a JOIN emb b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 5 ORDER BY a.vec_id""".stripMargin).collect()
    assert(r.length == 5)
    // cross-check against the Column API on one row
    val direct = spark.table("emb").as("a")
      .join(spark.table("emb").as("b"), col("b.vec_id") === col("a.vec_id") + 1)
      .filter(col("a.vec_id") === 0)
      .select(graft.functions.VectorFunctions.dot(col("a.embedding"), col("b.embedding")))
      .collect()(0).getDouble(0)
    assert(r(0).getDouble(1) == direct)
  }

  test("GraftExtensions wires into SparkSessionExtensions") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext) // must register without throwing
  }
}
