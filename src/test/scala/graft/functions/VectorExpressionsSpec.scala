package graft.functions

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.Tables.embeddings(spark, sf)

  test("native cosine is bit-identical to the HOF formulation") {
    val q = emb.where($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0)
    val both = emb.select(
      $"vec_id",
      VectorFunctions.cosineF32($"embedding", typedLit(q)).as("native"),
      Similarity.cosine(Similarity.toDoubleVec($"embedding"),
        typedLit(q.map(_.toDouble))).as("hof"))
    assert(both.where($"native" =!= $"hof").count() == 0)
  }

  test("native l2 norm is bit-identical to the HOF formulation") {
    val both = emb.select(
      VectorFunctions.l2NormF32($"embedding").as("native"),
      Similarity.l2Norm(Similarity.toDoubleVec($"embedding")).as("hof"))
    assert(both.where($"native" =!= $"hof").count() == 0)
  }

  test("dot product: known values, null propagation") {
    val df = Seq(
      (1L, Some(Array(1.0f, 2.0f, 3.0f)), Some(Array(4.0f, 5.0f, 6.0f))),
      (2L, None: Option[Array[Float]], Some(Array(1.0f)))).toDF("id", "a", "b")
    val got = df.select($"id", VectorFunctions.dotF32($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).contains(32.0))
    assert(got(2L).isEmpty)
  }

  test("native hyperplane bucket is bit-identical to the HOF formulation") {
    val both = emb.select(
      $"vec_id",
      VectorFunctions.hyperplaneBucketF32($"embedding", planes = 12, dim = 64).as("native"),
      Similarity.hyperplaneBucket(
        Similarity.toDoubleVec($"embedding"), planes = 12, dim = 64).as("hof"))
    assert(both.where($"native" =!= $"hof").count() == 0)
  }

  test("SQL registration: cosine_f32 usable from spark.sql") {
    VectorFunctions.register(spark)
    graft.Tables.embeddings(spark, sf).createOrReplaceTempView("emb_v")
    val n = spark.sql(
      """SELECT vec_id, cosine_f32(embedding, embedding) AS self_sim FROM emb_v""")
      .where(abs(col("self_sim") - 1.0) > 1e-9).count()
    assert(n == 0)
  }

  test("SQL registration: hyperplane_bucket_f32 matches the Column API") {
    VectorFunctions.register(spark)
    graft.Tables.embeddings(spark, sf).createOrReplaceTempView("emb_v2")
    val viaSql = spark.sql(
      "SELECT vec_id, hyperplane_bucket_f32(embedding, 12, 64) AS b FROM emb_v2")
    val viaApi = graft.Tables.embeddings(spark, sf).select(
      $"vec_id", VectorFunctions.hyperplaneBucketF32($"embedding", 12, 64).as("b2"))
    assert(viaSql.join(viaApi, "vec_id").where($"b" =!= $"b2").count() == 0)
    // non-literal geometry argument is rejected with a clear error
    val e = intercept[Exception] {
      spark.sql("SELECT hyperplane_bucket_f32(embedding, vec_id + 1, 64) FROM emb_v2")
        .collect()
    }
    assert(e.getMessage.contains("planes"))
  }

  test("type check rejects non-float arrays") {
    val bad = Seq((1L, Array(1.0, 2.0))).toDF("id", "v")
    val e = intercept[Exception] {
      bad.select(VectorFunctions.l2NormF32($"v")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("l2_norm_f32") ||
      e.getMessage.toLowerCase.contains("datatype_mismatch"))
  }
}
