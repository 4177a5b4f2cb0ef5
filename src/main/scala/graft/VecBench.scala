package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.ops.Similarity

/** Microbenchmark: native codegen'd cosine kernel vs the higher-order-
  * function formulation, on an amplified all-pairs workload (every vector
  * scored against `nQueries` query vectors). Prints one JSON line.
  *
  * Usage: runMain graft.VecBench [sfDir] [nQueries]
  */
object VecBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nQueries = if (args.length > 1) args(1).toInt else 200
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val pairs = emb.crossJoin(broadcast(queries))
    pairs.count() // warm file/footer caches

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
    }

    val (tNative, nN) = time {
      pairs.select(sum(VectorFunctions.cosineF32(col("embedding"), col("q_vec")))
        .as("s")).head(); pairs.count()
    }
    val (tHof, nH) = time {
      pairs.select(sum(Similarity.cosine(
        Similarity.toDoubleVec(col("embedding")),
        Similarity.toDoubleVec(col("q_vec")))).as("s")).head(); pairs.count()
    }
    // bucket kernels on the same amplified row count
    val (tBucketNative, _) = time {
      pairs.select(sum(VectorFunctions.hyperplaneBucketF32(col("embedding"), 12, 64))
        .as("s")).head(); pairs.count()
    }
    val (tBucketHof, _) = time {
      pairs.select(sum(Similarity.hyperplaneBucket(
        Similarity.toDoubleVec(col("embedding")), 12, 64)).as("s")).head()
      pairs.count()
    }
    // quantize-audit kernel vs the HOF chain, same amplified rows
    val (tQuantNative, _) = time {
      val d = graft.ops.Quantize.auditInt8(pairs, "vec_id", "embedding")
      d.select(sum(col("c_sum")).as("s")).head(); d.count()
    }
    val (tQuantHof, _) = time {
      val d = graft.ops.Quantize.auditInt8Hof(pairs, "vec_id", "embedding")
      d.select(sum(col("c_sum")).as("s")).head(); d.count()
    }
    println(s"""{"bench":"vec_kernels","pairs":$nN,"cosine_native_sec":$tNative,"cosine_hof_sec":$tHof,"cosine_speedup":${tHof / tNative},"bucket_native_sec":$tBucketNative,"bucket_hof_sec":$tBucketHof,"bucket_speedup":${tBucketHof / tBucketNative},"quant_native_sec":$tQuantNative,"quant_hof_sec":$tQuantHof,"quant_speedup":${tQuantHof / tQuantNative}}""")
    spark.stop()
  }
}
