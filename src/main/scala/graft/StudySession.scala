package graft

import org.apache.spark.sql.SparkSession

/** Shared session factory for the measurement mains (FloorStudy,
  * PolicyScale): the `SPARK_GRAFT_MASTER` / `SPARK_GRAFT_EXECUTOR_MEM` /
  * `SPARK_GRAFT_CPUS` env contract that [[Bench]] documents, held in ONE
  * place so the studies cannot silently diverge from it. Launch with a
  * local master via `sbt runMain`, or under a multi-executor master via
  * `scripts/local_cluster_bench.sh <master> <mainClass>` (spark-submit
  * with the packaged jar so executor JVMs get the app classes).
  */
object StudySession {

  def build(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder0 = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
    val spark = sys.env.get("SPARK_GRAFT_EXECUTOR_MEM")
      .fold(builder0)(m => builder0.config("spark.executor.memory", m))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
