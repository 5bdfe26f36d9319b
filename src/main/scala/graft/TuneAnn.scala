package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.VectorOps

/** Scratch sweep harness: recall-vs-cost points for the ANN paths'
  * tuning knobs (nprobe / kClusters / shortlist / tables). Not part of
  * the driver contract — run by hand while picking defaults.
  */
object TuneAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val c = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id"), col("embedding").as("vec"), col("label"))

    def recall(name: String, ann: DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = VectorOps.withRecallAt(ann, q, c, 10)
        .groupBy(col("query_id")).agg(first(col("recall_at_10")).as("r"))
        .agg(avg(col("r")), min(col("r"))).head()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"TUNE $name%-28s mean=${r.getDouble(0)}%.3f min=${r.getDouble(1)}%.3f ${sec}%.1fs")
    }

    for (np <- Seq(8))
      recall(s"ivf_label np=$np", VectorOps.annIvf(q, c, 10, nprobe = np))
    for ((k, np) <- Seq((16, 12), (32, 20)))
      recall(s"kmeans k=$k np=$np", VectorOps.annIvfKmeans(q, c, 10, kClusters = k, iters = 2, nprobe = np))
    for ((kc, sl) <- Seq((32, 200), (32, 250)))
      recall(s"pq kc=$kc sl=$sl", VectorOps.annPq(q, c, 10, kCodes = kc, shortlist = sl))
    for (t <- Seq(16))
      recall(s"lsh tables=$t", VectorOps.annLsh(q, c, 10, tables = t))
    for (sl <- Seq(100, 200, 400))
      recall(s"opq sl=$sl", VectorOps.annOpq(q, c, 10, shortlist = sl))
    for (sl <- Seq(100, 200, 400))
      recall(s"bq sl=$sl", VectorOps.annBq(q, c, 10, shortlist = sl))
    spark.stop()
  }
}
