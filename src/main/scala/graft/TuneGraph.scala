package graft

import org.apache.spark.sql.SparkSession

/** Scratch sweep harness for the LAYERED graph tier's serve
  * constants (baseHops / upperHops / upperEf / base ef): recall-vs-
  * cost points at the certified corpus and the 4× corpus. The knobs
  * are serve-time (conf-overridable), so every sweep point reuses the
  * one content-keyed artifact. Not part of the driver contract — run
  * by hand while calibrating, the [[TuneAnn]] discipline.
  */
object TuneGraph {
  /** The collectionHnswDeep fixture with configurable copy factors.
    * `NQ` (default 3) widens the out-of-sample query set — 3 queries
    * quantize recall in 0.1 steps and swing ±0.1 mean / ±0.2 min
    * between graph realizations (measured r12), so law calibration
    * runs NQ=30. The base corpus excludes the query ids, so the
    * artifact is keyed per NQ. */
  private def deepVariant(s: SparkSession, dir: String,
                          f1: Float, f2: Float): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val nq = sys.env.get("NQ").map(_.toInt).getOrElse(3)
    val wh = java.nio.file.Files.createTempDirectory("graft-hnswdv").toString
    val client = new graft.catalog.ChromaSpark(s, wh)
    val d = new graft.catalog.CollectionData(client)
    client.createCollection("grdv", Some(Map("hnsw:space" -> "cosine",
      "hnsw:M" -> "8", "hnsw:construction_ef" -> "256")))
    val emb = Tables.embeddings(s, dir)
    val base = emb.filter(col("vec_id") >= math.max(10, nq))
      .select(col("vec_id"), col("embedding"))
    def shifted(off: Long, f: Float) = base.select(
      (col("vec_id") + lit(off)).as("vec_id"),
      transform(col("embedding"),
        (x, i) => when(i === 0, x * lit(f)).otherwise(x)).as("embedding"))
    val corpus = base.unionByName(shifted(1000000L, f1))
      .unionByName(shifted(2000000L, f2))
    d.add("grdv", corpus
      .select(format_string("v%07d", col("vec_id")).as("id"), col("embedding")))
    val queries = emb.filter(col("vec_id") < nq)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val ann = d.query("grdv", queries, nResults = 10, include = Nil)
      .select(col("query_id"), col("rank"),
        substring(col("id"), 2, 10).cast("long").as("vec_id"),
        col("distance"))
    graft.operators.VectorOps.withRecallAt(ann, queries,
      corpus.select(col("vec_id"), col("embedding").as("vec")), k = 10)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")
    // (baseHops, upperHops, upperEf, efOverride-or-0)
    val points = sys.env.get("SWEEP") match {
      case Some(s) => s.split(";").toSeq.map { p =>
        val a = p.split(",").map(_.trim.toInt); (a(0), a(1), a(2), a(3))
      }
      case None => Seq((3, 2, 8, 0))
    }
    for (dir <- dirs; (bh, uh, ue, ef) <- points) {
      sys.env.get("MAXLEVEL").foreach(v =>
        spark.conf.set("spark.graft.graph.maxLevel", v))
      sys.env.get("GATE").foreach(v =>
        spark.conf.set("spark.graft.graph.dedupGatePct", v))
      spark.conf.set("spark.graft.graph.baseHops", bh.toString)
      spark.conf.set("spark.graft.graph.upperHops", uh.toString)
      spark.conf.set("spark.graft.graph.upperEf", ue.toString)
      if (ef > 0) spark.conf.set("spark.graft.graph.ef", ef.toString)
      else spark.conf.unset("spark.graft.graph.ef")
      val t0 = System.nanoTime()
      // FACTORS="1.5,2.5" builds the tripled corpus with SEPARATED
      // copies (distinct regions) instead of the near-dup cliques —
      // isolates "deep hierarchy at natural data" from "beam slots
      // eaten by duplicates"
      val out = (sys.env.get("FACTORS") match {
        case Some(fs) =>
          val Array(f1, f2) = fs.split(",").map(_.trim.toFloat)
          deepVariant(spark, dir, f1, f2)
        case None if sys.env.contains("DEEP") =>
          SparkEntry.collectionHnswDeep(spark, dir)
        case None => SparkEntry.collectionHnswGraph(spark, dir)
      }).collect()
      val per = out.groupBy(_.getLong(0)).values
        .map(_.head.getAs[Double]("recall_at_10")).toSeq
      val sec = (System.nanoTime() - t0) / 1e9
      // a sweep point that returns zero rows (e.g. a broken override
      // combination) must not abort the remaining points — per.min on
      // an empty Seq throws; print a marker line instead
      if (per.isEmpty)
        println(f"TUNEGRAPH $dir%-26s bh=$bh uh=$uh ue=$ue ef=$ef " +
          f"EMPTY-RESULT ${sec}%.1fs")
      else
        println(f"TUNEGRAPH $dir%-26s bh=$bh uh=$uh ue=$ue ef=$ef " +
          f"mean=${per.sum / per.size}%.3f min=${per.min}%.3f ${sec}%.1fs")
    }
    spark.stop()
  }
}
