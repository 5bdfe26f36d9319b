package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF probe-width calibration sweep (r13) — the measurement behind
  * [[graft.catalog.CollectionData.nprobeLawFor]]: replays the
  * collection IVF serve (cells ranked by the collection metric,
  * top-nprobe probed, exact re-rank inside the probed cells) DIRECTLY
  * against a persisted `collivf` artifact directory for a ladder of
  * nprobe values, and reports recall@10 against exact brute-force
  * cosine truth over the [[TuneScale]] query construction. Serve-only:
  * artifacts build once (TuneScale / the catalog path); each sweep
  * point costs one probe + re-rank pass, so the whole calibration
  * runs in minutes where rebuild-per-point would take hours.
  *
  * Usage: runMain graft.TuneNprobe <artifactDir> <corpusN> [npCsv]
  * Env: CPUS, NQ (default 100), CENTERS (default 4096, must match
  * the corpus the artifact indexed), METRIC (l2 | cosine — the
  * metric the artifact's collection declared; r12 ladder = l2).
  */
object TuneNprobe {

  private def distOf(metric: String, a: Column, b: Column): Column = metric match {
    case "cosine" => lit(1.0) - graft.operators.VectorOps.cosine(a, b)
    case _ => graft.operators.VectorOps.dot(a, a) -
      lit(2.0) * graft.operators.VectorOps.dot(a, b) +
      graft.operators.VectorOps.dot(b, b)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TuneNprobe <artifactDir> <corpusN> [npCsv]")
    val idx = args(0)
    val n = args(1).toLong
    val nprobes = (if (args.length > 2) args(2) else "24,36,48,64,96,128")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("CPUS", "16")
    val nq = sys.env.get("NQ").map(_.toInt).getOrElse(100)
    val centers = sys.env.get("CENTERS").map(_.toInt).getOrElse(4096)
    val metric = sys.env.getOrElse("METRIC", "l2")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.driver.maxResultSize", "4g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // QMODE=indist (default): the TuneScale in-distribution queries —
    // each sits in ONE basin, the easy case for a coarse quantizer.
    // QMODE=boundary: midpoints of two successive in-distribution
    // draws — each query's true neighbors SPLIT across two basins,
    // the standard hard case that actually exercises probe width
    // (an in-distribution query's top-10 lives in its home cell(s),
    // so probe loss is ~0 at any nprobe — measured r13).
    val qmode = sys.env.getOrElse("QMODE", "indist")
    val qa = TuneScale.vectors(spark, n, n + nq, 64, centers)
      .select(col("vec_id").as("query_id"), col("embedding").as("qa"))
    val queries = (qmode match {
      case "boundary" =>
        val qb = TuneScale.vectors(spark, n + nq, n + 2L * nq, 64, centers)
          .select((col("vec_id") - nq).as("query_id"), col("embedding").as("qb"))
        qa.join(qb, "query_id")
          .select(col("query_id"),
            zip_with(col("qa"), col("qb"),
              (x, y) => ((x + y) / lit(2.0)).cast("float")).as("qvec"))
      case _ => qa.select(col("query_id"), col("qa").as("qvec"))
    }).localCheckpoint(true)
    val vectors = spark.read.parquet(s"$idx/vectors")
      .select(col("id"), col("embedding"), col("label"))
    val cents = broadcast(spark.read.parquet(s"$idx/centroids")
      .select(col("c_id"), col("centroid").cast("array<float>").as("centroid")))
    val cellCount = cents.count()
    // exact truth over the artifact's own base rows. TRUTH=cosine is
    // the r12 ladder definition; TRUTH=serve scores truth with the
    // SERVED metric, isolating probe loss from metric disagreement —
    // the r13 sweep showed the whole r12 "IVF recall decay" was
    // l2-top-10 vs cosine-top-10 disagreement (recall identical at
    // nprobe 24 and a full probe at 100k/400k), not probe loss.
    val truthMetric = sys.env.getOrElse("TRUTH", "cosine")
    val corpus = vectors.select(col("id").as("vec_id"), col("embedding").as("vec"))
    val truthDf = truthMetric match {
      case "serve" =>
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("d").asc, col("vec_id").asc)
        corpus.join(broadcast(queries))
          .select(col("query_id"), col("vec_id"),
            distOf(metric, col("qvec"), col("vec")).as("d"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10)
          .select(col("query_id"), col("vec_id"))
      case _ =>
        graft.operators.VectorOps.knnBrute(queries, corpus, 10)
          .select(col("query_id"), col("vec_id"))
    }
    val truth = truthDf.collect().map(r => (r.getLong(0), r.getString(1))).toSet

    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("c_dist").asc, col("c_id").asc)
    val servedW = Window.partitionBy(col("query_id"))
      .orderBy(col("d").asc, col("id").asc)
    val rankedCells = queries.join(cents)
      .select(col("query_id"), col("qvec"), col("c_id"),
        distOf(metric, col("qvec"), col("centroid")).as("c_dist"))
      .withColumn("c_rank", row_number().over(probeW))
      .localCheckpoint(true)

    for (np <- nprobes) {
      val t0 = System.nanoTime()
      val probes = rankedCells.filter(col("c_rank") <= np)
        .select(col("query_id"), col("qvec"), col("c_id").as("label"))
      val served = probes.join(vectors, "label")
        .select(col("query_id"), col("id"),
          distOf(metric, col("qvec"), col("embedding")).as("d"))
        .withColumn("r", row_number().over(servedW))
        .filter(col("r") <= 10)
        .select(col("query_id"), col("id"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
      val sec = (System.nanoTime() - t0) / 1e9
      val perQ = served.groupBy(_._1).map { case (_, rows) =>
        rows.count(truth.contains).toDouble / 10.0 }
      val mean = perQ.sum / perQ.size
      val mn = perQ.min
      val nmiss = perQ.count(_ < 0.5)
      println(f"TUNENPROBE n=$n cells=$cellCount nprobe=$np mean=$mean%.3f " +
        f"min=$mn%.2f miss=$nmiss frac=${np.toDouble / cellCount}%.4f serve=$sec%.1fs")
    }
    spark.stop()
  }
}
