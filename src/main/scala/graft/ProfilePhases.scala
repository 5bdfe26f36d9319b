package graft

import org.apache.spark.sql.{SparkSession, functions => F}
import org.apache.spark.sql.functions.col
import graft.catalog.{ChromaSpark, CollectionData}
import graft.operators.VectorOps

/** r14 phase-level decomposition of the collection-tier serve queries
  * (guide §1): replicates `collection_hnsw_deep`'s steps with wall
  * timers so the per-rep cost splits into create/ingest/serve/recall.
  * Iteration tool only.
  */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val jobNanos = new java.util.concurrent.atomic.AtomicLong()
    val verbose = sys.env.contains("GRAFT_PROF_VERBOSE")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        val started = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val name = js.stageInfos.map(si =>
            si.name.takeWhile(_ != '\n').take(70)).mkString(" | ")
          started.put(js.jobId, (System.nanoTime(), name))
        }
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val st = started.remove(je.jobId)
          if (st != null) {
            jobs.incrementAndGet(); jobNanos.addAndGet(System.nanoTime() - st._1)
            if (verbose)
              println(f"[job] ${je.jobId}%-4d ${(System.nanoTime() - st._1) / 1e9}%6.3f s  ${st._2}")
          }
        }
        override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
          e match {
            case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
              if (verbose)
                println(s"[sql] ${s.executionId} ${s.description.takeWhile(_ != '\n').take(90)}")
            case _ => ()
          }
      })
    def t[A](tag: String)(body: => A): A = {
      val j0 = jobs.get(); val n0 = jobNanos.get()
      val t0 = System.nanoTime()
      val r = body
      Thread.sleep(100)
      println(f"[phase] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%7.3f s" +
        f"  jobs=${jobs.get() - j0}%-3d jobtime=${(jobNanos.get() - n0) / 1e9}%6.3f s")
      r
    }
    // warm once via the real entry
    SparkEntry.queries("collection_hnsw_deep")(spark, sfDir).count()
    (1 to reps).foreach { rep =>
      println(s"== rep $rep")
      val s = spark
      val wh = java.nio.file.Files.createTempDirectory("graft-prof").toString
      val (client, d) = t("client+create") {
        val c = new ChromaSpark(s, wh)
        val dd = new CollectionData(c)
        c.createCollection("grdeep", Some(Map("hnsw:space" -> "cosine",
          "hnsw:M" -> "8", "hnsw:construction_ef" -> "256")))
        (c, dd)
      }
      val emb = Tables.embeddings(s, sfDir)
      val base = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id"), col("embedding"))
      def shifted(offset: Long, factor: Float) = base
        .select((col("vec_id") + F.lit(offset)).as("vec_id"),
          F.transform(col("embedding"),
            (x, i) => F.when(i === 0, x * F.lit(factor)).otherwise(x)).as("embedding"))
      val corpus = base
        .unionByName(shifted(1000000L, 1.01f))
        .unionByName(shifted(2000000L, 1.02f))
      t("add (ingest)") {
        d.add("grdeep", corpus
          .select(F.format_string("v%07d", col("vec_id")).as("id"), col("embedding")))
      }
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val ann = t("query (plan)") {
        d.query("grdeep", queries, nResults = 10, include = Nil)
      }
      val annSel = ann.select(col("query_id"), col("rank"),
        F.substring(col("id"), 2, 10).cast("long").as("vec_id"),
        col("distance"))
      t("serve count()") { annSel.count() }
      val withR = t("recall (plan)") {
        VectorOps.withRecallAt(annSel, queries,
          corpus.select(col("vec_id"), col("embedding").as("vec")), k = 10)
      }
      t("recall count()") { withR.count() }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
