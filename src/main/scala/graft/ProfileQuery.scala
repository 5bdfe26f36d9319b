package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** r14 measurement harness (guide §1): run ONE declared query N times
  * under a job listener so the per-rep wall clock decomposes into the
  * Spark jobs it schedules — the bench medians say WHICH query is
  * expensive, this says WHY (how many jobs, which call sites, how much
  * of the rep is job time vs driver-side planning gaps). Iteration
  * tool only: never touches BENCH_LOCAL.json or any artifact the
  * driver reads.
  *
  * Usage: sbt "runMain graft.ProfileQuery <query> <sfDir> [reps]"
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
    println(s"==== $name")
    val fn = SparkEntry.queries(name)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    // SQL executions carry the caller's call site in their
    // description — the decomposition the job events lack (every job
    // reads "withThreadLocalCaptured" under the async SQL executor)
    val sqlStart = new java.util.concurrent.ConcurrentHashMap[Long, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val eid = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.root.id")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.sql.execution.id"))))
        val site = eid.flatMap(id => Option(sqlStart.get(id.toLong)).map(_._2))
          .getOrElse("?")
        jobs.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val st = jobs.remove(je.jobId)
        if (st != null)
          done.add((je.jobId, System.nanoTime() - st._1, st._2))
      }
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            sqlStart.put(s.executionId,
              (System.nanoTime(), s.description.takeWhile(_ != '\n').take(70)))
          case _ => ()
        }
    })
    // one warm run (JIT/codegen), then timed reps
    fn(spark, sfDir).count()
    (1 to reps).foreach { r =>
      done.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      import scala.jdk.CollectionConverters._
      val byJob = done.asScala.toSeq.sortBy(_._1)
      val jobSum = byJob.map(_._2).sum / 1e9
      println(f"== rep $r: wall $wall%.2f s, ${byJob.size} jobs, job time $jobSum%.2f s (gap ${wall - jobSum}%.2f s)")
      val bySite = byJob.groupBy(_._3).map { case (s, xs) =>
        (s, xs.size, xs.map(_._2).sum / 1e9)
      }.toSeq.sortBy(-_._3)
      bySite.take(25).foreach { case (s, n, t) =>
        println(f"   $t%7.3f s  n=$n%-4d $s")
      }
      spark.catalog.clearCache(); System.gc()
    }
    }
    spark.stop()
  }
}
