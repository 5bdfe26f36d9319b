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
      spark.conf.set("spark.graft.graph.baseHops", bh.toString)
      spark.conf.set("spark.graft.graph.upperHops", uh.toString)
      spark.conf.set("spark.graft.graph.upperEf", ue.toString)
      if (ef > 0) spark.conf.set("spark.graft.graph.ef", ef.toString)
      else spark.conf.unset("spark.graft.graph.ef")
      val t0 = System.nanoTime()
      val out = (if (sys.env.contains("DEEP"))
          SparkEntry.collectionHnswDeep(spark, dir)
        else SparkEntry.collectionHnswGraph(spark, dir)).collect()
      val per = out.groupBy(_.getLong(0)).values
        .map(_.head.getAs[Double]("recall_at_10")).toSeq
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"TUNEGRAPH $dir%-26s bh=$bh uh=$uh ue=$ue ef=$ef " +
        f"mean=${per.sum / per.size}%.3f min=${per.min}%.3f ${sec}%.1fs")
    }
    spark.stop()
  }
}
