package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch warm/cold split for the tiered hybrid serves (the r9
  * verdict's #5): one collection build, then the SAME filtered hybrid
  * query timed across reps — rep 1 pays the first-serve tier builds
  * (lexical + IVF), later reps serve from the artifacts. Prints
  * per-rep seconds so the cold build and the warm serve can be
  * reported as separate numbers. [[TuneAnn]] discipline — by hand,
  * not part of the driver contract.
  */
object TuneHybrid {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("REPS", "4").toInt
    // the collection_hybrid_filtered fixture, built ONCE — reps time
    // only queryHybrid, so rep 1 isolates the tier builds
    val wh = java.nio.file.Files.createTempDirectory("graft-hybwarm").toString
    val client = new graft.catalog.ChromaSpark(spark, wh)
    val d = new graft.catalog.CollectionData(client)
    client.createCollection("hyfl")
    val docs = Tables.documents(spark, dir)
    d.add("hyfl", docs.filter(col("doc_id") >= 3)
      .select(format_string("d%07d", col("doc_id")).as("id"),
        col("text").as("document")))
    val texts = docs.filter(col("doc_id") < 3).orderBy(col("doc_id"))
      .select(array_join(slice(split(trim(col("text")), "\\s+"), 1, 8), " "))
      .collect().map(_.getString(0)).toSeq
    val term = texts.head.split("\\s+").head
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = d.queryHybrid("hyfl", texts, nResults = 5,
        whereDocumentJson = Some(s"""{"$$contains":"$term"}""")).count()
      println(f"TUNEHYBRID rep=$r rows=$n ${(System.nanoTime() - t0) / 1e9}%.2fs" +
        (if (r == 1) " (cold: includes lexical+IVF tier builds)" else " (warm serve)"))
    }
    spark.stop()
  }
}
