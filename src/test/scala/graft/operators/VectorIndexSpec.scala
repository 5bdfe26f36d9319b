package graft.operators

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorIndexSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def corpusAndQueries = {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val corpus = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id"), col("embedding").as("vec"))
    (corpus, queries)
  }

  test("probing the persisted layout reads only the probed partition directories") {
    val (corpus, queries) = corpusAndQueries
    val dir = Files.createTempDirectory("ivf-index-prune").toString
    VectorIndex.build(corpus, dir, kClusters = 8, iters = 2)
    val all = spark.read.parquet(s"$dir/vectors")
    val allFiles = all.inputFiles.length
    // one query, one probe: exactly one cluster directory survives
    // (ten spread queries would legitimately probe every cluster)
    val oneQuery = queries.filter(col("query_id") === 0)
    val probed = VectorIndex.probedVectors(spark, dir, oneQuery, nprobe = 1)
    // the label filter is a static partition predicate — the scan's
    // selectedPartitions (planning-time pruning result) holds only the
    // probed directory (inputFiles would list the whole relation)
    val scan = probed.queryExecution.sparkPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val scannedFiles = scan.selectedPartitions.totalNumberOfFiles
    assert(scan.selectedPartitions.partitionCount === 1) // exactly the probed label
    assert(scannedFiles > 0)
    assert(scannedFiles < allFiles, s"no pruning: scanned $scannedFiles of $allFiles files")
    // and only the probed label survives in the data
    assert(probed.select(col("label")).distinct().count() === 1)
  }

  test("index query matches the shape and recall of the inline IVF path") {
    val (corpus, queries) = corpusAndQueries
    val dir = Files.createTempDirectory("ivf-index-query").toString
    VectorIndex.build(corpus, dir, kClusters = 8, iters = 2)
    val out = VectorIndex.query(spark, dir, queries, k = 10, nprobe = 4).collect()
    assert(out.length === 100) // 10 queries x top-10
    // recall vs brute force on the same frames
    val brute = VectorOps.knnBrute(queries, corpus, 10)
      .select(col("query_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = out.map(r => (r.getLong(0), r.getLong(2))).count(brute.contains)
    assert(hits >= 60, s"recall@10 too low: $hits/100")
    // scores are non-increasing per query
    out.groupBy(_.getLong(0)).values.foreach { rows =>
      val scores = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("buildIfAbsent builds once per (content, params) and reuses the completed index") {
    val (corpus, queries) = corpusAndQueries
    val root = Files.createTempDirectory("ivf-index-cache").toString
    val dir1 = VectorIndex.buildIfAbsent(corpus, root, kClusters = 8, iters = 2)
    val files1 = spark.read.parquet(s"$dir1/vectors").inputFiles.sorted
    val mtime1 = Files.getLastModifiedTime(java.nio.file.Paths.get(dir1, "_INDEX_OK"))
    // identical corpus + params: same dir, nothing rewritten
    val dir2 = VectorIndex.buildIfAbsent(corpus, root, kClusters = 8, iters = 2)
    assert(dir2 === dir1)
    assert(spark.read.parquet(s"$dir2/vectors").inputFiles.sorted === files1)
    assert(Files.getLastModifiedTime(java.nio.file.Paths.get(dir2, "_INDEX_OK")) === mtime1)
    // different params → a different index
    val dir3 = VectorIndex.buildIfAbsent(corpus, root, kClusters = 4, iters = 2)
    assert(dir3 !== dir1)
    // changed content → a different index
    val dir4 = VectorIndex.buildIfAbsent(corpus.filter(col("vec_id") =!= 11L), root,
      kClusters = 8, iters = 2)
    assert(dir4 !== dir1)
    // the reused index answers queries identically to a fresh build
    val viaCache = VectorIndex.query(spark, dir1, queries, k = 5).collect().toSeq
    val freshDir = Files.createTempDirectory("ivf-index-fresh").toString
    VectorIndex.build(corpus, freshDir, kClusters = 8, iters = 2)
    val viaFresh = VectorIndex.query(spark, freshDir, queries, k = 5).collect().toSeq
    assert(viaCache === viaFresh)
  }

  test("build lays out exactly one file per cell directory") {
    // the pre-r8 write fanned every upstream partition into every
    // cell (cells × partitions tiny files — 1845 for a 5k-row
    // collection); this pins the clustered layout so the fan-out
    // can't silently return
    val (corpus, _) = corpusAndQueries
    val dir = Files.createTempDirectory("ivf-layout").toString
    VectorIndex.build(corpus.repartition(4), dir, kClusters = 8, iters = 2)
    val vecDir = new java.io.File(s"$dir/vectors")
    val labelDirs = vecDir.listFiles().filter(f => f.isDirectory && f.getName.startsWith("label="))
    assert(labelDirs.nonEmpty)
    labelDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1,
        s"cell ${d.getName} has ${files.length} files — the clustered write regressed")
    }
  }

  test("a cached relation is invalidated by delta-append (no stale file index)") {
    // the serve path memoizes resolved artifact relations
    // (IndexCache.readCached) — a query BEFORE the append populates
    // that cache, so this pins the append-side invalidation: without
    // it the second query would silently miss every delta file
    val (corpus, queries) = corpusAndQueries
    val corpus0 = corpus.filter(col("vec_id") < 400)
    val delta = corpus.filter(col("vec_id") >= 400)
    val dir = Files.createTempDirectory("ivf-stale").toString
    VectorIndex.build(corpus0, dir, kClusters = 8, iters = 2)
    VectorIndex.query(spark, dir, queries, k = 10, nprobe = 8).count() // populate the relation cache
    VectorIndex.appendDelta(spark, dir, delta)
    val afterIds = VectorIndex.query(spark, dir, queries, k = 10, nprobe = 8)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    // full-probe k=10 over a corpus where delta vectors are nearest to
    // some query must surface at least one delta id
    assert(afterIds.exists(_ >= 400L),
      s"post-append query served from a stale cached file index: $afterIds")
  }

  test("delta-append equals re-laying-out the union under the frozen centroids") {
    val (corpus, queries) = corpusAndQueries
    val corpus0 = corpus.filter(col("vec_id") < 400)
    val delta = corpus.filter(col("vec_id") >= 400)
    assert(delta.count() > 0)
    val dir = Files.createTempDirectory("ivf-append").toString
    VectorIndex.build(corpus0, dir, kClusters = 8, iters = 2)
    val filesBefore = spark.read.parquet(s"$dir/vectors").inputFiles.toSet
    VectorIndex.appendDelta(spark, dir, delta)
    // append-only: every resident file survives untouched
    val filesAfter = spark.read.parquet(s"$dir/vectors").inputFiles.toSet
    assert(filesBefore.subsetOf(filesAfter))
    assert(filesAfter.size > filesBefore.size)
    val got = VectorIndex.query(spark, dir, queries, k = 10, nprobe = 4).collect().toSeq
    // reference: a fresh layout of the FULL union assigned to the SAME
    // frozen centroids (training only ever saw corpus0) — query
    // results must be identical, which is the whole append contract
    val refDir = Files.createTempDirectory("ivf-append-ref").toString
    val cents = spark.read.parquet(s"$dir/centroids")
    cents.write.parquet(s"$refDir/centroids")
    val frozen = cents.collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    corpus0.unionByName(delta)
      .select(col("vec_id"), col("vec"),
        VectorOps.nearestCentroidId(col("vec"), frozen).as("label"))
      .write.partitionBy("label").parquet(s"$refDir/vectors")
    val ref = VectorIndex.query(spark, refDir, queries, k = 10, nprobe = 4).collect().toSeq
    assert(got === ref)
    // appended vectors are actually retrievable: a query AT a delta
    // vector must find that exact vector first
    val probe = delta.limit(1)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"))
    val self = VectorIndex.query(spark, dir, probe, k = 1, nprobe = 1).collect()
    assert(self.head.getLong(2) === probe.collect().head.getLong(0))
  }

  test("persisted IVF-PQ: pruned codes scan answers exactly like the inline path") {
    val (corpus, queries) = corpusAndQueries
    val dir = Files.createTempDirectory("ivfpq-index").toString
    VectorIndex.buildPq(corpus, dir)
    // training is deterministic, so the persisted path must reproduce
    // the inline operator bit-for-bit
    val viaIndex = VectorIndex.queryPq(spark, dir, queries, corpus, k = 10).collect().toSeq
    val inline = VectorOps.annIvfPq(queries, corpus, k = 10).collect().toSeq
    assert(viaIndex === inline)
    // planning-time pruning: one query, one probe -> ONE codes
    // partition directory survives in the scan
    val oneQuery = queries.filter(col("query_id") === 0)
    val plan = VectorIndex.queryPq(spark, dir, oneQuery, corpus, k = 5, nprobe = 1)
      .queryExecution.sparkPlan
    val codesScan = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("/codes")) => f
    }.head
    assert(codesScan.selectedPartitions.partitionCount === 1)
  }

  test("PQ delta-append equals re-encoding the union under the frozen models") {
    val (corpus, queries) = corpusAndQueries
    val corpus0 = corpus.filter(col("vec_id") < 400)
    val delta = corpus.filter(col("vec_id") >= 400)
    val dir = Files.createTempDirectory("ivfpq-append").toString
    VectorIndex.buildPq(corpus0, dir)
    VectorIndex.appendDeltaPq(spark, dir, delta)
    val got = VectorIndex.queryPq(spark, dir, queries, corpus, k = 10).collect().toSeq
    // reference: same frozen centroids AND codebook, codes re-laid-out
    // from the full union
    val refDir = Files.createTempDirectory("ivfpq-append-ref").toString
    spark.read.parquet(s"$dir/centroids").write.parquet(s"$refDir/centroids")
    val cb = spark.read.parquet(s"$dir/codebook")
    cb.write.parquet(s"$refDir/codebook")
    val cents = spark.read.parquet(s"$dir/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    val row = cb.head()
    VectorOps.ivfPqEncode(corpus0.unionByName(delta), cents,
        row.getSeq[Double](3).toArray, row.getInt(0), row.getInt(1), row.getInt(2))
      .write.partitionBy("label").parquet(s"$refDir/codes")
    val ref = VectorIndex.queryPq(spark, refDir, queries, corpus, k = 10).collect().toSeq
    assert(got === ref)
  }

  private def taggedCorpusAndQueries = {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val corpus = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id"), col("embedding").as("vec"), col("label").as("tag"))
    (corpus, queries)
  }

  test("filtered query: only matching vectors, and exact when the filter is selective enough") {
    val (corpus, queries) = taggedCorpusAndQueries
    val dir = Files.createTempDirectory("ivf-filtered").toString
    VectorIndex.build(corpus, dir, kClusters = 8, iters = 2)
    val pred = WhereFilter.compile("""{"tag": {"$in": [1, 3, 5, 7]}}""")
    val matching = corpus.filter(pred)
    val nMatch = matching.count()
    assert(nMatch > 0 && nMatch < corpus.count())
    // every result satisfies the predicate (pushdown really applied)
    val okTags = matching.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val loose = VectorIndex.queryFiltered(spark, dir, queries, pred, k = 3, oversample = 1)
      .collect()
    assert(loose.nonEmpty)
    loose.foreach(r => assert(okTags.contains(r.getLong(2)),
      s"vec ${r.getLong(2)} violates the filter"))
    // need >= total matches: adaptive probing selects EVERY matching
    // cell, so the result must equal filtered brute force exactly
    val predSel = WhereFilter.compile("""{"tag": {"$eq": 3}}""")
    val matchSel = corpus.filter(predSel)
    assert(16L * 10 >= matchSel.count(), "test premise: filter is selective at this scale")
    val got = VectorIndex.queryFiltered(spark, dir, queries, predSel, k = 10, oversample = 16)
      .collect().toSeq
    val brute = VectorOps.knnBrute(queries, matchSel, 10).collect().toSeq
    assert(got === brute)
  }

  test("filtered probe plan adapts depth to the candidate target and skips empty cells") {
    val (corpus, queries) = taggedCorpusAndQueries
    val dir = Files.createTempDirectory("ivf-filtered-plan").toString
    VectorIndex.build(corpus, dir, kClusters = 8, iters = 2)
    val pred = WhereFilter.compile("""{"tag": {"$eq": 3}}""")
    val matchCells = corpus.filter(pred).join(
        spark.read.parquet(s"$dir/vectors").select(col("vec_id"), col("label")), "vec_id")
      .select(col("label")).distinct().collect().map(_.getInt(0)).toSet
    val shallow = VectorIndex.filteredProbePlan(spark, dir, queries, pred, need = 1L,
        minCells = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val deep = VectorIndex.filteredProbePlan(spark, dir, queries, pred, need = 100000L)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    // zero-match cells are never probed, at any depth
    (shallow ++ deep).foreach { case (_, c) => assert(matchCells.contains(c)) }
    // the shallow plan is a per-query prefix of the deep plan
    assert(shallow.toSet.subsetOf(deep.toSet))
    assert(shallow.length < deep.length)
    // unbounded need probes EVERY matching cell for every query
    val perQueryDeep = deep.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    perQueryDeep.foreach { case (_, cells) => assert(cells === matchCells) }
    // shallow: at least one cell per query (k candidates must exist)
    assert(shallow.groupBy(_._1).size === deep.groupBy(_._1).size)
  }

  test("annIvfFilteredQuery certifies recall vs filtered brute force") {
    val out = VectorIndex.annIvfFilteredQuery(spark, sfDir).collect()
    assert(out.nonEmpty)
    val recalls = out.map(_.getDouble(4)).distinct
    val mean = out.groupBy(_.getLong(0)).values
      .map(_.head.getDouble(4)).sum / out.groupBy(_.getLong(0)).size
    assert(mean >= 0.8, s"filtered ANN mean recall $mean below floor (per-query: ${recalls.mkString(",")})")
  }

  test("persisted BQ: stored-codes search is bit-for-bit the inline annBq") {
    val (corpus, queries) = corpusAndQueries
    val dir = Files.createTempDirectory("bq-index").toString
    VectorIndex.buildBq(corpus, dir)
    // the persisted model IS the inline model (same deterministic PCA
    // rotation), so results must agree exactly
    val viaIndex = VectorIndex.queryBq(spark, dir, queries, corpus, k = 10)
      .collect().toSeq
    val inline = VectorOps.annBq(queries, corpus, k = 10).collect().toSeq
    assert(viaIndex === inline)
    // codes at rest really are one long per vector
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.columns.toSeq === Seq("vec_id", "code"))
    assert(codes.schema("code").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(codes.count() === corpus.count())
    // recall floor: the persisted path carries the same per-query
    // recall certification as the inline entry (min 0.9 at this SF)
    val rec = VectorOps.withRecallAt(
      VectorIndex.queryBq(spark, dir, queries, corpus, k = 10),
      queries, corpus, k = 10).collect()
    val perQuery = rec.groupBy(_.getLong(0)).values.map(_.head.getDouble(4))
    assert(perQuery.min >= 0.9, s"BQ index recall floor: ${perQuery.min}")
  }

  test("BQ delta-append encodes under the frozen model; resident codes untouched") {
    val (corpus, queries) = corpusAndQueries
    val corpus0 = corpus.filter(col("vec_id") < 400)
    val delta = corpus.filter(col("vec_id") >= 400)
    assert(delta.count() > 0)
    val dir = Files.createTempDirectory("bq-append").toString
    VectorIndex.buildBq(corpus0, dir)
    val filesBefore = spark.read.parquet(s"$dir/codes").inputFiles.toSet
    VectorIndex.appendDeltaBq(spark, dir, delta)
    val filesAfter = spark.read.parquet(s"$dir/codes").inputFiles.toSet
    assert(filesBefore.subsetOf(filesAfter) && filesAfter.size > filesBefore.size)
    // appended codes equal a direct frozen-model encode of the delta —
    // training only ever saw corpus0, exactly the append contract
    val model = spark.read.parquet(s"$dir/model").head()
    val dim = model.getInt(0)
    val mean = model.getSeq[Double](1).toArray
    val rot = model.getSeq[Double](2).toArray.grouped(dim).toArray
    val expect = delta
      .select(col("vec_id"), OpqRotation.rotateExpr(col("vec"), rot, mean).as("rv"))
      .select(col("vec_id"), VectorOps.signPack(col("rv"), dim).as("code"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val stored = spark.read.parquet(s"$dir/codes")
      .filter(col("vec_id") >= 400)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(stored === expect)
    // and the whole index answers like a fresh frozen-model layout of
    // the union: build ref dir with the same model + one encode pass
    val refDir = Files.createTempDirectory("bq-append-ref").toString
    spark.read.parquet(s"$dir/model").write.parquet(s"$refDir/model")
    corpus0.unionByName(delta)
      .select(col("vec_id"), OpqRotation.rotateExpr(col("vec"), rot, mean).as("rv"))
      .select(col("vec_id"), VectorOps.signPack(col("rv"), dim).as("code"))
      .write.parquet(s"$refDir/codes")
    val got = VectorIndex.queryBq(spark, dir, queries, corpus, k = 10).collect().toSeq
    val ref = VectorIndex.queryBq(spark, refDir, queries, corpus, k = 10).collect().toSeq
    assert(got === ref)
  }

  test("centroids table is model-sized") {
    val (corpus, _) = corpusAndQueries
    val dir = Files.createTempDirectory("ivf-index-cent").toString
    VectorIndex.build(corpus, dir, kClusters = 8, iters = 1)
    val cents = spark.read.parquet(s"$dir/centroids")
    assert(cents.count() <= 8)
    assert(cents.columns.toSeq === Seq("c_id", "centroid"))
  }
}
