package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** PERSISTED PQ index — the production ANN serving shape. The
  * in-query `annPqTopk` trains + encodes per call (right for a
  * one-shot batch query); a serving system trains ONCE, stores the
  * codebook and the m-byte codes, and answers every later query
  * against the stored index:
  *
  *  - `buildPq` — one bounded sample collect, driver-side Lloyd
  *    (VectorQueries.pqTrain), one narrow full-corpus encode scan;
  *    persists `codes/` (vec_id, codes — the 64×-compressed scan
  *    side) and `book/` ((mm, kk, cent) rows — the quantizer,
  *    m×k×sub doubles at any corpus size) as parquet.
  *  - `searchPq` — reads the quantizer (one tiny collect), computes
  *    each query's LUT driver-side, scores the stored codes with the
  *    same broadcast-LUT ADC expression, exact-re-ranks the
  *    shortlist against the corpus embeddings. NO training, NO
  *    full-corpus encode: the per-query cost is one compressed scan.
  *
  * Same building blocks as annPqTopk, so stored-index search is
  * spec-pinned to return EXACTLY annPqTopk's results for the same
  * parameters (VectorIndexSpec). */
object VectorIndex {

  /** Train on a deterministic bounded sample and persist the index.
    * Parameter meanings match annPqTopk. */
  def buildPq(spark: SparkSession, dir: String, indexPath: String,
      m: Int = 8, k: Int = 32, lloydRounds: Int = 4,
      trainMod: Int = 1, maxTrain: Int = 4096): Unit = {
    val sub = VectorQueries.Dim / m
    val emb = VectorQueries.embNormed(spark, dir).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sample: Array[Array[Double]] = emb
      .filter(pmod(col("vec_id"), lit(trainMod)) === 0)
      .orderBy(col("vec_id")).limit(maxTrain)
      .select(col("emb")).collect().map(_.getSeq[Double](0).toArray)
    require(sample.length >= k,
      s"PQ training sample ${sample.length} < k=$k — lower trainMod")
    val book = VectorQueries.pqTrain(sample, m, k, sub, lloydRounds)

    import spark.implicits._
    book.zipWithIndex.flatMap { case (cents, mm) =>
      cents.zipWithIndex.map { case (c, kk) => (mm, kk, c) }
    }.toDF("mm", "kk", "cent")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/book")
    emb.select(col("vec_id"),
        VectorQueries.pqAssignExpr(book, col("emb"), m, sub).as("codes"))
      .write.mode("overwrite").parquet(s"$indexPath/codes")
    emb.unpersist(false)
  }

  /** Per-path cache of the stored coarse quantizer. The centroid
    * table is IMMUTABLE for an index's lifetime (FAISS's train-once
    * contract — only a full rebuild rewrites it, and the builders
    * invalidate below), so every serving call and every streaming
    * ingest micro-batch (StreamOps.ivfIngestBatch) shares one
    * driver-side copy instead of paying a parquet read + collect per
    * call. Bounded: k×dim doubles per distinct index path. */
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Seq[Double]]]()

  private[graft] def cachedCentroids(spark: SparkSession,
      indexPath: String): Seq[Seq[Double]] =
    centroidCache.computeIfAbsent(indexPath, _ =>
      spark.read.parquet(s"$indexPath/cents")
        .select(col("kk"), col("cent")).collect()
        .sortBy(_.getInt(0)).map(_.getSeq[Double](1)).toSeq)

  private[graft] def invalidateCentroids(indexPath: String): Unit =
    centroidCache.remove(indexPath)

  /** Heal an interrupted cells-table compaction swap before reading —
    * the serving-side half of the heal-first discipline shared with
    * the streaming ingest (StreamOps.recoverCompaction has the full
    * state argument). Without it, a serve issued in the crash window
    * fails on a missing path, and one issued after an un-healed
    * recreate would silently answer from a nearly-empty index. */
  private def healCells(spark: SparkSession, indexPath: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$indexPath/cells")
    graft.streaming.StreamOps.recoverCompaction(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** The stored quantizer, reassembled. */
  private def readBook(spark: SparkSession, indexPath: String): Seq[Seq[Seq[Double]]] = {
    val rows = spark.read.parquet(s"$indexPath/book")
      .select(col("mm"), col("kk"), col("cent")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    val m = rows.map(_._1).max + 1
    val k = rows.map(_._2).max + 1
    val byCell = rows.map(t => (t._1, t._2) -> t._3).toMap
    (0 until m).map(mm => (0 until k).map(kk => byCell((mm, kk))))
  }

  /** Idempotent per-sfDir index bootstrap (marker stamped after a
    * complete build) + search over the FIRST QueryK corpus vectors —
    * the bench/driver query form of the serving paths: warm calls
    * never retrain, so the measured number is what a serving system
    * pays per query batch. Serving semantics: self-matches included
    * (an identical incoming vector reporting sim 1.0 IS the signal).
    * Rows-only driver check; exact ground truth lives in
    * VectorIndexSpec (recall ≥ 0.9, self at rank 1, pruned probes). */
  def annIvfStored(spark: SparkSession, dir: String): DataFrame = {
    val idx = ensure(spark, dir, "ivf")(buildIvf(spark, dir, _))
    searchIvf(spark, idx, corpusQueries(spark, dir))
  }

  /** PQ twin of annIvfStored. */
  def annPqStored(spark: SparkSession, dir: String): DataFrame = {
    val idx = ensure(spark, dir, "pq")(buildPq(spark, dir, _))
    searchPq(spark, dir, idx, corpusQueries(spark, dir))
  }

  /** Composed IVF-PQ twin — the FAISS-production serving structure
    * as a driver query: probe prunes the scan fraction, codes bound
    * the bytes per row, one exact re-rank on the shortlist. */
  def annIvfPqStored(spark: SparkSession, dir: String): DataFrame = {
    val idx = ensure(spark, dir, "ivfpq")(buildIvfPq(spark, dir, _))
    searchIvfPq(spark, dir, idx, corpusQueries(spark, dir))
  }

  private def corpusQueries(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"))

  private def ensure(spark: SparkSession, dir: String, kind: String)(
      build: String => Unit): String = {
    // The cache key folds in the SOURCE table's file signature
    // (paths + sizes + mtimes), not just the dir name: a regenerated
    // embeddings.parquet under the same path lands in a fresh root
    // and rebuilds, instead of silently serving a stale index (the
    // round-7 testdata regeneration was exactly this hazard — an
    // index is derived data, and derived data must key on its
    // inputs' identity).
    val src = new java.io.File(dir, "embeddings.parquet")
    val files = Option(src.listFiles()).map(_.toSeq).getOrElse(Seq(src))
    val sig = files.sortBy(_.getName)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
    val dirHex = Integer.toHexString(dir.hashCode)
    val key = dirHex + "_" + Integer.toHexString(sig.hashCode)
    val tmpDir = new java.io.File(System.getProperty("java.io.tmpdir"))
    val rootFile = new java.io.File(tmpDir, s"graft_${kind}idx_$key")
    val root = rootFile.getAbsolutePath
    val marker = new java.io.File(root, "_complete")
    if (!marker.exists()) {
      // Reclaim orphaned roots for the SAME source dir under an OLD
      // signature: every embeddings regeneration moves the key, and
      // without this sweep each abandoned predecessor index would sit
      // in tmpdir forever (unbounded accumulation across rounds).
      Option(tmpDir.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.getName.startsWith(s"graft_${kind}idx_${dirHex}_") &&
          f.getName != rootFile.getName)
        .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
      org.apache.commons.io.FileUtils.deleteQuietly(rootFile)
      build(root)
      java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
    }
    root
  }

  /** Persist an IVF index: the corpus REORGANIZED by coarse cell —
    * normalized embeddings written `partitionBy("cell")`, plus the
    * k×dim centroid table. Training is the same bounded-sample
    * driver Lloyd as PQ (pqTrain with m=1 — one "subspace" spanning
    * the full vector). The payoff is physical: probing `nprobe`
    * cells at search time is PARTITION PRUNING on the index read —
    * only those cells' files are listed and scanned, the on-disk
    * form of IVF's scan-fraction bound (spec-asserted via the
    * executed scan's numFiles metric). */
  def buildIvf(spark: SparkSession, dir: String, indexPath: String,
      k: Int = 16, lloydRounds: Int = 4, trainMod: Int = 1,
      maxTrain: Int = 4096): Unit = {
    val emb = VectorQueries.embNormed(spark, dir).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sample: Array[Array[Double]] = emb
      .filter(pmod(col("vec_id"), lit(trainMod)) === 0)
      .orderBy(col("vec_id")).limit(maxTrain)
      .select(col("emb")).collect().map(_.getSeq[Double](0).toArray)
    require(sample.length >= k,
      s"IVF training sample ${sample.length} < k=$k — lower trainMod")
    val cents = VectorQueries.pqTrain(sample, 1, k, VectorQueries.Dim, lloydRounds).head

    import spark.implicits._
    invalidateCentroids(indexPath) // rebuild replaces the quantizer
    cents.zipWithIndex.map { case (c, kk) => (kk, c) }.toDF("kk", "cent")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/cents")
    val assign = nearestCellExpr(cents, col("emb"))
    emb.select(col("vec_id"), col("emb"), assign.as("cell"))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexPath/cells")
    emb.unpersist(false)
  }

  /** 0-based nearest-centroid cell by max dot (normalized corpus:
    * cosine == dot); ties to the lowest cell. Shared with the
    * streaming maintenance path (StreamOps.ivfIngestBatch) so batch
    * build and incremental add can never assign differently. */
  private[graft] def nearestCellExpr(cents: Seq[Seq[Double]], v: Column): Column = {
    val dots = array(cents.map(c =>
      call_function("graft_dot", v, typedlit(c))): _*)
    (array_position(dots, array_max(dots)) - 1).cast("int")
  }

  /** Top-`kNN` per external query against the stored IVF index —
    * self-contained: the index carries the embeddings, so search
    * never re-reads the corpus table. Cells ranked driver-side
    * against the tiny centroid table; the probe list prunes the
    * index read to `nprobe` cells per query. */
  def searchIvf(spark: SparkSession, indexPath: String, queries: DataFrame,
      kNN: Int = 5, nprobe: Int = 6, maxQueryBatch: Int = 8192): DataFrame = {
    import spark.implicits._
    // self-contained path: nothing upstream registers the native dot
    graft.functions.GraftFunctions.ensureRegistered(spark)
    healCells(spark, indexPath)
    val cents = cachedCentroids(spark, indexPath)
    lastStoredIvf = Some((cents, nprobe))
    val qVecs = queries
      .select(col("qid").cast("long"),
        col("qemb").cast("array<double>").as("qemb"))
      .limit(maxQueryBatch + 1)
      .collect().map { r =>
        val q = r.getSeq[Double](1)
        val n = math.sqrt(q.map(x => x * x).sum)
        (r.getLong(0), if (n > 0) q.map(_ / n) else q)
      }
    require(qVecs.length <= maxQueryBatch,
      s"searchIvf is a serving path: > $maxQueryBatch query vectors in one batch")

    val probes: Seq[(Long, Int)] = qVecs.toSeq.flatMap { case (id, q) =>
      cents.zipWithIndex
        .map { case (c, kk) => (kk, (0 until q.length).map(i => q(i) * c(i)).sum) }
        .sortBy { case (kk, d) => (-d, kk) }.take(nprobe)
        .map { case (kk, _) => (id, kk) }
    }
    val probedCells = probes.map(_._2).distinct
    // isin on the partition column -> file-level pruning of the read
    val probed = spark.read.parquet(s"$indexPath/cells")
      .filter(col("cell").isin(probedCells: _*))
    val qEmb = qVecs.toSeq.map { case (id, q) => (id, q) }.toDF("qid", "qemb")
    probed
      .join(broadcast(probes.toDF("qid", "cell")), Seq("cell"))
      .join(broadcast(qEmb), Seq("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(call_function("graft_dot", col("qemb"), col("emb")), 4).as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))).cast("long"))
      .filter(col("rank") <= kNN)
      .select(col("qid"), col("rank"), col("nid"), col("sim"))
  }

  /** The COMPOSED index — coarse IVF cells over PQ codes, the
    * FAISS-production structure (here without residual encoding: the
    * PQ book quantizes raw vectors, so it is shared verbatim with
    * the flat PQ index and searchPq): the probe list bounds the SCAN
    * FRACTION (partition pruning on `cell`) and the codes bound the
    * BYTES PER ROW (m ints) — at 100 TB the two multiply into a
    * nprobe/k × m/(8·dim) read. */
  def buildIvfPq(spark: SparkSession, dir: String, indexPath: String,
      kCells: Int = 16, m: Int = 8, kCodes: Int = 32, lloydRounds: Int = 4,
      trainMod: Int = 1, maxTrain: Int = 4096): Unit = {
    val sub = VectorQueries.Dim / m
    val emb = VectorQueries.embNormed(spark, dir).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sample: Array[Array[Double]] = emb
      .filter(pmod(col("vec_id"), lit(trainMod)) === 0)
      .orderBy(col("vec_id")).limit(maxTrain)
      .select(col("emb")).collect().map(_.getSeq[Double](0).toArray)
    require(sample.length >= math.max(kCells, kCodes),
      s"IVFPQ training sample ${sample.length} too small — lower trainMod")
    val cents = VectorQueries.pqTrain(sample, 1, kCells, VectorQueries.Dim, lloydRounds).head
    val book = VectorQueries.pqTrain(sample, m, kCodes, sub, lloydRounds)

    import spark.implicits._
    invalidateCentroids(indexPath) // rebuild replaces the quantizer
    cents.zipWithIndex.map { case (c, kk) => (kk, c) }.toDF("kk", "cent")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/cents")
    book.zipWithIndex.flatMap { case (cs, mm) =>
      cs.zipWithIndex.map { case (c, kk) => (mm, kk, c) }
    }.toDF("mm", "kk", "cent")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/book")
    emb.select(col("vec_id"),
        VectorQueries.pqAssignExpr(book, col("emb"), m, sub).as("codes"),
        nearestCellExpr(cents, col("emb")).as("cell"))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexPath/cells")
    emb.unpersist(false)
  }

  /** Search the composed index: probe prunes the read, ADC scores
    * only probed codes, exact re-rank fetches embeddings for the
    * shortlist ids only (the corpus table's one remaining role). */
  def searchIvfPq(spark: SparkSession, dir: String, indexPath: String,
      queries: DataFrame, kNN: Int = 5, nprobe: Int = 6, shortlist: Int = 100,
      maxQueryBatch: Int = 8192): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    healCells(spark, indexPath)
    val cents = cachedCentroids(spark, indexPath)
    val book = readBook(spark, indexPath)
    lastStoredIvfPq = Some((cents, book, nprobe, shortlist))
    val m = book.length; val k = book.head.length
    val qVecs = queries
      .select(col("qid").cast("long"),
        col("qemb").cast("array<double>").as("qemb"))
      .limit(maxQueryBatch + 1)
      .collect().map { r =>
        val q = r.getSeq[Double](1)
        val n = math.sqrt(q.map(x => x * x).sum)
        (r.getLong(0), if (n > 0) q.map(_ / n) else q)
      }
    require(qVecs.length <= maxQueryBatch,
      s"searchIvfPq is a serving path: > $maxQueryBatch query vectors in one batch")

    val probes: Seq[(Long, Int)] = qVecs.toSeq.flatMap { case (id, q) =>
      cents.zipWithIndex
        .map { case (c, kk) => (kk, (0 until q.length).map(i => q(i) * c(i)).sum) }
        .sortBy { case (kk, d) => (-d, kk) }.take(nprobe)
        .map { case (kk, _) => (id, kk) }
    }
    val luts = qVecs.toSeq.map { case (id, q) =>
      (id, VectorQueries.pqLut(book, q)) }.toDF("qid", "lut")

    val probed = spark.read.parquet(s"$indexPath/cells")
      .filter(col("cell").isin(probes.map(_._2).distinct: _*))
    val candidates = probed
      .join(broadcast(probes.toDF("qid", "cell")), Seq("cell"))
      .join(broadcast(luts), Seq("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        VectorQueries.pqAdcExpr(m, k).as("adc_score"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("adc_score").desc, col("nid"))))
      .filter(col("rk") <= shortlist)
      .select(col("qid"), col("nid"))

    val emb = VectorQueries.embNormed(spark, dir)
    val qEmb = qVecs.toSeq.map { case (id, q) => (id, q) }.toDF("qid", "qemb")
    candidates
      .join(broadcast(qEmb), Seq("qid"))
      .join(emb.select(col("vec_id").as("nid"), col("emb")), Seq("nid"))
      .select(col("qid"), col("nid"),
        round(call_function("graft_dot", col("qemb"), col("emb")), 4).as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))).cast("long"))
      .filter(col("rank") <= kNN)
      .select(col("qid"), col("rank"), col("nid"), col("sim"))
  }

  /** Top-`kNN` per query against the stored index. `queries` is
    * (qid: Long, qemb: Array[Float|Double]) — external vectors, the
    * serving shape (normalized here, like scoreQueries). `dir` still
    * supplies the corpus embeddings for the exact re-rank of the
    * shortlist; a pure compressed-domain search (skip the re-rank)
    * would drop that dependency at the cost of approximate scores. */
  def searchPq(spark: SparkSession, dir: String, indexPath: String,
      queries: DataFrame, kNN: Int = 5, shortlist: Int = 100,
      maxQueryBatch: Int = 8192): DataFrame = {
    val book = readBook(spark, indexPath)
    lastStoredPq = Some((book, shortlist))
    val m = book.length; val k = book.head.length
    import spark.implicits._
    // queries are collected to compute driver-side LUTs and ride the
    // scoring join as a broadcast — correct ONLY for serving-sized
    // batches, so the bound is explicit rather than an OOM surprise.
    // A corpus-sized query set is a different shape (compute LUTs
    // distributed, shuffle-join on codes) — out of serving scope.
    val qVecs = queries
      .select(col("qid").cast("long"),
        col("qemb").cast("array<double>").as("qemb"))
      .limit(maxQueryBatch + 1)
      .collect().map { r =>
        val q = r.getSeq[Double](1)
        val n = math.sqrt(q.map(x => x * x).sum)
        (r.getLong(0), if (n > 0) q.map(_ / n) else q)
      }
    require(qVecs.length <= maxQueryBatch,
      s"searchPq is a serving path: > $maxQueryBatch query vectors in one " +
        "batch — split the batch or raise maxQueryBatch explicitly")
    val luts = qVecs.toSeq.map { case (id, q) =>
        (id, VectorQueries.pqLut(book, q)) }.toDF("qid", "lut")

    val codes = spark.read.parquet(s"$indexPath/codes")
    val candidates = codes.crossJoin(broadcast(luts))
      .select(col("qid"), col("vec_id").as("nid"),
        VectorQueries.pqAdcExpr(m, k).as("adc_score"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("adc_score").desc, col("nid"))))
      .filter(col("rk") <= shortlist)
      .select(col("qid"), col("nid"))

    // exact re-rank of the shortlist — the queries are EXTERNAL, so
    // unlike topkByDot the query side comes from the broadcast qVecs
    val emb = VectorQueries.embNormed(spark, dir)
    val qEmb = qVecs.toSeq.map { case (id, q) => (id, q) }.toDF("qid", "qemb")
    candidates
      .join(broadcast(qEmb), Seq("qid"))
      .join(emb.select(col("vec_id").as("nid"), col("emb")), Seq("nid"))
      .select(col("qid"), col("nid"),
        round(call_function("graft_dot", col("qemb"), col("emb")), 4).as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))).cast("long"))
      .filter(col("rank") <= kNN)
      .select(col("qid"), col("rank"), col("nid"), col("sim"))
  }

  // ——— stored-index model registers + oracle renderers ———
  //
  // Set when a search reads its model from the index; consumed by
  // SparkEntry.oracleSql after Verify has run the stored-index
  // queries in this JVM (the same contract as VectorQueries'
  // registers). The rendered SQL recomputes cell assignment / codes
  // from the embeddings table with the STORED model — equal to the
  // persisted index contents because the build derived them from the
  // same table with the same expressions; a stale index (testdata
  // regenerated under a cached _complete marker) surfaces as a loud
  // oracle mismatch rather than silent drift. Both serving paths keep
  // self-pairs: their queries are external by contract, so "self" has
  // no special status (corpusQueries just happens to reuse corpus
  // vectors as the deterministic query set).
  @volatile private[graft] var lastStoredIvf: Option[(Seq[Seq[Double]], Int)] = None
  @volatile private[graft] var lastStoredPq: Option[(Seq[Seq[Seq[Double]]], Int)] = None

  private[graft] def storedIvfOracleSql: Option[String] =
    lastStoredIvf.map { case (cents, nprobe) =>
      VectorQueries.ivfOracleSqlOf(cents, nprobe, excludeSelf = false) }

  private[graft] def storedPqOracleSql: Option[String] =
    lastStoredPq.map { case (book, shortlist) =>
      VectorQueries.pqOracleSqlOf(book, shortlist, excludeSelf = false) }

  @volatile private[graft] var lastStoredIvfPq:
    Option[(Seq[Seq[Double]], Seq[Seq[Seq[Double]]], Int, Int)] = None

  private[graft] def storedIvfPqOracleSql: Option[String] =
    lastStoredIvfPq.map { case (cents, book, nprobe, shortlist) =>
      VectorQueries.ivfPqOracleSqlOf(cents, book, nprobe, shortlist) }
}
