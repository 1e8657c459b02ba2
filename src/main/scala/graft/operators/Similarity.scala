package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`, 64-dim).
  *
  * Brute-force cosine top-k is the correctness baseline; the sign-LSH
  * bucketed variant is the scale path (bucket key = sign bits of leading
  * dimensions → candidates shuffle on bucket key, never a full cross
  * join). All arithmetic is promoted to double (`array<double>` casts)
  * so scores are bit-reproducible against the DuckDB oracle.
  */
object Similarity {

  /** Sequential-fold dot product of two double arrays — same evaluation
    * order as DuckDB's `list_dot_product`, so results match bit-for-bit.
    * Native codegen expression (graft.functions.DotProduct); the
    * zip_with/aggregate HOF form is interpreted and ~10× slower. */
  private def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct(a, b)

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Brute-force cosine top-k: queries = vec_id < nQueries, candidates =
    * the rest. Emits (qid, rank, vid) — ranks are stable under a
    * deterministic (score desc, vid asc) order. One broadcast of the tiny
    * query set against a full scan of candidates: linear, no shuffle
    * until the per-query top-k. */
  def cosineTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val withNorm = emb.select(
      col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("nrm", sqrt(dot(col("e"), col("e"))))
    val q = withNorm.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"))
    val c = withNorm.where(col("vec_id") >= nQueries)
      .select(col("vec_id").as("vid"), col("e").as("ce"), col("nrm").as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("qid"), col("vid"),
        (dot(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("cos"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vid").asc)))
      .where(col("rnk") <= k)
      .select("qid", "rnk", "vid")
      .orderBy("qid", "rnk")
  }

  /** Sign-LSH bucket key: sign bits of the first `nBits` dimensions
    * packed into a long. Random-hyperplane LSH with axis-aligned planes
    * — adequate for gaussian-ish embeddings and fully deterministic. */
  /** Sign-LSH bucket key. `nBits = 0` folds to the single bucket 0 —
    * every pair becomes a candidate, i.e. the exhaustive dial (q144). */
  private def bucketKey(e: Column, nBits: Int): Column =
    (0 until nBits).map(i =>
      when(element_at(e, i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .foldLeft(lit(0L))(_ bitwiseOR _)

  /** LSH-bucketed approximate nearest neighbors. At scale: candidates
    * shuffle on (bucket) — per-bucket work, no cross join. Recall
    * trades off with nBits; `probeRadius = 1` is the standard
    * multi-probe recall repair: each query ALSO searches the nBits
    * buckets at hamming distance 1 from its own (a near neighbor
    * sitting just across one sign boundary lands there), costing
    * (nBits+1)× query-side rows — queries are the tiny side — while
    * the corpus side stays untouched. */
  def annLshTopK(emb: DataFrame, nQueries: Int, k: Int, nBits: Int = 6,
                 probeRadius: Int = 0): DataFrame = {
    require(probeRadius <= 1, "probeRadius > 1 not implemented (nBits² probes)")
    val base = emb.select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("nrm", sqrt(dot(col("e"), col("e"))))
      .withColumn("bucket", bucketKey(col("e"), nBits))
    val q0 = base.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"), col("bucket"))
    val q =
      if (probeRadius == 0) q0
      else q0.select(col("qid"), col("qe"), col("qn"),
        explode(array((col("bucket") +: (0 until nBits).map(i =>
          col("bucket").bitwiseXOR(lit(1L << i)))): _*)).as("bucket"))
    val c = base.where(col("vec_id") >= nQueries)
      .select(col("vec_id").as("vid"), col("e").as("ce"), col("nrm").as("cn"), col("bucket"))
    // a candidate lives in exactly one bucket and probe buckets are
    // distinct, so each (qid, vid) pair scores at most once — no dedup
    val scored = c.join(q, Seq("bucket"))
      .select(col("qid"), col("vid"),
        (dot(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("cos"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vid").asc)))
      .where(col("rnk") <= k)
      .select("qid", "rnk", "vid")
      .orderBy("qid", "rnk")
  }

  /** A trained IVF index: broadcast-sized centroid frame + the corpus
    * assigned to inverted lists (persisted — the index is a long-lived
    * artifact searched many times). Train ONCE with `ivfBuild`, search
    * repeatedly with `ivfSearch` — the FAISS usage pattern that
    * amortizes the KMeans fit, which otherwise dominates every call
    * (q56's per-call fit is ~5× the search cost at bench scale).
    * Release with `release()` when done. */
  final case class IvfIndex(centroids: DataFrame, assigned: DataFrame, nList: Int) {
    def release(): Unit = assigned.unpersist(blocking = false)
  }

  /** Sample-bounded coarse-quantizer fit — the `pqFitBooks` pattern
    * applied to the IVF centroids: seeded driver-side Lloyd on a
    * hash-sampled bounded slice (`xxhash64(vec_id)`-keyed, raw
    * un-normalized vectors — the MLlib fit's space), via
    * `pqFitBooksLocal` with one "subspace" of width `dim`. Centroids
    * are statistics, not indexes (FAISS `Clustering` trains on
    * ≤ max_points_per_centroid·k sampled points for exactly this
    * reason), so the fit cost is O(sampleCap·nList·dim·iters) on the
    * driver INDEPENDENT OF CORPUS SIZE — this removes the N×nList×iters
    * distributed-KMeans term that dominated sf10 index builds
    * (SCALE_r07_knnfix). Deterministic bit-for-bit: seeded init,
    * lowest-index ties, empty clusters keep their previous center. */
  private[graft] def coarseFitSample(base: DataFrame, nList: Int,
                                     sampleCap: Int = 65536,
                                     maxIter: Int = 20): Array[Array[Double]] = {
    val pts = pqSamplePoints(base, sampleCap, normalize = false)
    require(pts.length >= nList,
      s"sample (${pts.length}) smaller than nList=$nList — lower nList or raise sampleCap")
    coarseLloyd(pts, nList, maxIter)
  }

  /** Full-width seeded Lloyd over the driver sample — bit-identical
    * math to `pqFitBooksLocal(pts, 1, k, dim)` (same seeded init, same
    * strict-`<` lowest-index ties, same keep-previous-center rule for
    * empty clusters), but with the argmin ASSIGNMENT loop chunked
    * across a thread pool: unlike the PQ case (m subspaces already
    * train in parallel), the coarse fit is ONE subspace of full width,
    * so without this the whole sample×k×dim hot loop runs on a single
    * core. Determinism holds because per-point argmin is independent
    * (no FP accumulation crosses points) and the center UPDATE
    * accumulates sequentially in point order. */
  private[graft] def coarseLloyd(pts: Array[Array[Double]], k: Int,
                                 maxIter: Int = 20): Array[Array[Double]] = {
    val dim = pts(0).length
    val rnd = new scala.util.Random(42L)
    val cents = Array.tabulate(k)(_ => new Array[Double](dim))
    val seedIdx = rnd.shuffle(pts.indices.toVector).take(k)
    for (c <- 0 until k) System.arraycopy(pts(seedIdx(c)), 0, cents(c), 0, dim)
    val assign = new Array[Int](pts.length)
    val nT = math.max(1, Runtime.getRuntime.availableProcessors())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nT)
    try {
      var iter = 0
      var moved = true
      while (iter < maxIter && moved) {
        val it0 = iter == 0
        val cN2 = cents.map(c => c.map(v => v * v).sum)
        val chunk = math.max(1024, (pts.length + nT - 1) / nT)
        val tasks = (0 until pts.length by chunk).map { lo =>
          val hi = math.min(pts.length, lo + chunk)
          pool.submit(new java.util.concurrent.Callable[Boolean] {
            def call(): Boolean = {
              var m0 = it0
              var i = lo
              while (i < hi) {
                val x = pts(i)
                var best = 0
                var bestD = Double.PositiveInfinity
                var c = 0
                while (c < k) {
                  val cc = cents(c)
                  var dotXC = 0.0
                  var t = 0
                  while (t < dim) { dotXC += x(t) * cc(t); t += 1 }
                  val d = cN2(c) - 2.0 * dotXC
                  if (d < bestD) { bestD = d; best = c }
                  c += 1
                }
                if (assign(i) != best) { assign(i) = best; m0 = true }
                i += 1
              }
              m0
            }
          })
        }
        moved = tasks.map(_.get()).exists(identity)
        if (moved) {
          val sums = Array.tabulate(k)(_ => new Array[Double](dim))
          val counts = new Array[Int](k)
          var i = 0
          while (i < pts.length) {
            val c = assign(i); counts(c) += 1
            var t = 0
            while (t < dim) { sums(c)(t) += pts(i)(t); t += 1 }
            i += 1
          }
          var c = 0
          while (c < k) {
            if (counts(c) > 0) {
              var t = 0
              while (t < dim) { cents(c)(t) = sums(c)(t) / counts(c); t += 1 }
            }
            c += 1
          }
        }
        iter += 1
      }
    } finally pool.shutdown()
    cents
  }

  /** Frozen-centroid Euclidean assignment in codegen: argmin‖x−c‖² =
    * argmax(x·c − ‖c‖²/2), so appending a constant-1 component to x
    * and a −‖c‖²/2 bias to each centroid turns Euclidean argmin into
    * exactly the max-dot/lowest-id-tie scan `NearestLists` implements.
    * No N×nList joined intermediate, no window — the same per-row
    * register scan as probe selection, and the SAME tie order as
    * `assignToLists` (dist asc, list_id asc), so a later
    * `ivfAppendSave` re-lands a replayed vector in the identical
    * list. */
  private def assignNearestCodegen(base: DataFrame,
                                   cents: Array[Array[Double]]): DataFrame = {
    val dim = if (cents.isEmpty) 0 else cents(0).length
    val aug = cents.flatMap(c => c :+ (-0.5 * c.map(v => v * v).sum))
    val ids = cents.indices.toArray
    base.select(col("vec_id").as("vid"), col("e").as("ce"),
      col("nrm").as("cn"),
      explode(graft.functions.NearestLists(
        concat(col("e"), array(lit(1.0d))), aug, ids, dim + 1, 1)).as("list_id"))
  }

  /** Train the IVF coarse quantizer on `corpus` and assign every
    * corpus vector to its nearest list.
    *
    * `sampleFit = false` (default): seeded MLlib KMeans over the full
    * corpus — deterministic per build, but the fit is N×nList×maxIter
    * distributed distance evals, the super-unit scale term of the
    * sf1→sf10 campaign. `sampleFit = true`: `coarseFitSample` fits the
    * centroids on a bounded driver slice and the one unavoidable
    * N×nList pass left is the ASSIGNMENT, which runs as a codegen
    * register scan (`assignNearestCodegen`) with no joined
    * intermediate. The exhaustive dial (scanFrac = 1.0 / nProbe =
    * nList) is invariant to the choice BY CONSTRUCTION — every list is
    * scanned either way, so results are bit-equal; probed recall
    * parity is measured in `SimilaritySpec`. Assignment is one
    * distributed pass either way; the result persists partitioned by
    * access pattern (list-id shuffle happens once, at first search). */
  def ivfBuild(corpus: DataFrame, nList: Int = 8,
               sampleFit: Boolean = false): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val base = corpus.select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("nrm", sqrt(dot(col("e"), col("e"))))
    val spark = corpus.sparkSession
    import spark.implicits._

    if (sampleFit) {
      val cents = coarseFitSample(base, nList)
      val centDf = cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
        .toSeq.toDF("list_id", "centroid")
      val assigned = assignNearestCodegen(base, cents)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      IvfIndex(centDf, assigned, nList)
    } else {
      val vecs = base.withColumn("features", array_to_vector(col("e")))
      val model = new KMeans().setK(nList).setSeed(42L).setMaxIter(5)
        .setFeaturesCol("features").setPredictionCol("list_id")
        .fit(vecs)
      val centDf = model.clusterCenters.zipWithIndex.map { case (c, i) =>
        (i, c.toArray.toSeq)
      }.toSeq.toDF("list_id", "centroid")
      val assigned = model.transform(vecs)
        .select(col("vec_id").as("vid"), col("e").as("ce"),
          col("nrm").as("cn"), col("list_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      IvfIndex(centDf, assigned, nList)
    }
  }

  /** Hybrid-retrieval fusion (Cormack et al. 2009 reciprocal rank
    * fusion): merge the DENSE candidate list (exact cosine top-2k per
    * query embedding) with the LEXICAL candidate list (BM25 top-2k for
    * the term set) by RRF points 1/(60 + rank), kept exact as
    * fixed-point ppm (1000000 div (60 + rank)) so the fused ranking is
    * BIGINT-exact against the oracle — no float accumulation anywhere.
    * Output (qid, rnk, vid, rrf_ppm): the top-k fused list per query.
    *
    * The lexical corpus is restricted to the dense corpus side
    * (doc_id ≥ nQueries) so both lists draw from the same candidate
    * pool. Shape for scale: both stages are the already-audited q39/
    * q107 shapes (broadcast query side; single-agg pivot); the fusion
    * itself aggregates ≤ nQueries·4k candidate rows — negligible. */
  def rrfFusion(emb: DataFrame, docs: DataFrame, terms: Seq[String],
                nQueries: Int, k: Int): DataFrame = {
    val dense = cosineTopK(emb, nQueries, 2 * k)
      .select(col("qid"), col("vid"),
        expr("1000000L div (60L + rnk)").as("pts"))
    val lex = TextAnalysis.bm25TopK(
        docs.where(col("doc_id") >= nQueries), terms, 2 * k)
      .withColumn("lrnk", row_number().over(
        Window.orderBy(col("score_ppm").desc, col("doc_id").asc)))
      .select(col("doc_id").as("vid"),
        expr("1000000L div (60L + lrnk)").as("pts"))
    // the lexical list is query-independent: every query receives the
    // same contributions (bounded 2k-row crossJoin)
    val qids = dense.select("qid").distinct()
    val fused = dense.unionByName(qids.crossJoin(lex))
      .groupBy("qid", "vid")
      .agg(sum(col("pts")).as("rrf_ppm"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("rrf_ppm").desc, col("vid").asc)))
      .where(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vid"), col("rrf_ppm"))
      .orderBy("qid", "rnk")
    fused
  }

  /** Hybrid retrieval over the PERSISTED stores — `rrfFusion`'s
    * serving face, tying the two store families together: the dense
    * ranking comes from an `ivfSave` store searched at the exhaustive
    * dial (nProbe = nList, bit-equal to brute — the q141/q156
    * discipline), the lexical ranking from the `lexSave` postings
    * store (bucket-pruned, q165), fused with the same fixed-point RRF
    * (Cormack et al. 2009; 10⁶ div (60 + rank)). The store round-trip
    * must not move a single rank: q167 hash-matches q108's oracle.
    * Result is bounded at queries×k rows — localized so both loaded
    * stores release deterministically. */
  def rrfFusionStores(spark: org.apache.spark.sql.SparkSession,
                      vecPath: String, lexPath: String, queries: DataFrame,
                      terms: Seq[String], k: Int): DataFrame = {
    val idx = ivfLoad(spark, vecPath)
    try {
      val dense = ivfSearch(idx, queries, 2 * k, idx.nList)
        .select(col("qid"), col("vid"),
          expr("1000000L div (60L + rnk)").as("pts"))
      val lex = Lexical.lexSearch(spark, lexPath, terms, 2 * k)
        .withColumn("lrnk", row_number().over(
          Window.orderBy(col("score_ppm").desc, col("doc_id").asc)))
        .select(col("doc_id").as("vid"),
          expr("1000000L div (60L + lrnk)").as("pts"))
      val qids = dense.select("qid").distinct()
      val fused = dense.unionByName(qids.crossJoin(lex))
        .groupBy("qid", "vid")
        .agg(sum(col("pts")).as("rrf_ppm"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("qid").orderBy(col("rrf_ppm").desc, col("vid").asc)))
        .where(col("rnk") <= k)
        .select(col("qid"), col("rnk"), col("vid"), col("rrf_ppm"))
        .orderBy("qid", "rnk")
      val rows = fused.collect().toIndexedSeq
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), fused.schema)
    } finally idx.release()
  }

  /** Cluster-balanced diversity sampling — the embedding-space analog
    * of `TrainingData.quotaSample`: k-means the corpus with the IVF
    * coarse quantizer (seeded, deterministic), then keep up to
    * `perCluster` vectors per cluster by deterministic hash rank. A
    * pretraining mixture uses this to flatten semantic density:
    * over-represented regions contribute at most `perCluster` docs
    * each, regardless of how many near-identical variants exist.
    *
    * Shape for scale: the quota window shuffles once on list_id (same
    * partitioning the IVF search reuses); the hash rank needs no
    * global sort. Rows-only at the driver gate (seeded KMeans has no
    * DuckDB analog); `SimilaritySpec` pins determinism, the
    * per-cluster cap, and exact expected output size. */
  def diversitySample(emb: DataFrame, nClusters: Int, perCluster: Int): DataFrame =
    diversitySampleScoped(emb, nClusters, perCluster)._1

  def diversitySampleScoped(emb: DataFrame, nClusters: Int,
                            perCluster: Int): (DataFrame, () => Unit) = {
    val idx = ivfBuild(emb, nClusters)
    val res = idx.assigned
      .withColumn("rk", row_number().over(
        Window.partitionBy("list_id").orderBy(xxhash64(col("vid")), col("vid"))))
      .where(col("rk") <= perCluster)
      .select(col("vid").as("vec_id"), col("list_id"), col("rk"))
      .orderBy("vec_id")
    (res, () => idx.release())
  }

  /** Persist a trained IVF index as two parquet tables (`centroids/`,
    * `assigned/`) so later sessions can search without re-running the
    * KMeans fit — the FAISS write_index/read_index lifecycle. The
    * assigned lists are written partitioned by `list_id`: a reloaded
    * search's probe join then prunes to the probed lists' files at the
    * scan (partition pruning), which is what makes the on-disk index an
    * INDEX rather than a copy of the corpus. */
  def ivfSave(index: IvfIndex, path: String): Unit = {
    index.centroids.write.mode("overwrite").parquet(s"$path/centroids")
    // cluster whole lists into tasks before the partitioned write:
    // without it every scan partition writes a sliver into every list
    // directory — up to partitions×nList files — and with maintenance
    // scaling nList to the store, save + first-list cost turned
    // superlinear (the 336 s rebalance measured in the round-8 sf10
    // campaign was mostly this). One balanced shuffle → nList files.
    graft.core.Stores.writeLayout(index.assigned, col("list_id"))
      .write.mode("overwrite")
      .partitionBy("list_id").parquet(s"$path/assigned")
  }

  /** Rebuild an index from `ivfSave` output: no fit, no assignment —
    * one small centroid read plus a lazy scan over the assigned lists
    * (persisted, like `ivfBuild`'s, because a search probes it twice
    * per query batch at most once-materialized). Search-after-reload
    * equals search-after-build (`SimilaritySpec` pins it). */
  def ivfLoad(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex = {
    val cents = spark.read.parquet(s"$path/centroids")
    val nList = cents.count().toInt
    val raw = spark.read.parquet(s"$path/assigned")
    // float lists carry `ce` (array<double>), SQ8 lists `qc` (binary),
    // 1-bit lists `bc` (binary, no norm column — Hamming needs none) —
    // all round-trip through the same save/load
    val cols =
      if (raw.columns.contains("bc")) Seq(col("vid"), col("bc"))
      else if (raw.columns.contains("qc")) Seq(col("vid"), col("qc"), col("cn"))
      else Seq(col("vid"), col("ce"), col("cn"))
    val assigned = raw
      // partitionBy moved list_id to the end and widened it; restore the
      // build-time column order and type so the index forms are
      // interchangeable frame-for-frame
      .select(cols :+ col("list_id").cast("int").as("list_id"): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    IvfIndex(cents, assigned, nList)
  }

  /** Assign NEW vectors to an existing index's lists without refitting
    * the quantizer — the FAISS `index.add()` analog and the vector half
    * of the incremental-ingest story (q97 / `IngestDedup` for docs):
    * a growing corpus appends embeddings batch by batch against frozen
    * centroids, refitting only on drift. Assignment uses the
    * quantizer's own metric (squared Euclidean — argmin of
    * |c|² − 2·v·c with |v|² constant), so appended vectors land in the
    * same list `ivfBuild` would have chosen; works for float and SQ8
    * indexes alike (codes re-encoded per batch). Centroids broadcast;
    * the only data motion is the new batch. */
  def ivfAppend(index: IvfIndex, newVecs: DataFrame): IvfIndex = {
    val merged = index.assigned.unionByName(assignToLists(
        index.centroids, newVecs, sq8 = index.assigned.columns.contains("qc")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    merged.count()
    index.release()
    IvfIndex(index.centroids, merged, index.nList)
  }

  /** Append new vectors to an `ivfSave`d index ON DISK: assign against
    * the saved centroids (read, broadcast — no list scan at all) and
    * append the new rows to the partitioned list store. A subsequent
    * `ivfLoad` sees the union; per-batch cost is O(batch), independent
    * of the store size — the `IngestDedup.processBatch` contract for
    * vectors. */
  def ivfAppendSave(spark: org.apache.spark.sql.SparkSession, path: String,
                    newVecs: DataFrame): Unit = {
    val cents = spark.read.parquet(s"$path/centroids")
    val fields = spark.read.parquet(s"$path/assigned").schema.fieldNames
    assignToLists(cents, newVecs, sq8 = fields.contains("qc"),
        bin = fields.contains("bc"))
      // one file per touched list, not per task (pinned width)
      .transform(graft.core.Stores.writeLayout(_, col("list_id")))
      .write.mode("append").partitionBy("list_id").parquet(s"$path/assigned")
  }

  /** Offline compaction of an `ivfSave`d list store: drop the
    * duplicate vid rows an at-least-once replay appends (frozen
    * centroids ⇒ a replayed vector re-lands bit-identically in the
    * same list, so any survivor is the row). Searches already tolerate
    * the duplicates — this reclaims the space and keeps list scans
    * proportional to the true corpus. Returns rows after compaction;
    * run offline (the `core.Stores.rewriteDeduped` swap contract). */
  def ivfCompact(spark: org.apache.spark.sql.SparkSession,
                 path: String): Long =
    graft.core.Stores.rewriteDeduped(spark, s"$path/assigned",
      Seq("vid"), Seq("list_id"))

  /** Offline compaction for the CODE stores the at-least-once ingest
    * can duplicate (`ivfCompact` covers the `assigned/` layouts):
    * flat PQ/OPQ `codes/`, IVF,PQ and OPQ,IVF,PQ `codes/`
    * (list_id-partitioned), and the binary `bincodes/`. A replayed
    * batch re-encodes bit-identically under the frozen
    * books/rotation/sign patterns, so any survivor is the row —
    * same staged-swap semantics as the rest of the compaction
    * family (`core.Stores.rewriteDeduped`). Returns rows after
    * compaction. */
  def codesCompact(spark: org.apache.spark.sql.SparkSession,
                   path: String): Long = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val has = (d: String) => fs.exists(new org.apache.hadoop.fs.Path(root, d))
    // same directory-shape dispatch as IngestVectors.processBatch —
    // reject unrecognized layouts explicitly instead of surfacing a
    // raw path-not-found mid-rewrite on a typo or an IVF store
    if (has("bincodes"))
      graft.core.Stores.rewriteDeduped(spark, s"$path/bincodes", Seq("vid"))
    else if (has("assigned"))
      throw new IllegalArgumentException(
        s"$path holds an IVF 'assigned/' list store — use ivfCompact")
    else if (!has("codes"))
      throw new IllegalArgumentException(
        s"$path is not a pqSave/opqSave/ivfPqSave/ivfOpqSave/binSave code store " +
          "(expected a codes/ or bincodes/ directory)")
    else if (has("centroids") && has("books"))
      graft.core.Stores.rewriteDeduped(spark, s"$path/codes",
        Seq("vid"), Seq("list_id"))
    else
      graft.core.Stores.rewriteDeduped(spark, s"$path/codes", Seq("vid"))
  }

  /** Per-list occupancy of an IVF index, INCLUDING empty lists — a
    * drift-skewed index typically pairs one swollen list with several
    * starved ones, and the starved ones vanish from a bare groupBy.
    * One hash aggregation over the lists + a left join from the
    * broadcast-sized centroid table. */
  def ivfListStats(index: IvfIndex): DataFrame = {
    val counts = index.assigned.groupBy("list_id")
      .agg(count(lit(1)).as("n_vecs"))
    index.centroids.select("list_id").join(counts, Seq("list_id"), "left")
      .select(col("list_id"), coalesce(col("n_vecs"), lit(0L)).as("n_vecs"))
      .orderBy("list_id")
  }

  /** Occupancy skew: max list size over mean list size (1.0 = perfectly
    * balanced, nList = everything in one list). Probe cost per query
    * tracks the probed lists' sizes, so skew S means worst-case probes
    * scan ~S× what the balanced N·scanFrac cost model assumes — the
    * operational signal to retrain. One nList-row aggregation. */
  def ivfSkew(index: IvfIndex): Double = {
    val r = ivfListStats(index)
      .agg(max(col("n_vecs")).as("mx"), sum(col("n_vecs")).as("tot")).head()
    if (r.isNullAt(1) || r.getLong(1) == 0L) 1.0
    else r.getLong(0).toDouble / (r.getLong(1).toDouble / index.nList)
  }

  /** Reconstruct `(vec_id, embedding)` from an index's stored truth:
    * float lists return their vectors verbatim; SQ8 lists dequantize
    * `scale·code` (the codes ARE the store — FAISS likewise retrains a
    * quantized index on reconstructions). SQ8 round-trips exactly:
    * the max-magnitude code is ±127 by construction, so re-encoding a
    * reconstruction regenerates the identical scale and codes
    * (`IvfRebalanceSpec` pins it bit-for-bit). */
  def ivfReconstruct(index: IvfIndex): DataFrame =
    reconstructAssigned(index.assigned)

  /** Frame-level body of `ivfReconstruct` — also reconstructs gap rows
    * read straight off a saved store (`ivfReplayGap`), where no
    * persisted `IvfIndex` exists. */
  private def reconstructAssigned(assigned: DataFrame): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    require(!assigned.columns.contains("bc"),
      "binary (sign-code) lists are not reconstructible — rebuild from the source corpus (the PQ-tier rule)")
    if (assigned.columns.contains("qc"))
      assigned.select(col("vid"), col("qc")).as[(Long, Array[Byte])]
        .map { case (vid, qc) =>
          var bits = 0L
          var i = 0
          while (i < 8) { bits = (bits << 8) | (qc(i) & 0xffL); i += 1 }
          val scale = java.lang.Double.longBitsToDouble(bits)
          (vid, Array.tabulate(qc.length - 8)(j => qc(8 + j) * scale))
        }.toDF("vec_id", "embedding")
    else
      assigned.select(col("vid").as("vec_id"), col("ce").as("embedding"))
  }

  /** Close the append gap between two generations of an `ivfSave`d
    * store: any vid present in `srcPath` but absent from `dstPath`
    * (an at-least-once batch that landed on the old path after the
    * rebuild's `ivfLoad` snapshot) is reconstructed from the old
    * store's own truth (float rows verbatim; SQ8 dequantized — exact
    * round-trip, `IvfRebalanceSpec`) and appended to the new
    * generation via `ivfAppendSave`. Idempotent (anti-join by vid;
    * replay duplicates collapse first), so the supervisor can call it
    * again at reader-swap time to close the post-rebuild tail. Cost:
    * one vid anti-join over the old lists + O(gap) assignment —
    * never a quantizer refit. Returns the number of replayed
    * vectors. */
  def ivfReplayGap(spark: org.apache.spark.sql.SparkSession,
                   srcPath: String, dstPath: String): Long = {
    val src = spark.read.parquet(s"$srcPath/assigned")
    val dstVids = spark.read.parquet(s"$dstPath/assigned").select("vid")
    val gap = reconstructAssigned(
        src.join(dstVids, Seq("vid"), "left_anti").dropDuplicates("vid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = gap.count()
    if (n > 0) ivfAppendSave(spark, dstPath, gap)
    gap.unpersist(blocking = false)
    n
  }

  /** Retrain-on-drift — the maintenance half of the append story.
    * `ivfAppend` keeps per-batch cost O(batch) by freezing the
    * centroids, which is exactly what lets a drifted workload pile new
    * vectors into a few lists; once `ivfSkew` crosses the caller's
    * threshold, this refits the coarse quantizer on the index's
    * CURRENT contents and reassigns every vector (same cost as the
    * original build: one bounded KMeans fit + one corpus shuffle).
    * Works for float and SQ8 indexes alike via `ivfReconstruct`.
    * Correctness is unchanged by construction — the exhaustive dial
    * (`scanFrac = 1.0` / nProbe = nList) scans every list either way —
    * rebalancing restores the even occupancy the fixed-nProbe cost and
    * recall models assume. */
  def ivfRebalance(index: IvfIndex, nList: Int = 0,
                   sampleFit: Boolean = false): IvfIndex = {
    val k = if (nList > 0) nList else index.nList
    val corpus = ivfReconstruct(index)
    val rebuilt =
      if (index.assigned.columns.contains("qc")) ivfBuildSq8(corpus, k, sampleFit)
      else ivfBuild(corpus, k, sampleFit)
    rebuilt.assigned.count() // materialize before releasing the source
    index.release()
    rebuilt
  }

  /** Skew-gated rebalance: the form an ingest loop calls after each
    * append burst. Below the threshold the index is returned untouched
    * (cost: one nList-row agg); above it, a full retrain. */
  def ivfRebalanceIfSkewed(index: IvfIndex, maxSkew: Double): IvfIndex =
    if (ivfSkew(index) > maxSkew) ivfRebalance(index) else index

  /** Offline on-disk rebalance: load an `ivfSave`d store, retrain,
    * write the rebalanced generation to `dstPath` (a NEW path — the
    * offline-compaction swap convention; readers move atomically by
    * switching paths, never observing a half-written store). */
  def ivfRebalanceSave(spark: org.apache.spark.sql.SparkSession,
                       srcPath: String, dstPath: String,
                       sampleFit: Boolean = false): Unit = {
    require(srcPath != dstPath,
      "rebalance writes a new generation; src and dst must differ")
    val rebuilt = ivfRebalance(ivfLoad(spark, srcPath), sampleFit = sampleFit)
    ivfSave(rebuilt, dstPath)
    rebuilt.release()
  }

  /** New-batch list assignment shared by the append paths: nearest
    * centroid by the quantizer metric (Euclidean argmin), then rows in
    * the index's list-frame layout (float `ce` or SQ8 `qc`).
    *
    * The argmin runs as the same codegen register scan the build and
    * probe paths use (`NearestLists` through the augmented-dot trick —
    * argmin‖x−c‖² = argmax(x·c − ‖c‖²/2) with ties to the lower list
    * id): the old broadcast crossJoin + per-vid ranking window
    * MATERIALIZED batch×nList rows, which turns into a
    * batch×(store/target) term once maintenance scales nList with the
    * store — measured as the dominant growth in the round-8 sf10
    * supervised pair-mining campaign (appends at nList 488 cost more
    * than the mining they feed). Centroids are nList rows of driver
    * metadata by contract. */
  private def assignToLists(centroids: DataFrame, newVecs: DataFrame,
                            sq8: Boolean, bin: Boolean = false): DataFrame = {
    val rows = centroids
      .select(col("list_id").cast("int").as("list_id"), col("centroid"))
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val dim = if (rows.isEmpty) 0 else rows(0)._2.length
    val aug = rows.flatMap { case (_, c) => c :+ (-0.5 * c.map(v => v * v).sum) }
    val ids = rows.map(_._1)
    val assigned = newVecs
      .select(col("vec_id").as("vid"), asDouble(col("embedding")).as("e"))
      .withColumn("list_id", explode(graft.functions.NearestLists(
        concat(col("e"), array(lit(1.0d))), aug, ids, dim + 1, 1)))
    if (bin)
      assigned.select(col("vid"),
        graft.functions.Bin.encode(col("e")).as("bc"), col("list_id"))
    else if (sq8) {
      import graft.functions.Sq8
      assigned.select(col("vid"), Sq8.encode(col("e")).as("qc"), col("list_id"))
        .withColumn("cn", sqrt(Sq8.dot(col("qc"), col("qc"))))
        .select("vid", "qc", "cn", "list_id")
    } else
      assigned.withColumn("cn", sqrt(dot(col("e"), col("e"))))
        .select(col("vid"), col("e").as("ce"), col("cn"), col("list_id"))
  }

  /** Probe-list selection WITHOUT the N×nList ranking window: one
    * bounded centroid collect (nList rows) rides into codegen via
    * `NearestLists` (`addReferenceObj` — constant generated code
    * regardless of nList), and each query row computes its own top
    * lists in registers. Bit-equal to the old crossJoin+row_number
    * form (same fold order, same list-id tiebreak — see the
    * expression's scaladoc); removes the N²/targetClusterRows
    * intermediate that made corpus-side probing superlinear in the
    * round-7 campaign. `q` must carry a `qe` column; `keep` names the
    * columns to carry through. */
  private def probeTopLists(q: DataFrame, keep: Seq[String],
                            centroids: DataFrame, nProbe: Int): DataFrame = {
    val rows = centroids
      .select(col("list_id").cast("int").as("list_id"), col("centroid"))
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    probeTopListsArr(q, keep, rows, nProbe)
  }

  private def probeTopListsArr(q: DataFrame, keep: Seq[String],
                               cents: Array[(Int, Array[Double])],
                               nProbe: Int): DataFrame = {
    val ids = cents.map(_._1)
    val flat = cents.flatMap(_._2)
    val dim = if (ids.isEmpty) 0 else flat.length / ids.length
    q.select(keep.map(col) :+ explode(graft.functions.NearestLists(
        col("qe"), flat, ids, dim, nProbe)).as("list_id"): _*)
  }

  /** Search a trained index: each query probes only the `nProbe` lists
    * whose centroids score highest (the centroid matrix rides into
    * codegen — nList rows), candidates shuffle on list id, no cross
    * join against the corpus.
    *
    * `scanFrac` is the recall-STABLE dial (same semantics as
    * `knnJoin`): when set, nProbe = max(1, ⌈nList·scanFrac⌉), so the
    * scanned share of the corpus — which recall tracks on weakly-
    * clustered data (SCALE.md round 6) — survives corpus-proportional
    * nList growth. A raw nProbe silently decays as maintenance scales
    * the geometry: measured 0.21 → 0.008 recall@10 across the
    * 2 M → 20 M decade at fixed nProbe = 8, where the held fraction
    * kept 13× that recall at identical search cost (SCALE.md round
    * 12). Prefer scanFrac for anything long-lived; scanFrac = 1.0 is
    * the exhaustive dial, bit-equal to brute force. */
  def ivfSearch(index: IvfIndex, queries: DataFrame, k: Int, nProbe: Int = 2,
                scanFrac: Option[Double] = None): DataFrame = {
    val probeN = scanFrac.map { f =>
      require(f > 0.0 && f <= 1.0, "scanFrac must be in (0, 1]")
      math.max(1, math.ceil(index.nList * f).toInt)
    }.getOrElse(nProbe)
    val q = queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qe"))
      .withColumn("qn", sqrt(dot(col("qe"), col("qe"))))
    val probes = probeTopLists(q, Seq("qid", "qe", "qn"),
      index.centroids, probeN)

    probes.join(index.assigned, Seq("list_id"))
      .select(col("qid"), col("vid"),
        (dot(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vid").asc)))
      .where(col("rnk") <= k)
      .select("qid", "rnk", "vid")
      .orderBy("qid", "rnk")
  }

  /** One-shot IVF top-k (the q56 driver query): build on the candidate
    * corpus, search the query slice, release. The result is materialized
    * BEFORE the index is released — it is bounded at nQueries × k rows
    * by construction (the query slice is the tiny side, same contract as
    * `cosineTopK`'s broadcast), so localizing it is cheap and lets the
    * per-call persisted inverted lists be freed deterministically
    * instead of leaking until cache eviction. Long-lived or large-query
    * callers should hold an `ivfBuild` index and `ivfSearch` it
    * repeatedly instead of paying the fit (and the materialize) per
    * call. */
  def ivfTopK(emb: DataFrame, nQueries: Int, k: Int,
              nList: Int = 8, nProbe: Int = 2,
              sampleFit: Boolean = false): DataFrame = {
    val index = ivfBuild(emb.where(col("vec_id") >= nQueries), nList, sampleFit)
    try {
      val res = ivfSearch(index, emb.where(col("vec_id") < nQueries), k, nProbe)
      val rows = res.collect().toIndexedSeq
      val spark = emb.sparkSession
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), res.schema)
    } finally index.release()
  }

  /** Corpus-wide k-nearest-neighbor JOIN: every vector's top-`k`
    * neighbors (self excluded) — the RAG pair-mining / hard-negative /
    * duplicate-triage primitive, and the generalization of `ivfSearch`
    * to a corpus-sized query side. IVF-blocked: probe selection is the
    * `NearestLists` codegen expression (centroid matrix in registers —
    * no N×nList joined intermediate; see its scaladoc for the
    * round-7 superlinearity it removed), candidates one equi-join on
    * list_id, so the pair volume is N·nProbe·targetClusterRows — never
    * N² — and the list count scales with the corpus (`autoK`) exactly
    * like SemDeDup's. The default fit keeps the FAISS
    * flat-coarse-quantizer cost profile (N×nList distance evals);
    * `sampleFit = true` bounds the fit to a driver sample and leaves
    * only the codegen assignment pass — the extreme-N build path. At
    * extreme N pass `targetClusterRows ∝ √N`: measured at sf100 (2 M
    * vectors, SCALE.md round 8), √N sizing is 8× cheaper to build, no
    * slower to search, and 10–26× better on fixed-nProbe recall than
    * the fixed-256 target — recall tracks the scan fraction
    * nProbe/nList, and corpus-proportional nList drives it to ~0.1 %.
    * Result is N·k rows and STAYS DISTRIBUTED (nothing collects);
    * callers release the index via the scoped pair once the result is
    * consumed or materialized. Approximate by construction (probed
    * lists only): on clustered embeddings — the regime real encoders
    * produce — recall@5 ≥ 0.9 (`SimilaritySpec` planted-cluster pin);
    * on uniform-random vectors it degrades toward the scan fraction
    * (0.39 measured at 2/8 lists on the random driver testdata, the
    * q61 caveat), where no list structure exists to exploit. nProbe is
    * the recall/cost dial: at 20 k semi-structured vectors (78 lists),
    * nProbe 2 = 0.41 recall@10 in 10.5 s, nProbe 8 = 0.88 in 27.7 s
    * (SCALE.md round 6) — size it to the corpus's cluster structure. */
  /** The corpus-side candidate fan-out join every kNN-join rung runs
    * (probes ⋈ inverted lists on list_id), parallelism-pinned. Two
    * ways that join loses its width, both measured: (1) the list
    * frame dips under the broadcast threshold and the post-join
    * dot/ADC work strands on the probe side's scan partitions (the
    * round-7 shuffle_hash pin); (2) the join's OUTPUT is
    * N·nProbe·clusterRows rows — orders of magnitude above its INPUT
    * bytes — so AQE, which coalesces on input size and is blind to
    * fan-out (the skew-split blindness of round 10, in the coalescing
    * direction), merges the tiny-input shuffle down to a handful of
    * tasks (n=3–7 task stages carrying ~2 s of the q155/q160
    * exhaustive dials at sf0.1); parallelism is additionally capped by
    * list-key cardinality once nList < the shuffle width. When
    * nList < width, salt: probes key by pmod(xxhash64(qid), S), the
    * list frame replicates S ways (S = ⌈width/nList⌉ — 1 at scale,
    * where nList ∝ √N already exceeds any core count, so the at-scale
    * plan is byte-identical to before), both sides repartition by
    * (list_id, salt) at the pinned width (user-specified ⇒ exempt
    * from AQE coalescing), and the join emits the identical pair set
    * at full parallelism. */
  private def candJoin(probes: DataFrame, lists: DataFrame,
                       nList: Int): DataFrame = {
    val width = probes.sparkSession.conf
      .getOption("spark.sql.shuffle.partitions")
      .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(200)
    val s = math.max(1, (width + nList - 1) / nList)
    if (s <= 1) probes.join(lists.hint("shuffle_hash"), Seq("list_id"))
    else {
      val ps = probes
        .withColumn("__sl",
          pmod(xxhash64(col("qid")), lit(s.toLong)).cast("int"))
        .repartition(width, col("list_id"), col("__sl"))
      val ls = lists
        .withColumn("__sl", explode(array((0 until s).map(lit): _*)))
        .repartition(width, col("list_id"), col("__sl"))
      ps.join(ls.hint("shuffle_hash"), Seq("list_id", "__sl")).drop("__sl")
    }
  }

  def knnJoin(emb: DataFrame, k: Int, nProbe: Int = 2,
              targetClusterRows: Long = 256,
              scanFrac: Option[Double] = None,
              sampleFit: Boolean = false): DataFrame = {
    val (res, release) =
      knnJoinScoped(emb, k, nProbe, targetClusterRows, scanFrac = scanFrac,
        sampleFit = sampleFit)
    val out = res.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    release()
    out
  }

  /** `scanFrac` is the recall-stable dial from the SCALE.md round-6
    * law: when set, nProbe = ⌈nList·scanFrac⌉ so the scanned share of
    * the corpus (and with it recall on weakly-clustered data) stays
    * constant as the list count grows with N — cost then scales
    * linearly in scanFrac·N per query. scanFrac = 1.0 probes every
    * list, which IS the exact brute-force join (pinned equal in
    * `SimilaritySpec`). Unset, the fixed `nProbe` gives cost-stable
    * scaling and recall rides the corpus's cluster structure. */
  def knnJoinScoped(emb: DataFrame, k: Int, nProbe: Int = 2,
                    targetClusterRows: Long = 256,
                    knownCount: Option[Long] = None,
                    scanFrac: Option[Double] = None,
                    sampleFit: Boolean = false): (DataFrame, () => Unit) = {
    val nList = autoK(emb, targetClusterRows, knownCount)
    val index = ivfBuild(emb, nList, sampleFit)
    (knnJoinIndexed(emb, index, k, nProbe, scanFrac), () => index.release())
  }

  /** `knnJoin` against a caller-owned float index — the build-once /
    * join-repeatedly form (`ivfBuild` or an `ivfLoad`ed store): no
    * KMeans fit, no assignment pass; the caller releases the index.
    * Join-after-reload equals join-after-build (`SimilaritySpec`). */
  def knnJoinIndexed(emb: DataFrame, index: IvfIndex, k: Int,
                     nProbe: Int = 2,
                     scanFrac: Option[Double] = None): DataFrame = {
    val nList = index.nList
    val probes0 = scanFrac
      .map(f => math.max(1, math.ceil(nList * f).toInt)).getOrElse(nProbe)
    val q = emb.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qe"))
      .withColumn("qn", sqrt(dot(col("qe"), col("qe"))))
    // probes0 >= nList means every list is probed regardless of rank —
    // skip the N×nList per-qid ranking window (the exhaustive dial's
    // only overhead; same candidate set, bit-identical result)
    val probes =
      if (probes0 >= nList)
        q.crossJoin(broadcast(index.centroids.select("list_id")))
          .select(col("qid"), col("qe"), col("qn"), col("list_id"))
      else probeTopLists(q, Seq("qid", "qe", "qn"), index.centroids, probes0)
    // corpus-side fan-out join (N·nProbe·clusterRows output): keep it
    // shuffled so the post-join dot work runs at shuffle-partition
    // parallelism even when the list frame dips under the broadcast
    // threshold (below ~19 k vectors for float lists — measured 2.5×
    // on the packed-PQ rung, same shape)
    val res = candJoin(probes, index.assigned, nList)
      .where(col("qid") =!= col("vid"))
      .select(col("qid"), col("vid"),
        (dot(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vid").asc)))
      .where(col("rnk") <= k)
      .select("qid", "rnk", "vid")
      .orderBy("qid", "rnk")
    res
  }

  /** `knnJoin` over an SQ8-QUANTIZED index — the memory-wall form: at
    * 10⁹ vectors the float `assigned` lists (512 B per 64-dim vector)
    * are what stops the hot set fitting in executor memory; here the
    * long-lived lists hold int8 codes (72 B, ~7×), candidates are
    * scored with the approximate int8 dot (ADC), and only the top
    * k·`refine` pool per query is re-ranked with exact float cosine —
    * the q101 `RefineFlat` contract lifted to the corpus-sized query
    * side. Probe selection stays on float centroids (tiny, broadcast),
    * so the recall dials (`nProbe`, `scanFrac`) behave exactly like
    * `knnJoin`'s; the refine pool absorbs ADC rank noise near ties
    * (recall parity vs the float path pinned by `SimilaritySpec`).
    * The float re-rank joins the pool (N·k·refine rows) back to the
    * corpus on vid — pool-sized, never corpus×corpus. */
  def knnJoinSq8(emb: DataFrame, k: Int, nProbe: Int = 2,
                 targetClusterRows: Long = 256, refine: Int = 4,
                 scanFrac: Option[Double] = None,
                 sampleFit: Boolean = false): DataFrame = {
    val (res, release) =
      knnJoinSq8Scoped(emb, k, nProbe, targetClusterRows, refine, scanFrac,
        sampleFit)
    val out = res.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    release()
    out
  }

  def knnJoinSq8Scoped(emb: DataFrame, k: Int, nProbe: Int = 2,
                       targetClusterRows: Long = 256, refine: Int = 4,
                       scanFrac: Option[Double] = None,
                       sampleFit: Boolean = false): (DataFrame, () => Unit) = {
    val nList = autoK(emb, targetClusterRows, None)
    val index = ivfBuildSq8(emb, nList, sampleFit)
    (knnJoinSq8Indexed(emb, index, k, nProbe, refine, scanFrac),
      () => index.release())
  }

  /** `knnJoinSq8` against a caller-owned SQ8 index — the build-once /
    * join-repeatedly form (`ivfBuildSq8` or an `ivfLoad`ed SQ8 store;
    * the caller releases the index). Join-after-reload equals
    * join-after-build (`SimilaritySpec`). */
  def knnJoinSq8Indexed(emb: DataFrame, index: IvfIndex, k: Int,
                        nProbe: Int = 2, refine: Int = 4,
                        scanFrac: Option[Double] = None): DataFrame = {
    import graft.functions.Sq8
    require(index.assigned.columns.contains("qc"),
      "knnJoinSq8Indexed needs an SQ8 list store (qc column) — use knnJoinIndexed for float lists")
    val nList = index.nList
    val probes0 = scanFrac
      .map(f => math.max(1, math.ceil(nList * f).toInt)).getOrElse(nProbe)
    val q = emb.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qe"))
      .withColumn("qn", sqrt(dot(col("qe"), col("qe"))))
      .withColumn("qq", Sq8.encode(col("qe")))
      .withColumn("qn8", sqrt(Sq8.dot(col("qq"), col("qq"))))
    // same exhaustive-dial shortcut as knnJoinScoped: all lists probed
    // ⇒ no per-qid probe-ranking window needed
    val probes =
      if (probes0 >= nList)
        q.crossJoin(broadcast(index.centroids.select("list_id")))
          .select(col("qid"), col("qe"), col("qn"), col("qq"), col("qn8"),
            col("list_id"))
      else probeTopLists(q, Seq("qid", "qe", "qn", "qq", "qn8"),
        index.centroids, probes0)
    // same corpus-side fan-out shape as knnJoinScoped: int8 lists dip
    // under the broadcast threshold below ~110 k vectors — keep the
    // ADC work at shuffle parallelism
    val pool = candJoin(probes, index.assigned, nList)
      .where(col("qid") =!= col("vid"))
      .select(col("qid"), col("qe"), col("qn"), col("vid"),
        (Sq8.dot(col("qq"), col("qc")) / (col("qn8") * col("cn"))).as("adc"))
      .withColumn("r8", row_number().over(
        Window.partitionBy("qid").orderBy(col("adc").desc, col("vid").asc)))
      .where(col("r8") <= k * refine)
    val cvec = emb.select(col("vec_id").as("vid"),
        asDouble(col("embedding")).as("ce"))
      .withColumn("cnf", sqrt(dot(col("ce"), col("ce"))))
    val res = pool.join(cvec, Seq("vid"))
      .select(col("qid"), col("vid"),
        (dot(col("qe"), col("ce")) / (col("qn") * col("cnf"))).as("cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vid").asc)))
      .where(col("rnk") <= k)
      .select("qid", "rnk", "vid")
      .orderBy("qid", "rnk")
    res
  }

  /** IVF with 1-BIT lists — the binary rung lifted to the corpus
    * side: probe selection on float centroids (tiny, exact), inverted
    * lists of d/8-byte sign codes (33× under the float lists at 64
    * dims — the `knn_list_bytes` ladder's bottom row), candidates
    * ranked by integer Hamming, and the top pool repaired in float.
    * Sign codes are NOT reconstructible (unlike SQ8), so
    * `ivfRebalance`/`ivfReconstruct` reject these stores — rebuild
    * from the source corpus like the PQ tiers. `ivfSave`/`ivfLoad`
    * round-trip the (vid, bc, list_id) layout; `ivfAppendSave`
    * encodes appends against the frozen centroids. */
  def ivfBuildBin(corpus: DataFrame, nList: Int = 8,
                  sampleFit: Boolean = false): IvfIndex = {
    val fl = ivfBuild(corpus, nList, sampleFit)
    val assigned = fl.assigned
      .select(col("vid"), graft.functions.Bin.encode(col("ce")).as("bc"),
        col("list_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assigned.count() // materialize codes, then drop the float lists
    fl.release()
    IvfIndex(fl.centroids, assigned, fl.nList)
  }

  /** Probe + Hamming scan over an `ivfBuildBin` index: probe selection
    * on float centroids, candidate ranking by `BinHamming` (distance
    * asc, vid asc — the q157 integer ordering, list-scoped). */
  def ivfSearchBin(index: IvfIndex, queries: DataFrame, k: Int,
                   nProbe: Int = 2): DataFrame = {
    require(index.assigned.columns.contains("bc"),
      "ivfSearchBin needs a binary list store (bc column)")
    val q = queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qe"))
      .withColumn("qb", graft.functions.Bin.encode(col("qe")))
    val probes = probeTopLists(q, Seq("qid", "qb"), index.centroids, nProbe)
    probes.join(index.assigned, Seq("list_id"))
      .select(col("qid"), col("vid"),
        graft.functions.Bin.hamming(col("qb"), col("bc")).as("ham"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("ham").asc, col("vid").asc)))
      .where(col("rnk") <= k)
      .select("qid", "rnk", "vid")
      .orderBy("qid", "rnk")
  }

  /** Corpus-wide kNN join over 1-bit lists + float refine — the
    * cheapest-storage rung of the corpus-side ladder (float → SQ8 →
    * PQ/OPQ → binary). Same dials, same `shuffle_hash`-pinned
    * candidate shape; the Hamming pool absorbs into the float re-rank
    * exactly like the ADC pools, and the exhaustive dial (scanFrac =
    * 1.0 + corpus-covering refine) IS the brute ranking (q160,
    * hash-green). */
  def knnJoinBin(emb: DataFrame, k: Int, nProbe: Int = 2,
                 targetClusterRows: Long = 256, refine: Int = 4,
                 scanFrac: Option[Double] = None,
                 sampleFit: Boolean = false): DataFrame = {
    val (res, release) =
      knnJoinBinScoped(emb, k, nProbe, targetClusterRows, refine, scanFrac,
        sampleFit)
    val out = res.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    release()
    out
  }

  def knnJoinBinScoped(emb: DataFrame, k: Int, nProbe: Int = 2,
                       targetClusterRows: Long = 256, refine: Int = 4,
                       scanFrac: Option[Double] = None,
                       sampleFit: Boolean = false): (DataFrame, () => Unit) = {
    val nList = autoK(emb, targetClusterRows, None)
    val index = ivfBuildBin(emb, nList, sampleFit)
    (knnJoinBinIndexed(emb, index, k, nProbe, refine, scanFrac),
      () => index.release())
  }

  def knnJoinBinIndexed(emb: DataFrame, index: IvfIndex, k: Int,
                        nProbe: Int = 2, refine: Int = 4,
                        scanFrac: Option[Double] = None): DataFrame = {
    require(index.assigned.columns.contains("bc"),
      "knnJoinBinIndexed needs a binary list store (bc column) — use knnJoinIndexed for float lists")
    val nList = index.nList
    val probes0 = scanFrac
      .map(f => math.max(1, math.ceil(nList * f).toInt)).getOrElse(nProbe)
    val q = emb.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qe"))
      .withColumn("qn", sqrt(dot(col("qe"), col("qe"))))
      .withColumn("qb", graft.functions.Bin.encode(col("qe")))
    val probes =
      if (probes0 >= nList)
        q.crossJoin(broadcast(index.centroids.select("list_id")))
          .select(col("qid"), col("qe"), col("qn"), col("qb"), col("list_id"))
      else probeTopLists(q, Seq("qid", "qe", "qn", "qb"),
        index.centroids, probes0)
    // binary lists dip under the broadcast threshold earlier than any
    // other rung (d/8 B/vector) — the shuffle_hash pin matters most here
    val pool = candJoin(probes, index.assigned, nList)
      .where(col("qid") =!= col("vid"))
      .select(col("qid"), col("qe"), col("qn"), col("vid"),
        graft.functions.Bin.hamming(col("qb"), col("bc")).as("ham"))
      .withColumn("rh", row_number().over(
        Window.partitionBy("qid").orderBy(col("ham").asc, col("vid").asc)))
      .where(col("rh") <= k * refine)
    val cvec = emb.select(col("vec_id").as("vid"),
        asDouble(col("embedding")).as("ce"))
      .withColumn("cnf", sqrt(dot(col("ce"), col("ce"))))
    pool.join(cvec, Seq("vid"))
      .select(col("qid"), col("vid"),
        (dot(col("qe"), col("ce")) / (col("qn") * col("cnf"))).as("cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vid").asc)))
      .where(col("rnk") <= k)
      .select("qid", "rnk", "vid")
      .orderBy("qid", "rnk")
  }

  /** `knnJoin` over a PQ-CODED store — the deepest rung of the
    * corpus-side quantized ladder (float → SQ8 ~7× → PQ m BYTES per
    * vector): at 10⁹ vectors even int8 lists strain executor memory;
    * here the long-lived lists hold only the `PqPack`ed byte codes
    * (the build's `array<int>` store is released once the packed
    * lists materialize — UnsafeRow keeps int arrays at 4 B/code, so
    * packing is what makes the m-bytes claim true in memory, not just
    * in parquet), candidates are scored against the `PqDecodeBytes`
    * reconstruction (register work in the scan pipeline — the float
    * corpus never rematerializes), and
    * the top k·`refine` pool per query is re-ranked with exact float
    * cosine from the source frame, the same RefineFlat contract as
    * `knnJoinSq8`. Probe selection shares `NearestLists` (float
    * centroids — tiny), so the `nProbe`/`scanFrac` dials behave
    * identically across all three rungs. Recall floors are the PQ
    * family's (q116/q119): size `m` by measured refined recall at the
    * target corpus, per the round-6 law. */
  def knnJoinPq(emb: DataFrame, k: Int, nProbe: Int = 2,
                targetClusterRows: Long = 256, m: Int = 16,
                refine: Int = 4, scanFrac: Option[Double] = None,
                sampleFit: Boolean = false): DataFrame = {
    val (res, release) =
      knnJoinPqScoped(emb, k, nProbe, targetClusterRows, m, refine, scanFrac,
        sampleFit)
    val out = res.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    release()
    out
  }

  def knnJoinPqScoped(emb: DataFrame, k: Int, nProbe: Int = 2,
                      targetClusterRows: Long = 256, m: Int = 16,
                      refine: Int = 4,
                      scanFrac: Option[Double] = None,
                      sampleFit: Boolean = false): (DataFrame, () => Unit) = {
    val nList = autoK(emb, targetClusterRows, None)
    val index = ivfPqBuild(emb, nList, m, 256, sampleFit)
    val (res, releasePacked) =
      knnJoinPqIndexed(emb, index, k, nProbe, refine, scanFrac)
    // the packed lists are materialized eagerly inside Indexed, so the
    // build's array<int> store can drop immediately (the memory story)
    index.release()
    (res, releasePacked)
  }

  /** `knnJoinPq` against a caller-owned IVF,PQ index — the build-once
    * / join-repeatedly form (`ivfPqBuild` or an `ivfPqLoad`ed store;
    * the caller releases the index). The returned hook releases only
    * the internally-`PqPack`ed list frame. Join-after-reload equals
    * join-after-build (`SimilaritySpec`). */
  def knnJoinPqIndexed(emb: DataFrame, index: IvfPqIndex, k: Int,
                       nProbe: Int = 2, refine: Int = 4,
                       scanFrac: Option[Double] = None): (DataFrame, () => Unit) = {
    import graft.functions.Pq
    val spark = emb.sparkSession
    import spark.implicits._
    val nList = index.nList
    val probes0 = scanFrac
      .map(f => math.max(1, math.ceil(nList * f).toInt)).getOrElse(nProbe)
    val flat = index.books.flatMap(_.flatMap(_.toSeq))
    val ks = index.books.map(_.length)
    require(ks.forall(_ <= 256), s"kSub > 256 cannot pack to bytes")
    // the LONG-LIVED list state is the PqPack'd byte form (1 B/code —
    // the FAISS layout), materialized EAGERLY so callers that own the
    // index (build or loaded store) can release its array<int> codes
    // (4 B/code in UnsafeRow) right after this returns
    val packed = index.coded
      .select(col("vid"), col("list_id"), Pq.pack(col("codes")).as("pc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    packed.count()
    val q = emb.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qe"))
      .withColumn("qn", sqrt(dot(col("qe"), col("qe"))))
    val probes =
      if (probes0 >= nList)
        q.crossJoin(broadcast(
          index.centroids.map(_._1).toSeq.toDF("list_id")))
          .select(col("qid"), col("qe"), col("qn"), col("list_id"))
      else probeTopListsArr(q, Seq("qid", "qe", "qn"),
        index.centroids, probes0)
    // candidates decode in the scan pipeline: the store stays bytes.
    // The packed frame is TINY (m B/vector) so the static planner
    // wants to broadcast it — but this join fans out to
    // N·nProbe·clusterRows rows whose decode+dot work then inherits
    // the probe side's SCAN partitioning (a handful of parquet
    // splits) instead of the shuffle width: measured 90 s → 207 s at
    // 200 k × nProbe 8. Same trap as the band joins (round-3 rule):
    // pin shuffle_hash so the heavy post-join projection runs at
    // shuffle-partition parallelism.
    val cand = packed
      .withColumn("cd", Pq.decodeBytes(col("pc"), flat, ks, index.sub))
      .withColumn("cnd", sqrt(dot(col("cd"), col("cd"))))
    val pool = candJoin(probes, cand, nList)
      .where(col("qid") =!= col("vid"))
      .select(col("qid"), col("qe"), col("qn"), col("vid"),
        (dot(col("qe"), col("cd")) / (col("qn") * col("cnd"))).as("adc"))
      .withColumn("r8", row_number().over(
        Window.partitionBy("qid").orderBy(col("adc").desc, col("vid").asc)))
      .where(col("r8") <= k * refine)
    val cvec = emb.select(col("vec_id").as("vid"),
        asDouble(col("embedding")).as("ce"))
      .withColumn("cnf", sqrt(dot(col("ce"), col("ce"))))
    val res = pool.join(cvec, Seq("vid"))
      .select(col("qid"), col("vid"),
        (dot(col("qe"), col("ce")) / (col("qn") * col("cnf"))).as("cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vid").asc)))
      .where(col("rnk") <= k)
      .select("qid", "rnk", "vid")
      .orderBy("qid", "rnk")
    (res, () => packed.unpersist(blocking = false))
  }

  /** `knnJoinPq` behind an OPQ rotation — the FAISS `OPQ{m},IVF,PQ{m}`
    * composite as a corpus-side join: an orthonormal rotation fit by
    * the `opqFitLocal` alternation (Ge et al. 2013) decorrelates the
    * subspaces BEFORE the PQ codebooks are fit, which is where PQ
    * loses recall on vectors whose variance isn't axis-aligned.
    * Rotation preserves dot products and norms exactly, so the coarse
    * KMeans lists, the ADC ordering semantics, and the float refine
    * cosines are the SAME quantities as the un-rotated path — only
    * codebook fidelity changes. One `MatVec` (native codegen) per row
    * at build/query time; the long-lived state is still m codes per
    * vector plus the dim×dim rotation (driver-held metadata). With
    * this rung every `IngestVectors` store layout (float / SQ8 / PQ /
    * OPQ) has a corpus-side kNN consumer. */
  def knnJoinOpq(emb: DataFrame, k: Int, nProbe: Int = 2,
                 targetClusterRows: Long = 256, m: Int = 16,
                 refine: Int = 4, iters: Int = 8,
                 scanFrac: Option[Double] = None,
                 sampleFit: Boolean = false): DataFrame = {
    val (res, release) =
      knnJoinOpqScoped(emb, k, nProbe, targetClusterRows, m, refine, iters,
        scanFrac, sampleFit)
    val out = res.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    release()
    out
  }

  def knnJoinOpqScoped(emb: DataFrame, k: Int, nProbe: Int = 2,
                       targetClusterRows: Long = 256, m: Int = 16,
                       refine: Int = 4, iters: Int = 8,
                       scanFrac: Option[Double] = None,
                       sampleFit: Boolean = false): (DataFrame, () => Unit) = {
    val nList = autoK(emb, targetClusterRows, None)
    val index = ivfOpqBuild(emb, nList, m, 256, iters, sampleFit)
    val (res, releasePacked) =
      knnJoinOpqIndexed(emb, index, k, nProbe, refine, scanFrac)
    // like the PQ rung: the Indexed form packs eagerly, so the build's
    // array<int> codes can drop now (the memory story)
    index.release()
    (res, releasePacked)
  }

  /** A built OPQ,IVF,PQ composite — the caller-owned form behind
    * `knnJoinOpqIndexed`/`ivfOpqSearch`: the orthonormal pretransform
    * (row-major dim×dim, driver-held metadata) plus the `IvfPqIndex`
    * fit on the ROTATED corpus, so centroids, codebooks and codes all
    * live in rotated space and every query/batch rides the same
    * `MatVec` before touching them. */
  final case class IvfOpqIndex(rot: Array[Double], dim: Int, pq: IvfPqIndex) {
    def release(): Unit = pq.release()
  }

  /** Fit rotation + coarse lists + codebooks once (the FAISS
    * `OPQ{m},IVF{nList},PQ{m}` factory string): the `opqFitLocal`
    * alternation on a bounded driver sample yields the rotation, then
    * `ivfPqBuild` refits coarse centroids AND codebooks on the rotated
    * corpus (the alternation's books are only its fitting scaffold). */
  def ivfOpqBuild(corpus: DataFrame, nList: Int = 8, m: Int = 16,
                  kSub: Int = 256, iters: Int = 8,
                  sampleFit: Boolean = false): IvfOpqIndex = {
    val base = corpus.select(col("vec_id"), asDouble(col("embedding")).as("e"))
    val dim = base.select(size(col("e"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val (rot, _) = opqFitLocal(pqSamplePoints(base), m, kSub, dim / m, iters)
    val rotated = base.select(col("vec_id"),
      graft.functions.MatVecF(col("e"), rot, dim).as("embedding"))
    IvfOpqIndex(rot, dim, ivfPqBuild(rotated, nList, m, kSub, sampleFit))
  }

  /** `knnJoinOpq` against a caller-owned index — completing the
    * build-once / join-repeatedly quartet (float `knnJoinIndexed`,
    * SQ8, PQ, now OPQ). The probe side rides the index's frozen
    * rotation (one codegen `MatVec` per row), then the whole
    * `knnJoinPqIndexed` machinery — packed-byte lists, `NearestLists`
    * probes, `shuffle_hash`-pinned candidate join, float refine —
    * runs unchanged in rotated space; rotation is orthonormal, so the
    * refine cosines are the same quantities as the un-rotated path.
    * The returned hook releases the internally-packed list frame;
    * the caller releases the index (`ivfOpqBuild` or `ivfOpqLoad`).
    * Join-after-reload equals join-after-build (`OpqSpec`). */
  def knnJoinOpqIndexed(emb: DataFrame, index: IvfOpqIndex, k: Int,
                        nProbe: Int = 2, refine: Int = 4,
                        scanFrac: Option[Double] = None): (DataFrame, () => Unit) = {
    val rotated = emb
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .select(col("vec_id"),
        graft.functions.MatVecF(col("e"), index.rot, index.dim).as("embedding"))
    knnJoinPqIndexed(rotated, index.pq, k, nProbe, refine, scanFrac)
  }

  /** Persist: `ivfPqSave` layout plus the `rot/` table (`opqSave`'s
    * convention — dim rows, metadata-sized). The store carries
    * centroids + books + codes + rot, which is how the ingest
    * dispatch recognizes the tier. */
  def ivfOpqSave(index: IvfOpqIndex, path: String): Unit = {
    val spark = index.pq.coded.sparkSession
    import spark.implicits._
    ivfPqSave(index.pq, path)
    val d = index.dim
    (0 until d).map(i =>
        (i, index.rot.slice(i * d, (i + 1) * d).toSeq)).toDF("i", "row")
      .repartition(1).write.mode("overwrite").parquet(s"$path/rot")
  }

  def ivfOpqLoad(spark: org.apache.spark.sql.SparkSession,
                 path: String): IvfOpqIndex = {
    val rot = opqLoadRot(spark, path)
    val dim = math.sqrt(rot.length.toDouble).toInt
    IvfOpqIndex(rot, dim, ivfPqLoad(spark, path))
  }

  /** FROZEN-transform append: rotate the batch under the saved
    * rotation, then `ivfPqAppendSave` assigns against the saved
    * (rotated-space) centroids and encodes with the saved books —
    * O(batch), nothing refit. */
  def ivfOpqAppendSave(spark: org.apache.spark.sql.SparkSession, path: String,
                       newVecs: DataFrame): Unit = {
    val rot = opqLoadRot(spark, path)
    val dim = math.sqrt(rot.length.toDouble).toInt
    val rotated = newVecs
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .select(col("vec_id"),
        graft.functions.MatVecF(col("e"), rot, dim).as("embedding"))
    ivfPqAppendSave(spark, path, rotated)
  }

  /** Probe + ADC over an OPQ,IVF,PQ index: queries ride the rotation,
    * then `ivfPqSearch` unchanged (rotated-space centroids and LUTs
    * score the original cosine — A orthonormal). */
  def ivfOpqSearch(index: IvfOpqIndex, queries: DataFrame, k: Int,
                   nProbe: Int = 2): DataFrame = {
    val rotated = queries
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .select(col("vec_id"),
        graft.functions.MatVecF(col("e"), index.rot, index.dim).as("embedding"))
    ivfPqSearch(index.pq, rotated, k, nProbe)
  }

  /** Scalar-quantized (int8) brute-force cosine top-k — `cosineTopK`
    * over `Sq8Encode` codes (functions/Sq8Expressions.scala): 72 B per
    * 64-dim vector instead of 512 B of promoted doubles, the memory
    * ratio that decides whether a 10⁹-vector corpus's hot set fits in
    * executor memory at all. Same deterministic contract (score desc,
    * vid asc); scores are approximate, so ranks can differ from the
    * float path near ties — recall@k vs `cosineTopK` is pinned by
    * `Sq8Spec`, not asserted equal. Encode is a single codegen'd
    * projection (no second pass for norms: the approximate norm is
    * sq8_dot(code, code)). */
  def sq8TopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    import graft.functions.Sq8
    val base = emb.select(col("vec_id"),
        Sq8.encode(asDouble(col("embedding"))).as("qc"))
      .withColumn("nrm", sqrt(Sq8.dot(col("qc"), col("qc"))))
    val q = base.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("qc").as("qq"), col("nrm").as("qn"))
    val c = base.where(col("vec_id") >= nQueries)
      .select(col("vec_id").as("vid"), col("qc").as("cc"), col("nrm").as("cn"))
    c.crossJoin(broadcast(q))
      .select(col("qid"), col("vid"),
        (Sq8.dot(col("qq"), col("cc")) / (col("qn") * col("cn"))).as("cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vid").asc)))
      .where(col("rnk") <= k)
      .select("qid", "rnk", "vid")
      .orderBy("qid", "rnk")
  }

  /** The 1-bit rung of the quantization ladder — FAISS
    * `IndexBinaryFlat` (+ `RefineFlat`) as frames: sign codes
    * (`functions.BinEncode`, d/8 bytes per vector — 64× under the
    * promoted float store at 64 dims) scanned by exact integer
    * HAMMING distance (`BinHamming`, popcount of the XOR), optionally
    * re-ranked in float for the top pool. No codebook, no training,
    * no scale header: the cheapest code that still orders candidates
    * by angle (Charikar 2002 sign-LSH, applied per-coordinate). The
    * query side is the bounded broadcast side by contract (the
    * `cosineTopK` discipline); corpus-side joins should quantize the
    * IVF lists instead (`knnJoinSq8`/`knnJoinPq`). */
  final case class BinIndex(coded: DataFrame) {
    def release(): Unit = coded.unpersist(blocking = false)
  }

  def binBuild(corpus: DataFrame): BinIndex = {
    val coded = corpus.select(col("vec_id").as("vid"),
        graft.functions.Bin.encode(asDouble(col("embedding"))).as("bc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    coded.count()
    BinIndex(coded)
  }

  /** Hamming top-k over a built/loaded binary index: (qid, rnk, vid),
    * rank by distance asc then vid — the integer ordering the DuckDB
    * oracle reproduces exactly (q157 is hash-green: Hamming of sign
    * codes == count of per-dim sign disagreements, no bit packing
    * needed oracle-side). */
  def binSearch(index: BinIndex, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"),
      graft.functions.Bin.encode(asDouble(col("embedding"))).as("qb"))
    index.coded.crossJoin(broadcast(q))
      .select(col("qid"), col("vid"),
        graft.functions.Bin.hamming(col("qb"), col("bc")).as("ham"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("ham").asc, col("vid").asc)))
      .where(col("rnk") <= k)
      .select("qid", "rnk", "vid")
      .orderBy("qid", "rnk")
  }

  /** `Binary,RefineFlat`: Hamming retrieves `k × refine` candidates,
    * the float store re-scores only those — same repair economics as
    * `ivfSearchSq8Refine`. At `refine` covering the corpus the float
    * re-rank orders EVERY candidate, so the result is the exact brute
    * ranking through the binary plumbing (q158's hash-green dial). */
  def binSearchRefine(index: BinIndex, emb: DataFrame, queries: DataFrame,
                      k: Int, refine: Int = 4): DataFrame = {
    val cand = binSearch(index, queries, k * refine).select("qid", "vid")
    val flo = emb.select(col("vec_id").as("vid"), asDouble(col("embedding")).as("ve"))
      .withColumn("vn", sqrt(dot(col("ve"), col("ve"))))
    val q = queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qe"))
      .withColumn("qn", sqrt(dot(col("qe"), col("qe"))))
    cand.join(flo, Seq("vid"))
      .join(broadcast(q), Seq("qid"))
      .select(col("qid"), col("vid"),
        (dot(col("qe"), col("ve")) / (col("qn") * col("vn"))).as("cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vid").asc)))
      .where(col("rnk") <= k)
      .select("qid", "rnk", "vid")
      .orderBy("qid", "rnk")
  }

  /** Self-contained query form (the q157/q158 shape): vectors below
    * `nQueries` query the rest. `refine = 0` returns the raw Hamming
    * ranking; `refine > 0` float-re-ranks the top pool. */
  def binTopK(emb: DataFrame, nQueries: Int, k: Int,
              refine: Int = 0): DataFrame = {
    val index = binBuild(emb.where(col("vec_id") >= nQueries))
    try {
      val qs = emb.where(col("vec_id") < nQueries)
      val res =
        if (refine > 0)
          binSearchRefine(index, emb.where(col("vec_id") >= nQueries), qs, k, refine)
        else binSearch(index, qs, k)
      val rows = res.collect().toIndexedSeq
      val spark = emb.sparkSession
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), res.schema)
    } finally index.release()
  }

  /** Persist / reload / frozen append for the binary store —
    * `bincodes/` is the layout key the ingest dispatch recognizes.
    * Append is O(batch): encode and write, nothing refit (there is
    * nothing TO refit — the code is the sign pattern itself). */
  def binSave(index: BinIndex, path: String): Unit =
    index.coded.write.mode("overwrite").parquet(s"$path/bincodes")

  def binLoad(spark: org.apache.spark.sql.SparkSession, path: String): BinIndex = {
    val coded = spark.read.parquet(s"$path/bincodes")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    BinIndex(coded)
  }

  def binAppendSave(spark: org.apache.spark.sql.SparkSession, path: String,
                    newVecs: DataFrame): Unit =
    newVecs.select(col("vec_id").as("vid"),
        graft.functions.Bin.encode(asDouble(col("embedding"))).as("bc"))
      .write.mode("append").parquet(s"$path/bincodes")

  /** IVF with scalar-quantized inverted lists — the FAISS `IVF,SQ8`
    * composite: the coarse quantizer trains on floats (centroid math
    * stays exact), but the ASSIGNED LISTS — the big, long-lived side
    * of the index — hold int8 codes. `ivfSave`/`ivfLoad` round-trip
    * this index unchanged (binary parquet column), so the on-disk
    * footprint drops by the same ~7× as memory. */
  def ivfBuildSq8(corpus: DataFrame, nList: Int = 8,
                  sampleFit: Boolean = false): IvfIndex = {
    import graft.functions.Sq8
    val fl = ivfBuild(corpus, nList, sampleFit)
    val assigned = fl.assigned
      .select(col("vid"), Sq8.encode(col("ce")).as("qc"), col("list_id"))
      .withColumn("cn", sqrt(Sq8.dot(col("qc"), col("qc"))))
      .select("vid", "qc", "cn", "list_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assigned.count() // materialize codes, then drop the float lists
    fl.release()
    IvfIndex(fl.centroids, assigned, fl.nList)
  }

  /** Search an `ivfBuildSq8` index: probe selection runs on float
    * centroids (broadcast, tiny), candidate scoring on int8 codes. */
  def ivfSearchSq8(index: IvfIndex, queries: DataFrame, k: Int,
                   nProbe: Int = 2): DataFrame = {
    import graft.functions.Sq8
    val q = queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qe"))
      .withColumn("qq", Sq8.encode(col("qe")))
      .withColumn("qn", sqrt(Sq8.dot(col("qq"), col("qq"))))
    val probes = probeTopLists(q, Seq("qid", "qq", "qn"),
      index.centroids, nProbe)
    probes.join(index.assigned, Seq("list_id"))
      .select(col("qid"), col("vid"),
        (Sq8.dot(col("qq"), col("qc")) / (col("qn") * col("cn"))).as("cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vid").asc)))
      .where(col("rnk") <= k)
      .select("qid", "rnk", "vid")
      .orderBy("qid", "rnk")
  }

  /** Two-stage refine search over an `ivfBuildSq8` index — the FAISS
    * `IVF,SQ8` + `RefineFlat` composite: stage 1 scans the int8 lists
    * for `k × refine` candidates per query (the cheap, 7×-smaller-IO
    * pass), stage 2 re-scores ONLY those candidates against the float
    * store `emb` with the exact codegen dot product and keeps the true
    * top k. The refine join touches k·refine rows per query —
    * negligible next to the list scan — so quantization rank error is
    * repaired at ~zero marginal cost (`Sq8Spec` pins parity with the
    * all-float IVF search). */
  def ivfSearchSq8Refine(index: IvfIndex, emb: DataFrame, queries: DataFrame,
                         k: Int, nProbe: Int = 2, refine: Int = 4): DataFrame = {
    val cand = ivfSearchSq8(index, queries, k * refine, nProbe)
      .select("qid", "vid")
    val flo = emb.select(col("vec_id").as("vid"), asDouble(col("embedding")).as("ve"))
      .withColumn("vn", sqrt(dot(col("ve"), col("ve"))))
    val q = queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qe"))
      .withColumn("qn", sqrt(dot(col("qe"), col("qe"))))
    cand.join(flo, Seq("vid"))
      .join(broadcast(q), Seq("qid"))
      .select(col("qid"), col("vid"),
        (dot(col("qe"), col("ve")) / (col("qn") * col("vn"))).as("cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vid").asc)))
      .where(col("rnk") <= k)
      .select("qid", "rnk", "vid")
      .orderBy("qid", "rnk")
  }

  /** One-shot `IVF,SQ8 + RefineFlat` top-k (the q142 driver query):
    * build the quantized index on the candidate corpus, search the
    * query slice with a float re-rank pool, release (bounded result,
    * the `ivfTopK` localization contract). At `nProbe = nList` and
    * `refine ≥ ⌈n/k⌉` the ADC pool is the whole corpus and the float
    * re-rank IS the exact brute-force ranking — the exhaustive dial
    * that lets the quantized store hash-check against the q39 oracle
    * end-to-end (encode → store → probe → ADC → refine). */
  def sq8RefineTopK(emb: DataFrame, nQueries: Int, k: Int,
                    nList: Int = 8, nProbe: Int = 2,
                    refine: Int = 4, sampleFit: Boolean = false): DataFrame = {
    val corpus = emb.where(col("vec_id") >= nQueries)
    val index = ivfBuildSq8(corpus, nList, sampleFit)
    try {
      val res = ivfSearchSq8Refine(index, corpus,
        emb.where(col("vec_id") < nQueries), k, nProbe, refine)
      val rows = res.collect().toIndexedSeq
      val spark = emb.sparkSession
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), res.schema)
    } finally index.release()
  }

  /** Product-quantization top-k — the FAISS `PQ{m}` flat index with
    * asymmetric distance computation (ADC), completing the quantizer
    * ladder Flat → SQ8 → PQ (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011). The vector splits into `m`
    * subspaces; each subspace gets its own `kSub`-centroid codebook
    * (seeded KMeans over the candidate set), so a 64-dim float vector
    * compresses to `m` byte codes (default m=16, kSub=256 → 16 bytes
    * vs 256: 16× compression, far past SQ8's 4× — FAISS `PQ16`; m=8
    * halves storage again but needs a ~4× refine pool for the same
    * refined recall — measured at 20 k vectors, SCALE.md round 6).
    *
    * Cosine via L2-normalization (standard FAISS practice for inner-
    * product PQ): both sides are scaled to unit length BEFORE codebook
    * fit and encode, so the raw ADC inner product `q̂ · x̂` IS the
    * cosine estimate — no per-candidate norm division whose
    * reconstruction error would perturb the ranking. The normalization
    * never materializes a scaled array on the encode path: `(x/|x|)·c`
    * folds to `(x·c)/|x|`, one codegen'd DotProduct plus a scalar
    * divide.
    *
    * Search is ADC: each QUERY (tiny side) precomputes one flat lookup
    * table `lut[off_j + c] = q̂_j · centroid_{j,c}` — Σ|codebook_j|
    * doubles — and a candidate's approximate cosine is
    * `Σ_j lut[off_j + code_j]`: m array lookups + adds per
    * (query, candidate), no float vector ever touched on the big side.
    * Codebook sizes are taken from the fitted model (KMeans may return
    * fewer than kSub centers on degenerate data), so LUT offsets are
    * cumulative, not a fixed stride.
    *
    * 100 TB shape: codebooks are m·kSub centroids — driver-fit on a
    * sample, broadcast as literals into codegen; encoding is one
    * linear projection pass; the scored side carries only codes, so
    * the scan is ~64× less IO than the float baseline. Queries ride a
    * single broadcast with their LUTs inlined. Recall is pinned
    * honestly in `PqSpec`; `refine` re-ranks k·refine ADC candidates
    * against the float store exactly like `ivfSearchSq8Refine`. */
  def pqTopK(emb: DataFrame, nQueries: Int, k: Int,
             m: Int = 16, kSub: Int = 256): DataFrame = {
    val base = emb.select(col("vec_id"), asDouble(col("embedding")).as("e"))
    val dim = base.select(size(col("e"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    val cand = base.where(col("vec_id") >= nQueries)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cand.count()
    try {
      val books = pqFitBooks(cand, m, kSub, sub)
      val coded = pqEncodeFrame(cand, books, sub)
      val res = pqAdcSearch(coded,
        base.where(col("vec_id") < nQueries), books, sub, k)
      // materialize the bounded nQueries·k result, then release the
      // persisted corpus (the ivfTopK release pattern — no leaked cache)
      val rows = res.collect().toIndexedSeq
      val spark = emb.sparkSession
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), res.schema)
    } finally cand.unpersist(blocking = false)
  }

  /** Codebook training: seeded Lloyd k-means per subspace over a
    * BOUNDED, deterministically-sampled slice of the L2-normalized
    * corpus, run on the driver (FAISS practice — `Clustering` trains
    * on ≤ max_points_per_centroid·k sampled points precisely because
    * codebooks are statistics, not indexes). The distributed
    * alternative (one MLlib fit per subspace) costs m·maxIter Spark
    * job launches — measured 15+ s of pure scheduling overhead at 5 k
    * vectors, for identical recall. Sampling is `xxhash64(vec_id)`-
    * keyed (deterministic, no order dependence); subspaces train in
    * parallel threads; ties and empty clusters resolve to
    * lowest-index/previous-center, so the result is reproducible
    * bit-for-bit. */
  /** Hash-sampled, L2-normalized driver-side slice of a candidate
    * frame — the bounded training set every statistics-sized model
    * (PQ codebooks, OPQ rotation) fits on. Deterministic: the slice is
    * keyed on `xxhash64(vec_id)`, not partition order. */
  private[graft] def pqSamplePoints(cand: DataFrame,
                                    sampleCap: Int = 16384,
                                    normalize: Boolean = true): Array[Array[Double]] = {
    val n = cand.count()
    val every = math.max(1L, n / sampleCap)
    val slice = if (every == 1L) cand
      else cand.where(pmod(xxhash64(col("vec_id")), lit(every)) === 0)
    slice.select(col("e")).collect()
      .map { r =>
        val e = r.getSeq[Double](0).toArray
        if (!normalize) e
        else {
          val n0 = math.sqrt(e.map(x => x * x).sum)
          val nrm = if (n0 > 0) n0 else 1.0
          e.map(_ / nrm)
        }
      }
  }

  private[graft] def pqFitBooks(cand: DataFrame, m: Int, kSub: Int,
                                sub: Int, sampleCap: Int = 16384,
                                maxIter: Int = 20): Array[Array[Array[Double]]] =
    pqFitBooksLocal(pqSamplePoints(cand, sampleCap), m, kSub, sub, maxIter)

  /** Seeded per-subspace Lloyd fit over an in-memory (already
    * normalized) point set — split from `pqFitBooks` so the OPQ
    * alternation can refit codebooks against re-rotated points without
    * re-collecting the sample. */
  private[graft] def pqFitBooksLocal(pts: Array[Array[Double]], m: Int,
                                     kSub: Int, sub: Int,
                                     maxIter: Int = 20): Array[Array[Array[Double]]] = {
    def fitSub(j: Int): Array[Array[Double]] = {
      val xs = pts.map(p => java.util.Arrays.copyOfRange(p, j * sub, (j + 1) * sub))
      val k = math.min(kSub, xs.length)
      val rnd = new scala.util.Random(42L + j)
      val cents = Array.tabulate(k)(_ => new Array[Double](sub))
      // seeded init: k distinct sample indices
      val idx = rnd.shuffle(xs.indices.toVector).take(k)
      for (c <- 0 until k) System.arraycopy(xs(idx(c)), 0, cents(c), 0, sub)
      val assign = new Array[Int](xs.length)
      var iter = 0
      var moved = true
      while (iter < maxIter && moved) {
        moved = false
        val cN2 = cents.map(c => c.map(v => v * v).sum)
        var i = 0
        while (i < xs.length) {
          val x = xs(i)
          var best = 0
          var bestD = Double.PositiveInfinity
          var c = 0
          while (c < k) {
            var dotXC = 0.0
            var t = 0
            while (t < sub) { dotXC += x(t) * cents(c)(t); t += 1 }
            val d = cN2(c) - 2.0 * dotXC
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          if (assign(i) != best || iter == 0) { assign(i) = best; moved = true }
          i += 1
        }
        if (moved) {
          val sums = Array.tabulate(k)(_ => new Array[Double](sub))
          val counts = new Array[Int](k)
          i = 0
          while (i < xs.length) {
            val c = assign(i); counts(c) += 1
            var t = 0
            while (t < sub) { sums(c)(t) += xs(i)(t); t += 1 }
            i += 1
          }
          var c = 0
          while (c < k) {
            if (counts(c) > 0) {
              var t = 0
              while (t < sub) { cents(c)(t) = sums(c)(t) / counts(c); t += 1 }
            } // empty cluster: keep the previous center (deterministic)
            c += 1
          }
        }
        iter += 1
      }
      cents
    }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(
      Future.sequence((0 until m).toVector.map(j => Future(fitSub(j)))),
      Duration.Inf).toArray
  }

  /** Encode `(vec_id, e)` → `(vid, codes: array<int>)` with the native
    * `PqEncode` codegen expression — one tight generated loop per row,
    * independent of kSub (a struct-array-sort formulation at kSub=256
    * would exceed codegen method limits and fall back interpreted). */
  private[graft] def pqEncodeFrame(cand: DataFrame,
                                   books: Array[Array[Array[Double]]],
                                   sub: Int): DataFrame = {
    val flat = books.flatMap(_.flatMap(_.toSeq))
    val ks = books.map(_.length)
    cand.select(col("vec_id").as("vid"),
      graft.functions.Pq.encode(col("e"), flat, ks, sub).as("codes"))
  }

  /** ADC search over an encoded frame. The LUTs are computed on the
    * driver from the collected query rows — queries are the bounded
    * tiny side by contract (same discipline as broadcast in
    * `cosineTopK`): lut[off_j + c] = (q_j · centroid_{j,c}) / |q|, so
    * the per-candidate score Σ_j lut[off_j + codes_j] estimates the
    * cosine directly. */
  private[graft] def pqAdcSearch(coded: DataFrame, queries: DataFrame,
                                 books: Array[Array[Array[Double]]],
                                 sub: Int, k: Int): DataFrame = {
    val m = books.length
    val offs = books.map(_.length).scanLeft(0)(_ + _)
    val spark = coded.sparkSession
    val qLuts: Seq[(Long, Seq[Double])] = queries
      .select(col("vec_id"), col("e")).orderBy("vec_id").collect().toSeq
      .map { r =>
        val qe = r.getSeq[Double](1).toArray
        val n0 = math.sqrt(qe.map(x => x * x).sum)
        val nrm = if (n0 > 0) n0 else 1.0
        val lut = for (j <- 0 until m; c <- books(j).indices) yield {
          var s = 0.0
          var t = 0
          while (t < sub) { s += qe(j * sub + t) * books(j)(c)(t); t += 1 }
          s / nrm
        }
        (r.getLong(0), lut)
      }
    import spark.implicits._
    val q = qLuts.toDF("qid", "lut")
    val adc = (0 until m).map(j =>
      element_at(col("lut"),
        element_at(col("codes"), j + 1) + lit(offs(j)) + 1)).reduce(_ + _)
    coded.crossJoin(broadcast(q))
      .select(col("qid"), col("vid"), adc.as("cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vid").asc)))
      .where(col("rnk") <= k)
      .select("qid", "rnk", "vid")
      .orderBy("qid", "rnk")
  }

  /** A built PQ index: the driver-held codebooks plus the distributed
    * codes frame `(vid, codes: array<int>)` — the corpus never appears
    * in float form after the encode pass. `sub` is the subspace width
    * (recoverable from any centroid, carried for convenience). */
  final case class PqIndex(books: Array[Array[Array[Double]]], sub: Int,
                           coded: DataFrame) {
    def release(): Unit = coded.unpersist(blocking = false)
  }

  /** Fit + encode a corpus `(vec_id, embedding)` into a `PqIndex` —
    * the trainable half of `pqTopK` split out for the save/load/append
    * lifecycle (FAISS `train` + `add`). */
  def pqBuild(vecs: DataFrame, m: Int = 16, kSub: Int = 256): PqIndex = {
    val base = vecs.select(col("vec_id"), asDouble(col("embedding")).as("e"))
    val dim = base.select(size(col("e"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    val books = pqFitBooks(base, m, kSub, sub)
    val coded = pqEncodeFrame(base, books, sub)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    coded.count()
    PqIndex(books, sub, coded)
  }

  /** Persist a PQ index as two parquet tables (`books/`: one row per
    * (subspace, code) centroid; `codes/`: the encoded corpus) — the
    * FAISS write_index analog, completing restartability across every
    * ANN tier (ivfSave / signatureSave / pqSave). The books table is
    * m·kSub rows — metadata-sized; the codes table is the index. */
  def pqSave(index: PqIndex, path: String): Unit = {
    val spark = index.coded.sparkSession
    import spark.implicits._
    val rows = for {
      (book, j) <- index.books.zipWithIndex
      (cent, c) <- book.zipWithIndex
    } yield (j, c, cent.toSeq)
    rows.toSeq.toDF("j", "c", "cent")
      .repartition(1).write.mode("overwrite").parquet(s"$path/books")
    index.coded.write.mode("overwrite").parquet(s"$path/codes")
  }

  /** Rebuild a `PqIndex` from `pqSave` output: the books read is one
    * bounded collect (m·kSub rows), the codes scan stays lazy +
    * persisted. Search-after-reload equals search-after-build
    * (`PqSpec` pins it). */
  def pqLoad(spark: org.apache.spark.sql.SparkSession, path: String): PqIndex = {
    val (books, sub) = pqLoadBooks(spark, path)
    val coded = spark.read.parquet(s"$path/codes")
      .select("vid", "codes")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    PqIndex(books, sub, coded)
  }

  /** The books half of `pqLoad` — one bounded collect (m·kSub rows),
    * no codes scan: what audits (`pqDriftRatio`) read. */
  private[graft] def pqLoadBooks(spark: org.apache.spark.sql.SparkSession,
                                 path: String): (Array[Array[Array[Double]]], Int) = {
    val bookRows = spark.read.parquet(s"$path/books")
      .select("j", "c", "cent").collect()
    val m = bookRows.map(_.getInt(0)).max + 1
    val books = Array.tabulate(m) { j =>
      bookRows.filter(_.getInt(0) == j).sortBy(_.getInt(1))
        .map(_.getSeq[Double](2).toArray)
    }
    (books, books(0)(0).length)
  }

  /** Encode NEW vectors against a saved index's FROZEN codebooks and
    * append them to the codes store — FAISS `index.add()` for the PQ
    * tier, O(batch) like `ivfAppendSave`: the books read is bounded,
    * the only data motion is the new batch through one codegen'd
    * `PqEncode` pass. */
  def pqAppendSave(spark: org.apache.spark.sql.SparkSession, path: String,
                   newVecs: DataFrame): Unit = {
    val index = pqLoad(spark, path)
    try {
      val base = newVecs.select(col("vec_id"), asDouble(col("embedding")).as("e"))
      pqEncodeFrame(base, index.books, index.sub)
        .write.mode("append").parquet(s"$path/codes")
    } finally index.release()
  }

  /** Mean squared reconstruction error of `books` over an in-memory
    * normalized point set — the quantity the Lloyd fit minimizes,
    * reported per point (sum across the m subspaces). */
  private def pqDistortionOf(books: Array[Array[Array[Double]]], sub: Int,
                             pts: Array[Array[Double]]): Double = {
    val m = books.length
    var total = 0.0
    pts.foreach { p =>
      var j = 0
      while (j < m) {
        val off = j * sub
        var best = Double.PositiveInfinity
        books(j).foreach { c =>
          var d = 0.0
          var t = 0
          while (t < sub) { val df = p(off + t) - c(t); d += df * df; t += 1 }
          if (d < best) best = d
        }
        total += best
        j += 1
      }
    }
    total / pts.length
  }

  /** Codebook distortion of an index on a vector frame: MSE of the
    * books' reconstructions over a deterministic bounded sample
    * (L2-normalized like the fit itself, so the number is scale-free
    * and comparable across corpora and batches). Driver-side on
    * ≤ sampleCap points — the audit costs what the fit costs, never
    * anything corpus-sized. */
  def pqDistortion(index: PqIndex, vecs: DataFrame,
                   sampleCap: Int = 2048): Double = {
    val base = vecs.select(col("vec_id"), asDouble(col("embedding")).as("e"))
    val pts = pqSamplePoints(base, sampleCap)
    require(pts.nonEmpty, "pqDistortion needs a non-empty vector frame")
    pqDistortionOf(index.books, index.sub, pts)
  }

  /** Drift ratio of a saved PQ store against a recent batch: distortion
    * of the FROZEN books on the batch, over the distortion freshly-fit
    * books achieve on the same sample. ≈1 while the distribution the
    * books were trained on still holds; grows as the feed drifts — the
    * PQ tier's `ivfSkew`. (IVF drift shows up as list-occupancy skew;
    * PQ drift shows up as quantization error, because the codebooks are
    * a density model of the feed.) Bounded: one books read + one
    * sample fit, nothing corpus-sized. */
  def pqDriftRatio(spark: org.apache.spark.sql.SparkSession, path: String,
                   recent: DataFrame, sampleCap: Int = 2048): Double = {
    val (books, sub) = pqLoadBooks(spark, path)
    val base = recent.select(col("vec_id"), asDouble(col("embedding")).as("e"))
    val pts = pqSamplePoints(base, sampleCap)
    require(pts.nonEmpty, "pqDriftRatio needs a non-empty recent batch")
    val frozen = pqDistortionOf(books, sub, pts)
    val fresh = pqDistortionOf(
      pqFitBooksLocal(pts, books.length, books.map(_.length).max, sub), sub, pts)
    if (fresh <= 0.0) { if (frozen <= 0.0) 1.0 else Double.PositiveInfinity }
    else frozen / fresh
  }

  /** Refit-on-drift for the PQ tier. Unlike IVF (`ivfRebalance`
    * reconstructs losslessly), PQ codes are LOSSY — retraining on
    * reconstructions would compound quantization error — so
    * maintenance re-encodes from the caller's SOURCE corpus, the
    * system of record every training pipeline keeps anyway. Above
    * `maxRatio` (`pqDriftRatio` on `recent`): fit new books at the
    * store's own (m, kSub) on the current corpus, re-encode, write the
    * generation to `dstPath`, return true. Below: one bounded audit,
    * nothing written. Same reader-swap contract as
    * `IngestVectors.maintainIndex`. */
  def pqMaintainIfDrifted(spark: org.apache.spark.sql.SparkSession,
                          path: String, recent: DataFrame,
                          corpus: DataFrame, maxRatio: Double,
                          dstPath: String): Boolean = {
    require(path != dstPath,
      "refit writes a new generation; src and dst must differ")
    if (pqDriftRatio(spark, path, recent) > maxRatio) {
      val (books, _) = pqLoadBooks(spark, path)
      val idx = pqBuild(corpus, m = books.length,
        kSub = books.map(_.length).max)
      pqSave(idx, dstPath)
      idx.release()
      true
    } else false
  }

  /** ADC top-k over a built/loaded index for an external query frame
    * `(vec_id, embedding)` — the serving half of the lifecycle. */
  def pqSearch(index: PqIndex, queries: DataFrame, k: Int): DataFrame =
    pqAdcSearch(index.coded,
      queries.select(col("vec_id"), asDouble(col("embedding")).as("e")),
      index.books, index.sub, k)

  /** Serving-path `PQ,RefineFlat`: ADC retrieval over the index, exact
    * float re-rank against a corpus frame — the long-lived-index
    * counterpart of `pqTopKRefine` (which refits per call). */
  def pqSearchRefine(index: PqIndex, queries: DataFrame, corpus: DataFrame,
                     k: Int, refine: Int = 8): DataFrame =
    exactRerank(pqSearch(index, queries, k * refine).select("qid", "vid"),
      corpus, queries, k)

  // ---------------------------------------------------------------- OPQ

  /** OPQ rotation fit (Ge et al., CVPR 2013, the non-parametric
    * alternation; FAISS `OPQ{m}` pretransform): alternate (a) PQ
    * codebook fit on the rotated sample with (b) an orthogonal
    * Procrustes solve aligning the rotated points to their PQ
    * reconstructions. Column convention: the returned row-major `A`
    * is the transform actually applied, `y = A·x`; the Procrustes
    * step maximizes `tr(A·B)` with `B = Σ x·x̂ᵀ`, so `A = V·Uᵀ` from
    * `B = U·S·Vᵀ` (breeze SVD on a dim×dim matrix — driver-trivial).
    * Everything is seeded/deterministic like `pqFitBooksLocal`.
    *
    * Returns the rotation and the codebooks fitted against the FINAL
    * rotation, ready for `PqEncode` over `MatVec`-rotated vectors. */
  private[graft] def opqFitLocal(pts: Array[Array[Double]], m: Int,
                                 kSub: Int, sub: Int, iters: Int = 8,
                                 maxIter: Int = 20)
      : (Array[Double], Array[Array[Array[Double]]]) = {
    val dim = m * sub
    var a: Array[Array[Double]] =
      Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    def applyA(x: Array[Double]): Array[Double] = {
      val y = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var s = 0.0; var j = 0
        while (j < dim) { s += a(i)(j) * x(j); j += 1 }
        y(i) = s; i += 1
      }
      y
    }
    // nearest-centroid reconstruction of one rotated point (the
    // driver-side mirror of PqEncode + decode)
    def recon(books: Array[Array[Array[Double]]], x: Array[Double]): Array[Double] = {
      val y = new Array[Double](dim)
      var j = 0
      while (j < m) {
        var best = 0; var bestD = Double.PositiveInfinity
        var c = 0
        while (c < books(j).length) {
          val cent = books(j)(c)
          var d = 0.0; var t = 0
          while (t < sub) {
            val dv = x(j * sub + t) - cent(t); d += dv * dv; t += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        System.arraycopy(books(j)(best), 0, y, j * sub, sub)
        j += 1
      }
      y
    }
    var books: Array[Array[Array[Double]]] = null
    // alternation steps only need codebooks good enough to steer the
    // Procrustes solve — run them at a third of the Lloyd budget and
    // spend the full budget once, on the final fit (FAISS OPQ trains
    // its intermediate ProductQuantizers with reduced niter the same
    // way); measured 8.7 s → ~4 s per 16 k-sample fit at equal recall
    val innerIter = math.max(4, maxIter / 3)
    // per-point work (rotation apply, nearest-centroid reconstruction)
    // parallelizes across the sample with one array slot per index —
    // no reduction, so results are BIT-IDENTICAL to the sequential
    // loop; the B accumulation below stays sequential because its
    // floating-point sum order is part of the deterministic contract
    def parTab(n: Int)(f: Int => Array[Double]): Array[Array[Double]] = {
      val out = new Array[Array[Double]](n)
      java.util.stream.IntStream.range(0, n).parallel()
        .forEach(i => out(i) = f(i))
      out
    }
    var it = 0
    while (it < iters) {
      val rot = parTab(pts.length)(i => applyA(pts(i)))
      books = pqFitBooksLocal(rot, m, kSub, sub,
        if (it < iters - 1) innerIter else maxIter)
      if (it < iters - 1) {
        val bks = books
        val xhs = parTab(pts.length)(i => recon(bks, rot(i)))
        val b = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
        var n = 0
        while (n < pts.length) {
          val x = pts(n)
          val xh = xhs(n)
          var i = 0
          while (i < dim) {
            val xi = x(i)
            if (xi != 0.0) {
              var j = 0
              while (j < dim) { b(i, j) += xi * xh(j); j += 1 }
            }
            i += 1
          }
          n += 1
        }
        val svd = breeze.linalg.svd(b)
        val aNew = svd.Vt.t * svd.U.t // A = V·Uᵀ maximizes tr(A·B)
        a = Array.tabulate(dim, dim)((i, j) => aNew(i, j))
      }
      it += 1
    }
    (a.flatten, books)
  }

  /** A built OPQ index: the applied rotation (row-major dim×dim) plus
    * the PQ index over rotated vectors. Search rotates the query with
    * the same `MatVec` and runs plain ADC — rotation is orthonormal,
    * so norms and cosines are preserved and the refine stage stays the
    * UNROTATED float store (exact, transform-free). */
  final case class OpqIndex(rot: Array[Double], pq: PqIndex) {
    def dim: Int = pq.books.length * pq.sub
    def release(): Unit = pq.release()
  }

  /** Fit rotation + codebooks on the driver sample, then rotate-encode
    * the corpus in ONE codegen'd scan (`MatVec` fused under
    * `PqEncode`) — FAISS `OPQ{m},PQ{m}` train + add. */
  def opqBuild(vecs: DataFrame, m: Int = 16, kSub: Int = 256,
               iters: Int = 8): OpqIndex = {
    val base = vecs.select(col("vec_id"), asDouble(col("embedding")).as("e"))
    val dim = base.select(size(col("e"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    val (rot, books) = opqFitLocal(pqSamplePoints(base), m, kSub, sub, iters)
    val rotated = base.select(col("vec_id"),
      graft.functions.MatVecF(col("e"), rot, dim).as("e"))
    val coded = pqEncodeFrame(rotated, books, sub)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    coded.count()
    OpqIndex(rot, PqIndex(books, sub, coded))
  }

  /** ADC top-k over an OPQ index: queries ride through the same
    * rotation, then the plain PQ ADC path scores the rotated-space
    * cosine (= the original cosine, A orthonormal). */
  def opqSearch(index: OpqIndex, queries: DataFrame, k: Int): DataFrame =
    pqAdcSearch(index.pq.coded,
      queries.select(col("vec_id"),
        graft.functions.MatVecF(asDouble(col("embedding")), index.rot, index.dim).as("e")),
      index.pq.books, index.pq.sub, k)

  /** `OPQ{m},PQ{m},RefineFlat`: ADC over the rotated codes, exact float
    * re-rank against the unrotated corpus. */
  def opqSearchRefine(index: OpqIndex, queries: DataFrame, corpus: DataFrame,
                      k: Int, refine: Int = 8): DataFrame =
    exactRerank(opqSearch(index, queries, k * refine).select("qid", "vid"),
      corpus, queries, k)

  /** One-call OPQ top-k on an `(vec_id, embedding)` frame — the OPQ
    * counterpart of `pqTopK` (queries = ids below `nQueries`). */
  def opqTopK(emb: DataFrame, nQueries: Int, k: Int, m: Int = 16,
              kSub: Int = 256, iters: Int = 8): DataFrame = {
    val index = opqBuild(emb.where(col("vec_id") >= nQueries), m, kSub, iters)
    try {
      val res = opqSearch(index, emb.where(col("vec_id") < nQueries), k)
      // materialize the bounded nQueries·k result, then release the
      // persisted codes frame (the pqTopK release pattern — no leak)
      val rows = res.collect().toIndexedSeq
      val spark = emb.sparkSession
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), res.schema)
    } finally index.release()
  }

  def opqTopKRefine(emb: DataFrame, nQueries: Int, k: Int, m: Int = 16,
                    kSub: Int = 256, refine: Int = 8,
                    iters: Int = 8): DataFrame =
    exactRerank(opqTopK(emb, nQueries, k * refine, m, kSub, iters)
      .select("qid", "vid"), emb, emb.where(col("vec_id") < nQueries), k)

  /** Persist: `pqSave` layout plus a `rot/` table (dim rows — the
    * pretransform matrix is metadata-sized). */
  def opqSave(index: OpqIndex, path: String): Unit = {
    val spark = index.pq.coded.sparkSession
    import spark.implicits._
    pqSave(index.pq, path)
    val d = index.dim
    (0 until d).map(i =>
        (i, index.rot.slice(i * d, (i + 1) * d).toSeq)).toDF("i", "row")
      .repartition(1).write.mode("overwrite").parquet(s"$path/rot")
  }

  def opqLoad(spark: org.apache.spark.sql.SparkSession, path: String): OpqIndex =
    OpqIndex(opqLoadRot(spark, path), pqLoad(spark, path))

  /** The rotation half of `opqLoad` — one bounded collect (dim rows),
    * no codes scan: what audits read. */
  private[graft] def opqLoadRot(spark: org.apache.spark.sql.SparkSession,
                                path: String): Array[Double] =
    spark.read.parquet(s"$path/rot").select("i", "row").collect()
      .sortBy(_.getInt(0)).flatMap(_.getSeq[Double](1))

  /** FROZEN-transform append: rotate + encode new vectors under the
    * saved rotation/codebooks, append to `codes/` — O(batch). */
  def opqAppendSave(spark: org.apache.spark.sql.SparkSession, path: String,
                    newVecs: DataFrame): Unit = {
    val index = opqLoad(spark, path)
    try {
      val base = newVecs.select(col("vec_id"), asDouble(col("embedding")).as("e"))
      val rotated = base.select(col("vec_id"),
        graft.functions.MatVecF(col("e"), index.rot, index.dim).as("e"))
      pqEncodeFrame(rotated, index.pq.books, index.pq.sub)
        .write.mode("append").parquet(s"$path/codes")
    } finally index.release()
  }

  /** Drift ratio for an `opqSave`d store — `pqDriftRatio` with the
    * rotation treated as part of the density model: the frozen side
    * scores the stored rotation+codebooks on a recent-batch sample,
    * the fresh side re-runs the full `opqFitLocal` alternation on the
    * same sample. ≈1 in-distribution; grows as the feed leaves the
    * distribution the pretransform was aligned to. Bounded driver
    * work, nothing corpus-sized. */
  def opqDriftRatio(spark: org.apache.spark.sql.SparkSession, path: String,
                    recent: DataFrame, sampleCap: Int = 2048): Double = {
    val (books, sub) = pqLoadBooks(spark, path)
    val rot = opqLoadRot(spark, path)
    val dim = books.length * sub
    def rotate(r: Array[Double], x: Array[Double]): Array[Double] =
      Array.tabulate(dim) { i =>
        var s = 0.0
        var j = 0
        while (j < dim) { s += r(i * dim + j) * x(j); j += 1 }
        s
      }
    val base = recent.select(col("vec_id"), asDouble(col("embedding")).as("e"))
    val pts = pqSamplePoints(base, sampleCap)
    require(pts.nonEmpty, "opqDriftRatio needs a non-empty recent batch")
    val frozen = pqDistortionOf(books, sub, pts.map(rotate(rot, _)))
    val (fRot, fBooks) = opqFitLocal(pts, books.length,
      books.map(_.length).max, sub)
    val fresh = pqDistortionOf(fBooks, sub, pts.map(rotate(fRot, _)))
    if (fresh <= 0.0) { if (frozen <= 0.0) 1.0 else Double.PositiveInfinity }
    else frozen / fresh
  }

  /** Refit-on-drift for the OPQ tier: same source-corpus contract as
    * `pqMaintainIfDrifted` (codes are lossy), rebuilding rotation AND
    * codebooks at the store's own (m, kSub). */
  def opqMaintainIfDrifted(spark: org.apache.spark.sql.SparkSession,
                           path: String, recent: DataFrame,
                           corpus: DataFrame, maxRatio: Double,
                           dstPath: String): Boolean = {
    require(path != dstPath,
      "refit writes a new generation; src and dst must differ")
    if (opqDriftRatio(spark, path, recent) > maxRatio) {
      val (books, _) = pqLoadBooks(spark, path)
      val idx = opqBuild(corpus, m = books.length,
        kSub = books.map(_.length).max)
      opqSave(idx, dstPath)
      idx.release()
      true
    } else false
  }

  /** IVF,PQ composite — FAISS's workhorse index for billion-vector
    * corpora (`IVF{n},PQ{m}`, Jégou 2011 §IV): a coarse KMeans
    * quantizer routes each vector to an inverted list, and the vector
    * is stored ONLY as its `m` PQ codes. A search probes `nProbe`
    * lists and runs ADC inside them — the scan touches
    * `nProbe/nList` of the corpus at `m` bytes per row, the product
    * of both prunings (IVF's list pruning × PQ's 32× compression).
    * Codes are global-codebook (the FAISS `by_residual=false` inner-
    * product configuration — residual coding helps L2, not cosine).
    *
    * `coded` is `(vid, codes, list_id)`; persisted once, searched
    * many times — and `ivfPqSave` writes it partitioned by `list_id`,
    * so a reloaded search's probe join prunes to the probed lists'
    * FILES at the scan, same as the float IVF store. */
  final case class IvfPqIndex(centroids: Array[(Int, Array[Double])],
                              books: Array[Array[Array[Double]]], sub: Int,
                              coded: DataFrame, nList: Int) {
    def release(): Unit = coded.unpersist(blocking = false)
  }

  /** `sampleFit = true` swaps the distributed coarse KMeans for the
    * bounded driver fit (`coarseFitSample`) with codegen Euclidean
    * assignment — same tradeoff and same dial-invariance argument as
    * `ivfBuild(sampleFit = true)`; the codebooks already fit on a
    * driver sample either way. */
  def ivfPqBuild(corpus: DataFrame, nList: Int = 8, m: Int = 16,
                 kSub: Int = 256, sampleFit: Boolean = false): IvfPqIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val base = corpus.select(col("vec_id"), asDouble(col("embedding")).as("e"))
    val dim = base.select(size(col("e"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    val books = pqFitBooks(base, m, kSub, sub)
    val flat = books.flatMap(_.flatMap(_.toSeq))
    val ks = books.map(_.length)
    val (cents, listed) =
      if (sampleFit) {
        val cs = coarseFitSample(base, nList)
        val aug = cs.flatMap(c => c :+ (-0.5 * c.map(v => v * v).sum))
        (cs.zipWithIndex.map { case (c, i) => (i, c) },
          base.select(col("vec_id"), col("e"),
            explode(graft.functions.NearestLists(
              concat(col("e"), array(lit(1.0d))), aug,
              cs.indices.toArray, dim + 1, 1)).as("list_id")))
      } else {
        val withF = base.withColumn("features", array_to_vector(col("e")))
        val coarse = new KMeans().setK(nList).setSeed(42L).setMaxIter(5)
          .setFeaturesCol("features").setPredictionCol("list_id").fit(withF)
        (coarse.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) },
          coarse.transform(withF))
      }
    val coded = listed
      .select(col("vec_id").as("vid"),
        graft.functions.Pq.encode(col("e"), flat, ks, sub).as("codes"),
        col("list_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    coded.count()
    IvfPqIndex(cents, books, sub, coded, cents.length)
  }

  /** Probe + ADC: per query the driver picks the `nProbe` nearest
    * lists (centroids are nList rows — metadata) and computes the PQ
    * LUT; the distributed side joins codes to probes on `list_id`
    * (broadcast — the probe frame is nQueries·nProbe rows) and sums
    * `m` LUT lookups per surviving row. Nothing but probed lists'
    * codes is ever read. */
  def ivfPqSearch(index: IvfPqIndex, queries: DataFrame, k: Int,
                  nProbe: Int = 2): DataFrame = {
    val m = index.books.length
    val offs = index.books.map(_.length).scanLeft(0)(_ + _)
    val spark = index.coded.sparkSession
    import spark.implicits._
    val probeRows: Seq[(Long, Int, Seq[Double])] = queries
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .orderBy("vec_id").collect().toSeq
      .flatMap { r =>
        val qe = r.getSeq[Double](1).toArray
        val n0 = math.sqrt(qe.map(x => x * x).sum)
        val nrm = if (n0 > 0) n0 else 1.0
        val lut: Seq[Double] = for (j <- 0 until m; c <- index.books(j).indices) yield {
          var s = 0.0
          var t = 0
          while (t < index.sub) { s += qe(j * index.sub + t) * index.books(j)(c)(t); t += 1 }
          s / nrm
        }
        // nearest lists by max query·centroid (ties to lower list id)
        val lists = index.centroids
          .map { case (lid, cent) =>
            var s = 0.0
            var t = 0
            while (t < cent.length) { s += qe(t) * cent(t); t += 1 }
            (-s, lid)
          }
          .sorted.take(nProbe).map(_._2)
        lists.map(lid => (r.getLong(0), lid, lut))
      }
    val probes = probeRows.toDF("qid", "list_id", "lut")
    val adc = (0 until m).map(j =>
      element_at(col("lut"),
        element_at(col("codes"), j + 1) + lit(offs(j)) + 1)).reduce(_ + _)
    index.coded.join(broadcast(probes), Seq("list_id"))
      .select(col("qid"), col("vid"), adc.as("cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vid").asc)))
      .where(col("rnk") <= k)
      .select("qid", "rnk", "vid")
      .orderBy("qid", "rnk")
  }

  /** One-shot IVF,PQ top-k (the driver-query form, `ivfTopK`'s
    * contract): build on the candidate corpus, search the query
    * slice, release. */
  def ivfPqTopK(emb: DataFrame, nQueries: Int, k: Int, nList: Int = 8,
                nProbe: Int = 2, m: Int = 16, kSub: Int = 256): DataFrame = {
    val index = ivfPqBuild(emb.where(col("vec_id") >= nQueries), nList, m, kSub)
    try {
      val res = ivfPqSearch(index, emb.where(col("vec_id") < nQueries), k, nProbe)
      val rows = res.collect().toIndexedSeq
      val spark = emb.sparkSession
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), res.schema)
    } finally index.release()
  }

  /** Persist an IVF,PQ index (`centroids/`, `books/`, `codes/`
    * partitioned by `list_id` for probe-time partition pruning) —
    * completing save/load across the whole ANN ladder. */
  def ivfPqSave(index: IvfPqIndex, path: String): Unit = {
    val spark = index.coded.sparkSession
    import spark.implicits._
    index.centroids.map { case (i, c) => (i, c.toSeq) }.toSeq
      .toDF("list_id", "centroid")
      .repartition(1).write.mode("overwrite").parquet(s"$path/centroids")
    val bookRows = for {
      (book, j) <- index.books.zipWithIndex
      (cent, c) <- book.zipWithIndex
    } yield (j, c, cent.toSeq)
    bookRows.toSeq.toDF("j", "c", "cent")
      .repartition(1).write.mode("overwrite").parquet(s"$path/books")
    // whole lists per task before the partitioned write (the ivfSave
    // small-files rule: partitions×nList slivers otherwise)
    graft.core.Stores.writeLayout(index.coded, col("list_id"))
      .write.mode("overwrite")
      .partitionBy("list_id").parquet(s"$path/codes")
  }

  /** Metadata halves of a saved IVF,PQ index (coarse centroids + PQ
    * codebooks) WITHOUT touching the codes store — what append needs:
    * both reads are bounded (nList + m·kSub rows). */
  private def ivfPqMeta(spark: org.apache.spark.sql.SparkSession, path: String)
      : (Array[(Int, Array[Double])], Array[Array[Array[Double]]]) = {
    val cents = spark.read.parquet(s"$path/centroids")
      .select("list_id", "centroid").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val bookRows = spark.read.parquet(s"$path/books")
      .select("j", "c", "cent").collect()
    val m = bookRows.map(_.getInt(0)).max + 1
    val books = Array.tabulate(m) { j =>
      bookRows.filter(_.getInt(0) == j).sortBy(_.getInt(1))
        .map(_.getSeq[Double](2).toArray)
    }
    (cents, books)
  }

  def ivfPqLoad(spark: org.apache.spark.sql.SparkSession,
                path: String): IvfPqIndex = {
    val (cents, books) = ivfPqMeta(spark, path)
    val coded = spark.read.parquet(s"$path/codes")
      .select(col("vid"), col("codes"), col("list_id").cast("int").as("list_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // sub = width of any PQ codebook centroid
    IvfPqIndex(cents, books, books(0)(0).length, coded, cents.length)
  }

  /** Append NEW vectors to an `ivfPqSave`d store: assign against the
    * saved coarse centroids (argmin |c|² − 2·e·c, the quantizer's own
    * metric — |e|² is rank-constant) and encode with the saved frozen
    * codebooks, then append to the partitioned codes store. O(batch)
    * like `ivfAppendSave`/`pqAppendSave`; only metadata is read. */
  def ivfPqAppendSave(spark: org.apache.spark.sql.SparkSession, path: String,
                      newVecs: DataFrame): Unit = {
    val (cents, books) = ivfPqMeta(spark, path)
    val sub = books(0)(0).length
    val flat = books.flatMap(_.flatMap(_.toSeq))
    val ks = books.map(_.length)
    // Euclidean argmin via NearestLists (augmented-dot trick) — the
    // former per-centroid struct/array_sort expression tree inlined
    // O(nList) typedLit subtrees, the exact fresh-plan Catalyst cost
    // cliff the round-6 q65 rule warns about, and maintenance scales
    // nList with the store
    val sorted = cents.sortBy(_._1)
    val dim = sorted(0)._2.length
    val aug = sorted.flatMap { case (_, c) => c :+ (-0.5 * c.map(v => v * v).sum) }
    val ids = sorted.map(_._1)
    newVecs.select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .select(col("vec_id").as("vid"),
        graft.functions.Pq.encode(col("e"), flat, ks, sub).as("codes"),
        explode(graft.functions.NearestLists(
          concat(col("e"), array(lit(1.0d))), aug, ids, dim + 1, 1)).as("list_id"))
      // one file per touched list (pinned width)
      .transform(graft.core.Stores.writeLayout(_, col("list_id")))
      .write.mode("append").partitionBy("list_id").parquet(s"$path/codes")
  }

  /** PQ + exact re-rank: ADC retrieves `k × refine` candidates, the
    * float store re-scores only those (the `PQ8,RefineFlat` composite).
    * Same repair economics as `ivfSearchSq8Refine` — the refine join
    * touches k·refine rows per query. */
  def pqTopKRefine(emb: DataFrame, nQueries: Int, k: Int,
                   m: Int = 16, kSub: Int = 256, refine: Int = 8): DataFrame =
    exactRerank(pqTopK(emb, nQueries, k * refine, m, kSub).select("qid", "vid"),
      emb, emb.where(col("vec_id") < nQueries), k)

  /** List occupancy of an `ivfPqSave`d store, empty lists included —
    * `ivfListStats` for the composite tier, read straight off the
    * partitioned codes store (one hash agg; the partition column IS
    * the group key, so the scan never materializes code payloads). */
  def ivfPqListStats(spark: org.apache.spark.sql.SparkSession,
                     path: String): DataFrame = {
    val counts = spark.read.parquet(s"$path/codes")
      .groupBy(col("list_id").cast("int").as("list_id"))
      .agg(count(lit(1)).as("n_vecs"))
    spark.read.parquet(s"$path/centroids").select("list_id")
      .join(counts, Seq("list_id"), "left")
      .select(col("list_id"), coalesce(col("n_vecs"), lit(0L)).as("n_vecs"))
      .orderBy("list_id")
  }

  /** Occupancy skew of an `ivfPqSave`d store (max/mean — `ivfSkew`'s
    * semantics on the composite tier). */
  def ivfPqSkew(spark: org.apache.spark.sql.SparkSession,
                path: String): Double = {
    val rows = ivfPqListStats(spark, path)
      .agg(max(col("n_vecs")).as("mx"), sum(col("n_vecs")).as("tot"),
        count(lit(1)).as("nl")).head()
    if (rows.isNullAt(1) || rows.getLong(1) == 0L) 1.0
    else rows.getLong(0).toDouble / (rows.getLong(1).toDouble / rows.getLong(2))
  }

  /** Refit-on-drift for the composite tier, gated on EITHER signal: a
    * drifted feed skews the coarse lists (occupancy) AND degrades the
    * codebooks (distortion), but either alone warrants the rebuild —
    * e.g. a within-region density shift moves distortion without
    * touching occupancy. Rebuilds from the SOURCE corpus at the
    * store's own (nList, m, kSub); same lossy-codes rationale and
    * reader-swap contract as `pqMaintainIfDrifted`. */
  def ivfPqMaintainIfDrifted(spark: org.apache.spark.sql.SparkSession,
                             path: String, recent: DataFrame,
                             corpus: DataFrame, maxSkew: Double,
                             maxRatio: Double, dstPath: String,
                             targetClusterRows: Long = 0L,
                             sampleFit: Boolean = false): Boolean = {
    require(path != dstPath,
      "refit writes a new generation; src and dst must differ")
    val (cents, books) = ivfPqMeta(spark, path)
    val sub = books(0)(0).length
    // growth gate (the maintainIndex rule applied to the composite
    // tier): frozen nList means probe cost grows with the store
    val storeRows = spark.read.parquet(s"$path/codes").count()
    val grown = targetClusterRows > 0L &&
      storeRows.toDouble / cents.length > 2.0 * targetClusterRows
    val drifted = grown || ivfPqSkew(spark, path) > maxSkew || {
      val base = recent.select(col("vec_id"), asDouble(col("embedding")).as("e"))
      val pts = pqSamplePoints(base, 2048)
      require(pts.nonEmpty, "ivfPqMaintainIfDrifted needs a non-empty recent batch")
      val frozen = pqDistortionOf(books, sub, pts)
      val fresh = pqDistortionOf(
        pqFitBooksLocal(pts, books.length, books.map(_.length).max, sub), sub, pts)
      fresh > 0.0 && frozen / fresh > maxRatio
    }
    if (drifted) {
      val k =
        if (targetClusterRows > 0L)
          math.max(cents.length,
            math.ceil(storeRows.toDouble / targetClusterRows).toInt)
        else cents.length
      val idx = ivfPqBuild(corpus, nList = k, m = books.length,
        kSub = books.map(_.length).max, sampleFit = sampleFit)
      ivfPqSave(idx, dstPath)
      idx.release()
      true
    } else false
  }

  /** IVF,PQ + exact re-rank: the `RefineFlat` stage over an `ivfPqSearch`
    * candidate pool — the same repair economics as `pqTopKRefine`, with
    * the float re-score touching only k·refine rows per query. */
  def ivfPqSearchRefine(index: IvfPqIndex, queries: DataFrame,
                        corpus: DataFrame, k: Int, nProbe: Int = 2,
                        refine: Int = 4): DataFrame =
    exactRerank(ivfPqSearch(index, queries, k * refine, nProbe)
      .select("qid", "vid"), corpus, queries, k)

  /** Shared RefineFlat second stage: exact float cosine over the
    * bounded (qid, vid) candidate frame — k·refine rows per query, one
    * equi-join to the float store, one broadcast of the query side. */
  private def exactRerank(cand: DataFrame, corpus: DataFrame,
                          queries: DataFrame, k: Int): DataFrame = {
    val flo = corpus.select(col("vec_id").as("vid"),
        asDouble(col("embedding")).as("ve"))
      .withColumn("vn", sqrt(dot(col("ve"), col("ve"))))
    val q = queries
      .select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qe"))
      .withColumn("qn", sqrt(dot(col("qe"), col("qe"))))
    cand.join(flo, Seq("vid"))
      .join(broadcast(q), Seq("qid"))
      .select(col("qid"), col("vid"),
        (dot(col("qe"), col("ve")) / (col("qn") * col("vn"))).as("cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vid").asc)))
      .where(col("rnk") <= k)
      .select("qid", "rnk", "vid")
      .orderBy("qid", "rnk")
  }

  /** LSH-bucketed embedding near-duplicate pairs — the scale path for
    * `cosineNearDupPairs`: pairs form only within sign-LSH buckets
    * (shuffle on bucket key), then the exact cosine threshold verifies.
    * Recall bounded by bucket collisions of true near-dups (near-dup
    * vectors agree on most sign bits).
    *
    * Scale guidance: size `nBits ≈ log2(N) − log2(targetBucketRows)` so
    * the per-bucket self-join stays linear — 6 bits suits the 5k-row
    * testdata; a 10⁹-vector corpus wants ~20 bits (or multi-table
    * probing for recall, the simhashPairs block-combination pattern). */
  def lshNearDupPairs(emb: DataFrame, threshold: Double, nBits: Int = 6): DataFrame = {
    val base = emb.select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("nrm", sqrt(dot(col("e"), col("e"))))
      .withColumn("bucket", bucketKey(col("e"), nBits))
    val a = base.select(col("bucket"), col("vec_id").as("a"), col("e").as("ea"), col("nrm").as("na"))
    val b = base.select(col("bucket"), col("vec_id").as("b"), col("e").as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("bucket"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"),
        (dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos"))
      .where(col("cos") >= threshold)
      .select("a", "b")
      .orderBy("a", "b")
  }

  /** SemDeDup-style cluster-scoped embedding near-duplicate pairs
    * (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): k-means cluster the
    * corpus, then compare pairs ONLY within a cluster — the all-pairs
    * join shrinks from N²/2 to Σ|cluster|²/2, and at scale each
    * cluster's self-join is an independent shuffle partition (join key
    * = list_id). Reuses the IVF coarse quantizer (`ivfBuild`, seeded
    * KMeans → deterministic), so the clustering cost is shared with
    * the ANN index when both are needed.
    *
    * Recall is bounded by true near-dup pairs straddling a cluster
    * boundary; semantically near-identical vectors (the high-threshold
    * regime SemDeDup targets) quantize to the same centroid almost
    * always — `SemDedupSpec` pins measured recall against the exact
    * all-pairs baseline (`cosineNearDupPairs`). Size nClusters ≈
    * N/targetClusterRows; a pathologically hot cluster can recurse
    * (re-cluster its members) without changing the interface.
    *
    * Cluster sizing is THE scale knob: candidates ≈ nAssign² × N ×
    * targetClusterRows / 2, linear in N for fixed cluster rows.
    * Measured at sf1 (20 k planted-cluster vectors): clusterRows=2000
    * left 77.4 M candidates (only 2.6× under all-pairs) where
    * clusterRows=200 gives 9.3 M (21.5× under) and a 2.9× faster pair
    * scan. Finer clustering loses boundary PAIRS (0.60 pair-level vs
    * the coarse run) but barely any DROPPED DOCS — drop-set agreement
    * measured 0.980, because a duplicate doc is caught via any
    * surviving pair (ScaleReport logs both). Target a few hundred
    * rows/cluster at corpus scale, never thousands.
    *
    * The per-call index is released in `finally`: the returned frame
    * stays correct (the plan re-derives assignments from the
    * driver-held fit model — a cheap projection; the KMeans FIT never
    * re-runs), it just isn't served from cache. Long-lived callers
    * should hold an `ivfBuild` index and pass it to the 2-arg form. */
  def semDedupPairs(emb: DataFrame, nClusters: Int, threshold: Double): DataFrame = {
    val index = ivfBuild(emb, nClusters)
    try semDedupPairs(index, threshold)
    finally index.release()
  }

  /** Corpus-adaptive sizing: nClusters = max(8, N / targetClusterRows),
    * so the candidate volume stays ≈ nAssign² × N × targetClusterRows/2
    * at ANY corpus size instead of silently degrading toward all-pairs
    * as the corpus outgrows a hardcoded cluster count (the measured
    * failure mode: 8 clusters over 20 k vectors left 77 M candidates —
    * 2.6× under all-pairs — where N/200 sizing gives 21.5× under with
    * drop-set agreement 0.98). Costs one `count()` of the corpus.
    *
    * Past the flat form's plan-width boundary the call switches to the
    * product-key blocking automatically: a single k=1000 KMeans plus a
    * 1000-column assignment projection measured 131 s at 200 k vectors
    * where two k=32 fits with 64 columns give the same ~1,000 cells —
    * so k > `widthCap` routes to `semDedupPairsPQ(kPerHalf = ⌈√k⌉)`. */
  def semDedupPairsAuto(emb: DataFrame, threshold: Double,
                        targetClusterRows: Long = 200L,
                        widthCap: Int = 512,
                        knownCount: Option[Long] = None): DataFrame = {
    val k = autoK(emb, targetClusterRows, knownCount)
    if (k <= widthCap) semDedupPairs(emb, k, threshold)
    else semDedupPairsPQ(emb, threshold,
      kPerHalf = math.ceil(math.sqrt(k.toDouble)).toInt)
  }

  /** Corpus-adaptive cluster count; `knownCount` lets callers that
    * already hold the corpus size (ScaleReport, repeated-call drivers)
    * skip the sizing `count()` scan. */
  private def autoK(emb: DataFrame, targetClusterRows: Long,
                    knownCount: Option[Long]): Int =
    math.max(8L, knownCount.getOrElse(emb.count()) / targetClusterRows).toInt

  /** Cluster-scoped near-dup pairs over an already-built index.
    *
    * `nAssign = 2`: each vector joins its 2 nearest clusters, not just
    * its own — the standard recall repair for pairs straddling a
    * cluster boundary (the same idea as `ivfSearch`'s nProbe, applied
    * symmetrically to the corpus). Measured on the driver testdata at
    * threshold 0.4: single-assignment recall 0.50 vs exact all-pairs;
    * nAssign=2 recovers the boundary pairs (SemDedupSpec pins ≥ 0.8).
    * Cost: 2× candidate rows, same per-cluster join shape.
    *
    * The 2nd-nearest centroid is computed as a PROJECTION: per-row
    * distances to every centroid unroll into codegen'd DotProduct
    * columns (centroids are driver-held and tiny — the KMeans model
    * itself is a driver object), then one small array_sort picks the
    * top `nAssign`. No N×nClusters row blow-up, no extra shuffle —
    * the alternative (cross-join against the centroid frame + window
    * per vid) would shuffle nClusters× the corpus. For very large
    * nClusters (≳10³) recurse hierarchically instead of widening the
    * plan. */
  def semDedupPairs(index: IvfIndex, threshold: Double, nAssign: Int = 2): DataFrame =
    pairsFromCells(flatCells(index, nAssign), threshold)

  /** Cell assignment for the flat (single-quantizer) form: each vector
    * lands in its `nAssign` nearest clusters → (gid, vid, e, nrm) rows,
    * nAssign per vector. See `semDedupPairs(index, ...)` for the
    * projection-not-join rationale. */
  private def flatCells(index: IvfIndex, nAssign: Int): DataFrame = {
    val cents: Array[(Int, Seq[Double])] = index.centroids
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
    val ranked = cents.map { case (i, c) =>
      val cArr = typedLit(c)
      val c2 = c.map(x => x * x).sum
      // euclidean d2 = |x|² − 2·x·c + |c|²; struct ordering sorts by
      // d2 first, centroid id breaks exact ties deterministically
      struct((col("cn") * col("cn") - lit(2.0) * dot(col("ce"), cArr) + lit(c2)).as("d2"),
        lit(i).as("cl"))
    }
    index.assigned
      .withColumn("s", explode(slice(array_sort(array(ranked.toIndexedSeq: _*)), 1, nAssign)))
      .select(col("s.cl").as("gid"), col("vid"), col("ce").as("e"), col("cn").as("nrm"))
  }

  /** All verified within-cell pairs: the within-cell self-join with the
    * exact full-vector cosine check. A pair can share both of its ends'
    * assigned cells — `distinct` emits it once. */
  private def pairsFromCells(cells: DataFrame, threshold: Double): DataFrame = {
    val a = cells.select(col("gid"), col("vid").as("a"),
      col("e").as("ea"), col("nrm").as("na"))
    val b = cells.select(col("gid"), col("vid").as("b"),
      col("e").as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("gid"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"),
        (dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos"))
      .where(col("cos") >= threshold)
      .select("a", "b").distinct()
      .orderBy("a", "b")
  }

  /** Rank-within-cell EARLY-DROP: the drop set of the keep policy
    * ("drop any vector with a ≥-threshold neighbor of smaller id")
    * without materializing the pair list. The within-cell comparison
    * runs as a LEFT SEMI join — Spark's semi hash join stops probing a
    * cell's build rows at the FIRST neighbor satisfying
    * `a < b && cos ≥ threshold`, so a vector with hundreds of
    * near-duplicates costs one probe, not hundreds of output rows.
    * On the 99%-dup sf10 corpus the pair form is output-bound (~57 M
    * pairs, SCALE.md); the semi form's output is bounded by the cell
    * rows themselves (nAssign per vector), independent of dup density.
    *
    * `shuffle_hash` hint on the build side for the same reason as the
    * band joins: the cells frame EXPLODES a persisted input, so the
    * static size estimate undercounts and would broadcast 10⁸ rows
    * (the round-3 driver-kill); AQE may still pick broadcast from
    * exact runtime sizes. */
  private def dropsFromCells(cells: DataFrame, threshold: Double): DataFrame = {
    val probe = cells.select(col("gid"), col("vid").as("b"),
      col("e").as("eb"), col("nrm").as("nb"))
    val build = cells.select(col("gid").as("gidr"), col("vid").as("a"),
      col("e").as("ea"), col("nrm").as("na"))
    probe.join(build.hint("shuffle_hash"),
        col("gid") === col("gidr") && col("a") < col("b") &&
          dot(col("ea"), col("eb")) / (col("na") * col("nb")) >= threshold,
        "left_semi")
      // a vector sits in nAssign cells → up to nAssign semi hits
      .select(col("b").as("vec_id")).distinct()
  }

  /** Two-level SemDeDup blocking — the path past the flat form's
    * plan-width boundary (k ≳ 10³ unrolled distance columns): the cell
    * key is the PRODUCT of two independent coarse quantizers fit on
    * the two halves of the embedding, giving k² effective cells for
    * only 2k unrolled columns (k=32 → 1,024 cells from 64 columns;
    * k=1024 → a million cells from 2,048 — enough that a 10⁹-vector
    * corpus keeps ~10³-row cells without a driver-side loop of
    * per-cell re-clustering). Near-identical vectors quantize
    * identically in BOTH halves, so true near-dup pairs stay
    * co-celled; `nAssign` nearest cells PER HALF repairs boundary
    * pairs (a pair escapes only if it straddles in a half where
    * neither end's second-nearest covers it). Precision stays 1.0 —
    * every candidate passes the exact full-vector cosine check.
    * Each vector lands in nAssign² cells (4 at the default), the
    * same candidate multiplier as the flat form's nAssign=2.
    *
    * The per-half argmin drops the |h|² term: it is constant per row,
    * so ranking by −2·h·c + |c|² picks the same centroid with one
    * fewer dot product per column. */
  def semDedupPairsPQ(emb: DataFrame, threshold: Double, kPerHalf: Int = 32,
                      nAssign: Int = 2): DataFrame =
    pairsFromCells(pqCells(emb, kPerHalf, nAssign), threshold)

  /** Cell assignment for the product-key form: two independent
    * per-half quantizers; gid = cl₁ × kPerHalf + cl₂; each vector lands
    * in nAssign² cells. See `semDedupPairsPQ` for the width rationale. */
  private def pqCells(emb: DataFrame, kPerHalf: Int, nAssign: Int): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val base = emb.select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("nrm", sqrt(dot(col("e"), col("e"))))
    val dim = base.select(size(col("e"))).head().getInt(0)
    val half = dim / 2
    def fitHalf(lo: Int, len: Int, seed: Long): Array[Seq[Double]] = {
      val vecs = base.select(slice(col("e"), lo, len).as("h"))
        .withColumn("features", array_to_vector(col("h")))
      new KMeans().setK(kPerHalf).setSeed(seed).setMaxIter(5)
        .setFeaturesCol("features").setPredictionCol("cl").fit(vecs)
        .clusterCenters.map(_.toArray.toSeq)
    }
    val cents1 = fitHalf(1, half, 42L)
    val cents2 = fitHalf(half + 1, dim - half, 43L)
    def rankedCells(cents: Array[Seq[Double]], h: Column): Column = {
      val structs = cents.zipWithIndex.map { case (c, i) =>
        val c2 = c.map(x => x * x).sum
        struct((lit(c2) - lit(2.0) * dot(h, typedLit(c))).as("d2"),
          lit(i).as("cl"))
      }
      slice(array_sort(array(structs.toIndexedSeq: _*)), 1, nAssign)
    }
    base
      .withColumn("s1", explode(rankedCells(cents1, slice(col("e"), 1, half))))
      .withColumn("s2", explode(rankedCells(cents2, slice(col("e"), half + 1, dim - half))))
      .select((col("s1.cl") * kPerHalf + col("s2.cl")).as("gid"),
        col("vec_id").as("vid"), col("e"), col("nrm"))
  }

  /** SemDeDup keep-list: drop every vector that has a near-duplicate
    * with a smaller id — the deterministic "keep one representative
    * per duplicate group" policy. The drop set comes from the
    * early-drop semi join (`dropsFromCells`) — identical by definition
    * to `semDedupPairs(...).select("b").distinct` but never
    * materializes the pair list, so the keep path's cost is bounded by
    * cell rows, not dup density. One anti-join against the drop set
    * closes it out. */
  def semDedupKeep(emb: DataFrame, nClusters: Int, threshold: Double): DataFrame = {
    val index = ivfBuild(emb, nClusters)
    try keepFromDrops(emb, dropsFromCells(flatCells(index, 2), threshold))
    finally index.release()
  }

  /** Corpus-adaptive keep-list: same sizing ladder as
    * `semDedupPairsAuto` (flat cells under `widthCap`, product-key
    * cells past it), with the early-drop semi join in both regimes. */
  def semDedupKeepAuto(emb: DataFrame, threshold: Double,
                       targetClusterRows: Long = 200L,
                       widthCap: Int = 512,
                       knownCount: Option[Long] = None): DataFrame = {
    val k = autoK(emb, targetClusterRows, knownCount)
    if (k <= widthCap) semDedupKeep(emb, k, threshold)
    else keepFromDrops(emb, dropsFromCells(
      pqCells(emb, kPerHalf = math.ceil(math.sqrt(k.toDouble)).toInt, nAssign = 2),
      threshold))
  }

  private def keepFromDrops(emb: DataFrame, drops: DataFrame): DataFrame =
    emb.join(drops, Seq("vec_id"), "left_anti")
      .select("vec_id")
      .orderBy("vec_id")

  /** Embedding-cosine near-duplicate pairs over a bounded id range
    * (correctness slice; the scale path is `lshNearDupPairs`). */
  def cosineNearDupPairs(emb: DataFrame, maxId: Long, threshold: Double): DataFrame = {
    val base = emb.where(col("vec_id") < maxId)
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("nrm", sqrt(dot(col("e"), col("e"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = base.select(col("vec_id").as("a"), col("e").as("ea"), col("nrm").as("na"))
    val b = base.select(col("vec_id").as("b"), col("e").as("eb"), col("nrm").as("nb"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        (dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos"))
      .where(col("cos") >= threshold)
      .select("a", "b")
      .orderBy("a", "b")
  }
}
