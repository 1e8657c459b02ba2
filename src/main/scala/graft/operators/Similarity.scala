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

  /** Sign-LSH bucket key: concatenated sign bits of the first `nBits`
    * dimensions. Random-hyperplane LSH with axis-aligned planes — adequate
    * for gaussian-ish embeddings and fully deterministic. */
  private def bucketKey(e: Column, nBits: Int): Column =
    concat((0 until nBits).map(i =>
      when(element_at(e, i + 1) > 0, lit("1")).otherwise(lit("0"))): _*)

  /** LSH-bucketed approximate nearest neighbors: queries search only their
    * own bucket. At scale: candidates shuffle on (bucket) — per-bucket
    * work, no cross join. Recall trades off with nBits. */
  def annLshTopK(emb: DataFrame, nQueries: Int, k: Int, nBits: Int = 6): DataFrame = {
    val base = emb.select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("nrm", sqrt(dot(col("e"), col("e"))))
      .withColumn("bucket", bucketKey(col("e"), nBits))
    val q = base.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"), col("bucket"))
    val c = base.where(col("vec_id") >= nQueries)
      .select(col("vec_id").as("vid"), col("e").as("ce"), col("nrm").as("cn"), col("bucket"))
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

  /** IVF (inverted-file) approximate nearest neighbors: coarse-quantize
    * the corpus with k-means centroids, assign each vector to its
    * nearest list, and search only the `nprobe` lists closest to each
    * query — the classic FAISS-style scale path. Training is
    * MLlib KMeans (seeded, deterministic per build); assignment and
    * search are pure DataFrame joins: candidates shuffle on their list
    * id, queries broadcast with their probe lists, no cross join.
    * Recall/latency trades off via nlist/nprobe. */
  def ivfTopK(emb: DataFrame, nQueries: Int, k: Int,
              nList: Int = 8, nProbe: Int = 2): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val base = emb.select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("nrm", sqrt(dot(col("e"), col("e"))))
    val vecs = base.withColumn("features", array_to_vector(col("e")))

    val model = new KMeans().setK(nList).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("features").setPredictionCol("list_id")
      .fit(vecs.where(col("vec_id") >= nQueries))

    val assigned = model.transform(vecs)

    // per-query probe lists: distance to every centroid (nList is tiny →
    // a literal frame, broadcast), keep the nProbe nearest
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.toSeq)
    }.toSeq
    val spark = emb.sparkSession
    import spark.implicits._
    val centDf = centroids.toDF("list_id", "centroid")
    val q = assigned.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"))
    val probes = q.crossJoin(broadcast(centDf))
      .withColumn("dist", -dot(col("qe"), col("centroid"))) // cosine-ish: max dot
      .withColumn("pr", row_number().over(
        Window.partitionBy("qid").orderBy(col("dist").asc, col("list_id").asc)))
      .where(col("pr") <= nProbe)
      .select(col("qid"), col("qe"), col("qn"), col("list_id"))

    val cand = assigned.where(col("vec_id") >= nQueries)
      .select(col("vec_id").as("vid"), col("e").as("ce"),
        col("nrm").as("cn"), col("list_id"))

    probes.join(cand, Seq("list_id"))
      .select(col("qid"), col("vid"),
        (dot(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("cos"))
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
