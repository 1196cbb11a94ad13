package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Cosine is built from `zip_with` + `aggregate` higher-order functions —
  * pure Catalyst expressions (codegen'd), no Scala UDF in the hot path.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double. */
  def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0d), (acc, v) => acc + v)

  def normCol(a: Column): Column = sqrt(dotCol(a, a))

  def cosineCol(a: Column, b: Column): Column =
    dotCol(a, b) / (normCol(a) * normCol(b))

  /** Brute-force exact top-k by cosine against one query vector —
    * the baseline: a single scan + TakeOrderedAndProject (per-partition
    * heap + driver merge), no shuffle of the embedding table.
    */
  def bruteForceTopK(df: DataFrame, vecCol: String, idCol: String,
      query: Array[Float], k: Int, excludeId: Option[Long] = None): DataFrame = {
    val qCol = array(query.map(v => lit(v)): _*)
    val base = df.select(col(idCol).as("id"),
      cosineCol(col(vecCol), qCol).as("cos"))
    val filtered = excludeId.map(e => base.filter(col("id") =!= e)).getOrElse(base)
    filtered.orderBy(desc("cos"), asc("id")).limit(k)
  }

  /** All pairs with cosine ≥ threshold. Brute force O(n²) via self-join —
    * correct baseline for specs/oracles ONLY, hence `private[graft]`: a
    * cartesian over a 10⁹-doc table must not be one import away from user
    * code. The LSH variant below is the scale path.
    */
  private[graft] def cosinePairs(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("ia"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("ib"), col(vecCol).as("vb"))
    a.crossJoin(b).filter(col("ia") < col("ib"))
      .withColumn("cos", cosineCol(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select("ia", "ib", "cos")
  }

  /** Deterministic random hyperplanes for sign-LSH. */
  def hyperplanes(dim: Int, planes: Int, seed: Long = 42L): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(planes)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  /** Sign signature: bit i set iff hp(i)·v ≥ 0 (double accumulation,
    * ascending element order — the DuckDB oracle replicates this with
    * `list_inner_product` over DOUBLE[] for bit-identical signs).
    */
  def sigOf(hp: Array[Array[Float]], v: Array[Float]): Int = {
    var s = 0
    var i = 0
    while (i < hp.length) {
      var d = 0d
      var j = 0
      while (j < v.length) { d += hp(i)(j).toDouble * v(j); j += 1 }
      if (d >= 0) s |= (1 << i)
      i += 1
    }
    s
  }

  /** All signatures within hamming distance ≤ probeRadius of qSig. */
  def probeSet(qSig: Int, planes: Int, probeRadius: Int): Seq[Int] = {
    val buf = scala.collection.mutable.ArrayBuffer(qSig)
    if (probeRadius >= 1) (0 until planes).foreach(i => buf += (qSig ^ (1 << i)))
    if (probeRadius >= 2)
      for (i <- 0 until planes; j <- (i + 1) until planes)
        buf += (qSig ^ (1 << i) ^ (1 << j))
    buf.distinct.toSeq
  }

  /** Build the persisted sign-LSH ANN index: the embedding table written
    * ONCE partitioned by sig bucket. This is the scale path — at 10⁹
    * vectors the build is one shuffle-free write (sig is a per-row
    * function) and every query reads only its probed partitions.
    */
  def writeLshIndex(df: DataFrame, vecCol: String, idCol: String,
      dir: String, planes: Int = 10, seed: Long = 42L): Unit = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    val hp = hyperplanes(dim, planes, seed)
    val sigUdf = udf((v: Array[Float]) => sigOf(hp, v))
    df.select(col(idCol).as("id"), col(vecCol).as("vec"),
        sigUdf(col(vecCol)).as("sig"))
      .write.mode("overwrite").partitionBy("sig").parquet(dir)
  }

  /** Query the persisted index: multi-probe (hamming ≤ probeRadius around
    * the query's sig) via a PARTITION-PRUNED read — directory pruning on
    * the sig partition column, asserted in PlanSpec — then exact cosine
    * top-k over the candidates only. Approximate: recall vs
    * bruteForceTopK measured in OpsSpec.
    */
  def lshTopKIndexed(spark: org.apache.spark.sql.SparkSession, dir: String,
      query: Array[Float], k: Int, planes: Int = 10, probeRadius: Int = 2,
      seed: Long = 42L, excludeId: Option[Long] = None): DataFrame = {
    val hp = hyperplanes(query.length, planes, seed)
    val probes = probeSet(sigOf(hp, query), planes, probeRadius)
    val qCol = array(query.map(v => lit(v)): _*)
    val base = spark.read.parquet(dir)
      .filter(col("sig").isin(probes: _*))
      .select(col("id"), cosineCol(col("vec"), qCol).as("cos"))
    val filtered = excludeId.map(e => base.filter(col("id") =!= e)).getOrElse(base)
    filtered.orderBy(desc("cos"), asc("id")).limit(k)
  }

  /** One-shot sign-LSH top-k WITHOUT a persisted index (computes sigs with
    * a full scan) — only for ad-hoc queries over unindexed tables; use
    * [[writeLshIndex]] + [[lshTopKIndexed]] for repeated queries at scale.
    */
  def lshTopK(df: DataFrame, vecCol: String, idCol: String,
      query: Array[Float], k: Int, planes: Int = 12, probeRadius: Int = 1,
      seed: Long = 42L, excludeId: Option[Long] = None): DataFrame = {
    val hp = hyperplanes(query.length, planes, seed)
    val sigUdf = udf((v: Array[Float]) => sigOf(hp, v))
    val probes = probeSet(sigOf(hp, query), planes, probeRadius)
    val qCol = array(query.map(v => lit(v)): _*)
    val base = df
      .withColumn("_sig", sigUdf(col(vecCol)))
      .filter(col("_sig").isin(probes: _*))
      .select(col(idCol).as("id"), cosineCol(col(vecCol), qCol).as("cos"))
    val filtered = excludeId.map(e => base.filter(col("id") =!= e)).getOrElse(base)
    filtered.orderBy(desc("cos"), asc("id")).limit(k)
  }

  // ---------- IVF (inverted-file) ANN ----------

  /** Deterministic random codebook: `nlist` gaussian centroids. A
    * data-independent codebook (random-projection IVF) trades a little
    * recall vs k-means for full cross-engine reproducibility — the DuckDB
    * oracle inlines the same centroids and must produce identical cells.
    */
  def ivfCentroids(dim: Int, nlist: Int, seed: Long = 4242L): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nlist)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  /** Cell assignment: argmax centroid dot product (double accumulation in
    * element order; ties → lowest centroid index).
    */
  def ivfAssign(centroids: Array[Array[Float]], v: Array[Float]): Int = {
    var best = 0
    var bestD = Double.NegativeInfinity
    var i = 0
    while (i < centroids.length) {
      var d = 0d
      var j = 0
      while (j < v.length) { d += centroids(i)(j).toDouble * v(j); j += 1 }
      if (d > bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** Build the IVF index: embeddings written once partitioned by cell. */
  def writeIvfIndex(df: DataFrame, vecCol: String, idCol: String,
      dir: String, nlist: Int = 16, seed: Long = 4242L): Unit = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    val cents = ivfCentroids(dim, nlist, seed)
    val cellUdf = udf((v: Array[Float]) => ivfAssign(cents, v))
    df.select(col(idCol).as("id"), col(vecCol).as("vec"),
        cellUdf(col(vecCol)).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
  }

  /** Query the IVF index: the `nprobe` cells whose centroids score
    * highest against the query are read (partition-pruned), then exact
    * cosine top-k over the candidates.
    */
  def ivfTopK(spark: org.apache.spark.sql.SparkSession, dir: String,
      query: Array[Float], k: Int, nlist: Int = 16, nprobe: Int = 4,
      seed: Long = 4242L, excludeId: Option[Long] = None): DataFrame = {
    val cents = ivfCentroids(query.length, nlist, seed)
    val scored = cents.zipWithIndex.map { case (c, i) =>
      var d = 0d
      var j = 0
      while (j < query.length) { d += c(j).toDouble * query(j); j += 1 }
      (i, d)
    }
    val probes = scored.sortBy { case (i, d) => (-d, i) }.take(nprobe).map(_._1)
    val qCol = array(query.map(v => lit(v)): _*)
    val base = spark.read.parquet(dir)
      .filter(col("cell").isin(probes.toSeq: _*))
      .select(col("id"), cosineCol(col("vec"), qCol).as("cos"))
    val filtered = excludeId.map(e => base.filter(col("id") =!= e)).getOrElse(base)
    filtered.orderBy(desc("cos"), asc("id")).limit(k)
  }

  /** Lloyd-refined IVF codebook, seeded from the deterministic random
    * codebook: `iters` rounds of assign (dot-product argmax, [[ivfAssign]])
    * → per-cell per-dimension mean. The heavy work is distributed
    * (assignment is a map; the mean is one groupBy over nlist×dim cells) —
    * only the nlist×dim codebook floats ever reach the driver, so the
    * shape holds at 10⁹ vectors. Cells that lose all members keep their
    * previous centroid. Deterministic for a given (table, seed).
    */
  def kmeansCentroids(df: DataFrame, vecCol: String, nlist: Int = 16,
      iters: Int = 5, seed: Long = 4242L): Array[Array[Float]] = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    var cents = ivfCentroids(dim, nlist, seed)
    var it = 0
    while (it < iters) {
      val bc = df.sparkSession.sparkContext.broadcast(cents)
      val cellUdf = udf((v: Array[Float]) => ivfAssign(bc.value, v))
      val means = df
        .select(cellUdf(col(vecCol)).as("cell"),
          posexplode(col(vecCol)).as(Seq("d", "x")))
        .groupBy("cell", "d").agg(avg(col("x").cast("double")).as("m"))
        .collect()
      val next = cents.map(_.clone())
      means.foreach { r =>
        next(r.getAs[Int]("cell"))(r.getAs[Int]("d")) =
          r.getAs[Double]("m").toFloat
      }
      cents = next
      it += 1
    }
    cents
  }

  /** Build the IVF index with a k-means-refined codebook; the centroids
    * are persisted next to the partitions (centroids.json) so queries —
    * and any external verifier — can reload them exactly.
    */
  def writeIvfIndexRefined(df: DataFrame, vecCol: String, idCol: String,
      dir: String, nlist: Int = 16, iters: Int = 5,
      seed: Long = 4242L): Array[Array[Float]] = {
    val cents = kmeansCentroids(df, vecCol, nlist, iters, seed)
    val bc = df.sparkSession.sparkContext.broadcast(cents)
    val cellUdf = udf((v: Array[Float]) => ivfAssign(bc.value, v))
    df.select(col(idCol).as("id"), col(vecCol).as("vec"),
        cellUdf(col(vecCol)).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    // underscore prefix: Spark's parquet reader ignores _-prefixed files
    val json = cents.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_centroids.json"), json)
    cents
  }

  def readIvfCentroids(dir: String): Array[Array[Float]] = {
    val s = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "_centroids.json"))
    s.stripPrefix("[").stripSuffix("]").split("\\],\\[")
      .map(_.replaceAll("[\\[\\]]", "").split(",").map(_.toFloat))
  }

  /** Query a refined IVF index (centroids from centroids.json): top-nprobe
    * cells by centroid·query, partition-pruned read, exact cosine top-k.
    */
  def ivfTopKRefined(spark: org.apache.spark.sql.SparkSession, dir: String,
      query: Array[Float], k: Int, nprobe: Int = 4,
      excludeId: Option[Long] = None): DataFrame = {
    val cents = readIvfCentroids(dir)
    val scored = cents.zipWithIndex.map { case (c, i) =>
      var d = 0d
      var j = 0
      while (j < query.length) { d += c(j).toDouble * query(j); j += 1 }
      (i, d)
    }
    val probes = scored.sortBy { case (i, d) => (-d, i) }.take(nprobe).map(_._1)
    val qCol = array(query.map(v => lit(v)): _*)
    val base = spark.read.parquet(dir)
      .filter(col("cell").isin(probes.toSeq: _*))
      .select(col("id"), cosineCol(col("vec"), qCol).as("cos"))
    val filtered = excludeId.map(e => base.filter(col("id") =!= e)).getOrElse(base)
    filtered.orderBy(desc("cos"), asc("id")).limit(k)
  }

  /** Candidate pairs via banded sign-LSH + EXACT cosine verification —
    * the scale shape for embedding near-dup: shuffle is O(docs × bands)
    * and the only pairwise work happens inside band buckets (no
    * CartesianProduct — asserted in PlanSpec). Approximate by nature:
    * a pair is found iff it collides in ≥1 band; with bandBits=3,
    * bands=32 the per-pair miss probability at cos=0.4 is
    * (1 − p³)³² ≈ 1e-4 (p = 1 − arccos(0.4)/π ≈ 0.63), and far lower for
    * more-similar pairs. OpsSpec asserts banded == brute force on the
    * test tables. NOTE: low thresholds (τ≈0.4) are hostile to sign-LSH —
    * production near-dup at τ ≥ 0.9 gets far better pruning per band.
    */
  def lshBandedCosinePairs(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double, planes: Int = 96, bandBits: Int = 3,
      seed: Long = 42L): DataFrame = {
    require(planes % bandBits == 0)
    val bands = planes / bandBits
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    val hp = hyperplanes(dim, planes, seed)
    val keysUdf = udf { (v: Array[Float]) =>
      val bits = new Array[Boolean](planes)
      var i = 0
      while (i < planes) {
        var d = 0d
        var j = 0
        while (j < v.length) { d += hp(i)(j).toDouble * v(j); j += 1 }
        bits(i) = d >= 0
        i += 1
      }
      Array.tabulate(bands) { b =>
        var key = 0L
        var k = 0
        while (k < bandBits) {
          key = (key << 1) | (if (bits(b * bandBits + k)) 1L else 0L)
          k += 1
        }
        (b.toLong << 32) | key
      }
    }
    // (Optimization attempted and rejected this round: carrying the full
    // band-key array through the join to dedupe with a first-matching-
    // band filter instead of distinct() — the wider join side broke the
    // auto-broadcast and the per-joined-row array compare cost far more
    // than the distinct's shuffle. The (id, bk)-only join stays
    // broadcast-sized at any corpus, and distinct() is the one
    // pair-volume shuffle. Measured: 9.8s → 65s at sf0.1; reverted.)
    val keyed = df.select(col(idCol).as("id"),
      explode(keysUdf(col(vecCol))).as("bk"))
    val cand = keyed.as("x").join(keyed.as("y"),
        col("x.bk") === col("y.bk") && col("x.id") < col("y.id"))
      .select(col("x.id").as("ia"), col("y.id").as("ib")).distinct()
    val va = df.select(col(idCol).as("ia"), col(vecCol).as("_va"))
    val vb = df.select(col(idCol).as("ib"), col(vecCol).as("_vb"))
    cand.join(va, Seq("ia")).join(vb, Seq("ib"))
      .withColumn("cos", cosineCol(col("_va"), col("_vb")))
      .filter(col("cos") >= threshold)
      .select("ia", "ib", "cos")
  }
}
