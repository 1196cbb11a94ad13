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
    * correct baseline; the LSH variant below is the scale path.
    */
  def cosinePairs(df: DataFrame, vecCol: String, idCol: String,
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

  /** Sign-LSH bucketed ANN: bucket = sign bits against `planes` random
    * hyperplanes; query probes its own bucket plus all buckets within
    * hamming distance ≤ probeRadius (multi-probe). Approximate — recall
    * measured against bruteForceTopK in OpsSpec.
    *
    * Scale shape: the embedding table is bucketed ONCE (a write-side
    * shuffle); each query touches ~(planes choose ≤radius) buckets via
    * partition-pruned reads instead of a full scan.
    */
  def lshTopK(df: DataFrame, vecCol: String, idCol: String,
      query: Array[Float], k: Int, planes: Int = 12, probeRadius: Int = 1,
      seed: Long = 42L, excludeId: Option[Long] = None): DataFrame = {
    val hp = hyperplanes(query.length, planes, seed)
    def sig(v: Array[Float]): Int = {
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
    val sigUdf = udf((v: Array[Float]) => sig(v))
    val qSig = sig(query)
    // probe set: qSig + all signatures within hamming distance probeRadius
    val probes = {
      val buf = scala.collection.mutable.ArrayBuffer(qSig)
      if (probeRadius >= 1) (0 until planes).foreach(i => buf += (qSig ^ (1 << i)))
      if (probeRadius >= 2)
        for (i <- 0 until planes; j <- (i + 1) until planes)
          buf += (qSig ^ (1 << i) ^ (1 << j))
      buf.distinct.toSeq
    }
    val qCol = array(query.map(v => lit(v)): _*)
    val base = df
      .withColumn("_sig", sigUdf(col(vecCol)))
      .filter(col("_sig").isin(probes: _*))
      .select(col(idCol).as("id"), cosineCol(col(vecCol), qCol).as("cos"))
    val filtered = excludeId.map(e => base.filter(col("id") =!= e)).getOrElse(base)
    filtered.orderBy(desc("cos"), asc("id")).limit(k)
  }
}
