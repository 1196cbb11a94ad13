package graft.core

import org.apache.spark.sql.{Dataset, SparkSession}
import scala.util.Random

/** Deterministic synthetic source-code corpus (FIXTURES.md §1): the only
  * generated input; fixed seed, Zipf-skewed vocabulary so hot terms exist
  * (exercises salting), field lengths spread over the byte315 quantization
  * buckets. Mirrors the reference's seeded-random corpora style
  * (`lucene/test-framework/.../index/RandomIndexWriter.java:42`).
  */
object Corpus {

  /** ~200 code-like identifiers; the Zipf rank order is the array order. */
  val Vocabulary: Array[String] = {
    val base = Array(
      "def", "class", "val", "var", "if", "else", "for", "while", "return",
      "int", "long", "string", "float", "double", "bool", "void", "null",
      "index", "merge", "score", "query", "search", "term", "doc", "field",
      "read", "write", "open", "close", "flush", "commit", "delete", "add",
      "get", "set", "put", "map", "list", "array", "buffer", "stream",
      "hash", "sort", "filter", "reduce", "fold", "scan", "join", "group",
      "count", "sum", "min", "max", "avg", "norm", "weight", "boost",
      "block", "skip", "posting", "segment", "codec", "token", "analyze",
      "parse", "format", "encode", "decode", "pack", "unpack", "compress",
      "partition", "shuffle", "broadcast", "executor", "driver", "task",
      "spark", "lucene", "solr", "iceberg", "parquet", "schema", "column")
    val camel = for {
      a <- Array("get", "set", "build", "make", "find", "load", "store")
      b <- Array("Index", "Score", "Term", "Block", "Segment", "Norm",
        "Stats", "Cache", "Buffer", "Writer", "Reader", "Merger")
    } yield a + b
    val snake = for {
      a <- Array("max", "min", "num", "total")
      b <- Array("docs", "terms", "bytes", "blocks", "hits", "freq")
    } yield a + "_" + b
    base ++ camel ++ snake
  }

  /** Zipf-ish sampler over [[Vocabulary]]: P(rank r) ∝ 1/(r+1). */
  private def zipfIndex(rnd: Random, n: Int): Int = {
    // inverse-CDF on harmonic weights, done cheaply via rejection
    val h = math.log(n + 1.0)
    val u = rnd.nextDouble()
    val r = (math.exp(u * h) - 1.0).toInt
    math.min(r, n - 1)
  }

  val Langs = Array("scala", "java", "py", "c")

  /** Generate `numDocs` files deterministically from `seed`. */
  def generate(numDocs: Int, seed: Long = 42L): Seq[CodeFile] = {
    val rnd = new Random(seed)
    val nVocab = Vocabulary.length
    (0 until numDocs).map { i =>
      val repo = s"org/proj${rnd.nextInt(math.max(2, numDocs / 50))}"
      val commit = f"${rnd.nextInt(Int.MaxValue)}%08x"
      val lang = Langs(rnd.nextInt(Langs.length))
      val nTokens = 5 + rnd.nextInt(396) // [5, 400]
      val sb = new StringBuilder
      var t = 0
      while (t < nTokens) {
        if (t > 0) sb.append(if (rnd.nextInt(12) == 0) "\n" else " ")
        sb.append(Vocabulary(zipfIndex(rnd, nVocab)))
        t += 1
      }
      CodeFile(repo, s"src/main/F$i.$lang", commit, lang, sb.toString)
    }
  }

  def dataset(spark: SparkSession, numDocs: Int, seed: Long = 42L,
      partitions: Int = 0): Dataset[CodeFile] = {
    import spark.implicits._
    val ds = spark.createDataset(generate(numDocs, seed))
    if (partitions > 0) ds.repartition(partitions) else ds
  }

  /** One file, deterministic from (seed, i) alone — safe to generate on
    * executors in any partitioning.
    */
  def generateOne(i: Long, seed: Long): CodeFile = {
    val rnd = new Random(seed * 0x9e3779b97f4a7c15L + i)
    val nVocab = Vocabulary.length
    val repo = s"org/proj${rnd.nextInt(512)}"
    val commit = f"${rnd.nextInt(Int.MaxValue)}%08x"
    val lang = Langs(rnd.nextInt(Langs.length))
    val nTokens = 5 + rnd.nextInt(396)
    val sb = new StringBuilder
    var t = 0
    while (t < nTokens) {
      if (t > 0) sb.append(if (rnd.nextInt(12) == 0) "\n" else " ")
      sb.append(Vocabulary(zipfIndex(rnd, nVocab)))
      t += 1
    }
    CodeFile(repo, f"src/main/F$i%09d.$lang", commit, lang, sb.toString)
  }

  /** Distributed deterministic corpus: generated ON the executors from
    * (seed, rowId) — the only scalable way to synthesize 10^12 rows (the
    * driver never materializes the corpus).
    */
  def distributed(spark: SparkSession, numDocs: Long, seed: Long = 42L,
      partitions: Int = 0): Dataset[CodeFile] = {
    import spark.implicits._
    val parts =
      if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    spark.range(0L, numDocs, 1L, parts).map(i => generateOne(i, seed))
  }
}
