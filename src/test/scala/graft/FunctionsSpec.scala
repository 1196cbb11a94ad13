package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Norms
import graft.functions.GraftFunctions
import graft.search.BM25

/** Native Catalyst expressions: bit-identical to the Scala kernels, and
  * usable from SQL after registration.
  */
class FunctionsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Bm25Score expression == BM25.score for all (tf, normByte)") {
    val cache = BM25.normCache(BM25.Default, 123.4f)
    val w = BM25.weightValue(BM25.idf(7, 1000), BM25.Default)
    val rows = for (tf <- Seq(1, 2, 3, 10, 100); nb <- 0 until 256)
      yield (tf, nb.toByte)
    val got = rows.toDF("tf", "nb")
      .select(GraftFunctions.bm25Score(col("tf"), col("nb"), w, cache))
      .collect().map(_.getFloat(0))
    val expected = rows.map { case (tf, nb) =>
      BM25.score(w, tf.toFloat, cache(nb & 0xff))
    }
    assert(got.toSeq === expected)
  }

  test("graft_tokens / graft_norm_byte / bm25_idf usable from SQL") {
    GraftFunctions.register(spark)
    val toks = spark.sql("SELECT graft_tokens('The Fast-Fox 42!') AS t")
      .collect()(0).getSeq[String](0)
    assert(toks === Seq("the", "fast", "fox", "42"))
    val nb = spark.sql("SELECT graft_norm_byte(16)").collect()(0).getByte(0)
    assert(nb === Norms.normByte(16))
    val idf = spark.sql("SELECT bm25_idf(7L, 1000L)").collect()(0).getFloat(0)
    assert(idf === BM25.idf(7, 1000))
  }

  test("expressions stay inside whole-stage codegen") {
    val cache = BM25.normCache(BM25.Default, 50f)
    // spark.range (not a local relation, which would constant-fold)
    val df = spark.range(1, 101)
      .select((col("id") % 50 + 1).cast("int").as("tf"),
        (col("id") % 256).cast("byte").as("nb"))
      .select(GraftFunctions.bm25Score(col("tf"), col("nb"), 1.5f, cache).as("s"))
      .filter(col("s") > 0)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(") || plan.contains("WholeStageCodegen"),
      s"expression fell out of codegen:\n$plan")
  }
}
