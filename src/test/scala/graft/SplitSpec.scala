package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Split

/** DatasetSplitter's closed form (Split.datasetSplit) pinned against a
  * direct sequential transcription of the reference loop
  * (`classification/utils/DatasetSplitter.java:87-114`): groups in
  * first-doc order, one GLOBAL doc counter b across groups, per group
  * the tc/cvc counters exactly as written.
  */
class SplitSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  /** The reference loop, verbatim: b runs across groups; per group,
    * even-b docs go to test while tc < n·testRatio, else cv while
    * cvc < n·cvRatio, else train.
    */
  private def splitExpected(docs: Seq[(Long, String)], testRatio: Double,
      cvRatio: Double): Map[Long, String] = {
    val groups = docs.groupBy { case (_, c) => if (c == null) "" else c }
    val order = groups.toSeq.sortBy(_._2.map(_._1).min).map(_._1)
    var b = 0L
    val out = scala.collection.mutable.Map.empty[Long, String]
    order.foreach { g =>
      val ds = groups(g).sortBy(_._1)
      val testSize = ds.size * testRatio
      val cvSize = ds.size * cvRatio
      var tc = 0
      var cvc = 0
      ds.foreach { case (id, _) =>
        if (b % 2 == 0 && tc < testSize) { out(id) = "test"; tc += 1 }
        else if (cvc < cvSize) { out(id) = "cv"; cvc += 1 }
        else out(id) = "train"
        b += 1
      }
    }
    out.toMap
  }

  private def splitGot(docs: Seq[(Long, String)], testRatio: Double,
      cvRatio: Double): Map[Long, String] = {
    import spark.implicits._
    val df = spark.createDataset(docs).toDF("id", "cls")
    Split.datasetSplit(df, "id", "cls", testRatio, cvRatio)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  // uneven class sizes, interleaved ids (offsets land odd and even),
  // a null-class group, a singleton class
  private val fixture: Seq[(Long, String)] =
    (0L until 30L).map(i => (i, "a")) ++
      (30L until 37L).map(i => (i, "b")) ++
      Seq((37L, null: String), (38L, null: String)) ++
      (39L until 52L).map(i => (i, "c")) ++
      Seq((52L, "solo"))

  test("closed form == sequential reference loop (several ratios)") {
    for ((t, cv) <- Seq((0.2, 0.1), (0.34, 0.25), (0.5, 0.5), (0.0, 0.0),
        (1.0, 0.0), (0.0, 1.0), (0.13, 0.07))) {
      val exp = splitExpected(fixture, t, cv)
      val got = splitGot(fixture, t, cv)
      assert(got == exp, s"ratios ($t, $cv)")
    }
  }

  test("shuffled ids: law depends on id order, not input row order") {
    val shuffled = new scala.util.Random(7).shuffle(fixture)
    assert(splitGot(shuffled, 0.2, 0.1) == splitExpected(fixture, 0.2, 0.1))
  }

  test("stratification: every class contributes to test at ratio 0.2") {
    val got = splitGot(fixture, 0.2, 0.1)
    val byCls = fixture.groupBy { case (_, c) => if (c == null) "" else c }
    byCls.foreach { case (c, ds) =>
      val t = ds.count { case (id, _) => got(id) == "test" }
      // tc stops at ceil(n·ratio); evens may run out one short
      val quota = math.ceil(ds.size * 0.2).toLong
      assert(t <= quota && t >= quota - 1, s"class $c: $t vs quota $quota")
    }
  }

  test("ratio guards") {
    intercept[IllegalArgumentException] {
      splitGot(fixture, 0.7, 0.6)
    }
  }
}
