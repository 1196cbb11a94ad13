package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DatasetSplitter (`classification/utils/DatasetSplitter.java:43-135`):
  * split a labeled corpus into train / test / cross-validation sets,
  * stratified by class.
  *
  * The reference iterates class groups in first-doc index order
  * (GroupingSearch, group sort = within-group sort = INDEXORDER) with a
  * GLOBAL doc counter `b` running across groups (:87-114), and per group
  * of size n assigns each doc sequentially:
  *
  *   if (b % 2 == 0 && tc < n·testRatio)  → test, tc++
  *   else if (cvc < n·cvRatio)            → cv,   cvc++
  *   else                                 → train
  *
  * That loop is sequential, but its assignment has a CLOSED FORM per
  * doc, which is what makes it distributable: within a group starting at
  * global offset `off`, the doc at local index i (0-based, id order) has
  * b = off + i; test docs are exactly the even-b docs among the first
  * ceil(n·testRatio) even-b docs (the tc counter saturates monotonically),
  * and cv docs are the first non-test docs while the cv counter is below
  * n·cvRatio:
  *
  *   evenBefore(i) = #{j < i : (off+j) even}
  *                 = (i + 1 − off%2) / 2   (integer division)
  *   isTest(i)  = (off+i) % 2 == 0  ∧  evenBefore(i) < n·testRatio
  *   testBefore(i) = min(evenBefore(i), ceil(n·testRatio))
  *   isCv(i)    = ¬isTest(i)  ∧  (i − testBefore(i)) < n·cvRatio
  *
  * so the whole split is one row_number window per class plus a
  * broadcast-joined |classes|-row offset table — no sequential pass.
  * The closed form is pinned against a direct transcription of the
  * reference loop in SplitSpec.
  *
  * At 100 TB the one shuffle is the per-class window sort; a single
  * giant class serializes into one task's sort (inherent — the law is
  * defined by within-class doc order), which Spark external-sorts on
  * disk rather than OOMing.
  *
  * Docs with a null/empty class form their own group, ordered like any
  * other by first doc id (the reference's grouping search places
  * missing-value docs in the null group).
  */
object Split {

  def datasetSplit(docs: DataFrame, idCol: String, classCol: String,
      testRatio: Double, cvRatio: Double): DataFrame = {
    require(testRatio >= 0 && cvRatio >= 0 && testRatio + cvRatio <= 1,
      s"bad ratios: test=$testRatio cv=$cvRatio")
    val spark = docs.sparkSession
    val base = docs.select(col(idCol).as("id"),
      coalesce(col(classCol), lit("")).as("cls"))

    // |classes| rows: group sizes and first-doc order → global offsets
    val groups = base.groupBy("cls")
      .agg(count(lit(1)).as("n"), min(col("id")).as("fid"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._3)
    val offs = groups.scanLeft(0L)(_ + _._2).init
    val gdim = groups.zip(offs).map { case ((c, n, _), off) =>
      (c, n, off,
        n * testRatio, math.ceil(n * testRatio).toLong, n * cvRatio)
    }
    val gdf = spark.createDataFrame(gdim.toSeq)
      .toDF("cls", "n", "off", "testSize", "quotaT", "cvSize")

    val w = Window.partitionBy("cls").orderBy("id")
    base.join(broadcast(gdf), Seq("cls"))
      .withColumn("i", row_number().over(w).cast("long") - 1)
      .withColumn("evenBefore", // (i + 1 − off%2) / 2, exact integer div
        shiftright(col("i") + 1 - col("off") % 2, 1))
      .withColumn("isTest",
        (col("off") + col("i")) % 2 === 0 &&
          col("evenBefore").cast("double") < col("testSize"))
      .withColumn("isCv", !col("isTest") &&
        (col("i") - least(col("evenBefore"), col("quotaT"))).cast("double")
          < col("cvSize"))
      .select(col("id").as(idCol),
        when(col("isTest"), "test").when(col("isCv"), "cv")
          .otherwise("train").as("split"))
  }
}
