package graft.gate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's relational dataflow surface re-expressed Spark-first:
  * Solr streaming expressions (SURVEY.md §2.10), JSON-facet / stats
  * aggregations (§2.8), joins incl. block join (§2.9), and function
  * queries (§2.12) — each over the TPC-H-ish testdata tables with a
  * DuckDB oracle.
  *
  * Money/double aggregates go through DECIMAL casts so sums are exact and
  * order-independent on both engines (parallel double summation is not).
  */
object RelationalGate {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CompositeIdRouter.partitionRange (`solr/solrj/.../cloud/
    // CompositeIdRouter.java:128-168`): shard-splitting arithmetic with
    // the round-to-hash-domain rule (full range, 6 shards → rounding ON)
    "q_router_ranges" -> ((s, d) => {
      import s.implicits._
      graft.index.CompositeId.partitionRange(6).zipWithIndex
        .map { case (r, i) => (i + 1, r.min.toLong, r.max.toLong) }
        .toDF("rnk", "minv", "maxv")
    }),
    // small range → rangeStep below the 16-domain threshold, rounding OFF
    "q_router_ranges_small" -> ((s, d) => {
      import s.implicits._
      graft.index.CompositeId
        .partitionRange(4, graft.index.CompositeId.HashRange(0, 1000))
        .zipWithIndex
        .map { case (r, i) => (i + 1, r.min.toLong, r.max.toLong) }
        .toDF("rnk", "minv", "maxv")
    }),

    // RollupStream + Sum/Min/Max/Mean/CountMetric
    // (solr/solrj/.../io/stream/RollupStream.java:43, metrics/)
    "q_rollup" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_extendedprice")).as("max_price"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // StatsComponent (solr/core/.../component/StatsComponent.java):
    // min/max/sum/count/avg/stddev, distributed-mergeable
    "q_stats" -> ((s, d) => {
      t(s, d, "lineitem").agg(
        count(lit(1)).as("cnt"),
        min("l_quantity").as("min_qty"),
        max("l_quantity").as("max_qty"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        round(stddev_samp(col("l_quantity")), 6).as("sd_qty"))
    }),

    // UniqueAgg — exact distinct (facet/UniqueAgg.java:32)
    "q_unique_agg" -> ((s, d) => {
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("uniq_parts"),
          countDistinct("l_suppkey").as("uniq_supps"))
        .orderBy("l_returnflag")
    }),

    // PercentileAgg (facet/PercentileAgg.java:31) — exact interpolated
    // percentile (both engines use linear interpolation on sorted values)
    "q_percentile" -> ((s, d) => {
      t(s, d, "orders")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.95)"), 4).as("p95"),
          round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))
    }),

    // pivot facet: nested buckets (component/PivotFacetProcessor.java)
    "q_pivot" -> ((s, d) => {
      t(s, d, "orders").groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
        .orderBy("o_orderstatus", "o_orderpriority")
    }),

    // range facet over a numeric field (facet.range analog)
    "q_range_facet" -> ((s, d) => {
      t(s, d, "part")
        .withColumn("bucket", floor(col("p_retailprice") / 500).cast("int") * 500)
        .groupBy("bucket").agg(count(lit(1)).as("cnt"))
        .orderBy("bucket")
    }),

    // grouping: top-k docs per group via window
    // (lucene/grouping/.../GroupingSearch.java:52)
    "q_group_topk" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
        .orderBy("o_custkey", "rnk")
        .limit(500)
    }),

    // field collapse, 1 doc per group (CollapsingQParserPlugin)
    "q_collapse" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(100)
    }),

    // JoinUtil semi-join (lucene/join/.../JoinUtil.java:92)
    "q_join_semi" -> ((s, d) => {
      val bldg = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, d, "orders")
      o.join(bldg, o("o_custkey") === bldg("c_custkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey")).limit(100)
    }),

    // HashJoinStream (io/stream/HashJoinStream.java:44): broadcast hash join
    "q_join_hash" -> ((s, d) => {
      val n = t(s, d, "nation")
      t(s, d, "customer")
        .join(broadcast(n), col("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("cnt"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_bal"))
        .orderBy("n_name")
    }),

    // LeftOuterJoinStream (io/stream/LeftOuterJoinStream.java:34)
    "q_join_left" -> ((s, d) => {
      val o = t(s, d, "orders").groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"))
      t(s, d, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy("c_custkey").limit(500)
    }),

    // block join: parent/child over nested docs
    // (lucene/join/.../ToParentBlockJoinQuery) — children nested as
    // ArrayType, parent filtered by an exists() over the children
    "q_blockjoin" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), struct(col("l_partkey"), col("l_quantity")).as("child"))
        .groupBy("l_orderkey").agg(collect_list("child").as("children"))
      t(s, d, "orders")
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .filter(exists(col("children"), c => c.getField("l_quantity") > 49))
        .select(col("o_orderkey"), size(col("children")).as("n_children"))
        .orderBy("o_orderkey").limit(200)
    }),

    // MergeStream: ordered union of sorted streams (MergeStream.java:40)
    "q_merge" -> ((s, d) => {
      val a = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("key"), col("c_acctbal").as("bal"))
      val b = t(s, d, "customer").filter(col("c_mktsegment") === "MACHINERY")
        .select(col("c_custkey").as("key"), col("c_acctbal").as("bal"))
      a.unionByName(b).orderBy("key").limit(300)
    }),

    // IntersectStream / ComplementStream (io/stream/*.java:42)
    "q_intersect" -> ((s, d) => {
      val y95 = t(s, d, "orders").filter(year(col("o_orderdate")) === 1995)
        .select("o_custkey")
      val y96 = t(s, d, "orders").filter(year(col("o_orderdate")) === 1996)
        .select("o_custkey")
      y95.intersect(y96).orderBy("o_custkey").limit(300)
    }),
    "q_complement" -> ((s, d) => {
      val y95 = t(s, d, "orders").filter(year(col("o_orderdate")) === 1995)
        .select("o_custkey")
      val y96 = t(s, d, "orders").filter(year(col("o_orderdate")) === 1996)
        .select("o_custkey")
      y95.except(y96).orderBy("o_custkey").limit(300)
    }),

    // UniqueStream: dedup on sorted stream (UniqueStream.java:45)
    "q_unique_stream" -> ((s, d) => {
      t(s, d, "orders").select("o_orderstatus", "o_orderpriority")
        .dropDuplicates()
        .orderBy("o_orderstatus", "o_orderpriority")
    }),

    // RankStream: top-N by sort (RankStream.java:45)
    "q_rank" -> ((s, d) => {
      t(s, d, "orders")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice").limit(20)
    }),

    // SelectStream + ReplaceOperation: projection / rename / computed
    "q_select" -> ((s, d) => {
      t(s, d, "part")
        .select(col("p_partkey").as("id"),
          upper(col("p_brand")).as("brand"),
          when(col("p_size") > 25, lit("large")).otherwise(lit("small")).as("size_class"))
        .orderBy("id").limit(300)
    }),

    // /export: full sorted export (SortingResponseWriter.java:65)
    "q_sort_export" -> ((s, d) => {
      t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .orderBy(asc("l_shipdate"), asc("l_orderkey"), asc("l_linenumber"))
        .limit(1000)
    }),

    // function queries (§2.12 ValueSourceParser): math/string/date scalars
    "q_funcs" -> ((s, d) => {
      t(s, d, "part").filter(col("p_partkey") <= 50)
        .select(
          col("p_partkey").as("id"),
          round(sqrt(col("p_retailprice")), 6).as("f_sqrt"),
          round(log(col("p_retailprice")), 6).as("f_ln"),
          round(pow(col("p_size").cast("double"), 2.0), 6).as("f_pow"),
          abs(col("p_size") - 25).as("f_abs"),
          ceil(col("p_retailprice")).as("f_ceil"),
          floor(col("p_retailprice")).as("f_floor"),
          pmod(col("p_partkey"), lit(7)).as("f_mod"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("f_concat"),
          levenshtein(col("p_brand"), lit("Brand#11")).as("f_strdist"),
          greatest(col("p_size"), lit(10)).as("f_max"),
          least(col("p_size"), lit(40)).as("f_min"))
        .orderBy("id")
    }),

    // date math (DateMathParser analog): truncation + interval arithmetic
    "q_datemath" -> ((s, d) => {
      t(s, d, "orders").filter(col("o_orderkey") <= 200)
        .select(col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          (col("o_orderdate") + expr("INTERVAL 6 MONTH")).as("plus6m"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("ms"))
        .orderBy("o_orderkey")
    }),

    // event-time windowed aggregation (batch form of the streaming query;
    // TopicStream/DaemonStream map to Structured Streaming, §2.10)
    "q_events_window" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("value")), 4).as("sum_value"))
        .orderBy("hour", "event_type").limit(500)
    }),

    // ExpandComponent (solr/core/.../component/ExpandComponent.java:91):
    // after collapsing on o_custkey, expand the groups present on the
    // collapsed page — up to 2 non-head docs per group under the same
    // sort. The page's group list is tiny by construction → broadcast.
    "q_expand" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      val ranked = t(s, d, "orders").withColumn("grnk", row_number().over(w))
      val heads = ranked.filter(col("grnk") === 1)
        .orderBy(desc("o_totalprice"), asc("o_orderkey")).limit(20)
        .select(col("o_custkey").as("g"))
      ranked.join(broadcast(heads), col("o_custkey") === col("g"), "left_semi")
        .filter(col("grnk") > 1)
        .withColumn("rnk", (col("grnk") - 1).cast("int"))
        .filter(col("rnk") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
        .orderBy("o_custkey", "rnk")
    }),

    // facet.query (solr SimpleFacets.getFacetQueryCounts): named predicate
    // counts, all computed in ONE scan (no per-facet pass)
    "q_facet_query" -> ((s, d) => {
      t(s, d, "orders").agg(
        sum(when(col("o_totalprice") > 150000, 1L).otherwise(0L)).as("high_price"),
        sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)).as("urgent"),
        sum(when(year(col("o_orderdate")) === 1995, 1L).otherwise(0L)).as("y1995"))
    }),

    // facet.interval (solr IntervalFacets.java): explicit-bound intervals
    // incl. an OVERLAPPING one — per-interval conditional counts in one
    // scan, unpivoted to (interval, cnt) rows
    "q_interval_facet" -> ((s, d) => {
      t(s, d, "part").agg(
          sum(when(col("p_retailprice") >= 0 && col("p_retailprice") < 1000, 1L)
            .otherwise(0L)).as("c0"),
          sum(when(col("p_retailprice") >= 900 && col("p_retailprice") <= 1400, 1L)
            .otherwise(0L)).as("c1"),
          sum(when(col("p_retailprice") > 1400, 1L).otherwise(0L)).as("c2"))
        .select(expr(
          "stack(3, '[0,1000)', c0, '[900,1400]', c1, '(1400,*)', c2) AS (interval, cnt)"))
        .orderBy("interval")
    }),

    // Hierarchical taxonomy facets (lucene/facet FacetsConfig hierarchical
    // dims + TaxonomyFacetCounts): every path prefix of lang/source gets a
    // rollup count — one explode of the per-doc prefix chain, one groupBy
    "q_taxo_facet" -> ((s, d) => {
      t(s, d, "documents")
        .select(explode(array(col("lang"),
          concat_ws("/", col("lang"), col("source")))).as("path"))
        .groupBy("path").agg(count(lit(1)).as("cnt"))
        .orderBy("path")
    }),

    // AnalyticsComponent expressions (solr/contrib/analytics): composed
    // stats per bucket — div(sum,count), median, unique, sub(max,min)
    "q_analytics_expr" -> ((s, d) => {
      t(s, d, "orders").groupBy("o_orderstatus").agg(
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / count(lit(1)), 4).as("mean_expr"),
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_price"),
          countDistinct("o_custkey").as("unique_cust"),
          round(max("o_totalprice") - min("o_totalprice"), 4).as("range_expr"))
        .orderBy("o_orderstatus")
    }),

    // RandomStream (io/stream/RandomStream.java): pseudo-random sample
    // of matching docs — the reference sorts on a seeded random field;
    // here the seeded hash is md5(seed || key) so the sample is
    // deterministic AND identically computable by the oracle
    "q_random_sample" -> ((s, d) => {
      t(s, d, "orders").filter(col("o_totalprice") > 100000)
        .withColumn("h", md5(concat(lit("seed42-"), col("o_orderkey"))))
        .orderBy("h").limit(20)
        .select("o_orderkey", "o_totalprice")
    }),

    // JSON Facet API nested facets (solr/core/.../search/facet/
    // FacetField.java — terms facet containing a terms subfacet + stat,
    // each level sorted by its stat and limited): top-3 statuses by
    // count, top-2 priorities by sum inside each
    "q_json_facet_nested" -> ((s, d) => {
      val o = t(s, d, "orders")
      val top = o.groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("o_orderstatus")).limit(3)
        .select(col("o_orderstatus").as("st"), col("cnt"))
      val sub = o.join(broadcast(top), col("o_orderstatus") === col("st"))
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"))
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(desc("sum_price"), asc("o_orderpriority"))
      sub.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 2)
        .join(broadcast(top), col("o_orderstatus") === col("st"))
        .select(col("o_orderstatus"), col("cnt"), col("o_orderpriority"),
          col("sum_price"), col("rnk"))
        .orderBy(desc("cnt"), asc("o_orderstatus"), asc("rnk"))
    }),

    // HavingStream (io/stream/HavingStream.java:48): boolean operand
    // over the rolled-up tuples — filter AFTER aggregation
    "q_having" -> ((s, d) => {
      t(s, d, "orders").groupBy("o_custkey")
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
        .filter(col("cnt") >= 10 && col("sum_price") > 1000000)
        .orderBy("o_custkey")
    }),

    // CartesianProductStream (io/stream/CartesianProductStream.java:55):
    // one output tuple per element of a multivalued field — built here
    // by collecting each order's lineitems, then exploding back
    "q_cartesian" -> ((s, d) => {
      val li = t(s, d, "lineitem").filter(col("l_orderkey") <= 100)
        .select(col("l_orderkey"), col("l_partkey"))
        .groupBy("l_orderkey").agg(sort_array(collect_list("l_partkey")).as("parts"))
      li.select(col("l_orderkey"), explode(col("parts")).as("partkey"))
        .orderBy("l_orderkey", "partkey")
    }),

    // Solr result grouping by QUERY (group.query): each named predicate
    // is its own bucket with a top-3 inside (GroupingSearch group-by-
    // query form / solr Grouping.CommandQuery)
    "q_group_query" -> ((s, d) => {
      val o = t(s, d, "orders")
      def bucket(name: String, pred: org.apache.spark.sql.Column) =
        o.filter(pred)
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
          .limit(3)
          .select(lit(name).as("bucket"), col("o_orderkey"), col("o_totalprice"))
      bucket("urgent", col("o_orderpriority") === "1-URGENT")
        .unionByName(bucket("open_f", col("o_orderstatus") === "F"))
        .orderBy(col("bucket"), desc("o_totalprice"), asc("o_orderkey"))
    }),

    // GatherNodesStream 2-hop graph expansion (io/graph/GatherNodesStream
    // .java:54): part → orders containing it → co-ordered parts
    "q_graph_expand" -> ((s, d) => {
      val li = t(s, d, "lineitem").select("l_orderkey", "l_partkey")
      val seedOrders = li.filter(col("l_partkey") === 1)
        .select(col("l_orderkey").as("ok")).distinct()
      li.join(seedOrders, col("l_orderkey") === col("ok"), "left_semi")
        .select("l_partkey").distinct()
        .orderBy("l_partkey")
    }),

    // ShortestPathStream (io/graph/ShortestPathStream.java:60): BFS over
    // the customer→order→part edge graph; canonical shortest path
    "q_graph_shortest" -> ((s, d) => {
      val orders = t(s, d, "orders").select(
        concat(lit("c_"), col("o_custkey")).as("src"),
        concat(lit("o_"), col("o_orderkey")).as("dst"))
      val li = t(s, d, "lineitem").select(
        concat(lit("o_"), col("l_orderkey")).as("src"),
        concat(lit("p_"), col("l_partkey")).as("dst"))
      graft.ops.Graph.shortestPath(orders.unionByName(li),
        "c_102", "p_1784", maxDepth = 3)
    }))

  /** `CompositeIdRouter.partitionRange` replayed as a recursive CTE —
    * the even-step walk with the round-to-16-bit-domain rule when the
    * step spans ≥ 16 whole domains, last range pinned to max.
    */
  private def routerRangesOracle(partitions: Int, min: Long,
      max: Long): String = {
    val step = math.max(1L, (max - min) / partitions)
    val round = step >= (1L << 16) * 16
    def rnd(e: String, start: String): String =
      if (!round) s"($e)"
      else s"""CASE WHEN (($e) & 65535) <> 65535
    THEN CASE WHEN ($e) - ((($e) | 65535) - 65536) < ((($e) | 65535) + 65536) - ($e) AND ((($e) | 65535) - 65536) > ($start)
      THEN (($e) | 65535) - 65536 ELSE (($e) | 65535) + 65536 END
    ELSE ($e) END"""
    val e0 = s"CAST($min AS BIGINT) + $step"
    val eN = s"ts + $step + 1"
    s"""WITH RECURSIVE gen(n, st, ts, en) AS (
  SELECT 1, CAST($min AS BIGINT), $e0,
    CASE WHEN 1 = $partitions THEN CAST($max AS BIGINT)
      ELSE ${rnd(e0, s"CAST($min AS BIGINT)")} END
  UNION ALL
  SELECT n + 1, en + 1, ts + $step + 1,
    CASE WHEN n + 1 = $partitions THEN CAST($max AS BIGINT)
      ELSE ${rnd(eN, "en + 1")} END
  FROM gen WHERE en < $max
)
SELECT n AS rnk, st AS minv, en AS maxv FROM gen ORDER BY n"""
  }

  val oracleSql: Map[String, String] = Map(
    "q_router_ranges" ->
      routerRangesOracle(6, Int.MinValue.toLong, Int.MaxValue.toLong),
    "q_router_ranges_small" -> routerRangesOracle(4, 0L, 1000L),
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
  MIN(l_quantity) AS min_qty, MAX(l_extendedprice) AS max_price,
  COUNT(*) AS cnt
FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_stats" ->
      """SELECT COUNT(*) AS cnt, MIN(l_quantity) AS min_qty,
  MAX(l_quantity) AS max_qty,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  ROUND(AVG(l_discount), 6) AS avg_disc,
  ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty
FROM lineitem""",

    "q_unique_agg" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS uniq_parts,
  COUNT(DISTINCT l_suppkey) AS uniq_supps
FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q_percentile" ->
      """SELECT ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
  ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95,
  ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
FROM orders""",

    "q_pivot" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_range_facet" ->
      """SELECT CAST(FLOOR(p_retailprice / 500) AS INT) * 500 AS bucket, COUNT(*) AS cnt
FROM part GROUP BY 1 ORDER BY 1""",

    "q_group_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    CAST(row_number() OVER (PARTITION BY o_custkey
      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
  FROM orders) WHERE rnk <= 2 ORDER BY o_custkey, rnk LIMIT 500""",

    "q_collapse" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    row_number() OVER (PARTITION BY o_custkey
      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders) WHERE rnk = 1
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",

    "q_join_semi" ->
      """SELECT o_orderkey, o_totalprice FROM orders
WHERE EXISTS (SELECT 1 FROM customer
  WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",

    "q_join_hash" ->
      """SELECT n_name, COUNT(*) AS cnt,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1 ORDER BY 1""",

    "q_join_left" ->
      """SELECT c_custkey, COALESCE(o.n_orders, 0) AS n_orders
FROM customer LEFT JOIN (
  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY 1) o
ON c_custkey = o.o_custkey ORDER BY c_custkey LIMIT 500""",

    "q_blockjoin" ->
      """SELECT o_orderkey, CAST(n_children AS INT) AS n_children FROM (
  SELECT o_orderkey, (SELECT COUNT(*) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_children
  FROM orders
  WHERE EXISTS (SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_quantity > 49))
WHERE n_children > 0 ORDER BY o_orderkey LIMIT 200""",

    "q_merge" ->
      """SELECT key, bal FROM (
  SELECT c_custkey AS key, c_acctbal AS bal FROM customer WHERE c_mktsegment = 'BUILDING'
  UNION ALL
  SELECT c_custkey AS key, c_acctbal AS bal FROM customer WHERE c_mktsegment = 'MACHINERY')
ORDER BY key LIMIT 300""",

    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
ORDER BY o_custkey LIMIT 300""",

    "q_complement" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
ORDER BY o_custkey LIMIT 300""",

    "q_unique_stream" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders ORDER BY 1, 2""",

    "q_rank" ->
      """SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",

    "q_select" ->
      """SELECT p_partkey AS id, UPPER(p_brand) AS brand,
  CASE WHEN p_size > 25 THEN 'large' ELSE 'small' END AS size_class
FROM part ORDER BY 1 LIMIT 300""",

    "q_sort_export" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
ORDER BY l_shipdate, l_orderkey, l_linenumber LIMIT 1000""",

    "q_funcs" ->
      """SELECT p_partkey AS id,
  ROUND(sqrt(p_retailprice), 6) AS f_sqrt,
  ROUND(ln(p_retailprice), 6) AS f_ln,
  ROUND(pow(CAST(p_size AS DOUBLE), 2.0), 6) AS f_pow,
  ABS(p_size - 25) AS f_abs,
  CAST(CEIL(p_retailprice) AS BIGINT) AS f_ceil,
  CAST(FLOOR(p_retailprice) AS BIGINT) AS f_floor,
  p_partkey % 7 AS f_mod,
  p_brand || '#' || p_type AS f_concat,
  levenshtein(p_brand, 'Brand#11') AS f_strdist,
  GREATEST(p_size, 10) AS f_max,
  LEAST(p_size, 40) AS f_min
FROM part WHERE p_partkey <= 50 ORDER BY 1""",

    "q_datemath" ->
      """SELECT o_orderkey,
  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
  o_orderdate + INTERVAL 6 MONTH AS plus6m,
  epoch_ms(o_orderdate) AS ms
FROM orders WHERE o_orderkey <= 200 ORDER BY 1""",

    "q_events_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS cnt,
  ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 500""",

    "q_expand" ->
      """WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
    row_number() OVER (PARTITION BY o_custkey
      ORDER BY o_totalprice DESC, o_orderkey) AS grnk
  FROM orders
), heads AS (
  SELECT o_custkey FROM ranked WHERE grnk = 1
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
)
SELECT o_custkey, o_orderkey, o_totalprice, CAST(grnk - 1 AS INT) AS rnk
FROM ranked
WHERE o_custkey IN (SELECT o_custkey FROM heads) AND grnk BETWEEN 2 AND 3
ORDER BY o_custkey, rnk""",

    "q_facet_query" ->
      """SELECT
  COUNT(*) FILTER (o_totalprice > 150000) AS high_price,
  COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS urgent,
  COUNT(*) FILTER (year(o_orderdate) = 1995) AS y1995
FROM orders""",

    "q_interval_facet" ->
      """SELECT interval, cnt FROM (
  SELECT '[0,1000)' AS interval,
    COUNT(*) FILTER (p_retailprice >= 0 AND p_retailprice < 1000) AS cnt FROM part
  UNION ALL
  SELECT '[900,1400]',
    COUNT(*) FILTER (p_retailprice >= 900 AND p_retailprice <= 1400) FROM part
  UNION ALL
  SELECT '(1400,*)', COUNT(*) FILTER (p_retailprice > 1400) FROM part)
ORDER BY interval""",

    "q_taxo_facet" ->
      """SELECT path, cnt FROM (
  SELECT lang AS path, COUNT(*) AS cnt FROM documents GROUP BY 1
  UNION ALL
  SELECT lang || '/' || source AS path, COUNT(*) AS cnt FROM documents GROUP BY 1)
ORDER BY path""",

    "q_analytics_expr" ->
      """SELECT o_orderstatus,
  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS mean_expr,
  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
  COUNT(DISTINCT o_custkey) AS unique_cust,
  ROUND(MAX(o_totalprice) - MIN(o_totalprice), 4) AS range_expr
FROM orders GROUP BY 1 ORDER BY 1""",

    "q_random_sample" ->
      """SELECT o_orderkey, o_totalprice FROM orders
WHERE o_totalprice > 100000
ORDER BY md5('seed42-' || o_orderkey) LIMIT 20""",

    "q_json_facet_nested" ->
      """WITH top AS (
  SELECT o_orderstatus AS st, COUNT(*) AS cnt FROM orders
  GROUP BY 1 ORDER BY cnt DESC, st LIMIT 3
), sub AS (
  SELECT o.o_orderstatus, o.o_orderpriority,
    CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
  FROM orders o JOIN top ON o.o_orderstatus = top.st
  GROUP BY 1, 2
), ranked AS (
  SELECT o_orderstatus, o_orderpriority, sum_price,
    CAST(row_number() OVER (PARTITION BY o_orderstatus
      ORDER BY sum_price DESC, o_orderpriority) AS INT) AS rnk
  FROM sub
)
SELECT r.o_orderstatus, t.cnt, r.o_orderpriority, r.sum_price, r.rnk
FROM ranked r JOIN top t ON r.o_orderstatus = t.st
WHERE r.rnk <= 2
ORDER BY t.cnt DESC, r.o_orderstatus, r.rnk""",

    "q_having" ->
      """SELECT o_custkey, COUNT(*) AS cnt,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders GROUP BY 1
HAVING COUNT(*) >= 10
  AND CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) > 1000000
ORDER BY o_custkey""",

    "q_cartesian" ->
      """SELECT l_orderkey, l_partkey AS partkey FROM lineitem
WHERE l_orderkey <= 100 ORDER BY l_orderkey, partkey""",

    "q_group_query" ->
      """SELECT bucket, o_orderkey, o_totalprice FROM (
  SELECT 'urgent' AS bucket, o_orderkey, o_totalprice,
    row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders WHERE o_orderpriority = '1-URGENT'
  UNION ALL
  SELECT 'open_f', o_orderkey, o_totalprice,
    row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
  FROM orders WHERE o_orderstatus = 'F')
WHERE rn <= 3 ORDER BY bucket, o_totalprice DESC, o_orderkey""",

    "q_graph_expand" ->
      """SELECT DISTINCT l_partkey FROM lineitem
WHERE l_orderkey IN (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_partkey = 1)
ORDER BY 1""",

    // BFS shortest path: depth-bounded recursive walk over the (DAG) edge
    // graph; canonical = min path string at the minimum depth
    "q_graph_shortest" ->
      """WITH RECURSIVE edges AS (
  SELECT 'c_' || o_custkey AS src, 'o_' || o_orderkey AS dst FROM orders
  UNION ALL
  SELECT 'o_' || l_orderkey, 'p_' || l_partkey FROM lineitem
), walk(node, path, depth) AS (
  SELECT 'c_102', 'c_102', 0
  UNION ALL
  SELECT e.dst, w.path || '/' || e.dst, w.depth + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.depth < 3 AND w.node <> 'p_1784'
), hits AS (
  SELECT path, depth FROM walk WHERE node = 'p_1784'
), best AS (
  SELECT min(path) AS path FROM hits
  WHERE depth = (SELECT min(depth) FROM hits)
)
SELECT CAST(i - 1 AS INT) AS step, part AS node
FROM (SELECT unnest(string_split(path, '/')) AS part,
             generate_subscripts(string_split(path, '/'), 1) AS i
      FROM best WHERE path IS NOT NULL)
ORDER BY step""")
}
