package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operators (SURVEY.md §2.1–2.3, §2.5, §2.6): scans,
  * projections, filters, recodes, string/date functions, and the
  * aggregation family. Each builder is a lazily-declared DataFrame plan —
  * Catalyst handles pushdown/pruning/codegen; nothing here forces an action
  * except the documented in-plan scalar patterns.
  */
object RelOps {
  type Q = (SparkSession, String) => DataFrame

  /** S1–S3/P1 — scan + column-pruned projection (reference: 29-of-58-col
    * select, `Databricks Notebook.py:214`). The select prunes the parquet
    * `ReadSchema` to 5 of 11 lineitem columns — at 100 TB that is the
    * difference between reading ~45% and 100% of the table bytes.
    */
  def scanProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_returnflag")

  /** F1/F5 — LIKE-disjunction filter (food-industry filter,
    * `Databricks Notebook.py:204`). Non-prefix LIKEs cannot become parquet
    * row-group predicates, but the filter still runs inside whole-stage
    * codegen directly on the scan output — no shuffle.
    */
  def filterLike(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_type").like("%ECO%") || col("p_name").like("%widget%") ||
        col("p_type").like("%PROMO%") || col("p_brand").like("%#1%"))
      .select("p_partkey", "p_name", "p_brand", "p_type")

  /** X10/P3 — when/otherwise recode chains (`Databricks Notebook.py:238,
    * 251–256`). Preserves two reference quirks: (a) the int/string
    * type-widening recode — mixing `lit(1)`/`lit(0)` with `"Missing"`
    * coerces the result to string `"1"/"0"/"Missing"` (SURVEY §2.10 #2);
    * (b) the duplicated-branch pattern of the WiFi recode (SURVEY §2.10 #3)
    * where a repeated `when` arm is dead code.
    */
  def recodeWhen(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      // explicit string cast: the reference's int/string mix widened to
      // string under PySpark's coercion (SURVEY §2.10 #2); Spark 4 ANSI
      // mode rejects that implicit widening, so we state it
      when(col("o_orderstatus") === "F", lit(1).cast("string"))
        .when(col("o_orderstatus") === "O", lit(0).cast("string"))
        .otherwise(lit("Missing")).as("status_recode"),
      when(col("o_orderpriority") === "1-URGENT", lit("urgent"))
        .when(col("o_orderpriority") === "1-URGENT", lit("urgent_dup"))
        .when(col("o_orderpriority") === "2-HIGH", lit("high"))
        .otherwise(lit("other")).as("prio_recode"))

  /** X10/P3 — the reference's multi-column `functools.reduce` recode loop
    * (`Databricks Notebook.py:234–238`): N boolean-ish string columns
    * recoded to "1"/"0"/"Missing" in ONE projection via
    * [[ScalarOps.recodeBooleans]]. The boolean-ish inputs are synthesized
    * in-query from lineitem flags (the Yelp attribute columns do not exist
    * in the fixtures).
    */
  def recodeFold(spark: SparkSession, dir: String): DataFrame = {
    val staged = Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      when(col("l_returnflag") === "R", lit("True"))
        .when(col("l_returnflag") === "A", lit("False"))
        .otherwise(lit("unknown")).as("flag_return"),
      when(col("l_linestatus") === "O", lit("True"))
        .otherwise(lit("False")).as("flag_open"),
      when(col("l_discount") > 0.05, lit("True"))
        .when(col("l_discount") > 0.0, lit("False"))
        .otherwise(lit("n/a")).as("flag_discounted"))
    ScalarOps.recodeBooleans(staged,
      Seq("flag_return", "flag_open", "flag_discounted"))
  }

  /** X5–X8 — string cleanup: ltrim / translate / split+getItem /
    * substring_index (`Databricks Notebook.py:172, 284–289, 310–312,
    * 497–498`). All narrow, codegen'd, shuffle-free.
    */
  def stringClean(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey"),
      translate(col("p_brand"), "Brand#", "").as("brand_num"),
      substring_index(concat(col("p_type"), lit(":"), col("p_brand")), ":", 1)
        .as("type_first"),
      split(col("p_name"), " ").getItem(1).as("name_tok2"),
      ltrim(concat(lit("  "), col("p_name"))).as("name_clean"))

  /** X1–X3 — date parsing + fixed-anchor recency (`Databricks
    * Notebook.py:129–132, 172–178`). Re-hosts the to_timestamp round-trip
    * with a padded pattern (SURVEY §7.5 risk 3); `n_reparse_ok` asserts the
    * round-trip is lossless. Single hash aggregation on a low-cardinality
    * key — partial (map-side) aggregation makes the shuffle tiny at any
    * scale.
    */
  def datesRecency(spark: SparkSession, dir: String): DataFrame = {
    val rec = datediff(lit("2002-01-01"), col("l_shipdate"))
    val shipStr = date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss")
    val reparsed = to_timestamp(shipStr, "yyyy-MM-dd HH:mm:ss")
    Tables.lineitem(spark, dir)
      .withColumn("recency", rec)
      .withColumn("reparse_ok", reparsed === col("l_shipdate"))
      .groupBy("l_returnflag")
      .agg(
        min(col("recency")).cast("long").as("min_rec"),
        max(col("recency")).cast("long").as("max_rec"),
        // exact integer sum / count, then one double division: identical
        // bits in any engine (avg() accumulation order would not be)
        round(sum(col("recency")).cast("double") / count(lit(1)), 6)
          .as("avg_rec"),
        count(when(col("reparse_ok"), true)).as("n_reparse_ok"),
        count(lit(1)).as("n_rows"))
  }

  /** A1/A2/A7/S6/X3/X11 — the flagship: recency-discounted conditional
    * aggregation (`Databricks Notebook.py:129–156` analog, SURVEY §7.2).
    *
    * The reference `collect()`s the global max to the Python driver and
    * splices it back as a literal (two blocking jobs, SURVEY §2.10 #8). We
    * keep the scalar IN-PLAN: a 1-row global aggregate broadcast-cross-joined
    * into the fact — on a 1000-executor cluster this avoids a driver
    * round-trip and lets AQE schedule both stages in one job. The conditional
    * counts preserve quirk #1 (boundary value lands in the "negative"
    * bucket: `> 0.05` vs `<= 0.05`).
    */
  def aggMulti(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .withColumn("recency", datediff(lit("2002-01-01"), col("l_shipdate")))
    val maxd = li.agg(max(col("recency")).as("maxdiff"))
    li.crossJoin(broadcast(maxd))
      // avg(price * (1 - recency/maxdiff)) restated as
      // sum(price * (maxdiff - recency)) / maxdiff / n: the numerator is
      // exact decimal*integer arithmetic, so the aggregate is independent
      // of accumulation order and engine (double avg / per-row decimal
      // casts both proved engine-unstable in the hash gate)
      .withColumn("adj_num",
        col("l_extendedprice").cast("decimal(18,2)") *
          (col("maxdiff") - col("recency")))
      .groupBy("l_orderkey")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_lines"),
        round(sum(col("adj_num")).cast("double") / max(col("maxdiff")) /
          count(lit(1)), 6).as("avg_adj_price"),
        count(when(col("l_discount") > 0.05, true)).as("n_hi_disc"),
        count(when(col("l_discount") <= 0.05, true)).as("n_lo_disc"))
  }

  /** A3 — grouped count/min/max over the high-volume keyed-timestamp table
    * (checkin analog, `Databricks Notebook.py:181`).
    */
  def aggMinMax(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("recency", datediff(lit("2024-02-01"), col("ts")))
      .groupBy("user_id")
      .agg(
        count(col("ts")).as("n_events"),
        min(col("recency")).cast("long").as("min_rec"),
        max(col("recency")).cast("long").as("max_rec"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))

  /** A5/A6 — two-key sum then re-aggregated mean (fans avg-of-sum, SURVEY
    * §2.10 #7: NOT avg-over-rows — the sum weights by per-key row count;
    * preserved exactly, `Databricks Notebook.py:575–580`). The second
    * aggregation reuses the hash partitioning of the first (user_id is a
    * prefix of (user_id, event_type)) so AQE plans the re-agg without a
    * second full shuffle.
    */
  def aggTwoKeyReagg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      // decimal(12,2) keeps the partial sums exact (engine-independent);
      // the final avg is one double division over exact operands
      .groupBy("user_id", "event_type")
      .agg(sum(col("value").cast("decimal(12,2)")).as("sum_value"))
      .groupBy("user_id")
      .agg(
        round(sum(col("sum_value")).cast("double") / count(lit(1)), 6)
          .as("avg_sum_value"),
        count(lit(1)).as("n_types"))

  /** A7/S6 — global (ungrouped) aggregate, one output row (`Databricks
    * Notebook.py:135, 668`). Money sums go through decimal(18,2) so the
    * result is exact and engine-independent (SURVEY §7.5 risk 2) — float
    * summation order would otherwise differ between Spark partial
    * aggregation and the oracle.
    */
  def aggGlobal(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).agg(
      max(col("l_shipdate")).as("max_shipdate"),
      min(col("l_shipdate")).as("min_shipdate"),
      count(lit(1)).as("n_rows"),
      // exact decimal sum, double-rendered at scale 2 — bare decimal
      // outputs hash differently across engines (see Ext.eventWindow)
      round(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double"),
        2).as("sum_price"))

  /** A8 — exact distinct counting (`Databricks Notebook.py:228, 296`; the
    * reference is exact-only — no approx anywhere). For 100 TB dashboards
    * `approx_count_distinct` is the cheaper variant; exposed as the separate
    * column `approx_nat` to keep the exact semantics primary.
    */
  def distinctCount(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).agg(
      countDistinct(col("c_mktsegment")).as("n_seg"),
      countDistinct(col("c_nationkey")).as("n_nat"),
      count(lit(1)).as("n_rows"))

  /** A9 — dropDuplicates over a projection (`Databricks Notebook.py:160,
    * 611`). Hash-partitions on all projected columns; at scale prefer
    * deduplicating on an explicit key subset to bound the shuffle width.
    */
  def dropDup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select("user_id", "event_type").dropDuplicates()

  val queries: Map[String, Q] = Map(
    "q_scan_project" -> scanProject _,
    "q_filter_like" -> filterLike _,
    "q_recode_when" -> recodeWhen _,
    "q_recode_fold" -> recodeFold _,
    "q_string_clean" -> stringClean _,
    "q_dates_recency" -> datesRecency _,
    "q_agg_multi" -> aggMulti _,
    "q_agg_minmax" -> aggMinMax _,
    "q_agg_two_key_reagg" -> aggTwoKeyReagg _,
    "q_agg_global" -> aggGlobal _,
    "q_distinct_count" -> distinctCount _,
    "q_dropdup" -> dropDup _)

  val oracles: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag FROM lineitem""",
    "q_filter_like" ->
      """SELECT p_partkey, p_name, p_brand, p_type FROM part WHERE p_type LIKE '%ECO%' OR p_name LIKE '%widget%' OR p_type LIKE '%PROMO%' OR p_brand LIKE '%#1%'""",
    "q_recode_when" ->
      """SELECT o_orderkey, CASE WHEN o_orderstatus = 'F' THEN '1' WHEN o_orderstatus = 'O' THEN '0' ELSE 'Missing' END AS status_recode, CASE WHEN o_orderpriority = '1-URGENT' THEN 'urgent' WHEN o_orderpriority = '1-URGENT' THEN 'urgent_dup' WHEN o_orderpriority = '2-HIGH' THEN 'high' ELSE 'other' END AS prio_recode FROM orders""",
    "q_recode_fold" -> {
      def rec(c: String) =
        s"CASE WHEN $c = 'True' THEN '1' WHEN $c = 'False' THEN '0' ELSE 'Missing' END AS $c"
      s"""WITH staged AS (SELECT l_orderkey, l_linenumber,
         | CASE WHEN l_returnflag = 'R' THEN 'True' WHEN l_returnflag = 'A' THEN 'False' ELSE 'unknown' END AS flag_return,
         | CASE WHEN l_linestatus = 'O' THEN 'True' ELSE 'False' END AS flag_open,
         | CASE WHEN l_discount > 0.05 THEN 'True' WHEN l_discount > 0.0 THEN 'False' ELSE 'n/a' END AS flag_discounted
         |FROM lineitem)
         |SELECT l_orderkey, l_linenumber, ${rec("flag_return")}, ${rec("flag_open")}, ${rec("flag_discounted")} FROM staged""".stripMargin
    },
    "q_string_clean" ->
      """SELECT p_partkey, translate(p_brand, 'Brand#', '') AS brand_num, split_part(p_type || ':' || p_brand, ':', 1) AS type_first, string_split(p_name, ' ')[2] AS name_tok2, ltrim('  ' || p_name) AS name_clean FROM part""",
    "q_dates_recency" ->
      """SELECT l_returnflag, CAST(min(date_diff('day', CAST(l_shipdate AS DATE), DATE '2002-01-01')) AS BIGINT) AS min_rec, CAST(max(date_diff('day', CAST(l_shipdate AS DATE), DATE '2002-01-01')) AS BIGINT) AS max_rec, round(CAST(sum(date_diff('day', CAST(l_shipdate AS DATE), DATE '2002-01-01')) AS DOUBLE) / count(*), 6) AS avg_rec, COUNT(CASE WHEN strptime(strftime(l_shipdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') = l_shipdate THEN 1 END) AS n_reparse_ok, count(*) AS n_rows FROM lineitem GROUP BY l_returnflag""",
    "q_agg_multi" ->
      """WITH r AS (SELECT *, date_diff('day', CAST(l_shipdate AS DATE), DATE '2002-01-01') AS recency FROM lineitem), m AS (SELECT max(recency) AS maxdiff FROM r) SELECT l_orderkey, sum(l_quantity) AS sum_qty, count(*) AS n_lines, round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (maxdiff - recency)) AS DOUBLE) / max(maxdiff) / count(*), 6) AS avg_adj_price, COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_hi_disc, COUNT(CASE WHEN l_discount <= 0.05 THEN 1 END) AS n_lo_disc FROM r CROSS JOIN m GROUP BY l_orderkey""",
    "q_agg_minmax" ->
      """SELECT user_id, count(ts) AS n_events, CAST(min(date_diff('day', CAST(ts AS DATE), DATE '2024-02-01')) AS BIGINT) AS min_rec, CAST(max(date_diff('day', CAST(ts AS DATE), DATE '2024-02-01')) AS BIGINT) AS max_rec, min(ts) AS first_ts, max(ts) AS last_ts FROM events GROUP BY user_id""",
    "q_agg_two_key_reagg" ->
      """SELECT user_id, round(CAST(sum(sum_value) AS DOUBLE) / count(*), 6) AS avg_sum_value, count(*) AS n_types FROM (SELECT user_id, event_type, sum(CAST(value AS DECIMAL(12,2))) AS sum_value FROM events GROUP BY user_id, event_type) GROUP BY user_id""",
    "q_agg_global" ->
      """SELECT max(l_shipdate) AS max_shipdate, min(l_shipdate) AS min_shipdate, count(*) AS n_rows, round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price FROM lineitem""",
    "q_distinct_count" ->
      """SELECT count(DISTINCT c_mktsegment) AS n_seg, count(DISTINCT c_nationkey) AS n_nat, count(*) AS n_rows FROM customer""",
    "q_dropdup" ->
      """SELECT DISTINCT user_id, event_type FROM events""")
}
