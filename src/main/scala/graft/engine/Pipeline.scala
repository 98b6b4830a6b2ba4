package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Join operators and the end-to-end basetable assembly (SURVEY.md §2.4
  * J1–J10, §2.5 A11, §2.6 X7–X11/X15) — the Yelp per-business basetable
  * (`Databricks Notebook.py:620–641`) re-hosted on the synthetic star
  * schema: customer plays business, orders/lineitem/events play
  * covid/review/checkin.
  */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  /** J5 — fact ⋈ dim equi-join with an explicit broadcast hint
    * (`Databricks Notebook.py:569`: review ⋈ 2-col user). The dim side is
    * key-unique and small; broadcasting removes the shuffle of the fact
    * side entirely — the canonical 100 TB fact-to-dim pattern. (Catalyst
    * would usually pick this from size stats; the hint is belt-and-braces,
    * SURVEY §4.)
    */
  def joinInner(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_mktsegment")
    Tables.orders(spark, dir)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"), "inner")
      .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
  }

  /** J1–J4 — left outer joins against small dims (`Databricks
    * Notebook.py:347, 387, 427, 464`), chained through the nation→region
    * snowflake. Both dims broadcast; left rows are never shuffled.
    */
  def joinLeft(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"), "left")
      .select("c_custkey", "c_name", "n_name", "r_name")

  /** J6–J10/X15 — the basetable star assembly (`Databricks
    * Notebook.py:620–642`): one row per customer, left-joined metric
    * bundles, count-columns null-filled to 0.
    *
    * Scale design: every fact is aggregated DOWN TO THE JOIN KEY GRAIN
    * BEFORE joining (the reference does the same, NB:552/575/580), so the
    * join inputs are |keys|-sized, not |fact|-sized. lineitem is
    * additionally pre-aggregated to l_orderkey and re-aggregated after the
    * orders join — partial aggregation means the big fact shuffles only its
    * grouped form. The final joins are all broadcast-able key-unique sides.
    */
  def basetableStar(spark: SparkSession, dir: String): DataFrame = {
    val orderMetrics = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        // exact decimal sum, double-rendered: bare decimal outputs hash
        // differently across engines (see Ext.eventWindow scaladoc)
        round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
          .as("total_spend"),
        max(col("o_orderdate")).as("last_order"))
    val itemMetrics = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("li_items"), sum(col("l_quantity")).as("li_qty"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(sum(col("li_items")).as("n_items"), sum(col("li_qty")).as("sum_qty"))
    val eventMetrics = Tables.events(spark, dir)
      .groupBy(col("user_id").as("c_custkey"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(12,2)")).cast("double") /
          count(lit(1)), 6).as("avg_event_value"))
    Tables.customer(spark, dir)
      .join(orderMetrics, Seq("c_custkey"), "left")
      .join(itemMetrics, Seq("c_custkey"), "left")
      .join(eventMetrics, Seq("c_custkey"), "left")
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("n_name"), col("n_orders"), col("total_spend"), col("last_order"),
        col("n_items"), col("sum_qty"), col("n_events"),
        col("avg_event_value"))
      .na.fill(0, Seq("n_orders", "n_items", "sum_qty", "n_events"))
  }

  /** A11/F4 — single-pass per-column null/NaN audit (`Databricks
    * Notebook.py:648`): N conditional counts fused into ONE aggregate node
    * — one scan regardless of column count. Schema-driven: NaN checks only
    * on floating columns.
    */
  def nullAudit(spark: SparkSession, dir: String): DataFrame = {
    val base = basetableStar(spark, dir)
    val audits = base.schema.fields.map { f =>
      val c = col(f.name)
      val miss =
        if (f.dataType == DoubleType) c.isNull || isnan(c) else c.isNull
      count(when(miss, lit(1))).as(f.name)
    }
    base.agg(audits.head, audits.tail: _*)
  }

  /** X7–X11 + SURVEY §2.10 quirk #6 — business-hours availability
    * (`Databricks Notebook.py:486–528`): "H:mm-H:mm" strings are split,
    * hour-parsed via substring_index+cast, past-midnight closes get +24,
    * availability = close − open, nulls → 0. The hour strings are
    * synthesized deterministically in-query from o_orderkey (the Yelp hours
    * data does not exist in the fixtures — FIXTURES.md §C); every derived
    * value is integer arithmetic, so the oracle matches bit-for-bit.
    */
  def hoursAvailability(spark: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    val openH = (k % 24).cast("int")
    val openM = ((k % 2) * 30).cast("int")
    val closeH = ((k * 7 + 3) % 24).cast("int")
    val closeM = when(k % 3 === 0, lit(30)).otherwise(lit(0))
    val hoursStr = concat(
      openH.cast("string"), lit(":"), lpad(openM.cast("string"), 2, "0"),
      lit("-"),
      closeH.cast("string"), lit(":"), lpad(closeM.cast("string"), 2, "0"))
    Tables.orders(spark, dir)
      .withColumn("hours",
        when(k % 11 === 0, lit(null)).otherwise(hoursStr))
      .withColumn("open_hour",
        ScalarOps.hourOf(split(col("hours"), "-").getItem(0)))
      .withColumn("close_raw",
        ScalarOps.hourOf(split(col("hours"), "-").getItem(1)))
      .withColumn("close_hour_adj",
        ScalarOps.wrapClose(col("open_hour"), col("close_raw")))
      .withColumn("avail_hours",
        coalesce(col("close_hour_adj") - col("open_hour"), lit(0)))
      .select("o_orderkey", "hours", "open_hour", "close_hour_adj",
        "avail_hours")
  }

  /** The reference's END-TO-END basetable flow composed as one plan
    * (`Databricks Notebook.py` cells 204→723 re-hosted): entity filter
    * (LIKE disjunction = the food-industry cut, NB:204) → star metric
    * assembly (NB:620–642) → one-hot activity dummies via fixed-value pivot
    * (NB:342-462) → synthesized opening-hours availability (NB:486–528) →
    * boolean recode of a derived attribute (NB:238) → null fill (NB:677) →
    * final "Missing"→0 recode (NB:685–691). One row per retained
    * customer — "a user of the reference could run their whole notebook
    * here".
    *
    * Scale shape: the filter lands on the dimension scan; every fact
    * arrives pre-aggregated to the key grain; the pivot carries a fixed
    * value list (no eager distinct job); all dimension joins broadcast.
    */
  def fullPipeline(spark: SparkSession, dir: String): DataFrame = {
    val filtered = basetableStar(spark, dir)
      .filter(col("c_mktsegment").like("%URE%") ||
        col("c_mktsegment").like("%MACH%"))
    val dummies = Reshape.pivotDummies(spark, dir)
      .withColumnRenamed("user_id", "c_custkey")
    val k = col("c_custkey")
    val openH = (k % 24).cast("int")
    val closeH = ((k * 7 + 3) % 24).cast("int")
    val avail = ScalarOps.wrapClose(openH, closeH) - openH
    val spender = when(col("total_spend").isNull, lit("unknown"))
      .when(col("total_spend") > 500000, lit("True"))
      .otherwise(lit("False"))
    val staged = filtered
      .join(dummies, Seq("c_custkey"), "left")
      .na.fill(0, Reshape.EventTypes)
      .withColumn("avail_hours", avail)
      .withColumn("attr_big_spender", spender)
    val keep = Seq("c_custkey", "c_mktsegment", "n_name", "n_orders",
      "total_spend", "n_items", "sum_qty", "n_events", "avg_event_value") ++
      Reshape.EventTypes ++ Seq("avail_hours", "attr_big_spender")
    val recoded = ScalarOps.recodeBooleans(staged, Seq("attr_big_spender"))
    ScalarOps.missingToZero(recoded, Seq("attr_big_spender"))
      .select(keep.map(col): _*)
  }

  /** Referential-integrity audit — the data-quality gate a pipeline runs
    * BEFORE its training joins: orphan counts per foreign-key
    * relationship across the star schema and the corpus tables, one row
    * per edge. Each check is a left join on the edge's key (the same
    * shuffle the downstream ETL join pays — so the audit doubles as a
    * dry run of the join graph); dimension-sized parents broadcast under
    * AQE. Parents are key-unique by construction, so the left join
    * preserves child cardinality and the orphan sum is exact.
    */
  def refIntegrity(spark: SparkSession, dir: String): DataFrame = {
    def edge(rel: String, child: DataFrame, childKey: String,
        parent: DataFrame, parentKey: String): DataFrame =
      child.select(col(childKey).as("ck"))
        .join(parent.select(col(parentKey).as("pk")),
          col("ck") === col("pk"), "left")
        .agg(
          lit(rel).as("rel"),
          count(lit(1)).as("n_child"),
          sum(when(col("pk").isNull, lit(1L)).otherwise(lit(0L)))
            .as("n_orphans"))
        .select("rel", "n_child", "n_orphans")
    val t = Tables
    Seq(
      edge("lineitem->orders", t.lineitem(spark, dir), "l_orderkey",
        t.orders(spark, dir), "o_orderkey"),
      edge("orders->customer", t.orders(spark, dir), "o_custkey",
        t.customer(spark, dir), "c_custkey"),
      edge("customer->nation", t.customer(spark, dir), "c_nationkey",
        t.nation(spark, dir), "n_nationkey"),
      edge("supplier->nation", t.supplier(spark, dir), "s_nationkey",
        t.nation(spark, dir), "n_nationkey"),
      edge("embeddings->documents", t.embeddings(spark, dir), "vec_id",
        t.documents(spark, dir), "doc_id"),
      edge("events->customer", t.events(spark, dir), "user_id",
        t.customer(spark, dir), "c_custkey"))
      .reduce(_.unionByName(_))
  }

  val queries: Map[String, Q] = Map(
    "q_ref_integrity" -> refIntegrity _,
    "q_join_inner" -> joinInner _,
    "q_join_left" -> joinLeft _,
    "q_basetable_star" -> basetableStar _,
    "q_null_audit" -> nullAudit _,
    "q_hours_availability" -> hoursAvailability _,
    "q_full_pipeline" -> fullPipeline _)

  /** Shared star SQL (also embedded in the null-audit oracle). */
  private[engine] val starSql: String =
    """SELECT c.c_custkey, c.c_name, c.c_mktsegment, n.n_name,
      | COALESCE(om.n_orders, 0) AS n_orders, om.total_spend, om.last_order,
      | COALESCE(im.n_items, 0) AS n_items, COALESCE(im.sum_qty, 0) AS sum_qty,
      | COALESCE(em.n_events, 0) AS n_events, em.avg_event_value
      |FROM customer c
      |LEFT JOIN (SELECT o_custkey, count(*) AS n_orders,
      |    round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
      |      AS total_spend,
      |    max(o_orderdate) AS last_order
      |  FROM orders GROUP BY o_custkey) om ON c.c_custkey = om.o_custkey
      |LEFT JOIN (SELECT o_custkey, CAST(sum(li_items) AS BIGINT) AS n_items,
      |    sum(li_qty) AS sum_qty
      |  FROM (SELECT l_orderkey, count(*) AS li_items,
      |      sum(l_quantity) AS li_qty FROM lineitem GROUP BY l_orderkey) li
      |  JOIN orders ON o_orderkey = l_orderkey
      |  GROUP BY o_custkey) im ON c.c_custkey = im.o_custkey
      |LEFT JOIN (SELECT user_id, count(*) AS n_events,
      |    round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / count(*),
      |      6) AS avg_event_value
      |  FROM events GROUP BY user_id) em ON c.c_custkey = em.user_id
      |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey""".stripMargin

  /** (name, isFloat) per basetable column — drives the null-audit oracle.
    * Kept non-private so the test suite can assert it tracks
    * `basetableStar`'s actual schema (the Spark side derives columns from
    * the schema; this list is the oracle's mirror and must not drift).
    */
  val auditCols: Seq[(String, Boolean)] = Seq(
    "c_custkey" -> false, "c_name" -> false, "c_mktsegment" -> false,
    "n_name" -> false, "n_orders" -> false, "total_spend" -> true,
    "last_order" -> false, "n_items" -> false, "sum_qty" -> true,
    "n_events" -> false, "avg_event_value" -> true)

  private val hoursSql: String =
    """WITH h AS (
      |  SELECT o_orderkey, CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE
      |    CAST(o_orderkey % 24 AS VARCHAR) || ':' ||
      |    lpad(CAST((o_orderkey % 2) * 30 AS VARCHAR), 2, '0') || '-' ||
      |    CAST((o_orderkey * 7 + 3) % 24 AS VARCHAR) || ':' ||
      |    lpad(CASE WHEN o_orderkey % 3 = 0 THEN '30' ELSE '0' END, 2, '0')
      |    END AS hours
      |  FROM orders),
      |p AS (
      |  SELECT o_orderkey, hours,
      |    CAST(NULLIF(split_part(split_part(hours, '-', 1), ':', 1), '')
      |      AS INTEGER) AS open_hour,
      |    CAST(NULLIF(split_part(split_part(hours, '-', 2), ':', 1), '')
      |      AS INTEGER) AS close_raw
      |  FROM h)
      |SELECT o_orderkey, hours, open_hour,
      |  CASE WHEN close_raw <= open_hour THEN close_raw + 24
      |       ELSE close_raw END AS close_hour_adj,
      |  COALESCE(CASE WHEN close_raw <= open_hour THEN close_raw + 24
      |       ELSE close_raw END - open_hour, 0) AS avail_hours
      |FROM p""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_ref_integrity" -> {
      val edges = Seq(
        ("lineitem->orders", "lineitem", "l_orderkey", "orders",
          "o_orderkey"),
        ("orders->customer", "orders", "o_custkey", "customer",
          "c_custkey"),
        ("customer->nation", "customer", "c_nationkey", "nation",
          "n_nationkey"),
        ("supplier->nation", "supplier", "s_nationkey", "nation",
          "n_nationkey"),
        ("embeddings->documents", "embeddings", "vec_id", "documents",
          "doc_id"),
        ("events->customer", "events", "user_id", "customer",
          "c_custkey"))
      edges.map { case (rel, c, ck, p, pk) =>
        s"""SELECT '$rel' AS rel, count(*) AS n_child,
           |  CAST(sum(CASE WHEN p.$pk IS NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_orphans
           |FROM $c c LEFT JOIN $p p ON c.$ck = p.$pk""".stripMargin
      }.mkString("\n", "\nUNION ALL\n", "")
    },
    "q_join_inner" ->
      """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment FROM orders JOIN customer ON o_custkey = c_custkey""",
    "q_join_left" ->
      """SELECT c_custkey, c_name, n_name, r_name FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey LEFT JOIN region ON n_regionkey = r_regionkey""",
    "q_basetable_star" -> starSql,
    "q_null_audit" -> {
      val exprs = auditCols.map { case (c, isFloat) =>
        val cond = if (isFloat) s"$c IS NULL OR isnan($c)" else s"$c IS NULL"
        s"COUNT(CASE WHEN $cond THEN 1 END) AS $c"
      }.mkString(", ")
      s"SELECT $exprs FROM ($starSql)"
    },
    "q_hours_availability" -> hoursSql,
    "q_full_pipeline" -> {
      val dummyCols = Reshape.EventTypes.map(t =>
        s"COALESCE(max(CASE WHEN event_type = '$t' THEN 1 END), 0) AS $t")
        .mkString(", ")
      val dummyCoalesce = Reshape.EventTypes.map(t =>
        s"COALESCE(d.$t, 0) AS $t").mkString(", ")
      s"""WITH star AS ($starSql),
         |filtered AS (SELECT * FROM star
         |  WHERE c_mktsegment LIKE '%URE%' OR c_mktsegment LIKE '%MACH%'),
         |dummies AS (SELECT user_id AS c_custkey, $dummyCols
         |  FROM events GROUP BY user_id),
         |joined AS (SELECT f.*, $dummyCoalesce
         |  FROM filtered f LEFT JOIN dummies d USING (c_custkey))
         |SELECT c_custkey, c_mktsegment, n_name, n_orders, total_spend,
         |  n_items, sum_qty, n_events, avg_event_value,
         |  ${Reshape.EventTypes.mkString(", ")},
         |  CAST(CASE WHEN (c_custkey * 7 + 3) % 24 <= c_custkey % 24
         |    THEN (c_custkey * 7 + 3) % 24 + 24
         |    ELSE (c_custkey * 7 + 3) % 24 END - c_custkey % 24 AS INTEGER)
         |    AS avail_hours,
         |  CASE WHEN b.attr2 = 'Missing' THEN '0' ELSE b.attr2 END
         |    AS attr_big_spender
         |FROM joined, LATERAL (SELECT CASE WHEN total_spend IS NULL
         |  THEN 'unknown' WHEN total_spend > 500000 THEN 'True'
         |  ELSE 'False' END AS attr) a,
         |  LATERAL (SELECT CASE WHEN a.attr = 'True' THEN '1'
         |    WHEN a.attr = 'False' THEN '0'
         |    ELSE 'Missing' END AS attr2) b""".stripMargin
    })
}
