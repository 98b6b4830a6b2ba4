package graft

import org.apache.spark.sql.functions._
import graft.engine.{Curation, Tables}

/** Curation-operator invariants: chunk coverage, scrub completeness,
  * sampling determinism, shuffle permutation laws.
  */
class CurationSpec extends SparkSpec {

  test("chunks cover every token: sum of strides reconstructs the doc") {
    val perDoc = Curation.docChunk(spark, sf)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        max(col("chunk_idx")).as("max_idx"),
        sum(col("n_chunk_tokens")).as("sum_tokens"))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
    val joined = perDoc.join(docs, "doc_id")
    // chunk count = ceil(n_tokens / stride); indices are contiguous
    val bad = joined.filter(
      col("n_chunks") =!= ceil(col("n_tokens") / lit(24.0)).cast("long") ||
        col("max_idx") =!= col("n_chunks") - 1)
    assert(bad.count() === 0)
    // every token appears in at least one chunk: total chunk tokens >=
    // n_tokens (overlap makes it strictly greater for multi-chunk docs)
    assert(joined.filter(col("sum_tokens") < col("n_tokens")).count() === 0)
  }

  test("scrubbed text contains no surviving emails or urls") {
    val leftover = Curation.textScrub(spark, sf).filter(
      col("scrubbed").rlike("[a-z0-9]+@[a-z0-9.]+") ||
        col("scrubbed").rlike("https?://"))
    assert(leftover.count() === 0)
    val counts = Curation.textScrub(spark, sf)
      .filter(col("n_emails") < 1 || col("n_urls") < 1)
    assert(counts.count() === 0, "synthesized PII must be detected")
  }

  test("stratified sample ratios hover near the 30% systematic target") {
    val rows = Curation.stratifiedSample(spark, sf).collect()
    rows.foreach { r =>
      val ratio = r.getAs[Double]("sample_ratio")
      assert(ratio > 0.15 && ratio < 0.45, s"${r.getString(0)}: $ratio")
    }
  }

  test("repetition: planted near-dup docs do not affect per-doc ratios; bounds hold") {
    val rep = Curation.repetition(spark, sf)
    assert(rep.filter(col("dup_2gram_ratio") < 0 ||
      col("dup_2gram_ratio") > 1).count() === 0)
    assert(rep.count() === Tables.documents(spark, sf).count())
  }

  test("deterministic shuffle is a permutation and reproducible") {
    val a = Curation.dataShuffle(spark, sf)
    val n = Tables.documents(spark, sf).count()
    assert(a.count() === n)
    assert(a.select("position").distinct().count() === n)
    assert(a.agg(max("position")).collect()(0).getLong(0) === n)
    val first1 = a.orderBy("position").limit(5).collect().map(_.getLong(0))
    val first2 = Curation.dataShuffle(spark, sf)
      .orderBy("position").limit(5).collect().map(_.getLong(0))
    assert(first1.sameElements(first2))
    // and it is not the identity order
    assert(!first1.sameElements(Array(0L, 1L, 2L, 3L, 4L)))
  }

  test("domain mix: rates in (0,1], under-target sources keep everything") {
    val mix = Curation.domainMix(spark, sf).cache()
    try {
      assert(mix.filter(col("sample_rate") <= 0 ||
        col("sample_rate") > 1).count() === 0)
      assert(mix.filter(col("expected_tokens") >
        col("n_tokens").cast("double") + 0.5).count() === 0)
      // a source already under its target must not be downsampled
      assert(mix.filter(col("n_tokens") <= col("target_tokens") &&
        col("sample_rate") < 1.0).count() === 0)
    } finally mix.unpersist()
  }

  test("curation funnel agrees with its component operators") {
    import graft.engine.{Dedup, TextOps}
    val report = Curation.corpusCurate(spark, sf)
    // recompute kept docs by composing the standalone operators: exact
    // dedup keepers x quality/token gates x english-marker gate
    val keepers = Dedup.dedupExact(spark, sf)
      .select(col("keep_id").as("doc_id"))
    val gates = TextOps.textQuality(spark, sf)
      .filter(col("quality_score") >= Curation.QualityFloor &&
        col("n_tokens").between(Curation.MinTokens, Curation.MaxTokens))
      .select("doc_id")
    val en = TextOps.langId(spark, sf).filter(col("score_en") >= 1)
      .select("doc_id")
    val kept = keepers.join(gates, "doc_id").join(en, "doc_id")
      .join(Tables.documents(spark, sf).select("doc_id", "source"),
        "doc_id")
      .groupBy("source").count()
    val mismatched = report.select(col("source"), col("n_kept"))
      .join(kept, Seq("source"), "left")
      .filter(coalesce(col("count"), lit(0L)) =!= col("n_kept"))
    assert(mismatched.count() === 0)
    // totals: every document is counted exactly once
    assert(report.agg(sum("n_docs")).collect()(0).getLong(0) ===
      Tables.documents(spark, sf).count())
  }
}
