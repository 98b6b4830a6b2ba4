package graft

import org.apache.spark.sql.functions._
import graft.engine.{Curation, Dedup, SourceQueries, Tables, TextOps}

/** Curation-operator invariants: chunk coverage, scrub completeness,
  * sampling determinism, shuffle permutation laws.
  */
class CurationSpec extends SparkSpec {

  test("winsorize: nearest-rank bounds, exact in-memory replay") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "n_chars").collect()
      .filter(!_.isNullAt(2))
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val vs = rows.map(_._3).sorted
      val n = vs.length.toLong
      // smallest value whose cumulative count reaches p% of the group
      def rank(pct: Int): Long =
        vs((0 until vs.length)
          .find(i => (i + 1) * 100L >= n * pct).get)
      val (lo, hi) = (rank(Curation.WinsorLoPct),
        rank(Curation.WinsorHiPct))
      rows.map { case (id, src, v) =>
        val c = math.max(math.min(v, hi), lo)
        id -> ((src, v, c, if (c != v) 1L else 0L))
      }
    }.toMap
    val got = Curation.winsorize(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got === expected)
    // the band clips a strict, small minority
    val clipped = got.values.count(_._4 == 1L)
    assert(clipped > 0 && clipped < got.size / 5)
  }

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

  test("sequence packing tiles the token stream exactly, in shuffle order") {
    val p = Curation.packSequences(spark, sf).cache()
    try {
      val rows = p.orderBy("cum_start").collect()
      assert(rows.length === Tables.documents(spark, sf).count())
      // the stream is gapless: each doc starts where the previous ended
      var expect = 0L
      rows.foreach { r =>
        assert(r.getAs[Long]("cum_start") === expect,
          s"gap before doc ${r.getLong(0)}")
        expect += r.getAs[Long]("n_tokens")
        // pack geometry is internally consistent
        assert(r.getAs[Long]("pack_id") ===
          r.getAs[Long]("cum_start") / Curation.PackLen)
        assert(r.getAs[Long]("pack_offset") ===
          r.getAs[Long]("cum_start") % Curation.PackLen)
      }
      // order matches the deterministic shuffle, not ingest order
      val byKey = rows.sortBy(r =>
        (r.getAs[Long]("shuffle_key"), r.getAs[Long]("doc_id")))
      assert(byKey.map(_.getLong(0)).sameElements(rows.map(_.getLong(0))))
      // boundary-crossing accounting: total crossings = packs touched - 1
      // summed over docs is >= total packs - n_docs lower bound; check the
      // per-row closed form instead (end pack - start pack)
      rows.foreach { r =>
        val end = (r.getAs[Long]("cum_start") +
          math.max(r.getAs[Long]("n_tokens"), 1L) - 1) / Curation.PackLen
        assert(r.getAs[Long]("n_boundary_crossings") ===
          end - r.getAs[Long]("pack_id"))
      }
    } finally p.unpersist()
  }

  test("quality threshold keeps exactly ceil(frac * n) docs per source") {
    val t = Curation.qualityThreshold(spark, sf).cache()
    try {
      val perSource = t.groupBy("source").agg(
        count(lit(1)).as("n"),
        count(when(col("kept"), 1)).as("n_kept"),
        min(when(col("kept"), col("q_micro"))).as("min_kept"),
        max(when(!col("kept"), col("q_micro"))).as("max_dropped"))
      perSource.collect().foreach { r =>
        val expectKept = math.ceil(
          r.getAs[Long]("n") * Curation.QualityKeepFrac).toLong
        assert(r.getAs[Long]("n_kept") === expectKept, r.toString)
        // every kept doc scores >= every dropped doc within its source
        assert(r.getAs[Long]("min_kept") >= r.getAs[Long]("max_dropped"),
          r.toString)
      }
    } finally t.unpersist()
  }

  test("token budget equals a sequential replay of the quality-ordered prefix") {
    val got = Curation.tokenBudget(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("q_micro"),
          r.getAs[Long]("cum_before")))).toMap
    // independent truth: scores from qualityThreshold (oracle-gated
    // elsewhere, separate code path), prefix rule replayed sequentially
    val scores = Curation.qualityThreshold(spark, sf)
      .select("doc_id", "q_micro").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("q_micro")))
    val nTok = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    var cum = 0L
    val expect = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    scores.sortBy { case (id, q) => (-q, id) }.foreach { case (id, q) =>
      val n = nTok(id)
      if (cum + n <= Curation.TokenBudget) expect(id) = (n, q, cum)
      cum += n
    }
    assert(got === expect.toMap)
    assert(got.nonEmpty &&
      got.values.map(_._1).sum <= Curation.TokenBudget)
  }

  test("deletion audit: recounts pii docs, conserves, redaction is closed") {
    val r = Curation.deletionAudit(spark, sf).head
    val (n, np, nr) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n === np + nr, "every doc is deleted or retained")
    // recount against the per-doc audit (independent query)
    val audit = Curation.piiAudit(spark, sf).collect()
    assert(n === audit.length.toLong)
    assert(np === audit.count(a =>
      !a.isNullAt(6) && a.getBoolean(6)).toLong)
    assert(np > 0, "planted PII rows must be deleted")
    // redaction must be a fixed point of detection, corpus-wide
    assert(r.getLong(4) === 0L, "redacted text still matches a pattern")
    val fp = r.getLong(3)
    assert(fp >= 0L && fp < graft.engine.Dedup.IdMod)
  }

  test("pack manifest: segments tile each pack, conserve docs, fill packs") {
    val segs = Curation.packManifest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(segs.nonEmpty)
    val L = Curation.PackLen
    val byPack = segs.groupBy(_._1)
    val lastPack = byPack.keys.max
    byPack.foreach { case (p, ss) =>
      // window columns match the group
      ss.foreach { s =>
        assert(s._5 === ss.length.toLong && s._6 === ss.map(_._4).sum)
      }
      // segments tile [0, fill) gaplessly in order
      val sorted = ss.sortBy(_._3)
      assert(sorted.head._3 === 0L, s"pack $p does not start at 0")
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a._3 + a._4 === b._3, s"gap/overlap in pack $p")
      }
      val fill = sorted.last._3 + sorted.last._4
      assert(if (p === lastPack) fill <= L else fill === L,
        s"pack $p fill $fill")
      ss.foreach(s => assert(s._4 > 0 && s._4 <= L))
    }
    // transposition conserves every document's tokens and span count
    val docs = Curation.packSequences(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(6)))).toMap
    segs.groupBy(_._2).foreach { case (d, ss) =>
      val (n, crossings) = docs(d)
      assert(ss.map(_._4).sum === n, s"doc $d token mass")
      assert(ss.length.toLong === crossings + 1, s"doc $d span count")
    }
  }

  test("epoch plan: cap respected, redistribution total, budget conserved") {
    val rows = Curation.epochPlan(spark, sf).collect()
    assert(rows.nonEmpty)
    val cap = Curation.EpochCap
    var totAlloc, totFinal, totShort, totHead = 0L
    rows.foreach { r =>
      val Seq(u, _, alloc, needed, epochs, served, short, head, extra,
        fin, milli) = (1 to 11).map(r.getLong(_)).toSeq
      totAlloc += alloc; totFinal += fin
      totShort += short; totHead += head
      assert(epochs === math.min(cap, needed), r.toString)
      assert(served === math.min(alloc, cap * u), r.toString)
      assert(short === alloc - served && head === cap * u - served)
      // a capped source donates, never receives; no source overshoots
      if (short > 0) assert(extra === 0L, r.toString)
      assert(extra <= head, r.toString)
      assert(fin === served + extra && fin <= cap * u, r.toString)
      assert(milli === fin * 1000 / u && milli <= cap * 1000)
    }
    // budget ≤ cap·corpus ⇒ Σshortfall ≤ Σheadroom (redistribution is
    // total up to per-source floor loss)
    assert(totShort <= totHead)
    assert(totFinal <= totAlloc &&
      totAlloc - totFinal < rows.length.toLong,
      s"floor loss must stay under one token per source: " +
        s"$totAlloc vs $totFinal")
    // the binding regime is actually exercised on the fixture
    assert(rows.exists(_.getLong(7) > 0), "no source capped")
    assert(rows.exists(_.getLong(9) > 0), "no source boosted")
  }

  test("weighted sample is exactly the u(doc_id) < w(doc) subset") {
    // the whole point of hash-threshold sampling is exact driver-side
    // reproducibility: recompute the accept set independently from the
    // raw table and demand set equality, plus the acceptance invariant
    // on every emitted row
    val got = Curation.weightedSample(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().filter { r =>
        val id = r.getLong(0)
        val u = (((id * 2654435761L) % 1000000007L + 1000000007L)
          % 1000000007L).toDouble / 1000000007L
        val w = math.min(1.0, r.getInt(1) / Curation.SampleTargetTokens)
        u < w
      }.map(_.getLong(0)).toSet
    assert(got === expected,
      s"sample set diverges: ${(got -- expected).take(3)} extra, " +
        s"${(expected -- got).take(3)} missing")
    // emitted u/weight are round-6 projections of the filter operands,
    // so allow one ulp of that rounding before calling a row a violation
    assert(Curation.weightedSample(spark, sf)
      .filter(col("u") > col("weight") + 1e-6).count() === 0,
      "emitted row violates the acceptance predicate")
  }

  test("hash split partitions the corpus and is re-ingestion stable") {
    val s = Curation.hashSplit(spark, sf).cache()
    try {
      // every doc lands in exactly one split
      assert(s.agg(sum("n_docs")).collect()(0).getLong(0) ===
        Tables.documents(spark, sf).count())
      // shares sum to 1 within each source
      val bad = s.groupBy("source").agg(sum("source_share").as("tot"))
        .filter(abs(col("tot") - 1.0) > 1e-4)
      assert(bad.count() === 0)
      // stability: recomputing on a subset never reassigns a doc — check
      // via the underlying bucket rule on a 10% slice
      import graft.engine.TextOps
      val full = Tables.documents(spark, sf).select(col("doc_id"),
        (TextOps.portableFp(col("text"), Curation.FpBase1,
          Curation.FpMod1) % 100).as("b"))
      val slice = Tables.documents(spark, sf)
        .filter(col("doc_id") % 10 === 0).select(col("doc_id"),
          (TextOps.portableFp(col("text"), Curation.FpBase1,
            Curation.FpMod1) % 100).as("b2"))
      assert(full.join(slice, "doc_id")
        .filter(col("b") =!= col("b2")).count() === 0)
    } finally s.unpersist()
  }

  test("url canonicalization: scheme/host/port/params normalize, groups form") {
    val rows = Curation.urlCanonical(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2),
        r.getLong(3), r.getBoolean(4)))).toMap
    // mixed-case scheme+host, default :80, fragment, param order: the
    // two planted spellings canonicalize to the SAME string
    assert(rows(915001L)._2 == rows(915002L)._2)
    assert(rows(915001L)._2 == "http://sub.example.com/A/B?a=1&z=9")
    assert(rows(915001L)._3 == 2L && rows(915001L)._4 && !rows(915002L)._4)
    // a query of only tracking params drops entirely (no dangling '?')
    assert(rows(915003L)._2 == "https://tracker.example.com/page")
    // empty path roots; www + default https port strip
    assert(rows(915004L)._2 == "https://bare.example.com/")
    assert(rows(915005L)._2 == rows(915004L)._2)
    // the synthesized corpus forms real dup groups (crawl-noise variants
    // of the same page), not 1:1 identities
    val corpus = rows.filter(_._1 < 915001L).values
    assert(corpus.exists(_._3 >= 3L), "no corpus-level canonical groups")
    // keeper election: exactly one keeper per canonical group
    rows.values.groupBy(_._2).foreach { case (c, g) =>
      assert(g.count(_._4) == 1, s"$c keepers != 1")
    }
  }

  test("domain filter: label-aligned suffix blocking over canonical hosts") {
    val rows = Curation.domainFilter(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getBoolean(2), Option(r.getString(3)))).toMap
    // deep subdomain blocked by its registrable parent
    assert(rows(980001L) ===
      (("a.b.spam.example.com", true, Some("spam.example.com"))))
    // label boundary: notspam is NOT spam
    assert(rows(980002L) === (("notspam.example.com", false, None)))
    // scheme-case + www + default port fall away before judging
    assert(rows(980004L) ===
      (("tracker.example.com", true, Some("tracker.example.com"))))
    assert(rows(980005L) === (("clean.example.org", false, None)))
    // the URL fixture's planted tracker row crosses into the blocklist
    assert(rows(915003L)._2 === true)
    // one whole synthesized crawl domain is blocked, the rest survive
    val corpus = rows.filter(_._1 < 915001L).values
    assert(corpus.filter(_._1 == "src3.example.com").forall(_._2))
    assert(corpus.exists(h => h._1 == "src3.example.com" && h._2))
    assert(corpus.filter(_._1 != "src3.example.com").forall(!_._2))
  }

  test("k-anonymity: no small group survives, totals reconcile") {
    val rows = Curation.kAnonymity(spark, sf).collect()
    val (resid, kept) = rows.partition(_.getBoolean(4))
    assert(resid.length === 1, "exactly one residual bucket")
    assert(kept.forall(_.getLong(2) >= Curation.KAnonK),
      "a sub-k group survived suppression")
    assert(kept.forall(r =>
      r.getString(0) != "*" && r.getString(1) != "*"))
    val total = Tables.documents(spark, sf).count()
    val sum = kept.map(_.getLong(2)).sum +
      (if (resid.head.isNullAt(2)) 0L else resid.head.getLong(2))
    assert(sum === total, "release must reconcile to the corpus total")
    // group-count bookkeeping: kept rows carry 1, residual the fold size
    assert(kept.forall(_.getLong(3) === 1L))
    val allGroups = Tables.documents(spark, sf)
      .groupBy("lang", "source").count().count()
    assert(kept.length + resid.head.getLong(3) === allGroups)
  }

  test("pii audit: typed counts, ordered redaction, clean corpus, null row") {
    val byId = Curation.piiAudit(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    // (n_email, n_card, n_phone, n_ipv4) per planted row
    def counts(id: Long) = (1 to 4).map(byId(id).getLong).toList
    assert(counts(970001L) === List(1L, 0L, 1L, 0L))
    assert(counts(970002L) === List(0L, 0L, 0L, 2L))
    assert(counts(970003L) === List(0L, 2L, 0L, 0L))
    assert(counts(970004L) === List(0L, 0L, 0L, 0L))
    assert(counts(970005L) === List(1L, 1L, 1L, 1L))
    val mixed = byId(970005L).getString(5)
    assert(mixed === "mixed <EMAIL> from <IP> using <PHONE> and card <CARD>",
      mixed)
    assert(byId(970001L).getString(5) ===
      "contact alice at <EMAIL> or <PHONE> today")
    assert(byId(970004L).getBoolean(6) === false)
    assert(byId(970005L).getBoolean(6) === true)
    // null propagates through counts, redaction, and the flag
    assert((1 to 6).forall(byId(970006L).isNullAt))
    // the fixture corpus is PII-clean: redaction is identity there
    val corpus = byId.view.filterKeys(_ < 970001L)
    assert(corpus.values.forall(r => !r.getBoolean(6)),
      "fixture corpus must carry no PII")
  }

  test("dataset card: every column agrees with its standalone query") {
    val card = Curation.datasetCard(spark, sf).head
    val docs = Tables.documents(spark, sf)
    assert(card.getAs[Long]("n_docs") === docs.count())
    assert(card.getAs[Long]("n_langs") ===
      docs.select("lang").distinct().count())
    // dup stats must equal the corpus-filtered q_dedup_minhash output
    val ids: Set[Long] =
      docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val pairs = Dedup.dedupMinhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => ids(a) && ids(b) }
    assert(card.getAs[Long]("n_dup_pairs") === pairs.length.toLong)
    assert(card.getAs[Long]("n_dup_docs") ===
      pairs.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong)
    // quality keep count must equal q_quality_rules' corpus verdicts
    // (rules run over documents ∪ planted; the card is corpus-only)
    val keeps = TextOps.qualityRules(spark, sf).collect()
      .filter(r => ids(r.getLong(0)))
      .count(r => !r.isNullAt(8) && r.getBoolean(8))
    assert(card.getAs[Long]("n_quality_keep") === keeps.toLong)
    // the card's fingerprint is the manifest's partition fps, summed —
    // (Σ (sᵢ mod M)) mod M = Σ sᵢ mod M, so the two artifacts pin the
    // SAME corpus identity
    val manifestFp = SourceQueries.datasetManifest(spark, sf).collect()
      .map(r => BigInt(r.getAs[Long]("content_fp"))).sum %
      Dedup.IdMod
    assert(card.getAs[Long]("fp_corpus") === manifestFp.toLong)
    // rate identities
    assert(card.getAs[Long]("keep_ppm") ===
      card.getAs[Long]("n_quality_keep") * 1000000L /
        card.getAs[Long]("n_docs"))
  }
}
