package graft

import org.apache.spark.sql.functions._
import graft.engine._
import graft.functions.VectorFunctions.cosine_sim

/** Similarity-search correctness: the native cosine expression, brute-force
  * top-k, ANN precision/pruning, and the vector-mean Aggregator.
  */
class SimilaritySpec extends SparkSpec {

  test("cosine expression matches driver-side computation") {
    val rows = Tables.embeddings(spark, sf).limit(2).collect()
    val a = rows(0).getSeq[Float](1).toArray
    val b = rows(1).getSeq[Float](1).toArray
    var dot = 0.0; var na = 0.0; var nb = 0.0
    a.indices.foreach { i =>
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
    }
    val expected = dot / (math.sqrt(na) * math.sqrt(nb))
    import spark.implicits._
    val got = Seq((a, b)).toDF("x", "y")
      .select(cosine_sim(col("x"), col("y"))).collect()(0).getDouble(0)
    assert(math.abs(got - expected) < 1e-12)
  }

  test("cosine expression: null / mismatched / zero inputs yield null") {
    import spark.implicits._
    val z = Array(0f, 0f)
    val v = Array(1f, 2f)
    val df = Seq((v, z), (v, Array(1f, 2f, 3f))).toDF("x", "y")
      .select(cosine_sim(col("x"), col("y")).as("c"))
    assert(df.filter(col("c").isNotNull).count() === 0)
  }

  test("cosine of a vector with itself is 1") {
    val self = Tables.embeddings(spark, sf)
      .select(round(cosine_sim(col("embedding"), col("embedding")), 9)
        .as("c"))
    assert(self.filter(col("c") =!= 1.0).count() === 0)
  }

  test("brute-force top-k: k rows per query, descending") {
    val tk = Similarity.simCosineTopk(spark, sf).collect()
      .groupBy(_.getLong(0))
    assert(tk.size === Similarity.NQueryVecs)
    tk.values.foreach { rows =>
      assert(rows.length === Similarity.TopK)
      val cs = rows.sortBy(_.getAs[Int]("rank")).map(_.getDouble(2))
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y })
    }
  }

  test("ANN: every reported neighbor carries its exact brute-force cosine") {
    val ann = Similarity.annLsh(spark, sf)
      .select("query_id", "neighbor_id", "cos_sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ann.nonEmpty)
    // recompute the same pairs exactly
    val e = Tables.embeddings(spark, sf)
    val qv = e.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val cv = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
    val exact = cv.crossJoin(qv)
      .filter(col("query_id") < Similarity.NQueryVecs &&
        col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine_sim(col("qe"), col("ce")), 6).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ann.foreach { case (k, c) => assert(exact(k) === c, s"pair $k") }
  }

  test("ANN prunes the candidate space vs brute force") {
    // bucketed candidate pairs must be well under |queries| x |corpus|
    val dim = 64
    val e = Tables.embeddings(spark, sf)
    val corpus = e.count()
    val ann = Similarity.annLsh(spark, sf)
    // rank <= TopK caps output; measure pruning via distinct neighbors seen
    val candidates = ann.count()
    assert(candidates <= Similarity.NQueryVecs.toLong * Similarity.TopK)
    assert(candidates > 0)
    assert(corpus > 100) // sanity: corpus big enough for pruning to matter
  }

  test("centroid query agrees with the VectorMean aggregator") {
    import spark.implicits._
    val agg = new Similarity.VectorMeanAggregator(64)
    val byLabel = Tables.embeddings(spark, sf)
      .select(col("label"), col("embedding"))
      .as[(Int, Array[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn.name("centroid"))
      .collect().toMap
    val exploded = Similarity.embedCentroid(spark, sf)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    byLabel.foreach { case (label, cent) =>
      cent.zipWithIndex.foreach { case (v, d) =>
        val expect = exploded((label, d))
        assert(math.abs(v - expect) < 1e-5, s"label $label dim $d")
      }
    }
  }

  test("label-blocked near-dup pairs stay within label and threshold") {
    val nd = Similarity.embedNearDup(spark, sf)
    assert(nd.filter(col("cos_sim") < Similarity.NearDupThreshold)
      .count() === 0)
    assert(nd.filter(col("vec_a") >= col("vec_b")).count() === 0)
  }

  test("IVF: candidate pruning, per-query caps, and a recall floor") {
    val ivf = Similarity.annIvf(spark, sf).cache()
    val bf = Similarity.simCosineTopk(spark, sf).cache()
    try {
      // at most TopK per query, correctly ranked (rank is dense from 1)
      assert(ivf.groupBy("query_id").count()
        .filter(col("count") > Similarity.TopK).count() === 0)
      assert(ivf.filter(col("rank") < 1 ||
        col("rank") > Similarity.TopK).count() === 0)
      // every reported cosine is the exact brute-force value
      val joined = ivf.as("i").join(bf.as("b"),
        col("i.query_id") === col("b.query_id") &&
          col("i.neighbor_id") === col("b.neighbor_id"))
      assert(joined.filter(col("i.cos_sim") =!= col("b.cos_sim"))
        .count() === 0)
      // probing NProbe of the cells must retain a meaningful share of the
      // true top-k (sf0.01 measured: 0.62 at 4 probes; floor leaves slack
      // for the smaller sf0.001 corpus)
      val recall = joined.count().toDouble / bf.count()
      assert(recall >= 0.4, s"IVF recall $recall below floor")
    } finally { ivf.unpersist(); bf.unpersist() }
  }

  test("PQ: compact codes, exact rerank scores, and a recall floor") {
    val pq = Similarity.annPq(spark, sf).cache()
    val bf = Similarity.simCosineTopk(spark, sf).cache()
    try {
      // k-bounded, dense ranks, corpus-only neighbors
      assert(pq.groupBy("query_id").count()
        .filter(col("count") > Similarity.TopK).count() === 0)
      assert(pq.filter(col("rank") < 1 ||
        col("rank") > Similarity.TopK).count() === 0)
      assert(pq.filter(col("neighbor_id") < Similarity.NQueryVecs)
        .count() === 0)
      // the rerank is exact: every reported cosine equals brute force
      val joined = pq.as("p").join(bf.as("b"),
        col("p.query_id") === col("b.query_id") &&
          col("p.neighbor_id") === col("b.neighbor_id"))
      assert(joined.filter(col("p.cos_sim") =!= col("b.cos_sim"))
        .count() === 0)
      // shortlist+rerank recall (sf0.01 measured: 0.77 at shortlist 80;
      // at sf0.001 the shortlist covers most of the corpus, so higher)
      val recall = joined.count().toDouble / bf.count()
      assert(recall >= 0.5, s"PQ recall $recall below floor")
    } finally { pq.unpersist(); bf.unpersist() }
  }

  test("semantic dedup: one row per vector, reps precede dups, dups real") {
    val sd = Similarity.semanticDedup(spark, sf).cache()
    val e = Tables.embeddings(spark, sf)
    try {
      // total cover: exactly one verdict per corpus vector
      assert(sd.count() === e.count())
      // keep <=> no dup_of; every dup points at a strictly smaller id
      assert(sd.filter(col("keep") =!= col("dup_of").isNull).count() === 0)
      assert(sd.filter(col("dup_of") >= col("vec_id")).count() === 0)
      // every (dup_of, vec_id) pair genuinely clears the cosine threshold
      val emb = e.select(col("vec_id"), col("embedding"))
      val confirmed = sd.filter(col("dup_of").isNotNull)
        .join(emb.withColumnRenamed("vec_id", "dup_of")
          .withColumnRenamed("embedding", "er"), Seq("dup_of"))
        .join(emb, Seq("vec_id"))
        .withColumn("cs",
          round(cosine_sim(col("er"), col("embedding")), 6))
      assert(confirmed.filter(col("cs") < Similarity.NearDupThreshold)
        .count() === 0)
    } finally { sd.unpersist() }
  }

  test("k-means refinement partitions the corpus and moves the centroids") {
    val refined = Similarity.kmeansRefine(spark, sf).cache()
    try {
      val nVecs = Tables.embeddings(spark, sf).count()
      // every vector lands in exactly one cell: per-dim member counts sum
      // to the corpus size (checked on dim 0; all dims carry equal counts)
      val d0 = refined.filter(col("dim") === 0)
      assert(d0.agg(sum(col("n_members"))).head.getLong(0) === nVecs)
      assert(refined.groupBy("cell", "dim").count()
        .filter(col("count") > 1).count() === 0)
      // the M-step must actually move mass: assignment reshuffles vectors
      // across label boundaries, so refined != the label-mean seed
      val seed = Similarity.embedCentroid(spark, sf)
        .select(col("label").as("cell"), col("dim"),
          col("centroid").as("seed_c"))
      val moved = refined.join(seed, Seq("cell", "dim"))
        .filter(col("centroid") =!= col("seed_c")).count()
      assert(moved > 0, "refinement left every centroid exactly at its seed")
    } finally { refined.unpersist() }
  }

  test("int8 quantization: full coverage, bounded codes, half-step error") {
    val q = Similarity.embedQuantize(spark, sf).cache()
    try {
      val e = Tables.embeddings(spark, sf)
      assert(q.count() === e.count(), "one stats row per corpus vector")
      assert(q.filter(col("n_dims") =!= 64).count() === 0)
      // codes live in [-127, 127]: the per-vector sum is bounded by
      // 127 * n_dims on both sides
      assert(q.filter(abs(col("code_sum")) > 127L * 64).count() === 0)
      // nearest-level rounding bounds reconstruction error by half a
      // quantization step of the WIDEST dimension range
      val widest = e.select(posexplode(col("embedding")))
        .select(col("pos"), col("col").cast("double").as("v"))
        .groupBy("pos")
        .agg((max(col("v")) - min(col("v"))).as("range"))
        .agg(max(col("range"))).head.getDouble(0)
      val bound = widest / Similarity.QuantLevels / 2 * (1 + 1e-9) + 1e-6
      val worst = q.agg(max(col("max_abs_err"))).head.getDouble(0)
      assert(worst <= bound,
        s"max reconstruction error $worst exceeds half-step bound $bound")
      // and the quantizer must actually be lossy on real data (guards
      // against a degenerate all-zero-code regression)
      assert(q.filter(col("rmse") > 0).count() > 0)
    } finally q.unpersist()
  }

  test("random projection: complete, deterministic, and JL-faithful") {
    val pr = Similarity.embedProject(spark, sf).cache()
    try {
      // every vector gets exactly ProjDims integer components
      val n = Tables.embeddings(spark, sf).count()
      assert(pr.count() === n * Similarity.ProjDims)
      assert(pr.groupBy("vec_id").count()
        .filter(col("count") =!= Similarity.ProjDims).count() === 0)
      // the sign matrix is index-hashed: a fresh session reproduces
      // every component bit-for-bit (no rand(), no partition order dep)
      val again = Similarity.embedProject(spark.newSession(), sf)
      assert(pr.except(again).count() === 0 &&
        again.except(pr).count() === 0)
      // JL sanity: projected L2 distance must broadly preserve neighbor
      // order — the exact top-1 of each brute-force query should rank in
      // the nearest third of the corpus under projected distance for
      // most queries (a scale-free floor; exact preservation is not the
      // JL promise at 16 dims)
      val comps = pr.collect()
        .groupBy(_.getLong(0))
        .map { case (id, rs) =>
          id -> rs.sortBy(_.getInt(1)).map(_.getLong(2))
        }
      def d2(a: Array[Long], b: Array[Long]): Long =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      val top1 = Similarity.simCosineTopk(spark, sf)
        .filter(col("rank") === 1)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val good = top1.count { case (q, nb) =>
        val dq = d2(comps(q), comps(nb))
        val better = comps.count { case (o, v) => o != q && d2(comps(q), v) < dq }
        better <= comps.size / 3
      }
      assert(good * 2 >= top1.length,
        s"only $good/${top1.length} exact top-1s near under projection")
    } finally pr.unpersist()
  }

  test("recall canary: one row per query, hits bounded, ratio consistent") {
    val r = Similarity.annRecall(spark, sf).collect()
    assert(r.length === Similarity.NQueryVecs)
    for (row <- r) {
      val (nTrue, nHit, rec) =
        (row.getLong(1), row.getLong(2), row.getDouble(3))
      assert(nTrue === Similarity.TopK.toLong)
      assert(nHit >= 0L && nHit <= nTrue)
      assert(math.abs(rec - nHit.toDouble / nTrue) < 1e-6)
    }
    // the canary must agree with a direct recount of the two queries
    val truth = Similarity.simCosineTopk(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val lsh = Similarity.annLsh(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val hits = r.map(row => row.getLong(0) -> row.getLong(2)).toMap
    for ((q, h) <- hits)
      assert(h === truth.filter(_._1 == q).count(lsh.contains).toLong)
  }

  test("nprobe sweep: monotone recall/cost, agrees with the IVF query at 4") {
    val rows = Similarity.annNprobeSweep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._1) === Similarity.NprobeSweep.map(_.toLong))
    rows.foreach { case (_, t, h, rec, _) =>
      assert(t === (Similarity.NQueryVecs * Similarity.TopK).toLong)
      assert(h >= 0L && h <= t)
      assert(math.abs(rec - h.toDouble / t) < 1e-6)
    }
    // candidate sets are nested in nprobe: recall can only grow, and
    // each extra probed cell adds strictly positive scored rows
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 >= a._3, s"hits fell ${a._1}->${b._1}")
      assert(b._5 > a._5, s"cost not increasing ${a._1}->${b._1}")
    }
    // cross-operator law: hits at the production probe count equal the
    // truth pairs the real IVF query retrieves (a truth hit entering
    // the candidates can never be pushed out of the top-k)
    val truth = Similarity.simCosineTopk(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val ivf = Similarity.annIvf(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val at4 = rows.find(_._1 === Similarity.NProbe.toLong).get
    assert(at4._3 === truth.count(ivf.contains).toLong,
      "sweep@NProbe disagrees with the IVF query's retrieved truth")
  }

  test("chunk-grid near-dup emits each pair exactly once at any grid size") {
    val e = Tables.embeddings(spark, sf)
    val base = Similarity.nearDupPairsGrid(e, 1).collect()
      .map(r => (r.get(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(base.nonEmpty)
    // a multi-cell grid (chunks chosen to exercise cross-chunk AND
    // same-chunk cells) must produce the identical pair set
    Seq(3, 7).foreach { chunks =>
      val grid = Similarity.nearDupPairsGrid(e, chunks).collect()
        .map(r => (r.get(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(grid.length === grid.toSet.size, s"duplicate pairs at k=$chunks")
      assert(grid.toSet === base, s"pair set diverged at k=$chunks")
    }
  }

  test("embed sensitivity: monotone sweep that agrees with the" +
      " production near-dup pass at its own threshold") {
    val rows = Similarity.embedSensitivity(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === Similarity.EmbedSweepPct)
    // tightening the threshold can only shrink both counts
    rows.sliding(2).foreach {
      case Array((_, a), (_, b)) =>
        assert(a._1 >= b._1 && a._2 >= b._2, "sweep not monotone")
      case _ =>
    }
    // the production-threshold point IS q_embed_near_dup's pair count
    val prodPct = math.round(Similarity.NearDupThreshold * 100)
    val atProd = rows.toMap.apply(prodPct)
    assert(atProd._1 === Similarity.embedNearDup(spark, sf).count())
    // the floor point must see strictly more than the production point
    // on the fixture (the sweep exists to show the gradient)
    assert(rows.head._2._1 > atProd._1)
  }
}
