package graft

/** The standing scale-regression gate (VERDICT r14 #1): committed
  * per-query scaling exponents live in [[DefaultPath]] (checked in), and
  * every ScaleBench run re-measures its queries and FAILS (exit 3) when
  * an exponent drifts more than [[DriftTol]] above its committed value —
  * the alpha-ladder twin of the materialized-cost gate that caught a
  * real 8.7x pathology on its first round as a standing check.
  *
  * The artifact keys committed alphas by the ladder's scale list, so the
  * default 1,2,5,10 gate and the deep 1,10,50 ladders coexist; targeted
  * commit runs (ScaleBench with query args) MERGE into the existing
  * entry rather than truncating it.
  */
object ScaleGate {
  val DefaultPath = "SCALE_GATE.json"

  /** Allowed upward drift of a re-measured endpoint exponent before the
    * gate fails. 0.15 alpha at the 10x ladder is a 10^0.15 = 1.41x
    * endpoint-time growth — far above quiet-host jitter on the rows the
    * [[MinGateSeconds]] floor admits, far below the ~+1.0 a lost
    * blocking guard or an unpushed filter produces.
    */
  val DriftTol = 0.15

  /** Endpoint-seconds floor below which drift is not gated: sub-second
    * ladder endpoints are job-machinery noise where a 0.1 s wobble flips
    * the exponent. The floor hides no real regression — a query that
    * turns quadratic blows past 0.5 s at the 10x endpoint (a 0.1 s row
    * would read ~10 s), which the gate then fails.
    */
  val MinGateSeconds = 0.5

  /** Pure gate predicate (spec'd directly in ScaleGateSpec with a
    * planted quadratic): queries whose measured alpha exceeds committed
    * + [[DriftTol]] with an endpoint time at/above [[MinGateSeconds]],
    * sorted worst-first.
    */
  def offenders(committed: Map[String, Double],
      measured: Map[String, Double],
      tLast: Map[String, Double]): Seq[(String, Double, Double)] =
    measured.toSeq.flatMap { case (n, a) =>
      committed.get(n).collect {
        case c if a - c > DriftTol &&
            tLast.getOrElse(n, 0.0) >= MinGateSeconds => (n, a, c)
      }
    }.sortBy { case (_, a, c) => c - a }

  private def ladderKey(scales: Seq[Int]): String = scales.mkString(",")

  /** Committed alphas for one ladder; empty when the file or the
    * ladder's entry is absent (the caller warns — never silent).
    */
  def readCommitted(path: String, scales: Seq[Int]): Map[String, Double] =
    try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = om.readTree(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)))
      val entry = root.path(ladderKey(scales)).path("alphas")
      scala.jdk.CollectionConverters
        .IteratorHasAsScala(entry.fields()).asScala
        .map(e => e.getKey -> e.getValue.asDouble).toMap
    } catch { case _: Throwable => Map.empty }

  /** Commit (merge) a run's measured alphas for its ladder. Alphas are
    * rounded to 2 decimals (the reporting precision); `t_last` endpoint
    * seconds ride along as context for the [[MinGateSeconds]] floor.
    */
  def writeCommitted(path: String, scales: Seq[Int],
      alphas: Map[String, Double], tLast: Map[String, Double]): Unit = {
    val p = java.nio.file.Paths.get(path)
    val existing: Map[String, Map[String, (Double, Double)]] =
      try {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        val root = om.readTree(java.nio.file.Files.readAllBytes(p))
        scala.jdk.CollectionConverters
          .IteratorHasAsScala(root.fields()).asScala.map { lad =>
            val a = lad.getValue.path("alphas")
            val t = lad.getValue.path("t_last")
            lad.getKey -> scala.jdk.CollectionConverters
              .IteratorHasAsScala(a.fields()).asScala.map { e =>
                e.getKey -> (e.getValue.asDouble,
                  t.path(e.getKey).asDouble)
              }.toMap
          }.toMap
      } catch { case _: Throwable => Map.empty }
    val merged = existing.getOrElse(ladderKey(scales), Map.empty) ++
      alphas.map { case (n, a) => n -> (a, tLast.getOrElse(n, 0.0)) }
    val all = existing + (ladderKey(scales) -> merged)
    def q(m: Map[String, (Double, Double)], pick: ((Double, Double)) => Double) =
      m.toSeq.sortBy(_._1)
        .map { case (k, v) => f""""$k":${pick(v)}%.2f""" }
        .mkString("{", ",", "}")
    val body = all.toSeq.sortBy(_._1).map { case (lad, m) =>
      s""""$lad":{"alphas":${q(m, _._1)},"t_last":${q(m, _._2)}}"""
    }.mkString("{\n", ",\n", "\n}")
    java.nio.file.Files.writeString(p, body + "\n")
    System.err.println(s"[scalegate] committed ${alphas.size} alphas " +
      s"for ladder ${ladderKey(scales)} -> $path")
  }
}
