package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graft.glue
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization — the
  * text-hygiene pass a multilingual corpus runs before ANY hashing (the
  * same visible string in composed vs decomposed form hashes
  * differently, leaking duplicates past exact AND near-dup passes).
  *
  * Spark has no normalize builtin; the round-11 implementation was a
  * `mapPartitions` over `java.text.Normalizer`, which is correct but
  * breaks whole-stage codegen with a SerializeFromObject /
  * DeserializeToObject round-trip and keeps the op off the SQL surface.
  * This expression stays inside the codegen'd stage (the normalizer call
  * itself rides along as a reference object, the
  * [[HyperplaneSignatures]] pattern) and registers as SQL
  * `nfc_normalize` via [[graft.GraftExtensions]] — the same name DuckDB
  * gives its implementation of the same Unicode standard, so oracle SQL
  * and engine SQL read identically.
  *
  * Two allocation-free fast paths matter at corpus scale: pure-ASCII
  * strings (the overwhelming majority of a web corpus) are detected with
  * one signed-byte scan and returned AS-IS — NFC is the identity on
  * ASCII — and already-normalized non-ASCII strings return the original
  * buffer after `Normalizer.isNormalized` (a scan, no rewrite). Only
  * genuinely decomposed rows pay the String materialization.
  *
  * Null in, null out (standard unary null propagation).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nfc_normalize"

  /** Codegen/eval entry point (public so generated code can call it). */
  def normalize(u: UTF8String): UTF8String = {
    val n = u.numBytes()
    var i = 0
    while (i < n) {
      if (u.getByte(i) < 0) {
        // non-ASCII byte: fall through to the Normalizer
        val s = u.toString
        return if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) u
        else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
      }
      i += 1
    }
    u // pure ASCII: NFC is the identity
  }

  override def nullSafeEval(s: Any): Any =
    normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nfcExpr", this,
      classOf[NfcNormalize].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.normalize($a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

/** Native Catalyst expression for the engine-portable polynomial string
  * id: fold the string's UTF-8 bytes (unsigned) through
  * `acc = (acc·31 + byte) mod m`, the id every dedup/decontamination
  * operator keys shingles and tokens on (`Dedup.portableIdUtf8`;
  * DuckDB twin `Dedup.idUtf8Sql` derives the same bytes arithmetically
  * from codepoints).
  *
  * The composed-builtin form (`hex` → `regexp_extract_all` per byte
  * pair → `conv` → `aggregate` HOF) materializes a STRING ARRAY with
  * one two-char element per input byte and re-parses each through a
  * radix conversion — tens of allocations per shingle on the hottest
  * path the engine has. This expression walks the UTF8String's bytes
  * in place: zero allocation, one multiply-add-mod per byte, and it
  * stays inside whole-stage codegen. `mod` is a literal parameter so
  * the fold is usable for any of the house moduli.
  *
  * Intermediate bound: acc < m ≤ 2^31, so acc·31 + 255 < 2^36 — no
  * int64 overflow for any house modulus.
  */
case class Utf8PolyId(child: Expression, mod: Long)
    extends UnaryExpression {

  // the overflow-safety bound documented above, enforced at EVERY entry
  // point (SQL builder, Column API, direct construction) — a larger mod
  // would silently wrap acc·31 + 255 past 2^63 instead of failing loudly
  require(mod > 0 && mod <= Int.MaxValue.toLong + 1L,
    s"utf8_poly_id mod must be in (0, 2^31], got $mod")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "utf8_poly_id"

  /** Codegen/eval entry point (public so generated code can call it). */
  def fold(u: UTF8String): Long = {
    val n = u.numBytes()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc = (acc * 31 + (u.getByte(i) & 0xff)) % mod
      i += 1
    }
    acc
  }

  override def nullSafeEval(s: Any): Any =
    fold(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("utf8PolyExpr", this,
      classOf[Utf8PolyId].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.fold($a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Utf8PolyId = copy(child = newChild)
}

/** The shared script-aware scanner behind [[QualityStats]] and
  * [[TokenSetStats]] — one codepoint walk reproducing
  * `TextOps.SegPattern` exactly (per-codepoint tokens for the BMP
  * per-char ranges, maximal non-whitespace runs otherwise;
  * supplementary-plane codepoints always join word runs).
  */
private[functions] object SegScanner {
  /** "lo-hi" triplets (all BMP, one UTF-16 unit each) → flat bounds. */
  def parseRanges(perCharClass: String): Array[Int] =
    perCharClass.grouped(3).flatMap(s =>
      Seq(s.charAt(0).toInt, s.charAt(2).toInt)).toArray

  def inClass(ranges: Array[Int], cp: Int): Boolean = {
    var i = 0
    while (i < ranges.length) {
      if (cp >= ranges(i) && cp <= ranges(i + 1)) return true
      i += 2
    }
    false
  }

  def tokenize(s: String, ranges: Array[Int],
      wsChars: String): java.util.ArrayList[String] = {
    val n = s.length
    val toks = new java.util.ArrayList[String]()
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      if (wsChars.indexOf(cp) >= 0) i += w
      else if (inClass(ranges, cp)) {
        toks.add(s.substring(i, i + w)); i += w
      } else {
        val start = i
        i += w
        var done = false
        while (i < n && !done) {
          val c2 = s.codePointAt(i)
          if (wsChars.indexOf(c2) >= 0 || inClass(ranges, c2)) done = true
          else i += Character.charCount(c2)
        }
        toks.add(s.substring(start, i))
      }
    }
    toks
  }
}

/** Native Catalyst expression computing ALL of the quality-feature
  * integer statistics in ONE tokenization pass: token count, stopword
  * instances, word-run count and summed word lengths, and
  * bigram-instance/distinct counts, returned as a six-long struct.
  *
  * Why native: the composed-builtin form re-derives the segmented token
  * array (`regexp_extract_all`) inside every feature column, and the
  * dependent higher-order functions (`filter`/`zip_with`/`aggregate`
  * with lambda variables) are EXCLUDED from Spark's codegen
  * subexpression elimination — so after project collapse the scoring
  * pass tokenized each row ~30 times (measured 14x the pruned-scan cost
  * at sf0.1). This expression is a plain deterministic unary, so CSE
  * dedupes every `GetStructField(quality_stats(text))` reference to ONE
  * evaluation per row, and the scan walks the string once.
  *
  * Tokenization contract: EXACTLY [[graft.engine.TextOps.SegPattern]]
  * semantics — per-codepoint tokens for the BMP per-char ranges,
  * maximal runs of anything else that is not whitespace; supplementary
  * -plane codepoints always land inside word runs (BMP-only class, the
  * same behavior Java regex and RE2 agree on). The parameters (class
  * ranges, whitespace set, stopword list) arrive as constructor
  * literals so two identical calls are `semanticEquals` (CSE-able) and
  * the expression stays engine-agnostic.
  *
  * Null in, null out; the empty string yields all-zero counts.
  */
case class QualityStats(child: Expression, perCharClass: String,
    wsChars: String, stopwords: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_word", LongType, nullable = false),
    StructField("sum_wchars", LongType, nullable = false),
    StructField("nb", LongType, nullable = false),
    StructField("ndb", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "quality_stats"

  @transient private lazy val ranges: Array[Int] =
    SegScanner.parseRanges(perCharClass)
  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val h = new java.util.HashSet[String]()
    stopwords.foreach(h.add)
    h
  }

  /** Codegen/eval entry point (public so generated code can call it). */
  def stats(u: UTF8String): InternalRow = {
    val toks = SegScanner.tokenize(u.toString, ranges, wsChars)
    val m = toks.size
    var nStop = 0L
    var nWord = 0L
    var sumW = 0L
    var k = 0
    while (k < m) {
      val t = toks.get(k)
      if (stopSet.contains(t)) nStop += 1
      val cps = t.codePointCount(0, t.length)
      if (!(cps == 1 && SegScanner.inClass(ranges, t.codePointAt(0)))) {
        nWord += 1
        sumW += cps
      }
      k += 1
    }
    var ndb = 0L
    if (m > 1) {
      val seen = new java.util.HashSet[String]()
      var j = 0
      while (j < m - 1) {
        seen.add(toks.get(j) + " " + toks.get(j + 1))
        j += 1
      }
      ndb = seen.size.toLong
    }
    val nb = if (m > 1) (m - 1).toLong else 0L
    new GenericInternalRow(
      Array[Any](m.toLong, nStop, nWord, sumW, nb, ndb))
  }

  override def nullSafeEval(s: Any): Any =
    stats(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("qualityStatsExpr", this,
      classOf[QualityStats].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.stats($a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): QualityStats = copy(child = newChild)
}

/** The lexicon-counting sibling of [[QualityStats]]: token count,
  * distinct-token count, and per-lexicon token-INSTANCE counts for any
  * number of word lists, all from ONE scan — the shape behind language
  * ID (marker lists), text-quality ratios (stopword list + lexical
  * diversity), and content-taxonomy flags (category lists), each of
  * which previously re-tokenized the row once per derived column.
  */
case class TokenSetStats(child: Expression, perCharClass: String,
    wsChars: String, sets: Seq[Seq[String]]) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("set_counts",
      ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "token_set_stats"

  @transient private lazy val ranges: Array[Int] =
    SegScanner.parseRanges(perCharClass)
  @transient private lazy val setHashes: Array[java.util.HashSet[String]] =
    sets.map { ws =>
      val h = new java.util.HashSet[String]()
      ws.foreach(h.add)
      h
    }.toArray

  /** Codegen/eval entry point (public so generated code can call it). */
  def stats(u: UTF8String): InternalRow = {
    val toks = SegScanner.tokenize(u.toString, ranges, wsChars)
    val m = toks.size
    val counts = new Array[Long](setHashes.length)
    val distinct = new java.util.HashSet[String]()
    var k = 0
    while (k < m) {
      val t = toks.get(k)
      distinct.add(t)
      var s = 0
      while (s < setHashes.length) {
        if (setHashes(s).contains(t)) counts(s) += 1
        s += 1
      }
      k += 1
    }
    new GenericInternalRow(Array[Any](m.toLong, distinct.size.toLong,
      new GenericArrayData(counts)))
  }

  override def nullSafeEval(s: Any): Any =
    stats(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("tokenSetStatsExpr", this,
      classOf[TokenSetStats].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.stats($a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenSetStats = copy(child = newChild)
}

object StringFunctions {
  /** Column-API entry point for [[NfcNormalize]]. */
  def nfc_normalize(c: Column): Column =
    glue.column(NfcNormalize(glue.expression(c)))

  /** Column-API entry point for [[Utf8PolyId]]. */
  def utf8_poly_id(c: Column, mod: Long): Column =
    glue.column(Utf8PolyId(glue.expression(c), mod))

  /** Column-API entry point for [[QualityStats]]. */
  def quality_stats(c: Column, perCharClass: String, wsChars: String,
      stopwords: Seq[String]): Column =
    glue.column(QualityStats(glue.expression(c), perCharClass, wsChars,
      stopwords))

  /** Column-API entry point for [[TokenSetStats]]. */
  def token_set_stats(c: Column, perCharClass: String, wsChars: String,
      sets: Seq[Seq[String]]): Column =
    glue.column(TokenSetStats(glue.expression(c), perCharClass, wsChars,
      sets))
}
