package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.glue
import org.apache.spark.sql.types.{DataType, LongType, StringType}
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

object StringFunctions {
  /** Column-API entry point for [[NfcNormalize]]. */
  def nfc_normalize(c: Column): Column =
    glue.column(NfcNormalize(glue.expression(c)))

  /** Column-API entry point for [[Utf8PolyId]]. */
  def utf8_poly_id(c: Column, mod: Long): Column =
    glue.column(Utf8PolyId(glue.expression(c), mod))
}
