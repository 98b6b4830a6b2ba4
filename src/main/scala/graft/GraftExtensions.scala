package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.{CosineSimilarity, HyperplaneSignatures, NfcNormalize, Utf8PolyId}
import graft.engine.Similarity

/** SparkSessionExtensions entry point: injects the engine's native
  * expressions into the SQL function registry so plain `spark.sql` can call
  * them. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)` at session build, or after the
  * fact via [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def cosineBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, "cosine_sim(a, b) takes two array<float> args")
    CosineSimilarity(args(0), args(1))
  }

  private def lshBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1, "lsh_signatures(v) takes one array<float> arg")
    HyperplaneSignatures(args.head, Similarity.planeWeights(64).toArray,
      Similarity.PlanesPerTable)
  }

  private def nfcBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1, "nfc_normalize(s) takes one string arg")
    NfcNormalize(args.head)
  }

  private def utf8PolyBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2,
      "utf8_poly_id(s, m) takes a string arg and an integer literal modulus")
    val m = args(1) match {
      case Literal(v: Long, LongType) => v
      case Literal(v: Int, IntegerType) => v.toLong
      case other => throw new IllegalArgumentException(
        s"utf8_poly_id modulus must be an integer literal, got $other")
    }
    require(m > 0 && m <= Int.MaxValue.toLong + 1,
      s"utf8_poly_id modulus out of the overflow-safe range: $m")
    Utf8PolyId(args(0), m)
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      ("cosine_sim",
        new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
        cosineBuilder _),
      ("lsh_signatures",
        new ExpressionInfo(classOf[HyperplaneSignatures].getName,
          "lsh_signatures"),
        lshBuilder _),
      ("nfc_normalize",
        new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
        nfcBuilder _),
      ("utf8_poly_id",
        new ExpressionInfo(classOf[Utf8PolyId].getName, "utf8_poly_id"),
        utf8PolyBuilder _))

  /** Imperative registration into an existing session (temp functions).
    * Also registers the KMV distinct sketch Aggregator as the SQL UDAF
    * `kmv_sketch(bigint) -> array<bigint>`: an Aggregator routes through
    * the session UDF registry, not the Catalyst expression injection
    * above, so the sketch's SQL surface needs this call —
    * [[graft.GraftSession]] always makes it, so every engine session
    * (Verify/Bench/SqlEntry) can fold sketches in plain `spark.sql`.
    */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    spark.udf.register("kmv_sketch",
      org.apache.spark.sql.functions.udaf(
        new graft.functions.KmvSketchSql(graft.engine.Ext.KmvK),
        org.apache.spark.sql.Encoders.LONG))
  }
}
