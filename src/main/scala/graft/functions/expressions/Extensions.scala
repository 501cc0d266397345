package graft.functions.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType}

/** One-stop SQL surface for the engine's custom Catalyst pieces.
  *
  * `SparkSession.builder().withExtensions(new GraftExtensions)` — or
  * `spark.sql.extensions=graft.functions.expressions.GraftExtensions` on a
  * cluster — injects every codegen'd expression as a SQL function plus the
  * [[graft.plans.TopKPerGroupStrategy]] planner rule, so `spark.sql(...)`
  * users get the same operators as the Column API. For an already-running
  * session (extensions are builder-time only), [[GraftFunctionRegistry
  * .registerTemp]] installs the same functions on the live registry.
  */
object GraftFunctionRegistry {

  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case _ => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal")
  }

  /** name -> builder for every SQL-exposed expression. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // blake2b(str|bin [, outLen]): RFC 7693 hex digest
    "blake2b" -> { exprs =>
      val in = Cast(exprs.head, BinaryType)
      if (exprs.length >= 2) Blake2b(in, litInt(exprs(1), "blake2b", "outLen"))
      else Blake2b(in)
    },
    // md5_prefix60(str|bin): first 15 md5 hex chars as non-negative BIGINT
    "md5_prefix60" -> (exprs => Md5Prefix60(Cast(exprs.head, BinaryType))),
    // shingle_hashes(text, n): distinct 60-bit hashes of word n-grams
    "shingle_hashes" -> { exprs =>
      ShingleHashesExpr(exprs.head, litInt(exprs(1), "shingle_hashes", "n"))
    },
    // shingle_hashes_all(text, n): ALL shingle hashes in position order
    "shingle_hashes_all" -> { exprs =>
      ShingleHashesAllExpr(exprs.head,
        litInt(exprs(1), "shingle_hashes_all", "n"))
    },
    // minhash_sig(shingle_hashes [, k [, seed]]): single-pass k-minima
    // signature from the deterministic universal-hash family
    "minhash_sig" -> { exprs =>
      val k = if (exprs.length >= 2) litInt(exprs(1), "minhash_sig", "k") else 64
      val seed = if (exprs.length >= 3) litInt(exprs(2), "minhash_sig", "seed").toLong else 42L
      val params = graft.functions.TextFunctions.minhashParams(k, seed)
      MinhashSig(exprs.head, params.map(_._1), params.map(_._2))
    },
    // dot_double(a, b): allocation-free dot product of double arrays
    "dot_double" -> (exprs => DotDoubleExpr(exprs.head, exprs(1))),
    // float32_le(bin, offset): IEEE-754 float32 at a little-endian offset
    "float32_le" -> { exprs =>
      Float32LEExpr(exprs.head, litInt(exprs(1), "float32_le", "offset"))
    },
    // dicom_tags(bin): the 26 DCMSUM summary fields as map<string,string>
    "dicom_tags" -> (exprs => DicomTagsExpr(exprs.head)),
    // simhash32(text): fused tokenize -> md5-prefix hash -> bit-vote
    "simhash32" -> (exprs => SimHash32Expr(exprs.head)),
    // repetition_stats(text): per-document token/bigram repetition counts
    "repetition_stats" -> (exprs => RepetitionStatsExpr(exprs.head))
  )

  /** Install on a LIVE session (temp-function registry; extensions can only
    * be applied at builder time). */
  def registerTemp(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctionRegistry.all.foreach { case (name, builder) =>
      e.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    e.injectOptimizerRule(_ => graft.plans.RankFilterToTopK)
  }
}
