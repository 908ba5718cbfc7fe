package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Pure-SQL surface for the engine's native Catalyst expressions — the
  * `SparkSessionExtensions` injection channel, so SQL-only pipelines
  * (`spark.sql`, the thrift server, notebook SQL cells) reach the same
  * codegen'd operators the Column API uses:
  *
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftSqlExtensions …
  *   SELECT graft_minhash_sig(text, 8, 3) FROM docs
  *
  * or programmatically on a live session: `GraftSqlExtensions.register(
  * spark)`. Parameter arguments (permutation counts, window widths …)
  * must be integer LITERALS — they parameterize generated code, not
  * per-row data — and violations raise an analysis-time error, not a
  * runtime one. This completes the extension story of SURVEY §2.11: the
  * ServiceLoader SPIs extend the ENGINE with new functions; this class
  * extends SPARK with the engine's functions.
  */
class GraftSqlExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftSqlExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftSqlExtensions {

  private def litInt(fn: String, arg: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) =>
      // toInt would silently WRAP an out-of-range BIGINT literal
      if (v < Int.MinValue || v > Int.MaxValue)
        throw new IllegalArgumentException(
          s"$fn: $arg out of int range: $v")
      else v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }
  private def litLong(fn: String, arg: String, e: Expression): Long =
    e match {
      case Literal(v: Int, IntegerType) => v.toLong
      case Literal(v: Long, LongType) => v
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got $other")
    }
  private def arity(fn: String, n: Int, args: Seq[Expression]): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${args.length}")

  private def entry(name: String, usage: String, cls: Class[_])(
      builder: Seq[Expression] => Expression)
      : (String, ExpressionInfo, Seq[Expression] => Expression) =
    (name,
      new ExpressionInfo(cls.getCanonicalName, null, name, usage, ""),
      builder)

  /** (name, info, builder) for every exposed native expression. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      entry("graft_poly_hash",
        "graft_poly_hash(str) - engine-independent polynomial hash",
        classOf[PolyHashExpr]) { args =>
        arity("graft_poly_hash", 1, args); PolyHashExpr(args.head)
      },
      entry("graft_shingle_hashes",
        "graft_shingle_hashes(str, k) - k-token shingle hash array",
        classOf[ShingleHashesExpr]) { args =>
        arity("graft_shingle_hashes", 2, args)
        ShingleHashesExpr(args.head,
          litInt("graft_shingle_hashes", "k", args(1)))
      },
      entry("graft_minhash_sig",
        "graft_minhash_sig(str, numPerms, k) - MinHash signature",
        classOf[MinHashSigExpr]) { args =>
        arity("graft_minhash_sig", 3, args)
        MinHashSigExpr(args.head,
          litInt("graft_minhash_sig", "numPerms", args(1)),
          litInt("graft_minhash_sig", "k", args(2)))
      },
      entry("graft_simhash32",
        "graft_simhash32(str) - 32-bit SimHash",
        classOf[SimHash32Expr]) { args =>
        arity("graft_simhash32", 1, args); SimHash32Expr(args.head)
      },
      entry("graft_sign_bits",
        "graft_sign_bits(vec, bits) - sign-bit LSH bucket of a float vector",
        classOf[SignBitsExpr]) { args =>
        arity("graft_sign_bits", 2, args)
        SignBitsExpr(args.head, litInt("graft_sign_bits", "bits", args(1)))
      },
      entry("graft_dot",
        "graft_dot(a, b) - left-fold dot product of two float vectors",
        classOf[DotProductExpr]) { args =>
        arity("graft_dot", 2, args); DotProductExpr(args.head, args(1))
      },
      entry("graft_char_ngram_jaccard",
        "graft_char_ngram_jaccard(a, b, n) - character n-gram Jaccard",
        classOf[CharNgramJaccardExpr]) { args =>
        arity("graft_char_ngram_jaccard", 3, args)
        CharNgramJaccardExpr(args.head, args(1),
          litInt("graft_char_ngram_jaccard", "n", args(2)))
      },
      entry("graft_quantize_stats",
        "graft_quantize_stats(vec) - int8 quantization statistics struct",
        classOf[QuantizeStatsExpr]) { args =>
        arity("graft_quantize_stats", 1, args); QuantizeStatsExpr(args.head)
      },
      entry("graft_cdc_chunks",
        "graft_cdc_chunks(str, w, divisor) - content-defined chunk structs",
        classOf[CdcChunksExpr]) { args =>
        arity("graft_cdc_chunks", 3, args)
        CdcChunksExpr(args.head, litInt("graft_cdc_chunks", "w", args(1)),
          litLong("graft_cdc_chunks", "divisor", args(2)))
      },
      entry("graft_random_projection",
        "graft_random_projection(vec, outDims, scale) - deterministic ±1 JL projection",
        classOf[RandomProjectionExpr]) { args =>
        arity("graft_random_projection", 3, args)
        RandomProjectionExpr(args.head,
          litInt("graft_random_projection", "outDims", args(1)),
          litLong("graft_random_projection", "scale", args(2)))
      },
      entry("graft_word_ngrams",
        "graft_word_ngrams(str, n) - word n-gram hash array",
        classOf[WordNGramsExpr]) { args =>
        arity("graft_word_ngrams", 2, args)
        WordNGramsExpr(args.head, litInt("graft_word_ngrams", "n", args(1)))
      },
      entry("graft_deflate_size",
        "graft_deflate_size(str, level) - DEFLATE-compressed byte count",
        classOf[DeflateSizeExpr]) { args =>
        arity("graft_deflate_size", 2, args)
        DeflateSizeExpr(args.head,
          litInt("graft_deflate_size", "level", args(1)))
      },
      entry("graft_gram_pairs",
        "graft_gram_pairs(vec, scale) - upper-triangle (i, j, p) Gram " +
          "pair structs of the quantized vector",
        classOf[GramPairsExpr]) { args =>
        arity("graft_gram_pairs", 2, args)
        GramPairsExpr(args.head,
          litLong("graft_gram_pairs", "scale", args(1)))
      },
      entry("graft_url_canon",
        "graft_url_canon(url) - canonical crawl URL (fragment/case/www/" +
          "default-port/dup-slash/tracking-param/param-order collapse)",
        classOf[UrlCanonExpr]) { args =>
        arity("graft_url_canon", 1, args)
        UrlCanonExpr(args.head)
      })

  /** Register on a LIVE session (the extensions conf only applies at
    * session construction). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info, builder)
    }
}
