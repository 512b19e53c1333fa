package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}
import graft.functions.{BloomMightContainXX, BottomKXX, BpeTokensXX, CdcChunksExprXX, CmsSketchXX, CosineSimXX, DeflateRatioExprXX, Dist2XX, FixMojibakeExprXX, HllSketchXX, JaccardXX, JaroWinklerExprXX, KmvSketchXX, MinHashSigMd5XX, MinHashSigXX, MultiMatchExprXX, NearestPairsXX, NfcNormalizeExprXX, PadPackXX, RepStatsXX, SigAgreeXX, SimHashFpXX, TensorPackXX}

/** SparkSessionExtensions entry point: registers the engine's native
  * SQL functions so plain `spark.sql` users get them too.
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * SELECT graft_minhash(shingles, 32, 42) FROM docs
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSigXX].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        val usage = "usage: graft_minhash(shingles, numHashes, seed) — " +
          "numHashes and seed must be integral literals"
        require(children.size == 3, usage)
        def intArg(e: Expression, name: String): Long = {
          require(e.foldable, s"$name is not a constant; $usage")
          e.eval() match {
            case n: java.lang.Number => n.longValue
            case other =>
              throw new IllegalArgumentException(
                s"$name must be integral, got $other; $usage")
          }
        }
        MinHashSigXX(
          children.head,
          intArg(children(1), "numHashes").toInt,
          intArg(children(2), "seed"))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimXX].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "usage: graft_cosine(a, b)")
        CosineSimXX(children.head, children(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_dist2"),
      new ExpressionInfo(classOf[Dist2XX].getName, "graft_dist2"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "usage: graft_dist2(a, b)")
        Dist2XX(children.head, children(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_deflate_ratio"),
      new ExpressionInfo(classOf[DeflateRatioExprXX].getName,
        "graft_deflate_ratio"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "usage: graft_deflate_ratio(text)")
        DeflateRatioExprXX(children.head)
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalizeExprXX].getName,
        "graft_nfc"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "usage: graft_nfc(text)")
        NfcNormalizeExprXX(children.head)
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_fix_mojibake"),
      new ExpressionInfo(classOf[FixMojibakeExprXX].getName,
        "graft_fix_mojibake"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "usage: graft_fix_mojibake(text)")
        FixMojibakeExprXX(children.head)
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_rep_stats"),
      new ExpressionInfo(classOf[RepStatsXX].getName, "graft_rep_stats"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "usage: graft_rep_stats(shingles)")
        RepStatsXX(children.head)
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_jaccard"),
      new ExpressionInfo(classOf[JaccardXX].getName, "graft_jaccard"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "usage: graft_jaccard(a, b)")
        JaccardXX(children.head, children(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerExprXX].getName,
        "graft_jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "usage: graft_jaro_winkler(a, b)")
        JaroWinklerExprXX(children.head, children(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_sig_agree"),
      new ExpressionInfo(classOf[SigAgreeXX].getName, "graft_sig_agree"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "usage: graft_sig_agree(sigA, sigB)")
        SigAgreeXX(children.head, children(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketchXX].getName, "graft_kmv_sketch"),
      (children: Seq[Expression]) => {
        val usage = "usage: graft_kmv_sketch(grams, k) — k must be an " +
          "integral literal"
        require(children.size == 2, usage)
        require(children(1).foldable, usage)
        val k = children(1).eval() match {
          case n: java.lang.Number => n.intValue
          case other => throw new IllegalArgumentException(
            s"k must be integral, got $other; $usage")
        }
        KmvSketchXX(children.head, k)
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_hll_sketch"),
      new ExpressionInfo(classOf[HllSketchXX].getName, "graft_hll_sketch"),
      (children: Seq[Expression]) => {
        val usage = "usage: graft_hll_sketch(grams, p) — p must be an " +
          "integral literal in [4, 12]"
        require(children.size == 2, usage)
        require(children(1).foldable, usage)
        val p = children(1).eval() match {
          case n: java.lang.Number => n.intValue
          case other => throw new IllegalArgumentException(
            s"p must be integral, got $other; $usage")
        }
        HllSketchXX(children.head, p)
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunksExprXX].getName,
        "graft_cdc_chunks"),
      (children: Seq[Expression]) => {
        val usage = "usage: graft_cdc_chunks(text, window, mask) — " +
          "window and mask must be integral literals"
        require(children.size == 3, usage)
        require(children(1).foldable && children(2).foldable, usage)
        def intOf(e: Expression): Int = e.eval() match {
          case n: java.lang.Number => n.intValue
          case other => throw new IllegalArgumentException(
            s"expected integral literal, got $other; $usage")
        }
        CdcChunksExprXX(children.head, intOf(children(1)),
          intOf(children(2)))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_bottomk"),
      new ExpressionInfo(classOf[BottomKXX].getName, "graft_bottomk"),
      (children: Seq[Expression]) => {
        val usage = "usage: graft_bottomk(hash, value, k) — k must be " +
          "an integral literal"
        require(children.size == 3, usage)
        require(children(2).foldable, usage)
        val k = children(2).eval() match {
          case n: java.lang.Number => n.intValue
          case other => throw new IllegalArgumentException(
            s"k must be integral, got $other; $usage")
        }
        BottomKXX(children.head, children(1), k)
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_cms_sketch"),
      new ExpressionInfo(classOf[CmsSketchXX].getName, "graft_cms_sketch"),
      (children: Seq[Expression]) => {
        val usage = "usage: graft_cms_sketch(items, depth, width) — " +
          "depth and width must be integral literals"
        require(children.size == 3, usage)
        def intArg(e: Expression): Int = {
          require(e.foldable, usage)
          e.eval() match {
            case n: java.lang.Number => n.intValue
            case other => throw new IllegalArgumentException(
              s"expected integral literal, got $other; $usage")
          }
        }
        CmsSketchXX(children.head, intArg(children(1)), intArg(children(2)))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_md5"),
      new ExpressionInfo(classOf[MinHashSigMd5XX].getName,
        "graft_minhash_md5"),
      (children: Seq[Expression]) => {
        val usage = "usage: graft_minhash_md5(shingles, numHashes) — " +
          "numHashes must be an integral literal"
        require(children.size == 2, usage)
        require(children(1).foldable, usage)
        children(1).eval() match {
          case n: java.lang.Number =>
            MinHashSigMd5XX(children.head, n.intValue)
          case other => throw new IllegalArgumentException(
            s"numHashes must be integral, got $other; $usage")
        }
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashFpXX].getName, "graft_simhash"),
      (children: Seq[Expression]) => {
        val usage = "usage: graft_simhash(tokens, bits) — bits must be " +
          "an integral literal in [1, 63]"
        require(children.size == 2, usage)
        require(children(1).foldable, usage)
        children(1).eval() match {
          case n: java.lang.Number => SimHashFpXX(children.head, n.intValue)
          case other => throw new IllegalArgumentException(
            s"bits must be integral, got $other; $usage")
        }
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_nearest"),
      new ExpressionInfo(classOf[NearestPairsXX].getName, "graft_nearest"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          "usage: graft_nearest(array<struct<bigint,double,double>>)")
        NearestPairsXX(children.head)
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_tensorpack"),
      new ExpressionInfo(classOf[TensorPackXX].getName, "graft_tensorpack"),
      (children: Seq[Expression]) => {
        val usage = "usage: graft_tensorpack(ents, pad, maxEntities, " +
          "maxFrames) — maxEntities/maxFrames must be integral literals"
        require(children.size == 4, usage)
        def intArg(e: Expression): Int = {
          require(e.foldable, usage)
          e.eval() match {
            case n: java.lang.Number => n.intValue
            case other => throw new IllegalArgumentException(
              s"expected integral literal, got $other; $usage")
          }
        }
        TensorPackXX(children.head, children(1),
          intArg(children(2)), intArg(children(3)))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContainXX].getName,
        "graft_bloom_might_contain"),
      (children: Seq[Expression]) => {
        val usage = "usage: graft_bloom_might_contain(str, filterBytes)" +
          " — filterBytes must be a foldable BINARY value (e.g. " +
          "unbase64('…') of a filter serialized by BloomXX.build)"
        require(children.size == 2, usage)
        require(children(1).foldable, usage)
        children(1).eval() match {
          case b: Array[Byte] =>
            BloomMightContainXX(children.head, b.toIndexedSeq)
          case other => throw new IllegalArgumentException(
            s"filterBytes must be binary, got $other; $usage")
        }
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_bpe_tokens"),
      new ExpressionInfo(classOf[BpeTokensXX].getName, "graft_bpe_tokens"),
      (children: Seq[Expression]) => {
        val usage = "usage: graft_bpe_tokens(text, merges) — merges " +
          "must be a foldable array(array(left, right), …) in rank order"
        require(children.size == 2, usage)
        require(children(1).foldable, usage)
        children(1).dataType match {
          case ArrayType(ArrayType(StringType, _), _) => ()
          case other => throw new IllegalArgumentException(
            s"merges must be array<array<string>>, got ${other.sql}; " +
              usage)
        }
        val arr = children(1).eval().asInstanceOf[ArrayData]
        val merges = (0 until arr.numElements()).map { i =>
          val p = arr.getArray(i)
          require(p != null && p.numElements() == 2,
            s"merge $i must be a [left, right] pair; $usage")
          (p.getUTF8String(0).toString, p.getUTF8String(1).toString)
        }
        BpeTokensXX(children.head, merges)
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_multimatch"),
      new ExpressionInfo(classOf[MultiMatchExprXX].getName,
        "graft_multimatch"),
      (children: Seq[Expression]) => {
        val usage = "usage: graft_multimatch(text, terms) — terms " +
          "must be a foldable array('t1', 't2', …) of distinct " +
          "non-empty strings"
        require(children.size == 2, usage)
        require(children(1).foldable, usage)
        children(1).dataType match {
          case ArrayType(StringType, _) => ()
          case other => throw new IllegalArgumentException(
            s"terms must be array<string>, got ${other.sql}; $usage")
        }
        // validate the term list HERE, at analysis: a NULL literal /
        // null element / empty / duplicate list would otherwise only
        // blow up lazily at eval or codegen time on an executor, with
        // an NPE instead of the usage string
        val evaled = children(1).eval()
        if (evaled == null)
          throw new IllegalArgumentException(s"terms is NULL; $usage")
        val arr = evaled.asInstanceOf[ArrayData]
        val terms = (0 until arr.numElements()).map { i =>
          val t = arr.getUTF8String(i)
          if (t == null) throw new IllegalArgumentException(
            s"terms[$i] is NULL; $usage")
          t.toString
        }
        if (terms.isEmpty)
          throw new IllegalArgumentException(s"terms is empty; $usage")
        if (terms.exists(_.isEmpty))
          throw new IllegalArgumentException(
            s"terms contains an empty string; $usage")
        if (terms.distinct.length != terms.length)
          throw new IllegalArgumentException(
            s"terms contains duplicates; $usage")
        MultiMatchExprXX(children.head, terms)
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_padpack"),
      new ExpressionInfo(classOf[PadPackXX].getName, "graft_padpack"),
      (children: Seq[Expression]) => {
        val usage = "usage: graft_padpack(ents, pad, maxN) — maxN must " +
          "be an integral literal (<= 0: sort+strip only)"
        require(children.size == 3, usage)
        require(children(2).foldable, usage)
        children(2).eval() match {
          case n: java.lang.Number =>
            PadPackXX(children.head, children(1), n.intValue)
          case other => throw new IllegalArgumentException(
            s"maxN must be integral, got $other; $usage")
        }
      }))
  }
}
