package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Engine extension surface: inject the graft native expressions into a
  * session's SQL function registry via the standard extensions hook —
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
    def info(name: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, name)
    e.injectFunction((FunctionIdentifier("graft_poly_hash"),
      info("graft_poly_hash"),
      (exprs: Seq[Expression]) => expressions.PolyHashExpr(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_simhash32"),
      info("graft_simhash32"),
      (exprs: Seq[Expression]) =>
        expressions.SimHash32Expr(expressions.TokenizeExpr(exprs.head))))
    e.injectFunction((FunctionIdentifier("graft_tokenize"),
      info("graft_tokenize"),
      (exprs: Seq[Expression]) => expressions.TokenizeExpr(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine"),
      (exprs: Seq[Expression]) =>
        expressions.CosineSimExpr(exprs.head, exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_lang_id"),
      info("graft_lang_id"),
      (exprs: Seq[Expression]) => expressions.LangIdExpr(exprs.head,
        text.TextFunctions.LangMarkers)))
    e.injectFunction((FunctionIdentifier("graft_quantize_u8"),
      info("graft_quantize_u8"),
      (exprs: Seq[Expression]) => expressions.QuantizeU8Expr(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_dequantize_u8"),
      info("graft_dequantize_u8"),
      (exprs: Seq[Expression]) => expressions.DequantizeU8Expr(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_code_dot"),
      info("graft_code_dot"),
      (exprs: Seq[Expression]) =>
        expressions.CodeDotExpr(exprs.head, exprs(1))))
    // Bloom kernels (Spark-native expressions, not exposed in the
    // stock SQL registry): graft_bloom_agg(xxhash64(col), items, bits)
    // builds the sketch; graft_bloom_might_contain(sketch,
    // xxhash64(col)) probes it. The analyzer wraps the returned
    // AggregateFunction in an AggregateExpression as with any declared
    // SQL aggregate.
    e.injectFunction((FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(child) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(child)
        case Seq(child, items) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(child, items)
        case Seq(child, items, bits) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(child, items, bits)
        case _ => throw new IllegalArgumentException(
          "graft_bloom_agg(childHash[, expectedItems[, numBits]])")
      }))
    e.injectFunction((FunctionIdentifier("graft_bloom_might_contain"),
      info("graft_bloom_might_contain"),
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs.head, exprs(1))))
    // graft_cms_sketch(col, depth, width): Count-Min cell grid; depth
    // and width must be foldable integers (sketch geometry is part of
    // the aggregate's type, not data)
    e.injectFunction((FunctionIdentifier("graft_cms_sketch"),
      info("graft_cms_sketch"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3 && exprs(1).foldable && exprs(2).foldable,
          "graft_cms_sketch(col, depthLiteral, widthLiteral)")
        expressions.CountMinSketchAgg(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue,
          exprs(2).eval().asInstanceOf[Number].intValue)
      }))
    // graft_heavy_hitters(col, k): Misra-Gries frequent-items summary,
    // array<struct<key, lb>> with every key of count > N/(k+1)
    // guaranteed present; k must be a foldable integer (summary
    // capacity is part of the aggregate, not data)
    e.injectFunction((FunctionIdentifier("graft_heavy_hitters"),
      info("graft_heavy_hitters"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2 && exprs(1).foldable,
          "graft_heavy_hitters(col, kLiteral)")
        expressions.MisraGriesAgg(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue)
      }))
  }
}

/** Canonical session factory for the engine: UTC, AQE, right-sized
  * shuffle partitions, graft extensions pre-registered. */
object GraftSession {
  def builder(master: String = "local[*]",
      shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
}
