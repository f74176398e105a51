package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd cosine similarity over two `array<float>` columns — the
  * custom-Expression perf upgrade flagged optional in SURVEY §4.3 for the
  * E2 similarity operators.
  *
  * Why an Expression and not the `zip_with`+`aggregate` composition
  * (graft.ext.Similarity.cosine): the composed form materializes an
  * intermediate product array and walks the input three times (dot, |a|,
  * |b|); this node emits one fused loop accumulating all three sums, no
  * allocation, inside whole-stage codegen. Same formula, same traversal
  * order → bit-identical results to the composed version FOR equal-length
  * arrays with non-null elements (the embeddings contract, asserted in
  * CosineSimilaritySpec). Outside that contract the forms diverge by
  * design: the composition's `zip_with` null-pads unequal lengths and
  * propagates null elements to a NULL result, while this node truncates to
  * the shorter length and counts null elements as 0.
  *
  * Semantics: shorter array length wins (extra elements ignored); null
  * elements contribute 0; zero-norm input → NULL (undefined angle).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0 else x.getFloat(i).toDouble
      val yv = if (y.isNullAt(i)) 0.0 else y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.isNullAt($i) ? 0.0 : (double) $a.getFloat($i);
         |  double $yv = $b.isNullAt($i) ? 0.0 : (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |if ($nx == 0.0 || $ny == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Registration of graft's native expressions into a session's function
  * registry — after this, `cosine_sim(a, b)`, `simhash64(tokens)`,
  * `rolling_hash64(text)`, `shingles(text, n)` and the bounded top-k
  * aggregate `topk_pairs(ord, id, k)` are usable from SQL and `expr(...)`. */
object GraftFunctions {
  /** Literal-Int extraction shared by every width/bound argument below:
    * the value is part of the PLAN (it shapes the expression tree), not
    * data — one definition instead of four drift-prone copies. */
  private def literalInt(e: org.apache.spark.sql.catalyst.expressions.Expression,
                         usage: String, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _)
      if v.isValidInt => v.toInt
    case other => throw new IllegalArgumentException(
      s"$usage requires a literal integer (the $what is part of the " +
        s"plan, not data), got: ${other.sql}")
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => {
        require(exprs.length == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarity(exprs.head, exprs(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64",
      exprs => {
        require(exprs.length == 1, "simhash64 takes exactly 1 argument")
        SimHash64(exprs.head)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash64",
      exprs => {
        require(exprs.length == 1, "rolling_hash64 takes exactly 1 argument")
        RollingHash64(exprs.head)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      exprs => {
        require(exprs.length == 2, "minhash_sig takes (shingles, k)")
        MinHashSig(exprs.head,
          literalInt(exprs(1), "minhash_sig(shingles, k)", "signature width"))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_ngrams",
      exprs => {
        require(exprs.length == 2, "char_ngrams takes (text, n)")
        CharNgrams(exprs.head,
          literalInt(exprs(1), "char_ngrams(text, n)", "gram width"))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_pairs",
      exprs => {
        require(exprs.length == 3, "topk_pairs takes (ord, id, k)")
        TopKPairs(exprs.head, exprs(1),
          literalInt(exprs(2), "topk_pairs(ord, id, k)", "result bound"))
          .toAggregateExpression()
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      exprs => {
        require(exprs.length == 2, "bloom_might_contain takes (filter, key)")
        exprs.head match {
          case org.apache.spark.sql.catalyst.expressions.Literal(
              b: Array[Byte], org.apache.spark.sql.types.BinaryType) =>
            BloomMightContain(b, exprs(1))
          case other => throw new IllegalArgumentException(
            "bloom_might_contain(filter, key) requires a literal binary " +
              "filter (the pre-built bloom artifact is a plan constant, " +
              s"not data), got: ${other.sql}")
        }
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingles",
      exprs => {
        require(exprs.length == 2, "shingles takes (text, n)")
        Shingles(exprs.head,
          literalInt(exprs(1), "shingles(text, n)", "shingle width"))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize",
      exprs => {
        require(exprs.length == 1, "nfc_normalize takes exactly 1 argument")
        NfcNormalize(exprs.head)
      },
      "built-in")
  }
}
