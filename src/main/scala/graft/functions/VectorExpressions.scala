package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the embedding hot path.
  *
  * Why not `zip_with` + `aggregate`: Spark's higher-order functions extend
  * CodegenFallback — they are INTERPRETED, allocating a lambda-variable
  * binding per element, and they sit in every similarity comparison (corpus ×
  * queries of them). This expression generates a tight primitive loop inside
  * whole-stage codegen: one pass, three accumulators, zero allocation.
  * This is exactly the "custom Expression beats built-ins" case of
  * SURVEY.md §7.3 — semantics the built-ins express but cannot execute
  * efficiently.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  // sum order is fixed left-to-right, matching the zip_with/aggregate form
  // and DuckDB's list_cosine_similarity after 6-dp rounding
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (Math.sqrt($nx) * Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Static impl for [[SignLshBandsExpr]] — one pass over the embedding per
  * band bit, branch-free inner loops, no per-row boxing. */
object VectorHashImpl {
  def signLshBands(emb: ArrayData, planes: Array[Array[Double]],
      rowsPerBand: Int): ArrayData = {
    val numBands = planes.length / rowsPerBand
    // fail fast on a dim mismatch: silently truncating the dot product to
    // min(len) would degrade candidate recall with no error while the
    // exact-cosine verify uses full vectors (ADVICE r3)
    if (planes.length > 0 && emb.numElements() != planes(0).length)
      throw new IllegalArgumentException(
        s"sign-LSH plane dim ${planes(0).length} != embedding dim ${emb.numElements()}; " +
          "pass dim matching the embedding column")
    val keys = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var key = 0L
      var r = 0
      while (r < rowsPerBand) {
        val p = planes(b * rowsPerBand + r)
        var d = 0.0
        var j = 0
        val n = p.length
        while (j < n) { d += emb.getFloat(j) * p(j); j += 1 }
        if (d >= 0) key |= (1L << r)
        r += 1
      }
      keys(b) = key
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }

  /** Index of the nearest center by squared Euclidean distance (first
    * minimum wins on exact ties — the same rule as MLlib K-Means
    * assignment, so [[NearestCenterExpr]] reproduces the quantizer's own
    * cell assignment). */
  def nearestCenter(emb: ArrayData, centers: Array[Array[Double]]): Int = {
    if (centers.length > 0 && emb.numElements() != centers(0).length)
      throw new IllegalArgumentException(
        s"center dim ${centers(0).length} != embedding dim ${emb.numElements()}")
    var best = 0
    var bestD = Double.MaxValue
    var i = 0
    while (i < centers.length) {
      val c = centers(i)
      var d = 0.0
      var j = 0
      while (j < c.length) {
        val t = emb.getFloat(j) - c(j)
        d += t * t
        j += 1
      }
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }
}

/** Random-hyperplane (sign-LSH) band keys of an `array<float>` embedding:
  * bit r of band b is the sign of the dot product with plane b·rows+r,
  * packed to one Long per band (band index = array position). The plane
  * matrix rides along as a codegen reference object — a Scala UDF here
  * deserializes every row's array into a boxed Seq; this stays on the
  * unsafe array data inside whole-stage codegen.
  */
case class SignLshBandsExpr(child: Expression, planes: Array[Array[Double]],
    rowsPerBand: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    VectorHashImpl.signLshBands(input.asInstanceOf[ArrayData], planes, rowsPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorHashImpl.signLshBands($c, $ref, $rowsPerBand);")
  }
  override protected def withNewChildInternal(c: Expression): SignLshBandsExpr =
    copy(child = c)
}

/** Nearest coarse centroid of an `array<float>` embedding (squared
  * Euclidean argmin; ties keep the first center, matching MLlib K-Means) —
  * the add-after-train assignment of [[graft.operators.Similarity]]'s IVF
  * append path. The centroid matrix rides along as a codegen reference, so
  * a batch of new vectors assigns inside whole-stage codegen with no per-row
  * boxing and no K-Means model object needed at append time. */
case class NearestCenterExpr(child: Expression, centers: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override protected def nullSafeEval(input: Any): Any =
    VectorHashImpl.nearestCenter(input.asInstanceOf[ArrayData], centers)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centers", centers, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorHashImpl.nearestCenter($c, $ref);")
  }
  override protected def withNewChildInternal(c: Expression): NearestCenterExpr =
    copy(child = c)
}

object VectorExpressions {
  /** Column wrapper: cosine similarity of two `array<float>` columns. */
  def cosineSim(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      CosineSimilarity(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Column wrapper: sign-LSH band keys of an `array<float>` column. */
  def signLshBands(emb: Column, planes: Array[Array[Double]],
      rowsPerBand: Int): Column =
    GraftSqlBridge.column(
      SignLshBandsExpr(GraftSqlBridge.expression(emb), planes, rowsPerBand))

  /** Column wrapper: nearest-centroid cell id of an `array<float>` column. */
  def nearestCenter(emb: Column, centers: Array[Array[Double]]): Column =
    GraftSqlBridge.column(
      NearestCenterExpr(GraftSqlBridge.expression(emb), centers))
}
