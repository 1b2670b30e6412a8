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

  /** Product-quantization codes: subspace m of the embedding (a contiguous
    * `dsub`-dim slice) is assigned to its nearest codeword in
    * `codebooks(m)` by squared Euclidean distance, first minimum wins —
    * the same argmin rule as [[nearestCenter]], applied per subspace in one
    * fused pass over the vector. Output: one code per subspace. */
  def pqCodes(emb: ArrayData, codebooks: Array[Array[Array[Double]]]): ArrayData = {
    val m = codebooks.length
    val dsub = if (m > 0) codebooks(0)(0).length else 0
    if (emb.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"PQ geometry $m×$dsub != embedding dim ${emb.numElements()}")
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val off = s * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val w = cb(c)
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val t = emb.getFloat(off + j) - w(j)
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  /** Residual-encoded PQ codes (the FAISS IVFADC layout): the vector is
    * first reduced to its coarse RESIDUAL r = x − center(cell) — float
    * element widened to double, then the double subtraction, so the
    * residual is exact — and the residual (not the raw vector) is assigned
    * per subspace by the same first-minimum argmin as [[pqCodes]].
    * Residuals of a well-trained coarse quantizer concentrate near the
    * origin with far less spread than the raw corpus, so the same code
    * budget quantizes them with lower distortion — the fidelity reason
    * every production IVF×PQ encodes residuals. The query side compensates
    * with a PER-(query, probed-cell) distance table over q − center(cell):
    * ‖q − x‖² = ‖(q − c) − r‖² exactly, so ADC over residual codes
    * approximates the same distance as ADC over raw codes, just with a
    * finer codebook grid. */
  def pqResidualCodes(emb: ArrayData, cell: Int, centers: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): ArrayData = {
    val m = codebooks.length
    val dsub = if (m > 0) codebooks(0)(0).length else 0
    if (emb.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"PQ geometry $m×$dsub != embedding dim ${emb.numElements()}")
    val ctr = centers(cell)
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val off = s * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val w = cb(c)
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val t = (emb.getFloat(off + j).toDouble - ctr(off + j)) - w(j)
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  /** Asymmetric-distance lookup: approximate squared L2 distance of a
    * PQ-coded vector to a query whose per-subspace distance table is
    * `dtab` (flattened `numSubspaces × k`, row-major). Sum order is
    * subspace 0..M-1, matching the DuckDB oracle's list order. */
  def adcDistance(codes: ArrayData, dtab: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    var d = 0.0
    var s = 0
    while (s < m) {
      d += dtab.getDouble(s * k + codes.getInt(s))
      s += 1
    }
    d
  }

  /** PER-SUBSPACE PQ reconstruction error of an embedding under the
    * codebooks: entry m is the squared L2 distance from subvector m to its
    * ASSIGNED (argmin) codeword — exactly the distortion [[pqCodes]]'s
    * encode accepts, in one fused pass (same first-minimum rule and
    * float→double element order, so each entry is bit-identical to what a
    * decode of the stored code would measure). This is the PQ index-health
    * signal: codebooks are frozen after training, so these errors RISE as
    * the ingested distribution drifts — the retrain trigger. Per-subspace
    * (not a fused total) so health rolls up in order-free integer micros
    * per subspace, the same cross-engine convention as the IVF per-cell
    * health table. */
  def pqReconErrs(emb: ArrayData,
      codebooks: Array[Array[Array[Double]]]): ArrayData = {
    val m = codebooks.length
    val dsub = if (m > 0) codebooks(0)(0).length else 0
    if (emb.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"PQ geometry $m×$dsub != embedding dim ${emb.numElements()}")
    val errs = new Array[Double](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val off = s * dsub
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val w = cb(c)
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val t = emb.getFloat(off + j) - w(j)
          d += t * t
          j += 1
        }
        if (d < bestD) bestD = d
        c += 1
      }
      errs(s) = bestD
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(errs)
  }

  /** [[pqReconErrs]] for the RESIDUAL tier: distortion of the coarse
    * residual x − center(cell) under the residual codebooks — the same
    * exact widen-then-subtract arithmetic as [[pqResidualCodes]], so each
    * entry is bit-identical to what a decode of the stored residual code
    * would measure. This is the residual index's health signal, and the
    * side-by-side with the raw tier's [[pqReconErrs]] is the registered
    * evidence that residual encoding buys fidelity at the same code
    * budget. */
  def pqResidualReconErrs(emb: ArrayData, cell: Int,
      centers: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): ArrayData = {
    val m = codebooks.length
    val dsub = if (m > 0) codebooks(0)(0).length else 0
    if (emb.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"PQ geometry $m×$dsub != embedding dim ${emb.numElements()}")
    val ctr = centers(cell)
    val errs = new Array[Double](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val off = s * dsub
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val w = cb(c)
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val t = (emb.getFloat(off + j).toDouble - ctr(off + j)) - w(j)
          d += t * t
          j += 1
        }
        if (d < bestD) bestD = d
        c += 1
      }
      errs(s) = bestD
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(errs)
  }

  /** Spark's `round(col, 6)` for doubles, callable per value: NaN/±Inf
    * pass through (the Catalyst Round guard), everything else takes the
    * same shortest-decimal HALF_UP path (`BigDecimal.valueOf` IS
    * `Double.toString`-based, exactly what Catalyst evaluates) — so a
    * hand-rolled scoring loop that must match a `round(...)`-ed plan can
    * round identically (PropertySpec pins equality against the plan form).
    * It is EXPENSIVE (a string format per call) — callers bound or
    * pre-filter before rounding. */
  def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Scalar (SQ8) quantization codes: dimension d of the embedding maps to
    * round((x_d − min_d)·scale_d) clamped to [0, 255] — one uniform 8-bit
    * grid per dimension. Math.round = half-up, deterministic; a constant
    * dimension (scale 0) encodes to 0 everywhere. */
  def sq8Codes(emb: ArrayData, mins: Array[Double],
      scales: Array[Double]): ArrayData = {
    if (emb.numElements() != mins.length)
      throw new IllegalArgumentException(
        s"SQ8 params dim ${mins.length} != embedding dim ${emb.numElements()}")
    val out = new Array[Any](mins.length)
    var i = 0
    while (i < mins.length) {
      val v = Math.round((emb.getFloat(i).toDouble - mins(i)) * scales(i))
      out(i) = Math.max(0L, Math.min(255L, v)).toInt
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Exact squared L2 distance between two int-code arrays as a Long —
    * pure integer arithmetic, so the compressed-domain ranking is
    * bit-identical in any engine (no float summation order to pin). */
  def intL2(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0L
    var i = 0
    while (i < n) {
      val t = (a.getInt(i) - b.getInt(i)).toLong
      d += t * t
      i += 1
    }
    d
  }

  /** The `nprobe` nearest centers by squared Euclidean distance, best
    * first, exact ties broken by LOWER center index — bit-identical to the
    * driver-side [[graft.operators.Similarity.probeCellsRanked]] (same
    * per-element double subtraction/accumulation order; repeated
    * strict-argmin selection reproduces a stable sort's tie order), so
    * in-plan probe-cell choice and the oracle's driver-side dump can never
    * disagree. */
  def probeCells(emb: ArrayData, centers: Array[Array[Double]],
      nprobe: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val m = centers.length
    val d = new Array[Double](m)
    var i = 0
    while (i < m) {
      val c = centers(i)
      var s = 0.0
      var j = 0
      while (j < c.length) {
        val t = emb.getFloat(j).toDouble - c(j)
        s += t * t
        j += 1
      }
      d(i) = s
      i += 1
    }
    val n = math.min(nprobe, m)
    val out = new Array[Int](n)
    val used = new Array[Boolean](m)
    var r = 0
    while (r < n) {
      // Double.compare, not `<`: the driver path's sortBy uses Scala
      // 2.13's TotalOrdering (NaN sorts LAST, never wins over a finite
      // distance), and a strict `<` argmin would leave best = -1 when
      // every remaining distance is NaN (a NaN query embedding) and
      // crash on used(-1); first-unused seeding reproduces the stable
      // sort's tie order for equal (incl. all-NaN) distances
      var best = -1
      var bd = 0.0
      var ii = 0
      while (ii < m) {
        if (!used(ii) &&
            (best == -1 || java.lang.Double.compare(d(ii), bd) < 0)) {
          bd = d(ii); best = ii
        }
        ii += 1
      }
      used(best) = true
      out(r) = best
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** TWO-LEVEL probe-cell choice (the FAISS-IMI shape in-plan): rank the
    * ncoarse super-centroids exactly, open the top `wCoarse`, then rank
    * only THEIR member cells and take `nprobe` — bit-identical to the
    * driver-side [[graft.operators.Similarity.probeCellsCoarseRanked]]
    * (same Double.compare repeated-argmin selection at both levels, which
    * reproduces the stable sort's tie order; the eligibility mask scans
    * cells in ascending index order, matching the driver's
    * filter-then-stable-sort). Centroids examined per row drop from nlist
    * to ncoarse + wCoarse·(nlist/ncoarse) — the reduction that keeps the
    * SERVING probe viable at nlist ~10⁶. Returns only eligible cells:
    * fewer than nprobe when the opened super-cells hold fewer members. */
  def probeCellsCoarse(emb: ArrayData, coarseCenters: Array[Array[Double]],
      cellToCoarse: Array[Int], centers: Array[Array[Double]],
      nprobe: Int, wCoarse: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val nc = coarseCenters.length
    def l2(w: Array[Double]): Double = {
      var s = 0.0
      var j = 0
      while (j < w.length) {
        val t = emb.getFloat(j).toDouble - w(j)
        s += t * t
        j += 1
      }
      s
    }
    // level 1: exact rank over the coarse centroids, open the top wCoarse
    val dc = new Array[Double](nc)
    var i = 0
    while (i < nc) { dc(i) = l2(coarseCenters(i)); i += 1 }
    val open = new Array[Boolean](nc)
    val w1 = math.min(wCoarse, nc)
    var r = 0
    while (r < w1) {
      var best = -1
      var bd = 0.0
      var ii = 0
      while (ii < nc) {
        if (!open(ii) &&
            (best == -1 || java.lang.Double.compare(dc(ii), bd) < 0)) {
          bd = dc(ii); best = ii
        }
        ii += 1
      }
      open(best) = true
      r += 1
    }
    // level 2: exact rank over ONLY the opened super-cells' member cells
    val m = centers.length
    val d = new Array[Double](m)
    val eligible = new Array[Boolean](m)
    var nEligible = 0
    i = 0
    while (i < m) {
      if (open(cellToCoarse(i))) {
        eligible(i) = true
        nEligible += 1
        d(i) = l2(centers(i))
      }
      i += 1
    }
    val n = math.min(nprobe, nEligible)
    val out = new Array[Int](n)
    val used = new Array[Boolean](m)
    r = 0
    while (r < n) {
      var best = -1
      var bd = 0.0
      var ii = 0
      while (ii < m) {
        if (eligible(ii) && !used(ii) &&
            (best == -1 || java.lang.Double.compare(d(ii), bd) < 0)) {
          bd = d(ii); best = ii
        }
        ii += 1
      }
      used(best) = true
      out(r) = best
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
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

/** The `nprobe` nearest coarse centroids of an `array<float>` embedding,
  * best first (squared-Euclidean; exact ties → lower cell index) — the
  * IN-PLAN form of [[graft.operators.Similarity.probeCellsRanked]]'s
  * driver-side probe choice, bit-identical by construction
  * ([[VectorHashImpl.probeCells]]). The serving loop uses it to choose
  * probe cells WITHOUT collecting query embeddings to the driver: the
  * centroid matrix rides along as a codegen reference and each query row
  * picks its cells inside whole-stage codegen. */
case class ProbeCellsExpr(child: Expression, centers: Array[Array[Double]],
    nprobe: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.IntegerType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    VectorHashImpl.probeCells(input.asInstanceOf[ArrayData], centers, nprobe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centers", centers, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorHashImpl.probeCells($c, $ref, $nprobe);")
  }
  override protected def withNewChildInternal(c: Expression): ProbeCellsExpr =
    copy(child = c)
}

/** The TWO-LEVEL (coarse-quantized) probe-cell choice of an `array<float>`
  * embedding, best first — the IN-PLAN form of [[graft.operators
  * .Similarity.probeCellsCoarseRanked]], bit-identical by construction
  * ([[VectorHashImpl.probeCellsCoarse]]). This is what keeps the SERVING
  * probe viable at the 100 TB geometry: [[ProbeCellsExpr]] ranks every
  * one of nlist centroids per query row, which at nlist ~10⁶ makes the
  * centroid scan itself the probe bottleneck; here each row ranks
  * ncoarse + wCoarse·(nlist/ncoarse) centroids instead (~9k at
  * nlist=10⁶/ncoarse=1024/w=8). The super-centroid matrix and the cell→
  * super-cell assignment ride along as codegen references, loaded from
  * the index's persisted `coarse/` medium at prepare time. */
case class ProbeCellsCoarseExpr(child: Expression,
    coarseCenters: Array[Array[Double]], cellToCoarse: Array[Int],
    centers: Array[Array[Double]], nprobe: Int, wCoarse: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.IntegerType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    VectorHashImpl.probeCellsCoarse(input.asInstanceOf[ArrayData],
      coarseCenters, cellToCoarse, centers, nprobe, wCoarse)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cc = ctx.addReferenceObj("coarseCenters", coarseCenters, "double[][]")
    val c2c = ctx.addReferenceObj("cellToCoarse", cellToCoarse, "int[]")
    val ref = ctx.addReferenceObj("centers", centers, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorHashImpl.probeCellsCoarse(" +
        s"$c, $cc, $c2c, $ref, $nprobe, $wCoarse);")
  }
  override protected def withNewChildInternal(c: Expression)
      : ProbeCellsCoarseExpr = copy(child = c)
}

/** Squared Euclidean distance of two `array<float>` columns in double
  * precision, left-to-right summation — the exact-rerank metric of
  * [[graft.operators.Pq]] (same fused-loop rationale as
  * [[CosineSimilarity]]; the rerank frame is shortlist-sized, but the
  * expression also serves full-corpus exact scans). */
case class L2DistanceSq(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var d = 0.0
    var i = 0
    while (i < n) {
      val t = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      d += t * t
      i += 1
    }
    d
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $d = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $t = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $d += $t * $t;
         |}
         |${ev.value} = $d;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2DistanceSq =
    copy(left = newLeft, right = newRight)
}

/** Product-quantization encode of an `array<float>` embedding: one nearest-
  * codeword index per contiguous subspace (see [[VectorHashImpl.pqCodes]]).
  * The codebook tensor rides along as a codegen reference object, so a
  * 100 TB corpus encodes inside whole-stage codegen with no per-row boxing —
  * the output is `numSubspaces` small ints per vector (byte-packable at the
  * storage layer) versus `dim` floats, the ~32× scan-byte reduction that
  * makes an exhaustive ADC sweep of a petabyte-scale embedding store
  * feasible. */
case class PqCodesExpr(child: Expression,
    codebooks: Array[Array[Array[Double]]]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.IntegerType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    VectorHashImpl.pqCodes(input.asInstanceOf[ArrayData], codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorHashImpl.pqCodes($c, $ref);")
  }
  override protected def withNewChildInternal(c: Expression): PqCodesExpr =
    copy(child = c)
}

/** Residual-encoded PQ codes of an (`array<float>` embedding, `int` cell)
  * pair — the FAISS IVFADC encode ([[VectorHashImpl.pqResidualCodes]]): the
  * coarse-centroid tensor AND the residual codebooks ride along as codegen
  * reference objects, so the subtract-then-assign is ONE fused pass inside
  * whole-stage codegen with no residual array ever materialized as a
  * column. Same scan-byte economics as [[PqCodesExpr]]; strictly lower
  * quantization distortion at the same code budget. */
case class PqResidualCodesExpr(left: Expression, right: Expression,
    centers: Array[Array[Double]],
    codebooks: Array[Array[Array[Double]]]) extends BinaryExpression {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullSafeEval(emb: Any, cell: Any): Any =
    VectorHashImpl.pqResidualCodes(emb.asInstanceOf[ArrayData],
      cell.asInstanceOf[Int], centers, codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cref = ctx.addReferenceObj("centers", centers, "double[][]")
    val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, (e, c) =>
      s"${ev.value} = graft.functions.VectorHashImpl.pqResidualCodes($e, $c, $cref, $ref);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqResidualCodesExpr =
    copy(left = newLeft, right = newRight)
}

/** Per-subspace reconstruction errors of the coarse RESIDUAL under the
  * residual codebooks ([[VectorHashImpl.pqResidualReconErrs]]) — the
  * residual tier's health probe, one fused pass, no residual or codes
  * column materialized. */
case class PqResidualReconErrExpr(left: Expression, right: Expression,
    centers: Array[Array[Double]],
    codebooks: Array[Array[Array[Double]]]) extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(emb: Any, cell: Any): Any =
    VectorHashImpl.pqResidualReconErrs(emb.asInstanceOf[ArrayData],
      cell.asInstanceOf[Int], centers, codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cref = ctx.addReferenceObj("centers", centers, "double[][]")
    val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, (e, c) =>
      s"${ev.value} = graft.functions.VectorHashImpl.pqResidualReconErrs($e, $c, $cref, $ref);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqResidualReconErrExpr =
    copy(left = newLeft, right = newRight)
}

/** Asymmetric-distance (ADC) scoring of PQ codes against a query's
  * flattened per-subspace distance table: M table lookups replace a
  * dim-length float loop per comparison — the probe-side win that pairs
  * with [[PqCodesExpr]]'s scan-side compression. */
case class PqAdcExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(codes: Any, dtab: Any): Any =
    VectorHashImpl.adcDistance(
      codes.asInstanceOf[ArrayData], dtab.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, d) =>
      s"${ev.value} = graft.functions.VectorHashImpl.adcDistance($c, $d, $k);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}

/** Per-subspace PQ reconstruction errors of an `array<float>` embedding
  * under the codebook tensor (codegen reference object) — the PQ
  * index-health probe ([[VectorHashImpl.pqReconErrs]]): one fused
  * argmin-and-accumulate pass, no codes materialized. */
case class PqReconErrExpr(child: Expression,
    codebooks: Array[Array[Array[Double]]]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    VectorHashImpl.pqReconErrs(input.asInstanceOf[ArrayData], codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorHashImpl.pqReconErrs($c, $ref);")
  }
  override protected def withNewChildInternal(c: Expression): PqReconErrExpr =
    copy(child = c)
}

/** Scalar-quantization (SQ8) encode of an `array<float>` embedding: one
  * 8-bit code per DIMENSION on a per-dim uniform grid — the 4× scan-byte
  * compression tier below [[PqCodesExpr]]'s ~32× (coarser codes, but the
  * compressed-domain distance needs no per-query table and is EXACT integer
  * arithmetic). The per-dim min/scale vectors ride as codegen references. */
case class Sq8EncodeExpr(child: Expression, mins: Array[Double],
    scales: Array[Double]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.IntegerType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    VectorHashImpl.sq8Codes(input.asInstanceOf[ArrayData], mins, scales)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mref = ctx.addReferenceObj("mins", mins, "double[]")
    val sref = ctx.addReferenceObj("scales", scales, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorHashImpl.sq8Codes($c, $mref, $sref);")
  }
  override protected def withNewChildInternal(c: Expression): Sq8EncodeExpr =
    copy(child = c)
}

/** Exact integer squared-L2 between two SQ8 code arrays (Long) — the
  * compressed-domain ranking metric of [[graft.operators.Sq]]; being pure
  * integer math it is engine-order-exact with no rounding pin needed. */
case class IntL2Expr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorHashImpl.intL2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorHashImpl.intL2($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntL2Expr =
    copy(left = newLeft, right = newRight)
}

/** Fixed-capacity best-first buffer of (score, id) pairs — the aggregation
  * state of [[TopKScoredAgg]]. Order: score DESC, id ASC; a tie with the
  * incumbent loses (an equal entry yields the identical output row, so the
  * result is insertion-order independent). Arrays, not objects: one buffer
  * per group lives for millions of updates. */
final class TopKScoredBuf(val k: Int, val asc: Boolean = false) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  // Spark's window ORDER BY compares doubles via SQLOrderingUtil
  // .compareDoubles: primitive == first (so -0.0 EQUALS 0.0 and the tie
  // falls to the id), java.lang.Double.compare only past that (so NaN
  // still ranks above every value and equal to itself). Mirroring both
  // branches keeps the buffer's total order identical to the window
  // form's even on degenerate scores (±0.0, or NaN from a zero-norm
  // embedding's cosine), keeping stream ≡ batch. `asc` flips the score
  // direction only (distances — the ADC path): NaN then ranks LAST,
  // exactly like a window's ORDER BY score ASC under nanSafe ordering.
  private def beats(s: Double, id: Long, i: Int): Boolean = {
    val raw =
      if (s == scores(i)) 0 else java.lang.Double.compare(s, scores(i))
    val c = if (asc) -raw else raw
    c > 0 || (c == 0 && id < ids(i))
  }

  def insert(s: Double, id: Long): Unit = {
    if (n == k && !beats(s, id, k - 1)) return // O(1) reject once saturated
    var pos = 0
    while (pos < n && !beats(s, id, pos)) pos += 1
    if (pos >= k) return
    val last = math.min(n, k - 1)
    var i = last
    while (i > pos) {
      scores(i) = scores(i - 1); ids(i) = ids(i - 1); i -= 1
    }
    scores(pos) = s
    ids(pos) = id
    if (n < k) n += 1
  }

  def mergeFrom(o: TopKScoredBuf): Unit = {
    var i = 0
    while (i < o.n) { insert(o.scores(i), o.ids(i)); i += 1 }
  }
}

/** Native mergeable bounded top-k by (score DESC, id ASC) — the
  * PARTIAL-AGGREGATE form of [[graft.operators.Similarity]]'s salted-window
  * ranking, for the ANN SERVING loop: a probe batch scores
  * |queries| × nprobe × |cell| candidate rows per trigger, and the window
  * form must sort-exchange every one of them; this aggregate folds each
  * candidate into a k-slot buffer inside the scoring stage (map-side
  * partial), so the shuffle carries O(queries × tasks) bounded states.
  * Identical rows to `row_number() OVER (ORDER BY score DESC, id)` ≤ k —
  * same total order, and duplicate (score, id) pairs rank as separate rows
  * exactly like row_number (AnnStreamSpec pins stream-vs-batch equality).
  *
  * Why a TypedImperativeAggregate and not a typed `Aggregator`+`udaf`: the
  * ScalaAggregator path pays an encoder round-trip per input row (measured
  * ~2.5 s per 10 M-candidate probe batch — slower than the window it was
  * meant to replace); this operates on the unsafe row directly, ~zero
  * allocation per update. The comparator mirrors Spark's own
  * `SQLOrderingUtil.compareDoubles` (primitive `==` first, so ±0.0 tie
  * to the id; `Double.compare` past that, so NaN ranks top) — degenerate
  * scores rank identically to the window form. */
case class TopKScoredAgg(score: Expression, id: Expression, k: Int,
    asc: Boolean = false,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[TopKScoredBuf] {
  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cosine", DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKScoredBuf =
    new TopKScoredBuf(k, asc)

  override def update(buf: TopKScoredBuf,
      input: org.apache.spark.sql.catalyst.InternalRow): TopKScoredBuf = {
    val s = score.eval(input)
    if (s != null) {
      val i = id.eval(input)
      if (i != null) buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKScoredBuf, other: TopKScoredBuf): TopKScoredBuf = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKScoredBuf): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.tabulate[Any](buf.n)(i =>
        org.apache.spark.sql.catalyst.InternalRow(buf.scores(i), buf.ids(i))))

  override def serialize(buf: TopKScoredBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 16 * buf.n)
    bb.putInt(buf.k).putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)).putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKScoredBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    // direction comes from THIS aggregate instance, not the wire — a
    // buffer only ever round-trips within the aggregate that wrote it
    val buf = new TopKScoredBuf(bb.getInt(), asc)
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      buf.scores(i) = bb.getDouble(); buf.ids(i) = bb.getLong(); i += 1
    }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKScoredAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKScoredAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKScoredAgg =
    copy(score = newChildren(0), id = newChildren(1))
}

object VectorExpressions {
  /** Column wrapper: cosine similarity of two `array<float>` columns. */
  def cosineSim(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      CosineSimilarity(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Column wrapper: bounded top-k of (score, id) pairs per group —
    * `array<struct<cosine, vec_id>>` best-first (`asc = true` for
    * distance scores — best = smallest, NaN last). */
  def topKScored(score: Column, id: Column, k: Int,
      asc: Boolean = false): Column =
    GraftSqlBridge.column(
      TopKScoredAgg(GraftSqlBridge.expression(score),
        GraftSqlBridge.expression(id), k, asc).toAggregateExpression())

  /** Column wrapper: sign-LSH band keys of an `array<float>` column. */
  def signLshBands(emb: Column, planes: Array[Array[Double]],
      rowsPerBand: Int): Column =
    GraftSqlBridge.column(
      SignLshBandsExpr(GraftSqlBridge.expression(emb), planes, rowsPerBand))

  /** Column wrapper: nearest-centroid cell id of an `array<float>` column. */
  def nearestCenter(emb: Column, centers: Array[Array[Double]]): Column =
    GraftSqlBridge.column(
      NearestCenterExpr(GraftSqlBridge.expression(emb), centers))

  /** Column wrapper: the nprobe nearest cells of an `array<float>` column,
    * best first. */
  def probeCells(emb: Column, centers: Array[Array[Double]],
      nprobe: Int): Column =
    GraftSqlBridge.column(
      ProbeCellsExpr(GraftSqlBridge.expression(emb), centers, nprobe))

  /** Column wrapper: the two-level (coarse-quantized) probe-cell choice of
    * an `array<float>` column, best first. */
  def probeCellsCoarse(emb: Column, coarseCenters: Array[Array[Double]],
      cellToCoarse: Array[Int], centers: Array[Array[Double]],
      nprobe: Int, wCoarse: Int): Column =
    GraftSqlBridge.column(
      ProbeCellsCoarseExpr(GraftSqlBridge.expression(emb), coarseCenters,
        cellToCoarse, centers, nprobe, wCoarse))

  /** Column wrapper: squared L2 distance of two `array<float>` columns. */
  def l2Sq(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      L2DistanceSq(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Column wrapper: PQ codes of an `array<float>` column. */
  def pqCodes(emb: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftSqlBridge.column(
      PqCodesExpr(GraftSqlBridge.expression(emb), codebooks))

  /** Column wrapper: residual-encoded PQ codes of an (`array<float>`
    * embedding, `int` cell) column pair under the coarse-centroid and
    * residual-codebook tensors. */
  def pqResidualCodes(emb: Column, cell: Column,
      centers: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): Column =
    GraftSqlBridge.column(
      PqResidualCodesExpr(GraftSqlBridge.expression(emb),
        GraftSqlBridge.expression(cell), centers, codebooks))

  /** Column wrapper: per-subspace residual reconstruction errors of an
    * (`array<float>` embedding, `int` cell) column pair. */
  def pqResidualReconErrs(emb: Column, cell: Column,
      centers: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): Column =
    GraftSqlBridge.column(
      PqResidualReconErrExpr(GraftSqlBridge.expression(emb),
        GraftSqlBridge.expression(cell), centers, codebooks))

  /** Column wrapper: per-subspace PQ reconstruction errors of an
    * `array<float>` embedding column under the codebook tensor. */
  def pqReconErrs(emb: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftSqlBridge.column(
      PqReconErrExpr(GraftSqlBridge.expression(emb), codebooks))

  /** Column wrapper: ADC distance of a codes column against a per-query
    * distance-table column (flattened M×k). */
  def pqAdc(codes: Column, dtab: Column, k: Int): Column =
    GraftSqlBridge.column(
      PqAdcExpr(GraftSqlBridge.expression(codes),
        GraftSqlBridge.expression(dtab), k))

  /** Column wrapper: SQ8 codes of an `array<float>` column. */
  def sq8Codes(emb: Column, mins: Array[Double],
      scales: Array[Double]): Column =
    GraftSqlBridge.column(
      Sq8EncodeExpr(GraftSqlBridge.expression(emb), mins, scales))

  /** Column wrapper: exact integer squared-L2 of two code columns. */
  def intL2(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      IntL2Expr(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
