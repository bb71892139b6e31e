package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** X177 primitive kernels: PQ encode and asymmetric (ADC) cosine as
  * codegen'd Catalyst expressions. The HOF formulation
  * (`aggregate(zip_with(...))` per subspace × centroid) is CodegenFallback
  * in Spark — interpreted lambda evaluation per element, ~µs per row per
  * sub-aggregate — while these stay inside whole-stage codegen with one
  * static call per row (the VecMath pattern). Codebooks ride along as a
  * plan REFERENCE OBJECT (`ctx.addReferenceObj`), not literal expression
  * trees, so the generated code and task binaries stay small no matter
  * how many centroids the codebook carries.
  *
  * Fixed-point contract (bit-identical to `KMeans.quantize`): elements
  * quantize as `floor(toDouble * 10000)` longs; distances/dots accumulate
  * in long (exact, order-independent); ties break on the LOWEST centroid
  * id — the same struct-least tie rule as the X111 assign.
  */
object PqMath {

  /** Nearest-centroid code per subspace; null on a NULL element. */
  def encode(v: ArrayData, books: Array[Array[Array[Long]]]): ArrayData = {
    val m = books.length
    val sd = books(0)(0).length
    if (v.numElements() != m * sd) return null
    val out = new Array[Byte](m)
    var i = 0
    while (i < m) {
      val book = books(i)
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var dsum = 0L
        var j = 0
        while (j < sd) {
          if (v.isNullAt(i * sd + j)) return null
          val q = math.floor(v.getFloat(i * sd + j).toDouble * 10000).toLong
          val d = q - cent(j)
          dsum += d * d
          j += 1
        }
        if (dsum < bestD) { bestD = dsum; best = c } // strict <: lowest cid wins ties
        c += 1
      }
      out(i) = best.toByte
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Asymmetric cosine of a raw query against a code's reconstruction. */
  def adcCosine(q: ArrayData, codes: ArrayData,
      books: Array[Array[Array[Long]]]): java.lang.Double = {
    val m = books.length
    val sd = books(0)(0).length
    if (q.numElements() != m * sd || codes.numElements() != m) return null
    var dot = 0L
    var rn2 = 0L
    var qn2 = 0L
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i)) return null
      val code = codes.getByte(i) & 0xff
      if (code >= books(i).length) return null
      val cent = books(i)(code)
      var j = 0
      while (j < sd) {
        if (q.isNullAt(i * sd + j)) return null
        val qj = math.floor(q.getFloat(i * sd + j).toDouble * 10000).toLong
        val cj = cent(j)
        dot += qj * cj
        rn2 += cj * cj
        qn2 += qj * qj
        j += 1
      }
      i += 1
    }
    dot.toDouble / math.sqrt(qn2.toDouble * rn2.toDouble)
  }
}

/** `pq_encode(array<float>) -> array<tinyint>` with the codebook as a
  * plan reference object.
  */
case class PqEncode(child: Expression, books: Array[Array[Array[Long]]])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    PqMath.encode(v.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val b = ctx.addReferenceObj("pqBooks", books, "long[][][]")
      val r = ctx.freshName("pqCodes")
      s"""org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.PqMath.encode($v, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `pq_adc_cosine(array<float>, array<tinyint>) -> double` — the
  * compressed-candidate score.
  */
case class PqAdcCosine(left: Expression, right: Expression,
    books: Array[Array[Array[Long]]]) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<tinyint>), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_cosine"
  override def nullable: Boolean = true

  override protected def nullSafeEval(q: Any, codes: Any): Any =
    PqMath.adcCosine(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val b = ctx.addReferenceObj("pqBooks", books, "long[][][]")
      val r = ctx.freshName("adcR")
      s"""java.lang.Double $r = graft.functions.PqMath.adcCosine($q, $c, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
