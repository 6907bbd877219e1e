package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.graftbridge.Bridge.AbstractType

/** Custom Catalyst expressions (SURVEY §2.3 / §7.3). All implement
  * `doGenCode` as a static call into a JVM kernel so they stay inside
  * whole-stage codegen — no UDF/serialization overhead in the hot path.
  * At 100 TB these run per-row inside the generated loop, fused with the
  * surrounding projections/filters.
  */

/** fuzzywuzzy/difflib partial_ratio(left, right): Int 0..100.
  * Reference: /root/reference/src/Label_matching.py:47 dispatch with
  * fuzz.partial_ratio, difflib backend forced at labelling_pipeline.py:131. */
case class PartialRatio(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractType] = Seq(Bridge.asAbstract(StringType), Bridge.asAbstract(StringType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "partial_ratio"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringMetrics.partialRatio(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.StringMetrics.partialRatio($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** nltk-style Jaccard distance over character sets (NOT tokens).
  * Reference: /root/reference/src/Label_matching.py:45-46. */
case class JaccardCharDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractType] = Seq(Bridge.asAbstract(StringType), Bridge.asAbstract(StringType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaccard_char_distance"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringMetrics.jaccardCharDistance(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.StringMetrics.jaccardCharDistance($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Row-wise modal vote over array<int>; strict majority or -1 on tie.
  * Reference: /root/reference/src/labelling_pipeline.py:256-277 (F6) and
  * :478-510 (G2). */
case class ModalLabel(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractType] = Seq(Bridge.asAbstract(ArrayType(IntegerType)))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "modal_label"
  override protected def nullSafeEval(arr: Any): Any =
    VectorMath.modalLabel(arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.VectorMath.modalLabel($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature vector over a shingle array<string>: K affine minima
  * in one codegen'd pass (see MinHash for the bit-parity argument vs the
  * hex/conv column formulation the DuckDB oracle replays). Returns
  * array<long> of MinHash.K slots, or NULL for an empty/all-null input
  * (array_min-of-empty semantics per slot). */
case class MinHashSignatures(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractType] = Seq(Bridge.asAbstract(ArrayType(StringType)))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // empty input -> NULL array
  override def prettyName: String = "minhash_sigs"
  override protected def nullSafeEval(arr: Any): Any =
    MinHash.signatures(arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |${ev.value} = graft.expr.MinHash.signatures($a);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature vector straight from a raw text: fuses tokenization,
  * word-3-shingling and the K affine minima into one zero-allocation pass
  * over the string's bytes (see MinHash.signaturesFromText for the parity
  * argument vs minhash_sigs(shingles(text)), which DedupQueriesSpec pins).
  * Never null for a non-null input — there is always at least one shingle
  * (the whole text when shorter than 3 tokens). */
case class MinHashFromText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractType] = Seq(Bridge.asAbstract(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_text"
  override protected def nullSafeEval(s: Any): Any =
    MinHash.signaturesFromText(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.MinHash.signaturesFromText($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Cosine similarity between two dense vectors (array<float> or
  * array<double>): the kernel for similarity search / embedding dedup /
  * k-NN graph build (SURVEY §7 scale ops; E7 `print_sim` generalized). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractType] = Seq(
    Bridge.typeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    Bridge.typeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // Null on dimension mismatch (never a silent truncated/zero score): a
  // dim bug upstream must surface as NULL, not a plausible number.
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"
  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (left.dataType.asInstanceOf[ArrayType].elementType !=
             right.dataType.asInstanceOf[ArrayType].elementType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "cosine_sim requires both arrays to share an element type")
    else base
  }
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val bb = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (aa.numElements() != bb.numElements()) null
    else if (isFloat) VectorMath.cosineFloat(aa, bb) else VectorMath.cosineDouble(aa, bb)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "cosineFloat" else "cosineDouble"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.expr.VectorMath.$fn($a, $b);
         |}
       """.stripMargin)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dot product between two dense vectors (IVF/ANN scoring primitive). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractType] = Seq(
    Bridge.typeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    Bridge.typeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // Null on dimension mismatch — see CosineSimilarity.
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"
  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val bb = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (aa.numElements() != bb.numElements()) null
    else if (isFloat) VectorMath.dotFloat(aa, bb) else VectorMath.dotDouble(aa, bb)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "dotFloat" else "dotDouble"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.expr.VectorMath.$fn($a, $b);
         |}
       """.stripMargin)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
