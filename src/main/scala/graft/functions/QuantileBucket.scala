package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Bucket index of a double against a FOLDABLE sorted boundary array:
  * the count of boundaries <= value (binary search, ties impossible —
  * the caller dedups). NaN lands in bucket 0 (it orders nowhere; a
  * constant bucket contributes no z-order bits but never corrupts —
  * the key only ORDERS rows).
  *
  * The skew-robust binning kernel behind `FormatOps.cluster`'s quantile
  * mode: uniform `width_bucket` divisions collapse on zipfian columns
  * (99% of rows land in one bucket → that column stops pruning), while
  * quantile boundaries put ~equal row mass in every bucket regardless
  * of the distribution. A native Catalyst expression with codegen so
  * the rewrite's key computation stays inside whole-stage codegen; the
  * boundary array is evaluated ONCE per operator (foldable right child)
  * and shared via a reference object, not re-materialized per row.
  */
case class QuantileBucket(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, ArrayType(DoubleType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (DoubleType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_bucket boundaries must be a literal array<double>")
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bucket requires (double, array<double>), got $other")
    }

  // folded once per operator; null elements are a caller bug (quantiles
  // of a non-empty scan are never null) and refuse loudly here rather
  // than binning garbage
  private lazy val bounds: Array[Double] = {
    val v = right.eval(null)
    require(v != null, "graft_bucket boundaries must not be NULL")
    v.asInstanceOf[ArrayData].toDoubleArray()
  }

  def bucketOf(v: Double): Long = {
    if (v.isNaN) return 0L
    // insertion point over distinct sorted bounds = count of bounds <= v
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  override def nullSafeEval(input: Any, ignoredBounds: Any): Any =
    java.lang.Long.valueOf(bucketOf(input.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qbucket", this, classOf[QuantileBucket].getName)
    nullSafeCodeGen(ctx, ev, (v, _) => s"${ev.value} = $ref.bucketOf($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantileBucket =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_bucket"
}

object QuantileBucket {
  /** Registry name: internal plumbing for `cluster(binning='quantile')`,
    * NOT a user-facing function — the double-underscore sentinel makes a
    * collision with a user temp function practically impossible, and
    * [[deregister]] removes it once the rewrite's plan is analyzed so
    * nothing leaks into the session afterwards. (Spark 4's Column no
    * longer exposes raw Expressions, so the registry is the only public
    * path from an Expression to a Column.) */
  val InternalName = "__graft_bucket_internal__"

  // register/deregister pairs are refcounted UNDER ONE LOCK: concurrent
  // cluster() calls share one session registry, and both an
  // unconditional drop AND a bare atomic counter leave a window where a
  // finisher observes count==0, a starter re-registers, and the
  // finisher's drop then yanks the function out from under the
  // starter's still-analyzing plan — count mutation and registry
  // mutation must be one atomic step
  private var registrations = 0

  /** Register the internal binning function. Idempotent; pairs with
    * [[deregister]]. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = synchronized {
    registrations += 1
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      InternalName, {
        case Seq(v, bounds) => QuantileBucket(v, bounds)
        case other => throw new IllegalArgumentException(
          s"graft_bucket expects (value, bounds), got ${other.size} argument(s)")
      }, "built-in")
  }

  /** Drop the internal registration once the LAST in-flight consumer is
    * done (analysis resolves the name eagerly inside the rewrite, so a
    * finished caller's plan no longer needs it). */
  def deregister(spark: org.apache.spark.sql.SparkSession): Unit = synchronized {
    registrations = math.max(0, registrations - 1)
    if (registrations == 0)
      spark.sessionState.functionRegistry.dropFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(InternalName))
  }

  /** Column-API entry: bucket(value, boundsLiteral); requires
    * register() first. Null values bucket to 0 via the outer coalesce
    * at the call site (BinaryExpression null-propagates). */
  def bucket(value: Column, bounds: Column): Column =
    org.apache.spark.sql.functions.call_function(InternalName, value, bounds)
}
