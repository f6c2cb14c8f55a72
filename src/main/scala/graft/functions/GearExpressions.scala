package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused gear rolling-hash boundary detection — the native `Expression`
  * that discharges the q109 scale note ("at 100 TB the md5 gram hash
  * swaps for a gear/rolling Expression with the same plan shape"):
  * content-defined chunk boundaries computed in ONE pass over the
  * string, inside whole-stage codegen, with no per-position explode,
  * no md5 over sliding substrings, and no intermediate arrays.
  *
  * Definition (deliberately SQL-restatable, so the q153 oracle can
  * recompute it as an 8-lag window sum):
  *
  *   g(c)  = first 48 bits of md5(decimal string of (codepoint(c) % 256))
  *   h(i)  = Σ_{k=0..7} g(char_{i−k}) · 2^k          (full windows only)
  *   boundary at i  ⇔  i ≥ 8  ∧  h(i) % 64 == 0
  *
  * positions are 1-based CODEPOINTS (matching DuckDB's character
  * semantics — surrogate pairs count once). The 256-entry g-table is
  * computed once at class load from the same md5 the oracle calls, so
  * the two engines agree by construction; h < 2^56, no masking needed.
  */
object GearHash {
  private val Window = 8
  private val BoundaryMask = 64L

  /** g-table: md5-derived 48-bit values, index = codepoint % 256. */
  val GTable: Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 256).map { i =>
      md.reset()
      val hex = md.digest(i.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 12), 16)
    }.toArray
  }

  /** One-pass boundary scan; called from both interpreted eval and the
    * generated code (static forwarder — keeps the logic single-source
    * while the call stays inside whole-stage codegen). */
  def compute(u: UTF8String): ArrayData = {
    val s = u.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val ring = new Array[Long](Window)
    var pos = 0
    var off = 0
    while (off < s.length) {
      val cp = s.codePointAt(off)
      off += Character.charCount(cp)
      pos += 1
      ring(pos % Window) = GTable(cp % 256)
      if (pos >= Window) {
        var h = 0L
        var k = 0
        while (k < Window) {
          h += ring((pos - k) % Window) << k
          k += 1
        }
        if (h % BoundaryMask == 0L) out += pos.toLong
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** graft_gear_boundaries(text) → ARRAY<BIGINT> of 1-based codepoint
  * positions where the trailing 8-char gear hash hits the boundary
  * pattern. Null string → null array. */
case class GearBoundaries(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gear_boundaries"
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    GearHash.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GearHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): GearBoundaries =
    copy(child = newChild)
}

object GearFunctions {
  /** Idempotent session registration (VectorFunctions convention). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_gear_boundaries", es => GearBoundaries(es.head), "built-in")

  def gearBoundaries(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("graft_gear_boundaries", c)

  /** [[graft.functions.GraftExtensions]] hook. */
  private[functions] def inject(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier("graft_gear_boundaries"),
      new ExpressionInfo(classOf[GearBoundaries].getName, "graft_gear_boundaries"),
      (es: Seq[Expression]) => GearBoundaries(es.head)))
}
