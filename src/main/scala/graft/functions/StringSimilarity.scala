package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a native codegen'd `Expression` — the
  * engine's third custom expression family (after the vector dot
  * product and the gear rolling hash), built for the fuzzy-linkage
  * tier of entity resolution (q159): Spark ships Levenshtein and
  * soundex but no Jaro–Winkler, while record-linkage practice (and
  * DuckDB, which exposes `jaro_winkler_similarity` natively) leans on
  * it for short name-like strings because transposition tolerance and
  * the common-prefix boost match how human-entered names actually
  * diverge.
  *
  * Semantics are pinned BIT-FOR-BIT to DuckDB's native function (the
  * q159 oracle calls it directly — a genuine cross-engine check of a
  * nontrivial double-valued kernel, verified on the edge cases):
  *
  *   - either side empty → 0.0 (DuckDB returns 0 even for ''..'');
  *   - match window = max(0, ⌊max(|a|,|b|)/2⌋ − 1) — the max(0,·)
  *     clamp is what makes 1-char equal strings similarity 1.0;
  *   - jaro = (m/|a| + m/|b| + (m−t)/m) / 3, 0.0 when m = 0;
  *   - Winkler boost only when jaro > 0.7: j + ℓp·0.1·(1−j) with ℓp =
  *     common prefix capped at 4 — same FP evaluation order as DuckDB,
  *     so the doubles agree exactly, not approximately.
  *
  * Positions are Unicode CODEPOINTS (surrogate pairs count once),
  * matching DuckDB's character semantics. O(|a|·window) time, two
  * small scratch arrays, no allocation beyond the codepoint buffers;
  * the static forwarder keeps the kernel inside whole-stage codegen. */
object StringSim {

  /** Shared by interpreted eval and generated code. */
  def jaroWinkler(u1: UTF8String, u2: UTF8String): Double = {
    val s1 = codepoints(u1)
    val s2 = codepoints(u2)
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2, i + window + 1)
      var j = math.max(0, i - window)
      var matched = false
      while (j < hi && !matched) {
        if (!m2(j) && s2(j) == s1(i)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    val tr = t / 2
    val j0 = (m.toDouble / l1 + m.toDouble / l2 + (m - tr).toDouble / m) / 3
    if (j0 > 0.7) {
      val maxP = math.min(4, math.min(l1, l2))
      var p = 0
      while (p < maxP && s1(p) == s2(p)) p += 1
      j0 + p * 0.1 * (1 - j0)
    } else j0
  }

  private def codepoints(u: UTF8String): Array[Int] = {
    val s = u.toString
    val out = new Array[Int](s.codePointCount(0, s.length))
    var off = 0
    var i = 0
    while (off < s.length) {
      val cp = s.codePointAt(off)
      out(i) = cp
      i += 1
      off += Character.charCount(cp)
    }
    out
  }
}

/** graft_jaro_winkler(a, b) → DOUBLE in [0, 1]. Null if either side
  * is null. */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (STRING, STRING), got (${a.simpleString}, ${b.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c1, c2) => s"graft.functions.StringSim.jaroWinkler($c1, $c2)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object StringSimFunctions {
  /** Idempotent session registration (VectorFunctions convention). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaro_winkler", es => JaroWinkler(es.head, es(1)), "built-in")

  def jaroWinkler(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("graft_jaro_winkler", a, b)

  /** [[graft.functions.GraftExtensions]] hook. */
  private[functions] def inject(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (es: Seq[Expression]) => JaroWinkler(es.head, es(1))))
}
