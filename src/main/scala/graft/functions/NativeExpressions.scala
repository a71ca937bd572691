package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hot paths — the
  * "custom Expression with doGenCode beats a Scala UDF beats anything else"
  * rung of the extension ladder (SURVEY.md §7.3). Both participate in
  * whole-stage codegen: the generated Java is a tight primitive loop with
  * no lambda dispatch, no per-element boxing and no intermediate arrays,
  * unlike the equivalent `transform`/`aggregate` higher-order-function
  * chains they replace.
  *
  * Both are bit-compatible with their HOF + DuckDB oracle twins (the
  * TextQueries/VectorQueries fold definitions), which the driver's
  * correctness gate re-proves every round.
  */

/** poly_hash(str, base, mod): left fold h = (h*base + byte) % mod over the
  * UTF-8 bytes. Matches the ascii()-codepoint fold for ASCII inputs — the
  * engine's normalizers strip to [a-z0-9 ] first, so inputs are ASCII. */
case class PolyHash(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    var h = 0L
    var i = 0
    val n = s.numBytes()
    while (i < n) {
      h = (h * base + (s.getByte(i) & 0xff)) % mod
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      s"""
         |long $h = 0L;
         |int $n = $c.numBytes();
         |for (int $i = 0; $i < $n; $i++) {
         |  $h = ($h * ${base}L + ($c.getByte($i) & 0xff)) % ${mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)

  override def prettyName: String = "graft_poly_hash"
}

/** dot_product(a, b): sequential left-fold dot product over two double
  * arrays — same IEEE op order as `aggregate(zip_with(a,b,*), 0d, +)` and
  * the DuckDB list_reduce mirror, so results are bit-identical. Array
  * elements must be non-null; lengths are taken from the shorter side. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc = acc + x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc = $acc + $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** Session registration for the native expressions — callable from SQL and
  * from the DataFrame API via `call_function`. Usable either through
  * [[GraftExtensions]] (spark.sql.extensions=graft.functions.GraftExtensions)
  * or an explicit [[GraftFunctions.register]] on an existing session. */
object GraftFunctions {

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Long, LongType) => v
    case Literal(v: Int, IntegerType) => v.toLong
    case other => throw new IllegalArgumentException(
      s"graft_poly_hash $what must be an integer literal, got $other")
  }

  // type coercion happens in the builder (AbstractDataType/ExpectsInputTypes
  // are private[sql] in Spark 4, so the expressions can't declare inputTypes;
  // a Cast to the exact type is inserted instead and simplified away by
  // SimplifyCasts when already correct)
  import org.apache.spark.sql.catalyst.expressions.Cast

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_poly_hash"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_poly_hash(str, base, mod)")
        PolyHash(Cast(args.head, StringType),
          longLit(args(1), "base"), longLit(args(2), "mod"))
      }),
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot(a, b)")
        DotProduct(Cast(args.head, ArrayType(DoubleType)),
          Cast(args(1), ArrayType(DoubleType)))
      }),
  )

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}

/** spark.sql.extensions entry point (SparkSessionExtensions injection —
  * the idiomatic deployment hook for engine extensions). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach(ext.injectFunction)
}
