package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{CdcChunkHashesExpr, CosineExpr, DotExpr, L2SqExpr, RollingHashExpr, VartypeExpr}

/** SparkSessionExtensions injector: registers graft's native expressions
  * as SQL functions, so pure-SQL users get them too:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * ...
  * spark.sql("SELECT vartype(ref, alt), rolling_hash(text) FROM t")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((new FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vartype",
      new ExpressionInfo(classOf[VartypeExpr].getName, "vartype"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vartype(ref, allele) takes 2 arguments")
        VartypeExpr(children.head, children(1))
      }),
    ("rolling_hash",
      new ExpressionInfo(classOf[RollingHashExpr].getName, "rolling_hash"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "rolling_hash(str) takes 1 argument")
        RollingHashExpr(children.head)
      }),
    ("cdc_chunk_hashes",
      new ExpressionInfo(classOf[CdcChunkHashesExpr].getName, "cdc_chunk_hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "cdc_chunk_hashes(str, window, modulus) takes 3 arguments")
        def intLit(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case _ => throw new IllegalArgumentException(
            s"cdc_chunk_hashes: $what must be an integer literal")
        }
        CdcChunkHashesExpr(children.head,
          intLit(children(1), "window"), intLit(children(2), "modulus"))
      }),
    ("vec_dot",
      new ExpressionInfo(classOf[DotExpr].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_dot(a, b) takes 2 arguments")
        DotExpr(children.head, children(1))
      }),
    ("vec_l2sq",
      new ExpressionInfo(classOf[L2SqExpr].getName, "vec_l2sq"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_l2sq(a, b) takes 2 arguments")
        L2SqExpr(children.head, children(1))
      }),
    ("vec_cosine",
      new ExpressionInfo(classOf[CosineExpr].getName, "vec_cosine"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_cosine(a, b) takes 2 arguments")
        CosineExpr(children.head, children(1))
      }))

  /** Register on an already-running session (extensions only take effect
    * at builder time; use this from notebooks / existing apps).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark, name, info, builder)
    }
}
