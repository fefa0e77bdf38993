package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** SQL-text registration of the T-SQL dialect (SURVEY.md §2.8/§2.11): every
  * function is registered as an **expression builder** — the parser inlines
  * the same Catalyst expression tree the Column API builds, so `spark.sql(
  * "SELECT QUOTENAME(name) ...")` is codegen'd identically to
  * `TSql.quotename(col)`. No UDF, no serialization boundary — the engine's
  * extension point stays native (the reference's extension surface is SQL
  * scalar functions, GenerateScripts.ps1:46-48).
  */
object TSqlRegistry {

  private def builder(arity: Int, name: String)(
      fn: Seq[Column] => Column): (String, Seq[Expression] => Expression) =
    name -> { exprs =>
      require(exprs.length == arity, s"$name expects $arity args")
      expression(fn(exprs.map(column)))
    }

  private def stringArg(e: Expression): String =
    e.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
      .value.toString

  /** Register the dialect into the session's function registry. */
  def register(spark: SparkSession): Unit = {
    val entries: Seq[(String, Seq[Expression] => Expression)] = Seq(
      // Arity-polymorphic: ISNULL(x, d) is the T-SQL form; ISNULL(x) keeps
      // Spark's builtin null-test semantics (shadowing it outright would
      // break any plan that uses the builtin).
      "isnull" -> { exprs =>
        exprs match {
          case Seq(x) => org.apache.spark.sql.catalyst.expressions.IsNull(x)
          case Seq(x, d) => expression(TSql.isnull(column(x), column(d)))
          case _ => throw new IllegalArgumentException("isnull expects 1 or 2 args")
        }
      },
      builder(1, "quotename")(a => TSql.quotename(a(0))),
      builder(1, "len")(a => TSql.len(a(0))),
      builder(2, "charindex")(a => TSql.charindex(a(0), a(1))),
      builder(0, "getdate")(_ => TSql.getdate()),
      "tsql_dateadd" -> { exprs =>
        require(exprs.length == 3, "tsql_dateadd expects (unit, n, ts)")
        expression(TSql.dateadd(stringArg(exprs(0)), column(exprs(1)),
          column(exprs(2))))
      },
      "tsql_datediff" -> { exprs =>
        require(exprs.length == 3, "tsql_datediff expects (unit, a, b)")
        expression(TSql.datediff(stringArg(exprs(0)), column(exprs(1)),
          column(exprs(2))))
      },
      "tsql_datepart" -> { exprs =>
        require(exprs.length == 2, "tsql_datepart expects (unit, ts)")
        expression(TSql.datepart(stringArg(exprs(0)), column(exprs(1))))
      },
      builder(1, "stdevp")(a => TSql.stdevp(a(0))),
      builder(1, "stdev")(a => TSql.stdev(a(0))),
      // graft portable primitives, exposed to SQL users: the 60-bit
      // md5-derived hash and the e6 fixed-point log2 — both lower to the
      // same codegen'd builtin trees the Column/expr API builds
      builder(1, "portable_hash")(a => Text.portableHash(a(0))),
      "log2e6" -> { exprs =>
        require(exprs.length == 1, "log2e6 expects 1 arg")
        // parse the canonical SQL form once, then splice the argument in
        // for the placeholder (the arg expression repeats 4×, same as the
        // inline spelling)
        val tree = spark.sessionState.sqlParser
          .parseExpression(Text.log2e6SparkSql("__graft_log2e6_x__"))
        tree.transformUp {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
              if a.name.equalsIgnoreCase("__graft_log2e6_x__") => exprs.head
        }
      })
    val registry = spark.sessionState.functionRegistry
    entries.foreach { case (name, b) =>
      registry.createOrReplaceTempFunction(name, b, "internal")
    }
  }
}
