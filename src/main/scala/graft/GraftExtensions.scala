package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.gen.{CmsEstimateExpr, Md5Hash60Expr, MinHashSigsExpr, NgramHashesExpr, RandStringExpr, ShingleGenExpr}

/** SQL-surface registration for the engine's native expressions, so
  * `spark.sql` users can call them without the Scala API:
  *
  *   graft_rand_string(id, seedMix, len, alphabet, lenDraw)
  *   graft_minhash_sigs(text, shingleLen, numHashes)
  *   graft_ngram_hashes(text, n)
  *   graft_md5_60(str)
  *   graft_cms_estimate(sketch, key)
  *
  * Two registration paths:
  *  - config: `spark.sql.extensions=graft.GraftExtensions` (cluster-wide,
  *    injected at session build);
  *  - runtime: `GraftExtensions.register(spark)` (temp functions on an
  *    existing session — what the tests use, since test suites share
  *    one JVM session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._
  override def apply(e: SparkSessionExtensions): Unit = {
    builders.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    e.injectOptimizerRule(_ => graft.plans.TopKRewriteRule)
  }
}

object GraftExtensions {

  private def litLong(e: Expression): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _)  => v.toLong
    case other => throw new IllegalArgumentException(s"expected integer literal, got $other")
  }
  private def litInt(e: Expression): Int = Math.toIntExact(litLong(e))
  private def litString(e: Expression): String = e match {
    case Literal(v, _) if v != null => v.toString
    case other => throw new IllegalArgumentException(s"expected string literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_rand_string" -> { exprs =>
      RandStringExpr(exprs(0), litLong(exprs(1)), litInt(exprs(2)),
        litString(exprs(3)), if (exprs.length > 4) litInt(exprs(4)) else -1)
    },
    "graft_minhash_sigs" -> { exprs =>
      MinHashSigsExpr(exprs(0),
        if (exprs.length > 1) litInt(exprs(1)) else 5,
        if (exprs.length > 2) litInt(exprs(2)) else 16)
    },
    "graft_ngram_hashes" -> { exprs =>
      NgramHashesExpr(exprs(0), if (exprs.length > 1) litInt(exprs(1)) else 3)
    },
    "graft_md5_60" -> { exprs => Md5Hash60Expr(exprs(0)) },
    "graft_shingles" -> { exprs =>
      ShingleGenExpr(exprs(0), if (exprs.length > 1) litInt(exprs(1)) else 5)
    },
    "graft_cms_estimate" -> { exprs => CmsEstimateExpr(exprs(0), exprs(1)) },
  )

  /** Runtime registration on an existing session (temp functions). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
