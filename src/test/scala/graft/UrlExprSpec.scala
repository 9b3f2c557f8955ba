package graft

import org.apache.spark.sql.functions._
import graft.wbot.{Fixtures, Udfs}
import graft.wbot.exprs.UrlExprs

/** Native Catalyst expressions ≡ the UDF path (same pure core), and they
  * stay inside whole-stage codegen. */
class UrlExprSpec extends SparkSuite {

  test("CanonicalizeUrl expression ≡ canonicalize UDF on fixture + junk URLs") {
    val sp = spark
    import sp.implicits._
    val urls = Fixtures.allPages(Fixtures.tiny).map(_.url) ++ Seq(
      "http://www.google.com/", "ftp://nope.com/x", "http://bad.unknowntld/x",
      "http://a.com/a%2520b", "http://a.com/%zz", "not a url", "")
    val df = urls.toDF("url").repartition(4)
    val both = df.select(
      UrlExprs.canonicalizeUrl(col("url")).as("expr_canon"),
      Udfs.canonicalize(col("url")).as("udf_canon"),
      UrlExprs.urlRoot(col("url")).as("expr_root"))
      .collect()
    both.foreach { r =>
      assert(r.getString(0) == r.getString(1), s"expr vs udf mismatch: $r")
    }
  }

  test("expression participates in whole-stage codegen") {
    val df = spark.range(3)
      .select(concat(lit("http://a.com/p"), col("id")).as("url"))
      .select(UrlExprs.canonicalizeUrl(col("url")).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"expected codegen stage:\n$plan")
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("a.com/p0", "a.com/p1", "a.com/p2"))
  }

  test("SQL registration: wbot_canon / wbot_root") {
    UrlExprs.register(spark)
    val r = spark.sql(
      "SELECT wbot_canon('http://www.a.com/p/') AS c, wbot_root('http://sub.b.net/x') AS r").first()
    assert(r.getString(0) == "a.com/p")
    assert(r.getString(1) == "b.net")
  }
}
