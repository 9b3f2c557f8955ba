package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.wbot.Fixtures

/** Shared local SparkSession for suites (one JVM — sbt forks one test JVM). */
object SparkTestBase {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("wbotspark-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def pagesDf(spec: Fixtures.SiteSpec): DataFrame = {
    val s = spark
    import s.implicits._
    Fixtures.allPages(spec)
      .map(p => (p.url, new java.sql.Timestamp(p.warcTsMs), p.html, p.text,
        p.lang))
      .toDF("url", "warc_ts", "html", "text", "lang")
  }
}

abstract class SparkSuite extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = {
    val s = SparkTestBase.spark
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
