package graft.wbot

import org.apache.spark.sql.{DataFrame, SparkSession, SaveMode}
import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

/**
 * Snapshot-table checkpoint layer (SURVEY.md §7.6) — the sandbox stand-in for
 * the Iceberg tables of the target deployment: Parquet directories plus an
 * atomic manifest (commit-by-rename), giving the Iceberg properties the crawl
 * actually uses — atomic per-superstep append, snapshot resume, and
 * per-superstep lineage (frontier, seen-delta, crawled-delta, attempts-delta,
 * metrics, seq watermark). On a real cluster the same call sites become
 * `writeTo(catalog.table).append()` on a bucketed Iceberg table.
 *
 * Layout:
 *   <dir>/manifest.properties      — committed step, seqBase, metrics (atomic rename)
 *   <dir>/step=<d>/{frontier,seen_delta,crawled,attempts}/  — parquet
 */
final class Storage(dir: String) {

  def init(): Unit = new File(dir).mkdirs()

  private def stepDir(d: Int) = s"$dir/step=$d"

  private def writeAtomic(df: DataFrame, path: String): Unit = {
    val tmp = path + ".tmp"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    val dst = new File(path)
    if (dst.exists()) delete(dst)
    Files.move(Paths.get(tmp), Paths.get(path), StandardCopyOption.ATOMIC_MOVE)
  }

  private def delete(f: File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(delete)
    f.delete(); ()
  }

  /** Commit superstep d: all tables first, manifest rename last (the commit
    * point — a crash mid-write leaves the previous manifest authoritative). */
  def commitStep(d: Int, frontier: DataFrame, seenDelta: Option[DataFrame],
      crawledDelta: DataFrame, attemptsDelta: DataFrame,
      metrics: Map[String, Long], seqBase: Long): Unit = {
    new File(stepDir(d)).mkdirs()
    writeAtomic(frontier, s"${stepDir(d)}/frontier")
    seenDelta.foreach(writeAtomic(_, s"${stepDir(d)}/seen_delta"))
    writeAtomic(crawledDelta, s"${stepDir(d)}/crawled")
    writeAtomic(attemptsDelta, s"${stepDir(d)}/attempts")
    val props = new java.util.Properties()
    props.setProperty("committed_step", d.toString)
    props.setProperty("seq_base", seqBase.toString)
    metrics.foreach { case (k, v) => props.setProperty(s"metric.$k", v.toString) }
    val tmp = Paths.get(s"$dir/manifest.properties.tmp")
    val out = Files.newOutputStream(tmp)
    try props.store(out, "wbot-spark snapshot manifest") finally out.close()
    Files.move(tmp, Paths.get(s"$dir/manifest.properties"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  final case class Snapshot(lastStep: Int, seqBase: Long, metrics: Map[String, Long])

  def readManifest(): Option[Snapshot] = {
    val f = new File(s"$dir/manifest.properties")
    if (!f.exists()) return None
    val props = new java.util.Properties()
    val in = Files.newInputStream(f.toPath)
    try props.load(in) finally in.close()
    import scala.jdk.CollectionConverters._
    val metrics = props.stringPropertyNames().asScala.toSeq
      .filter(_.startsWith("metric."))
      .map(k => k.stripPrefix("metric.") -> props.getProperty(k).toLong).toMap
    Some(Snapshot(props.getProperty("committed_step").toInt,
      props.getProperty("seq_base").toLong, metrics))
  }

  /** Frontier snapshot, with forward migration: snapshots written before the
    * O2 `score` column existed resume as pure FIFO (score = 0) instead of
    * failing Politeness' drain-order resolution with an AnalysisException. */
  def readFrontier(spark: SparkSession, d: Int): DataFrame = {
    val df = spark.read.parquet(s"${stepDir(d)}/frontier")
    if (df.columns.contains("score")) df
    else df.withColumn("score", org.apache.spark.sql.functions.lit(0L))
  }

  /** Full seen set as of step d = union of committed deltas (bucket appends
    * on a real cluster). */
  def readSeen(spark: SparkSession, upTo: Int): Option[DataFrame] = {
    val paths = (0 to upTo).map(i => s"${stepDir(i)}/seen_delta").filter(p => new File(p).exists())
    if (paths.isEmpty) None
    else Some(spark.read.parquet(paths: _*))
  }

  def readCrawled(spark: SparkSession, upTo: Int): Option[DataFrame] = {
    val paths = (0 to upTo).map(i => s"${stepDir(i)}/crawled").filter(p => new File(p).exists())
    if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
  }

  def readAttempts(spark: SparkSession, upTo: Int): Option[DataFrame] = {
    val paths = (0 to upTo).map(i => s"${stepDir(i)}/attempts").filter(p => new File(p).exists())
    if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
  }
}
