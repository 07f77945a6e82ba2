package graft.atnf

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Standalone job entry point for the ATNF catalogue pipeline — the
  * reference's `atnf/main.py:6-10` CLI (fetch/read snapshot → transform →
  * write).
  *
  * Usage:
  *   graft.atnf.Main --snapshot CSV [--url URL] [--version V] [--out DIR]
  *
  * With `--url` the snapshot is fetched live (retry/backoff, atomic
  * write) version-pinned — `--snapshot` is treated as the snapshot
  * DIRECTORY and `--version` participates in both the request URL and
  * the per-version snapshot filename, so a version bump re-fetches
  * instead of silently reusing a stale file. Without `--url` the CSV at
  * `--snapshot` is read as-is. `--out` writes the transformed catalogue
  * as parquet; otherwise the row count is printed (the reference main's
  * smoke behavior).
  */
object Main {

  final case class Args(snapshot: String, url: Option[String] = None,
                        version: String = "2.3.0", out: Option[String] = None)

  def parse(argv: Array[String]): Args = {
    def loop(rest: List[String], acc: Args): Args = rest match {
      case "--snapshot" :: v :: t => loop(t, acc.copy(snapshot = v))
      case "--url" :: v :: t      => loop(t, acc.copy(url = Some(v)))
      case "--version" :: v :: t  => loop(t, acc.copy(version = v))
      case "--out" :: v :: t      => loop(t, acc.copy(out = Some(v)))
      case Nil                    => acc
      case other :: _ => sys.error(s"unknown argument: $other " +
        "(expected --snapshot CSV [--url URL] [--version V] [--out DIR])")
    }
    val a = loop(argv.toList, Args(snapshot = null))
    require(a.snapshot != null, "--snapshot CSV is required")
    a
  }

  /** Testable body — the spec drives this with the suite's session. */
  def run(spark: SparkSession, a: Args,
          visitedAt: java.sql.Timestamp = new java.sql.Timestamp(0L)): DataFrame = {
    val extracted = a.url match {
      case Some(u) => CatalogueFetch.extractLiveVersioned(spark, u, a.version,
        java.nio.file.Paths.get(a.snapshot), visitedAt)
      case None => AtnfTransform.extract(spark, a.snapshot, visitedAt)
    }
    val result = AtnfTransform.transform(extracted, a.version)
    a.out match {
      case Some(root) => result.write.mode("overwrite").parquet(root)
      case None       => println(s"[atnf] known_pulsars=${result.count()}")
    }
    result
  }

  def main(argv: Array[String]): Unit = {
    val spark = graft.Sessions.init(
      graft.Sessions.builder("local[*]", 32).appName("atnf-etl").getOrCreate())
    try run(spark, parse(argv),
      new java.sql.Timestamp(System.currentTimeMillis())) finally spark.stop()
  }
}
