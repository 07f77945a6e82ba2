package graft.atnf

import java.io.{FileOutputStream, InputStream}
import java.net.{HttpURLConnection, URI}
import java.nio.file.{Files, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Live catalogue fetch adapter — the counterpart of the reference's psrqpy
  * HTTP pull (`atnf/atnf.py:25-27`): download the catalogue over HTTP to a
  * local snapshot, then hand it to the existing snapshot reader
  * ([[AtnfTransform.extract]]). Fetch-then-read keeps the distributed path
  * identical for live and offline runs, and the snapshot doubles as the
  * resumable cache (like the reference's `read_or_parse_parquet`).
  *
  * The fetch itself is a driver-side download (the catalogue is a small
  * reference file — megabytes, not data-scale); executors never touch the
  * network. Retries with exponential backoff mirror the client library's
  * behavior. The live path is exercised in tests against an in-JVM HTTP
  * server (`com.sun.net.httpserver`, in-JDK) — this environment has no
  * egress, same as any locked-down cluster.
  */
object CatalogueFetch {

  /** Download `url` to `dest` (atomic: temp file + move). Returns `dest`.
    * @param maxRetries retry count on IO/5xx failures, exponential backoff
    */
  def fetch(url: String, dest: Path, maxRetries: Int = 3,
            connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 60000): Path = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= maxRetries) {
      if (attempt > 0) Thread.sleep(200L << (attempt - 1))
      try {
        val conn = URI.create(url).toURL.openConnection()
          .asInstanceOf[HttpURLConnection]
        conn.setConnectTimeout(connectTimeoutMs)
        conn.setReadTimeout(readTimeoutMs)
        conn.setRequestProperty("Accept", "text/csv, */*")
        val code = conn.getResponseCode
        if (code >= 500) throw new java.io.IOException(s"HTTP $code from $url")
        if (code >= 400) throw new CatalogueFetchException(s"HTTP $code from $url", null)
        val tmp = Files.createTempFile(dest.getParent, ".fetch", ".part")
        val in: InputStream = conn.getInputStream
        try {
          val out = new FileOutputStream(tmp.toFile)
          try in.transferTo(out) finally out.close()
        } finally in.close()
        Files.move(tmp, dest, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        return dest
      } catch {
        case e: CatalogueFetchException => throw e    // 4xx: retrying is useless
        case e: java.io.IOException => lastErr = e; attempt += 1
      }
    }
    throw new CatalogueFetchException(
      s"catalogue fetch failed after ${maxRetries + 1} attempts: $url", lastErr)
  }

  /** Fetch-or-reuse + extract: download unless a snapshot already exists
    * (`refresh` forces), then run the standard snapshot extract.
    */
  def extractLive(spark: SparkSession, url: String, snapshotPath: Path,
                  visitedAt: java.sql.Timestamp, refresh: Boolean = false): DataFrame = {
    if (refresh || !Files.exists(snapshotPath)) fetch(url, snapshotPath)
    AtnfTransform.extract(spark, snapshotPath.toString, visitedAt)
  }

  /** VERSION-PINNED fetch-or-reuse (the reference pins the catalogue
    * version through psrqpy, `atnf/atnf.py:25-27`): the version
    * participates in both the request URL (`?version=V`) and the snapshot
    * filename, so a version bump can never silently reuse an older
    * download, and every historical version stays cached side by side.
    */
  def extractLiveVersioned(spark: SparkSession, baseUrl: String, version: String,
                           snapshotDir: Path, visitedAt: java.sql.Timestamp,
                           refresh: Boolean = false): DataFrame = {
    require(version.nonEmpty && version.forall(c => c.isLetterOrDigit || c == '.' || c == '-'),
      s"catalogue version must be a simple token, got '$version'")
    val sep = if (baseUrl.contains("?")) "&" else "?"
    extractLive(spark, s"$baseUrl${sep}version=$version",
      snapshotDir.resolve(s"atnf_v$version.csv"), visitedAt, refresh)
  }
}

final class CatalogueFetchException(msg: String, cause: Throwable)
  extends RuntimeException(msg, cause)
