package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.atnf.AtnfTransform
import graft.load.Targets
import graft.sources.Checkpoint

class AtnfCheckpointSpec extends SparkSuite {

  private def c(n: String) = col(s"`$n`")

  test("ATNF pipeline: extract -> transform -> target views (reference atnf/atnf.py)") {
    val csv = Files.createTempDirectory("atnf").resolve("cat.csv")
    Files.writeString(csv,
      """NAME,RAJ,DECJ,DM,W50,P0
        |J0437-4715,04:37:15.99,-47:15:09.7,2.64,0.141,0.005757
        |J0534+2200,05:34:31.97,+22:00:52.06,56.77,3.0,0.033392
        |""".stripMargin)
    val visited = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val out = AtnfTransform.transform(
      AtnfTransform.extract(spark, csv.toString, visited))

    assert(out.count() === 2)
    val r = out.orderBy(c("known_ps.name")).head()
    val ra  = r.getAs[Double]("known_ps.ra")
    val dec = r.getAs[Double]("known_ps.dec")
    assert(math.abs(ra - (4 + 37 / 60.0 + 15.99 / 3600.0) * 15.0) < 1e-4)
    assert(math.abs(dec - -(47 + 15 / 60.0 + 9.7 / 3600.0)) < 1e-4)
    assert(r.getAs[String]("known_ps.pos").startsWith("("))

    val view = Targets.targetView(out, Targets.atnf.find(_.table == "known_pulsar").get)
    assert(view.columns.contains("name") && view.columns.contains("known_pulsar_id"))
    assert(view.count() === 2)
  }

  test("checkpoint: computes once, then reads back (reference read_or_parse_parquet)") {
    val dir = Files.createTempDirectory("cp").toString + "/stage"
    var computed = 0
    def compute = {
      computed += 1
      spark.range(10).toDF("id")
    }
    val first = Checkpoint.readOrCompute(spark, dir)(compute)
    assert(first.count() === 10 && computed === 1)
    val second = Checkpoint.readOrCompute(spark, dir)(compute)
    assert(second.count() === 10 && computed === 1)   // not recomputed
  }
}
