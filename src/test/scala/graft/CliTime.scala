package graft
/** Dev-only: wall-time + job census for one meertrap fixture pipeline run. */
object CliTime {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.init(Sessions.builder("local[4]", 4).getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    def phase[A](name: String)(f: => A): A = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = f
      println(f"[clitime] $name%-22s ${(System.nanoTime()-t0)/1e9}%6.1f s  jobs=${jobs.get()-j0}")
      r
    }
    val fixture = graft.meertrap.FixtureGen.generate().toString
    val out = java.nio.file.Files.createTempDirectory("clitime").toString
    val o = phase("Main.run (writes+metrics)") {
      graft.meertrap.Main.run(spark, graft.meertrap.Main.Args(
        input = fixture, partitionKey = "2023-11-20", out = Some(out)))
    }
    phase("metrics (again)") { println(graft.meertrap.MeertrapPipeline.metrics(o)) }
    spark.stop()
  }
}
