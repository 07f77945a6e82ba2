package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import graft.{Sessions, SparkEntry}

/** Dev-only job profiler: runs one registered query and prints every Spark
  * job's wall time + call site, plus per-stage task totals — pinpoints which
  * actions inside a multi-action query dominate (`runMain graft.tools.JobProf
  * <name> <dir> [cpus]`). Not part of the shipped surface.
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2).toInt else 32
    val spark = Sessions.init(
      Sessions.builder(s"local[$cpus]", cpus).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String, Int)]()
    val jobTask = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Int)]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    @volatile var taskTime = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        // Prefer the first graft.* frame in the call-site stack: broadcast
        // builds all share the opaque CompletableFuture site otherwise.
        val graftFrame = js.stageInfos.flatMap(_.details.split('\n'))
          .find(l => l.contains("graft.") && !l.contains("JobProf"))
          .map(_.trim.take(110))
        val site = graftFrame.getOrElse(
          js.stageInfos.lastOption.map(_.name.take(90)).getOrElse("?"))
        jobs.put(js.jobId, (System.nanoTime(), site, js.stageInfos.size))
        js.stageInfos.foreach(si => stageToJob.put(si.stageId, js.jobId))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (t0, site, ns) =>
          done.add((je.jobId, (System.nanoTime() - t0) / 1e9, site, ns))
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val rt = sc.stageInfo.taskMetrics.executorRunTime
        taskTime += rt
        Option(stageToJob.get(sc.stageInfo.stageId)).foreach { j =>
          jobTask.compute(j, (_, v) => {
            val (t, mx, nt) = Option(v).getOrElse((0L, 0L, 0))
            (t + rt, math.max(mx, rt), nt + sc.stageInfo.numTasks)
          })
        }
      }
    })
    // warm
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$dir/lineitem.parquet").limit(10).collect()
    Thread.sleep(200); done.clear(); taskTime = 0L
    val fn = SparkEntry.queries(name)
    val t0 = System.nanoTime()
    val n = fn(spark, dir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    val rows = done.asScala.toSeq.sortBy(_._1)
    println(f"== $name rows=$n wall=$wall%.2f s, jobs=${rows.size}, sumJob=${rows.map(_._2).sum}%.2f s, execTaskTime=${taskTime / 1e3}%.1f s ==")
    rows.foreach { case (id, d, site, ns) =>
      val (tt, mx, nt) = Option(jobTask.get(id)).getOrElse((0L, 0L, 0))
      println(f"  job $id%4d ${d}%7.3f s  stages=$ns%-3d taskSum=${tt / 1e3}%7.2f maxStage=${mx / 1e3}%6.2f ntasks=$nt%-4d $site")
    }
    spark.stop()
  }
}
