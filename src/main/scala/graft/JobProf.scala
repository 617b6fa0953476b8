package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerBlockUpdated, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-job profiler for local iteration: runs named declared queries and
  * prints every Spark job's wall time and call site, so a multi-job query
  * (materialize + eager picks + the returned plan) shows WHERE its seconds
  * go — job count × fixed scheduler latency vs real data work. Usage:
  *   sbt "runMain graft.JobProf <sfDir> <query> [query ...]"
  * Each query runs twice; the second (steady, post-JIT) run is the one to
  * read. Not part of any gate — a diagnosis tool like RunOne.
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = mutable.Map[Int, (Long, String)]()
    val lines = mutable.ArrayBuffer[String]()
    // job count tracked separately from `lines` (round-14 ADVICE): lines
    // also accumulates per-stage and per-block-update entries, so its
    // size is NOT the job count (the r13 build printed it as `jobs=`,
    // inflating the labelprop floor figure — re-measured with this
    // counter: 83 true jobs / 3.1 s steady at sf0.1; the floor
    // conclusion is unchanged, the corrected count lives at the loop).
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.nanoTime(),
          s"stages=${j.stageInfos.size} " +
            j.stageInfos.map(_.name.takeWhile(_ != '\n').take(60)).mkString(" | "))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        jobCount.incrementAndGet()
        starts.remove(j.jobId).foreach { case (t0, site) =>
          lines += f"  job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.3f s  $site"
        }
      }
      // Per-stage wall + IO volumes: the job lines say WHICH job is
      // slow; these say WHAT the slow job's stages moved (shuffle bytes
      // are the memory-bandwidth signature the allpairs hunt needed).
      override def onStageCompleted(st: SparkListenerStageCompleted): Unit = {
        val i = st.stageInfo
        val m = i.taskMetrics
        val wall = (for (a <- i.completionTime; b <- i.submissionTime)
          yield (a - b) / 1e3).getOrElse(-1.0)
        lines += f"    stage ${i.stageId}%3d $wall%6.2f s tasks=${i.numTasks}%3d " +
          f"in=${m.inputMetrics.bytesRead / 1e6}%8.1fMB " +
          f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
          f"sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB " +
          f"spill=${m.memoryBytesSpilled / 1e6}%6.1fMB " +
          i.name.takeWhile(_ != '\n').take(40)
      }
      // Storage-eviction instrumentation (round-13, the allpairs hunt):
      // a cached block leaving memory mid-query shows up here as an
      // update whose storage level lost useMemory (spilled to disk) or
      // became invalid (dropped entirely → lineage recompute on next
      // read). Per-query counts print alongside the job lines.
      override def onBlockUpdated(b: SparkListenerBlockUpdated): Unit = {
        val lvl = b.blockUpdatedInfo.storageLevel
        val id = b.blockUpdatedInfo.blockId
        if (id.isRDD && !lvl.isValid)
          lines += s"  block DROP $id (recompute on next read)"
        else if (id.isRDD && !lvl.useMemory && lvl.useDisk)
          lines += s"  block to-disk $id"
      }
    })
    args.tail.foreach { name =>
      (1 to 2).foreach { pass =>
        lines.clear()
        jobCount.set(0)
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        val total = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // let the listener bus drain before printing
        println(f"[jobprof] $name pass=$pass rows=$n total=$total%.3f s " +
          s"jobs=${jobCount.get()} events=${lines.size}")
        lines.foreach(println)
      }
    }
    spark.stop()
  }
}
