package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Task-skew diagnostic: run named SparkEntry queries under a listener
  * that records every task's duration per stage, then print each stage's
  * task-count / median / p95 / max and the max/median skew ratio. The
  * straggler signature this exists to catch is ONE task holding a stage
  * (a hot key in a collect_list/explode aggregate) — a shape per-query
  * wall time cannot distinguish from an evenly-slow stage.
  *
  *   runMain graft.SkewAudit <sfDir> <query...>
  *
  * Output: one line per stage with skew ≥ 2× (and every stage ≥ 5 s),
  * worst-first, plus a per-query summary. Diagnostic main — not part of
  * the driver contract.
  */
object SkewAudit {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SkewAudit <sfDir> <query...>")
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val durations = mutable.Map.empty[Int, mutable.ArrayBuffer[Long]]
    val stageNames = mutable.Map.empty[Int, String]
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        durations.synchronized {
          durations.getOrElseUpdate(t.stageId, mutable.ArrayBuffer.empty) +=
            t.taskInfo.duration
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        durations.synchronized {
          stageNames(s.stageInfo.stageId) =
            s.stageInfo.name.takeWhile(_ != '\n').take(80)
        }
    }
    spark.sparkContext.addSparkListener(listener)

    args.tail.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query $name"))
      durations.synchronized { durations.clear(); stageNames.clear() }
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
      val stages = durations.synchronized {
        durations.toSeq.map { case (sid, ds) =>
          val s = ds.sorted
          (sid, stageNames.getOrElse(sid, "?"), s.length,
            s(s.length / 2), s((s.length * 95) / 100 min (s.length - 1)), s.last)
        }
      }
      println(f"== $name%s wall=$wall%.1fs stages=${stages.size}%d")
      stages
        .filter { case (_, _, n, med, _, max) =>
          max >= 5000L && n > 1 && med > 0 && max >= 2 * med }
        .sortBy(-_._6)
        .foreach { case (sid, nm, n, med, p95, max) =>
          println(f"  stage $sid%4d tasks=$n%4d med=${med / 1e3}%7.1fs " +
            f"p95=${p95 / 1e3}%7.1fs max=${max / 1e3}%7.1fs " +
            f"skew=${max.toDouble / med}%5.1fx  $nm%s")
        }
      val worst = stages.sortBy(-_._6).take(3)
      worst.foreach { case (sid, nm, n, med, _, max) =>
        println(f"  top-time stage $sid%4d tasks=$n%4d med=${med / 1e3}%7.1fs " +
          f"max=${max / 1e3}%7.1fs  $nm%s")
      }
      Tables.releaseIntermediates(spark)
    }
    spark.stop()
  }
}
