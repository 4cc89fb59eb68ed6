package graft.wat

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** The one-task-per-archive Spark wrapper shared by the three CC
  * sources (WAT / raw WARC / WET): broadcast the Hadoop conf once,
  * one partition per path (the reference's parallelization unit,
  * main.py:273-274), and close the per-path [[ClosingIterator]] at
  * task completion — a limit/take/kill ends the task without
  * exhausting the iterator, and on the streaming-decode path that
  * would strand an open FS/S3 handle per in-flight archive.
  */
object ArchiveTasks {

  def perArchive[T: Encoder](spark: SparkSession, paths: Seq[String],
      readErrors: org.apache.spark.util.LongAccumulator,
      streamThresholdBytes: Long)(
      open: (String, Configuration, Exception => Unit, Long)
        => ClosingIterator[T]): Dataset[T] = {
    import spark.implicits._
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    spark.createDataset(
      spark.sparkContext.parallelize(paths, math.max(1, paths.size)))
      .flatMap { p =>
        val it = open(p, confBc.value.value,
          _ => readErrors.add(1L), streamThresholdBytes)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => it.close()))
        it
      }
  }
}
