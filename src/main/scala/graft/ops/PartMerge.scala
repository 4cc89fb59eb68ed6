package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets

/** Multipart merge + manifest + resume protocol
  * (cc2dataset/main.py:290-329,375-380).
  */
object PartMerge {

  /** U1: union all part outputs. Preferred form is a single multi-path
    * parquet scan (one FileSourceScan, partition/column pruning intact)
    * instead of an N-ary Union plan (cc2dataset/main.py:321-327 folds
    * `df.union` — equivalent bag semantics, worse plan).
    */
  def unionParts(spark: SparkSession, partDirs: Seq[String]): DataFrame =
    spark.read.parquet(partDirs: _*)

  /** K2: newline-joined manifest of chosen WAT paths
    * (cc2dataset/main.py:375-377).
    */
  def writeManifest(spark: SparkSession, outputPath: String, wats: Seq[String]): Unit = {
    val path = new Path(outputPath, "wat_index_files.txt")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(wats.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** S7: resume — read the manifest back (cc2dataset/main.py:379-380). */
  def readManifest(spark: SparkSession, outputPath: String): Seq[String] = {
    val path = new Path(outputPath, "wat_index_files.txt")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(path)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  /** K3: last completed part = max part_<i> dir containing _SUCCESS,
    * excluding `merged` (cc2dataset/main.py:290-296); -1 when none.
    */
  def lastSuccessfulPart(spark: SparkSession, outputPath: String): Int = {
    val glob = new Path(outputPath, "*/_SUCCESS")
    val fs = glob.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses =
      try fs.globStatus(glob)
      catch { case _: Exception => null }
    if (statuses == null) return -1
    val parts = statuses.toSeq
      .map(_.getPath.getParent.getName)
      .filter(n => n.startsWith("part_") && n != "merged")
      .flatMap(n => scala.util.Try(n.stripPrefix("part_").toInt).toOption)
    if (parts.isEmpty) -1 else parts.max
  }
}
