package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ZOrderSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Reference interleave, bit by bit. */
  private def morton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("interleave2 matches the reference on known vectors and random inputs") {
    assert(morton(3, 5, 3) == 39L) // classic check: (011, 101) -> 100111
    val rnd = new scala.util.Random(3)
    val cases = Seq((0L, 0L), (3L, 5L), (65535L, 65535L), (1L, 0L), (0L, 1L)) ++
      Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.interleave2(col("x"), col("y"), 16).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    cases.foreach { case (x, y) =>
      assert(got((x, y)) == morton(x, y, 16), s"($x,$y)")
    }
  }

  test("z-ordered layout yields per-file min/max boxes tight in BOTH dimensions") {
    // 32x32 grid, 16 files of 64 rows each. A z-range partitioning makes
    // each file an ~8x8 block: a predicate on y alone intersects ~4/16
    // file boxes. An x-sorted layout gives every file the full y range:
    // a y predicate intersects ALL 16 boxes — no pruning possible.
    val grid = (for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong))
      .toDF("x", "y")

    def fileBoxes(laidOut: org.apache.spark.sql.DataFrame): Array[(Long, Long, Long, Long)] = {
      val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
      laidOut.write.mode("overwrite").parquet(dir)
      val boxes = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      boxes
    }

    val zBoxes = fileBoxes(ZOrder.zOrdered(grid, col("x"), col("y"), 16, bits = 5))
    val xBoxes = fileBoxes(
      grid.repartitionByRange(16, col("x")).sortWithinPartitions("x"))

    assert(zBoxes.length == 16 && xBoxes.length == 16)
    // y-band query: 8 <= y <= 15 — count files whose stats CANNOT rule it out
    def hits(boxes: Array[(Long, Long, Long, Long)]): Int =
      boxes.count { case (_, _, y0, y1) => y1 >= 8 && y0 <= 15 }
    assert(hits(xBoxes) == 16, "x-sort should be unable to prune on y")
    assert(hits(zBoxes) <= 6,
      s"z-order should prune most files on y, hit ${hits(zBoxes)}/16")
    // and x stays prunable too: x-band 8..15
    def hitsX(boxes: Array[(Long, Long, Long, Long)]): Int =
      boxes.count { case (x0, x1, _, _) => x1 >= 8 && x0 <= 15 }
    assert(hitsX(zBoxes) <= 8,
      s"z-order should also prune on x, hit ${hitsX(zBoxes)}/16")
  }
}
