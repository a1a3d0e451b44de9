package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class ClusteringSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("interleave produces the Morton code") {
    // x=0b11, y=0b00 with 2 bits → bits of x at even positions: 0b0101 = 5
    val df = Seq((3L, 0L), (0L, 3L), (3L, 3L)).toDF("x", "y")
      .select(Clustering.interleave(Seq(col("x"), col("y")), 2).as("z"))
    assert(df.as[Long].collect().toSeq == Seq(5L, 10L, 15L))
  }

  test("normalize maps the [lo, hi] range onto [0, 2^bits)") {
    val df = Seq(0.0, 50.0, 100.0).toDF("v")
      .select(Clustering.normalize(col("v"), lit(0.0), lit(100.0), 8).as("n"))
    assert(df.as[Long].collect().toSeq == Seq(0L, 128L, 255L))
  }

  test("z-order layout keeps 2-D neighborhoods in few partitions") {
    // a 32×32 grid; after z-ordering into 16 partitions, any small 2-D tile
    // should touch very few partitions (locality in BOTH dims), whereas a
    // single-column sort would smear one dimension across all of them
    val grid = spark.range(32 * 32).select(
      (col("id") % 32).as("x"), (col("id") / 32).as("y"))
    val laid = Clustering.clusterByZOrder(grid, Seq("x", "y"), bits = 5,
      numPartitions = Some(16))
      .withColumn("pid", spark_partition_id())
    // partitions are contiguous z-ranges → equal-ish sizes
    val sizes = laid.groupBy("pid").count().as[(Int, Long)].collect().toMap
    assert(sizes.size == 16)
    // an 8×8 tile = 1/16 of the space → expect ~1-3 partitions, not 8+
    val tile = laid.filter(col("x") < 8 && col("y") < 8)
      .select("pid").distinct().count()
    assert(tile <= 3, s"8x8 tile touched $tile partitions")
    // compare with x-only sorting: the same tile touches many partitions
    val xSorted = grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .withColumn("pid", spark_partition_id())
    val tileX = xSorted.filter(col("x") < 8 && col("y") < 8)
      .select("pid").distinct().count()
    assert(tile < tileX)
  }
}
