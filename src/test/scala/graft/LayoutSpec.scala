package graft

import graft.sources.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  private val tmpDir =
    java.nio.file.Files.createTempDirectory("graft_layout").toString

  test("interleaveBits matches hand-computed Morton codes") {
    // x=0b101, y=0b011 at 3 bits → bits (b·2+c): x sets 0,4; y sets 1,3
    val row = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.interleaveBits(Seq(col("x"), col("y")), 3).as("z"))
      .head()
    assert(row.getLong(0) == (1 + 2 + 8 + 16).toLong) // 27
    // single column degenerates to identity on the low bits
    val id = Seq(Tuple1(11L)).toDF("x")
      .select(Layout.interleaveBits(Seq(col("x")), 4).as("z")).head()
    assert(id.getLong(0) == 11L)
    intercept[IllegalArgumentException](
      Layout.interleaveBits(Seq(col("x"), col("y")), 32))
  }

  test("scaleToBucket is exact long arithmetic, in range, null-safe") {
    val df = Seq(Some(10L), Some(509L), Some(1000L), None).toDF("v")
    val out = df.select(
      Layout.scaleToBucket(col("v"), 10L, 1000L, 4).as("b"))
      .as[Long].collect().sorted
    // span 991: min→0, max→floor(990*16/991)=15, mid→floor(499*16/991)=8
    assert(out.toSeq == Seq(0L, 0L, 8L, 15L)) // null → 0
    // constant column: everything lands in bucket 0
    val const = Seq(7L, 7L).toDF("v")
      .select(Layout.scaleToBucket(col("v"), 7L, 7L, 8).as("b"))
      .as[Long].collect()
    assert(const.forall(_ == 0L))
  }

  test("zCode fails loudly on an all-null column") {
    val df = Seq((Option.empty[Long], 1L), (None, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException](
      df.select(Layout.zCode(df, Seq("a", "b"), 4)))
  }

  test("z-ordered files are tight in EVERY dimension, not just one") {
    // 64×64 grid; z-order into 16 files vs a linear sort on x alone.
    val grid = spark.range(64 * 64)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val zDir = s"$tmpDir/zorder"
    val linDir = s"$tmpDir/linear"
    Layout.writeZOrdered(grid, Seq("x", "y"), zDir,
      bits = 6, numFiles = 16)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)

    def spreads(path: String): (Double, Double) = {
      val per = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .agg(avg("sx"), avg("sy")).head()
      (per.getDouble(0), per.getDouble(1))
    }
    val (zx, zy) = spreads(zDir)
    val (lx, ly) = spreads(linDir)
    // linear-on-x: x tight but y spans the whole grid (~63)
    assert(lx < 8 && ly > 55, s"linear layout: x=$lx y=$ly")
    // z-order: BOTH dimensions tight (16 files over a 64×64 grid ⇒
    // roughly 16×16 z-tiles; allow generous slack for cut placement)
    assert(zx < 40 && zy < 40, s"z layout: x=$zx y=$zy")
    // and a point filter on y touches a fraction of the z files
    val touched = spark.read.parquet(zDir).filter(col("y") === 5)
      .select(input_file_name()).distinct().count()
    assert(touched <= 8, s"y=5 spread over $touched of 16 z files")
  }
}
