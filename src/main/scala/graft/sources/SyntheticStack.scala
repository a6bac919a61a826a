package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.core.{ChunkGrid, PixelCodec, Volume, ZarrChunk}

/** Distributed synthetic 5-D stack generator (the pluggable stand-in for
  * the CZI source, SURVEY.md §7.2.3).
  *
  * Chunks are enumerated with `spark.range(numChunks)` — pure arithmetic,
  * no driver-side list — so generation scales to arbitrarily large grids
  * exactly like a real distributed scan would (SURVEY.md §7.5 #6). The
  * voxel value function is a small deterministic polynomial so DuckDB
  * oracles can recompute it from `range()` arithmetic.
  */
object SyntheticStack {

  /** v(z,y,x) = (31z + 17y + 13x) mod 65536 — uint16, oracle-expressible. */
  def value(z: Long, y: Long, x: Long): Int =
    ((31L * z + 17L * y + 13L * x) % 65536L).toInt

  /** Generate the full chunked volume as a Dataset[ZarrChunk]. */
  def generate(spark: SparkSession, vol: Volume): Dataset[ZarrChunk] = {
    import spark.implicits._
    val grid = vol.grid
    val shape = vol.shape
    val chunk = vol.chunk
    val stack = vol.stack
    val level = vol.level
    spark.range(vol.numChunks).map { flat =>
      val coords = ChunkGrid.chunkCoords(flat, grid)
      val cs = ChunkGrid.clampedChunkShape(coords, shape, chunk)
      val z0 = coords(2) * chunk(2)
      val y0 = coords(3) * chunk(3)
      val x0 = coords(4) * chunk(4)
      val pixels = new Array[Int](cs.product)
      var i = 0
      var z = 0
      while (z < cs(2)) {
        var y = 0
        while (y < cs(3)) {
          var x = 0
          while (x < cs(4)) {
            pixels(i) = value(z0 + z, y0 + y, x0 + x)
            i += 1
            x += 1
          }
          y += 1
        }
        z += 1
      }
      ZarrChunk(stack, level, coords(0).toInt, coords(1).toInt,
        coords(2).toInt, coords(3).toInt, coords(4).toInt,
        cs, PixelCodec.toBytes(pixels))
    }
  }
}
