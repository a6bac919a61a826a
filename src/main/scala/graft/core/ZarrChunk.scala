package graft.core

/** One Zarr chunk of a 5-D TCZYX stack — the engine's core array record.
  *
  * Mirrors the reference's data model (SURVEY.md §1): dense uint16 pixels,
  * canonical 5-D TCZYX with t/c singleton (reference assumes one channel
  * per CZI file, `utils.py:355`), chunk grid indices + actual chunk shape
  * (edge chunks are clamped, reference `czi_to_zarr.py:153-161`).
  *
  * `data` holds raw little-endian uint16 pixels in C (row-major, x fastest)
  * order — exactly the bytes a Zarr v2 `<u2` chunk file contains before
  * compression. Pixels are decoded to Int (masked `& 0xFFFF`) only inside
  * operators: JVM Short is signed, so all arithmetic happens on Int/Long
  * (SURVEY.md §7.5 hard part #2).
  *
  * @param stack logical stack (image) name
  * @param level pyramid level (0 = full resolution)
  * @param t,c,z,y,x chunk-grid indices (not voxel coords)
  * @param shape actual chunk shape [t,c,z,y,x] after edge clamping
  * @param data  raw LE uint16 bytes, length = shape.product * 2
  */
final case class ZarrChunk(
    stack: String,
    level: Int,
    t: Int, c: Int, z: Int, y: Int, x: Int,
    shape: Array[Int],
    data: Array[Byte]) {

  def numVoxels: Int = shape.product

  /** Decode pixels to unsigned values in an Int array (uint16 semantics). */
  def pixels: Array[Int] = PixelCodec.toInts(data)
}

object PixelCodec {
  /** LE uint16 bytes -> Int array with unsigned semantics. */
  def toInts(bytes: Array[Byte]): Array[Int] = {
    val n = bytes.length / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = (bytes(2 * i) & 0xFF) | ((bytes(2 * i + 1) & 0xFF) << 8)
      i += 1
    }
    out
  }

  /** Int array (0..65535) -> LE uint16 bytes. Values are masked, not checked. */
  def toBytes(pixels: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](pixels.length * 2)
    var i = 0
    while (i < pixels.length) {
      out(2 * i) = (pixels(i) & 0xFF).toByte
      out(2 * i + 1) = ((pixels(i) >>> 8) & 0xFF).toByte
      i += 1
    }
    out
  }
}
