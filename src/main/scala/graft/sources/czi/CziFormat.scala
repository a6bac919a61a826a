package graft.sources.czi

/** ZISRAW (Zeiss CZI) container constants — from the public ZISRAW
  * file-format specification (the format the reference reads through the
  * `czifile` package; reference scan: `utils.py:284-395`).
  *
  * Layout recap:
  *   - the file is a sequence of segments, each headed by
  *     `char Id[16]; int64 AllocatedSize; int64 UsedSize` (32 bytes),
  *     payloads little-endian, AllocatedSize 32-byte aligned;
  *   - `ZISRAWFILE` (at offset 0) carries the directory/metadata offsets;
  *   - `ZISRAWDIRECTORY` is `int32 EntryCount; byte[124] reserved` then
  *     packed `DirectoryEntryDV` records;
  *   - `DirectoryEntryDV`: `char[2] "DV"; int32 PixelType;
  *     int64 FilePosition; int32 FilePart; int32 Compression;
  *     byte PyramidType; byte[5] reserved; int32 DimensionCount;` then
  *     `DimensionCount` x `DimensionEntryDV1`;
  *   - `DimensionEntryDV1`: `char[4] Dimension; int32 Start; int32 Size;
  *     float StartCoordinate; int32 StoredSize` (20 bytes);
  *   - `ZISRAWSUBBLOCK` payload: `int32 MetadataSize; int32 AttachmentSize;
  *     int64 DataSize;` + a DirectoryEntryDV copy, with pixel data
  *     starting at `max(256, 16 + entrySize)` bytes into the payload.
  */
object CziFormat {
  val SegmentHeaderSize = 32
  val SubBlockFixedPart = 16 // MetadataSize + AttachmentSize + DataSize
  val SubBlockMinHeader = 256

  val IdFile = "ZISRAWFILE"
  val IdDirectory = "ZISRAWDIRECTORY"
  val IdSubBlock = "ZISRAWSUBBLOCK"
  val IdMetadata = "ZISRAWMETADATA"
  val IdDeleted = "DELETED"

  // PixelType (public enum)
  val PixelGray8 = 0
  val PixelGray16 = 1
  val PixelGray32Float = 2

  // Compression (public enum)
  val CompressionNone = 0
  val CompressionJpgXr = 4
  val CompressionZstd0 = 5 // bare zstd stream
  val CompressionZstd1 = 6 // zstd stream preceded by a small header

  def bytesPerPixel(pixelType: Int): Int = pixelType match {
    case PixelGray8 => 1
    case PixelGray16 => 2
    case PixelGray32Float => 4
    case other => throw new IllegalArgumentException(s"unsupported CZI pixel type $other")
  }

  /** One dimension record of a subblock directory entry. */
  final case class DimEntry(dim: String, start: Int, size: Int, storedSize: Int)

  /** One subblock directory entry: where it is, how it's packed, and the
    * coordinates it occupies in the global dimension space. */
  final case class SubBlockEntry(
      filePosition: Long,
      pixelType: Int,
      compression: Int,
      dims: Map[String, DimEntry]) {
    def start(d: String): Int = dims.get(d).map(_.start).getOrElse(0)
    def size(d: String): Int = dims.get(d).map(_.size).getOrElse(1)
  }

  /** Parsed file-level structure (driver-side; small). */
  final case class CziIndex(
      shape: Array[Long],       // [t,c,z,y,x] after squeeze+pad, minus offsets
      origin: Array[Int],       // global min start per [t,c,z,y,x]
      pixelType: Int,
      entries: Seq[SubBlockEntry])
}
