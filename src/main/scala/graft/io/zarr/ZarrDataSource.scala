package graft.io.zarr

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{Blosc, ChunkGrid}

/** Zarr v2 DataSource V2: `spark.read.format("zarr")` over a chunk store
  * and `df.write.format("zarr")` into one — the engine's array storage as
  * a first-class Spark source/sink (SURVEY.md §4: the one custom physical
  * component the design calls for; replaces reference K1/S6,
  * `czi_to_zarr.py:585-608,611,624`).
  *
  * Options: `path` (store root), `stack`, `level`.
  *
  * Read: one InputPartition per chunk-grid slab — planned from `.zarray`
  * arithmetic, never by listing (at 100 TB the store has billions of
  * chunk files; listing is the scalability bug the plan avoids). Each
  * reader opens only its own chunk files; missing files yield
  * fill-value (zeros) chunks, matching Zarr semantics.
  *
  * Write: each task Blosc-compresses and atomically renames its own
  * chunk files (lock-free, reference X8); commit is metadata-free
  * because chunk placement is deterministic by coordinates.
  */
class ZarrDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "zarr"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZarrDataSource.chunkSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ZarrTable(properties.asScala.toMap)
}

object ZarrDataSource {
  /** Row shape of a chunk store scan — mirrors [[graft.core.ZarrChunk]]. */
  val chunkSchema: StructType = StructType(Seq(
    StructField("stack", StringType, nullable = false),
    StructField("level", IntegerType, nullable = false),
    StructField("t", IntegerType, nullable = false),
    StructField("c", IntegerType, nullable = false),
    StructField("z", IntegerType, nullable = false),
    StructField("y", IntegerType, nullable = false),
    StructField("x", IntegerType, nullable = false),
    StructField("shape", ArrayType(IntegerType), nullable = false),
    StructField("data", BinaryType, nullable = false)))
}

class ZarrTable(props: Map[String, String]) extends Table with SupportsRead with SupportsWrite {
  private val root = props.getOrElse("path", sys.error("zarr: 'path' option required"))
  // stack/level identify a dataset for reads; writes take them per-row
  private def stack = props.getOrElse("stack", sys.error("zarr: 'stack' option required for reads"))
  private def level = props.getOrElse("level", "0").toInt

  override def name(): String = s"zarr:$root"
  override def schema(): StructType = ZarrDataSource.chunkSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZarrScanBuilder(root, stack, level)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ZarrWriteBuilder(root, props.getOrElse("clevel", "3").toInt,
      props.getOrElse("typesize", "2").toInt)
}

final case class ZarrInputPartition(firstChunk: Long, lastChunk: Long) extends InputPartition

class ZarrScanBuilder(root: String, stack: String, level: Int) extends ScanBuilder {
  override def build(): Scan = new ZarrScan(root, stack, level)
}

class ZarrScan(root: String, stack: String, level: Int) extends Scan with Batch {
  // driver-side: only the tiny .zarray descriptor is read; the chunk grid
  // stays arithmetic
  private lazy val meta = ZarrIO.readZarray(root, stack, level)
  private lazy val (shape, chunk, compressed) = (meta.shape, meta.chunk, meta.compressed)
  private lazy val grid = ChunkGrid.gridShape(shape, chunk)

  override def readSchema(): StructType = ZarrDataSource.chunkSchema
  override def toBatch: Batch = this
  override def description(): String = s"ZarrScan($root/$stack/$level)"

  override def planInputPartitions(): Array[InputPartition] = {
    val total = grid.product
    val targetPartitions = math.min(total, 256L)
    val per = ChunkGrid.ceilDiv(total, targetPartitions)
    (0L until total by per)
      .map(s => ZarrInputPartition(s, math.min(s + per, total) - 1))
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ZarrReaderFactory(root, stack, level, shape, chunk, compressed,
      meta.dtype.itemSize, grid)
}

final case class ZarrReaderFactory(root: String, stack: String, level: Int,
                                   shape: Array[Long], chunk: Array[Int],
                                   compressed: Boolean, itemSize: Int, grid: Array[Long])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ZarrInputPartition]
    new ZarrPartitionReader(root, stack, level, shape, chunk, compressed, itemSize,
      grid, p.firstChunk, p.lastChunk)
  }
}

class ZarrPartitionReader(root: String, stack: String, level: Int,
                          shape: Array[Long], chunk: Array[Int], compressed: Boolean,
                          itemSize: Int, grid: Array[Long], first: Long, last: Long)
    extends PartitionReader[InternalRow] {

  private val fs = new Path(root).getFileSystem(new Configuration())
  private var cur = first - 1
  private var row: InternalRow = _

  override def next(): Boolean = {
    cur += 1
    if (cur > last) return false
    val coords = ChunkGrid.chunkCoords(cur, grid)
    val cs = ChunkGrid.clampedChunkShape(coords, shape, chunk)
    val p = new Path(s"$root/$stack/$level/${coords.mkString("/")}")
    val raw =
      if (!fs.exists(p)) new Array[Byte](cs.product * itemSize) // fill_value=0 chunk
      else {
        val in = fs.open(p)
        val buf = try {
          val st = fs.getFileStatus(p)
          val b = new Array[Byte](st.getLen.toInt)
          in.readFully(0, b)
          b
        } finally in.close()
        if (compressed) Blosc.decompress(buf) else buf
      }
    row = InternalRow(
      UTF8String.fromString(stack), level,
      coords(0).toInt, coords(1).toInt, coords(2).toInt, coords(3).toInt, coords(4).toInt,
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(cs),
      raw)
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}

class ZarrWriteBuilder(root: String, clevel: Int, typesize: Int)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false

  // mode("overwrite") on a path-identified table = truncate: clear existing
  // chunk data but keep the store's dot-metadata (.zgroup/.zattrs/.zarray)
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new ZarrBatchWrite(root, clevel, typesize, doTruncate)
  }
}

class ZarrBatchWrite(root: String, clevel: Int, typesize: Int, truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    if (truncate) {
      // driver-side, before any task launches: remove chunk subtrees
      // (non-dot children of each stack/level dir) so stale chunks from a
      // previous, larger extent can't survive the overwrite
      val fs = new Path(root).getFileSystem(new Configuration())
      val rootPath = new Path(root)
      if (fs.exists(rootPath)) {
        for (stack <- fs.listStatus(rootPath) if stack.isDirectory && !stack.getPath.getName.startsWith(".");
             level <- fs.listStatus(stack.getPath) if level.isDirectory && !level.getPath.getName.startsWith(".");
             child <- fs.listStatus(level.getPath) if !child.getPath.getName.startsWith("."))
          fs.delete(child.getPath, true)
      }
    }
    ZarrWriterFactory(root, clevel, typesize)
  }
  // chunk placement is deterministic by coordinates and writes are atomic
  // renames — no commit coordination needed
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final case class ZarrWriterFactory(root: String, clevel: Int, typesize: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ZarrDataWriter(root, clevel, typesize)
}

class ZarrDataWriter(root: String, clevel: Int, defaultTypesize: Int) extends DataWriter[InternalRow] {
  private lazy val fs = {
    val f = new Path(root).getFileSystem(new Configuration())
    f.setWriteChecksum(false)
    f
  }
  // per-(stack,level) codec settings from the store's own .zarray: writing
  // into a store whose metadata says compressor=null must emit raw chunks,
  // and the shuffle stride must match the declared dtype — otherwise a
  // reader honoring the metadata mis-decodes what we wrote
  private val codecCache = scala.collection.mutable.Map.empty[(String, Int), (Boolean, Int)]
  private def codecFor(stack: String, level: Int): (Boolean, Int) =
    codecCache.getOrElseUpdate((stack, level), {
      try {
        val m = ZarrIO.readZarray(root, stack, level)
        (m.compressed, m.dtype.itemSize)
      } catch { case _: java.io.IOException | _: java.io.FileNotFoundException =>
        (true, defaultTypesize) // no metadata yet: fall back to options
      }
    })

  override def write(r: InternalRow): Unit = {
    val stack = r.getUTF8String(0).toString
    val level = r.getInt(1)
    val (t, c, z, y, x) = (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6))
    val data = r.getBinary(8)
    val (compressed, typesize) = codecFor(stack, level)
    val dir = new Path(s"$root/$stack/$level/$t/$c/$z/$y")
    val tmp = new Path(dir, s".tmp-$x-${java.util.UUID.randomUUID}")
    val payload = if (compressed) Blosc.compress(data, typesize, clevel) else data
    val out = fs.create(tmp, true)
    try out.write(payload) finally out.close()
    if (!fs.rename(tmp, new Path(dir, x.toString))) fs.delete(tmp, false)
  }

  override def commit(): WriterCommitMessage = new WriterCommitMessage {}
  override def abort(): Unit = ()
  override def close(): Unit = ()
}
