package graft.sources.czi

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.core.ChunkGrid

/** CZI (ZISRAW) DataSource V2: `spark.read.format("czi")` — the scan that
  * [[CziSource.scan]] exposes as an API, as a first-class Spark source
  * (reference S2/S3, `utils.py:284-395,462-526`).
  *
  * Options: `path` (the .czi file), `stack` (defaults to the file name),
  * `chunk_z`/`chunk_y`/`chunk_x` (default 128each). Emits the same chunk
  * rows as the zarr connector (`stack, level, t, c, z, y, x, shape,
  * data`), so a CZI→Zarr conversion is literally
  * `spark.read.format("czi").load()...write.format("zarr")`.
  *
  * Planning: the driver parses only the subblock directory (KBs); one
  * InputPartition per (channel, z-slab), exactly the no-shuffle task
  * layout of [[CziSource.scan]]. Coordinate filters on `c` and `z` prune
  * PARTITIONS (whole slabs are never read), the same
  * plan-before-launch pruning the zarr scan does from `.zarray`
  * arithmetic.
  */
class CziDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "czi"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    graft.io.zarr.ZarrDataSource.chunkSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new CziTable(properties.asScala.toMap)
}

class CziTable(props: Map[String, String]) extends Table with SupportsRead {
  private val path = props.getOrElse("path", sys.error("czi: 'path' option required"))
  private val stack =
    props.getOrElse("stack", new Path(path).getName.stripSuffix(".czi"))
  private val chunkZyx = Array(
    props.getOrElse("chunk_z", "128").toInt,
    props.getOrElse("chunk_y", "128").toInt,
    props.getOrElse("chunk_x", "128").toInt)

  override def name(): String = s"czi:$path"
  override def schema(): StructType = graft.io.zarr.ZarrDataSource.chunkSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CziScanBuilder(path, stack, chunkZyx)
}

final case class CziInputPartition(cIdx: Int, slab: Int) extends InputPartition

class CziScanBuilder(path: String, stack: String, chunkZyx: Array[Int])
    extends ScanBuilder with SupportsPushDownFilters {

  // inclusive bounds on the chunk-grid c and z coordinates, refined by
  // accepted filters — slabs/channels outside them are never planned
  private var (cLo, cHi) = (0L, Long.MaxValue)
  private var (zLo, zHi) = (0L, Long.MaxValue)
  private var pushed = Array.empty[Filter]

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case EqualTo(a, _: java.lang.Integer) => a == "c" || a == "z"
      case GreaterThan(a, _: java.lang.Integer) => a == "c" || a == "z"
      case GreaterThanOrEqual(a, _: java.lang.Integer) => a == "c" || a == "z"
      case LessThan(a, _: java.lang.Integer) => a == "c" || a == "z"
      case LessThanOrEqual(a, _: java.lang.Integer) => a == "c" || a == "z"
      case _ => false
    }
    accepted.foreach {
      case EqualTo(a, v: java.lang.Integer) => refine(a, v.toLong, v.toLong)
      case GreaterThan(a, v: java.lang.Integer) => refine(a, v.toLong + 1, Long.MaxValue)
      case GreaterThanOrEqual(a, v: java.lang.Integer) => refine(a, v.toLong, Long.MaxValue)
      case LessThan(a, v: java.lang.Integer) => refine(a, 0L, v.toLong - 1)
      case LessThanOrEqual(a, v: java.lang.Integer) => refine(a, 0L, v.toLong)
      case _ => ()
    }
    pushed = accepted
    // keep accepted filters in the residual too (they are exact on rows,
    // but re-evaluating them is free and keeps the contract simple)
    filters
  }
  private def refine(axis: String, l: Long, h: Long): Unit =
    if (axis == "c") { cLo = math.max(cLo, l); cHi = math.min(cHi, h) }
    else { zLo = math.max(zLo, l); zHi = math.min(zHi, h) }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = graft.io.zarr.ZarrDataSource.chunkSchema
    override def toBatch: Batch = this

    // driver-side directory parse happens once at planning time
    private lazy val (vol, idx) = CziSource.volume(path, stack, chunkZyx)

    override def planInputPartitions(): Array[InputPartition] = {
      val zSlabs = ChunkGrid.ceilDiv(vol.shape(2), vol.chunk(2))
      val parts = for {
        c <- 0L until vol.shape(1) if c >= cLo && c <= cHi
        slab <- 0L until zSlabs if slab >= zLo && slab <= zHi
      } yield CziInputPartition(c.toInt, slab.toInt): InputPartition
      parts.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      CziReaderFactory(path, vol.stack, vol.shape, vol.chunk,
        idx.origin, idx.entries.toArray, vol.dtype.itemSize)
  }
}

final case class CziReaderFactory(path: String, stack: String,
    shape: Array[Long], chunk: Array[Int], origin: Array[Int],
    entries: Array[CziFormat.SubBlockEntry], itemSize: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CziInputPartition]
    new CziPartitionReader(this, p.cIdx, p.slab)
  }
}

/** Reads one (channel, slab): scatter the slab's subblocks into a buffer
  * (reference placement semantics, `utils.py:269-276`), cut chunk tiles,
  * emit one row per tile. Same kernel as [[CziSource.scan]]. */
class CziPartitionReader(f: CziReaderFactory, cIdx: Int, slab: Int)
    extends PartitionReader[InternalRow] {

  private val rows: Iterator[InternalRow] = {
    val conf = new Configuration()
    val p = new Path(f.path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      CziSource.slabChunks(in, f.entries, f.shape, f.chunk, f.origin,
          f.itemSize, cIdx, slab)
        .map { case (ty, tx, shape5, out) =>
          InternalRow(
            UTF8String.fromString(f.stack), 0, 0, cIdx, slab, ty, tx,
            ArrayData.toArrayData(shape5), out)
        }
        .toVector.iterator // materialize before the stream closes
    } finally in.close()
  }

  private var row: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { row = rows.next(); true } else false
  override def get(): InternalRow = row
  override def close(): Unit = ()
}
