package graft.io.zarr

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** OME-NGFF / Zarr v2 metadata builders (driver-side, pure JSON).
  *
  * Behavioral port of the reference's metadata emit (SURVEY.md §2 K5):
  * omero block `czi_to_zarr.py:32-100`, multiscale coordinate
  * transformations `czi_to_zarr.py:103-199`, 5-D axes
  * `czi_to_zarr.py:202-223`, origin downscaling with center-shift
  * `czi_to_zarr.py:226-279`, pyramid provenance `czi_to_zarr.py:392-407`,
  * and the Zarr v2 array descriptor with `dimension_separator="/"`
  * (`czi_to_zarr.py:585-593`).
  */
object ZarrMeta {
  private val M = new ObjectMapper()

  def toJson(n: ObjectNode): String = M.writerWithDefaultPrettyPrinter().writeValueAsString(n)

  def zgroup: String = """{"zarr_format":2}"""

  /** Zarr v2 .zarray JSON for a <u2 (uint16 LE) dataset with Blosc/zstd. */
  def zarray(shape: Seq[Long], chunks: Seq[Int], clevel: Int = 3,
             compressed: Boolean = true, dtype: String = "<u2"): String = {
    val n = M.createObjectNode()
    n.put("zarr_format", 2)
    val shapeArr = n.putArray("shape"); shape.foreach(shapeArr.add)
    val chunkArr = n.putArray("chunks"); chunks.foreach(chunkArr.add)
    if (compressed) {
      val comp = n.putObject("compressor")
      comp.put("id", "blosc"); comp.put("cname", "zstd")
      comp.put("clevel", clevel); comp.put("shuffle", 1); comp.put("blocksize", 0)
    } else n.putNull("compressor")
    n.put("dtype", dtype)
    n.put("fill_value", 0)
    n.putNull("filters")
    n.put("order", "C")
    n.put("dimension_separator", "/")
    toJson(n)
  }

  /** 5-D TCZYX axes (reference `_get_axes_5d`). */
  def axes5d(node: ArrayNode): Unit = {
    def ax(name: String, typ: String, unit: Option[String]): Unit = {
      val a = node.addObject()
      a.put("name", name); a.put("type", typ)
      unit.foreach(a.put("unit", _))
    }
    ax("t", "time", Some("millisecond"))
    ax("c", "channel", None)
    ax("z", "space", Some("micrometer"))
    ax("y", "space", Some("micrometer"))
    ax("x", "space", Some("micrometer"))
  }

  /** Per-level origins with the reference's center-shift formula
    * (`czi_to_zarr.py:226-279`): at each halving the new origin moves by
    * voxel*(factor-1)/2 and the voxel size multiplies by the factor. */
  def downscaleOrigin(originZyx: Seq[Double], voxelZyx: Seq[Double],
                      factorZyx: Seq[Int], nLevels: Int): Seq[Seq[Double]] = {
    var origin = originZyx.toArray
    var voxel = voxelZyx.toArray
    val out = Seq.newBuilder[Seq[Double]]
    out += Seq(0.0, 0.0) ++ origin.toSeq
    for (_ <- 1 until nLevels) {
      origin = origin.indices.map(i => origin(i) + voxel(i) * (factorZyx(i) - 1) / 2.0).toArray
      voxel = voxel.indices.map(i => voxel(i) * factorZyx(i)).toArray
      out += Seq(0.0, 0.0) ++ origin.toSeq
    }
    out.result()
  }

  /** Per-level scale transforms (reference `_compute_scales`): level l has
    * scale [1, 1, vz*fz^l, vy*fy^l, vx*fx^l] plus optional translation. */
  def datasets(node: ArrayNode, nLevels: Int, voxelZyx: Seq[Double],
               factorZyx: Seq[Int], origins: Option[Seq[Seq[Double]]]): Unit = {
    var scale = voxelZyx.toArray
    for (l <- 0 until nLevels) {
      val d = node.addObject()
      d.put("path", l.toString)
      val cts = d.putArray("coordinateTransformations")
      val sc = cts.addObject()
      sc.put("type", "scale")
      val sa = sc.putArray("scale")
      sa.add(1.0); sa.add(1.0); scale.foreach(sa.add)
      origins.foreach { os =>
        val tr = cts.addObject()
        tr.put("type", "translation")
        val ta = tr.putArray("translation")
        os(l).foreach(ta.add)
      }
      scale = scale.indices.map(i => scale(i) * factorZyx(i)).toArray
    }
  }

  /** omero rendering metadata (reference `_build_ome`): per-channel window
    * with dtype min/max bounds and the constant (0, 550) display window
    * the reference uses instead of percentiles (`czi_to_zarr.py:551-555`). */
  def omero(node: ObjectNode, imageName: String, shape: Seq[Long],
            channelNames: Seq[String],
            minMax: (Double, Double) = (0.0, 65535.0),
            startEnd: (Double, Double) = (0.0, 550.0)): Unit = {
    node.put("id", 1)
    node.put("name", imageName)
    node.put("version", "0.4")
    val chs = node.putArray("channels")
    channelNames.zipWithIndex.foreach { case (name, i) =>
      val ch = chs.addObject()
      ch.put("active", true)
      ch.put("coefficient", 1)
      ch.put("color", f"$i%06x")
      ch.put("family", "linear")
      ch.put("inverted", false)
      ch.put("label", name)
      val w = ch.putObject("window")
      w.put("end", startEnd._2); w.put("max", minMax._2)
      w.put("min", minMax._1); w.put("start", startEnd._1)
    }
    val rdefs = node.putObject("rdefs")
    rdefs.put("defaultT", 0)
    rdefs.put("defaultZ", (shape(2) / 2).toInt)
    rdefs.put("model", "color")
  }

  /** Full .zattrs for a stack group: omero + multiscales (axes, datasets,
    * windowed-mean provenance; reference `write_ome_ngff_metadata` +
    * `_get_pyramid_metadata`). */
  /** Dtype display bounds for the omero window — the reference's
    * np.iinfo/np.finfo lookup (`czi_to_zarr.py:535-549`). */
  def dtypeMinMax(dtype: graft.core.PixelDtype): (Double, Double) = dtype match {
    case graft.core.PixelDtype.U8 => (0.0, 255.0)
    case graft.core.PixelDtype.U16 => (0.0, 65535.0)
    case graft.core.PixelDtype.F32 => (-Float.MaxValue.toDouble, Float.MaxValue.toDouble)
  }

  def stackAttrs(imageName: String, shape: Seq[Long], nLevels: Int,
                 voxelZyx: Seq[Double], factorZyx: Seq[Int],
                 channelNames: Seq[String],
                 originZyx: Option[Seq[Double]],
                 dtype: graft.core.PixelDtype = graft.core.PixelDtype.U16): String = {
    val root = M.createObjectNode()
    val om = root.putObject("omero")
    omero(om, imageName, shape, channelNames, minMax = dtypeMinMax(dtype))
    val multiscales = root.putArray("multiscales")
    val ms = multiscales.addObject()
    val axes = ms.putArray("axes")
    axes5d(axes)
    val ds = ms.putArray("datasets")
    val origins = originZyx.map(o => downscaleOrigin(o, voxelZyx, factorZyx, nLevels))
    datasets(ds, nLevels, voxelZyx, factorZyx, origins)
    val meta = ms.putObject("metadata")
    meta.put("description", "Downscaling using the windowed mean")
    meta.put("method", "windowed_mean")
    meta.put("args", "[false]")
    meta.putObject("kwargs")
    ms.put("name", s"/$imageName")
    ms.put("version", "0.4")
    toJson(root)
  }
}
