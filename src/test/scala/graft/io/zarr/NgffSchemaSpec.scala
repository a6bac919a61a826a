package graft.io.zarr

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{PixelDtype, Volume}

/** The emitted OME-NGFF metadata must validate against the committed
  * NGFF 0.4 image schema — an independent check (the golden-JSON specs
  * compare the emitter against itself). */
class NgffSchemaSpec extends AnyFunSuite {

  private val M = new ObjectMapper()

  test("stackAttrs validates for every dtype / channel / origin configuration") {
    val cases = Seq(
      ZarrMeta.stackAttrs("s", Seq(1L, 1L, 64L, 64L, 64L), 4,
        Seq(1.0, 0.5, 0.5), Seq(2, 2, 2), Seq("ch0"), None),
      ZarrMeta.stackAttrs("s2", Seq(1L, 3L, 16L, 32L, 32L), 2,
        Seq(2.0, 0.25, 0.25), Seq(2, 2, 2), Seq("ch0", "ch1", "ch2"),
        Some(Seq(0.0, 0.0, 0.0)), PixelDtype.U8),
      ZarrMeta.stackAttrs("s3", Seq(1L, 1L, 8L, 8L, 8L), 1,
        Seq(1.0, 1.0, 1.0), Seq(2, 2, 2), Seq("ch0"),
        Some(Seq(1.5, 2.5, 3.5)), PixelDtype.F32))
    for (attrs <- cases) {
      val v = JsonSchema.validateNgffImage(attrs)
      assert(v.isEmpty, s"violations: ${v.mkString("; ")}\nin: $attrs")
    }
  }

  test("every .zattrs written into a store validates on disk") {
    val dir = Files.createTempDirectory("ngff-val").toString
    val vol = Volume("nv", 0, Array(1L, 2L, 16L, 16L, 16L), Array(1, 1, 8, 8, 8))
    ZarrIO.writeMetadata(dir, vol, nLevels = 3, Seq(1.0, 0.5, 0.5), Seq(2, 2, 2),
      Seq("ch0", "ch1"), Some(Seq(0.0, 0.0, 0.0)))
    val zattrs = Files.walk(Paths.get(dir)).filter(_.getFileName.toString == ".zattrs")
    zattrs.forEach { p =>
      val v = JsonSchema.validateNgffImage(Files.readString(p))
      assert(v.isEmpty, s"$p violations: ${v.mkString("; ")}")
    }
  }

  test("the validator actually rejects non-conformant documents") {
    val good = M.readTree(ZarrMeta.stackAttrs("s", Seq(1L, 1L, 8L, 8L, 8L), 2,
      Seq(1.0, 1.0, 1.0), Seq(2, 2, 2), Seq("ch0"), None))

    // drop a required member: datasets
    val noDatasets = good.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]
    noDatasets.get("multiscales").get(0)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode].remove("datasets")
    assert(JsonSchema.validate(schema, noDatasets).exists(_.contains("datasets")))

    // six axes exceed the 0.4 maximum of five
    val sixAxes = good.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]
    val axes = sixAxes.get("multiscales").get(0).get("axes")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
    axes.addObject().put("name", "q").put("type", "space")
    assert(JsonSchema.validate(schema, sixAxes).exists(_.contains("maxItems")))

    // a transformation that is neither scale nor translation
    val badXform = good.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]
    badXform.get("multiscales").get(0).get("datasets").get(0)
      .get("coordinateTransformations").get(0)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      .put("type", "rotation")
    assert(JsonSchema.validate(schema, badXform).exists(_.contains("anyOf")))

    // a malformed omero color
    val badColor = good.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]
    badColor.get("omero").get("channels").get(0)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      .put("color", "red")
    assert(JsonSchema.validate(schema, badColor).exists(_.contains("pattern")))
  }

  private lazy val schema = {
    val in = getClass.getResourceAsStream("/ngff/image.schema.json")
    try M.readTree(in) finally in.close()
  }
}
