package graft.io.zarr

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Minimal JSON-Schema validator covering the keyword subset the
  * committed NGFF 0.4 image schema uses (type, required, properties,
  * items, minItems/maxItems, enum, const, pattern, anyOf). The emitted
  * OME-NGFF metadata was previously checked only against golden JSON
  * from this same codebase; this gives it an INDEPENDENT check against
  * the published NGFF spec's schema (reference analogue:
  * `ome_zarr.format.CurrentFormat()` validation, czi_to_zarr.py:300-320).
  *
  * Deliberately $ref-free: the schema resource is inlined, keeping the
  * validator ~100 lines and offline.
  */
object JsonSchema {
  private val M = new ObjectMapper()

  /** Violations of `schema` in `doc` (empty = valid). */
  def validate(schema: JsonNode, doc: JsonNode, path: String = "$"): Seq[String] = {
    val errs = Seq.newBuilder[String]

    def typeName(n: JsonNode): String =
      if (n.isTextual) "string"
      else if (n.isIntegralNumber) "integer"
      else if (n.isNumber) "number"
      else if (n.isBoolean) "boolean"
      else if (n.isArray) "array"
      else if (n.isObject) "object"
      else if (n.isNull) "null"
      else "unknown"

    def typeMatches(want: String, n: JsonNode): Boolean = want match {
      case "number"  => n.isNumber
      case "integer" => n.isIntegralNumber
      case other     => typeName(n) == other
    }

    Option(schema.get("type")).foreach { t =>
      val wanted = if (t.isArray) t.elements().asScala.map(_.asText()).toSeq else Seq(t.asText())
      if (!wanted.exists(typeMatches(_, doc)))
        errs += s"$path: expected type ${wanted.mkString("|")}, got ${typeName(doc)}"
    }

    Option(schema.get("const")).foreach { c =>
      if (doc != c) errs += s"$path: expected const $c, got $doc"
    }

    Option(schema.get("enum")).foreach { e =>
      if (!e.elements().asScala.contains(doc))
        errs += s"$path: value $doc not in enum $e"
    }

    Option(schema.get("pattern")).foreach { p =>
      if (doc.isTextual && !p.asText().r.findFirstIn(doc.asText()).isDefined)
        errs += s"$path: '${doc.asText()}' does not match pattern ${p.asText()}"
    }

    if (doc.isObject) {
      Option(schema.get("required")).foreach(_.elements().asScala.foreach { r =>
        if (!doc.has(r.asText())) errs += s"$path: missing required property '${r.asText()}'"
      })
      Option(schema.get("properties")).foreach { props =>
        props.properties().asScala.foreach { e =>
          if (doc.has(e.getKey))
            errs ++= validate(e.getValue, doc.get(e.getKey), s"$path.${e.getKey}")
        }
      }
    }

    if (doc.isArray) {
      val n = doc.size()
      Option(schema.get("minItems")).foreach(m =>
        if (n < m.asInt()) errs += s"$path: ${n} items < minItems ${m.asInt()}")
      Option(schema.get("maxItems")).foreach(m =>
        if (n > m.asInt()) errs += s"$path: ${n} items > maxItems ${m.asInt()}")
      Option(schema.get("items")).foreach { itemSchema =>
        doc.elements().asScala.zipWithIndex.foreach { case (el, i) =>
          errs ++= validate(itemSchema, el, s"$path[$i]")
        }
      }
    }

    Option(schema.get("anyOf")).foreach { alts =>
      val branches = alts.elements().asScala.toSeq.map(validate(_, doc, path))
      if (!branches.exists(_.isEmpty))
        errs += s"$path: no anyOf branch matched (closest: ${branches.minBy(_.size).mkString("; ")})"
    }

    errs.result()
  }

  private lazy val ngffImageSchema: JsonNode = {
    val in = getClass.getResourceAsStream("/ngff/image.schema.json")
    require(in != null, "ngff/image.schema.json missing from classpath")
    try M.readTree(in) finally in.close()
  }

  /** Validate a .zattrs JSON document against the committed NGFF 0.4
    * image schema; returns violations (empty = valid). */
  def validateNgffImage(zattrsJson: String): Seq[String] =
    validate(ngffImageSchema, M.readTree(zattrsJson))
}
