package graft.tools

import java.nio.file.{Files, Paths}

import graft.sources.SyntheticStack
import graft.sources.czi.SyntheticCzi

/** Dev fixture generator: writes a synthetic SPIM input tree (CZI +
  * acquisition.json) so the ZeissJob CLI can be driven end-to-end without
  * real Zeiss data. Test scope only. */
object MakeCzi {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/graft-zeiss-demo")
    val nz = if (args.length > 1) args(1).toInt else 64
    val ny = if (args.length > 2) args(2).toInt else 256
    val nx = if (args.length > 3) args(3).toInt else 256
    Files.createDirectories(Paths.get(s"$root/SPIM"))
    val data = Array.tabulate(nz, ny, nx)((z, y, x) => SyntheticStack.value(z, y, x))
    SyntheticCzi.write(s"$root/SPIM/demo.czi", data)
    Files.writeString(Paths.get(s"$root/acquisition.json"),
      """{"tiles":[{"coordinate_transformations":[
        |{"type":"scale","scale":["0.196","0.196","1.0"]},
        |{"type":"translation","translation":[0,0,0]}]}]}""".stripMargin)
    println(s"wrote $root/SPIM/demo.czi ($nz x $ny x $nx Gray16)")
  }
}
