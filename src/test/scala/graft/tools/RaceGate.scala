package graft.tools

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, TimeUnit}

import scala.jdk.CollectionConverters._

import graft.Spark

/** REAL two-process proof of the Materialized cross-JVM commit protocol
  * (VERDICT r16 ask #1 — the round's new contract with no direct test):
  * fork two genuinely separate JVMs, point both at ONE shared persistent
  * scratch root via `-Dgraft.scratch.root`, release them into the same
  * tag's first touch simultaneously (barrier file), and assert what the
  * scaladoc promises:
  *
  *   - both processes exit clean and read VALUE-EQUAL relations
  *     (rows + checksum match each other and the deterministic truth);
  *   - exactly one committed artifact: `_SUCCESS` present, exactly 3
  *     part files, and every part file carries ONE write-job UUID — a
  *     mixed commit (files from both writers' stagings) is impossible
  *     to miss because Spark embeds the job UUID in each part name;
  *   - no `.staging-*` / `.trash-*` residue under the tag dir, and no
  *     dot-directories nested inside the committed artifact;
  *   - a fresh reader (this process) sees the same values.
  *
  * Iterations alternate a clean first touch with a PRE-PLANTED GARBAGE
  * target (a `rel.parquet` dir with a junk part file and no `_SUCCESS` —
  * a crashed writer's leftover), so the rename-aside garbage-clearing
  * path (the ADVICE r16 TOCTOU fix) is contended by two real processes,
  * not just unit-tested.
  *
  * Usage: sbt "Test/runMain graft.tools.RaceGate [iterations] [outPath]"
  * Writes RACE_GATE.json; nonzero exit on any violated invariant.
  */
object RaceGate {

  private[tools] final case class WriterOut(exit: Int, ready: Boolean,
      built: Int, rows: Long, sum: Long, log: String)

  private[tools] def launch(cp: String, addOpens: Seq[String], root: String,
      tag: String, barrier: String, id: String,
      readyLatch: CountDownLatch,
      extraProps: Seq[String] = Nil): (Process, () => WriterOut) = {
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-XX:+UseG1GC",
      "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      s"-Dgraft.scratch.root=$root") ++ extraProps ++ Seq(
      "-cp", cp, "graft.tools.RaceWriter", tag, barrier, id)
    val pb = new ProcessBuilder(cmd.asJava).redirectErrorStream(true)
    val p = pb.start()
    val buf = new StringBuilder
    @volatile var built = -1; @volatile var rows = -1L; @volatile var sum = -1L
    @volatile var ready = false
    val t = new Thread(() => {
      val r = new java.io.BufferedReader(new java.io.InputStreamReader(p.getInputStream))
      var line = r.readLine()
      while (line != null) {
        buf.synchronized { buf.append(line).append('\n') }
        if (line.startsWith("RACE_READY")) { ready = true; readyLatch.countDown() }
        if (line.startsWith("RACE_RESULT")) {
          val kv = line.split("\\s+").drop(1)
            .map(_.split("=", 2)).collect { case Array(k, v) => k -> v }.toMap
          built = kv("built").toInt; rows = kv("rows").toLong; sum = kv("sum").toLong
        }
        line = r.readLine()
      }
    })
    t.setDaemon(true); t.start()
    (p, () => WriterOut(p.exitValue(), ready, built, rows, sum,
      buf.synchronized(buf.toString)))
  }

  /** The forked JVM's --add-opens set (Spark 4 on JDK 17 needs them
    * outside spark-submit); read from THIS JVM instead of duplicating
    * build.sbt's list. Shared with [[S3RaceGate]]. */
  private[tools] def currentAddOpens: Seq[String] = {
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toVector
    val b = Seq.newBuilder[String]
    var i = 0
    while (i < jvmArgs.length) {
      if (jvmArgs(i) == "--add-opens" && i + 1 < jvmArgs.length) {
        b += jvmArgs(i) += jvmArgs(i + 1); i += 2
      } else if (jvmArgs(i).startsWith("--add-opens=")) { b += jvmArgs(i); i += 1 }
      else i += 1
    }
    b.result()
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val iterations = if (args.nonEmpty) args(0).toInt else 4
    val outPath = if (args.length > 1) args(1) else "RACE_GATE.json"
    val cp = sys.props("java.class.path")
    val addOpens = currentAddOpens
    val spark = Spark.session(master = "local[4]", shufflePartitions = 4,
      appName = "graft-race-gate")
    val expSum = RaceWriter.expectedSum
    var allPass = true
    val results = (1 to iterations).map { iter =>
      val root = Files.createTempDirectory(s"race-root-$iter").toString
      val tag = "race-tag"
      val mvDir = Paths.get(root, s"graft-mv-$tag")
      val target = mvDir.resolve("rel.parquet")
      val garbage = iter % 2 == 0
      if (garbage) {
        // a crashed writer's leftover: data-shaped bytes, no _SUCCESS —
        // both racers must take the rename-aside clearing path
        Files.createDirectories(target)
        Files.write(target.resolve("part-00000-deadbeef-c000.snappy.parquet"),
          Array.fill[Byte](128)(7))
      }
      val barrier = Paths.get(root, "go")
      val readyLatch = new CountDownLatch(2)
      val (p1, o1) = launch(cp, addOpens, root, tag, barrier.toString, "A", readyLatch)
      val (p2, o2) = launch(cp, addOpens, root, tag, barrier.toString, "B", readyLatch)
      require(readyLatch.await(180, TimeUnit.SECONDS), "writers never got READY")
      Files.write(barrier, "go".getBytes("UTF-8"))
      require(p1.waitFor(240, TimeUnit.SECONDS) && p2.waitFor(240, TimeUnit.SECONDS),
        "a writer hung past the deadline")
      val (w1, w2) = (o1(), o2())

      // committed-artifact invariants, checked from a THIRD process
      val success = Files.exists(target.resolve("_SUCCESS"))
      val children = Files.list(target).iterator.asScala.map(_.getFileName.toString).toVector
      val parts = children.filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      // part-00000-<job-uuid>-c000.snappy.parquet: one committed write =
      // one UUID; a mixed file set would carry two
      val uuidRe = "part-\\d+-([0-9a-f-]{36})-c\\d+".r
      val uuids = parts.flatMap(n => uuidRe.findFirstMatchIn(n).map(_.group(1))).distinct
      val nestedDotDirs = children.filter(n =>
        n.startsWith(".") && Files.isDirectory(target.resolve(n)))
      val residue = Files.list(mvDir).iterator.asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith(".staging-") || n.startsWith(".trash-")).toVector
      val fresh = spark.read.parquet(target.toString)
        .selectExpr("count(1) AS n", "sum(h) AS s").collect()(0)
      val valuesOk = Seq(w1, w2).forall(w =>
        w.rows == RaceWriter.Rows && w.sum == expSum) &&
        fresh.getLong(0) == RaceWriter.Rows && fresh.getLong(1) == expSum
      val pass = w1.exit == 0 && w2.exit == 0 && success &&
        parts.length == 3 && uuids.length == 1 && nestedDotDirs.isEmpty &&
        residue.isEmpty && valuesOk
      if (!pass) {
        allPass = false
        System.err.println(s"iter $iter FAILED:\n--- A ---\n${w1.log}\n--- B ---\n${w2.log}\n" +
          s"success=$success parts=$parts uuids=$uuids nested=$nestedDotDirs residue=$residue " +
          s"fresh=(${fresh.getLong(0)},${fresh.getLong(1)})")
      }
      val line = s"""{"iter":$iter,"garbage_planted":$garbage,""" +
        s""""exit":[${w1.exit},${w2.exit}],"built":[${w1.built},${w2.built}],""" +
        s""""rows":[${w1.rows},${w2.rows}],"sums_equal":${w1.sum == w2.sum},""" +
        s""""n_part_files":${parts.length},"n_writer_uuids":${uuids.length},""" +
        s""""success_marker":$success,"staging_or_trash_residue":${residue.length},""" +
        s""""nested_dot_dirs":${nestedDotDirs.length},"fresh_reader_values_ok":$valuesOk,""" +
        s""""pass":$pass}"""
      println(line)
      line
    }
    val json =
      s"""{
  "contract": "two driver JVMs racing one persistent root: single committed artifact, value-equal readers, no residue",
  "rows_per_build": ${RaceWriter.Rows},
  "iterations": $iterations,
  "results": [
    ${results.mkString(",\n    ")}
  ],
  "pass": $allPass
}
"""
    Files.write(Paths.get(outPath), json.getBytes("UTF-8"))
    println(s"RACE GATE: ${if (allPass) "green" else "RED"}")
    spark.stop()
    if (!allPass) sys.exit(1)
  }
}
