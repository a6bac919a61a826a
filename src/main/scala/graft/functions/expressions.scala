package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import graft.core.Blosc

/** Custom Catalyst expressions (SURVEY.md §7.4 "custom Catalyst —
  * optional, small"): native codegen where the built-in surface can't
  * reach it.
  *
  * [[VectorDot]] exists because the composable alternative —
  * `aggregate(zip_with(a, b, ...), ...)` — runs as interpreted
  * higher-order functions with per-element lambda dispatch and never
  * enters whole-stage codegen. The expression emits a tight primitive
  * loop instead; accumulation is sequential in index order with double
  * precision, bit-identical to the HOF formulation (and the DuckDB
  * oracle's `list_dot_product` on DOUBLE[]).
  *
  * [[BloscCompress]]/[[BloscDecompress]] expose the chunk codec (K4,
  * reference `zeiss_job.py:89-101`) at the SQL/DataFrame layer, so a
  * plain `spark.read.format("binaryFile")` over a Zarr store can decode
  * chunks in-plan. They are CodegenFallback on purpose: zstd dominates
  * the cost, codegen would only inline the call.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elem(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elem(left).isDefined && elem(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_dot expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  @inline private def get(x: ArrayData, t: DataType, i: Int): Double =
    if (t == FloatType) x.getFloat(i).toDouble else x.getDouble(i)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lt, rt) = (elem(left).get, elem(right).get)
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += get(x, lt, i) * get(y, rt, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      def rd(v: String, t: DataType) =
        if (t == FloatType) s"((double) $v.getFloat($i))" else s"$v.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${rd(a, elem(left).get)} * ${rd(b, elem(right).get)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** First `nibbles` hex digits of md5(utf8(s)) as a BIGINT — the engine's
  * universal deterministic hash, exactly equal to the composed idiom
  * `CAST(conv(substr(md5(s), 1, nibbles), 16, 10) AS BIGINT)` (and the
  * DuckDB oracle's `('0x' || substr(md5(s), 1, nibbles))::BIGINT`), so
  * swapping it in changes NO gated value.
  *
  * Why native: the composed form materializes a 32-char hex string, a
  * substring, and a base-16 string parse per row — measured as the
  * dominant cost of the substring-window dedup (d14 hashes ~1k windows
  * per document). This expression digests the UTF-8 bytes and assembles
  * the value from the first 8 digest bytes directly; codegen holds one
  * MessageDigest per operator instance. `nibbles` <= 15 keeps the value
  * inside a non-negative Long. */
case class Md5Bits(child: Expression, nibbles: Int) extends UnaryExpression {
  require(nibbles >= 1 && nibbles <= 15, s"nibbles must be in [1, 15], got $nibbles")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"md5_bits expects a string input, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_bits"

  // one digest instance per thread — interpreted eval can run
  // concurrently on a shared expression tree
  @transient private lazy val md =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override protected def nullSafeEval(v: Any): Any = {
    val d = md.get()
    d.reset()
    val digest = d.digest(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (digest(i) & 0xFFL); i += 1 }
    acc >>> (4 * (16 - nibbles))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val digestRef = ctx.addMutableState("java.security.MessageDigest", "md5BitsDigest",
        v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }""".stripMargin)
      val d = ctx.freshName("digest")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |$digestRef.reset();
         |byte[] $d = $digestRef.digest($c.getBytes());
         |long $acc = 0L;
         |for (int $i = 0; $i < 8; $i++) { $acc = ($acc << 8) | ($d[$i] & 0xFFL); }
         |${ev.value} = $acc >>> ${4 * (16 - nibbles)};
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Morton (Z-order) interleave of the low 16 bits of two non-negative
  * integers — the multi-dimensional CLUSTERING KEY a lakehouse writer
  * sorts by so that min/max zone maps prune on BOTH dimensions (Delta
  * `OPTIMIZE ZORDER BY` / Iceberg sort-order semantics): sorting by the
  * interleaved key gives every contiguous file a bounded rectangle in
  * (x, y) space, so a predicate on either column skips most files.
  * Bit i of x lands at position 2i, bit i of y at 2i+1; the result is
  * in [0, 2^32) and exactly equals the 32-term shift/mask sum the SQL
  * oracle spells out. Values are masked to 16 bits (callers bucket or
  * hash wider domains first). Codegen'd: two table-free bit-spread
  * sequences, no loop. */
case class ZorderKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType | IntegerType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"zorder_key expects integer inputs, got $l / $r")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"

  private def toLong(e: Expression, v: Any): Long = e.dataType match {
    case IntegerType => v.asInstanceOf[Int].toLong
    case _ => v.asInstanceOf[Long]
  }

  // spread the low 16 bits of v to the even positions of a 32-bit word
  @inline private def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    spread(toLong(left, a)) | (spread(toLong(right, b)) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("zx")
      val y = ctx.freshName("zy")
      def spreadCode(v: String): String =
        s"""$v &= 0xFFFFL;
           |$v = ($v | ($v << 8)) & 0x00FF00FFL;
           |$v = ($v | ($v << 4)) & 0x0F0F0F0FL;
           |$v = ($v | ($v << 2)) & 0x33333333L;
           |$v = ($v | ($v << 1)) & 0x55555555L;""".stripMargin
      s"""
         |long $x = (long) $a;
         |long $y = (long) $b;
         |${spreadCode(x)}
         |${spreadCode(y)}
         |${ev.value} = $x | ($y << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Shared md5-prefix machinery for the hash-array generators below. */
trait Md5HashCore {
  def nibbles: Int
  @transient protected lazy val digestTL =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  protected final def bits(digest: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (digest(i) & 0xFFL); i += 1 }
    acc >>> (4 * (16 - nibbles))
  }
}

/** All word n-gram (shingle) hashes of a document in ONE evaluation:
  * equal element-for-element to the composed pipeline
  * `transform(sequence(0, size(ts) - n), i -> md5_bits(concat_ws(' ',
  * ts[i], ...), 15))` over `ts = split(trim(text), "\\s+")`, but without
  * the interpreted higher-order lambda, the per-shingle string array, or
  * the per-element expression dispatch — one regex split, one reused
  * StringBuilder, one digest per shingle. The split uses the same Java
  * regex engine `split(trim(s), "\\s+")` compiles to, so tokenization
  * cannot diverge from the SQL form (or from the DuckDB oracle's
  * `regexp_split_to_array`). CodegenFallback on purpose: one call per
  * ROW amortized over hundreds of shingles — codegen would only inline
  * the call. Returns fewer-than-n-token documents as an empty array
  * (the `CASE size < n` guard, built in). */
case class WordShingleHashes(child: Expression, n: Int, nibbles: Int)
    extends UnaryExpression with CodegenFallback with Md5HashCore {
  require(n >= 1 && nibbles >= 1 && nibbles <= 15)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_shingle_hashes expects a string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString.trim
    val toks = ws.split(s, -1)
    if (toks.length < n) return ArrayData.toArrayData(Array.empty[Long])
    val md = digestTL.get()
    val sb = new java.lang.StringBuilder(64)
    val out = new Array[Long](toks.length - n + 1)
    var i = 0
    while (i < out.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      out(i) = bits(md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** All fixed-width character-window hashes of a document (stride 1) in
  * one evaluation: equal to `transform(sequence(1, length(s) - w + 1),
  * i -> md5_bits(substring(s, i, w), 15))` — the d14 substring-window
  * key — without materializing a window string per position. For ASCII
  * text (the overwhelmingly common case) the digest runs directly over a
  * sliding range of the UTF-8 bytes, zero copies; any non-ASCII document
  * falls back to per-window character substrings so char-vs-byte
  * semantics stay EXACTLY those of `substring` (and the oracle's). */
case class CharWindowHashes(child: Expression, width: Int, nibbles: Int)
    extends UnaryExpression with CodegenFallback with Md5HashCore {
  require(width >= 1 && nibbles >= 1 && nibbles <= 15)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"char_window_hashes expects a string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_window_hashes"

  override protected def nullSafeEval(v: Any): Any = {
    val str = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val nWin = str.length - width + 1
    if (nWin <= 0) return ArrayData.toArrayData(Array.empty[Long])
    val md = digestTL.get()
    val out = new Array[Long](nWin)
    val bytes = str.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (bytes.length == str.length) {
      // pure ASCII: char windows == byte windows, digest in place
      var i = 0
      while (i < nWin) {
        md.reset()
        md.update(bytes, i, width)
        out(i) = bits(md.digest())
        i += 1
      }
    } else {
      var i = 0
      while (i < nWin) {
        md.reset()
        out(i) = bits(md.digest(str.substring(i, i + width)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        i += 1
      }
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Scalar twin of [[TokenTermCounts]] element 0: the whitespace-token
  * field count alone, for the five corpus passes that compute
  * `size(split(trim(text), "\s+"))` and discard the array. Identical
  * semantics (space-only trim, split limit -1 edge fields, blank → 1)
  * without materializing a token array per row. */
case class TokenCount(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"token_count expects a string, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"

  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val n = bytes.length
    var a = 0
    while (a < n && bytes(a) == 0x20) a += 1
    var b = n
    while (b > a && bytes(b - 1) == 0x20) b -= 1
    var cnt = 1
    var i = a
    while (i < b) {
      if (isWs(bytes(i))) {
        cnt += 1
        while (i < b && isWs(bytes(i))) i += 1
      } else {
        while (i < b && !isWs(bytes(i))) i += 1
      }
    }
    cnt
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Single-pass tokenizer statistics for a FIXED literal term list:
  * `token_term_counts(text, terms)` returns `array<int>` of length
  * `terms.size + 1` — element 0 equals `size(split(trim(s), "\s+"))`
  * EXACTLY (trim strips only 0x20, and split with limit -1 keeps the
  * empty edge fields a leading/trailing `\t\n\x0B\f\r` produces, so the
  * count is 1 + the number of `\s+` runs in the space-trimmed text, and
  * blank text yields 1), element `i+1` is the number of tokens
  * byte-equal to `terms(i)`.
  *
  * Why native: the composable alternative is either a full token
  * explode + filter + aggregate (a corpus-sized generator for a 3-term
  * query) or one `regexp_count` matcher scan of the text PER TERM plus
  * another for the token count. This makes exactly one pass over the
  * UTF-8 bytes, no token array, no regex state machine. Byte-level
  * scanning is exact: Java's `\s` class is 6 ASCII bytes, and ASCII
  * bytes never occur inside a UTF-8 multibyte sequence, so byte runs
  * are precisely the `\s+`-split tokens. CodegenFallback on purpose:
  * the per-row scan dominates; codegen would only inline the call. */
case class TokenTermCounts(child: Expression, terms: Seq[String])
    extends UnaryExpression with CodegenFallback {
  require(terms.nonEmpty)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"token_term_counts expects a string, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "token_term_counts"

  @transient private lazy val termBytes: Array[Array[Byte]] =
    terms.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val out = new Array[Int](termBytes.length + 1)
    // space-trim (0x20 ONLY — Spark/DuckDB `trim` semantics); the field
    // count is then 1 + the number of \s+ runs inside the region,
    // INCLUDING edge runs of non-space whitespace (each contributes an
    // empty field under split's limit = -1)
    val n = bytes.length
    var a = 0
    while (a < n && bytes(a) == 0x20) a += 1
    var b = n
    while (b > a && bytes(b - 1) == 0x20) b -= 1
    out(0) = 1
    var i = a
    while (i < b) {
      if (isWs(bytes(i))) {
        out(0) += 1
        while (i < b && isWs(bytes(i))) i += 1
      } else {
        val start = i
        while (i < b && !isWs(bytes(i))) i += 1
        val len = i - start
        var t = 0
        while (t < termBytes.length) {
          val tb = termBytes(t)
          if (tb.length == len) {
            var j = 0
            while (j < len && tb(j) == bytes(start + j)) j += 1
            if (j == len) out(t + 1) += 1
          }
          t += 1
        }
      }
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Argmin over a broadcast centroid matrix with integer squared
  * distances: `nearest_centroid(qv, cs)` where `qv` is array<bigint>
  * and `cs` is array<struct<cid bigint, cv array<bigint>>>, returning
  * struct(dist, cid) for the closest centroid (ties to the smallest
  * cid — identical to `array_min(transform(cs, c -> struct(dist,
  * cid)))` lexicographic semantics).
  *
  * Why native: the composable form runs `aggregate(sequence(0, 63),
  * ...)` inside a `transform` lambda — interpreted per element, K*64
  * lambda dispatches per row, and the whole projection drops out of
  * whole-stage codegen. This emits one tight K x dim primitive loop;
  * measured ~2x on the k-means assignment scan (the corpus-sized cost
  * of c1/c3). Arithmetic is exact BIGINT, same as the HOF form. */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  private def centElem(t: DataType): Boolean = t match {
    case ArrayType(StructType(fs), _) if fs.length == 2 =>
      fs(0).dataType == LongType &&
        (fs(1).dataType match {
          case ArrayType(LongType, _) => true
          case _ => false
        })
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), r) if centElem(r) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects (array<bigint>, array<struct<bigint, array<bigint>>>), got $l / $r")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("dist", LongType, nullable = false),
    StructField("cid", LongType, nullable = false)))
  override def prettyName: String = "nearest_centroid"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val qv = a.asInstanceOf[ArrayData]
    val cs = b.asInstanceOf[ArrayData]
    var bestD = Long.MaxValue
    var bestC = Long.MaxValue
    val k = cs.numElements()
    var j = 0
    while (j < k) {
      val c = cs.getStruct(j, 2)
      val cid = c.getLong(0)
      val cv = c.getArray(1)
      val n = math.min(qv.numElements(), cv.numElements())
      var s = 0L
      var i = 0
      while (i < n) {
        val d = qv.getLong(i) - cv.getLong(i)
        s += d * d
        i += 1
      }
      if (s < bestD || (s == bestD && cid < bestC)) { bestD = s; bestC = cid }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestD, bestC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val cRow = ctx.freshName("cRow")
      val cid = ctx.freshName("cid")
      val cv = ctx.freshName("cv")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      s"""
         |long $bestD = Long.MAX_VALUE;
         |long $bestC = Long.MAX_VALUE;
         |int $k = $b.numElements();
         |for (int $j = 0; $j < $k; $j++) {
         |  org.apache.spark.sql.catalyst.InternalRow $cRow = $b.getStruct($j, 2);
         |  long $cid = $cRow.getLong(0);
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $cRow.getArray(1);
         |  int $n = java.lang.Math.min($a.numElements(), $cv.numElements());
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $d = $a.getLong($i) - $cv.getLong($i);
         |    $s += $d * $d;
         |  }
         |  if ($s < $bestD || ($s == $bestD && $cid < $bestC)) { $bestD = $s; $bestC = $cid; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$bestD, $bestC});
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All ordered id pairs of a sorted distinct id array in ONE evaluation:
  * element-for-element equal to the composed pipeline
  * `flatten(transform(ids, a -> transform(filter(ids, b -> b > a),
  * b -> struct(a AS d1, b AS d2))))` — the in-bucket pair explode at the
  * heart of the dedup family (d2/d4/d6/d7/d16) — without the three
  * nested interpreted lambdas, which dispatch per CANDIDATE element
  * (O(n^2) lambda calls per bucket). CodegenFallback on purpose: one
  * call per bucket row amortized over freq^2/2 output pairs. Equal ids
  * produce no pair (the `b > a` filter), matching the HOF exactly. */
case class IdPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"id_pairs expects array<bigint>, got $t")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d1", LongType, nullable = false),
    StructField("d2", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "id_pairs"

  override protected def nullSafeEval(v: Any): Any = {
    val ids = v.asInstanceOf[ArrayData].toLongArray()
    val n = ids.length
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = ids(i)
      var j = 0
      while (j < n) {
        // mirror the HOF's value filter (b > a), not position — equal
        // ids pair with nothing, unsorted inputs still agree
        if (ids(j) > a) {
          out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](a, ids(j)))
          k += 1
        }
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (k == out.length) out else out.take(k))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Intersection SIZE of two value-sorted distinct BIGINT arrays by
  * two-pointer merge — the row-local verification kernel of the exact
  * prefix-filtered set-similarity join (d19/d20) and the array twin of
  * g9's packed-adjacency merge. Value-equal to
  * `size(array_intersect(a, b))` on distinct inputs; why native:
  * `array_intersect` allocates and fills an OpenHashSet PER EVALUATION,
  * and a join condition + projection can evaluate the intersection
  * several times per candidate row — the merge walks both arrays once
  * with zero allocation, in whole-stage codegen. Inputs MUST be sorted
  * ascending and duplicate-free (both d19 sides are `array_sort`ed
  * distinct shingle sets); unsorted input degrades to an undercount,
  * never an error. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects two array<bigint> inputs, got $l / $r")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var m = 0L
    while (i < nx && j < ny) {
      val vx = x.getLong(i); val vy = y.getLong(j)
      if (vx < vy) i += 1
      else if (vx > vy) j += 1
      else { m += 1L; i += 1; j += 1 }
    }
    m
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val vx = ctx.freshName("vx"); val vy = ctx.freshName("vy")
      s"""
         |int $i = 0; int $j = 0; long $m = 0L;
         |int ${i}n = $a.numElements(); int ${j}n = $b.numElements();
         |while ($i < ${i}n && $j < ${j}n) {
         |  long $vx = $a.getLong($i); long $vy = $b.getLong($j);
         |  if ($vx < $vy) $i++;
         |  else if ($vx > $vy) $j++;
         |  else { $m++; $i++; $j++; }
         |}
         |${ev.value} = $m;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class BloscCompress(child: Expression, typesize: Int, clevel: Int)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"blosc_compress expects binary, got ${child.dataType}")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "blosc_compress"
  override protected def nullSafeEval(v: Any): Any =
    Blosc.compress(v.asInstanceOf[Array[Byte]], typesize, clevel)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class BloscDecompress(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"blosc_decompress expects binary, got ${child.dataType}")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "blosc_decompress"
  override protected def nullSafeEval(v: Any): Any =
    Blosc.decompress(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Shared row-kernels for the PQ (product-quantization) expressions.
  * Top-level object => Scala emits STATIC forwarders, so generated
  * whole-stage code calls `graft.functions.PqKernels.encode(...)`
  * directly — all loops run in compiled bytecode with zero per-element
  * lambda dispatch. Arithmetic is kept BIT-IDENTICAL to the composed
  * pipeline these kernels replace (v8/v9's explode + broadcast-join +
  * max_by aggregate): dots accumulate in sequential index order like
  * [[VectorDot]], fits round through the same half-up decimal path as
  * Spark's `round`, ties break to the LOWEST code like
  * `max_by(code, struct(round(fit,6), -code))`. */
object PqKernels {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  /** Spark `round(x, 6)` for doubles: java BigDecimal.valueOf + HALF_UP.
    * NaN/Infinity pass through unchanged, exactly as Spark's Round
    * short-circuits them (BigDecimal.valueOf would throw instead —
    * turning a NaN embedding into a task crash the composed pipeline
    * never had). */
  private def round6(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Spark `CAST(round(x) AS BIGINT)` for doubles; NaN/Infinity follow
    * Spark's double->long cast (NaN -> 0, +/-Inf -> Long.Max/Min). */
  private def roundToLong(x: Double): Long =
    if (x.isNaN || x.isInfinite) x.toLong
    else java.math.BigDecimal.valueOf(x).setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  /** Spark's nan-safe double ordering (`Utils.nanSafeCompareDoubles`):
    * NaN ranks GREATEST and equal to itself, otherwise plain `<`/`>`.
    * The argmax below must use THIS ordering, not bare `>`/`==` — a
    * NaN fit fails every primitive comparison, so the naive form never
    * selects NaN candidates, while the composed `max_by(code,
    * struct(fit, -code))` it replaces ranks NaN fits above everything
    * (and an all-NaN sub ties down to the lowest code). With it, a
    * degenerate/NaN embedding encodes to the same codes as the
    * composed pipeline instead of a sentinel absent from the codebook. */
  private def nanSafeCompare(a: Double, b: Double): Int =
    if (a.isNaN && b.isNaN) 0
    else if (a.isNaN) 1
    else if (b.isNaN) -1
    else if (a > b) 1
    else if (a < b) -1
    else 0

  /** Nearest-sub-centroid codes of `vec` against the nested codebook
    * `cb[sub] = array<struct<code, cent>>`: per sub, argmax over codes
    * of round6(2*dot(sv, cent) - dot(cent, cent)), ties to lowest code,
    * fits ordered nan-safe like Spark's struct max ([[nanSafeCompare]]). */
  /** Sub-vector width: the CODEBOOK's centroid width (every cent is
    * built subDim-wide), NOT dim/nSub — the composed pipeline slices
    * fixed subDim windows, so a vector whose length is not an exact
    * multiple (last slice short) must still use the trained width;
    * deriving it from the vector would silently shift every offset. */
  private def subDimOf(cb: ArrayData): Int = {
    val nSub = cb.numElements()
    var s = 0
    while (s < nSub) {
      val entries = cb.getArray(s)
      if (entries.numElements() > 0) return entries.getStruct(0, 2).getArray(1).numElements()
      s += 1
    }
    0
  }

  def encode(vec: ArrayData, cb: ArrayData): ArrayData = {
    val nSub = cb.numElements()
    val dim = vec.numElements()
    val subDim = subDimOf(cb)
    val codes = new Array[Long](nSub)
    var s = 0
    while (s < nSub) {
      val entries = cb.getArray(s)
      val off = s * subDim
      val avail = math.max(0, math.min(subDim, dim - off))
      var bestF = Double.NegativeInfinity
      var bestC = Long.MaxValue
      var j = 0
      val k = entries.numElements()
      while (j < k) {
        val e = entries.getStruct(j, 2)
        val code = e.getLong(0)
        val cent = e.getArray(1)
        val cl = cent.numElements()
        var dot = 0.0
        var i = 0
        val n = math.min(avail, cl)
        while (i < n) { dot += vec.getDouble(off + i) * cent.getDouble(i); i += 1 }
        var nrm = 0.0
        i = 0
        while (i < cl) { val c = cent.getDouble(i); nrm += c * c; i += 1 }
        val fit = round6(dot * 2.0 - nrm)
        val c = nanSafeCompare(fit, bestF)
        if (c > 0 || (c == 0 && code < bestC)) { bestF = fit; bestC = code }
        j += 1
      }
      codes(s) = bestC
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** Asymmetric-distance partial sum, scaled-integer form: for each sub,
    * CAST(round(dot(q_sub, cb[sub][codes[sub]].cent) * 1e9) AS BIGINT),
    * summed — exactly the `sum(p9)` of the per-sub partial rows it
    * replaces (integer addition is order-independent, so fusing the
    * aggregate changes no value). Codebook lookup is a linear scan by
    * code VALUE (entries are the per-label sub-centroids — a handful). */
  def adc9(q: ArrayData, codes: ArrayData, cb: ArrayData): Long = {
    val nSub = cb.numElements()
    val dim = q.numElements()
    val subDim = subDimOf(cb)
    var total = 0L
    var s = 0
    while (s < nSub) {
      val want = codes.getLong(s)
      val entries = cb.getArray(s)
      val k = entries.numElements()
      var j = 0
      var found = false
      while (j < k && !found) {
        val e = entries.getStruct(j, 2)
        if (e.getLong(0) == want) {
          val cent = e.getArray(1)
          val off = s * subDim
          val n = math.min(math.max(0, math.min(subDim, dim - off)), cent.numElements())
          var dot = 0.0
          var i = 0
          while (i < n) { dot += q.getDouble(off + i) * cent.getDouble(i); i += 1 }
          total += roundToLong(dot * 1e9)
          found = true
        }
        j += 1
      }
      s += 1
    }
    total
  }
}

/** PQ encode in ONE whole-stage-codegen'd evaluation per row (the
  * v8/v9 hot path): replaces the n x nSub explode + broadcast codebook
  * join + `max_by` hash aggregate — i.e. a full corpus-sized SHUFFLE —
  * with a map-only projection. At 100 TB the encode stage becomes
  * embarrassingly parallel over the corpus scan with the codebook as
  * one broadcast row; nothing shuffles until the (tiny) ranked output.
  * Value-equal to the composed pipeline by construction ([[PqKernels]]
  * mirrors its arithmetic bit-for-bit); gated by v8/v9's unchanged
  * DuckDB oracles, which still spell out the explode+join+argmax form. */
case class PqEncode(vec: Expression, codebook: Expression)
    extends BinaryExpression {
  override def left: Expression = vec
  override def right: Expression = codebook

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, codebook.dataType) match {
      case (ArrayType(DoubleType, _), t) if PqAdc9.isCodebook(t) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects (array<double>, array<array<struct<bigint, array<double>>>>), got $l / $r")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqKernels.encode(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PqKernels.encode($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, codebook = newRight)
}

/** ADC scoring in ONE codegen'd evaluation per (query, corpus) row:
  * replaces the per-sub partial-row explode (n x nSub x nQueries rows
  * through a broadcast join and a (qid, eid) hash aggregate) with a
  * scalar computed inside the scan projection — the scoring stage stops
  * shuffling corpus-sized data entirely. */
case class PqAdc9(query: Expression, codes: Expression, codebook: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def first: Expression = query
  override def second: Expression = codes
  override def third: Expression = codebook

  override def checkInputDataTypes(): TypeCheckResult =
    (query.dataType, codes.dataType, codebook.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(LongType, _), t) if PqAdc9.isCodebook(t) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc9 expects (array<double>, array<bigint>, codebook), got $a / $b / $c")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc9"

  override protected def nullSafeEval(q: Any, c: Any, cb: Any): Any =
    PqKernels.adc9(q.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData],
      cb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c, cb) =>
      s"${ev.value} = graft.functions.PqKernels.adc9($q, $c, $cb);")

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(query = f, codes = s, codebook = t)
}

object PqAdc9 {
  /** array<array<struct<code: bigint, cent: array<double>>>> */
  private[functions] def isCodebook(t: DataType): Boolean = t match {
    case ArrayType(ArrayType(StructType(fs), _), _) if fs.length == 2 =>
      fs(0).dataType == LongType && (fs(1).dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      })
    case _ => false
  }
}
