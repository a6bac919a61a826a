package graft.io.s3

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite

/** Differential test of the STRICT SigV4 canonical form against
  * botocore's own signer (`scripts/sigv4_vectors.py`), with no server
  * in between. The endpoint-enforced spec (S3SigV4Spec) proves the
  * algorithm end-to-end but can only exercise LIST-style query strings
  * in the documented wsgi-compat form, because Werkzeug normalizes
  * `%2F`/`%3A` before moto re-verifies. Here botocore signs each
  * generated request shape directly — the exact implementation AWS
  * ships — so the strict query canonicalization, multi-header signing,
  * payload hashing, scope construction and HMAC key chain are all
  * byte-compared with graft's signer, closing that gap. botocore picks
  * the timestamp; graft signs at the same instant. Cancels when
  * python3/botocore is unavailable.
  */
class S3SigV4VectorsSpec extends AnyFunSuite {

  private val AK = "AKIDEXAMPLE"
  private val SK = "wJalrXUtnFEMI/K7MDENG/bPxRfiCYEXAMPLEKEY"

  private case class Case(method: String, host: String, uri: String,
                          query: Seq[(String, String)], body: Array[Byte],
                          headers: Seq[(String, String)], region: String)

  // shapes covering every request the FileSystem emits, plus hostile
  // values: spaces, slashes, '+', '=', unicode, empty values, unsorted
  // input params (the builder must sort), multi-MB-free bodies
  private val cases = Seq(
    Case("GET", "127.0.0.1:9000", "/bkt", Seq("list-type" -> "2",
      "prefix" -> "signed/a/", "max-keys" -> "1"), Array.emptyByteArray, Nil, "us-east-1"),
    Case("GET", "s3.example.com", "/bkt", Seq("prefix" -> "a b+c=d/e:f~g",
      "delimiter" -> "/", "continuation-token" -> "1/5dIMtok=="),
      Array.emptyByteArray, Nil, "eu-west-2"),
    Case("PUT", "127.0.0.1:9000", "/bkt/zarr/0/1/2/3", Nil,
      "chunk-bytes".getBytes("UTF-8"), Nil, "us-east-1"),
    Case("PUT", "127.0.0.1:9000", "/bkt/dst.bin", Nil, Array.emptyByteArray,
      Seq("X-Amz-Copy-Source" -> "/bkt/src%20key.bin"), "us-east-1"),
    Case("POST", "127.0.0.1:9000", "/bkt/big.bin", Seq("uploads" -> ""),
      Array.emptyByteArray, Nil, "us-east-1"),
    Case("PUT", "127.0.0.1:9000", "/bkt/big.bin",
      Seq("uploadId" -> "abc+DEF/123==", "partNumber" -> "7"),
      Array.tabulate[Byte](4096)(i => (i * 13).toByte), Nil, "us-east-1"),
    Case("POST", "127.0.0.1:9000", "/bkt/big.bin", Seq("uploadId" -> "abc"),
      "<CompleteMultipartUpload/>".getBytes("UTF-8"), Nil, "us-east-1"),
    Case("HEAD", "127.0.0.1:9000", "/bkt/k%C3%A9y%20with%20space", Nil,
      Array.emptyByteArray, Nil, "us-east-1"),
    Case("DELETE", "127.0.0.1:9000", "/bkt/old", Nil, Array.emptyByteArray,
      Nil, "ap-southeast-2"),
    // encodeKey-generated URI (not pre-encoded by hand): '*' and '('
    // must be %-encoded, '~' must stay raw — form encoding (URLEncoder)
    // gets BOTH wrong, which the pre-encoded cases above never catch
    Case("PUT", "127.0.0.1:9000",
      "/bkt/" + S3RestFileSystem.encodeKey("weird */~(key)/tile(0) v*~2.bin"),
      Nil, "hostile-key-bytes".getBytes("UTF-8"), Nil, "us-east-1"))

  test("strict canonical signatures are byte-identical to botocore's") {
    val probe =
      try new ProcessBuilder("python3", "-c", "import botocore.auth").start().waitFor()
      catch { case _: Throwable => 1 }
    assume(probe == 0, "python3/botocore unavailable in this environment")

    val p = new ProcessBuilder("python3", "scripts/sigv4_vectors.py")
      .redirectErrorStream(false).start()
    val in = new OutputStreamWriter(p.getOutputStream, "UTF-8")
    val out = new BufferedReader(new InputStreamReader(p.getInputStream, "UTF-8"))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

    try cases.zipWithIndex.foreach { case (c, i) =>
      // STRICT canonical: the same string goes on the wire and into both
      // signers, so botocore's verbatim query handling matches AWS's
      // strict server-side re-encoding by construction
      val cq = S3RestFileSystem.canonicalQuery(c.query, wsgiCompat = false)
      val node = mapper.createObjectNode()
      node.put("method", c.method).put("host", c.host).put("uri", c.uri)
        .put("query", cq)
        .put("body_b64", Base64.getEncoder.encodeToString(c.body))
        .put("access_key", AK).put("secret_key", SK).put("region", c.region)
      val h = node.putObject("headers")
      c.headers.foreach { case (k, v) => h.put(k, v) }
      in.write(mapper.writeValueAsString(node) + "\n"); in.flush()

      val resp = mapper.readTree(out.readLine())
      val amzDate = resp.get("amz_date").asText()
      val mine = S3RestFileSystem.signV4(c.method, c.uri, cq, c.body,
        c.headers, amzDate, c.host, AK, SK, c.region).toMap
      assert(mine("x-amz-content-sha256") == resp.get("content_sha256").asText(),
        s"case $i payload hash")
      assert(mine("Authorization") == resp.get("authorization").asText(),
        s"case $i: ${c.method} ${c.uri}?$cq")
    } finally { in.close(); p.destroy() }
  }

  test("the strict encoder itself: RFC 3986, uppercase hex, %20 not '+'") {
    assert(S3RestFileSystem.rfc3986("a b/c:~d_e.f-0") == "a%20b%2Fc%3A~d_e.f-0")
    // key encoding: segment-wise strict RFC 3986 with '/' preserved;
    // exactly the characters form-encoding diverges on: '*' raw-vs-%2A,
    // '~' %7E-vs-raw
    assert(S3RestFileSystem.encodeKey("a b/t*~(0)/c") == "a%20b/t%2A~%280%29/c")
    assert(S3RestFileSystem.rfc3986("+=&?") == "%2B%3D%26%3F")
    assert(S3RestFileSystem.rfc3986("ключ") == "%D0%BA%D0%BB%D1%8E%D1%87")
    // builder sorts by encoded key, keeps empty values as 'k='
    assert(S3RestFileSystem.canonicalQuery(
      Seq("uploads" -> "", "partNumber" -> "7"), wsgiCompat = false) ==
      "partNumber=7&uploads=")
  }
}
