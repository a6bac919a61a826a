package graft.io.s3

import java.net.{HttpURLConnection, URL, URLEncoder}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SigV4 conformance against an ENFORCING endpoint. The unsigned-mode
  * spec (S3RestFsSpec) runs moto with signature verification off — fine
  * for the REST dialect, but it cannot prove the signing algorithm.
  * This suite starts moto with `INITIAL_NO_AUTH_ACTION_COUNT`, under
  * which the server independently recomputes every request's AWS
  * Signature Version 4 (via botocore's own signer) and rejects
  * mismatches exactly like AWS. Within the unauthenticated bootstrap
  * allowance it provisions a real IAM user + access key over raw HTTP,
  * then:
  *
  *   - every FileSystem operation (PUT with payload hash, ranged GET,
  *     HEAD, LIST with canonical query strings, server-side COPY with a
  *     signed x-amz-copy-source, DELETE, multipart initiate/part/
  *     complete) succeeds fully signed — an independent implementation
  *     agreeing with ours on every canonical request shape we emit;
  *   - the SAME configuration with a WRONG secret fails with
  *     SignatureDoesNotMatch — proving the endpoint actually verifies
  *     (the agreement above is not vacuous).
  *
  * The Zarr/DSv2 surface is byte-identical above the FileSystem API and
  * is exercised end-to-end in S3RestFsSpec; signing lives entirely
  * below it. Cancels (assume) when python3/moto is unavailable.
  */
class S3SigV4Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val port = 19022
  private val endpoint = s"http://127.0.0.1:$port"
  private val bucket = "graft-signed"
  private var moto: Process = _
  private var motoUp = false
  private var accessKey: String = _
  private var secretKey: String = _
  private var stsKey: String = _
  private var stsSecret: String = _
  private var stsToken: String = _

  /** Raw call with a V4-SHAPED static header whose scope names `service`
    * — moto routes requests by that scope; only usable inside the
    * unauthenticated bootstrap allowance. */
  private def rawCall(method: String, path: String, service: String,
                      form: Map[String, String]): (Int, String) = {
    val c = new URL(s"$endpoint$path").openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    c.setConnectTimeout(3000)
    c.setReadTimeout(15000)
    c.setRequestProperty("Authorization",
      s"AWS4-HMAC-SHA256 Credential=boot/20260101/us-east-1/$service/aws4_request, " +
      "SignedHeaders=host, Signature=0000")
    if (form.nonEmpty) {
      c.setDoOutput(true)
      c.setRequestProperty("Content-Type", "application/x-www-form-urlencoded")
      val body = form.map { case (k, v) =>
        s"$k=${URLEncoder.encode(v, "UTF-8")}" }.mkString("&")
      val os = c.getOutputStream
      try os.write(body.getBytes("UTF-8")) finally os.close()
    }
    val code = c.getResponseCode
    val in = if (code >= 400) c.getErrorStream else c.getInputStream
    val text = if (in == null) "" else scala.io.Source.fromInputStream(in).mkString
    c.disconnect()
    (code, text)
  }

  override def beforeAll(): Unit = {
    val probe =
      try new ProcessBuilder("python3", "-c", "import moto.server").start().waitFor()
      catch { case _: Throwable => 1 }
    if (probe != 0) return
    val pb = new ProcessBuilder("python3", "-m", "moto.server",
      "-H", "127.0.0.1", "-p", port.toString)
    // 7 unauthenticated bootstrap actions: CreateUser, PutUserPolicy,
    // CreateAccessKey, CreateRole, PutRolePolicy, AssumeRole,
    // CreateBucket — everything after is enforced-signed
    pb.environment().put("INITIAL_NO_AUTH_ACTION_COUNT", "7")
    pb.redirectErrorStream(true)
    pb.redirectOutput(new java.io.File("/tmp/moto-sigv4-spec.log"))
    moto = pb.start()
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (!motoUp && System.nanoTime() < deadline) {
      motoUp = try { rawCall("GET", "/moto-api/", "s3", Map.empty); true }
               catch { case _: Throwable => Thread.sleep(250); false }
    }
    if (!motoUp) return
    rawCall("POST", "/", "iam", Map(
      "Action" -> "CreateUser", "UserName" -> "graft", "Version" -> "2010-05-08"))
    rawCall("POST", "/", "iam", Map(
      "Action" -> "PutUserPolicy", "UserName" -> "graft",
      "PolicyName" -> "s3all",
      "PolicyDocument" -> """{"Version":"2012-10-17","Statement":[{"Effect":"Allow","Action":"s3:*","Resource":"*"}]}""",
      "Version" -> "2010-05-08"))
    val (code, xml) = rawCall("POST", "/", "iam", Map(
      "Action" -> "CreateAccessKey", "UserName" -> "graft", "Version" -> "2010-05-08"))
    assert(code == 200, s"CreateAccessKey bootstrap: HTTP $code: ${xml.take(200)}")
    val doc = scala.xml.XML.loadString(xml)
    accessKey = (doc \\ "AccessKeyId").text
    secretKey = (doc \\ "SecretAccessKey").text
    assert(accessKey.nonEmpty && secretKey.nonEmpty, "bootstrap keys parse")
    // STS temporary-credential triple: a role assumable by anyone with
    // s3:* rights, minted by moto's own STS — the token is moto's, not
    // ours, so the token-signing test cannot be self-consistent
    rawCall("POST", "/", "iam", Map(
      "Action" -> "CreateRole", "RoleName" -> "graft-role",
      "AssumeRolePolicyDocument" -> """{"Version":"2012-10-17","Statement":[{"Effect":"Allow","Principal":{"AWS":"*"},"Action":"sts:AssumeRole"}]}""",
      "Version" -> "2010-05-08"))
    rawCall("POST", "/", "iam", Map(
      "Action" -> "PutRolePolicy", "RoleName" -> "graft-role",
      "PolicyName" -> "s3all",
      "PolicyDocument" -> """{"Version":"2012-10-17","Statement":[{"Effect":"Allow","Action":"s3:*","Resource":"*"}]}""",
      "Version" -> "2010-05-08"))
    val (stsCode, stsXml) = rawCall("POST", "/", "sts", Map(
      "Action" -> "AssumeRole",
      "RoleArn" -> "arn:aws:iam::123456789012:role/graft-role",
      "RoleSessionName" -> "graft-session", "Version" -> "2011-06-15"))
    assert(stsCode == 200, s"AssumeRole bootstrap: HTTP $stsCode: ${stsXml.take(200)}")
    val stsDoc = scala.xml.XML.loadString(stsXml)
    stsKey = (stsDoc \\ "AccessKeyId").text
    stsSecret = (stsDoc \\ "SecretAccessKey").text
    stsToken = (stsDoc \\ "SessionToken").text
    assert(stsKey.nonEmpty && stsSecret.nonEmpty && stsToken.nonEmpty, "sts triple parses")
    assert(rawCall("PUT", s"/$bucket", "s3", Map.empty)._1 == 200, "bucket create")
  }

  override def afterAll(): Unit = if (moto != null) moto.destroy()

  private def signedConf(secret: String): Configuration = {
    val c = new Configuration(false)
    c.set("fs.s3r.impl", classOf[S3RestFileSystem].getName)
    c.set("fs.s3r.endpoint", endpoint)
    c.set("fs.s3r.access.key", accessKey)
    c.set("fs.s3r.secret.key", secret)
    c.set("fs.s3r.region", "us-east-1")
    // moto server mode sits behind Werkzeug, which normalizes %2F/%3A in
    // query strings BEFORE moto recomputes the signature; real AWS
    // reproduces the strict RFC 3986 canonical instead (class doc).
    // Everything except LIST-style queries is identical in both modes,
    // so the strict path is still what PUT/GET/HEAD/COPY/MPU verify here.
    c.setBoolean("fs.s3r.sigv4.wsgi.compat", true)
    c
  }

  test("every FS operation passes real SigV4 verification by an independent implementation") {
    assume(motoUp, "moto S3 server unavailable in this environment")
    val fs = FileSystem.newInstance(java.net.URI.create(s"s3r://$bucket/"), signedConf(secretKey))
    val base = new Path(s"s3r://$bucket/signed")

    // PUT with payload hash + HEAD
    val data = Array.tabulate[Byte](200000)(i => ((i * 37) ^ (i >> 5)).toByte)
    val o = fs.create(new Path(base, "a/obj.bin"), true); o.write(data); o.close()
    assert(fs.getFileStatus(new Path(base, "a/obj.bin")).getLen == data.length)

    // ranged GET (Range stays unsigned; x-amz-* headers are signed)
    val in = fs.open(new Path(base, "a/obj.bin"), 4096)
    in.seek(199990)
    val tail = new Array[Byte](10); in.readFully(tail); in.close()
    assert(tail.toSeq == data.drop(199990).toSeq)

    // LIST with canonical query (prefix/delimiter/max-keys all signed)
    assert(fs.listStatus(new Path(base, "a")).map(_.getPath.getName).toSeq == Seq("obj.bin"))

    // server-side COPY: the x-amz-copy-source header enters the signature
    assert(fs.rename(new Path(base, "a/obj.bin"), new Path(base, "a/moved.bin")))
    assert(fs.getFileStatus(new Path(base, "a/moved.bin")).getLen == data.length)

    // multipart: signed initiate (?uploads=), per-part PUTs, complete
    val big = Array.tabulate[Byte](11 * 1024 * 1024)(i => ((i * 131) ^ (i >> 9)).toByte)
    val c = signedConf(secretKey)
    c.setInt("fs.s3r.multipart.part.size", 5 * 1024 * 1024)
    val fs2 = FileSystem.newInstance(java.net.URI.create(s"s3r://$bucket/"), c)
    val o2 = fs2.create(new Path(base, "a/big.bin"), true); o2.write(big); o2.close()
    val in2 = fs2.open(new Path(base, "a/big.bin"), 65536)
    val back = new Array[Byte](big.length); in2.readFully(0, back); in2.close()
    assert(java.util.Arrays.equals(back, big), "signed multipart byte-exact")
    fs2.close()

    // recursive DELETE
    assert(fs.delete(base, true))
    fs.close()
  }

  test("STS temporary credentials (session token) sign end-to-end") {
    assume(motoUp, "moto S3 server unavailable in this environment")
    val c = signedConf(stsSecret)
    c.set("fs.s3r.access.key", stsKey)
    c.set("fs.s3r.session.token", stsToken)
    val fs = FileSystem.newInstance(java.net.URI.create(s"s3r://$bucket/"), c)
    val p = new Path(s"s3r://$bucket/sts/tmp.bin")
    val o = fs.create(p, true); o.write("temp-cred-bytes".getBytes("UTF-8")); o.close()
    assert(fs.getFileStatus(p).getLen == 15)
    assert(fs.listStatus(new Path(s"s3r://$bucket/sts")).length == 1)
    assert(fs.delete(new Path(s"s3r://$bucket/sts"), true))
    fs.close()
  }

  test("temporary credentials with a WRONG token are rejected") {
    assume(motoUp, "moto S3 server unavailable in this environment")
    val c = signedConf(stsSecret)
    c.set("fs.s3r.access.key", stsKey)
    c.set("fs.s3r.session.token", stsToken.reverse)
    val fs = FileSystem.newInstance(java.net.URI.create(s"s3r://$bucket/"), c)
    val e = intercept[java.io.IOException] {
      val o = fs.create(new Path(s"s3r://$bucket/sts/forged.bin"), true)
      o.write(1); o.close()
    }
    assert(e.getMessage.contains("403") || e.getMessage.contains("400"),
      s"expected an auth rejection, got: ${e.getMessage.take(200)}")
    fs.close()
  }

  test("a wrong secret is REJECTED (the endpoint really verifies signatures)") {
    assume(motoUp, "moto S3 server unavailable in this environment")
    val fs = FileSystem.newInstance(java.net.URI.create(s"s3r://$bucket/"),
      signedConf(secretKey.reverse + "x"))
    val e = intercept[java.io.IOException] {
      val o = fs.create(new Path(s"s3r://$bucket/forged/x.bin"), true)
      o.write(1); o.close()
    }
    assert(e.getMessage.contains("SignatureDoesNotMatch"),
      s"expected SignatureDoesNotMatch, got: ${e.getMessage.take(200)}")
    fs.close()
  }
}
