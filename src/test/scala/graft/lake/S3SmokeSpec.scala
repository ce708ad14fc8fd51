package graft.lake

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec

/**
 * Live object-store smoke — the reference's LocalStack round trip
 * (`/root/reference/scripts/setup_localstack.py:30-125`: start endpoint,
 * create bucket, put/get/delete smoke object, then run the pipeline at it)
 * executed in-process: [[S3Stub]] serves the S3 REST API over real HTTP,
 * the raw-protocol smoke mirrors the boto3 calls, and the bronze lake then
 * runs its FULL day round trip (parquet write through the committer's
 * mkdirs/rename/delete sequence, existence probe, sidecar, partition
 * listing, idempotent re-run) against `s3l://` —
 * [[S3LiteFileSystem]] translating every Hadoop FS call into S3 verbs.
 *
 * What this cannot cover (and why): the container ships no
 * hadoop-aws/AWS-SDK jars and has no egress, so the literal `s3a://`
 * connector can never load here — the s3a CONFIG surface is pinned by
 * ObjectStoreProfileSpec, and everything above the SDK (lake code against
 * S3 semantics: virtual directories, COPY+DELETE renames, list-delimiter
 * hierarchies) is what this spec locks. SCALE.md "Object-store posture"
 * documents the split.
 */
class S3SmokeSpec extends SparkSpec {

  private val stub = new S3Stub
  private lazy val port = stub.start()
  private lazy val endpoint = s"http://127.0.0.1:$port"

  override protected def afterAll(): Unit = {
    stub.stop()
    super.afterAll()
  }

  private def http(method: String, path: String,
                   body: Array[Byte] = null,
                   headers: Map[String, String] = Map.empty): (Int, Array[Byte]) = {
    val c = new URL(s"$endpoint$path").openConnection()
      .asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    headers.foreach { case (k, v) => c.setRequestProperty(k, v) }
    if (body != null) { c.setDoOutput(true); c.getOutputStream.write(body) }
    val code = c.getResponseCode
    val in = if (code >= 400) c.getErrorStream else c.getInputStream
    val out = new java.io.ByteArrayOutputStream()
    if (in != null) {
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    }
    c.disconnect()
    (code, out.toByteArray)
  }

  test("S3 protocol round trip: bucket create/head, object put/get/head/list/copy/delete") {
    // setup_localstack.py:30-60 — create bucket, verify it HEADs
    assert(http("PUT", "/smoke")._1 == 200)
    assert(http("HEAD", "/smoke")._1 == 200)
    assert(http("HEAD", "/absent")._1 == 404)
    // put/get round trip (the boto3 smoke object)
    val payload = "graft-smoke-payload".getBytes(UTF_8)
    assert(http("PUT", "/smoke/probe/hello.txt", payload)._1 == 200)
    val (gc, got) = http("GET", "/smoke/probe/hello.txt")
    assert(gc == 200 && got.sameElements(payload))
    assert(http("HEAD", "/smoke/probe/hello.txt")._1 == 200)
    // ranged read (parquet-footer shape)
    val (rc, part) = http("GET", "/smoke/probe/hello.txt",
      headers = Map("Range" -> "bytes=6-10"))
    assert(rc == 206 && new String(part, UTF_8) == "smoke")
    // ListObjectsV2 sees the key under its prefix
    val (lc, listing) = http("GET", "/smoke?list-type=2&prefix=probe%2F")
    assert(lc == 200 && new String(listing, UTF_8).contains("<Key>probe/hello.txt</Key>"))
    // server-side COPY then DELETE — the rename primitive
    assert(http("PUT", "/smoke/probe/copy.txt",
      headers = Map("x-amz-copy-source" -> "/smoke/probe/hello.txt"))._1 == 200)
    val (_, copied) = http("GET", "/smoke/probe/copy.txt")
    assert(copied.sameElements(payload))
    assert(http("DELETE", "/smoke/probe/hello.txt")._1 == 204)
    assert(http("HEAD", "/smoke/probe/hello.txt")._1 == 404)
  }

  test("bronze lake day round trip over a live S3 endpoint (s3l://)") {
    http("PUT", "/lake")
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3l.impl", classOf[S3LiteFileSystem].getName)
    hc.set("fs.s3l.endpoint", endpoint)
    val root = "s3l://lake/bronze"
    def extract(date: String) = graft.bronze.Runner.extractEvents(spark, sf001, date)

    assert(!graft.bronze.Lake.checkExists(spark, root, "events", "2024-01-03"))
    val n = graft.bronze.Lake.writeDay(spark, extract("2024-01-03"), root,
      "events", "2024-01-03")
    assert(n > 0)
    // the committer's _temporary staging must be fully renamed+deleted:
    // only committed objects remain in the store
    val staged = stub.keys.keys.filter(_.contains("_temporary"))
    assert(staged.isEmpty, s"uncommitted staging keys left: $staged")
    assert(stub.keys.keys.exists(k =>
      k.startsWith("lake/bronze/") && k.endsWith(".parquet")))
    assert(graft.bronze.Lake.checkExists(spark, root, "events", "2024-01-03"))
    val dir = graft.bronze.Lake.dayDir(root, "events", "2024-01-03")
    assert(spark.read.parquet(dir).count() == n)
    val meta = graft.bronze.Lake.readMetadata(spark, root, "events", "2024-01-03")
    assert(meta.exists(_.contains(s""""record_count": $n""")))
    assert(graft.bronze.Lake.listAvailableDates(spark, root, "events")
      == Seq("2024-01-03"))
    // idempotent skip on re-run, same as the file:// spec
    val r2 = graft.bronze.Runner.runDaily(spark, root, "events", "2024-01-03", extract)
    assert(r2.success && r2.skipped)
  }
}
