package graft.lake

import java.io.ByteArrayOutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/**
 * In-process S3-compatible object-store stub — the sandbox substitute for
 * the reference's LocalStack bootstrap
 * (`/root/reference/scripts/setup_localstack.py:30-125` starts a container,
 * creates the bucket, and smoke-tests a put/get round trip over the S3
 * REST API). This serves the same path-style REST surface from an in-JVM
 * `HttpServer`, storing objects in a heap map:
 *
 *  - `PUT /bucket` create bucket; `HEAD /bucket` probe
 *  - `PUT /bucket/key` put object; with `x-amz-copy-source` header:
 *    server-side COPY (what an S3 "rename" really is)
 *  - `GET /bucket/key` get object (honors `Range: bytes=a-b` with 206)
 *  - `HEAD /bucket/key` object metadata (`Content-Length`)
 *  - `DELETE /bucket/key` delete object
 *  - `GET /bucket?list-type=2&prefix=&delimiter=` ListObjectsV2 XML
 *    (Contents + CommonPrefixes)
 *
 * Auth headers are accepted and ignored, exactly like LocalStack's default
 * test credentials. Scale intent: this is a PROTOCOL smoke target, not a
 * store — [[S3LiteFileSystem]] rides it so the lake's Hadoop-FileSystem
 * code paths execute real HTTP object I/O in a zero-egress sandbox; a real
 * deployment swaps endpoint + s3a (SCALE.md "Object-store posture").
 */
final class S3Stub {

  private val objects = new ConcurrentHashMap[String, Array[Byte]]()
  private val buckets = ConcurrentHashMap.newKeySet[String]()
  private var server: HttpServer = _

  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => handle(ex))
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  /** (bucket, key) -> size, for spec assertions. */
  def keys: Map[String, Int] =
    objects.asScala.map { case (k, v) => k -> v.length }.toMap

  private def handle(ex: HttpExchange): Unit = try {
    val path = ex.getRequestURI.getPath.stripPrefix("/")
    val (bucket, key) = path.indexOf('/') match {
      case -1 => (path, "")
      case i  => (path.take(i), path.drop(i + 1))
    }
    val method = ex.getRequestMethod
    val query = Option(ex.getRequestURI.getQuery).getOrElse("")
    (method, key.isEmpty) match {
      case ("PUT", true) =>
        buckets.add(bucket); respond(ex, 200, Array.emptyByteArray)
      case ("HEAD", true) =>
        respond(ex, if (buckets.contains(bucket)) 200 else 404,
          Array.emptyByteArray)
      case ("GET", true) => list(ex, bucket, query)
      case ("PUT", false) =>
        val copySrc = Option(ex.getRequestHeaders.getFirst("x-amz-copy-source"))
        val body = copySrc match {
          case Some(src) =>
            val k = src.stripPrefix("/")
            val b = objects.get(k)
            if (b == null) { respond(ex, 404, Array.emptyByteArray); return }
            b
          case None => readAll(ex)
        }
        objects.put(s"$bucket/$key", body)
        val ack = copySrc.map(_ => "<CopyObjectResult/>".getBytes(UTF_8))
          .getOrElse(Array.emptyByteArray)
        respond(ex, 200, ack)
      case ("GET", false) =>
        val b = objects.get(s"$bucket/$key")
        if (b == null) respond(ex, 404, Array.emptyByteArray)
        else Option(ex.getRequestHeaders.getFirst("Range")) match {
          case Some(r) =>
            val m = "bytes=(\\d+)-(\\d*)".r.findFirstMatchIn(r)
            m match {
              case Some(g) =>
                val lo = g.group(1).toInt
                val hi = if (g.group(2).isEmpty) b.length - 1
                         else math.min(g.group(2).toInt, b.length - 1)
                respond(ex, 206, b.slice(lo, hi + 1))
              case None => respond(ex, 200, b)
            }
          case None => respond(ex, 200, b)
        }
      case ("HEAD", false) =>
        val b = objects.get(s"$bucket/$key")
        if (b == null) respond(ex, 404, Array.emptyByteArray)
        else {
          // HttpServer owns Content-Length; carry size in a custom header
          // too so HEAD-driven clients need not trust the transport's value
          ex.getResponseHeaders.set("x-s3stub-length", b.length.toString)
          respond(ex, 200, Array.emptyByteArray)
        }
      case ("DELETE", false) =>
        objects.remove(s"$bucket/$key"); respond(ex, 204, Array.emptyByteArray)
      case _ => respond(ex, 405, Array.emptyByteArray)
    }
  } catch {
    case scala.util.control.NonFatal(e) =>
      respond(ex, 500, String.valueOf(e).getBytes(UTF_8))
  } finally ex.close()

  private def list(ex: HttpExchange, bucket: String, query: String): Unit = {
    val params = query.split("&").filter(_.contains("="))
      .map { p => val Array(k, v) = p.split("=", 2); k -> java.net.URLDecoder.decode(v, "UTF-8") }
      .toMap
    val prefix = params.getOrElse("prefix", "")
    val delim = params.get("delimiter")
    val all = objects.asScala.keys.toSeq.sorted
      .filter(_.startsWith(s"$bucket/"))
      .map(_.stripPrefix(s"$bucket/"))
      .filter(_.startsWith(prefix))
    val (contents, prefixes) = delim match {
      case Some(d) =>
        val (direct, nested) = all.partition(k => !k.drop(prefix.length).contains(d))
        val cps = nested.map(k =>
          prefix + k.drop(prefix.length).takeWhile(_.toString != d) + d).distinct
        (direct, cps)
      case None => (all, Seq.empty)
    }
    val xml = new StringBuilder
    xml ++= """<?xml version="1.0" encoding="UTF-8"?>"""
    xml ++= s"<ListBucketResult><Name>$bucket</Name>"
    contents.foreach { k =>
      val size = objects.get(s"$bucket/$k").length
      xml ++= s"<Contents><Key>${escape(k)}</Key><Size>$size</Size></Contents>"
    }
    prefixes.foreach(p =>
      xml ++= s"<CommonPrefixes><Prefix>${escape(p)}</Prefix></CommonPrefixes>")
    xml ++= "</ListBucketResult>"
    respond(ex, 200, xml.toString.getBytes(UTF_8), "application/xml")
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def readAll(ex: HttpExchange): Array[Byte] = {
    val in = ex.getRequestBody
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private def respond(ex: HttpExchange, code: Int, body: Array[Byte],
                      ctype: String = "application/octet-stream"): Unit = {
    if (body.nonEmpty) ex.getResponseHeaders.set("Content-Type", ctype)
    if (ex.getRequestMethod == "HEAD")
      ex.sendResponseHeaders(code, -1)
    else {
      ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
      if (body.nonEmpty) ex.getResponseBody.write(body)
    }
  }
}
