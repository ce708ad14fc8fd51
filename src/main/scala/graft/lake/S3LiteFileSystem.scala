package graft.lake

import java.io.{ByteArrayOutputStream, FileNotFoundException, IOException, InputStream, OutputStream}
import java.net.{HttpURLConnection, URI, URL}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FSInputStream, FileStatus, FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/**
 * Minimal Hadoop `FileSystem` over the S3 REST protocol (`s3l://bucket/...`,
 * "S3 lite") — the sandbox's object-store smoke path. The real deployment
 * profile is s3a ([[graft.Conf.objectStoreConfs]]); this container image
 * ships no `hadoop-aws`/AWS-SDK jars and has zero egress, so an actual
 * `s3a://` endpoint cannot exist here. What CAN be verified is everything
 * above the SDK: that the lake's I/O (`graft.bronze.Lake`, parquet
 * read/write, committer rename/list/delete sequences) runs correctly when
 * the `FileSystem` underneath speaks S3 semantics — path-style REST verbs,
 * LIST-with-delimiter pseudo-directories, COPY+DELETE renames — against a
 * live HTTP endpoint ([[S3Stub]], the LocalStack stand-in).
 *
 * Semantics mirrored from S3/s3a:
 *  - directories are virtual: a path is a dir iff keys exist under
 *    `key/` (or an empty `key/` marker object, which `mkdirs` writes);
 *  - `rename` is client-orchestrated server-side COPY + DELETE per key —
 *    O(data), the exact cost the magic committer exists to avoid (the
 *    default `FileOutputCommitter` pays it here, which is the point: the
 *    smoke exercises the worst-case commit path end-to-end);
 *  - reads buffer the whole object (spec-scale); production streaming and
 *    multipart upload stay s3a's job.
 *
 * Registered per-spec via `fs.s3l.impl` + `fs.s3l.endpoint`; never part of
 * a production profile.
 */
final class S3LiteFileSystem extends FileSystem {

  private var fsUri: URI = _
  private var bucket: String = _
  private var endpoint: String = _
  private var workDir: Path = _

  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    setConf(conf)
    fsUri = URI.create(s"s3l://${uri.getAuthority}")
    bucket = uri.getAuthority
    endpoint = conf.get("fs.s3l.endpoint")
    require(endpoint != null, "fs.s3l.endpoint not set")
    workDir = new Path(s"s3l://$bucket/")
  }

  override def getScheme: String = "s3l"
  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(dir: Path): Unit = { workDir = dir }

  private def keyOf(f: Path): String =
    f.toUri.getPath.stripPrefix("/").stripSuffix("/")

  private def qualify(key: String): Path = new Path(s"s3l://$bucket/$key")

  // -- HTTP ----------------------------------------------------------------

  private def conn(method: String, pathPart: String,
                   query: String = ""): HttpURLConnection = {
    val q = if (query.isEmpty) "" else s"?$query"
    val c = new URL(s"$endpoint/$pathPart$q").openConnection()
      .asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    c
  }

  private def readBody(c: HttpURLConnection): Array[Byte] = {
    val in: InputStream =
      if (c.getResponseCode >= 400) c.getErrorStream else c.getInputStream
    if (in == null) return Array.emptyByteArray
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  private def headLen(key: String): Option[Long] = {
    val c = conn("HEAD", s"$bucket/$key")
    val code = c.getResponseCode
    val len = Option(c.getHeaderField("x-s3stub-length")).map(_.toLong)
      .orElse(Option(c.getHeaderField("Content-Length")).map(_.toLong))
    c.disconnect()
    if (code == 200) Some(len.getOrElse(0L)) else None
  }

  /** ListObjectsV2; returns (keys+sizes, commonPrefixes). */
  private def listKeys(prefix: String,
                       delimited: Boolean): (Seq[(String, Long)], Seq[String]) = {
    val q = new StringBuilder("list-type=2")
    if (prefix.nonEmpty)
      q ++= s"&prefix=${java.net.URLEncoder.encode(prefix, "UTF-8")}"
    if (delimited) q ++= "&delimiter=%2F"
    val c = conn("GET", bucket, q.toString)
    val xml = new String(readBody(c), UTF_8)
    c.disconnect()
    val contents = "<Contents><Key>(.*?)</Key><Size>(\\d+)</Size></Contents>".r
      .findAllMatchIn(xml).map(m => (unescape(m.group(1)), m.group(2).toLong))
      .toSeq
    val prefixes = "<CommonPrefixes><Prefix>(.*?)</Prefix></CommonPrefixes>".r
      .findAllMatchIn(xml).map(m => unescape(m.group(1))).toSeq
    (contents, prefixes)
  }

  private def unescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")

  private def put(key: String, body: Array[Byte]): Unit = {
    val c = conn("PUT", s"$bucket/$key")
    c.setDoOutput(true)
    val out: OutputStream = c.getOutputStream
    out.write(body); out.close()
    if (c.getResponseCode != 200)
      throw new IOException(s"PUT $key -> ${c.getResponseCode}")
    c.disconnect()
  }

  private def copy(srcKey: String, dstKey: String): Unit = {
    val c = conn("PUT", s"$bucket/$dstKey")
    c.setRequestProperty("x-amz-copy-source", s"/$bucket/$srcKey")
    if (c.getResponseCode != 200)
      throw new IOException(s"COPY $srcKey -> $dstKey: ${c.getResponseCode}")
    c.disconnect()
  }

  private def deleteKey(key: String): Unit = {
    val c = conn("DELETE", s"$bucket/$key")
    c.getResponseCode
    c.disconnect()
  }

  // -- FileSystem ----------------------------------------------------------

  private def fileStatus(key: String, len: Long): FileStatus =
    new FileStatus(len, false, 1, 32 * 1024 * 1024, 0L, qualify(key))

  private def dirStatus(key: String): FileStatus =
    new FileStatus(0, true, 1, 0, 0L,
      if (key.isEmpty) new Path(s"s3l://$bucket/") else qualify(key))

  override def getFileStatus(f: Path): FileStatus = {
    val key = keyOf(f)
    if (key.isEmpty) return dirStatus("")
    headLen(key) match {
      case Some(len) => fileStatus(key, len)
      case None =>
        val (ks, ps) = listKeys(s"$key/", delimited = true)
        if (ks.nonEmpty || ps.nonEmpty) dirStatus(key)
        else throw new FileNotFoundException(s"s3l://$bucket/$key")
    }
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val key = keyOf(f)
    if (key.nonEmpty && headLen(key).isDefined)
      return Array(fileStatus(key, headLen(key).get))
    val prefix = if (key.isEmpty) "" else s"$key/"
    val (ks, ps) = listKeys(prefix, delimited = true)
    if (key.nonEmpty && ks.isEmpty && ps.isEmpty)
      throw new FileNotFoundException(s"s3l://$bucket/$key")
    val files = ks.collect {
      case (k, len) if k != prefix => fileStatus(k, len) // skip dir marker
    }
    val dirs = ps.map(p => dirStatus(p.stripSuffix("/")))
    (files ++ dirs).toArray
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val key = keyOf(f)
    val c = conn("GET", s"$bucket/$key")
    if (c.getResponseCode == 404) {
      c.disconnect(); throw new FileNotFoundException(s"s3l://$bucket/$key")
    }
    val bytes = readBody(c)
    c.disconnect()
    new FSDataInputStream(new S3LiteInputStream(bytes))
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val key = keyOf(f)
    if (!overwrite && headLen(key).isDefined)
      throw new IOException(s"s3l://$bucket/$key already exists")
    val buf = new ByteArrayOutputStream()
    val out = new OutputStream {
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        buf.write(b, off, len)
      override def close(): Unit = put(key, buf.toByteArray)
    }
    new FSDataOutputStream(out, statistics)
  }

  override def append(f: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("s3l does not support append")

  /** Client-orchestrated COPY+DELETE per key — the S3 rename tax. */
  override def rename(src: Path, dst: Path): Boolean = {
    val srcKey = keyOf(src)
    val st =
      try getFileStatus(src)
      catch { case _: FileNotFoundException => return false }
    val dstKey0 = keyOf(dst)
    // Hadoop contract: renaming INTO an existing directory nests the source
    val dstKey =
      try {
        if (getFileStatus(dst).isDirectory) s"$dstKey0/${src.getName}"
        else return false // destination file exists
      } catch { case _: FileNotFoundException => dstKey0 }
    if (st.isDirectory) {
      val (ks, _) = listKeys(s"$srcKey/", delimited = false)
      ks.foreach { case (k, _) =>
        copy(k, dstKey + k.stripPrefix(srcKey)); deleteKey(k)
      }
    } else { copy(srcKey, dstKey); deleteKey(srcKey) }
    true
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val key = keyOf(f)
    headLen(key) match {
      case Some(_) => deleteKey(key); true
      case None =>
        val (ks, _) = listKeys(s"$key/", delimited = false)
        if (ks.isEmpty) false
        else if (!recursive)
          throw new IOException(s"s3l://$bucket/$key is a non-empty directory")
        else { ks.foreach { case (k, _) => deleteKey(k) }; true }
    }
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    val key = keyOf(f)
    if (key.nonEmpty) put(s"$key/", Array.emptyByteArray)
    true
  }

  /** Whole-object buffer with seek — spec-scale read path. */
  private final class S3LiteInputStream(bytes: Array[Byte])
      extends FSInputStream {
    private var pos = 0L
    override def seek(p: Long): Unit = {
      if (p < 0 || p > bytes.length) throw new IOException(s"bad seek $p")
      pos = p
    }
    override def getPos: Long = pos
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(): Int =
      if (pos >= bytes.length) -1
      else { val b = bytes(pos.toInt) & 0xff; pos += 1; b }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (pos >= bytes.length) return -1
      val n = math.min(len, bytes.length - pos.toInt)
      System.arraycopy(bytes, pos.toInt, b, off, n)
      pos += n
      n
    }
  }
}
