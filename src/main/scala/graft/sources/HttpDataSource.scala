package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Named fetcher registry — the DSv2 form of [[HttpSource]]'s injected
  * `String => String` seam. DSv2 options are string maps, so the
  * function itself can't ride in the plan; instead readers look the
  * fetcher up by name at execution time. Tests register hermetic
  * fetchers (no network); the `jdk-http` default binds the JDK's
  * `HttpClient` for production. JVM-local: in `local[*]` (and tests)
  * driver and executors share the registry; on a real cluster custom
  * fetchers must be registered executor-side (e.g. from a Spark plugin
  * init) — the default needs no registration anywhere.
  */
object HttpFetchers {
  val DefaultName = "jdk-http"

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, String => String]()

  def register(name: String, fetch: String => String): Unit =
    registry.put(name, fetch)

  def lookup(name: String): String => String =
    if (name == DefaultName) jdkFetch
    else Option(registry.get(name)).getOrElse(
      throw new IllegalArgumentException(
        s"graft-http: no fetcher registered under '$name' " +
          "(HttpFetchers.register it on every JVM that runs tasks)"))

  /** Production default: plain JDK HttpClient GET (Java 11+, no extra
    * dependency). Non-2xx responses FAIL loudly with status + URL (an
    * error body must never reach the JSON parser — a 500 page parsing
    * as "expected a JSON array" is a misleading failure, and one that
    * happens to BE a JSON array would silently corrupt the read), and
    * both connect and request timeouts are bounded (JDK HttpClient has
    * NO default request timeout — a stalled endpoint would otherwise
    * block the partition reader forever). Exercised hermetically in
    * tests via a loopback `com.sun.net.httpserver` server.
    */
  private lazy val jdkClient = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10))
    .build()

  private[sources] lazy val jdkFetch: String => String = { url =>
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(60))
      .GET().build()
    val resp = jdkClient.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    val status = resp.statusCode()
    if (status < 200 || status >= 300)
      throw new java.io.IOException(
        s"graft-http: HTTP $status from $url (body ${resp.body().take(200)})")
    resp.body()
  }
}

/** DataSource V2 batch read over HTTP JSON-array endpoints —
  * `spark.read.format("graft-http")` (S3 of SURVEY §2.1 "if
  * productized"; reference acquisition: kafka_producer.py:29–31).
  *
  * Contract: a DECLARED schema is required (`.schema(...)` — fixed,
  * never inferred, SURVEY §1.2), flat JSON objects of
  * string/long/int/double/boolean fields (the reference's payload
  * shape), missing fields → null, unknown fields dropped.
  *
  * Scale shape: `urls` takes a comma-separated endpoint list and plans
  * ONE InputPartition per URL, so a paginated API fans out across
  * executors instead of serializing through the driver (the
  * `HttpSource.fetchJson` driver-side seam stays for KB-sized dims).
  * Column pruning is pushed down ([[HttpScanBuilder.pruneColumns]]):
  * a 2-column projection parses only those 2 fields per record.
  */
class HttpDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-http"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft-http requires a declared schema: spark.read.format(\"graft-http\")" +
        ".schema(...) — schemas are fixed, never inferred (SURVEY §1.2)")

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new HttpTable(schema, properties.asScala.toMap)
}

private[sources] class HttpTable(declared: StructType, props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String =
    s"graft-http(${props.getOrElse("url", props.getOrElse("urls", "?"))})"
  override def schema(): StructType = declared
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HttpScanBuilder(declared, options.asScala.toMap)
}

private[sources] class HttpScanBuilder(full: StructType, options: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val urls = options.get("urls").orElse(options.get("url")).getOrElse(
      throw new IllegalArgumentException("graft-http: missing 'url' (or 'urls') option"))
      .split(",").map(_.trim).filter(_.nonEmpty)
    val fetcher = options.getOrElse("fetcher", HttpFetchers.DefaultName)
    val conf = HttpReadConf(
      // JSON Pointer (RFC 6901, Jackson `at()`) to the record array inside
      // the response; "" = the response IS the array
      recordPointer = options.getOrElse("recordpointer", ""),
      // JSON Pointer to the next-page URL field; present → each partition
      // walks its pagination chain (reference pattern: per-session pages,
      // kafka_producer.py:99–104)
      nextPagePointer = options.get("nextpagepointer").filter(_.nonEmpty),
      maxPages = options.getOrElse("maxpages", "1000").toInt,
      maxRetries = options.getOrElse("maxretries", "2").toInt,
      retryBackoffMs = options.getOrElse("retrybackoffms", "250").toLong)
    HttpScan(required, urls.toIndexedSeq, fetcher, conf)
  }
}

/** Reader-side knobs, all plumbed from DSv2 options (lower-cased keys —
  * `CaseInsensitiveStringMap` folds case).
  */
private[sources] case class HttpReadConf(
    recordPointer: String,
    nextPagePointer: Option[String],
    maxPages: Int,
    maxRetries: Int,
    retryBackoffMs: Long)

private[sources] case class HttpUrlPartition(url: String) extends InputPartition

private[sources] case class HttpScan(required: StructType, urls: Seq[String],
    fetcherName: String, conf: HttpReadConf) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-http ${urls.mkString(",")} -> ${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] =
    urls.map(HttpUrlPartition(_): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    HttpReaderFactory(required, fetcherName, conf)
}

private[sources] case class HttpReaderFactory(required: StructType,
    fetcherName: String, conf: HttpReadConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val url = partition.asInstanceOf[HttpUrlPartition].url
    new PartitionReader[InternalRow] {
      // fetch + parse lazily on first next() so construction is cheap
      private var it: Iterator[InternalRow] = _
      private var row: InternalRow = _
      private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

      /** Bounded retry with exponential backoff around ONE page fetch —
        * transient 5xx/timeouts on one page must not fail a whole
        * partition (and with it the stage) on the first try.
        */
      private def fetchWithRetry(u: String): String = {
        val fetch = HttpFetchers.lookup(fetcherName)
        var attempt = 0
        while (true) {
          try return fetch(u)
          catch {
            // task kill/cancel interrupts the reader thread — propagate
            // immediately (re-flagged), never sleep-and-retry through it
            case e: InterruptedException =>
              Thread.currentThread().interrupt(); throw e
            case scala.util.control.NonFatal(_) if attempt < conf.maxRetries =>
              try Thread.sleep(conf.retryBackoffMs << attempt) // 250, 500, 1000…
              catch { // a task kill during backoff must keep the flag set too
                case e: InterruptedException =>
                  Thread.currentThread().interrupt(); throw e
              }
              attempt += 1
            case scala.util.control.NonFatal(e) =>
              throw new java.io.IOException(
                s"graft-http: fetch failed after ${attempt + 1} attempt(s): $u", e)
          }
        }
        throw new IllegalStateException("unreachable")
      }

      /** Parse one page body → (record iterator, next-page URL if any). */
      private def parsePage(u: String, body: String):
          (Iterator[InternalRow], Option[String]) = {
        val root = mapper.readTree(body)
        val arr = if (conf.recordPointer.isEmpty) root else root.at(conf.recordPointer)
        require(arr.isArray,
          s"graft-http: expected a JSON array at " +
            s"'${if (conf.recordPointer.isEmpty) "/" else conf.recordPointer}' from $u")
        val nextUrl = conf.nextPagePointer.flatMap { p =>
          val n = root.at(p)
          if (n.isMissingNode || n.isNull) None
          else Some(if (n.isTextual) n.asText() else n.toString)
        }.filter(_.nonEmpty)
          // real APIs commonly return RELATIVE next-page URLs — resolve
          // against the page they came from (absolute next URLs pass
          // through unchanged; an unparseable value still fails loudly,
          // naming the URL, not with an opaque builder error downstream)
          .map { n =>
            try new java.net.URI(u).resolve(n).toString
            catch {
              case e: Exception => throw new IllegalArgumentException(
                s"graft-http: cannot resolve next-page URL '$n' against $u", e)
            }
          }
        (arr.elements().asScala.map(toRow), nextUrl)
      }

      /** Lazily walks the pagination chain: page n+1 is fetched only
        * when page n's records are exhausted, so memory is one page.
        * Exceeding maxPages FAILS (no silent truncation — a capped read
        * that looks complete is worse than an error telling you to
        * raise `maxPages`).
        */
      private def pageIterator(firstUrl: String): Iterator[InternalRow] =
        new Iterator[InternalRow] {
          private var nextUrl: Option[String] = Some(firstUrl)
          private var cur: Iterator[InternalRow] = Iterator.empty
          private var pages = 0
          private def advance(): Unit =
            while (!cur.hasNext && nextUrl.isDefined) {
              if (pages >= conf.maxPages)
                throw new IllegalStateException(
                  s"graft-http: pagination exceeded maxPages=${conf.maxPages} " +
                    s"starting from $firstUrl — raise the 'maxPages' option")
              val u = nextUrl.get
              val (rows, next) = parsePage(u, fetchWithRetry(u))
              cur = rows
              nextUrl = next
              pages += 1
            }
          override def hasNext: Boolean = { advance(); cur.hasNext }
          override def next(): InternalRow = { advance(); cur.next() }
        }

      private def ensure(): Unit = if (it == null) it = pageIterator(url)

      private def toRow(node: com.fasterxml.jackson.databind.JsonNode): InternalRow = {
        val values = required.fields.map { f =>
          val v = node.get(f.name)
          if (v == null || v.isNull) null
          else f.dataType match {
            case StringType =>
              UTF8String.fromString(if (v.isTextual) v.asText() else v.toString)
            case LongType => java.lang.Long.valueOf(v.asLong())
            case IntegerType => java.lang.Integer.valueOf(v.asInt())
            case DoubleType => java.lang.Double.valueOf(v.asDouble())
            case BooleanType => java.lang.Boolean.valueOf(v.asBoolean())
            case other => throw new IllegalArgumentException(
              s"graft-http: unsupported field type $other for '${f.name}' " +
                "(flat string/long/int/double/boolean payloads only)")
          }
        }
        new GenericInternalRow(values.asInstanceOf[Array[Any]])
      }

      override def next(): Boolean = {
        ensure()
        if (it.hasNext) { row = it.next(); true } else false
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
