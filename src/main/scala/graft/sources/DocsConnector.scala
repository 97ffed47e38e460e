package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * `format("graft-docs")` — an in-process DataSource V2 DOCUMENT-STORE
 * connector over JSON-lines files, the executable analog of the
 * reference's Mongo source seam (DAG:94-132,
 * `collection.find(query, projection)`): the reference pushes its filter
 * (`query`) and projection server-side so the store ships only matching
 * documents' requested fields, and THIS is the Spark seam a production
 * Mongo/Elastic/Cosmos connector plugs into —
 * [[SupportsPushDownFilters]] receives Catalyst's translated predicates
 * (the `query` document) and [[SupportsPushDownRequiredColumns]] the
 * pruned schema (the `projection` document). Here the "server" is the
 * scan itself: pushed filters are evaluated DURING the line scan, before
 * any row materializes into Spark, and only pruned columns are ever
 * converted — so a plan assertion can prove the filter/projection reached
 * the source, not a post-scan Filter node (DocsConnectorSpec).
 *
 * Contract:
 *  - `path`: a JSON-lines file or a directory of them (`part-*`,
 *    `*.json`, `*.jsonl`; underscore/dot metadata files skipped);
 *  - `schema`: REQUIRED DDL, e.g. `"doc_id BIGINT, lang STRING"` — the
 *    schema-pinned discipline every other source in this engine follows
 *    (no sampling-based inference: at 100 TB a schema sniff is a full
 *    scan, and drift should fail loudly, not re-infer silently). A
 *    reader-supplied `.schema(…)` is also honored
 *    (`supportsExternalMetadata`). Supported leaf types: BIGINT/INT/
 *    DOUBLE/STRING/BOOLEAN; absent or null JSON fields read as null.
 *  - Pushed: EqualTo / GreaterThan(OrEqual) / LessThan(OrEqual) / In /
 *    IsNull / IsNotNull / StringStartsWith on top-level columns —
 *    exactly the operator set a Mongo find() query expresses natively.
 *    Anything else is returned as a residual for Spark to evaluate
 *    post-scan (correctness never depends on the store's capabilities).
 *  - LIMIT pushdown ([[SupportsPushDownLimit]], the `find().limit(n)`
 *    analog): each partition reader stops after n post-filter rows —
 *    a per-partition superset, Spark's own Limit takes the final n.
 *  - WRITES ([[SupportsWrite]], append + truncate-overwrite): the load
 *    seam, with a real two-phase commit (task-staged files promoted by
 *    the driver's job commit — see [[DocsWriteBuilder]]).
 *  - STREAMING READS (`readStream.format("graft-docs")`): file-set
 *    offsets over the two-phase-committed data files — the reference's
 *    cron-incremental extract as a true micro-batch source (see
 *    [[DocsMicroBatchStream]]); exactly-once composes with an
 *    idempotent sink (the keyedIngestJdbc MERGE).
 *
 * Scale: one [[InputPartition]] per file — the natural parallel unit of
 * newline-delimited JSON (a production connector over a document STORE
 * partitions by shard/chunk ranges through the same seam; a 100 TB
 * JSONL lake arrives as many thousands of files, so per-file splits
 * already saturate the cluster). Filters cut rows at the line scan, so
 * partition output is post-filter — the connector ships only matching
 * rows into the exchange, like the reference's server-side find().
 */
class DocsDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-docs"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val ddl = options.get("schema")
    require(ddl != null,
      "graft-docs is schema-pinned: pass .option(\"schema\", \"<DDL>\") " +
        "or .schema(...) — inference would full-scan the store")
    StructType.fromDDL(ddl)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "graft-docs requires .option(\"path\", ...)")
    DocsConnector.validateSchema(schema)
    new DocsTable(path, schema)
  }
}

private[graft] class DocsTable(path: String, docSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-docs:$path"
  override def schema(): StructType = docSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocsScanBuilder(path, docSchema)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new DocsWriteBuilder(path, info.schema(), info.queryId())
}

private[graft] class DocsScanBuilder(path: String, docSchema: StructType)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = docSchema
  private var limit: Int = -1

  /** The `find(query).limit(n)` analog: each partition reader stops
    * after `n` post-filter rows (a per-partition superset of the global
    * answer — Spark's own Limit still takes the final n, so returning
    * `true` here only cuts the rows the store ships, never correctness). */
  override def pushLimit(n: Int): Boolean = { limit = n; true }

  /** Accept the filters the document store can evaluate server-side;
    * everything else goes back to Spark as a residual. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, unsup) = filters.partition(DocsConnector.supported(docSchema, _))
    pushed = sup
    unsup
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // Catalyst hands the post-pushdown required columns (the projection
    // document); fields keep the table schema's types
    required = requiredSchema
  }

  override def build(): Scan =
    new DocsScan(path, docSchema, required, pushed, limit)
}

/** The scan carries BOTH schemas: `docSchema` to parse/filter each line
  * (a pushed filter may reference a column the projection dropped) and
  * `required` to materialize only requested fields. */
private[graft] class DocsScan(path: String, docSchema: StructType,
                              required: StructType, pushed: Array[Filter],
                              limit: Int = -1)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required

  /** The optimizer-stats seam (a production connector reports collection/
    * shard stats here): size = total on-disk bytes of the listed files —
    * an upper bound once filters push (conservative for broadcast
    * decisions: Catalyst only broadcasts when the bound is small, so an
    * overestimate never broadcasts something big). Row count left
    * unknown: lines aren't countable without a scan. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes =
      DocsConnector.listFiles(path).map(f => new java.io.File(f).length).sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }

  override def description(): String =
    s"GraftDocsScan path=$path, " +
      s"PushedFilters: [${pushed.mkString(", ")}], " +
      s"PushedLimit: ${if (limit >= 0) limit.toString else "none"}, " +
      s"ReadSchema: ${required.catalogString}"

  override def toBatch: Batch = this

  /** The STREAMING read path — the reference's cron-incremental extract
    * (DAG:437-446 + the `updated_at >= window_start` filter, DAG:124-129)
    * as a true Structured Streaming source: each micro-batch reads
    * exactly the data files that appeared since the last committed
    * offset. Offsets are the sorted set of processed file names —
    * sound because the write path is two-phase (files are PROMOTED by
    * atomic rename, so a listed file is complete and immutable, and
    * `_staging`/dot files are never listed). Deterministic replay: the
    * same (start, end) offset pair always plans the same file set, so a
    * foreachBatch replay after a crash re-reads identical rows
    * (exactly-once composes with an idempotent sink, e.g. the
    * `keyedIngestJdbc` MERGE). Pushed filters/projection/limit apply
    * per micro-batch exactly as in batch scans. A production connector
    * over a real document store swaps the file-set offset for resume
    * tokens / change-stream positions through this same seam; a
    * 100 TB-scale file store would compact the seen-set into a log the
    * way Spark's own FileStreamSource does — the offset SEMANTICS
    * (monotone set of complete files) are identical. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new DocsMicroBatchStream(path, docSchema, required, pushed, limit)

  override def planInputPartitions(): Array[InputPartition] =
    DocsConnector.listFiles(path).map(f => DocsInputPartition(f)).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new DocsReaderFactory(docSchema, required, pushed, limit)
}

/** Offset = the sorted set of data files already processed (JSON array
  * of names). Files are immutable once promoted, so set difference IS
  * the micro-batch. */
private[graft] case class DocsOffset(files: Seq[String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    new ObjectMapper().writeValueAsString(files.sorted.toArray)
}

private[graft] class DocsMicroBatchStream(path: String,
                                          docSchema: StructType,
                                          required: StructType,
                                          pushed: Array[Filter],
                                          limit: Int)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  override def initialOffset(): Offset = DocsOffset(Nil)

  override def latestOffset(): Offset =
    DocsOffset(DocsConnector.listFiles(path).map(f =>
      new java.io.File(f).getName))

  override def deserializeOffset(json: String): Offset =
    DocsOffset(new ObjectMapper().readValue(json,
      classOf[Array[String]]).toSeq)

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val done = start.asInstanceOf[DocsOffset].files.toSet
    val want = end.asInstanceOf[DocsOffset].files.filterNot(done).sorted
    val root = new java.io.File(path)
    // files named in a committed offset must still exist — a vanished
    // file would silently drop rows on replay
    want.map { name =>
      val f = if (root.isFile && root.getName == name) root
        else new java.io.File(path, name)
      require(f.isFile, s"offset names a vanished file: $f")
      DocsInputPartition(f.getPath)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DocsReaderFactory(docSchema, required, pushed, limit)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[graft] case class DocsInputPartition(file: String)
    extends InputPartition

private[graft] class DocsReaderFactory(docSchema: StructType,
                                       required: StructType,
                                       pushed: Array[Filter],
                                       limit: Int = -1)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new DocsPartitionReader(
      p.asInstanceOf[DocsInputPartition].file, docSchema, required, pushed,
      limit)
}

/** Streams one JSON-lines file: parse → pushed-filter gate → project.
  * Rows failing a pushed filter never materialize an [[InternalRow]] —
  * the "server-side find()" the connector models. */
private[graft] class DocsPartitionReader(file: String,
                                         docSchema: StructType,
                                         required: StructType,
                                         pushed: Array[Filter],
                                         limit: Int = -1)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val in = new BufferedReader(new InputStreamReader(
    new java.io.FileInputStream(file), StandardCharsets.UTF_8))
  private val fullFields = docSchema.fields
  private val reqIdx = required.fields.map(f => docSchema.fieldIndex(f.name))
  private var current: InternalRow = _
  private var emitted = 0

  override def next(): Boolean = {
    // pushed limit: stop the line scan after n post-filter rows — the
    // per-partition superset contract (Spark's Limit takes the final n)
    if (limit >= 0 && emitted >= limit) return false
    var line = in.readLine()
    while (line != null) {
      if (line.nonEmpty) {
        val node = mapper.readTree(line)
        val vals = new Array[Any](fullFields.length)
        var i = 0
        while (i < fullFields.length) {
          vals(i) = DocsConnector.extract(node, fullFields(i))
          i += 1
        }
        if (pushed.forall(DocsConnector.eval(_, docSchema, vals))) {
          val proj = new Array[Any](reqIdx.length)
          var j = 0
          while (j < reqIdx.length) {
            proj(j) = DocsConnector.toCatalyst(
              vals(reqIdx(j)), required.fields(j).dataType)
            j += 1
          }
          current = InternalRow.fromSeq(proj.toIndexedSeq)
          emitted += 1
          return true
        }
      }
      line = in.readLine()
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}

/**
 * The WRITE side of the connector — the load seam (the reference's
 * psycopg2 loader, DAG:270-316, pointed at a document store instead):
 * `df.write.format("graft-docs").mode("append"|"overwrite").save()`.
 *
 * Two-phase commit, the DSv2 contract done properly:
 *  1. every task writes its rows to a UNIQUE staged file under
 *     `<path>/_staging/<queryId>/` (attempt-unique name, so a retried
 *     task never clobbers its zombie predecessor — only the attempt
 *     whose message reaches the driver gets promoted);
 *  2. job `commit()` promotes exactly the staged files named in the
 *     commit messages into `<path>` via same-volume atomic renames —
 *     for `overwrite` (SupportsTruncate) the old data files are removed
 *     in the same commit, after the staged files are proven present;
 *  3. `abort()` deletes the staging directory — the target never sees a
 *     partial write (readers skip `_`-prefixed paths, so even a crash
 *     BETWEEN stage and commit leaves the table readable and clean).
 */
private[graft] class DocsWriteBuilder(path: String, schema: StructType,
                                      queryId: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new DocsBatchWrite(path, schema, queryId, doTruncate)
  }
}

private[graft] case class DocsCommitMessage(stagedFile: String)
    extends WriterCommitMessage

private[graft] class DocsBatchWrite(path: String, schema: StructType,
                                    queryId: String, truncate: Boolean)
    extends BatchWrite {
  DocsConnector.validateSchema(schema)
  private val staging = s"$path/_staging/$queryId"

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new DocsWriterFactory(staging, schema, DocsConnector.fileTag(queryId))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val target = new java.io.File(path)
    target.mkdirs()
    val staged = messages.map(_.asInstanceOf[DocsCommitMessage].stagedFile)
    staged.foreach { f =>
      require(new java.io.File(f).isFile, s"staged file vanished: $f")
    }
    // truncate AFTER the staged files are proven present — an overwrite
    // that cannot complete must not have emptied the table
    if (truncate) target.listFiles().foreach { f =>
      val n = f.getName
      if (f.isFile && !n.startsWith("_") && !n.startsWith("."))
        require(f.delete(), s"could not truncate $f")
    }
    staged.foreach { f =>
      val src = new java.io.File(f)
      val dst = new java.io.File(target, src.getName)
      // promoted names carry the queryId tag so they are globally
      // unique; a name collision can then only be a REAL conflict
      // (duplicated commit, foreign file) — fail the commit instead of
      // silently replacing the earlier data file (taskId alone is only
      // unique within one Spark application)
      require(!dst.exists(),
        s"destination already exists, refusing to overwrite: $dst")
      require(src.renameTo(dst), s"could not promote $f")
    }
    cleanupStaging()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    cleanupStaging()

  /** Remove THIS query's staging dir only (a concurrent writer owns its
    * own queryId dir); the shared `_staging` parent goes when empty —
    * plain delete() refuses non-empty dirs, which is exactly right. */
  private def cleanupStaging(): Unit = {
    DocsConnector.deleteTree(new java.io.File(staging))
    new java.io.File(s"$path/_staging").delete()
    ()
  }
}

private[graft] class DocsWriterFactory(staging: String, schema: StructType,
                                       tag: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new DocsDataWriter(staging, schema, partitionId, taskId, tag)
}

/** One staged JSON-lines file per task ATTEMPT (taskId is
  * attempt-unique WITHIN an application; the queryId-derived `tag`
  * makes the name unique ACROSS applications appending to the same
  * store): rows stream out as they arrive, `commit()` hands the file
  * name to the driver, `abort()` removes it. */
private[graft] class DocsDataWriter(staging: String, schema: StructType,
                                    partitionId: Int, taskId: Long,
                                    tag: String)
    extends DataWriter[InternalRow] {
  private val file = new java.io.File(
    staging, f"part-$partitionId%05d-$taskId-$tag.jsonl")
  file.getParentFile.mkdirs()
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    new java.io.FileOutputStream(file), StandardCharsets.UTF_8))
  private val mapper = new ObjectMapper()

  override def write(row: InternalRow): Unit = {
    val node = mapper.createObjectNode()
    var i = 0
    while (i < schema.fields.length) {
      val f = schema.fields(i)
      if (row.isNullAt(i)) node.putNull(f.name)
      else f.dataType match {
        case LongType => node.put(f.name, row.getLong(i))
        case IntegerType => node.put(f.name, row.getInt(i))
        case DoubleType => node.put(f.name, row.getDouble(i))
        case BooleanType => node.put(f.name, row.getBoolean(i))
        case StringType => node.put(f.name, row.getUTF8String(i).toString)
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
      i += 1
    }
    out.write(mapper.writeValueAsString(node))
    out.write("\n")
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    DocsCommitMessage(file.getPath)
  }

  override def abort(): Unit = {
    out.close()
    file.delete()
    ()
  }

  override def close(): Unit = out.close()
}

private[graft] object DocsConnector {

  /** Filename-safe tag from a queryId (a UUID in practice): 16
    * alphanumerics ≈ 64 bits — globally unique across applications,
    * which taskId alone is not. */
  def fileTag(queryId: String): String = {
    val t = Option(queryId).getOrElse("").filter(_.isLetterOrDigit).take(16)
    if (t.nonEmpty) t
    else java.util.UUID.randomUUID().toString.replace("-", "").take(16)
  }

  /** Recursive best-effort delete (staging cleanup); absent paths ok. */
  def deleteTree(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(deleteTree)
    }
    f.delete()
    ()
  }

  def validateSchema(schema: StructType): Unit = schema.fields.foreach { f =>
    f.dataType match {
      case LongType | IntegerType | DoubleType | StringType | BooleanType =>
      case other => throw new IllegalArgumentException(
        s"graft-docs supports BIGINT/INT/DOUBLE/STRING/BOOLEAN leaves; " +
          s"'${f.name}' is ${other.simpleString}")
    }
  }

  /** Files of a JSON-lines dataset under `path` (or `path` itself),
    * deterministic order. Exactly the documented data-file shapes are
    * read — `part-*`, `*.json`, `*.jsonl` — so a stray non-JSONL file
    * in the directory is SKIPPED, not parsed into a mid-scan Jackson
    * error (metadata `_`/`.`-prefixed and `.crc` files were always
    * skipped; this closes the gap for everything else). */
  def listFiles(path: String): Seq[String] = {
    val root = new java.io.File(path)
    require(root.exists(), s"graft-docs path does not exist: $path")
    if (root.isFile) Seq(root.getPath)
    else root.listFiles().toSeq
      .filter(f => f.isFile && {
        val n = f.getName
        !n.startsWith("_") && !n.startsWith(".") && !n.endsWith(".crc") &&
          (n.startsWith("part-") || n.endsWith(".json") ||
            n.endsWith(".jsonl"))
      })
      .map(_.getPath).sorted
  }

  /** JSON leaf → JVM value in the field's declared type (null-safe). */
  def extract(node: JsonNode, field: StructField): Any = {
    val v = node.get(field.name)
    if (v == null || v.isNull) null
    else field.dataType match {
      case LongType => v.asLong()
      case IntegerType => v.asInt()
      case DoubleType => v.asDouble()
      case BooleanType => v.asBoolean()
      case StringType => v.asText()
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
  }

  /** JVM value → Catalyst internal value. */
  def toCatalyst(v: Any, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case StringType => UTF8String.fromString(v.asInstanceOf[String])
      case _ => v
    }

  /** Is this source filter evaluable here (a Mongo-find-expressible
    * predicate on a top-level column)? */
  def supported(schema: StructType, f: Filter): Boolean = f match {
    case EqualTo(a, _) => schema.fieldNames.contains(a)
    case GreaterThan(a, _) => schema.fieldNames.contains(a)
    case GreaterThanOrEqual(a, _) => schema.fieldNames.contains(a)
    case LessThan(a, _) => schema.fieldNames.contains(a)
    case LessThanOrEqual(a, _) => schema.fieldNames.contains(a)
    case In(a, _) => schema.fieldNames.contains(a)
    case IsNull(a) => schema.fieldNames.contains(a)
    case IsNotNull(a) => schema.fieldNames.contains(a)
    case StringStartsWith(a, _) => schema.fieldNames.contains(a)
    case _ => false
  }

  /** SQL three-valued semantics collapsed to keep/drop: a comparison on
    * a null field drops the row (exactly what the post-scan Filter would
    * have done), IsNull keeps it. */
  def eval(f: Filter, schema: StructType, vals: Array[Any]): Boolean = {
    def v(name: String): Any = vals(schema.fieldIndex(name))
    f match {
      case EqualTo(a, lit) => cmp(v(a), lit).contains(0)
      case GreaterThan(a, lit) => cmp(v(a), lit).exists(_ > 0)
      case GreaterThanOrEqual(a, lit) => cmp(v(a), lit).exists(_ >= 0)
      case LessThan(a, lit) => cmp(v(a), lit).exists(_ < 0)
      case LessThanOrEqual(a, lit) => cmp(v(a), lit).exists(_ <= 0)
      case In(a, lits) => lits.exists(l => cmp(v(a), l).contains(0))
      case IsNull(a) => v(a) == null
      case IsNotNull(a) => v(a) != null
      case StringStartsWith(a, p) => v(a) match {
        case s: String => s.startsWith(p)
        case _ => false
      }
      case other => throw new IllegalStateException(
        s"unpushable filter reached eval: $other")
    }
  }

  /** None when either side is null (comparison is unknown → drop). */
  private def cmp(field: Any, lit: Any): Option[Int] =
    (field, lit) match {
      case (null, _) | (_, null) => None
      case (a: String, b: String) => Some(a.compareTo(b))
      case (a: Boolean, b: Boolean) => Some(java.lang.Boolean.compare(a, b))
      case (a: Number, b: Number) =>
        // a double-vs-long comparison compares as double — lossless for
        // the magnitudes JSON carries and matches Spark's widened cast
        if (isIntegral(a) && isIntegral(b))
          Some(java.lang.Long.compare(a.longValue(), b.longValue()))
        else Some(java.lang.Double.compare(a.doubleValue(), b.doubleValue()))
      case _ => None
    }

  private def isIntegral(n: Number): Boolean = n match {
    case _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
         _: java.lang.Byte => true
    case _ => false
  }
}
