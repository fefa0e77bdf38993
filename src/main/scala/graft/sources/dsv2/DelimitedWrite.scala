package graft.sources.dsv2

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._

/** The WRITE half of the DataSource V2 delimited ladder — the CETAS export
  * analog (reference: the PolyBase loop's unload side, whitepaper.md:17
  * scales "readers AND writers" together) through Spark's own commit
  * protocol instead of a side-channel:
  *
  *   - one [[DelimitedDataWriter]] per input partition (writer-per-split
  *     parallelism, the DMS writer-count analog),
  *   - task outputs land as hidden `.inprogress` files; job COMMIT renames
  *     them into place and — under truncate/overwrite — deletes the
  *     previous generation only after every task has succeeded, so readers
  *     never observe a half-written mix of generations,
  *   - ABORT deletes the in-progress files and leaves the previous
  *     generation untouched.
  *
  * Values render in the reader's own grammar (quote-doubling for embedded
  * delimiters, empty field = NULL, `java.sql.Timestamp` text), so
  * write → read round-trips cell-for-cell through the V2 scan.
  */
final class DelimitedWriteBuilder(schema: StructType, path: String,
    sep: String, quote: String) extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new DelimitedBatchWrite(schema, path, sep, quote, doTruncate)
    override def toStreaming
        : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new DelimitedStreamingWrite(schema, path, sep, quote)
  }
}

/** Streaming sink: one file per (epoch, partition) with DETERMINISTIC final
  * names, so a replayed epoch (post-crash micro-batch re-execution)
  * overwrites its own output instead of duplicating it — the same
  * idempotence contract EventStream.appendToTable keeps at the partition
  * grain. Task attempts write to attempt-unique hidden temp files; epoch
  * commit publishes them by rename-over.
  */
final class DelimitedStreamingWrite(schema: StructType, path: String,
    sep: String, quote: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    DelimitedStreamingWriterFactory(schema, path, sep, quote)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val dir = new Path(path)
    val fs = FileSystem.get(dir.toUri, conf)
    messages.collect { case DelimitedStreamCommit(tmp, fin) => (tmp, fin) }
      .foreach { case (tmp, fin) =>
        val tmpPath = new Path(dir, tmp)
        val finPath = new Path(dir, fin)
        if (fs.exists(tmpPath)) {
          if (fs.exists(finPath)) { fs.delete(finPath, false): Unit }
          fs.rename(tmpPath, finPath): Unit
        }
      }
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val dir = new Path(path)
    val fs = FileSystem.get(dir.toUri, conf)
    messages.collect { case DelimitedStreamCommit(tmp, _) => tmp }
      .foreach { tmp =>
        val p = new Path(dir, tmp)
        if (fs.exists(p)) { fs.delete(p, false): Unit }
      }
  }
}

final case class DelimitedStreamCommit(tmpFile: String, finalFile: String)
  extends WriterCommitMessage

final case class DelimitedStreamingWriterFactory(schema: StructType,
    path: String, sep: String, quote: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] = {
    val finalName = f"part-e$epochId%05d-$partitionId%05d.csv"
    new DelimitedDataWriter(schema, path, sep, quote,
      fileName = finalName, tmpName = s".$finalName.$taskId.inprogress",
      msg = DelimitedStreamCommit(s".$finalName.$taskId.inprogress", finalName))
  }
}

final case class DelimitedCommit(file: String) extends WriterCommitMessage

final class DelimitedBatchWrite(schema: StructType, path: String, sep: String,
    quote: String, truncate: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory =
    DelimitedWriterFactory(schema, path, sep, quote)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val dir = new Path(path)
    val fs = FileSystem.get(dir.toUri, conf)
    val committed = messages.collect { case DelimitedCommit(f) => f }.toSet
    // this job's outputs are still hidden .inprogress files here, so under
    // truncate every VISIBLE file is the previous generation — drop it all
    // before the renames publish the new one
    if (truncate && fs.exists(dir))
      fs.listStatus(dir).filter(s => s.isFile &&
          !s.getPath.getName.startsWith("."))
        .foreach(s => fs.delete(s.getPath, false): Unit)
    committed.foreach { f =>
      val tmp = new Path(dir, s".$f.inprogress")
      if (fs.exists(tmp)) { fs.rename(tmp, new Path(dir, f)): Unit }
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val dir = new Path(path)
    val fs = FileSystem.get(dir.toUri, conf)
    messages.collect { case DelimitedCommit(f) => f }.foreach { f =>
      val tmp = new Path(dir, s".$f.inprogress")
      if (fs.exists(tmp)) { fs.delete(tmp, false): Unit }
    }
  }
}

final case class DelimitedWriterFactory(schema: StructType, path: String,
    sep: String, quote: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] = {
    val name = f"part-$partitionId%05d-$taskId.csv"
    new DelimitedDataWriter(schema, path, sep, quote,
      fileName = name, tmpName = s".$name.inprogress",
      msg = DelimitedCommit(name))
  }
}

final class DelimitedDataWriter(schema: StructType, path: String, sep: String,
    quote: String, fileName: String, tmpName: String,
    msg: WriterCommitMessage) extends DataWriter[InternalRow] {

  private val conf = new org.apache.hadoop.conf.Configuration()
  private val dir = new Path(path)
  private val fs = FileSystem.get(dir.toUri, conf)
  fs.mkdirs(dir)
  private val tmpPath = new Path(dir, tmpName)
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    fs.create(tmpPath, true), java.nio.charset.StandardCharsets.UTF_8))
  private var firstRow = true

  private def render(row: InternalRow, i: Int, dt: DataType): String =
    if (row.isNullAt(i)) ""
    else dt match {
      case StringType =>
        val s = row.getUTF8String(i).toString
        if (s.contains(sep) || s.contains(quote) || s.isEmpty)
          quote + s.replace(quote, quote + quote) + quote
        else s
      case LongType => row.getLong(i).toString
      case IntegerType => row.getInt(i).toString
      case DoubleType => row.getDouble(i).toString
      case TimestampType =>
        val micros = row.getLong(i)
        val ts = new java.sql.Timestamp(java.lang.Math.floorDiv(micros, 1000L))
        ts.setNanos((java.lang.Math.floorMod(micros, 1000000L) * 1000L).toInt)
        ts.toString
      case other =>
        throw new IllegalArgumentException(s"unsupported export type $other")
    }

  override def write(row: InternalRow): Unit = {
    if (!firstRow) out.write("\n")
    firstRow = false
    out.write(schema.fields.indices.map(i =>
      render(row, i, schema.fields(i).dataType)).mkString(sep))
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    msg
  }

  override def abort(): Unit = {
    out.close()
    if (fs.exists(tmpPath)) { fs.delete(tmpPath, false): Unit }
  }

  override def close(): Unit = ()
}
