package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITE half of the DataSource V2 surface (`q_scan_dsv2` covers
  * the read half): a directory sink with the REAL two-phase commit
  * protocol every production sink needs —
  *
  *  1. each task writes to a UNIQUE attempt-named temp file
  *     (`.part-<task>-<attempt>.tmp`): speculative or retried
  *     attempts can never collide;
  *  2. task commit ATOMICALLY renames temp → final part file and
  *     returns the (name, rowCount) as its commit message;
  *  3. driver commit writes a `_MANIFEST` listing exactly the
  *     committed parts + counts — readers trust ONLY manifest-listed
  *     files, so an orphaned file from a task whose commit message
  *     was lost (the at-least-once window) is invisible;
  *  4. task/job abort deletes temp files — a failed job leaves no
  *     partial output visible.
  *
  * Rows land as `|`-joined text lines (long/double/string columns) —
  * the format is deliberately trivial; the COMMIT PROTOCOL is the
  * artifact under test. SinksSpec drives a write and replays the
  * manifest; the declared row `q_sink_dsv2` round-trips a table
  * through it under the DuckDB differential.
  */
class DirSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Nil) // write-only source: schema comes from the writer
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new DirSinkTable(schema, properties.get("path"))
}

class DirSinkTable(writeSchema: StructType, path: String)
    extends Table with SupportsWrite {
  require(path != null, "graft.sources.DirSink requires option 'path'")
  override def name(): String = s"graft_dirsink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = {
          // Append to an already-committed directory would CLOBBER it,
          // not append: part files are named by partitionId and the
          // manifest move is REPLACE_EXISTING (r12 advice). Until part
          // names carry a job epoch and manifests merge, refuse loudly
          // at job-plan time instead of silently losing the prior job.
          if (Files.exists(Paths.get(path, "_MANIFEST")))
            throw new IllegalStateException(
              s"graft.sources.DirSink: '$path' already holds a " +
              "committed write (_MANIFEST present); appending would " +
              "overwrite part files of the prior job. Write to a fresh " +
              "directory (or delete the old one explicitly).")
          new DirBatchWrite(path, info.schema())
        }
      }
    }
}

/** Task commit message: the committed part file and its row count. */
case class PartCommit(file: String, rows: Long) extends WriterCommitMessage

class DirBatchWrite(path: String, schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = DirWriterFactory(path, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val parts = messages.map(_.asInstanceOf[PartCommit])
    val manifest = parts.sortBy(_.file)
      .map(p => s"${p.file}|${p.rows}").mkString("", "\n", "\n")
    val tmp = Paths.get(path, "._MANIFEST.tmp")
    Files.createDirectories(Paths.get(path))
    Files.writeString(tmp, manifest)
    Files.move(tmp, Paths.get(path, "_MANIFEST"),
      StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case p: PartCommit =>
      Files.deleteIfExists(Paths.get(path, p.file))
    }
}

case class DirWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private val fin = f"part-$partitionId%05d.txt"
    private val tmp: Path = Paths.get(path, s".$fin-$taskId.tmp")
    Files.createDirectories(Paths.get(path))
    private val out = Files.newBufferedWriter(tmp)
    private var n = 0L
    private val types = schema.fields.map(_.dataType)

    override def write(row: InternalRow): Unit = {
      val cells = types.indices.map { i =>
        if (row.isNullAt(i)) "" else types(i) match {
          case LongType    => row.getLong(i).toString
          case IntegerType => row.getInt(i).toString
          case DoubleType  => row.getDouble(i).toString
          case StringType  => row.getUTF8String(i).toString
          case other => throw new IllegalArgumentException(
            s"DirSink supports long/int/double/string columns, got $other")
        }
      }
      out.write(cells.mkString("|")); out.newLine(); n += 1
    }
    override def commit(): WriterCommitMessage = {
      out.close()
      Files.move(tmp, Paths.get(path, fin), StandardCopyOption.ATOMIC_MOVE)
      PartCommit(fin, n)
    }
    override def abort(): Unit = { out.close(); Files.deleteIfExists(tmp) }
    override def close(): Unit = ()
  }
}
