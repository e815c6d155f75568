package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.streaming.StreamingQueryListener

/** External offset-progress mirror — the `OffsetManager` SPI analog
  * (`lib/kpipe-consumer/.../OffsetManager.java:1-64`,
  * `docs/ESCAPE-HATCHES.md:54-147`: e.g. a Postgres-backed ledger for
  * ops visibility or cross-system commits).
  *
  * Spark's checkpoint is the authoritative frontier; this listener
  * mirrors each committed batch's end offsets to a pluggable store
  * (append-only JSONL file by default) AFTER the batch commits — a
  * read-model for operators, not a second source of truth. For
  * transactional offset+data commits, write offsets inside the
  * `foreachBatch` body in the same transaction as the data instead.
  */
object OffsetTracking {

  trait OffsetStore extends Serializable {
    def record(queryId: String, batchId: Long, sourcesJson: String): Unit
  }

  /** Append-only JSONL file store (one line per committed batch). */
  final class FileOffsetStore(path: String) extends OffsetStore {
    override def record(queryId: String, batchId: Long, sourcesJson: String): Unit = {
      val line = s"""{"queryId":"$queryId","batchId":$batchId,"sources":$sourcesJson}\n"""
      Files.write(Paths.get(path), line.getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }

  /** Listener mirroring committed progress into the store. */
  final class Listener(store: OffsetStore) extends StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val sources = e.progress.sources.map { s =>
        s"""{"description":${quote(s.description)},"endOffset":${orNull(s.endOffset)}}"""
      }.mkString("[", ",", "]")
      store.record(e.progress.id.toString, e.progress.batchId, sources)
    }
    private def quote(s: String): String =
      "\"" + Option(s).getOrElse("").replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    private def orNull(s: String): String = Option(s).getOrElse("null")
  }
}
