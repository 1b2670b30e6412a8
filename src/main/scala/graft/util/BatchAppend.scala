package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** IDEMPOTENT per-micro-batch appends into a standing parquet directory —
  * the missing half of exactly-once ingest under foreachBatch's
  * at-least-once delivery: a replayed batch id must not duplicate rows that
  * an earlier (possibly partial) attempt already published.
  *
  * Protocol per (batch, target dir):
  *  1. STAGE — the batch is fully materialized under a hidden sibling
  *     (`.stage_<tag>`, overwrite mode: a replay rewrites it; the leading
  *     dot keeps Spark's file listing from ever seeing half-written data);
  *  2. CLEAN — every file carrying this batch's tag prefix is deleted from
  *     the target (the leftovers of a crashed previous attempt — including,
  *     for partitioned targets, partitions this attempt no longer writes,
  *     in case the assignment geometry changed while the process was down);
  *  3. PUBLISH — the staged part files rename into the target under the
  *     deterministic `<tag>-` prefix (a rename is atomic per file on
  *     HDFS-like filesystems, so concurrent readers see each file whole or
  *     not at all — the same visibility contract plain appends already
  *     have).
  *
  * A crash at ANY point replays into the same three steps: stage is
  * rewritten, clean removes whatever the dead attempt published, publish
  * lands the batch exactly once. Batch content must be deterministic across
  * redelivery (Structured Streaming's offset-log contract) for the rewrite
  * to be byte-equivalent — which it is for every engine-replayed batch.
  *
  * Scale: one extra directory listing + one file rename per staged part
  * file per batch. On object stores without atomic rename, production
  * swaps step 3 for a manifest commit — the protocol shape is unchanged.
  */
object BatchAppend {

  /** The deterministic per-batch file-name tag — zero-padded so lexical
    * and numeric order agree. */
  def tag(batchId: Long): String = f"b$batchId%019d"

  private val TaggedName = """^(b\d{19})-.*""".r

  /** Parse the batch tag back off a published file name — the ONE inverse
    * of [[tag]], shared by every compaction fence ([[Compaction
    * .compactDir]], [[graft.operators.ZOrder.compactZoned]]) so a tag
    * format change cannot silently break one fence and not the other. */
  def tagOf(name: String): Option[String] = name match {
    case TaggedName(t) => Some(t)
    case _ => None
  }

  /** Idempotently append `df` under `dir` (see the protocol above).
    * `partitionCol` routes the write through partitioned staging (e.g. the
    * IVF corpus's `cell=` directories) with the same guarantees per
    * partition directory. */
  def append(df: DataFrame, dir: String, batchTag: String,
      partitionCol: Option[String] = None): Unit = {
    val spark = df.sparkSession
    val target = new Path(dir)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())

    // 1. STAGE — partitioned targets repartition BY the partition column
    // first, so a batch lands at most ONE file per partition value instead
    // of (shuffle partitions × values): without this, a 32-task batch over
    // a 64-cell index staged up to 2048 files per trigger, and the
    // per-file create/rename/list fixed costs (not the rows) dominated the
    // ingest loop at wide geometries. One small shuffle of batch-sized
    // data buys a bounded-fragmentation standing index — the append-time
    // half of the small-file story ([[Compaction]] is the repair half).
    val stage = new Path(target, s".stage_$batchTag")
    val w = partitionCol match {
      case Some(c) =>
        df.repartition(org.apache.spark.sql.functions.col(c))
          .write.mode("overwrite").partitionBy(c)
      case None => df.write.mode("overwrite")
    }
    w.parquet(stage.toString)

    def cleanTagged(d: Path): Unit =
      if (fs.exists(d)) fs.listStatus(d).foreach { st =>
        if (st.isFile && st.getPath.getName.startsWith(s"$batchTag-"))
          fs.delete(st.getPath, false)
      }
    def publish(src: Path, dst: Path): Unit = {
      fs.mkdirs(dst)
      fs.listStatus(src).foreach { st =>
        val n = st.getPath.getName
        if (st.isFile && n.startsWith("part-"))
          require(fs.rename(st.getPath, new Path(dst, s"$batchTag-$n")),
            s"batch append: rename ${st.getPath} -> $dst failed")
      }
    }

    // 2. CLEAN + 3. PUBLISH
    partitionCol match {
      case None =>
        cleanTagged(target)
        publish(stage, target)
      case Some(c) =>
        // clean EVERY existing partition dir, not only the staged ones: a
        // crashed attempt may have published into partitions this replay
        // no longer produces (the assignment geometry can change across a
        // restart if the index was swapped externally while down)
        if (fs.exists(target)) fs.listStatus(target).foreach { st =>
          if (st.isDirectory && st.getPath.getName.startsWith(s"$c="))
            cleanTagged(st.getPath)
        }
        fs.listStatus(stage).foreach { st =>
          if (st.isDirectory && st.getPath.getName.startsWith(s"$c="))
            publish(st.getPath, new Path(target, st.getPath.getName))
        }
    }
    fs.delete(stage, true)
  }
}
