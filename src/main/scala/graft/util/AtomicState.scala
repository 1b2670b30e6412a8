package graft.util

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Tiny crash-safe driver-state persistence for standing streams — the
  * durable home of what the in-memory monitors used to hold only in the
  * driver ([[graft.streaming.AnnStream]]'s retrain monitors). GENERATION
  * NAMING instead of overwrite-in-place: each write lands as
  * `state-<gen>.json` via a hidden temp file + rename, then older
  * generations are deleted best-effort. A crash at any point leaves the
  * previous complete generation readable — there is never a window with no
  * valid state on disk (the failure overwrite-in-place has: delete old,
  * die, and the restart seeds from nothing mid-history).
  *
  * Generations must be strictly increasing across writes (callers derive
  * them from the batch id); [[readLatest]] takes the numerically highest
  * complete file. State bodies are one small JSON string — longs are
  * serialized AS STRINGS so the [[MiniJson]] double-typed reader
  * round-trips them exactly past 2^53. */
object AtomicState {

  private val Name = "^state-([0-9]+)\\.json$".r

  def write(spark: SparkSession, dir: String, gen: Long,
      body: String): Unit = {
    val d = new Path(dir)
    val fs = d.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(d)
    val tmp = new Path(d, s".tmp-state-$gen.json")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val dst = new Path(d, s"state-$gen.json")
    fs.delete(dst, false) // a same-generation rewrite (replayed batch)
    require(fs.rename(tmp, dst), s"state write: rename $tmp -> $dst failed")
    fs.listStatus(d).foreach { st =>
      st.getPath.getName match {
        case Name(g) if g.toLong < gen => fs.delete(st.getPath, false)
        // a crash between create and rename leaves `.tmp-state-*.json`
        // orphans; sweep any that aren't THIS write's in-flight name, or a
        // periodically-crashing stream accumulates them without bound (and
        // pays for them in every per-fold listStatus)
        case n if n.startsWith(".tmp-state-") && n != tmp.getName =>
          fs.delete(st.getPath, false)
        case _ => ()
      }
    }
  }

  /** The highest-generation state body, or None if the dir is empty or
    * absent (a fresh stream). */
  def readLatest(spark: SparkSession, dir: String): Option[String] = {
    val d = new Path(dir)
    val fs = d.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(d)) return None
    val latest = fs.listStatus(d).toSeq
      .flatMap(st => st.getPath.getName match {
        case Name(g) => Some((g.toLong, st.getPath))
        case _ => None
      })
      .sortBy(_._1).lastOption
    latest.map { case (_, p) =>
      val in = fs.open(p)
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    }
  }
}
