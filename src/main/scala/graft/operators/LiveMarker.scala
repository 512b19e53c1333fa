package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Resolved lifecycle state of a marker-committed index: the ruling
  * generation, the live data directory per family (relative to the
  * index root), and the not-yet-compacted delete-batch numbers.
  */
private[graft] final case class LiveState(
    gen: Long, dirs: Map[String, String], batches: Seq[Long]) {
  def dir(family: String): String = dirs(family)
}

/** The `_live` marker-generation commit protocol shared by the
  * persisted index families (PQ codes pioneered it —
  * `sim/SimSearch.scala` — BM25 postings and ANN vectors reuse it
  * through this class): every mutation lands as WRITE-ONCE
  * directories plus ONE marker PUT, so it is atomic on any
  * PUT-consistent store (object stores included, no renames).
  *
  *   - the marker file `_live.<gen %019d>` names the live directory
  *     of each data family (`<field>:<dir>`) and the outstanding
  *     delete-batch numbers (`tomb:b1,b2`), closed by an `end`
  *     footer — a torn PUT parses as absent;
  *   - READERS resolve through the newest complete marker (absent =
  *     the pristine layout: each family at its plain directory, no
  *     batches) and never delete anything;
  *   - WRITERS call [[heal]] before (clear a crashed predecessor's
  *     orphans, which would collide with `errorifexists` writes) and
  *     after (GC superseded state) their marker PUT;
  *   - single-writer discipline per index: concurrent writers trip
  *     the `errorifexists` batch/generation writes loudly; readers
  *     are always safe, including concurrently with compaction —
  *     they see the old generation + tombstone anti-join or the new
  *     compacted generation, never a mix.
  *
  * @param families one (field, plainDir, genPrefix) triple per data
  *                 family — e.g. `("postings", "postings",
  *                 "postings_gen=")`
  * @param batchRoots the per-delete-batch roots, each holding
  *                   `batch=<B>` children — e.g. `tombstones`
  */
private[graft] final class LiveMarker(
    families: Seq[(String, String, String)],
    batchRoots: Seq[String]) {

  private val Prefix = "_live."
  private val Footer = "end"

  private def pristine: LiveState =
    LiveState(0L, families.map(f => f._1 -> f._2).toMap, Seq.empty)

  private def markerPath(path: String, gen: Long) =
    new Path(path, f"$Prefix$gen%019d")

  private def parse(fs: FileSystem, p: Path): Option[LiveState] = {
    val gen =
      try p.getName.stripPrefix(Prefix).toLong
      catch { case _: NumberFormatException => return None }
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = text.split("\n", -1).toSeq.filter(_.nonEmpty)
    if (!lines.lastOption.contains(Footer)) return None
    val fields = lines.init.flatMap { l =>
      l.split(":", 2) match {
        case Array(k, v) => Some(k -> v)
        case _ => None
      }
    }.toMap
    if (!families.forall(f => fields.contains(f._1))) return None
    try Some(LiveState(gen,
      families.map(f => f._1 -> fields(f._1)).toMap,
      fields.getOrElse("tomb", "").split(",").filter(_.nonEmpty)
        .map(_.toLong).toSeq))
    catch { case _: NumberFormatException => None }
  }

  /** The ruling lifecycle state: newest complete marker, or the
    * pristine layout. Reader-safe — parses only, never deletes.
    */
  def read(fs: FileSystem, path: String): LiveState = {
    val root = new Path(path)
    val markers =
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).map(_.getPath)
        .filter(_.getName.startsWith(Prefix))
        .sortBy(_.getName).reverse.toSeq
    markers.iterator.flatMap(parse(fs, _)).nextOption()
      .getOrElse(pristine)
  }

  /** Commit `state` with one marker PUT (create-exclusive: a gen
    * collision — two writers racing — fails loudly).
    */
  def put(fs: FileSystem, path: String, state: LiveState): Unit = {
    val out = fs.create(markerPath(path, state.gen), false)
    try out.write((
      families.map(f => s"${f._1}:${state.dirs(f._1)}\n").mkString +
      s"tomb:${state.batches.mkString(",")}\n" +
      s"$Footer\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** WRITER-ONLY GC of everything the ruling marker does not
    * reference: superseded/torn markers, non-live data generations,
    * and unreferenced delete batches (both compacted-away ones and
    * the orphans of a crash before a marker PUT). Called from the
    * lifecycle writers only; readers resolve through the marker and
    * never GC.
    */
  def heal(fs: FileSystem, path: String): Unit = {
    val root = new Path(path)
    if (!fs.exists(root)) return
    val live = read(fs, path)
    def checkedDelete(p: Path): Unit =
      if (!fs.delete(p, true)) throw new java.io.IOException(
        s"index lifecycle GC failed to delete $p")
    fs.listStatus(root).map(_.getPath).foreach { p =>
      val n = p.getName
      if (n.startsWith(Prefix) && !parse(fs, p).exists(_.gen == live.gen))
        checkedDelete(p)
      else families.foreach { case (field, plain, genPrefix) =>
        if ((n == plain || n.startsWith(genPrefix)) &&
            n != live.dirs(field))
          checkedDelete(p)
      }
    }
    batchRoots.foreach { sub =>
      val subRoot = new Path(path, sub)
      if (fs.exists(subRoot)) {
        val keep = live.batches.map(b => s"batch=$b").toSet
        fs.listStatus(subRoot).map(_.getPath)
          .filter(p => p.getName.startsWith("batch=") &&
            !keep.contains(p.getName))
          .foreach(checkedDelete)
        if (live.batches.isEmpty && fs.listStatus(subRoot).isEmpty)
          checkedDelete(subRoot)
      }
    }
  }
}
