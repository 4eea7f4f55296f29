package graft

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentLinkedQueue

/** Ephemeral directories for query-scoped sinks/indexes (IVF index dirs,
  * streaming checkpoints, engine warehouses in the battery queries).
  *
  * Every battery run used to leak its `Files.createTempDirectory` dirs:
  * nothing deleted them, and on a host that runs the battery repeatedly
  * /tmp accumulated thousands of `graft-*` dirs (23 GB observed by round
  * 7) — a slow environmental drag on later runs and the prime suspect in
  * the q124 round-over-round bench growth. Two defenses:
  *
  *   - `create` registers each dir for recursive deletion in ONE JVM
  *     shutdown hook (deletion can't happen earlier: the DataFrames a
  *     query returns read these paths lazily, so the dir must outlive
  *     consumption — i.e. the process);
  *   - `sweepStale` (called from the Bench/Verify mains) deletes `graft-*`
  *     dirs older than a few hours left behind by crashed/killed runs.
  */
object TempDirs {
  private val registered = new ConcurrentLinkedQueue[Path]()
  @volatile private var hooked = false

  def create(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    if (!hooked) synchronized {
      if (!hooked) {
        Runtime.getRuntime.addShutdownHook(new Thread(() => {
          registered.forEach(deleteRecursively(_))
        }, "graft-tempdir-cleanup"))
        hooked = true
      }
    }
    registered.add(p)
    p
  }

  /** Delete leftover graft-* temp dirs from previous crashed/killed JVMs.
    * Age-gated from the dir's mtime (= creation), so the gate must exceed
    * the LONGEST plausible sibling run, not the typical one — a full sf1
    * ladder battery can run the better part of an hour, and a live dir
    * swept mid-run fails that JVM's lazy reads. 12 h clears the previous
    * round's leftovers while staying far above any real run length. */
  def sweepStale(maxAgeHours: Int = 12): Unit = try {
    val tmp = Paths.get(System.getProperty("java.io.tmpdir"))
    val cutoff = System.currentTimeMillis() - maxAgeHours * 3600000L
    val s = Files.list(tmp)
    try s.forEach { p =>
      val n = p.getFileName.toString
      if (n.startsWith("graft-") && Files.isDirectory(p) &&
          Files.getLastModifiedTime(p).toMillis < cutoff)
        deleteRecursively(p)
    } finally s.close()
  } catch { case _: Throwable => () }

  private def deleteRecursively(p: Path): Unit = try {
    val s = Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(f => try Files.deleteIfExists(f) catch { case _: Throwable => () })
    finally s.close()
  } catch { case _: Throwable => () }
}
