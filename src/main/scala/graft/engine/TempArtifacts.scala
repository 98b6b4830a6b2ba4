package graft.engine

import java.nio.file.{Files, Path}

/** JVM-exit cleanup registry for on-disk temp artifacts: sink round-trip
  * dirs ([[SourceQueries]]) and the persisted dedup/ANN index dirs
  * ([[Dedup]] band index, [[Similarity]] cell index). One shared
  * shutdown hook drains a queue of pending paths (a hook PER artifact
  * would retain one Thread each across a long bench session), and
  * prefix-keyed registration deletes the previous dir for a prefix so a
  * session iterating a query holds at most one live dir per prefix.
  */
private[graft] object TempArtifacts {
  private val pending =
    new java.util.concurrent.ConcurrentHashMap[String, Path]

  private[graft] def rm(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(rm))
    f.delete(): Unit
  }

  locally {
    sys.addShutdownHook {
      pending.values.forEach(d => rm(d.toFile))
    }: Unit
  }

  /** Create and register a temp dir under `prefix`, deleting the
    * previous dir registered under the same prefix. Callers whose dirs
    * must coexist (e.g. one index per fixture dir) put the
    * distinguishing key IN the prefix.
    */
  def tempDir(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix)
    Option(pending.put(prefix, dir)).foreach(d => rm(d.toFile))
    dir.toString
  }

  /** Delete a dir now and drop it from the exit queue (memo-eviction
    * path — the artifact's owner is going away before JVM exit).
    */
  def delete(path: String): Unit = {
    pending.values.removeIf(_.toString == path): Unit
    rm(new java.io.File(path))
  }
}
