package graft

/** Tiny local-filesystem helpers shared by the scratch-dir operators and
  * specs (one definition instead of a copy per file). */
object Fs {

  def deleteRecursively(f: java.io.File): Unit = {
    // listFiles returns null on I/O or permission errors, not empty
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }

  def deleteRecursively(path: String): Unit =
    deleteRecursively(new java.io.File(path))

  /** Per-process scratch dir: two concurrent runs (say, the driver's
    * verify and a local Sweep) must not overwrite each other's dirs. */
  def scratch(group: String, name: String): String =
    s"${sys.props("java.io.tmpdir")}/${group}_${ProcessHandle.current().pid()}/$name"

  /** [[scratch]] + recursive delete — the fresh-scenario-dir idiom every
    * store-building operator opens with, as ONE definition. */
  def freshScratch(group: String, name: String): String = {
    val dir = scratch(group, name)
    deleteRecursively(dir)
    dir
  }
}
