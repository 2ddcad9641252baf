package graft

/** Forked-JVM lease holder for the cross-process lease spec: creates
  * the `_COMPACTING` marker in the given dir with the local FS's
  * exclusive-create primitive, announces HELD, holds it for the given
  * milliseconds, then deletes it and exits. Deliberately dependency-
  * free (plain java.io) so the child classpath is just test-classes +
  * scala-library. */
object LeaseHolderMain {
  def main(args: Array[String]): Unit = {
    val f = new java.io.File(args(0), "_COMPACTING")
    if (!f.createNewFile()) { println("CONFLICT"); sys.exit(2) }
    val w = new java.io.FileWriter(f)
    w.write("held-by-another-process"); w.close()
    println("HELD"); System.out.flush()
    Thread.sleep(args(1).toLong)
    if (!f.delete()) { println("STUCK"); sys.exit(3) }
    println("RELEASED")
  }
}
