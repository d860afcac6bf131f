package graft.tools

/** Prints the CURRENT registry size — the round-close sweep's
  * self-enforcement hook (r12): `tools/sf01_artifact.py` compares the
  * assembled artifact's key count against this number and fails
  * loudly on mismatch, so a registry grown AFTER a sweep can no
  * longer ship a stale second-scale-factor artifact (the r9/r10/r11
  * recurring gap). No SparkSession is created — the registry is a
  * list of (name, oracle, lambda) triples, so this prices as a bare
  * JVM startup.
  */
object RegistrySize {
  def main(args: Array[String]): Unit =
    println(s"registry_size=${graft.Registry.all.size}")
}
