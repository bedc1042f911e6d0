package graft.ops

/** Tiny pinned-config sidecars for stored index artifacts (the SRP eval
  * index, the rep-index band layout): one line of comma-separated ints
  * whose values the artifact's probes MUST band/bucket under — a probe
  * run under different constants silently misses collisions, so the
  * config is the artifact's contract, written atomically (temp +
  * ATOMIC_MOVE rename: a crash mid-write can never leave a torn config
  * next to complete parquet) and parse-validated on read. */
object ConfigFile {

  def writeAtomic(dir: String, name: String, values: Seq[Int]): Unit = {
    val tmp = java.nio.file.Paths.get(dir, s"$name.tmp")
    java.nio.file.Files.write(tmp, values.mkString(",")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(dir, name),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def exists(dir: String, name: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(dir, name))

  /** Exactly `n` non-negative ints, or a loud failure naming the torn
    * content — never a silent mis-parse. */
  def readInts(dir: String, name: String, n: Int): Seq[Int] =
    readIntsRange(dir, name, n, n)

  /** Between `nMin` and `nMax` non-negative ints — the back-compat read
    * for a sidecar format that GREW a trailing field (readers treat a
    * missing tail as its zero default; a length outside the window is
    * still a torn config, loud). */
  def readIntsRange(dir: String, name: String, nMin: Int, nMax: Int): Seq[Int] = {
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, name)),
      java.nio.charset.StandardCharsets.UTF_8).trim
    val parts = raw.split(",")
    require(parts.length >= nMin && parts.length <= nMax
        && parts.forall(p => p.nonEmpty && p.forall(_.isDigit)),
      s"torn config $dir/$name: '$raw' (want $nMin..$nMax ints)")
    parts.toSeq.map(_.toInt)
  }
}
