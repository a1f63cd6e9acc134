package graft.util

/** Deployment/measurement override for the maintained-state partition
  * counts (`SPARK_GRAFT_STATE_PARTS`): every `Incremental*` module's
  * `StateParts` resolves through [[parts]], so one env var re-lays the
  * whole state family at 64/128/256 partitions for the bucket-count
  * scaling sweeps (TUNING.md) or for a large-corpus deployment.
  *
  * PER-JVM CONSTANT, read once at class load. The `part` column is a
  * pure function of the row key AND of this count, derived identically
  * at write and read time — a state root must therefore live its whole
  * life under ONE value. Changing the env var only affects state roots
  * created after the new JVM starts; pointing a differently-configured
  * JVM at an existing root mis-prunes (reads miss rows, merges strand
  * them). The test/bench defaults (unset ⇒ each module's own default)
  * are sized for the shipped test scales, not 100 TB.
  */
object StateConf {
  /** The override, when set and sane ( ≥ 1); resolved once. */
  val overrideParts: Option[Int] =
    sys.env.get("SPARK_GRAFT_STATE_PARTS")
      .flatMap(_.toIntOption).filter(_ >= 1)

  /** A module's effective partition count. */
  def parts(default: Int): Int = overrideParts.getOrElse(default)
}
