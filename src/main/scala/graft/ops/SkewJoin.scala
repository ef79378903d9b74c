package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key mitigation for equi-joins: salting. AQE's skew-join handles
  * most cases by splitting oversized partitions at runtime, but a single
  * giant key still sorts in one task under SMJ, and static plans (AQE
  * off, or skew inside a cached stage) get no help. Salting removes the
  * hot spot structurally: probe rows take a deterministic salt in
  * `[0, salts)` and the (small) build side replicates once per salt, so
  * one key's rows spread over `salts` tasks.
  */
object SkewJoin {

  /** Inner equi-join on `keys`, semantically identical to
    * `probe.join(build, keys)` (oracle-proven, `j8_salted_join`) but with
    * the probe side spread by salt.
    *
    * `discriminator` is any probe column of reasonable cardinality (a
    * row id, a timestamp): the salt is `xxhash64(discriminator) mod
    * salts`, deterministic so reruns and retries partition identically.
    * The build side grows ×`salts` — keep it the dimension side. */
  def saltedEquiJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                     salts: Int, discriminator: Column): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(!probe.columns.contains("_salt") && !build.columns.contains("_salt"),
      "input already has a _salt column — it would be silently clobbered and dropped")
    val salted = probe.withColumn("_salt",
      pmod(xxhash64(discriminator), lit(salts.toLong)).cast("int"))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }
}
