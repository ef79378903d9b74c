package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash62.portableHash62

/** Rendezvous (highest-random-weight) sharding — the consistent
  * assignment primitive for routing keys to N workers/stores: each key
  * goes to the shard with the highest salted hash, so adding or
  * removing ONE shard remaps only ~1/N of the keys (plain `hash % N`
  * remaps nearly everything). The decision is a pure per-row expression
  * over the codegen'd portable hash — ZERO shuffle, inlined into
  * whole-stage codegen over the scan, and replayable by any engine that
  * can fold the same hash (the oracle does).
  *
  * Ties (astronomically unlikely with a 62-bit hash, but determinism is
  * the contract) break toward the LOWEST shard id via the struct
  * comparison's second field. */
object Shard {

  /** The winning shard id in [0, shards) for `key`. */
  def rendezvousShard(key: Column, shards: Int): Column = {
    require(shards >= 2, s"need at least 2 shards, got $shards")
    val cands = (0 until shards).map { s =>
      struct(
        portableHash62(concat(key.cast("string"), lit(s":$s"))).as("h"),
        lit(-s.toLong).as("ns"))
    }
    -greatest(cands: _*).getField("ns")
  }

  /** Append `outCol` = rendezvous shard of `keyCol`. */
  def withShard(df: DataFrame, keyCol: String, shards: Int,
                outCol: String = "shard"): DataFrame =
    df.withColumn(outCol, rendezvousShard(col(keyCol), shards))
}
