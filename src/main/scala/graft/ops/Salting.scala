package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the skew mitigation for keys too hot for one
  * reducer (SURVEY.md §4 / builder scale notes: "salting for skew"). The
  * big side spreads each key across `salts` sub-keys via a deterministic
  * hash of a row-unique expression; the small side replicates each row
  * `salts` times; the join runs on (key, salt) so one hot key becomes
  * `salts` evenly-sized partitions. AQE's skew-join handles moderate skew
  * at runtime; explicit salting is the declarative fallback for extreme
  * single-key skew where even one key's single partition exceeds memory.
  */
object Salting {

  /** Equi-join `big ⋈ small` on `bigKey == smallKey` with `salts`-way
    * key spreading. `rowId` must be unique per big-side row (drives the
    * deterministic salt).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: Column,
      smallKey: Column,
      rowId: Column,
      salts: Int
  ): DataFrame =
    saltedJoinWith(big, small, bigKey, smallKey,
      pmod(xxhash64(rowId), lit(salts)).cast("int"), salts)

  /** [[saltedJoin]] with the big side's salt supplied as an explicit
    * column — q218 passes the h60-derived salt so the oracle can replay
    * the per-(key, salt) load split verbatim; any deterministic
    * expression that spreads a hot key's rows works.
    */
  def saltedJoinWith(
      big: DataFrame,
      small: DataFrame,
      bigKey: Column,
      smallKey: Column,
      salt: Column,
      salts: Int
  ): DataFrame = {
    val saltedBig = big.withColumn("_salt", salt.cast("int"))
    val replicatedSmall = small.withColumn("_salt", explode(lit((0 until salts).toArray)))
    saltedBig
      .join(replicatedSmall, bigKey === smallKey && saltedBig("_salt") === replicatedSmall("_salt"))
      .drop("_salt")
  }
}
