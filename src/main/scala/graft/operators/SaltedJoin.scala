package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew-salting for equi-joins.
  *
  * When one join key carries a disproportionate share of the left side
  * (hot account, hot document cluster), a plain shuffle join sends the whole
  * hot key to ONE task — the classic straggler/OOM at 100 TB. Salting
  * spreads each left key uniformly over `salts` sub-keys and replicates the
  * right side once per salt, so the hot key runs on `salts` tasks.
  *
  * AQE's skew-join handling does this automatically for sort-merge joins at
  * runtime; this helper is the explicit form for shuffle-hash joins, for
  * deterministic plans, or when the skew is known ahead of time. Cost: the
  * right side is duplicated `salts`× — use only when right ≪ left (but too
  * big to broadcast outright).
  */
object SaltedJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // Deterministic per-row salt: hash of the whole row spreads rows of one
    // hot key uniformly without needing a unique id column.
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.toIndexedSeq.map(col): _*)), lit(salts.toLong)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLeft.join(replicatedRight,
        saltedLeft(key) === replicatedRight(key) &&
          saltedLeft("__salt") === replicatedRight("__salt"),
        joinType)
      .drop(replicatedRight(key)).drop(saltedLeft("__salt")).drop(replicatedRight("__salt"))
  }
}
