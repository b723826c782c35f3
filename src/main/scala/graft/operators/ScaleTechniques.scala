package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The shuffle-avoidance toolbox for 100 TB plans: skew salting and
  * co-location helpers, as composable library functions. (Broadcast is
  * Spark-native `broadcast()`; bucketing is exercised in the test suite
  * via `bucketBy` + `saveAsTable`, which needs a warehouse.)
  *
  * These exist because at cluster scale the dominant failure mode is a
  * hot key: one reducer gets the skewed key's entire partition while the
  * rest of the cluster idles (or OOMs). AQE's skew-join handling splits
  * oversized SHUFFLE partitions, but aggregation skew and
  * broadcast-averse joins still want explicit salting.
  */
object ScaleTechniques {

  /** Deterministic per-row salt in [0, salts): a content hash over the
    * given columns, NOT `monotonically_increasing_id()` — mii is
    * partition-order dependent, so partial-aggregate sizes (and any UI
    * stage metrics) would differ run to run. A content hash makes reruns
    * bit-stable end to end. Hash columns should include something that
    * varies WITHIN a hot key (the value, a row id) so the hot key's rows
    * actually spread; fully identical rows sharing a salt is algebraically
    * harmless. */
  private def contentSalt(cols: Seq[Column], salts: Int): Column =
    pmod(hash(cols: _*), lit(salts)).cast("int")

  /** Two-phase salted aggregation: spread a hot GROUP BY key over
    * `salts` sub-keys, partially aggregate, then merge. Correct for any
    * ALGEBRAIC aggregate (here: count + sum, the additive pair every
    * count/avg/mean decomposes into). The first shuffle is on
    * (key, salt) — max partition size drops by ~`salts`× — and the
    * second shuffle is tiny (one row per (key, salt)). */
  def saltedSumCount(df: DataFrame, key: Column, value: Column, salts: Int): DataFrame =
    df.select(key.as("key"), value.as("v"),
        contentSalt(Seq(key, value), salts).as("salt"))
      .groupBy("key", "salt")
      .agg(sum("v").as("partial_sum"), count(lit(1)).as("partial_cnt"))
      .groupBy("key")
      .agg(sum("partial_sum").as("total"), sum("partial_cnt").as("cnt"))

  /** True iff `hash()` cannot evaluate the type: MapType anywhere in the
    * tree (maps are unordered, Spark rejects them in hash/comparisons). */
  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => true
    case a: org.apache.spark.sql.types.ArrayType => containsMap(a.elementType)
    case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => containsMap(f.dataType))
    case _ => false
  }

  /** Salted join for a skewed FACT side against a non-broadcastable
    * dimension: the fact side gets a deterministic salt in [0, salts),
    * the dimension side is replicated `salts`× (explode of a literal
    * range), and the join key becomes (key, salt) — the hot key's rows
    * land on `salts` reducers instead of one. Replication costs `salts`×
    * the dimension size, which is the explicit trade against reducer
    * skew.
    *
    * The salt hashes every HASHABLE fact column (map-typed columns are
    * skipped — `hash` rejects MapType), so rows of the hot key spread by
    * their non-key content. Degenerate case, documented on purpose: rows
    * of a hot key that are fully identical (or differ only in map
    * columns) share one salt and still land on one reducer — a content
    * hash cannot separate identical content. Callers with that shape
    * should pre-aggregate the duplicates (a count column both dedups and
    * preserves join multiplicity) rather than salt them. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val hashable = fact.schema.fields.filterNot(f => containsMap(f.dataType))
      .map(f => col(f.name)).toSeq
    val saltCols = if (hashable.nonEmpty) hashable else Seq(col(key))
    val saltedFact = fact.withColumn("_salt", contentSalt(saltCols, salts))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }
}
