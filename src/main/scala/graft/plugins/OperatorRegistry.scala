package graft.plugins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap
import graft.functions.TextFunctions

/** The dlopen/dlsym analog (`asio_deep/main.cpp:98-149`): named,
  * swappable stage operators resolved at runtime.
  *
  * The reference's extensibility story is "swap a `.so` exporting a
  * `createInputObj` factory with the right signature" — type-checked
  * against a whitelist of factory typedefs (`main.cpp:111-149`). On the
  * JVM the same contract is a registry from stage name to a
  * `DataFrame => DataFrame` transform: registering a name is `dlopen`,
  * resolving an unknown name fails like a missing `dlsym` symbol, and
  * the type system enforces the operator signature at compile time
  * instead of via the static_assert whitelist.
  *
  * The built-in stages reproduce the reference pipeline phases
  * (SURVEY.md §2.1): `mapper` (tokenize), `counter` (the
  * shuffler+reducer pair — Spark's partial/final HashAggregate split
  * does both), `ordered_sink` (the std::map output ordering).
  * Stage-operator contract: (file, line)-shaped input for `mapper`;
  * (file, word) for `counter`; any for `ordered_sink`.
  */
object OperatorRegistry {

  type StageOp = DataFrame => DataFrame

  private val ops = TrieMap[String, StageOp](
    "input" -> identity,
    "mapper" -> (df => df.select(col("file"),
      explode(TextFunctions.tokenize(col("line"))).as("word"))),
    "counter" -> (df => df.groupBy("file", "word").agg(count(lit(1)).as("cnt"))),
    "ordered_sink" -> (df => df.orderBy("file", "word")))

  /** Register (or override — latest wins, like re-dlopen) a stage. */
  def register(name: String, op: StageOp): Unit = ops.put(name, op)

  /** Resolve a stage operator; unknown names fail like a missing dlsym
    * symbol. */
  def resolve(name: String): StageOp =
    ops.getOrElse(name,
      throw new NoSuchElementException(s"no operator registered for stage '$name'"))

  def registered: Set[String] = ops.keySet.toSet

  /** Compose a pipeline from stage names — the reference's
    * phase-after-phase orchestration as one lazy plan. */
  def pipeline(names: Seq[String]): StageOp =
    names.map(resolve).reduceLeft(_ andThen _)
}
