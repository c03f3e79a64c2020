package graft.operators

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Dataset, Encoder, TypedColumn}

/** Generic typed map/shuffle/reduce facade — capability-equivalent to the
  * reference's user-pluggable triple (reference:
  * `src/main/scala/com/osocron/mapreduce/user/UserDefinedFunctions.scala:5-30`):
  *
  * {{{
  *   map         : (K1, V1) => List[(K2, V2)]
  *   reduce      : (K2, List[V2]) => (K2, V3)
  *   partitionBy : K2 => PartitionKey
  * }}}
  *
  * Spark-first realization: `flatMap` (narrow, pipelined) → `groupByKey`
  * (one hash shuffle — Spark's exactly-once shuffle replaces the
  * reference's append-mode CSV intermediate files, which double-counted on
  * task retry, see SURVEY.md §4 quirk 1) → `mapGroups` (reduce). The
  * reference's `partitionBy` decided which reducer saw a key; Spark's
  * `HashPartitioning` on the group key is the same contract, minus the
  * user-visible partition label. When the label itself is data (as in word
  * count's first-letter partition files), derive it as a column and use
  * `.write.partitionBy` at the sink.
  *
  * Scale notes (100 TB): `groupByKey`+`mapGroups` does NOT get map-side
  * partial aggregation — every value for a key crosses the network. That
  * is exactly the reference's semantics (its map emits raw `(word,"1")`
  * pairs with no combiner). For reductions that are commutative and
  * associative, prefer [[mapReduceAgg]], which uses a typed `Aggregator`
  * so Catalyst plans partial `HashAggregate` → shuffle → final
  * `HashAggregate` — shuffle bytes drop from O(rows) to
  * O(distinct keys × map partitions).
  */
object MapReduce {

  /** Faithful general form: arbitrary `reduce : (K2, Iterator[V2]) => V3`.
    * No combiner (the function may be non-associative, e.g. "concatenate
    * values in emission order"), mirroring the reference contract.
    */
  def mapReduce[V1, K2: Encoder, V2, V3](ds: Dataset[V1])(
      mapF: V1 => IterableOnce[(K2, V2)],
      reduceF: (K2, Iterator[V2]) => V3)(implicit
      kvEnc: Encoder[(K2, V2)],
      outEnc: Encoder[(K2, V3)]): Dataset[(K2, V3)] =
    ds.flatMap(mapF)
      .groupByKey(_._1)
      .mapGroups((k, it) => (k, reduceF(k, it.map(_._2))))

  /** Combiner-enabled form for associative+commutative reduction: the
    * classic `(zero, merge-value, merge-combiners)` triple, planned as a
    * partial+final hash aggregation.
    */
  def mapReduceAgg[V1, K2: Encoder, V2, B: Encoder, OUT: Encoder](
      ds: Dataset[V1])(
      mapF: V1 => IterableOnce[(K2, V2)],
      zeroB: B,
      seqOp: (B, V2) => B,
      combOp: (B, B) => B,
      finishF: B => OUT)(implicit
      kvEnc: Encoder[(K2, V2)],
      outEnc: Encoder[(K2, OUT)]): Dataset[(K2, OUT)] = {
    val agg: TypedColumn[(K2, V2), OUT] = new Aggregator[(K2, V2), B, OUT] {
      override def zero: B = zeroB
      override def reduce(b: B, a: (K2, V2)): B = seqOp(b, a._2)
      override def merge(b1: B, b2: B): B = combOp(b1, b2)
      override def finish(b: B): OUT = finishF(b)
      override def bufferEncoder: Encoder[B] = implicitly[Encoder[B]]
      override def outputEncoder: Encoder[OUT] = implicitly[Encoder[OUT]]
    }.toColumn
    ds.flatMap(mapF).groupByKey(_._1).agg(agg)
  }
}
