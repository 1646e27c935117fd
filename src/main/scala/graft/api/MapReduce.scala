package graft.api

import org.apache.spark.sql.{Dataset, Encoder}

/** The reference framework's user-facing abstraction (SURVEY.md §1:13-18):
  * the user supplies `map(k1,v1) → [(k2,v2)]` and a reducer over each k2
  * group; the framework distributes the rest. This is that contract on
  * Spark — typed `Dataset` in, typed `Dataset` out, Catalyst planning the
  * shuffle.
  *
  * Two reducer shapes, matching the two MR idioms:
  *  - [[run]] takes an associative+commutative `(V, V) => V` — the
  *    "combiner-friendly" form. `reduceGroups` applies it map-side before
  *    the shuffle (partial aggregation), so the wire carries one row per
  *    (partition, key): at 100 TB this is the only shape that scales for
  *    high-cardinality keys.
  *  - [[runGroups]] takes `(K, Iterator[V]) => O` — the fully general
  *    reduce with access to the whole group, for reducers that aren't
  *    pairwise-mergeable (medians, position-sensitive output). ALL values
  *    of a key cross the shuffle; a hot key lands on one task, exactly
  *    like a hot reduce partition in classic MR. Prefer [[run]] when the
  *    reducer decomposes.
  */
object MapReduce {

  /** Combiner-style map/reduce: flatMap → groupByKey → reduceGroups.
    * `reduceFn` MUST be associative and commutative — Spark applies it in
    * arbitrary order and map-side first. */
  def run[I, K, V](ds: Dataset[I])(mapFn: I => IterableOnce[(K, V)])(
      reduceFn: (V, V) => V)(implicit
      ek: Encoder[K], ev: Encoder[V], ekv: Encoder[(K, V)]): Dataset[(K, V)] =
    ds.flatMap(mapFn)(ekv)
      .groupByKey(_._1)(ek)
      .mapValues(_._2)(ev)
      .reduceGroups(reduceFn)

  /** General map/reduce: flatMap → groupByKey → mapGroups. The reducer
    * sees every value of its key; no map-side combine is possible. */
  def runGroups[I, K, V, O](ds: Dataset[I])(mapFn: I => IterableOnce[(K, V)])(
      reduceFn: (K, Iterator[V]) => O)(implicit
      ek: Encoder[K], ev: Encoder[V], ekv: Encoder[(K, V)],
      eo: Encoder[O]): Dataset[O] =
    ds.flatMap(mapFn)(ekv)
      .groupByKey(_._1)(ek)
      .mapValues(_._2)(ev)
      .mapGroups(reduceFn)(eo)
}
