package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twin of the batch sequence-packing operator
  * (QueriesPipe `x_pack_chunks`): concatenate each shard's token stream
  * and cut it into fixed context windows, as documents ARRIVE.
  *
  * The batch form gets each doc's running prefix `cum0` from a window
  * sum; here the prefix is carried across micro-batches in
  * `GroupState[Long]` — one Long per shard, so state memory is
  * O(shards), never O(stream). Chunk spans are the same pure integer
  * arithmetic as the batch operator, so StreamPackSpec can assert
  * bit-identical output.
  *
  * Exactness contract (the append-log shape): within a shard, doc_id is
  * monotonically increasing ACROSS micro-batches — each batch's group
  * iterator is sorted here, but a doc arriving after a batch with higher
  * ids would be packed later than the batch operator would place it.
  */
object StreamPack extends Serializable {

  case class Doc(doc_id: Long, lang: String, n_tokens: Long)
  case class Packed(doc_id: Long, lang: String, n_tokens: Long,
                    start_chunk: Long, end_chunk: Long, straddles: Boolean)

  def packStateful(docs: Dataset[Doc], window: Long = 512L): Dataset[Packed] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.lang)
      .flatMapGroupsWithState[Long, Packed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (lang: String, it: Iterator[Doc], state) =>
          var cum = state.getOption.getOrElse(0L)
          val out = it.toSeq.sortBy(_.doc_id).map { d =>
            val c0 = cum
            cum += d.n_tokens
            Packed(d.doc_id, lang, d.n_tokens,
              c0 / window, (c0 + d.n_tokens - 1) / window,
              c0 % window != 0 &&
                (c0 + d.n_tokens - 1) / window > c0 / window)
          }
          state.update(cum)
          out.iterator
      }
  }
}
