package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twin of the batch per-pixel dh/dt regression
  * (QueriesRaster `r_dhdt_trend`): elevation epochs ARRIVE as
  * micro-batches (one DEM delivery per batch, the staged-mosaic
  * convention) and each pixel's OLS sufficient statistics
  * (n, Σt, Σt², Σy, Σty, Σy²) are carried in `GroupState` — the slope/
  * intercept/R² estimate is a STATELESS derivation both forms share
  * (QueriesRaster.dhdtEstimate), so the twin emits sums, not estimates.
  *
  * Exactness contract: the stack's value terms are exact binary
  * fractions (k/1024), so the incremental sums equal the batch
  * shuffle's aggregates bit-for-bit in ANY arrival order —
  * StreamTrendSpec asserts hash-level parity with r_dhdt_trend after
  * the last epoch.
  *
  * Scale shape: state is six doubles + a count per pixel, sharded by
  * the pixel key across executors (the state store's natural
  * partitioning); per micro-batch work is one pass over that batch's
  * observations. A 100-TB deployment holds state in RocksDB and this
  * exact code; nothing here buffers an epoch, let alone the stack.
  */
object StreamTrend extends Serializable {

  case class Obs(pix: Long, e: Long, y: Double)
  case class Sums(pix: Long, n: Long, st: Double, stt: Double,
                  sy: Double, sty: Double, syy: Double)

  def sumsStateful(obs: Dataset[Obs]): Dataset[Sums] = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs.groupByKey(_.pix)
      .flatMapGroupsWithState[Sums, Sums](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (pix: Long, it: Iterator[Obs], state) =>
          var s = state.getOption.getOrElse(Sums(pix, 0L, 0, 0, 0, 0, 0))
          it.foreach { o =>
            val t = o.e.toDouble
            s = Sums(pix, s.n + 1, s.st + t, s.stt + t * t,
              s.sy + o.y, s.sty + t * o.y, s.syy + o.y * o.y)
          }
          state.update(s)
          Iterator.single(s)
      }
  }
}
