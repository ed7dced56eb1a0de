package graft

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.streaming.{ListState, MapState, QueryInfo, StatefulProcessorHandle, TTLConfig, ValueState}

/** In-memory ValueState for unit-driving a StatefulProcessor. */
class FakeValueState[T] extends ValueState[T] {
  private var v: Option[T] = None
  override def exists(): Boolean = v.isDefined
  override def get(): T = v.getOrElse(null.asInstanceOf[T])
  override def update(newState: T): Unit = v = Some(newState)
  override def clear(): Unit = v = None
}

/** Minimal StatefulProcessorHandle for unit tests — the
  * `transformWithState` analog of `TestGroupState`: one ValueState and a
  * sorted timer set, no runtime, no store. Only what [[graft.streaming.PairProcessor]]
  * touches is modeled; everything else throws. */
class FakeTwsHandle extends StatefulProcessorHandle {
  val state = new FakeValueState[graft.streaming.PairState]
  val timers = scala.collection.mutable.SortedSet.empty[Long]

  private def unsupported: Nothing =
    throw new UnsupportedOperationException("not modeled by FakeTwsHandle")

  override def getValueState[T](stateName: String, valEncoder: Encoder[T],
      ttlConfig: TTLConfig): ValueState[T] =
    state.asInstanceOf[ValueState[T]]
  override def getValueState[T](stateName: String, ttlConfig: TTLConfig)(
      implicit valEncoder: Encoder[T]): ValueState[T] =
    state.asInstanceOf[ValueState[T]]
  override def getListState[T](stateName: String, valEncoder: Encoder[T],
      ttlConfig: TTLConfig): ListState[T] = unsupported
  override def getListState[T](stateName: String, ttlConfig: TTLConfig)(
      implicit valEncoder: Encoder[T]): ListState[T] = unsupported
  override def getMapState[K, V](stateName: String, userKeyEnc: Encoder[K],
      valEncoder: Encoder[V], ttlConfig: TTLConfig): MapState[K, V] = unsupported
  override def getMapState[K, V](stateName: String, ttlConfig: TTLConfig)(
      implicit userKeyEnc: Encoder[K], valEncoder: Encoder[V]): MapState[K, V] =
    unsupported
  override def getQueryInfo(): QueryInfo = unsupported
  override def registerTimer(expiryTimestampMs: Long): Unit =
    timers += expiryTimestampMs
  override def deleteTimer(expiryTimestampMs: Long): Unit =
    timers -= expiryTimestampMs
  override def listTimers(): Iterator[Long] = timers.iterator
  override def deleteIfExists(stateName: String): Unit = state.clear()
}
