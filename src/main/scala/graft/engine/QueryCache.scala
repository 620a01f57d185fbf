package graft.engine

import java.security.MessageDigest
import scala.collection.concurrent.TrieMap

/** md5-keyed result cache — port of the reference's LocMemCache usage
  * (`core/views.py:26-42`; config `datafabric/settings.py:93-103`):
  * key = "ai_query_" + md5(query), TTL 300 s, MAX_ENTRIES 1000 with
  * CULL_FREQUENCY 3 (evict 1/3 of entries when full — Django LocMemCache
  * semantics).
  *
  * App-level memoization only; at cluster scale, plan-level reuse is
  * Spark's job (`df.persist`), not this cache's.
  */
class QueryCache[V](
    ttlMillis: Long = 300L * 1000,
    maxEntries: Int = 1000,
    cullFrequency: Int = 3,
    clock: () => Long = () => System.currentTimeMillis()) {

  private case class Entry(value: V, expiresAt: Long, insertedAt: Long)
  private val store = TrieMap.empty[String, Entry]

  def md5Key(query: String): String = {
    val d = MessageDigest.getInstance("MD5").digest(query.getBytes("UTF-8"))
    "ai_query_" + d.map("%02x".format(_)).mkString
  }

  def get(query: String): Option[V] = {
    val k = md5Key(query)
    store.get(k) match {
      case Some(e) if e.expiresAt > clock() => Some(e.value)
      case Some(_) => store.remove(k); None
      case None => None
    }
  }

  def put(query: String, value: V): Unit = {
    if (store.size >= maxEntries) cull()
    val now = clock()
    store.put(md5Key(query), Entry(value, now + ttlMillis, now))
  }

  /** Evict expired entries; if still full, drop the oldest 1/cullFrequency. */
  private def cull(): Unit = {
    val now = clock()
    store.filterInPlace((_, e) => e.expiresAt > now)
    if (store.size >= maxEntries) {
      val toDrop = store.toSeq.sortBy(_._2.insertedAt)
        .take(math.max(1, store.size / cullFrequency)).map(_._1)
      toDrop.foreach(store.remove)
    }
  }

  def size: Int = store.size
  def clear(): Unit = store.clear()
}
