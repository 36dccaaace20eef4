package graft.cdc

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.collection.concurrent.TrieMap

/** Resolved-cursor persistence — the Spark re-expression of the
  * reference's `CursorStore` trait (reference src/cursors.rs:7-11) and
  * its CockroachDB `UPSERT INTO cursor_store` impl (src/cursors.rs:26-57).
  *
  * The pipeline commits the max resolved timestamp per micro-batch from
  * the driver (cursor volume is one value — never a distributed write),
  * and reads it back on restart to resume the changefeed
  * (reference src/main.rs:117-139).
  */
trait CursorStore {
  def get(): Option[String]
  def set(cursor: String): Unit
}

class InMemoryCursorStore(key: String = "key") extends CursorStore {
  override def get(): Option[String] = InMemoryCursorStore.store.get(key)
  override def set(cursor: String): Unit = InMemoryCursorStore.store.put(key, cursor)
}

object InMemoryCursorStore {
  private val store = TrieMap.empty[String, String]
  def clear(): Unit = store.clear()
}

/** Crash-safe single-value store: write-to-temp + atomic rename, so a
  * restart always reads a complete cursor (the UPSERT equivalent). */
class FileCursorStore(path: String) extends CursorStore {
  override def get(): Option[String] = {
    val f = new File(path)
    if (f.exists()) Some(new String(Files.readAllBytes(f.toPath), "UTF-8").trim)
    else None
  }

  override def set(cursor: String): Unit = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(d => Files.createDirectories(d))
    val tmp = Paths.get(path + ".tmp")
    Files.write(tmp, cursor.getBytes("UTF-8"))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
