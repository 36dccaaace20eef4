package graft

import org.apache.spark.sql.DataFrame

/** Lineage cuts for ITERATIVE operators (graph fixpoints, CC label
  * propagation, Lloyd's k-means): each round must truncate lineage or
  * the plan grows by one join per round and re-executes from the scan
  * on every action.
  *
  * Two modes, selected by the `spark.graft.checkpoint.dir` conf:
  *
  *   - unset (default): eager `localCheckpoint` — blocks live on
  *     executors. The right call at local[32] (one JVM, no executor
  *     loss) and the fastest option everywhere, but on a real cluster
  *     a lost executor kills the job because the truncated lineage
  *     cannot recompute the lost blocks.
  *   - set to a (DFS) path: eager reliable `checkpoint` — blocks are
  *     written to the fault-tolerant store, so a 1000-executor run
  *     survives preemptions mid-fixpoint at the cost of one
  *     write+read per round. This is the 100 TB setting.
  *
  * Both modes are eager and produce identical rows (pinned by
  * CheckpointModeSpec); only durability and IO cost differ. The
  * checkpoint dir is installed on first use; SparkContext keeps it
  * for the session.
  *
  * SINGLE-SHOT materializations (memo pins, build-once artifacts,
  * frames feeding two downstream paths) go through the same seam —
  * `Checkpoints.cut` or the chainable `.cut` below — so the
  * reliable-mode story covers them too: on a preemptible cluster a
  * lost executor loses a localCheckpoint'd memo exactly like a lost
  * fixpoint round. src/main carries NO direct `localCheckpoint`
  * call outside this object (pinned by RepoHygieneSpec).
  *
  * STORAGE NOTE for reliable mode: Spark never deletes checkpoint
  * files on its own — a 50-round fixpoint at 100 TB accumulates 50
  * round snapshots in the DFS dir within one job. Long jobs must
  * either set `spark.cleaner.referenceTracking.cleanCheckpoints=true`
  * at SESSION BUILD TIME (the context-level cleaner then removes a
  * round's files once its RDD is GC'd — i.e. as soon as the next
  * round's cut drops the last reference) or point
  * `spark.graft.checkpoint.dir` at a job-scoped path deleted by the
  * orchestrator after the job. Both are deployment knobs, not code:
  * the cleaner conf is read at context startup, so this object
  * cannot retrofit it mid-session.
  */
object Checkpoints {

  /** Chainable form: `df.transform(...).cut` reads like the
    * `.localCheckpoint(true)` it replaces. */
  implicit final class CutOps(private val df: DataFrame) extends AnyVal {
    def cut: DataFrame = Checkpoints.cut(df)
  }
  // last dir installed per context — setCheckpointDir must re-run when
  // the conf value changes mid-session (getCheckpointDir alone can't
  // tell: it returns the resolved URI, not the conf string)
  private val installed =
    new java.util.WeakHashMap[org.apache.spark.SparkContext, String]()

  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption("spark.graft.checkpoint.dir").filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        installed.synchronized {
          if (installed.get(sc) != dir) {
            sc.setCheckpointDir(dir)
            installed.put(sc, dir)
          }
        }
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
  }
}
