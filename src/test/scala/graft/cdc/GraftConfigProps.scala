package graft.cdc

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the CLI surface: duration grammar and the
  * flag-pair parser. */
object GraftConfigProps extends Properties("GraftConfig") {

  private val unit: Gen[(String, Long)] = Gen.oneOf(
    ("ms", 1000L), ("s", 1000000L), ("m", 60000000L), ("h", 3600000000L))

  property("parseDurationUs multiplies by the unit") =
    forAll(Gen.chooseNum(0L, 1000000L), unit) { case (n, (u, factor)) =>
      GraftConfig.parseDurationUs(s"$n$u") == n * factor
    }

  property("parseDurationUs rejects junk") =
    forAll(Gen.oneOf("", "10", "s", "10sec", "-5s", "1.5s", "10 s x")) { bad =>
      Prop.throws(classOf[IllegalArgumentException]) {
        GraftConfig.parseDurationUs(bad)
      }
    }

  property("fromArgs round-trips every flag") =
    forAll(Gen.alphaNumStr.suchThat(_.nonEmpty),
      Gen.alphaNumStr.suchThat(_.nonEmpty)) { (table, qname) =>
      val cfg = GraftConfig.fromArgs(Seq(
        "--table", table, "--queue", s"inmemory:$qname",
        "--cursor-frequency", "5s", "--metrics-port", "1234",
        "--once", "true"))
      cfg.table == table && cfg.queue == s"inmemory:$qname" &&
        cfg.cursorFrequencyUs == 5000000L && cfg.metricsPort == 1234 && cfg.once
    }

  private val envGen: Gen[Map[String, String]] = for {
    q <- Gen.option(Gen.alphaNumStr.suchThat(_.nonEmpty).map(n => s"inmemory:$n"))
    // DATABASE_URL is either a store spec (file:) or — the reference's
    // own shape — a jdbc: connection URL; the two must route differently
    s <- Gen.option(Gen.alphaNumStr.suchThat(_.nonEmpty).flatMap(n =>
      Gen.oneOf(s"file:/tmp/$n", s"jdbc:postgresql://h/$n")))
    p <- Gen.option(Gen.chooseNum(1, 65535))
  } yield Map.empty[String, String] ++
    q.map("AMQP_ADDR" -> _) ++ s.map("DATABASE_URL" -> _) ++
    p.map(pp => "PROMETHEUS_ADDR" -> s"0.0.0.0:$pp")

  property("env fills unset flags; defaults apply when env absent too") =
    forAll(envGen) { env =>
      val cfg = GraftConfig.fromArgs(Seq("--table", "t"), env)
      val dbUrl = env.get("DATABASE_URL")
      val (wantStore, wantDb) = dbUrl match {
        // a jdbc: DATABASE_URL names the changefeed database; feeding it
        // into the scheme:arg cursor-store slot would crash at startup
        case Some(u) if u.startsWith("jdbc:") => ("inmemory:default", Some(u))
        case Some(u) => (u, None)
        case None => ("inmemory:default", None)
      }
      cfg.queue == env.getOrElse("AMQP_ADDR", "inmemory:default") &&
        cfg.cursorStore == wantStore && cfg.database == wantDb &&
        cfg.metricsPort == env.get("PROMETHEUS_ADDR")
          .map(_.split(':').last.toInt).getOrElse(0) &&
        // the crash the routing prevents: newCursorStore never sees jdbc:
        (cfg.cursorStore.startsWith("jdbc:") == false)
    }

  property("explicit flags always beat the environment") =
    forAll(envGen) { env =>
      val cfg = GraftConfig.fromArgs(Seq("--table", "t",
        "--queue", "inmemory:flagq", "--cursor-store", "inmemory:flagc",
        "--metrics-port", "4321"), env)
      cfg.queue == "inmemory:flagq" && cfg.cursorStore == "inmemory:flagc" &&
        cfg.metricsPort == 4321
    }

  property("fromArgs rejects unknown flags") =
    forAll(Gen.alphaNumStr.suchThat(s => s.nonEmpty &&
        !Set("table", "queue", "cursor-store", "cursor-frequency",
          "log-dir", "checkpoint-dir", "metrics-port", "once",
          "database").contains(s))) { flag =>
      Prop.throws(classOf[IllegalArgumentException]) {
        GraftConfig.fromArgs(Seq("--table", "t", s"--$flag", "v"))
      }
    }
}
