package graft.cdc

import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite

/** Chaos cases for the AMQP producer: a broker that dies MID-PUBLISH
  * and a full broker bounce in the middle of a batch. The invariant
  * under test is the reference relay's at-least-once contract
  * (src/main.rs:140-198 reconnects-and-retries in its loop): with
  * publisher confirms on, a producer that retries every failed publish
  * loses NOTHING across connection drops and process restarts — and
  * a publish whose content the broker never accepted does not count
  * as delivered, so the deterministic mid-publish crash yields no
  * duplicate either. */
class AmqpChaosSpec extends AnyFunSuite {

  /** At-least-once producer loop: retry the SAME payload until a
    * confirmed publish succeeds (eviction inside AmqpQueue makes each
    * retry redial instead of reusing the dead socket). */
  private def publishRetrying(q: AmqpQueue, body: String,
      maxTries: Int = 20): Int = {
    var tries = 0
    while (true) {
      tries += 1
      require(tries <= maxTries, s"gave up after $maxTries tries on '$body'")
      try { q.publish(body.getBytes(UTF_8)); return tries }
      catch { case _: java.io.IOException => Thread.sleep(20) }
    }
    tries
  }

  test("mid-publish connection crash: confirmed retry loses nothing, dups nothing") {
    val broker = new FakeAmqpBroker
    val q = new AmqpQueue(
      s"amqp://127.0.0.1:${broker.port}/chaos?confirm=true")
    try {
      val msgs = (0 until 10).map(i => s"chaos-msg-$i")
      var retried = 0
      msgs.foreach { m =>
        // arm the crash under message 5: the broker drops the socket on
        // the Basic.Publish method frame, before accepting any content
        if (m.endsWith("-5")) broker.crashOnNextPublish = true
        if (publishRetrying(q, m) > 1) retried += 1
      }
      assert(retried >= 1, "the armed crash never forced a retry")
      val bodies = broker.awaitPublished(10).map(_._2)
      // every message confirmed at least once → all present…
      assert(bodies.toSet === msgs.toSet)
      // …and the crashed attempt took no content, so exactly-once here
      assert(bodies.size === 10,
        s"mid-publish crash produced a duplicate: $bodies")
      assert(broker.error == null, s"broker error: ${broker.error}")
      q.close()
    } finally broker.stop()
  }

  test("broker bounce mid-batch: union of both incarnations covers every message") {
    val broker1 = new FakeAmqpBroker
    val port = broker1.port
    val q = new AmqpQueue(s"amqp://127.0.0.1:$port/bounce?confirm=true")
    val msgs = (0 until 10).map(i => s"bounce-msg-$i")

    msgs.take(5).foreach(m => assert(publishRetrying(q, m) === 1))
    assert(broker1.awaitPublished(5).map(_._2).toSet === msgs.take(5).toSet)
    broker1.stop() // process crash: server socket + live connections die

    // restart on the same port; the cached client is still wired to the
    // dead incarnation, so the first retry must evict + redial
    val broker2 = new FakeAmqpBroker(fixedPort = port)
    try {
      msgs.drop(5).foreach(m => publishRetrying(q, m))
      val survived = broker1.published.map(_._2) ++
        broker2.awaitPublished(5).map(_._2)
      // at-least-once across the bounce: nothing confirmed is missing
      assert(survived.toSet === msgs.toSet)
      assert(broker2.error == null, s"broker error: ${broker2.error}")
      q.close()
    } finally broker2.stop()
  }
}
