package graft

import scala.util.{Failure, Success}
import graft.model.VendorApi
import graft.sources.HttpSource

/** Retry wrapper semantics (injected sleep — no real waiting). */
class HttpSourceSpec extends SparkSpec {

  private val api = VendorApi("va-1", "v-100", "app", "secret", Some("wholecell"))

  test("withRetry: transient failures retry with exponential backoff, then succeed") {
    var calls = 0
    val slept = scala.collection.mutable.ArrayBuffer[Long]()
    val flaky: HttpSource.Fetcher = { _ =>
      calls += 1
      if (calls < 3) Failure(new RuntimeException(s"boom $calls"))
      else Success("""{"data": []}""")
    }
    val result = HttpSource.withRetry(flaky, attempts = 4,
      backoff = java.time.Duration.ofMillis(100), sleep = slept += _)(api)
    assert(result == Success("""{"data": []}"""))
    assert(calls == 3)
    assert(slept.toSeq == Seq(100L, 200L)) // 1×, 2× — stops on success
  }

  test("withRetry: a persistent failure returns the LAST failure after all attempts") {
    var calls = 0
    val dead: HttpSource.Fetcher = { _ =>
      calls += 1; Failure(new RuntimeException(s"boom $calls"))
    }
    val result = HttpSource.withRetry(dead, attempts = 3,
      sleep = _ => ())(api)
    assert(calls == 3)
    assert(result.failed.get.getMessage == "boom 3")
  }

  test("withRetry: a success on the first attempt never sleeps or refetches") {
    var calls = 0
    val ok: HttpSource.Fetcher = { _ => calls += 1; Success("x") }
    val result = HttpSource.withRetry(ok,
      sleep = _ => fail("slept on a successful fetch"))(api)
    assert(result == Success("x") && calls == 1)
  }
}
