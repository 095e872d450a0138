package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The integer-space HALF_UP rounding used by q15/e03 must equal
  * exact decimal arithmetic for every 2-dp input — these properties
  * pin the formulas against BigDecimal so a scaling slip cannot pass
  * silently (float round-trips would hide it). Fixed seed →
  * reproducible. */
class IntegerRoundingSpec extends AnyFunSuite {

  private val rnd = new Random(42)

  test("e03 avg formula == BigDecimal HALF_UP avg of 2dp values") {
    (1 to 2000).foreach { _ =>
      val cents = rnd.nextLong(100000000L)
      val n = 1L + rnd.nextLong(5000L)
      // engine form: floor((200*S + n) / (2n)) / 1e4
      val got = math.floor((cents * 200 + n).toDouble /
        (2.0 * n)) / 10000.0
      // exact: avg = S/100/n rounded HALF_UP to 4dp
      val want = (BigDecimal(cents) / (BigDecimal(100) * BigDecimal(n)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got == want, s"cents=$cents n=$n")
    }
    // explicit tie: avg = 0.00005 (S=1 cent over n=200) rounds UP
    val tie = math.floor((1L * 200 + 200).toDouble / 400.0) / 10000.0
    assert(tie == 0.0001)
  }

  test("q15 score formula == BigDecimal HALF_UP weighted score, " +
    "including negative balances") {
    (1 to 4000).foreach { _ =>
      // negative cents included: acctbal can be negative, and a
      // sign-blind floor would round negative ties toward +inf
      // (HALF_CEILING) instead of away from zero (HALF_UP)
      val cents = rnd.nextLong(2100000L) - 100000L
      val custkey = rnd.nextLong(100000L)
      val isBuilding = rnd.nextBoolean()
      // engine form: integer-scaled score*1e7, sign-aware HALF_UP
      val scaled = math.min(cents, 1000000L) * 5 +
        (if (isBuilding) 3000000L else 0L) + (custkey % 10) * 200000L
      val got = (if (scaled >= 0) math.floor((scaled + 500) / 1000.0)
        else -math.floor((-scaled + 500) / 1000.0)) / 10000.0
      // exact decimal: least(bal/1e4, 1)*0.5 + b*0.3 + (k%10)*0.02
      val bal = BigDecimal(cents) / 100
      val score = (bal / 10000).min(1) * BigDecimal("0.5") +
        (if (isBuilding) BigDecimal("0.3") else BigDecimal(0)) +
        BigDecimal(custkey % 10) * BigDecimal("0.02")
      val want = score.setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      assert(got == want, s"cents=$cents k=$custkey b=$isBuilding")
    }
  }
}
