package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

import graft.functions.Grok
import graft.operators.Route

/** Property-based invariants (SURVEY.md §5: ScalaCheck for parse
  * round-trips and routing partition laws).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 40): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val genLevel = Gen.oneOf("info", "warn", "error", "debug")
  private val genTool = Gen.oneOf((0 until 12).map(i => s"tool_$i") :+ "none")
  private val genMsg = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    .map(_.take(40))
  private val genLatency = Gen.choose(0, 999)

  test("grok parse inverts log-line rendering (parse ∘ render = id)") {
    val g = graft.plans.Pipeline.compiledGrok
    val re = java.util.regex.Pattern.compile(g.regex)
    val p = Prop.forAll(genLevel, genTool, genLatency, genMsg) {
      (level, tool, lat, msg) =>
        val line = s"""2024-03-01T10:20:30Z $level tool=$tool latency_ms=$lat msg="$msg""""
        val m = re.matcher(line)
        m.matches() &&
          m.group(g.fields.indexOf("level") + 1) == level &&
          m.group(g.fields.indexOf("tool_p") + 1) == tool &&
          m.group(g.fields.indexOf("latency_ms") + 1).toInt == lat &&
          m.group(g.fields.indexOf("msg") + 1) == msg
    }
    check(p, 100)
  }

  private val genRow: Gen[(String, Int, Int)] =
    for {
      level <- genLevel
      lat <- genLatency
      tier <- Gen.choose(0, 2)
    } yield (level, lat, tier)

  test("route laws: every row lands in >=1 port; unmatched matches nothing; exclusive = first match") {
    val conds = ListMap(
      "errors" -> (col("level") === "error"),
      "slow"   -> (col("lat") >= 800),
      "high"   -> (col("tier") === 2))
    val p = Prop.forAll(Gen.nonEmptyListOf(genRow)) { rows =>
      val df = rows.toDF("level", "lat", "tier")
        .withColumn("id", monotonically_increasing_id())
      val tagged = Route.tagged(df, conds).collect()
      val byId = tagged.groupBy(_.getAs[Long]("id"))
      val coverage = byId.size == df.count()
      val unmatchedLaw = tagged
        .filter(_.getAs[String]("port") == Route.UnmatchedPort)
        .forall { r =>
          r.getAs[String]("level") != "error" &&
            r.getAs[Int]("lat") < 800 && r.getAs[Int]("tier") != 2
        }
      val exclusive = Route.exclusive(df, conds).collect()
      val exclusiveLaw = exclusive.forall { r =>
        val expected =
          if (r.getAs[String]("level") == "error") "errors"
          else if (r.getAs[Int]("lat") >= 800) "slow"
          else if (r.getAs[Int]("tier") == 2) "high"
          else Route.UnmatchedPort
        r.getAs[String]("port") == expected
      }
      coverage && unmatchedLaw && exclusiveLaw
    }
    check(p, 15)
  }

  test("multicast tagged row count = sum of per-port matches") {
    val conds = ListMap(
      "a" -> (col("lat") >= 500),
      "b" -> (col("tier") === 1))
    val p = Prop.forAll(Gen.nonEmptyListOf(genRow)) { rows =>
      val df = rows.toDF("level", "lat", "tier")
      val tagged = Route.tagged(df, conds)
      val nA = rows.count(_._2 >= 500)
      val nB = rows.count(_._3 == 1)
      val nU = rows.count(r => r._2 < 500 && r._3 != 1)
      tagged.count() == (nA + nB + nU)
    }
    check(p, 15)
  }

  test("grok compiler: literal round-trip safety for regex metacharacters") {
    val genLit = Gen.listOf(Gen.oneOf("a.b", "[x]", "(y)", "c+d", "e*",
      "f?", "g|h", "^i$", "{2}", "\\k")).map(_.mkString(" ")).suchThat(_.nonEmpty)
    val p = Prop.forAll(genLit) { lit =>
      val c = Grok.compile(s"$lit %{INT:n}")
      s"$lit 42".matches(c.regex)
    }
    check(p, 50)
  }

  test("LSH probe masks: count, distinctness, and bucket-space closure") {
    val p = Prop.forAll(Gen.choose(2, 12), Gen.choose(0, 2)) { (b, r) =>
      val masks = graft.operators.Similarity.probeMasks(b, r)
      val expected = 1 + (if (r >= 1) b else 0) + (if (r >= 2) b * (b - 1) / 2 else 0)
      masks.size == expected &&
        masks.distinct.size == masks.size &&
        masks.forall(m => m >= 0 && m < (1L << b)) &&
        masks.head == 0L // home bucket always probed first
    }
    check(p, 60)
  }

  test("ProbeBuckets kernel matches the (|v[j]| asc, j asc) reference selection") {
    import org.apache.spark.sql.graftvec.VectorExpressions
    val genVec = Gen.choose(2, 8).flatMap { b =>
      for {
        q <- Gen.choose(1, b)
        // duplicated magnitudes exercise the j-asc tie-break
        v <- Gen.listOfN(b, Gen.oneOf(-2.0, -0.5, 0.0, 0.25, 0.5, 1.5))
        bucket <- Gen.choose(0L, (1L << b) - 1)
      } yield (b, q, v, bucket)
    }
    val p = Prop.forAll(genVec) { case (b, q, v, bucket) =>
      // reference: full sort by (|v[j]|, j), take q, enumerate subsets
      val ls = v.indices.sortBy(j => (math.abs(v(j)), j)).take(q)
      val expect = (0 until (1 << q)).map { t =>
        (0 until q).filter(i => (t & (1 << i)) != 0)
          .foldLeft(bucket)((m, i) => m ^ (1L << ls(i)))
      }
      val df = Seq((v, bucket)).toDF("v", "bucket")
      val got = df.select(VectorExpressions.probeBuckets(
          col("v"), col("bucket"), b, q).as("p"))
        .collect()(0).getSeq[Long](0)
      got == expect
    }
    check(p, 25)
  }

  test("prometheus exposition: render -> parse round-trips hostile label values") {
    import graft.operators.Prometheus
    // label values stressing the escape/unescape inverse: quotes,
    // backslashes, and runs of both in every order
    val genVal = Gen.listOf(Gen.oneOf("a", "\"", "\\", "\\\"", "\"\\", "x\\\\y"))
      .map(_.mkString).suchThat(_.nonEmpty)
    val genRow = for {
      vt <- Gen.oneOf("counter", "gauge")
      v1 <- genVal; v2 <- genVal
      value <- Gen.chooseNum(-1000L, 1000L).map(_ / 4.0) // exact quarters
    } yield (vt, v1, v2, value)
    val p = Prop.forAll(Gen.listOfN(3, genRow)) { rows =>
      val df = spark.createDataFrame(rows.zipWithIndex.map {
        case ((vt, v1, v2, value), i) =>
          (s"m$i", null.asInstanceOf[String], s"ka=$v1,kb=$v2",
            "absolute", vt, value)
      }).toDF("name", "namespace", "tags", "kind", "value_type", "value")
        .withColumn("ts", lit(null).cast("timestamp"))
      val rendered = Prometheus.exposition(df)
      val parsed = Prometheus.parseExposition(
          rendered, col("line"), col("fullname"), col("ord"))
        .select("name", "tags", "value_type", "value")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getDouble(3))).toSet
      val expect = rows.zipWithIndex.map { case ((vt, v1, v2, value), i) =>
        (s"m$i", s"ka=$v1,kb=$v2", vt, value)
      }.toSet
      parsed == expect
    }
    check(p, 20)
  }

  test("portable hash family: perm stays in [0, P) and members differ") {
    import graft.functions.PortableHash
    val p = Prop.forAll(Gen.choose(0L, Long.MaxValue / 2), Gen.choose(2, 64)) { (x, k) =>
      val fam = PortableHash.family(k)
      val vals = fam.map { case (_, a, b) => ((x % PortableHash.P) * a + b) % PortableHash.P }
      vals.forall(v => v >= 0 && v < PortableHash.P) &&
        fam.map { case (_, a, b) => (a, b) }.distinct.size == k
    }
    check(p, 60)
  }

  test("cidr range math: lookupCidr's bucket cover contains exactly the network") {
    // mirrors Enrich.lookupCidr's start/end/bucket arithmetic in plain
    // Scala and checks the invariants the join relies on
    val genOctet = Gen.choose(0, 255)
    val p = Prop.forAll(genOctet, genOctet, Gen.choose(8, 32)) { (o1, o2, prefix) =>
      val net = ((o1.toLong * 256 + o2) * 256) * 256
      val size = 1L << (32 - prefix)
      val start = net / size * size
      val end = start + size - 1
      val bkts = (start >> 16) to (end >> 16)
      // every address in [start, end] lands in a covered bucket, and
      // the bucket count is bounded by the /16 grid the table explodes to
      start >= 0 && end < (1L << 32) &&
        bkts.nonEmpty && bkts.size <= math.max(1L, size >> 16) + 1 &&
        (start >> 16) == bkts.head && (end >> 16) == bkts.last
    }
    check(p, 60)
  }
}
