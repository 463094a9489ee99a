package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ops.MongoFilter

/** Property check for the Mongo-filter compiler: random filter documents
  * from the supported operator grammar must agree with a direct Scala
  * evaluator over a fixed mixed-shape document set. Each generated filter
  * carries BOTH its JSON and its reference predicate, so the test cannot
  * drift from the grammar it generates.
  *
  * (Null-valued fields are deliberately absent from the fixture: Mongo's
  * `{f: null}`-matches-missing semantics vs SQL's null-propagating
  * equality is a documented divergence of the compiler, not a bug this
  * property should explore.)
  */
class MongoFilterPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(res.passed, res.status.toString)
  }

  private type Doc = (Long, String, Double, Map[String, String])
  private val labels = Seq("a", "b", "c")

  // 12 docs spanning: every label, fractional scores, present/absent/varied
  // props keys — enough shape diversity that wrong compilations surface.
  private val docs: Seq[Doc] =
    (0L until 12L).map { i =>
      val props =
        (if (i % 2 == 0) Map("k1" -> (if (i % 4 == 0) "x" else "y")) else Map.empty[String, String]) ++
          (if (i % 3 == 0) Map("k2" -> "z") else Map.empty[String, String])
      (i, labels((i % 3).toInt), (i % 5) / 2.0, props)
    }

  /** A filter as generated JSON plus its independent reference predicate. */
  private case class F(json: String, eval: Doc => Boolean)

  private val leafGen: Gen[F] = Gen.oneOf(
    Gen.oneOf(labels).map(l => F(s"""{"label": "$l"}""", _._2 == l)),
    Gen.oneOf(labels).map(l => F(s"""{"label": {"$$ne": "$l"}}""", _._2 != l)),
    Gen.choose(0, 25).map { x =>
      val t = x / 10.0
      F(s"""{"score": {"$$gt": $t}}""", _._3 > t)
    },
    Gen.choose(0, 25).map { x =>
      val t = x / 10.0
      F(s"""{"score": {"$$gte": $t, "$$lt": ${t + 1.0}}}""", d => d._3 >= t && d._3 < t + 1.0)
    },
    Gen.someOf(labels).map { ls =>
      val set = ls.toSet
      F(s"""{"label": {"$$in": [${ls.map(l => s""""$l"""").mkString(", ")}]}}""",
        d => set.contains(d._2))
    },
    Gen.oneOf("k1", "k2").map(k =>
      F(s"""{"props.$k": {"$$exists": true}}""", _._4.contains(k))),
    Gen.oneOf("k1", "k2").map(k =>
      F(s"""{"props.$k": {"$$exists": false}}""", d => !d._4.contains(k))),
    Gen.zip(Gen.oneOf("k1", "k2"), Gen.oneOf("x", "y", "z")).map { case (k, v) =>
      F(s"""{"props.$k": "$v"}""", _._4.get(k).contains(v))
    },
    Gen.oneOf("^a", "b|c", "a$").map(re =>
      F(s"""{"label": {"$$regex": "$re"}}""", d => re.r.findFirstIn(d._2).isDefined)),
    Gen.zip(Gen.choose(2L, 5L), Gen.choose(0L, 4L)).map { case (m, r) =>
      F(s"""{"id": {"$$mod": [$m, ${r % m}]}}""", d => d._1 % m == r % m)
    },
    Gen.choose(0, 25).map { x =>
      val t = x / 10.0
      F(s"""{"score": {"$$not": {"$$gt": $t}}}""", d => !(d._3 > t))
    },
    // negation over a possibly-MISSING map key: Mongo's match/no-match
    // semantics says the negation MATCHES the document — the compiler must
    // default the inner SQL-NULL to false before negating.
    Gen.zip(Gen.oneOf("k1", "k2"), Gen.oneOf("x", "y", "z")).map { case (k, v) =>
      F(s"""{"props.$k": {"$$not": {"$$eq": "$v"}}}""", d => !d._4.get(k).contains(v))
    },
    Gen.zip(Gen.oneOf("k1", "k2"), Gen.oneOf("x", "y", "z")).map { case (k, v) =>
      F(s"""{"props.$k": {"$$nin": ["$v"]}}""", d => !d._4.get(k).contains(v))
    },
    Gen.zip(Gen.oneOf("k1", "k2"), Gen.oneOf("x", "y", "z")).map { case (k, v) =>
      F(s"""{"props.$k": {"$$ne": "$v"}}""", d => !d._4.get(k).contains(v))
    })

  private def filterGen(depth: Int): Gen[F] =
    if (depth == 0) leafGen
    else Gen.frequency(
      3 -> leafGen,
      1 -> Gen.zip(filterGen(depth - 1), filterGen(depth - 1)).map { case (a, b) =>
        F(s"""{"$$and": [${a.json}, ${b.json}]}""", d => a.eval(d) && b.eval(d))
      },
      1 -> Gen.zip(filterGen(depth - 1), filterGen(depth - 1)).map { case (a, b) =>
        F(s"""{"$$or": [${a.json}, ${b.json}]}""", d => a.eval(d) || b.eval(d))
      },
      1 -> Gen.zip(filterGen(depth - 1), filterGen(depth - 1)).map { case (a, b) =>
        F(s"""{"$$nor": [${a.json}, ${b.json}]}""", d => !(a.eval(d) || b.eval(d)))
      })

  test("compiled filters agree with the reference evaluator on random documents") {
    val df = docs.toDF("id", "label", "score", "props")
    check(Prop.forAll(filterGen(2)) { f =>
      val got = MongoFilter.where(df, f.json).select("id").as[Long].collect().toSet
      val want = docs.filter(f.eval).map(_._1).toSet
      if (got != want)
        println(s"MISMATCH for ${f.json}: got $got, want $want")
      got == want
    })
  }
}
