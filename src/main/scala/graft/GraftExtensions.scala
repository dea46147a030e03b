package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** SparkSessionExtensions entry point: registers graft's custom
  * Catalyst expressions as SQL functions. Wired into every session by
  * Sessions.build via spark.sql.extensions, so operators can use them
  * through expr("...") — the idiomatic extension route, no
  * function-registry poking per call site.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // derive pushable raw-nanos bounds through the events-table
    // timestamp reconstruction (see NanosTimestampPushdown doc)
    ext.injectOptimizerRule(_ => graft.plans.NanosTimestampPushdown)
    // batch format("graft-lake") + SQL TIMESTAMP/VERSION AS OF: inline
    // the placeholder relation into the real pruned lake plan. The
    // HINTS hook is load-bearing for the SQL forms — ResolveSQLOnFile
    // (Resolution batch, before injected rules) throws for any
    // non-FileFormat direct query, so the graft-lake identifier must
    // be resolved before that batch; the Resolution hook keeps
    // covering placeholders introduced later (views, cached plans).
    ext.injectHintResolutionRule(s => graft.plans.ResolveLakeRelation(s))
    ext.injectResolutionRule(s => graft.plans.ResolveLakeRelation(s))
    // maintenance SQL (OPTIMIZE / VACUUM / DESCRIBE HISTORY / RESTORE)
    // — statements Spark's grammar lacks; the delegating parser claims
    // them for graft-lake tables, Delta's own parser-extension shape
    ext.injectParser((s, delegate) =>
      new graft.plans.GraftSqlParser(s, delegate))

    def register(name: String, clazz: Class[_])(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name), builder))

    register("cron_times", classOf[NextCronTimes]) { c =>
      require(c.length == 3, "cron_times(cron, start, end)")
      NextCronTimes(c(0), c(1), c(2))
    }
    register("bloom_might_contain", classOf[BloomMightContain]) { c =>
      require(c.length == 3, "bloom_might_contain(bloom, p1, p2)")
      BloomMightContain(c(0), c(1), c(2))
    }
    register("cosine_similarity", classOf[CosineSimilarity]) { c =>
      require(c.length == 2, "cosine_similarity(a, b)")
      CosineSimilarity(c(0), c(1))
    }
    register("dot_product", classOf[DotProduct]) { c =>
      require(c.length == 2, "dot_product(a, b)")
      DotProduct(c(0), c(1))
    }
    register("l2_distance", classOf[L2Distance]) { c =>
      require(c.length == 2, "l2_distance(a, b)")
      L2Distance(c(0), c(1))
    }
    register("mmr_greedy", classOf[MmrGreedy]) { c =>
      require(c.length == 3, "mmr_greedy(rels, simmat, k)")
      MmrGreedy(c(0), c(1), litInt(c(2), "k"))
    }
    register("hyperplane_lsh", classOf[HyperplaneLsh]) { c =>
      require(c.length == 3, "hyperplane_lsh(vec, seed, bits)")
      HyperplaneLsh(c(0), litInt(c(1), "seed"), litInt(c(2), "bits"))
    }
    register("minhash_signature", classOf[MinHashSignature]) { c =>
      require(c.length == 3, "minhash_signature(hashes, numPerms, seed)")
      MinHashSignature(c(0), litInt(c(1), "numPerms"), litInt(c(2), "seed"))
    }
    register("poly_hash31", classOf[PolyHash31]) { c =>
      require(c.length == 1, "poly_hash31(str)")
      PolyHash31(c(0))
    }
    register("simhash64", classOf[SimHash64]) { c =>
      require(c.length == 1, "simhash64(tokens)")
      SimHash64(c(0))
    }
    register("ahash64", classOf[AHash64]) { c =>
      require(c.length == 1, "ahash64(text)")
      AHash64(c(0))
    }
    register("winnow_sketch", classOf[WinnowSketch]) { c =>
      require(c.length == 3, "winnow_sketch(text, k, w)")
      WinnowSketch(c(0), litInt(c(1), "k"), litInt(c(2), "w"))
    }
    register("cdc_chunks", classOf[CdcChunks]) { c =>
      require(c.length == 3, "cdc_chunks(text, k, d)")
      CdcChunks(c(0), litInt(c(1), "k"), litInt(c(2), "d"))
    }
  }
}
