package graft.queries

import graft.Tables
import graft.functions.Exact.money
import graft.functions.PortableHash.md5Bucket60
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift monitors — what a continuous 100 TB ingest pipeline
  * runs per batch to notice that today's data no longer looks like the
  * reference window before a silent quality regression poisons training:
  * the banker's PSI (binned, ln-weighted) and the exact two-sample
  * Kolmogorov–Smirnov distance. Both reduce to hash aggregates plus
  * bounded windows and replay exactly in DuckDB (PSI via the repo's
  * floor-ln micro-nat discipline, KS in pure integers).
  */
object DriftQueries {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- q171
  /** Population Stability Index per source: the reference population is
    * the deterministic md5 half of each source's documents (the q97 split
    * discipline — in production, last week's snapshot), the current
    * population the other half; lengths are binned into the FIXED value
    * domain `n_chars div 64` ∈ [0, 9] (no stats pass, same bins at every
    * scale) with add-one smoothing over the full spine so empty bins
    * cannot produce ln(0). PSI = Σ (p−q)·ln(p/q) is assembled in exact
    * integer micro-nats: each term is
    * `diff_num · ln_micro div denom` where diff_num = (a+1)(Nb+B) −
    * (b+1)(Na+B), denom = (Na+B)(Nb+B), and ln_micro = floor(1e6·ln of
    * the identical double ratio) — the q121/q124 floor-ln rule, so both
    * engines truncate the same values and the order-free integer sum
    * hash-matches. Work: one corpus scan → (source, bin, side) hash agg
    * (≤ sources·10·2 rows); everything after is spine-sized. The top bin
    * is CLAMPED (`least(n_chars div 64, 9)`) so documents past the bin
    * domain land in bin 9 instead of silently falling off the spine join
    * — the same open-ended edge bin StreamingDrift uses, keeping the
    * batch/stream parity number-for-number on long documents. Long bound:
    * diff_num·ln_micro peaks ~N²·2·10⁶ — guarded by `Guard.require`
    * (fails loudly past ~10⁹ docs per source instead of wrapping;
    * DECIMAL(38) is the documented promotion). */
  private val q171: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("source"),
      expr("least(n_chars div 64, 9)").as("bin"),
      (md5Bucket60(col("doc_id").cast("string")) % 100 < 50).as("is_ref"))
    val counts = docs.groupBy("source", "bin")
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("a"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("b"))
    val spine = Tables.documents(s, d).select(col("source")).distinct()
      .crossJoin(s.range(10).select(col("id").as("bin")))
    val filled = spine.join(counts, Seq("source", "bin"), "left")
      .select(col("source"), col("bin"),
        (coalesce(col("a"), lit(0L)) + 1).as("a1"),
        (coalesce(col("b"), lit(0L)) + 1).as("b1"))
    val totals = filled.groupBy("source")
      .agg(sum(col("a1")).as("na"), sum(col("b1")).as("nb"))
    val terms = filled.join(totals, Seq("source"))
      .select(col("source"), col("na"), col("nb"),
        (col("a1") * col("nb") - col("b1") * col("na")).as("diff_num"),
        expr("CAST(floor(1000000.0 * ln((CAST(a1 AS DOUBLE) * CAST(nb AS DOUBLE)) / " +
          "(CAST(b1 AS DOUBLE) * CAST(na AS DOUBLE)))) AS BIGINT)").as("ln_micro"))
    // The documented Long-exactness cliff, now enforced: diff_num·ln_micro
    // and na·nb must not wrap. Maximally permissive per-row bound.
    graft.functions.Guard.require(terms,
      col("na") <= 2000000000L && col("nb") <= 2000000000L &&
        abs(col("diff_num")) <= expr("9223372036854775807L div (abs(ln_micro) + 1)"),
      "q171: integer-exact PSI bound exceeded (diff_num * ln_micro would " +
        "overflow Long) - promote the term arithmetic to DECIMAL(38)")
      .groupBy(col("source"))
      .agg(min(col("na") - 10).as("n_ref"), min(col("nb") - 10).as("n_cur"),
        sum(expr("diff_num * ln_micro div (na * nb)")).as("psi_micro"))
      .orderBy(col("source"))
  }

  private val q171Sql =
    """WITH docs AS (SELECT source, least(n_chars // 64, 9) AS bin,
      |  (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 50)
      |    AS is_ref
      | FROM documents),
      |counts AS (SELECT source, bin,
      |   SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS a,
      |   SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS b
      | FROM docs GROUP BY source, bin),
      |spine AS (SELECT DISTINCT d.source, r.bin
      |          FROM documents d, (SELECT UNNEST(range(10)) AS bin) r),
      |filled AS (SELECT s.source, s.bin,
      |   COALESCE(c.a, 0) + 1 AS a1, COALESCE(c.b, 0) + 1 AS b1
      | FROM spine s LEFT JOIN counts c ON c.source = s.source AND c.bin = s.bin),
      |tot AS (SELECT source, SUM(a1) AS na, SUM(b1) AS nb FROM filled GROUP BY source),
      |terms AS (SELECT f.source, t.na, t.nb,
      |   f.a1 * t.nb - f.b1 * t.na AS diff_num,
      |   CAST(floor(1000000.0 * ln((CAST(f.a1 AS DOUBLE) * CAST(t.nb AS DOUBLE)) /
      |     (CAST(f.b1 AS DOUBLE) * CAST(t.na AS DOUBLE)))) AS BIGINT) AS ln_micro
      | FROM filled f JOIN tot t ON t.source = f.source)
      |SELECT source, CAST(MIN(na) - 10 AS BIGINT) AS n_ref,
      | CAST(MIN(nb) - 10 AS BIGINT) AS n_cur,
      | CAST(SUM(diff_num * ln_micro // (na * nb)) AS BIGINT) AS psi_micro
      |FROM terms GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q172
  /** Exact two-sample Kolmogorov–Smirnov distance per event type, between
    * the first and second half of the month — the non-parametric drift
    * test that needs no binning choice, in PURE integer arithmetic (no
    * ln, no doubles): at every observed value point v,
    * D(v) = |cumA(v)·N_B − cumB(v)·N_A|, and
    * KS_ppm = 10⁶·max_v D(v) div (N_A·N_B). One hash aggregate collapses
    * the corpus to (type, cents) → (a, b) counts; the running CDFs are a
    * per-type window over DISTINCT VALUE POINTS (bounded by the value
    * domain, the q81 bounded-group caveat — unbounded domains would swap
    * in q129's histogram refinement with identical rank arithmetic).
    * Long bound: cum·N ≤ N², ×10⁶ — enforced by `Guard.require` (fails
    * loudly instead of wrapping; DECIMAL(38) is the promotion). A type
    * observed in only ONE half would divide by zero — Spark's `div`
    * yields NULL where DuckDB's `//` raises, so both engines emit an
    * explicit NULL ks_ppm for that degenerate case and degrade
    * identically. */
  private val q172: Q = (s, d) => {
    val ev = Tables.events(s, d).select(col("event_type"),
      (money(col("value")) * 100).cast("long").as("cents"),
      (dayofmonth(col("ts")) <= 15).as("is_a"))
    val pts = ev.groupBy("event_type", "cents")
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("a"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("b"))
    val w = Window.partitionBy(col("event_type"))
    val cum = pts
      .withColumn("ca", sum(col("a")).over(w.orderBy(col("cents"))))
      .withColumn("cb", sum(col("b")).over(w.orderBy(col("cents"))))
      .withColumn("na", sum(col("a")).over(w))
      .withColumn("nb", sum(col("b")).over(w))
    // Guard BEFORE the ca·nb / cb·na products: d_max ≤ na·nb and the
    // final ×10⁶ require na·nb ≤ 9.2·10¹², i.e. ~3·10⁶ rows per side.
    graft.functions.Guard.require(cum,
      col("na") <= 3000000L && col("nb") <= 3000000L,
      "q172: integer-exact KS bound exceeded (d_max * 1000000 would " +
        "overflow Long past ~3e6 rows per side) - promote to DECIMAL(38)")
      .groupBy(col("event_type"))
      .agg(min(col("na")).as("n_a"), min(col("nb")).as("n_b"),
        max(abs(col("ca") * col("nb") - col("cb") * col("na"))).as("d_max"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        when(col("n_a") === 0L || col("n_b") === 0L, lit(null).cast("long"))
          .otherwise(expr("d_max * 1000000 div (n_a * n_b)")).as("ks_ppm"))
      .orderBy(col("event_type"))
  }

  private val q172Sql =
    """WITH ev AS (SELECT event_type,
      |  CAST(CAST(value AS DECIMAL(15,2)) * 100 AS BIGINT) AS cents,
      |  (EXTRACT(day FROM ts) <= 15) AS is_a
      | FROM events),
      |pts AS (SELECT event_type, cents,
      |   SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS a,
      |   SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS b
      | FROM ev GROUP BY event_type, cents),
      |cum AS (SELECT event_type, cents,
      |   SUM(a) OVER (PARTITION BY event_type ORDER BY cents) AS ca,
      |   SUM(b) OVER (PARTITION BY event_type ORDER BY cents) AS cb,
      |   SUM(a) OVER (PARTITION BY event_type) AS na,
      |   SUM(b) OVER (PARTITION BY event_type) AS nb
      | FROM pts)
      |SELECT event_type, CAST(MIN(na) AS BIGINT) AS n_a,
      | CAST(MIN(nb) AS BIGINT) AS n_b,
      | CASE WHEN MIN(na) = 0 OR MIN(nb) = 0 THEN CAST(NULL AS BIGINT)
      |      ELSE CAST(MAX(abs(ca * nb - cb * na)) * 1000000
      |                  // (MIN(na) * MIN(nb)) AS BIGINT) END AS ks_ppm
      |FROM cum GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q175
  /** Benford first-digit audit on order totals — the classic forensic
    * data-quality check (fabricated or unit-mangled monetary columns bend
    * the leading-digit curve). Observed first-digit shares in exact ppm
    * against the Benford expectation log10(1+1/d), whose nine values are
    * UNIVERSAL constants carried as integer-ppm literals (301030, 176091,
    * …, 45757) — no runtime log10, so both engines are bit-exact. One
    * map-only projection (first char of the integer cents string) + a
    * 9-key hash aggregate; deviation_ppm is the per-digit signed gap the
    * monitor thresholds on. The corpus total rides the plan as a
    * broadcast 1-row aggregate over the 9-row digit table (the q170
    * one-action discipline) — never a driver-side count() pre-pass. */
  private val q175: Q = (s, d) => {
    val expected = Map(1 -> 301030L, 2 -> 176091L, 3 -> 124939L,
      4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L,
      9 -> 45757L)
    val expectedCol = expected.foldLeft(lit(0L)) { case (acc, (dd, p)) =>
      when(col("digit") === dd.toLong, p).otherwise(acc)
    }
    val digits = Tables.orders(s, d)
      .select((money(col("o_totalprice")) * 100).cast("long").as("cents"))
      .filter(col("cents") > 0)
      .select(expr("CAST(substring(CAST(cents AS STRING), 1, 1) AS BIGINT)").as("digit"))
    val grouped = digits.groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val total = grouped.agg(sum(col("n_obs")).as("n_total"))
    grouped.crossJoin(broadcast(total))
      .select(col("digit"), col("n_obs"),
        expr("n_obs * 1000000 div n_total").as("observed_ppm"),
        expectedCol.as("benford_ppm"))
      .withColumn("deviation_ppm", col("observed_ppm") - col("benford_ppm"))
      .orderBy(col("digit"))
  }

  private val q175Sql =
    """WITH c AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)
      |             AS cents FROM orders),
      |d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
      |      FROM c WHERE cents > 0),
      |n AS (SELECT COUNT(*) AS n FROM d),
      |e AS (SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
      |        (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153),
      |        (9, 45757)) t(digit, benford_ppm))
      |SELECT CAST(d.digit AS BIGINT) AS digit,
      | CAST(COUNT(*) AS BIGINT) AS n_obs,
      | CAST(COUNT(*) * 1000000 // n.n AS BIGINT) AS observed_ppm,
      | CAST(e.benford_ppm AS BIGINT) AS benford_ppm,
      | CAST(COUNT(*) * 1000000 // n.n - e.benford_ppm AS BIGINT) AS deviation_ppm
      |FROM d, n, e WHERE e.digit = d.digit
      |GROUP BY d.digit, n.n, e.benford_ppm ORDER BY digit""".stripMargin

  // ---------------------------------------------------------------- q183
  /** Per-type OLS value trend — the TREND member of the drift family:
    * q171 (PSI) and q172 (KS) detect that two distributions differ, but
    * not the monitoring question "is this metric drifting, how fast, and
    * does a line explain it?" — that is an ordinary-least-squares
    * regression of value on time, per key. slope = (nΣxy−ΣxΣy)/(nΣx²−
    * (Σx)²), intercept = (Σy − slope·Σx)/n, fit quality R².
    *
    * Exactness discipline: x = whole days since the corpus anchor
    * 2024-01-01 (a plan-time constant — anchoring near the data keeps Σx²
    * small instead of 19 700²-scale epoch days), y = exact cents. All
    * five power sums and both normal-equation determinants live in
    * DECIMAL(38,0) (Spark) ↔ HUGEINT (DuckDB) — no Long cliff anywhere:
    * the largest term, num·Σx, stays under 10³⁶ past sf1000. slope
    * (micro-cents/day) and intercept (cents) are truncating integer
    * divisions; R² alone is a fixed-order double quotient (the q75 corr
    * precedent). A single-day group has den = 0 and degrades to NULL
    * slope/intercept/R² identically in both engines. One hash aggregation,
    * partial+final, five output rows — nothing scales with n but the scan.
    */
  private val q183: Q = (s, d) => {
    val e = Tables.events(s, d).select(col("event_type"),
      datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("x"),
      (money(col("value")) * 100).cast("long").as("y"))
    val xD = col("x").cast("decimal(19,0)")
    val yD = col("y").cast("decimal(19,0)")
    e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(xD).as("sx"), sum(yD).as("sy"),
        sum(xD * xD).as("sxx"), sum(xD * yD).as("sxy"), sum(yD * yD).as("syy"))
      .select(col("event_type"), col("n"), col("sx"), col("sy"),
        expr("CAST(n AS DECIMAL(38,0)) * sxy - sx * sy").as("num"),
        expr("CAST(n AS DECIMAL(38,0)) * sxx - sx * sx").as("den"),
        expr("CAST(n AS DECIMAL(38,0)) * syy - sy * sy").as("deny"))
      .select(col("event_type"), col("n"),
        expr("""CASE WHEN den = 0 THEN NULL
                ELSE CAST(CAST(1000000 AS DECIMAL(38,0)) * num div den AS BIGINT)
                END""").as("slope_ucents_day"),
        expr("""CASE WHEN den = 0 THEN NULL
                ELSE CAST((sy - (num * sx div den)) div n AS BIGINT)
                END""").as("icept_cents"),
        expr("""CASE WHEN den = 0 OR deny = 0 THEN NULL
                ELSE (CAST(num AS DOUBLE) * CAST(num AS DOUBLE))
                     / (CAST(den AS DOUBLE) * CAST(deny AS DOUBLE))
                END""").as("r2"))
      .orderBy(col("event_type"))
  }

  private val q183Sql =
    """WITH e AS (SELECT event_type,
      |    CAST(DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
      |    CAST(CAST(value AS DECIMAL(15,2)) * 100 AS BIGINT) AS y
      |  FROM events),
      |s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
      |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
      |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
      |    SUM(CAST(y AS HUGEINT) * y) AS syy
      |  FROM e GROUP BY event_type),
      |f AS (SELECT event_type, n, sx, sy,
      |    CAST(n AS HUGEINT) * sxy - sx * sy AS num,
      |    CAST(n AS HUGEINT) * sxx - sx * sx AS den,
      |    CAST(n AS HUGEINT) * syy - sy * sy AS deny
      |  FROM s)
      |SELECT event_type, n,
      |  CASE WHEN den = 0 THEN NULL
      |       ELSE CAST((1000000 * num) // den AS BIGINT) END AS slope_ucents_day,
      |  CASE WHEN den = 0 THEN NULL
      |       ELSE CAST((sy - ((num * sx) // den)) // CAST(n AS HUGEINT) AS BIGINT)
      |  END AS icept_cents,
      |  CASE WHEN den = 0 OR deny = 0 THEN NULL
      |       ELSE (CAST(num AS DOUBLE) * CAST(num AS DOUBLE))
      |            / (CAST(den AS DOUBLE) * CAST(deny AS DOUBLE)) END AS r2
      |FROM f ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q198
  /** Jensen–Shannon divergence per event type between the first and
    * second half of the month — the SYMMETRIC, BOUNDED drift score that
    * completes the monitor family (q171's PSI is unbounded and blows up
    * on empty-bin asymmetry; q172's KS sees only the worst single point;
    * JSD ∈ [0, ln 2] weighs the whole distribution and is safe on
    * disjoint supports). Values are binned into the FIXED domain
    * `cents div 2048` clamped to [0, 19] (no stats pass — same bins at
    * every scale, open top bin per the q171 clamp rule) with add-one
    * smoothing over the full 20-bin spine.
    *
    * Integer-exactness: the textbook JSD = ½KL(p‖m) + ½KL(q‖m) has
    * NEGATIVE per-term logs, and Spark's `div` (truncate-to-zero) vs
    * DuckDB's `//` need not agree on negative numerators — so this uses
    * the entropy decomposition JSD = H(m) − (H(p)+H(q))/2, where every
    * term is x·ln(1/x) with x ∈ (0,1]: ALL logs and ALL division
    * numerators are non-negative, so truncation direction is moot. Each
    * log is the q121/q124 floor-ln micro-nat (floor(10⁶·ln) of an
    * IDENTICAL double ratio of integers in both engines):
    *   hp_t = a1·lnm(na/a1) div na            (per-bin, summed)
    *   hq_t = b1·lnm(nb/b1) div nb
    *   hm_t = (a1·nb + b1·na)·lnm(2·na·nb/(a1·nb + b1·na)) div (2·na·nb)
    *   jsd_micro = Σhm − (Σhp + Σhq) div 2    (≤ ln 2 ≈ 693147 µnats)
    * Work: one corpus scan → (type, bin, side) hash agg (≤ types·20·2
    * rows); everything after is spine-sized. Long bound: hm's numerator
    * peaks at 2·na·nb·14·10⁶ — Guard.require fails loudly past ~18k rows
    * per side per type at Long width; the same DECIMAL(38) promotion as
    * q171 is the documented path beyond (the guard is per-term and
    * in-plan, costing no extra pass). */
  private val q198: Q = (s, d) => {
    // greatest(..,0) mirrors the least(..,19) open-top-bin rule on the
    // bottom: for a NEGATIVE value Spark's `div` truncates toward zero
    // (bin 0) while DuckDB's `//` floors (bin -1, silently dropped by the
    // 0-19 spine) — the clamp makes parity independent of value's sign.
    val ev = Tables.events(s, d).select(col("event_type"),
      least(greatest(
        expr("CAST(CAST(value AS DECIMAL(15,2)) * 100 AS BIGINT) div 2048L"),
        lit(0L)), lit(19L)).as("bin"),
      (dayofmonth(col("ts")) <= 15).as("is_ref"))
    val counts = ev.groupBy("event_type", "bin")
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("a"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("b"))
    val spine = Tables.events(s, d).select(col("event_type")).distinct()
      .crossJoin(s.range(20).select(col("id").as("bin")))
    val filled = spine.join(counts, Seq("event_type", "bin"), "left")
      .select(col("event_type"), col("bin"),
        (coalesce(col("a"), lit(0L)) + 1).as("a1"),
        (coalesce(col("b"), lit(0L)) + 1).as("b1"))
    val totals = filled.groupBy("event_type")
      .agg(sum(col("a1")).as("na"), sum(col("b1")).as("nb"))
    val terms = filled.join(totals, Seq("event_type"))
      .select(col("event_type"), col("na"), col("nb"), col("a1"), col("b1"),
        expr("CAST(floor(1000000.0 * ln(CAST(na AS DOUBLE) / CAST(a1 AS DOUBLE))) " +
          "AS BIGINT)").as("lnp"),
        expr("CAST(floor(1000000.0 * ln(CAST(nb AS DOUBLE) / CAST(b1 AS DOUBLE))) " +
          "AS BIGINT)").as("lnq"),
        expr("CAST(floor(1000000.0 * ln((2.0 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) / " +
          "(CAST(a1 AS DOUBLE) * CAST(nb AS DOUBLE) + CAST(b1 AS DOUBLE) * CAST(na AS DOUBLE)))) " +
          "AS BIGINT)").as("lnm"))
    // hm's numerator (a1*nb + b1*na) * lnm ≤ 2*na*nb*lnm must fit a Long.
    graft.functions.Guard.require(terms,
      (col("a1") * col("nb") + col("b1") * col("na")) <=
        expr("9223372036854775807L div (lnm + 1)"),
      "q198: integer-exact JSD bound exceeded ((a1*nb + b1*na) * lnm would " +
        "overflow Long) - promote the term arithmetic to DECIMAL(38)")
      .groupBy(col("event_type"))
      .agg(min(col("na") - 20).as("n_ref"), min(col("nb") - 20).as("n_cur"),
        expr("SUM((a1 * nb + b1 * na) * lnm div (2L * na * nb)) - " +
          "(SUM(a1 * lnp div na) + SUM(b1 * lnq div nb)) div 2L")
          .as("jsd_micro"))
      // In-band invariant (Round12InvariantsSpec's bound, enforced on
      // every oracle run too): JSD ∈ [0, ln 2]; floor-ln truncation can
      // undershoot 0 by at most the 40 per-bin micro-nat floors.
      .transform(f => graft.functions.Guard.require(f,
        col("jsd_micro") >= -40L && col("jsd_micro") <= 693147L,
        "q198: jsd_micro outside [0-eps, ln 2] - the entropy " +
          "decomposition invariant is broken"))
      .orderBy(col("event_type"))
  }

  private val q198Sql =
    """WITH ev AS (SELECT event_type,
      |    least(greatest(
      |      CAST(CAST(value AS DECIMAL(15,2)) * 100 AS BIGINT) // 2048, 0), 19) AS bin,
      |    (EXTRACT(day FROM ts) <= 15) AS is_ref
      |  FROM events),
      |counts AS (SELECT event_type, bin,
      |    SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS a,
      |    SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS b
      |  FROM ev GROUP BY event_type, bin),
      |spine AS (SELECT DISTINCT e.event_type, r.bin
      |          FROM events e, (SELECT UNNEST(range(20)) AS bin) r),
      |filled AS (SELECT s.event_type, s.bin,
      |    COALESCE(c.a, 0) + 1 AS a1, COALESCE(c.b, 0) + 1 AS b1
      |  FROM spine s LEFT JOIN counts c
      |    ON c.event_type = s.event_type AND c.bin = s.bin),
      |tot AS (SELECT event_type, SUM(a1) AS na, SUM(b1) AS nb
      |        FROM filled GROUP BY event_type),
      |terms AS (SELECT f.event_type, t.na, t.nb, f.a1, f.b1,
      |    CAST(floor(1000000.0 * ln(CAST(t.na AS DOUBLE) / CAST(f.a1 AS DOUBLE)))
      |      AS BIGINT) AS lnp,
      |    CAST(floor(1000000.0 * ln(CAST(t.nb AS DOUBLE) / CAST(f.b1 AS DOUBLE)))
      |      AS BIGINT) AS lnq,
      |    CAST(floor(1000000.0 * ln((2.0 * CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE)) /
      |      (CAST(f.a1 AS DOUBLE) * CAST(t.nb AS DOUBLE) +
      |       CAST(f.b1 AS DOUBLE) * CAST(t.na AS DOUBLE)))) AS BIGINT) AS lnm
      |  FROM filled f JOIN tot t ON t.event_type = f.event_type)
      |SELECT event_type,
      |  CAST(MIN(na) - 20 AS BIGINT) AS n_ref,
      |  CAST(MIN(nb) - 20 AS BIGINT) AS n_cur,
      |  CAST(SUM((a1 * nb + b1 * na) * lnm // (2 * na * nb)) -
      |       (SUM(a1 * lnp // na) + SUM(b1 * lnq // nb)) // 2 AS BIGINT) AS jsd_micro
      |FROM terms GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q217
  /** EWMA forecast + anomaly flags per event type — the ONLINE level
    * monitor the drift family lacked: q171/q172/q198 compare two fixed
    * windows, q183 fits one global line; operations wants "was TODAY
    * abnormal given an exponentially-weighted history?" per day. The
    * smoothing is EXACT INTEGER: with decay ½ per day, the weighted sum
    * Σ x_i·2^i over day indices i ≤ t is one cumulative window term and
    * ewma_t = that sum div (2^(t+1) − 1) — a closed form, no float
    * exp(), no recurrence, partition-invariant (the q205 binary-shift
    * decay discipline applied to a time series). Day t's anomaly test
    * compares x_t against the PRIOR day's level (lag(ewma)): ratio_ppm
    * outside [¼×, 4×] flags — a zero-traffic day under a healthy level
    * flags too (ratio 0). Days without events gap-fill to 0 through a
    * type×day spine (the q83/q198 spine rule) so decay sees calendar
    * time, not event time.
    *
    * Long bounds, guarded in-band: x ≥ 0 (Spark div truncates toward
    * zero while DuckDB // floors, so the integer-division parity is a
    * theorem only for non-negative numerators — the q198/q222 lesson),
    * x·2^t needs x ≤ 2^62/2^t (shift guard), and the ratio needs
    * x ≤ Long.Max/10⁶; the observation span is capped at 63 days (the
    * spine is the fixed range(0,63) filtered to the data's span, so
    * both engines build it identically without a scalar-subquery table
    * function). The per-day shift guard bounds each TERM, not the
    * cumulative sum, so a second guard asserts cum ≥ 0 after the
    * window: with every term in [0, 2^62−1] the first overflowing step
    * wraps into [Long.Min, Long.Min+2^62) — strictly negative — making
    * non-negativity of every cum row a sound first-wrap detector.
    * Beyond any bound the documented promotion is DECIMAL(38) / a
    * longer half-life. Oracle note: DuckDB's windowed SUM(BIGINT)
    * returns HUGEINT and it propagates through // and LAG, so the
    * final SELECT casts ewma_cents and ratio_ppm back to BIGINT (the
    * q216/q223 convention — the driver's hash is type-sensitive).
    *
    * Scale shape: one corpus scan → (type, day) map-side-combined hash
    * agg; everything after lives on the ≤ types×63-row spine
    * (type-partitioned cumulative window — bounded partitions, never
    * global). */
  private val q217: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        (money(col("value")) * 100).cast("long").as("cents"))
    val anchor = daily.agg(min(col("day")).as("d0"),
      datediff(max(col("day")), min(col("day"))).cast("long").as("max_t"))
    val g = daily.crossJoin(broadcast(anchor))
      .select(col("event_type"),
        datediff(col("day"), col("d0")).cast("long").as("t"), col("cents"))
      .groupBy(col("event_type"), col("t")).agg(sum(col("cents")).as("x"))
    val spine = daily.select(col("event_type")).distinct()
      .crossJoin(s.range(63).select(col("id").as("t")))
      .crossJoin(broadcast(anchor.select(col("max_t"))))
      .filter(col("t") <= col("max_t"))
      .select(col("event_type"), col("t"))
    val filled = spine.join(g, Seq("event_type", "t"), "left")
      .select(col("event_type"), col("t"), coalesce(col("x"), lit(0L)).as("x"))
    val guarded = graft.functions.Guard.require(filled,
      col("x") >= lit(0L) &&
        col("x") <= expr("shiftright(4611686018427387903L, CAST(t AS INT))") &&
        col("x") <= lit(9223372036854L),
      "q217: daily total negative (div/floor parity needs x >= 0) or too " +
        "large for the 2^t decay weight or the ppm ratio at Long width - " +
        "promote to DECIMAL(38) or shorten the span")
    val wC = Window.partitionBy(col("event_type")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wL = Window.partitionBy(col("event_type")).orderBy(col("t"))
    // The per-day shift guard bounds each TERM x*2^t <= 2^62-1 but not the
    // running SUM; with all terms in [0, 2^62-1] the first step whose true
    // sum exceeds Long.Max lands the wrapped value in
    // [Long.Min, Long.Min + 2^62) - strictly negative - so cum >= 0 on
    // every row is a sound first-overflow detector (the wrap cannot skip
    // back to non-negative within the step that overflows).
    val lev = graft.functions.Guard.require(
      guarded
        .withColumn("cum",
          sum(expr("x * shiftleft(CAST(1 AS BIGINT), CAST(t AS INT))")).over(wC)),
      col("cum") >= lit(0L),
      "q217: cumulative decayed sum wrapped Long - promote to DECIMAL(38) " +
        "or shorten the half-life/span")
      .withColumn("ewma",
        expr("cum div (shiftleft(CAST(1 AS BIGINT), CAST(t AS INT) + 1) - 1L)"))
      .withColumn("fc", lag(col("ewma"), 1).over(wL))
    lev.select(col("event_type"), col("t"), col("x").as("x_cents"),
        col("ewma").as("ewma_cents"),
        when(col("fc").isNull || col("fc") === 0L, lit(null))
          .otherwise(expr("(x * 1000000L) div fc")).as("ratio_ppm"))
      .withColumn("is_anomaly",
        when(col("ratio_ppm").isNull, lit(false))
          .otherwise(col("ratio_ppm") < 250000L || col("ratio_ppm") > 4000000L))
      .orderBy(col("event_type"), col("t"))
  }

  private val q217Sql =
    """WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(CAST(value AS DECIMAL(15,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |a AS (SELECT MIN(day) AS d0,
      |    CAST(DATEDIFF('day', MIN(day), MAX(day)) AS BIGINT) AS max_t FROM e),
      |g AS (SELECT event_type,
      |    CAST(DATEDIFF('day', a.d0, e.day) AS BIGINT) AS t,
      |    CAST(SUM(cents) AS BIGINT) AS x
      |  FROM e, a GROUP BY 1, 2),
      |spine AS (SELECT ty.event_type, CAST(tt.t AS BIGINT) AS t
      |  FROM (SELECT DISTINCT event_type FROM e) ty,
      |       (SELECT UNNEST(range(0, 63)) AS t) tt, a
      |  WHERE tt.t <= a.max_t),
      |f AS (SELECT s.event_type, s.t, COALESCE(g.x, 0) AS x
      |  FROM spine s LEFT JOIN g ON g.event_type = s.event_type AND g.t = s.t),
      |c AS (SELECT event_type, t, x,
      |    SUM(x * (CAST(1 AS BIGINT) << CAST(t AS INT)))
      |      OVER (PARTITION BY event_type ORDER BY t) AS cum
      |  FROM f),
      |w AS (SELECT event_type, t, x,
      |    cum // ((CAST(1 AS BIGINT) << (CAST(t AS INT) + 1)) - 1) AS ewma
      |  FROM c),
      |z AS (SELECT event_type, t, x, ewma,
      |    LAG(ewma) OVER (PARTITION BY event_type ORDER BY t) AS fc FROM w)
      |SELECT event_type, t, x AS x_cents, CAST(ewma AS BIGINT) AS ewma_cents,
      |  CAST(CASE WHEN fc IS NULL OR fc = 0 THEN NULL
      |       ELSE (x * 1000000) // fc END AS BIGINT) AS ratio_ppm,
      |  CASE WHEN fc IS NULL OR fc = 0 THEN FALSE
      |       ELSE ((x * 1000000) // fc) NOT BETWEEN 250000 AND 4000000
      |  END AS is_anomaly
      |FROM z ORDER BY event_type, t""".stripMargin

  // ---------------------------------------------------------------- q222
  /** Theil–Sen robust trend per event type — the BREAKDOWN-resistant
    * complement of q183's OLS (one corrupted day drags a least-squares
    * slope arbitrarily; the median of pairwise slopes survives ~29 %
    * contamination — the trend-side analogue of q144's MAD vs stddev
    * and q213's trimmed means): per type, the slope is the MEDIAN of
    * all C(n_days, 2) pairwise daily-total slopes, the intercept the
    * median residual at that slope.
    *
    * Exactness discipline: pairwise slopes are RATIONALS num/den with
    * den = Δt > 0. Reporting num·10⁶ div den would reintroduce the
    * negative-numerator truncation divergence (Spark div truncates
    * toward zero, DuckDB // floors — the q198 lesson), so NO integer
    * division ever touches a signed value: ordering uses the IEEE
    * double num/den — bit-identical in both engines for identical Long
    * inputs — with (num, den, t_a, t_b) as the deterministic tiebreak,
    * the median residual orders by the EXACT integer x·den − num·t
    * (den is constant within a type once the median pair is fixed, so
    * integer order IS rational order), and the reported slope/intercept
    * are one final round(double, 4) — the house display convention.
    *
    * Scale shape: one corpus scan → (type, day) hash agg; the pair
    * frame is C(span, 2) ≤ ~2k rows per type (observation span, not
    * corpus size — same bound family as q209/q217); both medians are
    * type-partitioned windows over span-bounded partitions. */
  private val q222: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        (money(col("value")) * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("x"))
    val anchor = daily.agg(min(col("day")).as("d0"))
    val pts = daily.crossJoin(broadcast(anchor))
      .select(col("event_type"),
        datediff(col("day"), col("d0")).cast("long").as("t"), col("x"))
      .localCheckpoint(true) // span-bounded; pair explode + residual pass
    val pairs = pts.as("a").join(pts.as("b"),
        col("a.event_type") === col("b.event_type") && col("a.t") < col("b.t"))
      .select(col("a.event_type").as("event_type"),
        (col("b.x") - col("a.x")).as("num"),
        (col("b.t") - col("a.t")).as("den"),
        col("a.t").as("ta"), col("b.t").as("tb"))
      .withColumn("sl", col("num").cast("double") / col("den").cast("double"))
    val wS = Window.partitionBy(col("event_type"))
      .orderBy(col("sl"), col("num"), col("den"), col("ta"), col("tb"))
    val wN = Window.partitionBy(col("event_type"))
    val med = pairs
      .withColumn("rn", row_number().over(wS))
      .withColumn("n_pairs", count(lit(1)).over(wN))
      .filter(col("rn") === expr("(n_pairs + 1L) div 2L"))
      .select(col("event_type"), col("num"), col("den"), col("n_pairs"))
    val resid = pts.join(med, Seq("event_type"))
      .select(col("event_type"), col("num"), col("den"), col("n_pairs"),
        col("t"), (col("x") * col("den") - col("num") * col("t")).as("r"))
    val wR = Window.partitionBy(col("event_type")).orderBy(col("r"), col("t"))
    resid
      .withColumn("rn", row_number().over(wR))
      .withColumn("n_days", count(lit(1)).over(wN))
      .filter(col("rn") === expr("(n_days + 1L) div 2L"))
      .select(col("event_type"), col("n_days"), col("n_pairs"),
        round(col("num").cast("double") / col("den").cast("double"), 4)
          .as("slope_cents_day"),
        round(col("r").cast("double") / col("den").cast("double"), 4)
          .as("icept_cents"))
      .orderBy(col("event_type"))
  }

  private val q222Sql =
    """WITH daily AS MATERIALIZED (SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(15,2)) * 100 AS BIGINT))
      |         AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |a0 AS (SELECT MIN(day) AS d0 FROM daily),
      |pts AS MATERIALIZED (SELECT event_type,
      |    CAST(DATEDIFF('day', a0.d0, day) AS BIGINT) AS t, x
      |  FROM daily, a0),
      |pr AS (SELECT a.event_type, b.x - a.x AS num, b.t - a.t AS den,
      |    a.t AS ta, b.t AS tb,
      |    CAST(b.x - a.x AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS sl
      |  FROM pts a JOIN pts b ON a.event_type = b.event_type AND a.t < b.t),
      |mr AS (SELECT event_type, num, den,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |                       ORDER BY sl, num, den, ta, tb) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_pairs
      |  FROM pr),
      |med AS (SELECT event_type, num, den, n_pairs FROM mr
      |        WHERE rn = (n_pairs + 1) // 2),
      |rs AS (SELECT p.event_type, m.num, m.den, m.n_pairs, p.t,
      |    p.x * m.den - m.num * p.t AS r
      |  FROM pts p JOIN med m ON m.event_type = p.event_type),
      |rr AS (SELECT event_type, num, den, n_pairs, r,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY r, t) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days
      |  FROM rs)
      |SELECT event_type, n_days, n_pairs,
      |  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 4) AS slope_cents_day,
      |  round(CAST(r AS DOUBLE) / CAST(den AS DOUBLE), 4) AS icept_cents
      |FROM rr WHERE rn = (n_days + 1) // 2
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q224
  /** Cross-correlation lag finder — "does signups' daily revenue LEAD
    * purchases' by k days?", the causal-structure probe the per-series
    * monitors (q183 trend, q217 level, q222 robust trend) cannot see:
    * for every ordered event-type pair and every lag in [−7, 7], the
    * Pearson correlation of the two gap-filled daily series over the
    * overlapping window, reporting each pair's best lag. Lead/lag
    * structure is what turns five isolated monitors into a system
    * diagram (alert on the LEADER, not the follower).
    *
    * Exactness: all sums are exact DECIMAL(38) integer moments per
    * (pair, lag) — products of guarded daily cents squared past Long
    * (the q183/q191 promotion discipline) — and r is ONE final double
    * expression of those exact integers (identical operands → identical
    * IEEE result → identical round(…, 4) both engines; same contract as
    * q183's R²). Zero-variance windows are excluded in both engines
    * (r undefined). Argmax per pair breaks ties by (|lag|, lag).
    *
    * Scale shape: one corpus scan → (type, day) hash agg; everything
    * after lives on the types×span spine × 15 lags (≤ 4.5k rows at any
    * corpus size — the q217/q222 span-bounded family; the probe's
    * q222_pairs counter measures the same flatness). */
  private val q224: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        (money(col("value")) * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("x"))
    val anchor = daily.agg(min(col("day")).as("d0"),
      datediff(max(col("day")), min(col("day"))).cast("long").as("max_t"))
    val spine = daily.select(col("event_type")).distinct()
      .crossJoin(s.range(63).select(col("id").as("t")))
      .crossJoin(broadcast(anchor))
      .filter(col("t") <= col("max_t"))
      .select(col("event_type"), col("t"))
    val filled = spine.join(
        daily.crossJoin(broadcast(anchor.select(col("d0"))))
          .select(col("event_type"),
            datediff(col("day"), col("d0")).cast("long").as("t"), col("x")),
        Seq("event_type", "t"), "left")
      .select(col("event_type"), col("t"), coalesce(col("x"), lit(0L)).as("x"))
      .localCheckpoint(true) // span-bounded; self-joined across 15 lags
    val lags = s.range(-7, 8).select(col("id").as("lag"))
    val cells = filled.as("a")
      .crossJoin(broadcast(lags))
      .join(filled.as("b"),
        col("a.event_type") < col("b.event_type") &&
          col("a.t") + col("lag") === col("b.t"))
      .select(col("a.event_type").as("ta"), col("b.event_type").as("tb"),
        col("lag"), col("a.x").as("xa"), col("b.x").as("xb"))
    val moments = cells.groupBy(col("ta"), col("tb"), col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(xa AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(xb AS DECIMAL(38,0))")).as("sy"),
        sum(expr("CAST(xa AS DECIMAL(38,0)) * xb")).as("sxy"),
        sum(expr("CAST(xa AS DECIMAL(38,0)) * xa")).as("sxx"),
        sum(expr("CAST(xb AS DECIMAL(38,0)) * xb")).as("syy"))
      .select(col("ta"), col("tb"), col("lag"), col("n"),
        expr("CAST(n AS DECIMAL(38,0)) * sxy - sx * sy").as("num"),
        expr("CAST(n AS DECIMAL(38,0)) * sxx - sx * sx").as("denx"),
        expr("CAST(n AS DECIMAL(38,0)) * syy - sy * sy").as("deny"))
      .filter(col("denx") > 0 && col("deny") > 0)
      .select(col("ta"), col("tb"), col("lag"), col("n"),
        round(expr("CAST(num AS DOUBLE) / " +
          "sqrt(CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE))"), 4).as("r"))
    val wP = Window.partitionBy(col("ta"), col("tb"))
      .orderBy(col("r").desc, abs(col("lag")), col("lag"))
    moments.withColumn("rn", row_number().over(wP))
      .filter(col("rn") === 1)
      .select(col("ta"), col("tb"), col("lag").as("best_lag"),
        col("n").as("n_days"), col("r").as("best_r"))
      .orderBy(col("ta"), col("tb"))
  }

  private val q224Sql =
    """WITH daily AS MATERIALIZED (SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(15,2)) * 100 AS BIGINT))
      |         AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |a0 AS (SELECT MIN(day) AS d0,
      |    CAST(DATEDIFF('day', MIN(day), MAX(day)) AS BIGINT) AS max_t
      |  FROM daily),
      |spine AS (SELECT ty.event_type, CAST(tt.t AS BIGINT) AS t
      |  FROM (SELECT DISTINCT event_type FROM daily) ty,
      |       (SELECT UNNEST(range(0, 63)) AS t) tt, a0
      |  WHERE tt.t <= a0.max_t),
      |f AS MATERIALIZED (SELECT s.event_type, s.t, COALESCE(g.x, 0) AS x
      |  FROM spine s LEFT JOIN (SELECT event_type,
      |      CAST(DATEDIFF('day', a0.d0, day) AS BIGINT) AS t, x
      |    FROM daily, a0) g
      |    ON g.event_type = s.event_type AND g.t = s.t),
      |cells AS (SELECT a.event_type AS ta, b.event_type AS tb, l.lag,
      |    a.x AS xa, b.x AS xb
      |  FROM f a, (SELECT UNNEST(range(-7, 8)) AS lag) l, f b
      |  WHERE a.event_type < b.event_type AND a.t + l.lag = b.t),
      |m AS (SELECT ta, tb, lag, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(xa AS HUGEINT)) AS sx, SUM(CAST(xb AS HUGEINT)) AS sy,
      |    SUM(CAST(xa AS HUGEINT) * xb) AS sxy,
      |    SUM(CAST(xa AS HUGEINT) * xa) AS sxx,
      |    SUM(CAST(xb AS HUGEINT) * xb) AS syy
      |  FROM cells GROUP BY 1, 2, 3),
      |rv AS (SELECT ta, tb, lag, n,
      |    round(CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE) /
      |      sqrt(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE) *
      |           CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE)), 4) AS r
      |  FROM m
      |  WHERE CAST(n AS HUGEINT) * sxx - sx * sx > 0
      |    AND CAST(n AS HUGEINT) * syy - sy * sy > 0),
      |rk AS (SELECT ta, tb, lag, n, r,
      |    ROW_NUMBER() OVER (PARTITION BY ta, tb
      |                       ORDER BY r DESC, abs(lag), lag) AS rn
      |  FROM rv)
      |SELECT ta, tb, lag AS best_lag, n AS n_days, r AS best_r
      |FROM rk WHERE rn = 1 ORDER BY ta, tb""".stripMargin

  val queries: Map[String, Q] = Map(
    "q171_psi_drift" -> q171,
    "q172_ks_drift" -> q172,
    "q175_benford_audit" -> q175,
    "q183_ols_trend" -> q183,
    "q198_jsd_drift" -> q198,
    "q217_ewma_anomaly" -> q217,
    "q222_theil_sen" -> q222,
    "q224_xcorr_lag" -> q224)

  val oracle: Map[String, String] = Map(
    "q171_psi_drift" -> q171Sql,
    "q172_ks_drift" -> q172Sql,
    "q175_benford_audit" -> q175Sql,
    "q183_ols_trend" -> q183Sql,
    "q198_jsd_drift" -> q198Sql,
    "q217_ewma_anomaly" -> q217Sql,
    "q222_theil_sen" -> q222Sql,
    "q224_xcorr_lag" -> q224Sql)
}
