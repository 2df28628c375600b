"""Integer-moment overflow headroom probe (round 9, VERDICT r8 task 1).

For every query whose statistic is built from exact integer moments,
measure the DOMINANT integer term's magnitude at the bench corpus
(sf0.1 by default, DuckDB — no Spark session needed) and report the
DATA-SCALE headroom to that term's container ceiling, accounting for
the term's growth law: a term growing ~n^k has data headroom
(ceiling / value)^(1/k), not ceiling / value. Emits a markdown table
for SCALE.md.

The ANSI sweep (tools/ansi_sweep.py) is the runtime tripwire — Spark
raises instead of wrapping when ansi.enabled=true; this probe is the
forward-looking complement that says how far past the bench corpus
each formulation stays exact.
"""

from __future__ import annotations

import os

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
I64 = float(2**63 - 1)
D38 = float(10**38 - 1)


def main() -> None:
    con = duckdb.connect()
    for t in ("lineitem", "events", "embeddings"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT *"
            f" FROM '{SF_DIR}/{t}.parquet'"
        )

    probes = []

    # Welch twins: per-arm n*ss (was BIGINT pre-round-9, now
    # DECIMAL(38,0)); quadratic in data scale
    (nss,) = con.sql("""
        WITH g AS (
          SELECT count(*)::HUGEINT AS n,
                 sum(CAST(round(value*100) AS BIGINT)
                     * CAST(round(value*100) AS BIGINT)) AS ss
          FROM events WHERE event_type IN ('click','view')
          GROUP BY event_type)
        SELECT max(n * ss) FROM g
    """).fetchone()
    probes.append(("events_welch_ttest / stream_welch_ttest",
                   "max arm n*ss", float(nss), 2, D38, "DECIMAL(38,0)"))
    probes.append(("  (pre-round-9 BIGINT tree, for the record)",
                   "max arm n*ss", float(nss), 2, I64, "int64"))

    # Pearson corr matrix: dominant co-moment * n (price^2 arm);
    # quadratic
    (cm,) = con.sql("""
        WITH b AS (SELECT CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)
                          AS p FROM lineitem)
        SELECT count(*)::HUGEINT * sum(p::HUGEINT * p) FROM b
    """).fetchone()
    probes.append(("lineitem_corr_matrix", "n * sum(price_cents^2)",
                   float(cm), 2, D38, "DECIMAL(38,0)"))

    # OLS regression: |num| * 1e6 (slope ppm scaling), per returnflag
    # group; quadratic
    (reg,) = con.sql("""
        WITH b AS (SELECT l_returnflag,
                          CAST(l_quantity AS BIGINT) AS x,
                          CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)
                          AS y FROM lineitem),
        g AS (SELECT count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx,
                     sum(y)::HUGEINT AS sy, sum(x::HUGEINT * y) AS sxy
              FROM b GROUP BY l_returnflag)
        SELECT max(abs(sxy*n - sx*sy)) * 1000000 FROM g
    """).fetchone()
    probes.append(("lineitem_regression_metrics", "max |num| * 1e6",
                   float(reg), 2, D38, "DECIMAL(38,0)"))

    # Spearman (round-9 centered form): co-moments on crx = rx - (n+1)
    # doubled ranks -> ~n^3 growth (was ~4n^4 uncentered — the r8
    # suite's steepest tree at only ~2x margin past 100 TB)
    (sp,) = con.sql("""
        WITH b AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                          CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)
                          AS y FROM lineitem),
        xr AS (SELECT x, 2*(sum(c) OVER (ORDER BY x) - c) + c + 1 AS rx
               FROM (SELECT x, count(*)::BIGINT AS c FROM b GROUP BY x)),
        yr AS (SELECT y, 2*(sum(c) OVER (ORDER BY y) - c) + c + 1 AS ry
               FROM (SELECT y, count(*)::BIGINT AS c FROM b GROUP BY y)),
        r AS (SELECT rx - (SELECT count(*)+1 FROM b) AS cx,
                     ry - (SELECT count(*)+1 FROM b) AS cy
              FROM b JOIN xr USING (x) JOIN yr USING (y))
        SELECT greatest(abs(sum(cx::HUGEINT * cy)),
                        sum(cx::HUGEINT * cx), sum(cy::HUGEINT * cy))
        FROM r
    """).fetchone()
    probes.append(("lineitem_spearman", "max centered co-moment",
                   float(sp), 3, D38, "DECIMAL(38,0), centered ranks"))

    # Gram matrix: largest accumulated cell of sum(q_i*q_j) over the
    # 16 sliced dims, q = floor(x*1000); linear in rows
    (gm,) = con.sql("""
        WITH q AS (SELECT [CAST(floor(x*1000) AS BIGINT)
                           FOR x IN embedding[1:16]] AS q
                   FROM embeddings WHERE len(embedding) >= 16)
        SELECT max(s) FROM (
          SELECT sum(abs(q[i]::HUGEINT * q[i])) AS s
          FROM q, range(1, 17) t(i) GROUP BY i)
    """).fetchone()
    probes.append(("embedding_gram_matrix", "max |sum q_i*q_j| cell",
                   float(gm), 1, I64, "int64 (numpy + long sum)"))

    # Kendall tau: pair count after the round-9 corpus-adaptive
    # modulus — PINNED ~ (3k)^2/2 at any SF (growth exponent ~0)
    (kp,) = con.sql("""
        WITH s AS (SELECT 1 FROM lineitem
                   WHERE l_orderkey %
                         greatest(199, (SELECT count(*) FROM lineitem)
                                        // 3000) = 0)
        SELECT count(*)::HUGEINT * (count(*) - 1) / 2 FROM s
    """).fetchone()
    probes.append(("lineitem_kendall_tau", "sampled i<j pair count",
                   float(kp), 0, I64, "int64 (pinned sample)"))

    # Mann-Kendall: var18 ~ nd^3 in DAYS, which grow with calendar
    # time, not data volume
    (mk,) = con.sql("""
        WITH d AS (SELECT date_trunc('day', ts) AS d FROM events GROUP BY 1)
        SELECT n*(n-1)*(2*n+5) FROM (SELECT count(*)::HUGEINT AS n FROM d)
    """).fetchone()
    probes.append(("events_mann_kendall", "18*Var(S) ~ days^3",
                   float(mk), 0, I64, "int64 (days, not data, scale)"))

    print(f"probe corpus: {SF_DIR}\n")
    print("| query | dominant term | value at bench | growth | container "
          "| data-scale headroom |")
    print("|---|---|---|---|---|---|")
    for name, term, val, k, ceil, container in probes:
        if k == 0:
            head = "constant in data scale"
        else:
            head = f"~{(ceil / val) ** (1.0 / k):,.0f}x"
        print(f"| {name} | {term} | {val:.2e} | n^{k if k else '0'} |"
              f" {container} | {head} |")


if __name__ == "__main__":
    main()
