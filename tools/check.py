#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads the parquet
dumps written by graft.Verify, runs each oracle_sql.json query in
DuckDB over the same sf dir, and compares (columns sorted by name,
rows sorted, values stringified). Usage:
    python3 tools/check.py <verifyOutDir> <sfDir> [--exact] [--budget[=SEC]]
"""
import json, os, sys, math, time
import duckdb

# --exact: compare float values bit-for-bit (repr, no 9-dp rounding) —
# simulates the driver's strict hash, which is what flagged the
# CORRECTNESS_r02 t_sessionize accumulation-order mismatch that the
# default rounded compare masked.
EXACT = "--exact" in sys.argv

# --budget[=SEC]: oracle-cost gate (VERDICT r11 #2). The r11 s_mmr
# oracle was a DuckDB CTE-inlining plan bomb (~20 min, OOM at 8 GiB)
# that stalled the driver's whole correctness run and zeroed the
# round's hard signal. With --budget, each oracle's DuckDB wall time
# is measured and any single oracle over SEC (default 20 s at sf0.01),
# or a suite total over SUITE_BUDGET, counts as bad — so a bomb fails
# THIS gate loudly instead of the driver's silently.
BUDGET = None
SUITE_BUDGET = 90.0
for a in sys.argv[1:]:
    if a == "--budget":
        BUDGET = 20.0
    elif a.startswith("--budget="):
        BUDGET = float(a.split("=", 1)[1])

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): vals.append("nan")
                elif EXACT: vals.append(repr(v))
                else: vals.append(repr(round(v, 9)))
            elif isinstance(v, bytes): vals.append(v.hex())
            elif isinstance(v, list): vals.append(json.dumps(v, default=str))
            else: vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out), [cols[i] for i in order]

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table (ScaleUp) = a dir of parts
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    dumped = set()
    oracle_secs = {}
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d): continue
        dumped.add(name)
        got = con.execute(f"SELECT * FROM '{d}/*.parquet'")
        grows, gcols = got.fetchall(), [c[0] for c in got.description]
        if name not in oracles:
            ok = len(grows) > 0
            if ok: n_ok += 1
            else: n_bad += 1
            print(f"  {name:24s} rows-only: {len(grows)} rows "
                  f"{'OK' if ok else 'EMPTY!'}")
            continue
        try:
            t0 = time.time()
            exp = con.execute(oracles[name])
            erows, ecols = exp.fetchall(), [c[0] for c in exp.description]
            oracle_secs[name] = time.time() - t0
        except Exception as e:
            print(f"  {name:24s} ORACLE SQL ERROR: {e}"); n_bad += 1; continue
        if BUDGET is not None and oracle_secs[name] > BUDGET:
            print(f"  {name:24s} ORACLE OVER BUDGET: "
                  f"{oracle_secs[name]:.1f}s > {BUDGET:.0f}s")
            n_bad += 1; continue
        # TYPE parity: the driver's hasher distinguishes duck's widened
        # types (window sum(INTEGER) -> HUGEINT) from the Spark dump's
        # BIGINT even when every VALUE matches — the r03 t_sessionize
        # red row, invisible to the str()-compare below. Flag any
        # oracle column outside the Spark-representable set.
        OKT = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
               "FLOAT", "VARCHAR", "TIMESTAMP", "DATE", "BOOLEAN"}
        def type_ok(t):
            # strip list nesting and check the ELEMENT type too — a
            # widened HUGEINT[] is exactly the hazard this check exists
            # to catch (ADVICE r4)
            t = str(t)
            while t.endswith("[]"):
                t = t[:-2]
            return t in OKT
        badt = [(c, str(t)) for c, t in
                zip(con.sql(oracles[name]).columns, con.sql(oracles[name]).types)
                if not type_ok(t)]
        if badt:
            print(f"  {name:24s} ORACLE TYPE HAZARD (driver-hash-visible): {badt}")
            n_bad += 1; continue
        g, gc = canon(grows, gcols)
        e, ec = canon(erows, ecols)
        if gc != ec:
            print(f"  {name:24s} SCHEMA MISMATCH spark={gc} duck={ec}"); n_bad += 1
        elif g != e:
            n_bad += 1
            print(f"  {name:24s} VALUE MISMATCH ({len(g)} vs {len(e)} rows)")
            sg, se = set(g), set(e)
            for x in list(sg - se)[:3]: print(f"    spark-only: {x}")
            for x in list(se - sg)[:3]: print(f"    duck-only : {x}")
        else:
            n_ok += 1
            print(f"  {name:24s} OK ({len(g)} rows)")
    # Diff against the FULL inventory (queries.json) when available, so
    # a rows-only query that crashed before writing output is counted
    # too — not just oracle-backed ones (ADVICE r2 #5).
    inv_path = f"{outdir}/queries.json"
    inventory = set(json.load(open(inv_path))) if os.path.exists(inv_path) \
        else set(oracles)
    missing = inventory - dumped
    for name in sorted(missing):
        print(f"  {name:24s} NO DUMP (query crashed before writing output)")
        n_bad += 1
    if BUDGET is not None and oracle_secs:
        total = sum(oracle_secs.values())
        slow = sorted(oracle_secs.items(), key=lambda kv: -kv[1])[:5]
        print(f"  [budget] oracle suite {total:.1f}s "
              f"(limit {SUITE_BUDGET:.0f}s); slowest: "
              + ", ".join(f"{k}={v:.1f}s" for k, v in slow))
        if total > SUITE_BUDGET:
            print(f"  [budget] SUITE OVER BUDGET")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sys.exit(main(args[0], args[1]))
