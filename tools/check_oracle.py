#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the sf parquet tables and hash-compare against the Spark
parquet dumps produced by graft.Verify.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [jsonOut]

With jsonOut set, also writes a CORRECTNESS_r*-shaped JSON record
(per-query rows/schema/hash match) — used for the repo's own
correctness snapshots at scales the driver doesn't run (e.g. sf1).
"""
import sys, os, json, hashlib, functools
import duckdb

print = functools.partial(print, flush=True)  # stream progress through pipes

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for row in sorted(tuple(norm(row[i]) for i in order) for row in rows):
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()

def main(sf_dir, out_dir, json_out=None):
    import os
    con = duckdb.connect()
    # CHECK_MEM / CHECK_THREADS: resource caps so several gate workers
    # can run disjoint CHECK_ONLY subsets concurrently on one machine
    # (DuckDB's defaults are 80% RAM and all cores PER PROCESS); the
    # temp dir gives capped workers a spill path instead of an OOM.
    if os.environ.get("CHECK_MEM"):
        con.execute(f"SET memory_limit='{os.environ['CHECK_MEM']}'")
        con.execute(f"SET temp_directory='/tmp/ddb_spill_{os.getpid()}'")
    if os.environ.get("CHECK_THREADS"):
        con.execute(f"SET threads={int(os.environ['CHECK_THREADS'])}")
    for t in TABLES:
        # driver sf dirs hold single files; ScaleCorpus writes Spark
        # directories of part files — glob the latter
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    full_oracle_keys = set(oracle)
    # CHECK_ONLY / CHECK_SKIP: comma-separated sql-query filters for
    # splitting a long gate run (the 10x corpus makes a handful of
    # pair-join oracles hour-scale in DuckDB); CHECK_ROWS=0 skips the
    # rows-kind section so a partial run doesn't re-pay it
    env_only = {s for s in os.environ.get("CHECK_ONLY", "").split(",") if s}
    env_skip = {s for s in os.environ.get("CHECK_SKIP", "").split(",") if s}
    if env_only:
        oracle = {k: v for k, v in oracle.items() if k in env_only}
    if env_skip:
        oracle = {k: v for k, v in oracle.items() if k not in env_skip}
    n_pass = n_fail = 0
    record = {}
    # CHECK_RESUME=1 with jsonOut: reload a prior (partial) record and
    # skip every query already in it — lets an hour-scale gate run
    # survive kills/restarts; the record is re-written after every
    # query (atomic tmp+rename) so progress is never lost.
    if json_out and os.environ.get("CHECK_RESUME") == "1" \
            and os.path.exists(json_out):
        record = json.load(open(json_out))
        done = set(record)
        oracle = {k: v for k, v in oracle.items() if k not in done}
        print(f"resume: {len(done)} entries already recorded, "
              f"{len(oracle)} sql queries remaining")
    def flush_record():
        if json_out:
            tmp = json_out + ".tmp"
            with open(tmp, "w") as f:
                json.dump(dict(sorted(record.items())), f, indent=2)
            os.replace(tmp, json_out)
    def rec(name, rows_m, schema_m, hash_m, s_rows, o_rows, err):
        record[name] = {"rows_match": rows_m, "schema_match": schema_m,
                        "hash_match": hash_m, "spark_rows": s_rows,
                        "oracle_rows": o_rows, "err": err}
        flush_record()
    # Pre-flight dtype guard: every oracle output column must be
    # BIGINT or VARCHAR (repo rule — HUGEINT window sums and floats are
    # exactly the class that hash-diverges across DuckDB versions, see
    # the r10 q_decile_lift incident). Warning, not failure: the
    # driver's gate doesn't run this file, so this is our tripwire.
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute(f"DESCRIBE SELECT * FROM ({sql})").fetchall()
            odd = [(r[0], r[1]) for r in desc if r[1] not in ("BIGINT", "VARCHAR")]
            if odd:
                print(f"DTYPE {name}: non-BIGINT/VARCHAR oracle columns {odd}")
        except Exception:
            pass  # the main loop reports oracle errors properly
    import time
    for name, sql in sorted(oracle.items()):
        t_q = time.time()
        try:
            res = con.execute(sql)
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
            # surface where gate time goes — the all-pairs oracles are
            # hour-scale on a 10x corpus and worth seeing coming
            if time.time() - t_q > 10:
                print(f"SLOW {name}: oracle took {time.time()-t_q:.0f}s")
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            rec(name, None, None, None, None, None, f"oracle error: {e}")
            n_fail += 1
            continue
        try:
            res2 = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols = [d[0] for d in res2.description]
            s_rows = res2.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            rec(name, None, None, None, None, len(o_rows), f"spark output unreadable: {e}")
            n_fail += 1
            continue
        if sorted(o_cols) != sorted(s_cols):
            print(f"FAIL {name}: cols oracle={sorted(o_cols)} spark={sorted(s_cols)}")
            rec(name, len(o_rows) == len(s_rows), False, None, len(s_rows), len(o_rows), None)
            n_fail += 1
            continue
        if len(o_rows) != len(s_rows):
            print(f"FAIL {name}: rows oracle={len(o_rows)} spark={len(s_rows)}")
            rec(name, False, True, None, len(s_rows), len(o_rows), None)
            n_fail += 1
            continue
        ho, hs = table_hash(o_cols, o_rows), table_hash(s_cols, s_rows)
        if ho != hs:
            print(f"FAIL {name}: hash mismatch ({len(o_rows)} rows)")
            order_o = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
            order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            so = sorted(tuple(norm(r[i]) for i in order_o) for r in o_rows)
            ss = sorted(tuple(norm(r[i]) for i in order_s) for r in s_rows)
            shown = 0
            names = [o_cols[i] for i in order_o]
            for a, b in zip(so, ss):
                if a != b and shown < 3:
                    diff = [names[i] for i in range(len(a)) if a[i] != b[i]]
                    print(f"   oracle: {a}\n   spark : {b}\n   differs in: {diff}")
                    shown += 1
            rec(name, True, True, False, len(s_rows), len(o_rows), None)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(o_rows)} rows)")
            rec(name, True, True, True, len(s_rows), len(o_rows), None)
            n_pass += 1
    # rows-only queries: non-empty, plus the structural gates from
    # rows_checks.json (SQL over view `result`; any returned row is a
    # named violation, zero rows = pass)
    import os
    try:
        checks = json.load(open(f"{out_dir}/rows_checks.json"))
    except FileNotFoundError:
        checks = {}
    if os.environ.get("CHECK_ROWS", "1") == "0":
        checks, rows_dirs = {}, []
    else:
        rows_dirs = sorted(os.listdir(out_dir))
    for name in rows_dirs:
        path = os.path.join(out_dir, name)
        if name in record:  # already recorded by a resumed prior run
            continue
        if os.path.isdir(path) and name not in full_oracle_keys:
            n = con.execute(f"SELECT count(*) FROM '{path}/*.parquet'").fetchone()[0]
            if n == 0:
                print(f"EMPTY! {name}: 0 rows (no oracle)")
                rec(name, None, None, None, 0, None, "no_oracle")
                n_fail += 1
                continue
            if name not in checks:
                print(f"ROWS {name}: {n} rows (no oracle, no shape check)")
                rec(name, None, None, None, n, None, "no_oracle")
                continue
            con.execute("DROP VIEW IF EXISTS result")
            con.execute(f"CREATE VIEW result AS SELECT * FROM '{path}/*.parquet'")
            try:
                viol = con.execute(checks[name]).fetchall()
            except Exception as e:
                print(f"FAIL {name}: rows-check error: {e}")
                rec(name, None, None, None, n, None, f"rows-check error: {e}")
                n_fail += 1
                continue
            if viol:
                named = sorted({v[0] for v in viol})
                print(f"FAIL {name}: {len(viol)} shape violations ({named}) "
                      f"e.g. {viol[:3]}")
                rec(name, None, None, None, n, None,
                    f"shape violations: {named}")
                n_fail += 1
            else:
                print(f"ROWS {name}: {n} rows (shape-checked: ok)")
                rec(name, None, None, None, n, None, "no_oracle")
                n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(dict(sorted(record.items())), f, indent=2)
        print(f"wrote {json_out} ({len(record)} entries)")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
