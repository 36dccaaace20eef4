#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the sf parquet tables and hash-compare against the Spark
parquet dumps produced by graft.Verify.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [jsonOut]

With jsonOut set, also writes a CORRECTNESS_r*-shaped JSON record
(per-query rows/schema/hash match) — used for the repo's own
correctness snapshots at scales the driver doesn't run (e.g. sf1).

Env knobs: CHECK_ONLY / CHECK_SKIP (query-name filters), CHECK_ROWS=0
(skip the rows-kind section), CHECK_MEM / CHECK_THREADS (DuckDB caps
for concurrent shard workers), CHECK_RESUME=1 (reload jsonOut, skip
recorded PASSES, re-run failures), CHECK_SAMPLE=<seed>:<permille>
(stratified-sample the all-pairs oracle family — see SAMPLE_SPECS).
"""
import sys, os, json, hashlib, functools
import duckdb

print = functools.partial(print, flush=True)  # stream progress through pipes

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# CHECK_SAMPLE=<seed>:<permille> — stratified-sample oracle mode for the
# all-pairs oracle family, whose full DuckDB cost is O(n^2) per source
# and hour-scale on a 10x corpus (seconds on the engine side). For the
# queries below, BOTH sides are restricted to the same deterministic
# hash-sampled subset and compared bit-exact; everything else still runs
# the full oracle. Two sampling units, chosen so the restriction is
# EXACT (not approximate):
#   doc    — pair-decomposable outputs (a pair is in the result iff
#            sim(a,b) clears the threshold, independent of other docs):
#            oracle runs on hash-sampled doc_ids, engine result filtered
#            to pairs with BOTH endpoints sampled.
#   source — graph-closed outputs (clusters/BFS never span sources —
#            every pair join carries a.source = b.source): oracle runs
#            on whole hash-sampled sources, engine result filtered to
#            docs of those sources.
# NOT sampleable (excluded on purpose): dedup_cluster_sizes and
# dedup_threshold_sweep aggregate over ALL clusters/pairs — a subset
# changes the histogram, so they keep the full oracle (their recursive
# CC over banded edges is also far cheaper than the pair-sim family).
# Sampled passes are recorded with a "sampled" field so a sampled gate
# can never masquerade as a full one.
SAMPLE_SPECS = {
    "dedup_jaccard_global": ("doc", ["doc_a", "doc_b"]),
    "dedup_ngram_jaccard": ("doc", ["doc_a", "doc_b"]),
    "dedup_levenshtein": ("doc", ["doc_a", "doc_b"]),
    "dedup_containment": ("doc", ["doc_a", "doc_b"]),
    "dedup_jaccard_prefix": ("doc", ["doc_a", "doc_b"]),
    "dedup_cluster": ("source", ["doc_id"]),
    "dedup_cluster_star": ("source", ["doc_id"]),
    "graph_bfs_dist": ("source", ["doc_id"]),
    "graph_degree_dist": ("source", ["doc_id"]),
    # r14: neighbor-set jaccard and clustering coefficient are
    # graph-closed (candidates never span sources), so whole-source
    # strata restrict them exactly
    "graph_neighbor_jaccard": ("source", ["doc_a", "doc_b"]),
    "graph_clustering_coeff": ("source", ["doc_id"]),
    # r14 wave 4: Adamic–Adar is graph-closed like neighbor_jaccard
    # (weights derive from degrees INSIDE the source's candidate
    # subgraph — edges never span sources, so whole-source strata
    # restrict it exactly). graph_assortativity is NOT sampleable (one
    # global moment row — any stratum changes it) and keeps the full
    # oracle.
    "graph_adamic_adar": ("source", ["doc_a", "doc_b"]),
}

def sample_preds(unit, cols, seed, permille):
    """(base-table predicate over documents, result predicate)."""
    if unit == "doc":
        base = f"hash(doc_id + {seed}) % 1000 < {permille}"
        res = " AND ".join(
            f"hash({c} + {seed}) % 1000 < {permille}" for c in cols)
    else:  # whole-source strata
        base = f"hash(source || ':{seed}') % 1000 < {permille}"
        res = " AND ".join(
            f"{c} IN (SELECT doc_id FROM documents_full WHERE {base})"
            for c in cols)
    return base, res

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
        # stable alias that CHECK_SAMPLE never rebinds — result-side
        # predicates and view restoration go through it
        con.execute(f"CREATE VIEW {t}_full AS SELECT * FROM '{src}'")
    sample = None  # (seed, permille) when CHECK_SAMPLE=<seed>:<permille>
    if os.environ.get("CHECK_SAMPLE"):
        seed_s, p_s = os.environ["CHECK_SAMPLE"].split(":")
        sample = (int(seed_s), int(p_s))
        for unit in sorted({u for u, _ in SAMPLE_SPECS.values()}):
            base, _ = sample_preds(unit, [], *sample)
            kept, tot = con.execute(
                "SELECT count(*) FILTER (WHERE " + base + "), count(*) "
                "FROM documents_full").fetchone()
            print(f"SAMPLE unit={unit}: predicate keeps {kept}/{tot} docs"
                  + (" — EMPTY STRATUM, gate would pass vacuously; pick "
                     "another seed" if kept == 0 else ""))
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
    # skip every PASSED query already in it — lets an hour-scale gate
    # run survive kills/restarts; the record is re-written after every
    # query (atomic tmp+rename) so progress is never lost. Recorded
    # FAILURES are never skipped (they re-run if in scope, and any left
    # standing count into the exit code below) — a resumed run must not
    # print green over a red record.
    def entry_passed(v):
        if v.get("hash_match") is True:
            return True
        # rows-kind: only an explicit shape-gated pass counts. A bare
        # "no_oracle" (non-empty but never shape-checked) is NOT a
        # pass: it re-runs on resume and keeps the gate red until a
        # shape gate exists for it (r13 verdict #4 — zero legacy
        # records remain, so the old treat-as-clean grandfathering is
        # retired).
        return v.get("err") == "shape_ok" and (v.get("spark_rows") or 0) > 0
    if json_out and os.environ.get("CHECK_RESUME") == "1" \
            and os.path.exists(json_out):
        record = json.load(open(json_out))
        passed = {k for k, v in record.items() if entry_passed(v)}
        prior_failed = set(record) - passed
        oracle = {k: v for k, v in oracle.items() if k not in passed}
        print(f"resume: {len(passed)} passed entries kept, "
              f"{len(prior_failed)} recorded failures will re-run if in "
              f"scope, {len(oracle)} sql queries remaining")
    def flush_record():
        if json_out:
            tmp = json_out + ".tmp"
            with open(tmp, "w") as f:
                json.dump(dict(sorted(record.items())), f, indent=2)
            os.replace(tmp, json_out)
    def rec(name, rows_m, schema_m, hash_m, s_rows, o_rows, err,
            sampled=None):
        record[name] = {"rows_match": rows_m, "schema_match": schema_m,
                        "hash_match": hash_m, "spark_rows": s_rows,
                        "oracle_rows": o_rows, "err": err}
        if sampled:
            record[name]["sampled"] = sampled
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
        tag = None  # "<seed>:<permille>" when this query ran sampled
        spark_sql = f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
        if sample and name in SAMPLE_SPECS:
            unit, cols = SAMPLE_SPECS[name]
            base, res_pred = sample_preds(unit, cols, *sample)
            tag = f"{sample[0]}:{sample[1]}"
            spark_sql += f" WHERE {res_pred}"
            con.execute("CREATE OR REPLACE VIEW documents AS "
                        f"SELECT * FROM documents_full WHERE {base}")
        try:
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
                rec(name, None, None, None, None, None,
                    f"oracle error: {e}", tag)
                n_fail += 1
                continue
        finally:
            if tag:  # rebind the view back for every later query
                con.execute("CREATE OR REPLACE VIEW documents AS "
                            "SELECT * FROM documents_full")
        try:
            res2 = con.execute(spark_sql)
            s_cols = [d[0] for d in res2.description]
            s_rows = res2.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            rec(name, None, None, None, None, len(o_rows),
                f"spark output unreadable: {e}", tag)
            n_fail += 1
            continue
        if sorted(o_cols) != sorted(s_cols):
            print(f"FAIL {name}: cols oracle={sorted(o_cols)} spark={sorted(s_cols)}")
            rec(name, len(o_rows) == len(s_rows), False, None, len(s_rows), len(o_rows), None, tag)
            n_fail += 1
            continue
        if len(o_rows) != len(s_rows):
            print(f"FAIL {name}: rows oracle={len(o_rows)} spark={len(s_rows)}")
            rec(name, False, True, None, len(s_rows), len(o_rows), None, tag)
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
            rec(name, True, True, False, len(s_rows), len(o_rows), None, tag)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(o_rows)} rows"
                  + (f", sampled {tag}" if tag else "") + ")")
            rec(name, True, True, True, len(s_rows), len(o_rows), None, tag)
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
        # skip only what a resumed prior run recorded as PASSING —
        # recorded failures re-run
        if name in record and entry_passed(record[name]):
            continue
        if os.path.isdir(path) and name not in full_oracle_keys:
            n = con.execute(f"SELECT count(*) FROM '{path}/*.parquet'").fetchone()[0]
            if n == 0:
                print(f"EMPTY! {name}: 0 rows (no oracle)")
                rec(name, None, None, None, 0, None, "no_oracle")
                n_fail += 1
                continue
            if name not in checks:
                # every rows-kind query must carry a structural gate —
                # a non-empty dump nobody checked is a red entry, not a
                # weaker pass (the driver's own gate may grade it
                # rows-only; this tool holds the stricter line)
                print(f"FAIL {name}: {n} rows but NO shape check registered "
                      "in SparkEntry.rowsChecks")
                rec(name, None, None, None, n, None, "no_oracle")
                n_fail += 1
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
                # distinct marker: a shape-gated pass must be provable
                # from the record alone; bare "no_oracle" now means
                # exactly "non-empty but no shape check exists"
                rec(name, None, None, None, n, None, "shape_ok")
                n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(dict(sorted(record.items())), f, indent=2)
        print(f"wrote {json_out} ({len(record)} entries)")
        # exit code covers the WHOLE record, not just this session's
        # queries: failures carried in by CHECK_RESUME (out of scope of
        # a CHECK_ONLY shard, or simply not re-run) must keep the gate
        # red until something re-runs them green.
        rec_fail = [k for k, v in record.items() if not entry_passed(v)]
        if rec_fail and not n_fail:
            print(f"record still holds {len(rec_fail)} failing entries: "
                  f"{sorted(rec_fail)[:10]}")
        return 1 if (n_fail or rec_fail) else 0
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
