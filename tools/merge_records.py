#!/usr/bin/env python3
"""Merge per-worker correctness records into a main record file.

Concurrent check_oracle.py workers must write SEPARATE record files
(each worker holds its whole record in memory and rewrites the file
per query — two writers on one file clobber each other's entries).
This merges them back:

    python3 tools/merge_records.py CORRECTNESS_sf1.json rec_A.json rec_B.json

Rules: an incoming entry replaces the main entry for the same query.
By default only PASSING entries merge (hash_match true, or a
shape_ok/no_oracle rows entry with rows > 0) — a worker's failure
should be investigated, not silently recorded over a pass; use
--allow-fail to merge failures too (e.g. when building a fresh record
that SHOULD show a red entry). The main file is written atomically.
"""
import json, os, sys


def entry_passed(v):
    if v.get("hash_match") is True:
        return True
    # matches check_oracle.entry_passed since r14: only an explicit
    # shape-gated pass counts — bare no_oracle is not a pass anywhere
    return v.get("err") == "shape_ok" and (v.get("spark_rows") or 0) > 0


def main(argv):
    allow_fail = "--allow-fail" in argv
    paths = [a for a in argv if not a.startswith("--")]
    if len(paths) < 2:
        print(__doc__)
        return 2
    main_path, worker_paths = paths[0], paths[1:]
    record = {}
    if os.path.exists(main_path):
        record = json.load(open(main_path))
    n_in = n_skip = 0
    for wp in worker_paths:
        for k, v in json.load(open(wp)).items():
            if not allow_fail and not entry_passed(v):
                print(f"SKIP {k} from {wp}: not a pass ({v.get('err')}, "
                      f"hash_match={v.get('hash_match')}) — use --allow-fail")
                n_skip += 1
                continue
            record[k] = v
            n_in += 1
    tmp = main_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(dict(sorted(record.items())), f, indent=2)
    os.replace(tmp, main_path)
    n_pass = sum(1 for v in record.values() if entry_passed(v))
    print(f"merged {n_in} entries ({n_skip} skipped) -> {main_path}: "
          f"{len(record)} total, {n_pass} passing")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
