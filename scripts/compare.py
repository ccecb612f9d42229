#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (driver-side tooling, not
part of the Spark library): run graft.Verify first, then this script.

  python3 scripts/compare.py <sfDir> <verifyOutDir>

For each query result parquet in <verifyOutDir>/<name>/, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sfDir tables and compares
row count, column names, and a value hash over column-name-sorted, row-sorted
string-rendered values (mirrors "sorts columns by name before hashing").
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

def canon(rows, cols):
    # column-name-sorted, row-sorted, stringified (floats via repr of
    # round-trip double so both engines render identically)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(render(r[i]) for i in order))
    out.sort()
    return out

def render(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(render(x) for x in v) + "]"
    return str(v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # Self-evidencing guard: an empty oracle map, or a key set that
    # disagrees with the Verify-written manifest, means the correctness
    # signal is broken upstream (truncated artifact, partial run) — refuse
    # loudly instead of emitting a vacuous "0/0 pass".
    if not oracle:
        print("REFUSED: oracle_sql.json is empty — Verify did not complete "
              "or its output was truncated; this is a harness fault, not a "
              "per-query failure")
        return 2
    man_path = os.path.join(out_dir, "manifest.json")
    if os.path.exists(man_path):
        man = json.load(open(man_path))
        man_keys = set(man.get("keys", {}))
        effective = set(oracle) & only if only else set(oracle)
        if only is None and effective != man_keys:
            print(f"REFUSED: oracle_sql.json has {len(effective)} keys but "
                  f"manifest.json recorded {len(man_keys)} — the two "
                  f"artifacts disagree (diff: "
                  f"{sorted(effective ^ man_keys)[:10]})")
            return 2
        if only is not None and not effective <= man_keys:
            print(f"REFUSED: requested keys not in the Verify manifest: "
                  f"{sorted(effective - man_keys)[:10]}")
            return 2
        print(f"manifest cross-check: {man.get('written')} written / "
              f"{len(man.get('failed', []))} failed of "
              f"{man.get('total_queries')} queries"
              + (f"; FAILED={man['failed']}" if man.get("failed") else ""))
    else:
        print("note: no manifest.json in the verify dir (pre-r13 dump) — "
              "key-set cross-check skipped")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        # testdata tables are single files; Spark-written ones (e.g. the
        # ScaleUp sf1 rehearsal dirs) are directories of part files
        p = os.path.join(sf_dir, f"{t}.parquet")
        pat = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    results = {}
    for name in sorted(oracle):
        if only and name not in only:
            continue
        res = {"rows_match": False, "cols_match": False, "hash_match": False,
               "err": None}
        try:
            files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
            if not files:
                raise RuntimeError("no spark result parquet")
            tbl = pq.read_table(files[0])
            s_cols = list(tbl.column_names)
            s_rows = [tuple(d[c] for c in s_cols) for d in tbl.to_pylist()]
            cur = con.execute(oracle[name])
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
            res["spark_rows"], res["oracle_rows"] = len(s_rows), len(o_rows)
            res["rows_match"] = len(s_rows) == len(o_rows)
            res["cols_match"] = sorted(s_cols) == sorted(o_cols)
            if res["rows_match"] and res["cols_match"]:
                cs, co = canon(s_rows, s_cols), canon(o_rows, o_cols)
                res["hash_match"] = cs == co
                if not res["hash_match"]:
                    diff = [(a, b) for a, b in zip(cs, co) if a != b][:3]
                    res["first_diffs"] = [
                        {"spark": list(a), "oracle": list(b)} for a, b in diff]
            elif not res["cols_match"]:
                res["spark_cols"], res["oracle_cols"] = s_cols, o_cols
        except Exception as e:
            res["err"] = str(e)[:500]
        results[name] = res
        ok = res["rows_match"] and res["cols_match"] and res["hash_match"]
        print(("PASS " if ok else "FAIL ") + name +
              ("" if ok else " " + json.dumps(
                  {k: v for k, v in res.items() if k != "first_diffs"})))
        if "first_diffs" in res:
            print("  first_diffs:", json.dumps(res["first_diffs"])[:600])
    n_ok = sum(1 for r in results.values()
               if r["rows_match"] and r["cols_match"] and r["hash_match"])
    print(f"== {n_ok}/{len(results)} pass")
    return 0 if n_ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main())
