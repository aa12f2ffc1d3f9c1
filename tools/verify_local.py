#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <outDir> [--json FILE] [query ...]

With --json FILE, also writes a per-key record in the driver's
CORRECTNESS schema ({key: {rows_match, schema_match, hash_match, err}})
— the round's durable correctness evidence (committed as
CORRECTNESS_LOCAL.json at each gate; round-14 verdict task #3, after the
driver's own artifact landed empty).

Reads each query dump written by `graft.Verify` (outDir/<name>/*.parquet),
runs the matching oracle SQL from outDir/oracle_sql.json in DuckDB over the
sfDir parquet tables, and compares: column-name set, COLUMN TYPES (the
oracle relation's DuckDB types vs the Spark parquet types — the driver's
hash is type-sensitive, so a HUGEINT/DOUBLE widening that pandas would
silently coerce must FAIL here), row count, and values (columns sorted by
name, rows compared in emitted order, exact equality — mirroring a hash
compare). Exit code 1 if any query mismatches.
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: verify_local.py <sfDir> <outDir> [--json FILE] [query ...]",
                  file=sys.stderr)
            sys.exit(2)
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if len(argv) < 2:
        print("usage: verify_local.py <sfDir> <outDir> [--json FILE] [query ...]",
              file=sys.stderr)
        sys.exit(2)
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_fail = n_pass = n_skip = 0
    # per-key record in the driver's CORRECTNESS schema; a hard failure
    # (missing dump, oracle error, nested columns) sets err and falsifies
    # every match flag — absence of evidence is never a pass
    records = {}

    def rec(name, rows, schema, hash_, err=None):
        records[name] = {"rows_match": rows, "schema_match": schema,
                         "hash_match": hash_, "err": err}

    for name in sorted(oracles):
        if (not only or name in only) and not os.path.isdir(os.path.join(out_dir, name)):
            print(f"FAIL {name}: query produced no dump (crashed in Verify?)")
            rec(name, False, False, False, "no dump (crashed in Verify?)")
            n_fail += 1
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(path, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet written")
            rec(name, False, False, False, "no parquet written")
            n_fail += 1
            continue
        got_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        bad = nonscalar_cols(got_rel)
        if bad and name not in NONSCALAR_OK:
            # The driver's comparator sorts every output column in pandas;
            # an array/struct/map column is unhashable there and crashes
            # the harness BEFORE it records any evidence (round-7
            # agg_approx_percentile). This gate runs for no-oracle keys
            # too — exactly the class the round-7 local sweep missed.
            print(f"FAIL {name}: non-scalar output column(s) {bad}"
                  " (driver comparator cannot sort arrays; project to"
                  " scalar columns)")
            rec(name, False, False, False, f"non-scalar output column(s) {bad}")
            n_fail += 1
            continue
        got = got_rel.fetchdf()
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(got)} rows)")
            rec(name, len(got) > 0, None, None, "no-oracle (rows-only check)")
            n_skip += 1
            continue
        try:
            exp_rel = con.sql(oracles[name])
            exp_types = dict(zip(exp_rel.columns, [str(t) for t in exp_rel.types]))
            exp = exp_rel.fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            rec(name, False, False, False, f"oracle SQL error: {e}")
            n_fail += 1
            continue
        got_types = dict(zip(got_rel.columns, [str(t) for t in got_rel.types]))
        ok, msg = compare_types(got_types, exp_types)
        dim = "schema"
        if ok:
            ok, msg, dim = compare(got, exp)
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
            rec(name, True, True, True)
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            # record only what was actually verified: the comparator stops
            # at the first failing dimension, so later dimensions are
            # UNKNOWN (null), never implied passes (review finding — the
            # earlier record claimed rows_match true on a schema failure)
            if dim == "schema":
                rec(name, None, False, None, msg)
            elif dim == "rows":
                rec(name, False, True, None, msg)
            else:
                rec(name, True, True, False, msg)
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} no-oracle ==")
    if json_out:
        head = {"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                "n_no_oracle": n_skip}
        if only:
            # the Bench.json discipline: a name-filtered run marks itself
            # so a partial record can never pass as the full-suite gate
            head["filtered"] = len(only)
        head["queries"] = dict(sorted(records.items()))
        with open(json_out, "w") as f:
            json.dump(head, f, indent=1)
            f.write("\n")
        print(f"json written: {json_out}")
    sys.exit(1 if n_fail else 0)

# Keys explicitly allowed to emit nested columns (none today — keep empty
# unless the driver's comparator ever learns to sort them).
NONSCALAR_OK = set()

def nonscalar_cols(rel):
    """Column names whose DuckDB type is nested (LIST '[]', STRUCT, MAP,
    UNION) — unsortable in the driver's pandas comparator."""
    bad = []
    for c, t in zip(rel.columns, [str(t) for t in rel.types]):
        if "[]" in t or t.startswith(("STRUCT", "MAP", "UNION", "LIST")):
            bad.append(f"{c}:{t}")
    return bad

def compare_types(got_types, exp_types):
    """Fail when the oracle's DuckDB type differs from the Spark parquet
    type for any emitted column. This is what the driver's type-sensitive
    hash sees BEFORE pandas coerces (e.g. HUGEINT->float64): a windowed
    sum(BIGINT) in DuckDB widens to HUGEINT and every expression downstream
    of it inherits the widening — the values can be equal and the hash
    still mismatches (the round-5 text_pack failure)."""
    for c in sorted(set(got_types) & set(exp_types)):
        g, e = got_types[c], exp_types[c]
        if g != e:
            return False, (f"TYPE col {c}: spark-parquet={g} oracle={e}"
                           " (driver hash is type-sensitive; add a CAST"
                           " to the oracle SQL)")
    return True, ""

def compare(got, exp):
    """(ok, msg, failed_dimension) — dimension in rows/schema/hash for the
    driver-schema JSON record."""
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        return False, f"columns differ: spark={gc} oracle={ec}", "schema"
    if len(got) != len(exp):
        return False, f"row count differs: spark={len(got)} oracle={len(exp)}", "rows"
    got, exp = got[gc], exp[gc]
    for c in gc:
        gv, ev = list(got[c]), list(exp[c])
        for i, (a, b) in enumerate(zip(gv, ev)):
            if not eq(a, b):
                return False, (f"col {c} row {i}: spark={a!r} oracle={b!r}"
                               f" (types {type(a).__name__}/{type(b).__name__})"), "hash"
    return True, "", ""

def eq(a, b):
    import numpy as np
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray) \
       or isinstance(a, list) or isinstance(b, list):
        a = list(a) if a is not None else None
        b = list(b) if b is not None else None
        if a is None or b is None:
            return a is None and b is None
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)) \
       or (isinstance(b, float) and math.isnan(b)):
        na = a is None or (isinstance(a, float) and math.isnan(a))
        nb = b is None or (isinstance(b, float) and math.isnan(b))
        return na and nb
    if isinstance(a, float) or isinstance(b, float):
        return float(a) == float(b)  # exact — the driver hashes
    return a == b

if __name__ == "__main__":
    main()
