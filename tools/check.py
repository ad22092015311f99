#!/usr/bin/env python3
"""Local stand-in for the driver's t2 DuckDB-oracle gate.

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"`,
run `python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out`.

For each query dir under outDir: load the Spark parquet result, run the
matching oracle SQL in DuckDB over views of the testdata parquet, sort
columns by name, sort rows, and compare STRINGIFIED cells exactly.

This deliberately mirrors the DRIVER's hash semantics, not pandas
comparison semantics:
  - an array/map-typed output column is a HARD ERROR (the driver's
    pandas canonicalizer dies on `numpy.ndarray: unhashable` — round-5
    shipped 4 such queries believing them green because this script
    used to tuple-normalize arrays);
  - no numeric coercion: 4.0 (DOUBLE) vs 4 (BIGINT) is a MISMATCH
    even though the values compare equal (the driver hashes the
    rendered value — round-5's diag_skew_report failed exactly here).
Local green must predict driver green.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np


class ArrayColumnError(Exception):
    pass


def canon(df: pd.DataFrame, name: str, side: str) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            if df[c].map(lambda v: isinstance(
                    v, (list, tuple, dict, np.ndarray))).any():
                raise ArrayColumnError(
                    f"{side} column '{c}' is array/map-typed — the "
                    "driver's canonicalizer cannot hash it; serialize "
                    "with array_join / string_agg")
    if len(df.columns) and len(df):
        df = df.sort_values(by=list(df.columns),
                            kind="mergesort").reset_index(drop=True)
    # Stringify exactly (no coercion): what the driver hashes.
    return df.astype(object).where(df.notna(), None).map(
        lambda v: "<NULL>" if v is None else str(v))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    # optional resource caps for large-SF sweeps sharing the machine
    thr = os.environ.get("GRAFT_DUCKDB_THREADS")
    if thr:
        con.execute(f"SET threads={int(thr)}")
    mem = os.environ.get("GRAFT_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    # spill OUTSIDE the repo (DuckDB's default temp dir is <cwd>/.tmp —
    # a corpus-squared oracle at sf1 once dumped 60+ GB there and a
    # concurrent `git add -A` tried to pack it), and cap it so an
    # out-of-core oracle fails loudly instead of filling the disk
    con.execute("SET temp_directory='/tmp/graft_duckdb_spill'")
    # default 40GiB; GRAFT_DUCKDB_TEMP raises it for a supervised
    # adjudication run (watch df) — never in unattended sweeps
    con.execute("SET max_temp_directory_size='%s'"
                % os.environ.get("GRAFT_DUCKDB_TEMP", "40GiB"))
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            # driver testdata = single parquet FILES; ScaleUp output =
            # Spark DIRECTORIES of part files — glob those
            pat = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # scan_provenance's registered oracle hard-codes the DRIVER's
    # single-file layout (file_name = 'documents.parquet', row_index =
    # doc_id) — correct at the driver gate, wrong for ScaleUp output,
    # which is a Spark DIRECTORY of part files. When documents is a
    # directory, verify the SAME per-file provenance semantics with
    # DuckDB's filename + file_row_number (VERDICT r10 task 6): both
    # engines then report per-part row counts, per-file row indexes,
    # and the row_index==doc_id alignment count from first principles.
    doc_path = f"{sf_dir}/documents.parquet"
    if "scan_provenance" in oracles and os.path.isdir(doc_path):
        oracles["scan_provenance"] = f"""
          SELECT parse_filename(filename) AS file_name,
            count(*) AS n_rows,
            CAST(sum(CASE WHEN file_row_number = doc_id
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_aligned,
            CAST(min(file_row_number) AS BIGINT) AS min_idx,
            CAST(max(file_row_number) AS BIGINT) AS max_idx
          FROM read_parquet('{doc_path}/*.parquet',
                            filename=true, file_row_number=true)
          GROUP BY 1 ORDER BY 1"""
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no spark output"); n_fail += 1; continue
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        try:
            g = canon(got, name, "spark")
        except ArrayColumnError as e:
            print(f"FAIL  {name}: {e}"); n_fail += 1; continue
        if name not in oracles:
            print(f"skip  {name}: no oracle ({len(got)} rows)")
            n_noracle += 1
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1; continue
        try:
            e = canon(exp, name, "oracle")
        except ArrayColumnError as ex:
            print(f"FAIL  {name}: {ex}"); n_fail += 1; continue
        if list(g.columns) != list(e.columns):
            print(f"FAIL  {name}: cols {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL  {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1; continue
        neq = (g != e)
        if neq.to_numpy().any():
            bad = neq.any(axis=1)
            i = bad.idxmax()
            print(f"FAIL  {name}: value mismatch at sorted row {i}:")
            print(f"      spark: {g.loc[i].to_dict()}")
            print(f"      duck : {e.loc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"pass  {name} ({len(g)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
