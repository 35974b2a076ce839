#!/usr/bin/env python3
"""Scale-path oracle for cluster-election dumps (q37/q78 family).

The DuckDB recursive-CTE oracle for connected components cannot scale:
at sf10 the `reach` transitive closure spilled >77 GB and died on disk
(r12, solo run — see BENCH_NOTES_r12). But the PAIR dumps hash-pass the
DuckDB gate at sf10, and cluster election is exactly connected
components over those verified pairs — so an exact driver-side
union-find over the verified pair dump is an independent oracle with
no SQL closure at all.

Usage: python3 tools/check_components.py <pairs_glob> <clusters_glob> \
         [pair_cols a,b] [cluster_cols id,label]
e.g.   python3 tools/check_components.py \
         'tmp/verify_sf10/q25_minhash_lsh/*.parquet' \
         'tmp/verify_sf10/q37_dedup_clusters/*.parquet'
Exits non-zero on any label mismatch.
"""
import sys
import duckdb


def main() -> int:
    pairs_glob, clusters_glob = sys.argv[1], sys.argv[2]
    pa, pb = (sys.argv[3] if len(sys.argv) > 3 else "doc_a,doc_b").split(",")
    ci, cl = (sys.argv[4] if len(sys.argv) > 4 else "doc_id,label").split(",")
    con = duckdb.connect()
    pairs = con.execute(
        f"SELECT {pa}, {pb} FROM '{pairs_glob}'").fetchall()
    parent = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra < rb:
            parent[rb] = ra
        elif rb < ra:
            parent[ra] = rb
    want = {n: find(n) for n in parent}
    got = dict(con.execute(
        f"SELECT {ci}, {cl} FROM '{clusters_glob}'").fetchall())
    print(f"edges={len(pairs)} want_rows={len(want)} got_rows={len(got)}")
    if want == got:
        print("PASS: cluster labels identical to exact union-find")
        return 0
    only_want = {k: v for k, v in want.items() if got.get(k) != v}
    print(f"FAIL: {len(only_want)} mismatched labels; first 10: "
          f"{sorted(only_want.items())[:10]}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
