#!/usr/bin/env python3
"""Independent replay of graft.operators.Clustering.assignLinCodes.

Implements the LIN code assignment semantics of the reference
(scripts/maintenance/lincodes.pl:177-331) with the engine's fixed
determinism rules: assignment order = ascending entity id, nearest-match
ties broken by lowest id. Used to cross-validate the DuckDB recursive-CTE
oracle in ClusterQueries against an imperative implementation.

usage: lincode_replay.py [sfdir] -- prints id,lincode lines
"""
import sys
import duckdb

MISSING = "0"
ARBITRARY = "N"
THRESHOLDS = [30.0, 60.0, 90.0]


def identity_pct(a, b):
    shared = comparable = 0
    for x, y in zip(a, b):
        if x != MISSING and y != MISSING:
            comparable += 1
            if x == y or x == ARBITRARY or y == ARBITRARY:
                shared += 1
    return 100.0 * shared / comparable if comparable else 0.0


def assign(profiles, thresholds):
    """profiles: sorted list of (id, [allele,...]). Returns [(id, code)]."""
    levels = len(thresholds)
    assigned = []  # (id, profile, code)
    out = []
    for pid, prof in profiles:
        if not assigned:
            code = [0] * levels
        else:
            best = max(assigned, key=lambda t: (identity_pct(prof, t[1]), -t[0]))
            pct = identity_pct(prof, best[1])
            depth = 0
            for i, t in enumerate(thresholds):
                if pct >= t:
                    depth = i + 1
            if depth >= levels:
                code = list(best[2])
            else:
                prefix = best[2][:depth]
                used = {c[depth] for (_, _, c) in assigned if c[:depth] == prefix}
                nxt = 0
                while nxt in used:
                    nxt += 1
                code = prefix + [nxt] + [0] * (levels - depth - 1)
        assigned.append((pid, prof, code))
        out.append((pid, code))
    return out


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    rows = con.execute(f"""
        SELECT l_orderkey, l_linenumber, min(CAST(l_suppkey AS VARCHAR))
        FROM '{sfdir}/lineitem.parquet' WHERE l_orderkey < 300
        GROUP BY 1, 2""").fetchall()
    profs = {}
    for oid, locus, a in rows:
        profs.setdefault(oid, {})[locus] = a
    profiles = sorted(
        (oid, [d.get(i, MISSING) for i in range(1, 8)]) for oid, d in profs.items())
    for pid, code in assign(profiles, THRESHOLDS):
        print(f"{pid},{'_'.join(map(str, code))}")


if __name__ == "__main__":
    main()
