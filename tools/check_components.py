#!/usr/bin/env python3
"""Large-SF checker for the connected-components query family
(harness tooling, like check_oracle.py — NOT library code).

The stock DuckDB oracles for q60/q115/q65 replay components with a
recursive transitive-closure CTE — exact, and fine at the driver's
sf0.01 gate, but the closure materializes Σ|cluster|² rows, which at
sf1's replica-amplified clusters spills tens of GB and never
finishes. This checker verifies the SAME contract the stock oracles
state, by the same edge derivation, swapping only the closure for a
union-find:

  1. run the oracle's own NON-recursive prefix in DuckDB to get the
     exact edge set (id_i, id_j);
  2. min-label components via union-find in Python (exact, O(E a(E)));
  3. register the labeling as a DuckDB table and run the oracle's
     own FINAL aggregation over it (mechanical CTE substitution on
     the oracle text — the scoring/packing SQL is untouched).

q90's bottleneck is different (a probes × names CROSS JOIN before
levenshtein); it is rewritten to an equivalent length-blocked join
(|len(a)-len(b)| <= 1 is NECESSARY for levenshtein <= 1, so the
block is lossless) and its small-cluster recursion is kept.

Usage: check_components.py <verify_out_dir> <sf_dir>
"""
import sys, os, json, glob, re
import duckdb
import pandas as pd
import numpy as np


class UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        p = self.p
        r = p.setdefault(x, x)
        while r != p[r]:
            r = p[r]
        while p[x] != r:
            p[x], x = r, p[x]
        return r

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            p = self.p
            p[max(ra, rb)] = min(ra, rb)


def min_label_components(edges):
    """(id -> min reachable id) for every endpoint in edges."""
    uf = UF()
    for a, b in edges:
        uf.union(a, b)
    # path-compress to true minimum labels: union-by-min above keeps
    # the root the minimum of the merged trees, so find() is the min
    return {x: uf.find(x) for x in list(uf.p)}


def compare(name, got: pd.DataFrame, exp: pd.DataFrame) -> bool:
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"  X {name}: columns {list(got.columns)} vs {list(exp.columns)}")
        return False
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    if len(got) != len(exp):
        print(f"  X {name}: rows {len(got)} vs {len(exp)}")
        return False
    for c in got.columns:
        g, e = got[c].to_numpy(), exp[c].to_numpy()
        if g.dtype.kind == "f" or e.dtype.kind == "f":
            ok = np.array_equal(g.astype(float), e.astype(float))
        else:
            ok = (g.astype(object) == e.astype(object)).all()
        if not ok:
            i = int(np.argmax(~(got[c].astype(object).to_numpy()
                                == exp[c].astype(object).to_numpy())))
            print(f"  X {name}: column {c} differs; first row {i}: "
                  f"{got.iloc[i].tolist()} vs {exp.iloc[i].tolist()}")
            return False
    print(f"  . {name}: OK ({len(got)} rows)")
    return True


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        con.execute(f"CREATE VIEW {os.path.basename(p)[:-8]} AS "
                    f"SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    fails = 0

    def spark_result(q):
        return pd.read_parquet(os.path.join(out_dir, q))

    def comp_table(prefix_sql):
        """edges from the oracle's own prefix -> min-label table."""
        edges = con.execute(prefix_sql).fetchall()
        comp = min_label_components(edges)
        df = pd.DataFrame(
            {"id": list(comp), "comp": [comp[k] for k in comp]},
            dtype="int64")
        con.register("pycomp", df)
        return len(edges)

    # --- q60 / q115: document near-dup graph (q31's edge set) ---
    sql = oracle["q60_neardup_clusters"]
    cut = sql.index("sym AS")
    prefix = sql[:cut].rstrip().rstrip(",")
    prefix = prefix.replace("WITH RECURSIVE", "WITH", 1)
    ne = comp_table(prefix + "\nSELECT id_i, id_j FROM edges")
    print(f"  (near-dup graph: {ne} edges)")

    if "q60_neardup_clusters" in oracle and os.path.isdir(
            os.path.join(out_dir, "q60_neardup_clusters")):
        exp = con.execute("""
            SELECT CAST(id AS BIGINT) AS doc_id,
                   CAST(comp AS BIGINT) AS component,
                   id = comp AS is_canonical
            FROM pycomp ORDER BY doc_id""").df()
        fails += not compare("q60_neardup_clusters",
                             spark_result("q60_neardup_clusters"), exp)

    if os.path.isdir(os.path.join(out_dir, "q115_soft_dedup_weights")):
        # stock q115 oracle's final SELECT over pycomp (weight =
        # integer half-up of 1/size at 6 decimals, as the oracle does)
        exp = con.execute("""
            WITH sizes AS (SELECT comp, COUNT(*) AS sz FROM pycomp GROUP BY 1)
            SELECT d.doc_id,
                   CAST(COALESCE(p.comp, d.doc_id) AS BIGINT) AS cluster_id,
                   CAST(COALESCE(s.sz, 1) AS BIGINT) AS cluster_size,
                   CAST((2000000 + COALESCE(s.sz, 1))
                        // (2 * COALESCE(s.sz, 1)) AS DOUBLE) / 1e6 AS weight
            FROM documents d
            LEFT JOIN pycomp p ON p.id = d.doc_id
            LEFT JOIN sizes s ON s.comp = p.comp
            ORDER BY d.doc_id""").df()
        fails += not compare("q115_soft_dedup_weights",
                             spark_result("q115_soft_dedup_weights"), exp)

    # --- q125: leakage-safe split over the same near-dup graph ---
    if os.path.isdir(os.path.join(out_dir, "q125_leakage_safe_split")):
        # pycomp still holds the q60/q115 near-dup labeling (same
        # tau=0.8 pair graph q125's oracle prefix derives)
        exp = con.execute("""
            WITH asg AS (SELECT d.doc_id,
                   COALESCE(p.comp, d.doc_id) AS cluster_id,
                   CASE WHEN ('0x' || substr(md5(CAST(COALESCE(p.comp, d.doc_id) AS VARCHAR)), 1, 6))::BIGINT % 100 < 90
                        THEN 'train' ELSE 'val' END AS split
                 FROM documents d LEFT JOIN pycomp p ON p.id = d.doc_id),
            str AS (SELECT CAST(SUM(CASE WHEN nspl > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_straddling
                    FROM (SELECT cluster_id, COUNT(DISTINCT split) AS nspl
                          FROM asg GROUP BY 1))
            SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
                   (SELECT n_straddling FROM str) AS n_straddling
            FROM asg GROUP BY split ORDER BY split""").df()
        fails += not compare("q125_leakage_safe_split",
                             spark_result("q125_leakage_safe_split"), exp)

    # --- q65: funnel — swap only the closure, keep every other stage ---
    if os.path.isdir(os.path.join(out_dir, "q65_curation_funnel")):
        sql = oracle["q65_curation_funnel"]
        cut = sql.index("sym AS")
        prefix = sql[:cut].rstrip().rstrip(",").replace(
            "WITH RECURSIVE", "WITH", 1)
        comp_table(prefix + "\nSELECT id_i, id_j FROM edges")
        surgery = re.sub(
            r"sym AS .*?reach AS \(.*?\),\n",
            "reach AS (SELECT id, comp FROM pycomp),\n",
            sql.replace("WITH RECURSIVE", "WITH", 1), flags=re.S)
        exp = con.execute(surgery).df()
        fails += not compare("q65_curation_funnel",
                             spark_result("q65_curation_funnel"), exp)

    # --- q90: distinct-string levenshtein + union-find over string
    # representatives. The stock oracle (and the old length-blocked
    # surgery) works at ID level: with duplicate-heavy name columns
    # the edge set is |dup|x|dup| per matched string pair and the
    # closure is sigma|cluster|^2 — hundreds of millions of rows at
    # sf1. Every id shares its STRING's component, so compute the
    # blocked levenshtein over distinct strings (64x64 here), label
    # string reps (min member id — cluster_id is unchanged because
    # the min over per-string min-ids is the min over all ids), and
    # sum per-string multiplicities back in the final aggregation —
    # the same reduction the Spark side documents.
    if os.path.isdir(os.path.join(out_dir, "q90_entity_clusters")):
        con.execute("""
            CREATE OR REPLACE TEMP TABLE pstat AS
            SELECT pn, MIN(pk) AS rep, COUNT(*) AS cnt FROM (
              SELECT p_partkey + 10000000 AS pk, substr(p_name, 2) AS pn
              FROM part WHERE p_partkey % 50 = 0) GROUP BY pn;
            CREATE OR REPLACE TEMP TABLE bstat AS
            SELECT bn, MIN(bk) AS rep, COUNT(*) AS cnt FROM (
              SELECT p_partkey AS bk, p_name AS bn FROM part) GROUP BY bn""")
        sedges = con.execute("""
            SELECT p.rep, b.rep FROM pstat p JOIN bstat b
            ON abs(length(p.pn) - length(b.bn)) <= 1
            WHERE levenshtein(p.pn, b.bn) <= 1""").fetchall()
        comp = min_label_components(sedges)
        df = pd.DataFrame(
            {"id": list(comp), "comp": [comp[k] for k in comp]}, dtype="int64")
        con.register("pycomp90", df)
        exp = con.execute("""
            WITH stats AS (
              SELECT rep, cnt, cnt AS probes FROM pstat
              UNION ALL SELECT rep, cnt, 0 FROM bstat),
            m AS (SELECT c.comp AS cluster_id, s.cnt, s.probes
                  FROM pycomp90 c JOIN stats s ON s.rep = c.id)
            SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
                   CAST(SUM(cnt) AS BIGINT) AS n_members,
                   CAST(SUM(probes) AS BIGINT) AS n_probes
            FROM m GROUP BY 1 ORDER BY cluster_id""").df()
        fails += not compare("q90_entity_clusters",
                             spark_result("q90_entity_clusters"), exp)

    print("COMPONENT-CHECK " + ("FAIL" if fails else "PASS"))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
