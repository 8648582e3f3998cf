#!/usr/bin/env python3
"""Patch a Verify output's oracle_sql.json for large-SF checks
(harness tooling; used for the sf1 scale-proof).

q45/q116's stock oracles are ALL-PAIRS scans (the honest formulation
at driver gate scale, ~500 vectors) — O(N^2 * 64) explodes at sf1's
20k-vector corpus. The substitutes verify the same contract the
Spark side must produce — every planted source pairs with its exact
copy, with the cosine replayed by the same quantized-integer formula
restricted to those pairs — plus the structural fact that no other
pair can reach 0.95 among iid uniform 64-dim vectors (the same
assumption the stock oracle's construction documents). Substitution
is opt-in and logged; the driver's sf0.01 gate still runs the stock
all-pairs oracles.

Usage: python3 tools/sf1_oracle_subs.py <verify_out_dir>
"""
import json
import os
import sys

QI = "CAST(round(CAST({e} AS DOUBLE)*1000000.0) AS BIGINT)"


def planted_pairs_sql(mod: int, offset: int, keep: str, drop: str) -> str:
    qa = QI.format(e="embedding[i]")
    return f"""
WITH src AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % {mod} = 0),
p AS (
  SELECT vec_id AS {keep}, vec_id + {offset} AS {drop},
    SUM({qa} * {qa}) AS dot
  FROM src, range(1, 65) AS u(i)
  GROUP BY 1, 2)
SELECT {keep}, {drop},
       round(CAST(dot AS DOUBLE) / (sqrt(CAST(dot AS DOUBLE)) * sqrt(CAST(dot AS DOUBLE))), 6) AS cosine
FROM p ORDER BY {keep}, {drop}"""


# q116 needs no substitute since round 7: its stock oracle IS the
# planted-pairs scan (integer cosine triple, per-vector norm cost).
SUBS = {
    "q45_embedding_neardup": planted_pairs_sql(5, 10000000, "id_i", "id_j"),
}

if __name__ == "__main__":
    path = os.path.join(sys.argv[1], "oracle_sql.json")
    oracle = json.load(open(path))
    for q, sql in SUBS.items():
        if q in oracle:
            oracle[q] = sql
            print(f"substituted planted-truth oracle for {q}")
    json.dump(oracle, open(path, "w"), indent=1)
