"""Generate sf1 testdata by FK-consistent 10x inflation of sf0.1.

The environment has no network (no duckdb tpch extension, no dbgen),
so sf1-scale inputs for the TPC-H sweep are produced by replicating
/root/testdata/sf0.1 ten times with per-replica key offsets that keep
every foreign-key relationship intact:

  customer  c_custkey  += i * 15000      orders    o_custkey follows
  supplier  s_suppkey  += i * 1000       lineitem  l_suppkey follows
  part      p_partkey  += i * 20000      lineitem  l_partkey follows
  orders    o_orderkey += i * 150000     lineitem  l_orderkey follows
  events    event_id   += i * 100000, user_id += i * 1500
  documents doc_id     += i * 5000
  embeddings vec_id    += i * 2000
  region / nation: fixed dimensions, copied as-is.

Entity-name columns (c_name, s_name, p_name) get a per-replica suffix
for i > 0 so names stay UNIQUE: duplicated supplier names made TPC-H
q21's (numwait, s_name) ordering genuinely ambiguous at the LIMIT cut
(both engines correct, different rows). Suffixing at the END keeps
substring/LIKE predicates (q9's p_name) intact; categorical columns
(p_brand, p_type, c_mktsegment, region/nation names) are never touched
because queries filter on their exact values.

This is NOT official TPC-H data (neither is sf0.1 — see TESTDATA.md);
the correctness gate is cross-engine agreement on the same parquet, so
value distributions only need to be realistic, not spec-exact. The
10x replication preserves every per-replica distribution and scales
join cardinalities linearly — exactly what's needed to surface AQE
re-plans and broadcast-threshold flips that sf0.1 can't (VERDICT r4
ask #4).

The customer table additionally carries a PLANTED 5-row cohort
(c_custkey 150000-150004, one shared quasi-identifier cell in an
otherwise-unoccupied balance band) so the k_anonymity audit provably
detects a violation at sf1 — with only real data the k=12 threshold is
SF-relative and sf1 returns 0 rows, which exercises the plan but not
the detection (VERDICT r8 ask #5). Customer row count is therefore
10x + 5, not exactly 10x.

Output: /root/repo/testdata_sf1/*.parquet (git-ignored; ~1 GB).
Usage:  python tools/gen_sf1.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

# entity-name columns that must stay unique across replicas
UNIQUE_NAMES: dict[str, str] = {
    "customer": "c_name",
    "supplier": "s_name",
    "part": "p_name",
}

# table -> list of (column, per-replica offset); None offset = copy
OFFSETS: dict[str, list[tuple[str, int]]] = {
    "region": [],
    "nation": [],
    "customer": [("c_custkey", 15000)],
    "supplier": [("s_suppkey", 1000)],
    "part": [("p_partkey", 20000)],
    "orders": [("o_orderkey", 150000), ("o_custkey", 15000)],
    "lineitem": [
        ("l_orderkey", 150000),
        ("l_partkey", 20000),
        ("l_suppkey", 1000),
    ],
    "events": [("event_id", 100000), ("user_id", 1500)],
    "documents": [("doc_id", 5000)],
    "embeddings": [("vec_id", 2000)],
}


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for table, offs in OFFSETS.items():
        src = f"{SRC}/{table}.parquet"
        dst = f"{out_dir}/{table}.parquet"
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        if not offs:  # fixed dimension: plain copy
            con.sql(f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)")
        else:
            off_map = dict(offs)
            name_col = UNIQUE_NAMES.get(table)

            def render(c: str) -> str:
                if c in off_map:
                    # CAST back so the inflated key keeps the source dtype
                    return (
                        f"CAST({c} + i * {off_map[c]} AS "
                        f"{_dtype(con, src, c)}) AS {c}"
                    )
                if c == name_col:
                    return (
                        f"CASE WHEN i = 0 THEN {c} "
                        f"ELSE {c} || '_r' || CAST(i AS VARCHAR) END AS {c}"
                    )
                return c

            select = ", ".join(render(c) for c in cols)
            inflated = (
                f"SELECT {select} FROM '{src}' "
                f"CROSS JOIN (SELECT unnest(range({REPLICAS})) AS i)"
            )
            if table == "customer":
                # Planted k-anonymity cohort (VERDICT r8 ask #5): five
                # customers sharing one quasi-identifier cell
                # (MACHINERY, nation 0, bal_band 99 — the 99xxx balance
                # band is unoccupied by real data, whose bands span
                # -1..9) so the sf1 audit provably DETECTS a violation
                # instead of legitimately returning 0 rows under the
                # SF-relative k=12 threshold. Keys 150000+ sit past the
                # inflated range; no orders reference them (customers
                # without orders are legal — TPC-H q22 is about them,
                # but it filters phone country codes these rows avoid
                # by construction: c_name has no phone column here).
                inflated += (
                    " UNION ALL SELECT"
                    " CAST(150000 + j AS BIGINT) AS c_custkey,"
                    " 'Customer#PLANTED' || CAST(j AS VARCHAR) AS c_name,"
                    " CAST(0 AS INTEGER) AS c_nationkey,"
                    " CAST(99000.0 + j AS DOUBLE) AS c_acctbal,"
                    " 'MACHINERY' AS c_mktsegment"
                    " FROM (SELECT unnest(range(5)) AS j)"
                )
            con.sql(f"COPY ({inflated}) TO '{dst}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{table}: {n} rows -> {dst}", flush=True)
    return 0


def _dtype(con, src: str, col: str) -> str:
    (t,) = [
        r[1]
        for r in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()
        if r[0] == col
    ]
    return t


if __name__ == "__main__":
    raise SystemExit(main())
