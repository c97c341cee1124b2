#!/usr/bin/env python3
"""Tie audit for every double->decimal(18,6) cast site (SURVEY §7.4).

A cast(double AS decimal(p, s)) is cross-engine-safe only if no input value
lands on an exact .5 at decimal scale s: Spark rounds such ties HALF_UP,
DuckDB half-to-even (this exact divergence broke embed_centroid in round 4).

A double d ties at scale s iff frac(d * 10^s) == 1/2 EXACTLY, which (since
10^s = 2^s * 5^s) requires d to be an odd multiple of 2^-(s+1) -- i.e. the
double's mantissa must end in ~45 zero bits. This script checks the REAL
data rather than trusting that argument: Fraction(v) is the exact rational
value of the double, so the test below is exact, not approximate.

Usage: python3 scripts/tie_audit.py /root/testdata/sf0.1
"""
import sys
from fractions import Fraction

import numpy as np
import pyarrow.parquet as pq

SCALE = 6
HALF = Fraction(1, 2)


def ties(name, values):
    """Count values whose exact decimal expansion ties at SCALE digits."""
    n_tie = 0
    examples = []
    pow10 = 10 ** SCALE
    for v in values:
        if not np.isfinite(v):
            continue
        f = Fraction(float(v)) * pow10
        if f - (f.numerator // f.denominator) == HALF:
            n_tie += 1
            if len(examples) < 3:
                examples.append(float(v))
    status = "TIE-FREE" if n_tie == 0 else "TIES FOUND"
    print(f"{status:>10}  {name}: {len(values)} values, {n_tie} ties {examples if examples else ''}")
    return n_tie


def main(sf_dir):
    total = 0
    li = pq.read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_quantity", "l_extendedprice", "l_discount"])
    qty = li["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
    price = li["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)
    disc = li["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64)
    total += ties("lineitem.l_quantity            @6", qty)
    total += ties("lineitem.l_extendedprice       @6", price)
    # The computed product both engines sum in agg_group/join_multi:
    # IEEE double price*(1-discount), identical association in Spark & DuckDB.
    total += ties("l_extendedprice*(1-l_discount) @6", price * (np.float64(1.0) - disc))

    orders = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
    total += ties("orders.o_totalprice            @6",
                  orders["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64))

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_acctbal"])
    total += ties("customer.c_acctbal             @6",
                  cust["c_acctbal"].to_numpy(zero_copy_only=False).astype(np.float64))

    ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["value"])
    total += ties("events.value                   @6",
                  ev["value"].to_numpy(zero_copy_only=False).astype(np.float64))

    # Control: the round-4 bug class. Float embeddings at decimal scale 9
    # (the OLD embed_centroid cast) -- expected to show ties, proving the
    # test has power. The shipped operator now floor-quantizes instead.
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    flat = np.concatenate(emb["embedding"].to_numpy(zero_copy_only=False))
    n_tie = 0
    pow10 = 10 ** 9
    for v in flat:
        f = Fraction(float(v)) * pow10
        if f - (f.numerator // f.denominator) == HALF:
            n_tie += 1
    print(f"{'CONTROL':>10}  embeddings float @9 (old embed_centroid cast): "
          f"{len(flat)} values, {n_tie} ties (expected > 0)")

    print(f"\n== production decimal(18,6) cast sites: {total} ties total ==")
    return 1 if total else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
