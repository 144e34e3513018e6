"""Build a driver-layout-faithful synthetic scale-up of a testdata SF dir.

The driver's larger scale factors (e.g. sf1.0 in BENCH_r05) are generated
on the driver's side and do not persist between sessions; this tool
rebuilds a comparable dataset for scale smoke-testing and at-scale oracle
checks (it produced the 10x set behind
bench_runs/round6/bench_headline_synth10x.json, where all nine headline
queries were verified against the DuckDB oracle at 50k docs / 6M lineitem).

Construction, per replica i of R:
* dims (region, nation) copied once;
* keyed tables replicated with FK-consistent key offsets (orders.o_custkey
  shifts by the customer key span, lineitem's orderkey/partkey/suppkey by
  their parents' spans) so join selectivities match the base data;
* documents get ~40% of space-separated words replaced with
  replica-unique tokens (replica 0 untouched): cross-replica pairs land
  well below every dedup threshold (unigram Jaccard ~0.43 < 0.8, 3-gram
  Jaccard ~0.12 < 0.5), so replication does not plant artificial
  near-dups; n_chars is recomputed from the perturbed text;
* embeddings get N(0, 0.01) jitter per component (replica 0 untouched).

Deterministic (fixed numpy seed). Output layout matches the driver's
sf1.0: pyarrow default row-group sizing gives lineitem 6 row groups,
orders 2, singles elsewhere.

Usage: python tools/make_synth_sf.py [SRC_SF_DIR] [DST_DIR] [REPLICAS]
       (defaults: /root/testdata/sf0.1 /tmp/sfbig 10)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(7)
    t0 = time.time()

    def rd(t: str) -> pa.Table:
        return pq.read_table(f"{src}/{t}.parquet")

    def wr(t: str, tbl: pa.Table) -> None:
        pq.write_table(tbl, f"{dst}/{t}.parquet")
        print(t, tbl.num_rows, f"{time.time() - t0:.1f}s", flush=True)

    for t in ("region", "nation"):
        wr(t, rd(t))

    def span(s: pd.Series) -> int:
        return int(s.max()) + 1

    cust = rd("customer").to_pandas()
    supp = rd("supplier").to_pandas()
    part = rd("part").to_pandas()
    orders = rd("orders").to_pandas()
    li = rd("lineitem").to_pandas()
    ev = rd("events").to_pandas()
    csp, ssp, psp = span(cust.c_custkey), span(supp.s_suppkey), span(part.p_partkey)
    osp, esp = span(orders.o_orderkey), span(ev.event_id)

    def rep(df: pd.DataFrame, shifts: dict[str, int]) -> pd.DataFrame:
        out = []
        for i in range(reps):
            d = df.copy()
            for col, sp in shifts.items():
                d[col] = d[col] + i * sp
            out.append(d)
        return pd.concat(out, ignore_index=True)

    def w(t: str, df: pd.DataFrame) -> None:
        wr(t, pa.Table.from_pandas(df, preserve_index=False))

    w("customer", rep(cust, {"c_custkey": csp}))
    w("supplier", rep(supp, {"s_suppkey": ssp}))
    w("part", rep(part, {"p_partkey": psp}))
    w("orders", rep(orders, {"o_orderkey": osp, "o_custkey": csp}))
    w("lineitem", rep(li, {"l_orderkey": osp, "l_partkey": psp, "l_suppkey": ssp}))
    w("events", rep(ev, {"event_id": esp}))

    docs = rd("documents").to_pandas()
    dsp = span(docs.doc_id)
    out = []
    for i in range(reps):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + i * dsp
        if i > 0:
            texts = []
            for j, s in enumerate(d["text"]):
                if s is None:
                    texts.append(None)
                    continue
                words = s.split(" ")
                mask = rng.random(len(words)) < 0.4
                for k in np.flatnonzero(mask):
                    words[k] = f"w{i}x{(j * 131 + int(k)) % 9973}"
                texts.append(" ".join(words))
            d["text"] = texts
            d["n_chars"] = [len(s) if s is not None else None for s in texts]
        out.append(d)
    w("documents", pd.concat(out, ignore_index=True))

    emb = rd("embeddings").to_pandas()
    vsp = span(emb.vec_id)
    out = []
    for i in range(reps):
        d = emb.copy()
        d["vec_id"] = d["vec_id"] + i * vsp
        if i > 0:
            d["embedding"] = [
                (np.asarray(v, dtype=np.float64) + rng.normal(0, 0.01, len(v))).tolist()
                if v is not None
                else None
                for v in d["embedding"]
            ]
        out.append(d)
    w("embeddings", pd.concat(out, ignore_index=True))
    print("done", f"{time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
