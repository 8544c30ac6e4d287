"""Deterministic sf1 tables: 10× the driver's sf0.1 tables, written to
bench_data/sf1/ (the driver provides sf0.001/0.01/0.1; the sf1
EVIDENCE run — VERDICT r3 #5 — needs one scale step beyond the gate).

Scaling rule: replica k ∈ [0, 10) shifts every entity key by
k·10,000,000 (all sf0.1 keys are < 10M, so replicas never collide and
referential pairs — o_custkey→c_custkey, l_orderkey→o_orderkey,
l_partkey/l_suppkey — stay consistent). Spatial positions are derived
from keys inside the queries (modular formulas), so shifted replicas
land at NEW positions: the sf1 layers are genuinely 10× denser, not
10 copies of the same map. Document texts and embedding vectors are
deterministically MUTATED per replica (seeded by (id, k)) so the
dedup/ANN families see new content, not pure exact-dup explosions.
Both the Spark engine and the DuckDB oracle read the SAME parquet, so
the generation needs no SQL twin.

Run: python scripts/gen_sf1.py    (writes ~120 MB, ~1 min)
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"
OUT = "/root/repo/bench_data/sf1"
REPLICAS = 10
OFF = 10_000_000

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _mutate_text(text: str, doc_id: int, k: int) -> str:
    """Replace every 3rd word with a (doc, replica)-seeded token:
    drops shingle Jaccard vs the original well below the 0.5 driver
    threshold while keeping realistic word statistics."""
    words = (text or "").split()
    for i in range(2, len(words), 3):
        h = hashlib.sha1(f"{doc_id}-{k}-{i}".encode()).hexdigest()[:6]
        words[i] = h
    return " ".join(words)


def _replicate(name: str, df: pd.DataFrame) -> pd.DataFrame:
    outs = [df]
    for k in range(1, REPLICAS):
        rep = df.copy()
        for col in KEY_COLS.get(name, []):
            rep[col] = rep[col] + k * OFF
        if name == "documents":
            rep["text"] = [
                _mutate_text(t, d, k)
                for t, d in zip(rep["text"], rep["doc_id"])
            ]
            rep["n_chars"] = rep["text"].str.len().astype("int64")
        if name == "embeddings":
            rng = np.random.default_rng(816_000 + k)
            mat = np.asarray(rep["embedding"].tolist(), dtype=np.float32)
            mat = mat + rng.normal(scale=0.15, size=mat.shape).astype(
                np.float32
            )
            rep["embedding"] = list(mat)
        outs.append(rep)
    return pd.concat(outs, ignore_index=True)


def main():
    os.makedirs(OUT, exist_ok=True)
    for name in ["region", "nation"]:
        pd.read_parquet(f"{SRC}/{name}.parquet").to_parquet(
            f"{OUT}/{name}.parquet", index=False
        )
    for name in KEY_COLS:
        df = pd.read_parquet(f"{SRC}/{name}.parquet")
        big = _replicate(name, df)
        big.to_parquet(f"{OUT}/{name}.parquet", index=False)
        print(f"{name}: {len(df)} -> {len(big)} rows")


if __name__ == "__main__":
    main()
