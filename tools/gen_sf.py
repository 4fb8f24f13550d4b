"""Deterministic scale-factor generator for the dress-rehearsal tiers.

The shipped `/root/testdata` tops out at sf0.1 (~600k lineitem). SCALE.md's
x8-x64 replication probes cover the dedup/graph tiers but not the TPC-H join
tier at realistic KEY CARDINALITIES (replication multiplies rows but not
distinct keys, so join fan-outs and AQE decisions don't scale realistically).
This tool generates the same ten-table layout at any scale with seeded numpy
(seed fixed per table — byte-identical reruns), matching the shipped schemas:

  region/nation        copied verbatim from a source sf dir (fixed tables)
  customer/supplier/part/orders/lineitem   TPC-H-ish, same columns/types,
                       same categorical vocabularies, same key relationships
                       (lineitem→orders/part/supplier, orders→customer)
  events               30-day TIMESTAMP(us) stream, same 5 event types
  documents            word-salad text over the same vocabulary with EXACT
                       (5%) and NEAR (10%) duplicate structure so the dedup
                       tier has work to find
  embeddings           64-dim unit-normalized float32 vectors, 10 labels

Usage:
    python tools/gen_sf.py OUT_DIR [--scale 1.0] [--src /root/testdata/sf0.1]

sf1 ≈ 6M lineitem / 1.5M orders — ~10× the shipped bench tier. Output goes
under the repo (never into /root/testdata).
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_STATUS = ["O", "F", "P"]
_RETURNFLAG = ["A", "N", "R"]
_LINESTATUS = ["O", "F"]
_PTYPES = ["ECONOMY", "SMALL", "MEDIUM", "LARGE", "STANDARD", "PROMO"]
_EVENT_TYPES = ["view", "click", "signup", "purchase", "error"]
_LANGS = ["en", "de", "fr", "es", "zh"]
_LANG_W = [0.45, 0.14, 0.13, 0.14, 0.14]
_VOCAB_BASE = (
    "key agg row scan slow fast table value part hash merge batch window "
    "spark order data column join small line customer query the a big "
    "stream filter sort vector"
).split()


def _vocab_for(n_doc: int) -> list[str]:
    """Vocabulary sized so the trigram-shingle pair mass (Σ df²) stays
    proportional to corpus size. The shipped sf0.1 corpus draws ~27k distinct
    shingles from a ~28-word vocabulary at 5k docs (avg df ≈ 10, pair mass
    ≈ 2.8M). Keeping the 28-word vocabulary at 50k docs drives avg df to
    ~100 and pair mass to 260M — the uncapped n-gram pair oracles then go
    quadratic on BOTH engines (measured: the sf1 sweep stalled). Distinct
    shingles scale with vocab³, so vocab grows with the CUBE ROOT of the doc
    count: at 10× docs, ~2.2× words keeps per-doc join fan-out flat."""
    import math

    target = max(28, int(28 * (n_doc / 5000.0) ** (1.0 / 3.0) + 0.5))
    vocab = list(_VOCAB_BASE)
    i = 0
    while len(vocab) < target:
        vocab.append(f"{_VOCAB_BASE[i % len(_VOCAB_BASE)]}{i // len(_VOCAB_BASE)}")
        i += 1
    return vocab

_DAY_US = 86_400_000_000
_EPOCH_1995 = int(pd.Timestamp("1995-01-01").value // 1000)
_EPOCH_2001 = int(pd.Timestamp("2001-08-01").value // 1000)
_EPOCH_2024 = int(pd.Timestamp("2024-01-01").value // 1000)


def _cat(rng: np.random.Generator, choices: list[str], n: int) -> pd.Categorical:
    return pd.Categorical.from_codes(
        rng.integers(0, len(choices), n, dtype=np.int32), categories=choices
    )


def _money(rng: np.random.Generator, lo: float, hi: float, n: int) -> np.ndarray:
    return np.round(rng.uniform(lo, hi, n), 2)


def _ts_us(rng: np.random.Generator, lo: int, hi: int, n: int, unit_days: bool = True) -> pa.Array:
    if unit_days:  # date-grain timestamps, like the shipped o_orderdate
        days = rng.integers(lo // _DAY_US, hi // _DAY_US, n, dtype=np.int64)
        vals = days * _DAY_US
    else:
        vals = rng.integers(lo, hi, n, dtype=np.int64)
    return pa.array(vals, pa.timestamp("us"))


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def generate(out_dir: str, scale: float, src: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for fixed in ("region", "nation"):
        shutil.copyfile(
            os.path.join(src, f"{fixed}.parquet"), os.path.join(out_dir, f"{fixed}.parquet")
        )
        print(f"  {fixed}: copied from {src}")

    n_cust = int(150_000 * scale)
    n_supp = int(10_000 * scale)
    n_part = int(200_000 * scale)
    n_ord = int(1_500_000 * scale)
    n_line = int(6_000_000 * scale)
    n_ev = int(1_000_000 * scale)
    n_doc = int(50_000 * scale)
    n_vec = int(20_000 * scale)

    rng = np.random.default_rng(4201)
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust, dtype=np.int32)),
        "c_acctbal": pa.array(_money(rng, -999.99, 9999.99, n_cust)),
        "c_mktsegment": pa.Array.from_pandas(_cat(rng, _SEGMENTS, n_cust)),
    }))

    rng = np.random.default_rng(4202)
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp, dtype=np.int32)),
        "s_acctbal": pa.array(_money(rng, -999.99, 9999.99, n_supp)),
    }))

    rng = np.random.default_rng(4203)
    w1 = rng.integers(0, len(_VOCAB_BASE), n_part)
    w2 = rng.integers(0, len(_VOCAB_BASE), n_part)
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": pa.array([f"{_VOCAB_BASE[a]} {_VOCAB_BASE[b]}" for a, b in zip(w1, w2)]),
        "p_brand": pa.Array.from_pandas(
            _cat(rng, [f"Brand#{i}" for i in range(1, 26)], n_part)
        ),
        "p_type": pa.Array.from_pandas(_cat(rng, _PTYPES, n_part)),
        "p_size": pa.array(rng.integers(1, 51, n_part, dtype=np.int32)),
        "p_retailprice": pa.array(_money(rng, 900.0, 2100.0, n_part)),
    }))

    rng = np.random.default_rng(4204)
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord, dtype=np.int64)),
        "o_orderstatus": pa.Array.from_pandas(_cat(rng, _STATUS, n_ord)),
        "o_totalprice": pa.array(_money(rng, 1000.0, 500_000.0, n_ord)),
        "o_orderdate": _ts_us(rng, _EPOCH_1995, _EPOCH_2001, n_ord),
        "o_orderpriority": pa.Array.from_pandas(_cat(rng, _PRIORITIES, n_ord)),
    }))

    rng = np.random.default_rng(4205)
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_line, dtype=np.int64)),
        "l_partkey": pa.array(rng.integers(0, n_part, n_line, dtype=np.int64)),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_line, dtype=np.int64)),
        "l_linenumber": pa.array(rng.integers(1, 8, n_line, dtype=np.int32)),
        "l_quantity": pa.array(rng.integers(1, 51, n_line).astype(np.float64)),
        "l_extendedprice": pa.array(_money(rng, 1000.0, 100_000.0, n_line)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n_line) * 0.01, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n_line) * 0.01, 2)),
        "l_returnflag": pa.Array.from_pandas(_cat(rng, _RETURNFLAG, n_line)),
        "l_linestatus": pa.Array.from_pandas(_cat(rng, _LINESTATUS, n_line)),
        "l_shipdate": _ts_us(rng, _EPOCH_1995, _EPOCH_2001, n_line),
    }))

    rng = np.random.default_rng(4206)
    n_users = max(150, int(15_000 * scale))
    step_us = (30 * _DAY_US) // max(n_ev, 1)
    ts = _EPOCH_2024 + np.arange(n_ev, dtype=np.int64) * step_us + rng.integers(
        0, max(step_us, 1), n_ev, dtype=np.int64
    )
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev, dtype=np.int64)),
        "event_type": pa.Array.from_pandas(_cat(rng, _EVENT_TYPES, n_ev)),
        "value": pa.array(np.round(rng.uniform(0.01, 490.02, n_ev), 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]),
    }))

    rng = np.random.default_rng(4207)
    vocab = _vocab_for(n_doc)
    texts: list[str] = []
    for i in range(n_doc):
        r = rng.random()
        if i > 10 and r < 0.05:  # exact duplicate of an earlier doc
            texts.append(texts[int(rng.integers(0, i))])
        elif i > 10 and r < 0.15:  # near duplicate: one appended word
            texts.append(
                texts[int(rng.integers(0, i))] + " " + vocab[int(rng.integers(0, len(vocab)))]
            )
        else:
            n_words = int(rng.integers(25, 80))
            idx = rng.integers(0, len(vocab), n_words)
            texts.append(" ".join(vocab[j] for j in idx))
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.Array.from_pandas(
            pd.Categorical.from_codes(
                rng.choice(len(_LANGS), n_doc, p=_LANG_W).astype(np.int32),
                categories=_LANGS,
            )
        ),
        "source": pa.Array.from_pandas(
            _cat(rng, [f"src{i}" for i in range(20)], n_doc)
        ),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    }))

    rng = np.random.default_rng(4208)
    vecs = rng.normal(0, 1, (n_vec, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_vec, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.ravel()), 64
        ).cast(pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_vec, dtype=np.int32)),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    print(f"generating sf{args.scale} into {args.out_dir}")
    generate(args.out_dir, args.scale, args.src)
