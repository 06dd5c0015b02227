"""Independent sequential references for the session-12 operators:
each test builds a synthetic input table, runs the ENGINE query over
it, and compares against a plain-Python reimplementation of the
semantics (the sources/truth.py discipline — never through Spark or
DuckDB), so the distributed formulation is checked against the
definition, not just against an equivalent SQL restatement."""

from __future__ import annotations

import hashlib
import random
import re

import pandas as pd
import pytest


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _toks(text: str) -> list[str]:
    return re.findall("[a-z0-9]+", text.lower())


def _write_docs(tmp_path, docs: list[dict]) -> str:
    pdf = pd.DataFrame(docs)
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def _synth_docs(n: int, seed: int) -> list[dict]:
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(n):
        words = [rng.choice(vocab) for _ in range(rng.randint(0, 60))]
        docs.append(
            {
                "doc_id": i,
                "text": " ".join(words),
                "lang": "en",
                "source": f"s{i % 4}",
            }
        )
    # plant exact chunk sharing: doc n gets doc 0's text verbatim
    if n >= 2:
        docs[-1]["text"] = docs[0]["text"]
    return docs


def test_cdc_chunks_vs_python_reference(spark, tmp_path):
    from gepris_spark.plans.storagepipe import _CDC_D, _CDC_KEYSPACE, q_storage_cdc_chunks

    docs = _synth_docs(40, seed=1)
    sf_dir = _write_docs(tmp_path, docs)
    got = {
        r["source"]: r.asDict() for r in q_storage_cdc_chunks(spark, sf_dir).collect()
    }

    # sequential reference: chunk after each boundary token
    chunks = []  # (key, source, digest, n_tokens)
    for d in docs:
        toks = _toks(d["text"])
        cur: list[str] = []
        cid = 0
        for t in toks:
            cur.append(t)
            if _h60("cdc:" + t) % _CDC_D == 0:
                chunks.append((d["doc_id"] * _CDC_KEYSPACE + cid, d["source"], cur, len(cur)))
                cur, cid = [], cid + 1
        if cur:
            chunks.append((d["doc_id"] * _CDC_KEYSPACE + cid, d["source"], cur, len(cur)))
    first: dict[str, int] = {}
    recs = []
    for key, src, cur, n in chunks:
        digest = hashlib.md5(" ".join(cur).encode()).hexdigest()
        first[digest] = min(first.get(digest, key), key)
        recs.append((key, src, digest, n))
    per_src: dict[str, dict] = {}
    for key, src, digest, n in recs:
        a = per_src.setdefault(
            src, {"n_chunks": 0, "digests": set(), "dup": 0, "tok": 0, "saved": 0}
        )
        a["n_chunks"] += 1
        a["digests"].add(digest)
        a["tok"] += n
        if key != first[digest]:
            a["dup"] += 1
            a["saved"] += n
    assert set(got) == set(per_src)
    for src, a in per_src.items():
        g = got[src]
        assert g["n_chunks"] == a["n_chunks"]
        assert g["distinct_digests"] == len(a["digests"])
        assert g["dup_copies"] == a["dup"]
        assert g["tokens_total"] == a["tok"]
        assert g["tokens_saved"] == a["saved"]
        assert g["dedup_bp"] == a["saved"] * 10000 // a["tok"]
    # the planted verbatim copy must produce cross-doc duplicate chunks
    assert sum(a["dup"] for a in per_src.values()) > 0


def test_bfs_vs_python_reference(spark, tmp_path):
    from gepris_spark.plans.trainprep import (
        _BFS_ENC,
        _BFS_ROUNDS,
        _BFS_SEEDS,
        q_graph_shortest_path,
    )

    rng = random.Random(7)
    pairs = sorted({(rng.randint(1, 25), rng.randint(1, 12)) for _ in range(60)})
    orders = pd.DataFrame(
        [{"o_orderkey": i, "o_custkey": c} for i, (c, _s) in enumerate(pairs)]
    ).astype("int64")
    lineitem = pd.DataFrame(
        [{"l_orderkey": i, "l_suppkey": s} for i, (_c, s) in enumerate(pairs)]
    ).astype("int64")
    orders.to_parquet(tmp_path / "orders.parquet", index=False)
    lineitem.to_parquet(tmp_path / "lineitem.parquet", index=False)

    got = {
        r["node"]: (r["dist"], r["nearest_seed"])
        for r in q_graph_shortest_path(spark, str(tmp_path)).collect()
    }

    edges: dict[str, set[str]] = {}
    for c, s in pairs:
        cu, su = f"c:{c}", f"s:{s}"
        edges.setdefault(cu, set()).add(su)
        edges.setdefault(su, set()).add(cu)
    seeds = sorted({s for _c, s in pairs})[:_BFS_SEEDS]
    state = {f"s:{k}": k for k in seeds}  # comb = dist*ENC + seed, dist 0
    for _ in range(_BFS_ROUNDS):
        nxt = dict(state)
        for node, comb in state.items():
            for nbr in edges.get(node, ()):
                cand = comb + _BFS_ENC
                if nbr not in nxt or cand < nxt[nbr]:
                    nxt[nbr] = cand
        state = nxt
    want = {n: (comb // _BFS_ENC, comb % _BFS_ENC) for n, comb in state.items()}
    assert got == want
    assert max(d for d, _seed in got.values()) >= 2  # multi-hop exercised


def test_containment_vs_python_reference(spark, tmp_path):
    from gepris_spark.plans.datapipe import (
        _CONT_DF_CAP,
        _CONT_HI_BP,
        _CONT_ID_OFF,
        _CONT_JAC_LO_BP,
        _CONT_MOD,
        q_dedup_containment,
    )

    docs = _synth_docs(60, seed=3)
    sf_dir = _write_docs(tmp_path, docs)
    got = {
        (r["da"], r["db"]): r.asDict() for r in q_dedup_containment(spark, sf_dir).collect()
    }

    by_id = {d["doc_id"]: d["text"] for d in docs}
    corpus = dict(by_id)
    for i in sorted(by_id):
        if i % _CONT_MOD == 0 and (i + 7) in by_id and (i + 13) in by_id:
            corpus[i + _CONT_ID_OFF] = " ".join(
                [by_id[i], by_id[i + 7], by_id[i + 13]]
            )
    sh = {
        did: {
            _h60(" ".join(t[j : j + 3]))
            for j in range(len(t) - 2)
        }
        for did, text in corpus.items()
        for t in [_toks(text)]
    }
    df_count: dict[int, int] = {}
    for s_set in sh.values():
        for s in s_set:
            df_count[s] = df_count.get(s, 0) + 1
    rare = {did: {s for s in ss if df_count[s] <= _CONT_DF_CAP} for did, ss in sh.items()}
    want = {}
    ids = sorted(rare)
    for a in ids:
        for b in ids:
            if a == b or not rare[a]:
                continue
            inter = len(rare[a] & rare[b])
            if inter == 0:
                continue
            cont = inter * 10000 // len(rare[a])
            if cont >= _CONT_HI_BP:
                jac = inter * 10000 // (len(rare[a]) + len(rare[b]) - inter)
                want[(a, b)] = (inter, cont, jac, jac < _CONT_JAC_LO_BP)
    assert set(got) == set(want)
    for k, (inter, cont, jac, asym) in want.items():
        g = got[k]
        assert (g["n_inter"], g["cont_bp"], g["jac_bp"], g["asym"]) == (
            inter, cont, jac, asym,
        )
    assert any(a for (_i, _c, _j, a) in want.values())  # planted asymmetry present


def test_lpa_vs_python_reference(spark, tmp_path):
    from gepris_spark.plans.trainprep import _LPA_ROUNDS, q_graph_label_propagation

    rng = random.Random(11)
    rows = []
    # two disjoint part pools -> at least two communities survive LPA
    for ok in range(30):
        pool = range(1, 10) if ok < 15 else range(11, 20)
        parts = rng.sample(list(pool), rng.randint(2, 4))
        for ln, p in enumerate(parts, start=1):
            rows.append({"l_orderkey": ok, "l_linenumber": ln, "l_partkey": p})
    pd.DataFrame(rows).astype("int64").to_parquet(tmp_path / "lineitem.parquet", index=False)

    got = {
        r["node"]: (r["community"], r["community_size"])
        for r in q_graph_label_propagation(spark, str(tmp_path)).collect()
    }

    und = set()
    by_order: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        by_order.setdefault(r["l_orderkey"], []).append((r["l_linenumber"], r["l_partkey"]))
    for items in by_order.values():
        items.sort()
        for (la, pa), (lb, pb) in zip(items, items[1:]):
            if lb == la + 1 and pa != pb:
                und.add((min(pa, pb), max(pa, pb)))
    nbrs: dict[int, list[int]] = {}
    for u, v in und:
        nbrs.setdefault(u, []).append(v)
        nbrs.setdefault(v, []).append(u)
    labels = {n: n for n in nbrs}
    for _ in range(_LPA_ROUNDS):
        nxt = {}
        for n, ns in nbrs.items():
            cnt: dict[int, int] = {}
            for m in ns:
                cnt[labels[m]] = cnt.get(labels[m], 0) + 1
            nxt[n] = min(cnt, key=lambda l: (-cnt[l], l))
        labels = nxt
    sizes: dict[int, int] = {}
    for l in labels.values():
        sizes[l] = sizes.get(l, 0) + 1
    want = {n: (l, sizes[l]) for n, l in labels.items()}
    assert got == want
    assert len(set(labels.values())) >= 2  # disjoint pools stay separate
