"""Local replica of the driver's correctness gate: run each Spark query
and its DuckDB oracle at a given SF, compare row count, column names, and
an order-insensitive value hash (columns sorted by name, rows sorted).
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from dbt_nlp_sqlizer_team04_spark.sources.parquet import TABLES, table_path


def _norm_cell(v: Any) -> str:
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def normalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return sorted_cols, out


def run_oracle(
    sf_dir: str, sql: str
) -> tuple[list[str], list[tuple], dict[str, str]]:
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    # Re-fetch through pandas to capture the dtype the driver's comparison
    # sees: DuckDB HUGEINT (e.g. windowed sum of ints) widens to float64
    # there, turning 56 into 56.0 and breaking value hashes even though
    # fetchall() returns ints. Kinds: i=int, f=float, O=object/str.
    kinds = {c: str(d.kind) for c, d in con.execute(sql).fetchdf().dtypes.items()}
    return cols, rows, kinds


def _dtype_kind_diffs(spark_schema, oracle_kinds: dict[str, str]) -> list[str]:
    """int-vs-float kind clashes between the Spark schema and the oracle's
    pandas dtypes — the exact shape of the r2 q45 driver failure."""
    numeric = {
        "long": "i", "integer": "i", "int": "i", "short": "i", "byte": "i",
        "double": "f", "float": "f",
    }
    diffs = []
    for f in spark_schema.fields:
        s_kind = numeric.get(f.dataType.typeName())
        o_kind = oracle_kinds.get(f.name)
        if s_kind and o_kind in ("i", "f") and s_kind != o_kind:
            diffs.append(f"{f.name}: spark={s_kind} oracle={o_kind}")
    return diffs


def canon_unsafe_columns(schema) -> list[str]:
    """Columns the DRIVER's canonicalizer cannot sort: its compare
    round-trips results through pandas and sorts on RAW column values,
    so an array/map/struct cell dies with ``TypeError: unhashable
    type: 'list'`` (the r11 q194/q195 failure). ``_norm_cell``'s
    ``str()`` would silently hide this, so hash-checked entries are
    REJECTED here before seating — serialize complex outputs with
    ``to_json`` on both planes instead."""
    return [
        f.name for f in schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]


def compare(spark, sf_dir: str, name: str, fn, oracle: str | None) -> dict:
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    if oracle is not None:
        bad = canon_unsafe_columns(sdf.schema)
        if bad:
            return {"name": name, "status": "CANON-UNSAFE",
                    "detail": f"driver cannot sort columns {bad}; "
                              "to_json them on both planes"}
    s_rows = [tuple(r) for r in sdf.collect()]
    res = {"name": name, "spark_rows": len(s_rows)}
    if oracle is None:
        res["status"] = "rows-only"
        return res
    o_cols, o_rows, o_kinds = run_oracle(sf_dir, oracle)
    nsc, nsr = normalize(s_cols, s_rows)
    noc, nor = normalize(o_cols, o_rows)
    res["oracle_rows"] = len(o_rows)
    kind_diffs = _dtype_kind_diffs(sdf.schema, o_kinds)
    if kind_diffs:
        res["status"] = "DTYPE-MISMATCH"
        res["detail"] = str(kind_diffs)
    elif nsc != noc:
        res["status"] = "SCHEMA-MISMATCH"
        res["detail"] = f"spark={nsc} oracle={noc}"
    elif len(nsr) != len(nor):
        res["status"] = "ROWCOUNT-MISMATCH"
    elif nsr != nor:
        res["status"] = "VALUE-MISMATCH"
        diffs = [(a, b) for a, b in zip(nsr, nor) if a != b][:3]
        res["detail"] = str(diffs)
    else:
        res["status"] = "OK"
    return res


# ------------------------------------------------ differential oracles
# Entries whose semantics no SQL engine reproduces (iterative float
# algorithms) but whose result is DETERMINISTIC: an INDEPENDENT
# in-harness reference (pure Python, no shared code with the operator)
# computes the expected rows and the same normalize/hash compare runs —
# the q150 differential precedent promoted to registry level (r6
# verdict task 8). The driver still records these as rows-only (it only
# knows SQL oracles); this harness and the judge's re-run see values.
def _q89_reference(spark, sf_dir: str):
    """Pure-Python PageRank (dict arithmetic — no numpy, no code shared
    with operators/graph.py) over the same persisted near-dup pair
    table q89 reads: symmetrize, 6 damped power-iteration rounds from
    the uniform vector, round to 6, top-20 by (rank desc, id)."""
    from dbt_nlp_sqlizer_team04_spark.operators.dedup import pairs_table_for

    pairs = spark.table(pairs_table_for(spark, sf_dir)).collect()
    edges: set[tuple[int, int]] = set()
    for r in pairs:
        a, b = int(r["id_a"]), int(r["id_b"])
        if a != b:
            edges.add((a, b))
            edges.add((b, a))
    nodes = sorted({a for a, _ in edges})
    n = len(nodes)
    if n == 0:
        return ["id", "rank"], []
    deg: dict[int, int] = {}
    for a, _ in edges:
        deg[a] = deg.get(a, 0) + 1
    damping, base = 0.85, 0.15 / n
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(6):
        mass = dict.fromkeys(nodes, 0.0)
        for a, b in sorted(edges):  # deterministic accumulation order
            mass[b] += rank[a] / deg[a]
        rank = {v: base + damping * mass[v] for v in nodes}
    top = sorted(
        ((v, round(rank[v], 6)) for v in nodes),
        key=lambda kv: (-kv[1], kv[0]),
    )[:20]
    return ["id", "rank"], [tuple(kv) for kv in top]


def _q110_reference(spark, sf_dir: str):
    """Pure-Python Sennrich BPE (dict get_stats/merge_vocab — no code
    shared with operators/text.py) over the same documents corpus:
    whitespace vocab, 10 greedy merges, ties broken (weight desc, left,
    right) — the test_differential reference promoted to registry
    level against the real corpus."""
    from dbt_nlp_sqlizer_team04_spark.sources.parquet import load_table

    rows = load_table(spark, sf_dir, "documents").select("text").collect()
    vocab: dict[tuple, int] = {}
    for r in rows:
        for term in (r["text"] or "").strip().lower().split():
            if term:
                key = tuple(term)
                vocab[key] = vocab.get(key, 0) + 1
    merges = []
    for step in range(10):
        stats: dict[tuple, int] = {}
        for syms, tf in vocab.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] = stats.get((a, b), 0) + tf
        if not stats:
            break
        (left, right), w = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, left, right, w))
        new_vocab: dict[tuple, int] = {}
        for syms, tf in vocab.items():
            s, i, out = list(syms), 0, []
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + tf
        vocab = new_vocab
    return ["step", "left", "right", "weight"], merges


def _q130_reference(spark, sf_dir: str):
    """Pure-Python MMR (Carbonell & Goldstein greedy — no code shared
    with operators/similarity.py) over the same embeddings: exact
    cosine shortlist-50 around vec_id 0 (left-fold dot products — the
    same IEEE order as the JVM aggregate()), 6dp HALF_UP relevance
    (Spark round), HALF_EVEN pairwise sims and scores (numpy round),
    λ=0.7, k=10, ties on id."""
    from decimal import ROUND_HALF_UP, Decimal

    from dbt_nlp_sqlizer_team04_spark.sources.parquet import load_table

    rows = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    vecs = {int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in rows}
    q = vecs[0]

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def norm(a):
        acc = 0.0
        for x in a:
            acc = acc + x * x
        return math.sqrt(acc)

    def r6up(x):  # Spark F.round: HALF_UP on the exact binary value
        return float(
            Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        )

    nq = norm(q)
    cand = []
    for vid, v in vecs.items():
        if vid == 0:
            continue
        nn = norm(v) * nq
        cand.append((vid, r6up(dot(v, q) / nn) if nn > 0 else 0.0))
    cand.sort(key=lambda t: (-t[1], t[0]))
    cand = cand[:50]
    nvecs = []
    for vid, _ in cand:
        v, nv = vecs[vid], norm(vecs[vid])
        nvecs.append([x / nv if nv > 0 else 0.0 for x in v])
    sims = [
        [round(dot(a, b), 6) for b in nvecs] for a in nvecs
    ]  # builtin round = HALF_EVEN, numpy's contract
    lam, picked, scores = 0.7, [], []
    avail = list(range(len(cand)))
    while avail and len(picked) < 10:
        best_i, best_key = None, None
        for i in avail:
            red = max((sims[i][j] for j in picked), default=0.0)
            mmr = lam * cand[i][1] - (1.0 - lam) * red
            key = (-mmr, cand[i][0])
            if best_key is None or key < best_key:
                best_i, best_key = i, key
        picked.append(best_i)
        scores.append(round(-best_key[0], 6))
        avail.remove(best_i)
    out = [
        (r + 1, cand[j][0], cand[j][1], scores[r])
        for r, j in enumerate(picked)
    ]
    return ["rank", "vec_id", "cosine", "mmr"], out


def _q39_reference(spark, sf_dir: str):
    """Closed-form twin of the synthetic-media decode rollup (pure
    arithmetic, no code shared with operators/multimodal.py): the media
    table derives entirely from the id — modality cycles
    image/audio/video, w=16+(i%8)·4, h=16+(i%5)·4, frames=1+(i%10),
    payload = 12-byte header + (w·h mod 4096) fill bytes — so the
    per-modality stats of the mapInPandas decode path are computable
    without Spark."""
    stats: dict[str, list] = {}
    for i in range(64):
        modality = ("image", "audio", "video")[i % 3]
        w, fr = 16 + (i % 8) * 4, 1 + (i % 10)
        h = 16 + (i % 5) * 4
        n_bytes = 12 + (w * h % 4096)
        s = stats.setdefault(modality, [0, 0, 0, 0])
        s[0] += 1
        s[1] = max(s[1], w)
        s[2] = max(s[2], fr)
        s[3] += n_bytes
    rows = [
        (m, s[0], s[1], s[2], s[3]) for m, s in sorted(stats.items())
    ]
    return (
        ["modality", "n_items", "max_width", "max_frames", "total_bytes"],
        rows,
    )


def _spark_round(x: float, nd: int = 6) -> float:
    """Spark ROUND(double, nd) twin: HALF_UP over the shortest decimal
    repr (Spark routes doubles through BigDecimal.valueOf, which uses
    Double.toString — Python's repr is the same shortest form), where
    Python's round() is HALF_EVEN."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(
            Decimal(1).scaleb(-nd), rounding=ROUND_HALF_UP
        )
    )


def _spark_round6(x: float) -> float:
    return _spark_round(x, 6)


def _cos_leftfold(a: list[float], b: list[float]) -> float:
    """cosine_expr twin: F.aggregate is a LEFT FOLD from 0.0 — replicate
    the accumulation order so the double is bit-identical."""
    d = 0.0
    for x, y in zip(a, b):
        d = d + x * y
    sa = 0.0
    for x in a:
        sa = sa + x * x
    sb = 0.0
    for y in b:
        sb = sb + y * y
    nn = math.sqrt(sa) * math.sqrt(sb)
    return d / nn if nn > 0 else 0.0


def _pq_reference_index(sf_dir: str):
    """Independent numpy replay of the PQ ingest (Jégou et al. IVFADC):
    content-addressed 4096-sample (md5-of-id order), seeded per-subspace
    Lloyd k-means, then whole-corpus encoding — the same published
    algorithm re-derived from the parquet file, no engine code called.
    Returns (ids, raw float64 vectors, codebooks, codes)."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(table_path(sf_dir, "embeddings"),
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    vecs = [list(map(float, v)) for v in t.column("embedding").to_pylist()]
    by_id = dict(zip(ids, vecs))
    sample_ids = sorted(
        ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest()
    )[:4096]
    x = np.asarray([by_id[i] for i in sample_ids], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1), 1e-12)[:, None]
    n, dim = x.shape
    m, k = 16, 16
    sub = dim // m
    rng = np.random.default_rng(42)
    books = []
    for j in range(m):
        xs = x[:, j * sub:(j + 1) * sub]
        cent = xs[rng.choice(n, size=k, replace=False)].copy()
        for _ in range(25):
            d = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cent[c] = xs[mask].mean(axis=0)
        books.append(cent)
    allx = np.asarray([by_id[i] for i in ids], dtype=np.float64)
    allx /= np.maximum(np.linalg.norm(allx, axis=1), 1e-12)[:, None]
    codes = np.empty((len(ids), m), dtype=np.int64)
    for j in range(m):
        xs = allx[:, j * sub:(j + 1) * sub]
        d = -2.0 * (xs @ books[j].T) + (books[j] ** 2).sum(axis=1)
        codes[:, j] = d.argmin(axis=1)
    return ids, {i: by_id[i] for i in ids}, books, codes


def _pq_search_reference(
    sf_dir: str, cand_ids: set | None, refine: int, query_id: int = 0
):
    """ADC shortlist + exact left-fold rerank over an optional candidate
    set (None = whole corpus) — the search half shared by the q65 and
    q176 references."""
    import numpy as np

    ids, by_id, books, codes = _pq_reference_index(sf_dir)
    m, sub = len(books), books[0].shape[1]
    q = np.asarray(by_id[query_id], dtype=np.float64)
    q /= max(float(np.linalg.norm(q)), 1e-12)
    lut = np.stack([books[j] @ q[j * sub:(j + 1) * sub] for j in range(m)])
    adc = lut[np.arange(m)[None, :], codes].sum(axis=1)
    scored = [
        (i, s) for i, s in zip(ids, adc)
        if i != query_id and (cand_ids is None or i in cand_ids)
    ]
    scored.sort(key=lambda t: (-t[1], t[0]))
    shortlist = [i for i, _ in scored[:refine]]
    qn = [float(v) for v in q]
    rer = [
        (i, _spark_round6(_cos_leftfold(by_id[i], qn))) for i in shortlist
    ]
    rer.sort(key=lambda t: (-t[1], t[0]))
    return ["vec_id", "cosine"], rer[:10]


def _q65_reference(spark, sf_dir: str):
    """PQ+refine twin of q65: ADC over the whole corpus, 50-shortlist,
    exact rerank (numpy replay of the published pipeline — no code
    shared with operators/similarity.py)."""
    return _pq_search_reference(sf_dir, None, refine=50)


def _q176_reference(spark, sf_dir: str):
    """IVFADC twin of q176: the persisted IVF cell assignments are the
    ingest artifact taken as given (the q89 pairs-table precedent); the
    reference re-derives codebooks/codes from the parquet, ranks cells
    by pure-Python centroid cosine, prunes to the 6 probed cells, and
    replays ADC + 100-shortlist + exact rerank."""
    from dbt_nlp_sqlizer_team04_spark.operators.similarity import (
        ivf_table_for,
    )

    ivf_name = ivf_table_for(spark, sf_dir)
    cells = {
        r["vec_id"]: r["cell"]
        for r in spark.table(ivf_name).select("vec_id", "cell").collect()
    }
    centroids = {
        r["cell"]: list(r["centroid"])
        for r in spark.table(f"{ivf_name}_centroids").collect()
    }
    import pyarrow.parquet as pq

    t = pq.read_table(table_path(sf_dir, "embeddings"),
                      columns=["vec_id", "embedding"])
    qvec = None
    for i, v in zip(t.column("vec_id").to_pylist(),
                    t.column("embedding").to_pylist()):
        if i == 0:
            qvec = list(map(float, v))
            break

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return dot / (na * nb) if na and nb else 0.0

    probe = set(
        sorted(centroids, key=lambda c: -cos(qvec, centroids[c]))[:6]
    )
    cand = {i for i, c in cells.items() if c in probe}
    return _pq_search_reference(sf_dir, cand, refine=100)


def _unigram_reference_model(sf_dir: str):
    """Pure-Python replay of the unigram-LM trainer (Kudo 2018 seed+EM
    — tokenize, substring seeding, 3 Viterbi/re-estimate rounds; no
    code shared with operators/text.py). Returns (logp, counts,
    per-doc token lists, sources)."""
    import math as _math
    import re

    import pyarrow.parquet as pq

    t = pq.read_table(table_path(sf_dir, "documents"),
                      columns=["text", "source"])
    texts = t.column("text").to_pylist()
    sources = t.column("source").to_pylist()
    tf: dict[str, int] = {}
    doc_toks: list[list[str]] = []
    for txt in texts:
        terms = [w for w in re.split(r"\s+", txt.lower(), flags=re.ASCII)
                 if w != ""]
        doc_toks.append(terms)
        for w in terms:
            tf[w] = tf.get(w, 0) + 1
    ml, unk = 6, -20.0
    wts: dict[str, int] = {}
    for term, f in tf.items():
        n = len(term)
        for i in range(n):
            for j in range(i + 1, min(i + ml, n) + 1):
                p = term[i:j]
                wts[p] = wts.get(p, 0) + f
    seed = dict(sorted(wts.items(), key=lambda kv: (-kv[1], kv[0]))[:200])
    for p, w in wts.items():
        if len(p) == 1:
            seed[p] = w

    def viterbi(term: str, lp: dict[str, float]) -> list[str]:
        n = len(term)
        dp = [0.0] * (n + 1)
        back = [0] * (n + 1)
        for i in range(1, n + 1):
            best, bj = None, 0
            for plen in range(1, min(ml, i) + 1):
                j = i - plen
                piece = term[j:i]
                v = lp.get(piece)
                if v is None:
                    if plen > 1:
                        continue
                    v = unk
                s = dp[j] + v
                if best is None or s > best:
                    best, bj = s, j
            dp[i] = best if best is not None else unk
            back[i] = bj
        out, i = [], n
        while i > 0:
            j = back[i]
            out.append(term[j:i])
            i = j
        out.reverse()
        return out

    def mstep(counts: dict[str, int]) -> dict[str, float]:
        total = sum(counts.values())
        v = len(seed)
        return {p: _math.log((counts.get(p, 0) + 1) / (total + v))
                for p in seed}

    logp = mstep(seed)
    counts = dict(seed)
    for _ in range(3):
        c: dict[str, int] = {}
        for term, f in tf.items():
            for piece in viterbi(term, logp):
                if piece in logp:
                    c[piece] = c.get(piece, 0) + f
        counts = c
        logp = mstep(counts)
    return logp, counts, viterbi, doc_toks, sources


def _q182_reference(spark, sf_dir: str):
    logp, counts, _vit, _dt, _src = _unigram_reference_model(sf_dir)
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    return (
        ["piece", "count", "logprob"],
        [(p, c, round(logp[p], 6)) for p, c in top],
    )


def _q183_reference(spark, sf_dir: str):
    logp, _counts, viterbi, doc_toks, sources = _unigram_reference_model(
        sf_dir
    )
    units = {t: len(viterbi(t, logp))
             for t in {w for ts in doc_toks for w in ts}}
    agg: dict[str, list[int]] = {}
    for src, toks in zip(sources, doc_toks):
        a = agg.setdefault(src, [0, 0, 0])
        for w in toks:
            u = units[w]
            a[0] += 1
            a[1] += u
            a[2] += 1 if u >= 3 else 0
    rows = [
        (s, a[0], a[1], _spark_round(a[2] / a[0], 6),
         _spark_round(a[1] / a[0], 4))
        for s, a in sorted(agg.items())
    ]
    return ["source", "n_tokens", "n_units", "frag_rate", "avg_units"], rows


# --- pure-Python xxHash64 (Collet's published spec), validated
# bit-for-bit against Spark's xxhash64 incl. the multi-column chaining
# (each column hashed with the running hash as seed, ints via the
# 4-byte lane, longs via the 8-byte lane, strings as UTF-8 bytes,
# default seed 42). Enables independent replays of every hash-defined
# operator (SimHash, MinHash) with NO engine code involved.
_XXH_M = (1 << 64) - 1
_XXH_P1 = 0x9E3779B185EBCA87
_XXH_P2 = 0xC2B2AE3D27D4EB4F
_XXH_P3 = 0x165667B19E3779F9
_XXH_P4 = 0x85EBCA77C2B2AE63
_XXH_P5 = 0x27D4EB2F165667C5


def _xxh_rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _XXH_M


def _xxh_round(acc: int, inp: int) -> int:
    acc = (acc + inp * _XXH_P2) & _XXH_M
    return (_xxh_rotl(acc, 31) * _XXH_P1) & _XXH_M


def _xxh_merge(acc: int, val: int) -> int:
    acc ^= _xxh_round(0, val)
    return (acc * _XXH_P1 + _XXH_P4) & _XXH_M


def _xxh_fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _XXH_P2) & _XXH_M
    h ^= h >> 29
    h = (h * _XXH_P3) & _XXH_M
    return h ^ (h >> 32)


def xxh64_bytes(data: bytes, seed: int = 42) -> int:
    n, i = len(data), 0
    if n >= 32:
        v1 = (seed + _XXH_P1 + _XXH_P2) & _XXH_M
        v2 = (seed + _XXH_P2) & _XXH_M
        v3 = seed & _XXH_M
        v4 = (seed - _XXH_P1) & _XXH_M
        while i + 32 <= n:
            v1 = _xxh_round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _xxh_round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _xxh_round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _xxh_round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (
            _xxh_rotl(v1, 1) + _xxh_rotl(v2, 7)
            + _xxh_rotl(v3, 12) + _xxh_rotl(v4, 18)
        ) & _XXH_M
        h = _xxh_merge(h, v1)
        h = _xxh_merge(h, v2)
        h = _xxh_merge(h, v3)
        h = _xxh_merge(h, v4)
    else:
        h = (seed + _XXH_P5) & _XXH_M
    h = (h + n) & _XXH_M
    while i + 8 <= n:
        h ^= _xxh_round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_xxh_rotl(h, 27) * _XXH_P1 + _XXH_P4) & _XXH_M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _XXH_P1) & _XXH_M
        h = (_xxh_rotl(h, 23) * _XXH_P2 + _XXH_P3) & _XXH_M
        i += 4
    while i < n:
        h ^= (data[i] * _XXH_P5) & _XXH_M
        h = (_xxh_rotl(h, 11) * _XXH_P1) & _XXH_M
        i += 1
    return _xxh_fmix(h)


def xxh64_int(i32: int, seed: int) -> int:
    h = (seed + _XXH_P5 + 4) & _XXH_M
    h ^= ((i32 & 0xFFFFFFFF) * _XXH_P1) & _XXH_M
    h = (_xxh_rotl(h, 23) * _XXH_P2 + _XXH_P3) & _XXH_M
    return _xxh_fmix(h)


def xxh64_long(i64: int, seed: int) -> int:
    h = (seed + _XXH_P5 + 8) & _XXH_M
    h ^= _xxh_round(0, i64 & _XXH_M)
    h = (_xxh_rotl(h, 27) * _XXH_P1 + _XXH_P4) & _XXH_M
    return _xxh_fmix(h)


def _xxh_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def _py_tokens(text) -> list[str]:
    """tokens_expr twin: split(trim(lower(text)), '\\s+') with Java's
    \\s class ([ \\t\\n\\x0B\\f\\r]), empty text → ['']."""
    import re

    t = (text if isinstance(text, str) else "").lower().strip(
        " \t\n\x0b\f\r"
    )
    return re.split("[ \t\n\x0b\f\r]+", t)


def _py_shingles(toks: list[str], n: int = 3) -> list[str]:
    """shingles_expr twin: distinct word n-grams (first-occurrence
    order), whole-text fallback under n tokens."""
    if len(toks) < n:
        return [" ".join(toks)]
    seen, out = set(), []
    for i in range(len(toks) - n + 1):
        g = " ".join(toks[i:i + n])
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


def _q24_reference(spark, sf_dir: str):
    """Independent sign-LSH replay (Charikar's SimHash-for-angles):
    the same stdlib random.Random(42) Gaussian hyperplanes, the same
    left-fold dot-product sign bits (bit-identical doubles — the plan's
    F.aggregate is a left fold over the float32→float64 round-trip),
    the integer band fold, arrays-overlap candidacy against vec 0's
    bands, exact left-fold cosine rerank, HALF_UP 6dp, top-10 on
    (desc cosine, vec_id). No engine code called."""
    import random

    import pyarrow.parquet as pq

    t = pq.read_table(
        table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    )
    ids = t["vec_id"].to_pylist()
    embs = [[float(x) for x in e] for e in t["embedding"].to_pylist()]
    dim, n_bits, n_bands = 64, 16, 4
    rng = random.Random(42)
    planes = [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)
    ]

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def bands_of(vec):
        bits = [1 if dot(vec, hp) >= 0.0 else 0 for hp in planes]
        per = n_bits // n_bands
        out = []
        for b in range(n_bands):
            h = b
            for bit in bits[b * per:(b + 1) * per]:
                h = h * 2 + bit
            out.append(h)
        return out

    q = embs[ids.index(0)]
    qb = set(bands_of(q))
    rows = []
    for vid, e in zip(ids, embs):
        if vid == 0:
            continue
        if qb & set(bands_of(e)):
            rows.append((int(vid), _spark_round(_cos_leftfold(e, q), 6)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return ["vec_id", "cosine"], rows[:10]


def _q28_reference(spark, sf_dir: str):
    """Independent MinHash-LSH replay: shingle → 16 seeded min-hashes
    (min over SIGNED longs — Spark's array_min ordering) → 4 banded
    bucket ids (the same running-seed multi-column xxhash64 chain) →
    in-bucket candidate pairs → exact shingle-Jaccard ≥ 0.5 with
    HALF_UP 6dp. Every hash from the spec-level xxHash64 above — no
    engine code involved."""
    import pandas as pd

    pdf = pd.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "text"]
    )
    K, BANDS, PER = 16, 4, 4
    seeds = [xxh64_int(j, 42) for j in range(K)]
    band_seeds = [xxh64_int(b, 42) for b in range(BANDS)]
    sh_sets: dict[int, set] = {}
    buckets: dict[int, list[int]] = {}
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        did = int(doc_id)
        grams = _py_shingles(_py_tokens(text))
        sh_sets[did] = set(grams)
        gb = [g.encode() for g in grams]
        # min over SIGNED values — Spark's array_min compares longs in
        # two's complement, so the sign conversion must precede the min
        mins = [
            min(_xxh_signed(xxh64_bytes(g, s)) for g in gb) for s in seeds
        ]
        for b in range(BANDS):
            h = band_seeds[b]
            for part in mins[b * PER:(b + 1) * PER]:
                h = xxh64_long(part, h)
            buckets.setdefault(_xxh_signed(h), []).append(did)
    pairs = set()
    for ids in buckets.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    rows = []
    for a, b in sorted(pairs):
        sa, sb = sh_sets[a], sh_sets[b]
        jac = _spark_round(len(sa & sb) / len(sa | sb), 6)
        if jac >= 0.5:
            rows.append((a, b, jac))
    return ["id_a", "id_b", "jaccard"], rows


def _q29_reference(spark, sf_dir: str):
    """Independent SimHash replay (Charikar 2002): per token
    xxhash64(token), per-bit +1/-1 votes over ALL tokens (duplicates
    included — the engine folds the raw token array), sign-fold into a
    signed 64-bit long with bit 63 as the two's-complement min-long
    weight."""
    import pandas as pd

    pdf = pd.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "text"]
    )
    rows = []
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        votes = [0] * 64
        for t in _py_tokens(text):
            h = xxh64_bytes(t.encode())
            for b in range(64):
                votes[b] += 1 if (h >> b) & 1 else -1
        v = 0
        for b in range(64):
            if votes[b] >= 0:
                v += -(1 << 63) if b == 63 else (1 << b)
        rows.append((int(doc_id), v))
    rows.sort()
    return ["doc_id", "simhash"], rows


def _q67_reference(spark, sf_dir: str):
    """Driver-side single-machine replay of q67's chunk-retrieval path:
    chunk in a plain Python loop (same 500-char windows, 400 stride,
    substring semantics incl. the one-empty-chunk-for-empty-text
    contract), the same md5-ordered 2048-text encoder fit, then numpy
    encode + the left-fold cosine over EVERY chunk, HALF_UP 6dp, rank
    desc with (doc_id, chunk_id) tie-break, top-5. The pure-numpy
    encoder module is shared (it is already driver-side code); what the
    differential proves is the DISTRIBUTED plumbing — the persisted
    mapInPandas encode table, the float32 round-trip, the cosine fold
    and the TakeOrdered top-k — reproduces the single-machine answer."""
    import hashlib

    import pandas as pd

    from dbt_nlp_sqlizer_team04_spark.models.embedder import (
        HashingTfidfEncoder,
    )

    pdf = pd.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "text"]
    )
    chunks = []
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        t = text if isinstance(text, str) else ""
        last = max(len(t) - 1, 0)
        off, cid = 0, 0
        while True:
            chunks.append((int(doc_id), cid, t[off:off + 500]))
            cid += 1
            off += 400
            if off > last:
                break
    sample = sorted(
        chunks,
        key=lambda c: hashlib.md5(f"{c[0]}_{c[1]}".encode()).hexdigest(),
    )[:2048]
    enc = HashingTfidfEncoder(dim=256).fit([c[2] for c in sample])
    q_text = pdf.loc[pdf["doc_id"] == 0, "text"].iloc[0][:200]
    q = [float(x) for x in enc.encode(q_text)]
    scored = []
    for doc_id, cid, text in chunks:
        emb = [float(x) for x in enc.encode(text)]
        scored.append((doc_id, cid, _spark_round(_cos_leftfold(emb, q), 6)))
    scored.sort(key=lambda r: (-r[2], r[0], r[1]))
    return ["doc_id", "chunk_id", "cosine"], scored[:5]


def _q63_reference(spark, sf_dir: str):
    """SemDeDup replay over the persisted TWO-probe IVF artifact: per
    cell the same numpy normalize + gemm (identical dtype/ops → bit-
    identical cosines before the 6dp round), pairs ≥ 0.4 deduped across
    shared cells, union-find transitive closure with min-id canonical
    labels, cluster sizes over rank-0 rows. The KMeans geometry is the
    artifact (q43's convention); everything downstream is re-derived."""
    import numpy as np

    from dbt_nlp_sqlizer_team04_spark.operators.similarity import (
        ivf_table_for,
    )

    name = ivf_table_for(spark, sf_dir, n_probe_assign=2)
    rows = spark.table(name).collect()
    cells: dict[int, list] = {}
    primary: dict[int, int] = {}
    for r in rows:
        cells.setdefault(int(r["cell"]), []).append(
            (int(r["vec_id"]), r["embedding"])
        )
        if r["probe_rank"] == 0:
            primary[int(r["vec_id"])] = int(r["cell"])
    pairs: set[tuple[int, int]] = set()
    for members in cells.values():
        ids = np.asarray([i for i, _v in members])
        m = np.asarray(
            [np.asarray(v, dtype=np.float64) for _i, v in members]
        )
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        sim = mn @ mn.T
        iu = np.triu_indices(len(ids), k=1)
        cos = np.round(sim[iu], 6)
        keep = cos >= 0.4
        for a, b in zip(ids[iu[0][keep]], ids[iu[1][keep]]):
            pairs.add((int(min(a, b)), int(max(a, b))))
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in sorted(pairs):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    comp = {i: find(i) for i in primary}
    sizes: dict[int, int] = {}
    for c in comp.values():
        sizes[c] = sizes.get(c, 0) + 1
    out = [
        (i, primary[i], comp[i], sizes[comp[i]], int(i == comp[i]))
        for i in sorted(primary)
    ]
    return ["vec_id", "cell", "component", "cluster_size",
            "is_canonical"], out


def _q124_reference(spark, sf_dir: str):
    """IVF k-NN-graph replay over the persisted 2-probe cells (q63's
    convention): per cell the same numpy normalize + gemm + 6dp round +
    stable id-tie-broken local top-k, max-merge of shared-cell pairs,
    global top-5 per id under (cosine desc, nbr) with 1-based ranks."""
    import numpy as np

    from dbt_nlp_sqlizer_team04_spark.operators.similarity import (
        ivf_table_for,
    )

    name = ivf_table_for(spark, sf_dir, n_probe_assign=2)
    rows = spark.table(name).collect()
    cells: dict[int, list] = {}
    for r in rows:
        cells.setdefault(int(r["cell"]), []).append(
            (int(r["vec_id"]), r["embedding"])
        )
    best: dict[tuple[int, int], float] = {}
    for members in cells.values():
        if len(members) < 2:
            continue
        ids = np.asarray([i for i, _v in members])
        m = np.asarray(
            [np.asarray(v, dtype=np.float64) for _i, v in members]
        )
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        m = m / norms[:, None]
        order = np.argsort(ids, kind="stable")
        idb, mb = ids[order], m[order]
        cos = np.round(m @ mb.T, 6)
        cos[ids[:, None] == idb[None, :]] = -np.inf
        kk = min(5, cos.shape[1] - 1)
        top = np.argsort(-cos, axis=1, kind="stable")[:, :kk]
        for rix, i in enumerate(ids):
            for t in top[rix]:
                v = cos[rix, t]
                if np.isneginf(v):
                    continue
                key = (int(i), int(idb[t]))
                if v > best.get(key, -2.0):
                    best[key] = float(v)
    by_id: dict[int, list] = {}
    for (i, nbr), v in best.items():
        by_id.setdefault(i, []).append((v, nbr))
    out = []
    for i in sorted(by_id):
        for rank, (v, nbr) in enumerate(
            sorted(by_id[i], key=lambda t: (-t[0], t[1]))[:5], start=1
        ):
            out.append((i, nbr, v, rank))
    return ["id", "nbr", "cosine", "rank"], out


def _q40_reference(spark, sf_dir: str):
    """Closed-form replay of the media-embedding top-k (the q39
    precedent): the synthetic payloads derive from media_id alone
    (header + fill-byte body), the stub embedding is sha256 → repeated
    big-endian uint32 lanes → [-1,1] scale → float64 L2-normalize →
    float32 — all recomputed here from the spec; then the float32
    round-trip, left-fold cosine, HALF_UP 6dp, top-5 on (desc cosine,
    id), id 0 excluded."""
    import hashlib
    import struct

    import numpy as np

    def payload(i: int) -> bytes:
        w, h, fr = 16 + (i % 8) * 4, 16 + (i % 5) * 4, 1 + (i % 10)
        body = bytes([i % 256]) * (w * h % 4096)
        return struct.pack(">4sHHI", b"FAKE", w, h, fr) + body

    def embed(raw: bytes) -> list[float]:
        digest = hashlib.sha256(raw).digest()
        need = 16 * 4
        buf = (digest * (need // len(digest) + 1))[:need]
        v = np.frombuffer(buf, dtype=">u4").astype(np.float64)
        v = (v / np.iinfo(np.uint32).max) * 2.0 - 1.0
        n = np.linalg.norm(v)
        return [float(x) for x in (v / n if n else v).astype(np.float32)]

    embs = {i: embed(payload(i)) for i in range(64)}
    q = embs[0]
    scored = sorted(
        (
            (i, _spark_round(_cos_leftfold(e, q), 6))
            for i, e in embs.items()
            if i != 0
        ),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    return ["media_id", "cosine"], scored


def _q43_reference(spark, sf_dir: str):
    """Query-side IVF replay over the persisted ingest artifacts (the
    q89 pairs-table precedent): centroids + cell assignments read from
    the index tables, cell ranking re-derived with the same driver
    cosine arithmetic, candidate set = the 6 probed cells' rows, exact
    left-fold cosine rerank, HALF_UP 6dp, top-10 on (desc cosine, id).
    Verifies the partition-pruned scan, the probe-rank dedup, and the
    rerank math; the KMeans fit itself is the artifact (Spark ML's
    distributed float reductions are not bit-replayable)."""
    from dbt_nlp_sqlizer_team04_spark.operators.similarity import (
        ivf_table_for,
    )

    name = ivf_table_for(spark, sf_dir)
    cent = {
        int(r["cell"]): [float(x) for x in r["centroid"]]
        for r in spark.table(f"{name}_centroids").collect()
    }
    rows = spark.table(name).collect()

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return dot / (na * nb) if na and nb else 0.0

    by_id = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in rows
        if r["probe_rank"] == 0
    }
    q = by_id[0]
    probe = set(sorted(cent, key=lambda i: -cos(q, cent[i]))[:6])
    cand = {
        int(r["vec_id"])
        for r in rows
        if r["probe_rank"] == 0 and int(r["cell"]) in probe
        and int(r["vec_id"]) != 0
    }
    scored = sorted(
        (
            (vid, _spark_round(_cos_leftfold(by_id[vid], q), 6))
            for vid in cand
        ),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    return ["vec_id", "cosine"], scored


def _wp_reference_model(sf_dir: str):
    """Pure-Python WordPiece trainer replay (Schuster & Nakajima
    likelihood merges, BERT '##' convention) — no engine code: term
    frequencies from the parquet, 10 rounds of pair/symbol counting,
    exact integer counts → one IEEE division per pair, ties on
    (score desc, weight desc, left, right)."""
    import pandas as pd

    pdf = pd.read_parquet(table_path(sf_dir, "documents"),
                          columns=["text"])
    tf: dict[str, int] = {}
    for text in pdf["text"]:
        for t in _py_tokens(text):
            if t:
                tf[t] = tf.get(t, 0) + 1

    def syms_of(t):
        return [t[0]] + ["##" + c for c in t[1:]]

    def rewrite(syms, left, right):
        fused = left + right[2:]
        s, i, n = [], 0, len(syms)
        while i < n:
            if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                s.append(fused)
                i += 2
            else:
                s.append(syms[i])
                i += 1
        return s

    work = [(syms_of(t), w) for t, w in tf.items()]
    merges = []
    for step in range(10):
        pc: dict[tuple, int] = {}
        sc: dict[str, int] = {}
        for syms, w in work:
            for s in syms:
                sc[s] = sc.get(s, 0) + w
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + w
        if not pc:
            break
        score, w0, l, r = min(
            ((w0 / (sc[a] * sc[b]), w0, a, b) for (a, b), w0 in pc.items()),
            key=lambda t: (-t[0], -t[1], t[2], t[3]),
        )
        merges.append((step, l, r, w0, score))
        work = [(rewrite(syms, l, r), w) for syms, w in work]
    alphabet = {s for t in tf for s in syms_of(t)}
    vocab = alphabet | {l + r[2:] for _s, l, r, _w, _sc in merges}
    return tf, merges, vocab


def _q191_reference(spark, sf_dir: str):
    _tf, merges, _vocab = _wp_reference_model(sf_dir)
    rows = [(s, l, r, w, round(sc, 10)) for s, l, r, w, sc in merges]
    return ["step", "left", "right", "weight", "score"], rows


def _q192_reference(spark, sf_dir: str):
    """Replay train + BERT greedy longest-match apply, then the
    per-source rollup with Spark-round (HALF_UP) mirrors."""
    import pandas as pd

    _tf, _merges, vocab = _wp_reference_model(sf_dir)

    def encode(term, max_len=64):
        units, start, n = 0, 0, len(term)
        while start < n:
            end = min(n, start + max_len)
            cur = None
            while end > start:
                piece = term[start:end]
                if start > 0:
                    piece = "##" + piece
                if piece in vocab:
                    cur = end
                    break
                end -= 1
            if cur is None:
                return 1, True
            units += 1
            start = cur
        return max(units, 1), False

    pdf = pd.read_parquet(table_path(sf_dir, "documents"),
                          columns=["source", "text"])
    enc_cache: dict[str, tuple[int, bool]] = {}
    agg: dict[str, list[int]] = {}
    for src, text in zip(pdf["source"], pdf["text"]):
        a = agg.setdefault(src, [0, 0, 0, 0])
        for t in _py_tokens(text):
            if not t:
                continue
            if t not in enc_cache:
                enc_cache[t] = encode(t)
            u, isu = enc_cache[t]
            a[0] += 1
            a[1] += u
            a[2] += 1 if isu else 0
            a[3] += 1 if u >= 3 else 0
    rows = [
        (
            s,
            a[0],
            a[1],
            _spark_round(a[2] / a[0], 6),
            _spark_round(a[3] / a[0], 6),
            _spark_round(a[1] / a[0], 4),
        )
        for s, a in sorted(agg.items())
    ]
    return (
        ["source", "n_tokens", "n_units", "unk_rate", "frag_rate",
         "avg_units"],
        rows,
    )


def _q186_reference(spark, sf_dir: str):
    """Pandas groupby-ewm replay of q186's $expMovingAvg fields: the
    engine's _apply_ema runs pandas ewm(adjust=False) per user group
    inside applyInPandas, so an independent pandas pass over the same
    parquet (same alphas 2/(5+1) and 0.25, same ts sort — ts is unique
    at every SF) reproduces the recursion bit-for-bit before the
    HALF_UP 6dp round."""
    import pandas as pd

    pdf = pd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )
    pdf = pdf[pdf.user_id < 40].sort_values("ts")
    for name, alpha in (("ema5", 2.0 / 6.0), ("ema_a", 0.25)):
        pdf[name] = pdf.groupby("user_id")["value"].transform(
            lambda s, a=alpha: s.ewm(alpha=a, adjust=False).mean()
        )
    pdf = pdf.sort_values("event_id").head(800)
    rows = [
        (
            int(r.event_id),
            int(r.user_id),
            _spark_round(r.ema5, 6),
            _spark_round(r.ema_a, 6),
        )
        for r in pdf.itertuples()
    ]
    return ["event_id", "user_id", "ema5", "ema_a"], rows


def _q196_reference(spark, sf_dir: str):
    """Pure-Python replay of the DSIR selection (arXiv:2302.03169
    recipe as implemented): unigram+bigram features hashed with the
    spec-level xxh64 (unsigned % B ≡ Spark's pmod-of-signed since
    2^64 ≡ 0 mod B), add-one-smoothed target/raw multinomials,
    per-document Σ log-ratio, ordered by the ROUNDED weight (the
    operator rounds before its final sort) with doc_id tiebreak."""
    import math
    import re

    import pandas as pd

    B = 1024
    pdf = pd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "text"],
    )

    def buckets(text: str) -> list[int]:
        w = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
        feats = w + [f"{a}_{b}" for a, b in zip(w, w[1:])]
        return [xxh64_bytes(t.encode("utf-8")) % B for t in feats]

    ct = [0] * B
    cr = [0] * B
    docfeats: dict[int, tuple[str, list[int]]] = {}
    for r in pdf.itertuples():
        bs = buckets(r.text)
        if r.source == "src1":
            for b in bs:
                ct[b] += 1
        else:
            docfeats[int(r.doc_id)] = (str(r.source), bs)
            for b in bs:
                cr[b] += 1
    n_t, n_r = sum(ct), sum(cr)
    wb = [
        math.log((ct[b] + 1.0) / (n_t + B))
        - math.log((cr[b] + 1.0) / (n_r + B))
        for b in range(B)
    ]
    rows = [
        (doc_id, source, len(bs),
         _spark_round(math.fsum(wb[b] for b in bs), 6))
        for doc_id, (source, bs) in docfeats.items()
    ]
    rows.sort(key=lambda t: (-t[3], t[0]))
    return ["doc_id", "source", "n_feats", "w"], rows[:20]


def _nl67_reference(spark, sf_dir: str):
    """Pandas groupby-ewm replay of nl67's NL-compiled $expMovingAvg:
    the template emits N=7 (α = 2/8 = 0.25) per event_type over the ts
    sort with the {ts, event_id} final sort and the injected LIMIT 100
    — an independent pandas pass over the same parquet reproduces the
    recursion bit-for-bit before the HALF_UP 6dp round (ts is unique
    at every SF, so the order and the head-100 cut are exact)."""
    import pandas as pd

    pdf = pd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "ts", "value"],
    )
    pdf = pdf.sort_values("ts")
    pdf["ema7_value"] = pdf.groupby("event_type")["value"].transform(
        lambda s: s.ewm(alpha=0.25, adjust=False).mean()
    )
    pdf = pdf.sort_values(["ts", "event_id"]).head(100)
    rows = [
        (
            int(r.event_id),
            str(r.event_type),
            float(r.value),
            _spark_round(r.ema7_value, 6),
        )
        for r in pdf.itertuples()
    ]
    return ["event_id", "event_type", "value", "ema7_value"], rows


DIFFERENTIAL = {
    "q39_media_decode_stats": _q39_reference,
    "q65_ann_pq_topk": _q65_reference,
    "q89_neardup_pagerank": _q89_reference,
    "q110_bpe_merges": _q110_reference,
    "q130_mmr_topk": _q130_reference,
    "q176_ann_ivfpq_topk": _q176_reference,
    "q182_unigram_lm_vocab": _q182_reference,
    "q24_ann_lsh_topk": _q24_reference,
    "q28_near_dup_minhash": _q28_reference,
    "q29_simhash_fingerprints": _q29_reference,
    "q40_media_embedding_topk": _q40_reference,
    "q43_ann_ivf_topk": _q43_reference,
    "q63_semantic_dedup": _q63_reference,
    "q124_knn_graph_ivf": _q124_reference,
    "q67_chunk_retrieval": _q67_reference,
    "q183_unigram_encode_stats": _q183_reference,
    "q186_doc_ema": _q186_reference,
    "nl67_doc_ema": _nl67_reference,
    "q196_dsir_selection": _q196_reference,
    "q191_wordpiece_merges": _q191_reference,
    "q192_wordpiece_encode_stats": _q192_reference,
}


def compare_differential(spark, sf_dir: str, name: str, fn, ref) -> dict:
    sdf = fn(spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    o_cols, o_rows = ref(spark, sf_dir)
    res = {"name": name, "spark_rows": len(s_rows), "oracle_rows": len(o_rows)}
    nsc, nsr = normalize(sdf.columns, s_rows)
    noc, nor = normalize(o_cols, o_rows)
    if nsc != noc:
        res["status"] = "SCHEMA-MISMATCH"
        res["detail"] = f"spark={nsc} ref={noc}"
    elif len(nsr) != len(nor):
        res["status"] = "ROWCOUNT-MISMATCH"
    elif nsr != nor:
        res["status"] = "VALUE-MISMATCH"
        res["detail"] = str([(a, b) for a, b in zip(nsr, nor) if a != b][:3])
    else:
        res["status"] = "OK-diff"
    return res


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None):
    from dbt_nlp_sqlizer_team04_spark.queries import ORACLE_SQL, SPARK_QUERIES
    from dbt_nlp_sqlizer_team04_spark.session import get_spark

    spark = get_spark("oracle-harness")
    failures = 0
    for name, fn in SPARK_QUERIES.items():
        if only and name not in only:
            continue
        try:
            if ORACLE_SQL.get(name) is None and name in DIFFERENTIAL:
                r = compare_differential(
                    spark, sf_dir, name, fn, DIFFERENTIAL[name]
                )
            else:
                r = compare(spark, sf_dir, name, fn, ORACLE_SQL.get(name))
        except Exception as e:  # noqa: BLE001
            r = {"name": name, "status": "ERROR", "detail": str(e)[:300]}
        if r["status"] not in ("OK", "rows-only", "OK-diff"):
            failures += 1
        print(f"{r['status']:18s} {name:32s} rows={r.get('spark_rows','?')}"
              + (f" detail={r['detail']}" if "detail" in r else ""))
    print(f"\n{failures} failures")
    return failures


if __name__ == "__main__":
    import sys

    sys.exit(1 if main(only=sys.argv[1:] or None) else 0)
