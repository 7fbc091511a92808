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


def compare(spark, sf_dir: str, name: str, fn, oracle: str | None) -> dict:
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
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


DIFFERENTIAL = {
    "q39_media_decode_stats": _q39_reference,
    "q89_neardup_pagerank": _q89_reference,
    "q110_bpe_merges": _q110_reference,
    "q130_mmr_topk": _q130_reference,
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
