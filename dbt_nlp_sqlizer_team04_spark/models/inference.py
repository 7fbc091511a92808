"""Trained-model semantic schema linking — A13/A14.

Behavioral port of the reference's trained query path
(NLP_SQLizer/backend/app/models/inference.py):

- encode the question, cosine against every schema-element vector,
  keep top-20 with similarity ≥ 0.3 (inference.py:70-118, knobs at
  :94-95);
- split hits into tables / columns / relationships and derive the
  {table: [columns]} slice the downstream prompt/template tier consumes;
- keyword-containment fallback when nothing clears the threshold
  (inference.py:120-149 — reused from plans/linking.keyword_match).

The default path scores driver-side (numpy; schema elements are
metadata-sized, exactly like the reference). ``relevant_spark`` runs
the same top-k through the Spark cosine operator over the persisted
(key, vector) DataFrame — the path that scales to corpus-sized element
sets and plugs into the LSH variant (operators/similarity.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..plans.linking import keyword_match
from .trainer import SchemaModel

TOP_K = 20          # inference.py:94
THRESHOLD = 0.3     # inference.py:95
MAX_TABLES = 4      # prompt-slice caps mirror the fuzzy tier (nl2sql.py:23)
MAX_COLUMNS = 8


@dataclass
class RelevantElements:
    """inference.py:70-118's result shape. ``similarities`` holds only
    hits clearing the acceptance threshold (reference parity);
    ``raw`` holds every top-k score — downstream column *choice* can use
    sub-threshold evidence even when linking could not."""

    tables: list[str] = field(default_factory=list)
    columns: dict[str, list[str]] = field(default_factory=dict)
    similarities: dict[str, float] = field(default_factory=dict)
    raw: dict[str, float] = field(default_factory=dict)
    method: str = "semantic"

    def as_slice(self) -> dict[str, list[str]]:
        """{table: [columns]} capped like the fuzzy tier's output."""
        out: dict[str, list[str]] = {}
        for t in self.tables[:MAX_TABLES]:
            out[t] = self.columns.get(t, [])[:MAX_COLUMNS]
        return out

    def column_scores(self) -> dict[str, dict[str, float]]:
        """{table: {column: raw cosine}} over the top-k hits."""
        out: dict[str, dict[str, float]] = {}
        for key, s in self.raw.items():
            kind, rest = key.split(":", 1)
            if kind == "column":
                t, c = rest.split(".", 1)
                out.setdefault(t, {})[c] = s
        return out


class SemanticLinker:
    """Question → relevant schema elements via trained embeddings."""

    def __init__(self, model: SchemaModel):
        self.model = model

    def relevant(
        self, question: str, top_k: int = TOP_K, threshold: float = THRESHOLD
    ) -> RelevantElements:
        enc = self.model.encoder
        q = enc.encode(question)
        if not self.model.keys:
            return self._fallback(question)
        # vectors are L2-normalized → dot == cosine; one matmul, top-k
        sims = self.model.vectors @ q
        order = np.argsort(-sims)[:top_k]
        out = RelevantElements()
        schema = self.model.metadata.schema_dict()
        for i in order:
            if float(sims[i]) > 0:
                out.raw[self.model.keys[i]] = round(float(sims[i]), 6)
        for i in order:
            s = float(sims[i])
            if s < threshold:
                continue
            key = self.model.keys[i]
            out.similarities[key] = round(s, 6)
            kind, rest = key.split(":", 1)
            if kind == "table":
                if rest not in out.tables:
                    out.tables.append(rest)
            elif kind in ("column", "fk"):
                t, c = rest.split(".", 1)
                if t not in out.tables:
                    out.tables.append(t)
                cols = out.columns.setdefault(t, [])
                if c not in cols:
                    cols.append(c)
        # make every hit table usable: fill empty column lists
        for t in out.tables:
            if not out.columns.get(t):
                out.columns[t] = schema.get(t, [])[:MAX_COLUMNS]
        if not out.tables:
            return self._fallback(question)
        return out

    def _fallback(self, question: str) -> RelevantElements:
        """Keyword containment fallback (inference.py:120-149)."""
        slice_ = keyword_match(self.model.metadata.schema_dict(), question)
        return RelevantElements(
            tables=list(slice_),
            columns={t: list(cs) for t, cs in slice_.items()},
            similarities={},
            method="keyword",
        )

    # ---- the at-scale path: same top-k via the Spark cosine operator ----
    def relevant_spark(
        self, spark, question: str, top_k: int = TOP_K, threshold: float = THRESHOLD
    ):
        """Top-k schema elements computed by the distributed cosine
        operator over the persisted (key, vector) DataFrame. Returns a
        DataFrame (key, cosine) — the plan Spark would run when the
        element corpus is data-sized (e.g. per-tenant schemas × columns
        at fleet scale)."""
        from pyspark.sql import functions as F

        from ..operators.similarity import cosine_expr

        q = self.model.encoder.encode(question)
        df = self.model.embeddings_df(spark)
        qlit = F.array(*[F.lit(float(x)) for x in q.tolist()])
        cos = cosine_expr(F.col("vector").cast("array<double>"), qlit)
        return (
            df.select("key", F.round(cos, 6).alias("cosine"))
            .filter(F.col("cosine") >= threshold)
            .orderBy(F.desc("cosine"), "key")
            .limit(top_k)
        )
