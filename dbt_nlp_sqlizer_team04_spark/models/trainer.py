"""Schema-model training + persistence — A19-A21.

Behavioral port of the reference trainer
(NLP_SQLizer/backend/app/models/trainer.py):

- element texts: "table {t}: c1, c2, ..." / "column {t}.{c} type {T}
  [primary key] [foreign key]" / "relationship a.b -> c.d"
  (trainer.py:199-227), here *enriched with the profiler's mined
  synonyms* (A8) so the hashed-TF-IDF tier gets the lexical variants
  the MiniLM model knew implicitly;
- training examples: per-table SELECT/COUNT pairs + one FK-join pair,
  capped at 20 (trainer.py:275-303). The LLM synthetic-data stage
  (trainer.py:232-273) is optional and falls back to templates — same
  ladder as the reference;
- staged progress reporting to the locked map (A22);
- persistence (trainer.py:48-97): ``metadata.json`` + ``model_info.json``
  + ``encoder.json`` + ``embeddings.parquet`` under
  ``<model_dir>/<schema_id>/`` — parquet written via pyarrow so loading
  never requires a live SparkSession, while ``embeddings_df`` exposes
  the same artifact as a (key, kind, vector) DataFrame for the
  Spark-side similarity path.
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..catalog.metadata import SchemaMetadata, generate_schema_id
from . import progress
from .embedder import HashingTfidfEncoder


def element_texts(metadata: SchemaMetadata) -> dict[str, str]:
    """key → descriptive text for every schema element
    (trainer.py:199-227 shapes, synonym-enriched)."""
    syn = metadata.synonyms
    out: dict[str, str] = {}
    for tname, info in metadata.tables.items():
        cols = ", ".join(info.column_names())
        extra = " ".join(syn.get(tname, []))
        out[f"table:{tname}"] = f"table {tname}: {cols} {extra}".strip()
        for col in info.columns:
            bits = [f"column {tname}.{col.name} type {col.type_str}"]
            if col.is_primary_key:
                bits.append("primary key")
            if col.is_foreign_key:
                bits.append("foreign key")
            variants = syn.get(col.name, [])
            if variants:
                bits.append(" ".join(variants))
            out[f"column:{tname}.{col.name}"] = " ".join(bits)
    for rel in metadata.relationships:
        key = f"fk:{rel.from_table}.{rel.from_column}"
        out[key] = (
            f"relationship {rel.from_table}.{rel.from_column} -> "
            f"{rel.to_table}.{rel.to_column}"
        )
    return out


def template_training_examples(metadata: SchemaMetadata, cap: int = 20) -> list[dict]:
    """Deterministic NL↔SQL training pairs (trainer.py:275-303 parity):
    per-table select-all + count pairs, plus one FK-join pair."""
    examples: list[dict] = []
    for tname, info in metadata.tables.items():
        cols = info.column_names()
        if not cols:
            continue
        first = ", ".join(cols[:5])
        examples.append(
            {
                "question": f"Show me all {tname}",
                "sql": f"SELECT {first} FROM {tname} LIMIT 100",
            }
        )
        examples.append(
            {
                "question": f"How many {tname} are there?",
                "sql": f"SELECT COUNT(*) FROM {tname}",
            }
        )
        if len(examples) >= cap:
            break
    if len(examples) < cap and metadata.relationships:
        rel = metadata.relationships[0]
        examples.append(
            {
                "question": f"Show {rel.from_table} with their {rel.to_table}",
                "sql": (
                    f"SELECT * FROM {rel.from_table} f JOIN {rel.to_table} t "
                    f"ON f.{rel.from_column} = t.{rel.to_column} LIMIT 100"
                ),
            }
        )
    return examples[:cap]


def describe_schema(metadata: SchemaMetadata) -> str:
    """Compact schema description for the training-data prompt
    (trainer.py:185-197 shape: one line per table with typed columns)."""
    lines = []
    for tname, info in metadata.tables.items():
        cols = ", ".join(f"{c.name} ({c.type_str})" for c in info.columns)
        lines.append(f"Table {tname}: {cols}")
    for rel in metadata.relationships:
        lines.append(
            f"FK {rel.from_table}.{rel.from_column} -> "
            f"{rel.to_table}.{rel.to_column}"
        )
    return "\n".join(lines)


def llm_training_examples(
    metadata: SchemaMetadata, chat=None, n: int = 20
) -> list[dict] | None:
    """A19: synthetic NL↔SQL training pairs from an LLM
    (trainer.py:232-273 behavior): schema-grounded prompt asking for a
    JSON array of {question, sql} pairs, tolerant parse (first [...]
    span, entries missing either key dropped), and ``None`` on ANY
    failure — unconfigured LLM, network error, unparseable response —
    so the caller falls through to the deterministic templates (A20),
    the same ladder the reference runs.

    ``chat`` is injectable for tests; defaults to the configured client.
    """
    import re

    from ..plans.llm import LLMNotConfigured, chat_complete

    chat = chat or chat_complete
    prompt = (
        "You are generating training examples for a natural language to "
        "SQL system.\n\nSchema:\n"
        f"{describe_schema(metadata)}\n\n"
        f"Generate {n} diverse natural language questions and their "
        "corresponding SQL queries.\n"
        'Format as JSON array: [{"question": "...", "sql": "..."}]\n\n'
        "Rules:\n- Only SELECT queries\n- Use explicit JOINs\n"
        "- Include WHERE, GROUP BY, ORDER BY as appropriate\n"
        "- Questions should be realistic and diverse\n"
        "- SQL should be valid ANSI SQL\n"
    )
    try:
        resp = chat(
            "You are a helpful assistant that generates training data.", prompt
        )
    except (LLMNotConfigured, OSError, TimeoutError, RuntimeError) as exc:
        # Only the failure modes the reference's ladder tolerates fall
        # through to templates (unconfigured client, network errors);
        # programming errors in an injected ``chat`` double propagate.
        logging.getLogger(__name__).debug("LLM training data unavailable: %s", exc)
        return None
    m = re.search(r"\[.*\]", resp, re.DOTALL)
    if not m:
        return None
    try:
        parsed = json.loads(m.group(0))
    except json.JSONDecodeError:
        return None
    if not isinstance(parsed, list):
        return None
    out = [
        {"question": ex["question"], "sql": ex["sql"]}
        for ex in parsed
        if isinstance(ex, dict) and "question" in ex and "sql" in ex
    ]
    return out or None


@dataclass
class SchemaModel:
    """Trained artifact bundle (trainer.py:28-97 analog)."""

    schema_id: str
    metadata: SchemaMetadata
    encoder: HashingTfidfEncoder
    keys: list[str] = field(default_factory=list)
    vectors: np.ndarray = field(default_factory=lambda: np.zeros((0, 0), np.float32))
    training_examples: list[dict] = field(default_factory=list)
    model_info: dict = field(default_factory=dict)

    # ---- persistence (A21; trainer.py:48-97) ----
    def save(self, model_dir: str) -> str:
        path = os.path.join(model_dir, self.schema_id)
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "metadata.json"), "w") as f:
            f.write(self.metadata.to_json())
        with open(os.path.join(path, "model_info.json"), "w") as f:
            json.dump(
                {
                    **self.model_info,
                    "schema_id": self.schema_id,
                    "n_elements": len(self.keys),
                    "training_examples": self.training_examples,
                },
                f,
                indent=2,
            )
        with open(os.path.join(path, "encoder.json"), "w") as f:
            json.dump(self.encoder.to_dict(), f)
        table = pa.table(
            {
                "key": pa.array(self.keys, pa.string()),
                "kind": pa.array([k.split(":", 1)[0] for k in self.keys], pa.string()),
                "vector": pa.array(
                    [v.tolist() for v in self.vectors], pa.list_(pa.float32())
                ),
            }
        )
        pq.write_table(table, os.path.join(path, "embeddings.parquet"))
        return path

    @classmethod
    def load(cls, model_dir: str, schema_id: str) -> SchemaModel:
        path = os.path.join(model_dir, schema_id)
        with open(os.path.join(path, "metadata.json")) as f:
            metadata = SchemaMetadata.from_json(f.read())
        with open(os.path.join(path, "model_info.json")) as f:
            info = json.load(f)
        with open(os.path.join(path, "encoder.json")) as f:
            encoder = HashingTfidfEncoder.from_dict(json.load(f))
        t = pq.read_table(os.path.join(path, "embeddings.parquet"))
        keys = t.column("key").to_pylist()
        vectors = np.asarray(t.column("vector").to_pylist(), dtype=np.float32)
        return cls(
            schema_id=schema_id,
            metadata=metadata,
            encoder=encoder,
            keys=keys,
            vectors=vectors,
            training_examples=info.pop("training_examples", []),
            model_info=info,
        )

    @staticmethod
    def exists(model_dir: str, schema_id: str) -> bool:
        return os.path.exists(os.path.join(model_dir, schema_id, "model_info.json"))

    def embeddings_df(self, spark):
        """The (key, kind, vector) artifact as a DataFrame — feeds
        operators/similarity.py's cosine/LSH path at scale. Built from
        the in-memory arrays (metadata-sized); the on-disk
        embeddings.parquet holds the identical rows for external
        consumers."""
        return spark.createDataFrame(
            [
                (k, k.split(":", 1)[0], self.vectors[i].tolist())
                for i, k in enumerate(self.keys)
            ],
            "key string, kind string, vector array<float>",
        )


class ModelTrainer:
    """Staged trainer (trainer.py:119-182): training data → embeddings →
    finalize, each stage reporting to the locked progress map (A22)."""

    def __init__(self, model_dir: str):
        self.model_dir = model_dir

    def train(
        self,
        metadata: SchemaMetadata,
        llm_examples: list[dict] | None = None,
        chat=None,
        use_llm: bool = True,
    ) -> SchemaModel:
        """Train the schema model. Training-example ladder (A19→A20,
        trainer.py:232-273): explicit ``llm_examples`` win; else the LLM
        synthetic-data stage runs (``chat`` injectable; silently skipped
        when unconfigured/failing/unparseable); else the deterministic
        templates."""
        schema_id = generate_schema_id(metadata)
        try:
            progress.set_progress(schema_id, "training_data", 10, "generating examples")
            examples = llm_examples
            if examples is None and use_llm:
                examples = llm_training_examples(metadata, chat=chat)
            if examples is None:
                examples = template_training_examples(metadata)

            progress.set_progress(schema_id, "embeddings", 40, "encoding schema")
            texts = element_texts(metadata)
            keys = sorted(texts)
            encoder = HashingTfidfEncoder().fit([texts[k] for k in keys])
            vectors = encoder.encode_many([texts[k] for k in keys])

            progress.set_progress(schema_id, "finalize", 90, "saving model")
            model = SchemaModel(
                schema_id=schema_id,
                metadata=metadata,
                encoder=encoder,
                keys=keys,
                vectors=vectors,
                training_examples=examples,
                model_info={"encoder": "hashing-tfidf", "dim": encoder.dim},
            )
            model.save(self.model_dir)
            progress.complete_progress(schema_id)
            return model
        except Exception as e:
            progress.set_error(schema_id, str(e))
            raise
