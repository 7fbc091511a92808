"""Deterministic text encoder for schema elements — the A12 analog.

The reference encodes schema-element texts with sentence-transformers
``all-MiniLM-L6-v2`` (NLP_SQLizer/backend/app/models/trainer.py:184-230).
That model isn't available here, so the "pure-MLlib tier" planned in
SURVEY.md §7.5 is implemented as a hashed TF-IDF encoder:

- tokens are hashed into a fixed ``dim``-bucket space with a *stable*
  hash (md5-based — never Python's randomized ``hash``), the HashingTF
  trick, so the vocabulary never needs to be shipped;
- IDF weights are fit on the schema-element corpus as
  idf = ln((1+N)/(1+df)) WITHOUT the classic +1 floor: structural
  boilerplate present in every element text ("column", "type", …) must
  weigh ~0 or it dilutes every cosine below the reference's 0.3
  acceptance threshold (inference.py:95) — short schema texts have no
  context for a floor to help with;
- term presence is binary (set semantics): element texts are short and
  synonym expansion repeats tokens, which would inflate norms;
- vectors are L2-normalized so dot product == cosine.

The semantic lift over the fuzzy tier comes from *identifier
segmentation + abbreviation expansion*: ``c_acctbal`` tokenizes to
``account balance`` (greedy longest-match over a common database
abbreviation lexicon), so a question saying "balance" matches a column
the character-level fuzzy matcher cannot. Encoding is driver-side numpy
(schema elements are metadata-sized); the persisted (key, vector)
Parquet feeds the Spark-side cosine/LSH path in operators/similarity.py
for data-scale corpora.
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np

DEFAULT_DIM = 256

# Common database identifier abbreviations (general lexicon, not tied to
# any one schema).
ABBREVIATIONS: dict[str, str] = {
    "acct": "account", "bal": "balance", "mkt": "market", "seg": "segment",
    "qty": "quantity", "amt": "amount", "disc": "discount", "addr": "address",
    "num": "number", "no": "number", "desc": "description", "cust": "customer",
    "supp": "supplier", "nat": "nation", "reg": "region", "ord": "order",
    "prio": "priority", "ret": "return", "recv": "receive", "comm": "commit",
    "ext": "extended", "avg": "average", "min": "minimum", "max": "maximum",
    "cnt": "count", "tel": "telephone", "dept": "department", "emp": "employee",
    "mgr": "manager", "pos": "position", "loc": "location", "cat": "category",
    "prod": "product", "inv": "invoice", "pymt": "payment", "shipdt": "ship date",
    "char": "character", "chars": "characters", "lang": "language",
    "props": "properties", "ts": "time stamp",
}

# Word lexicon for greedy segmentation of glued identifiers
# ("acctbal" → acct+bal, "orderdate" → order+date).
_SEGMENT_WORDS = sorted(
    set(ABBREVIATIONS)
    | set(w for v in ABBREVIATIONS.values() for w in v.split())
    | {
        "order", "date", "total", "price", "key", "name", "segment", "phone",
        "priority", "status", "ship", "receipt", "flag", "line", "item",
        "part", "supplier", "customer", "nation", "region", "comment",
        "balance", "account", "market", "quantity", "tax", "size", "type",
        "container", "brand", "retail", "clerk", "mode", "instruct", "mfgr",
        "event", "user", "value", "time", "stamp", "doc", "text", "lang",
        "source", "chars", "vec", "id", "embedding", "label", "props",
    },
    key=len,
    reverse=True,
)


def segment_identifier(word: str) -> list[str]:
    """Greedy longest-match segmentation of a glued identifier against
    the lexicon; unknown remainders are kept as-is."""
    out: list[str] = []
    i, n = 0, len(word)
    while i < n:
        for w in _SEGMENT_WORDS:
            if word.startswith(w, i):
                out.append(w)
                i += len(w)
                break
        else:
            # no lexicon word at i: consume one char into a pending blob
            if out and out[-1] not in _SEGMENT_WORDS:
                out[-1] += word[i]
            else:
                out.append(word[i])
            i += 1
    return out


# English + structural stopwords dropped at encode time: question-side
# filler ("show me all …") and schema boilerplate would otherwise eat
# vector norm without ever discriminating between elements.
ENCODER_STOPWORDS = frozenset({
    "the", "a", "an", "of", "and", "to", "in", "is", "are", "by", "per",
    "for", "with", "on", "at", "or", "as", "was", "be", "do", "does",
    "what", "which", "who", "show", "me", "all", "how", "many", "much",
    "list", "give", "get", "find", "their", "there", "each", "every",
})


def tokenize(text: str) -> list[str]:
    """Lowercase word tokens; snake/dot-separated identifiers split,
    glued compounds segmented, abbreviations expanded; stopwords and
    single characters dropped."""
    raw = re.findall(r"[a-z0-9]+", text.lower())
    out: list[str] = []
    for w in raw:
        if w in ENCODER_STOPWORDS or len(w) < 2:
            continue
        parts = segment_identifier(w) if len(w) > 3 else [w]
        if len(parts) == 1:
            parts = [w]
        else:
            parts = [w] + parts  # keep the original too
        for p in parts:
            if len(p) < 2:
                continue
            exp = ABBREVIATIONS.get(p)
            if exp:
                # REPLACE the abbreviation with its expansion: emitting
                # both ("acct" and "account") doubles the rare-token mass
                # per concept and dilutes every partial match's cosine
                out.extend(exp.split())
            else:
                out.append(p)
    return out


def _bucket(token: str, dim: int) -> int:
    """Stable hashing-trick bucket (md5, never randomized hash())."""
    return int.from_bytes(hashlib.md5(token.encode()).digest()[:8], "big") % dim


class HashingTfidfEncoder:
    """Hashed TF-IDF text encoder with a fit/encode/serialize contract.

    ``fit`` learns per-bucket document frequencies on a corpus;
    ``encode`` maps text → L2-normalized float32 vector. Round-trips via
    ``to_dict``/``from_dict`` for model persistence (A21).
    """

    def __init__(self, dim: int = DEFAULT_DIM):
        self.dim = dim
        self.n_docs = 0
        self.df = np.zeros(dim, dtype=np.int64)

    def fit(self, corpus: list[str]) -> HashingTfidfEncoder:
        self.n_docs = len(corpus)
        self.df = np.zeros(self.dim, dtype=np.int64)
        for text in corpus:
            for b in {_bucket(t, self.dim) for t in tokenize(text)}:
                self.df[b] += 1
        return self

    def _idf(self) -> np.ndarray:
        # no +1 floor: ubiquitous tokens (df == n_docs) weigh ~0
        return np.log((1.0 + self.n_docs) / (1.0 + self.df))

    def encode(self, text: str) -> np.ndarray:
        vec = np.zeros(self.dim, dtype=np.float64)
        for t in {t for t in tokenize(text)}:  # binary term presence
            b = _bucket(t, self.dim)
            # vocabulary restriction: a token unseen in the fitted corpus
            # (df == 0) can never match any element — keeping it only
            # dilutes the norm and pushes true matches under the 0.3
            # acceptance threshold
            if self.df[b] > 0:
                vec[b] = 1.0
        vec *= self._idf()
        np.maximum(vec, 0.0, out=vec)
        norm = float(np.linalg.norm(vec))
        if norm > 0:
            vec /= norm
        return vec.astype(np.float32)

    def encode_many(self, texts: list[str]) -> np.ndarray:
        return np.stack([self.encode(t) for t in texts]) if texts else np.zeros((0, self.dim), np.float32)

    # ---- persistence (A21) ----
    def to_dict(self) -> dict:
        return {"dim": self.dim, "n_docs": self.n_docs, "df": self.df.tolist()}

    @classmethod
    def from_dict(cls, d: dict) -> HashingTfidfEncoder:
        enc = cls(dim=int(d["dim"]))
        enc.n_docs = int(d["n_docs"])
        enc.df = np.asarray(d["df"], dtype=np.int64)
        return enc


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    na, nb = float(np.linalg.norm(a)), float(np.linalg.norm(b))
    if na == 0 or nb == 0:
        return 0.0
    return float(np.dot(a, b) / (na * nb))


def idf_weight(n_docs: int, df: int) -> float:
    return math.log((1.0 + n_docs) / (1.0 + df)) + 1.0
