"""Training progress tracker — A22, a behavioral port of the
reference's thread-locked in-memory progress map
(NLP_SQLizer/backend/app/models/progress.py:15-69).

The trainer runs in a background thread (routes_models.py:205-214); the
status endpoint polls from request threads — hence the lock. State per
schema_id: {stage, percent, message, status: training|completed|error,
error}.
"""

from __future__ import annotations

import threading
from typing import Any

_lock = threading.Lock()
_progress: dict[str, dict[str, Any]] = {}


def set_progress(schema_id: str, stage: str, percent: int, message: str = "") -> None:
    with _lock:
        _progress[schema_id] = {
            "stage": stage,
            "percent": int(percent),
            "message": message,
            "status": "training",
            "error": None,
        }


def complete_progress(schema_id: str, message: str = "done") -> None:
    with _lock:
        _progress[schema_id] = {
            "stage": "completed",
            "percent": 100,
            "message": message,
            "status": "completed",
            "error": None,
        }


def set_error(schema_id: str, error: str) -> None:
    with _lock:
        cur = _progress.get(schema_id, {})
        _progress[schema_id] = {
            "stage": cur.get("stage", "unknown"),
            "percent": cur.get("percent", 0),
            "message": cur.get("message", ""),
            "status": "error",
            "error": error,
        }


def get_progress(schema_id: str) -> dict[str, Any] | None:
    with _lock:
        p = _progress.get(schema_id)
        return dict(p) if p is not None else None


def clear_progress(schema_id: str) -> None:
    with _lock:
        _progress.pop(schema_id, None)


def is_training(schema_id: str) -> bool:
    with _lock:
        p = _progress.get(schema_id)
        return bool(p and p.get("status") == "training")
