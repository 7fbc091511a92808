"""Optional OpenAI-compatible chat client — A15's LLM backend.

Port of the reference's httpx client (NLP_SQLizer/backend/app/ai/llm.py:
23-50: temperature 0.1, 60 s timeout, max_tokens 256) on stdlib urllib so
no extra dependency is needed. Configured via env vars; raises
``LLMNotConfigured`` when absent — every caller must have a deterministic
template fallback (the reference's pattern at llm.py:6-7), which is what
CI exercises.

Env: SQLIZER_LLM_BASE_URL, SQLIZER_LLM_API_KEY (optional),
SQLIZER_LLM_MODEL (default per .env.sample's Ollama example).
"""

from __future__ import annotations

import json
import os
import urllib.request


class LLMNotConfigured(Exception):
    pass


class LLMResponseError(RuntimeError):
    """The LLM endpoint answered but the body was not a chat
    completion. Subclasses RuntimeError so every caller's narrow
    fall-back-to-templates catch already covers it."""


def chat_complete(
    system: str,
    user: str,
    timeout_s: float = 60.0,
    max_tokens: int = 256,
    temperature: float = 0.1,
) -> str:
    base = os.environ.get("SQLIZER_LLM_BASE_URL")
    if not base:
        raise LLMNotConfigured("SQLIZER_LLM_BASE_URL not set")
    model = os.environ.get("SQLIZER_LLM_MODEL", "deepseek-r1:32b")
    payload = {
        "model": model,
        "messages": [
            {"role": "system", "content": system},
            {"role": "user", "content": user},
        ],
        "temperature": temperature,
        "max_tokens": max_tokens,
    }
    req = urllib.request.Request(
        base.rstrip("/") + "/chat/completions",
        data=json.dumps(payload).encode(),
        headers={
            "Content-Type": "application/json",
            **(
                {"Authorization": f"Bearer {os.environ['SQLIZER_LLM_API_KEY']}"}
                if os.environ.get("SQLIZER_LLM_API_KEY")
                else {}
            ),
        },
    )
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
        raw = resp.read()
    try:
        data = json.loads(raw)
        return data["choices"][0]["message"]["content"]
    except (json.JSONDecodeError, KeyError, IndexError, TypeError) as e:
        # a 200 with a non-OpenAI body (gateway page, {'error': ...},
        # truncated JSON) is a SERVER failure, not a caller bug: surface
        # it as the error type callers' template-fallback ladders catch
        raise LLMResponseError(f"unparseable LLM response: {e}") from e
