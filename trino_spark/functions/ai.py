"""ai_* functions — LLM-backed text operators behind a pluggable client.

Parity surface from the reference's AI-functions plugin
(plugin/trino-ai-functions/src/main/java/io/trino/plugin/ai/AiFunctions.java:55-79):
ai_analyze_sentiment, ai_classify, ai_extract, ai_fix_grammar, ai_gen,
ai_mask, ai_translate — there they call an OpenAI/Anthropic-compatible HTTP
endpoint (AiClient.java); here the same names are Arrow-batched pandas UDFs
routed through an `AiClient` protocol.

No network access exists in this environment, so the default client is a
clearly-marked DETERMINISTIC FAKE (rule-based token heuristics). The Spark
plumbing — batching, schema, registration, per-batch client reuse — is the
real deliverable; swapping `set_client(HttpAiClient(...))` turns on a real
endpoint without touching query code.

Scale notes: each executor task processes whole Arrow batches; a real
client should batch-POST per pandas batch (not per row) and bound
concurrency per executor — the plumbing already hands it the full batch.
"""

from __future__ import annotations

import re
from typing import Protocol

import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf


class AiClient(Protocol):
    """Batch text-in/text-out transport (mirrors AiClient.java)."""

    def complete(self, task: str, texts: list[str], arg: str | None) -> list[str]: ...


class DeterministicFakeClient:
    """DETERMINISTIC FAKE for offline testing — rule-based, seed-free.

    Real deployments replace this via set_client(); outputs are stable
    functions of the input text so tests can assert exact values.
    """

    _POS = {"good", "great", "excellent", "love", "best", "happy", "win"}
    _NEG = {"bad", "terrible", "awful", "hate", "worst", "sad", "lose"}

    def complete(self, task: str, texts: list[str], arg: str | None) -> list[str]:
        return [self._one(task, t or "", arg) for t in texts]

    def _one(self, task: str, text: str, arg: str | None) -> str:
        words = re.findall(r"[a-z']+", text.lower())
        if task == "sentiment":
            pos = sum(w in self._POS for w in words)
            neg = sum(w in self._NEG for w in words)
            return "POSITIVE" if pos > neg else "NEGATIVE" if neg > pos else "NEUTRAL"
        if task == "classify":
            labels = (arg or "").split(",")
            if not labels or labels == [""]:
                return ""
            # stable pseudo-classification: hash of content picks a label
            return labels[sum(map(ord, text)) % len(labels)].strip()
        if task == "extract":
            field = (arg or "").lower()
            m = re.search(rf"{re.escape(field)}\s*[:=]\s*(\S+)", text, re.IGNORECASE)
            return m.group(1) if m else ""
        if task == "fix_grammar":
            t = re.sub(r"\s+", " ", text).strip()
            return (t[:1].upper() + t[1:]) if t else t
        if task == "gen":
            return f"[GEN:{len(words)} words] {text[:40]}"
        if task == "mask":
            kinds = (arg or "email,phone").split(",")
            out = text
            if "email" in kinds:
                out = re.sub(r"\S+@\S+", "[MASKED]", out)
            if "phone" in kinds:
                out = re.sub(r"\+?\d[\d\-\s]{6,}\d", "[MASKED]", out)
            return out
        if task == "translate":
            return f"[{(arg or 'en').upper()}] {text}"
        raise ValueError(f"unknown ai task: {task}")


_CLIENT: AiClient = DeterministicFakeClient()


def set_client(client: AiClient) -> None:
    """Install a real endpoint-backed client (module-level; captured by UDF
    closures at registration time)."""
    global _CLIENT
    _CLIENT = client


def _task_udf(task: str, arg: str | None = None):
    @pandas_udf("string")
    def run(texts: pd.Series) -> pd.Series:
        out = _CLIENT.complete(task, texts.fillna("").tolist(), arg)
        return pd.Series(out)

    return run


def ai_analyze_sentiment(col: Column | str) -> Column:
    return _task_udf("sentiment")(F.col(col) if isinstance(col, str) else col)


def ai_classify(col: Column | str, labels: list[str]) -> Column:
    return _task_udf("classify", ",".join(labels))(F.col(col) if isinstance(col, str) else col)


def ai_extract(col: Column | str, field: str) -> Column:
    return _task_udf("extract", field)(F.col(col) if isinstance(col, str) else col)


def ai_fix_grammar(col: Column | str) -> Column:
    return _task_udf("fix_grammar")(F.col(col) if isinstance(col, str) else col)


def ai_gen(col: Column | str) -> Column:
    return _task_udf("gen")(F.col(col) if isinstance(col, str) else col)


def ai_mask(col: Column | str, kinds: list[str]) -> Column:
    return _task_udf("mask", ",".join(kinds))(F.col(col) if isinstance(col, str) else col)


def ai_translate(col: Column | str, lang: str) -> Column:
    return _task_udf("translate", lang)(F.col(col) if isinstance(col, str) else col)


def register_ai_functions(spark: SparkSession) -> None:
    """SQL-visible registration: SELECT ai_analyze_sentiment(text) FROM t."""
    spark.udf.register("ai_analyze_sentiment", _task_udf("sentiment"))
    spark.udf.register("ai_fix_grammar", _task_udf("fix_grammar"))
    spark.udf.register("ai_gen", _task_udf("gen"))
