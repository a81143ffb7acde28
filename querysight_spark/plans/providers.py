"""H2 provider seam: recommendation generation behind one interface.

The reference calls litellm per pattern inside the pipeline
(/root/reference/utils/ai_suggester.py:208-282) — non-deterministic,
networked, untestable (SURVEY §7.4.6). Here the pipeline depends only on
``Recommender``; the default is the deterministic rule cascade
(plans.recommend), and an LLM-backed provider plugs in the same seam by
supplying a completion callable — prompts are built as columns, the
callable runs over a bounded top-K collected batch (K patterns, not the
fact table), and responses parse back through parse_llm_response.

No network code lives in this repo; ``LLMRecommender`` without a callable
raises immediately rather than pretending.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Protocol

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from querysight_spark.plans.recommend import parse_llm_response, recommendations


class Recommender(Protocol):
    def recommend(self, patterns: DataFrame, model_map: DataFrame) -> DataFrame: ...


def openai_compatible_complete(
    base_url: str,
    model: str,
    api_key: str | None = None,
    temperature: float = 0.0,
    max_tokens: int = 512,
    timeout_s: float = 30.0,
) -> Callable[[str], str]:
    """Build a completion callable for any OpenAI-compatible
    ``/chat/completions`` endpoint (the de-facto public protocol most
    hosted and self-hosted inference servers speak) — the concrete provider
    the reference reaches via litellm (utils/ai_suggester.py:224-282).

    Deliberately explicit: the endpoint, model, and key are ARGUMENTS —
    nothing is read from the environment, no endpoint is hardcoded, and
    the engine never constructs one of these unless the user asks
    (``RuleBasedRecommender`` stays the default). stdlib urllib only; the
    returned callable is driver-side, matching ``LLMRecommender``'s
    bounded top-k batch."""
    import json
    import urllib.request

    url = base_url.rstrip("/") + "/chat/completions"

    def complete(prompt: str) -> str:
        body = json.dumps(
            {
                "model": model,
                "messages": [{"role": "user", "content": prompt}],
                "temperature": temperature,
                "max_tokens": max_tokens,
            }
        ).encode()
        headers = {"Content-Type": "application/json"}
        if api_key:
            headers["Authorization"] = f"Bearer {api_key}"
        req = urllib.request.Request(url, data=body, headers=headers)
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            payload = json.loads(resp.read().decode())
        return payload["choices"][0]["message"]["content"]

    return complete


class RuleBasedRecommender:
    """Default: the deterministic rule cascade (H2's testable stand-in)."""

    def recommend(self, patterns: DataFrame, model_map: DataFrame) -> DataFrame:
        return recommendations(patterns, model_map)


class LLMRecommender:
    """LLM-backed provider. ``complete`` maps a prompt string to the model's
    response text (the caller owns auth/retries/model choice). Top-K
    patterns by impact are collected (bounded driver work — mirrors the
    reference, which iterates patterns serially), completed, and parsed
    into the same structured output columns."""

    def __init__(self, complete: Callable[[str], str] | None = None, top_k: int = 20):
        if complete is None:
            raise ValueError(
                "LLMRecommender needs a completion callable; use "
                "RuleBasedRecommender for the deterministic default"
            )
        self.complete = complete
        self.top_k = top_k

    def _prompt(self, row) -> str:
        # H4 prompt-context analog (utils/ai_suggester.py:98-206), minimal
        return (
            f"Query pattern: {row.sql_pattern}\n"
            f"Frequency: {row.frequency}, avg duration ms: {row.avg_duration_ms}\n"
            f"Tables: {','.join(row.tables_accessed)}\n"
            "## RESPONSE FORMAT\nType: [INDEX|REWRITE_QUERY|NEW_DBT_MODEL|NEW_DBT_MACRO]\n"
            "Description: ...\nImpact: [HIGH|MEDIUM|LOW]\nSQL: ..."
        )

    def recommend(self, patterns: DataFrame, model_map: DataFrame) -> DataFrame:
        spark = patterns.sparkSession
        top = (
            patterns.orderBy(
                (F.col("frequency") * F.col("avg_duration_ms")).desc(), "pattern_id"
            )
            .limit(self.top_k)
            .collect()
        )
        rows = [(r.pattern_id, r.normalized_query, self.complete(self._prompt(r)))
                for r in top]
        raw = spark.createDataFrame(
            rows, "pattern_id string, normalized_query string, response string"
        )
        return parse_llm_response(raw).select(
            "pattern_id",
            "normalized_query",
            F.col("parsed.rec_type").alias("rec_type"),
            F.col("parsed.impact").alias("impact"),
            F.col("parsed.description").alias("description"),
            F.col("parsed.sql").alias("suggested_sql"),
        )
