"""C-LLM slots for community summarization and map/reduce answering.

Mirrors ``functions/llm_extract.make_llm_extractor`` (the C1 slot) for the
other two LLM call sites the reference has:

  * community summarizer (/root/reference/indexing/summarizer.py:25-60):
    prompt = report text, response = JSON {title, summary, rating,
    "rating explanation", findings:[{summary, explanation}]}; failures fall
    back to a structured placeholder summary (:46-57) instead of failing
    the batch;
  * map/reduce answerer (/root/reference/querying/map_reduce.py:21-61):
    per-item map call returns {answer, helpfulness}; empty answers are
    filtered (:35); one reduce call combines the survivors.

Both reuse ``LLMExtractorClient`` (transport retry + JSON repair + parse
retry, llm_client.py semantics) so production wires the same
OpenAI-compatible endpoint to all three slots. The sandbox has no LLM:
the deterministic column expressions in operators/communities.py and
querying/answer.py remain the default path; these factories plug into the
``summarizer=`` / ``answerer=`` parameters and are exercised in tests via
ScriptedTransport fakes.
"""

from __future__ import annotations

from collections.abc import Callable

from graphrag_litex_spark.functions.llm_extract import LLMExtractorClient

SUMMARY_PROMPT_TEMPLATE = (
    "Your task is to analyze the following report and return a structured "
    "JSON object.\n\n{input_text}\n\nReturn a JSON object with keys 'title', "
    "'summary', 'rating' (float 0-10), 'findings' "
    "(list of {{'summary', 'explanation'}})."
)

MAP_PROMPT_TEMPLATE = (
    "Answer the question using ONLY the report below. Return JSON with keys "
    "'answer' (string, empty if the report is irrelevant) and 'helpfulness' "
    "(float 0-100).\n\nQUESTION: {question}\n\nREPORT:\n{context}"
)

REDUCE_PROMPT_TEMPLATE = (
    "Combine the partial answers below into one final answer to the "
    "question. Return JSON with key 'answer'.\n\nQUESTION: {question}\n\n"
    "PARTIAL ANSWERS:\n{answers}"
)


def _clamp(x, lo: float, hi: float, default: float) -> float:
    try:
        v = float(x)
    except (TypeError, ValueError):
        return default
    return min(hi, max(lo, v))


def coerce_summary(obj, community_id: str, n_entities: int) -> dict:
    """Validate/coerce an LLM summary; malformed or error-envelope responses
    become the reference's structured fallback (summarizer.py:46-57)."""
    if isinstance(obj, dict) and "error" not in obj and obj.get("title"):
        findings = []
        for f in obj.get("findings") or []:
            if isinstance(f, dict) and f.get("summary"):
                findings.append(
                    {
                        "summary": str(f["summary"]),
                        "explanation": str(f.get("explanation", "")),
                    }
                )
        return {
            "title": str(obj["title"]),
            "summary": str(obj.get("summary", "")),
            # H9 clamp to [0, 10] (summarizer.py schema; models clamp)
            "rating": _clamp(obj.get("rating", 5.0), 0.0, 10.0, 5.0),
            "findings": findings,
        }
    return {
        "title": f"Community {community_id}",
        "summary": f"A community with {n_entities} entities",
        "rating": 5.0,
        "findings": [
            {
                "summary": "Error in summarization",
                "explanation": "Failed to generate a proper summary",
            }
        ],
    }


def make_llm_summarizer(
    client: LLMExtractorClient,
    prompt_template: str = SUMMARY_PROMPT_TEMPLATE,
) -> Callable[[str, str, int], dict]:
    """-> ``(community_id, input_text, n_entities) -> summary dict``
    pluggable into ``summarize_communities(..., summarizer=...)``.

    The per-community LLM call never raises: transport and parse failures
    produce the fallback summary, so one bad community cannot fail an Arrow
    batch or the Spark task (same envelope stance as the C2 fallback
    extractor)."""

    def summarize(community_id: str, input_text: str, n_entities: int) -> dict:
        try:
            obj = client.extract_json(prompt_template.format(input_text=input_text))
        except Exception:
            obj = None
        return coerce_summary(obj, community_id, n_entities)

    return summarize


def coerce_map_answer(obj) -> dict:
    """-> {answer, helpfulness}; malformed responses become the empty answer
    (filtered out downstream, map_reduce.py:35)."""
    if isinstance(obj, dict) and "error" not in obj:
        return {
            "answer": str(obj.get("answer", "") or ""),
            "helpfulness": _clamp(obj.get("helpfulness", 0.0), 0.0, 100.0, 0.0),
        }
    return {"answer": "", "helpfulness": 0.0}


class LLMAnswerer:
    """J1 map/reduce slot: per-summary map answers + one reduce call.

    ``map(question, context)`` -> {answer, helpfulness} (never raises);
    ``reduce(question, answers)`` -> final answer string, falling back to
    the deterministic helpfulness-ordered concatenation when the reduce
    call fails (so the query path degrades, never errors)."""

    def __init__(
        self,
        client: LLMExtractorClient,
        map_template: str = MAP_PROMPT_TEMPLATE,
        reduce_template: str = REDUCE_PROMPT_TEMPLATE,
    ) -> None:
        self.client = client
        self.map_template = map_template
        self.reduce_template = reduce_template

    def map(self, question: str, context: str) -> dict:
        try:
            obj = self.client.extract_json(
                self.map_template.format(question=question, context=context)
            )
        except Exception:
            obj = None
        return coerce_map_answer(obj)

    def reduce(self, question: str, answers: list[str]) -> str:
        try:
            obj = self.client.extract_json(
                self.reduce_template.format(
                    question=question, answers="\n".join(answers)
                )
            )
            if isinstance(obj, dict) and "error" not in obj and obj.get("answer"):
                return str(obj["answer"])
        except Exception:
            pass
        return " ".join(answers)


def make_llm_answerer(
    client: LLMExtractorClient,
    map_template: str = MAP_PROMPT_TEMPLATE,
    reduce_template: str = REDUCE_PROMPT_TEMPLATE,
) -> LLMAnswerer:
    """-> answerer pluggable into ``answer_question(..., answerer=...)``."""
    return LLMAnswerer(client, map_template, reduce_template)
