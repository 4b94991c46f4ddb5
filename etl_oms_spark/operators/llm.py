"""LLM inference seam: batched text generation over DataFrames.

Re-expresses the reference's ``LLMClient`` surface (U1 in SURVEY §2.10 —
``llm_client.py:6-41``: abstract ``LLMClient.ask(prompt) -> str``, a local
HF-transformers backend, and a ``get_llm_client(source)`` factory) as a
distributed operator:

- `LLMClient` / `get_llm_client` — same API shape, pluggable backends.
- `ask_column` — the Spark form: an Arrow-batched ``pandas_udf`` that runs
  the client over a prompt column. The client is constructed **lazily once
  per executor worker** (module-level singleton inside the UDF closure) —
  the pattern a real model needs: load weights once per worker, batch
  prompts through, never serialize the model from the driver.

Backends:
- ``"echo"`` — deterministic test backend (template over the prompt).
- ``"local"`` — HF transformers pipeline, import-gated: transformers is not
  installed in this container so construction raises NotImplementedError
  with the exact wiring a real deployment fills in (mirrors the reference's
  fp16 / max_new_tokens=512 settings without copying its code).
"""

from __future__ import annotations

import abc

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


class LLMClient(abc.ABC):
    """Abstract prompt→completion client (parity with llm_client.py:6-12)."""

    @abc.abstractmethod
    def ask(self, prompt: str) -> str:
        raise NotImplementedError

    def ask_batch(self, prompts: list[str]) -> list[str]:
        """Batch hook — backends with real batching override this; the
        default maps ask() (correct, not fast)."""
        return [self.ask(p) for p in prompts]


class EchoLLMClient(LLMClient):
    """Deterministic offline backend for tests and plumbing verification."""

    def __init__(self, template: str = "echo({n_words}): {head}") -> None:
        self.template = template

    def ask(self, prompt: str) -> str:
        words = prompt.split()
        return self.template.format(n_words=len(words), head=" ".join(words[:3]))


class LocalLLMClient(LLMClient):  # pragma: no cover - needs transformers
    """HF-transformers text-generation backend (llm_client.py:11-37 parity).

    Import-gated: transformers/torch are not installed in this container,
    so construction raises NotImplementedError here — but the body below
    is the complete real wiring, matching the reference's settings
    (fp16 weights, device_map="auto", disk offload folder, greedy
    max_new_tokens=512, local-files-only model dir) so a deployment with
    transformers installed runs it unchanged. Unlike the reference's
    per-call pipeline, ``ask_batch`` feeds the whole Arrow batch through
    one pipeline call — the per-worker-singleton + batching contract
    ``ask_column`` is built around.
    """

    def __init__(
        self,
        model_name: str = "mistralai/Mistral-7B-v0.1",
        max_new_tokens: int = 512,
        offload_folder: str = "offload",
        local_files_only: bool = True,
    ) -> None:
        try:
            import torch
            from transformers import (
                AutoModelForCausalLM,
                AutoTokenizer,
                pipeline,
            )
        except ImportError as exc:
            raise NotImplementedError(
                "transformers not available in this environment; use "
                "get_llm_client('echo') for plumbing tests"
            ) from exc
        import os

        os.makedirs(offload_folder, exist_ok=True)
        tokenizer = AutoTokenizer.from_pretrained(
            model_name, local_files_only=local_files_only
        )
        model = AutoModelForCausalLM.from_pretrained(
            model_name,
            torch_dtype=torch.float16,
            device_map="auto",
            offload_folder=offload_folder,
            local_files_only=local_files_only,
        )
        self.max_new_tokens = max_new_tokens
        self._pipe = pipeline("text-generation", model=model, tokenizer=tokenizer)

    def ask(self, prompt: str) -> str:
        return self._pipe(prompt, max_new_tokens=self.max_new_tokens)[0][
            "generated_text"
        ]

    def ask_batch(self, prompts: list[str]) -> list[str]:
        if not prompts:
            return []
        outs = self._pipe(
            prompts, max_new_tokens=self.max_new_tokens, batch_size=len(prompts)
        )
        return [o[0]["generated_text"] for o in outs]


def get_llm_client(source: str = "echo", **kwargs) -> LLMClient:
    """Factory (llm_client.py:40-41 parity; 'echo' added for offline use)."""
    if source == "echo":
        return EchoLLMClient(**kwargs)
    if source == "local":
        return LocalLLMClient(**kwargs)
    raise ValueError(f"unknown LLM client source: {source!r}")


def ask_column(prompt_col: Column | str, source: str = "echo", **client_kwargs) -> Column:
    """Run the LLM client over a prompt column, Arrow-batched.

    One client instance per executor worker (lazy singleton in the UDF
    closure); each Arrow batch flows through ``ask_batch``. Batch size is
    governed by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — tune it
    to the model's optimal batch, and cap executor concurrency so each GPU
    hosts one replica.
    """
    state: dict[str, LLMClient] = {}

    @pandas_udf("string")
    def _ask(prompts: pd.Series) -> pd.Series:
        client = state.get("c")
        if client is None:
            client = get_llm_client(source, **client_kwargs)
            state["c"] = client
        return pd.Series(client.ask_batch(prompts.fillna("").tolist()))

    c = F.col(prompt_col) if isinstance(prompt_col, str) else prompt_col
    return _ask(c)
