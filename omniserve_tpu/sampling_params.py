"""Sampling parameters for text generation.

Semantics follow the reference ``omniserve/sampling_params.py``: OpenAI-style
knobs with validation; greedy sampling iff temperature < SAMPLING_EPS
(reference :135-140); optional ``decoding_sim_token_ids`` hook used by the
decode-simulation benchmarking path (reference :104,143-144).
"""

from __future__ import annotations

from typing import List, Optional, Union

SAMPLING_EPS = 1e-5


class SamplingParams:
    def __init__(
        self,
        n: int = 1,
        best_of: Optional[int] = None,
        presence_penalty: float = 0.0,
        frequency_penalty: float = 0.0,
        temperature: float = 1.0,
        top_p: float = 1.0,
        top_k: int = -1,
        use_beam_search: bool = False,
        length_penalty: float = 1.0,
        early_stopping: Union[bool, str] = False,
        stop: Optional[Union[str, List[str]]] = None,
        stop_token_ids: Optional[List[int]] = None,
        ignore_eos: bool = False,
        max_tokens: int = 16,
        logprobs: Optional[int] = None,
        prompt_logprobs: Optional[int] = None,
        skip_special_tokens: bool = True,
        decoding_sim_token_ids: Optional[List[int]] = None,
        seed: Optional[int] = None,
    ) -> None:
        self.n = n
        self.best_of = best_of if best_of is not None else n
        self.presence_penalty = presence_penalty
        self.frequency_penalty = frequency_penalty
        self.temperature = temperature
        self.top_p = top_p
        self.top_k = top_k
        self.use_beam_search = use_beam_search
        self.length_penalty = length_penalty
        self.early_stopping = early_stopping
        if stop is None:
            self.stop: List[str] = []
        elif isinstance(stop, str):
            self.stop = [stop]
        else:
            self.stop = list(stop)
        self.stop_token_ids = list(stop_token_ids or [])
        self.ignore_eos = ignore_eos
        self.max_tokens = max_tokens
        self.logprobs = logprobs
        self.prompt_logprobs = prompt_logprobs
        self.skip_special_tokens = skip_special_tokens
        # Forced output tokens for decoding-simulation benchmarking
        # (reference llm_engine.py:349-354).
        self.decoding_sim_token_ids = (
            list(decoding_sim_token_ids) if decoding_sim_token_ids else None
        )
        self.seed = seed
        self._verify()
        if self.use_beam_search:
            raise NotImplementedError("beam search is not supported")
        if self.is_greedy:
            self._verify_greedy()

    @property
    def is_greedy(self) -> bool:
        return self.temperature < SAMPLING_EPS

    def _verify(self) -> None:
        if self.n < 1:
            raise ValueError(f"n must be >= 1, got {self.n}")
        if self.best_of < self.n:
            raise ValueError(
                f"best_of must be >= n, got n={self.n}, best_of={self.best_of}"
            )
        if not -2.0 <= self.presence_penalty <= 2.0:
            raise ValueError(
                f"presence_penalty must be in [-2, 2], got {self.presence_penalty}"
            )
        if not -2.0 <= self.frequency_penalty <= 2.0:
            raise ValueError(
                f"frequency_penalty must be in [-2, 2], got {self.frequency_penalty}"
            )
        if self.temperature < 0.0:
            raise ValueError(
                f"temperature must be non-negative, got {self.temperature}"
            )
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError(f"top_p must be in (0, 1], got {self.top_p}")
        if self.top_k < -1 or self.top_k == 0:
            raise ValueError(f"top_k must be -1 (disable) or >= 1, got {self.top_k}")
        if self.max_tokens < 1:
            raise ValueError(f"max_tokens must be >= 1, got {self.max_tokens}")
        if self.logprobs is not None and self.logprobs < 0:
            raise ValueError(f"logprobs must be non-negative, got {self.logprobs}")

    def _verify_greedy(self) -> None:
        if self.best_of > 1:
            raise ValueError(
                f"best_of must be 1 when using greedy sampling, got {self.best_of}"
            )

    def __repr__(self) -> str:
        return (
            f"SamplingParams(n={self.n}, temperature={self.temperature}, "
            f"top_p={self.top_p}, top_k={self.top_k}, max_tokens={self.max_tokens}, "
            f"stop={self.stop}, ignore_eos={self.ignore_eos})"
        )
