"""Request/completion output objects (vLLM-style user-facing results)."""

from __future__ import annotations

from typing import List, Optional

from omniserve_tpu.sequence import SequenceGroup, SequenceStatus


class CompletionOutput:
    def __init__(
        self,
        index: int,
        text: str,
        token_ids: List[int],
        cumulative_logprob: float = 0.0,
        finish_reason: Optional[str] = None,
    ) -> None:
        self.index = index
        self.text = text
        self.token_ids = token_ids
        self.cumulative_logprob = cumulative_logprob
        self.finish_reason = finish_reason

    def finished(self) -> bool:
        return self.finish_reason is not None

    def __repr__(self) -> str:
        return (
            f"CompletionOutput(index={self.index}, text={self.text!r}, "
            f"finish_reason={self.finish_reason})"
        )


class RequestOutput:
    def __init__(
        self,
        request_id: str,
        prompt: Optional[str],
        prompt_token_ids: List[int],
        outputs: List[CompletionOutput],
        finished: bool,
    ) -> None:
        self.request_id = request_id
        self.prompt = prompt
        self.prompt_token_ids = prompt_token_ids
        self.outputs = outputs
        self.finished = finished

    @classmethod
    def from_seq_group(cls, seq_group: SequenceGroup) -> "RequestOutput":
        # best-first (vLLM convention): rank candidates by cumulative
        # logprob and return sampling_params.n of the best_of candidates
        seqs = sorted(
            seq_group.get_seqs(),
            key=lambda s: s.data.cumulative_logprob, reverse=True,
        )
        n = getattr(seq_group.sampling_params, "n", len(seqs)) or len(seqs)
        if seq_group.is_finished():
            seqs = seqs[:n]
        outputs = []
        for i, seq in enumerate(seqs):
            outputs.append(
                CompletionOutput(
                    index=i,
                    text=seq.output_text,
                    token_ids=seq.data.output_token_ids,
                    cumulative_logprob=seq.data.cumulative_logprob,
                    finish_reason=SequenceStatus.get_finished_reason(
                        seq.status
                    ),
                )
            )
        return cls(
            request_id=seq_group.request_id,
            prompt=seq_group.prompt,
            prompt_token_ids=seq_group.prompt_token_ids,
            outputs=outputs,
            finished=seq_group.is_finished(),
        )

    def __repr__(self) -> str:
        return (
            f"RequestOutput(request_id={self.request_id}, "
            f"finished={self.finished}, outputs={self.outputs})"
        )
