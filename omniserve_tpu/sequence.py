"""Sequence state for the serving engine.

Mirrors the contract of the reference ``omniserve/sequence.py``:
``SequenceData`` (prompt+output ids), ``Sequence`` (status machine + logical
block accounting + incremental detokenization offsets), ``SequenceGroup``
(one request, n candidate sequences), and ``SequenceGroupMetadata`` which
carries BOTH retrieval and streaming block tables to the worker (reference
sequence.py:355-371). Rebuilt fresh for the TPU engine: logical blocks are
just a token count + page size (no per-block objects needed host-side).
"""

from __future__ import annotations

import enum
import math
from typing import Dict, List, Optional

from omniserve_tpu.sampling_params import SamplingParams
from omniserve_tpu.utils.constants import PAGE_SIZE


class SequenceStatus(enum.Enum):
    WAITING = enum.auto()
    RUNNING = enum.auto()
    SWAPPED = enum.auto()
    FINISHED_STOPPED = enum.auto()
    FINISHED_LENGTH_CAPPED = enum.auto()
    FINISHED_ABORTED = enum.auto()
    FINISHED_IGNORED = enum.auto()

    @staticmethod
    def is_finished(status: "SequenceStatus") -> bool:
        return status in (
            SequenceStatus.FINISHED_STOPPED,
            SequenceStatus.FINISHED_LENGTH_CAPPED,
            SequenceStatus.FINISHED_ABORTED,
            SequenceStatus.FINISHED_IGNORED,
        )

    @staticmethod
    def get_finished_reason(status: "SequenceStatus") -> Optional[str]:
        return {
            SequenceStatus.FINISHED_STOPPED: "stop",
            SequenceStatus.FINISHED_LENGTH_CAPPED: "length",
            SequenceStatus.FINISHED_ABORTED: "abort",
            SequenceStatus.FINISHED_IGNORED: "length",
        }.get(status)


class SequenceData:
    """Token ids and cumulative logprob for one sequence."""

    def __init__(self, prompt_token_ids: List[int]) -> None:
        self.prompt_token_ids = list(prompt_token_ids)
        self.output_token_ids: List[int] = []
        self.cumulative_logprob = 0.0

    def append_token_id(self, token_id: int, logprob: float = 0.0) -> None:
        self.output_token_ids.append(token_id)
        self.cumulative_logprob += logprob

    def get_len(self) -> int:
        return len(self.prompt_token_ids) + len(self.output_token_ids)

    def get_prompt_len(self) -> int:
        return len(self.prompt_token_ids)

    def get_output_len(self) -> int:
        return len(self.output_token_ids)

    def get_token_ids(self) -> List[int]:
        return self.prompt_token_ids + self.output_token_ids

    def get_last_token_id(self) -> int:
        if self.output_token_ids:
            return self.output_token_ids[-1]
        return self.prompt_token_ids[-1]

    def __repr__(self) -> str:
        return (
            f"SequenceData(prompt_len={self.get_prompt_len()}, "
            f"output_len={self.get_output_len()})"
        )


class Sequence:
    """One candidate sequence of a request."""

    def __init__(
        self,
        seq_id: int,
        prompt: Optional[str],
        prompt_token_ids: List[int],
        page_size: int = PAGE_SIZE,
    ) -> None:
        self.seq_id = seq_id
        self.prompt = prompt
        self.page_size = page_size
        self.data = SequenceData(prompt_token_ids)
        self.status = SequenceStatus.WAITING
        self.output_text = ""
        # Incremental detokenization state (reference sequence.py:148-151).
        self.prefix_offset = 0
        self.read_offset = 0
        self.tokens: Optional[List[str]] = None
        self.stop_reason: Optional[str] = None

    # -- length / paging accounting ------------------------------------
    def get_len(self) -> int:
        return self.data.get_len()

    def get_prompt_len(self) -> int:
        return self.data.get_prompt_len()

    def get_output_len(self) -> int:
        return self.data.get_output_len()

    def get_token_ids(self) -> List[int]:
        return self.data.get_token_ids()

    def get_last_token_id(self) -> int:
        return self.data.get_last_token_id()

    def num_logical_blocks(self) -> int:
        """Number of logical pages needed to hold the current tokens."""
        return max(1, math.ceil(self.get_len() / self.page_size))

    def num_empty_slots_in_last_block(self) -> int:
        rem = self.get_len() % self.page_size
        return 0 if rem == 0 else self.page_size - rem

    def append_token_id(self, token_id: int, logprob: float = 0.0) -> None:
        self.data.append_token_id(token_id, logprob)

    def is_finished(self) -> bool:
        return SequenceStatus.is_finished(self.status)

    def fork(self, new_seq_id: int) -> "Sequence":
        import copy

        child = copy.deepcopy(self)
        child.seq_id = new_seq_id
        return child

    def __repr__(self) -> str:
        return (
            f"Sequence(seq_id={self.seq_id}, status={self.status.name}, "
            f"num_blocks={self.num_logical_blocks()})"
        )


class SequenceGroup:
    """All candidate sequences generated from one request."""

    def __init__(
        self,
        request_id: str,
        seqs: List[Sequence],
        sampling_params: SamplingParams,
        arrival_time: float,
        prefix=None,
    ) -> None:
        self.request_id = request_id
        self.seqs_dict: Dict[int, Sequence] = {s.seq_id: s for s in seqs}
        self.sampling_params = sampling_params
        self.arrival_time = arrival_time
        self.prompt = seqs[0].prompt
        self.prompt_token_ids = seqs[0].data.prompt_token_ids
        # shared prompt prefix (core/prefix.Prefix) or None
        # (reference sequence.py:352-371)
        self.prefix = prefix

    def get_seqs(
        self, status: Optional[SequenceStatus] = None
    ) -> List[Sequence]:
        if status is None:
            return list(self.seqs_dict.values())
        return [s for s in self.seqs_dict.values() if s.status == status]

    def get_max_num_running_seqs(self) -> int:
        if self.sampling_params.best_of > self.num_seqs():
            return self.sampling_params.best_of
        return self.num_unfinished_seqs()

    def num_seqs(self, status: Optional[SequenceStatus] = None) -> int:
        return len(self.get_seqs(status))

    def num_unfinished_seqs(self) -> int:
        return len([s for s in self.seqs_dict.values() if not s.is_finished()])

    def find(self, seq_id: int) -> Sequence:
        return self.seqs_dict[seq_id]

    def is_finished(self) -> bool:
        return all(s.is_finished() for s in self.seqs_dict.values())

    def __repr__(self) -> str:
        return (
            f"SequenceGroup(request_id={self.request_id}, "
            f"num_seqs={self.num_seqs()})"
        )


class SequenceGroupMetadata:
    """Scheduler -> worker handoff for one scheduled group.

    Carries both KV pools' block tables (reference sequence.py:355-371):
    ``block_tables`` for the retrieval (full) pool and
    ``streaming_block_tables`` for the sink+local ring pool.
    """

    def __init__(
        self,
        request_id: str,
        is_prompt: bool,
        seq_data: Dict[int, SequenceData],
        sampling_params: SamplingParams,
        block_tables: Dict[int, List[int]],
        streaming_block_tables: Optional[Dict[int, List[int]]] = None,
        prefix=None,
    ) -> None:
        self.request_id = request_id
        self.is_prompt = is_prompt
        self.seq_data = seq_data
        self.sampling_params = sampling_params
        self.block_tables = block_tables
        self.streaming_block_tables = streaming_block_tables or {}
        self.prefix = prefix


class SequenceOutput:
    """Sampler output for one parent sequence."""

    def __init__(self, parent_seq_id: int, output_token: int, logprob: float = 0.0):
        self.parent_seq_id = parent_seq_id
        self.output_token = output_token
        self.logprob = logprob

    def __repr__(self) -> str:
        return (
            f"SequenceOutput(parent_seq_id={self.parent_seq_id}, "
            f"output_token={self.output_token})"
        )


class SequenceGroupOutput:
    def __init__(self, samples: List[SequenceOutput]):
        self.samples = samples


# One engine step's sampler result: list over scheduled groups.
SamplerOutput = List[SequenceGroupOutput]
