"""omniserve_tpu: TPU-native quantized LLM serving (QServe + LServe rebuild).

A from-scratch JAX/XLA/Pallas serving engine with OmniServe's capabilities:
W4A8KV4 quantized inference and long-context sparse attention, driven by a
continuous-batching engine over paged quantized KV pools.
"""

from omniserve_tpu.engine.arg_utils import EngineArgs
from omniserve_tpu.engine.llm_engine import LLMEngine
from omniserve_tpu.outputs import CompletionOutput, RequestOutput
from omniserve_tpu.sampling_params import SamplingParams

__version__ = "0.1.0"

__all__ = [
    "EngineArgs",
    "LLMEngine",
    "SamplingParams",
    "RequestOutput",
    "CompletionOutput",
]
