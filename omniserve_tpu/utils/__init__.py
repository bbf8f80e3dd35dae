from omniserve_tpu.utils.counter import Counter
from omniserve_tpu.utils.logger import init_logger

__all__ = ["Counter", "init_logger"]
